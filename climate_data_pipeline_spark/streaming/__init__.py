from .rollup import streaming_rollup, streaming_sessionize  # noqa: F401
