from .ops import compile_ops, run_ops  # noqa: F401
from .pipeline import LazyPipeline, Pipeline, PipelineStep, create_pipeline  # noqa: F401
from .dispatch import run_metric  # noqa: F401
