"""Multimodal (image/audio/video) column plumbing (beyond-reference
extension): opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / frame-sample operators over Arrow-batched
``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-parallel
UDF shape, row-multiplying frame sampling — is real and tested. The
actual codec step is STUBBED: the container has no image/audio libraries,
so ``decode_media(..., real=True)`` raises ``NotImplementedError`` with a
clear marker, and the default decoder is a deterministic fake (byte-level
statistics standing in for pixels/samples). Swapping in PIL/librosa/ffmpeg
changes only the inner function, not the distributed plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, media_type string, payload binary, n_bytes long"


def attach_payload(df: DataFrame, id_col: str, source_col: str,
                   media_type: str = "image/fake") -> DataFrame:
    """Demo builder: wrap an existing column as an opaque binary payload
    with typed metadata — the shape a real ingest (S3 object fetch,
    tar-shard extraction) would produce."""
    payload = F.encode(F.col(source_col).cast("string"), "UTF-8")
    return df.select(F.col(id_col).cast("long").alias("media_id"),
                     F.lit(media_type).alias("media_type"),
                     payload.alias("payload"),
                     F.length(payload).cast("long").alias("n_bytes"))


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Decode payloads to typed metadata via ``mapInPandas`` (per-partition
    Arrow batches — the multimodal hot path never serializes row-at-a-time).
    ``real=True`` is the stubbed codec seam."""
    if real:
        raise NotImplementedError(
            "STUB: real media decode requires PIL/librosa/ffmpeg, not "
            "available in this environment; wire the codec into _decode_batch")

    out_schema = ("media_id long, media_type string, n_bytes long, "
                  "width int, height int, mean_intensity double")

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NOTE: everything this closure touches must be defined inside it
        # (or be an installed module) — cloudpickle ships it by value to
        # Python workers that cannot import this package.
        def fake_decode(payload: bytes) -> dict:
            n = len(payload)
            mean = float(sum(payload)) / n if n else 0.0
            return {"width": 16 + n % 64, "height": 16 + (n // 64) % 64,
                    "mean_intensity": mean}

        for pdf in batches:
            meta = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"].astype("int64"),
                "width": pd.Series([m["width"] for m in meta], dtype="int32"),
                "height": pd.Series([m["height"] for m in meta], dtype="int32"),
                "mean_intensity": [m["mean_intensity"] for m in meta],
            })

    return df.mapInPandas(_decode_batch, schema=out_schema)


def byte_histogram_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction: normalized byte histogram as a fixed-size
    ``array<double>`` embedding — the deterministic fake for an encoder
    model; the plumbing (binary → vector column) is the real pattern."""
    out_schema = f"media_id long, features array<double>"

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr // (256 // n_bins), minlength=n_bins)
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].astype("int64"),
                                "features": feats})

    return df.mapInPandas(_featurize, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 64) -> DataFrame:
    """Frame sampling for 'video' payloads: emit one row per sampled frame
    (row-multiplying map — the UDTF shape). Fake frames are byte windows;
    a real implementation would emit decoded keyframes."""
    out_schema = "media_id long, frame_idx int, frame_offset long, frame_checksum long"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_offset": [],
                    "frame_checksum": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, len(p), every_n)):
                    window = p[off:off + every_n]
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_checksum"].append(int(sum(window)))
            yield pd.DataFrame({
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "frame_offset": pd.Series(rows["frame_offset"], dtype="int64"),
                "frame_checksum": pd.Series(rows["frame_checksum"], dtype="int64"),
            })

    return df.mapInPandas(_sample, schema=out_schema)
