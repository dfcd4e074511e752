"""Batch-job entry points (SURVEY.md §2.10 O4+O6): the engine-side
equivalent of the reference's Celery tasks — load → apply an op-dict
plan → write with a layout preset → verify the output.

Reference: `process_dataset` (`tasks/celery_tasks.py:33-81`, op
interpreter at 210-231) and `convert_to_zarr_task`
(`celery_tasks.py:160-207`, load → convert → verify info). In Spark these
are plain functions: enqueueing/retries belong to whatever scheduler
submits the job (Airflow, spark-submit cron, Celery itself) — the engine
contract is the deterministic plan in the middle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from ..sources.io import load_table, parquet_info, write_parquet
from .ops import run_ops


def process_dataset(spark: SparkSession, sf_dir: str, table: str,
                    output_path: str, operations: Sequence[dict] = (),
                    layout: str = "balanced",
                    entity_cols: Sequence[str] = (),
                    time_col: str | None = None,
                    compression: str = "zstd",
                    overwrite: bool = False) -> dict:
    """load → op-dict plan → layout-preset write → verify.

    Returns the reference's result-dict shape
    (`celery_tasks.py:70-77`): status, output path, output info.
    """
    df = load_table(spark, sf_dir, table)
    if operations:
        df = run_ops(df, operations)
    write_parquet(df, output_path, layout=layout, entity_cols=entity_cols,
                  time_col=time_col, compression=compression,
                  overwrite=overwrite)
    info = parquet_info(spark, output_path)
    return {
        "status": "completed",
        "input": f"{sf_dir}/{table}.parquet",
        "output_path": output_path,
        "operations_applied": len(operations),
        "output_info": info,
    }


def convert_dataset(spark: SparkSession, sf_dir: str, table: str,
                    output_path: str, layout: str = "balanced",
                    entity_cols: Sequence[str] = (),
                    time_col: str | None = None,
                    compression: str = "zstd",
                    overwrite: bool = False) -> dict:
    """Pure format/layout conversion (O6) — process_dataset with no ops;
    verifies row-count parity between input and output."""
    result = process_dataset(spark, sf_dir, table, output_path,
                             operations=(), layout=layout,
                             entity_cols=entity_cols, time_col=time_col,
                             compression=compression, overwrite=overwrite)
    in_rows = load_table(spark, sf_dir, table).count()
    out_rows = result["output_info"]["num_rows"]
    result["verified"] = in_rows == out_rows
    if not result["verified"]:
        result["status"] = "verification_failed"
    return result


def convert_netcdf(spark: SparkSession, nc_path: str, output_path: str,
                   variables: Sequence[str] | None = None,
                   time_range: tuple[str, str] | None = None,
                   layout: str = "timeseries",
                   compression: str = "zstd",
                   overwrite: bool = False) -> dict:
    """The reference's `convert_to_zarr_task` end-to-end
    (`tasks/celery_tasks.py:160-207`): NetCDF in → analysis-ready
    columnar store out, with read-time projection/predicates and a
    layout preset replacing the chunking strategy. Uses the built-in
    classic-format parser — no external NetCDF libraries. Row-count
    parity between the grid and the written store is verified."""
    from ..sources.netcdf import read_netcdf_long

    df = read_netcdf_long(spark, nc_path, variables=variables,
                          time_range=time_range)
    time_col = "time" if "time" in df.columns else None
    entity = [c for c in ("lat", "lon") if c in df.columns]
    write_parquet(df, output_path, layout=layout, entity_cols=entity,
                  time_col=time_col, compression=compression,
                  overwrite=overwrite)
    info = parquet_info(spark, output_path)
    in_rows = df.count()
    return {
        "status": "completed" if info["num_rows"] == in_rows
        else "verification_failed",
        "input": nc_path,
        "output": output_path,
        "verified": info["num_rows"] == in_rows,
        "output_info": info,
    }


def write_training_shards(df, output_path: str, id_col: str,
                          n_shards: int, salt: str = "",
                          compression: str = "zstd",
                          overwrite: bool = False) -> dict:
    """Materialize the pre-training corpus as ``shard=K/`` directories in
    the deterministic interleaved order of
    `operators/sampling.training_shards`: one shuffle onto the shard key
    (`repartition(n_shards, shard)` — each shard lives in exactly one
    task), rows sorted by manifest order within the task, and a
    `partitionBy("shard")` write, so every shard directory holds exactly
    ONE file in manifest order. A training reader that streams the
    shard directories in (shard, row) order reproduces the manifest
    exactly — verified here by re-deriving the manifest from the
    written files.

    Scale: shard count IS the write parallelism; no global sort, no
    driver-side state, identical output for any input partitioning."""
    from pyspark.sql import functions as F

    from ..operators.sampling import training_shards

    spark = df.sparkSession
    sharded = training_shards(df, id_col, n_shards, salt)
    mode = "overwrite" if overwrite else "errorifexists"
    (sharded.repartition(n_shards, F.col("shard"))
            .sortWithinPartitions("shard", "pos")
            .write.mode(mode).option("compression", compression)
            .partitionBy("shard")
            .parquet(output_path))
    out = spark.read.parquet(output_path)
    n_in = df.count()
    n_out = out.count()
    shards_seen = out.select("shard").distinct().count()
    ok = n_in == n_out and shards_seen <= n_shards
    return {
        "status": "completed" if ok else "verification_failed",
        "output": output_path,
        "verified": ok,
        "rows": n_out,
        "n_shards": shards_seen,
    }


def curate_corpus(spark: SparkSession, sf_dir: str, output_dir: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  split_weights: dict | None = None,
                  keep_split: str = "train", n_shards: int = 8,
                  salt: str = "", quality_filter: bool = False,
                  lm_filter: bool = False) -> dict:
    """The full training-data curation job in one call: load documents →
    [optional heuristic quality gate] → [optional LM-perplexity gate] →
    exact dedup → deterministic split (keep one named split) → shard
    manifest → one-file-per-shard write (`write_training_shards`) — each
    stage the same op the DSL/operators expose, composed lazily so
    Catalyst sees one plan until the write. Returns stage row counts so
    the job's yield (what each gate, dedup and the split removed) is
    auditable.

    ``quality_filter`` applies the composite heuristic gate of
    `text_keep_filter` (quality blend ≥ 0.49, 25–90 words, char entropy
    ≥ 2.8); ``lm_filter`` applies `operators/text.lm_perplexity`'s
    fluency flag. Gates run before dedup so every later stage pays for
    surviving documents only."""
    from pyspark.sql import functions as F

    from ..operators import text as TX
    from ..operators.dedup import exact_dedup
    from ..operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    doc_cols = docs.columns
    n_in = docs.count()
    n_quality = n_lm = None
    if quality_filter:
        m = TX.char_entropy(TX.quality_score(docs, text_col), text_col)
        nw = F.size(TX.words(text_col))
        docs = (m.where((F.round("quality_score", 6) >= 0.49)
                        & nw.between(25, 90)
                        & (F.round("char_entropy", 6) >= 2.8))
                 .select(*doc_cols))
        n_quality = docs.count()
    if lm_filter:
        keep_ids = (TX.lm_perplexity(docs, text_col, id_col)
                    .where("keep").select(id_col))
        docs = docs.join(keep_ids, id_col, "left_semi")
        n_lm = docs.count()
    keep = exact_dedup(docs, text_col, id_col) \
        .select(F.col("keep_id").alias(id_col))
    deduped = docs.join(keep, id_col, "left_semi")
    n_dedup = deduped.count()
    weights = split_weights or {"train": 0.9, "holdout": 0.1}
    split = deterministic_split(deduped, id_col, weights)
    kept = split.where(F.col("split") == keep_split).drop("split")
    n_split = kept.count()
    result = write_training_shards(kept, output_dir, id_col, n_shards,
                                   salt=salt, overwrite=True)
    n_pre_dedup = (n_lm if n_lm is not None
                   else n_quality if n_quality is not None else n_in)
    result.update({
        "n_input": n_in,
        "n_after_quality": n_quality,
        "n_after_lm": n_lm,
        "n_after_dedup": n_dedup,
        "n_written": n_split,
        "quality_removed": (n_in - n_quality
                            if n_quality is not None else 0),
        "lm_removed": ((n_quality if n_quality is not None else n_in)
                       - n_lm if n_lm is not None else 0),
        "dedup_removed": n_pre_dedup - n_dedup,
        "split_removed": n_dedup - n_split,
        "kept_split": keep_split,
    })
    return result
