"""Batch-job entry points + source-format breadth (CSV/JSON/ORC round
trips with explicit schemas) + approx-vs-exact percentile validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.plans.jobs import convert_dataset, process_dataset
from climate_data_pipeline_spark.sources.io import load_table


def test_process_dataset_end_to_end(spark, sf_small, tmp_path):
    out = str(tmp_path / "monthly")
    result = process_dataset(
        spark, sf_small, "lineitem", out,
        operations=[
            {"op": "slice_time", "column": "l_shipdate",
             "start": "1996-01-01", "end": "1997-12-31"},
            {"op": "resample", "freq": "month", "column": "l_shipdate",
             "keys": ["l_returnflag"],
             "aggs": {"avg_qty": "mean(l_quantity)", "n": "count(l_quantity)"}},
        ],
        layout="balanced", entity_cols=["l_returnflag"], time_col="period")
    assert result["status"] == "completed"
    assert result["operations_applied"] == 2
    back = spark.read.parquet(out)
    assert back.count() == result["output_info"]["num_rows"] > 0
    assert set(back.columns) == {"period", "l_returnflag", "avg_qty", "n"}


def test_convert_dataset_verifies(spark, sf_small, tmp_path):
    out = str(tmp_path / "conv")
    result = convert_dataset(spark, sf_small, "orders", out,
                             layout="timeseries", entity_cols=["o_custkey"],
                             time_col="o_orderdate")
    assert result["status"] == "completed" and result["verified"]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_round_trips(spark, sf_small, tmp_path, fmt):
    """The reference reads one format (NetCDF) and writes one (Zarr);
    Spark's source breadth is a freebie — verify CSV/JSON/ORC round-trip
    with explicit schemas (never inferSchema in production paths)."""
    orders = load_table(spark, sf_small, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    writer = orders.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
        back = (spark.read.schema(orders.schema)
                .option("header", True).csv(path))
    elif fmt == "json":
        writer.json(path)
        back = spark.read.schema(orders.schema).json(path)
    else:
        writer.orc(path)
        back = spark.read.orc(path)
    assert back.count() == orders.count()
    got = back.agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))).first()[0]
    want = orders.agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))).first()[0]
    assert got == want  # exact content parity via scaled-int checksum


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The documented 100 TB path (approx_percentile sketch) must sit
    within tolerance of the exact oracle-parity path."""
    from climate_data_pipeline_spark.operators.percentiles import grouped_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    exact = grouped_percentiles(li, "l_shipdate", "l_extendedprice",
                                groupby=None, exact=True, long_format=False)
    approx = grouped_percentiles(li, "l_shipdate", "l_extendedprice",
                                 groupby=None, exact=False, long_format=False)
    e, a = exact.first(), approx.first()
    for p in (10, 25, 50, 75, 90, 95, 99):
        rel = abs(a[f"p{p}"] - e[f"p{p}"]) / abs(e[f"p{p}"])
        assert rel < 0.01, f"p{p}: approx {a[f'p{p}']} vs exact {e[f'p{p}']}"


def test_write_training_shards_round_trip(spark, sf_small, tmp_path):
    from climate_data_pipeline_spark.operators.sampling import training_shards
    from climate_data_pipeline_spark.plans.jobs import write_training_shards

    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "shards")
    result = write_training_shards(docs, out, "doc_id", n_shards=4)
    assert result["status"] == "completed" and result["verified"]
    assert result["rows"] == docs.count()
    # the written files reproduce the manifest order exactly
    manifest = sorted(map(tuple, training_shards(docs, "doc_id", 4)
                          .select("doc_id", "shard", "pos").collect()))
    back = sorted(map(tuple, spark.read.parquet(out)
                      .select("doc_id", "shard", "pos").collect()))
    assert back == manifest
    # one directory per shard, exactly one file in each
    import glob
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 4
    for d in dirs:
        assert len(glob.glob(d + "/part-*.parquet")) == 1


def test_curate_corpus_end_to_end(spark, sf_small, tmp_path):
    from climate_data_pipeline_spark.plans.jobs import curate_corpus

    out = str(tmp_path / "curated")
    r = curate_corpus(spark, sf_small, out, n_shards=4)
    assert r["status"] == "completed" and r["verified"]
    assert r["n_input"] >= r["n_after_dedup"] >= r["n_written"] > 0
    assert r["rows"] == r["n_written"]
    back = spark.read.parquet(out)
    # every written row is train-split, deduped, sharded with positions
    assert back.select("doc_id").distinct().count() == r["n_written"]
    assert set(back.columns) >= {"doc_id", "text", "shard", "pos"}
    assert back.select("shard").distinct().count() <= 4


def test_curate_corpus_near_dedup_stage(spark, sf_small, tmp_path):
    """near_dedup=True adds the MinHash-LSH pass after exact dedup:
    manifest arithmetic must hold through the extra stage and the
    written corpus must carry no surviving near-dup pair at the
    jaccard_est >= 0.5 gate the stage prunes at."""
    from climate_data_pipeline_spark.operators.dedup import minhash_pairs
    from climate_data_pipeline_spark.plans.jobs import curate_corpus

    out = str(tmp_path / "curated_nd")
    r = curate_corpus(spark, sf_small, out, n_shards=2, near_dedup=True,
                      split_weights={"train": 1.0})
    assert r["status"] == "completed" and r["verified"]
    assert "near_dedup" in r["steps"]
    assert (r["n_after_dedup"] >= r["n_after_near_dedup"]
            == r["n_written"] > 0)
    assert r["near_dedup_removed"] == \
        r["n_after_dedup"] - r["n_after_near_dedup"]
    back = spark.read.parquet(out)
    assert minhash_pairs(back, "text", "doc_id").count() == 0


def test_job_progress_protocol_and_time_limit(spark, sf_small, tmp_path):
    """The Celery-state analogue: multi-stage jobs emit
    ("PROCESSING", step, elapsed) per stage in order, record the step
    sequence in the manifest, and honor the soft time limit by
    returning the reference-shaped failed dict."""
    from climate_data_pipeline_spark.plans.jobs import curate_corpus

    events = []
    out = str(tmp_path / "prog")
    r = process_dataset(
        spark, sf_small, "lineitem", out,
        operations=[
            {"op": "slice_time", "column": "l_shipdate",
             "start": "1996-01-01", "end": "1997-12-31"},
            {"op": "resample", "freq": "month", "column": "l_shipdate",
             "keys": ["l_returnflag"],
             "aggs": {"avg_qty": "mean(l_quantity)"},
             "name": "monthly_rollup"},
        ],
        progress=lambda st, step, el: events.append((st, step, el)))
    assert r["status"] == "completed"
    assert [e[1] for e in events] == r["steps"] == [
        "loading", "slice_time", "monthly_rollup", "saving", "verifying"]
    assert all(st == "PROCESSING" for st, _, _ in events)
    assert all(b[2] >= a[2] for a, b in zip(events, events[1:]))

    # exhausted time limit → failed result with the steps run so far
    r = process_dataset(spark, sf_small, "lineitem",
                        str(tmp_path / "never"), time_limit=-1.0)
    assert r["status"] == "failed" and "time limit" in r["error"]
    assert r["steps"] == []

    steps = []
    r = curate_corpus(spark, sf_small, str(tmp_path / "cur_prog"),
                      n_shards=2, quality_filter=True,
                      progress=lambda st, step, el: steps.append(step))
    assert r["status"] == "completed"
    assert steps == r["steps"] == [
        "loading", "quality_filter", "dedup", "split", "writing"]

    # any-exception → reference-shaped failed dict, not a raise
    # (celery_tasks.py:77-81 catches Exception)
    r = process_dataset(spark, sf_small, "lineitem",
                        str(tmp_path / "badop"),
                        operations=[{"op": "no_such_op"}])
    assert r["status"] == "failed" and "no_such_op" in r["error"]


def test_index_and_shard_jobs_progress_protocol(spark, sf_small, tmp_path):
    """build_lsh_index / write_training_shards follow the same
    Celery-state step protocol as process_dataset."""
    from climate_data_pipeline_spark.plans.jobs import (
        build_lsh_index,
        write_training_shards,
    )
    from climate_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_small, "embeddings")
    steps = []
    m = build_lsh_index(emb, str(tmp_path / "idx"), n_planes=6, dim=64,
                        progress=lambda st, step, el: steps.append(step))
    assert m["status"] == "completed"
    assert steps == m["steps"] == ["hashing", "writing", "verifying"]
    # soft limit at stage boundaries → failed dict with steps so far
    m = build_lsh_index(emb, str(tmp_path / "idx2"), time_limit=-1.0)
    assert m["status"] == "failed" and m["steps"] == []

    docs = load_table(spark, sf_small, "documents")
    steps = []
    m = write_training_shards(
        docs, str(tmp_path / "shards"), "doc_id", n_shards=4,
        progress=lambda st, step, el: steps.append(step))
    assert m["status"] == "completed" and m["verified"]
    assert steps == m["steps"] == ["sharding", "writing", "verifying"]
    # an existing output dir is an ordinary error → failed dict
    m = write_training_shards(docs, str(tmp_path / "shards"), "doc_id",
                              n_shards=4)
    assert m["status"] == "failed" and m["steps"] == ["sharding",
                                                      "writing"]


def test_append_and_query_lsh_index_progress_protocol(spark, sf_small,
                                                      tmp_path):
    """append_lsh_index / query_lsh_index complete the job-protocol
    coverage: every multi-stage index job emits its step sequence."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.plans.jobs import (
        append_lsh_index,
        build_lsh_index,
        query_lsh_index,
    )
    from climate_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_small, "embeddings")
    idx = str(tmp_path / "idx")
    assert build_lsh_index(emb, idx, n_planes=6,
                           dim=64)["status"] == "completed"

    batch = (emb.where(F.col("vec_id") < 5)
                .select((F.col("vec_id") + 100000).alias("vec_id"),
                        "embedding"))
    steps = []
    m = append_lsh_index(batch, idx, n_planes=6, dim=64,
                         progress=lambda st, step, el: steps.append(step))
    assert m["status"] == "completed" and m["rows_appended"] == 5
    # counting FIRST: a failure after the write commits must not hand
    # the caller a retryable 'failed' that double-appends the batch
    assert steps == m["steps"] == ["counting", "hashing", "appending"]
    # soft limit → failed dict, no partial append visible in the result
    m = append_lsh_index(batch, idx, n_planes=6, dim=64, time_limit=-1.0)
    assert m["status"] == "failed" and m["steps"] == []

    queries = (emb.where(F.col("vec_id") < 3)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    steps = []
    out = query_lsh_index(spark, idx, queries, k=2, n_planes=6, dim=64,
                          progress=lambda st, step, el: steps.append(step))
    assert steps == ["hashing", "probing", "planning"]
    rows = out.collect()
    assert rows and all(r["rank"] <= 2 for r in rows)
    # appended rows are immediately visible: a probe identical to an
    # appended vector (which duplicates base vec_id 0) must find its
    # exact twin at cosine 1.0
    probe = (batch.where(F.col("vec_id") == 100000)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    hit = query_lsh_index(spark, idx, probe, k=1, n_planes=6, dim=64)
    top = hit.first()
    assert top["cosine"] == 1.0 and top["vec_id"] == 0


def test_curate_corpus_with_quality_and_lm_gates(spark, sf_small, tmp_path):
    from climate_data_pipeline_spark.plans.jobs import curate_corpus

    out = str(tmp_path / "curated_gated")
    r = curate_corpus(spark, sf_small, out, n_shards=2,
                      quality_filter=True, lm_filter=True)
    assert r["status"] == "completed" and r["verified"]
    # gate ordering: input >= quality >= lm >= dedup >= written
    assert (r["n_input"] >= r["n_after_quality"] >= r["n_after_lm"]
            >= r["n_after_dedup"] >= r["n_written"] > 0)
    assert r["quality_removed"] == r["n_input"] - r["n_after_quality"]
    assert r["lm_removed"] == r["n_after_quality"] - r["n_after_lm"]
    assert r["dedup_removed"] == r["n_after_lm"] - r["n_after_dedup"]


def test_lsh_index_build_query_roundtrip(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.similarity import (
        lsh_ann_multiprobe)
    from climate_data_pipeline_spark.plans.jobs import (
        build_lsh_index, query_lsh_index)
    from climate_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_small, "embeddings")
    path = str(tmp_path / "lsh_index")
    m = build_lsh_index(emb, path, n_planes=6, dim=64)
    assert m["status"] == "completed" and m["rows"] == emb.count()

    queries = (emb.where(F.col("vec_id") < 10)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    got = query_lsh_index(spark, path, queries, k=3)
    want = lsh_ann_multiprobe(queries, emb, k=3, n_planes=6, dim=64)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    # the probe read must prune to the probed bucket partitions
    probed = spark.read.parquet(path).where(F.col("bucket").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_lsh_index_incremental_append(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.similarity import (
        lsh_ann_multiprobe)
    from climate_data_pipeline_spark.plans.jobs import (
        append_lsh_index, build_lsh_index, query_lsh_index)
    from climate_data_pipeline_spark.sources.io import load_table

    emb = load_table(spark, sf_small, "embeddings")
    path = str(tmp_path / "lsh_grow")
    build_lsh_index(emb.where(F.col("vec_id") % 2 == 0), path)
    r = append_lsh_index(emb.where(F.col("vec_id") % 2 == 1), path)
    assert r["rows_appended"] > 0
    assert spark.read.parquet(path).count() == emb.count()

    queries = (emb.where(F.col("vec_id") < 10)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    got = sorted(map(tuple,
                     query_lsh_index(spark, path, queries, k=3).collect()))
    want = sorted(map(tuple, lsh_ann_multiprobe(
        queries, emb, k=3, n_planes=6, dim=64).collect()))
    assert got == want


def test_curate_corpus_normalize_stage(spark, sf_small, tmp_path):
    """normalize=True NFC-canonicalizes text before the gates: step
    sequence includes the stage and the job completes."""
    from climate_data_pipeline_spark.plans.jobs import curate_corpus

    steps = []
    r = curate_corpus(spark, sf_small, str(tmp_path / "norm"),
                      n_shards=2, normalize=True,
                      progress=lambda st, step, el: steps.append(step))
    assert r["status"] == "completed"
    assert steps[:2] == ["loading", "normalize"]
    assert r["n_after_dedup"] <= r["n_input"]


def test_curate_media_corpus_end_to_end(spark, sf_small, tmp_path):
    """curate_media_corpus: byte-dedup BEFORE decode, per-modality
    screen, audited manifest, Celery-state step protocol."""
    import io
    import wave

    import numpy as np

    from climate_data_pipeline_spark.plans.jobs import curate_media_corpus

    def wav16(samples) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.asarray(samples, "<i2").tobytes())
        return buf.getvalue()

    def pgm(vals) -> bytes:
        px = np.resize(np.asarray(vals, np.uint8), 256)
        return b"P5\n16 16\n255\n" + px.tobytes()

    good_img = pgm([100, 150, 90])
    blank_img = pgm([0])                       # mean 0 -> screened out
    good_wav = wav16([3000, -2500] * 200)
    silent_wav = wav16([0] * 400)              # rms 0 -> screened out
    rows = [
        (0, "image/x-portable-graymap", bytearray(good_img), len(good_img)),
        (1, "image/x-portable-graymap", bytearray(good_img), len(good_img)),
        (2, "image/x-portable-graymap", bytearray(blank_img), len(blank_img)),
        (3, "audio/wav", bytearray(good_wav), len(good_wav)),
        (4, "audio/wav", bytearray(silent_wav), len(silent_wav)),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "n_bytes long")
    steps = []
    out = str(tmp_path / "media")
    m = curate_media_corpus(
        spark, sf_small, out, media=media, n_shards=2,
        progress=lambda st, step, el: steps.append(step))
    assert m["status"] == "completed"
    assert steps == m["steps"] == [
        "loading", "dedup_bytes", "decoding", "screening", "writing",
        "verifying"]
    # id 1 duplicates id 0's bytes -> dropped pre-decode; blank image
    # and silent clip decode but fail the screen
    assert m["stage_counts"] == {"input": 5, "unique_payloads": 4,
                                 "decoded": 4, "kept": 2}
    assert m["kept_by_kind"] == {"image": 1, "audio": 1}
    got = spark.read.parquet(out)
    assert sorted(r["media_id"] for r in got.collect()) == [0, 3]
    assert m["output_info"]["num_rows"] == 2

    # soft time limit -> reference-shaped failed dict
    m = curate_media_corpus(spark, sf_small, out, media=media,
                            time_limit=-1.0)
    assert m["status"] == "failed" and m["steps"] == []


def test_curate_media_corpus_default_source(spark, sf_small, tmp_path):
    """Default media source: synthesize_media over the documents table
    (even ids PGM, odd WAV) — the job runs end-to-end on driver
    testdata and keeps a sane fraction of both modalities."""
    from climate_data_pipeline_spark.plans.jobs import curate_media_corpus

    out = str(tmp_path / "m2")
    m = curate_media_corpus(spark, sf_small, out, n_shards=2)
    assert m["status"] == "completed"
    sc = m["stage_counts"]
    assert sc["input"] == 500
    assert 0 < sc["unique_payloads"] <= 500
    assert sc["kept"] > 0 and set(m["kept_by_kind"]) <= {"image", "audio"}


def test_curate_media_corpus_same_id_duplicates_collapse(spark, sf_small,
                                                         tmp_path):
    """A payload ingested twice under the SAME media_id (a re-read
    shard unioned into the input) must still collapse to one row —
    the semi join alone keeps both."""
    import numpy as np

    from climate_data_pipeline_spark.plans.jobs import curate_media_corpus

    img = b"P5\n16 16\n255\n" + bytes(np.full(256, 120, np.uint8))
    rows = [(0, "image/x-portable-graymap", bytearray(img), len(img))] * 3
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "n_bytes long")
    out = str(tmp_path / "m3")
    m = curate_media_corpus(spark, sf_small, out, media=media)
    assert m["status"] == "completed"
    assert m["stage_counts"] == {"input": 3, "unique_payloads": 1,
                                 "decoded": 1, "kept": 1}


def test_curate_web_corpus_end_to_end(spark, sf_small, tmp_path):
    """curate_web_corpus: WARC extraction feeds the SAME audited
    curation stages — HTTP/length screens, exact dedup over recovered
    text, sharded write; duplicate pages collapse, non-2xx pages and
    empty extractions are screened before any hashing."""
    from climate_data_pipeline_spark.plans.jobs import curate_web_corpus
    from climate_data_pipeline_spark.sources.warc import (
        build_warc, build_warc_response, html_escape)

    def page(doc_id, text, status=200, gz=False):
        html = (f"<html><body><p>{html_escape(text)}</p>"
                f"</body></html>").encode()
        rec = build_warc_response(f"https://t.org/{doc_id}", html,
                                  "2024-01-01T00:00:00Z",
                                  f"{doc_id:032x}", status)
        return build_warc([rec], gzip_members=gz)

    rows = [
        (0, bytearray(page(0, "unique page zero", gz=True))),
        (1, bytearray(page(1, "shared   body", gz=False))),
        (2, bytearray(page(2, "shared body"))),   # dups after collapse
        (3, bytearray(page(3, "gone page", status=404))),
        (4, bytearray(page(4, ""))),              # empty extraction
    ]
    warc_df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = str(tmp_path / "web")
    m = curate_web_corpus(spark, sf_small, out, warc_df=warc_df,
                          n_shards=2, split_weights={"train": 1.0})
    assert m["status"] == "completed", m
    assert m["n_warc_records"] == 5
    assert m["n_http_ok"] == 3                   # 404 + empty screened
    # ids 1 and 2 collapse to the same text after whitespace collapse
    assert m["n_input"] == 3 and m["n_after_dedup"] == 2
    assert m["dedup_removed"] == 1
    got = spark.read.parquet(out)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["shared body", "unique page zero"]

    # failure protocol: impossible time limit -> failed dict
    m = curate_web_corpus(spark, sf_small, out, warc_df=warc_df,
                          time_limit=-1.0)
    assert m["status"] == "failed"
