"""Tests for the op-dict DSL, pipelines, metric dispatcher, catalog and
streaming analogues."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.plans import (
    LazyPipeline,
    Pipeline,
    compile_ops,
    run_metric,
    run_ops,
)
from climate_data_pipeline_spark.plans.dispatch import METRIC_TYPES
from climate_data_pipeline_spark.plans.pipeline import execute_parallel
from climate_data_pipeline_spark.sources.catalog import Catalog
from climate_data_pipeline_spark.sources.io import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_ops_compiler_validates_eagerly():
    with pytest.raises(ValueError, match="unknown aggregate"):
        compile_ops([{"op": "resample", "column": "ts",
                      "aggs": {"x": "median(v)"}}])
    with pytest.raises(ValueError, match="missing 'op'"):
        compile_ops([{"column": "ts"}])
    # regression: a typo'd op NAME must fail at compile time too —
    # before any load/earlier op runs, which is the point of the
    # up-front compile in process_dataset
    with pytest.raises(ValueError, match="unknown op 'fliter'"):
        compile_ops([{"op": "fliter", "expr": "x > 0"}])


def test_known_ops_matches_apply_op_dispatch():
    """KNOWN_OPS (the compile-time whitelist) must stay in sync with
    the `kind ==` dispatch in _apply_op — parse the source."""
    import inspect
    import re

    from climate_data_pipeline_spark.plans import ops as ops_mod

    src = inspect.getsource(ops_mod._apply_op)
    handled = set(re.findall(r'kind == "([a-z_]+)"', src))
    assert handled == set(ops_mod.KNOWN_OPS)


def test_ops_unknown_column_raises(lineitem):
    with pytest.raises(ValueError, match="unknown columns"):
        run_ops(lineitem, [{"op": "select", "columns": ["nope"]}])


def test_ops_chain_matches_direct(lineitem):
    ops = [
        {"op": "slice_time", "column": "l_shipdate",
         "start": "1996-01-01", "end": "1996-12-31"},
        {"op": "compute_mean", "keys": ["l_returnflag"],
         "values": ["l_quantity"]},
    ]
    got = {r["l_returnflag"]: r["avg_l_quantity"]
           for r in run_ops(lineitem, ops).collect()}
    want = {r["l_returnflag"]: r["avg"]
            for r in (lineitem
                      .where(F.col("l_shipdate").between("1996-01-01",
                                                         "1996-12-31"))
                      .groupBy("l_returnflag")
                      .agg(F.avg("l_quantity").alias("avg"))).collect()}
    assert got == want


def test_ops_pushdown_reaches_scan(spark, sf_small):
    # use a scale dir no fixture caches: the cache manager substitutes any
    # matching cached plan subtree (InMemoryRelation), and a cache read
    # shows the cache's original unfiltered FileScan instead of pushdown
    fresh = load_table(spark, sf_small, "lineitem")
    ops = [{"op": "slice_time", "column": "l_shipdate",
            "start": "1996-01-01", "end": "1996-12-31"},
           {"op": "select", "columns": ["l_shipdate", "l_quantity"]}]
    plan = run_ops(fresh, ops)._jdf.queryExecution().executedPlan().toString()
    # the DSL chain is lazy → Catalyst pushes the time slice into the scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters")[1][:200]


def test_pipeline_steps_and_timing(lineitem):
    p = Pipeline()
    p.add_step("filter", lambda df: df.where(F.col("l_quantity") > 10))
    p.add_step("agg", lambda df: df.groupBy("l_returnflag").count())
    out = p.execute(lineitem, materialize=True)
    assert out.count() == 3
    assert set(p.timings) == {"filter", "agg", "__materialize__"}


def test_lazy_pipeline_graph_info(lineitem):
    lp = (LazyPipeline(lineitem)
          .transform(lambda df: df.groupBy("l_returnflag").count()))
    info = lp.graph_info()
    assert info["num_exchanges"] >= 1  # groupBy must shuffle
    assert info["wholestage_codegen_spans"] >= 1
    assert lp.compute().count() == 3


def test_execute_parallel(lineitem):
    parts = [lineitem.where(F.col("l_returnflag") == f) for f in ("A", "N", "R")]
    outs = execute_parallel(parts,
                            lambda df: df.groupBy("l_linestatus").count(),
                            max_workers=3)
    assert len(outs) == 3
    assert all(o.count() >= 1 for o in outs)


def test_metric_dispatcher_all_types(lineitem):
    for metric in METRIC_TYPES:
        if metric == "mann_kendall":
            continue  # exercised on aggregated series in test_operators
        out = run_metric(lineitem, metric, "l_shipdate", "l_quantity",
                         keys=["l_returnflag"])
        assert out.columns  # plan builds and binds


def test_metric_dispatcher_unknown():
    with pytest.raises(ValueError, match="unknown metric_type"):
        run_metric(None, "nope", "ts", "v")


def test_catalog_register_describe(spark, sf_dir):
    cat = Catalog(spark).register_sf_dir(sf_dir)
    assert "lineitem" in cat.list_datasets()
    cat.register("li_alias", f"{sf_dir}/lineitem.parquet", title="Lineitem",
                 attrs={"conventions": "tpch-ish"},
                 var_attrs={"l_quantity": {"units": "count"}})
    desc = cat.describe("li_alias", compute_extents=True)
    assert desc["variables"]["l_quantity"]["units"] == "count"
    assert desc["num_rows"] > 0
    assert desc["time_range"]["start"].startswith("1995")
    stac = cat.to_stac_items()
    assert any(i["id"] == "li_alias" for i in stac)
    with pytest.raises(KeyError, match="not registered"):
        cat.describe("missing")


def test_catalog_events_loader_handles_nanos(spark, sf_dir):
    cat = Catalog(spark).register_sf_dir(sf_dir)
    ev = cat.load("events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_streaming_rollup_matches_batch(spark, sf_dir):
    from climate_data_pipeline_spark.streaming import streaming_rollup
    from climate_data_pipeline_spark.streaming.rollup import run_stream_to_memory

    agg = streaming_rollup(spark, sf_dir, window="1 day", watermark="1 hour")
    run_stream_to_memory(agg, "rollup_out", output_mode="complete")
    got = {(str(r["window_start"]), r["event_type"]): r["n"]
           for r in spark.sql("SELECT * FROM rollup_out").collect()}

    ev = load_table(spark, sf_dir, "events")
    want = {(str(r["d"]), r["event_type"]): r["n"]
            for r in (ev.groupBy(F.date_trunc("day", "ts").alias("d"),
                                 "event_type")
                        .agg(F.count("*").alias("n"))).collect()}
    assert got == want


def test_streaming_sessionize_runs(spark, sf_dir):
    from climate_data_pipeline_spark.streaming import streaming_sessionize
    from climate_data_pipeline_spark.streaming.rollup import run_stream_to_memory

    s = streaming_sessionize(spark, sf_dir, gap="30 minutes")
    run_stream_to_memory(s, "sessions_out", output_mode="complete")
    n = spark.sql("SELECT count(*) c FROM sessions_out").first()["c"]
    assert n > 0


def test_streaming_stateful_zscore(spark, sf_dir):
    from climate_data_pipeline_spark.streaming.rollup import (
        run_stream_to_memory,
        streaming_running_zscore,
    )

    out = streaming_running_zscore(spark, sf_dir, min_history=5)
    run_stream_to_memory(out, "zscore_out", output_mode="append")
    res = spark.sql("SELECT * FROM zscore_out")
    assert res.count() > 0
    # single micro-batch → every row scored against empty history = null z
    assert res.where(F.col("zscore").isNotNull()).count() == 0
    assert res.where(F.col("history_n") != 0).count() == 0


def test_streaming_dedup_recovers_exactly_once(spark, sf_dir):
    from climate_data_pipeline_spark.sources.io import load_table
    from climate_data_pipeline_spark.streaming.rollup import (
        run_stream_to_memory, streaming_dedup)

    deduped = streaming_dedup(spark, sf_dir)
    run_stream_to_memory(deduped, "dedup_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d "
                    "FROM dedup_out").collect()[0]
    n_batch = load_table(spark, sf_dir, "events").count()
    assert got["n"] == n_batch      # doubled input, each recovered once
    assert got["d"] == n_batch


def test_streaming_enrich_matches_batch_join(spark, sf_dir):
    import pyspark.sql.functions as F

    from climate_data_pipeline_spark.sources.io import load_table
    from climate_data_pipeline_spark.streaming.rollup import (
        run_stream_to_memory, streaming_enrich)

    ev = load_table(spark, sf_dir, "events")
    dim = (ev.select("event_type").distinct()
             .withColumn("category", F.upper("event_type")))
    run_stream_to_memory(streaming_enrich(spark, sf_dir, dim), "enriched")
    got = {(r["category"], r["n"]) for r in
           spark.table("enriched").groupBy("category")
                .agg(F.count("*").alias("n")).collect()}
    want = {(r["category"], r["n"]) for r in
            ev.join(dim, "event_type", "left").groupBy("category")
              .agg(F.count("*").alias("n")).collect()}
    assert got == want and len(got) > 0


def test_streaming_ingest_once_idempotent(spark, sf_dir, tmp_path):
    from climate_data_pipeline_spark.sources.io import load_table
    from climate_data_pipeline_spark.streaming.rollup import streaming_ingest_once

    target = str(tmp_path / "ingested")
    n_batch = load_table(spark, sf_dir, "events").count()
    for rerun in range(2):  # second run = full source replay, no checkpoint
        q = streaming_ingest_once(spark, sf_dir, target)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        import shutil
        shutil.rmtree(target + "_chk", ignore_errors=True)
        got = spark.read.parquet(target)
        assert got.count() == n_batch, f"rerun {rerun}"
        assert got.select("event_id").distinct().count() == n_batch


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir):
    """The stream twin runs the batch operator per micro-batch against the
    same signature store — with a single micro-batch (the whole file is
    one trigger here) the results must be byte-equal to the batch op."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.dedup import incremental_dedup
    from climate_data_pipeline_spark.streaming.rollup import (
        streaming_incremental_dedup)

    import tempfile
    target = tempfile.mkdtemp() + "/screened"
    q = streaming_incremental_dedup(spark, sf_dir, target)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.read.parquet(target).collect()))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = sorted(map(tuple, incremental_dedup(
        docs.where(F.col("doc_id") % 5 != 0),
        docs.where(F.col("doc_id") % 5 == 0),
        "text", "doc_id").collect()))
    assert got == want and len(got) > 0


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    from climate_data_pipeline_spark.sources.io import load_table
    from climate_data_pipeline_spark.streaming.rollup import (
        run_stream_to_memory, streaming_interval_join)

    out = streaming_interval_join(spark, sf_dir, tolerance="1 hour")
    run_stream_to_memory(out, "ssj_out", output_mode="append")
    got = sorted(map(tuple, spark.table("ssj_out")
                 .select("user_id", "view_id", "click_id").collect()))

    e = load_table(spark, sf_dir, "events")
    v = (e.where(F.col("event_type") == "view")
         .select(F.col("user_id").alias("vu"), F.col("ts").alias("vt"),
                 F.col("event_id").alias("view_id")))
    c = (e.where(F.col("event_type") == "click")
         .select(F.col("user_id").alias("cu"), F.col("ts").alias("ct"),
                 F.col("event_id").alias("click_id")))
    batch = (v.join(c, F.expr(
        "vu = cu AND ct >= vt AND ct <= vt + interval 1 hour"))
        .select(F.col("vu").alias("user_id"), "view_id", "click_id"))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_streaming_tws_zscore_equals_applyinpandas(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) and
    applyInPandasWithState must produce identical anomaly rows.

    The tws KERNEL parity runs EVERYWHERE: `make_zscore_detector`'s
    StatefulProcessor is driven with a stub handle (plain-Python
    ValueState) over per-user batches and compared against the full
    applyInPandasWithState streaming run. Where protobuf is installed
    the same detector additionally executes through the real
    transformWithStateInPandas state-server transport; without it only
    the transport goes unexercised (environmental), never the logic.
    Plan construction of the tws query is asserted unconditionally."""
    import math

    from climate_data_pipeline_spark.streaming.rollup import (
        make_zscore_detector,
        run_stream_to_memory,
        streaming_running_zscore,
        streaming_running_zscore_tws,
    )

    # 1) the apws streaming run — the reference output
    run_stream_to_memory(
        streaming_running_zscore(spark, sf_dir, min_history=5),
        "apws_out", output_mode="append")

    def norm(it):
        return {(u, e, n,
                 None if z is None or (isinstance(z, float)
                                       and math.isnan(z))
                 else round(z, 9))
                for u, e, n, z in it}

    apws = norm((r["user_id"], r["event_id"], r["history_n"],
                 r["zscore"])
                for r in spark.sql("SELECT * FROM apws_out").collect())
    assert len(apws) > 0

    # 2) tws plan constructs without protobuf and carries the operator
    tws_df = streaming_running_zscore_tws(spark, sf_dir, min_history=5)
    assert tws_df.isStreaming
    assert "TransformWithState" in \
        tws_df._jdf.queryExecution().analyzed().toString()

    # 3) kernel parity: drive the SAME StatefulProcessor with a stub
    # handle over per-user batches (what the transport would feed)
    class _StubState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

    class _StubHandle:
        def getValueState(self, name, schema):
            return _StubState()

    Detector = make_zscore_detector(min_history=5)
    events = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .selectExpr("user_id", "event_id",
                          "CAST(ts AS TIMESTAMP) AS ts", "value")
              .toPandas())
    got = set()
    for uid, pdf in events.groupby("user_id"):
        det = Detector()          # state is per-key in the transport
        det.init(_StubHandle())
        for out in det.handleInputRows((uid,), iter([pdf]), None):
            got |= norm(zip(out["user_id"], out["event_id"],
                            out["history_n"], out["zscore"]))
    assert got == apws

    # 4) full transport execution where the protocol deps exist
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        return
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    rocks = ("org.apache.spark.sql.execution.streaming."
             "state.RocksDBStateStoreProvider")
    try:
        spark.conf.set(key, rocks)
        run_stream_to_memory(tws_df, "tws_out", output_mode="append")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    tws = norm((r["user_id"], r["event_id"], r["history_n"],
                r["zscore"])
               for r in spark.sql("SELECT * FROM tws_out").collect())
    assert tws == apws


def test_dsl_pipeline_verbs(spark, sf_dir):
    """The op-dict DSL's training-pipeline verbs compose with the
    reference's original four and mirror the operators they wrap."""
    from climate_data_pipeline_spark.operators.dedup import exact_dedup
    from climate_data_pipeline_spark.operators.sampling import (
        deterministic_sample, deterministic_split, training_shards)
    from climate_data_pipeline_spark.plans.ops import run_ops
    from climate_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    # dedup_exact keeps exactly the canonical ids
    out = run_ops(docs, [{"op": "dedup_exact", "id": "doc_id",
                          "text": "text"}])
    keep = {r["keep_id"] for r in
            exact_dedup(docs, "text", "doc_id").collect()}
    assert {r["doc_id"] for r in out.collect()} == keep
    # sample == operator
    s_dsl = {r["doc_id"] for r in run_ops(
        docs, [{"op": "sample", "id": "doc_id",
                "fraction": 0.3, "salt": "x"}]).collect()}
    s_op = {r["doc_id"] for r in deterministic_sample(
        docs, "doc_id", 0.3, salt="x").collect()}
    assert s_dsl == s_op and 0 < len(s_dsl) < docs.count()
    # split keeps one named split
    w = {"train": 0.8, "val": 0.2}
    tr = {r["doc_id"] for r in run_ops(
        docs, [{"op": "split", "id": "doc_id", "weights": w,
                "keep": "train"}]).collect()}
    full = {r["doc_id"]: r["split"] for r in
            deterministic_split(docs, "doc_id", w).collect()}
    assert tr == {k for k, v in full.items() if v == "train"}
    # shard chains after a filter, matches the operator
    got = sorted(map(tuple, run_ops(
        docs, [{"op": "filter", "expr": "doc_id % 2 = 0"},
               {"op": "shard", "id": "doc_id", "n_shards": 4}])
        .select("doc_id", "shard", "pos").collect()))
    want = sorted(map(tuple, training_shards(
        docs.where("doc_id % 2 = 0"), "doc_id", 4)
        .select("doc_id", "shard", "pos").collect()))
    assert got == want


def test_dsl_lm_filter_verb(spark, sf_dir):
    from climate_data_pipeline_spark.operators.text import lm_perplexity
    from climate_data_pipeline_spark.plans.ops import run_ops
    from climate_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = {r["doc_id"] for r in run_ops(
        docs, [{"op": "lm_filter", "id": "doc_id",
                "text": "text", "nll_threshold": 3.35}]).collect()}
    want = {r["doc_id"] for r in
            lm_perplexity(docs, "text", "doc_id", 3.35)
            .where("keep").collect()}
    assert out == want
    assert 0 < len(out) < docs.count()   # threshold actually splits


def test_dsl_gopher_filter_verb(spark, sf_dir):
    from climate_data_pipeline_spark.operators.text import gopher_rules
    from climate_data_pipeline_spark.plans.ops import run_ops
    from climate_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    from climate_data_pipeline_spark.operators.text import ENGLISH_STOPWORDS
    out = {r["doc_id"] for r in run_ops(
        docs, [{"op": "gopher_filter", "id": "doc_id", "text": "text",
                "min_words": 30,
                "stopwords": list(ENGLISH_STOPWORDS)}]).collect()}
    want = {r["doc_id"] for r in
            gopher_rules(docs, "text", "doc_id", min_words=30,
                         stopwords=ENGLISH_STOPWORDS)
            .where("pass").collect()}
    assert out == want
    assert 0 < len(out) < docs.count()   # rules actually split the corpus


def test_streaming_lm_gate_matches_batch(spark, sf_dir):
    """The streaming LM gate scores each micro-batch against the static
    corpus LM through the same batch operator — single-trigger results
    must equal the batch ref= call, and unseen-bigram fallback must not
    drop any arriving document with >= 2 words."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.text import (
        lm_perplexity, words)
    from climate_data_pipeline_spark.streaming.rollup import (
        streaming_lm_gate)

    import tempfile
    target = tempfile.mkdtemp() + "/gated"
    q = streaming_lm_gate(spark, sf_dir, target)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.read.parquet(target).collect()))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = sorted(map(tuple, lm_perplexity(
        docs.where(F.col("doc_id") % 5 == 0), "text", "doc_id",
        ref=docs.where(F.col("doc_id") % 5 != 0)).collect()))
    assert got == want and len(got) > 0
    n_scoreable = (docs.where(F.col("doc_id") % 5 == 0)
                   .where(F.size(words("text")) >= 2).count())
    assert len(got) == n_scoreable


def test_dsl_nfc_normalize_verb(spark, sf_dir):
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.plans.ops import run_ops
    from climate_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20).select(
        "doc_id", F.concat(F.col("text"),
                           F.lit(" café")).alias("text"))
    out = run_ops(docs, [{"op": "nfc_normalize", "text": "text"}])
    assert out.columns == ["doc_id", "text"]     # in-place, no extras
    rows = out.collect()
    assert all(r["text"].endswith(" café") for r in rows)


def test_streaming_winnow_contamination_matches_batch(spark, sf_dir):
    """The winnowing contamination screen's stream twin: one micro-batch
    must be byte-equal to composing the batch operator directly, every
    arriving doc gets a decision row, and at least one planted
    contamination is caught (even-id docs share text with odd-id dups
    in the synthetic corpus, or we plant one)."""
    import tempfile

    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.operators.text import (
        winnow_fingerprints)
    from climate_data_pipeline_spark.streaming.rollup import (
        streaming_winnow_contamination)

    target = tempfile.mkdtemp() + "/contam"
    q = streaming_winnow_contamination(spark, sf_dir, target)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.read.parquet(target).collect()))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    store = (winnow_fingerprints(corpus, "text", "doc_id", k=12, w=8)
             .select(F.col("doc_id").alias("corpus_doc"), "hash")
             .distinct())
    fp = (winnow_fingerprints(batch, "text", "doc_id", k=12, w=8)
          .select("doc_id", "hash").distinct())
    hits = (fp.join(store, "hash")
              .groupBy("doc_id", "corpus_doc")
              .agg(F.count("*").alias("n_shared"))
              .where(F.col("n_shared") >= 3))
    best = hits.groupBy("doc_id").agg(
        F.max(F.struct("n_shared", "corpus_doc")).alias("b"))
    want = sorted(map(tuple, batch.select("doc_id")
                  .join(best, "doc_id", "left")
                  .select("doc_id",
                          F.col("b.corpus_doc").alias("matched_corpus_doc"),
                          F.coalesce(F.col("b.n_shared"), F.lit(0))
                           .cast("long").alias("n_shared"),
                          F.col("b.n_shared").isNotNull()
                           .alias("contaminated")).collect()))
    assert got == want
    # every arriving doc got a decision row
    assert len(got) == batch.count()
