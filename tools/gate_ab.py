"""Above-gate A/B for the checkpoint_above_gate sites (r11 verdict ask #4).

The r11 size-gated materializations engaged only above 256 MB of source
input; bench, driver and tests all ran far below it, so the claimed win
("stop re-scanning the corpus once per consumer") had equivalence
evidence but no above-gate timing. This harness builds a genuinely
above-gate input ONCE (off-bench, deterministic replication), then runs
the gated query with the gate FORCED OFF vs ON, interleaved A-B-A-B in
one session, asserting row equality between arms and recording
executed-plan parquet-scan counts + timings.

OUTCOME (r12): the measurements RETRACTED the pattern — executed plans
at every tested scale show AQE ReusedExchange on the heavy exchanges
(against the r11 "no reuse" premise), and the forced-checkpoint arm ran
slower steady-state at 279 MB and 3.3 GB (set_ops: 7.5 s vs 4.6-5.8 s,
37-48 s vs 20-37 s) and a wash at 54 MB (source_overlap, 64-88 s both
arms). The auto gates are now off
(dedup.SOURCE_OVERLAP_CKPT_MIN_BYTES = None); this harness keeps the
forced arms runnable so the retraction stays reproducible.

Usage: python tools/gate_ab.py {source_overlap|set_ops} [iters]
Writes plans/r12/gate_ab_<site>.txt (plan excerpts + timings).
"""

from __future__ import annotations

import json
import os
import sys
import time


BASE = "/tmp/cdps_gate_ab"
GATE = 256 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    return sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path) if not f.startswith("_"))


def build_big(spark, sf_dir: str) -> str:
    """Deterministic above-gate replica dir: documents ×440 (the ×10
    protocol's salted near-copies, built via one explode instead of a
    440-way union) and orders ×200 (keys shifted per replica so yearly
    cohorts scale linearly). Reuses an existing build."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.sources.io import load_table

    out = f"{BASE}_{os.path.basename(sf_dir.rstrip('/'))}"
    done = os.path.join(out, "_BUILT")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    rep = F.explode(F.sequence(F.lit(0), F.lit(439))).alias("__k")
    big_docs = (docs.select("*", rep)
        .withColumn("text", F.when(
            (F.col("__k") == 0) | (F.col("doc_id") % 10 == 0),
            F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.concat(
                F.lit("zzrep"), F.col("__k").cast("string"), F.lit("x"),
                F.col("doc_id").cast("string")))))
        .withColumn("doc_id", F.col("doc_id") + F.col("__k") * n_docs)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__k"))
    big_docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey"), F.max("o_custkey")).first()
    max_ok, max_ck = int(mx[0]) + 1, int(mx[1]) + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(199))).alias("__k")
    big_orders = (o.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey")
                    + F.col("__k").cast("long") * max_ok)
        .withColumn("o_custkey", F.col("o_custkey")
                    + F.col("__k").cast("long") * max_ck)
        .drop("__k"))
    big_orders.write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "embeddings"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(done, "w") as f:
        f.write(f"source={sf_dir} docs x440 orders x200\n")
    return out


def main() -> None:
    site = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from climate_data_pipeline_spark import registry
    from climate_data_pipeline_spark.operators import dedup
    from climate_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"gate-ab-{site}")
    spark.sparkContext.setLogLevel("ERROR")
    big = build_big(spark, sf_dir)
    qname = {"source_overlap": "corpus_source_overlap",
             "set_ops": "set_ops"}[site]
    src_table = {"source_overlap": "documents", "set_ops": "orders"}[site]
    src_bytes = _dir_bytes(os.path.join(big, f"{src_table}.parquet"))
    fn = registry.queries()[qname]

    def arm(engaged: bool):
        """Pin the gate by scaling the shared threshold: 0 forces every
        site ON, 2^60 forces OFF — same mechanism the auto gate uses
        (_input_bytes >= threshold), so the engaged arm is exactly the
        above-gate production plan."""
        dedup.SOURCE_OVERLAP_CKPT_MIN_BYTES = 0 if engaged else (1 << 60)

    def run(engaged: bool, want_plan: bool) -> tuple:
        arm(engaged)
        spark.sparkContext.setJobDescription(
            f"gate_ab:{site}:{'on' if engaged else 'off'}")
        # the QUERY BUILD must sit inside the timer: under AQE,
        # localCheckpoint(eager=False) executes the checkpointed
        # subtree's shuffle stages at Dataset-build time (AQE
        # materializes query stages to re-optimize before toRdd
        # returns), so an untimed build lets the engaged arm's main
        # work escape the measurement — the first cut of this harness
        # reported 0.9 s for a 60 s computation that way. bench.py's
        # run_once builds inside the timer for the same reason.
        t0 = time.perf_counter()
        df = fn(spark, big)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        plan = rows = None
        if want_plan:
            # executed (post-AQE) plan + row-equality evidence — one
            # extra execution per arm, first iteration only
            df2 = fn(spark, big)
            rows = sorted(map(tuple, df2.collect()))
            plan = df2._jdf.queryExecution().executedPlan().toString()
        return dt, plan, rows

    out_lines = [f"site={site} query={qname} corpus={big}",
                 f"{src_table} bytes={src_bytes} "
                 f"(gate {GATE}; above={src_bytes >= GATE})"]
    times = {"off": [], "on": []}
    rows_by_arm = {}
    plans = {}
    for it in range(iters):
        for engaged in (False, True):
            key = "on" if engaged else "off"
            dt, plan, rows = run(engaged, want_plan=(it == 0))
            times[key].append(round(dt, 2))
            if plan is not None:
                plans[key] = plan
                rows_by_arm[key] = rows
    assert rows_by_arm["off"] == rows_by_arm["on"], "arms differ!"
    for key in ("off", "on"):
        scans = plans[key].count("Scan parquet")
        out_lines.append(f"arm {key}: times {times[key]} s, "
                         f"executed-plan parquet scans={scans}")
    out_lines.append("rows equal across arms: True "
                     f"({len(rows_by_arm['off'])} rows)")
    out_lines.append("")
    for key in ("off", "on"):
        out_lines.append(f"===== executed plan, arm {key} (excerpt) =====")
        out_lines.append(plans[key][:6000])
        out_lines.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12", f"gate_ab_{site}.txt")
    with open(path, "w") as f:
        f.write("\n".join(out_lines))
    print(json.dumps({"site": site, "src_bytes": src_bytes,
                      "times_off": times["off"], "times_on": times["on"],
                      "rows": len(rows_by_arm["off"])}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
