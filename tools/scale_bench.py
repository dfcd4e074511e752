"""Reproducible 10× scale-model bench (round-9, VERDICT r8 ask #1).

Round 8's sf1 scale experiment caught a real hazard (the
`dedup_ngram_jaccard` 150 s cliff) but lived only as a PERFORMANCE.md
narrative; this module makes it a per-round measured artifact. It

1. builds the ×10 adversarially-replicated corpus DETERMINISTICALLY
   (same protocol as PERFORMANCE.md round 8: replica 0 verbatim,
   replicas 1–9 salt 90 % of texts with a replica+doc-unique trailing
   token and leave every 10th doc an exact copy; embeddings ×10 with a
   +0.001·k element shift so every vector gains 9 true near-neighbors
   — the boilerplate/mirror-page growth regime, the worst case for
   candidate generation), and
2. times a fixed family of shuffle-heavy queries at the sf0.1
   baseline AND at 10× **in the same session, interleaved per query**
   — the same-session A/B is the point: BENCH_r08's cross-session
   numbers false-flagged five regressions that needed manual re-time
   adjudication, and a ratio measured inside one session is immune to
   that drift mode.

`bench.py` imports `run_scale10x` to emit a `scale10x` section in the
driver's BENCH JSON; standalone use prints one JSON line:

    python tools/scale_bench.py [sf_dir]

The replicated tables land under /tmp (the driver's read-only
testdata is never touched) and are rebuilt only when absent, keyed by
the protocol version below.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# bump when the replication protocol changes — the corpus dir is
# content-addressed by (source sf dir basename, factor, version)
PROTOCOL_VERSION = 1
REPLICAS = 10

# one query per shuffle-heavy design family (PERFORMANCE.md round-8
# table), chosen so the section costs minutes, not the full matrix:
#   combinable agg / banded minhash join / combinable gram counts +
#   semi-join-back / exact PPJoin similarity join / LSH pair graph →
#   connected components / hyperplane-bucket ANN join
SCALE_QUERIES = [
    "dedup_exact",
    "dedup_minhash",
    "text_duplicate_spans",
    "dedup_ngram_jaccard",
    "dedup_semantic_clusters",
    "sim_lsh_ann",
]


def build_corpus(spark, sf_dir: str, factor: int = REPLICAS,
                 base: str = "/tmp/cdps_scale") -> str:
    """Deterministic ×factor replica corpus for `sf_dir`; returns the
    directory (documents.parquet + embeddings.parquet inside). Reuses
    an existing build — delete the dir to force a rebuild."""
    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.sources.io import load_table

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"{base}_{tag}_x{factor}_v{PROTOCOL_VERSION}"
    done = os.path.join(out, "_BUILT")
    if os.path.exists(done):
        return out

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    parts = []
    for k in range(factor):
        rep = docs
        if k > 0:
            # 90 % near-copies (unique trailing token → J ≈ 0.95
            # against the original), 10 % exact copies
            rep = rep.withColumn(
                "text",
                F.when(F.col("doc_id") % 10 == 0, F.col("text"))
                 .otherwise(F.concat_ws(
                     " ", "text",
                     F.concat(F.lit(f"zzrep{k}x"),
                              F.col("doc_id").cast("string")))))
        parts.append(rep.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * n_docs))
            .withColumn("n_chars", F.length("text").cast("long")))
    alld = parts[0]
    for p in parts[1:]:
        alld = alld.unionByName(p)
    alld.write.mode("overwrite").parquet(os.path.join(
        out, "documents.parquet"))

    emb = load_table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    eparts = []
    for k in range(factor):
        shift = 0.001 * k
        eparts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_emb))
               .withColumn("embedding", F.transform(
                   "embedding",
                   lambda x: (x + F.lit(shift)).cast("float"))))
    alle = eparts[0]
    for p in eparts[1:]:
        alle = alle.unionByName(p)
    alle.write.mode("overwrite").parquet(os.path.join(
        out, "embeddings.parquet"))

    # the scale queries only read documents/embeddings; link the rest
    # of the tables verbatim so any registry query can run against the
    # dir without a copy
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(done, "w") as f:
        f.write(f"source={sf_dir} factor={factor} "
                f"protocol=v{PROTOCOL_VERSION}\n")
    return out


def run_scale10x(spark, sf_dir: str, queries=None, warmup: int = 1,
                 iters: int = 2) -> dict:
    """Same-session A/B: each query timed at `sf_dir` then at the ×10
    replica corpus, back to back, so the ratio is host-drift-immune.
    Returns the `scale10x` JSON section."""
    from climate_data_pipeline_spark import registry

    qs = registry.queries()
    names = queries or SCALE_QUERIES
    t0 = time.perf_counter()
    big_dir = build_corpus(spark, sf_dir)
    build_s = round(time.perf_counter() - t0, 2)

    def run_once(name: str, d: str) -> float:
        t = time.perf_counter()
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t

    rows: dict[str, dict] = {}
    for name in names:
        sample = {}
        for label, d in (("base", sf_dir), ("x10", big_dir)):
            for _ in range(warmup):
                run_once(name, d)
            sample[label] = sorted(run_once(name, d)
                                   for _ in range(iters))
        base_m = statistics.mean(sample["base"])
        big_m = statistics.mean(sample["x10"])
        rows[name] = {
            "base_mean_s": round(base_m, 3),
            "x10_mean_s": round(big_m, 3),
            "x10_min_s": round(sample["x10"][0], 3),
            "ratio": round(big_m / base_m, 2) if base_m > 0 else None,
            "n": iters,
        }
    return {
        "protocol": f"replica x{REPLICAS} v{PROTOCOL_VERSION}: "
                    "salted near-copies (90%) + exact copies (10%), "
                    "embeddings +0.001k shift; same-session A/B, "
                    "interleaved per query",
        "corpus_dir": big_dir,
        "corpus_build_s": build_s,
        "queries": rows,
    }


def _curated_fingerprint(spark, out_dir: str, max_id: int | None = None):
    """Order-independent fingerprint of a curated-shard directory:
    (row count, Σ crc32(doc_id|text) as signed-64 wrap). ``max_id``
    restricts to the replica-0 id range so the ×10 run's kept set can
    be compared against the base run's on the SAME documents."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir)
    if max_id is not None:
        df = df.where(F.col("doc_id") < max_id)
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.concat_ws("|", F.col("doc_id").cast("string"),
                                  F.col("text")))).alias("h")).first()
    return int(r.n), int(r.h or 0)


def run_curate10x(spark, sf_dir: str,
                  out_base: str = "/tmp/cdps_curate10x") -> dict:
    """End-to-end scale model of the STAGED curation pipeline (round-9
    verdict ask #2): `plans/jobs.curate_corpus` with every stage armed
    (NFC normalize → quality gate → exact dedup → MinHash-LSH
    near-dedup → deterministic split → sharded write) run at `sf_dir`
    and at the ×10 replica corpus in the SAME session, with per-stage
    wall times from the job's own progress protocol. The 100 TB claim
    rests on the stage ORDERING (each gate pays only for survivors);
    this measures that composition, not isolated queries.

    Output equivalence: the ×10 corpus contains replica 0 verbatim,
    and every duplicate group's canonical member is its minimum id —
    so the ×10 run's kept set RESTRICTED to replica-0 ids must equal
    the base run's kept set exactly (same rows, same text). Recorded
    as `outputs_match` via an order-independent fingerprint."""
    import shutil

    from climate_data_pipeline_spark.plans.jobs import curate_corpus
    from climate_data_pipeline_spark.sources.io import load_table

    big_dir = build_corpus(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()

    def run(label: str, d: str) -> dict:
        marks: list[tuple[str, float]] = []
        out = f"{out_base}_{label}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        res = curate_corpus(
            spark, d, out, quality_filter=True, normalize=True,
            near_dedup=True,
            progress=lambda _s, name, el: marks.append((name, el)))
        total = time.perf_counter() - t0
        if res.get("status") == "failed":
            raise RuntimeError(f"curate_corpus failed at {label}: "
                               f"{res.get('error')}")
        stages = {}
        for i, (name, el) in enumerate(marks):
            end = marks[i + 1][1] if i + 1 < len(marks) else total
            stages[name] = round(end - el, 3)
        return {"total_s": round(total, 3), "stages_s": stages,
                "counts": {k: res[k] for k in
                           ("n_input", "n_after_quality", "n_after_dedup",
                            "n_after_near_dedup", "n_written")},
                "out": out}

    run("warmup", sf_dir)       # discard: JIT/codegen/page-cache warm
    # best-of-two per corpus: the near-dedup stage's wall time is the
    # noisiest (banded join + clustering), and a single sample can
    # read 1.5× off on a loaded host — keep the faster full run
    base = min(run("base", sf_dir), run("base", sf_dir),
               key=lambda r: r["total_s"])
    big = min(run("x10", big_dir), run("x10", big_dir),
              key=lambda r: r["total_s"])
    fp_base = _curated_fingerprint(spark, base["out"])
    fp_big0 = _curated_fingerprint(spark, big["out"], max_id=n_docs)
    ratios = {k: round(big["stages_s"][k] / base["stages_s"][k], 2)
              for k in base["stages_s"]
              if base["stages_s"].get(k, 0) > 0.05 and k in big["stages_s"]}
    return {
        "protocol": "curate_corpus(normalize+quality+exact-dedup+"
                    "minhash-near-dedup+split+shard-write), same-session "
                    "A/B base vs x10 replica corpus; outputs_match = "
                    "x10 kept set restricted to replica-0 ids == base "
                    "kept set (count + crc32 fingerprint)",
        "base": {k: base[k] for k in ("total_s", "stages_s", "counts")},
        "x10": {k: big[k] for k in ("total_s", "stages_s", "counts")},
        "ratio_total": round(big["total_s"] / base["total_s"], 2),
        "ratio_stages": ratios,
        "outputs_match": fp_base == fp_big0,
        "fingerprint_base": fp_base,
        "fingerprint_x10_replica0": fp_big0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from climate_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cdps-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"metric": "scale10x", "sf_dir": sf_dir,
                      **run_scale10x(spark, sf_dir)}))


if __name__ == "__main__":
    main()
