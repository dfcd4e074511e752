"""Simulate the driver: import __spark_entry__, smoke entry(), run every
query at sf0.01 vs its DuckDB oracle, hash-compare order-insensitively."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

# deliberately NOT the package's session factory: the driver brings its own
# session with its own configs — use a different shuffle partition count to
# prove results don't depend on partitioning
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
qs, oracles = mod.queries(), mod.oracle_sql()

# session fingerprint (r8 verdict ask #8): makes round-over-round
# sweeps comparable the way BENCH's host block does
import os

_fp = {"master": spark.sparkContext.master,
       "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
       "spark": spark.version, "cpus": os.cpu_count()}
try:
    _fp["loadavg_1m"] = round(os.getloadavg()[0], 2)
except OSError:
    pass
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.lower().startswith("model name"):
                _fp["cpu_model"] = _line.split(":", 1)[1].strip()
                break
except OSError:
    pass
print("session:", " ".join(f"{k}={v}" for k, v in _fp.items()))
print(f"{len(qs)} queries, {len(oracles)} oracles", flush=True)
assert set(oracles) <= set(qs)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(drop=True)
    return hashlib.sha256(pdf.to_csv(index=False, float_format="%.17g").encode()).hexdigest()[:16]


only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
fails = 0
for name, fn in sorted(qs.items()):
    if only is not None and name not in only:
        continue
    got = fn(spark, SF).toPandas()
    if name in ("dedup_ngram_jaccard", "dedup_clusters",
                "dedup_clusters_star", "dedup_keep_best"):
        # ADVICE r10: these oracles pin the UNCAPPED exact-Jaccard
        # arm, but auto_cap routes to the capped arm when the corpus
        # density metric crosses the gate — a gate flip on a denser
        # verify corpus must read as a LOUD arm change here, not as an
        # opaque hash mismatch downstream
        from climate_data_pipeline_spark.operators import dedup as _dd
        g = _dd.LAST_JACCARD_GATE
        assert g is None or not g.get("engaged"), (
            f"{name}: jaccard density gate ENGAGED ({g}) — the oracle "
            f"mirrors the uncapped arm; verify corpus too dense")
    if name not in oracles:
        print(f"  {name}: rows-only, {len(got)} rows", flush=True)
        continue
    want = con.execute(oracles[name]).fetchdf()
    hg, hw = canon_hash(got), canon_hash(want)
    status = "OK " if hg == hw else "FAIL"
    fails += hg != hw
    print(f"  {status} {name}: spark {len(got)}x{len(got.columns)} [{hg}] oracle {len(want)}x{len(want.columns)} [{hw}]", flush=True)

print("RESULT:", "FAIL" if fails else "ALL-MATCH")
