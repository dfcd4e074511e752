"""Scale-machinery queries (beyond-reference extensions): incremental
rollup maintenance and Z-order clustering keys.

Both are oracle-checked against *semantic* definitions: the incremental
path must hash-match a full-recompute GROUP BY, and the Morton key must
hash-match the same bit-interleave arithmetic written in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sql_exact_avg, sql_exact_sum
from ..operators import incremental as I
from ..operators import zorder as Z
from ..registry import query
from ..sources.io import load_table

_CUTOVER = "1997-01-01"


@query("incremental_rollup", oracle=f"""
SELECT date_trunc('month', l_shipdate) AS ship_month,
       COUNT(l_extendedprice) AS price_n,
       {sql_exact_sum('l_extendedprice', 2)} AS price_sum,
       {sql_exact_avg('l_extendedprice', 2)} AS price_avg,
       MIN(l_extendedprice) AS price_min,
       MAX(l_extendedprice) AS price_max
FROM lineitem
GROUP BY 1
""")
def incremental_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly price rollup maintained *incrementally*: the fact table is
    split at the 1997-01-01 cutover into a "historical" slice and a "new
    arrivals" delta, each reduced to mergeable partial state, then merged
    and finalized — and the result must equal the full-recompute oracle
    exactly. At 100 TB only the delta slice would be scanned; the merge
    input is O(#months)."""
    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_trunc("month", "l_shipdate").alias("ship_month")
    base = li.where(F.col("l_shipdate") < _CUTOVER).select(month, "l_extendedprice")
    delta = li.where(F.col("l_shipdate") >= _CUTOVER).select(month, "l_extendedprice")
    merged = I.merge_rollups(
        I.rollup_partials(base, ["ship_month"], "l_extendedprice"),
        I.rollup_partials(delta, ["ship_month"], "l_extendedprice"))
    return I.finalize_rollup(merged, prefix="price_")


@query("incremental_cdc_refresh", oracle=f"""
WITH vnew AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS amt
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT o_orderpriority,
       COUNT(*) AS price_n,
       {sql_exact_sum('amt', 2)} AS price_sum,
       {sql_exact_avg('amt', 2)} AS price_avg
FROM vnew GROUP BY 1
""")
def incremental_cdc_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view refresh from a CDC feed, never re-reading the
    base: version A of orders (keys %7≠0) is rolled up once; version B
    (keys %5≠0, prices doubled on %3==0 — deletes, inserts AND updates
    vs A) is reached by applying the row-level change feed
    (delete+insert pairs, the `snapshot_diff` contract) as signed
    invertible state (`operators/incremental.cdc_delta_state` /
    `apply_cdc_delta`). The oracle computes version B's rollup from
    scratch — the incremental path must land on the exact same bits,
    including groups that shrink or vanish."""
    orders = load_table(spark, sf_dir, "orders")
    amt = (F.when(F.col("o_orderkey") % 3 == 0,
                  F.col("o_totalprice") * 2)
            .otherwise(F.col("o_totalprice")).alias("amt"))
    v_old = (orders.where(F.col("o_orderkey") % 7 != 0)
                   .select("o_orderpriority", F.col("o_totalprice").alias("amt")))
    v_new = (orders.where(F.col("o_orderkey") % 5 != 0)
                   .select("o_orderpriority", amt))
    cdc = (v_new.exceptAll(v_old).withColumn("change", F.lit("insert"))
           .unionByName(
               v_old.exceptAll(v_new).withColumn("change", F.lit("delete"))))
    state = I.rollup_partials(v_old, ["o_orderpriority"], "amt")
    delta = I.cdc_delta_state(cdc, ["o_orderpriority"], "amt")
    refreshed = I.apply_cdc_delta(state, delta, ["o_orderpriority"])
    return I.finalize_group_state(refreshed, prefix="price_")


_ZBITS = 10
_ZX = "l_partkey & 1023"
_ZY = "l_suppkey & 1023"


@query("zorder_cluster_key", oracle=f"""
WITH keyed AS (
  SELECT {Z.sql_morton_key(_ZX, _ZY, _ZBITS)} AS zkey,
         l_partkey
  FROM lineitem
)
SELECT zkey >> 12 AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(zkey) AS min_key,
       MAX(zkey) AS max_key,
       CAST(SUM(l_partkey) AS BIGINT) AS sum_x
FROM keyed
GROUP BY 1
""")
def zorder_cluster_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton interleave kernel behind the Z-order layout
    (`operators/zorder.py`), verified bit-for-bit: keys for the 2-D space
    (l_partkey mod 1024, l_suppkey mod 1024) are bucketed by their top
    bits and aggregated. Key computation is a narrow per-row map; the
    only shuffle is the verification group-agg."""
    li = load_table(spark, sf_dir, "lineitem")
    zkey = Z.morton_key(F.col("l_partkey").bitwiseAND(F.lit(1023)),
                        F.col("l_suppkey").bitwiseAND(F.lit(1023)),
                        bits=_ZBITS)
    return (li.select(zkey.alias("zkey"), "l_partkey")
              .groupBy(F.shiftright(F.col("zkey"), 12).alias("z_bucket"))
              .agg(F.count("*").alias("n_rows"),
                   F.min("zkey").alias("min_key"),
                   F.max("zkey").alias("max_key"),
                   F.sum("l_partkey").alias("sum_x")))
