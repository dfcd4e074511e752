"""Driver-checkable queries for the binned interval joins
(`operators/interval.py`) — pure range joins with NO equi key, the case
where naive Catalyst plans degrade to nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.interval import interval_overlap_join, point_in_interval_join
from ..registry import query
from ..sources.io import load_table


@query("interval_point_band_join", oracle="""
SELECT p.p_partkey,
       COUNT(*) AS n_in_band,
       round(avg(l.l_quantity), 6) AS avg_qty
FROM part p
JOIN lineitem l
  ON l.l_extendedprice BETWEEN p.p_retailprice - 25 AND p.p_retailprice + 25
WHERE p.p_partkey % 100 = 0
GROUP BY 1
""")
def interval_point_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval with no equi key: lineitem prices probed against
    per-part price bands [retail−25, retail+25]. The binned rewrite
    (width 50 = band width) turns the nested-loop theta join into a
    shuffled equi join on the bin key + residual BETWEEN — the plan
    test asserts no BroadcastNestedLoopJoin survives. At 100 TB both
    sides stream through an ordinary hash/SMJ shuffle; a hot price bin
    is a visible hot key, treatable with the salting tools."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity")
    bands = (load_table(spark, sf_dir, "part")
             .where(F.col("p_partkey") % 100 == 0)
             .select("p_partkey",
                     (F.col("p_retailprice") - 25).alias("band_lo"),
                     (F.col("p_retailprice") + 25).alias("band_hi")))
    joined = point_in_interval_join(li, bands, "l_extendedprice",
                                    "band_lo", "band_hi", bin_width=50.0)
    return (joined.groupBy("p_partkey")
                  .agg(F.count(F.lit(1)).alias("n_in_band"),
                       F.round(F.avg("l_quantity"), 6).alias("avg_qty")))


@query("interval_overlap_pairs", oracle="""
WITH iv AS (
  SELECT o_orderkey AS k,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS s,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
           + (o_orderkey % 60) + 1 AS e
  FROM orders WHERE o_totalprice > 450000
)
SELECT COUNT(*) AS n_overlapping_pairs
FROM iv a JOIN iv b ON a.k < b.k AND a.s <= b.e AND b.s <= a.e
""")
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap with no equi key: order fulfillment
    windows [orderdate, orderdate + (orderkey mod 60)+1 days] over the
    high-value order subset; counts unordered overlapping pairs. The
    first-shared-bin rule emits each pair exactly once with NO dedup
    shuffle (bin width 64 days ≈ max interval length). The oracle is the
    naive O(n²) self theta join — tractable for DuckDB at sf0.01,
    exactly what the binned plan avoids at scale."""
    def iv(side: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 450000)
        s = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01"))
        return o.select(F.col("o_orderkey").alias(f"{side}k"),
                        s.cast("long").alias(f"{side}s"),
                        (s + F.col("o_orderkey") % 60 + 1).cast("long")
                         .alias(f"{side}e"))
    pairs = interval_overlap_join(iv("a_"), iv("b_"),
                                  "a_s", "a_e", "b_s", "b_e",
                                  bin_width=64)
    return (pairs.where(F.col("a_k") < F.col("b_k"))
                 .agg(F.count(F.lit(1)).alias("n_overlapping_pairs")))
