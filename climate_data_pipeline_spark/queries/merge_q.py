"""MERGE/upsert and skew-salting as driver-checked queries: both must be
*semantically invisible* optimizations/maintenance ops, so their oracles
are the plain formulations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert
from ..operators.skew import salted_aggregate
from ..registry import query
from ..sources.io import load_table


@query("merge_upsert_customers", oracle="""
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey,
         round(c_acctbal * 1.1 * 100) / 100.0 AS c_acctbal,
         'UPGRADED' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
),
survivors AS (
  SELECT * FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
)
SELECT c_mktsegment, count(*) AS n,
       SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
FROM (SELECT * FROM survivors UNION ALL SELECT * FROM updates)
GROUP BY 1
""")
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation (anti-join + union) applied to a derived update
    set — every 10th customer gets a 10% balance bump and a new segment —
    then summarized. The oracle is the NOT EXISTS + UNION ALL definition
    of MERGE."""
    c = load_table(spark, sf_dir, "customer")
    updates = (c.where(F.col("c_custkey") % 10 == 0)
                .withColumn("c_acctbal", F.round(F.col("c_acctbal") * 1.1 * 100) / 100)
                .withColumn("c_mktsegment", F.lit("UPGRADED")))
    merged = merge_upsert(c, updates, keys=["c_custkey"])
    return (merged.groupBy("c_mktsegment")
                  .agg(F.count("*").alias("n"),
                       (F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
                        / 100.0).alias("total_bal")))


@query("skew_salted_aggregate", oracle="""
SELECT l_returnflag,
       SUM(l_quantity) AS sum_qty,
       COUNT(l_quantity) AS n,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY 1
""")
def skew_salted_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation vs the plain GROUP BY oracle — the
    skew mitigation must be bit-invisible in the results (exact integer
    sums merge associatively across salt partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(li, ["l_returnflag"],
                           {"sum_qty": ("sum", "l_quantity"),
                            "n": ("count", "l_quantity"),
                            "max_qty": ("max", "l_quantity")},
                           n_salts=8)
    return out.select("l_returnflag", "sum_qty", "n", "max_qty")
