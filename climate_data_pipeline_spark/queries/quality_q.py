"""Driver queries for the data-quality expectation gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality_checks as Q
from ..registry import query
from ..sources.io import load_table


@query("dq_lineitem_report", oracle="""
WITH base AS (
  -- CAST: DuckDB SUM(int) is HUGEINT, which pandas renders as float64;
  -- Spark emits int64. BIGINT keeps the hash comparison dtype-stable.
  SELECT COUNT(*) AS n_rows,
    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1) OR l_discount IS NULL
        THEN 1 ELSE 0 END) AS BIGINT) AS c2,
    CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) OR l_quantity IS NULL
        THEN 1 ELSE 0 END) AS BIGINT) AS c3,
    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
        AS BIGINT) AS c4,
    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS c5
  FROM lineitem
)
SELECT t.check, t.n_violations, base.n_rows,
       t.n_violations = 0 AS pass
FROM base, (
  SELECT 'not_null:l_orderkey' AS check, c1 AS n_violations FROM base
  UNION ALL SELECT 'in_range:l_discount', c2 FROM base
  UNION ALL SELECT 'in_range:l_quantity', c3 FROM base
  UNION ALL SELECT 'one_of:l_returnflag', c4 FROM base
  UNION ALL SELECT 'expr:positive_price', c5 FROM base
) t
""")
def dq_lineitem_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five expectations over lineitem in ONE scan (conditional
    aggregates — adding a 6th check adds zero I/O). The report shape
    is the contract: (check, n_violations, n_rows, pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return Q.run_checks(li, [
        Q.not_null("l_orderkey"),
        Q.in_range("l_discount", 0, 1),
        Q.in_range("l_quantity", 1, 50),
        Q.one_of("l_returnflag", ["A", "N", "R"]),
        Q.expression("positive_price", F.col("l_extendedprice") <= 0),
    ])


@query("dq_key_and_fk", oracle="""
SELECT 'unique:lineitem(l_orderkey,l_linenumber)' AS check,
       COUNT(*) AS n_violations
FROM (SELECT l_orderkey, l_linenumber FROM lineitem
      GROUP BY 1, 2 HAVING COUNT(*) > 1)
UNION ALL
SELECT 'fk:orders.o_custkey->customer', COUNT(*)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""")
def dq_key_and_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural integrity: primary-key uniqueness (group-count) and
    referential integrity (anti-join probe) as a two-row report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    uniq = (Q.unique_key_violations(li, ["l_orderkey", "l_linenumber"])
            .agg(F.count("*").alias("n_violations"))
            .select(F.lit("unique:lineitem(l_orderkey,l_linenumber)")
                    .alias("check"), "n_violations"))
    fk = (Q.referential_violations(o, "o_custkey", c, "c_custkey")
          .agg(F.count("*").alias("n_violations"))
          .select(F.lit("fk:orders.o_custkey->customer").alias("check"),
                  "n_violations"))
    return uniq.unionByName(fk)
