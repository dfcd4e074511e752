"""TPC-H-shaped multi-join workloads — the realistic join+agg plans the
relational layer must handle at scale (SURVEY.md §7 build-plan step 6).

Q3 (shipping priority) and Q5 (local supplier volume) shapes: selective
dimension filters reduce the fact side early (pushdown), then fact-fact
joins shuffle on keys with AQE; revenue uses the scaled-integer exact
aggregation so the oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sql_exact_sum
from ..operators.relational import top_k
from ..registry import query
from ..sources.io import load_table

_REV = "l.l_extendedprice * (1 - l.l_discount)"


@query("tpch_q3_shipping_priority", oracle=f"""
SELECT l.l_orderkey,
       {sql_exact_sum(_REV, 4)} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective filters on both dims of a 3-way join, group by
    order, top-10 by revenue. Customer filter prunes before the join;
    revenue ranks on the exact scaled-integer sum so the top-10 set is
    deterministic (ties broken by orderkey)."""
    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment") == "BUILDING"))
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderdate") < "1998-03-15"))
    l = (load_table(spark, sf_dir, "lineitem")
         .where(F.col("l_shipdate") > "1998-03-15"))
    rev_scaled = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
    ).cast("long")
    agg = (l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg((F.sum(rev_scaled) / 10000.0).alias("revenue")))
    return (top_k(agg, [F.col("revenue").desc(), F.col("l_orderkey").asc()], 10)
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"))


@query("tpch_q5_region_volume", oracle=f"""
SELECT n.n_name AS nation,
       {sql_exact_sum(_REV, 4)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY 1
""")
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join with a local-supplier correlation predicate
    (s_nationkey = c_nationkey). Dims broadcast; the only shuffles are the
    fact-fact joins on orderkey/custkey."""
    l = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderdate").between("1996-01-01", "1996-12-31")))
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .where(F.col("r_name") == "ASIA"))
    rev_scaled = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
    ).cast("long")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey)
                   & (s.s_nationkey == c.c_nationkey))
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy(F.col("n_name").alias("nation"))
             .agg((F.sum(rev_scaled) / 10000.0).alias("revenue"),
                  F.count("*").alias("n_items")))
