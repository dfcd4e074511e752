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


@query("tpch_q18_large_orders", oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250)
GROUP BY 1, 2, 3, 4, 5
""")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN-subquery on an aggregate (orders whose total quantity
    exceeds a threshold) feeding a 3-way join. The subquery compiles to an
    aggregate + left-semi join — at scale the semi side is tiny (top
    fraction of orders), so AQE broadcasts it into the fact scan.
    Quantity sums are integer-valued doubles: exact in IEEE, no scaling
    needed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tq"))
            .where(F.col("tq") > 250).select("l_orderkey"))
    return (o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "o_orderkey", "left_semi")
             .join(c, o.o_custkey == c.c_custkey)
             .join(l, F.col("o_orderkey") == l.l_orderkey)
             .groupBy("c_name", "c_custkey", "o_orderkey",
                      "o_orderdate", "o_totalprice")
             .agg(F.sum("l_quantity").alias("total_qty")))


@query("tpch_q10_returned_items", oracle=f"""
SELECT c.c_custkey, c.c_name,
       {sql_exact_sum(_REV, 4)} AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: lost-revenue ranking of customers whose items came back.
    The returnflag filter prunes lineitem at the scan; nation broadcasts;
    the top-20 ranks on the exact scaled-integer revenue with custkey as
    tie-break, so the selected set is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")))
    l = (load_table(spark, sf_dir, "lineitem")
         .where(F.col("l_returnflag") == "R"))
    n = load_table(spark, sf_dir, "nation")
    rev_scaled = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
    ).cast("long")
    agg = (l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
            .agg((F.sum(rev_scaled) / 10000.0).alias("revenue")))
    return (top_k(agg, [F.col("revenue").desc(), F.col("c_custkey").asc()], 20)
            .select("c_custkey", "c_name", "revenue", "nation"))


@query("tpch_q4_order_priority", oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY 1
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS → left-semi join, then a tiny group-agg.
    (The synthetic lineitem lacks commit/receipt dates, so the EXISTS
    predicate is quantity > 45 — same plan shape as TPC-H Q4.) The date
    filter prunes orders before the semi join; the semi probe never
    duplicates order rows regardless of matching lineitem count."""
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01")))
    l = (load_table(spark, sf_dir, "lineitem")
         .where(F.col("l_quantity") > 45)
         .select(F.col("l_orderkey").alias("o_orderkey")))
    return (o.join(l, "o_orderkey", "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("order_count")))
