"""TPC-H plan shapes, third batch — completes the suite alongside
``tpch_like.py`` / ``tpch_like2.py`` (Q1 lives as
``a11_pricing_summary``): per-group min-equality against a correlated
aggregate (Q2), HAVING against a fraction of a global scalar (Q11),
two-branch conditional counts over a derived class (Q12), nested
semi-join chains feeding a threshold aggregate (Q20), and the
multi-reference self semi/anti join (Q21) — the hardest relational
shape in TPC-H.

Adaptations to the driver star schema (no ``partsupp``, no
commit/receipt dates, no shipmode/phone/comment columns), noted per
query; each preserves the *plan shape* Catalyst must produce. The
part→supplier association is the distinct ``(l_partkey, l_suppkey)``
projection of lineitem; "lateness" is ``l_shipdate`` measured against
``o_orderdate``.

Determinism: currency aggregates use exact scaled-integer sums
(`functions/exact`), LIMIT sets are pinned by total-order sort keys,
and min-equality filters compare doubles that both engines read
verbatim from the same parquet (no arithmetic before the compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import sql_exact_sum
from ..registry import query
from ..sources.io import load_table

_REV = "l.l_extendedprice * (1 - l.l_discount)"


def _rev_scaled() -> F.Column:
    return F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
    ).cast("long")


@query("tpch_q2_min_cost_supplier", oracle="""
WITH assoc AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), cand AS (
  SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM part p
  JOIN assoc a ON a.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = a.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size = 19 AND p.p_type = 'MEDIUM' AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM cand c
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part minimum over a correlated aggregate on the
    same join tree — the classic "min-cost supplier" query. The
    canonical form computes the candidate join once and reuses it for
    both the rows and the per-part MIN; we express that as a window
    MIN over PARTITION BY p_partkey (single computation, no re-scan)
    rather than a self-join, which is the plan you want at 100 TB: the
    window reuses the shuffle the dedup already paid on l_partkey.
    Adaptations: partsupp → distinct (l_partkey, l_suppkey) pairs from
    lineitem; ps_supplycost → s_acctbal (the only numeric cost on the
    supplier side). All dimension joins broadcast (supplier/nation/
    region are tiny); the only big shuffle is the pair-dedup on
    lineitem. The LIMIT set is pinned by a total order (p_partkey is
    unique within the min-filtered candidates only up to acctbal ties,
    so the sort includes every output column). Ref analogue:
    SURVEY.md §2.3 join family."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where((F.col("p_size") == 19) & (F.col("p_type") == "MEDIUM")))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .where(F.col("r_name") == "EUROPE"))
    assoc = l.select("l_partkey", "l_suppkey").distinct()
    cand = (assoc
            .join(F.broadcast(p), assoc.l_partkey == p.p_partkey)
            .join(F.broadcast(s), assoc.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    w = Window.partitionBy("p_partkey")
    return (cand.withColumn("min_bal", F.min("s_acctbal").over(w))
                .where(F.col("s_acctbal") == F.col("min_bal"))
                .select("s_acctbal", "s_name", "n_name", "p_partkey",
                        "p_brand")
                .orderBy(F.desc("s_acctbal"), "n_name", "s_name",
                         "p_partkey")
                .limit(20))


@query("tpch_q11_important_stock", oracle=f"""
WITH value_by_part AS (
  SELECT l.l_partkey, {sql_exact_sum(_REV, 4)} AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_regionkey = 2
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, part_value
FROM value_by_part,
     (SELECT SUM(part_value) * 0.001 AS cutoff FROM value_by_part)
WHERE part_value > cutoff
""")
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-key aggregate filtered against a fraction of the
    global total of the same aggregate — HAVING over a scalar
    subquery. The per-part values are computed once; the global cutoff
    is a 1-row aggregate of that result, broadcast back as a cross
    join (NOT a re-scan of lineitem — at 100 TB the rollup is reused,
    cf. `operators/incremental`). Adaptations: partsupp value →
    lineitem revenue per part; the nation filter widens to a region
    key (n_regionkey = 2, five nations) so the sf0.01 result is
    non-trivial. The per-part sums are exact scaled integers, so
    `SUM(part_value)` over ≤2000 integral multiples of 1e-4 and the
    0.001 multiple are bit-identical in both engines, making the `>`
    cut deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = (load_table(spark, sf_dir, "nation")
         .where(F.col("n_regionkey") == 2))
    vals = (l.join(F.broadcast(s.join(F.broadcast(n),
                                      s.s_nationkey == n.n_nationkey)
                                .select("s_suppkey")),
                   l.l_suppkey == F.col("s_suppkey"))
             .groupBy(F.col("l_partkey").alias("p_partkey"))
             .agg((F.sum(_rev_scaled()) / 10000.0).alias("part_value")))
    cutoff = vals.agg((F.sum("part_value") * 0.001).alias("cutoff"))
    return (vals.crossJoin(F.broadcast(cutoff))
                .where(F.col("part_value") > F.col("cutoff"))
                .select("p_partkey", "part_value"))


@query("tpch_q12_late_shipment_priority", oracle="""
-- CASTs: DuckDB SUM(int) yields HUGEINT → float64 in pandas, a textual
-- hash mismatch vs Spark's int64 (same values); BIGINT aligns dtypes.
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 365
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""")
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact⋈dim join feeding two complementary conditional
    counts grouped by a derived class column. Adaptations: no
    l_shipmode column, so the class is derived from shipping latency
    (>365 days after order date → LATE) — which also exercises
    cross-table expression grouping (the group key needs columns from
    BOTH join sides, so it can only be computed post-join); no
    receipt/commit dates, so the window predicate is on l_shipdate.
    The date filter is pushed to the lineitem scan; orders joins on
    the shuffle-free broadcast path at sf0.01 and as a shuffle hash
    join at 100 TB (AQE decides). Conditional counts are integer —
    exact under any partitioning."""
    l = (load_table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01")))
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 365)
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .groupBy(F.when(late, "LATE").otherwise("ONTIME")
                       .alias("ship_class"))
             .agg(F.sum(high.cast("long")).alias("high_line_count"),
                  F.sum((~high).cast("long")).alias("low_line_count")))


@query("tpch_q20_excess_shippers", oracle="""
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'red%')
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > 300
)
AND s.s_nationkey < 10
""")
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: a nested semi-join chain — suppliers selected by an
    IN-subquery whose body is itself a filtered aggregate over a
    part-restricted lineitem (which contains its own IN-subquery on
    part). Canonically "suppliers with excess stock of forest parts";
    adapted to "suppliers who shipped >300 units of red-named
    parts in 1997" (no partsupp availqty). The plan: part filter
    broadcasts into a semi join on the lineitem scan (LIKE prefix +
    date predicates pushed down), the surviving rows aggregate per
    supplier (map-side partials — ≤100 groups), the HAVING threshold
    filters the tiny aggregate, and THAT broadcasts as a semi join
    into supplier. Nothing big ever shuffles: the aggregation is the
    only exchange and its input is pre-filtered. Quantity sums are
    integer-valued doubles — exact in IEEE under any order."""
    s = (load_table(spark, sf_dir, "supplier")
         .where(F.col("s_nationkey") < 10))
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_name").like("red%"))
         .select("p_partkey"))
    l = (load_table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01")))
    shippers = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey,
                       "left_semi")
                 .groupBy("l_suppkey")
                 .agg(F.sum("l_quantity").alias("qty"))
                 .where(F.col("qty") > 300)
                 .select(F.col("l_suppkey").alias("s_suppkey")))
    return (s.join(F.broadcast(shippers), "s_suppkey", "left_semi")
             .select("s_name", "s_acctbal"))


@query("tpch_q21_waiting_orders", oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND date_diff('day', o.o_orderdate, l.l_shipdate) > 1000
), pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s.s_name, COUNT(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM pairs l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
""")
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the triple self-reference — for each (order,
    supplier) that shipped very late on a finalized order, require
    EXISTS another supplier on the same order (semi join with a
    non-equi residual l2.suppkey <> l1.suppkey) and NOT EXISTS another
    *late* supplier on it (anti join, same residual) — i.e. the sole
    supplier to blame. Both probes hash on l_orderkey with the
    inequality as a post-probe residual, which is exactly how Catalyst
    executes mixed-condition semi/anti joins; the probe sides are
    distinct (orderkey, suppkey) projections, so state per key is
    bounded by suppliers-per-order, not lineitems. Adaptations: no
    receipt/commit dates → "late" is shipdate >1000 days after order
    date; counts per supplier name. Ref analogue: SURVEY.md §2.3
    (semi/anti family)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus") == "F"))
    s = load_table(spark, sf_dir, "supplier")
    late = (l.join(o, l.l_orderkey == o.o_orderkey)
             .where(F.datediff(F.col("l_shipdate"),
                               F.col("o_orderdate")) > 1000)
             .select("l_orderkey", "l_suppkey").distinct())
    pairs = l.select("l_orderkey", "l_suppkey").distinct()
    l2 = pairs.select(F.col("l_orderkey").alias("o2"),
                      F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("o3"),
                     F.col("l_suppkey").alias("s3"))
    blamed = (late
              .join(l2, (late.l_orderkey == l2.o2)
                    & (late.l_suppkey != l2.s2), "left_semi")
              .join(l3, (late.l_orderkey == l3.o3)
                    & (late.l_suppkey != l3.s3), "left_anti"))
    return (blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
                  .groupBy("s_name")
                  .agg(F.count("*").alias("numwait")))
