"""TPC-H plan shapes, second batch — the shapes `tpch_like.py` doesn't
cover: pure multi-predicate scan-agg (Q6), role-playing dimension joins
(Q7), conditional-ratio aggregates (Q8/Q14), LIKE-filtered profit (Q9),
outer-join histograms (Q13), scalar-max subqueries (Q15),
distinct-count with NOT-IN exclusion (Q16), correlated-average scalar
subqueries (Q17), disjunctive join predicates (Q19), and
anti-join + scalar-average subqueries (Q22).

The driver testdata has no ``partsupp`` table and no
commit/receipt/shipmode lineitem columns, so shapes that need them are
adapted to the available star schema (adaptation noted per query); the
*plan shape* — what Catalyst must do — is preserved in each case.

Determinism discipline (driver hash contract): currency sums use
scaled-integer exact aggregation (`functions.exact`); ratios divide two
exact doubles (IEEE division is deterministic given exact operands);
quantity sums/averages are integer-valued doubles, exact in IEEE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sql_exact_sum
from ..registry import query
from ..sources.io import load_table

_REV = "l.l_extendedprice * (1 - l.l_discount)"


def _rev_scaled() -> F.Column:
    return F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
    ).cast("long")


@query("tpch_q6_forecast_revenue", oracle="""
SELECT SUM(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: single-table scan with three range predicates feeding a
    global aggregate — the canonical pushdown test. All three predicates
    reach the Parquet reader (min/max row-group pruning on shipdate);
    no shuffle at all beyond the final 1-row reduce. At 100 TB this is
    the shape partition-pruning layouts (`write_parquet(layout=
    'timeseries')`) exist for: a year of data touches only a year of
    files. Ref analogue: threshold+range selection (SURVEY.md P2/P5,
    `ingest/netcdf_reader.py:67-71`)."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_rev = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10000).cast("long")
    return (l.where((F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1997-01-01")
                    & F.col("l_discount").between(0.03, 0.07)
                    & (F.col("l_quantity") < 24))
             .agg((F.sum(disc_rev) / 10000.0).alias("revenue"),
                  F.count("*").alias("n_items")))


@query("tpch_q7_nation_volume", oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(year FROM l.l_shipdate) AS l_year,
       {sql_exact_sum(_REV, 4)} AS revenue
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3
""")
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the same dimension table (nation) joined twice in two
    roles — supplier nation and customer nation — with a symmetric
    pair predicate. Both nation copies broadcast; the disjunctive pair
    filter applies after both role joins (it references columns from
    both), so the fact-side shuffles stay on orderkey/custkey only.
    Role-playing dims require distinct aliases; Spark disambiguates via
    separate DataFrame instances."""
    l = (load_table(spark, sf_dir, "lineitem")
         .where(F.col("l_shipdate").between("1996-01-01", "1997-12-31")))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
             .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
             .where(pair)
             .groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("l_year"))
             .agg((F.sum(_rev_scaled()) / 10000.0).alias("revenue")))


@query("tpch_q8_market_share", oracle=f"""
SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
       ( SUM(CASE WHEN sn.n_name = 'NATION_3'
             THEN CAST(round(({_REV}) * 10000) AS BIGINT) ELSE 0 END) / 10000.0 )
       / ( {sql_exact_sum(_REV, 4)} ) AS mkt_share
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN region r    ON cn.n_regionkey = r.r_regionkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — a conditional numerator over an
    unconditional denominator in one aggregation pass (no self-join).
    Part filter from canonical Q8 is dropped (adaptation: the driver's
    part table has no 'type = ECONOMY ANODIZED STEEL' analogue narrow
    enough to keep the result non-empty at sf0.01); region+date filters
    and the two-role nation join are preserved. Both sums are exact
    scaled integers, so the share divides two exact doubles."""
    l = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderdate").between("1996-01-01", "1997-12-31")))
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .where(F.col("r_name") == "EUROPE"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                       _rev_scaled()).otherwise(F.lit(0))) / 10000.0
    den = F.sum(_rev_scaled()) / 10000.0
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
             .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
             .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
             .agg((num / den).alias("mkt_share")))


@query("tpch_q9_product_profit", oracle="""
SELECT sn.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
       SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                       - p.p_retailprice * l.l_quantity) * 10000) AS BIGINT))
         / 10000.0 AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year for parts
    matching a LIKE pattern. Adaptation: no partsupp table, so unit
    cost is `p_retailprice` instead of `ps_supplycost` — the plan shape
    (LIKE-filtered part dim pruning lineitem, 5-way join, two-level
    group) is identical. The LIKE filter can't use row-group stats but
    prunes before the join via the broadcast hash set."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_name").like("%widget%")))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit_scaled = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         - F.col("p_retailprice") * F.col("l_quantity")) * 10000
    ).cast("long")
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n.select(
                 F.col("n_nationkey").alias("sn_key"),
                 F.col("n_name").alias("nation"))),
                 F.col("s_nationkey") == F.col("sn_key"))
             .join(o, l.l_orderkey == o.o_orderkey)
             .groupBy("nation",
                      F.year("o_orderdate").cast("long").alias("o_year"))
             .agg((F.sum(profit_scaled) / 10000.0).alias("profit")))


@query("tpch_q13_order_count_distribution", oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                     AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
) t
GROUP BY 1
""")
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer order-count histogram — an outer join whose
    *join condition* carries a filter (so non-matching customers still
    appear with count 0), then a second aggregation over the first's
    result. COUNT(o_orderkey) counts only non-null matches, preserving
    zero-order customers. Two shuffles: custkey, then c_count (tiny)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, (c.c_custkey == o.o_custkey)
                       & (F.col("o_orderpriority") != "1-URGENT"), "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@query("tpch_q14_promo_revenue", oracle=f"""
SELECT 100.0 * ( SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(round(({_REV}) * 10000) AS BIGINT) ELSE 0 END)
                 / 10000.0 )
       / ( {sql_exact_sum(_REV, 4)} ) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01'
""")
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotion revenue share — conditional-sum / total-sum
    ratio over a one-month shipdate slice joined to part. part
    broadcasts; the month filter is the only fact reduction, so at
    scale this is one scan + one broadcast join + a 1-row aggregate.
    (Driver p_type domain is single-word; 'PROMO' equality replaces
    canonical ``LIKE 'PROMO%%'``.)"""
    l = (load_table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= "1996-09-01")
                & (F.col("l_shipdate") < "1996-10-01")))
    p = load_table(spark, sf_dir, "part")
    num = F.sum(F.when(F.col("p_type") == "PROMO",
                       _rev_scaled()).otherwise(F.lit(0))) / 10000.0
    den = F.sum(_rev_scaled()) / 10000.0
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .agg((F.lit(100.0) * num / den).alias("promo_revenue_pct")))


@query("tpch_q15_top_supplier", oracle=f"""
WITH revenue AS (
  SELECT l.l_suppkey AS supplier_no, {sql_exact_sum(_REV, 4)} AS total_revenue
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: scalar-max subquery over a derived aggregate (the
    canonical view-based query). The revenue aggregate is computed
    once and reused for both the max and the final filter — expressed
    with an unpartitioned max window over the tiny per-supplier
    aggregate (one row per supplier, so the single-partition window is
    cheap and avoids recomputing the scan). Revenue is the exact
    scaled-integer sum, so the MAX-equality match is bit-exact."""
    from pyspark.sql import Window
    l = (load_table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1996-04-01")))
    s = load_table(spark, sf_dir, "supplier")
    rev = (l.groupBy(F.col("l_suppkey").alias("supplier_no"))
            .agg((F.sum(_rev_scaled()) / 10000.0).alias("total_revenue")))
    w = Window.partitionBy()
    best = (rev.withColumn("max_rev", F.max("total_revenue").over(w))
               .where(F.col("total_revenue") == F.col("max_rev")))
    return (F.broadcast(best).join(s, best.supplier_no == s.s_suppkey)
             .select("s_suppkey", "s_name", "total_revenue"))


@query("tpch_q16_supplier_cnt", oracle="""
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 9, 19, 29, 39, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 500)
GROUP BY 1, 2
""")
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute group with
    a NOT-IN supplier exclusion. Adaptation: the part→supplier
    association is lineitem (no partsupp table), and the excluded set
    is low-balance suppliers (no comment field for the canonical
    'Customer Complaints' pattern). NOT IN over a non-nullable key
    compiles to a left-anti join; COUNT(DISTINCT) shuffles on the
    group keys with a distinct pre-aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where((F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(1, 9, 19, 29, 39, 49)))
    bad = (load_table(spark, sf_dir, "supplier")
           .where(F.col("s_acctbal") < 500)
           .select(F.col("s_suppkey").alias("l_suppkey")))
    return (l.join(F.broadcast(bad), "l_suppkey", "left_anti")
             .join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .groupBy("p_brand", "p_size")
             .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@query("tpch_q17_small_quantity_revenue", oracle="""
SELECT SUM(CAST(round(l.l_extendedprice * 10000) AS BIGINT)) / 10000.0 / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar-average subquery — each lineitem
    compares against the mean quantity *of its own part*. Expressed as
    a per-part aggregate joined back to the filtered fact (the
    decorrelated plan every engine lowers this to). The per-part avg is
    computed only over the brand's parts (semi-reduced before the
    self-aggregate would be wrong — the subquery in the canonical query
    is over all lineitems of that part, which is what the join
    preserves). Quantity averages are exact (integer-valued doubles)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_brand") == "Brand#11")
         .select("p_partkey"))
    # all lineitems of the brand's parts (join first, then the per-part
    # average over that full set — equivalent to the correlated subquery
    # because the subquery is keyed on l_partkey only)
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).drop("p_partkey")
    per_part = (lp.groupBy(F.col("l_partkey").alias("pp_key"))
                  .agg(F.avg("l_quantity").alias("avg_qty")))
    price_scaled = F.round(F.col("l_extendedprice") * 10000).cast("long")
    return (lp.join(F.broadcast(per_part),
                    F.col("l_partkey") == F.col("pp_key"))
              .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
              .agg((F.sum(price_scaled) / 10000.0 / 7.0).alias("avg_yearly")))


@query("tpch_q19_disjunctive_revenue", oracle=f"""
SELECT {sql_exact_sum(_REV, 4)} AS revenue, COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: a disjunction of conjunctive (brand, size, quantity)
    branches straddling the join — the classic test of OR-predicate
    handling. Catalyst derives the implied single-side filters
    (p_brand IN (...), p_size <= 15, l_quantity <= 30) and pushes them
    below the join, then applies the full disjunction post-join; part
    broadcasts either way."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return (l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
             .where(branch)
             .agg((F.sum(_rev_scaled()) / 10000.0).alias("revenue"),
                  F.count("*").alias("n_items")))


@query("tpch_q22_idle_customers", oracle="""
WITH positive AS (
  SELECT (SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0) / COUNT(*)
           AS avg_bal
  FROM customer
  WHERE c_acctbal > 0.0 AND (c_nationkey % 5) IN (0, 1, 2)
)
SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
       SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer c, positive
WHERE (c.c_nationkey % 5) IN (0, 1, 2)
  AND c.c_acctbal > positive.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
""")
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers above the average positive balance of their
    cohort with no recent orders — a scalar-average subquery plus a
    NOT-EXISTS anti join, grouped by country code. Adaptations: no
    phone column, so cntrycode = c_nationkey % 5; the no-orders test is
    windowed to >= 2000-01-01 (every sf0.01 customer has *some* order,
    so the canonical unwindowed variant is vacuously empty). The scalar average
    uses the exact scaled-integer numerator so the `>` cut is
    deterministic; the anti join probes orders on custkey."""
    c = (load_table(spark, sf_dir, "customer")
         .withColumn("cntrycode", (F.col("c_nationkey") % 5).cast("int"))
         .where(F.col("cntrycode").isin(0, 1, 2)))
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderdate") >= "2000-01-01")
         .select(F.col("o_custkey").alias("c_custkey")))
    bal_scaled = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = (c.where(F.col("c_acctbal") > 0.0)
                .agg(((F.sum(bal_scaled) / 100.0)
                      / F.count("*")).alias("avg_bal")))
    return (c.crossJoin(F.broadcast(avg_bal))
             .where(F.col("c_acctbal") > F.col("avg_bal"))
             .join(o, "c_custkey", "left_anti")
             .groupBy(F.col("cntrycode").cast("long").alias("cntrycode"))
             .agg(F.count("*").alias("numcust"),
                  (F.sum(bal_scaled) / 100.0).alias("totacctbal")))
