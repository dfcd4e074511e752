"""Analytic-function completeness: distribution windows (ntile /
percent_rank / cume_dist), value-position window frames (first_value /
last_value / nth_value), and explicit GROUPING SETS.

The reference has no ranking/analytic functions (SURVEY.md §2.5 notes
they come free with Spark); these queries put each remaining family on
the driver's oracle gate. Determinism: every window ORDER BY ends in a
unique key (event_id), so rank/tile assignment is total-ordered and
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


@query("ntile_distribution", oracle="""
SELECT event_id, event_type,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM events
WHERE event_type IN ('click', 'view')
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
""")
def ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows per event_type: quartile assignment plus the
    two rank-normalizing functions. NTILE is order-sensitive under ties,
    so the sort key ends in the unique event_id — without that, bucket
    boundaries are partition-order-dependent and unhashable. One
    shuffle on event_type; within-partition sort feeds all three
    functions from a single Window spec."""
    e = (load_table(spark, sf_dir, "events")
         .where(F.col("event_type").isin("click", "view")))
    w = (Window.partitionBy("event_type")
               .orderBy(F.col("value").asc(), F.col("event_id").asc()))
    return e.select(
        "event_id", "event_type",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


@query("frame_first_last", oracle="""
SELECT DISTINCT user_id,
       FIRST_VALUE(value) OVER w AS first_val,
       LAST_VALUE(value)  OVER w AS last_val,
       NTH_VALUE(value, 2) OVER w AS second_val,
       COUNT(*) OVER w AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def frame_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-position functions over an explicit unbounded frame — the
    frame matters: LAST_VALUE under the default frame (UNBOUNDED
    PRECEDING..CURRENT ROW) degenerates to the current row, a classic
    SQL trap; pinning both frame edges makes first/last/nth true
    per-user endpoints. DISTINCT collapses the per-row window output to
    one summary row per user (all rows in a partition carry identical
    values, so this is a dedup, not information loss)."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
               .orderBy(F.col("ts").asc(), F.col("event_id").asc())
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))
    return (e.select(
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
        F.count("*").over(w).alias("n_events"))
        .distinct())


@query("grouping_sets_agg", oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty, COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""")
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the asymmetric subset ROLLUP/CUBE can't
    express (detail + one subtotal + grand total, skipping the
    per-linestatus marginal). Spark expands the sets before a single
    hash aggregate: one shuffle regardless of set count. GROUPING()
    markers disambiguate 'NULL because subtotal' from data NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupingSets(
                [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
                "l_returnflag", "l_linestatus")
              .agg(F.sum("l_quantity").alias("sum_qty"),
                   F.count("*").alias("n"),
                   F.grouping("l_returnflag").cast("int").alias("g_flag"),
                   F.grouping("l_linestatus").cast("int").alias("g_status")))


@query("contribution_shares", oracle="""
WITH nat AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS bal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       bal / 100.0 AS total_bal,
       round(bal * 1.0 / SUM(bal) OVER (PARTITION BY region), 6)
         AS region_share,
       round(bal * 1.0 / SUM(bal) OVER (), 6) AS global_share
FROM nat
""")
def contribution_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution analysis: each nation's share of
    its region's and of the global customer balance — the
    share-of-parent window family (value / SUM OVER partition).
    Numerators and window denominators are the SAME exact scaled-long
    sums, so the ratios are bit-deterministic before the 1e-6 rounding.
    Plan: broadcast dim joins → one hash agg → two window sums over the
    25-row aggregate (driver-trivial at any scale: window input is
    #groups, never facts)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (c.join(n, c.c_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region"),
                     F.col("n_name").alias("nation"))
            .agg(F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
                  .alias("bal")))
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return nat.select(
        "region", "nation",
        (F.col("bal") / 100.0).alias("total_bal"),
        F.round(F.col("bal") * 1.0 / F.sum("bal").over(w_region), 6)
         .alias("region_share"),
        F.round(F.col("bal") * 1.0 / F.sum("bal").over(w_all), 6)
         .alias("global_share"))
