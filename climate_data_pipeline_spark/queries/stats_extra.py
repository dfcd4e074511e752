"""Additional statistical aggregates rounding out A11-family coverage:
Pearson correlation, deterministic mode, and moment-based skewness /
kurtosis.

Skewness/kurtosis deliberately avoid the built-ins: Spark's and DuckDB's
`skewness` use different bias corrections (population vs sample), so the
engine computes them from raw power sums — exact for integer-valued
quantities, identical formula both sides, and still a single-pass
map-side-combinable aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


@query("stats_correlation", oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 8) AS corr_qty_price,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop,
       count(*) AS n
FROM lineitem
GROUP BY 1
""")
def correlation_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per group — single-pass
    co-moment aggregates (the same machinery as regr_slope)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 8)
                    .alias("corr_qty_price"),
                   F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4)
                    .alias("covar_pop"),
                   F.count("*").alias("n")))


@query("stats_mode", oracle="""
SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
FROM (
  SELECT l_returnflag, l_quantity, count(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, l_quantity ASC) AS rn
  FROM lineitem GROUP BY 1, 2
) WHERE rn = 1
""")
def mode_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group — count + row_number with an explicit
    value tie-break (built-in `mode()` tie behavior is engine-specific,
    so the engine defines it)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").count()
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("count").desc(), F.col("l_quantity").asc())
    return (counts.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1)
                  .select("l_returnflag",
                          F.col("l_quantity").alias("mode_qty"),
                          F.col("count").alias("mode_count")))


@query("stats_moments", oracle="""
WITH p AS (
  SELECT l_returnflag,
         count(*) AS n,
         SUM(l_quantity) AS s1,
         SUM(l_quantity * l_quantity) AS s2,
         SUM(l_quantity * l_quantity * l_quantity) AS s3,
         SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round(s1 / n, 8) AS mean,
       round(s2 / n - (s1 / n) * (s1 / n), 8) AS var_pop,
       round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
             / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 8) AS skewness,
       round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * pow(s1 / n, 2) * (s2 / n)
              - 3 * pow(s1 / n, 4))
             / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 8) AS kurtosis_excess
FROM p
""")
def moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness / excess kurtosis from raw power sums — exact integer
    sums (quantity ≤ 50 → x⁴ sums ≪ 2⁵³), one pass, no bias-correction
    ambiguity between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = (li.groupBy("l_returnflag")
           .agg(F.count("*").alias("n"), F.sum(q).alias("s1"),
                F.sum(q * q).alias("s2"), F.sum(q * q * q).alias("s3"),
                F.sum(q * q * q * q).alias("s4")))
    n, s1, s2, s3, s4 = [F.col(c) for c in ("n", "s1", "s2", "s3", "s4")]
    m = s1 / n
    var = s2 / n - m * m
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * F.pow(m, 3)) / F.pow(var, 1.5)
    kurt = ((s4 / n - 4 * m * (s3 / n) + 6 * F.pow(m, 2) * (s2 / n)
             - 3 * F.pow(m, 4)) / F.pow(var, 2) - 3)
    return p.select("l_returnflag", "n",
                    F.round(m, 8).alias("mean"),
                    F.round(var, 8).alias("var_pop"),
                    F.round(skew, 8).alias("skewness"),
                    F.round(kurt, 8).alias("kurtosis_excess"))


def _profile_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       round(1.0 - count({col}) / CAST(count(*) AS DOUBLE), 6) AS null_frac,
       (SELECT CAST({col} AS VARCHAR) FROM lineitem
        WHERE {col} IS NOT NULL
        GROUP BY {col} ORDER BY count(*) DESC, {col} ASC LIMIT 1)
         AS top_value,
       round((SELECT count(*) FROM lineitem t
              WHERE CAST(t.{col} AS VARCHAR) =
                    (SELECT CAST({col} AS VARCHAR) FROM lineitem
                     WHERE {col} IS NOT NULL
                     GROUP BY {col} ORDER BY count(*) DESC, {col} ASC
                     LIMIT 1))
             / CAST(count(*) AS DOUBLE), 6) AS top_share
FROM lineitem"""


_PROFILE_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount"]


@query("profile_table_columns",
       oracle="\nUNION ALL\n".join(_profile_col_sql(c)
                                   for c in _PROFILE_COLS))
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the `DESCRIBE`-on-steroids every curation run
    starts with): per column — row count, distinct count, null
    fraction, modal value and its share (deterministic min-value
    tiebreak). One aggregation per profiled column over the same
    cached scan, unioned; at scale the per-column aggs run as
    independent jobs over one shared scan."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROFILE_COLS:
        top = (li.where(F.col(c).isNotNull())
                 .groupBy(c).agg(F.count("*").alias("__c"))
                 .orderBy(F.col("__c").desc(), F.col(c).asc())
                 .limit(1)
                 .select(F.col(c).cast("string").alias("top_value"),
                         F.col("__c").alias("__topc")))
        agg = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.lit(1.0) - F.count(c) / F.count(F.lit(1))
                    .cast("double"), 6).alias("null_frac"))
        parts.append(
            agg.join(F.broadcast(top))
               .select(F.lit(c).alias("column_name"), "n_rows",
                       "n_distinct", "null_frac", "top_value",
                       F.round(F.col("__topc")
                               / F.col("n_rows").cast("double"), 6)
                        .alias("top_share")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
