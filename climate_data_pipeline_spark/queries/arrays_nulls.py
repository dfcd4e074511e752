"""Array higher-order functions, ordinality explode, and null-safe
joins — engine-surface completeness for the nested-data column types
the training-data extensions rely on (embeddings `array<float>`).

The similarity operators use `F.aggregate`/`F.zip_with` internally
(`operators/similarity.py:28-33`); these queries put the higher-order
family itself on the oracle gate, plus the NULL-semantics join variant
SQL engines disagree on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


@query("array_hof_stats", oracle="""
WITH u AS (
  SELECT vec_id, CAST(s['i'] AS BIGINT) AS ord, CAST(s['v'] AS DOUBLE) AS v, n
  FROM (SELECT vec_id, len(embedding) AS n,
               unnest(list_transform(embedding, (x, i) -> {'i': i, 'v': x}))
                 AS s
        FROM embeddings)
)
SELECT a.vec_id,
       MAX(a.n) AS n_dims,
       round(sqrt(SUM(a.v * a.v)), 6) AS l2_norm,
       COUNT(*) FILTER (WHERE a.v > 0) AS n_pos,
       round(MAX(a.v), 6) AS vmax,
       round(SUM(a.v * b.v), 6) AS dot_rev
FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.ord = a.n + 1 - a.ord
GROUP BY 1
""")
def array_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over the embedding column, computed
    without exploding: transform/aggregate (fold), filter, array_max,
    zip_with against the reversed array. The DuckDB oracle has no
    higher-order fold, so it re-derives each value relationally via an
    indexed-lambda unnest (DuckDB has no WITH ORDINALITY) — same numbers, radically different plan,
    which is exactly the point: Spark keeps the work inside one
    projection (no join, no shuffle, one pass per row) where the
    relational formulation needs a self-join on (vec_id, ord).
    Float folds are rounded to 6dp: the fold order (sequential) and
    SUM order (arbitrary) differ, legitimately, by ~1 ulp."""
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(F.transform(arr, lambda x: x * x),
                         F.lit(0.0), lambda acc, x: acc + x)
    dot_rev = F.aggregate(
        F.zip_with(arr, F.reverse(arr), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter(arr, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.array_max(arr), 6).alias("vmax"),
        F.round(dot_rev, 6).alias("dot_rev"))


@query("posexplode_ordinality", oracle="""
SELECT vec_id, CAST(s['i'] AS BIGINT) AS ord, CAST(s['v'] AS DOUBLE) AS v
FROM (SELECT vec_id,
             unnest(list_transform(embedding, (x, i) -> {'i': i, 'v': x})) AS s
      FROM embeddings WHERE vec_id < 40)
""")
def posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinality-preserving explode: array position survives the
    flatten (posexplode ↔ DuckDB's indexed-lambda
    unnest, aligned to the SQL-standard 1-based ordinal). This is the lateral primitive the
    inverted-index dedup operators build on; the vec_id filter keeps
    the oracle comparison focused (row-multiplying ops explode the
    hash-compare cost, not the engine's)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 40)
    return (e.select("vec_id", F.posexplode("embedding"))
             .select("vec_id",
                     (F.col("pos") + 1).cast("long").alias("ord"),
                     F.col("col").cast("double").alias("v")))


@query("null_safe_join", oracle="""
SELECT o.k, o.n_orders, l.n_items
FROM (SELECT NULLIF(o_orderstatus, 'O') AS k, COUNT(*) AS n_orders
      FROM orders GROUP BY 1) o
JOIN (SELECT NULLIF(l_linestatus, 'O') AS k, COUNT(*) AS n_items
      FROM lineitem GROUP BY 1) l
ON o.k IS NOT DISTINCT FROM l.k
""")
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` ↔ IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics data
    pipelines usually *want* when NULL is a real category (here:
    'open' status mapped to NULL via NULLIF). A plain equi-join on
    these keys loses the NULL group entirely; the null-safe variant
    still compiles to a hash join (NULL hashes like any value under
    <=>), so there's no plan penalty."""
    o = (load_table(spark, sf_dir, "orders")
         .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k"))
         .agg(F.count("*").alias("n_orders")))
    l = (load_table(spark, sf_dir, "lineitem")
         .groupBy(F.nullif(F.col("l_linestatus"), F.lit("O")).alias("lk"))
         .agg(F.count("*").alias("n_items")))
    return (o.join(l, o.k.eqNullSafe(l.lk))
             .select("k", "n_orders", "n_items"))
