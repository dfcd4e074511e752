"""Skew mitigation (SURVEY.md §4 / 100 TB design): salting for hot keys.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime; these operators are the
explicit form for the cases AQE can't fix:

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt) spreads a hot key over N reducers, then the tiny salted
  result re-aggregates. Works for any algebraic aggregate (sum/count/
  min/max; avg = sum+count recombined).
- ``salted_join``: replicate the small side N× (one copy per salt),
  salt the big side randomly — a hot key's rows spread over N tasks.
  Result set provably identical to the plain join (tested).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     aggs: dict[str, tuple[str, str]],
                     n_salts: int = 8) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (fn, column) with fn ∈ sum|count|min|max.
    Phase 1 aggregates on (keys, salt); phase 2 merges per key:
    sum→sum, count→sum, min→min, max→max.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{name}: fn must be one of {sorted(merge_fn)}")
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[phase1_fn[fn](col).alias(name) for name, (fn, col) in aggs.items()])
    return p1.groupBy(*keys).agg(
        *[merge_fn[fn](name).alias(name) for name, (fn, _c) in aggs.items()])


def salted_join(big: DataFrame, small: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: big side gets a random salt ∈ [0, n_salts);
    small side is replicated once per salt value; join on (key, salt).
    Each output row appears exactly once (each big row matches exactly
    its own salt copy), so the result equals the unsalted join.

    Only ``inner`` and ``left`` (big side preserved) are supported:
    under right/full the small side's n_salts replicas each emit their
    OWN null-extended row for salt values no big row landed on — up to
    n_salts spurious rows per key — so those modes are rejected rather
    than silently wrong (flip the sides and use left, or pre-aggregate
    the small side)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — "
            "right/full would duplicate null-extended small-side rows "
            "once per salt")
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small_rep = small.withColumn("__salt", salts)
    big_salted = big.withColumn("__salt",
                                (F.rand(seed=7) * n_salts).cast("int"))
    return (big_salted.join(small_rep, on=[on, "__salt"], how=how)
                      .drop("__salt"))


def skew_report(df: DataFrame, key: str, top_n: int = 5) -> DataFrame:
    """Key-distribution diagnostic: top-N hottest keys with their share of
    rows — decides whether salting / AQE skew thresholds are needed.
    ONE scan: the total is a window sum over the (tiny, n_keys-row)
    aggregated counts — a separate df.count() action would read the
    full table a second time just for the denominator."""
    from pyspark.sql import Window

    counts = df.groupBy(key).count()
    total = F.sum("count").over(Window.partitionBy())
    return (counts.withColumn("share", F.col("count") / total)
                  .orderBy(F.col("count").desc(), F.col(key).asc())
                  .limit(top_n))
