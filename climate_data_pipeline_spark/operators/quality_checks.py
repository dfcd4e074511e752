"""Declarative data-quality expectations — the validation gate a
100 TB pipeline runs before spending cluster-days downstream.

The reference validates inputs ad hoc (variable-name checks
`ingest/netcdf_reader.py:59-64`, chunk sanity warnings
`processing/chunking.py:226-267`); this generalizes both into
composable, *single-pass* expectations over any DataFrame:

- every check compiles to a conditional aggregate (`sum(case when
  violated)`), so N checks on one table = ONE scan, one tiny
  all-reduce — no per-check jobs;
- referential checks (foreign keys) are the only ones that join, and
  they probe with a left-anti against the (usually broadcastable)
  key side;
- the report is itself a DataFrame: persistable next to the data it
  audited, unioned across tables, trended over time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    violated: Column  # boolean: TRUE where the row breaks the expectation


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"in_range:{col}",
                 ~F.col(col).between(lo, hi) | F.col(col).isNull())


def matches(col: str, pattern: str) -> Check:
    """NULL values do not violate a pattern check (their predicate is
    NULL → not counted) — compose with `not_null` to forbid them."""
    return Check(f"matches:{col}", ~F.col(col).rlike(pattern))


def one_of(col: str, values) -> Check:
    """NULL values do not violate membership — compose with `not_null`."""
    return Check(f"one_of:{col}", ~F.col(col).isin(*values))


def expression(name: str, violated_when: Column) -> Check:
    return Check(f"expr:{name}", violated_when)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All row-level checks in one scan: per check, rows violated.
    Output: (check, n_violations, n_rows, pass). An empty input passes
    every check (0 violations — sum() of no rows is NULL, coalesced);
    duplicate check names are rejected (the report columns would be
    ambiguous)."""
    seen: set[str] = set()
    for c in checks:
        if c.name in seen:
            raise ValueError(
                f"duplicate check name {c.name!r} — wrap one in "
                "expression() with a distinct name")
        seen.add(c.name)
    aggs = [F.coalesce(F.sum(c.violated.cast("long")), F.lit(0))
            .alias(c.name) for c in checks]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    names = F.array(*[F.lit(c.name) for c in checks])
    viols = F.array(*[F.col(c.name) for c in checks])
    pairs = F.arrays_zip(names.alias("check"), viols.alias("v"))
    return (row.select(F.col("__n"), F.explode(pairs).alias("p"))
               .select(F.col("p.check").alias("check"),
                       F.col("p.v").alias("n_violations"),
                       F.col("__n").alias("n_rows"))
               .withColumn("pass", F.col("n_violations") == 0))


def unique_key_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once (empty result = key is unique).
    One shuffle on the key; at scale this is the same agg the dedup
    operators start from, so the result is reusable."""
    return (df.groupBy(*key_cols).agg(F.count("*").alias("n_copies"))
              .where(F.col("n_copies") > 1))


def referential_violations(child: DataFrame, child_key: str,
                           parent: DataFrame, parent_key: str) -> DataFrame:
    """Orphaned foreign keys: child rows whose key is absent from the
    parent — a left-anti probe (broadcast when the parent key set
    fits, shuffle-hash otherwise; Catalyst/AQE decides)."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(keys, child_key, "left_anti")
