"""Incremental rollup maintenance (beyond-reference extension).

The reference pre-computes metrics once and serves them from cache
(`/root/reference/src/arco_demo.py:242-247` pre-calculation rationale,
`api/cache.py` serving cache). At 100 TB the missing piece is *keeping
those materialized rollups current without full recompute*: when a new
day/partition of facts lands, only the delta should shuffle.

The standard answer — and what this module implements — is the
partial-aggregate (commutative-monoid) state pattern behind every
incremental-view-maintenance engine and Spark's own map-side combine:

- ``rollup_partials`` reduces a fact slice to per-group state
  ``(sum_scaled, n, min_v, max_v)``. Sums use the scaled-integer exact
  representation (``functions/exact.py``) so state is associative AND
  bit-deterministic — merging partials in any order or grouping yields
  identical results.
- ``merge_rollups`` combines any number of partial states with one
  group-agg (sum/sum/min/max are each monoids).
- ``finalize_rollup`` derives the presentation columns (mean = sum/n)
  that are NOT monoids and therefore only computed at read time.

Scale shape: maintaining a rollup over a 100 TB fact table costs one
partial-agg over the new partition (its size, not the table's) plus a
merge whose input is O(#groups) — the fact history is never re-read.
The equivalence ``merge(partials(A), partials(B)) == partials(A ∪ B)``
is asserted in tests and hash-checked against a full-recompute DuckDB
oracle (`incremental_rollup`).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("sum_scaled", "n", "min_v", "max_v")


def rollup_partials(df: DataFrame, keys: Sequence[str], value_col: str,
                    scale: int = 2) -> DataFrame:
    """Reduce a fact slice to mergeable per-group aggregate state."""
    factor = 10 ** scale
    v = F.col(value_col)
    return (df.groupBy(*keys)
              .agg(F.sum(F.round(v * factor).cast("long")).alias("sum_scaled"),
                   F.count(v).alias("n"),
                   F.min(v).alias("min_v"),
                   F.max(v).alias("max_v")))


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Merge partial states (all with the same key + STATE_COLS schema).
    One union + one group-agg; input volume is O(#groups per rollup),
    independent of the fact volume that produced the partials."""
    keys = [c for c in rollups[0].columns if c not in STATE_COLS]
    unioned = reduce(lambda a, b: a.unionByName(b), rollups)
    return (unioned.groupBy(*keys)
                   .agg(F.sum("sum_scaled").alias("sum_scaled"),
                        F.sum("n").alias("n"),
                        F.min("min_v").alias("min_v"),
                        F.max("max_v").alias("max_v")))


GROUP_STATE_COLS = ("sum_scaled", "n")


def cdc_delta_state(cdc: DataFrame, keys: Sequence[str], value_col: str,
                    scale: int = 2, change_col: str = "change") -> DataFrame:
    """Signed mergeable state from a row-level change feed
    (``change ∈ {insert, delete}`` — the `sources/snapshots.snapshot_diff`
    contract, where an update is delete+insert). Inserts contribute
    +value/+1, deletes −value/−1, so the per-group state is an element
    of the *group* (invertible monoid) ℤ² — the algebra every
    incremental-view-maintenance engine leans on. min/max are
    deliberately absent: they are not invertible under deletion (a
    deleted extremum forces a per-group rescan), so the CDC path
    maintains the sum/count/avg family only."""
    factor = 10 ** scale
    sign = (F.when(F.col(change_col) == "insert", F.lit(1))
             .otherwise(F.lit(-1)))
    v = F.col(value_col)
    return (cdc.groupBy(*keys)
               .agg(F.sum(sign * F.round(v * factor).cast("long"))
                     .alias("sum_scaled"),
                    F.sum(sign).alias("n")))


def apply_cdc_delta(state: DataFrame, delta: DataFrame,
                    keys: Sequence[str]) -> DataFrame:
    """Refresh invertible rollup state with a signed CDC delta: one
    union + one group-sum; groups whose live count reaches zero vanish
    from the view (the `n > 0` guard). Cost is O(#changed rows) to
    reduce the delta + O(#groups) to merge — the base fact history is
    never re-read. ``state`` may carry extra non-state columns only if
    listed in ``keys``."""
    unioned = (state.select(*keys, *GROUP_STATE_COLS)
               .unionByName(delta.select(*keys, *GROUP_STATE_COLS)))
    return (unioned.groupBy(*keys)
                   .agg(F.sum("sum_scaled").alias("sum_scaled"),
                        F.sum("n").alias("n"))
                   .where(F.col("n") > 0))


def finalize_group_state(state: DataFrame, scale: int = 2,
                         prefix: str = "") -> DataFrame:
    """Presentation columns for the invertible (sum, n) state; same
    fixed division order as :func:`finalize_rollup`."""
    factor = float(10 ** scale)
    keys = [c for c in state.columns if c not in GROUP_STATE_COLS]
    return state.select(
        *keys,
        F.col("n").alias(f"{prefix}n"),
        (F.col("sum_scaled") / factor).alias(f"{prefix}sum"),
        ((F.col("sum_scaled") / factor) / F.col("n")).alias(f"{prefix}avg"),
    )


def finalize_rollup(rollup: DataFrame, scale: int = 2,
                    prefix: str = "") -> DataFrame:
    """Derive presentation columns from merged state. Division order is
    fixed ((sum/factor)/n) so the doubles match any engine computing the
    same exact-sum expression."""
    factor = float(10 ** scale)
    keys = [c for c in rollup.columns if c not in STATE_COLS]
    total = (F.col("sum_scaled") / factor).alias(f"{prefix}sum")
    return rollup.select(
        *keys,
        F.col("n").alias(f"{prefix}n"),
        total,
        ((F.col("sum_scaled") / factor) / F.col("n")).alias(f"{prefix}avg"),
        F.col("min_v").alias(f"{prefix}min"),
        F.col("max_v").alias(f"{prefix}max"),
    )
