"""MERGE / upsert emulation without a table format (guide §OLAP patterns:
"CDC / SCD2 → MERGE INTO (needs Delta; emulate with anti-join + union)").

Parquet has no row-level MERGE; Delta/Iceberg jars aren't in this
environment (stub note in sources/io). These operators implement the
same semantics relationally — the standard pre-lakehouse pattern, and
still the right shape for rewrite-partition pipelines at scale:

- ``merge_upsert``: target ⟕ updates by key → updated rows replace,
  unmatched target rows survive, brand-new update rows insert.
  One anti-join + one union; both sides shuffle once on the key.
- ``scd2_apply``: slowly-changing-dimension type 2 — close out current
  versions that changed (set valid_to) and append the new versions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: Sequence[str]) -> DataFrame:
    """UPSERT: rows of ``updates`` win on key collision; all other target
    rows pass through. Schemas must match (validated)."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target={sorted(target.columns)} "
            f"updates={sorted(updates.columns)}")
    survivors = target.join(updates.select(*keys), on=list(keys),
                            how="left_anti")
    return survivors.unionByName(updates)


def scd2_apply(dim: DataFrame, changes: DataFrame, keys: Sequence[str],
               compare_cols: Sequence[str],
               effective_col: str = "valid_from",
               end_col: str = "valid_to",
               current_flag: str = "is_current",
               effective_ts: str = "2024-01-01 00:00:00") -> DataFrame:
    """SCD type 2: for each changed key, close the current version
    (``valid_to`` = effective_ts, ``is_current`` = false) and append the
    new version; a change row whose key has NO current dim version
    (brand-new entity, or all versions closed) is INSERTED as a fresh
    current version — standard SCD2 semantics (an inner-join-only
    implementation silently loses new keys). Unchanged and historical
    rows pass through untouched.

    ``dim`` must carry (keys, compare_cols, valid_from, valid_to,
    is_current); ``changes`` carries (keys, compare_cols).
    """
    keys = list(keys)
    if not compare_cols:
        raise ValueError("compare_cols must name at least one column")
    ts = F.lit(effective_ts).cast("timestamp")

    current = dim.where(F.col(current_flag))
    changed_keys = (changes.alias("c")
                    .join(current.alias("d"), on=keys)
                    .where(" OR ".join(
                        f"NOT (c.{c} <=> d.{c})" for c in compare_cols))
                    .select(*[F.col(f"c.{k}") for k in keys])
                    .distinct())
    # keys appearing in changes with no current version at all
    new_keys = (changes.select(*keys).distinct()
                       .join(current.select(*keys), on=keys,
                             how="left_anti"))
    inserting_keys = changed_keys.unionByName(new_keys).distinct()

    closing = (dim.join(F.broadcast(changed_keys), on=keys, how="left_semi")
                  .where(F.col(current_flag))
                  .withColumn(end_col, ts)
                  .withColumn(current_flag, F.lit(False)))
    untouched_current = (dim.where(F.col(current_flag))
                            .join(changed_keys, on=keys, how="left_anti"))
    history = dim.where(~F.col(current_flag))

    new_versions = (changes.join(F.broadcast(inserting_keys), on=keys,
                                 how="left_semi")
                    .withColumn(effective_col, ts)
                    .withColumn(end_col, F.lit(None).cast("timestamp"))
                    .withColumn(current_flag, F.lit(True)))

    return (history.unionByName(untouched_current)
                   .unionByName(closing)
                   .unionByName(new_versions.select(*dim.columns)))
