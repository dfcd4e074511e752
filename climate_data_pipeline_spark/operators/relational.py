"""Relational building blocks beyond plain Catalyst built-ins
(SURVEY.md §2.3, §2.5, §2.6).

The reference has no relational joins (single-table dense-array model,
SURVEY.md §2.3) — the join family itself is Catalyst's. What the engine
adds here are the composite patterns: top-k per group, sessionization,
and deterministic point selection, each a single-shuffle window pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int,
          partition_keys: Sequence[str] = (),
          rank_alias: str = "rank") -> DataFrame:
    """Top-k (per group when ``partition_keys`` given) via row_number over a
    deterministic order — include a unique tie-break column in ``order_by``
    or ties make the selected set nondeterministic. Unpartitioned top-k
    still avoids a global sort: Spark's TakeOrderedAndProject takes per-
    partition heads then merges k·n_partitions rows on the driver."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if not partition_keys:
        return df.orderBy(*order).limit(k)
    w = Window.partitionBy(*partition_keys).orderBy(*order)
    return (df.withColumn(rank_alias, F.row_number().over(w))
              .where(F.col(rank_alias) <= k))


def sessionize(df: DataFrame, time_col: str, entity_col: str,
               gap_minutes: float = 30.0,
               order_cols: Sequence[str] | None = None,
               session_alias: str = "session_id") -> DataFrame:
    """Assign session ids per entity: a new session starts when the gap to
    the previous event exceeds ``gap_minutes`` (lag + cumulative sum — the
    standard batch sessionization; the streaming analogue is
    ``session_window``). One shuffle on the entity key."""
    order = [F.col(c) for c in (order_cols or [time_col])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(time_col).over(w)
    gap_s = F.unix_timestamp(time_col) - F.unix_timestamp(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    running = (Window.partitionBy(entity_col).orderBy(*order)
                     .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(session_alias,
                         F.sum(new_session).over(running).cast("long"))


def nearest_point(df: DataFrame, targets: dict[str, float],
                  tie_break: Sequence[str] = ()) -> DataFrame:
    """Nearest-neighbor point selection — the reference's API point query
    semantics (`api/routes/data.py:88-127`, SURVEY.md P4): order by L1
    distance to the target coordinates, deterministic tie-break, take 1."""
    dist = None
    for c, v in targets.items():
        term = F.abs(F.col(c) - F.lit(v))
        dist = term if dist is None else dist + term
    return df.orderBy(dist, *[F.col(c) for c in tie_break]).limit(1)
