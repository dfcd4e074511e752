"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY.md §7 custom-operator guidance: compose built-ins first).

Semantics: for each left row, attach the most recent right row of the
same entity with ``right.ts <= left.ts`` (backward as-of, inclusive —
pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` default), optionally within
a tolerance.

Implementation is pure relational composition — **no UDF, no
per-group pandas**: tag both sides, union, and take
``last(right_value) IGNORE NULLS`` over an entity-partitioned window
ordered by (ts, side) with right rows sorting before coincident left
rows. One shuffle on the entity key for the union'd relation — the same
cost as a regular sort-merge join, robust to arbitrarily many right rows
per left row (no row explosion). This beats the broadcast-and-filter or
pd.merge_asof-per-group formulations at 100 TB because the window state
is a single running value per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Sequence[str],
              right_cols: Sequence[str],
              tolerance_us: int | None = None,
              suffix: str = "_right") -> DataFrame:
    """Backward inclusive as-of join.

    left/right share the ``by`` entity keys and the ``on`` timestamp
    column; ``right_cols`` are carried from the matched right row (plus
    ``on + suffix``, the matched timestamp). With ``tolerance_us``,
    matches staler than the tolerance become NULL (pandas
    ``merge_asof(tolerance=...)``).
    """
    by = list(by)
    lcols = left.columns
    on_type = dict(left.dtypes)[on]  # timestamp or timestamp_ntz — keep it
    tagged_left = (left.withColumn("__side", F.lit(1))
                       .withColumn("__r_ts", F.lit(None).cast(on_type)))
    for c in right_cols:
        tagged_left = tagged_left.withColumn(f"__r_{c}", F.lit(None)
                                             .cast(dict(right.dtypes)[c]))
    tagged_right = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(on).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in tagged_right.columns:
            tagged_right = tagged_right.withColumn(
                c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = tagged_left.unionByName(tagged_right)

    # right rows sort before coincident left rows → inclusive (<=) match
    w = (Window.partitionBy(*by)
               .orderBy(F.col(on).asc(), F.col("__side").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
    matched = unioned
    matched = matched.withColumn("__m_ts",
                                 F.last("__r_ts", ignorenulls=True).over(w))
    for c in right_cols:
        matched = matched.withColumn(
            f"__m_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))

    out = matched.where(F.col("__side") == 1)
    if tolerance_us is not None:
        # unix_micros requires TIMESTAMP; NTZ columns cast first. Both
        # sides get the same session-zone shift, so the difference is
        # invariant — EXCEPT when the two instants straddle a DST
        # transition of a DST-observing session zone (the shifts then
        # differ by the DST offset). NTZ data should be joined under a
        # fixed-offset session zone (UTC — the engine default) for
        # exact wall-clock tolerance semantics.
        def _us(c):
            return F.unix_micros(c.cast("timestamp"))
        fresh = _us(F.col(on)) - _us(F.col("__m_ts")) <= tolerance_us
        out = out.withColumn("__m_ts", F.when(fresh, F.col("__m_ts")))
        for c in right_cols:
            out = out.withColumn(f"__m_{c}", F.when(fresh, F.col(f"__m_{c}")))

    selected = [*lcols,
                F.col("__m_ts").alias(f"{on}{suffix}"),
                *[F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in right_cols]]
    return out.select(*selected)
