"""As-of join query: each click event matched to the user's most recent
preceding purchase — oracle-checked against DuckDB's native ASOF JOIN."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..registry import query
from ..sources.io import load_table


@query("asof_join_events", oracle="""
WITH clicks AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       p.ts AS ts_purchase, p.value AS value_purchase,
       epoch_us(c.ts) - epoch_us(p.ts) AS staleness_us
FROM clicks c
ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND p.ts <= c.ts
""")
def asof_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward inclusive as-of join (union + last-ignore-nulls window —
    one shuffle, no UDF) vs DuckDB's native ASOF JOIN. staleness is exact
    integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click") \
               .select("event_id", "user_id", "ts", "value")
    purchases = ev.where(F.col("event_type") == "purchase") \
                  .select("user_id", "ts", "value")
    out = asof_join(clicks, purchases, on="ts", by=["user_id"],
                    right_cols=["value"], suffix="_purchase")
    return out.withColumn(
        "staleness_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_purchase")))
