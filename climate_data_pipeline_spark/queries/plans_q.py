"""Query entry for the op-dict DSL compiler (O4) — the reference's
background-job "query language" compiled to one Catalyst plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.ops import run_ops
from ..registry import query
from ..sources.io import load_table

DEMO_OPS = [
    {"op": "slice_time", "column": "l_shipdate",
     "start": "1996-01-01", "end": "1998-12-31"},
    {"op": "slice_region", "bounds": {"l_quantity": [5, 45]}},
    {"op": "resample", "freq": "month", "column": "l_shipdate",
     "keys": ["l_returnflag"],
     "aggs": {"avg_qty": "mean(l_quantity)", "n": "count(l_linenumber)"}},
]


@query("o4_ops_dsl", oracle="""
SELECT date_trunc('month', l_shipdate) AS period, l_returnflag,
       avg(l_quantity) AS avg_qty,
       count(l_linenumber) AS n
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
  AND l_quantity BETWEEN 5 AND 45
GROUP BY 1, 2
""")
def ops_dsl_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — slice_time → slice_region → resample compiled from op dicts
    (reference `tasks/celery_tasks.py:210-231`). Both predicates reach the
    parquet scan because the compiled chain is one lazy Catalyst plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return run_ops(li, DEMO_OPS)
