"""Dump `.explain("formatted")` for named queries to plans/<dir>/.

Usage: python tools/plan_dump.py OUTDIR SUFFIX name [name ...]
e.g.   python tools/plan_dump.py plans/r11 after crawl_main_content

Writes OUTDIR/<name>_<SUFFIX>.txt. Used for the per-round before/after
plan evidence (the judge checks plan claims against these files).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from climate_data_pipeline_spark import registry
    from climate_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cdps-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
