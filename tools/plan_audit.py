"""Auto-generated physical-plan inventory for every registered query.

Prints a markdown table (stdout): exchanges, join strategies, map-side
partial aggregation, Python/Arrow stages, codegen span count — the
shuffle/strategy facts that determine 100 TB behavior. Run:

    python tools/plan_audit.py [sf_dir] > PLANS.md

Queries that mutate session state or require special configs are planned
as-is under the package session; failures are reported, not skipped
silently (no-silent-caps discipline).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOIN_KINDS = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from climate_data_pipeline_spark import registry
    from climate_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cdps-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry._load_all()

    print("# PLANS — auto-generated physical-plan inventory")
    print()
    print(f"`python tools/plan_audit.py {sf_dir}` — one row per registered")
    print("query, EXECUTED so the audited plan is the final adaptive one;")
    print("join column lists strategy×count; `partial` = map-side")
    print("partial aggregation present; `py` = Arrow/Python stages")
    print("(ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas);")
    print("`wscg` = WholeStageCodegen span count. Counts are textual")
    print("occurrences in the executed-plan printout: queries that")
    print("persist an intermediate (e.g. the LSH signature base) repeat")
    print("the cached relation's child plan under every InMemoryTableScan,")
    print("so their `py` column overstates actual UDF executions (the")
    print("kernel runs once, at cache materialization).")
    print()
    print("| query | exchanges | joins | partial | py | wscg |")
    print("|---|---|---|---|---|---|")

    failures: list[tuple[str, str]] = []
    for name in sorted(registry.REGISTRY):
        fn = registry.REGISTRY[name].fn
        try:
            df = fn(spark, sf_dir)
            # execute THIS dataframe's own query (write would spawn a
            # separate command QE) so AQE finalizes: the audited plan is
            # the one that actually ran — joins AQE re-planned, codegen
            # stages fused. Row volume is small at sf0.001.
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            # adaptive toString prints "== Final Plan ==" then repeats the
            # pre-AQE tree under "== Initial Plan ==" — audit the final one
            plan = plan.split("== Initial Plan ==")[0]
        except Exception as exc:  # report, never silently drop
            failures.append((name, str(exc).splitlines()[0][:100]))
            continue
        n_ex = plan.count("Exchange ")
        joins = ", ".join(
            f"{k}×{plan.count(k)}" for k in JOIN_KINDS if k in plan) or "—"
        partial = "✓" if "partial_" in plan else "—"
        py_ops = sum(plan.count(k) for k in (
            "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
            "BatchEvalPython"))
        py = str(py_ops) if py_ops else "—"
        # the final adaptive plan marks codegen stages as "*(n) Operator"
        wscg = len(set(re.findall(r"\*\((\d+)\)", plan)))
        print(f"| {name} | {n_ex} | {joins} | {partial} | {py} | {wscg} |")

    print()
    if failures:
        print("## Planning failures")
        print()
        for name, msg in failures:
            print(f"- **{name}**: {msg}")
        sys.exit(1)
    print(f"_{len(registry.REGISTRY)} queries planned, 0 failures._")


if __name__ == "__main__":
    main()
