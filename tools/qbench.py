"""Targeted per-query bench: time named registry queries to the noop sink.

Usage: python tools/qbench.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     QBENCH_N / QBENCH_WARMUP (default 5 / 2).

Same methodology as bench.py (noop sink, perf_counter, same session
factory) but only the named queries — the guide-§1 isolation loop for
optimization A/Bs without paying for the full 66-query suite each time.
Prints one JSON line: {name: {mean_s, min_s, max_s, times}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("QBENCH_N", "5"))
    warmup = int(os.environ.get("QBENCH_WARMUP", "2"))
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: qbench.py query_name [query_name ...]")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from climate_data_pipeline_spark import registry
    from climate_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cdps-qbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    unknown = [x for x in names if x not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        def run() -> float:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            return time.perf_counter() - t0
        for _ in range(warmup):
            run()
        times = [round(run(), 4) for _ in range(n)]
        out[name] = {"mean_s": round(statistics.mean(times), 4),
                     "min_s": round(min(times), 4),
                     "max_s": round(max(times), 4),
                     "times": times}
        print(f"# {name}: mean {out[name]['mean_s']}s "
              f"min {out[name]['min_s']}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
