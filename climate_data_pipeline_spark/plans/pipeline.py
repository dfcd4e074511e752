"""Pipeline runners (SURVEY.md §2.10 O1-O3).

The reference wraps Dask graphs in named-step pipelines with progress and
lazy variants (`/root/reference/src/climate_pipeline/processing/
dask_pipeline.py:16-94, 215-297`). DataFrames are already lazy DAGs, so
these are thin: ordered named transforms (`df.transform`), persist
control, and plan introspection via the Catalyst explain output instead
of `__dask_graph__` task counts.

`execute_parallel` (O2, `dask_pipeline.py:97-131`) maps to submitting
several DataFrame actions under one SparkSession — Spark's scheduler
interleaves their stages; a thread pool is only needed because actions
block the calling thread.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PipelineStep:
    name: str
    func: Callable[[DataFrame], DataFrame]
    description: str = ""


@dataclass
class Pipeline:
    """Eager pipeline: ordered named steps (the reference's Pipeline,
    `dask_pipeline.py:16-94`). Step timings measure plan *construction*
    (lazy, ~0); actual execution happens once at materialization and is
    recorded under ``__materialize__`` — the same split as the
    reference's build-then-`.compute()` under a ProgressBar."""
    steps: list[PipelineStep] = field(default_factory=list)
    timings: dict[str, float] = field(default_factory=dict)

    def add_step(self, name: str,
                 func: Callable[[DataFrame], DataFrame],
                 description: str = "") -> "Pipeline":
        self.steps.append(PipelineStep(name, func, description))
        return self

    def execute(self, df: DataFrame, materialize: bool = True) -> DataFrame:
        for step in self.steps:
            t0 = time.perf_counter()
            df = df.transform(step.func)
            self.timings[step.name] = time.perf_counter() - t0
        if materialize:
            t0 = time.perf_counter()
            df = df.localCheckpoint(eager=True)  # cut lineage = .compute()
            self.timings["__materialize__"] = time.perf_counter() - t0
        return df


def create_pipeline(*steps: tuple[str, Callable[[DataFrame], DataFrame]]) -> Pipeline:
    p = Pipeline()
    for name, fn in steps:
        p.add_step(name, fn)
    return p


class LazyPipeline:
    """Lazy transform chain with persist + plan introspection — the
    reference's LazyPipeline (`dask_pipeline.py:215-297`). ``graph_info``
    reports physical-plan node counts from Catalyst instead of Dask task
    counts."""

    def __init__(self, df: DataFrame):
        self._df = df

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "LazyPipeline":
        return LazyPipeline(self._df.transform(fn))

    def persist(self) -> "LazyPipeline":
        return LazyPipeline(self._df.persist())

    def compute(self) -> DataFrame:
        return self._df

    def graph_info(self) -> dict:
        plan = self._df._jdf.queryExecution().executedPlan().toString()
        lines = [ln for ln in plan.splitlines() if ln.strip()]
        return {
            "physical_operators": sum(
                1 for ln in lines
                if ln.lstrip().startswith(("+-", "*(", ":-"))
                or ln.startswith(("*(", "Execute"))),
            "has_exchange": "Exchange" in plan,
            "num_exchanges": plan.count("Exchange "),
            "wholestage_codegen_spans": plan.count("*("),
            "plan": plan,
        }


def execute_parallel(dfs: Sequence[DataFrame],
                     fn: Callable[[DataFrame], DataFrame],
                     max_workers: int = 4) -> list[DataFrame]:
    """Fan one transform out over N DataFrames and materialize them
    concurrently under the shared SparkSession (O2). The pool exists only
    because actions block; the cluster-side scheduling is Spark's."""
    def run(df: DataFrame) -> DataFrame:
        return fn(df).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(run, dfs))
