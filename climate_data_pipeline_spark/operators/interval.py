"""Binned interval joins — pure range (theta) joins rewritten as equi
joins, the scale path Spark lacks natively.

A join on ``point BETWEEN start AND end`` (or interval overlap) with NO
equi key gives Catalyst only BroadcastNestedLoopJoin / CartesianProduct
— O(|L|·|R|) pair evaluations, and the broadcast side must fit in
memory. When both sides are large that plan is unusable at 100 TB.

The rewrite: quantize the value domain into fixed-width bins. Each
interval explodes into the bins it covers (`F.sequence` — map-side, row
growth bounded by interval_length/bin_width); each point maps to exactly
one bin. An ordinary shuffled equi join on the bin key then meets every
qualifying pair, and the exact predicate runs as a cheap residual
filter. Pair-meeting multiplicity is handled WITHOUT a dedup shuffle:

- point-in-interval: a point probes only its own bin, so each
  (point, interval) pair meets exactly once by construction;
- interval-overlap: two overlapping intervals share every bin in the
  intersection; the pair is kept only in the FIRST shared bin
  (``bin == greatest(floor(l.start/w), floor(r.start/w))``), which both
  sides cover by definition of overlap — exactly-once without
  ``dropDuplicates``.

Bin width is the tuning knob: too narrow explodes the build side, too
wide packs unrelated rows into one bin (residual does more work). A good
default is the median interval length. This is the same strategy
production engines use for range-join acceleration; here it is pure
DataFrame composition — shuffle on an integer key, AQE-friendly,
skew-visible (a hot bin is a hot key, treatable with the existing
salting tools).

The reference has no interval joins (single-table model), but its
time-slice semantics (`ingest/netcdf_reader.py:67-71`) are the
degenerate point-in-interval case with one interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_col: str, start_col: str, end_col: str,
                           bin_width: float,
                           how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (inclusive), via the bin rewrite above.
    Columns must be numeric (cast timestamps to epoch units first).
    Output: all columns from both sides, qualifying pairs only.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    pb = points.withColumn("__bin",
                           F.floor(F.col(point_col) / bin_width)) \
               .alias("__p")
    ib = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(start_col) / bin_width),
                             F.floor(F.col(end_col) / bin_width)))) \
        .alias("__i")
    # the exact predicate lives IN the join condition, not a residual
    # .where: a residual filter evaluates NULL on left-join's
    # null-extended rows and silently drops them (left degrades to
    # inner), and references unresolvable columns under semi/anti
    cond = ((F.col("__p.__bin") == F.col("__i.__bin"))
            & F.col(f"__p.{point_col}").between(
                F.col(f"__i.{start_col}"), F.col(f"__i.{end_col}")))
    return pb.join(ib, cond, how).drop("__bin")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bin_width: float) -> DataFrame:
    """Inner join of interval pairs that overlap:
    ``l.start <= r.end AND r.start <= l.end`` (inclusive). Each
    qualifying pair is emitted exactly once (first-shared-bin rule —
    no dedup shuffle). Columns must be numeric and distinct across the
    two inputs (alias/rename before calling).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    lb = left.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(l_start) / bin_width),
                             F.floor(F.col(l_end) / bin_width))))
    rb = right.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(r_start) / bin_width),
                             F.floor(F.col(r_end) / bin_width))))
    overlap = ((F.col(l_start) <= F.col(r_end))
               & (F.col(r_start) <= F.col(l_end)))
    first_shared = F.greatest(F.floor(F.col(l_start) / bin_width),
                              F.floor(F.col(r_start) / bin_width))
    return (lb.join(rb, "__bin")
              .where(overlap & (F.col("__bin") == first_shared))
              .drop("__bin"))
