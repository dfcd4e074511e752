"""Distribution-drift detection — engine additions for the
training-data pipeline (no reference analogue; the reference's
validation stops at schema/range checks, `src/benchmark_suite.py` and
`src/climate_pipeline/processing/chunking.py:256-264` sanity bounds).

A 100 TB corpus is assembled in slices (crawls, dumps, epochs); before a
new slice joins the training mix you compare its distributions against
the reference slice. Three standard tests, all as single-pass
DataFrame aggregations:

- ``ks_statistic`` — two-sample Kolmogorov–Smirnov D for continuous
  columns (max CDF gap; non-parametric, scale-free);
- ``psi`` — Population Stability Index over reference-quantile bins
  (the industry drift score: <0.1 stable, 0.1–0.25 shifting, >0.25
  drifted);
- ``chi2_drift`` — two-sample homogeneity chi-square for categorical
  columns.

Scale notes. KS needs a cumulative walk over *distinct values* — the
pre-aggregation shrinks 100 TB of rows to |distinct| cumulants, and the
optional ``bin_width`` quantization bounds that cardinality (error ≤
one bin of CDF mass) so the ordered window never sees raw-row volume;
with ``keys`` the walk is per-key and fully parallel. PSI and chi2 are
plain hash-aggs over ≤ dozens of cells after the map-side combine —
the only global object is the breakpoint array (broadcast, k-1 floats).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_statistic(df: DataFrame, value_col: str, ref_cond: Column,
                 keys: Sequence[str] = (), bin_width: float | None = None,
                 alias: str = "ks_d") -> DataFrame:
    """Two-sample KS statistic: D = max_v |F_ref(v) − F_cur(v)|.

    ``ref_cond`` labels the reference sample; everything else is the
    current sample. Plan: one hash-agg on (keys, value) producing both
    samples' counts in a single pass, then a per-key ordered window for
    the cumulative CDFs (ties collapse into the value group first, so
    the CDF steps *after* all tied rows — the textbook right-continuous
    definition), then a max. ``bin_width`` quantizes values first,
    bounding distinct-value cardinality at scale (adds ≤ one bin of CDF
    error)."""
    v = F.col(value_col)
    if bin_width is not None:
        v = F.floor(v / bin_width) * bin_width
    is_ref = F.when(ref_cond, 1).otherwise(0)
    klist = list(keys)
    # NULLs are missing data, not the lowest value: an unfiltered NULL
    # group sorts first (nulls-first) and injects a phantom CDF step at
    # the bottom — a 20% null rate would read as low-tail drift
    per_value = (df.where(F.col(value_col).isNotNull())
                   .groupBy(*klist, v.alias("__v"))
                   .agg(F.sum(is_ref).alias("__ca"),
                        F.sum(1 - is_ref).alias("__cb")))
    w_cum = (Window.partitionBy(*klist).orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.partitionBy(*klist)
             .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    gap = F.abs(F.sum("__ca").over(w_cum) / F.sum("__ca").over(w_all)
                - F.sum("__cb").over(w_cum) / F.sum("__cb").over(w_all))
    out = per_value.select(*klist, gap.alias("__gap"),
                           F.sum("__ca").over(w_all).alias("n_ref"),
                           F.sum("__cb").over(w_all).alias("n_cur"))
    return (out.groupBy(*klist)
               .agg(F.max("__gap").alias(alias),
                    F.first("n_ref").alias("n_ref"),
                    F.first("n_cur").alias("n_cur")))


def psi_bins(df: DataFrame, value_col: str, ref_cond: Column,
             n_bins: int = 10) -> DataFrame:
    """Per-bin PSI breakdown over reference-quantile breakpoints.

    Breakpoints are the reference sample's exact k-quantiles (swap to
    ``approx_percentile`` at 100 TB, same shape); bin(x) = number of
    breakpoints strictly below x — computed with a broadcast array +
    ``F.aggregate`` fold, shuffle-free on the fact side. A dense bin
    spine (``sequence``/explode) keeps empty bins present so the
    epsilon-smoothed contributions are well-defined.

    Output: (bin, n_ref, n_cur, frac_ref, frac_cur, psi_contrib)."""
    qs = [i / n_bins for i in range(1, n_bins)]
    v = F.col(value_col)
    bp = (df.where(ref_cond)
            .agg(F.expr(f"percentile({value_col}, array({', '.join(map(str, qs))}))")
                 .alias("__bp")))
    binned = (df.where(v.isNotNull())   # NULL is missing data, not bin 0
                .crossJoin(F.broadcast(bp))
                .select(F.aggregate(
                            "__bp", F.lit(0),
                            lambda acc, b: acc + F.when(v > b, 1).otherwise(0))
                        .alias("bin"),
                        F.when(ref_cond, 1).otherwise(0).alias("__is_ref")))
    counts = (binned.groupBy("bin")
                    .agg(F.sum("__is_ref").alias("n_ref"),
                         F.sum(1 - F.col("__is_ref")).alias("n_cur")))
    spine = df.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    dense = (spine.join(counts, "bin", "left")
                  .select("bin",
                          F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                          F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    eps = F.lit(1e-6)
    p_ref = F.greatest(F.col("n_ref") / F.sum("n_ref").over(w_all), eps)
    p_cur = F.greatest(F.col("n_cur") / F.sum("n_cur").over(w_all), eps)
    return dense.select(
        "bin", "n_ref", "n_cur",
        p_ref.alias("frac_ref"), p_cur.alias("frac_cur"),
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_contrib"))


def psi(df: DataFrame, value_col: str, ref_cond: Column,
        n_bins: int = 10) -> DataFrame:
    """Total PSI score: Σ per-bin contributions (see ``psi_bins``)."""
    return psi_bins(df, value_col, ref_cond, n_bins).agg(
        F.sum("psi_contrib").alias("psi"),
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"))


def chi2_drift(df: DataFrame, cat_col: str, ref_cond: Column) -> DataFrame:
    """Two-sample chi-square homogeneity test for a categorical column.

    One hash-agg to the (category × sample) contingency cells, then the
    classic statistic Σ (obs − exp)²/exp with exp_{c,s} = row_c · col_s
    / N. Cell counts are exact longs, so the only float work is the
    final |cats|·2-term reduction. Output: (chi2, dof, n_categories,
    n_ref, n_cur)."""
    is_ref = F.when(ref_cond, 1).otherwise(0)
    cells = (df.groupBy(cat_col)
               .agg(F.sum(is_ref).alias("ca"),
                    F.sum(1 - is_ref).alias("cb")))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    na, nb = F.sum("ca").over(w_all), F.sum("cb").over(w_all)
    n = na + nb
    row_tot = F.col("ca") + F.col("cb")
    ea, eb = row_tot * na / n, row_tot * nb / n
    term = (F.pow(F.col("ca") - ea, 2) / ea
            + F.pow(F.col("cb") - eb, 2) / eb)
    per_cell = cells.select(term.alias("__t"), "ca", "cb")
    return per_cell.agg(
        F.sum("__t").alias("chi2"),
        (F.count("*") - 1).cast("long").alias("dof"),
        F.count("*").alias("n_categories"),
        F.sum("ca").alias("n_ref"), F.sum("cb").alias("n_cur"))
