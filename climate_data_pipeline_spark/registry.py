"""Query registry — the driver-facing surface.

Each entry pairs a Spark DataFrame query (built from the package's
operators) with the equivalent ANSI SQL for the DuckDB oracle. The driver
compares row count + schema + order-insensitive value hash at sf=0.01
(see `/root/repo/__spark_entry__.py`), so results must be *bit-deterministic*
across partitionings:

- sums of integer-valued doubles (quantities) are exact in IEEE double;
- currency values (k-decimal doubles) sum as scaled 64-bit integers
  (``functions.exact``: round(x·10^k) → long) — exact, order-independent,
  ~2× faster than DECIMAL aggregation — then divide back to double;
- inherently order-sensitive float aggregates (stddev, correlation,
  regression slopes, interpolated percentiles) are rounded to a precision
  far above the accumulation error but far below data variation;
- when a rounded value can land EXACTLY on a decimal tie (e.g. an
  average of scaled-integer sums divisible to ...5), ``round(x, 6)`` is
  NOT portable: Spark rounds the double's shortest decimal form
  (BigDecimal HALF_UP) while DuckDB multiplies-and-rounds in binary —
  the tie can break differently. Round in INTEGER units instead
  (``functions.exact.round_port`` / ``sql_round_port``, i.e.
  ``round(x·10^s)/10^s``): the tie is then an exactly-representable .5
  both engines resolve identically. Applies to every RATIONAL-valued
  round — integer ratios, scaled-sum averages, cents × rate, window
  percent_rank — and was validated by a full 200-query parity sweep at
  sf0.1 (10× the driver's scale: more rows → boundary rows appear that
  sf0.01 never hits). Transcendental outputs (ln/sqrt/cos) cannot tie
  and keep plain round. One more sf0.1-only find: DuckDB's round keeps
  IEEE ``-0.0`` where Spark's BigDecimal path does not — append
  ``+ 0.0`` on both sides when a rounded value can be a negative
  epsilon (cf. seasonal_decompose).

Register with the ``@query(name, oracle=...)`` decorator; ``oracle=None``
marks a non-SQL-expressible op (driver records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, Entry] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # with 200+ entries across 27 modules a silent overwrite
            # would validate the WRONG implementation — fail at import
            raise ValueError(f"duplicate query name {name!r} "
                             f"(first registered by "
                             f"{REGISTRY[name].fn.__module__})")
        REGISTRY[name] = Entry(fn, oracle)
        return fn
    return deco


# The per-round driver correctness sample reads the FIRST 50 entries of
# queries() in dict order, so a fixed registration order would pin the
# driver's coverage to the same 50 names forever (215 registered). This
# list promotes a rotating slice — this round's changed queries plus
# families the driver has never sampled — to the front; everything else
# follows in registration order, so ~35 of the long-standing names stay
# in the sample for round-over-round continuity. Refresh each round.
DRIVER_ROTATION = [
    # NEW/CHANGED this round (10) — the jaccard density gate rides
    # under these four, the Lambert oracle was op-mirrored, and the
    # streaming/MP3/HDF5-scaleoffset queries are new
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_clusters_star",
    "dedup_keep_best", "s_grib2_lambert_ingest",
    "stream_rollup_parity", "mm_decode_mp3", "s_hdf5_scaleoffset_f",
    "text_url_canonicalize", "crawl_robots_screen",
    "crawl_sitemap_extract", "crawl_main_content",
    # never driver-sampled through r09 (VERDICT r9 ask #1): the
    # SURVEY §2 operator heart — temporal aggregations, trends,
    # climate indices, resampling — plus the core dedup/text/sim
    # names. All sweep-green every round; this puts them under the
    # driver's independent-session gate of record.
    "a1_monthly_mean", "a2_seasonal_mean", "a3_annual_mean",
    "a4_climatology_month", "a4_climatology_season",
    "a4_climatology_hour", "a8_linear_trend", "a9_mann_kendall",
    "a9_mk_s_stat", "a9_mk_z_p", "a9_seasonal_mann_kendall",
    "a10_trend_confidence", "a11_global_stats", "a11_pricing_summary",
    "a12_region_stats", "w1_rolling_mean", "w4_resample_ffill",
    "w5_resample_interp", "etccdi_day_counts", "etccdi_r95ptot",
    "etccdi_dtr_sdii", "wsdi_warm_spell_index", "csdi_cold_spell_index",
    "season_onset_date", "trend_field_significance",
    "series_correlation_matrix", "dedup_exact", "dedup_minhash",
    "dedup_minhash_affine", "dedup_simhash", "dedup_simhash64",
    "dedup_incremental", "text_token_stats", "text_quality",
    "text_language_id", "text_fingerprint", "text_contamination",
    "sim_cosine_topk", "sim_lsh_ann", "dedup_semantic_clusters",
    "sim_ivf_seeded", "stats_correlation", "weighted_median_groups",
    "p4_point_select", "s2_projected_scan",
    "tpch_q6_forecast_revenue", "tpch_q19_disjunctive_revenue",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    rot = [n for n in DRIVER_ROTATION if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(rot)]
    return {name: REGISTRY[name].fn for name in rot + rest}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries as _q  # noqa: F401
    _LOADED = True
