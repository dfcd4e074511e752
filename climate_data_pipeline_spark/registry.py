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
    # NEW/CHANGED this round (9) — GRIB2 missing-value management +
    # Lambert conformal grids, HDF5 nbit/scaleoffset filters, the
    # df-capped source-overlap arm, the gated-broadcast keep_best and
    # the numpy union-find under the clustering family
    "s_grib2_missing_ingest", "s_grib2_lambert_ingest",
    "s_grib2_jpeg2000_ingest", "s_grib2_aec_ingest",
    "s_grib2_spectral_ingest", "s_grib2_spaceview_ingest",
    "s_hdf5_nbit_ingest", "corpus_source_overlap_dfcap",
    "corpus_source_overlap", "dedup_keep_best", "dedup_clusters",
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_dfcap",
    # never driver-sampled in r07/r08 (VERDICT r8 ask #7): the mm_*
    # media family and mid-range TPC-H shapes — rotate them in front
    # of the 50-name cut
    "mm_frame_dedup", "mm_decode_jpeg", "mm_video_frames",
    "mm_audio_features", "mm_image_resize", "mm_decode_png",
    "mm_decode_ico", "mm_frame_sample", "mm_decode_real",
    "tpch_q9_product_profit", "tpch_q13_order_count_distribution",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_shippers", "tpch_q21_waiting_orders",
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
