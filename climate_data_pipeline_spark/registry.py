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
    # CHANGED in round 11 (optimization round). r11a: the J2K
    # Tier-1/DWT rewrite rides under s_grib2_jpeg2000_ingest; the
    # hot-bucket sub-split + size gate under the minhash family; the
    # gram-key change under text_duplicate_spans; the _spread
    # rebalance under crawl_main_content; the robots group-grammar
    # fix under crawl_robots_screen. r11b: the fully host-independent
    # MP3 chain + content-addressed decode memo under mm_decode_mp3;
    # the vectorized Rice encoder / escape reads / LPC fast path /
    # crc16 fold under mm_decode_flac (and the mm_decode umbrella);
    # the Ogg CRC fold under mm_audio_container_meta; the
    # Gaussian-latitude memo under s_grib2_reduced_ingest; the
    # size-gated shared-subtree materializations under
    # corpus_source_overlap(_dfcap), text_perplexity,
    # lang_temperature_resample and a9_seasonal_mann_kendall.
    "mm_decode_mp3", "mm_decode_flac", "mm_audio_container_meta",
    "s_grib2_reduced_ingest", "corpus_source_overlap",
    "corpus_source_overlap_dfcap", "text_perplexity",
    "lang_temperature_resample", "a9_seasonal_mann_kendall",
    "mm_decode", "s_grib2_jpeg2000_ingest", "crawl_main_content",
    "text_duplicate_spans", "dedup_minhash", "dedup_minhash_affine",
    "dedup_incremental", "crawl_robots_screen", "text_url_canonicalize",
    "crawl_sitemap_extract",
    # next slice of the never-driver-sampled backlog (85 names after
    # r10; VERDICT r10 ask #1) — similarity/sampling flagships, the
    # mm/media umbrella queries, the text-statistics family, and the
    # remaining TPC-H shapes. All sweep-green every round.
    "sim_cosine_pairs", "sim_cosine_topk_many", "sim_quantized_topk",
    "sim_lsh_ann", "sim_lsh_multiprobe", "sim_lsh_recall_eval",
    "sim_ivf_seeded", "sim_ivf_recall_eval", "sim_hard_negatives",
    "dedup_semantic_clusters", "dedup_semantic_prune",
    "p4_point_select", "s2_projected_scan", "f9_json_extract",
    "mm_decode", "mm_features", "split_deterministic",
    "split_leakage_safe", "sample_quota_per_lang",
    "sample_weighted_per_lang", "sample_correlated",
    "corpus_token_budget_mix", "train_shard_manifest",
    "dsir_importance_weights", "lang_temperature_weights",
    "lang_temperature_resample", "stats_correlation",
    "weighted_median_groups", "weighted_mean_groups",
    "stats_moments", "stats_mode", "winsorized_stats",
    "profile_table_columns", "emb_label_centroids",
    "emb_centroid_classify", "emb_centroid_outliers",
    "text_winnow_fingerprints", "text_segment_dedup",
    "text_perplexity", "text_bigram_lm", "text_bpe_encode",
    "text_bpe_pair_counts", "text_lexical_diversity",
    "text_pii_scan", "text_repetition", "text_tfidf_top",
    "tpch_q6_forecast_revenue", "tpch_q19_disjunctive_revenue",
    "tpch_q3_shipping_priority", "tpch_q18_large_orders",
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
