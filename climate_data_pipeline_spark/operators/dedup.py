"""Deduplication for training-data pipelines (beyond-reference extension):
exact (content-hash), MinHash near-dup, SimHash near-dup, and sparse
n-gram-Jaccard similarity join.

Scale design (the point of each algorithm):

- **exact**: one hash aggregation on the fingerprint — the only full
  shuffle, keyed on a 32-char hash (uniform, skew-free).
- **MinHash**: signatures are per-row array ops over *distinct* shingles
  (one explode + one groupBy on doc id); candidate generation joins on
  band keys, so cost scales with the number of colliding docs, never
  all-pairs. Signature hashes are min-of-md5 *strings* — portable to any
  SQL engine, no 64-bit arithmetic required.
- **SimHash**: signature from duplicate-weighted word hashes; the byte
  band pigeonhole guarantees any pair within Hamming < bands collides
  on at least one band, so the banded join finds exactly the brute-force
  result set. 32-bit (`simhash`) for compatibility; 64-bit as two
  32-bit halves (`simhash64`, 8×8 bands, Hamming ≤ 7) for corpora at
  ≥10⁹ docs where 32-bit signatures band-collide heavily.
- **n-gram Jaccard**: the sparse similarity join — explode distinct
  shingles, equi-join on shingle, count matches per pair; cost ∝ shared-shingle
  pairs (inverted-index join), not |docs|².
"""

from __future__ import annotations

import logging
from collections import OrderedDict

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import _spread, fingerprint, words

# Bounded plan-keyed cache for the jaccard shingle-array table (see
# ngram_jaccard_pairs): within one query the table feeds the prefix
# explode AND both verify joins; across a session, repeated runs over
# the SAME corpus (bench iterations, a tuning sweep) hit the same
# entry. The LRU bound is the lifetime contract — a full-registry
# sweep over many distinct corpora evicts (and unpersists) old
# entries instead of accumulating MEMORY_AND_DISK blocks until
# storage-memory pressure.
_ARR_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_ARR_CACHE_MAX = 4

# source_overlap_matrix / checkpoint_above_gate consumers: a small
# derived table with several consumers of one big source scan. The r11
# premise was that AQE's stage cache never reuses the consumers'
# identical exchanges (3 scans, 0 ReusedExchange observed then), so a
# size gate engaged a lazy localCheckpoint above 256 MB of input.
# RETRACTED in r12, on direct measurement (tools/gate_ab.py,
# plans/r12/gate_ab_*.txt):
#   1. the premise no longer holds — executed plans at sf0.1, 54 MB and
#      3.3 GB all show AQE ReusedExchange on the heavy exchanges (the
#      residual extra "scans" are cheap column-pruned file reads);
#   2. interleaved above-gate A/Bs show the engaged arm LOSING
#      steady-state: set_ops 7.5 s vs 4.6-5.8 s at 279 MB and
#      37-48 s vs 20-37 s at 3.3 GB; corpus_source_overlap a wash
#      (64-88 s both arms at 54 MB);
#   3. mechanically, under AQE a lazy localCheckpoint executes the
#      checkpointed subtree's stages EAGERLY and serially at
#      Dataset-build time, losing the one-DAG parallelism the naive
#      plan gets for free.
# The force arms stay (tests pin both arms row-identical; the A/B
# harness drives them), but nothing auto-engages:
# SOURCE_OVERLAP_CKPT_MIN_BYTES is None = never. Results are identical
# either way (same rows; the gate can never flip a hash).
SOURCE_OVERLAP_CHECKPOINT: bool | None = None
SOURCE_OVERLAP_CKPT_MIN_BYTES: int | None = None  # r12: auto retracted


def _cache_bounded(df: DataFrame) -> DataFrame:
    """``df.cache()`` with an LRU lifetime: at most ``_ARR_CACHE_MAX``
    distinct plans stay persisted; eviction unpersists. Keyed on the
    canonicalized plan's semantic hash (the same identity Spark's own
    CacheManager uses) PLUS the owning session's applicationId —
    semantically identical plans built by a NEW session after the old
    one stopped must not return a DataFrame bound to the dead session."""
    try:
        sess = df.sparkSession.sparkContext.applicationId
        key = (sess, df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:                                  # pragma: no cover
        return df.cache()         # non-classic backends: uncapped cache
    hit = _ARR_CACHE.get(key)
    if hit is not None:
        _ARR_CACHE.move_to_end(key)
        return hit
    _ARR_CACHE[key] = df.cache()
    while len(_ARR_CACHE) > _ARR_CACHE_MAX:
        _, old = _ARR_CACHE.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:                              # pragma: no cover
            pass
    return df


def clear_intermediate_caches() -> None:
    """Unpersist and FORGET every ``_ARR_CACHE`` entry (bench cold-start
    hook). ``spark.catalog.clearCache()`` alone is not enough: it drops
    the cached data but the memoized DataFrame objects here would still
    be handed out WITHOUT re-registering with the CacheManager, so
    subsequent iterations would recompute without caching — neither the
    warm steady state nor an honest cold start. Dropping the entries
    makes the next call re-``cache()`` a fresh plan, so cache population
    lands inside the timed region the way a first run pays it."""
    while _ARR_CACHE:
        _, old = _ARR_CACHE.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:                              # pragma: no cover
            pass

# 64 permutations / 16 bands of 4: estimator std sqrt(J(1-J))/8 ≈ 0.06
# at J=0.5 — production-grade threshold resolution. (The registry's
# `dedup_minhash` pins the original 12/4 config explicitly for oracle
# stability; these defaults govern direct operator use.)
DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16

# affine-permutation scheme constants: p Mersenne 2^31-1 keeps a*h+b
# inside signed-64 range for h < 2^31; (a_i, b_i) are md5-derived so
# any SQL engine can re-derive them
_MERSENNE_P = 2_147_483_647


def _affine_coeffs(num_perm: int, seed: str = "cdps-mh") -> list[tuple[int, int]]:
    import hashlib

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    return [(h32(f"{seed}:a:{i}") % (_MERSENNE_P - 1) + 1,
             h32(f"{seed}:b:{i}") % _MERSENNE_P)
            for i in range(num_perm)]


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an already-materialized words array.

    ``w`` MUST be a reference to a projected column, not the
    ``words(text)`` expression itself: Spark column expressions inline,
    so passing the raw split expression re-tokenizes the document for
    every ``element_at`` inside the lambda — ~3n re-splits per row
    (measured 15× slower on the sf0.1 corpus). Project
    ``words(text).alias("w")`` first, then call this on ``F.col("w")``
    (the Generate/Filter boundary keeps CollapseProject from undoing
    the materialization)."""
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j) for j in range(n)])
    return F.transform(idx, gram)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (lowercased, punctuation-split) as a single
    expression. Convenience/compatibility form — in exploding hot paths
    use the two-step projection (see :func:`shingles_from_words`)."""
    w = words(text)
    return F.when(F.size(w) >= n, shingles_from_words(w, n)) \
            .otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup groups: one row per distinct normalized content, with
    the canonical (minimum) id and the copy count."""
    fp = fingerprint(df, text_col, alias="fingerprint")
    return (fp.groupBy("fingerprint")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count("*").alias("n_copies")))


def _doc_shingles(df: DataFrame, text_col: str, id_col: str,
                  n: int = 3) -> DataFrame:
    """(id, shingle) pairs, deduplicated — the inverted-index relation.
    Tokenizes once per document via the words-projection two-step.

    Dedup happens MAP-SIDE with ``array_distinct`` before the explode:
    (id, shingle) duplicates can only occur within one document's row,
    so a global ``.distinct()`` would shuffle the whole exploded
    relation — the largest intermediate in every shingle pipeline — to
    deduplicate keys that never cross rows. Narrow replaces one full
    shuffle in jaccard/minhash/contamination/overlap plans.

    CONTRACT: the input carries ONE row per document id (what every
    loader and synthesizer here produces). A caller feeding duplicate
    id rows (an un-deduplicated join fan-out) gets duplicate (id,
    shingle) pairs — min-based consumers (minhash) are unaffected, but
    count-based ones would overcount; dedup such inputs first."""
    pre = (_spread(df).select(F.col(id_col).alias("id"),
                     words(text_col).alias("__w"))
             .where(F.size("__w") >= n))
    return pre.select("id", F.explode(F.array_distinct(
                shingles_from_words(F.col("__w"), n))).alias("shingle"))


def _est_expr(num_perm: int):
    """MinHash Jaccard estimate — fraction of matching signature
    components — as ONE expr string (the per-component Column form
    cost ~6 py4j round trips × num_perm of plan-build time)."""
    cases = " + ".join(f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END"
                       for i in range(num_perm))
    # CAST(... AS DOUBLE), not a `12.0` literal: bare decimal literals
    # are DECIMAL-typed in Spark SQL and would silently flip the
    # estimate's type (and the driver's schema hash) from double
    return F.expr(f"({cases}) / CAST({num_perm} AS DOUBLE)")


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_perm: int = DEFAULT_NUM_PERM,
                       n: int = 3, scheme: str = "md5") -> DataFrame:
    """MinHash signature per document (min-of-hash per permutation —
    the classic estimator; each permutation is an independent
    pseudo-random order on the shingle universe).

    ``scheme='md5'``: component i = min over shingles of
    md5('i:' || shingle) hex strings — num_perm md5 evaluations per
    shingle, trivially portable to any SQL engine.
    ``scheme='affine'``: ONE md5 per shingle → 31-bit int h, then
    component i = min of (a_i·h + b_i) mod (2³¹−1) — the standard
    universal-hash family. At 64 permutations this replaces 64 md5
    evaluations per shingle with 64 multiply-adds, the right trade for
    a 100 TB corpus; coefficients are md5-derived constants, so SQL
    engines can still re-derive the pipeline."""
    ds = _doc_shingles(df, text_col, id_col, n)
    # one F.expr STRING per aggregate, not composed Column objects:
    # at num_perm = 64 the object form costs hundreds of py4j round
    # trips (~0.4 ms each) — plan BUILD time rivaled execution on warm
    # runs (the measured trap from PERFORMANCE.md). Codegen's
    # subexpression elimination dedupes the repeated inner hash.
    if scheme == "affine":
        h = ("CAST(conv(substring(md5(shingle), 1, 7), 16, 10) "
             "AS BIGINT)")  # 28 bits < 2^31-1
        coeffs = _affine_coeffs(num_perm)
        aggs = [F.expr(f"min(({a}L * {h} + {b}L) % {_MERSENNE_P}L) "
                       f"AS mh{i}")
                for i, (a, b) in enumerate(coeffs)]
    elif scheme == "md5":
        aggs = [F.expr(f"min(md5(concat_ws(':', '{i}', shingle))) "
                       f"AS mh{i}") for i in range(num_perm)]
    else:
        raise ValueError(f"unknown minhash scheme {scheme!r}")
    return ds.groupBy("id").agg(*aggs)


def band_table(sig: DataFrame, num_perm: int = DEFAULT_NUM_PERM,
               bands: int = DEFAULT_BANDS) -> DataFrame:
    """(id, band, key) LSH band table from a signature table — the
    persistable *signature store* of an incremental dedup pipeline:
    append each ingested batch's rows and new batches join against it
    without re-reading (or re-shingling) the historical corpus."""
    rows = num_perm // bands
    # single-expr inline() instead of per-band Column structs: the
    # object form cost O(bands·rows) py4j round trips of plan-build
    # time (see minhash_signatures)
    structs = ", ".join(
        "struct(CAST({b} AS INT) AS band, md5(concat_ws('|', {ms})) "
        "AS key)".format(
            b=b, ms=", ".join(f"CAST(mh{b * rows + r} AS STRING)"
                              for r in range(rows)))
        for b in range(bands))
    return sig.selectExpr("id", f"inline(array({structs}))")


def incremental_dedup(corpus: DataFrame | None, batch: DataFrame,
                      text_col: str, id_col: str, num_perm: int = 12,
                      bands: int = 4, n: int = 3, min_est: float = 0.5,
                      scheme: str = "md5",
                      corpus_sigs: DataFrame | None = None) -> DataFrame:
    """Near-dup screen for a NEW batch of documents against an existing
    corpus — the steady-state form of corpus dedup (you never re-dedup
    100 TB from scratch; you dedup each day's arrivals against the
    store). A batch document is a duplicate if its MinHash estimate
    reaches ``min_est`` against any corpus document or any
    earlier-in-batch document (earlier = lower id; ids must be globally
    unique across corpus and batch).

    Returns one row per batch document: (id, n_matches, best_est,
    matched_corpus, is_dup) — INCLUDING documents shorter than the
    shingle width, which carry no MinHash evidence and screen as
    is_dup = false (anchoring on the signature table instead used to
    silently drop them from the decision stream).

    Scale shape: the corpus contributes only its band table —
    O(bands) skinny rows per document, the thing a production pipeline
    materializes once per batch and appends (`band_table`) — so the
    historical text is never re-read. Candidates come from the band
    equi-join (cost ∝ collisions); only candidates pay the
    signature-compare verify.

    Pass ``corpus_sigs`` (a `minhash_signatures` table — THE persisted
    signature store) to skip re-deriving corpus signatures entirely; the
    steady-state caller materializes it once and appends each screened
    batch's signatures to it."""
    if corpus_sigs is None:
        corpus_sigs = minhash_signatures(corpus, text_col, id_col,
                                         num_perm, n, scheme)
    sigc = corpus_sigs
    sigb = minhash_signatures(batch, text_col, id_col, num_perm, n,
                              scheme).cache()
    bb = band_table(sigb, num_perm, bands)   # derive the batch bands once
    pool = (band_table(sigc, num_perm, bands)
            .withColumn("is_corpus", F.lit(True))
            .unionByName(bb.withColumn("is_corpus", F.lit(False))))
    probe = bb
    cand = (probe.alias("a")
            .join(pool.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.key") == F.col("b.key"))
                  & (F.col("b.is_corpus") | (F.col("b.id") < F.col("a.id"))))
            .select(F.col("a.id").alias("id"),
                    F.col("b.id").alias("match_id"),
                    F.col("b.is_corpus").alias("is_corpus"))
            .distinct())
    sigs = sigc.unionByName(sigb)
    sa = sigb.selectExpr("id", *[f"mh{i} AS a{i}"
                                 for i in range(num_perm)])
    sb = sigs.selectExpr("id AS match_id",
                         *[f"mh{i} AS b{i}" for i in range(num_perm)])
    est = _est_expr(num_perm)
    ver = (cand.join(sa, "id").join(sb, "match_id")
               .withColumn("est", est).where(F.col("est") >= min_est))
    per = ver.groupBy("id").agg(
        F.count("*").alias("n_matches"),
        F.max("est").alias("best_est"),
        F.expr("bool_or(is_corpus)").alias("matched_corpus"))
    return (batch.select(F.col(id_col).alias("id")).join(per, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
                    F.coalesce("best_est", F.lit(0.0)).alias("best_est"),
                    F.coalesce("matched_corpus",
                               F.lit(False)).alias("matched_corpus"),
                    F.col("n_matches").isNotNull().alias("is_dup")))


# Hot-bucket sub-split threshold for the banded LSH self-join (r11,
# guide §2.5): a band bucket of B members yields B² candidate rows in
# ONE join task — AQE's skew handling cannot split a single key, so a
# viral boilerplate bucket at 100 TB concentrates a shuffle partition
# into a straggler. Buckets larger than this are split into
# ceil(B/threshold) deterministic sub-groups (pmod(xxhash64(id), k))
# and pairs are generated group×group — the candidate SET is identical
# (each unordered pair matches exactly once: the left side is
# replicated across partner groups), only the join parallelism
# changes, so every oracle hash is untouched whether or not the split
# engages. 1024² ≈ 1M pair rows is where one task visibly straggles.
MINHASH_HOT_BUCKET = 1024

# Engage the sub-split join only above this input size (same
# scale-adaptive arm pattern as the clustering small-graph gate): the
# split arm adds a count window + wider join keys — measured +0.65 s
# at sf0.1 where no bucket can be hot enough to matter — while at
# corpus scale the window is noise next to the join it balances. Both
# arms produce IDENTICAL pairs (tested), so the gate can never flip a
# result, only a plan. The estimate is the free inputFiles() metadata
# peek (non-file sources read as 0 → naive arm unless forced).
MINHASH_GUARD_MIN_BYTES = 256 * 1024 * 1024


def checkpoint_above_gate(small: DataFrame, source: DataFrame,
                          force: bool | None = None,
                          min_bytes: int | None = None) -> DataFrame:
    """Materialization point for a SMALL table that several consumers
    derive from a BIG source scan. RETRACTED as an auto-engaging
    optimization in r12 — see the SOURCE_OVERLAP_CHECKPOINT block for
    the measurements (AQE reuses the heavy exchanges after all, and the
    forced checkpoint arm measured SLOWER above the old gate at every
    tested scale). Nothing engages unless ``force=True`` or a caller
    passes an explicit ``min_bytes`` (tests and tools/gate_ab.py pin
    the arms; they remain row-identical by construction — the gate can
    never flip a hash)."""
    if min_bytes is None:
        min_bytes = SOURCE_OVERLAP_CKPT_MIN_BYTES
    engage = force if force is not None \
        else (min_bytes is not None
              and _input_bytes(source) >= min_bytes)
    return small.localCheckpoint(eager=False) if engage else small


def _input_bytes(df: DataFrame) -> int:
    """Total size of the scan's backing files — a driver-side metadata
    peek (0 for non-file sources)."""
    import os
    from urllib.parse import urlparse

    try:
        total = 0
        for f in df.inputFiles():
            p = urlparse(f)
            if p.scheme not in ("", "file"):
                return 0
            total += os.path.getsize(p.path)
        return total
    except OSError:
        return 0


def _banded_self_pairs(banded: DataFrame,
                       hot_threshold: int | None = None,
                       guard: bool = True,
                       extra_cols: tuple = (),
                       distinct: bool = True) -> DataFrame:
    """Candidate id pairs (id_a < id_b) from a (id, band, key) table —
    the LSH bucket self-join, with oversized buckets sub-split for
    balanced join tasks (see MINHASH_HOT_BUCKET). Output is provably
    identical to the naive self-join (``guard=False``).

    ONE unified join, no hot/cold arms: a count window attaches the
    bucket size, every row gets a deterministic sub-group
    ``__g = pmod(xxhash64(id), k)`` with ``k = ceil(size/threshold)``
    (cold buckets: k = 1, g = 0), and the left side replicates over
    the k partner groups — pair (x, y) with x.id < y.id matches
    exactly once, where x's partner index equals y's group. The join
    keys gain ``__g``, so a hot bucket's pairs spread over k² balanced
    tasks instead of one. (A first cut with a groupBy-sizes +
    broadcast anti-join hot/cold split recomputed the 64-md5 band
    table five times and cost 3.5× on the disengaged path — measured,
    rejected; the window form costs one narrow shuffle.)

    ``extra_cols`` ride the join to both sides as ``__a<c>``/``__b<c>``
    (the sim_* packed sketch words need to survive for the Hamming
    prefilter); ``distinct=False`` returns the raw match stream — the
    per-(band, key) match multiset is identical between arms (each
    unordered pair matches exactly once per shared bucket either way),
    so callers may filter before their own dedup."""
    if hot_threshold is None:   # resolve at CALL time (tests repatch it)
        hot_threshold = MINHASH_HOT_BUCKET
    sel = ([F.col("a.id").alias("id_a")]
           + [F.col(f"a.{c}").alias(f"__a{c}") for c in extra_cols]
           + [F.col("b.id").alias("id_b")]
           + [F.col(f"b.{c}").alias(f"__b{c}") for c in extra_cols])
    if not guard:
        a, b = banded.alias("a"), banded.alias("b")
        out = (a.join(b, (F.col("a.band") == F.col("b.band"))
                         & (F.col("a.key") == F.col("b.key"))
                         & (F.col("a.id") < F.col("b.id")))
                .select(*sel))
        return out.distinct() if distinct else out
    w = Window.partitionBy("band", "key")
    bw = (banded.withColumn(
              "__k", F.ceil(F.count("*").over(w)
                            / hot_threshold).cast("int"))
                .withColumn("__g", F.pmod(F.xxhash64("id"),
                                          F.col("__k")).cast("int")))
    left = bw.withColumn("__pg", F.explode(
        F.sequence(F.lit(0), F.col("__k") - 1)))
    out = (left.alias("a")
           .join(bw.alias("b"),
                 (F.col("a.band") == F.col("b.band"))
                 & (F.col("a.key") == F.col("b.key"))
                 & (F.col("a.__pg") == F.col("b.__g"))
                 & (F.col("a.id") < F.col("b.id")))
           .select(*sel))
    return out.distinct() if distinct else out


def minhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  num_perm: int = DEFAULT_NUM_PERM, bands: int = DEFAULT_BANDS,
                  n: int = 3, min_est: float = 0.5,
                  scheme: str = "md5") -> DataFrame:
    """LSH candidate pairs + MinHash Jaccard estimate ≥ ``min_est``.

    Signatures are banded (num_perm/bands rows per band); docs sharing any
    full band key become candidates (join on the band hash, not all
    pairs — and hot buckets sub-split, see ``_banded_self_pairs``); the
    estimate is the fraction of matching signature components.
    """
    sig = minhash_signatures(df, text_col, id_col, num_perm, n,
                             scheme=scheme).cache()
    banded = band_table(sig, num_perm, bands)
    cand = _banded_self_pairs(
        banded, guard=_input_bytes(df) >= MINHASH_GUARD_MIN_BYTES)
    sa = sig.selectExpr("id AS id_a",
                        *[f"mh{i} AS a{i}" for i in range(num_perm)])
    sb = sig.selectExpr("id AS id_b",
                        *[f"mh{i} AS b{i}" for i in range(num_perm)])
    est = _est_expr(num_perm)
    return (cand.join(sa, "id_a").join(sb, "id_b")
                .withColumn("jaccard_est", est)
                .where(F.col("jaccard_est") >= min_est)
                .select("id_a", "id_b", "jaccard_est"))


# AQE-style density gate for the exact-Jaccard join (round-9 verdict
# ask #3): the uncapped exact arm's output/verify cost grows with the
# occurrence-weighted mean inverted-list length Σdf²/Σdf — the expected
# number of candidates one postings entry generates. Measured on the
# scale-model corpora: 2.1 (sf0.01), 10.7 (sf0.1), 20.4 (sf0.01 ×10
# replicas), 105.6 (sf0.1 ×10). The threshold sits between the densest
# natural corpus and the sparsest duplication-heavy one; above it the
# operator auto-routes to the max_df-capped arm (the documented
# production contract at 100 TB — a shingle shared by k docs carries k²
# candidates and near-zero discrimination). The last decision is
# recorded in LAST_JACCARD_GATE for plan notes / audits.
JACCARD_GATE_MEAN_DF = 16.0
JACCARD_GATE_CAP = 20
LAST_JACCARD_GATE: dict | None = None


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, min_jaccard: float = 0.5,
                        max_df: int | None = None,
                        auto_cap: bool = False) -> DataFrame:
    """Exact n-gram Jaccard similarity join via the inverted index:
    pairs sharing ≥1 shingle are generated by the shingle equi-join
    (never |docs|²), then J = |∩| / (|A| + |B| − |∩|) filters exactly.

    Candidate generation uses LOSSLESS PREFIX FILTERING (Chaudhuri et
    al. SSJoin / Bayardo et al. AllPairs / PPJoin, all public): under a
    global shingle order (ascending document frequency, ties by value),
    two sets with J ≥ t MUST share an element inside each one's first
    ``|x| − ⌈t·|x|⌉ + 1`` shingles — so only PREFIXES are exploded into
    the equi-join. Rare-first ordering pushes exactly the hot,
    collision-heavy shingles OUT of prefixes: measured 1.27M → ~0.2M
    candidate rows at sf0.1, and at corpus scale it bounds the Σ df²
    blow-up on boilerplate shingles that the naive inverted index
    suffers. Verification is map-side ``array_intersect`` on the two
    documents' (distinct, bounded-by-doc-length) shingle arrays — no
    per-pair count aggregation — and is exact, so the ORACLE stays the
    plain inverted-index SQL: the filter changes what is joined, never
    what is returned.

    ``max_df`` additionally drops shingles in more than ``max_df``
    documents before anything else (a shingle shared by k docs carries
    k² candidates and near-zero discrimination); Jaccard is then
    computed over the capped universe — a documented variant, mirrored
    in its oracle.

    ``auto_cap`` arms the density gate (module constants above): one
    cheap aggregate over the shingle-frequency table measures
    Σdf²/Σdf, and when it exceeds ``JACCARD_GATE_MEAN_DF`` the join
    runs the ``JACCARD_GATE_CAP``-capped arm instead — the same
    size-based runtime arm choice as the clustering operators'
    small-graph gate. The uncapped exact arm stays reachable with
    ``auto_cap=False`` (the evaluation contract)."""
    global LAST_JACCARD_GATE
    ds = _doc_shingles(df, text_col, id_col, n)
    dfreq = ds.groupBy("shingle").agg(F.count("*").alias("__df"))
    if max_df is None and auto_cap:
        # cache BEFORE the eager gate aggregate so the groupBy shuffle
        # is computed once and reused by the join below
        dfreq = _cache_bounded(dfreq)
        g = dfreq.agg(
            F.sum(F.col("__df") * F.col("__df")).alias("df2"),
            F.sum("__df").alias("df1")).first()
        mean_df = float(g.df2) / float(g.df1) if g.df1 else 0.0
        engaged = mean_df > JACCARD_GATE_MEAN_DF
        LAST_JACCARD_GATE = {
            "mean_df": round(mean_df, 2),
            "threshold": JACCARD_GATE_MEAN_DF,
            "engaged": engaged,
            "max_df": JACCARD_GATE_CAP if engaged else None,
        }
        logging.getLogger(__name__).info(
            "ngram_jaccard density gate: %s", LAST_JACCARD_GATE)
        if engaged:
            max_df = JACCARD_GATE_CAP
    if max_df is not None:
        dfreq = dfreq.where(F.col("__df") <= max_df)
    # per-document shingle array, globally ordered by (df, shingle):
    # one row per doc, array length bounded by document length
    # collect_SET, not collect_list: with one row per doc id the sets
    # are already duplicate-free, but a duplicate-id input (see the
    # _doc_shingles contract) degrades to the old global-distinct
    # semantics instead of silently inflating n_sh / prefix lengths
    arr = (ds.join(dfreq, "shingle")
             .groupBy("id")
             .agg(F.expr("transform(sort_array(collect_set("
                         "struct(__df, shingle))), x -> x.shingle)")
                  .alias("__sh"))
             .withColumn("n_sh", F.size("__sh")))
    # plan-keyed BOUNDED cache (module LRU above): the array table
    # feeds the prefix explode AND both verify joins, and repeated
    # runs over the same corpus reuse the entry; distinct corpora
    # beyond the bound evict-and-unpersist instead of accumulating
    # MEMORY_AND_DISK blocks for the life of the session.
    arr = _cache_bounded(arr)
    # prefix length for Jaccard t: |x| − ⌈t·|x|⌉ + 1; positions ride
    # along for the PPJoin positional filter below
    pre = arr.select(
        "id", "n_sh", F.posexplode(F.expr(
            f"slice(__sh, 1, n_sh - CAST(ceil({min_jaccard} * n_sh) "
            "AS INT) + 1)")).alias("__pos", "shingle"))
    # two further LOSSLESS prunes (Bayardo/Xiao PPJoin, public) applied
    # INSIDE the join so pruned rows never reach the distinct or the
    # array-shipping verify — measured 39M → far fewer candidate pairs
    # on a densely-replicated 10× corpus (see PERFORMANCE.md round 8):
    # - length filter: J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|)
    # - positional filter: a pair's FIRST common prefix element at
    #   positions (i, j) bounds the whole intersection by
    #   1 + min(|A|−i−1, |B|−j−1); if that can't reach
    #   α = ⌈t·(|A|+|B|)/(1+t)⌉ the pair can't reach J ≥ t. The first
    #   common element has no common predecessors by definition, so
    #   every qualifying pair keeps at least that one row — lossless.
    t = float(min_jaccard)
    n_a, n_b = F.col("a.n_sh"), F.col("b.n_sh")
    # the 1e-9 slack keeps BOTH thresholds on the safe (keep) side of
    # IEEE rounding: a pair sitting EXACTLY on a boundary (min = t·max,
    # or α landing on an integer) is QUALIFYING, and whether the float
    # product rounds a hair above the exact rational depends on (t,
    # size) — e.g. float 0.8 is above 4/5 before the multiply rounds
    # it back. Slack can only ever admit an extra candidate, never
    # drop one, so the filters stay lossless for every threshold
    # rather than per-lucky-rounding
    alpha = F.ceil(F.lit(t / (1.0 + t)) * (n_a + n_b) - F.lit(1e-9))
    ubound = 1 + F.least(n_a - F.col("a.__pos") - 1,
                         n_b - F.col("b.__pos") - 1)
    cand = (pre.alias("a")
               .join(pre.alias("b"),
                     (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.id") < F.col("b.id"))
                     & (F.least(n_a, n_b)
                        >= F.lit(t) * F.greatest(n_a, n_b) - F.lit(1e-9))
                     & (ubound >= alpha))
               .select(F.col("a.id").alias("id_a"),
                       F.col("b.id").alias("id_b"))
               .distinct())
    va = arr.selectExpr("id AS id_a", "__sh AS __sha", "n_sh AS n_a")
    vb = arr.selectExpr("id AS id_b", "__sh AS __shb", "n_sh AS n_b")
    return (cand.join(va, "id_a").join(vb, "id_b")
                .withColumn("n_common",
                            F.expr("size(array_intersect(__sha, __shb))")
                            .cast("long"))
                .withColumn("jaccard",
                            F.col("n_common")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_common")))
                .where(F.col("jaccard") >= min_jaccard)
                .select("id_a", "id_b", "n_common", "jaccard"))


def _components_single_task(p: DataFrame, u: str = "u",
                            v: str = "v") -> DataFrame:
    """Connected components with ALL edges in ONE executor task:
    path-compressing union-find inside ``mapInPandas`` (never a driver
    collect — the distributed contract holds, the kernel just runs on
    one core). Labels are component minima, identical to the iterative
    algorithms' output.

    This is the small-graph arm of the adaptive clustering operators:
    the near-dup pair list AFTER candidate generation is usually tiny
    (quasi-cliques at J ≥ 0.5), and the iterative rounds then cost
    pure per-job scheduling floor — the same size-based runtime choice
    AQE makes between shuffle and broadcast joins. Callers gate it on
    an edge count; above the gate the O(log n)-round algorithms run."""
    import numpy as np
    import pandas as pd

    id_type = p.schema[u].dataType.simpleString()

    def _uf(batches):
        # vectorized kernel, NOT a per-edge interpreted union-find:
        # with the callers' gate armed at millions of edges a pure-
        # Python loop would cost more than the scheduling rounds it
        # replaces. Ids → dense indices via np.unique (sorted, so the
        # component-minimum INDEX is the component-minimum ID), then
        # min-label propagation with pointer jumping: scatter-min
        # across edges + path-halving per round, O(E) numpy work per
        # round, rounds = O(log n) worst case, O(1)-ish on the
        # quasi-clique graphs near-dup thresholds produce.
        chunks_u, chunks_v = [], []
        for pdf in batches:
            chunks_u.append(pdf[u].to_numpy())
            chunks_v.append(pdf[v].to_numpy())
        if not chunks_u:
            yield pd.DataFrame({"id": [], "label": []})
            return
        ids, edges = np.unique(
            np.concatenate(chunks_u + chunks_v), return_inverse=True)
        ne = sum(len(c) for c in chunks_u)
        ea, eb = edges[:ne], edges[ne:]
        lbl = np.arange(len(ids))
        while True:
            before = lbl.copy()
            np.minimum.at(lbl, ea, lbl[eb])
            np.minimum.at(lbl, eb, lbl[ea])
            lbl = lbl[lbl]                       # path halving
            if np.array_equal(lbl, before):
                break
        while True:                              # full compression
            nxt = lbl[lbl]
            if np.array_equal(nxt, lbl):
                break
            lbl = nxt
        yield pd.DataFrame({"id": ids, "label": ids[lbl]})

    return p.coalesce(1).mapInPandas(
        _uf, schema=f"id {id_type}, label {id_type}")


def duplicate_clusters(pairs: DataFrame, id_a: str = "id_a",
                       id_b: str = "id_b", max_rounds: int = 20,
                       small_graph_edges: int = 0) -> DataFrame:
    """Connected components over a near-duplicate pair list → one row per
    member ``(id, cluster_id, is_canonical)`` where ``cluster_id`` is the
    minimum id reachable through pair edges (the canonical survivor).

    Algorithm: iterative min-label propagation. Each round every node
    takes the minimum label among itself and its neighbors; fixpoint is
    detected by counting label changes. Rounds cost one shuffle each
    (join on the edge endpoint + groupBy node), and ``localCheckpoint``
    truncates the lineage so round N's plan doesn't replay rounds 1..N-1.

    Scale note: propagation converges in O(graph diameter) rounds. For
    near-duplicate graphs this is the *right* trade — similarity clusters
    are quasi-cliques (every member pairs with most others), so the
    diameter is 1-3 and the loop exits after ~3 cheap shuffles; the
    O(log n) large-star/small-star alternative only pays off on
    long-chain topologies that near-dup thresholds (J ≥ 0.5) cannot
    produce. ``max_rounds`` bounds the adversarial case.

    ``small_graph_edges`` > 0 arms the adaptive fast path: if the
    checkpointed edge list holds at most that many edges, components
    run in one ``_components_single_task`` union-find job instead of
    the round loop — the count costs one cheap job over in-memory
    blocks and replaces 2-4 scheduling-floor rounds. 0 (default)
    always runs the distributed rounds.
    """
    # duplicate edges don't affect a min-aggregation, so no distinct()
    # (saves a full shuffle of the edge list before the loop).
    # Checkpoint the pair list BEFORE mirroring: a union of two selects
    # over the raw input would execute the (often expensive) pair
    # generation twice. Eager, NOT lazy: the mirrored/self-loop union
    # reads p four times, and a lazy checkpoint materializing inside
    # the round-0 job can recompute the (expensive) pair pipeline per
    # branch before its blocks land in the block manager.
    p = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
              .localCheckpoint())
    if small_graph_edges and p.count() <= small_graph_edges:
        # lazy checkpoint: consumers that reference the labels twice
        # (keep-best's semi-join + final join) run the kernel once
        labels = _components_single_task(p).localCheckpoint(eager=False)
        return labels.select(
            F.col("id"), F.col("label").alias("cluster_id"),
            (F.col("id") == F.col("label")).alias("is_canonical"))
    # Self-loops fold each node's OWN label into the neighbor-min, so a
    # round is ONE join + ONE aggregation (min over Γ(u) ∪ {u}) — the
    # old labels-rejoin (+ its exchange and AQE scheduling round-trip)
    # disappears. Duplicate self-loops from both endpoints are harmless
    # under min. Built as a map-side explode (×4 rows per pair), NOT a
    # 4-way union of selects over p: a union multiplies the stage's
    # task count by 4 (4 × p's partitions of mostly-empty tasks per
    # round on a small graph), while the explode keeps p's own
    # partitioning and the same total rows.
    edges = (p.select(F.explode(F.array(
                 F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                 F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                 F.struct(F.col("u").alias("u"), F.col("u").alias("v")),
                 F.struct(F.col("v").alias("u"), F.col("v").alias("v"))))
               .alias("e"))
              .select("e.u", "e.v"))
    # Round 0 needs no labels join: labels start as the identity, so
    # min(label(Γ(u) ∪ {u})) is just min(Γ_sl(u)) — one aggregation
    # over the edge list replaces a join + aggregation, saving a
    # shuffle and (on quasi-clique near-dup graphs that converge
    # immediately) a whole round's scheduling. NOT checkpointed: the
    # round-1 probe references it twice (new side + old side), but
    # with `p` already checkpointed this is a tiny re-aggregation of
    # the in-memory edge blocks — far cheaper than the extra eager
    # job an up-front materialization costs (one full scheduling
    # round-trip, ~0.3 s of the registry queries' warm latency).
    labels = (edges.groupBy("u").agg(F.min("v").alias("label"))
                   .select(F.col("u").alias("id"), "label"))
    converged = False
    for _rnd in range(1, max_rounds + 1):
        # LAZY checkpoint + EXACT convergence probe fused into one
        # action per round: the propagated labels join back to the
        # previous round's (same node set, inner join) and a single
        # one-row aggregate counts changed labels — the action that
        # materializes the checkpoint IS the convergence check, so a
        # round is ONE Spark job and the exit test is exact (no
        # fingerprint, nothing probabilistic). The old-labels side of
        # the probe join is the skinny (id, label) table — at any
        # scale it is dominated by the edges join the round already
        # pays.
        new = (edges.join(labels.withColumnRenamed("id", "v"), "v")
                    .groupBy("u").agg(F.min("label").alias("label"))
                    .select(F.col("u").alias("id"), "label")
                    .localCheckpoint(eager=False))
        changed = (new.alias("n")
                      .join(labels.alias("o"), "id")
                      .agg(F.sum((F.col("n.label") != F.col("o.label"))
                                 .cast("long"))).first()[0] or 0)
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning part-propagated labels would be a plausible-looking
        # WRONG clustering (multiple canonicals per component) with no
        # way to detect it — refuse instead
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_rounds} rounds "
            "(component diameter exceeds the round budget); raise "
            "max_rounds or use duplicate_clusters_star (O(log n) rounds "
            "on any topology)")
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"),
                         (F.col("id") == F.col("label")).alias("is_canonical"))


def duplicate_clusters_star(pairs: DataFrame, id_a: str = "id_a",
                            id_b: str = "id_b",
                            max_rounds: int = 50,
                            small_graph_edges: int = 0) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rewiring (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same output contract as ``duplicate_clusters``:
    ``(id, cluster_id, is_canonical)`` with cluster_id = component min.

    Each round rewrites the edge set:

    - **large-star** (per node u): every neighbor v > u is re-attached to
      m = min(Γ(u) ∪ {u}) — handled once per edge, from its smaller
      endpoint;
    - **small-star** (per node u): every neighbor v < u, and u itself,
      re-attach to the minimum smaller neighbor — handled from the
      larger endpoint.

    Both halves strictly decrease the potential Σ(node − its min link),
    and the edge set converges to a star forest (every node linked
    directly to its component min) in **O(log n) rounds regardless of
    graph diameter** — this is the variant to reach for on long-chain
    topologies where min-label propagation (O(diameter) rounds) would
    crawl; for quasi-clique near-dup graphs the propagation version's
    2-4 rounds still win (see ``duplicate_clusters`` docstring). Each
    half is one groupBy + one join on the current edge set; edges are
    ``localCheckpoint``ed per round so plan depth stays constant.

    ``small_graph_edges`` > 0 arms the same adaptive single-task
    union-find arm as ``duplicate_clusters`` — below the gate the
    rewiring rounds are pure scheduling floor; above it the O(log n)
    rounds run (see ``_components_single_task``).
    """
    edges = (pairs.select(F.least(id_a, id_b).alias("lo"),
                          F.greatest(id_a, id_b).alias("hi"))
                  .where(F.col("lo") != F.col("hi"))
                  .distinct().localCheckpoint())
    if small_graph_edges and edges.count() <= small_graph_edges:
        labels = (_components_single_task(edges, "lo", "hi")
                  .localCheckpoint(eager=False))
        return labels.select(
            F.col("id"), F.col("label").alias("cluster_id"),
            (F.col("id") == F.col("label")).alias("is_canonical"))
    nodes = (edges.select(F.col("lo").alias("id"))
                  .union(edges.select(F.col("hi").alias("id")))
                  .distinct())

    def sym(e: DataFrame) -> DataFrame:
        # map-side explode, not a 2-way union: a union doubles the
        # stage's task count with mostly-empty tasks every round (cf.
        # duplicate_clusters' edge builder)
        return (e.select(F.explode(F.array(
                    F.struct(F.col("lo").alias("u"),
                             F.col("hi").alias("v")),
                    F.struct(F.col("hi").alias("u"),
                             F.col("lo").alias("v")))).alias("e"))
                 .select("e.u", "e.v"))

    prev_fp = None
    converged = False
    for _ in range(max_rounds):
        s = sym(edges)
        # large-star: from each edge's smaller endpoint u, re-attach v>u
        # to min(Γ(u) ∪ {u})
        mins = s.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("mv"), F.col("u"))
        large = (s.join(mins, "u")
                  .where(F.col("v") > F.col("u"))
                  .select(m.alias("lo"), F.col("v").alias("hi"))
                  .where(F.col("lo") != F.col("hi"))
                  .distinct())
        # small-star: from each edge's larger endpoint u, re-attach the
        # smaller neighbors and u itself to the minimum smaller neighbor
        s = sym(large)
        smaller = s.where(F.col("v") < F.col("u"))
        mins = smaller.groupBy("u").agg(F.min("v").alias("mv"))
        # one pass over the join emits BOTH halves map-side — the
        # rewired smaller neighbors (mv, v) and the self link (mv, u)
        # — instead of a union of two selects; (mv, v=mv) rows fall to
        # the lo != hi filter, duplicate self links to the distinct
        both = (smaller.join(mins, "u")
                .select(F.explode(F.array(
                    F.struct(F.col("mv").alias("lo"),
                             F.col("v").alias("hi")),
                    F.struct(F.col("mv").alias("lo"),
                             F.col("u").alias("hi")))).alias("e"))
                .select("e.lo", "e.hi")
                .where(F.col("lo") != F.col("hi")))
        # LAZY checkpoint + convergence probe in ONE job per round:
        # the probe — a one-row (count, order-independent hash sum)
        # agg — is the action that materializes the checkpoint. Only
        # when the fingerprint repeats do we pay the exact
        # set-equality check, so the O(|E|) exceptAll shuffle runs
        # once per clustering, not once per round. Fingerprint
        # collisions merely trigger a wasted exact check; they can
        # never cause an early exit.
        new = both.distinct().localCheckpoint(eager=False)
        fp = new.agg(F.count("*"), F.sum(F.xxhash64("lo", "hi").cast("decimal(38,0)"))).first()
        if fp == prev_fp and new.exceptAll(edges).count() == 0:
            edges = new
            converged = True
            break
        prev_fp = fp
        edges = new
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters_star did not converge in {max_rounds} "
            "rounds — raise max_rounds (O(log n) rounds suffice on any "
            "topology, so this indicates an extreme component count)")

    # fixpoint edge set is a star forest: (root, member) per non-root
    members = edges.groupBy(F.col("hi").alias("id")) \
                   .agg(F.min("lo").alias("cluster_id"))
    roots = (nodes.join(members.select("id"), "id", "left_anti")
                  .select("id", F.col("id").alias("cluster_id")))
    return (members.union(roots)
                   .select("id", "cluster_id",
                           (F.col("id") == F.col("cluster_id"))
                           .alias("is_canonical")))


def _hex_to_long(hex_col: Column) -> Column:
    """First-8-hex-chars → bigint (stable 32-bit word hash)."""
    return F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long")


def simhash(df: DataFrame, text_col: str, id_col: str,
            bits: int = 32) -> DataFrame:
    """32-bit SimHash per document: each word votes ±1 on every bit of its
    32-bit md5-derived hash (duplicate-weighted); bit b of the signature
    is 1 iff the vote sum is positive. Explode → 32 conditional sums →
    one groupBy(id): a single shuffle keyed on the doc id."""
    w = (df.select(F.col(id_col).alias("id"),
                   F.explode(words(text_col)).alias("word"))
           .withColumn("h", _hex_to_long(F.md5(F.col("word")))))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1)
               .otherwise(-1)).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = w.groupBy("id").agg(*votes)
    sig = sum(F.when(F.col(f"v{b}") > 0,
                     F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
              for b in range(bits))
    return agg.select("id", sig.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming`` via byte-band
    LSH: with 4 bands and ≤3 differing bits, at least one 8-bit band is
    identical (pigeonhole), so the banded join is lossless vs brute force.
    The pigeonhole needs max_hamming < bands — a looser radius would
    silently miss true pairs, so it is rejected loudly (same guard as
    `simhash64_pairs`)."""
    if max_hamming >= bands:
        raise ValueError(
            f"losslessness needs max_hamming < bands (pigeonhole): "
            f"got max_hamming={max_hamming}, bands={bands}")
    sig = simhash(df, text_col, id_col).cache()
    band_arr = F.array(*[
        F.struct(F.lit(b).cast("int").alias("band"),
                 F.shiftright(F.col("simhash"), b * 8).bitwiseAND(255)
                  .alias("val"))
        for b in range(bands)
    ])
    banded = (sig.select("id", "simhash", F.explode(band_arr).alias("bk"))
                 .select("id", "simhash", F.col("bk.band").alias("band"),
                         F.col("bk.val").alias("val")))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                      & (F.col("a.val") == F.col("b.val"))
                      & (F.col("a.id") < F.col("b.id")))
             .where(ham <= max_hamming)
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.col("a.simhash").alias("simhash_a"),
                     F.col("b.simhash").alias("simhash_b"),
                     ham.cast("long").alias("hamming"))
             .distinct())


def simhash64(df: DataFrame, text_col: str, id_col: str,
              hash_fn: str = "md5") -> DataFrame:
    """64-bit SimHash as TWO 32-bit halves (sim_hi, sim_lo): 32-bit
    signatures band-collide heavily at ≥10⁹ docs (the 100 TB regime);
    64 bits restore selectivity. The two-half representation keeps every
    intermediate in non-negative signed-64 range — no sign-extension or
    (1<<63) overflow games — and is expressible in any SQL engine.

    ``hash_fn='md5'``: word hash halves = first/second 8 hex chars of
    md5(word) (oracle-checkable). ``hash_fn='xxhash64'``: Spark's native
    xxhash64 split into halves — one 64-bit hash per word, the faster
    production default (not SQL-portable; property-tested instead)."""
    w = df.select(F.col(id_col).alias("id"),
                  F.explode(words(text_col)).alias("word"))
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.col("word"))
        hi = F.shiftrightunsigned(h, 32)
        lo = h.bitwiseAND(F.lit(0xFFFFFFFF).cast("long"))
    elif hash_fn == "md5":
        hexd = F.md5(F.col("word"))
        hi = F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    w = w.withColumn("hi", hi).withColumn("lo", lo)
    # vote sum of ±1 per bit == 2·(count of set bits) − n_words, so sum
    # the raw bits (no per-row CASE branch) and compare 2s > n — same
    # signature, ~half the per-row aggregate work
    votes = [F.sum(F.shiftright(F.col(c), b).bitwiseAND(1))
              .alias(f"{c}v{b}")
             for c in ("hi", "lo") for b in range(32)]
    agg = w.groupBy("id").agg(*votes, F.count("*").alias("__n"))
    sig_hi = sum(F.when(F.col(f"hiv{b}") * 2 > F.col("__n"),
                        F.lit(1 << b).cast("long"))
                  .otherwise(F.lit(0).cast("long")) for b in range(32))
    sig_lo = sum(F.when(F.col(f"lov{b}") * 2 > F.col("__n"),
                        F.lit(1 << b).cast("long"))
                  .otherwise(F.lit(0).cast("long")) for b in range(32))
    return agg.select("id", sig_hi.alias("sim_hi"), sig_lo.alias("sim_lo"))


def simhash64_pairs(df: DataFrame, text_col: str, id_col: str,
                    max_hamming: int = 7, bands: int = 8,
                    hash_fn: str = "md5") -> DataFrame:
    """64-bit near-dup pairs via 8×8-bit band LSH: any pair within
    Hamming ≤ 7 shares at least one intact byte band (pigeonhole), so
    the banded equi-join finds exactly the brute-force result set —
    losslessness holds whenever ``max_hamming < bands``."""
    if max_hamming >= bands:
        raise ValueError("banding is lossless only for max_hamming < bands")
    sig = simhash64(df, text_col, id_col, hash_fn=hash_fn).cache()
    half_bands = bands // 2
    band_arr = F.array(*(
        [F.struct(F.lit(b).cast("int").alias("band"),
                  F.shiftright(F.col("sim_lo"), b * 8).bitwiseAND(255)
                   .alias("val")) for b in range(half_bands)]
        + [F.struct(F.lit(half_bands + b).cast("int").alias("band"),
                    F.shiftright(F.col("sim_hi"), b * 8).bitwiseAND(255)
                     .alias("val")) for b in range(bands - half_bands)]))
    banded = (sig.select("id", "sim_hi", "sim_lo",
                         F.explode(band_arr).alias("bk"))
                 .select("id", "sim_hi", "sim_lo",
                         F.col("bk.band").alias("band"),
                         F.col("bk.val").alias("val")))
    a, b = banded.alias("a"), banded.alias("b")
    ham = (F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
           + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))))
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                      & (F.col("a.val") == F.col("b.val"))
                      & (F.col("a.id") < F.col("b.id")))
             .where(ham <= max_hamming)
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.col("a.sim_hi").alias("sim_hi_a"),
                     F.col("a.sim_lo").alias("sim_lo_a"),
                     F.col("b.sim_hi").alias("sim_hi_b"),
                     F.col("b.sim_lo").alias("sim_lo_b"),
                     ham.cast("long").alias("hamming"))
             .distinct())


def blocked_link_pairs(df: DataFrame, id_col: str, name_col: str,
                       block_cols: list[str],
                       max_distance: int = 2) -> DataFrame:
    """Entity-resolution candidate links: records are compared ONLY
    within blocking-key groups (the standard ER blocking step — pair
    volume is Σ per-block n², never corpus²), and a pair links when the
    name edit distance is ≤ ``max_distance``. Levenshtein is a built-in
    in both engines, so the whole pipeline is oracle-checkable; feed
    the output to `duplicate_clusters` for entity ids.

    Skew note: a hot blocking key degenerates toward n² — pick blocks
    with bounded cardinality (or add a discriminating second key), the
    ER equivalent of `ngram_jaccard_pairs`' max_df cap."""
    return _blocked_pairs(df, id_col, name_col, block_cols,
                          max_distance).select("id_a", "id_b", "distance")


def _blocked_pairs(df: DataFrame, id_col: str, name_col: str,
                   block_cols: list[str], max_distance: int) -> DataFrame:
    """Shared pair generation of `blocked_link_pairs` /
    `blocked_entity_clusters`: (block_cols..., id_a, id_b, distance)
    candidate links inside each blocking group."""
    # _spread: small compacted inputs scan as ONE task, and a broadcast
    # block-join would then run every levenshtein on that single core —
    # rebalance the probe side to the cluster's slots first (no-op when
    # the scan already has enough splits, i.e. at scale)
    a = _spread(df).select(F.col(id_col).alias("id_a"),
                           F.col(name_col).alias("__na"),
                           *[F.col(c) for c in block_cols])
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(name_col).alias("__nb"),
                  *[F.col(c).alias(f"__b_{c}") for c in block_cols])
    cond = [F.col(c) == F.col(f"__b_{c}") for c in block_cols]
    # bounded levenshtein (Spark 3.5+): returns -1 past the threshold
    # and early-exits on length mismatch, so the per-pair cost is
    # O(min_len · max_distance) instead of O(len²) — kept distances
    # are identical to the unbounded form, so the oracle still matches
    return (a.join(b, cond + [F.col("id_a") < F.col("id_b")])
             .withColumn("distance",
                         F.levenshtein("__na", "__nb", max_distance))
             .where(F.col("distance").between(0, max_distance))
             .select(*block_cols, "id_a", "id_b", "distance"))


def blocked_entity_clusters(df: DataFrame, id_col: str, name_col: str,
                            block_cols: list[str],
                            max_distance: int = 2) -> DataFrame:
    """One-shuffle entity resolution: ``blocked_link_pairs`` link
    generation fused with per-block connected components.

    Because candidate links only ever form INSIDE a blocking group (a
    record carries one blocking key), components can never span blocks
    — so the global graph problem decomposes into independent
    per-block union-finds. The blocking join is keyed on
    ``block_cols`` and the groupBy reuses that partitioning, so the
    whole pipeline is a single shuffle + one Arrow-batched union-find
    per block (bounded work: blocks are capped by construction, see
    ``blocked_link_pairs``'s skew note). Compare O(log n) shuffle
    rounds for ``duplicate_clusters_star`` on the same input — this is
    the production path whenever links are block-local; the iterative
    operators remain for cross-cutting edge sets (MinHash bands,
    contamination links) where no such locality exists.

    Output contract matches ``duplicate_clusters``: one row per id
    appearing in any link, ``cluster_id`` = minimum id reachable,
    ``is_canonical`` = id == cluster_id. Proven equal to the iterative
    operators in tests.
    """
    import pandas as pd

    pairs = _blocked_pairs(df, id_col, name_col, block_cols,
                           max_distance).select(*block_cols, "id_a", "id_b")

    id_type = df.schema[id_col].dataType.simpleString()

    def _components(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:          # path compression
                parent[x], x = root, parent[x]
            return root

        for u, v in zip(pdf["id_a"], pdf["id_b"]):
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # roots are already the component minimum: unions always hang
        # the larger root under the smaller one
        ids = list(parent)
        labels = [find(x) for x in ids]
        return pd.DataFrame({"id": ids, "cluster_id": labels,
                             "is_canonical": [i == l for i, l in
                                              zip(ids, labels)]})

    return pairs.groupBy(*block_cols).applyInPandas(
        _components,
        schema=f"id {id_type}, cluster_id {id_type}, is_canonical boolean")


def duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                    min_len: int = 20,
                    combinable: bool = True) -> DataFrame:
    """EXACT duplicated-substring spans at ``min_len``-gram
    granularity — the primitive under suffix-array training-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", public): every position whose ``min_len``
    normalized characters occur MORE THAN ONCE in the corpus
    (cross-document or self-repeat) is flagged, and flagged positions
    merge into maximal per-document spans. Returns
    ``(id, span_start, span_end, n_grams)`` with 1-based inclusive
    character offsets into the normalized text — the cut list an
    exact-substring dedup pass removes.

    Spark-first shape (a distributed suffix array is the wrong tool on
    an engine with shuffles): positions explode MAP-SIDE (×len, no
    key), each gram keys on the RAW ``min_len``-char substring — the
    grouping is identical to the former ``md5(substring)`` key (both
    are injective over distinct grams) but skips one md5 per character
    of corpus and shuffles 20-byte grams instead of 32-byte hex
    digests (r11, guide §2.3 "shuffle fewer bytes"). Hash partitioning
    over distinct grams stays uniform. Duplicated-position flagging
    has two shapes:

    - ``combinable=True`` (default, the 100 TB path): pre-aggregate
      ``groupBy(__h).count()`` — a COMBINABLE aggregate, so a viral
      corpus-wide boilerplate gram collapses map-side to one row per
      task before the shuffle — keep hashes with count > 1 and
      semi-join the gram stream back on ``__h``. No single reducer
      ever receives every occurrence of a hot gram; the cost is
      reading the explode+md5 stage twice (the two exchange children
      prune different columns, so ReuseExchange can't unify them).
    - ``combinable=False``: a count window over the gram hash — one
      scan of the dominant linear stage, but every occurrence of a
      gram lands on one window partition; fine when no gram is viral.

    Interval merging is the classic lag/cummax island walk INSIDE the
    per-document window partitioning (one more shuffle on the id).
    Nothing is ever corpus × corpus; every stage is linear in total
    characters."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    grams = (_spread(df).select(F.col(id_col), norm.alias("__norm"))
               .where(F.length("__norm") >= min_len)
               .select(id_col, "__norm",
                       F.explode(F.sequence(
                           F.lit(1),
                           F.length("__norm") - (min_len - 1)))
                       .alias("__p"))
               .select(id_col, "__p",
                       F.expr(
                           f"substring(__norm, __p, {int(min_len)})")
                       .alias("__h")))
    if combinable:
        dup_hashes = (grams.groupBy("__h")
                      .agg(F.count("*").alias("__n"))
                      .where(F.col("__n") > 1))
        hits = (grams.join(dup_hashes.select("__h"), "__h", "left_semi")
                .select(id_col, "__p"))
    else:
        hits = (grams.withColumn(
            "__n", F.count("*").over(Window.partitionBy("__h")))
            .where(F.col("__n") > 1)
            .select(id_col, "__p"))
    w = Window.partitionBy(id_col).orderBy("__p")
    ends = F.col("__p") + (min_len - 1)
    # island when this gram does not overlap/extend the running span
    prev_max_end = F.max(ends).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = (prev_max_end.isNull()
                  | (F.col("__p") > prev_max_end + 1)).cast("int")
    islands = (hits.withColumn("__isl",
                               F.sum(new_island).over(
                                   w.rowsBetween(
                                       Window.unboundedPreceding, 0))))
    return (islands.groupBy(id_col, "__isl")
                   .agg(F.min("__p").alias("span_start"),
                        F.max(ends).alias("span_end"),
                        F.count("*").alias("n_grams"))
                   .select(F.col(id_col),
                           F.col("span_start").cast("long"),
                           F.col("span_end").cast("long"), "n_grams"))


def segment_dedup(df: DataFrame, text_col: str, id_col: str,
                  seg_words: int = 10) -> DataFrame:
    """Corpus-wide segment-level exact dedup (the C4 "deduplicate at the
    paragraph/line level" step, on word-window granularity): split every
    document into consecutive ``seg_words``-word segments, keep only the
    globally-first occurrence of each distinct segment text (first =
    lowest (doc id, position) — deterministic on any engine), and
    reassemble each document from its surviving segments in order.

    Returns (id, n_segs, n_kept, text_dedup); a fully-duplicated document
    comes back with ``n_kept = 0`` and empty text — the downstream filter
    decides whether to drop it.

    Scale shape: the per-doc explode is bounded (n_words / seg_words rows
    per document); first-occurrence selection is ``groupBy(segment)
    .agg(min(struct(id, pos)))`` — a *combinable* aggregate, so a
    viral segment duplicated a billion times collapses map-side to one
    row per task before the shuffle (a row_number window over the same
    key would ship every copy to one reducer); reassembly is one
    groupBy on the doc id. Two shuffles total, both on uniform keys,
    nothing all-pairs."""
    pre = (_spread(df).select(F.col(id_col).alias("id"),
                              words(text_col).alias("__w"))
                      .where(F.size("__w") >= 1))
    n = F.ceil(F.size("__w") / F.lit(seg_words)).cast("int")
    segs = pre.select(
        "id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(
                F.slice("__w", i * seg_words + 1, F.lit(seg_words)), " "))
        ).alias("seg_idx", "seg"))
    kept = (segs.groupBy("seg")
                .agg(F.min(F.struct("id", "seg_idx")).alias("__f"))
                .select(F.col("__f.id").alias("id"),
                        F.col("__f.seg_idx").alias("seg_idx"), "seg"))
    tot = segs.groupBy("id").agg(F.count("*").alias("n_segs"))
    ked = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
            lambda x: x["seg"]), " ").alias("text_dedup"))
    return (tot.join(ked, "id", "left")
            .select(F.col("id").alias(id_col), "n_segs",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup")))


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 20,
                k: int = 5) -> DataFrame:
    """Distributed Bloom-filter build: a (word_idx, bits) bitmap table of
    ≤ ``m_bits/64`` rows covering every value of ``key_col``. Each key
    contributes ``k`` bit positions (``xxhash64(key, j) mod m``); partial
    ``bit_or`` aggregation makes the build map-side combinable, and the
    result is a fixed-size sketch (128 KiB of longs at the default m=2²⁰)
    regardless of input volume — the broadcastable summary of a key set
    that is itself too large to broadcast. No driver-side state: the
    bitmap stays a DataFrame and is consumed via broadcast hash joins
    (`bloom_prune`), never collected."""
    pos = F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
        for j in range(k)])).alias("__p")
    return (keys.select(pos)
            .select((F.col("__p") / 64).cast("long").alias("word_idx"),
                    F.expr("shiftleft(1L, cast(__p % 64 as int))").alias("__b"))
            .groupBy("word_idx").agg(F.bit_or("__b").alias("bits")))


def bloom_prune(df: DataFrame, key_col: str, bloom: DataFrame,
                m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Map-side Bloom prune: keep only rows whose ``key_col`` *may* be in
    the set ``bloom`` was built from (superset semantics — false
    positives pass, never false negatives; follow with an exact join on
    the survivors for exact results).

    Shape: ``k`` broadcast hash joins of the fixed-size bitmap table —
    each is a pipelined hash-probe lookup inside the probe side's scan
    stage, so the probe side (the 100 TB side) is never shuffled and
    drops to the bloom's false-positive rate before any exact check.
    An inner join on each word index is correct: a missing bitmap word
    means no key ever set bits there, so the candidate is definitely
    absent."""
    out = df
    for j in range(k):
        p = F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
        out = (out.withColumn(f"__w{j}", (p / 64).cast("long"))
                  .withColumn(f"__t{j}", (p % 64).cast("int")))
        bj = bloom.select(F.col("word_idx").alias(f"__w{j}"),
                          F.col("bits").alias(f"__bits{j}"))
        out = (out.join(F.broadcast(bj), f"__w{j}", "inner")
                  .where(F.bit_get(F.col(f"__bits{j}"),
                                   F.col(f"__t{j}")) == 1))
    drop = [c for j in range(k) for c in (f"__w{j}", f"__t{j}", f"__bits{j}")]
    return out.drop(*drop)


def contamination_check_bloom(corpus: DataFrame, benchmark: DataFrame,
                              text_col: str, id_col: str, n: int = 3,
                              m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """`contamination_check` for benchmark shingle sets too large to
    broadcast as an exact hash set (the documented ~1 GiB switch point):
    identical results, different candidate path.

    The benchmark shingles build a fixed-size Bloom bitmap (128 KiB —
    broadcastable at any benchmark size); corpus shingles are pruned
    map-side against it (`bloom_prune` — the corpus is still never
    shuffled in full), and only the tiny bloom-surviving fraction goes
    through the exact semi join that removes false positives. Bloom
    prune + exact confirm ≡ exact semi join, so this shares
    `text_contamination`'s oracle."""
    # cache: the (small) benchmark shingle stream feeds per_doc, the
    # Bloom build AND the hit count — tokenize it once, not three times
    # (same discipline as contamination_check)
    b_sh = _doc_shingles(benchmark, text_col, id_col, n).cache()
    per_doc = b_sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    b_set = b_sh.select("shingle").distinct()
    # the bitmap is referenced by k broadcast joins in bloom_prune;
    # cache it so the build aggregation runs once, not k times (the
    # per-join broadcast exchanges sit above differently-aliased
    # projections, so ReuseExchange does not unify them)
    bloom = bloom_build(b_set, "shingle", m_bits, k).cache()
    c_sh = (_spread(corpus).select(words(text_col).alias("__w"))
                  .where(F.size("__w") >= n)
                  .select(F.explode(
                      shingles_from_words(F.col("__w"), n)).alias("shingle")))
    survivors = bloom_prune(c_sh, "shingle", bloom, m_bits, k)
    # exact confirm on the pruned stream; no broadcast hint — at real
    # scale b_set exceeds the broadcast threshold and AQE plans a
    # shuffled semi join of survivors (tiny) against it
    matched = survivors.join(b_set, "shingle", "left_semi").distinct()
    hits = (b_sh.join(F.broadcast(matched), "shingle", "left_semi")
                .groupBy("id").agg(F.count("*").alias("n_hit")))
    return (per_doc.join(hits, "id", "left")
            .select(F.col("id").alias(id_col), "n_shingles",
                    F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
                    F.round(F.coalesce("n_hit", F.lit(0))
                            / F.col("n_shingles"), 9).alias("contamination")))


def contamination_check(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Train/eval contamination scan: for each benchmark document, the
    fraction of its word n-gram shingles that appear *anywhere* in the
    training corpus. The standard decontamination gate before a
    training run (cf. n-gram overlap checks in GPT-3/PaLM data work).

    Shape: the benchmark's distinct shingle set (small — benchmarks are
    MBs even when the corpus is TBs) broadcasts INTO the corpus scan as
    a build-side hash set; each corpus shingle probes it map-side, and
    only the matched shingles (≤ |benchmark set|) are deduplicated and
    broadcast back to score the benchmark. The corpus — the 100 TB
    side — is never shuffled: its only operation is a broadcast-hash
    semi probe inside the scan stage. (The previous shuffle-both-sides
    semi join was 2.4× slower at sf0.1 and unbounded at scale.)"""
    c_sh = (_spread(corpus).select(words(text_col).alias("__w"))
                  .where(F.size("__w") >= n)
                  .select(F.explode(
                      shingles_from_words(F.col("__w"), n)).alias("shingle")))
    # benchmark shingles feed both the probe set and the final score —
    # cache so the (small) benchmark tokenizes once, not three times
    b_sh = _doc_shingles(benchmark, text_col, id_col, n).cache()
    b_set = b_sh.select("shingle").distinct()
    matched = (c_sh.join(F.broadcast(b_set), "shingle", "left_semi")
                   .distinct())
    # single aggregation scores each benchmark doc: total shingles and
    # matched shingles in one pass (count of the broadcast-left-join hit
    # marker), replacing the former per_doc ⋈ hits two-agg shape
    flagged = b_sh.join(F.broadcast(matched.withColumn("__hit", F.lit(1))),
                        "shingle", "left")
    return (flagged.groupBy("id")
            .agg(F.count("*").alias("n_shingles"),
                 F.count("__hit").alias("n_hit"))
            .select(F.col("id").alias(id_col), "n_shingles", "n_hit",
                    F.round(F.col("n_hit")
                            / F.col("n_shingles"), 9).alias("contamination")))


def source_overlap_matrix(df: DataFrame, text_col: str, source_col: str,
                          n: int = 3, max_df: int | None = None,
                          id_col: str | None = None) -> DataFrame:
    """Pairwise content overlap between corpus sources: for every source
    pair, how many distinct word n-gram shingles they share, and the
    overlap coefficient |A∩B| / min(|A|, |B|). The provenance audit a
    curation team runs to find mirrored / scraped-twice feeds *before*
    document-level dedup (two sources with high overlap are one crawl
    wearing two names).

    Never a source×source document join: ONE shingle-keyed aggregation
    collects each shingle's (sorted, distinct) source set — bounded by
    |sources| — and a map-side transform explodes that set's ordered
    pairs. Cost is Σ_shingle |sources(shingle)|², bounded by #shingles
    × |sources|² regardless of corpus size; the shingle key is uniform
    by construction. The raw shingle stream shuffles exactly once:
    ``collect_set``'s map-side partial aggregation IS the dedup (no
    separate ``distinct()`` shuffle), and the per-source totals derive
    from the collected sets (input = distinct pairs, not the stream).

    Output: (source_a, source_b, n_shared, n_a, n_b, overlap) a < b.

    Measured alternative, rejected: collapsing shingles by identical
    source-set signature before the pair explode (weighted pair counts)
    ADDS an array-keyed shuffle that costs more than the explode it
    saves at every tested scale (A/B at sf0.1: 1.4 s vs 1.8 s) — the
    pair stream's map-side partial SUM already absorbs the volume.

    ``max_df`` (requires ``id_col``) arms the load-bounded variant:
    shingles present in MORE than ``max_df`` documents — corpus-wide
    boilerplate — are excluded from the overlap universe, mirrored
    exactly in the query oracle (the same documented-variant contract
    as ``ngram_jaccard_pairs(max_df=)``). r11 shape (guide §2.4
    "remove shuffles outright"): ONE distinct over (src, id, shingle)
    triples (combinable — map-side partials collapse repeats), then
    ONE aggregation producing the source set AND the document
    frequency together, filtered to ``df ≤ max_df`` *after* the agg.
    The former shape scanned the explode twice and added a count agg +
    broadcast anti-join; per-shingle agg state is bounded by
    |sources| either way, so aggregating the hot shingles before
    dropping them is safe. Same-session A/B at sf0.1 (10 interleaved
    noop-sink iterations): median 2.83 s vs 3.63 s (1.28×), min 2.38 s
    vs 3.43 s (1.44×); whole-plan 23 → 14 Exchanges, 6 → 3 parquet
    scans (plans/r11/corpus_source_overlap_dfcap_*.txt); output
    hash-identical."""
    if max_df is not None and id_col is None:
        raise ValueError("max_df requires id_col (document identity "
                         "defines the frequency being capped)")
    ss = (_spread(df).select(F.col(source_col).alias("__src"),
                             *([F.col(id_col).alias("__id")]
                               if max_df is not None else []),
                             words(text_col).alias("__w"))
            .where(F.size("__w") >= n)
            .select("__src", *(["__id"] if max_df is not None else []),
                    F.explode(
                shingles_from_words(F.col("__w"), n)).alias("shingle")))
    if max_df is not None:
        # one distinct + one agg: df and the source set come out of the
        # SAME aggregation ((id → src) is functional, so count over
        # distinct triples IS the document frequency); hot shingles
        # drop after the agg, where their state was |sources|-bounded
        trip = ss.distinct()
        sets = (trip.groupBy("shingle")
                    .agg(F.array_sort(F.collect_set("__src"))
                          .alias("__set"),
                         F.count("*").alias("__df"))
                    .where(F.col("__df") <= max_df)
                    .select("shingle", "__set"))
    else:
        sets = (ss.groupBy("shingle")
                  .agg(F.array_sort(F.collect_set("__src"))
                        .alias("__set")))
    # three consumers read ``sets``; AQE reuses the heavy exchange
    # across them (executed plans at every tested scale — see the
    # SOURCE_OVERLAP_CHECKPOINT retraction note), so nothing engages
    # the checkpoint arm unless a test/harness forces it. The shingle
    # column is dropped first — no consumer reads it, so only the
    # source-set arrays ever materialize.
    ckpt = SOURCE_OVERLAP_CHECKPOINT
    if ckpt is None:
        ckpt = (SOURCE_OVERLAP_CKPT_MIN_BYTES is not None
                and _input_bytes(df) >= SOURCE_OVERLAP_CKPT_MIN_BYTES)
    if ckpt:
        sets = sets.select("__set").localCheckpoint(eager=False)
    else:
        sets = sets.select("__set")
    totals = (sets.select(F.explode("__set").alias("__src"))
                  .groupBy("__src").agg(F.count("*").alias("n_total")))
    srcs = sets.where(F.size("__set") >= 2)
    pairs = F.flatten(F.transform(
        F.slice(F.col("__set"), 1, F.size("__set") - 1),
        lambda a, i: F.transform(
            F.slice(F.col("__set"), i + 2, F.size("__set")),
            lambda b: F.struct(a.alias("a"), b.alias("b")))))
    shared = (srcs.select(F.explode(pairs).alias("p"))
                  .groupBy(F.col("p.a").alias("source_a"),
                           F.col("p.b").alias("source_b"))
                  .agg(F.count("*").alias("n_shared")))
    ta = totals.select(F.col("__src").alias("source_a"),
                       F.col("n_total").alias("n_a"))
    tb = totals.select(F.col("__src").alias("source_b"),
                       F.col("n_total").alias("n_b"))
    return (shared.join(F.broadcast(ta), "source_a")
                  .join(F.broadcast(tb), "source_b")
                  .select("source_a", "source_b", "n_shared", "n_a", "n_b",
                          F.round(F.col("n_shared")
                                  / F.least("n_a", "n_b"), 9)
                           .alias("overlap")))
