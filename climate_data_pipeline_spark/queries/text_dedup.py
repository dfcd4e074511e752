"""Text-analysis and deduplication queries over the documents table
(beyond-reference extensions, build-plan step 9).

The oracle SQL for the hash-based operators (MinHash/SimHash) is generated
programmatically so both engines express the *same algorithm definition* —
md5-keyed permutations and bit votes are portable by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as SAMP
from ..operators import text as TX
from ..functions.exact import (exact_avg, round_port, sql_exact_avg,
                               sql_round_port)
from ..registry import query
from ..sources.io import load_table

_W = TX.SQL_WORDS.format(t="text")  # DuckDB word-array expression

# ground-truth evaluators run on a DETERMINISTIC md5-bucket sample
# (salt 'eval'): exact pair sets are inherently quadratic-shaped even
# behind an inverted index, so the sample bounds the cost while the
# hash predicate — independent of content — keeps the precision/recall
# statistics unbiased and the oracle exact.
_MINHASH_EVAL_FRACTION = 0.4
_WINNOW_EVAL_FRACTION = 0.5


def _doc_eval_where(fraction: float) -> str:
    return (f" WHERE {SAMP.sql_hash_bucket('doc_id', salt='eval')}"
            f" < {int(round(fraction * SAMP.N_BUCKETS))}")

# --- text analysis -----------------------------------------------------------

@query("text_token_stats", oracle=f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_text,
       CAST(len({_W}) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(lower(text), '{TX.BPE_PIECE}')) AS BIGINT) AS n_tokens_bpe
FROM documents
""")
def token_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: chars, whitespace words, BPE-ish sub-word pieces."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.token_stats(docs, "text").select(
        "doc_id", "n_chars_text", "n_words", "n_tokens_bpe")


_STOPLIST = ", ".join(f"'{s}'" for s in TX.ENGLISH_STOPWORDS)

# the fixed-weight quality blend, shared by text_quality and the
# keep-best-canonical dedup oracle so the two cannot drift
# integer-unit rounding (round(x*1e6)/1e6, functions/exact.round_port):
# the blend is RATIONAL (integer ratios), so round(x, 6) can land on an
# exact decimal tie that Spark and DuckDB break differently — observed
# at sf0.1 (8/5000 docs), invisible at sf0.01
_QUALITY_SQL = f"""(round((0.4 * (len(list_filter({_W}, x -> list_contains(
                 [{_STOPLIST}], x)))
                 / greatest(len({_W}), 1))
           + 0.3 * least((list_sum(list_transform({_W}, x -> length(x)))
                 / greatest(len({_W}), 1)) / 8.0, 1.0)
           + 0.3 * (1.0 - length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
                 / greatest(length(text), 1))) * 1000000) / 1000000.0)"""


@query("text_quality", oracle=f"""
SELECT doc_id,
       round((len(list_filter({_W}, x -> list_contains(
             [{_STOPLIST}], x)))
             / greatest(len({_W}), 1)) * 1000000) / 1000000.0
         AS stopword_ratio,
       round((list_sum(list_transform({_W}, x -> length(x)))
             / greatest(len({_W}), 1)) * 1000000) / 1000000.0
         AS avg_word_len,
       round((length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
             / greatest(length(text), 1)) * 1000000) / 1000000.0
         AS punct_ratio,
       {_QUALITY_SQL} AS quality_score
FROM documents
""")
def quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, mean word length, punctuation
    ratio, fixed-weight blend. All four metrics are rational (integer
    ratios), so rounding uses the integer-unit tie-portable form."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.quality_score(docs, "text")
    return out.select("doc_id",
                      round_port("stopword_ratio").alias("stopword_ratio"),
                      round_port("avg_word_len").alias("avg_word_len"),
                      round_port("punct_ratio").alias("punct_ratio"),
                      round_port("quality_score").alias("quality_score"))


# the corpus vocabulary only contains 'the'/'a' from common stoplists,
# so the canonical Gopher 8-word list would be degenerately false on
# every document; the repo's English stoplist keeps the rule
# discriminative here (the operator default stays canonical)
_GOPHER_STOPS = ", ".join(f"'{s}'" for s in TX.ENGLISH_STOPWORDS)


@query("text_gopher_rules", oracle=f"""
WITH c AS (
  SELECT doc_id,
         CAST(len({_W}) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform({_W}, x -> length(x))), 0)
              AS BIGINT) AS word_chars,
         CAST(len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\\.\\.\\.'))
              + len(regexp_extract_all(text, '…')) AS BIGINT) AS n_symbols,
         CAST(len(list_filter(string_split(text, chr(10)),
                              l -> trim(l) <> '')) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
              l -> trim(l) <> '' AND regexp_matches(l, '^\\s*[-*•]')))
              AS BIGINT) AS n_bullet,
         CAST(len(list_filter(string_split(text, chr(10)),
              l -> trim(l) <> '' AND regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
              AS BIGINT) AS n_ellipsis,
         CAST(len(list_filter({_W}, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(list_filter([{_GOPHER_STOPS}],
              s -> list_contains({_W}, s))) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, n_words, word_chars, n_lines,
       n_words BETWEEN 30 AND 100000 AS r_word_count,
       word_chars >= 3 * n_words AND word_chars <= 10 * n_words
         AND n_words > 0 AS r_mean_word_len,
       10 * n_symbols < n_words AS r_symbol_ratio,
       10 * n_bullet < 9 * greatest(n_lines, 1) AS r_bullet_lines,
       10 * n_ellipsis < 3 * greatest(n_lines, 1) AS r_ellipsis_lines,
       5 * n_alpha >= 4 * n_words AS r_alpha_words,
       n_stop >= 2 AS r_stopwords,
       (n_words BETWEEN 30 AND 100000)
         AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words
              AND n_words > 0)
         AND (10 * n_symbols < n_words)
         AND (10 * n_bullet < 9 * greatest(n_lines, 1))
         AND (10 * n_ellipsis < 3 * greatest(n_lines, 1))
         AND (5 * n_alpha >= 4 * n_words)
         AND (n_stop >= 2) AS pass
FROM c
""")
def gopher_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule filter (Rae et al. 2021 §A1.1.1): the
    seven-rule composite, evaluated in exact integer arithmetic by
    cross-multiplication so no float ratio ever materializes — engine-
    and partitioning-portable by construction. min_words adapted to the
    synthetic corpus (30; canonical 50 would reject most of it)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.gopher_rules(docs, "text", "doc_id", min_words=30,
                           stopwords=TX.ENGLISH_STOPWORDS)


@query("text_language_id", oracle=f"""
SELECT doc_id, lang,
       {TX.sql_lang_scores("text")},
       {TX.sql_lang_pred()} AS lang_pred
FROM documents
""")
def language_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language scoring with deterministic tie-break; the
    dataset's lang label is carried through for eyeball comparison."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.language_id(docs, "text")
    return out.select("doc_id", "lang",
                      *[f"score_{lang}" for lang in sorted(TX.LANG_MARKERS)],
                      "lang_pred")


@query("text_repetition", oracle=f"""
WITH words AS (SELECT doc_id AS id, {_W} AS w FROM documents),
wx AS (SELECT id, unnest(w) AS g FROM words),
wc AS (SELECT id, g, count(*) AS c FROM wx GROUP BY 1, 2),
wagg AS (
  SELECT id, CAST(sum(c) AS BIGINT) AS n_words,
         (CAST(sum(c) AS BIGINT) - count(*)) / CAST(sum(c) AS DOUBLE)
           AS dup_word_frac,
         max(c) / CAST(sum(c) AS DOUBLE) AS top_word_share
  FROM wc GROUP BY id),
bx AS (SELECT id, unnest(list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i+1])) AS g
       FROM words WHERE len(w) >= 2),
bc AS (SELECT id, g, count(*) AS c FROM bx GROUP BY 1, 2),
bagg AS (SELECT id, max(c) / CAST(sum(c) AS DOUBLE) AS top_bigram_share
         FROM bc GROUP BY id)
SELECT d.doc_id,
       COALESCE(w.n_words, 0) AS n_words,
       COALESCE(w.dup_word_frac, 0.0) AS dup_word_frac,
       COALESCE(w.top_word_share, 0.0) AS top_word_share,
       COALESCE(b.top_bigram_share, 0.0) AS top_bigram_share
FROM documents d
LEFT JOIN wagg w ON w.id = d.doc_id
LEFT JOIN bagg b ON b.id = d.doc_id
""")
def repetition_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (top-word share, top-bigram share,
    duplicate-word fraction) — the boilerplate/template-spam filters a
    training-data pipeline applies before dedup. Ratios of exact integer
    counts, so values hash-match without rounding."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.repetition_stats(docs, "text", "doc_id")


def _pii_oracle() -> str:
    counts = []
    redacted = "lower(text)"
    for name, pat in TX.PII_PATTERNS.items():
        counts.append("CAST(len(regexp_extract_all(lower(text), '" + pat
                      + "')) AS BIGINT) AS n_" + name)
        redacted = ("regexp_replace(" + redacted + ", '" + pat
                    + "', '<" + name + ">', 'g')")
    return ("SELECT doc_id, " + ", ".join(counts)
            + ", CAST(length(" + redacted + ") AS BIGINT) AS n_chars_redacted"
            + " FROM documents")


@query("text_pii_scan", oracle=_pii_oracle())
def pii_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-ish pattern scan (emails / URLs / long digit runs) + redacted
    length. The redacted-length column binds match *spans*, so the hash
    check proves both engines found identical occurrences, not just equal
    counts."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.pii_scan(docs, "text", "doc_id")


@query("text_fingerprint", oracle=f"""
SELECT doc_id, md5(array_to_string({_W}, ' ')) AS fingerprint
FROM documents
""")
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (md5 of the word stream)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.fingerprint(docs, "text").select("doc_id", "fingerprint")


_WINNOW_K, _WINNOW_W = 12, 8
_WINNOW_B, _WINNOW_M = 257, (1 << 31) - 1


def _winnow_cte(k: int, w: int, where: str = "") -> str:
    """DuckDB twin of operators/text.winnow_fingerprints: same
    normalization, the same closed-form Karp-Rabin k-gram hash (BIGINT
    throughout — ascii() is 32-bit), the same rightmost-min integer
    key, complete windows only."""
    terms = " + ".join(
        f"CAST(ascii(substring(nm, CAST(p + {j} AS INT), 1)) AS BIGINT)"
        f" * {pow(_WINNOW_B, k - 1 - j, _WINNOW_M)}"
        for j in range(k))
    return f"""norm AS (
  SELECT doc_id,
         regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]', '', 'g')
           AS nm
  FROM documents{where}
),
pos AS (
  SELECT doc_id, nm,
         CAST(unnest(generate_series(1, length(nm) - {k - 1})) AS BIGINT)
           AS p
  FROM norm
  WHERE length(nm) >= {k + w - 1}
),
grams AS (
  SELECT doc_id, p,
         ({terms}) % {_WINNOW_M} AS h
  FROM pos
),
keyed AS (
  SELECT doc_id,
         min(h * 4294967296 + (4294967295 - p)) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS mk,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn
  FROM grams
),
fp AS (
  SELECT DISTINCT doc_id, 4294967295 - (mk % 4294967296) AS pos,
         mk // 4294967296 AS hash
  FROM keyed WHERE rn >= {w}
)"""


_WINNOW_CTE = _winnow_cte(_WINNOW_K, _WINNOW_W)


@query("text_winnow_fingerprints", oracle=f"""
WITH {_WINNOW_CTE}
SELECT doc_id, pos, hash FROM fp
""")
def winnow_fingerprints_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (SIGMOD 2003 / MOSS): rightmost-min
    Karp-Rabin k-gram hashes per w-window — the LOCAL-match
    fingerprint that whole-document hashes and bag-of-shingles miss.
    k=12, w=8 pinned (short gram sizes make common English words
    collide into a near-complete pair graph; 12-char grams carry real
    local context); the oracle replays the closed-form rolling hash,
    the integer tie-break key, and the complete-window rule."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.winnow_fingerprints(docs, "text", "doc_id",
                                  k=_WINNOW_K, w=_WINNOW_W)


@query("text_winnow_overlap", oracle=f"""
WITH {_winnow_cte(_WINNOW_K, _WINNOW_W,
                  where=_doc_eval_where(_WINNOW_EVAL_FRACTION))},
sel AS (SELECT DISTINCT doc_id, hash FROM fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM sel a JOIN sel b ON a.hash = b.hash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
""")
def winnow_overlap_documents(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Shared-fingerprint document pairs — winnowing's contamination /
    plagiarism readout: any shared run of >= k+w-1 normalized
    characters plants at least one IDENTICAL fingerprint in both
    documents, so pairs with n_shared >= 3 share real local content.
    Scale shape: distinct (doc, hash) -> equi self-join on hash (a
    uniform 31-bit key) -> pair count; candidates track true hash
    collisions, never doc x doc. The overlap READOUT (an audit, like
    the evaluators) runs on a deterministic 50% md5-bucket sample
    (salt 'eval', mirrored into the oracle) — fingerprinting cost is
    linear in sampled characters and shared-pair volume drops with the
    square, while content-independent hashing keeps the overlap-rate
    estimate unbiased; the production fingerprint table itself
    (`text_winnow_fingerprints`) stays full-corpus."""
    docs = SAMP.deterministic_sample(
        load_table(spark, sf_dir, "documents"), "doc_id",
        _WINNOW_EVAL_FRACTION, salt="eval")
    fp = TX.winnow_fingerprints(docs, "text", "doc_id",
                                k=_WINNOW_K, w=_WINNOW_W)
    # ONE scan of the fingerprint stream (a self-join reads it twice):
    # per-hash sorted doc set, map-side ordered-pair explode — the
    # source_overlap_matrix shape; pair volume tracks true collisions
    sets = (fp.groupBy("hash")
              .agg(F.array_sort(F.collect_set("doc_id")).alias("__ds"))
              .where(F.size("__ds") >= 2))
    pairs = F.flatten(F.transform(
        F.slice(F.col("__ds"), 1, F.size("__ds") - 1),
        lambda a, i: F.transform(
            F.slice(F.col("__ds"), i + 2, F.size("__ds")),
            lambda b: F.struct(a.alias("a"), b.alias("b")))))
    return (sets.select(F.explode(pairs).alias("p"))
                .groupBy(F.col("p.a").alias("doc_a"),
                         F.col("p.b").alias("doc_b"))
                .agg(F.count("*").alias("n_shared"))
                .where(F.col("n_shared") >= 3))


@query("text_duplicate_spans", oracle="""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]', '', 'g')
           AS nm
  FROM documents
),
pos AS (
  SELECT doc_id, nm,
         CAST(unnest(generate_series(1, length(nm) - 19)) AS BIGINT) AS p
  FROM norm WHERE length(nm) >= 20
),
grams AS (
  SELECT doc_id, p, md5(substring(nm, CAST(p AS INT), 20)) AS h
  FROM pos
),
dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
hits AS (SELECT g.doc_id, g.p FROM grams g JOIN dup USING (h)),
isl AS (
  SELECT doc_id, p,
         SUM(CASE WHEN pme IS NULL OR p > pme + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM (SELECT doc_id, p,
               MAX(p + 19) OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM hits)
)
SELECT doc_id, MIN(p) AS span_start, MAX(p + 19) AS span_end,
       COUNT(*) AS n_grams
FROM isl GROUP BY doc_id, grp
""")
def duplicate_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans at 20-gram granularity (the
    Lee et al. 2022 exact-substring dedup primitive) — every maximal
    per-document run of normalized characters whose 20-grams occur
    more than once corpus-wide. One skew-free md5-keyed shuffle + a
    semi-join + a per-doc island walk; never corpus x corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_spans(docs, "text", "doc_id", min_len=20)


# --- dedup -------------------------------------------------------------------

@query("dedup_exact", oracle=f"""
SELECT md5(array_to_string({_W}, ' ')) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""")
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by normalized content hash, keep the minimum id.
    One hash aggregation on a uniform 32-char key — skew-free at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


def _shingles_cte(where: str = "") -> str:
    return f"""
words AS (SELECT doc_id AS id, {_W} AS w FROM documents{where}),
ds AS (
  SELECT DISTINCT id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM words WHERE len(w) >= 3
)
"""


_SHINGLES_CTE = _shingles_cte()


def _minhash_oracle(num_perm: int = 12, bands: int = 4,
                    min_est: float = 0.5) -> str:
    rows = num_perm // bands
    sig_cols = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(num_perm))
    band_keys = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS key{b}" for b in range(bands))
    band_union = "\nUNION ALL\n".join(
        f"SELECT id, {b} AS band, key{b} AS key FROM keys" for b in range(bands))
    est = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm))
    return f"""
WITH {_SHINGLES_CTE.strip()},
sig AS (SELECT id, {sig_cols} FROM ds GROUP BY id),
keys AS (SELECT id, {band_keys} FROM sig),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT c.id_a, c.id_b, ({est}) / {float(num_perm)} AS jaccard_est
FROM cand c
JOIN sig sa ON sa.id = c.id_a
JOIN sig sb ON sb.id = c.id_b
WHERE ({est}) / {float(num_perm)} >= {min_est}
"""


def _minhash_affine_oracle(num_perm: int = 12, bands: int = 4,
                           min_est: float = 0.5) -> str:
    """Oracle for the affine (universal-hash) MinHash scheme: ONE md5 per
    shingle → 28-bit int h, then component i = min((a_i·h + b_i) mod p)
    with the same md5-derived coefficients the engine uses
    (`operators/dedup._affine_coeffs`) — re-derived here so both engines
    express the identical algorithm definition."""
    from ..operators.dedup import _MERSENNE_P, _affine_coeffs

    rows = num_perm // bands
    coeffs = _affine_coeffs(num_perm)
    h = "CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT)"
    sig_cols = ",\n         ".join(
        f"min(({a} * {h} + {b}) % {_MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(coeffs))
    band_keys = ", ".join(
        "md5(" + " || '|' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f") AS key{b}" for b in range(bands))
    band_union = "\nUNION ALL\n".join(
        f"SELECT id, {b} AS band, key{b} AS key FROM keys" for b in range(bands))
    est = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm))
    return f"""
WITH {_SHINGLES_CTE.strip()},
sig AS (SELECT id, {sig_cols} FROM ds GROUP BY id),
keys AS (SELECT id, {band_keys} FROM sig),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT c.id_a, c.id_b, ({est}) / {float(num_perm)} AS jaccard_est
FROM cand c
JOIN sig sa ON sa.id = c.id_a
JOIN sig sb ON sb.id = c.id_b
WHERE ({est}) / {float(num_perm)} >= {min_est}
"""


@query("dedup_minhash_affine", oracle=_minhash_affine_oracle())
def minhash_affine_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup on the `scheme='affine'` signature path — 1
    md5 + num_perm multiply-adds per shingle instead of num_perm md5
    evaluations (the CPU trade for a 100 TB corpus), value-checked
    end-to-end by an oracle that re-derives the identical universal-hash
    family."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_pairs(docs, "text", "doc_id",
                           num_perm=12, bands=4, min_est=0.5,
                           scheme="affine")


@query("dedup_minhash", oracle=_minhash_oracle())
def minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup: md5-keyed min-hash signatures over word
    3-gram shingles, banded candidate join, estimate ≥ 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_pairs(docs, "text", "doc_id",
                           num_perm=12, bands=4, min_est=0.5)


def _incremental_oracle(num_perm: int = 12, bands: int = 4,
                        min_est: float = 0.5, mod: int = 5) -> str:
    rows = num_perm // bands
    sig_cols = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(num_perm))
    band_keys = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        + f") AS key{b}" for b in range(bands))
    band_union = "\nUNION ALL\n".join(
        f"SELECT id, {b} AS band, key{b} AS key FROM keys" for b in range(bands))
    est = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm))
    return f"""
WITH {_SHINGLES_CTE.strip()},
sig AS (SELECT id, {sig_cols} FROM ds GROUP BY id),
keys AS (SELECT id, {band_keys} FROM sig),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT a.id AS id, b.id AS match_id, (b.id % {mod} <> 0) AS is_corpus
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key
   AND a.id % {mod} = 0
   AND ((b.id % {mod} <> 0) OR (b.id < a.id))
),
ver AS (
  SELECT c.id, c.match_id, c.is_corpus, ({est}) / {float(num_perm)} AS est
  FROM cand c
  JOIN sig sa ON sa.id = c.id
  JOIN sig sb ON sb.id = c.match_id
  WHERE ({est}) / {float(num_perm)} >= {min_est}
),
per AS (
  SELECT id, count(*) AS n_matches, max(est) AS best_est,
         bool_or(is_corpus) AS matched_corpus
  FROM ver GROUP BY 1
)
SELECT s.id AS doc_id, COALESCE(p.n_matches, 0) AS n_matches,
       COALESCE(p.best_est, 0.0) AS best_est,
       COALESCE(p.matched_corpus, FALSE) AS matched_corpus,
       p.id IS NOT NULL AS is_dup
FROM (SELECT doc_id AS id FROM documents WHERE doc_id % {mod} = 0) s
LEFT JOIN per p USING (id)
"""


@query("dedup_incremental", oracle=_incremental_oracle())
def incremental_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state dedup: every 5th document plays the newly-arrived
    batch, screened against the rest (the standing corpus, represented
    by its appendable band-signature store) plus earlier batch arrivals
    (`operators/dedup.incremental_dedup`). The historical text is never
    re-shingled — only its skinny band table joins."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    return D.incremental_dedup(corpus, batch, "text", "doc_id",
                               num_perm=12, bands=4, min_est=0.5)


@query("dedup_ngram_jaccard", oracle=f"""
WITH {_SHINGLES_CTE.strip()},
sizes AS (SELECT id, count(*) AS n_sh FROM ds GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b, c.n_common,
       c.n_common / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
FROM common c
JOIN sizes sa ON sa.id = c.id_a
JOIN sizes sb ON sb.id = c.id_b
WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= 0.5
""")
def ngram_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard ≥ 0.5 via the inverted-index (sparse) join —
    never materializes |docs|² pairs. The density gate is armed
    (``auto_cap=True``): on a duplication-heavy corpus where Σdf²/Σdf
    crosses ``dedup.JACCARD_GATE_MEAN_DF`` the join auto-routes to the
    ``max_df``-capped production arm (see ``dedup_ngram_jaccard_dfcap``
    for the always-capped contract and its mirrored oracle); at the
    oracle scales the gate stays open and the result is the exact
    uncapped join this SQL describes."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                                 min_jaccard=0.5, auto_cap=True)


def _simhash_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits))
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH w AS (
  SELECT doc_id AS id, unnest({_W}) AS word FROM documents
),
h AS (SELECT id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM w),
v AS (SELECT id, {votes} FROM h GROUP BY id),
s AS (SELECT id, CAST({sig} AS BIGINT) AS simhash FROM v)
SELECT a.id AS id_a, b.id AS id_b,
       a.simhash AS simhash_a, b.simhash AS simhash_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


@query("dedup_simhash", oracle=_simhash_oracle())
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit duplicate-weighted word-hash signature,
    byte-band LSH join (lossless for Hamming ≤ 3 by pigeonhole), exact
    Hamming filter. The oracle runs the brute-force quadratic comparison —
    matching it proves the banding loses nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "text", "doc_id", max_hamming=3, bands=4)


def _simhash64_oracle(max_hamming: int = 7) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN ({c} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS {c}v{b}"
        for c in ("hi", "lo") for b in range(32))
    sig_hi = " + ".join(
        f"(CASE WHEN hiv{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    sig_lo = " + ".join(
        f"(CASE WHEN lov{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return f"""
WITH w AS (
  SELECT doc_id AS id, unnest({_W}) AS word FROM documents
),
h AS (SELECT id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(word), 9, 8))::BIGINT AS lo FROM w),
v AS (SELECT id, {votes} FROM h GROUP BY id),
s AS (SELECT id, CAST({sig_hi} AS BIGINT) AS sim_hi,
             CAST({sig_lo} AS BIGINT) AS sim_lo FROM v)
SELECT a.id AS id_a, b.id AS id_b,
       a.sim_hi AS sim_hi_a, a.sim_lo AS sim_lo_a,
       b.sim_hi AS sim_hi_b, b.sim_lo AS sim_lo_b,
       CAST(bit_count(xor(a.sim_hi, b.sim_hi))
            + bit_count(xor(a.sim_lo, b.sim_lo)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.id < b.id
WHERE bit_count(xor(a.sim_hi, b.sim_hi))
      + bit_count(xor(a.sim_lo, b.sim_lo)) <= {max_hamming}
"""


@query("dedup_simhash64", oracle=_simhash64_oracle())
def simhash64_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup (two 32-bit halves; 8×8-bit band LSH,
    lossless for Hamming ≤ 7 by pigeonhole) — the production-width
    variant: 32-bit signatures band-collide heavily at ≥10⁹ docs. The
    oracle runs the brute-force quadratic comparison — matching it
    proves the banding loses nothing at 64 bits too."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash64_pairs(docs, "text", "doc_id", max_hamming=7, bands=8)


_CLUSTER_CTES = f"""{_SHINGLES_CTE.strip()},
sizes AS (SELECT id, count(*) AS n_sh FROM ds GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM common c
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
  WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(src, dst) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
)"""


@query("dedup_clusters", oracle=f"""
WITH RECURSIVE {_CLUSTER_CTES}
SELECT src AS id, min(dst) AS cluster_id,
       (src = min(dst)) AS is_canonical
FROM reach GROUP BY src
""")
def dedup_clusters_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the exact
    Jaccard ≥ 0.5 pair graph via iterative min-label propagation
    (``operators/dedup.duplicate_clusters``). The oracle computes the full
    reachability closure with a recursive CTE and takes the min reachable
    id — matching it proves the propagation converged to true components,
    not just 1-hop neighborhoods."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id",
                                  n=3, min_jaccard=0.5, auto_cap=True)
    return D.duplicate_clusters(pairs)


@query("dedup_clusters_star", oracle=f"""
WITH RECURSIVE {_CLUSTER_CTES}
SELECT src AS id, min(dst) AS cluster_id,
       (src = min(dst)) AS is_canonical
FROM reach GROUP BY src
""")
def dedup_clusters_star_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same component assignment as ``dedup_clusters``, computed with the
    O(log n)-round large-star/small-star rewiring
    (``operators/dedup.duplicate_clusters_star``) — the variant that stays
    fast on long-chain pair graphs where label propagation's round count
    is the graph diameter. Checked against the same reachability-closure
    oracle, so both algorithms are proven to produce identical clusters.
    The adaptive small-graph gate is armed (near-dup pair lists at
    J ≥ 0.5 are quasi-clique-tiny, where the rewiring rounds are pure
    scheduling floor); the star rounds themselves stay pinned by the
    long-chain/topology unit tests in test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id",
                                  n=3, min_jaccard=0.5, auto_cap=True)
    return D.duplicate_clusters_star(pairs, small_graph_edges=2_000_000)


@query("dedup_ngram_jaccard_dfcap", oracle=f"""
WITH {_SHINGLES_CTE.strip()},
capped AS (
  SELECT ds.id, ds.shingle FROM ds
  JOIN (SELECT shingle FROM ds GROUP BY shingle HAVING count(*) <= 20) r
    ON r.shingle = ds.shingle
),
sizes AS (SELECT id, count(*) AS n_sh FROM capped GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b, c.n_common,
       c.n_common / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
FROM common c
JOIN sizes sa ON sa.id = c.id_a
JOIN sizes sb ON sb.id = c.id_b
WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= 0.5
""")
def ngram_jaccard_dfcap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale variant of the Jaccard similarity join: shingles in
    more than 20 documents are dropped before the inverted-index join
    (hot common shingles contribute k² candidates and ~0 discrimination).
    Jaccard is over the capped universe — identical definition in the
    oracle, so the scale optimization is itself correctness-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                                 min_jaccard=0.5, max_df=20)


@query("dedup_keep_best", oracle=f"""
WITH RECURSIVE {_CLUSTER_CTES},
members AS (SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src),
q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents),
ranked AS (
  SELECT m.cluster_id, m.id, q.quality,
         row_number() OVER (PARTITION BY m.cluster_id
                            ORDER BY q.quality DESC, m.id ASC) AS rn
  FROM members m JOIN q ON q.doc_id = m.id
)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       max(CASE WHEN rn = 1 THEN id END) AS keep_id,
       max(CASE WHEN rn = 1 THEN quality END) AS best_quality
FROM ranked GROUP BY 1
""")
def dedup_keep_best_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection by *quality*, not id: within each duplicate
    cluster keep the member with the highest quality score (ties → lower
    id). This is the policy real corpus dedup uses — survivors should be
    the cleanest copy, not an arbitrary one. Quality is rounded to 6 dp in
    both engines *before* ranking so the selected set is identical.

    The per-cluster winner is a PACKED arg-min, not a row_number
    window: quality is a 6-dp value in [0, 1], so (1e6 − q·1e6) fits
    20 bits and the doc id takes the low 42 — min() over one BIGINT
    selects (max quality, min id) through a HashAggregate fused with
    the member count, where the window needed its own per-cluster sort
    pass (the nearest_neighbor trick; decode is exact because
    round_port's k/1e6 division is replayed bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id",
                                  n=3, min_jaccard=0.5, auto_cap=True)
    # checkpoint: members feeds BOTH the semi-join and the final join —
    # without it the whole jaccard+clustering pipeline runs twice
    members = (D.duplicate_clusters(pairs, small_graph_edges=2_000_000)
               .select("id", "cluster_id").localCheckpoint())
    # broadcast only when the member set is provably small (same
    # size-based gate as the clustering arm choice); above it the set
    # is unbounded on dup-heavy corpora and a forced broadcast can OOM
    # — let AQE pick the join strategy there
    _hint = (F.broadcast if members.count() <= 2_000_000
             else (lambda d: d))
    # score only CLUSTER MEMBERS: the quality pass (regex + stopword
    # scans over full text) is the expensive projection, and only docs
    # that have a duplicate need ranking — the semi join runs before
    # the scoring so the corpus-minus-duplicates majority never pays it
    member_docs = docs.join(
        _hint(members.select(F.col("id").alias("doc_id"))),
        "doc_id", "left_semi")
    quality = (TX.quality_score(member_docs, "text")
               .select(F.col("doc_id").alias("id"),
                       round_port("quality_score").alias("quality")))
    key = (F.round((F.lit(1.0) - F.col("quality")) * 1_000_000)
            .cast("long") * F.lit(1 << 42) + F.col("id"))
    return (_hint(members).join(quality, "id")
            .groupBy("cluster_id")
            .agg(F.count("*").alias("n_members"),
                 F.min(key).alias("__k"))
            .select("cluster_id", "n_members",
                    (F.col("__k") % (1 << 42)).alias("keep_id"),
                    ((F.lit(1_000_000) - F.shiftright(F.col("__k"), 42))
                     / 1_000_000 + F.lit(0.0)).alias("best_quality")))


@query("text_contamination", oracle=f"""
WITH {_SHINGLES_CTE.strip()},
corpus AS (SELECT DISTINCT shingle FROM ds WHERE id % 97 <> 0),
bench AS (SELECT * FROM ds WHERE id % 97 = 0),
per AS (SELECT id, count(*) AS n_shingles FROM bench GROUP BY 1),
hits AS (SELECT b.id, count(*) AS n_hit
         FROM bench b JOIN corpus c USING (shingle) GROUP BY 1)
SELECT p.id AS doc_id, p.n_shingles, COALESCE(h.n_hit, 0) AS n_hit,
       round(COALESCE(h.n_hit, 0) / p.n_shingles, 9) AS contamination
FROM per p LEFT JOIN hits h ON p.id = h.id
""")
def contamination_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination: every ~97th document plays the held-out
    benchmark; its 3-gram shingles probe the rest of the corpus via the
    inverted-index semi join (`operators/dedup.contamination_check`)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return D.contamination_check(corpus, bench, "text", "doc_id", n=3)


_REPORT_ORACLE = f"""
WITH per AS (
  SELECT doc_id, source, lang, md5(text) AS fp, len({_W}) AS n_words,
         {{quality}} AS quality
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_texts,
       round((1.0 - count(DISTINCT fp) / count(*)) * 1000000)
         / 1000000.0 AS dup_rate,
       {sql_exact_avg('quality', 6)} AS avg_quality,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM per GROUP BY source
"""


@query("corpus_source_report",
       oracle=_REPORT_ORACLE.replace("{quality}", _QUALITY_SQL))
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline dashboard: per-source document/word counts, exact-dup
    rate (distinct content fingerprints), language spread, and mean
    quality — one scan plus one grouped aggregate with exact
    (partition-order-invariant) numerators. The roll-up a data-curation
    team reads before every mix decision."""
    docs = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(docs, "text")
    return (q.select("source", "lang", F.md5("text").alias("fp"),
                     F.size(TX.words("text")).alias("n_words"),
                     round_port("quality_score").alias("quality"))
             .groupBy("source")
             .agg(F.count("*").alias("n_docs"),
                  F.sum("n_words").alias("n_words"),
                  F.countDistinct("fp").alias("n_distinct_texts"),
                  round_port(F.lit(1.0)
                             - F.countDistinct("fp") / F.count("*"))
                   .alias("dup_rate"),
                  exact_avg("quality", 6).alias("avg_quality"),
                  F.countDistinct("lang").alias("n_langs")))


@query("text_segment_dedup", oracle=f"""
WITH w AS (SELECT doc_id, {_W} AS w FROM documents),
segs AS (
  SELECT doc_id,
         unnest(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS seg_idx,
         unnest(list_transform(range(CAST(ceil(len(w) / 10.0) AS BIGINT)),
                i -> array_to_string(w[i*10 + 1 : i*10 + 10], ' '))) AS seg
  FROM w WHERE len(w) >= 1
),
kept AS (
  SELECT doc_id, seg_idx, seg FROM segs
  QUALIFY row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1
),
tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY 1),
ked AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
        FROM kept GROUP BY 1)
SELECT t.doc_id, t.n_segs, COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.text_dedup, '') AS text_dedup
FROM tot t LEFT JOIN ked k USING (doc_id)
""")
def segment_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide segment dedup: 10-word windows, keep the
    globally-first occurrence of each distinct segment, reassemble the
    documents (`operators/dedup.segment_dedup`). The scalable stand-in
    for exact-substring dedup: bounded explode, two uniform-key
    shuffles, no pairwise comparison anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return D.segment_dedup(docs, "text", "doc_id", seg_words=10)


@query("text_contamination_bloom", oracle=f"""
WITH {_SHINGLES_CTE.strip()},
corpus AS (SELECT DISTINCT shingle FROM ds WHERE id % 97 <> 0),
bench AS (SELECT * FROM ds WHERE id % 97 = 0),
per AS (SELECT id, count(*) AS n_shingles FROM bench GROUP BY 1),
hits AS (SELECT b.id, count(*) AS n_hit
         FROM bench b JOIN corpus c USING (shingle) GROUP BY 1)
SELECT p.id AS doc_id, p.n_shingles, COALESCE(h.n_hit, 0) AS n_hit,
       round(COALESCE(h.n_hit, 0) / p.n_shingles, 9) AS contamination
FROM per p LEFT JOIN hits h ON p.id = h.id
""")
def contamination_bloom_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contamination scan's large-benchmark path: a fixed-size Bloom
    bitmap (built distributed, probed via broadcast hash joins inside the
    corpus scan stage) prunes corpus shingles map-side before the exact
    confirm — identical results to `text_contamination` (bloom prune +
    exact confirm ≡ exact semi join), so both share one oracle. The
    corpus — the 100 TB side at scale — is never shuffled in full under
    either plan; this variant removes the need to broadcast the exact
    benchmark shingle set."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return D.contamination_check_bloom(corpus, bench, "text", "doc_id", n=3)


@query("text_chunk_windows", oracle=f"""
WITH w AS (SELECT doc_id, {_W} AS w FROM documents),
starts AS (
  SELECT doc_id, w,
         unnest(list_transform(range(1, len(w) + 1, 24),
                               (s, i) -> {{'s': s, 'idx': i - 1}})) AS st
  FROM w WHERE len(w) >= 1
)
SELECT doc_id, CAST(st['idx'] AS BIGINT) AS chunk_idx,
       CAST(len(w[st['s'] : st['s'] + 31]) AS BIGINT) AS n_words,
       array_to_string(w[st['s'] : st['s'] + 31], ' ') AS chunk_text
FROM starts
""")
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (size 32, stride 24 → 8-word overlap):
    the context-window splitter for training/RAG ingestion
    (`operators/text.chunk_text`). One explode, no shuffle; the oracle
    re-derives windows via DuckDB list slicing."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.chunk_text(docs, "text", "doc_id", chunk_size=32, stride=24)


@query("text_vocabulary", oracle=f"""
WITH tokens AS (
  SELECT doc_id, unnest({_W}) AS term FROM documents
), nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
v AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tokens GROUP BY 1
)
SELECT term, tf, df,
       CAST(row_number() OVER (ORDER BY tf DESC, term) AS INTEGER) AS rank
FROM v, nd
WHERE df >= 2 AND df <= CAST(0.5 * nd.n AS BIGINT)
ORDER BY tf DESC, term LIMIT 100
""")
def vocabulary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (heavy hitters) with the classic min_df/max_df
    pruning knobs and a deterministic top-100
    (`operators/text.vocabulary`): tf and df come out of ONE aggregation
    over the exploded tokens; max_df drops stopword-like terms in over
    half the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.vocabulary(docs, "text", "doc_id",
                        min_df=2, max_df_frac=0.5, top_k=100)
    return out.withColumn("rank", F.col("rank").cast("int"))


@query("text_tfidf_top", oracle=f"""
WITH tokens AS (
  SELECT doc_id, unnest({_W}) AS term FROM documents
), nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokens GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * (ln((nd.n + 1.0) / (d.df + 1)) + 1) AS tfidf
  FROM tf t JOIN dfreq d USING (term), nd
)
SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf,
       CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= 3
""")
def tfidf_top_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smooth idf, scikit-learn
    formulation) — per-(doc, term) agg, broadcast df join, per-doc
    ranking window (`operators/text.tfidf_top_terms`)."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.tfidf_top_terms(docs, "text", "doc_id", k=3, min_df=1)
    return out.select("doc_id", "term", "tf", "df",
                      F.round("tfidf", 6).alias("tfidf"),
                      F.col("rank").cast("int").alias("rank"))


@query("text_clean_normalize", oracle="""
WITH l AS (
  SELECT doc_id,
         list_transform(string_split(text, chr(10)),
                        x -> trim(regexp_replace(x, '\\s+', ' ', 'g'))) AS lines
  FROM documents
), k AS (
  SELECT doc_id, lines,
         list_filter(lines, x -> length(x) > 0
                     AND len(string_split(x, ' ')) >= 3) AS kept
  FROM l
)
SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean,
       CAST(len(lines) AS INTEGER) AS n_lines,
       CAST(len(kept) AS INTEGER) AS n_lines_kept
FROM k
""")
def clean_normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line cleaning (`operators/text.clean_text`) in
    whitespace-normalization mode (the corpus is single-line, so the
    terminal-punctuation rule is exercised in test_extensions instead):
    per-row array HOFs, shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.clean_text(docs, "text", min_line_words=3,
                        require_terminal_punct=False, alias="text_clean")
    return out.select("doc_id", "text_clean", "n_lines", "n_lines_kept")


_ENTROPY_SQL = """round(-list_sum(list_transform(
         list_sort(list_distinct(regexp_extract_all(text, '[\\s\\S]'))),
         c -> (len(list_filter(regexp_extract_all(text, '[\\s\\S]'), x -> x = c))
               / len(regexp_extract_all(text, '[\\s\\S]')))
              * ln(len(list_filter(regexp_extract_all(text, '[\\s\\S]'), x -> x = c))
                   / len(regexp_extract_all(text, '[\\s\\S]'))))), 6)"""


@query("text_char_entropy", oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[\\s\\S]')) AS INTEGER) AS n_chars,
       CAST(len(list_distinct(regexp_extract_all(text, '[\\s\\S]'))) AS INTEGER)
         AS n_distinct_chars,
       {_ENTROPY_SQL} AS char_entropy
FROM documents
""")
def char_entropy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy
    (`operators/text.char_entropy`) — shuffle-free HOF histogram; the
    sorted distinct list pins the fold order so both engines sum
    identical terms in identical order."""
    # _spread: the sf0.1 documents table scans as ONE row group -> one
    # task, serializing the per-char fold; rebalancing the raw rows
    # first lets every slot run it (the contamination-scan fix)
    docs = TX._spread(load_table(spark, sf_dir, "documents"))
    out = TX.char_entropy(docs, "text")
    return out.select("doc_id", "n_chars", "n_distinct_chars",
                      F.round("char_entropy", 6).alias("char_entropy"))


@query("text_keep_filter", oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(len({_W}) AS BIGINT) AS n_words,
         {_QUALITY_SQL} AS q,
         {_ENTROPY_SQL} AS ent
  FROM documents
)
SELECT doc_id, n_words,
       (q >= 0.49 AND n_words BETWEEN 25 AND 90 AND ent >= 2.8) AS keep,
       coalesce(array_to_string(list_filter(
           [CASE WHEN q < 0.49 THEN 'low_quality' END,
            CASE WHEN n_words < 25 THEN 'too_short' END,
            CASE WHEN n_words > 90 THEN 'too_long' END,
            CASE WHEN ent < 2.8 THEN 'low_entropy' END],
           x -> x IS NOT NULL), ','), '') AS reasons
FROM m
""")
def keep_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop gate — the decision every training-data
    pipeline makes per document, composed from the engine's own quality
    blend, token counting and char entropy, with an auditable comma-joined
    reason list (kept scalar so every comparator handles it). Both engines compare the *round-6* metric values, so the
    threshold comparisons are bit-identical (raw-float thresholding
    across engines would be a parity trap)."""
    docs = TX._spread(load_table(spark, sf_dir, "documents"))
    m = (TX.char_entropy(TX.quality_score(docs, "text"), "text")
           .withColumn("__nw", F.size(TX.words("text")).cast("long")))
    q = round_port("quality_score")
    ent = F.round("char_entropy", 6)
    n_words = F.col("__nw")
    reasons = F.filter(F.array(
        F.when(q < 0.49, F.lit("low_quality")),
        F.when(n_words < 25, F.lit("too_short")),
        F.when(n_words > 90, F.lit("too_long")),
        F.when(ent < 2.8, F.lit("low_entropy"))), lambda x: x.isNotNull())
    reasons = F.array_join(reasons, ",")
    keep = ((q >= 0.49) & n_words.between(25, 90) & (ent >= 2.8))
    return m.select("doc_id", n_words.alias("n_words"), keep.alias("keep"),
                    reasons.alias("reasons"))


@query("text_unicode_profile", oracle="""
SELECT doc_id,
       length(text) AS n_chars,
       length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS n_non_ascii,
       length(text) - length(regexp_replace(text,
           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')) AS n_control,
       length(text) - length(replace(text, chr(65533), '')) AS n_replacement,
       round((length(text)
              - length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')))
             * 1.0 / greatest(length(text), 1), 6) AS ascii_ratio
FROM documents
""")
def text_unicode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health gate: non-ASCII / control / U+FFFD-replacement
    counts per document (mojibake detection before tokenization).
    Shuffle-free whole-stage-codegen projection."""
    from ..operators.text import unicode_profile
    docs = load_table(spark, sf_dir, "documents")
    return unicode_profile(docs, "text")


@query("text_bpe_pair_counts", oracle=f"""
WITH w AS (
  SELECT unnest({_W}) AS word FROM documents
),
wc AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
pairs AS (
  SELECT unnest(list_transform(range(length(word) - 1),
                               i -> substr(word, CAST(i + 1 AS INTEGER), 2)))
           AS pair,
         n
  FROM wc WHERE length(word) >= 2
),
agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1)
SELECT pair, n_pairs,
       row_number() OVER (ORDER BY n_pairs DESC, pair ASC) AS rank
FROM agg
QUALIFY rank <= 20
""")
def bpe_pair_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training, distributed: count
    adjacent character pairs across the corpus weighted by word
    frequency and rank the top merge candidates. Word counts pre-
    aggregate first (the corpus dedup that makes BPE training feasible
    at scale — pair explosion runs over the VOCABULARY, not the raw
    token stream); one bounded explode, two shuffles."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(TX.words("text")).alias("word"))
              .groupBy("word").agg(F.count("*").alias("n")))
    pair = F.explode(F.transform(
        F.sequence(F.lit(0), F.length("word") - 2),
        lambda i: F.substr(F.col("word"), i + 1, F.lit(2)))).alias("pair")
    agg = (wc.where(F.length("word") >= 2)
             .select(pair, "n")
             .groupBy("pair").agg(F.sum("n").alias("n_pairs")))
    w = Window.orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
    return (agg.withColumn("rank", F.row_number().over(w).cast("long"))
               .where(F.col("rank") <= 20))


@query("text_bigram_lm", oracle=f"""
WITH w AS (SELECT doc_id, {_W} AS w FROM documents WHERE len({_W}) >= 2),
big AS (
  SELECT unnest(list_transform(range(1, len(w)),
                               i -> {{'cur': w[i], 'nxt': w[i + 1]}})) AS p
  FROM w
),
pc AS (SELECT p.cur AS cur, p.nxt AS nxt, count(*) AS c FROM big GROUP BY 1, 2),
cc AS (SELECT cur, SUM(c) AS total FROM pc GROUP BY 1)
SELECT pc.cur, pc.nxt, CAST(pc.c AS BIGINT) AS c,
       round(pc.c / cc.total, 6) AS p_next,
       row_number() OVER (PARTITION BY pc.cur
                          ORDER BY pc.c DESC, pc.nxt ASC) AS rank
FROM pc JOIN cc USING (cur)
QUALIFY rank <= 3
""")
def bigram_lm_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A corpus bigram language model: conditional next-word
    probabilities with the top-3 continuations per word — the
    count-based LM shape (one bounded pair explode, one pair agg, a
    window share + ranking reusing the same partitioning)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ws = (docs.select(TX.words("text").alias("w"))
              .where(F.size("w") >= 2))
    pairs = ws.select(F.explode(F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.struct(F.col("w")[i].alias("cur"),
                           F.col("w")[i + 1].alias("nxt")))).alias("p"))
    pc = (pairs.select(F.col("p.cur").alias("cur"),
                       F.col("p.nxt").alias("nxt"))
               .groupBy("cur", "nxt").agg(F.count("*").alias("c")))
    wt = Window.partitionBy("cur")
    wr = Window.partitionBy("cur").orderBy(F.col("c").desc(),
                                           F.col("nxt").asc())
    return (pc.withColumn("p_next", F.round(F.col("c")
                                            / F.sum("c").over(wt), 6))
              .withColumn("rank", F.row_number().over(wr).cast("long"))
              .where(F.col("rank") <= 3)
              .select("cur", "nxt", "c", "p_next", "rank"))


@query("corpus_source_overlap", oracle=f"""
WITH words AS (SELECT source, {_W} AS w FROM documents),
ds AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM words WHERE len(w) >= 3
),
tot AS (SELECT source, count(*) AS n FROM ds GROUP BY 1),
sh AS (SELECT a.source AS source_a, b.source AS source_b,
              count(*) AS n_shared
       FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.source < b.source
       GROUP BY 1, 2)
SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
       round(n_shared / least(ta.n, tb.n), 9) AS overlap
FROM sh
JOIN tot ta ON sh.source_a = ta.source
JOIN tot tb ON sh.source_b = tb.source
""")
def source_overlap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair content overlap audit
    (`operators/dedup.source_overlap_matrix`): distinct 3-gram shingles
    shared between every pair of corpus sources plus the overlap
    coefficient — the mirrored-feed detector. The engine never joins
    source-to-source: one shingle-keyed agg collects each shingle's
    source set (≤ |sources|) and explodes ordered pairs map-side; the
    oracle re-derives the same matrix with a naive self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return D.source_overlap_matrix(docs, "text", "source")


@query("corpus_source_overlap_dfcap", oracle=f"""
WITH words AS (SELECT doc_id, source, {_W} AS w FROM documents),
ds0 AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM words WHERE len(w) >= 3
),
hot AS (SELECT shingle FROM ds0 GROUP BY shingle
        HAVING count(DISTINCT doc_id) > 20),
ds AS (SELECT DISTINCT source, shingle FROM ds0
       WHERE shingle NOT IN (SELECT shingle FROM hot)),
tot AS (SELECT source, count(*) AS n FROM ds GROUP BY 1),
sh AS (SELECT a.source AS source_a, b.source AS source_b,
              count(*) AS n_shared
       FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.source < b.source
       GROUP BY 1, 2)
SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
       round(n_shared / least(ta.n, tb.n), 9) AS overlap
FROM sh
JOIN tot ta ON sh.source_a = ta.source
JOIN tot tb ON sh.source_b = tb.source
""")
def source_overlap_dfcap_documents(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Load-bounded source-overlap audit: 3-gram shingles present in
    more than 20 documents (corpus boilerplate — the hot keys that
    make the uncapped arm the most load-sensitive headline query) are
    dropped via a broadcast anti-join BEFORE the shingle-keyed set
    aggregation; overlap is over the capped universe, and the oracle
    re-derives the identical definition so the scale optimization is
    itself correctness-checked. Same documented-variant contract as
    `dedup_ngram_jaccard_dfcap` (queries/text_dedup.py:742)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.source_overlap_matrix(docs, "text", "source",
                                   max_df=20, id_col="doc_id")


@query("text_perplexity", oracle=f"""
WITH w AS (SELECT doc_id, {_W} AS w FROM documents),
vocab AS (SELECT count(DISTINCT word) AS v
          FROM (SELECT unnest(w) AS word FROM w)),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> {{'cur': w[i], 'nxt': w[i + 1]}})) AS p
  FROM w WHERE len(w) >= 2
),
b2 AS (SELECT doc_id, p.cur AS cur, p.nxt AS nxt FROM big),
pc AS (SELECT cur, nxt, count(*) AS c FROM b2 GROUP BY 1, 2),
cc AS (SELECT cur, SUM(c) AS total FROM pc GROUP BY 1),
scored AS (
  SELECT b2.doc_id,
         CAST(round(ln((pc.c + 1.0) / (cc.total + vocab.v)) * 1000000)
              AS BIGINT) AS lp
  FROM b2 JOIN pc USING (cur, nxt) JOIN cc USING (cur), vocab
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(lp) AS BIGINT) AS sum_logp_micro
  FROM scored GROUP BY 1
)
SELECT doc_id, n_bigrams, sum_logp_micro,
       round(-sum_logp_micro / CAST(n_bigrams AS DOUBLE)) / 1000000.0
         AS avg_nll,
       round(-sum_logp_micro / CAST(n_bigrams AS DOUBLE)) / 1000000.0
         <= 3.4 AS keep
FROM agg
""")
def perplexity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality tiering (`operators/text.lm_perplexity`):
    an add-one bigram LM trained on the corpus scores every document's
    average negative log-likelihood; fluent documents (low NLL) get the
    keep flag. Per-bigram log-probs round to integer micro-nats before
    summing, so the document scores are partition-order exact; the LM
    tables are vocabulary-sized equi-join sides, never the token
    stream."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.lm_perplexity(docs, "text", "doc_id")


@query("text_nfc_normalize", oracle="""
WITH salted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've'
                      ELSE '' END AS t
  FROM documents
),
norm AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM salted)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS n_chars_before,
       CAST(length(nt) AS BIGINT) AS n_chars_after,
       t <> nt AS changed,
       substr(nt, greatest(length(nt) - 15, 1), 16) AS norm_tail
FROM norm
""")
def nfc_normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (`operators/text.nfc_normalize`) —
    decomposed accent sequences (e + U+0301) collapse to their
    composed forms so downstream exact/fuzzy dedup hashes agree. The
    testdata corpus is ASCII, which would make this check vacuous, so
    every third document is salted with decomposed sequences in BOTH
    engines (the seeded-twins discipline); DuckDB's `nfc_normalize`
    re-derives the kernel's `unicodedata.normalize("NFC", ...)` — the
    same Unicode algorithm — and the normalized tail, char counts and
    changed flags are value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    # DECOMPOSED sequences (e + U+0301, i + U+0308) as explicit escapes
    # (a source-normalizing editor would silently compose raw chars),
    # matching the oracle's chr() construction — NFC must change them
    salt = F.when(F.col("doc_id") % 3 == 0,
                  F.lit(" cafe\u0301 nai\u0308ve")).otherwise(F.lit(""))
    salted = docs.select("doc_id",
                         F.concat(F.col("text"), salt).alias("t"))
    out = TX.nfc_normalize(salted, "t")
    tail = F.col("t_norm").substr(
        F.greatest(F.length("t_norm") - 15, F.lit(1)), F.lit(16))
    return out.select("doc_id", "n_chars_before", "n_chars_after",
                      "changed", tail.alias("norm_tail"))


@query("text_bpe_train", oracle=None)  # iterative, data-dependent merges —
# non-SQL-expressible (RE2 oracles can't replay the left-to-right merge
# pass); proven merge-for-merge identical to a sequential reference BPE
# in tests/test_extensions.py::test_bpe_train_matches_reference_impl
def bpe_train_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (`operators/text.bpe_train`):
    12 merge rounds over the frequency-weighted vocabulary; returns the
    ordered merge table. One bounded-explode aggregation plus a
    one-row driver scalar per round — the iterative-operator contract
    of `duplicate_clusters`. The adaptive single-task arm is armed
    (the corpus vocabulary fits one task, where per-round scheduling
    floor dominates); the batched distributed rounds stay pinned
    merge-for-merge by test_bpe_train_matches_reference_impl."""
    docs = load_table(spark, sf_dir, "documents")
    merges, _ = TX.bpe_train(docs, "text", n_merges=12,
                             small_vocab_words=1_000_000)
    rows = [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank long, left string, right string, merged string")


# Pinned tokenizer for the encode query: the 12 merges bpe_train
# produces on the sf0.01 documents corpus, frozen as a constant —
# inference in production always applies a FIXED published merge list,
# and a fixed list is what makes the encode path SQL-oracle-checkable
# (training itself stays covered by text_bpe_train + the sequential-
# equality test).
_BPE_PINNED_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"),
]


def _bpe_encode_oracle(merges) -> str:
    """DuckDB replay of the left-to-right non-overlapping merge pass:
    each word becomes sentinel-delimited symbols ␂c␃␂c␃…, and each
    merge (a,b) is one string `replace` of ␂a␃␂b␃ → ␂ab␃ — replace
    scans left-to-right and continues AFTER the replacement, exactly
    the BPE pass's i += 2. Sentinels make token boundaries exact, so a
    pattern can never match inside a longer symbol."""
    s = "regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g')"
    for a, b in merges:
        pat = f"chr(2)||'{a}'||chr(3)||chr(2)||'{b}'||chr(3)"
        rep = f"chr(2)||'{a}{b}'||chr(3)"
        s = f"replace({s}, {pat}, {rep})"
    return f"""
WITH enc AS (
  SELECT doc_id,
         flatten(list_transform(
           list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                             '[^a-z0-9]+'),
                       x -> x <> ''),
           w -> list_transform(string_split({s}, chr(3) || chr(2)),
                               t -> trim(t, chr(2) || chr(3)))
         )) AS tokens
  FROM documents
)
SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
       array_to_string(tokens[1:12], '|') AS tokens_head
FROM enc
"""


@query("text_bpe_encode", oracle=_bpe_encode_oracle(_BPE_PINNED_MERGES))
def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a pinned merge list
    (`operators/text.bpe_encode`) — the inference side of the
    tokenizer: per-batch word memoization keeps the cost near the
    vocabulary size, and the output is the training-ready token
    stream. The oracle replays the exact merge passes as sentinel-
    delimited string rewrites, so tokens are value-checked
    end-to-end. tokens_head is emitted '|'-joined (tokens are
    [a-z0-9]+, so the delimiter is unambiguous): the driver's
    canonicalizer cannot sort raw array cells (pandas sort_values →
    "unhashable type: 'list'")."""
    docs = load_table(spark, sf_dir, "documents")
    return (TX.bpe_encode(docs, "text", _BPE_PINNED_MERGES)
            .select("doc_id", "n_tokens",
                    F.concat_ws("|", F.slice("tokens", 1, 12))
                     .alias("tokens_head")))


@query("er_customer_clusters", oracle="""
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
   AND levenshtein(a.c_name, b.c_name) <= 2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT DISTINCT id_a, id_a FROM pairs
  UNION SELECT DISTINCT id_b, id_b FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS id, min(dst) AS cluster_id,
       (src = min(dst)) AS is_canonical
FROM reach GROUP BY src
""")
def er_customer_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on the customer table: blocking on
    (nation, market segment), name edit-distance ≤ 2 links, entity ids
    via `operators/dedup.blocked_entity_clusters` — links never cross
    a blocking group, so connected components decompose into
    independent per-block union-finds fused onto the blocking join's
    own partitioning (ONE shuffle total, vs O(log n) iterative rounds
    for the general-topology `duplicate_clusters_star`).
    Closure-checked by a recursive-CTE oracle; proven equal to the
    iterative cluster operators in tests."""
    cust = load_table(spark, sf_dir, "customer")
    return D.blocked_entity_clusters(cust, "c_custkey", "c_name",
                                     ["c_nationkey", "c_mktsegment"],
                                     max_distance=2)


@query("dedup_minhash_eval", oracle=f"""
WITH {_shingles_cte(_doc_eval_where(_MINHASH_EVAL_FRACTION)).strip()},
sizes AS (SELECT id, count(*) AS n_sh FROM ds GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
),
exact AS (
  SELECT c.id_a, c.id_b
  FROM common c
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
  WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= 0.5
),
sig AS (SELECT id, min(md5('0:' || shingle)) AS mh0,
         min(md5('1:' || shingle)) AS mh1,
         min(md5('2:' || shingle)) AS mh2,
         min(md5('3:' || shingle)) AS mh3,
         min(md5('4:' || shingle)) AS mh4,
         min(md5('5:' || shingle)) AS mh5,
         min(md5('6:' || shingle)) AS mh6,
         min(md5('7:' || shingle)) AS mh7,
         min(md5('8:' || shingle)) AS mh8,
         min(md5('9:' || shingle)) AS mh9,
         min(md5('10:' || shingle)) AS mh10,
         min(md5('11:' || shingle)) AS mh11 FROM ds GROUP BY id),
keys AS (SELECT id, md5(mh0 || '|' || mh1 || '|' || mh2) AS key0, md5(mh3 || '|' || mh4 || '|' || mh5) AS key1, md5(mh6 || '|' || mh7 || '|' || mh8) AS key2, md5(mh9 || '|' || mh10 || '|' || mh11) AS key3 FROM sig),
banded AS (SELECT id, 0 AS band, key0 AS key FROM keys
UNION ALL
SELECT id, 1 AS band, key1 AS key FROM keys
UNION ALL
SELECT id, 2 AS band, key2 AS key FROM keys
UNION ALL
SELECT id, 3 AS band, key3 AS key FROM keys),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
approx AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sig sa ON sa.id = c.id_a
  JOIN sig sb ON sb.id = c.id_b
  WHERE ((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh8 = sb.mh8 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh9 = sb.mh9 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh10 = sb.mh10 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh11 = sb.mh11 THEN 1 ELSE 0 END)) / 12.0 >= 0.5
)
SELECT
  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
  CAST((SELECT count(*) FROM approx) AS BIGINT) AS n_approx,
  CAST((SELECT count(*) FROM exact e JOIN approx a
        ON e.id_a = a.id_a AND e.id_b = a.id_b) AS BIGINT) AS n_true_pos,
  {sql_round_port('''(SELECT count(*) FROM exact e JOIN approx a
        ON e.id_a = a.id_a AND e.id_b = a.id_b)
        / greatest((SELECT count(*) FROM exact), 1)''')} AS recall,
  {sql_round_port('''(SELECT count(*) FROM exact e JOIN approx a
        ON e.id_a = a.id_a AND e.id_b = a.id_b)
        / greatest((SELECT count(*) FROM approx), 1)''')} AS precision
""")
def minhash_eval_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup tuning dashboard: the MinHash pipeline's precision/recall
    against the exact Jaccard ≥ 0.5 pair set on the same corpus — the
    measurement that justifies a (num_perm, bands) choice before a
    production run. Both pipelines are deterministic, so even this
    meta-evaluation hash-matches an oracle.

    Runs on a deterministic 40% md5-bucket sample of the corpus
    (`deterministic_sample`, salt 'eval', mirrored into the oracle's
    WHERE): the exact-Jaccard ground truth is quadratic-shaped even
    behind the inverted index, so a tuning measurement belongs on a
    sample — the content-independent hash keeps precision/recall
    unbiased while bounding cost at any corpus scale."""
    docs = SAMP.deterministic_sample(
        load_table(spark, sf_dir, "documents"), "doc_id",
        _MINHASH_EVAL_FRACTION, salt="eval")
    exact = (D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                                   min_jaccard=0.5)
             .select("id_a", "id_b", F.lit(1).alias("__e")))
    approx = (D.minhash_pairs(docs, "text", "doc_id", num_perm=12,
                              bands=4, min_est=0.5)
              .select("id_a", "id_b", F.lit(1).alias("__a")))
    # ONE job: full-outer join the two pair sets and count flags in a
    # single aggregate — three separate .count() actions would execute
    # the exact pipeline twice and the approx pipeline twice (the
    # true-positive join recomputes both), doubling the dominant
    # shingle-explode stages
    confusion = (exact.join(approx, ["id_a", "id_b"], "full_outer")
                 .agg(F.count("__e").alias("n_exact"),
                      F.count("__a").alias("n_approx"),
                      F.count(F.when(F.col("__e").isNotNull()
                                     & F.col("__a").isNotNull(), 1))
                       .alias("n_true_pos")))
    return confusion.select(
        "n_exact", "n_approx", "n_true_pos",
        round_port(F.col("n_true_pos")
                   / F.greatest(F.col("n_exact"), F.lit(1)))
        .alias("recall"),
        round_port(F.col("n_true_pos")
                   / F.greatest(F.col("n_approx"), F.lit(1)))
        .alias("precision"))


def _sql_ngram(n: int) -> str:
    if n == 1:
        return "w"
    joined = " || ' ' || ".join(f"w[i + {j}]" for j in range(n))
    return (f"CASE WHEN len(w) >= {n} THEN "
            f"list_transform(range(1, len(w) - {n - 2}), i -> {joined}) "
            f"ELSE [] END")


def _diversity_cte(n: int) -> str:
    return f"""d{n} AS (
  SELECT source, CAST(count(*) AS BIGINT) AS total_{n},
         CAST(count(DISTINCT g) AS BIGINT) AS distinct_{n},
         round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 9) AS ttr_{n}
  FROM (SELECT source, unnest({_sql_ngram(n)}) AS g
        FROM (SELECT source, {_W} AS w FROM documents))
  GROUP BY 1
)"""


@query("text_lexical_diversity", oracle=f"""
WITH {_diversity_cte(1)}, {_diversity_cte(2)}, {_diversity_cte(3)},
g AS (SELECT DISTINCT source FROM documents)
SELECT g.source AS "group",
       coalesce(total_1, 0) AS total_1,
       coalesce(distinct_1, 0) AS distinct_1, ttr_1,
       coalesce(total_2, 0) AS total_2,
       coalesce(distinct_2, 0) AS distinct_2, ttr_2,
       coalesce(total_3, 0) AS total_3,
       coalesce(distinct_3, 0) AS distinct_3, ttr_3
FROM g LEFT JOIN d1 ON g.source = d1.source
       LEFT JOIN d2 ON g.source = d2.source
       LEFT JOIN d3 ON g.source = d3.source
""")
def lexical_diversity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n type-token ratios per source
    (`operators/text.lexical_diversity`) — the template/boilerplate
    detector: one uniform-key aggregation per n joined on the tiny
    source dimension."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.lexical_diversity(docs, "text", "source")


@query("text_tokenizer_fertility", oracle=f"""
WITH per AS (
  SELECT lang,
         len({_W}) AS n_words,
         list_sum(list_transform({_W}, x -> length(x))) AS n_word_chars,
         len(regexp_extract_all(lower(text), '{TX.BPE_PIECE}')) AS n_bpe
  FROM documents
)
SELECT lang,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(COALESCE(n_word_chars, 0)) AS BIGINT) AS n_word_chars,
       CAST(SUM(n_bpe) AS BIGINT) AS n_tokens,
       round(SUM(n_bpe) / CAST(SUM(n_words) AS DOUBLE), 6) AS fertility,
       round(SUM(COALESCE(n_word_chars, 0))
             / CAST(SUM(n_bpe) AS DOUBLE), 6) AS chars_per_token
FROM per GROUP BY 1
""")
def tokenizer_fertility_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language (sub-word tokens per word, chars
    per token) — the multilingual tokenizer-efficiency diagnostic
    (high-fertility languages burn context window). Pure per-row
    counting + one grouped exact-integer aggregation; no explode."""
    docs = load_table(spark, sf_dir, "documents")
    w = TX.words("text")
    per = docs.select(
        "lang",
        F.size(w).alias("n_words"),
        F.coalesce(F.aggregate(TX.words("text"),
                               F.lit(0),
                               lambda a, x: a + F.length(x)),
                   F.lit(0)).alias("n_word_chars"),
        F.size(F.regexp_extract_all(F.lower("text"),
                                    F.lit(TX.BPE_PIECE), 0)).alias("n_bpe"))
    return (per.groupBy("lang")
            .agg(F.sum("n_words").alias("n_words"),
                 F.sum("n_word_chars").cast("long").alias("n_word_chars"),
                 F.sum("n_bpe").alias("n_tokens"),
                 F.round(F.sum("n_bpe")
                         / F.sum("n_words").cast("double"), 6)
                  .alias("fertility"),
                 F.round(F.sum("n_word_chars")
                         / F.sum("n_bpe").cast("double"), 6)
                  .alias("chars_per_token")))


@query("text_zipf_slope", oracle=f"""
WITH tokens AS (SELECT unnest({_W}) AS term FROM documents),
v AS (SELECT term, count(*) AS tf FROM tokens GROUP BY 1),
ranked AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, term ASC) AS rank
  FROM v QUALIFY rank <= 100
)
SELECT round(regr_slope(ln(CAST(tf AS DOUBLE)),
                        ln(CAST(rank AS DOUBLE))), 6) AS zipf_slope,
       round(regr_r2(ln(CAST(tf AS DOUBLE)),
                     ln(CAST(rank AS DOUBLE))), 6) AS r2,
       CAST(count(*) AS BIGINT) AS n_terms
FROM ranked
""")
def zipf_slope_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope over the top-100 vocabulary — natural
    corpora sit near −1; template spam and shuffled/synthetic text
    drift off. Heavy-hitter agg (deterministic tf/term ranking) + one
    co-moment regression aggregate, single row out."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(TX.words("text")).alias("term"))
    v = tokens.groupBy("term").agg(F.count("*").alias("tf"))
    w = Window.orderBy(F.col("tf").desc(), F.col("term").asc())
    ranked = (v.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= 100))
    ln_tf = F.log(F.col("tf").cast("double"))
    ln_rank = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.round(F.regr_slope(ln_tf, ln_rank), 6).alias("zipf_slope"),
        F.round(F.regr_r2(ln_tf, ln_rank), 6).alias("r2"),
        F.count("*").alias("n_terms"))


@query("quality_calibrated_rank", oracle=f"""
WITH q AS (
  SELECT doc_id, source, {_QUALITY_SQL} AS q
  FROM documents
)
SELECT doc_id, source, q,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY q ASC, doc_id ASC)
             * 1000000000) / 1000000000.0 AS q_calibrated,
       round(percent_rank() OVER (ORDER BY q ASC, doc_id ASC)
             * 1000000000) / 1000000000.0 AS q_global
FROM q
""")
def quality_calibrated_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality calibration (the FineWeb-style fix for
    cross-domain threshold bias): each document's heuristic quality
    score becomes its percent-rank WITHIN its source, so one keep
    threshold means the same thing for every feed regardless of that
    feed's score distribution; the global rank rides along for
    comparison. One scan + two windows (the per-source one reuses the
    source shuffle); both engines rank the round-6 score with a
    deterministic (q, id) tie-break. Shares `_QUALITY_SQL` with
    text_quality so the blends cannot drift."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = (TX.quality_score(docs, "text")
         .select("doc_id", "source",
                 round_port("quality_score").alias("q")))
    w_src = (Window.partitionBy("source")
                   .orderBy(F.col("q").asc(), F.col("doc_id").asc()))
    w_all = Window.orderBy(F.col("q").asc(), F.col("doc_id").asc())
    return q.select(
        "doc_id", "source", "q",
        round_port(F.percent_rank().over(w_src), 9).alias("q_calibrated"),
        round_port(F.percent_rank().over(w_all), 9).alias("q_global"))


# --- URL-level dedup (round 10): the crawl-frontier canonical key ------

_URL_SYNTH_SPARK = """
CASE doc_id % 6
  WHEN 0 THEN 'HTTPS://WWW.EXAMPLE' || CAST(doc_id % 5 AS STRING)
           || '.COM:443/docs//' || CAST(doc_id % 7 AS STRING)
           || '/?utm_source=feed&b=' || CAST(doc_id % 3 AS STRING)
           || '&a=' || CAST(doc_id % 4 AS STRING)
           || '&fbclid=x' || CAST(doc_id AS STRING) || '#frag'
  WHEN 1 THEN 'https://example' || CAST(doc_id % 5 AS STRING)
           || '.com/docs/' || CAST(doc_id % 7 AS STRING)
           || '?a=' || CAST(doc_id % 4 AS STRING)
           || '&b=' || CAST(doc_id % 3 AS STRING)
  WHEN 2 THEN 'http://Example' || CAST(doc_id % 5 AS STRING)
           || '.com:80/'
  WHEN 3 THEN 'http://example' || CAST(doc_id % 5 AS STRING) || '.com'
  WHEN 4 THEN 'https://example' || CAST(doc_id % 5 AS STRING)
           || '.com/p/' || substring(md5(encode(coalesce(text, ''),
                                      'utf-8')), 1, 8) || '/'
  ELSE 'https://sub.example' || CAST(doc_id % 5 AS STRING)
           || '.com/path?ref=tw&id=' || CAST(doc_id AS STRING) || '#s'
END
"""


@query("text_url_canonicalize", oracle="""
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN 'HTTPS://WWW.EXAMPLE' || CAST(doc_id % 5 AS VARCHAR)
                    || '.COM:443/docs//' || CAST(doc_id % 7 AS VARCHAR)
                    || '/?utm_source=feed&b=' || CAST(doc_id % 3 AS VARCHAR)
                    || '&a=' || CAST(doc_id % 4 AS VARCHAR)
                    || '&fbclid=x' || CAST(doc_id AS VARCHAR) || '#frag'
           WHEN 1 THEN 'https://example' || CAST(doc_id % 5 AS VARCHAR)
                    || '.com/docs/' || CAST(doc_id % 7 AS VARCHAR)
                    || '?a=' || CAST(doc_id % 4 AS VARCHAR)
                    || '&b=' || CAST(doc_id % 3 AS VARCHAR)
           WHEN 2 THEN 'http://Example' || CAST(doc_id % 5 AS VARCHAR)
                    || '.com:80/'
           WHEN 3 THEN 'http://example' || CAST(doc_id % 5 AS VARCHAR) || '.com'
           WHEN 4 THEN 'https://example' || CAST(doc_id % 5 AS VARCHAR)
                    || '.com/p/' || substr(md5(coalesce(text, '')), 1, 8) || '/'
           ELSE 'https://sub.example' || CAST(doc_id % 5 AS VARCHAR)
                    || '.com/path?ref=tw&id=' || CAST(doc_id AS VARCHAR) || '#s'
         END AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
         regexp_replace(trim(url), '#.*', '') AS nofrag
  FROM u
),
sp AS (
  SELECT doc_id,
         lower(regexp_extract(nofrag,
               '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         regexp_replace(nofrag,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS rest
  FROM parts
),
hp AS (
  SELECT doc_id, scheme, rest,
         CASE
           WHEN scheme = 'http' THEN regexp_replace(
                lower(regexp_extract(rest, '^([^/?]*)', 1)), ':80$', '')
           WHEN scheme = 'https' THEN regexp_replace(
                lower(regexp_extract(rest, '^([^/?]*)', 1)), ':443$', '')
           ELSE lower(regexp_extract(rest, '^([^/?]*)', 1))
         END AS host0,
         regexp_replace(rest, '^[^/?]*', '') AS pathq
  FROM sp
),
pq AS (
  SELECT doc_id, scheme,
         regexp_replace(host0, '^www\\.', '') AS host,
         regexp_replace(regexp_replace(
             regexp_extract(pathq, '^([^?]*)', 1), '//+', '/', 'g'),
             '(.)/$', '\\1') AS path0,
         regexp_replace(pathq, '^[^?]*\\??', '') AS query
  FROM hp
),
canon AS (
  SELECT doc_id,
         scheme || '://' || host
         || CASE WHEN path0 = '' THEN '/' ELSE path0 END
         || CASE WHEN params = '' THEN '' ELSE '?' || params END
           AS canon_url
  FROM (
    SELECT doc_id, scheme, host, path0,
           -- coalesce: DuckDB's array_to_string of an EMPTY list is
           -- NULL, which would null the whole concatenation
           coalesce(array_to_string(list_sort(list_filter(
               str_split(query, '&'),
               p -> p <> ''
                    AND NOT starts_with(str_split(p, '=')[1], 'utm_')
                    AND NOT list_contains(
                        ['fbclid', 'gclid', 'msclkid', 'ref',
                         'ref_src'], str_split(p, '=')[1]))), '&'), '')
             AS params
    FROM pq
  )
)
SELECT canon_url, min(doc_id) AS keep_doc_id,
       count(*) AS n_fetches
FROM canon GROUP BY 1
""")
def url_canonicalize_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """URL-level crawl dedup end to end: documents render into six
    residue classes of messy-but-equivalent URLs (mixed-case scheme and
    host, www prefixes, default ports, duplicate and trailing slashes,
    fragments, tracking parameters, unsorted query strings — classes 0
    and 1 canonicalize to the SAME url, as do 2 and 3), the
    canonicalizer (`operators/text.canonical_url`, pure JVM-side
    regex/array expressions — no UDF) normalizes them, and `url_dedup`
    keeps min-id + fetch count per canonical key. One hash aggregation;
    the oracle mirrors every normalization step in SQL, so a changed
    regex, an unsorted parameter list, or a dropped equivalence class
    shifts the hash. At 100 TB this key dedups the crawl FRONTIER —
    duplicate fetches are dropped before any payload is hashed."""
    from ..operators.text import url_dedup
    # no _spread (r11, measured 1.24 s vs 0.83 s without at sf0.1): the
    # single-task scan feeds ONE map-side partial aggregation — adding a
    # row shuffle ahead of it costs more than the regex it parallelizes
    # at this volume (contrast crawl_main_content)
    docs = load_table(spark, sf_dir, "documents")
    with_url = docs.withColumn("url", F.expr(_URL_SYNTH_SPARK.strip()))
    return url_dedup(with_url, "url", "doc_id")


# --- main-content extraction (round 10): link-density boilerplate cut --

@query("crawl_main_content", oracle="""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
),
ct AS (
  SELECT doc_id,
         trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g'),
              ' ') AS body
  FROM t
),
parts AS (
  SELECT doc_id, body,
         'Doc ' || CAST(doc_id AS VARCHAR)
           || ' main heading for this page' AS h1
  FROM ct
)
SELECT doc_id,
       -- visible blocks: nav, h1, article text (when non-empty),
       -- aside, footer
       CAST(CASE WHEN body = '' THEN 4 ELSE 5 END AS BIGINT)
         AS n_blocks,
       CAST(CASE WHEN length(body) >= 25 THEN 2 ELSE 1 END AS BIGINT)
         AS n_kept,
       CASE WHEN length(body) >= 25 THEN h1 || ' ' || body
            ELSE h1 END AS main_text
FROM parts
""")
def crawl_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction end to end: documents render into full
    pages — a link-farm ``<nav>``, an ``<h1>`` heading, the article
    text in ``<p>`` (entity-escaped), an ``<aside>`` ad block and a
    link-only ``<footer>`` — and `operators/text.main_content`
    recovers exactly the heading + article by link-density filtering,
    entirely in JVM higher-order functions (split → per-block
    transform with nested regexp_extract_all → filter → join; ZERO
    UDFs, one narrow projection). The oracle re-derives block counts
    and the exact main text from the construction; a broken entity
    round trip, a wrong density ratio, or a block-boundary slip
    shifts every hash."""
    from ..operators.text import _spread, main_content
    # _spread (r11): single-row-group scan = one task; the per-block
    # regexp/HOF pipeline below is the heaviest pure-JVM compute in the
    # suite and parallelizes linearly once the scan is rebalanced
    docs = _spread(load_table(spark, sf_dir, "documents"))
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.coalesce(F.col("text"), F.lit("")),
                             "&", "&amp;"),
            "<", "&lt;"), ">", "&gt;")
    html = F.concat(
        F.lit('<body><nav><a href="/">Home</a> <a href="/a">About'
              '</a> <a href="/c">Contact</a></nav><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit(" main heading for this page</h1><p>"), esc,
        F.lit('</p><aside><a href="/ad">sponsored thing</a></aside>'
              "<footer><a>Privacy</a> <a>Terms</a> · 2024</footer>"
              "</body>"))
    out = docs.select(
        "doc_id", main_content(html).alias("mc"))
    return out.select("doc_id", "mc.n_blocks", "mc.n_kept",
                      "mc.main_text")
