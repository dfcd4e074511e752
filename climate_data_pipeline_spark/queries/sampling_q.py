"""Deterministic split / sample queries (beyond-reference extension).

Both queries verify *assignment*, not just mechanics: the per-split
aggregates (exact counts + exact integer-scaled sums) hash-match only if
every single row landed in the same split in both engines — a stronger
check than comparing split sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum, sql_exact_sum, sql_round_port
from ..operators import sampling as S
from ..registry import query
from ..sources.io import load_table

_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query("train_shard_manifest", oracle=f"""
WITH keyed AS (
  SELECT doc_id, source,
         CAST({S.sql_hash_bucket("doc_id", 8, ":shard")} AS INTEGER) AS shard,
         md5(CAST(doc_id AS VARCHAR) || ':pos') AS okey
  FROM documents
)
SELECT doc_id, source, shard,
       row_number() OVER (PARTITION BY shard
                          ORDER BY okey ASC, doc_id ASC) AS pos
FROM keyed
""")
def train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-training shard manifest: every document gets a
    deterministic (shard, pos) — md5 shard assignment, md5-ordered
    position interleaving sources within the shard
    (`operators/sampling.training_shards`). Full row-level assignment is
    value-checked, so both engines agree on the exact training order."""
    docs = load_table(spark, sf_dir, "documents")
    return (S.training_shards(docs, "doc_id", n_shards=8)
            .select("doc_id", "source", "shard", "pos"))


@query("split_deterministic", oracle=f"""
SELECT {S.sql_split_case("doc_id", _WEIGHTS)} AS split,
       count(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents
GROUP BY 1
""")
def split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split of the documents table by md5 hash
    bucket of the doc id — a narrow per-row map (no shuffle until the
    verification aggregate), stable under any partitioning or cluster
    size, re-derivable by any SQL engine."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.deterministic_split(docs, "doc_id", _WEIGHTS)
    return (out.groupBy("split")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(F.length("text").cast("long")).alias("n_chars"),
                    F.min("doc_id").alias("min_id"),
                    F.max("doc_id").alias("max_id")))


@query("sample_correlated", oracle=f"""
SELECT o_orderstatus,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       {sql_exact_sum("o_totalprice")} AS total_price
FROM orders
WHERE {S.sql_sample_pred("o_custkey", 0.1)}
GROUP BY 1
""")
def sample_orders_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated 10% sample: orders are kept iff their *customer's* hash
    bucket is sampled, so every kept customer appears with their complete
    order history (the standard trick for sampling consistent entity
    subgraphs across fact tables). Pure filter — predicate-pushdown-able,
    no shuffle before the verification aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    sampled = S.deterministic_sample(orders, "o_custkey", 0.1)
    return (sampled.groupBy("o_orderstatus")
                   .agg(F.count("*").alias("n_orders"),
                        F.countDistinct("o_custkey").alias("n_customers"),
                        exact_sum("o_totalprice").alias("total_price")))


@query("sample_quota_per_lang", oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
{S.sql_quota_pred("doc_id", ["lang"], 20)}
""")
def quota_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced quota: exactly 20 documents per language, selected by
    deterministic md5 rank — the language-balancing primitive for a
    training mix. Full row identity is hash-compared, so both engines
    must pick the *same* 20 per language, not just the same count."""
    docs = load_table(spark, sf_dir, "documents")
    return (S.quota_sample(docs, ["lang"], "doc_id", 20)
            .select("doc_id", "lang", "n_chars"))


@query("sample_weighted_per_lang", oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE n_chars > 0
{S.sql_weighted_pred("doc_id", ["lang"], "n_chars", 15)}
""")
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sampling: 15 documents per language with
    inclusion probability ∝ n_chars (Efraimidis-Spirakis rank
    ln(u)/w on a deterministic md5 uniform). The exact selected set is
    hash-compared across engines — rank keys, tie-breaks, everything."""
    docs = load_table(spark, sf_dir, "documents")
    return (S.weighted_sample(docs, ["lang"], "doc_id", "n_chars", 15)
            .select("doc_id", "lang", "n_chars"))


@query("corpus_token_budget_mix", oracle="""
WITH capped AS (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                     doc_id ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
         CASE lang WHEN 'en' THEN 30000 WHEN 'de' THEN 10000
                   WHEN 'fr' THEN 10000 END AS budget
  FROM documents
)
-- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas renders as
-- float64 ("9605.0") while Spark's long prints "9605" — a textual
-- hash mismatch with identical values. BIGINT keeps both sides int64.
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM capped
WHERE budget IS NOT NULL AND cum <= budget
GROUP BY lang
""")
def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-to-budget: cap each source language at a token budget
    (en 30k / de 10k / fr 10k chars; es/zh excluded), documents taken in
    deterministic md5 order until the next one would overflow. The
    summary (docs kept, tokens kept per source) is oracle-checked; the
    underlying per-document selection is the same windowed cumulative
    sum in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = S.token_budget_mix(docs, "lang", "doc_id", "n_chars",
                               {"en": 30000, "de": 10000, "fr": 10000})
    return (mixed.groupBy("lang")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_chars").alias("sum_chars")))


@query("split_leakage_safe", oracle=f"""
WITH reps AS (
  SELECT doc_id, text,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
  FROM documents
)
SELECT CASE WHEN {S.sql_hash_bucket("rep")} < 8000 THEN 'train'
            ELSE 'eval' END AS split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_groups
FROM reps
GROUP BY 1
""")
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split where exact-duplicate documents (same text
    fingerprint) always land together — split keyed on the duplicate
    group's representative id, not the row id. The oracle recomputes
    the same representative + bucket arithmetic; per-split doc and
    group counts are hash-compared."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.leakage_safe_split(docs, "doc_id", F.md5("text"),
                               {"train": 0.8, "eval": 0.2})
    return (out.groupBy("split")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.countDistinct(F.md5("text")).alias("n_groups")))


@query("lang_temperature_weights", oracle=f"""
WITH d AS (
  SELECT lang,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS n_tok
  FROM documents
),
g AS (SELECT lang AS "group", count(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM g),
s AS (SELECT g.*, {sql_round_port('n_tokens / t', 9)} AS p,
             {sql_round_port(
                 f"pow({sql_round_port('n_tokens / t', 9)}, 0.3)", 9)} AS pa
      FROM g, tot),
z AS (SELECT SUM(CAST(round(pa * 1000000000) AS BIGINT)) AS zn FROM s)
SELECT "group", n_docs, n_tokens, p,
       {sql_round_port('pa / (zn / 1000000000.0)', 9)} AS q,
       {sql_round_port(
           sql_round_port('pa / (zn / 1000000000.0)', 9) + ' / p', 6)}
         AS factor
FROM s, z
""")
def lang_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α = 0.3) language rebalancing weights — the
    mBERT/XLM-R sampling rule (`operators/sampling.temperature_weights`):
    per-language token shares flattened by p^α, with the per-document
    up/down-sampling factor a mixing stage applies. One grouped agg plus
    two broadcast one-row scalars; the row-level multiplier joins back
    on a 5-row table."""
    from ..operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", F.size(words("text")).alias("n_tok"))
    return S.temperature_weights(d, "lang", "n_tok")


@query("lang_temperature_resample", oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS n_tok
  FROM documents
),
g AS (SELECT lang, count(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM g),
s AS (SELECT g.lang, {sql_round_port('n_tokens / t', 9)} AS p,
             {sql_round_port(
                 f"pow({sql_round_port('n_tokens / t', 9)}, 0.3)", 9)} AS pa
      FROM g, tot),
z AS (SELECT SUM(CAST(round(pa * 1000000000) AS BIGINT)) AS zn FROM s),
f AS (SELECT lang,
             {sql_round_port(
                 sql_round_port('pa / (zn / 1000000000.0)', 9) + ' / p', 6)}
               AS factor
      FROM s, z),
c AS (
  SELECT d.doc_id, d.lang,
         CAST(floor(f.factor)
              + CASE WHEN ({S.sql_hash_bucket('doc_id', 1_000_000, ':tmp')})
                          / 1000000.0 < f.factor - floor(f.factor)
                     THEN 1 ELSE 0 END AS BIGINT) AS n_copies
  FROM d JOIN f USING (lang)
)
SELECT doc_id, lang, n_copies,
       unnest(range(1, n_copies + 1)) AS repeat_idx
FROM c WHERE n_copies >= 1
""")
def lang_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized α = 0.3 language mix
    (`operators/sampling.temperature_resample`): head languages thin
    out (md5-uniform keep on the fractional factor), tail languages
    replicate — exact copy multiset hash-compared row for row, so both
    engines agree on every kept copy of every document."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.text import words

    d = docs.select("doc_id", "lang", F.size(words("text")).alias("n_tok"))
    return (S.temperature_resample(d, "lang", "doc_id", "n_tok")
            .select("doc_id", "lang", "n_copies", "repeat_idx"))


from ..operators.text import SQL_WORDS as _SQL_WORDS  # noqa: E402

_WORDS_SQL = _SQL_WORDS.format(t="text")


@query("dsir_importance_weights", oracle=f"""
WITH w AS (
  SELECT doc_id, source = 'src0' AS t,
         {_WORDS_SQL} AS w
  FROM documents
),
g AS (
  SELECT doc_id, t,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM w WHERE len(w) >= 2
),
f AS (
  SELECT doc_id, t,
         {S.sql_hash_bucket("gram", 4096, salt=":dsir")} AS f
  FROM g
),
tc AS (SELECT f, count(*) AS tc FROM f WHERE t GROUP BY 1),
rc AS (SELECT f, count(*) AS rc FROM f WHERE NOT t GROUP BY 1),
tt AS (SELECT SUM(tc) AS tt FROM tc),
rt AS (SELECT SUM(rc) AS rt FROM rc),
lm AS (
  SELECT b.f,
         CAST(round((ln((coalesce(tc.tc, 0) + 1.0) / (tt.tt + 4096.0))
                    - ln((coalesce(rc.rc, 0) + 1.0) / (rt.rt + 4096.0)))
                    * 1000000) AS BIGINT) AS lw
  FROM (SELECT unnest(range(0, 4096)) AS f) b
  LEFT JOIN tc USING (f) LEFT JOIN rc USING (f), tt, rt
)
,
s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(SUM(lw) AS BIGINT) AS sum_logw_micro
  FROM f JOIN lm USING (f) WHERE NOT t
  GROUP BY 1
)
-- every raw doc appears: < 2 words → neutral weight, never dropped
SELECT d.doc_id,
       coalesce(s.n_grams, 0) AS n_grams,
       coalesce(s.sum_logw_micro, 0) AS sum_logw_micro,
       coalesce(s.sum_logw_micro, 0) / 1000000.0 AS logw
FROM (SELECT doc_id FROM documents WHERE NOT (source = 'src0')) d
LEFT JOIN s USING (doc_id)
""")
def dsir_weights_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights for raw documents against the 'src0'
    target slice (Xie et al. 2023) — hashed-bigram likelihood ratios
    with micro-nat exact integer sums."""
    docs = load_table(spark, sf_dir, "documents")
    return S.dsir_importance_weights(
        docs, "text", "doc_id", F.col("source") == "src0")
