"""Deterministic split / sample queries (beyond-reference extension).

Both queries verify *assignment*, not just mechanics: the per-split
aggregates (exact counts + exact integer-scaled sums) hash-match only if
every single row landed in the same split in both engines — a stronger
check than comparing split sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum, sql_exact_sum
from ..operators import sampling as S
from ..registry import query
from ..sources.io import load_table

_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


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
