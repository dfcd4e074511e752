"""Sequence-packing queries. The DuckDB oracle expresses the same greedy
recurrence as a recursive CTE over row-numbered docs — an O(n)-depth
recursion that is fine at oracle scale (sf0.01) and proves the pandas
kernel implements exactly the stated recurrence, chunk break for chunk
break."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import packing as PK
from ..operators import text as TX
from ..registry import query
from ..sources.io import load_table

_W = TX.SQL_WORDS.format(t="text")
_BUDGET, _GROUPS = 512, 8

_PACKED_CTE = f"""
d AS (
  SELECT doc_id AS id, doc_id % {_GROUPS} AS pack_group,
         CAST(len({_W}) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {_GROUPS}
                            ORDER BY doc_id) AS rn
  FROM documents
),
packed(pack_group, rn, id, n_tokens, chunk_id, cum) AS (
  SELECT pack_group, rn, id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.pack_group, d.rn, d.id, d.n_tokens,
         CASE WHEN p.cum + d.n_tokens > {_BUDGET}
              THEN p.chunk_id + 1 ELSE p.chunk_id END,
         CASE WHEN p.cum + d.n_tokens > {_BUDGET}
              THEN d.n_tokens ELSE p.cum + d.n_tokens END
  FROM d JOIN packed p ON d.pack_group = p.pack_group AND d.rn = p.rn + 1
)
"""


@query("pack_sequences", oracle=f"""
WITH RECURSIVE {_PACKED_CTE.strip()}
SELECT id, pack_group, chunk_id, n_tokens FROM packed
""")
def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token packing of the documents table into 512-token chunks
    across 8 parallel pack streams; per-document chunk assignment."""
    docs = load_table(spark, sf_dir, "documents")
    withn = TX.token_stats(docs, "text")
    return PK.pack_sequences(withn, "doc_id", "n_words",
                             budget=_BUDGET, n_groups=_GROUPS)


@query("pack_chunk_stats", oracle=f"""
WITH RECURSIVE {_PACKED_CTE.strip()}
SELECT pack_group, chunk_id, count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
       round(CAST(SUM(n_tokens) AS BIGINT) / {_BUDGET}.0, 6) AS fill_ratio
FROM packed GROUP BY 1, 2
""")
def pack_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency summary per chunk (docs, tokens, fill ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    withn = TX.token_stats(docs, "text")
    packed = PK.pack_sequences(withn, "doc_id", "n_words",
                               budget=_BUDGET, n_groups=_GROUPS)
    return PK.chunk_stats(packed, budget=_BUDGET)
