"""Sequence packing (beyond-reference extension): assign documents to
fixed-token-budget chunks for LLM training batch construction.

Greedy sequential packing is inherently order-dependent *within* a pack
stream, so the scale design splits the corpus into ``n_groups``
independent streams (keyed by id — deterministic, not partition-
dependent) and packs each stream with one Arrow-batched pandas kernel.
Groups pack in parallel across the cluster; ``n_groups`` scales with
executor count, and each group's state is one cumulative counter — O(1)
memory per stream regardless of corpus size. This is the standard
data-parallel formulation of packing: global greedy packing would be a
single serial scan of 100 TB, while per-stream packing loses nothing
(chunks never span streams by construction) and parallelizes freely.

The pandas kernel is deliberately self-contained (no references to
package globals) so cloudpickle ships it by value to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, id_col: str, n_tokens_col: str,
                   budget: int = 512, n_groups: int = 8) -> DataFrame:
    """Greedy first-fit-in-order packing: within each pack group (doc id
    mod ``n_groups``), documents are taken in id order and appended to
    the current chunk until the next doc would overflow ``budget``, which
    starts a new chunk. Oversized docs (> budget) occupy a chunk alone.

    Returns one row per document: (id, pack_group, chunk_id, n_tokens).
    """
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        (F.col(id_col).cast("long") % n_groups).alias("pack_group"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"))

    def _pack(pdf):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        chunk, cum, out = 0, 0, []
        for t in pdf["n_tokens"]:
            # guard on "not the first doc", NOT on cum > 0: a stream
            # opening with zero-token docs must still start a new chunk
            # when an oversized doc follows (the exact recurrence the
            # SQL oracle pins — `cum > 0` diverged there)
            if out and cum + t > budget:
                chunk, cum = chunk + 1, 0
            cum += t
            out.append(chunk)
        pdf["chunk_id"] = out
        return pdf[["id", "pack_group", "chunk_id", "n_tokens"]]

    return (src.groupBy("pack_group")
               .applyInPandas(_pack,
                              "id long, pack_group long, "
                              "chunk_id long, n_tokens long"))


def chunk_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-chunk fill summary — the packing-efficiency view trainers
    actually monitor (docs/chunk, fill ratio vs budget)."""
    return (packed.groupBy("pack_group", "chunk_id")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum("n_tokens").alias("chunk_tokens"))
                  .withColumn("fill_ratio",
                              F.round(F.col("chunk_tokens") / budget, 6)))
