"""Similarity search over embedding columns (beyond-reference extension):
brute-force cosine top-k as the exact baseline, random-hyperplane LSH
bucketing as the 100 TB scale path.

Embeddings are ``array<float>`` columns; all arithmetic casts to double
elementwise first (float32 accumulation is neither portable nor stable),
then folds left-to-right with ``aggregate`` — JVM-side, no UDF.

Scale notes: brute-force is a broadcast nested-loop (queries × corpus) —
right only when queries are few; the LSH path buckets the corpus once
(cost ∝ corpus), probes only matching buckets, and its plan is the
standard bucket-join. For IVF-style search swap the hash for a learned
centroid assignment (MLlib KMeans) — same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products — deterministic order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine, bit-identical to :func:`cosine`.

    Spark's higher-order ``aggregate``/``zip_with`` folds are
    CodegenFallback — interpreted row-at-a-time, ~0.5M evals/s — which
    is fine for a few-queries top-k but a wall when an LSH candidate
    join emits millions of pairs. This pandas_udf accumulates with an
    explicit left-to-right loop over dimensions (``acc += A[:,i]*B[:,i]``,
    vectorized ACROSS rows, sequential WITHIN a row), so every row's
    floating-point op sequence is exactly the JVM fold's — same bits,
    same 6-dp rounding, oracle parity preserved — at numpy batch
    throughput."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        n = A.shape[0]
        dot_ = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(A.shape[1]):           # left-fold order per row
            dot_ = dot_ + A[:, i] * B[:, i]
            na = na + A[:, i] * A[:, i]
            nb = nb + B[:, i] * B[:, i]
        return pd.Series(dot_ / (np.sqrt(na) * np.sqrt(nb)))

    _cos.__annotations__ = {"va": pd.Series, "vb": pd.Series,
                            "return": pd.Series}
    return pandas_udf(_cos, "double")(a, b)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                query_id: str = "q_id", corpus_id: str = "vec_id",
                query_vec: str = "q_vec", corpus_vec: str = "embedding",
                round_dp: int = 6) -> DataFrame:
    """Exact top-k neighbors per query vector: broadcast the (small) query
    set against the corpus, compute cosine, rank per query. Cosine is
    rounded before ranking so the selected set is reproducible under
    floating-point accumulation differences; ties break on corpus id."""
    cos = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), round_dp)
    scored = (corpus.join(F.broadcast(queries),
                          F.col(query_id) != F.col(corpus_id))
                    .withColumn("cosine", cos))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k)
                  .select(query_id, corpus_id, "cosine", "rank"))


def cosine_topk_blocked(queries: DataFrame, corpus: DataFrame, k: int = 5,
                        query_id: str = "q_id", corpus_id: str = "vec_id",
                        query_vec: str = "q_vec",
                        corpus_vec: str = "embedding",
                        round_dp: int = 6) -> DataFrame:
    """Exact top-k for MANY queries — the path `cosine_topk`'s
    broadcast-NL caveat points to. The query matrix broadcasts once
    (bounded driver state: q × dim doubles — 25 MB at 50k × 64); each
    corpus partition scores its rows against ALL queries in one Arrow
    kernel (numpy across rows/queries, per-dimension left-fold order so
    every cosine is bit-identical to the JVM fold) and emits only its
    LOCAL top-k per query; a final per-query selection over the
    k × n_partitions candidates gives the global answer. No row
    explosion anywhere: the NL join's |Q|·|C| intermediate never
    materializes — it lives inside the matmul loop."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf  # noqa: F401 (doc aid)

    import numpy as np

    qrows = queries.select(query_id, query_vec).collect()
    q_ids = np.array([r[query_id] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[query_vec], dtype=np.float64)
                  for r in qrows])
    qn = np.zeros(Q.shape[0])
    for i in range(Q.shape[1]):                   # fold-order query norms
        qn = qn + Q[:, i] * Q[:, i]
    qn = np.sqrt(qn)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, Q, qn))

    out_schema = f"{query_id} long, {corpus_id} long, cosine double"

    def score(batches):
        ids_q, Qm, qnorm = bq.value
        nq, d = Qm.shape
        for pdf in batches:
            V = np.stack(pdf[corpus_vec].to_numpy()).astype(np.float64)
            cids = pdf[corpus_id].to_numpy().astype(np.int64)
            dot_ = np.zeros((V.shape[0], nq))
            vn = np.zeros(V.shape[0])
            for i in range(d):                    # left-fold order per row
                dot_ = dot_ + V[:, i, None] * Qm[None, :, i]
                vn = vn + V[:, i] * V[:, i]
            raw = dot_ / (np.sqrt(vn)[:, None] * qnorm[None, :])
            # half-away-from-zero, matching Spark round()/DuckDB round()
            # (np.round is half-to-even — a different function)
            f = 10.0 ** round_dp
            cos = np.copysign(np.floor(np.abs(raw) * f + 0.5), raw) / f
            rows = {query_id: [], corpus_id: [], "cosine": []}
            for j in range(nq):
                col = cos[:, j].copy()
                mask = cids == ids_q[j]
                col[mask] = -np.inf               # exclude self-match
                # NaN (zero-norm vector) ranks GREATEST — Spark's window
                # order and DuckDB's total order both put NaN above every
                # double, so the local top-k must too or the blocked path
                # diverges from cosine_topk on degenerate vectors
                key = np.where(np.isnan(col), np.inf, col)
                # local top-k with the global tiebreak (cos desc, id asc)
                order = np.lexsort((cids, -key))[:k]
                for t in order:
                    if col[t] == -np.inf:
                        continue
                    rows[query_id].append(int(ids_q[j]))
                    rows[corpus_id].append(int(cids[t]))
                    rows["cosine"].append(float(col[t]))
            yield pd.DataFrame(rows)

    cand = corpus.select(corpus_id, corpus_vec) \
                 .mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
                .where(F.col("rank") <= k)
                .select(query_id, corpus_id, "cosine", "rank"))


def hard_negatives(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   query_id: str = "q_id", corpus_id: str = "vec_id",
                   query_vec: str = "q_vec", corpus_vec: str = "embedding",
                   query_label: str = "q_label", corpus_label: str = "label",
                   round_dp: int = 6) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    most-similar corpus vectors with a DIFFERENT label — maximally
    confusable negatives. Same plan as `cosine_topk` (broadcast the
    query block, rank within candidates) with the label-mismatch
    predicate applied before ranking; for huge query sets compose with
    the blocked kernel instead."""
    cos = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), round_dp)
    scored = (corpus.join(F.broadcast(queries),
                          (F.col(query_id) != F.col(corpus_id))
                          & (F.col(query_label) != F.col(corpus_label)))
                    .withColumn("cosine", cos))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k)
                  .select(query_id, corpus_id,
                          F.col(corpus_label).alias("neg_label"),
                          "cosine", "rank"))


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding",
                    round_dp: int = 6) -> DataFrame:
    """Per-label centroid vectors in long form (label, dim_idx,
    centroid) — the class-prototype building block (centroid-based
    dedup/classification, cluster drift). One posexplode (bounded ×dim)
    and one grouped average; output rounded so partition-order ulps in
    the float sums can't leak into the hash. Long form by design: it
    joins/pivots freely and needs no array-reassembly ordering."""
    return (df.select(F.col(label_col).alias("label"),
                      F.posexplode(_as_double(F.col(vec_col)))
                       .alias("dim_idx", "__v"))
              .groupBy("label", "dim_idx")
              .agg(F.round(F.avg("__v"), round_dp).alias("centroid"),
                   F.count("*").alias("n_vectors"))
              .select("label", F.col("dim_idx").cast("int").alias("dim_idx"),
                      "centroid", "n_vectors"))


def centroid_classify(df: DataFrame, label_col: str = "label",
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_dp: int = 6) -> DataFrame:
    """Nearest-centroid classification confusion matrix: build per-label
    prototypes (`label_centroids`), assign every vector to its
    most-cosine-similar centroid (deterministic tiebreak on label), and
    aggregate (true_label, predicted_label) counts — the standard
    embedding-quality / label-noise diagnostic. The centroid table is
    O(labels × dim) and broadcasts; the corpus scans once."""
    cents = (label_centroids(df, label_col, vec_col, round_dp)
             .groupBy("label")
             .agg(F.array_sort(F.collect_list(
                 F.struct("dim_idx", "centroid"))).alias("__s"))
             .select(F.col("label").alias("__plabel"),
                     F.transform("__s", lambda x: x["centroid"])
                      .alias("__cvec")))
    sim = F.round(cosine(F.col(vec_col), F.col("__cvec")), round_dp)
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(),
                                           F.col("__plabel").asc())
    assigned = (df.join(F.broadcast(cents))
                .withColumn("__sim", sim)
                .withColumn("__r", F.row_number().over(w))
                .where(F.col("__r") == 1))
    return (assigned.groupBy(F.col(label_col).alias("true_label"),
                             F.col("__plabel").alias("predicted_label"))
            .agg(F.count("*").alias("n")))


def centroid_outliers(df: DataFrame, label_col: str = "label",
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      prune_frac: float = 0.1,
                      round_dp: int = 6) -> DataFrame:
    """Prototype-distance pruning (the SSL-prototypes / SemDeDup-family
    curation signal): score every vector's cosine to its OWN class
    centroid and flag the least-typical ``prune_frac`` of each class —
    the cheap embedding-space filter for mislabeled / off-topic /
    junk examples that runs before any expensive pairwise dedup.

    Same plan skeleton as :func:`centroid_classify` — the centroid
    table is O(labels × dim) and broadcasts; the corpus scans once and
    joins only to its own label's prototype (equi join, not the
    classify cross join) — plus one window per label for the
    typicality rank. Ranking uses the round-``round_dp`` similarity
    with an id tiebreak, so the cut line is engine-portable; the class
    size feeds the cutoff via a count window on the same partitioning
    (no extra shuffle).

    Output: (id, label, sim, rank, prune) — rank 1 = least typical."""
    cents = (label_centroids(df, label_col, vec_col, round_dp)
             .groupBy("label")
             .agg(F.array_sort(F.collect_list(
                 F.struct("dim_idx", "centroid"))).alias("__s"))
             .select(F.col("label").alias("__clabel"),
                     F.transform("__s", lambda x: x["centroid"])
                      .alias("__cvec")))
    sim = F.round(cosine(F.col(vec_col), F.col("__cvec")), round_dp)
    w_rank = Window.partitionBy(label_col).orderBy(F.col("sim").asc(),
                                                   F.col(id_col).asc())
    w_n = Window.partitionBy(label_col)
    return (df.join(F.broadcast(cents),
                    F.col(label_col) == F.col("__clabel"))
              .withColumn("sim", sim)
              .withColumn("rank", F.row_number().over(w_rank).cast("long"))
              .withColumn("__n", F.count("*").over(w_n))
              .select(id_col, label_col, "sim", "rank",
                      (F.col("rank")
                       <= F.ceil(F.lit(prune_frac) * F.col("__n")))
                      .alias("prune")))


def cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", threshold: float = 0.4,
                 round_dp: int = 6) -> DataFrame:
    """All pairs with cosine ≥ threshold — embedding near-dup detection.
    Brute-force all-pairs here (exact, oracle-checkable); at scale, run
    ``lsh_buckets`` first and compare only within buckets."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = F.round(cosine(F.col("va"), F.col("vb")), round_dp)
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .withColumn("cosine", cos)
             .where(F.col("cosine") >= threshold)
             .select("id_a", "id_b", "cosine"))


def with_quantized(df: DataFrame, vec_col: str, scale_col: str,
                   q_col: str) -> DataFrame:
    """Symmetric per-vector int8-range quantization: ``scale = max|x|/127``
    (materialized as a real column FIRST — referencing it inside the
    per-element lambda must not re-inline the array_max, cf. the
    expression-inlining rule in PERFORMANCE.md), ``q[i] = round(x[i]/scale)``
    as integers. An all-zero vector quantizes to zeros. Integer codes are
    engine-portable (no FP accumulation ambiguity) and 4× smaller than
    float32 — the storage/bandwidth form for a 100 TB embedding corpus."""
    d = _as_double(F.col(vec_col))
    df = df.withColumn(scale_col,
                       F.array_max(F.transform(d, F.abs)) / F.lit(127.0))
    q = (F.when(F.col(scale_col) == 0,
                F.transform(d, lambda x: F.lit(0).cast("long")))
          .otherwise(F.transform(
              d, lambda x: F.round(x / F.col(scale_col)).cast("long"))))
    return df.withColumn(q_col, q)


def quantized_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   oversample: int = 4, query_id: str = "q_id",
                   corpus_id: str = "vec_id", query_vec: str = "q_vec",
                   corpus_vec: str = "embedding",
                   round_dp: int = 6) -> DataFrame:
    """Two-stage ANN: shortlist by quantized integer dot product, rerank
    the shortlist with exact cosine. The production pattern for
    billion-vector search — the wide float vectors stay in storage;
    the scan computes an integer dot (SIMD-friendly, exactly
    reproducible on any engine) against int8-range codes, and only
    ``k × oversample`` candidates per query pay the exact float path.

    ``approx_score = scale_q · scale_c · Σ q_q[i]·q_c[i]`` approximates
    the raw dot product; both stages rank with deterministic tiebreaks
    (score desc, corpus id asc) and 6-dp rounding so the selected sets
    are identical across engines."""
    qq = with_quantized(queries, query_vec, "__qs", "__qq")
    cc = with_quantized(corpus, corpus_vec, "__cs", "__cq")
    idot = F.aggregate(F.zip_with("__qq", "__cq", lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)
    approx = F.round((F.col("__qs") * F.col("__cs")) * idot.cast("double"),
                     round_dp)
    cand = (cc.join(F.broadcast(qq), F.col(query_id) != F.col(corpus_id))
              .withColumn("approx_score", approx))
    wa = Window.partitionBy(query_id).orderBy(F.col("approx_score").desc(),
                                              F.col(corpus_id).asc())
    shortlist = (cand.withColumn("__arank", F.row_number().over(wa))
                     .where(F.col("__arank") <= k * oversample))
    cos = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), round_dp)
    wr = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                              F.col(corpus_id).asc())
    return (shortlist.withColumn("cosine", cos)
            .withColumn("rank", F.row_number().over(wr).cast("long"))
            .where(F.col("rank") <= k)
            .select(query_id, corpus_id, "approx_score", "cosine", "rank"))


def plane_matrix(seed: str, n_planes: int, dim: int) -> list[list[float]]:
    """Driver-side hyperplane derivation: component (p, i) is
    ``((int(md5(f"{seed}:{p}:{i}")[:8], 16) % 2001) - 1000) / 1000`` —
    byte-identical to the SQL form ``(conv(substring(md5(...),1,8),16,10)
    % 2001 - 1000) / 1000`` both engines can re-derive, but computed
    ONCE here instead of n_planes × dim md5 evaluations per row."""
    import hashlib

    def comp(p: int, i: int) -> float:
        h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:8]
        return ((int(h, 16) % 2001) - 1000) / 1000.0

    return [[comp(p, i) for i in range(dim)] for p in range(n_planes)]


def _sign_bit(v: Column, plane: list[float]) -> Column:
    """1 if v · plane >= 0 else 0, with the plane as an array literal —
    the per-row cost is one fold, no hashing."""
    lit = F.array(*[F.lit(w) for w in plane])
    return F.when(dot(v, lit) >= 0, F.lit(1).cast("long")) \
            .otherwise(F.lit(0).cast("long"))


def _sign_matrix(v, planes: list[list[float]]):
    """Shared kernel for the Arrow bucket/band paths: per-plane sign bits
    with the accumulation replaying the JVM fold exactly — acc built by
    sequential per-dimension adds (vectorized ACROSS rows), so the sign
    of every near-zero dot lands on the same side as `_sign_bit`."""
    import numpy as np

    V = np.stack(v.to_numpy()).astype(np.float64)
    bits = np.zeros((V.shape[0], len(planes)), dtype=np.int64)
    for p, plane in enumerate(planes):
        acc = np.zeros(V.shape[0])
        for i, w in enumerate(plane):     # left-fold order per row
            acc = acc + V[:, i] * w
        bits[:, p] = acc >= 0
    return bits


def _bucket_batch(vec: Column, planes: list[list[float]]) -> Column:
    """Arrow-vectorized LSH bucket id, bit-identical to the `_sign_bit`
    fold chain. The interpreted HOF fold costs n_planes × dim lambda
    evaluations per row (CodegenFallback); this computes the same bits at
    numpy batch throughput — the bucket-assignment analogue of
    `cosine_batch`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _b(v: pd.Series) -> pd.Series:
        import numpy as np
        bits = _sign_matrix(v, planes)
        return pd.Series(bits @ (1 << np.arange(len(planes), dtype=np.int64)))

    _b.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_b, "long")(vec)


def _band_vals_batch(vec: Column, planes: list[list[float]],
                     n_bands: int, band_bits: int) -> Column:
    """Arrow-vectorized per-band LSH values (array<long>, one element per
    band), bit-identical to the `_sign_bit` composition in
    `lsh_band_pairs`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _b(v: pd.Series) -> pd.Series:
        import numpy as np
        bits = _sign_matrix(v, planes)
        weights = 1 << np.arange(band_bits, dtype=np.int64)
        vals = np.stack([
            bits[:, b * band_bits:(b + 1) * band_bits] @ weights
            for b in range(n_bands)], axis=1)
        return pd.Series(list(vals))

    _b.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_b, "array<long>")(vec)


def lsh_buckets(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", n_planes: int = 8,
                seed: str = "cdps", dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of the dot product with
    ``n_planes`` pseudo-random hyperplanes. Planes are derived
    deterministically from md5(seed:plane:dim) — reproducible across
    runs/engines, no RNG state to ship. One pass over the corpus.

    Pass ``dim`` (the embedding dimensionality) to precompute the plane
    matrix driver-side and ship it as array literals — identical bits,
    but the per-row work collapses from n_planes × dim md5+conv calls
    to n_planes dot products. Without ``dim`` (ragged/unknown vectors)
    the planes are derived per-row in the expression."""
    v = _as_double(F.col(vec_col))

    if dim is not None:
        planes = plane_matrix(seed, n_planes, dim)
        return df.select(F.col(id_col), F.col(vec_col),
                         _bucket_batch(F.col(vec_col), planes)
                         .alias("bucket"))

    size = F.size(F.col(vec_col))

    def plane_component(p: int):
        # uniform in [-1, 1): ((md5-derived int) % 2001 - 1000) / 1000
        return lambda i: ((F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.lit(str(p)),
                              (i - 1).cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2001) - 1000).cast("double") / 1000.0

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        idx = F.sequence(F.lit(1), size)
        plane = F.transform(idx, plane_component(p))
        d = dot(v, plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << p).cast("long")) \
                           .otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), F.col(vec_col),
                     bucket.alias("bucket"))


def lsh_band_pairs(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", threshold: float = 0.4,
                   n_bands: int = 16, band_bits: int = 2,
                   seed: str = "cdps-pairs", dim: int = 64,
                   round_dp: int = 6,
                   prefilter_margin: float | None = None,
                   prefilter_sigma: float | None = None) -> DataFrame:
    """Near-dup pairs at scale: banded random-hyperplane LSH candidate
    generation + exact cosine within candidates — the shipped
    replacement for the O(n²) ``cosine_pairs`` theta join.

    Shape: one corpus scan computes ``n_bands`` band values per row
    (``band_bits`` sign bits each, planes precomputed driver-side),
    posexplode to (band, value) WITHOUT the vectors, self equi-join on
    (band, value) — a shuffle-hash/bucket join, never a theta-NL —
    then a SKINNY (id_a, id_b) distinct (16 bytes/row, no arrays
    through the dedup shuffle), vectors joined back once, and exact
    cosine via the Arrow-vectorized :func:`cosine_batch` (bit-identical
    to the fold, ~50× the interpreted-HOF throughput the candidate
    volume would otherwise hit). Band-OR recall for a pair at cosine s is
    ``1 - (1 - p^band_bits)^n_bands`` with ``p = 1 - arccos(s)/π``
    (≈ 0.98 at s = 0.4 for 16×2; → 1 fast as s grows). Deterministic
    end-to-end, so an oracle can re-derive the identical candidate set.
    Brute force stays available as ``cosine_pairs`` for verification.

    Cost honesty (see PERFORMANCE.md): candidate volume is
    ``n_bands/2^band_bits × n²/2`` on near-uniform vectors — at a LOW
    threshold like 0.4 the hyperplane collision gap (p₁≈0.64 vs
    background p₂=0.5) means no (B, r) is simultaneously high-recall
    and strongly pruning; pick via :func:`suggest_bands`. At production
    dedup thresholds (≥0.8) selective bands (r 8–16) prune by orders
    of magnitude with recall ≥0.99 — that regime is why this shape
    ships.

    ``prefilter_margin`` / ``prefilter_sigma``: when set, the full
    ``n_bands·band_bits``-bit signature (already computed for banding)
    doubles as a cosine SKETCH before the exact rerank: a candidate
    pair's sign-bit Hamming distance h estimates cos(π·h/n_planes),
    and pairs above an INTEGER cutoff (deterministic and
    engine-portable — an oracle re-derives it exactly) are dropped
    without touching the vectors. Two ways to state the cutoff:

    - ``prefilter_margin=m``: ``h_max = ⌊n_planes·arccos(θ−m)/π⌋`` — a
      fixed cosine slack. Simple, but the slack a sketch actually
      needs scales with the BINOMIAL noise of h, not with cosine
      units: at 198 planes a 0.3 margin is ≈3σ of headroom yet lets
      through every background pair whose true cosine sits within
      ~0.3 of θ — on mean-zero corpora that's most of the collision
      mass, and the exact rerank pays for all of it.
    - ``prefilter_sigma=k`` (preferred): ``h_max = ⌊E[h|θ] + k·σ[h|θ]⌋``
      with ``E = n·arccos(θ)/π`` and ``σ = √(n·p(1−p))`` — the cutoff
      placed k standard deviations of SKETCH NOISE above the
      threshold's own expected Hamming. k = 2.33 loses ~1% of pairs
      sitting EXACTLY at θ (one-sided normal tail; pairs above θ
      vanish exponentially faster) while admitting only the
      background whose true cosine is within ~k·σ_cos of θ — at 198
      planes that's an est-cos floor ≈ θ − 0.19 instead of θ − 0.3,
      an ~8× smaller rerank on mean-zero corpora.

    The distinct moves AFTER the sketch filter — duplicates from
    multi-band collisions are cheaper to re-sketch than to shuffle."""
    import math

    from pyspark import StorageLevel

    n_planes = n_bands * band_bits
    planes = plane_matrix(seed, n_planes, dim)
    band_vals = _band_vals_batch(F.col(vec_col), planes,
                                 n_bands, band_bits)

    per_word = 63 // band_bits
    n_words = -(-n_bands // per_word)

    def packed_word(w: int):
        # pack the band values (band_bits-wide fields) into 64-bit words
        # so the Hamming distance is whole-stage-codegen xor+bit_count —
        # an interpreted zip_with/aggregate over the value arrays
        # measures SLOWER than the Arrow rerank it is meant to avoid.
        # Fields are disjoint, so bit_count(xor(packed)) ≡
        # Σ bit_count(xor(field)) — lossless, oracle re-derives it
        # directly from the per-band values.
        # Built as ONE parsed expr: constructing the ~130 Column ops
        # through py4j costs ~0.4 s of DRIVER time per query build
        # (one JVM round-trip per op) — a measured third of the whole
        # query's warm latency; the parser builds the identical
        # left-associative tree in one call.
        return F.expr(" + ".join(
            f"shiftleft(CAST(element_at(__vals, {j + 1}) AS BIGINT), "
            f"{band_bits * (j - w * per_word)})"
            for j in range(w * per_word,
                           min((w + 1) * per_word, n_bands))))

    # ONE projection computes everything downstream needs (band values,
    # packed sketch words, the vector for the rerank) and is persisted:
    # the banded self-join, both sketch sides, and both rerank sides
    # would otherwise each re-scan the source and re-run the Arrow
    # sign-bit UDF — 4-6 corpus scans collapse to one. Spill-safe
    # (MEMORY_AND_DISK) and ~the source's own width, the standard trade
    # for a multi-use intermediate; Spark evicts it LRU once the query
    # finishes consuming it.
    if prefilter_margin is not None and prefilter_sigma is not None:
        raise ValueError("pass prefilter_margin OR prefilter_sigma, "
                         "not both")
    h_max: int | None = None
    if prefilter_margin is not None:
        h_max = int(n_planes * math.acos(
            min(max(threshold - prefilter_margin, -1.0), 1.0)) / math.pi)
    elif prefilter_sigma is not None:
        p_theta = math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
        h_max = int(n_planes * p_theta + prefilter_sigma
                    * math.sqrt(n_planes * p_theta * (1.0 - p_theta)))

    base = df.select(F.col(id_col), F.col(vec_col),
                     band_vals.alias("__vals"))
    if h_max is not None:
        base = base.select(
            id_col, vec_col, "__vals",
            *[packed_word(w).alias(f"__sig{w}") for w in range(n_words)])
    base = base.persist(StorageLevel.MEMORY_AND_DISK)

    # the packed sketch words RIDE the exploded (band, value) stream —
    # +8·n_words bytes per exploded row — so the sketch filter runs
    # INSIDE the band self-join's output with plain xor+bit_count
    # projections and no further join. The alternative (joining the
    # candidates back to a per-vector signature table) either
    # broadcasts one row per CORPUS vector — O(n) broadcast, dead at
    # cluster scale — or shuffles the candidate stream twice; both
    # also pay broadcast/shuffle-build jobs that dominate small-scale
    # latency. Filtering before the distinct keeps multi-band dups
    # cheaper to re-sketch than to shuffle.
    sig_cols = [f"__sig{w}" for w in range(n_words)] \
        if h_max is not None else []
    banded = base.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col("__vals")).alias("band", "key"), *sig_cols)
    # the self equi-join routes through the shared hot-bucket sub-split
    # (dedup._banded_self_pairs): band population is bounded by
    # construction (≤ 2^band_bits values per band from sign bits of
    # near-uniform projections), but a DEGENERATE corpus — all-identical
    # or near-identical embeddings — concentrates one (band, value)
    # bucket into a single join task that AQE cannot split (one key).
    # Size-gated like minhash: naive equi-join below
    # MINHASH_GUARD_MIN_BYTES (bench/driver/tests — plan unchanged),
    # sub-split above; arms are match-multiset identical, so the sketch
    # filter and the distinct see the same stream either way
    # (test_lsh_band_pairs_hot_bucket_subsplit_identical).
    from .dedup import (MINHASH_GUARD_MIN_BYTES, _banded_self_pairs,
                        _input_bytes)
    cand = _banded_self_pairs(
        banded, guard=_input_bytes(df) >= MINHASH_GUARD_MIN_BYTES,
        extra_cols=tuple(sig_cols), distinct=False)
    if h_max is not None:
        ham = " + ".join(f"bit_count(__a__sig{w} ^ __b__sig{w})"
                         for w in range(n_words))
        cand = cand.where(F.expr(f"({ham}) <= {h_max}"))
    cand = cand.select("id_a", "id_b").distinct()
    ea = base.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("va"))
    eb = base.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vb"))
    cos = F.round(cosine_batch(F.col("va"), F.col("vb")), round_dp)
    return (cand.join(ea, "id_a").join(eb, "id_b")
                .withColumn("cosine", cos)
                .where(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine"))


def seed_near_duplicates(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding", n_seed: int = 40,
                         offset: int | None = None, eps: float = 0.05,
                         seed: str = "cdps-twin") -> DataFrame:
    """Union the corpus with ``n_seed`` deterministic near-duplicate
    twins — planted positives that make an approximate-dedup pipeline's
    output NON-VACUOUS at any corpus scale (an empty pair graph and a
    broken pipeline are otherwise indistinguishable).

    Twin of row ``i`` (for id < min(id) + n_seed — anchored at the
    corpus's own smallest id, so a corpus whose ids start at 10⁹ still
    gets its planted positives) gets id ``i + offset``
    (``offset`` None → ``1 + max(id)`` via a broadcast scalar, so twin
    ids can never collide with real ids at ANY corpus size — a fixed
    literal would silently alias once the corpus grows past it) and
    embedding ``x_j · (1 + eps·s_ij)`` with ``s_ij ∈ {-1,+1}`` derived
    from ``md5(seed:i:j)`` — so cos(x, twin) ≥ (1-eps)/(1+eps) ≈ 0.905
    at eps 0.05 REGARDLESS of the data (numerator ≥ (1-eps)·‖x‖²,
    denominator ≤ (1+eps)·‖x‖²), i.e. guaranteed above any production
    dedup threshold, while sign bits near zero crossings still flip —
    the banding and sketch paths are exercised non-trivially, unlike
    exact copies. Every arithmetic step (double mul, cast back to
    float) is IEEE-exact and re-derivable in SQL, so value-level
    oracles still hash-match."""
    # one parsed expr instead of a py4j-built lambda tree: the ~40
    # Column round-trips cost ~0.25 s of driver time per query build.
    # Literals carry the D suffix so they parse as DOUBLE (a bare 0.05
    # parses as DECIMAL and would change the arithmetic the oracle
    # re-derives); the CASE/md5/conv chain is the same expression the
    # lambda built.
    qid = id_col.replace("`", "``")
    qvec = vec_col.replace("`", "``")
    qseed = seed.replace("'", "''")             # SQL string literal
    twin_transform = F.expr(
        f"transform(`{qvec}`, (x, j) -> CAST(CAST(x AS DOUBLE) * "
        f"({1.0!r}D + {float(eps)!r}D * (CASE WHEN CAST(conv(substring("
        f"md5(concat_ws(':', '{qseed}', CAST(`{qid}` AS STRING), "
        f"CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2 = 0 "
        f"THEN {1.0!r}D ELSE {-1.0!r}D END)) AS FLOAT))")

    # two steps: putting the `id + offset` alias in the same select
    # would LATERALLY shadow the input id inside the transform lambda
    # (Spark resolves the name to the lateral column alias), silently
    # deriving every sign from the offset id
    # seed the rows with id < min(id) + n_seed — NOT id < n_seed, which
    # plants ZERO twins for any corpus whose ids don't start near 0,
    # silently voiding the non-vacuity guarantee; both bounds come from
    # one id-column-only agg, broadcast as a 1-row scalar (one pruned
    # columnar scan, no shuffle of the corpus itself)
    bounds = df.agg((F.max(F.col(id_col)).cast("long") + 1)
                    .alias("__twin_off"),
                    (F.min(F.col(id_col)).cast("long") + n_seed)
                    .alias("__twin_lo"))
    twins = (df.select(id_col, vec_col)
               .crossJoin(F.broadcast(bounds))
               .where(F.col(id_col) < F.col("__twin_lo"))
               .select(F.col(id_col), F.col("__twin_off"),
                       twin_transform.alias(vec_col)))
    if offset is None:
        twins = twins.select((F.col(id_col) + F.col("__twin_off"))
                             .alias(id_col), F.col(vec_col))
    else:
        twins = twins.select((F.col(id_col) + offset).alias(id_col),
                             F.col(vec_col))
    return df.select(id_col, vec_col).unionByName(twins)


def suggest_bands(threshold: float, target_recall: float = 0.95,
                  n_rows: int | None = None,
                  max_planes: int = 256) -> tuple[int, int]:
    """Pick (n_bands, band_bits) for :func:`lsh_band_pairs`: the most
    selective r whose band-OR recall at ``threshold`` still reaches
    ``target_recall`` within ``max_planes`` total hyperplanes. Returns
    the standard S-curve tuning — the similarity-path analogue of the
    reference's chunk-size advisor (`processing/chunking.py:144-223`)."""
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    best = (16, 2)
    for r in range(16, 0, -1):
        pr = p ** r
        if pr <= 1e-12:
            continue
        if pr >= 1.0:
            # threshold 1.0 → identical sign patterns collide with
            # certainty: ONE band of the most selective width reaches
            # any recall (log(1-pr) would be log 0)
            return (1, r)
        b_needed = math.ceil(math.log(max(1e-12, 1.0 - target_recall))
                             / math.log(1.0 - pr))
        if b_needed * r <= max_planes:
            return (b_needed, r)
    return best


def ivf_ann(queries: DataFrame, corpus: DataFrame, k: int = 5,
            query_id: str = "q_id", corpus_id: str = "vec_id",
            query_vec: str = "q_vec", corpus_vec: str = "embedding",
            n_lists: int = 16, n_probe: int = 2, seed: int = 42) -> DataFrame:
    """IVF-style ANN: partition the corpus into ``n_lists`` KMeans cells
    (MLlib, one training pass), then search each query only in its
    ``n_probe`` nearest cells. The probe step is a broadcast of the tiny
    centroid table; candidate generation is an equi-join on cell id —
    the same bucket-join plan as LSH but with learned, data-adaptive
    cells (higher recall on clustered data)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    corpus_v = corpus.withColumn("__v", array_to_vector(
        _as_double(F.col(corpus_vec))))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__v",
                predictionCol="__cell")
    model = km.fit(corpus_v)
    assigned = model.transform(corpus_v).select(
        corpus_id, corpus_vec, "__cell")

    centroids = [(i, [float(x) for x in c])
                 for i, c in enumerate(model.clusterCenters())]
    cent_df = queries.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>")

    # nearest n_probe cells per query: tiny cross product vs centroids
    qc = (queries.join(F.broadcast(cent_df))
          .withColumn("__d", -cosine(F.col(query_vec), F.col("centroid"))))
    w = Window.partitionBy(query_id).orderBy(F.col("__d").asc(),
                                             F.col("cell").asc())
    probes = (qc.withColumn("__r", F.row_number().over(w))
                .where(F.col("__r") <= n_probe)
                .select(query_id, query_vec, F.col("cell").alias("__cell")))

    cand = (assigned.join(probes, "__cell")
                    .where(F.col(query_id) != F.col(corpus_id)))
    cos = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6)
    rw = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                              F.col(corpus_id).asc())
    return (cand.withColumn("cosine", cos)
                .withColumn("rank", F.row_number().over(rw).cast("long"))
                .where(F.col("rank") <= k)
                .select(query_id, corpus_id, F.col("__cell").alias("cell"),
                        "cosine", "rank"))


def ivf_ann_seeded(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   query_id: str = "q_id", corpus_id: str = "vec_id",
                   query_vec: str = "q_vec", corpus_vec: str = "embedding",
                   n_lists: int = 16, n_probe: int = 2,
                   round_dp: int = 6) -> DataFrame:
    """IVF-flat with deterministic seeding: the first ``n_lists`` corpus
    vectors (by id) ARE the cell centroids — no training pass, no RNG,
    no partition-order dependence — so the entire pipeline (assignment,
    probe selection, candidate join, ranking) is reproducible on any
    engine and value-checkable end-to-end. Same bucket-join plan as the
    learned-KMeans `ivf_ann` (which buys adaptive cells at the cost of
    a training job and a rows-only check); on corpora with real cluster
    structure, seed vectors land inside clusters and this is the cheap
    first cut.

    Assignment = argmax cosine over the broadcast centroid table
    (deterministic tiebreak on centroid id); queries probe their
    ``n_probe`` nearest cells; candidates come from the cell equi-join;
    exact cosine ranks within candidates only."""
    cents = (corpus.orderBy(F.col(corpus_id).asc()).limit(n_lists)
             .select(F.col(corpus_id).alias("__cell"),
                     F.col(corpus_vec).alias("__cvec")))
    sim = F.round(cosine(F.col(corpus_vec), F.col("__cvec")), round_dp)
    aw = Window.partitionBy(corpus_id).orderBy(F.col("__sim").desc(),
                                               F.col("__cell").asc())
    assigned = (corpus.join(F.broadcast(cents))
                .withColumn("__sim", sim)
                .withColumn("__r", F.row_number().over(aw))
                .where(F.col("__r") == 1)
                .select(corpus_id, corpus_vec, "__cell"))
    qsim = F.round(cosine(F.col(query_vec), F.col("__cvec")), round_dp)
    qw = Window.partitionBy(query_id).orderBy(F.col("__sim").desc(),
                                              F.col("__cell").asc())
    probes = (queries.join(F.broadcast(cents))
              .withColumn("__sim", qsim)
              .withColumn("__r", F.row_number().over(qw))
              .where(F.col("__r") <= n_probe)
              .select(query_id, query_vec, "__cell"))
    cand = (assigned.join(probes, "__cell")
                    .where(F.col(query_id) != F.col(corpus_id)))
    cos = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), round_dp)
    rw = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                              F.col(corpus_id).asc())
    return (cand.withColumn("cosine", cos)
                .withColumn("rank", F.row_number().over(rw).cast("long"))
                .where(F.col("rank") <= k)
                .select(query_id, corpus_id, F.col("__cell").alias("cell"),
                        "cosine", "rank"))


def lsh_ann(queries: DataFrame, corpus: DataFrame, k: int = 5,
            query_id: str = "q_id", corpus_id: str = "vec_id",
            query_vec: str = "q_vec", corpus_vec: str = "embedding",
            n_planes: int = 8, dim: int | None = None) -> DataFrame:
    """Approximate top-k: hash both sides into hyperplane buckets, join on
    bucket, rank within candidates only. Recall < 1 by construction (the
    approximation); cost ∝ bucket collisions instead of |Q|×|corpus|.
    ``dim`` enables the precomputed-plane fast path (same bits)."""
    cb = lsh_buckets(corpus, corpus_id, corpus_vec, n_planes, dim=dim)
    qb = (lsh_buckets(queries.withColumnRenamed(query_vec, corpus_vec),
                      query_id, corpus_vec, n_planes, dim=dim)
          .withColumnRenamed(corpus_vec, query_vec))
    cand = (cb.join(qb.select(query_id, query_vec, "bucket"), "bucket")
              .where(F.col(query_id) != F.col(corpus_id)))
    cos = F.round(cosine_batch(F.col(query_vec), F.col(corpus_vec)), 6)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (cand.withColumn("cosine", cos)
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .where(F.col("rank") <= k)
                .select(query_id, corpus_id, "bucket", "cosine", "rank"))


def knn_graph(df: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", k: int = 4,
              n_planes: int = 6, seed: str = "cdps",
              dim: int | None = None) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the whole corpus — the
    curation primitive behind SemDeDup-style semantic pruning, cluster
    sampling and graph-propagated quality labels: every vector gets
    edges to its ``k`` most-cosine-similar bucket-mates.

    ONE hashing pass (the corpus is both sides of its own bucket
    self-join), candidates ∝ Σ bucket-size² (hyperplane buckets are
    near-uniform on real embeddings), exact cosine + per-source rank
    within candidates only — never |n|². Returns (src, dst, cosine,
    rank); recall follows the single-probe LSH curve, and
    `lsh_ann_multiprobe` is the recall lever when the graph must be
    denser."""
    b = lsh_buckets(df, id_col, vec_col, n_planes, seed=seed, dim=dim)
    a = b.select(F.col(id_col).alias("src"),
                 F.col(vec_col).alias("__va"), "bucket")
    c = b.select(F.col(id_col).alias("dst"),
                 F.col(vec_col).alias("__vb"), "bucket")
    cand = a.join(c, "bucket").where(F.col("src") != F.col("dst"))
    cos = F.round(cosine_batch(F.col("__va"), F.col("__vb")), 6)
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(),
                                          F.col("dst").asc())
    return (cand.withColumn("cosine", cos)
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .where(F.col("rank") <= k)
                .select("src", "dst", "cosine", "rank"))


def lsh_ann_multiprobe(queries: DataFrame, corpus: DataFrame, k: int = 5,
                       query_id: str = "q_id", corpus_id: str = "vec_id",
                       query_vec: str = "q_vec",
                       corpus_vec: str = "embedding",
                       n_planes: int = 8,
                       dim: int | None = None) -> DataFrame:
    """Multi-probe LSH ANN — the standard recall lever for
    :func:`lsh_ann`: each query probes its own bucket PLUS every bucket
    at Hamming distance 1 (one flipped sign bit), catching neighbors
    that fell just across a hyperplane. Candidate volume grows by at
    most ×(n_planes + 1) on the QUERY side only — the corpus is hashed
    once and never re-scanned, and since a corpus vector owns exactly
    one bucket and the probe set is distinct, each (query, candidate)
    pair arises at most once: no dedup shuffle. Same bucket-equi-join
    plan, deterministic end to end (oracle re-derives the probe set)."""
    cb = lsh_buckets(corpus, corpus_id, corpus_vec, n_planes, dim=dim)
    qb = (lsh_buckets(queries.withColumnRenamed(query_vec, corpus_vec),
                      query_id, corpus_vec, n_planes, dim=dim)
          .withColumnRenamed(corpus_vec, query_vec))
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("long")
          for p in range(n_planes)])
    qp = qb.select(query_id, query_vec,
                   F.explode(probes).alias("bucket"))
    cand = (cb.join(qp, "bucket")
              .where(F.col(query_id) != F.col(corpus_id)))
    cos = F.round(cosine_batch(F.col(query_vec), F.col(corpus_vec)), 6)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (cand.withColumn("cosine", cos)
                .withColumn("rank", F.row_number().over(w).cast("long"))
                .where(F.col("rank") <= k)
                .select(query_id, corpus_id, "cosine", "rank"))
