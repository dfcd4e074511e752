"""Similarity-search and multimodal queries (beyond-reference extensions).

Cosine arithmetic: both engines cast float32 elements to double and sum 64
products; accumulation-order ulp differences are absorbed by rounding to
6 dp *before* ranking/thresholding, so selected sets are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..operators import sampling as SAMP
from ..operators import similarity as SIM
from ..operators import video as VID
from ..registry import query
from ..sources.io import load_table

_DOT = ("SUM(CAST(c.embedding[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE))")
_NORM_C = "sqrt(SUM(pow(CAST(c.embedding[i] AS DOUBLE), 2)))"
_NORM_Q = "sqrt(SUM(pow(CAST(q.q_vec[i] AS DOUBLE), 2)))"


@query("sim_cosine_topk", oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, c.vec_id,
         round({_DOT} / ({_NORM_C} * {_NORM_Q}), 6) AS cosine
  FROM q
  CROSS JOIN embeddings c
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE q.q_id <> c.vec_id
  GROUP BY q.q_id, c.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5
""")
def cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 5 query vectors — the ANN
    baseline. Query set broadcasts; corpus scans once; JVM-side fold for
    the dot product (no UDF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.cosine_topk(queries, emb, k=5)


@query("sim_hard_negatives", oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
           FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.q_id, c.vec_id, c.label AS neg_label,
         round({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
  FROM q
  CROSS JOIN embeddings c
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE q.q_id <> c.vec_id AND q.q_label <> c.label
  GROUP BY q.q_id, c.vec_id, c.label
),
ranked AS (
  SELECT q_id, vec_id, neg_label, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, neg_label, cosine, rank FROM ranked WHERE rank <= 3
""")
def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: per query, the 3 most-similar vectors with a
    DIFFERENT label (`operators/similarity.hard_negatives`) — the
    contrastive-training batch-construction step."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 8)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec"),
                          F.col("label").alias("q_label")))
    return SIM.hard_negatives(queries, emb, k=3)


@query("emb_label_centroids", oracle="""
WITH flat AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim_idx,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
)
SELECT label, CAST(dim_idx AS INTEGER) AS dim_idx,
       round(AVG(v), 6) AS centroid,
       count(*) AS n_vectors
FROM flat GROUP BY 1, 2
""")
def label_centroids_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors, long form
    (`operators/similarity.label_centroids`) — class prototypes for
    centroid classification, cluster-drift monitoring, and
    prototype-based dedup."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.label_centroids(emb)


@query("emb_centroid_classify", oracle="""
WITH flat AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim_idx,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
),
cent AS (
  SELECT label, dim_idx, round(AVG(v), 6) AS c
  FROM flat GROUP BY 1, 2
),
cvecs AS (
  SELECT label AS plabel, list(c ORDER BY dim_idx) AS cvec
  FROM cent GROUP BY 1
),
scored AS (
  SELECT e.vec_id, e.label AS true_label, c.plabel,
         round(SUM(CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])
               / (sqrt(SUM(pow(CAST(e.embedding[i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(c.cvec[i], 2)))), 6) AS sim
  FROM embeddings e CROSS JOIN cvecs c
  CROSS JOIN generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id, e.label, c.plabel
),
assigned AS (
  SELECT vec_id, true_label, plabel FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, plabel ASC) = 1
)
SELECT true_label, plabel AS predicted_label, count(*) AS n
FROM assigned GROUP BY 1, 2
""")
def centroid_classify_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid confusion matrix over the embeddings table
    (`operators/similarity.centroid_classify`) — the embedding-quality /
    label-noise diagnostic; prototypes broadcast, corpus scans once."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.centroid_classify(emb)


@query("emb_centroid_outliers", oracle="""
WITH flat AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim_idx,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
),
cent AS (
  SELECT label, dim_idx, round(AVG(v), 6) AS c
  FROM flat GROUP BY 1, 2
),
cvecs AS (
  SELECT label AS clabel, list(c ORDER BY dim_idx) AS cvec
  FROM cent GROUP BY 1
),
scored AS (
  SELECT e.vec_id, e.label,
         round(SUM(CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])
               / (sqrt(SUM(pow(CAST(e.embedding[i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(c.cvec[i], 2)))), 6) AS sim
  FROM embeddings e JOIN cvecs c ON e.label = c.clabel
  CROSS JOIN generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id, e.label
),
n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
ranked AS (
  SELECT s.vec_id, s.label, s.sim,
         CAST(row_number() OVER (PARTITION BY s.label
                                 ORDER BY s.sim ASC, s.vec_id ASC)
              AS BIGINT) AS rank,
         n.n
  FROM scored s JOIN n USING (label)
)
SELECT vec_id, label, sim, rank,
       rank <= CAST(ceil(0.1 * n) AS BIGINT) AS prune
FROM ranked
""")
def centroid_outliers_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-distance pruning over the embeddings table
    (`operators/similarity.centroid_outliers`): each vector's cosine to
    its own class centroid, least-typical 10% of every class flagged —
    the embedding-space curation filter (SSL-prototypes / SemDeDup
    family) that catches mislabeled and off-topic examples before any
    pairwise stage. Centroids broadcast; corpus scans once."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.centroid_outliers(emb)


@query("sim_cosine_topk_many", oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id % 10 = 0),
scored AS (
  SELECT q.q_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
  FROM q
  CROSS JOIN embeddings c
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE q.q_id <> c.vec_id
  GROUP BY q.q_id, c.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, cosine, rank FROM ranked WHERE rank <= 3
""")
def cosine_topk_many_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 for a LARGE query set (every 10th vector) via the
    blocked matrix kernel (`operators/similarity.cosine_topk_blocked`):
    the query matrix broadcasts, each corpus partition emits only its
    local top-k per query, and no |Q|x|C| row set ever materializes —
    the exact-search shape that survives when the query side is too big
    for the broadcast-NL plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") % 10 == 0)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.cosine_topk_blocked(queries, emb, k=3)


_COS_EC = ("round(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))"
           " / (sqrt(SUM(pow(CAST(e.embedding[i] AS DOUBLE), 2)))"
           " * sqrt(SUM(pow(CAST(c.cvec[i] AS DOUBLE), 2)))), 6)")


_IVF_CTES = f"""cents AS (
  SELECT vec_id AS cell, embedding AS cvec FROM embeddings
  ORDER BY vec_id LIMIT 16
),
asg AS (
  SELECT e.vec_id, e.embedding, c.cell, {_COS_EC} AS sim
  FROM embeddings e CROSS JOIN cents c
  CROSS JOIN generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id, e.embedding, c.cell
),
assigned AS (
  SELECT vec_id, embedding, cell FROM asg
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, cell ASC) = 1
),
probes AS (
  SELECT vec_id AS q_id, embedding AS q_vec, cell FROM asg
  WHERE vec_id < 5
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, cell ASC) <= 3
),
cand AS (
  SELECT p.q_id, p.q_vec, a.vec_id, a.cell, a.embedding AS c_vec
  FROM probes p JOIN assigned a USING (cell)
  WHERE p.q_id <> a.vec_id
),
rr AS (
  SELECT d.q_id, d.vec_id, d.cell,
         round(SUM(CAST(d.c_vec[i] AS DOUBLE) * CAST(d.q_vec[i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(d.c_vec[i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(d.q_vec[i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM cand d CROSS JOIN generate_series(1, 64) AS t(i)
  GROUP BY d.q_id, d.vec_id, d.cell
)"""


@query("sim_ivf_seeded", oracle=f"""
WITH {_IVF_CTES}
SELECT q_id, vec_id, cell, cosine,
       row_number() OVER (PARTITION BY q_id
                          ORDER BY cosine DESC, vec_id ASC) AS rank
FROM rr
QUALIFY rank <= 5
""")
def ivf_seeded_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic IVF-flat ANN (seed-vector centroids, no training
    pass): assignment, probe selection, candidate join and ranking are
    all value-checked by an oracle re-deriving the identical pipeline —
    the oracle-green counterpart of the learned-KMeans `sim_ivf_ann`
    (same bucket-join plan, rows-only by contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.ivf_ann_seeded(queries, emb, k=5, n_lists=16, n_probe=3)


@query("sim_ivf_recall_eval", oracle=f"""
WITH {_IVF_CTES},
ann AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS r
  FROM rr QUALIFY r <= 5
),
exact_scored AS (
  SELECT q.vec_id AS q_id, c.vec_id,
         round(SUM(CAST(q.embedding[t.i] AS DOUBLE)
                   * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(q.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(c.embedding[t.i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM embeddings q
  CROSS JOIN embeddings c
  CROSS JOIN generate_series(1, 64) t(i)
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
),
exact AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS r
  FROM exact_scored QUALIFY r <= 5
)
SELECT e.q_id,
       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
       CAST(5 AS BIGINT) AS k,
       round(count(a.vec_id) / 5.0, 6) AS recall
FROM exact e
LEFT JOIN ann a ON e.q_id = a.q_id AND e.vec_id = a.vec_id
GROUP BY 1
""")
def ivf_recall_eval_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the seeded-IVF ANN (n_probe = 3 of 16 cells) against
    the exact top-k — the IVF counterpart of `sim_lsh_recall_eval`,
    fully value-checked: the oracle re-derives centroids, assignment,
    probes, both rankings and the hit join. The recall number itself is
    the n_probe tuning signal an IVF deployment watches."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    ann = (SIM.ivf_ann_seeded(queries, emb, k=5, n_lists=16, n_probe=3)
           .select("q_id", "vec_id"))
    exact = (SIM.cosine_topk(queries, emb, k=5)
             .select("q_id", "vec_id"))
    hit = exact.join(ann.withColumn("__hit", F.lit(1)),
                     ["q_id", "vec_id"], "left")
    return (hit.groupBy("q_id")
            .agg(F.count("__hit").alias("n_hit"),
                 F.lit(5).cast("long").alias("k"),
                 F.round(F.count("__hit") / 5.0, 6).alias("recall")))


@query("sim_quantized_topk", oracle=f"""
WITH z AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) / 127 AS s
  FROM embeddings
),
qz AS (
  SELECT vec_id, embedding, s,
         CASE WHEN s = 0
              THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) / s) AS BIGINT))
         END AS q
  FROM z
),
qs AS (SELECT vec_id AS q_id, embedding AS q_vec, s AS q_s, q AS q_q
       FROM qz WHERE vec_id < 5),
cand AS (
  SELECT q.q_id, c.vec_id, c.embedding AS c_vec, q.q_vec,
         round(q.q_s * c.s * CAST(SUM(q.q_q[i] * c.q[i]) AS DOUBLE), 6)
           AS approx_score
  FROM qs q CROSS JOIN qz c CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE q.q_id <> c.vec_id
  GROUP BY q.q_id, c.vec_id, c.embedding, q.q_vec, q.q_s, c.s
),
shortlist AS (
  SELECT q_id, vec_id, c_vec, q_vec, approx_score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY approx_score DESC, vec_id ASC) AS arank
  FROM cand
),
rr AS (
  SELECT s.q_id, s.vec_id, s.approx_score,
         round(SUM(CAST(s.c_vec[i] AS DOUBLE) * CAST(s.q_vec[i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(s.c_vec[i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(s.q_vec[i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM shortlist s CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE s.arank <= 20
  GROUP BY s.q_id, s.vec_id, s.approx_score
),
ranked AS (
  SELECT q_id, vec_id, approx_score, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rr
)
SELECT q_id, vec_id, approx_score, cosine, rank FROM ranked WHERE rank <= 5
""")
def quantized_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: int8-range quantized dot-product shortlist (4×
    oversample), exact cosine rerank — the storage/bandwidth-efficient
    search shape for billion-vector corpora
    (`operators/similarity.quantized_topk`). Integer shortlist scores
    are exactly reproducible cross-engine; the oracle re-derives the
    full quantize → shortlist → rerank pipeline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.quantized_topk(queries, emb, k=5, oversample=4)


# Banded-LSH candidate generation shared by sim_cosine_pairs and the
# dedup_semantic_clusters family: deterministic hyperplanes (seed
# 'cdps-pairs'), n_bands × band_bits sign bits, candidates = band-value
# collisions, exact cosine within candidates. The oracle re-derives the
# identical planes/bands/candidates in SQL, so the whole approximate
# pipeline is value-checked end-to-end.
def _banded_pairs_cte(n_bands: int, band_bits: int, threshold: float,
                      h_max: int | None = None,
                      table: str = "embeddings") -> str:
    n_planes = n_bands * band_bits
    # optional sign-bit Hamming sketch prefilter (mirrors
    # lsh_band_pairs(prefilter_margin=...): integer cutoff, exact in
    # both engines)
    ham_cte = "" if h_max is None else f""",
candh AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN bands ba ON ba.vec_id = c.id_a
  JOIN bands bb ON bb.vec_id = c.id_b AND bb.band = ba.band
  GROUP BY 1, 2
  HAVING SUM(bit_count(xor(ba.val, bb.val))) <= {h_max}
)"""
    cand_src = "cand" if h_max is None else "candh"
    return f"""
planes AS (
  SELECT p, i,
         ((CAST(('0x' || substr(md5('cdps-pairs:' || CAST(p AS VARCHAR) || ':'
                                 || CAST(i - 1 AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2001) - 1000) / 1000.0 AS w
  FROM generate_series(0, {n_planes - 1}) tp(p), generate_series(1, 64) ti(i)
),
dots AS (
  SELECT e.vec_id, pl.p,
         SUM(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w) AS d
  FROM {table} e, planes pl
  GROUP BY 1, 2
),
bands AS (
  SELECT vec_id, p // {band_bits} AS band,
         CAST(SUM(CASE WHEN d >= 0 THEN (1 << (p % {band_bits})) ELSE 0 END)
              AS BIGINT) AS val
  FROM dots GROUP BY vec_id, p // {band_bits}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.vec_id < b.vec_id
){ham_cte},
pairs AS (
  SELECT cand.id_a, cand.id_b,
         round(SUM(CAST(a.embedding[t.i] AS DOUBLE)
                   * CAST(b.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(a.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(b.embedding[t.i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM {cand_src} AS cand
  JOIN {table} a ON a.vec_id = cand.id_a
  JOIN {table} b ON b.vec_id = cand.id_b
  CROSS JOIN generate_series(1, 64) t(i)
  GROUP BY 1, 2
  HAVING round(SUM(CAST(a.embedding[t.i] AS DOUBLE)
                   * CAST(b.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(a.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(b.embedding[t.i] AS DOUBLE), 2)))), 6)
          >= {threshold}
)
"""


# Deterministic near-duplicate twins (operators/similarity.py
# seed_near_duplicates): id + (1 + max corpus id) — the same broadcast
# scalar the engine derives, so twin ids never collide with real ids
# at any corpus scale — each float component scaled by (1 ± 0.05) with
# the sign from md5('cdps-twin:id:j'), j 0-based, cast back to FLOAT —
# guaranteed cos ≥ (1-ε)/(1+ε) ≈ 0.905 vs the source row, every step
# IEEE-exact in both engines.
_SEEDED_EMB_CTE = """seeded AS (
  SELECT e.vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
         list(CAST(CAST(e.embedding[t.i] AS DOUBLE)
                   * (1.0 + 0.05 * (CASE WHEN
                        CAST(('0x' || substr(md5('cdps-twin:'
                             || CAST(e.vec_id AS VARCHAR) || ':'
                             || CAST(t.i - 1 AS VARCHAR)), 1, 8))
                           AS BIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END))
              AS FLOAT) ORDER BY t.i) AS embedding
  FROM embeddings e CROSS JOIN generate_series(1, 64) t(i)
  WHERE e.vec_id < (SELECT MIN(vec_id) + 40 FROM embeddings)
  GROUP BY e.vec_id
),
emb_seeded AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id, embedding FROM seeded
)"""


# production-dedup parameterization: suggest_bands(0.6) → 34 bands of
# 7 sign bits (238 planes) — the selective-band regime (background
# collision rate 2^-7 per band vs 2^-2 above) — plus the sign-bit
# Hamming sketch prefilter at 2.33σ of sketch noise above the
# threshold's expected Hamming:
# h_max = floor(238·acos(0.6)/π + 2.33·sqrt(238·p·(1−p))) = 86
# (p = acos(0.6)/π; ~1% one-sided loss for pairs EXACTLY at θ, nil
# above). Pinned literally for oracle stability.
_BANDED_PAIRS_CTE_SELECTIVE = _banded_pairs_cte(34, 7, 0.6, h_max=86,
                                                table="emb_seeded")


# sim_cosine_pairs parameterization: suggest_bands(0.5) → 33 bands ×
# 6 sign bits (198 planes), sign-sketch Hamming prefilter at 2.33σ →
# h_max = floor(198·acos(0.5)/π + 2.33·sqrt(198·(1/3)(2/3))) = 81.
# Pinned literally for oracle stability. The corpus is salted with
# the deterministic twins so the check has teeth at every sf.
_BANDED_PAIRS_CTE_05 = _banded_pairs_cte(33, 6, 0.5, h_max=81,
                                         table="emb_seeded")


@query("sim_cosine_pairs", oracle=f"""
WITH {_SEEDED_EMB_CTE.strip()},
{_BANDED_PAIRS_CTE_05.strip()}
SELECT id_a, id_b, cosine FROM pairs
""")
def cosine_pairs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.5) via banded LSH candidate
    generation — a (band, value) equi-join whose cost tracks collisions,
    never |n|². The banding is the SELECTIVE regime `suggest_bands(0.5)`
    picks (33 bands × 6 bits: background collision 2⁻⁶ per band, recall
    ≥ 0.95 at the threshold) plus the packed sign-sketch Hamming
    prefilter — the parameterization whose candidate volume stays far
    from all-pairs as the corpus grows; the old exploratory θ=0.4 16×2
    case (which `lsh_band_pairs`' cost-honesty note warns degrades
    toward all-pairs) lives on only as the `dedup_semantic_eval`
    evaluator. Deterministic near-dup twins
    (`seed_near_duplicates`, cos ≥ 0.905) keep the oracle row
    non-vacuous at every scale factor; brute force stays in tests as
    the recall verifier (`SIM.cosine_pairs`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = SIM.seed_near_duplicates(emb, n_seed=40)
    return SIM.lsh_band_pairs(corpus, threshold=0.5, n_bands=33,
                              band_bits=6, dim=64, prefilter_sigma=2.33)


_LSH_BUCKET_CTES = """planes AS (
  SELECT p, i,
         ((CAST(('0x' || substr(md5('cdps:' || CAST(p AS VARCHAR) || ':'
                                 || CAST(i - 1 AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2001) - 1000) / 1000.0 AS w
  FROM generate_series(0, 5) tp(p), generate_series(1, 64) ti(i)
),
dots AS (
  SELECT e.vec_id, pl.p,
         SUM(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w) AS d
  FROM embeddings e, planes pl
  GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN d >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM dots GROUP BY 1
)"""

_LSH_CTES = _LSH_BUCKET_CTES + """,
cand AS (
  SELECT qb.vec_id AS q_id, cb.vec_id AS vec_id, qb.bucket
  FROM buckets qb
  JOIN buckets cb ON qb.bucket = cb.bucket
  WHERE qb.vec_id < 20 AND cb.vec_id <> qb.vec_id
),
scored AS (
  SELECT cand.q_id, cand.vec_id, cand.bucket,
         round(SUM(CAST(q.embedding[t.i] AS DOUBLE)
                   * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(q.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(c.embedding[t.i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.q_id
  JOIN embeddings c ON c.vec_id = cand.vec_id
  CROSS JOIN generate_series(1, 64) t(i)
  GROUP BY 1, 2, 3
)"""


@query("sim_lsh_ann", oracle=f"""
WITH {_LSH_CTES}
SELECT q_id, vec_id, bucket, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, vec_id ASC) AS BIGINT)
         AS rank
FROM scored
QUALIFY rank <= 3
""")
def lsh_ann_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: deterministic md5-derived planes bucket
    the corpus; candidates come from bucket collisions only. Approximate
    *recall* by construction, but fully deterministic — so the oracle
    re-derives the identical planes (same md5 → [-1,1) quantization),
    buckets, candidate set, and ranking in SQL, and the whole approximate
    pipeline is value-checked, not just row-counted."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 20)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.lsh_ann(queries, emb, k=3, n_planes=6, dim=64)


@query("sim_knn_graph", oracle=f"""
WITH {_LSH_BUCKET_CTES},
cand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT cand.src, cand.dst,
         round(SUM(CAST(q.embedding[t.i] AS DOUBLE)
                   * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(q.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(c.embedding[t.i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.src
  JOIN embeddings c ON c.vec_id = cand.dst
  CROSS JOIN generate_series(1, 64) t(i)
  GROUP BY 1, 2
)
SELECT src, dst, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY src
                               ORDER BY cosine DESC, dst ASC) AS BIGINT)
         AS rank
FROM scored
QUALIFY rank <= 4
""")
def knn_graph_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN graph (`operators/similarity.
    knn_graph`): one hashing pass, a bucket SELF-join (the corpus is
    both sides), exact cosine + per-source ranking within candidates —
    the SemDeDup-style curation primitive. Deterministic hyperplanes
    (seed 'cdps', 6 planes) let the oracle re-derive buckets, candidate
    edges, cosines and ranks identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.knn_graph(emb, k=4, n_planes=6, dim=64)


@query("sim_lsh_multiprobe", oracle=f"""
WITH {_LSH_BUCKET_CTES},
probes AS (
  SELECT vec_id AS q_id,
         unnest(list_prepend(bucket,
                list_transform(range(6), p -> xor(bucket, 1 << p))))
           AS bucket
  FROM buckets WHERE vec_id < 20
),
cand AS (
  SELECT p.q_id, cb.vec_id
  FROM probes p
  JOIN buckets cb ON p.bucket = cb.bucket
  WHERE cb.vec_id <> p.q_id
),
scored AS (
  SELECT cand.q_id, cand.vec_id,
         round(SUM(CAST(q.embedding[t.i] AS DOUBLE)
                   * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(q.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(c.embedding[t.i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.q_id
  JOIN embeddings c ON c.vec_id = cand.vec_id
  CROSS JOIN generate_series(1, 64) t(i)
  GROUP BY 1, 2
)
SELECT q_id, vec_id, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, vec_id ASC) AS BIGINT)
         AS rank
FROM scored
QUALIFY rank <= 3
""")
def lsh_multiprobe_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (`operators/similarity.lsh_ann_multiprobe`):
    every query also probes the n_planes Hamming-1 buckets, closing
    most of single-probe's recall gap for one extra bucket-join fan-out
    on the query side only. Deterministic probe set — the oracle
    re-derives planes, buckets, probes, candidates and ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 20)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.lsh_ann_multiprobe(queries, emb, k=3, n_planes=6, dim=64)


@query("sim_lsh_recall_eval", oracle=f"""
WITH {_LSH_CTES},
ann AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS r
  FROM scored QUALIFY r <= 3
),
exact_scored AS (
  SELECT q.vec_id AS q_id, c.vec_id,
         round(SUM(CAST(q.embedding[t.i] AS DOUBLE)
                   * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(pow(CAST(q.embedding[t.i] AS DOUBLE), 2)))
                  * sqrt(SUM(pow(CAST(c.embedding[t.i] AS DOUBLE), 2)))), 6)
           AS cosine
  FROM embeddings q
  CROSS JOIN embeddings c
  CROSS JOIN generate_series(1, 64) t(i)
  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
),
exact AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS r
  FROM exact_scored QUALIFY r <= 3
)
SELECT e.q_id,
       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
       CAST(3 AS BIGINT) AS k,
       round(count(a.vec_id) / 3.0, 6) AS recall
FROM exact e
LEFT JOIN ann a ON e.q_id = a.q_id AND e.vec_id = a.vec_id
GROUP BY 1
""")
def lsh_recall_eval_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the LSH ANN path against the exact broadcast top-k,
    per query — the evaluation harness an ANN deployment runs before
    trading exactness for scale (the `dedup_minhash_eval` pattern
    applied to vectors). Both pipelines are deterministic, so even the
    *approximation quality* is value-checked: the oracle re-derives
    planes, buckets, candidates, both rankings and the recall join."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 20)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    ann = (SIM.lsh_ann(queries, emb, k=3, n_planes=6, dim=64)
           .select("q_id", "vec_id"))
    exact = (SIM.cosine_topk(queries, emb, k=3)
             .select("q_id", "vec_id"))
    hit = exact.join(ann.withColumn("__hit", F.lit(1)),
                     ["q_id", "vec_id"], "left")
    return (hit.groupBy("q_id")
            .agg(F.count("__hit").alias("n_hit"),
                 F.lit(3).cast("long").alias("k"),
                 F.round(F.count("__hit") / 3.0, 6).alias("recall")))


# --- multimodal plumbing (binary payloads) ----------------------------------

@query("mm_decode", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS bytes
  FROM pay
)
SELECT media_id, 'image/fake' AS media_type,
       CAST(len(bytes) AS BIGINT) AS n_bytes,
       CAST(16 + len(bytes) % 64 AS INTEGER) AS width,
       CAST(16 + (len(bytes) // 64) % 64 AS INTEGER) AS height,
       CASE WHEN len(bytes) = 0 THEN 0.0
            ELSE CAST(list_sum(bytes) AS DOUBLE) / len(bytes) END
         AS mean_intensity
FROM pb
""")
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode via mapInPandas (stubbed codec, real
    distributed plumbing): documents → opaque payloads → typed
    metadata. The stub's outputs are deterministic byte arithmetic, so
    the oracle re-derives them from hex(encode(text)) and the decode
    path is value-checked end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs, "doc_id", "text", media_type="image/fake")
    return MM.decode_media(media)


@query("mm_decode_real", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (  -- synthesize_media substitutes b'\\x00' for empty text
  SELECT media_id,
         CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
sig AS (
  SELECT media_id, bytes,
         -- np.resize cycles the byte array to the target length
         list_transform(range(256),
           i -> bytes[CAST(i % len(bytes) AS INT) + 1]) AS px,
         list_transform(range(400),
           i -> (bytes[CAST(i % len(bytes) AS INT) + 1] - 128) * 256)
           AS samples
  FROM b
)
SELECT media_id,
       CASE WHEN media_id % 2 = 0 THEN 'image/x-portable-graymap'
            ELSE 'audio/wav' END AS media_type,
       -- PGM: 13-byte header + 256 pixels; WAV: 44-byte RIFF header
       -- + 400 i16 samples
       CASE WHEN media_id % 2 = 0 THEN CAST(269 AS BIGINT)
            ELSE CAST(844 AS BIGINT) END AS n_bytes,
       CASE WHEN media_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       CASE WHEN media_id % 2 = 0 THEN 16 END AS width,
       CASE WHEN media_id % 2 = 0 THEN 16 END AS height,
       CASE WHEN media_id % 2 = 0 THEN 1 ELSE 1 END AS n_channels,
       CASE WHEN media_id % 2 = 1 THEN 8000 END AS sample_rate,
       CASE WHEN media_id % 2 = 1 THEN CAST(400 AS BIGINT) END
         AS n_samples,
       CASE WHEN media_id % 2 = 0
            THEN CAST(list_sum(px) AS DOUBLE) / 256.0
            ELSE sqrt(CAST(list_sum(list_transform(samples, x -> x * x))
                           AS DOUBLE) / 400.0) END AS mean_value
FROM sig
""")
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round trip, no external media libraries: documents are
    rendered into genuine containers (even ids → binary PGM images, odd
    ids → 16-bit PCM WAV clips) and decoded back by the pure-python
    netpbm/WAVE parsers (`operators/multimodal.decode_media_real`) —
    actual pixel means and RMS amplitudes, not byte statistics. The
    decode plan is the same Arrow mapInPandas shape as the stub."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_media(docs, "doc_id", "text")
    return MM.decode_media_real(media)


@query("mm_decode_png", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
px AS (
  SELECT media_id,
         CASE WHEN media_id % 3 = 0 THEN 3 ELSE 1 END AS ch,
         list_transform(
           range(256 * (CASE WHEN media_id % 3 = 0 THEN 3 ELSE 1 END)),
           i -> CASE WHEN media_id % 11 = 1 AND media_id % 3 != 0
                THEN bytes[CAST(i % len(bytes) AS INT) + 1] // 16
                ELSE bytes[CAST(i % len(bytes) AS INT) + 1] END) AS pixels
  FROM b
)
SELECT media_id, 'image/png' AS media_type, 'image' AS kind,
       16 AS width, 16 AS height, CAST(ch AS INTEGER) AS n_channels,
       CAST(list_sum(pixels) AS DOUBLE) / (256.0 * ch) AS mean_value
FROM px
""")
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG round trip through a REAL compressed container, no external
    media libraries: documents render into genuine PNGs (pixels = the
    cycled text bytes; every third id truecolor; scanline filter type
    cycles None/Sub/Up/Average/Paeth on media_id % 5; every 7th id
    Adam7-interlaced — same pixels, so the same oracle pins the
    interlace path; every grayscale id with media_id % 11 == 1 written
    4-BIT with pixels = the high nibble, so the sub-byte unpack path
    sits under the same value oracle as `byte // 16`) and decode back
    through zlib + full unfiltering (`operators/multimodal.decode_png`).
    The oracle re-derives the decoded pixel mean straight from the text
    bytes — if any of the four non-trivial unfilters were wrong, the
    pixels (hence the mean, hence the hash) would differ. n_bytes is
    excluded from the projection: the zlib-compressed container length
    is not SQL-re-derivable, and the value check should pin pixels,
    not compressor versions."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_png(docs, "doc_id", "text", subbyte_every=11)
    return (MM.decode_media_real(media)
              .select("media_id", "media_type", "kind", "width",
                      "height", "n_channels", "mean_value"))


@query("mm_decode_jpeg", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
blocks AS (
  SELECT media_id,
         list_transform(range(16),
                        k -> bytes[CAST(k % len(bytes) AS INT) + 1]) AS v
  FROM b
)
SELECT media_id, 'image/jpeg' AS media_type, 'image' AS kind,
       32 AS width, 32 AS height, CAST(1 AS INTEGER) AS n_channels,
       CAST(list_sum(v) AS DOUBLE) / 16.0 AS mean_value
FROM blocks
""")
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG round trip through a REAL entropy-coded container, no
    external media libraries: documents render into genuine JFIF
    JPEGs (sixteen 8×8 block-constant tiles = the cycled text bytes,
    Annex-K Huffman tables, restart markers every 3 MCUs, DC quant step
    8 so constant blocks round-trip exactly; every id with
    media_id % 5 == 2 written PROGRESSIVE — SOF2 with interleaved DC
    first/refinement scans, spectral AC bands, EOB runs — same pixels,
    same exactness) and decode back through the full marker-parse →
    canonical-Huffman → DC-prediction → dequantize → IDCT path
    (`operators/jpeg.py`, Annex F baseline + Annex G progressive). The
    oracle re-derives the decoded mean straight from the text bytes — a
    wrong Huffman code, a missed RSTn predictor reset, a misplaced
    refinement bit, or a wrong IDCT scale shifts pixels, hence the
    mean, hence the hash. n_bytes excluded: the entropy-coded length
    pins the encoder, not the decoder."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_jpeg(docs, "doc_id", "text",
                               progressive_every=5)
    return (MM.decode_media_real(media)
              .select("media_id", "media_type", "kind", "width",
                      "height", "n_channels", "mean_value"))


@query("mm_video_frames", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
fr AS (SELECT f FROM (VALUES (0), (2), (4)) t(f))
SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
       16 AS width, 16 AS height,
       (bytes[CAST((4*f + 0) % len(bytes) AS INT) + 1]
        + bytes[CAST((4*f + 1) % len(bytes) AS INT) + 1]
        + bytes[CAST((4*f + 2) % len(bytes) AS INT) + 1]
        + bytes[CAST((4*f + 3) % len(bytes) AS INT) + 1]) / 4.0
         AS frame_mean
FROM b, fr
""")
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path, no external media libraries: documents render
    into MJPEG AVIs (six 16×16 block-constant baseline-JPEG frames, the
    tiles cycling the text bytes; idx1 index present and validated) and
    every 2nd frame is sampled and DECODED back through the RIFF walk +
    full JPEG path (`operators/video.py`). Row-multiplying frame
    sampling — the UDTF shape of a video curation pipeline — with the
    oracle re-deriving every sampled frame's pixel mean from the text
    bytes: a wrong movi walk, off-by-one frame sampling, a bad idx1
    validation or any JPEG-path slip shifts frame_mean and the hash.
    Skipped frames are never entropy-decoded, so the sampling factor
    divides decode cost at scale."""
    docs = load_table(spark, sf_dir, "documents")
    media = VID.synthesize_avi_mjpeg(docs, "doc_id", "text", n_frames=6)
    return VID.decode_video_frames(media, every_n=2)


@query("mm_decode_gif", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
fmean AS (
  SELECT media_id, f,
         CAST(list_sum(list_transform(range(256),
              i -> bytes[CAST((i + f) % len(bytes) AS INT) + 1]))
              AS DOUBLE) / 256.0 AS fm
  FROM b, (SELECT unnest(range(4)) AS f) fr
  WHERE media_id % 5 = 1 OR f = 0
)
SELECT b.media_id,
       CASE WHEN b.media_id % 5 = 1 THEN 'video' ELSE 'image' END AS kind,
       16 AS width, 16 AS height,
       CASE WHEN b.media_id % 5 = 1 THEN NULL
            ELSE CAST(3 AS INTEGER) END AS n_channels,
       CASE WHEN b.media_id % 5 = 1 THEN CAST(4 AS BIGINT)
            ELSE NULL END AS n_samples,
       avg(fm) AS mean_value
FROM b JOIN fmean ON fmean.media_id = b.media_id
GROUP BY 1, 2, 3, 4, 5, 6
""")
def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF round trip through REAL LZW compression, no external media
    libraries: documents render into genuine GIFs (pixels = the cycled
    text bytes through a 256-gray palette; every 7th id row-INTERLACED
    — same pixels, so the 4-pass reorder sits under the same mean;
    every 5th id an ANIMATED 4-frame GIF89a, frame f cycling from
    offset f) and decode back through the block walk + variable-width
    LZW + palette path (`operators/gif.py`). Palette round trips are
    LOSSLESS, so the oracle re-derives every mean exactly — byte sums
    over 2^8 divisors keep both engines bit-identical. A wrong code-
    width growth point, a bad KwKwK expansion, a mis-ordered interlace
    pass or an off-by-one frame offset all shift the hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_gif(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "width", "height",
                      "n_channels", "n_samples", "mean_value"))


@query("mm_decode_bmp", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
px AS (
  SELECT media_id,
         CASE WHEN media_id % 3 = 0 THEN 3 ELSE 1 END AS n,
         list_transform(
           range(256 * (CASE WHEN media_id % 3 = 0 THEN 3 ELSE 1 END)),
           i -> bytes[CAST(i % len(bytes) AS INT) + 1]) AS pixels
  FROM b
)
SELECT media_id, 'image' AS kind, 16 AS width, 16 AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(list_sum(pixels) AS DOUBLE) / (256.0 * n) AS mean_value
FROM px
""")
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP round trip: documents render into genuine DIBs — every 3rd
    id 24-bit BGR, the rest 8-bit through a grayscale palette, every
    2nd id stored TOP-DOWN (the rest bottom-up, so a wrong row order
    decodes wrong pixels) — and decode back through
    `operators/bmp.py`. The oracle re-derives the mean from the text
    bytes; the mean is orientation-invariant by design, so the
    row-order correctness is pinned per pixel in unit tests while the
    hash pins palette expansion, BGR ordering and stride padding."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_bmp(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "width", "height",
                      "n_channels", "mean_value"))


@query("mm_decode_tiff", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
px AS (
  SELECT media_id, media_id % 5 AS c,
         CASE WHEN media_id % 5 = 0 THEN 768 ELSE 256 END AS n
  FROM b
)
SELECT px.media_id, 'image' AS kind, 16 AS width, 16 AS height,
       CAST(CASE WHEN c IN (0, 2) THEN 3 ELSE 1 END AS INTEGER)
         AS n_channels,
       CASE WHEN c = 3 THEN 257.0 ELSE 1.0 END
         * CAST(list_sum(list_transform(range(n),
               i -> bytes[CAST(i % len(bytes) AS INT) + 1])) AS DOUBLE)
         / n AS mean_value
FROM px JOIN b ON b.media_id = px.media_id
""")
def multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF round trip through the full baseline support matrix, no
    external media libraries: documents render into genuine classic
    TIFFs across five residue classes — RGB uncompressed, gray
    LZW+Predictor-2 TILED (real early-change variable-width
    streams), palette PackBits, 16-bit big-endian Deflate (samples
    byte*257, so the mean is exactly 257× the byte mean — a wrong
    byte order or sample width shifts it), and WhiteIsZero big-endian
    (inverted samples stored; ignoring the photometric reads wrong
    pixels) — and decode back through the IFD walk + strip assembly in
    ``operators/tiff.py``. All classes are lossless, so the oracle
    re-derives every mean from the text bytes; a wrong LZW width
    change point, PackBits run length, predictor cumsum, ColorMap
    scaling or strip boundary shifts the hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_tiff(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "width", "height",
                      "n_channels", "mean_value"))


@query("mm_decode_webp", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
m AS (
  SELECT media_id, media_id % 5 AS c,
         CAST(list_sum(list_transform(range(256),
              i -> bytes[CAST(i % len(bytes) AS INT) + 1]))
              AS DOUBLE) AS s0,
         CAST(list_sum(list_transform(range(256),
              i -> bytes[CAST((i+1) % len(bytes) AS INT) + 1]))
              AS DOUBLE) AS s1,
         CAST(list_sum(list_transform(range(256),
              i -> bytes[CAST((i+2) % len(bytes) AS INT) + 1]))
              AS DOUBLE) AS s2,
         CAST(list_sum(list_transform(range(256),
              i -> 17 * (bytes[CAST(i % len(bytes) AS INT) + 1] % 16)))
              AS DOUBLE) AS sp
  FROM b
)
SELECT media_id, 'image' AS kind, 16 AS width,
       CAST(CASE WHEN c = 4 THEN 32 ELSE 16 END AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS n_channels,
       CASE WHEN c = 1 THEN (s0 + s1 + s2) / 768.0
            WHEN c = 3 THEN sp / 256.0
            ELSE s0 / 256.0 END AS mean_value
FROM m
""")
def multimodal_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP lossless (VP8L) round trip through genuinely entropy-coded
    streams, no external media libraries: documents render into real
    RIFF/WEBP containers across five residue classes — plain prefix-
    coded literals; SUBTRACT-GREEN with per-channel phase shifts (the
    inverse transform must add green back); a 4-bit COLOR CACHE
    (0x1e35a7bd hash hits come back as cache symbols); a 16-color
    COLOR-INDEXING palette with 4-bit pixel bundling and the
    delta-coded palette; and LZ77 row copies through 2D distance code
    1 — then decode back through the canonical-prefix-code machinery
    in ``operators/webp.py``. VP8L is lossless, so the oracle
    re-derives every mean from the text bytes; a wrong canonical code
    assignment, code-length RLE, cache hash, palette cumsum, bundle
    unpack or backward-reference offset shifts the hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_webp(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "width", "height",
                      "n_channels", "mean_value"))


@query("mm_decode_flac", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
m AS (
  SELECT media_id, media_id % 4 AS c,
         CASE media_id % 4 WHEN 0 THEN 512 WHEN 1 THEN 768
              WHEN 2 THEN 1024 ELSE 1280 END AS n,
         list_sum(list_transform(range(
             CASE media_id % 4 WHEN 0 THEN 512 WHEN 1 THEN 768
                  ELSE 1024 END),
           i -> (bytes[CAST(i % len(bytes) AS INT) + 1] - 128)
              * (bytes[CAST(i % len(bytes) AS INT) + 1] - 128)))
           AS ss0,
         list_sum(list_transform(range(768),
           i -> (bytes[CAST((i+1) % len(bytes) AS INT) + 1] - 128)
              * (bytes[CAST((i+1) % len(bytes) AS INT) + 1] - 128)))
           AS ss1,
         (bytes[1] - 128) * (bytes[1] - 128) AS c0sq
  FROM b
)
SELECT media_id, 'audio' AS kind,
       CAST(CASE WHEN c = 1 THEN 2 ELSE 1 END AS INTEGER)
         AS n_channels,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CASE WHEN c = 3 THEN sqrt(CAST(65536 * c0sq AS DOUBLE))
            WHEN c = 1 THEN
              sqrt(CAST(65536 * (ss0 + ss1) AS DOUBLE) / 1536.0)
            ELSE sqrt(CAST(65536 * ss0 AS DOUBLE) / n) END
         AS mean_value
FROM m
""")
def multimodal_decode_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC round trip through genuinely Rice-coded frames with real
    CRC-8/CRC-16 checks, no external audio libraries: documents render
    into real FLAC streams across four residue classes — mono FIXED-2
    with Rice partition order 2; stereo LEFT/SIDE decorrelation with
    FIXED-1 (the side channel carries +1 bit depth); mono LPC
    subframes with escaped raw partitions; mono CONSTANT subframes —
    then decode back through the frame walk in ``operators/flac.py``.
    FLAC is lossless, so the oracle re-derives every clip's RMS from
    the text bytes: a wrong Rice parameter width, zigzag fold,
    finite-difference reconstruction, stereo reassembly or coded
    frame number shifts the hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_flac(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "n_channels", "sample_rate",
                      "n_samples", "mean_value"))


@query("mm_exif_metadata", oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
       CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
       'Acme Imaging ' || CAST(doc_id % 5 AS VARCHAR) AS make,
       'Model X' || CAST(doc_id % 13 AS VARCHAR) AS model,
       printf('2023:%02d:%02d %02d:00:00',
              CAST(1 + doc_id % 12 AS INT), CAST(1 + doc_id % 28 AS INT),
              CAST(doc_id % 24 AS INT)) AS datetime,
       CAST(100 * (1 + doc_id % 32) AS INTEGER) AS iso,
       1.0 / (1 + doc_id % 2000) AS exposure_s,
       (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END)
         * ((doc_id % 90) + ((doc_id % 60) / 60.0)
            + (((doc_id * 7) % 600) / 10.0) / 3600.0) AS lat,
       (CASE WHEN doc_id % 4 < 2 THEN 1 ELSE -1 END)
         * ((doc_id % 180) + (((doc_id * 3) % 60) / 60.0)
            + (((doc_id * 11) % 600) / 10.0) / 3600.0) AS lon
FROM documents
""")
def multimodal_exif_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF extraction WITHOUT pixel decode — the screening projection
    a media curation run filters on (orientation fixing, camera
    attribution, timestamp bucketing, GPS geofencing) before paying
    for any decompression. Documents render into real JPEGs, a real
    APP1 ``Exif\\0\\0`` segment is inserted (TIFF-structured IFD0 →
    Exif/GPS sub-IFDs, out-of-line ASCII and RATIONAL values, every
    odd id BIG-endian "MM"), and ``operators/exif.py`` walks the
    marker stream and IFD chain back out. The oracle re-derives every
    field arithmetically from the id: a wrong byte order, IFD offset,
    rational layout, or hemisphere sign shifts the hash.

    Render + EXIF attach fuse into ONE synthesis kernel
    (``post=exif_jpeg_post``, byte-identical to the two-stage
    ``attach_exif`` composition — test-pinned): the query's sf0.1 cost
    is the per-Python-stage framework floor, so the third mapInPandas
    stage paid a full payload JVM↔Python round trip for ~0.1 s of
    kernel CPU (guide §4). The parse stage — the operator under test —
    stays its own kernel."""
    from ..operators.exif import exif_jpeg_post, exif_metadata
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_jpeg(docs, "doc_id", "text",
                               post=exif_jpeg_post)
    return (exif_metadata(media)
            .select("media_id", "byte_order", "orientation", "make",
                    "model", "datetime", "iso", "exposure_s",
                    "lat", "lon"))


@query("mm_decode_audio_formats", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
codes AS (
  SELECT media_id, media_id % 4 AS c, i,
         bytes[CAST(i % len(bytes) AS INT) + 1] AS bv
  FROM b, (SELECT unnest(range(600)) AS i) r
  WHERE i < CASE WHEN media_id % 4 <= 1 THEN 600 ELSE 400 END
),
expanded AS (
  SELECT media_id, c, bv, 255 - bv AS uu, xor(bv, 85) AS aa
  FROM codes
),
sval AS (
  SELECT media_id, c,
         CASE c
           WHEN 0 THEN CASE WHEN uu >= 128 THEN 132 - ut
                            ELSE ut - 132 END
           WHEN 1 THEN CASE WHEN aa >= 128 THEN at ELSE -at END
           WHEN 2 THEN (bv - 128) * 256
           ELSE (bv - 128) * 256 + bv
         END AS v
  FROM (SELECT *,
          ((uu % 16) * 8 + 132) * (1 << ((uu // 16) % 8)) AS ut,
          CASE WHEN (aa // 16) % 8 = 0 THEN (aa % 16) * 16 + 8
               WHEN (aa // 16) % 8 = 1 THEN (aa % 16) * 16 + 264
               ELSE ((aa % 16) * 16 + 264)
                    * (1 << (((aa // 16) % 8) - 1))
          END AS at
        FROM expanded) t
)
SELECT media_id, 'audio' AS kind, CAST(1 AS INTEGER) AS n_channels,
       CAST(CASE c WHEN 2 THEN 22050 WHEN 3 THEN 44100
            ELSE 8000 END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN c <= 1 THEN 600 ELSE 400 END AS BIGINT)
         AS n_samples,
       sqrt(CAST(sum(v * v) AS DOUBLE)
            / CASE WHEN c <= 1 THEN 600 ELSE 400 END) AS mean_value
FROM sval GROUP BY media_id, c
""")
def multimodal_decode_audio_formats(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Audio container breadth round trip: documents render into
    μ-law WAV (G.711 tag 7 — the code bytes ARE the text bytes),
    A-law WAV (tag 6), big-endian AIFF PCM-16 (real 80-bit
    extended sample-rate field), and 24-bit PCM WAV with all three
    byte lanes carrying signal, then decode back through
    ``operators/audio.py``. The oracle re-derives each clip's RMS
    from the text bytes through the SAME CCITT expansion formulas in
    SQL arithmetic — a wrong bias, segment shift, xor mask, sign
    convention, byte order or 24-bit sign extension shifts the
    hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_audio_formats(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "n_channels", "sample_rate",
                      "n_samples", "mean_value"))


@query("mm_audio_container_meta", oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 4 <= 1 THEN 'mp3' ELSE 'ogg' END AS container,
       CAST(CASE doc_id % 4
            WHEN 0 THEN 20 + doc_id % 40
            WHEN 1 THEN 10 + doc_id % 30
            WHEN 2 THEN 6 + doc_id % 20
            ELSE 4 + doc_id % 10 END AS BIGINT) AS n_units,
       CAST(CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 32000
            WHEN 2 THEN 48000 ELSE 44100 END AS INTEGER)
         AS sample_rate,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 1
            WHEN 2 THEN 2 ELSE 1 END AS INTEGER) AS channels,
       CASE doc_id % 4
         WHEN 0 THEN CAST((20 + doc_id % 40) * 1152 AS DOUBLE) / 44100
         WHEN 1 THEN CAST((10 + doc_id % 30) * 1152 AS DOUBLE) / 32000
         WHEN 2 THEN CAST((5 + doc_id % 20) * 960 AS DOUBLE) / 48000
         ELSE CAST((3 + doc_id % 10) * 441 AS DOUBLE) / 44100
       END AS duration_s
FROM documents
""")
def multimodal_audio_container_meta(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """MP3/Ogg screening WITHOUT decode — duration, rate, channels,
    unit counts from pure container walks (``operators/audio_meta.py``):
    the MPEG frame-header walk (published bitrate/rate index tables,
    padding-aware frame lengths, ID3v2 syncsafe skip, ID3v1 trailer
    exclusion) and the Ogg page walk (real lacing, per-page CRC-32
    VERIFIED, Vorbis identification header, granule-position
    duration). Frame payloads are junk by construction — the MDCT
    codecs stay loud — so this pins exactly what a curation pipeline
    uses: screening stats at parse cost. The oracle re-derives every
    stat arithmetically from the id; a wrong bitrate table entry,
    frame-length formula, syncsafe decode, lacing walk or granule
    convention shifts the hash."""
    from ..operators.audio_meta import (audio_container_meta,
                                        synthesize_compressed_audio)
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_compressed_audio(docs, "doc_id", "text")
    return audio_container_meta(media)


@query("mm_decode_ico", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
m AS (
  SELECT media_id, media_id % 3 AS c,
         CASE WHEN media_id % 3 = 1 THEN 1024 ELSE 256 END AS n
  FROM b
)
SELECT m.media_id, 'image' AS kind,
       CAST(CASE WHEN c = 1 THEN 32 ELSE 16 END AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS n_channels,
       CAST(CASE WHEN c = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(range(n),
            i -> bytes[CAST(i % len(bytes) AS INT) + 1]))
            AS DOUBLE) / n AS mean_value
FROM m JOIN b ON b.media_id = m.media_id
""")
def multimodal_decode_ico(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO (favicon) round trip — the one image container every web
    crawl collects: documents render into real ICONDIRs across three
    residue classes (a 16×16 8-bit DIB entry with the doubled-height
    header + AND-mask rows; a 32×32 PNG entry PLUS a 16×16 DIB so the
    decoder must pick the LARGEST; a DIB whose AND mask punches
    byte%5==0 cells transparent — alpha changes, the RGB mean must
    not) and decode back through ``operators/ico.py``, which reuses
    the repo's PNG decoder for PNG entries. The oracle re-derives the
    largest entry's mean from the text bytes; a wrong entry pick,
    bottom-up row order, palette expansion or doubled-height split
    shifts the hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_ico(docs, "doc_id", "text")
    return (MM.decode_media_real(media)
              .select("media_id", "kind", "width", "n_channels",
                      "n_samples", "mean_value"))


@query("mm_video_frames_mp4", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
fr AS (SELECT f FROM (VALUES (0), (2), (4)) t(f))
SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
       16 AS width, 16 AS height,
       (bytes[CAST((4*f + 0) % len(bytes) AS INT) + 1]
        + bytes[CAST((4*f + 1) % len(bytes) AS INT) + 1]
        + bytes[CAST((4*f + 2) % len(bytes) AS INT) + 1]
        + bytes[CAST((4*f + 3) % len(bytes) AS INT) + 1]) / 4.0
         AS frame_mean
FROM b, fr
""")
def multimodal_video_frames_mp4(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The `mm_video_frames` pipeline over MIXED containers — even ids
    MJPEG-AVI, odd ids MJPEG-in-MP4 (ISO-BMFF box walk +
    stsd/stts/stsc/stsz/stco sample-table expansion,
    `operators/mp4.py`) — through the same magic-byte `parse_video`
    dispatch and frame sampling. The oracle is IDENTICAL to the AVI
    query's because a container changes where the frame bytes live,
    never what they decode to: a wrong chunk-offset base, a bad stsc
    run expansion or a misread sample size shifts frame_mean and the
    hash. Real crawls are overwhelmingly MP4, so the demuxer is the
    difference between a usable video-dedup pass and a loud error on
    day one."""
    docs = load_table(spark, sf_dir, "documents")
    media = VID.synthesize_avi_mjpeg(docs, "doc_id", "text", n_frames=6,
                                     container="mixed")
    return VID.decode_video_frames(media, every_n=2)


@query("mm_audio_features", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents WHERE doc_id % 2 = 1
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
s AS (
  SELECT media_id,
         list_transform(range(400),
           i -> (bytes[CAST(i % len(bytes) AS INT) + 1] - 128) * 256)
           AS smp
  FROM b
)
SELECT media_id,
       CAST(400 AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(range(399),
         i -> CASE WHEN (smp[CAST(i AS INT) + 1] >= 0)
                    <> (smp[CAST(i AS INT) + 2] >= 0)
              THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings,
       CAST(list_max(list_transform(smp, v -> abs(v))) AS BIGINT)
         AS peak,
       CAST(list_sum(list_transform(smp, v -> v * v)) AS BIGINT)
         AS energy,
       sqrt(CAST(list_sum(list_transform(smp, v -> v * v)) AS DOUBLE)
            / 400.0) AS rms
FROM s
""")
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio screening features through a real WAV container:
    odd-id documents render to 16-bit PCM clips (samples =
    (byte−128)·256 cycled to 400, `synthesize_media`) and
    `audio_features` decodes them back and computes zero-crossing
    count, peak, exact integer energy and RMS — the per-clip stats an
    audio curation pass filters on. The oracle re-derives every value
    from the text bytes; RMS stays unrounded because sqrt(int/400) is
    IEEE-deterministic on identical integer inputs."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 1)
    media = MM.synthesize_media(docs, "doc_id", "text")
    return MM.audio_features(media)


@query("mm_frame_dedup", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
fr AS (
  SELECT media_id, f,
         CAST(list_transform(range(4),
              k -> bytes[CAST((4*f + k) % len(bytes) AS INT) + 1])
           AS VARCHAR) AS k
  FROM b CROSS JOIN range(6) t(f)
),
cnt AS (SELECT k, count(*) AS n FROM fr GROUP BY k)
SELECT fr.media_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(count(DISTINCT fr.k) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicated
FROM fr JOIN cnt USING (k)
GROUP BY fr.media_id
""")
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-level exact-dup report WITHOUT decoding: fingerprint
    every frame by md5 over its raw entropy-coded bytes straight off
    the RIFF walk (`operators/video.frame_dedup_report`) and count, per
    video, how many frames are byte-duplicated anywhere in the corpus —
    the shared-intro/slideshow/re-encode-twin signal a video curation
    pass filters on before any pixel work. One combinable shuffle on
    the (uniform) hash key, never frame×frame. The oracle re-derives
    frame identity from the text bytes: the deterministic encoder maps
    equal 8×8-tile tuples to equal JPEG bytes, so two frames collide
    exactly when their 4-byte tuples match — a fingerprint pass that
    hashed the wrong byte ranges or walked movi off-by-one would break
    the counts. The id universe for the zero-frame branch comes from
    the documents table directly — deriving it from the media stream
    would synthesize every payload a second time."""
    docs = load_table(spark, sf_dir, "documents")
    # fused synthesize→fingerprint: (media_id, frame_md5) come out of
    # ONE mapInPandas — frame bytes never cross an Arrow boundary
    # (same md5-over-encoded-JPEG identity; the unfused
    # synthesize_avi_mjpeg → video_frame_hashes chain is pinned equal
    # in test_video_codec)
    h = VID.synthesize_frame_hashes(docs, "doc_id", "text", n_frames=6)
    return VID.frame_dedup_report(
        None, ids=docs.select(F.col("doc_id").alias("media_id")),
        hashes=h)


@query("mm_image_resize", oracle="""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS raw
  FROM pay
),
b AS (
  SELECT media_id, CASE WHEN len(raw) = 0 THEN [0] ELSE raw END AS bytes
  FROM pb
),
px AS (
  SELECT media_id,
         list_transform(range(256),
                        i -> bytes[CAST(i % len(bytes) AS INT) + 1]) AS p
  FROM b
),
grid AS (SELECT y, x FROM range(8) t1(y), range(8) t2(x))
SELECT media_id, CAST(y AS INTEGER) AS y, CAST(x AS INTEGER) AS x,
       (p[CAST(32*y + 2*x AS INT) + 1]
        + p[CAST(32*y + 2*x + 1 AS INT) + 1]
        + p[CAST(32*y + 16 + 2*x AS INT) + 1]
        + p[CAST(32*y + 16 + 2*x + 1 AS INT) + 1]) / 4.0 AS value
FROM px, grid
""")
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through a real container: documents render
    into grayscale PNGs, decode through zlib + unfiltering, and 2x2
    AREA-downsample in one vectorized Arrow kernel
    (`operators/multimodal.resize_image_area`) — emitted long-form so
    the oracle value-checks EVERY output pixel (each is an exact
    multiple of 1/4, so engines agree bit-for-bit). The thumbnail /
    feature-extraction preprocessing shape of a multimodal training
    pipeline, with the decode and the kernel both on the hook."""
    docs = load_table(spark, sf_dir, "documents")
    # adam7 slice kept ON: interlacing changes the container, not the
    # pixels, so this query value-checks the Adam7 decode PER PIXEL
    # (32,000 values at sf0.01) under the unchanged oracle
    media = MM.synthesize_png(docs, "doc_id", "text", rgb_every=0)
    return MM.resize_image_area(media, factor=2)


# Payload bytes re-derived in SQL: the demo payload is the UTF-8
# encoding of the text (attach_payload), and DuckDB's hex(encode(t))
# exposes every byte as two hex chars — so byte-level operators
# (histograms, frame windows, checksums) get full value oracles.
_PAYLOAD_BYTES_CTE = """pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
pb AS (
  SELECT media_id,
         list_transform(range(length(hx) // 2),
                        i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT),
                                                  2)) AS INTEGER))
           AS bytes
  FROM pay
)"""


@query("mm_features", oracle=f"""
WITH {_PAYLOAD_BYTES_CTE.strip()}
SELECT media_id, CAST(k AS INTEGER) AS bin,
       len(list_filter(bytes, b -> b // 16 = k))
         / greatest(len(bytes), 1) AS value
FROM pb, range(16) t(k)
""")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature vectors from binary payloads — the
    encoder-model stand-in, Arrow-batched
    (`operators/multimodal.byte_histogram_features` still emits the
    array<double> column downstream consumers use). The declared query
    explodes the vector to (media_id, bin, value) rows because the
    driver's canonicalizer cannot sort raw array cells (pandas
    sort_values → "unhashable type: 'list'"); the oracle re-derives
    every byte from hex(encode(text)) and the same count/total
    division, so every vector element stays value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs, "doc_id", "text")
    feats = MM.byte_histogram_features(media)
    return feats.select("media_id",
                        F.posexplode("features").alias("bin", "value"))


@query("mm_frame_sample", oracle=f"""
WITH {_PAYLOAD_BYTES_CTE.strip()},
frames AS (
  SELECT media_id,
         unnest(list_transform(range(CAST(ceil(len(bytes) / 64.0)
                                          AS BIGINT)),
           f -> struct_pack(
             idx := CAST(f AS INTEGER),
             off := CAST(f * 64 AS BIGINT),
             ck := CAST(list_sum(bytes[CAST(f*64+1 AS INT):
                                       CAST(least((f+1)*64, len(bytes))
                                            AS INT)]) AS BIGINT))),
           recursive := true)
  FROM pb
)
SELECT media_id, idx AS frame_idx, off AS frame_offset,
       ck AS frame_checksum
FROM frames
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one output row per sampled byte-window 'frame' —
    the row-multiplying UDTF shape video pipelines need. The oracle
    replays the byte windows and their checksums from
    hex(encode(text))."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_payload(docs, "doc_id", "text", media_type="video/fake")
    return MM.frame_sample(media, every_n=64)


@query("sim_ivf_ann", oracle=None)  # learned clustering → rows-only check
def ivf_ann_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans cells (MLlib) + n_probe nearest-cell search — the
    learned-partition counterpart of the hyperplane LSH path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 10)
                  .select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec")))
    return SIM.ivf_ann(queries, emb, k=3, n_lists=8, n_probe=2)


_SEMANTIC_CLUSTER_CTES = """
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(src, dst) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
),
clusters AS (
  SELECT src AS id, min(dst) AS cluster_id,
         (src = min(dst)) AS is_canonical
  FROM reach GROUP BY src
)"""

_SEMANTIC_CLUSTER_TAIL = _SEMANTIC_CLUSTER_CTES + """
SELECT id, cluster_id, is_canonical FROM clusters
"""


@query("dedup_semantic_clusters", oracle=f"""
WITH RECURSIVE {_SEEDED_EMB_CTE.strip()},
{_BANDED_PAIRS_CTE_SELECTIVE.strip()},
{_SEMANTIC_CLUSTER_TAIL.strip()}
""")
def semantic_clusters_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space duplicate clusters at a PRODUCTION dedup
    threshold: banded-LSH cosine ≥ 0.6 pair graph → connected
    components. Banding is `suggest_bands(0.6)` = 34 bands × 7 sign
    bits — the selective regime (background collision 2⁻⁷ per band,
    recall ≥ 0.95 at the threshold), plus the 238-bit sign-sketch
    Hamming prefilter (2.33σ of sketch noise above the
    threshold's expected Hamming → integer cutoff h ≤ 86) that drops
    background collisions before any vector is touched — the
    parameterization whose candidate volume stays far from all-pairs
    as the corpus grows.

    The corpus is salted with 40 deterministic near-duplicate twins
    (`seed_near_duplicates`, cos ≥ 0.905 by construction) so the
    output is NON-VACUOUS at every scale factor: a correctness check
    against an empty pair graph proves nothing, while the planted
    pairs must traverse banding, the Hamming sketch, the exact rerank,
    and clustering to appear — and the oracle re-derives the identical
    twins, planes, bands, cutoff, and 6-dp cosine rounding in SQL, so
    edge sets — and therefore components — are value-checked
    end-to-end. The low-threshold exploratory case lives in
    `dedup_semantic_eval` / `sim_cosine_pairs`."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = SIM.seed_near_duplicates(emb, n_seed=40)
    pairs = SIM.lsh_band_pairs(corpus, threshold=0.6, n_bands=34,
                               band_bits=7, dim=64,
                               prefilter_sigma=2.33)
    from ..operators import dedup as D
    return D.duplicate_clusters(pairs)


@query("dedup_semantic_prune", oracle=f"""
WITH RECURSIVE {_SEEDED_EMB_CTE.strip()},
{_BANDED_PAIRS_CTE_SELECTIVE.strip()},
{_SEMANTIC_CLUSTER_CTES.strip()}
SELECT c.vec_id, (cl.id IS NOT NULL) AS was_clustered
FROM emb_seeded c
LEFT JOIN clusters cl ON cl.id = c.vec_id AND cl.is_canonical
WHERE NOT EXISTS (SELECT 1 FROM clusters d
                  WHERE d.id = c.vec_id AND NOT d.is_canonical)
""")
def semantic_prune_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style corpus PRUNE — the end-to-end curation
    composition: `dedup_semantic_clusters`' pair graph → connected
    components → keep exactly ONE canonical member (min id) per
    cluster, pass every unclustered row through untouched. Returns the
    SURVIVING corpus ids with ``was_clustered`` marking rows that won
    their cluster (vs. never having a near-duplicate). The embedding
    side's analogue of `dedup_keep_best` (`queries/text_dedup.py`).

    Scale shape: the cluster table is ∝ duplicate NODES (tiny vs the
    corpus), so the anti/left joins broadcast under AQE at any
    realistic dup rate; the corpus itself is scanned once past the
    pair machinery."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = SIM.seed_near_duplicates(emb, n_seed=40)
    pairs = SIM.lsh_band_pairs(corpus, threshold=0.6, n_bands=34,
                               band_bits=7, dim=64,
                               prefilter_sigma=2.33)
    from ..operators import dedup as D
    clusters = D.duplicate_clusters(pairs)
    non_canon = (clusters.where(~F.col("is_canonical"))
                         .select(F.col("id").alias("vec_id")))
    canon = (clusters.where(F.col("is_canonical"))
                     .select(F.col("id").alias("__cid")))
    return (corpus.select("vec_id")
                  .join(non_canon, "vec_id", "left_anti")
                  .join(canon, F.col("vec_id") == F.col("__cid"), "left")
                  .select("vec_id",
                          F.col("__cid").isNotNull()
                           .alias("was_clustered")))


# the evaluator runs on a DETERMINISTIC 20% md5-bucket sample of the
# corpus (salt 'eval'): at θ=0.4 the 16×2-band collision gap gives
# little pruning, so cost is quadratic-ish in the evaluated set — the
# sample bounds it while the hash predicate keeps the oracle exact.
_EVAL_SAMPLE_FRACTION = 0.2
_EVAL_SAMPLE_PRED = (f"{SAMP.sql_hash_bucket('vec_id', salt='eval')} "
                     f"< {int(round(_EVAL_SAMPLE_FRACTION * SAMP.N_BUCKETS))}")
_BANDED_PAIRS_CTE_EVAL = _banded_pairs_cte(16, 2, 0.4, table="emb_sample")


@query("dedup_semantic_eval", oracle=f"""
WITH RECURSIVE emb_sample AS (
  SELECT * FROM embeddings WHERE {_EVAL_SAMPLE_PRED}
),
{_BANDED_PAIRS_CTE_EVAL.strip()},
{_SEMANTIC_CLUSTER_TAIL.strip()}
""")
def semantic_clusters_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-threshold (cosine ≥ 0.4, 16×2 bands) variant of
    `dedup_semantic_clusters` — an exploratory/evaluator
    parameterization: at thresholds this low the hyperplane collision
    gap gives little pruning (see `lsh_band_pairs`'s cost-honesty
    note), so this regime is for recall studies ON SAMPLES, never the
    production dedup path. Accordingly the query evaluates a
    deterministic 20% md5-bucket sample (`deterministic_sample`, salt
    'eval') — partition-independent, re-derivable by any engine, and
    mirrored verbatim into the oracle's WHERE — which bounds the
    quadratic-ish candidate volume at any corpus scale while leaving
    the recall-study statistics unbiased (hash buckets are independent
    of embedding geometry)."""
    emb = SAMP.deterministic_sample(
        load_table(spark, sf_dir, "embeddings"), "vec_id",
        _EVAL_SAMPLE_FRACTION, salt="eval")
    pairs = SIM.lsh_band_pairs(emb, threshold=0.4, dim=64)
    from ..operators import dedup as D
    return D.duplicate_clusters(pairs)


# --- mm_decode_mp3: the MPEG-1 Layer III MDCT chain (round 10) ----------

# Golden per-class constants at global_gain = 210 (amplitude index
# k = 0), frozen from the decoder itself: the fixture gain is
# 210 + 4k, a POWER-OF-TWO factor, and the whole MDCT chain is
# linear, so every decoded sample — and hence the rms/peak features —
# scales bit-exactly by 2^k (verified feature-level in
# test_mp3_codec). The oracle therefore checks genuinely
# data-dependent values (k comes from each document's first text
# byte) against goldens that pin the chain: any change to side-info
# parsing, count1 decode, requantization, MS scaling, reorder, alias
# butterflies, IMDCT windows, overlap-add or frequency inversion
# shifts every row's hash. Class axes (media_id % 7): silence, line 0,
# the subband-boundary alias pair, MS stereo, short blocks, 32 kHz,
# dense alternating signs.
_MP3_GOLD = [
    # (rms, peak, sample_rate, channels, n_sub_samples) — refrozen r11
    # after the decoder became fully host-independent. Two passes:
    # (a) trig tables moved off libm (operators/mp3.py `_sinpi`/
    # `_cospi`: exact integer quadrant folding + fixed-order Taylor,
    # pure IEEE arithmetic); (b) the remaining nondeterminism closed —
    # the IMDCT matvec left BLAS (`_matcols_det`: fixed-order column
    # accumulation; dgemv summation order/FMA varies per host and
    # shifted the dense class-6 fixture by 1 ulp), 2^exps became
    # ldexp x frozen quarter-step constants (`_exp2_quarter`; libm
    # exp2 is not correctly rounded everywhere), and rms uses
    # `math.fsum` (exactly rounded, order-independent). Only the
    # class-6 constants moved (the other classes' sums have <= 2
    # terms, exact under any order); all are now reproducible on any
    # host, forever.
    (0.0, 0.0, 44100, 1, 2304),
    (0.11147599487907975, 0.7071067811865476, 44100, 1, 2304),
    (0.15857720758790517, 0.9701425001453323, 44100, 1, 2304),
    (0.08221442393994803, 0.7044160264027586, 44100, 2, 4608),
    (0.06863485746405877, 0.9159756150367534, 44100, 1, 2304),
    (0.11739163693953904, 0.9980973490458729, 32000, 1, 2304),
    (0.49814124407437593, 7.216363513223071, 44100, 1, 2304),
]


def _mp3_case(field: int) -> str:
    # the rms/peak goldens must reach DuckDB as exact DOUBLEs: a bare
    # (or even CAST) decimal literal routes through DECIMAL parsing
    # and lands one ulp off — casting from a STRING literal parses
    # straight to the shortest-round-trip double
    cast = field in (0, 1)
    arms = "\n         ".join(
        f"WHEN {c} THEN " + (f"CAST('{_MP3_GOLD[c][field]!r}' AS DOUBLE)"
                             if cast else f"{_MP3_GOLD[c][field]!r}")
        for c in range(7))
    return f"CASE media_id % 7\n         {arms} END"


_MP3_ORACLE = f"""
WITH pay AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text, ''))) AS hx
  FROM documents
),
b AS (
  SELECT media_id,
         CASE WHEN length(hx) = 0 THEN 0
              ELSE CAST(('0x' || substr(hx, 1, 2)) AS INTEGER)
         END AS b0
  FROM pay
),
k AS (SELECT media_id, CAST(b0 % 8 AS DOUBLE) AS k FROM b)
SELECT media_id,
       CAST({_mp3_case(2)} AS INTEGER) AS sample_rate,
       CAST({_mp3_case(3)} AS INTEGER) AS channels,
       CAST(2 AS BIGINT) AS n_frames,
       CAST({_mp3_case(4)} AS BIGINT) AS n_sub_samples,
       ({_mp3_case(0)}) * power(2.0, k) AS rms,
       ({_mp3_case(1)}) * power(2.0, k) AS peak
FROM k
"""


@query("mm_decode_mp3", oracle=_MP3_ORACLE)
def multimodal_decode_mp3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 (MPEG-1 Layer III) decode through the from-scratch MDCT
    chain (`operators/mp3.py`): documents render into REAL Layer III
    streams — spec-layout headers, side info, bit reservoir, count1
    table-B spectral coding — whose amplitude is set by the first
    text byte through a power-of-two global gain, and decode back to
    time-domain subband samples via requantization → MS stereo →
    reorder → alias reduction → 36/12-point IMDCT → overlap-add →
    frequency inversion. One Arrow ``mapInPandas`` per side; payloads
    never shuffle. The golden-fixture oracle re-derives each row's
    exact rms/peak as (frozen chain constant) × 2^(byte % 8) — see
    `_MP3_GOLD`. The remaining loud seams (Annex-B big-values code
    tables, the 512-tap synthesis window) are documented in the module
    and README."""
    from ..operators.mp3 import mp3_mdct_features, synthesize_mp3
    docs = load_table(spark, sf_dir, "documents")
    return mp3_mdct_features(synthesize_mp3(docs, "doc_id", "text"))
