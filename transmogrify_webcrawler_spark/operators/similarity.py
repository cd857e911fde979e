"""Similarity search over an embedding column (array<float>).

- brute_force_knn: exact cosine top-k, fully Catalyst (zip_with/aggregate dot
  product + TakeOrdered per query) — the correctness baseline.
- lsh_knn: random-hyperplane LSH bucketing — a 100 TB path: each vector is
  signed against H fixed hyperplanes (deterministic, seed-derived), candidates
  meet only inside a bucket, exact cosine re-rank within. Recall tunable via
  bands/hyperplanes; never materializes the n^2 pair space.
- ivf_knn: the OTHER standard ANN scale path (FAISS-style inverted file):
  spherical k-means centroids trained on a bounded deterministic sample,
  every corpus vector assigned to its nearest centroid's bucket, queries
  probe their nprobe nearest buckets, exact cosine re-rank inside. Cosine
  (angular) assignment on purpose — it is scale-invariant, which both
  matches the cosine re-rank metric and makes recall provable for scaled
  twins (the oracle construction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a: str, b: str,
                out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))))


def brute_force_knn(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                    ) -> DataFrame:
    """Exact top-k cosine neighbors per query. queries is expected small
    relative to emb (broadcast side); the corpus side streams. Ties broken
    on vec_id (deterministic)."""
    joined = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).crossJoin(F.broadcast(queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"))))
    joined = joined.filter(F.col("vec_id") != F.col("q_id"))
    scored = with_cosine(joined, "embedding", "q_vec")
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.round("cosine", 4).alias("cosine"),
                "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (no numpy RNG state; pure
    arithmetic so executors regenerate identically)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype("float64")


def cosine_dedup_pairs(emb: DataFrame, threshold: float = 0.95,
                       n_planes: int = 8, bands: int = 16,
                       dim: int | None = None, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (a, b, cosine), a < b — the
    embedding member of the dedup family (exact / minhash / simhash /
    ngram / THIS). Banded sign-LSH SELF-join: ids+band keys only ride the
    explode (never vectors), candidates meet only inside a (band_id,
    band_val) bucket — the O(n^2) pair space is never materialized — then
    exact cosine on the distinct candidate pairs filters >= threshold.
    Scale-exact for true duplicates: cos=1 vectors have identical sign
    patterns, so every band agrees and the pair is a guaranteed candidate;
    near-dups are found with P = 1-(1-p^w)^L, tunable via `bands`."""
    if dim is None:
        # an implicit .first() probe here would be a silent driver-side
        # Spark job per call on the hot path — the caller always knows the
        # embedding dimensionality (it is part of the table contract)
        raise ValueError("cosine_dedup_pairs requires dim= (the embedding "
                         "dimensionality); no implicit corpus probe")
    sig = _band_sig_udf(dim, n_planes, bands)
    e_b = emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(sig(F.col(vec_col))).alias("band_id", "band_val"))
    cand = (
        e_b.alias("x").join(e_b.alias("y"), ["band_id", "band_val"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("a"), F.col("y.vid").alias("b"))
        .distinct()
    )
    vecs = emb.select(F.col(id_col).alias("vid"),
                      F.col(vec_col).alias("v"))
    scored = with_cosine(
        cand.join(vecs.select(F.col("vid").alias("a"),
                              F.col("v").alias("va")), "a")
            .join(vecs.select(F.col("vid").alias("b"),
                              F.col("v").alias("vb")), "b"),
        "va", "vb")
    return (scored.filter(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 4).alias("cosine")))


def _band_sig_udf(dim: int, n_planes: int, bands: int):
    """Shared banded-signature pandas UDF: one (batch x dim) @
    (dim x bands*n_planes) matmul per Arrow batch, one packed int64 per
    band. Hyperplanes regenerate deterministically (seeded) on executors."""
    from pyspark.sql.types import ArrayType, LongType

    total = bands * n_planes

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(vecs: pd.Series) -> pd.Series:
        import numpy as np
        planes = _hyperplanes(dim, total)
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy())
        signs = mat @ planes.T >= 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        vals = np.stack([signs[:, b * n_planes:(b + 1) * n_planes] @ weights
                         for b in range(bands)], axis=1)
        return pd.Series(list(vals))

    return sig_udf


def _topk_rerank(scored: DataFrame, k: int) -> DataFrame:
    """Shared exact-cosine re-rank tail: top-k per query, deterministic
    tie-break on vec_id, cosine rounded only in the OUTPUT (rank is
    computed on the raw value)."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.round("cosine", 4).alias("cosine"),
                "rank")
    )


def train_centroids_spherical(emb: DataFrame, n_centroids: int,
                              iters: int = 5, sample: int = 4096,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding"):
    """Spherical k-means codebook for the IVF index, trained driver-side on
    a BOUNDED deterministic sample (orderBy(xxhash64(id)) — a seeded
    pseudo-random draw that is stable across runs and partitionings).
    Training on a sample is the standard IVF practice (a codebook of
    n_centroids x dim floats is tiny; FAISS does exactly this) — the
    bounded `sample` collect is the only driver transfer, never the
    corpus. Returns a unit-normalized (n_centroids x dim) numpy array."""
    import numpy as np

    rows = (emb.select(vec_col)
            .orderBy(F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                            F.lit(1 << 30)), id_col)
            .limit(sample).collect())
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    c = x[:n_centroids].copy()
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.linalg.norm(c, axis=1, keepdims=True) + 1e-12
    return c


def _ivf_assign_udf(centroids, nprobe: int):
    """Top-nprobe centroid ids by cosine — ONE (batch x dim) @ (dim x k)
    matmul per Arrow batch (same O(1)-plan-size trick as the LSH
    signature); the codebook rides the UDF closure (n_centroids x dim
    float64 — KBs)."""
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        import numpy as np
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy()).astype("float64")
        # exact normalization (zero-norm rows guarded explicitly, NOT via a
        # +eps fudge): a scaled twin 2v must normalize BIT-IDENTICALLY to v
        # for the ivf_knn_verified oracle's same-bucket-with-probability-1
        # claim to hold — 2n+eps != 2(n+eps), so the eps form breaks exact
        # power-of-two scale invariance
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        mat /= np.where(norm == 0.0, 1.0, norm)
        sims = mat @ centroids.T
        if nprobe == 1:
            top = sims.argmax(axis=1)[:, None]
        else:
            np_ = min(nprobe, sims.shape[1])
            top = np.argpartition(-sims, np_ - 1, axis=1)[:, :np_]
        return pd.Series(list(top.astype("int32")))

    return assign


def ivf_knn(emb: DataFrame, queries: DataFrame, k: int = 5,
            n_centroids: int = 16, nprobe: int = 4,
            dim: int | None = None, centroids=None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            q_id_col: str = "q_id", q_vec_col: str = "q_vec",
            q_broadcast_rows: int = 4_000_000,
            n_queries: int | None = None) -> DataFrame:
    """ANN via an inverted-file index (IVF): corpus vectors live in the
    bucket of their nearest (by cosine) centroid; a query searches only
    its `nprobe` nearest buckets; exact cosine re-ranks the union. Recall
    is tunable via nprobe at fixed index cost — the standard FAISS trade.

    Scale shape: the bucket join carries only (id, bucket) — vectors never
    ride the explode; embeddings re-attach to the DISTINCT candidates. At
    the 100 TB point the corpus assignment is written ONCE as a bucketed
    table (`bucket` is a partition key, so a probe prunes to nprobe/k of
    the data); here the assignment is computed inline. Pass `centroids`
    to reuse a trained codebook (and make the index deterministic across
    calls); else one is trained on a bounded sample."""
    if dim is None:
        raise ValueError("ivf_knn requires dim= (the embedding "
                         "dimensionality); no implicit corpus probe")
    if centroids is None:
        centroids = train_centroids_spherical(
            emb, n_centroids, id_col=id_col, vec_col=vec_col)
    corpus_assign = _ivf_assign_udf(centroids, 1)
    query_assign = _ivf_assign_udf(centroids, nprobe)
    e_b = emb.select(
        F.col(id_col).alias("vec_id"),
        F.explode(corpus_assign(F.col(vec_col))).alias("bucket"))
    q_b = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(query_assign(F.col(q_vec_col))).alias("bucket"))
    q_dim = queries.select(F.col(q_id_col).alias("q_id"),
                           F.col(q_vec_col).alias("q_vec"))
    # callers that know the query cardinality pass n_queries and skip the
    # eager count job; the count runs only when unspecified
    if (n_queries if n_queries is not None
            else queries.count()) <= q_broadcast_rows:
        q_b, q_dim = F.broadcast(q_b), F.broadcast(q_dim)
    cand = (
        e_b.join(q_b, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id").distinct()
    )
    scored = with_cosine(
        cand.join(emb.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("embedding")), "vec_id")
            .join(q_dim, "q_id"),
        "embedding", "q_vec")
    return _topk_rerank(scored, k)


def lsh_knn(emb: DataFrame, queries: DataFrame, k: int = 5,
            n_planes: int = 16, bands: int = 4, dim: int | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            q_id_col: str = "q_id", q_vec_col: str = "q_vec",
            q_broadcast_rows: int = 4_000_000,
            n_queries: int | None = None) -> DataFrame:
    """ANN: BANDED sign-random-projection — `bands` independent hash tables
    of `n_planes` sign bits each (total bands*n_planes hyperplanes), a
    candidate meets a query if they agree on ANY whole band, exact cosine
    re-rank on the candidate union. Recall is tunable via `bands` at fixed
    per-band precision (P(candidate) = 1-(1-p^w)^L), the standard
    LSH-forest trade — a single table (bands=1) couples recall to
    precision.

    Scale shape: the banded join carries only (id, band_id, band_val) —
    vectors never ride the explode; embeddings re-attach to the DISTINCT
    candidate pairs afterwards. The query side is broadcast only under
    `q_broadcast_rows` (one count job on the small-by-contract side);
    beyond it the join falls back to shuffle and AQE decides."""
    if dim is None:
        raise ValueError("lsh_knn requires dim= (the embedding "
                         "dimensionality); no implicit corpus probe")
    # signature = one matrix multiply per Arrow batch (a Catalyst rendering
    # of bands*n_planes x dim literal exprs blows up codegen at real
    # embedding dims, 768+); O(1) plan size at any dim/plane count
    sig_udf = _band_sig_udf(dim, n_planes, bands)
    e_b = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("band_id", "band_val"))
    q_b = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.posexplode(sig_udf(F.col(q_vec_col))).alias("band_id", "band_val"))
    q_dim = queries.select(F.col(q_id_col).alias("q_id"),
                           F.col(q_vec_col).alias("q_vec"))
    # callers that know the query cardinality pass n_queries and skip the
    # eager count job; the count runs only when unspecified
    if (n_queries if n_queries is not None
            else queries.count()) <= q_broadcast_rows:
        q_b, q_dim = F.broadcast(q_b), F.broadcast(q_dim)
    cand = (
        e_b.join(q_b, ["band_id", "band_val"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id").distinct()
    )
    scored = with_cosine(
        cand.join(emb.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("embedding")), "vec_id")
            .join(q_dim, "q_id"),
        "embedding", "q_vec")
    return _topk_rerank(scored, k)
