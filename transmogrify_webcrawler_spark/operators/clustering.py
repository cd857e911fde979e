"""Exact-arithmetic k-means over embedding vectors — topic/domain clustering
for training-data curation, built so the result is BIT-EXACT under any
partitioning and any cluster size (the same fixed-point trick as
graph.pagerank_fixed, applied to Lloyd's algorithm):

- embeddings quantize to non-negative integers: q = floor(e*QUANT + 0.5)
  + OFFSET per element (float->double promotion and the double ops are
  IEEE-identical in the JVM and any other engine, so quantization is
  deterministic cross-engine; the OFFSET shift changes no distance and no
  mean but keeps every later division positive, where truncating and
  flooring division agree).
- centroids live on an integer grid at SCALE x the quantized resolution:
  update is c_i = (sum_i * SCALE) DIV n — integer sums are
  order-independent, so unlike float k-means the result does not depend on
  aggregation order, partition count, or AQE decisions.
- assignment is argmin of the exact integer squared L2 distance, ties
  broken toward the lowest cluster id via lexicographic (dist, cluster)
  struct min — total order, no epsilon.

Scale shape: assignment is pure Catalyst (64-term zip_with/aggregate per
cluster inside the scan stage — zero Python, zero shuffle); the update is
one groupBy over k x dim long sums with map-side partial aggregation, and
the only driver transfer per iteration is the k x (dim+1) stats table —
the same bounded collect every distributed k-means (including Spark MLlib)
performs. Init = the k lowest-id vectors: deterministic, no RNG state.

Bounds (defaults QUANT=1e4, OFFSET=5e3, SCALE=128, |e|<=1): q <= 1.5e4,
grid values <= 1.92e6, per-dim squared diff <= 3.7e12, dist <= dim x that —
comfortably inside int64 up to dim ~2000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 10000.0
OFFSET = 5000
SCALE = 128


def _q_expr(vec_col):
    return F.transform(
        F.col(vec_col),
        lambda e: F.floor(e.cast("double") * QUANT + 0.5).cast("long")
        + OFFSET,
    )


def _assign(base: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Add (cluster, dist): exact integer argmin over the centroid grid."""
    choices = []
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(int(v)) for v in c])
        d = F.aggregate(
            F.zip_with("qs", carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        choices.append(F.struct(d.alias("d"),
                                F.lit(ci).cast("long").alias("c")))
    m = F.array_min(F.array(*choices))
    return base.withColumn("cluster", m["c"]).withColumn("dist", m["d"])


def kmeans_exact(emb: DataFrame, k: int = 8, iterations: int = 3,
                 dim: int = 64, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Lloyd's k-means with exact integer arithmetic; returns (vec_id,
    cluster, dist) — the assignment against the final centroids, with dist
    the exact integer squared distance on the SCALE grid. `dim` is required
    (no driver probe — ADVICE r4 convention). Empty clusters keep their
    previous centroid."""
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        _q_expr(vec_col).alias("q"),
    ).withColumn("qs", F.transform("q", lambda x: x * SCALE)).persist()

    init_rows = base.select("vec_id", "q").orderBy("vec_id").limit(k).collect()
    centroids = [[int(v) * SCALE for v in r["q"]] for r in init_rows]

    sum_cols = [F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                for i in range(dim)]
    for _ in range(iterations):
        assigned = _assign(base, centroids)
        stats = (assigned.groupBy("cluster")
                 .agg(F.count("*").alias("n"), *sum_cols).collect())
        for r in stats:  # clusters with no members keep their centroid
            n = int(r["n"])
            centroids[int(r["cluster"])] = [
                (int(r[f"s{i}"]) * SCALE) // n for i in range(dim)]

    out = _assign(base, centroids).select("vec_id", "cluster", "dist")
    base.unpersist()
    return out


def kmeans_sql(emb_sql: str, k: int = 8, iterations: int = 3,
               dim: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding") -> str:
    """DuckDB oracle for kmeans_exact: the identical integer recurrence as
    unrolled CTEs (AS MATERIALIZED — each a{t}/c{t} is referenced twice, and
    un-materialized CTE inlining re-runs the whole prefix per reference)."""
    quant, off, scale = QUANT, OFFSET, SCALE
    q_list = (f"list_transform({vec_col}, e -> CAST(floor("
              f"CAST(e AS DOUBLE) * {quant} + 0.5) AS BIGINT) + {off})")
    dist = ("CAST(list_sum(list_transform(qs, (x, i) -> "
            "(x - c[i]) * (x - c[i]))) AS BIGINT)")
    parts = [
        f"WITH q AS MATERIALIZED (\n"
        f"  SELECT {id_col} AS vec_id, {q_list} AS q,\n"
        f"         list_transform({q_list}, x -> x * {scale}) AS qs\n"
        f"  FROM ({emb_sql})\n)",
        f"c0 AS MATERIALIZED (\n"
        f"  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,\n"
        f"         list_transform(q, x -> x * {scale}) AS c\n"
        f"  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT {k})\n)",
    ]
    t = 0
    for t in range(1, iterations + 1):
        parts.append(
            f"a{t} AS MATERIALIZED (\n"
            f"  SELECT vec_id, min(struct_pack(d := {dist}, c := cluster))"
            f" AS m\n"
            f"  FROM q CROSS JOIN c{t - 1} GROUP BY vec_id\n)")
        parts.append(
            f"s{t} AS MATERIALIZED (\n"
            f"  SELECT (a{t}.m).c AS cluster, g.i,\n"
            f"         sum(q.q[g.i]) AS s, count(*) AS n\n"
            f"  FROM a{t} JOIN q USING (vec_id),\n"
            f"       (SELECT unnest(generate_series(1, {dim})) AS i) g\n"
            f"  GROUP BY 1, 2\n)")
        parts.append(
            f"c{t} AS MATERIALIZED (\n"
            f"  SELECT prev.cluster, coalesce(nc.c, prev.c) AS c\n"
            f"  FROM c{t - 1} prev LEFT JOIN (\n"
            f"    SELECT cluster, list((s * {scale}) // n ORDER BY i) AS c\n"
            f"    FROM s{t} GROUP BY cluster) nc USING (cluster)\n)")
    fin = iterations + 1
    parts.append(
        f"a{fin} AS MATERIALIZED (\n"
        f"  SELECT vec_id, min(struct_pack(d := {dist}, c := cluster))"
        f" AS m\n"
        f"  FROM q CROSS JOIN c{t} GROUP BY vec_id\n)")
    return (",\n".join(parts)
            + f"\nSELECT vec_id, (m).c AS cluster, (m).d AS dist FROM a{fin}")
