"""Exact distributed order statistics WITHOUT a global sort — the corpus
telemetry a 100 TB pipeline needs (p50/p90/p99 document length, token
count, fetch size) computed as one value-histogram aggregation plus a
bounded prefix sum, never a cluster-wide ordering of the raw rows.

Why not sort: percentile-by-sort is a full range-shuffle of every row and
a near-sequential scan to the target rank. For metric columns (lengths,
counts, sizes) the DISTINCT-value space is tiny relative to the row count,
so groupBy(value).count() collapses the data map-side (partial aggregation)
and everything after runs on |distinct values| rows.

Why not approx_percentile: Spark's GK sketch is approximate and its error
profile is engine-specific, so no other system can cross-check the result.
This operator is EXACT — integer compares only (quantiles are given in
basis points, so `cum * 10000 >= q_bp * n` never touches a float) — and
therefore bit-identical on any engine, partitioning, or cluster size.

Prefix-sum shape (same two-phase pattern as sampling.pack_sequences and
the CDX global index): distinct values bucket into fixed-width blocks;
a window cumsums WITHIN each block (bounded local sorts, plan shows no
Exchange SinglePartition); one bounded per-block-totals row set visits the
driver (|values| / block rows — the IVF-codebook-style bounded transfer);
block offsets broadcast back. Returned quantile semantics match SQL
PERCENTILE_DISC: the smallest value whose cumulative row count reaches
q * n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BP_DEN = 10000  # quantiles arrive in basis points: p50 -> 5000


def exact_quantiles(df: DataFrame, value_col: str,
                    q_bps: list[int], block: int = 4096) -> DataFrame:
    """(q_bp, value, n_rows) for each requested basis-point quantile of an
    integer metric column; value is PERCENTILE_DISC-exact.

    Scale shape: one map-side-combining groupBy(value) shuffle, windows
    partitioned by bounded blocks only, a |values|/block-row driver
    transfer, and a broadcast of |q_bps| rows — the raw rows are never
    sorted or re-shuffled.
    """
    spark = df.sparkSession
    vals = (df.select(F.col(value_col).cast("long").alias("v"))
            .groupBy("v").agg(F.count("*").alias("cnt"))
            .withColumn("blk", F.expr(f"v DIV {int(block)}")))
    w = Window.partitionBy("blk").orderBy("v")
    local = vals.withColumn("local_end", F.sum("cnt").over(w))
    totals = sorted(
        (r["blk"], r["t"]) for r in
        vals.groupBy("blk").agg(F.sum("cnt").alias("t")).collect())
    offsets, acc = [], 0
    for blk, t in totals:
        offsets.append((blk, acc))
        acc += int(t)
    n_rows = acc
    off = spark.createDataFrame(offsets, "blk long, off long")
    cum = (local.join(F.broadcast(off), "blk")
           .select("v", (F.col("off") + F.col("local_end")).alias("cum")))
    qdim = spark.createDataFrame([(int(q),) for q in q_bps], "q_bp long")
    # PERCENTILE_DISC: smallest v with cum >= q*n; exact in integers
    hit = (cum.crossJoin(F.broadcast(qdim))
           .filter(F.col("cum") * _BP_DEN >= F.col("q_bp") * F.lit(n_rows)))
    return (hit.groupBy("q_bp").agg(F.min("v").alias("value"))
            .select("q_bp", "value", F.lit(n_rows).alias("n_rows")))


def exact_quantiles_sql(rows_sql: str, value_sql: str,
                        q_bps: list[int]) -> str:
    """DuckDB oracle: single-node, so a plain global cumsum window expresses
    the same integer rank arithmetic the two-phase scan computes."""
    qvals = ", ".join(f"({int(q)})" for q in q_bps)
    return f"""
WITH c AS (
  SELECT CAST({value_sql} AS BIGINT) AS v, count(*) AS cnt
  FROM ({rows_sql}) GROUP BY 1
), cum AS (
  SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c
), tot AS (
  SELECT sum(cnt) AS n_rows FROM c
)
SELECT q.q_bp, min(cum.v) AS value, CAST(tot.n_rows AS BIGINT) AS n_rows
FROM cum, tot, (VALUES {qvals}) q(q_bp)
WHERE cum.cum * {_BP_DEN} >= q.q_bp * tot.n_rows
GROUP BY q.q_bp, tot.n_rows
"""


def grouped_quantiles(df: DataFrame, group_col: str, value_col: str,
                      q_bps: list[int], block: int = 4096) -> DataFrame:
    """Per-GROUP exact quantiles — the stratified telemetry query (p50/p99
    document length per source/language) with the same no-global-sort
    construction as exact_quantiles: histogram collapses map-side per
    (group, value), windows stay (group, block)-partitioned, and the
    driver sees one bounded row per (group, block). Returns
    (group_col, q_bp, value, n_rows) with PERCENTILE_DISC semantics
    within each group."""
    spark = df.sparkSession
    vals = (df.select(F.col(group_col).alias("g"),
                      F.col(value_col).cast("long").alias("v"))
            .groupBy("g", "v").agg(F.count("*").alias("cnt"))
            .withColumn("blk", F.expr(f"v DIV {int(block)}")))
    w = Window.partitionBy("g", "blk").orderBy("v")
    local = vals.withColumn("local_end", F.sum("cnt").over(w))
    totals = sorted(
        (r["g"], r["blk"], r["t"]) for r in
        vals.groupBy("g", "blk").agg(F.sum("cnt").alias("t")).collect())
    offsets, acc, cur = [], 0, None
    group_n = {}
    for g, blk, t in totals:
        if g != cur:
            cur, acc = g, 0
        offsets.append((g, blk, acc))
        acc += int(t)
        group_n[g] = acc
    off = spark.createDataFrame(offsets, f"g string, blk long, off long") \
        if offsets else spark.createDataFrame([], "g string, blk long, off long")
    ns = spark.createDataFrame(sorted(group_n.items()), "g string, n long")
    cum = (local.join(F.broadcast(off), ["g", "blk"])
           .select("g", "v",
                   (F.col("off") + F.col("local_end")).alias("cum")))
    qdim = spark.createDataFrame([(int(q),) for q in q_bps], "q_bp long")
    hit = (cum.join(F.broadcast(ns), "g")
           .crossJoin(F.broadcast(qdim))
           .filter(F.col("cum") * _BP_DEN >= F.col("q_bp") * F.col("n")))
    return (hit.groupBy("g", "q_bp")
            .agg(F.min("v").alias("value"), F.max("n").alias("n_rows"))
            .select(F.col("g").alias(group_col), "q_bp", "value",
                    "n_rows"))


def grouped_quantiles_sql(rows_sql: str, group_sql: str, value_sql: str,
                          q_bps: list[int]) -> str:
    """DuckDB oracle: per-group cumsum window, same integer ranks."""
    qvals = ", ".join(f"({int(q)})" for q in q_bps)
    return f"""
WITH c AS (
  SELECT {group_sql} AS g, CAST({value_sql} AS BIGINT) AS v,
         count(*) AS cnt
  FROM ({rows_sql}) GROUP BY 1, 2
), cum AS (
  SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum FROM c
), tot AS (
  SELECT g, sum(cnt) AS n FROM c GROUP BY g
)
SELECT cum.g AS {group_sql}, q.q_bp, min(cum.v) AS value,
       CAST(tot.n AS BIGINT) AS n_rows
FROM cum JOIN tot ON cum.g = tot.g, (VALUES {qvals}) q(q_bp)
WHERE cum.cum * {_BP_DEN} >= q.q_bp * tot.n
GROUP BY cum.g, q.q_bp, tot.n
"""
