"""Deterministic sampling / mixture / packing operators — the last mile of
a training-data pipeline: decide per-document inclusion rates per source
("data mixture"), cap strata, and lay documents out into fixed-size token
windows. Everything here is RNG-free: decisions are pure functions of
(id, salt), so re-running the pipeline — at any cluster size, any
partitioning — reproduces the same corpus byte-for-byte, and an oracle can
replay the decisions in SQL.

- mixture_sample: per-source keep-rates via the hash_split trick
  (lexicographic compare of the first 8 md5 hex chars against a
  rate-derived hex threshold — exact cross-engine string comparison, no
  float rounding at the decision boundary).
- stratified_topn: deterministic per-stratum cap: rank docs inside each
  stratum by (md5, id) and keep the first n. One window over the stratum
  key — the shuffle is by stratum, partial nothing, but the window is
  rank-only so Spark plans WindowGroupLimit (top-k pushdown) and never
  sorts whole strata at once.
- pack_sequences: global token-offset assignment (which L-token training
  window does each doc start in?) via a DISTRIBUTED prefix sum: block-local
  cumulative sums (window partitioned by a deterministic id-block) plus
  driver prefix offsets over the bounded per-block totals — the textbook
  two-phase scan. A naive `Window.orderBy(id)` with no partition key would
  serialize 100 TB through one task; this shape never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rate_hex(rate: float) -> str:
    """Keep-threshold for a [0,1] rate as 8 lowercase hex chars: h < thresh
    keeps ~rate of uniformly-hashed ids (16^8 buckets — rate resolution
    2.3e-10)."""
    n = min(max(int(rate * 16 ** 8), 0), 16 ** 8 - 1)
    return format(n, "08x")


def mixture_sample(docs: DataFrame, rates: dict[str, float],
                   default_rate: float = 1.0, id_col: str = "doc_id",
                   source_col: str = "source",
                   salt: str = "mix-v1") -> DataFrame:
    """Per-source acceptance sampling: keep each doc with its source's
    target rate, decided by md5(salt:id) — deterministic, partition- and
    order-independent. Returns (doc_id, source, h8, keep)."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string")).cast("binary")), 1, 8)
    thresh = F.lit(_rate_hex(default_rate))
    for src, rate in sorted(rates.items()):
        thresh = F.when(F.col(source_col) == src,
                        F.lit(_rate_hex(rate))).otherwise(thresh)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        h.alias("h8"),
        (h < thresh).alias("keep"),
    )


def mixture_sample_sql(docs_sql: str, rates: dict[str, float],
                       default_rate: float = 1.0, id_col: str = "doc_id",
                       source_col: str = "source",
                       salt: str = "mix-v1") -> str:
    """DuckDB oracle: the identical hash + string comparison."""
    h = f"substring(md5('{salt}:' || {id_col}), 1, 8)"
    cases = "".join(
        f"WHEN {source_col} = '{s}' THEN '{_rate_hex(r)}' "
        for s, r in sorted(rates.items()))
    thresh = f"CASE {cases}ELSE '{_rate_hex(default_rate)}' END"
    return (f"SELECT {id_col} AS doc_id, {source_col} AS source,\n"
            f"       {h} AS h8, {h} < {thresh} AS keep\n"
            f"FROM ({docs_sql})")


def stratified_topn(docs: DataFrame, n: int, strata_col: str = "source",
                    id_col: str = "doc_id",
                    salt: str = "cap-v1") -> DataFrame:
    """Keep a deterministic pseudo-random n docs per stratum: rank by
    (md5(salt:id), id) inside the stratum, keep rank <= n. The (h, id)
    composite is a total order, so there are no ties and the selected set
    is unique. Returns (doc_id, stratum, rk) for kept rows only."""
    h = F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string")).cast("binary"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(strata_col).alias("stratum"),
                        F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= n))


def stratified_topn_sql(docs_sql: str, n: int, strata_col: str = "source",
                        id_col: str = "doc_id",
                        salt: str = "cap-v1") -> str:
    h = f"md5('{salt}:' || {id_col})"
    return (
        f"SELECT doc_id, stratum, rk FROM (\n"
        f"  SELECT {id_col} AS doc_id, {strata_col} AS stratum,\n"
        f"         row_number() OVER (PARTITION BY {strata_col}\n"
        f"                            ORDER BY {h}, {id_col}) AS rk\n"
        f"  FROM ({docs_sql})\n) WHERE rk <= {n}")


def pack_sequences(docs: DataFrame, context_len: int = 2048,
                   block: int = 4096, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign each document its global token offset in id order and the
    L-token training window its first token lands in. Token count = the
    whitespace tokenizer (portable; swap in token_count's BPE-ish regex for
    a tighter estimate).

    Distributed prefix-sum: ids bucket into fixed blocks (id DIV block);
    a window cumsums WITHIN each block (blocks are bounded, sorts are
    local), per-block totals come back to the driver (one row per block —
    bounded, like the IVF codebook), prefix-offsets broadcast back via a
    tiny join. No global single-task window anywhere.

    Returns (doc_id, n_tokens, start_tok, bin_id, bin_pos); docs longer
    than context_len straddle windows — bin_id is the window containing
    the FIRST token (intra-doc splitting belongs to the tokenizer stage).
    """
    from .textops import words_expr

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(words_expr(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn("blk", F.expr(f"doc_id DIV {int(block)}"))  # exact int div
    w = Window.partitionBy("blk").orderBy("doc_id")
    local = toks.withColumn(
        "local_end", F.sum("n_tokens").over(w))
    totals = sorted(
        (r["blk"], r["t"]) for r in
        toks.groupBy("blk").agg(F.sum("n_tokens").alias("t")).collect())
    offsets, acc = [], 0
    for blk, t in totals:
        offsets.append((blk, acc))
        acc += int(t)
    off = docs.sparkSession.createDataFrame(offsets, "blk long, off long")
    start = F.col("off") + F.col("local_end") - F.col("n_tokens")
    # start_tok/bin_id/bin_pos are emitted as DOUBLE: the oracle computes
    # them from a window sum(BIGINT) -> HUGEINT -> pandas float64, and the
    # driver's value hash compares materialized values (same fix family as
    # repetition_stats; token offsets << 2^53, doubles exact). The integer
    # arithmetic itself stays BIGINT.
    return (local.join(F.broadcast(off), "blk")
            .select("doc_id", "n_tokens", start.alias("start_tok"))
            .select(
                "doc_id", "n_tokens",
                F.col("start_tok").cast("double").alias("start_tok"),
                F.expr(f"start_tok DIV {int(context_len)}").cast("double")
                .alias("bin_id"),
                (F.col("start_tok") % context_len).cast("double")
                .alias("bin_pos"),
            ))


def pack_sequences_sql(docs_sql: str, context_len: int = 2048,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB oracle: single-node, so a plain global cumsum expresses the
    same assignment the two-phase scan computes."""
    return (
        f"WITH t AS (\n"
        f"  SELECT {id_col} AS doc_id,\n"
        f"         CAST(len(list_filter(string_split_regex(lower({text_col}),"
        f" '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens\n"
        f"  FROM ({docs_sql})\n"
        f"), c AS (\n"
        f"  SELECT doc_id, n_tokens,\n"
        f"         sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens"
        f" AS start_tok\n"
        f"  FROM t\n)\n"
        f"SELECT doc_id, n_tokens, start_tok,\n"
        f"       start_tok // {context_len} AS bin_id,\n"
        f"       start_tok % {context_len} AS bin_pos\nFROM c")


def rebalance_plan(docs: DataFrame, targets_bp: dict[str, int],
                   strata_col: str = "lang") -> DataFrame:
    """The planning half of mixture sampling: given a TARGET distribution
    (basis points per stratum), derive from the corpus's actual counts the
    per-stratum sampling rate that realizes it — the artifact a
    data-mixture pipeline reviews before mixture_sample executes it.

    All integer arithmetic: needed_i = target_bp_i * total DIV 10000,
    rate_bp_i = min(10000, needed_i * 10000 DIV count_i), deficit_i =
    shortfall when the corpus simply does not have enough of stratum i
    (the signal that the target is unreachable without new crawling).
    Strata in the target but absent from the corpus still get a row.

    Scale shape: one map-side-combining count per stratum (|strata| rows),
    a broadcast 1-row total, and a broadcast target dim — nothing large
    moves. Returns (stratum, n_docs, target_bp, needed, rate_bp, deficit).
    """
    spark = docs.sparkSession
    counts = (docs.groupBy(F.col(strata_col).alias("stratum"))
              .agg(F.count("*").alias("n_docs")))
    total = counts.agg(F.sum("n_docs").alias("total"))
    tgt = spark.createDataFrame(
        sorted((k, int(v)) for k, v in targets_bp.items()),
        "stratum string, target_bp long")
    j = (counts.join(F.broadcast(tgt), "stratum", "full_outer")
         .crossJoin(F.broadcast(total))
         .select("stratum",
                 F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                 F.coalesce("target_bp", F.lit(0)).alias("target_bp"),
                 "total"))
    # all plan arithmetic stays exact BIGINT (needed_i); needed/deficit are
    # then EMITTED as DOUBLE because the DuckDB oracle derives both from
    # sum(BIGINT) -> HUGEINT, which pandas materializes as float64 — the
    # driver's value hash compares materialized values, so the Spark side
    # must land on the identical dtype (CORRECTNESS_r05 red; values were
    # verified identical row-by-row). Counts < 2^53, doubles exact.
    j = j.withColumn("needed_i", F.expr("(target_bp * total) DIV 10000"))
    rate = F.when(F.col("n_docs") > 0,
                  F.least(F.lit(10000),
                          F.expr("(needed_i * 10000) DIV n_docs"))) \
            .otherwise(F.lit(0))
    return (j.withColumn("rate_bp", rate.cast("long"))
            .withColumn("needed", F.col("needed_i").cast("double"))
            .withColumn("deficit",
                        (F.col("needed_i")
                         - F.least("needed_i", F.col("n_docs")))
                        .cast("double"))
            .select("stratum", "n_docs", "target_bp", "needed",
                    "rate_bp", "deficit"))


def rebalance_plan_sql(docs_sql: str, targets_bp: dict[str, int],
                       strata_col: str = "lang") -> str:
    """DuckDB oracle: identical integer plan arithmetic."""
    rows = ", ".join(f"('{k}', {int(v)})"
                     for k, v in sorted(targets_bp.items()))
    return f"""
WITH counts AS (
  SELECT {strata_col} AS stratum, count(*) AS n_docs
  FROM ({docs_sql}) GROUP BY 1
), total AS (SELECT sum(n_docs) AS total FROM counts),
tgt (stratum, target_bp) AS (VALUES {rows}),
j AS (
  SELECT coalesce(c.stratum, t.stratum) AS stratum,
         coalesce(c.n_docs, 0) AS n_docs,
         coalesce(t.target_bp, 0) AS target_bp,
         (SELECT total FROM total) AS total
  FROM counts c FULL OUTER JOIN tgt t ON c.stratum = t.stratum
)
SELECT stratum, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(target_bp AS BIGINT) AS target_bp,
       (target_bp * total) // 10000 AS needed,
       CAST(CASE WHEN n_docs > 0
                 THEN least(10000, ((target_bp * total) // 10000) * 10000
                                   // n_docs)
                 ELSE 0 END AS BIGINT) AS rate_bp,
       ((target_bp * total) // 10000
        - least((target_bp * total) // 10000, n_docs)) AS deficit
FROM j
"""
