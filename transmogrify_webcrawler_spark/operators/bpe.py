"""Distributed BPE merge learning — the first k byte-pair-encoding merges
(Sennrich et al. 2016) computed over the corpus WORD-FREQUENCY table, the
way tokenizer training actually consumes a 100 TB corpus: the text
collapses map-side to (word, count) once, and every round after that runs
on the bounded word-vocabulary table, never on the raw rows.

Per round: adjacent symbol pairs explode from each word WEIGHTED by the
word's corpus count, a map-side-combining groupBy sums pair weights, the
argmax pair comes back to the driver (ONE bounded row per round — the same
bounded-transfer pattern as the IVF codebook and k-means centroids), and
the merge applies to every word as one Catalyst string replace. All
weights are BIGINT sums, and ties break lexicographically, so the learned
merge sequence is bit-identical on any engine, partitioning, or cluster
size.

Symbol-string representation: a word's current segmentation is kept as a
single string with every symbol wrapped in U+001F unit separators
(``\\x1f a \\x1f b \\x1f``). Applying merge (a, b) is then
``replace(s, SEP+a+SEP+b+SEP, SEP+ab+SEP)`` — both engines scan
left-to-right non-overlapping, which IS greedy BPE application order, and
the wrapping separators make a symbol match exact (no substring
false-positives). Words containing the separator byte are dropped up
front (it is a C0 control — normalize_text strips it from real text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def bpe_merges(docs: DataFrame, k: int = 6,
               text_col: str = "text") -> DataFrame:
    """Learn the first k merges; returns (round, left, right, merged,
    weight) with round in 1..k, weight = the merged pair's corpus count.

    Scale shape: one shuffle of the corpus to (word, count); k rounds of
    (pair, weight) partial aggregation over the CACHED vocabulary table;
    k single-row driver transfers. The raw text is read exactly once.
    """
    from .textops import words_expr

    spark = docs.sparkSession
    words = (docs.select(F.explode(words_expr(F.col(text_col)))
                         .alias("word"))
             .filter(~F.col("word").contains(SEP))
             .groupBy("word").agg(F.count("*").alias("cnt")))
    vocab = words.select(
        "cnt",
        F.concat(F.lit(SEP),
                 F.regexp_replace("word", "(.)", "$1" + SEP)).alias("s"),
    ).persist()
    vocab.count()  # materialize once; every round reuses the cached table

    merges = []
    cur = vocab
    for rnd in range(1, int(k) + 1):
        syms = F.expr(f"filter(split(s, '{SEP}'), x -> x <> '')")
        pair = F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> struct(element_at(syms, i) AS l,"
            "             element_at(syms, i + 1) AS r))")
        counts = (cur.select("cnt", syms.alias("syms"))
                  .filter(F.size("syms") >= 2)
                  .select("cnt", F.explode(pair).alias("p"))
                  .groupBy("p.l", "p.r").agg(F.sum("cnt").alias("w")))
        top = counts.select(
            F.min(F.struct((-F.col("w")).alias("nw"),
                           F.col("l"), F.col("r"))).alias("m")).collect()
        if not top or top[0]["m"] is None:
            break
        m = top[0]["m"]
        left, right, weight = m["l"], m["r"], -int(m["nw"])
        merges.append((rnd, left, right, left + right, weight))
        cur = cur.select("cnt", F.expr(
            "replace(s, '{0}{1}{0}{2}{0}', '{0}{1}{2}{0}')"
            .format(SEP, left, right)).alias("s"))
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "round int, left string, right string, merged string, "
                "weight long")


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge list: apply the merges IN TRAINING
    ORDER to every word and count resulting symbols — the application half
    of BPE (train with bpe_merges, encode here). Returns (doc_id, n_words,
    n_tokens): n_tokens is the corpus metric a data pipeline actually
    reports (tokens per doc under the production tokenizer).

    Pure Catalyst map stage: each word becomes a separator-wrapped symbol
    string and the k merges apply as k chained replace() calls (greedy
    left-to-right, same operator order as training) — zero shuffle beyond
    the final per-doc count, no Python.
    """
    from .textops import words_expr

    word = F.explode(words_expr(F.col(text_col)))
    base = docs.select(F.col(id_col).alias("doc_id"), word.alias("word")) \
               .filter(~F.col("word").contains(SEP))
    s = F.concat(F.lit(SEP), F.regexp_replace("word", "(.)", "$1" + SEP))
    for left, right in merges:
        pat = F.lit(f"{SEP}{left}{SEP}{right}{SEP}")
        rep = F.lit(f"{SEP}{left}{right}{SEP}")
        s = F.replace(s, pat, rep)
    n_syms = F.size(F.expr("filter(split(__s, '" + SEP + "'), "
                           "x -> x <> '')"))
    return (base.withColumn("__s", s)
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum(n_syms).cast("long").alias("n_tokens")))


def bpe_encode_sql(docs_sql: str, merges: list[tuple[str, str]],
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB oracle: identical chained replace over separator-wrapped
    symbol strings."""
    w = (f"list_filter(string_split_regex(lower({text_col}), '\\s+'),"
         f" x -> x <> '')")
    s = "chr(31) || regexp_replace(word, '(.)', '\\1' || chr(31), 'g')"
    for left, right in merges:
        s = (f"replace({s}, chr(31) || '{left}' || chr(31) || '{right}'"
             f" || chr(31), chr(31) || '{left}{right}' || chr(31))")
    return f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(list_filter(string_split({s}, chr(31)),
                                x -> x <> ''))) AS BIGINT) AS n_tokens
FROM (SELECT {id_col} AS doc_id, unnest({w}) AS word FROM ({docs_sql}))
WHERE word NOT LIKE '%' || chr(31) || '%'
GROUP BY doc_id
"""


def bpe_merges_sql(docs_sql: str, k: int = 6,
                   text_col: str = "text") -> str:
    """DuckDB oracle: the identical recurrence unrolled as MATERIALIZED
    CTEs (one vocab stage + one argmax per round), lockstep-unnest pair
    extraction, same replace-based merge application."""
    w = (f"list_filter(string_split_regex(lower({text_col}), '\\s+'),"
         f" x -> x <> '')")
    parts = [f"""w0 AS MATERIALIZED (
  SELECT word, count(*) AS cnt,
         chr(31) || regexp_replace(word, '(.)', '\\1' || chr(31), 'g') AS s
  FROM (SELECT unnest({w}) AS word FROM ({docs_sql}))
  WHERE word NOT LIKE '%' || chr(31) || '%'
  GROUP BY 1
)"""]
    sel = []
    for i in range(1, int(k) + 1):
        prev = f"w{i - 1}"
        parts.append(f"""p{i} AS (
  SELECT l, r, sum(cnt) AS w FROM (
    SELECT cnt,
           unnest(syms[1:len(syms) - 1]) AS l,
           unnest(syms[2:len(syms)]) AS r
    FROM (SELECT cnt, list_filter(string_split({prev}.s, chr(31)),
                                  x -> x <> '') AS syms
          FROM {prev})
    WHERE len(syms) >= 2
  ) GROUP BY 1, 2
)""")
        parts.append(f"""m{i} AS MATERIALIZED (
  SELECT l, r, w FROM p{i} ORDER BY w DESC, l, r LIMIT 1
)""")
        parts.append(f"""w{i} AS MATERIALIZED (
  SELECT cnt, replace(s, chr(31) || m.l || chr(31) || m.r || chr(31),
                      chr(31) || m.l || m.r || chr(31)) AS s
  FROM {prev}, m{i} m
)""")
        sel.append(f"SELECT {i} AS round, l AS left, r AS right, "
                   f"l || r AS merged, CAST(w AS BIGINT) AS weight "
                   f"FROM m{i}")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(sel) + "\nORDER BY round")
