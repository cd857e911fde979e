"""Context-window chunking — split every document into fixed-length token
windows with a configurable stride (overlap), the step between a cleaned
corpus and a training shard: each chunk row is one training example, and
the overlap keeps context across boundaries (the standard sliding-window
LM prep).

Pure Catalyst map stage: token counts come from the whitespace tokenizer
(swap in token_count's BPE-ish regex for a tighter estimate), the chunk
index set is ``sequence() + explode`` (the UDTF shape), and the start/end
arithmetic is exact integers — zero shuffle, runs inside the scan stage at
100 TB, and the output is ~n_tokens/stride rows per doc, which is the
fan-out a shard writer wants to see declared (not hidden in a UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, context_len: int = 128,
                    stride: int = 96, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, tok_start, tok_end, n_chunk_tokens) per sliding
    window; the last window is truncated at the document end, and a doc
    shorter than context_len yields exactly one chunk. stride < context_len
    gives (context_len - stride) tokens of overlap between neighbours."""
    if not 0 < stride <= context_len:
        raise ValueError("need 0 < stride <= context_len")
    from .textops import words_expr

    n_tok = F.size(words_expr(F.col(text_col))).cast("long")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       n_tok.alias("n_tokens"))
    # windows whose start < n_tokens: 1 + (n-1) DIV stride for n > 0
    # (exact integer division — no float path)
    base = base.withColumn(
        "n_chunks",
        F.when(F.col("n_tokens") > 0,
               F.expr(f"(n_tokens - 1) DIV {int(stride)}") + 1)
         .otherwise(F.lit(1)).cast("long"))
    chunk = F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
    out = base.select("doc_id", "n_tokens", chunk.alias("chunk_id"))
    tok_start = F.col("chunk_id") * stride
    tok_end = F.least(tok_start + context_len, F.col("n_tokens"))
    return out.select(
        "doc_id", "chunk_id", tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        (tok_end - tok_start).alias("n_chunk_tokens"))


def chunk_documents_sql(docs_sql: str, context_len: int = 128,
                        stride: int = 96, id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB oracle: generate_series over the same exact arithmetic."""
    w = (f"list_filter(string_split_regex(lower({text_col}), '\\s+'),"
         f" x -> x <> '')")
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, CAST(len({w}) AS BIGINT) AS n_tokens
  FROM ({docs_sql})
), c AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens > 0 THEN (n_tokens - 1) // {stride} + 1
              ELSE 1 END AS n_chunks
  FROM t
)
SELECT doc_id, chunk_id,
       chunk_id * {stride} AS tok_start,
       least(chunk_id * {stride} + {context_len}, n_tokens) AS tok_end,
       least(chunk_id * {stride} + {context_len}, n_tokens)
         - chunk_id * {stride} AS n_chunk_tokens
FROM (SELECT doc_id, n_tokens,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM c)
"""
