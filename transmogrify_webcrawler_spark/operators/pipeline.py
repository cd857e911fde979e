"""The end of the cleaning pipeline as ONE decision table — the query a
training-data team actually ships: every document gets a keep/drop verdict
with the first failing stage as the reason, composed from the engine's own
operators (exact-dedup canonical, language-ID, Gopher quality, repetition
profile). The output is the skinny (doc_id, keep, reason) table that a
100 TB retention pass joins back against the corpus — text never leaves
the component stages.

Stage priority (first failure wins, mirroring production pipelines where
cheap checks run first and attribution matters for corpus accounting):
  duplicate > language > quality (Gopher) > repetition.

All four component stages are Catalyst-only (SURVEY §2); the composition
is three skinny doc_id equi-joins, so the decision table costs one shuffle
per signal and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cleaning_decision(docs: DataFrame, rep_threshold: float = 0.5,
                      lang: str = "en", id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, is_canonical, passes_gopher, dup_gram_frac,
    lang_pred, keep, reason) for every input document."""
    from .textops import _dup_gram_frac_expr, _gopher_exprs, _lang_id_exprs

    # All three per-row signal families (Gopher, repetition, language) are
    # pure Catalyst expressions over the text column, so they fuse into ONE
    # map projection over a single scan — the former shape ran four
    # separate passes over the input and three doc_id equi-joins to stitch
    # per-row facts back together (guide §2.4: those shuffles carried
    # nothing a projection didn't already have). The only shuffles left are
    # the two the duplicate check fundamentally needs: the fingerprint
    # aggregation and its join-back.
    gopher = _gopher_exprs(text_col)
    lg = _lang_id_exprs(text_col)
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm.cast("binary")).alias("fingerprint"),
        gopher["passes_gopher"].alias("passes_gopher"),
        _dup_gram_frac_expr(2, text_col).alias("dup_gram_frac"),
        lg["lang_pred"].alias("lang_pred"),
    )
    canon = sig.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id"))
    j = (sig.join(canon, "fingerprint")
         .withColumn("is_canonical",
                     F.col("doc_id") == F.col("canonical_id")))
    lang_ok = F.col("lang_pred") == lang
    rep_ok = F.col("dup_gram_frac") < rep_threshold
    keep = (F.col("is_canonical") & lang_ok & F.col("passes_gopher")
            & rep_ok)
    reason = (
        F.when(~F.col("is_canonical"), "duplicate")
        .when(~lang_ok, "language")
        .when(~F.col("passes_gopher"), "quality")
        .when(~rep_ok, "repetition")
        .otherwise(""))
    return j.select("doc_id", "canonical_id", "is_canonical",
                    "passes_gopher", "dup_gram_frac", "lang_pred",
                    keep.alias("keep"), reason.alias("reason"))
