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
    from .textops import (doc_fingerprint, gopher_quality, lang_id,
                          repetition_stats)

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    fp = doc_fingerprint(d)
    canon = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id"))
    dedup = (fp.join(canon, "fingerprint")
             .select("doc_id", "canonical_id",
                     (F.col("doc_id") == F.col("canonical_id"))
                     .alias("is_canonical")))
    g = gopher_quality(d).select("doc_id", "passes_gopher")
    r = repetition_stats(d, n=2).select("doc_id", "dup_gram_frac")
    lg = lang_id(d).select("doc_id", "lang_pred")
    j = (dedup.join(g, "doc_id").join(r, "doc_id").join(lg, "doc_id"))
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
