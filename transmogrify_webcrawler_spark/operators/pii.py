"""PII redaction/statistics over a documents table — the scrub step of a
training-data pipeline (emails, IPv4 addresses, phone numbers).

Pure Catalyst: regexp_replace / regexp_count chains, zero Python in the hot
path — at 100 TB this runs inside whole-stage codegen at scan speed, and the
skinny stats output (doc_id + three counts + a digest) shuffles nothing fat.

Pattern portability contract: every pattern below is written in the common
subset of Java regex (Spark) and RE2 (DuckDB oracle) — no backreferences, no
lookaround, only \\d/\\b/character classes and bounded quantifiers — so both
engines provably find the identical match set and the oracle equality is
exact string equality, not approximation.

Redaction order is pinned (EMAIL, then PHONE, then IP) and applied
identically engine-side and oracle-side; order is part of the operator's
contract since replacements can destroy or expose later matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_ORDERED = (
    ("<EMAIL>", EMAIL_RE, "n_emails"),
    ("<PHONE>", PHONE_RE, "n_phones"),
    ("<IP>", IPV4_RE, "n_ips"),
)


def pii_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, redacted) — match counts plus the
    scrubbed text. Counts are taken BEFORE any replacement (so phone counts
    are not affected by email redaction), replacements applied in the pinned
    order."""
    text = F.col(text_col)
    cols = [F.col(id_col).alias("doc_id")]
    for _, pat, cnt in _ORDERED:
        cols.append(F.regexp_count(text, F.lit(pat)).alias(cnt))
    red = text
    for token, pat, _ in _ORDERED:
        red = F.regexp_replace(red, pat, token)
    cols.append(red.alias("redacted"))
    return docs.select(*cols)


def pii_stats_sql(docs_sql: str, id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """DuckDB oracle: identical patterns/order; regexp_replace needs the 'g'
    flag (DuckDB replaces only the first match by default, Spark replaces
    all)."""
    counts = ",\n       ".join(
        f"length(regexp_extract_all({text_col}, '{pat}')) AS {cnt}"
        for _, pat, cnt in _ORDERED)
    red = text_col
    for token, pat, _ in _ORDERED:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return (f"SELECT {id_col} AS doc_id,\n       {counts},\n"
            f"       {red} AS redacted\nFROM ({docs_sql})")
