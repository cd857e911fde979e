"""SURT canonicalization and CDX-style capture indexing — the web-archive
index layer every large crawl ships alongside its page store (the
Common-Crawl / OpenWayback CDXJ convention): captures are keyed by the
Sort-friendly URI Reordering Transform so one prefix range scan answers
"everything under this host/domain/path".

SURT here (pinned subset, documented deviations from the full spec):
  http://WWW.Sub.Example.COM:8080/a/b.html
    -> com,example,sub)/a/b.html
- scheme dropped, host lowercased, leading 'www.' stripped, port stripped
  (full SURT keeps non-default ports; this engine's canonicalizer
  normalizes ports away before indexing, so the index key matches it),
- host labels reversed and comma-joined, then ')' + path-and-query,
- fragment dropped, empty path -> '/'.

Everything is Catalyst string/regexp expressions — zero Python, so at
100 TB the key derivation rides the page-table scan for free.

The global capture index (idx) is a two-phase distributed prefix sum, NOT a
single-partition row_number: rows bucket by a surt prefix (lexicographic, so
bucket order == global order), count-per-bucket comes to the driver (one
bounded row per bucket, same convention as sampling.pack_sequences), and the
cumulative offsets broadcast back. On a cluster the bucketing step becomes
repartitionByRange(surt) and the final table writes sorted-within-partitions
— a range scan then touches only the matching files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def surt_expr(url):
    """SURT key of a URL column (Catalyst-only; see module docstring)."""
    host = F.regexp_extract(url, _SCHEME + r"([^/?#]+)", 1)
    host = F.regexp_replace(F.lower(host), r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    key = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(url, _SCHEME + r"[^/?#]*([/?][^#]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(key, F.lit(")"), path)


def cdx_index(captures: DataFrame, url_col: str = "url",
              prefix_len: int = 4) -> DataFrame:
    """(url, surt, digest, idx): the CDX line set for a capture table, with
    idx the 0-based position in global (surt, url) order.

    idx comes from a two-phase prefix sum over lexicographic surt-prefix
    buckets — the per-bucket counts are the only driver transfer (bounded:
    <= alphabet^prefix_len rows), and no task ever sees more than one
    bucket's rows in its sort."""
    u = F.col(url_col)
    keyed = captures.select(
        u.alias("url"),
        surt_expr(u).alias("surt"),
        F.md5(u.cast("binary")).alias("digest"),
    ).withColumn("blk", F.substring("surt", 1, prefix_len))
    w = Window.partitionBy("blk").orderBy("surt", "url")
    local = keyed.withColumn("local_idx", F.row_number().over(w))
    totals = sorted(
        (r["blk"], r["c"]) for r in
        keyed.groupBy("blk").agg(F.count("*").alias("c")).collect())
    offsets, acc = [], 0
    for blk, c in totals:
        offsets.append((blk, acc))
        acc += int(c)
    off = captures.sparkSession.createDataFrame(offsets, "blk string, off long")
    return (local.join(F.broadcast(off), "blk")
            .select("url", "surt", "digest",
                    (F.col("off") + F.col("local_idx") - 1).alias("idx")))


def surt_sql(url_sql: str) -> str:
    """The identical SURT derivation in DuckDB SQL (RE2 / Java-regex common
    subset only), for oracle construction."""
    host = (f"regexp_replace(regexp_replace(lower(regexp_extract({url_sql},"
            f" '{_SCHEME}([^/?#]+)', 1)), ':[0-9]+$', ''), '^www\\.', '')")
    path = (f"CASE WHEN regexp_extract({url_sql},"
            f" '{_SCHEME}[^/?#]*([/?][^#]*)?', 1) = '' THEN '/'"
            f" ELSE regexp_extract({url_sql},"
            f" '{_SCHEME}[^/?#]*([/?][^#]*)?', 1) END")
    return (f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
            f" || ')' || {path}")


# ---- tracking-parameter stripping ---------------------------------------------

# the ad/analytics params every crawler canonicalizes away before dedup —
# two URLs differing only in these are the SAME resource, and leaving them
# in silently inflates the frontier and splits dup clusters
TRACKING_PARAMS = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid)"

# three passes, pinned order (identical RE2/Java semantics):
# 1. drop each tracked pair, keeping its leading separator
# 2. collapse the separator runs the removals leave ('?&&' -> '?')
# 3. strip a dangling separator at end-of-url or before the fragment
_STRIP_1 = rf"([?&]){TRACKING_PARAMS}=[^&#]*"
_STRIP_2 = r"([?&])&+"
_STRIP_3 = r"[?&]+(#|$)"


def strip_tracking_expr(url):
    """Tracking-free form of a URL column — Catalyst-only, rides the scan."""
    u = F.regexp_replace(url, _STRIP_1, "$1")
    u = F.regexp_replace(u, _STRIP_2, "$1")
    return F.regexp_replace(u, _STRIP_3, "$1")


def strip_tracking(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, url_clean, changed) per input row; zero shuffle."""
    clean = strip_tracking_expr(F.col(url_col))
    return pages.select(
        F.col(url_col).alias("url"), clean.alias("url_clean"),
        (clean != F.col(url_col)).alias("changed"))


def strip_tracking_sql(url_sql: str) -> str:
    """The same three regex passes in DuckDB's dialect (\\1 + 'g')."""
    u = (f"regexp_replace({url_sql},"
         f" '([?&]){TRACKING_PARAMS}=[^&#]*', '\\1', 'g')")
    u = f"regexp_replace({u}, '([?&])&+', '\\1', 'g')"
    return f"regexp_replace({u}, '[?&]+(#|$)', '\\1', 'g')"


# ---- revisit-record detection -------------------------------------------------

def revisit_records(captures: DataFrame, url_col: str = "url",
                    ts_col: str = "ts",
                    digest_col: str = "digest") -> DataFrame:
    """WARC `revisit` semantics (the web-archive storage dedup): within
    each payload digest, the FIRST capture (by ts, then url) is the stored
    `response` record; every later identical capture becomes a `revisit`
    pointing at the original — archives store the pointer, not the bytes
    again. Returns (url, ts, digest, record_type, orig_url, orig_ts) with
    record_type in {'response', 'revisit'}.

    Scale shape: one window partitioned by digest (the dedup key the
    store is already bucketed by) — first_value and row_number share the
    single sort; no self-join, no pair space."""
    w = (Window.partitionBy(digest_col)
         .orderBy(F.col(ts_col), F.col(url_col)))
    rk = F.row_number().over(w)
    orig_url = F.first(url_col).over(w)
    orig_ts = F.first(ts_col).over(w)
    return captures.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
        F.when(rk == 1, "response").otherwise("revisit")
         .alias("record_type"),
        F.when(rk == 1, None).otherwise(orig_url).alias("orig_url"),
        F.when(rk == 1, None).otherwise(orig_ts).alias("orig_ts"))


def revisit_records_sql(captures_sql: str, url_sql: str = "url",
                        ts_sql: str = "ts",
                        digest_sql: str = "digest") -> str:
    """DuckDB oracle: identical single window."""
    return f"""
SELECT {url_sql} AS url, {ts_sql} AS ts, {digest_sql} AS digest,
       CASE WHEN rk = 1 THEN 'response' ELSE 'revisit' END AS record_type,
       CASE WHEN rk = 1 THEN NULL ELSE o_url END AS orig_url,
       CASE WHEN rk = 1 THEN NULL ELSE o_ts END AS orig_ts
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY {digest_sql}
                            ORDER BY {ts_sql}, {url_sql}) AS rk,
         first_value({url_sql}) OVER (PARTITION BY {digest_sql}
                            ORDER BY {ts_sql}, {url_sql}) AS o_url,
         first_value({ts_sql}) OVER (PARTITION BY {digest_sql}
                            ORDER BY {ts_sql}, {url_sql}) AS o_ts
  FROM ({captures_sql})
)
"""


# ---- CDXJ export --------------------------------------------------------------

def cdxj_lines(captures: DataFrame, url_col: str = "url",
               ts_col: str = "ts",
               digest_col: str = "digest",
               length_col: str = "length") -> DataFrame:
    """CDXJ line synthesis — the JSON-lines index format web archives
    publish (OpenWayback/pywb CDXJ: `<surt> <ts> <json-block>`): one
    formatted line per capture, key order pinned (url, digest, length) so
    the bytes are deterministic. Catalyst string ops only — the export
    rides the capture-table scan, and writing sorted-by-(surt, ts) gives
    the binary-searchable file the format exists for. Caller guarantees
    urls need no JSON escaping (canonicalized urls here never contain
    quote/backslash; a full escaper belongs to the writer stage).

    Returns (surt, ts, line)."""
    surt = surt_expr(F.col(url_col))
    line = F.concat(
        surt, F.lit(" "), F.col(ts_col).cast("string"), F.lit(" "),
        F.lit('{"url": "'), F.col(url_col),
        F.lit('", "digest": "'), F.col(digest_col),
        F.lit('", "length": '), F.col(length_col).cast("string"),
        F.lit("}"))
    return captures.select(surt.alias("surt"),
                           F.col(ts_col).cast("long").alias("ts"),
                           line.alias("line"))


def cdxj_lines_sql(captures_sql: str, url_sql: str = "url",
                   ts_sql: str = "ts", digest_sql: str = "digest",
                   length_sql: str = "length") -> str:
    """DuckDB oracle: identical SURT derivation + concatenation."""
    surt = surt_sql(url_sql)
    return f"""
SELECT {surt} AS surt, CAST({ts_sql} AS BIGINT) AS ts,
       {surt} || ' ' || {ts_sql}::VARCHAR || ' ' ||
       '{{"url": "' || {url_sql} || '", "digest": "' || {digest_sql} ||
       '", "length": ' || {length_sql}::VARCHAR || '}}' AS line
FROM ({captures_sql})
"""
