"""Driver-harness queries: PySpark builders + DuckDB oracle SQL
(__spark_entry__.py contract). One entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline suite. Every computed column is
aliased identically in both the Spark builder and the SQL (the driver's
comparator hashes values under sorted column names).

Pairs marked rows-only (no oracle) are genuinely non-SQL-expressible:
engine-internal hashing (minhash/simhash/LSH), the full crawl loop, and the
multimodal mapInPandas plumbing.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(_t(sf_dir, name))


def _readp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver table and SPREAD the scan across the session's cores.

    The driver's sf tables are single-file, single-row-group parquet
    (documents 5.7 MB / 50k rows, lineitem 126 MB / 6M rows at sf1.0), so a
    plain scan is ONE map task regardless of maxPartitionBytes — and
    Catalyst fuses every per-row expression into the scan stage, which made
    the whole text/dedup/sketch family run single-core (measured: the
    explode+hash work, not the shuffle, dominated every heavy query;
    guide §2.2/§6). A round-robin repartition to defaultParallelism moves
    single-digit MB once and parallelizes the fused map work 32x.

    Scale-adaptive, not a local[32] constant: the repartition only fires
    when the scan has FEWER partitions than the session's parallelism —
    on a properly-split 100 TB input (partitions >> cores) it is a no-op,
    and the target derives from the master, never a hard-coded core count.
    """
    df = spark.read.parquet(_t(sf_dir, name))
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want)
    return df


def _readpk(spark: SparkSession, sf_dir: str, name: str,
            *by: str) -> DataFrame:
    """_readp variant that spreads by HASH of the given columns instead of
    round-robin: a keyless repartition pays a per-partition local sort of
    its input (sortBeforeRepartition, guide §2.5) — pointless for the 6M-row
    lineitem scans — while a hash repartition streams. When `by` is a prefix
    of a downstream groupBy/distinct key the exchange is reused (guide §2.4)
    and the aggregation runs fully parallel with no extra shuffle."""
    df = spark.read.parquet(_t(sf_dir, name))
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want, *[F.col(c) for c in by])
    return df


# =============================================================================
# crawl-operator analogs over the driver testdata (SQL-expressible — J/A/W/F/O)
# =============================================================================

def q_pricing_summary(spark, sf_dir):
    """Headline agg (A3-style metrics rollup shape): TPC-H Q1-ish."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_anti_join_dedup(spark, sf_dir):
    """J1: URL-seen anti-join shape — customers with no orders."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return c.join(o.select(F.col("o_custkey").alias("c_custkey")),
                  "c_custkey", "left_anti").select("c_custkey")


SQL_ANTI_JOIN = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_bloom_seen_dedup(spark, sf_dir):
    """J1+A4: the REAL bloom path — seen = even orderkeys, candidates =
    distinct lineitem orderkeys; distributed shard build, shard-routed
    cogroup probe, exact anti-join backstop. NO driver state anywhere.
    The SQL oracle proves zero false negatives end-to-end."""
    from .operators.dedup import (
        bloom_probe, build_bloom_shards, seen_anti_join)

    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    seen = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("string").alias("url_canon"))
    cand = li.select(
        F.col("l_orderkey").cast("string").alias("url_canon")).distinct()
    nbytes = 1 << 16
    shards_df = build_bloom_shards(seen, n_shards=8, nbytes=nbytes)
    flagged = bloom_probe(cand, shards_df, 8, nbytes)
    new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen") \
        .unionByName(seen_anti_join(
            flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen"), seen))
    return new.select(F.col("url_canon").cast("long").alias("new_orderkey"))


SQL_BLOOM_SEEN = """
SELECT DISTINCT l_orderkey AS new_orderkey FROM lineitem
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l_orderkey AND o_orderkey % 2 = 0)
"""


def q_fetch_join(spark, sf_dir):
    """J2/J3: frontier⋈pages fetch-join shape with a broadcast dim."""
    o = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = _read(spark, sf_dir, "customer")
    return o.join(F.broadcast(c),
                  o["o_custkey"] == c["c_custkey"], "left").select(
        "o_orderkey", "c_name",
        F.round("o_totalprice", 2).alias("totalprice"))


SQL_FETCH_JOIN = """
SELECT o_orderkey, c_name, round(o_totalprice, 2) AS totalprice
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 100000
"""


def q_backlink_collect(spark, sf_dir):
    """J4: backlink aggregation — sorted referrer list per target."""
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list(
            F.col("l_partkey").cast("string")))).alias("backlinks"),
        F.count("*").alias("n_links"),
    )


SQL_BACKLINK = """
SELECT l_orderkey,
       string_agg(l_partkey::varchar, ',' ORDER BY l_partkey::varchar)
           AS backlinks,
       count(*) AS n_links
FROM lineitem GROUP BY l_orderkey
"""


def q_inlink_score(spark, sf_dir):
    """A2: in-link score — distinct referrer count per target."""
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_inlinks"))


SQL_INLINK = """
SELECT l_partkey, count(DISTINCT l_orderkey) AS n_inlinks
FROM lineitem GROUP BY l_partkey
"""


def q_politeness_topk(spark, sf_dir):
    """A1/W2: per-key budget — top-3 events per user by (value desc, id)."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk")
    )


SQL_POLITENESS = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id
                          ORDER BY value DESC, event_id) AS rnk
FROM events
QUALIFY rnk <= 3
"""


def q_politeness_delay_budget(spark, sf_dir):
    """A1 + Crawl-delay: the REAL politeness operator with a per-domain
    budget dim (the robots crawl_delay rule). Domains = user_id; every 4th
    domain carries a delay that caps its budget at 2 instead of 3. Runs
    operators.frontier.politeness_budget end-to-end (salted two-phase +
    budget-dim join)."""
    from .operators.frontier import politeness_budget

    e = _read(spark, sf_dir, "events")
    frontier = e.select(
        F.col("event_id").cast("string").alias("url_canon"),
        F.col("user_id").cast("string").alias("registered_domain"),
        F.col("value").alias("priority"),
    )
    budgets = (
        e.select("user_id").distinct()
        .filter(F.col("user_id") % 4 == 0)
        .select(F.col("user_id").cast("string").alias("registered_domain"),
                F.lit(2).alias("dom_budget"))
    )
    out = politeness_budget(frontier, per_domain_budget=3, n_salts=4,
                            domain_budgets=F.broadcast(budgets))
    return out.select(F.col("registered_domain").alias("user_id"),
                      F.col("url_canon").alias("event_id"))


SQL_POLITENESS_DELAY = """
WITH ranked AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value, event_id::varchar) AS rnk
  FROM events
)
SELECT user_id::varchar AS user_id, event_id::varchar AS event_id
FROM ranked
WHERE rnk <= CASE WHEN user_id % 4 = 0 THEN 2 ELSE 3 END
"""


def q_salted_agg(spark, sf_dir):
    """A1 skew handling: two-phase salted aggregation — partial agg on
    (key, salt), then merge. Same answer as a plain GROUP BY (the oracle),
    but the hot key fans out over 16 reducers first."""
    e = _read(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16))
    partial = (
        e.groupBy("event_type", salt.alias("_salt"))
        .agg(F.count("*").alias("c"), F.sum("value").alias("s"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.round(F.sum("s"), 2).alias("sum_value"),
    )


SQL_SALTED = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type
"""


def q_priority_topk(spark, sf_dir):
    """W2/O2: global priority top-k (TakeOrderedAndProject)."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderpriority", "o_orderkey").limit(100)
        .select("o_orderkey", "o_orderpriority")
    )


SQL_PRIORITY_TOPK = """
SELECT o_orderkey, o_orderpriority FROM orders
ORDER BY o_orderpriority, o_orderkey LIMIT 100
"""


def q_sortorder_window(spark, sf_dir):
    """W1: deterministic global crawl index over a bounded set."""
    o = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return o.select("o_orderkey",
                    F.row_number().over(w).cast("long").alias("sortorder"))


SQL_SORTORDER = """
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS sortorder
FROM orders WHERE o_totalprice > 250000
"""


def q_ignore_regex(spark, sf_dir):
    """F1: ignore-pattern gate (rlike == re.search == regexp_matches)."""
    d = _read(spark, sf_dir, "documents")
    pat = "(slow|error)"
    return d.filter(~F.col("text").rlike(pat)).select("doc_id")


SQL_IGNORE_REGEX = """
SELECT doc_id FROM documents WHERE NOT regexp_matches(text, '(slow|error)')
"""


def q_maxsize_gate(spark, sf_dir):
    """F3: maxsize gate."""
    d = _read(spark, sf_dir, "documents")
    return d.filter(F.col("n_chars") <= 300).select("doc_id", "n_chars")


SQL_MAXSIZE = "SELECT doc_id, n_chars FROM documents WHERE n_chars <= 300"


def q_content_type_gate(spark, sf_dir):
    """F4/T2: typerecognitor CASE map + routing counts."""
    d = _read(spark, sf_dir, "documents")
    ct = (
        F.when(F.col("lang") == "en", F.lit("Document"))
        .when(F.col("source").isin("src0", "src1"), F.lit("Image"))
        .otherwise(F.lit("File"))
    )
    return d.select(ct.alias("content_type")).groupBy("content_type").agg(
        F.count("*").alias("n"))


SQL_CONTENT_TYPE = """
SELECT CASE WHEN lang = 'en' THEN 'Document'
            WHEN source IN ('src0','src1') THEN 'Image'
            ELSE 'File' END AS content_type,
       count(*) AS n
FROM documents GROUP BY 1
"""


def q_union_pipeline(spark, sf_dir):
    """O3: pipeline concat (unionByName) + distinct."""
    o = _read(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    return a.unionByName(b).distinct()


SQL_UNION = """
SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
"""


def q_events_hourly(spark, sf_dir):
    """ST-analog: tumbling-window rollup (wave metrics shape)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_url_canonicalize(spark, sf_dir):
    """C1: RFC-3986 canonicalization UDF vs constructed expected values —
    the oracle SQL builds the expected canonical string directly."""
    from .functions.udfs import canonicalize_udf

    p = _read(spark, sf_dir, "part")
    url = F.concat(F.lit("HTTP://SHOP"),
                   (F.col("p_partkey") % 50).cast("string"),
                   F.lit(".COM:80/a/../items/%7E"),
                   F.col("p_partkey").cast("string"),
                   F.lit(".html#frag"))
    return p.select(F.col("p_partkey").alias("p_partkey"),
                    canonicalize_udf(url).alias("url_canon"))


SQL_URL_CANON = """
SELECT p_partkey,
       'http://shop' || (p_partkey % 50) || '.com/items/~' || p_partkey
           || '.html' AS url_canon
FROM part
"""


def q_registered_domain(spark, sf_dir):
    """C2: eTLD+1 with a two-level public suffix."""
    from .functions.udfs import registered_domain_udf

    p = _read(spark, sf_dir, "part")
    url = F.concat(F.lit("http://www.sub.brand"),
                   (F.col("p_partkey") % 20).cast("string"),
                   F.lit(".co.uk/x"))
    return p.select("p_partkey",
                    registered_domain_udf(url).alias("registered_domain"))


SQL_REG_DOMAIN = """
SELECT p_partkey, 'brand' || (p_partkey % 20) || '.co.uk' AS registered_domain
FROM part
"""


def q_url_to_path(spark, sf_dir):
    """C3+T4: site-relative _path with isindex semantics; expected values
    constructed in the oracle SQL."""
    from .functions.udfs import url_to_path_udf

    p = _read(spark, sf_dir, "part")
    url = F.concat(
        F.lit("http://shop.com/"),
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(F.lit("dir"), (F.col("p_partkey") % 7).cast("string"),
                        F.lit("/")))
        .otherwise(F.concat(F.lit("items/%7E"),
                            F.col("p_partkey").cast("string"),
                            F.lit(".html"))))
    return p.select(
        "p_partkey",
        url_to_path_udf(url, F.lit("http://shop.com/")).alias("path"))


SQL_URL_TO_PATH = """
SELECT p_partkey,
       CASE WHEN p_partkey % 3 = 0
            THEN 'dir' || (p_partkey % 7) || '/index.html'
            ELSE 'items/~' || p_partkey || '.html' END AS path
FROM part
"""


def q_typerecognitor(spark, sf_dir):
    """T2: the pinned MIME -> content-type map, generated from the oracle's
    table (plans.crawl.content_type_expr); oracle SQL mirrors the map."""
    from .plans.crawl import content_type_expr

    p = _read(spark, sf_dir, "part")
    mt = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit("text/html"))
        .when(F.col("p_partkey") % 5 == 1, F.lit("application/pdf"))
        .when(F.col("p_partkey") % 5 == 2, F.lit("image/png"))
        .when(F.col("p_partkey") % 5 == 3, F.lit("text/plain"))
        .otherwise(F.lit("application/zip")))
    return p.select("p_partkey", mt.alias("mimetype"),
                    content_type_expr(mt).alias("content_type"))


SQL_TYPERECOGNITOR = """
SELECT p_partkey,
       CASE p_partkey % 5 WHEN 0 THEN 'text/html'
            WHEN 1 THEN 'application/pdf' WHEN 2 THEN 'image/png'
            WHEN 3 THEN 'text/plain' ELSE 'application/zip' END AS mimetype,
       CASE p_partkey % 5 WHEN 0 THEN 'Document'
            WHEN 2 THEN 'Image' ELSE 'File' END AS content_type
FROM part
"""


def q_robots_gate(spark, sf_dir):
    """S6/J3: robots.txt gating via urllib.robotparser inside the pandas UDF;
    rules chosen so expectations are SQL-constructible."""
    from .functions.udfs import robots_allowed_udf

    p = _read(spark, sf_dir, "part")
    url = F.concat(F.lit("http://shop.com/"),
                   F.when(F.col("p_partkey") % 2 == 0, F.lit("private/"))
                   .otherwise(F.lit("public/")),
                   F.col("p_partkey").cast("string"), F.lit(".html"))
    robots = F.lit("User-agent: *\nDisallow: /private/\n")
    return p.select(
        "p_partkey",
        robots_allowed_udf(robots, url, F.lit("bot")).alias("allowed"))


SQL_ROBOTS_GATE = """
SELECT p_partkey, (p_partkey % 2 <> 0) AS allowed FROM part
"""


# =============================================================================
# training-data pipeline suite (documents / embeddings)
# =============================================================================

def q_dedup_exact(spark, sf_dir):
    from .operators.textops import dedup_exact
    return dedup_exact(_read(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(regexp_replace(lower(text), '\\s+', ' ')) AS fingerprint,
       min(doc_id) AS keep_doc_id, count(*) AS n_dupes
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(spark, sf_dir):
    from .operators.textops import doc_fingerprint
    return doc_fingerprint(_readp(spark, sf_dir, "documents"))


SQL_FINGERPRINT = """
SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ')) AS fingerprint
FROM documents
"""


def q_lang_id(spark, sf_dir):
    from .operators.textops import lang_id
    return lang_id(_readp(spark, sf_dir, "documents"))


SQL_LANG_ID = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), r AS (
  SELECT doc_id,
         CASE WHEN len(ws) > 0 THEN
           len(list_filter(ws, w -> list_contains(
             ['the','and','of','to','a','in','is','that','it','for'], w)))
           * 1.0 / len(ws)
         ELSE 0.0 END AS ratio
  FROM w
)
SELECT doc_id, round(ratio, 4) AS stopword_ratio,
       CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'und' END AS lang_pred
FROM r
"""


def q_quality_score(spark, sf_dir):
    from .operators.textops import quality_score
    return quality_score(_readp(spark, sf_dir, "documents"))


SQL_QUALITY = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       len(ws) AS n_words,
       round(CASE WHEN length(text) > 0 THEN
         (length(text) - length(regexp_replace(text,
             '[.,!?;:''"()]', '', 'g'))) * 1.0 / length(text)
         ELSE 0.0 END, 4) AS punct_ratio,
       round(CASE WHEN len(ws) > 0 THEN
         list_sum(list_transform(ws, x -> length(x))) * 1.0 / len(ws)
         ELSE 0.0 END, 4) AS mean_word_len
FROM w
"""


def q_token_count(spark, sf_dir):
    from .operators.textops import token_count
    return token_count(_readp(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT = """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS n_tokens_ws,
       len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]'))::bigint AS n_tokens_re,
       ceil(length(regexp_replace(text, '\\s+', '', 'g')) / 4.0)::bigint
           AS n_tokens_bpe_est
FROM documents
"""


def q_gopher_quality(spark, sf_dir):
    from .operators.textops import gopher_quality
    return gopher_quality(_readp(spark, sf_dir, "documents"))


SQL_GOPHER = """
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id, text, ws, lines,
         len(ws) AS n_words,
         len(lines) AS n_lines,
         list_distinct(lines) AS dlines,
         coalesce(list_sum(list_transform(lines, l -> length(l))), 0)
             AS line_chars,
         coalesce(list_sum(list_transform(list_distinct(lines),
                                          l -> length(l))), 0) AS dline_chars,
         CASE WHEN len(ws) > 0 THEN
           list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws)
         ELSE 0.0 END AS mean_wlen,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) // 3
             AS n_ellipsis
  FROM base
), s AS (
  SELECT doc_id, n_words, mean_wlen,
         CASE WHEN n_words > 0
              THEN (n_hash + n_ellipsis) * 1.0 / n_words
              ELSE 0.0 END AS symbol_ratio,
         len(list_filter(lines, l ->
             starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* ')
             OR starts_with(ltrim(l), '• '))) * 1.0 / n_lines
             AS frac_bullet,
         len(list_filter(lines, l -> ends_with(rtrim(l), '...')))
             * 1.0 / n_lines AS frac_ellipsis,
         CASE WHEN n_words > 0 THEN
           len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
             * 1.0 / n_words
         ELSE 0.0 END AS frac_alpha,
         len(list_intersect(list_distinct(ws),
             ['the','and','of','to','a','in','is','that','it','for']))
             AS stop_hits,
         (n_lines - len(dlines)) * 1.0 / n_lines AS frac_dup_lines,
         CASE WHEN line_chars > 0
              THEN (line_chars - dline_chars) * 1.0 / line_chars
              ELSE 0.0 END AS frac_dup_chars
  FROM m
)
SELECT doc_id,
       n_words,
       round(mean_wlen, 4) AS mean_word_len,
       round(symbol_ratio, 4) AS symbol_ratio,
       round(frac_bullet, 4) AS frac_bullet_lines,
       round(frac_ellipsis, 4) AS frac_ellipsis_lines,
       round(frac_alpha, 4) AS frac_alpha_words,
       stop_hits AS n_stopwords,
       round(frac_dup_lines, 4) AS frac_dup_lines,
       round(frac_dup_chars, 4) AS frac_dup_line_chars,
       (n_words >= 50 AND n_words <= 100000
        AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
        AND symbol_ratio < 0.1 AND frac_bullet < 0.9
        AND frac_ellipsis < 0.3 AND frac_alpha > 0.8
        AND stop_hits >= 2 AND frac_dup_lines < 0.3) AS passes_gopher
FROM s
"""


def q_repetition_stats(spark, sf_dir):
    from .operators.textops import repetition_stats
    return repetition_stats(_readp(spark, sf_dir, "documents"), n=2)


SQL_REPETITION = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(ws) >= 2 THEN
                  list_transform(range(1, len(ws)),
                                 i -> array_to_string(ws[i:i+1], ' '))
                ELSE [] END) AS gram
  FROM w
), gf AS (
  SELECT doc_id, gram FROM g WHERE gram <> ''
), c AS (
  SELECT doc_id, gram, count(*) AS c FROM gf GROUP BY 1, 2
), p AS (
  SELECT doc_id,
         sum(c) AS n_grams,
         max(c) AS top_c,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_c,
         sum(c * length(gram)) AS chars,
         sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) AS dup_chars
  FROM c GROUP BY 1
)
SELECT d.doc_id,
       coalesce(n_grams, 0) AS n_grams,
       round(CASE WHEN coalesce(n_grams, 0) > 0
                  THEN top_c * 1.0 / n_grams ELSE 0.0 END, 4)
           AS top_gram_frac,
       round(CASE WHEN coalesce(n_grams, 0) > 0
                  THEN dup_c * 1.0 / n_grams ELSE 0.0 END, 4)
           AS dup_gram_frac,
       round(CASE WHEN coalesce(chars, 0) > 0
                  THEN dup_chars * 1.0 / chars ELSE 0.0 END, 4)
           AS dup_char_frac
FROM documents d LEFT JOIN p USING (doc_id)
"""


def q_decontaminate(spark, sf_dir):
    from .operators.textops import decontaminate
    return decontaminate(_readp(spark, sf_dir, "documents"),
                         bench_mod=20, shingle_n=3, frac_threshold=0.8)


SQL_DECONTAMINATE = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
                i -> array_to_string(ws[i:i+2], ' '))) AS shingle
  FROM w
), sh_f AS (
  SELECT doc_id, shingle FROM sh WHERE shingle <> ''
), bsh AS (
  SELECT DISTINCT shingle FROM sh_f WHERE doc_id % 20 = 0
), csh AS (
  SELECT doc_id, shingle FROM sh_f WHERE doc_id % 20 <> 0
), sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY 1
), hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM csh JOIN bsh USING (shingle) GROUP BY 1
)
SELECT s.doc_id, s.n_shingles,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       round(coalesce(h.n_contaminated, 0) * 1.0 / s.n_shingles, 4)
           AS contamination_frac,
       coalesce(h.n_contaminated, 0) * 1.0 / s.n_shingles >= 0.8
           AS is_contaminated
FROM sizes s LEFT JOIN hits h USING (doc_id)
"""


def q_cleaning_decision(spark, sf_dir):
    """The END-TO-END cleaning verdict — one keep/drop + reason row per
    document, composed from exact-dedup canonical, language-ID, Gopher
    quality, and the repetition profile (first failing stage wins).
    Non-vacuous: the corpus is unioned with perturbed twins (doc_id +
    1000000, identical normalized text) so the 'duplicate' branch provably
    fires alongside the quality/language/repetition branches."""
    from .operators.pipeline import cleaning_decision

    base = _readp(spark, sf_dir, "documents").select("doc_id", "text")
    twin = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace(F.upper("text"), " ", "  ").alias("text"))
    return cleaning_decision(base.unionByName(twin))


def _sql_cleaning_decision() -> str:
    uni = ("SELECT doc_id, text FROM documents UNION ALL "
           "SELECT doc_id + 1000000 AS doc_id, "
           "regexp_replace(upper(text), ' ', '  ', 'g') AS text "
           "FROM documents")
    gopher = SQL_GOPHER.replace("FROM documents", f"FROM ({uni})")
    rep = SQL_REPETITION.replace("FROM documents", f"FROM ({uni})")
    lang = SQL_LANG_ID.replace("FROM documents", f"FROM ({uni})")
    return f"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS f
  FROM ({uni})
), canon AS (
  SELECT f, min(doc_id) AS canonical_id FROM fp GROUP BY 1
), d AS (
  SELECT fp.doc_id, canonical_id,
         fp.doc_id = canonical_id AS is_canonical
  FROM fp JOIN canon USING (f)
), g AS (SELECT doc_id, passes_gopher FROM ({gopher})),
r AS (SELECT doc_id, dup_gram_frac FROM ({rep})),
l AS (SELECT doc_id, lang_pred FROM ({lang}))
SELECT d.doc_id, d.canonical_id, d.is_canonical, g.passes_gopher,
       r.dup_gram_frac, l.lang_pred,
       (d.is_canonical AND l.lang_pred = 'en' AND g.passes_gopher
        AND r.dup_gram_frac < 0.5) AS keep,
       CASE WHEN NOT d.is_canonical THEN 'duplicate'
            WHEN l.lang_pred <> 'en' THEN 'language'
            WHEN NOT g.passes_gopher THEN 'quality'
            WHEN r.dup_gram_frac >= 0.5 THEN 'repetition'
            ELSE '' END AS reason
FROM d JOIN g USING (doc_id) JOIN r USING (doc_id) JOIN l USING (doc_id)
"""


def q_exact_quantiles(spark, sf_dir):
    """Exact distributed percentiles of document length: value-histogram +
    two-phase prefix sum — PERCENTILE_DISC semantics without ever sorting
    the rows globally (operators/quantiles.py)."""
    from .operators.quantiles import exact_quantiles

    docs = _read(spark, sf_dir, "documents")
    return exact_quantiles(docs, "n_chars",
                           [100, 2500, 5000, 9000, 9900, 10000])


def _sql_exact_quantiles() -> str:
    from .operators.quantiles import exact_quantiles_sql
    return exact_quantiles_sql("SELECT n_chars FROM documents", "n_chars",
                               [100, 2500, 5000, 9000, 9900, 10000])


def q_grouped_quantiles(spark, sf_dir):
    """Per-source exact percentiles of document length — the stratified
    sibling of exact_quantiles with the same no-global-sort construction
    (operators/quantiles.py grouped_quantiles)."""
    from .operators.quantiles import grouped_quantiles

    docs = _read(spark, sf_dir, "documents")
    return grouped_quantiles(docs, "source", "n_chars",
                             [2500, 5000, 9000, 9900])


def _sql_grouped_quantiles() -> str:
    from .operators.quantiles import grouped_quantiles_sql
    return grouped_quantiles_sql("SELECT source, n_chars FROM documents",
                                 "source", "n_chars",
                                 [2500, 5000, 9000, 9900])


def q_revisit_records(spark, sf_dir):
    """WARC revisit semantics: doc_id%3==0 rows get a later identical-
    payload capture (doc_id+1000000, same text => same digest), which must
    come out as record_type='revisit' pointing at the original url/ts;
    the rest stay 'response' (operators/cdx.py revisit_records)."""
    from .operators.cdx import revisit_records

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    cap = d.select(
        F.concat(F.lit("https://ex"), (F.col("doc_id") % 40).cast("string"),
                 F.lit(".com/p"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.col("doc_id").cast("long").alias("ts"),
        F.md5(F.col("text").cast("binary")).alias("digest"))
    twin = (d.filter(F.col("doc_id") % 3 == 0)
            .select(F.concat(F.lit("https://mirror.com/p"),
                             F.col("doc_id").cast("string")).alias("url"),
                    (F.col("doc_id") + 1000000).cast("long").alias("ts"),
                    F.md5(F.col("text").cast("binary")).alias("digest")))
    return revisit_records(cap.unionByName(twin))


def _sql_revisit_records() -> str:
    from .operators.cdx import revisit_records_sql
    caps = ("SELECT 'https://ex' || (doc_id % 40)::VARCHAR || '.com/p' ||"
            " doc_id::VARCHAR AS url, CAST(doc_id AS BIGINT) AS ts,"
            " md5(text) AS digest FROM documents"
            " UNION ALL "
            "SELECT 'https://mirror.com/p' || doc_id::VARCHAR AS url,"
            " CAST(doc_id + 1000000 AS BIGINT) AS ts, md5(text) AS digest"
            " FROM documents WHERE doc_id % 3 = 0")
    return revisit_records_sql(caps)


def q_cdxj_export(spark, sf_dir):
    """CDXJ index lines over synthesized captures (url/ts/digest/length
    all doc_id-derived): the published web-archive index format, bytes
    deterministic under the pinned key order (operators/cdx.py
    cdxj_lines)."""
    from .operators.cdx import cdxj_lines

    did = F.col("doc_id")
    caps = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://WWW.ex"), (did % 40).cast("string"),
                 F.lit(".com:443/p"), did.cast("string")).alias("url"),
        did.cast("long").alias("ts"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.col("n_chars").cast("long").alias("length"))
    return cdxj_lines(caps)


def _sql_cdxj_export() -> str:
    from .operators.cdx import cdxj_lines_sql
    caps = ("SELECT 'https://WWW.ex' || (doc_id % 40)::VARCHAR ||"
            " '.com:443/p' || doc_id::VARCHAR AS url,"
            " CAST(doc_id AS BIGINT) AS ts, md5(text) AS digest,"
            " CAST(n_chars AS BIGINT) AS length FROM documents")
    return cdxj_lines_sql(caps)


def q_snapshot_delta(spark, sf_dir):
    """Recrawl snapshot diff over deterministically-perturbed twins of the
    documents table: old drops doc_id%10==0 (-> 'added' in new), new drops
    doc_id%10==5 (-> 'gone'), doc_id%7==0 rewrites the text (-> 'changed');
    the rest are 'unchanged' — all four statuses provably fire."""
    from .operators.delta import snapshot_delta

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    old = (docs.filter(F.col("doc_id") % 10 != 0)
           .select("doc_id", F.md5(F.col("text").cast("binary"))
                   .alias("digest")))
    new_text = F.when(F.col("doc_id") % 7 == 0,
                      F.concat(F.col("text"), F.lit(" v2"))) \
                .otherwise(F.col("text"))
    new = (docs.filter(F.col("doc_id") % 10 != 5)
           .select("doc_id", F.md5(new_text.cast("binary")).alias("digest")))
    return snapshot_delta(old, new, key_col="doc_id")


def _sql_snapshot_delta() -> str:
    from .operators.delta import snapshot_delta_sql
    old = ("SELECT doc_id, md5(text) AS digest FROM documents "
           "WHERE doc_id % 10 <> 0")
    new = ("SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0 "
           "THEN text || ' v2' ELSE text END) AS digest "
           "FROM documents WHERE doc_id % 10 <> 5")
    return snapshot_delta_sql(old, new, key_sql="doc_id",
                              digest_sql="digest")


# messy-suffix codepoints for the NFC fixture: ' Cafe' + COMBINING ACUTE
# (composes to é), BEL (control -> stripped), ANGSTROM SIGN (NFC-maps to
# U+00C5 Å), double space (collapses). Built from codepoints on BOTH sides
# so no raw control byte ever has to survive a SQL literal.
_NFC_SUFFIX_CPS = [0x20, 0x43, 0x61, 0x66, 0x65, 0x301, 0x7, 0x20, 0x20,
                   0x212B, 0x78]


def q_normalize_text(spark, sf_dir):
    """Unicode canonical form (NFC + control strip + whitespace collapse):
    doc_id%3==0 rows get a combining-accent/control suffix so the NFC and
    strip branches provably fire; Unicode's normalization stability
    guarantee makes Python's unicodedata and DuckDB's utf8proc byte-equal."""
    from .operators.textops import normalize_text

    suffix = "".join(chr(c) for c in _NFC_SUFFIX_CPS)
    docs = _readp(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(suffix)))
         .otherwise(F.col("text")).alias("text"))
    return normalize_text(docs)


def _sql_normalize_text() -> str:
    from .operators.textops import normalize_text_sql
    suffix = " || ".join(f"chr({c})" for c in _NFC_SUFFIX_CPS)
    fx = (f"SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
          f"THEN text || {suffix} ELSE text END AS text FROM documents")
    return normalize_text_sql(fx)


def q_bpe_merges(spark, sf_dir):
    """First 6 BPE merges learned over the corpus word-frequency table —
    exact integer pair weights + lexicographic tie-break make the merge
    sequence engine-portable (operators/bpe.py)."""
    from .operators.bpe import bpe_merges

    return bpe_merges(_readp(spark, sf_dir, "documents"), k=6)


def _sql_bpe_merges() -> str:
    from .operators.bpe import bpe_merges_sql
    return bpe_merges_sql("SELECT text FROM documents", k=6)


# the first 8 merges a run of bpe_merges learns on the sf0.001/sf0.01
# documents fixture would be corpus-dependent; the ENCODE contract is
# "apply THIS merge list" — so the harness pins a fixed, realistic English
# merge sequence and both engines apply it identically.
_BPE_FIXED_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
                     ("e", "r"), ("o", "n"), ("an", "d"), ("in", "g")]


def q_bpe_encode(spark, sf_dir):
    """BPE application: tokenize every document with a pinned 8-merge
    list (train-order chained replaces, pure Catalyst) and report
    words/tokens per doc (operators/bpe.py bpe_encode)."""
    from .operators.bpe import bpe_encode

    return bpe_encode(_readp(spark, sf_dir, "documents"),
                      _BPE_FIXED_MERGES)


def _sql_bpe_encode() -> str:
    from .operators.bpe import bpe_encode_sql
    return bpe_encode_sql("SELECT doc_id, text FROM documents",
                          _BPE_FIXED_MERGES)


def q_cms_topk(spark, sf_dir):
    """Count-Min heavy hitters: sketch every word occurrence into a
    d=4 x w=256 counter table (map-side-combining, <=1024 rows shuffle),
    then estimate the 20 highest-frequency words and report est vs exact —
    the one-sided guarantee (est >= exact) rides in every checked row."""
    from .operators.sketches import cms_counters, cms_estimate
    from .operators.textops import words_expr

    docs = _readp(spark, sf_dir, "documents")
    occ = docs.select(F.explode(words_expr(F.col("text"))).alias("word"))
    # one pass over the occurrences serves both the sketch and the exact
    # top-20 (the old shape exploded + counted the corpus twice)
    per_word = (occ.groupBy("word").agg(F.count("*").alias("exact_cnt"))
                .persist())
    counters = cms_counters(per_word, "word", weight_col="exact_cnt")
    top = per_word.orderBy(F.col("exact_cnt").desc(),
                           F.col("word")).limit(20)
    est = cms_estimate(counters, top, "word")
    return (top.join(est, "word")
            .select("word", "exact_cnt", "cms_est",
                    (F.col("cms_est") >= F.col("exact_cnt"))
                    .alias("never_undercounts")))


def _sql_cms_topk() -> str:
    from .operators.sketches import cms_sql
    occ = ("SELECT unnest(list_filter(string_split_regex(lower(text),"
           " '\\s+'), x -> x <> '')) AS word FROM documents")
    top = (f"SELECT word, count(*) AS exact_cnt FROM ({occ}) "
           f"GROUP BY word ORDER BY exact_cnt DESC, word LIMIT 20")
    est = cms_sql(occ, "word", f"SELECT word FROM ({top})")
    return f"""
WITH top AS ({top}), est AS ({est})
SELECT top.word, CAST(top.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(est.cms_est AS BIGINT) AS cms_est,
       est.cms_est >= top.exact_cnt AS never_undercounts
FROM top JOIN est ON top.word = est.k
"""


def q_chunk_documents(spark, sf_dir):
    """Sliding-window LM chunking: 128-token windows, stride 96 (32-token
    overlap) — one training-example row per window, exact integer
    arithmetic, pure Catalyst explode (operators/chunking.py)."""
    from .operators.chunking import chunk_documents

    return chunk_documents(_read(spark, sf_dir, "documents"),
                           context_len=128, stride=96)


def _sql_chunk_documents() -> str:
    from .operators.chunking import chunk_documents_sql
    return chunk_documents_sql("SELECT doc_id, text FROM documents",
                               context_len=128, stride=96)


def q_warc_roundtrip(spark, sf_dir):
    """WARC container round-trip: pack documents into per-record-gzipped
    WARC blobs (the Common-Crawl layout), parse them back with the stdlib
    record parser, and emit one row per response record. The oracle is a
    plain projection of the same table — equality proves the container
    framing, gzip members, HTTP block, and payload bytes all survive."""
    from pyspark.sql import functions as F
    from .sources.warc import synthesize_warc, warc_records
    docs = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("text").cast("binary").alias("payload"),
    )
    recs = warc_records(synthesize_warc(docs, n_files=32, compress=True))
    return (recs.filter(F.col("warc_type") == "response")
            .select(F.col("target_uri").alias("url"), "http_status",
                    "content_length", "payload_sha256"))


SQL_WARC_ROUNDTRIP = """
SELECT 'https://example.org/doc/' || doc_id AS url,
       200 AS http_status,
       octet_length(encode(text)) AS content_length,
       sha256(text) AS payload_sha256
FROM documents
"""


def q_wet_export(spark, sf_dir):
    """WET (extracted-text conversion records) round-trip — the Common
    Crawl text-distribution layout: pack documents into per-record-gzipped
    WET blobs, parse them back with the same stdlib record reader, one row
    per conversion record. Oracle = plain projection; equality proves the
    conversion framing and text bytes survive."""
    from .sources.warc import synthesize_wet, warc_records
    docs = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
    )
    recs = warc_records(synthesize_wet(docs, n_files=32, compress=True))
    return (recs.filter(F.col("warc_type") == "conversion")
            .select(F.col("target_uri").alias("url"),
                    "content_length", "payload_sha256"))


SQL_WET_EXPORT = """
SELECT 'https://example.org/doc/' || doc_id AS url,
       octet_length(encode(text)) AS content_length,
       sha256(text) AS payload_sha256
FROM documents
"""


def q_sitemap_extract(spark, sf_dir):
    """Sitemap round-trip: build per-domain sitemaps.org XML from a URL
    universe (Catalyst concat over sorted collect_list), then extract the
    <loc> entries back out with the JVM xpath expression. The oracle builds
    the same XML with string_agg and extracts with regexp — different
    engines, different extraction technology, identical rows."""
    from pyspark.sql import functions as F
    from .sources.sitemap import synthesize_sitemaps, sitemap_urls
    urls = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("d"), (F.col("doc_id") % 50).cast("string"),
                 F.lit(".example.org")).alias("domain"),
        F.concat(F.lit("https://d"), (F.col("doc_id") % 50).cast("string"),
                 F.lit(".example.org/page/"),
                 F.col("doc_id").cast("string")).alias("url"),
    )
    return sitemap_urls(synthesize_sitemaps(urls))


SQL_SITEMAP_EXTRACT = """
WITH u AS (
  SELECT 'd' || (doc_id % 50) || '.example.org' AS domain,
         'https://d' || (doc_id % 50) || '.example.org/page/' || doc_id
             AS url
  FROM documents
), x AS (
  SELECT domain,
         '<?xml version="1.0" encoding="UTF-8"?>'
         || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         || string_agg('<url><loc>' || url || '</loc></url>', ''
                       ORDER BY url)
         || '</urlset>' AS xml
  FROM u GROUP BY domain
)
SELECT domain,
       unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS loc
FROM x
"""


def q_kmeans(spark, sf_dir):
    """Exact-arithmetic k-means (k=8, 3 Lloyd iterations) over the
    embeddings table. Integer quantization + grid centroids make the
    assignment AND the distances bit-exact under any partitioning — the
    oracle equality is exact, not tolerance-based."""
    from .operators.clustering import kmeans_exact
    return kmeans_exact(_readp(spark, sf_dir, "embeddings"),
                        k=8, iterations=3, dim=64)


def _sql_kmeans() -> str:
    from .operators.clustering import kmeans_sql
    return kmeans_sql("SELECT vec_id, embedding FROM embeddings",
                      k=8, iterations=3, dim=64)


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def q_mixture_sample(spark, sf_dir):
    from .operators.sampling import mixture_sample
    return mixture_sample(_read(spark, sf_dir, "documents"),
                          rates=_MIX_RATES, default_rate=0.75)


def _sql_mixture_sample() -> str:
    from .operators.sampling import mixture_sample_sql
    return mixture_sample_sql("SELECT doc_id, source FROM documents",
                              rates=_MIX_RATES, default_rate=0.75)


def q_stratified_topn(spark, sf_dir):
    from .operators.sampling import stratified_topn
    return stratified_topn(_read(spark, sf_dir, "documents"), n=25)


def _sql_stratified_topn() -> str:
    from .operators.sampling import stratified_topn_sql
    return stratified_topn_sql("SELECT doc_id, source FROM documents", n=25)


def q_pack_sequences(spark, sf_dir):
    from .operators.sampling import pack_sequences
    return pack_sequences(_read(spark, sf_dir, "documents"),
                          context_len=2048, block=64)


def _sql_pack_sequences() -> str:
    from .operators.sampling import pack_sequences_sql
    return pack_sequences_sql("SELECT doc_id, text FROM documents",
                              context_len=2048)


def q_trap_urls(spark, sf_dir):
    """Crawler-trap URL scoring over a deterministic URL universe that
    exercises all three signals (looping segments via repeat, deep paths,
    parameter explosions)."""
    from pyspark.sql import functions as F
    from .operators.traps import trap_signals
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://d"), (d % 50).cast("string"), F.lit(".example.org"),
        F.repeat(F.concat(F.lit("/p"), (d % 4).cast("string")),
                 (d % 15).cast("int")),
        F.when(d % 7 == 0,
               F.lit("?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9"))
         .when(d % 11 == 0, F.lit("?x=1")).otherwise(F.lit("")),
    )
    urls = _readp(spark, sf_dir, "documents").select(url.alias("url"))
    return trap_signals(urls)


SQL_TRAP_URLS = """
WITH u AS (
  SELECT 'https://d' || (doc_id % 50) || '.example.org'
         || repeat('/p' || (doc_id % 4), CAST(doc_id % 15 AS INT))
         || CASE WHEN doc_id % 7 = 0
                 THEN '?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9'
                 WHEN doc_id % 11 = 0 THEN '?x=1'
                 ELSE '' END AS url
  FROM documents
), s AS (
  SELECT url,
         list_filter(string_split(
           regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
           '/'), x -> x <> '') AS segs,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM u
), m AS (
  SELECT url, len(segs) AS depth,
         coalesce(list_max(list_transform(list_distinct(segs),
             s2 -> len(list_filter(segs, x -> x = s2)))), 0)
             AS max_seg_repeat,
         CASE WHEN q <> '' THEN len(string_split(q, '&')) ELSE 0 END
             AS n_params
  FROM s
)
SELECT url, depth, max_seg_repeat, n_params,
       (depth > 12 OR max_seg_repeat >= 3 OR n_params > 8) AS is_trap
FROM m
"""


def q_robots_sitemap(spark, sf_dir):
    """Sitemap autodiscovery from robots.txt bodies (the sitemaps.org
    Sitemap: directive — case-insensitive key, leading whitespace legal,
    non-directive lookalikes must NOT match)."""
    from pyspark.sql import functions as F
    from .sources.sitemap import robots_sitemaps
    n = F.col("n")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n"),
        F.lit("Sitemap: https://d"), n.cast("string"),
        F.lit(".example.org/sitemap.xml\n"),
        F.when(n % 3 == 0, F.concat(
            F.lit("  sitemap:\thttps://d"), n.cast("string"),
            F.lit(".example.org/sitemap2.xml\n"))).otherwise(F.lit("")),
        F.lit("notasitemap: https://evil.example/x\nAllow: /\n"),
    )
    robots = (_read(spark, sf_dir, "documents")
              .select((F.col("doc_id") % 50).alias("n")).distinct()
              .select(F.concat(F.lit("d"), n.cast("string"),
                               F.lit(".example.org")).alias("domain"),
                      body.alias("robots_txt")))
    return robots_sitemaps(robots)


SQL_ROBOTS_SITEMAP = """
WITH r AS (
  SELECT DISTINCT 'd' || (doc_id % 50) || '.example.org' AS domain,
         'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10)
         || 'Sitemap: https://d' || (doc_id % 50)
         || '.example.org/sitemap.xml' || chr(10)
         || CASE WHEN (doc_id % 50) % 3 = 0
                 THEN '  sitemap:' || chr(9) || 'https://d' || (doc_id % 50)
                      || '.example.org/sitemap2.xml' || chr(10)
                 ELSE '' END
         || 'notasitemap: https://evil.example/x' || chr(10)
         || 'Allow: /' || chr(10) AS robots_txt
  FROM documents
)
SELECT domain,
       unnest(regexp_extract_all(robots_txt,
              '(?im)^[ \\t]*sitemap:[ \\t]*([^ \\t\\r\\n]+)', 1))
           AS sitemap_url
FROM r
"""


def q_recrawl_schedule(spark, sf_dir):
    """Freshness scheduling over the events table as a fetch log:
    user_id = url, value = content fingerprint, lag-window change
    detection -> exact-integer recrawl interval."""
    from .operators.frontier import recrawl_schedule
    return recrawl_schedule(_read(spark, sf_dir, "events"),
                            id_col="user_id", ts_col="ts",
                            content_col="value", order_col="event_id")


SQL_RECRAWL = """
WITH o AS (
  SELECT user_id AS url_id, epoch_us(ts) AS eus, value AS fp,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
  FROM events
), a AS (
  SELECT url_id, count(*) AS n_fetches,
         sum(CASE WHEN prev IS NOT NULL AND fp <> prev
                  THEN 1 ELSE 0 END) AS n_changes,
         max(eus) - min(eus) AS span_us
  FROM o GROUP BY 1
)
SELECT url_id, n_fetches, n_changes, span_us,
       least(2592000000000, greatest(3600000000,
             CASE WHEN n_changes > 0 THEN span_us // n_changes
                  ELSE 2592000000000 END)) AS recrawl_us
FROM a
"""


def q_ngram_jaccard(spark, sf_dir):
    from .operators.textops import ngram_jaccard_pairs
    return ngram_jaccard_pairs(
        _readp(spark, sf_dir, "documents"), threshold=0.2
    ).select("a", "b", F.round("jaccard", 4).alias("jaccard"))


SQL_NGRAM_JACCARD = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
                i -> array_to_string(ws[i:i+2], ' '))) AS shingle
  FROM w
), sh_f AS (
  SELECT doc_id, shingle FROM sh WHERE shingle <> ''
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh_f GROUP BY doc_id
), df_ok AS (
  SELECT shingle FROM sh_f GROUP BY shingle HAVING count(*) <= 1000
), sf2 AS (
  SELECT s.doc_id, s.shingle FROM sh_f s JOIN df_ok USING (shingle)
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
  FROM sf2 x JOIN sf2 y USING (shingle)
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
"""


def q_dup_clusters(spark, sf_dir):
    """Near-dup pairs -> retention CLUSTERS: connected components (6-round
    min-label propagation) over the exact-Jaccard pair graph. The missing
    last step of every pair-emitting dedup family — "keep one doc per
    duplicate cluster" needs the transitive closure, not the pairs."""
    from .operators.graph import connected_components
    from .operators.textops import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_readp(spark, sf_dir, "documents"),
                                threshold=0.2)
    return connected_components(pairs, iterations=6, src="a", dst="b")


def _sql_dup_clusters() -> str:
    from .operators.graph import connected_components_sql
    return connected_components_sql(
        "SELECT a AS src, b AS dst FROM (" + SQL_NGRAM_JACCARD + ")",
        iterations=6)


# target language mixture for the rebalance plan: en-heavy, an
# under-supplied zh target (provable deficit), and a stratum absent from
# the corpus ('ja') so the full-outer path provably fires
_REBALANCE_TARGETS = {"en": 4000, "de": 2000, "fr": 1500, "es": 1000,
                      "zh": 1400, "ja": 100}


def q_rebalance_plan(spark, sf_dir):
    """Data-mixture planning: derive per-language sampling rates (basis
    points) realizing a target distribution from the corpus's actual lang
    counts — deficits flag unreachable targets; 'ja' exercises the
    absent-stratum path (operators/sampling.py rebalance_plan)."""
    from .operators.sampling import rebalance_plan

    return rebalance_plan(_read(spark, sf_dir, "documents"),
                          _REBALANCE_TARGETS)


def _sql_rebalance_plan() -> str:
    from .operators.sampling import rebalance_plan_sql
    return rebalance_plan_sql("SELECT lang FROM documents",
                              _REBALANCE_TARGETS)


def q_canonical_quality(spark, sf_dir):
    """Quality-aware retention: connected components over the exact-Jaccard
    pair graph, then keep the HIGHEST-token-count member per cluster (ties
    to smallest id) — the production policy ('keep the most complete
    copy') vs dedup_retention's min-id (operators/graph.py
    canonical_by_quality)."""
    from .operators.graph import canonical_by_quality
    from .operators.textops import ngram_jaccard_pairs, words_expr

    d = _readp(spark, sf_dir, "documents")
    docs = d.select("doc_id",
                    F.size(words_expr(F.col("text"))).cast("long")
                    .alias("quality"))
    pairs = ngram_jaccard_pairs(d, threshold=0.2)
    return canonical_by_quality(docs, pairs, src="a", dst="b")


def _sql_canonical_quality() -> str:
    from .operators.graph import canonical_by_quality_sql
    docs = ("SELECT doc_id, len(list_filter(string_split_regex("
            "lower(text), '\\s+'), x -> x <> '')) AS quality "
            "FROM documents")
    pairs = "SELECT a AS src, b AS dst FROM (" + SQL_NGRAM_JACCARD + ")"
    return canonical_by_quality_sql(docs, pairs, iterations=6)


def q_pagerank(spark, sf_dir):
    """Fixed-point PageRank (3 iterations, damping 0.85) over the
    order->part link graph — the principled upgrade of inlink_score (A2).
    All-BIGINT arithmetic makes the result bit-exact under any partitioning,
    so the oracle equality is exact, not tolerance-based."""
    from .operators.graph import pagerank_fixed
    return pagerank_fixed(_readpk(spark, sf_dir, "lineitem", "l_orderkey"), iterations=3,
                          src="l_orderkey", dst="l_partkey")


def _sql_pagerank() -> str:
    from .operators.graph import pagerank_sql
    return pagerank_sql(
        "SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem",
        iterations=3)


def q_hits(spark, sf_dir):
    """Fixed-point HITS hubs/authorities (2 iterations, max-normalized
    all-BIGINT arithmetic) over the same order->part link graph as
    pagerank — bit-exact under any partitioning, exact oracle equality."""
    from .operators.graph import hits_fixed
    return hits_fixed(_readpk(spark, sf_dir, "lineitem", "l_orderkey"), iterations=2,
                      src="l_orderkey", dst="l_partkey")


def _sql_hits() -> str:
    from .operators.graph import hits_sql
    return hits_sql(
        "SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem",
        iterations=2)


def q_inverted_postings(spark, sf_dir):
    """Serving-side inverted index: term -> sorted distinct posting list
    (min_df=2 hapax cut, max_df=200 stopword cut), postings serialized for
    the hash gate like backlink_collect. The documents fixture has a
    31-term always-everywhere vocabulary (all stopword-cut), so each doc
    gets two deterministic topic tags (doc_id mod 97 / mod 13) — mid-df
    terms that provably survive both cuts (operators/textops.py)."""
    from .operators.textops import inverted_postings

    docs = _readp(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" t"),
                 (F.col("doc_id") % 97).cast("string"), F.lit(" t"),
                 (F.col("doc_id") % 13).cast("string")).alias("text"))
    return inverted_postings(docs, min_df=2, max_df=200)


def _sql_inverted_postings() -> str:
    from .operators.textops import inverted_postings_sql
    fx = ("SELECT doc_id, text || ' t' || (doc_id % 97)::VARCHAR"
          " || ' t' || (doc_id % 13)::VARCHAR AS text FROM documents")
    return inverted_postings_sql(fx, min_df=2, max_df=200)


def q_reciprocal_links(spark, sf_dir):
    """Link-farm reciprocity profile over the order->part graph, with the
    l_linenumber=1 edges mirrored so two-way links provably exist: per
    source node, out-degree, reciprocated out-edges, and the exact integer
    reciprocity percentage (operators/graph.py reciprocal_links)."""
    from .operators.graph import reciprocal_links

    li = _readpk(spark, sf_dir, "lineitem", "l_orderkey", "l_linenumber")
    fwd = li.select(F.col("l_orderkey").alias("src"),
                    F.col("l_partkey").alias("dst"))
    mirror = (li.filter(F.col("l_linenumber") == 1)
              .select(F.col("l_partkey").alias("src"),
                      F.col("l_orderkey").alias("dst")))
    return reciprocal_links(fwd.unionByName(mirror))


def _sql_reciprocal_links() -> str:
    from .operators.graph import reciprocal_links_sql
    return reciprocal_links_sql(
        "SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem "
        "UNION ALL SELECT l_partkey, l_orderkey FROM lineitem "
        "WHERE l_linenumber = 1")


_TRACK_URL_CASES = [
    # (suffix template, the case it provably exercises)
    "?utm_source=news&id={d}",      # leading tracked pair, kept pair after
    "?id={d}&utm_campaign=cc",      # trailing tracked pair
    "?gclid=g{d}",                  # tracked pair is the only param
    "?a=1&fbclid=f{d}&b=2#sec",     # mid-query + fragment preserved
    "?id={d}",                      # nothing tracked -> changed=false
]


def q_strip_tracking(spark, sf_dir):
    """Tracking-parameter canonicalization (utm_*/fbclid/gclid/...):
    five URL shapes built from doc_id exercise leading/trailing/only/
    mid-query/untouched cases; the three pinned regex passes run in the
    identical RE2/Java-common subset both engines support
    (operators/cdx.py strip_tracking)."""
    from .operators.cdx import strip_tracking

    did = F.col("doc_id")
    base = F.concat(F.lit("https://ex"), (did % 40).cast("string"),
                    F.lit(".com/p"), did.cast("string"))
    suffix = F.lit("")
    for i, tpl in enumerate(_TRACK_URL_CASES):
        head, _, tail = tpl.partition("{d}")
        part = F.concat(F.lit(head), did.cast("string"), F.lit(tail)) \
            if "{d}" in tpl else F.lit(tpl)
        suffix = F.when(did % 5 == i, part).otherwise(suffix)
    pages = _read(spark, sf_dir, "documents").select(
        F.concat(base, suffix).alias("url"))
    return strip_tracking(pages)


def _sql_strip_tracking() -> str:
    from .operators.cdx import strip_tracking_sql
    cases = []
    for i, tpl in enumerate(_TRACK_URL_CASES):
        head, _, tail = tpl.partition("{d}")
        expr = f"'{head}' || doc_id::VARCHAR || '{tail}'" \
            if "{d}" in tpl else f"'{tpl}'"
        cases.append(f"WHEN doc_id % 5 = {i} THEN {expr}")
    url = ("'https://ex' || (doc_id % 40)::VARCHAR || '.com/p' || "
           "doc_id::VARCHAR || CASE " + " ".join(cases) + " END")
    clean = strip_tracking_sql("url")
    return (f"WITH pages AS (SELECT {url} AS url FROM documents)\n"
            f"SELECT url, {clean} AS url_clean,\n"
            f"       {clean} <> url AS changed\nFROM pages")


def q_resolve_redirects(spark, sf_dir):
    """Redirect-chain resolution via pointer doubling: doc_id%4!=0 rows
    redirect one id down (chains of length 1-3 onto the %4==0 anchors),
    and each id%100 in {98,99} pair redirects at each other (a provable
    2-cycle) — so 0/1/2/3-hop resolutions AND the resolved=false cycle
    path all fire (operators/graph.py resolve_redirects)."""
    from .operators.graph import resolve_redirects

    d = _read(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    dst = (F.when(did % 100 == 98, did + 1)
           .when(did % 100 == 99, did - 1)
           .when(did % 4 != 0, did - 1))
    redirects = (d.select(did.alias("src"), dst.alias("dst"))
                 .filter(F.col("dst").isNotNull()))
    return resolve_redirects(redirects, d, hops=4)


def _sql_resolve_redirects() -> str:
    from .operators.graph import resolve_redirects_sql
    red = ("SELECT doc_id AS src, CASE WHEN doc_id % 100 = 98 "
           "THEN doc_id + 1 WHEN doc_id % 100 = 99 THEN doc_id - 1 "
           "WHEN doc_id % 4 <> 0 THEN doc_id - 1 END AS dst "
           "FROM documents WHERE doc_id % 100 IN (98, 99) "
           "OR doc_id % 4 <> 0")
    return resolve_redirects_sql(red, "SELECT doc_id AS node FROM documents",
                                 hops=4)


def q_hash_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test split — content-independent,
    RNG-free, identical on any engine/cluster size (lexicographic md5-prefix
    compare, operators/textops.py hash_split)."""
    from .operators.textops import hash_split
    return hash_split(_read(spark, sf_dir, "documents"))


def _sql_hash_split() -> str:
    from .operators.textops import hash_split_sql
    return hash_split_sql("SELECT doc_id FROM documents")


def q_dedup_retention(spark, sf_dir):
    """End of the dedup pipeline: near-dup pairs -> clusters -> per-doc
    keep/drop decision with the canonical (cluster-min) doc id."""
    from .operators.textops import dedup_retention, ngram_jaccard_pairs

    docs = _readp(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    return dedup_retention(docs, pairs, iterations=6)


def _sql_dedup_retention() -> str:
    from .operators.graph import cc_labels_sql
    labels = cc_labels_sql(
        "SELECT a AS src, b AS dst FROM (" + SQL_NGRAM_JACCARD + ")",
        iterations=6)
    return f"""
WITH lab AS MATERIALIZED ({labels})
SELECT d.doc_id,
       coalesce(lab.label, d.doc_id) AS canonical_id,
       coalesce(lab.label, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN lab ON d.doc_id = lab.node
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub (training-data pipeline step), non-vacuous by construction:
    every document gets a deterministic doc_id-derived email/phone/IPv4
    appended IN THE QUERY (both sides), so the counts and the redacted-text
    digest prove the patterns matched and the replacements applied. Patterns
    live in operators/pii.py and are pinned to the Java-regex/RE2 common
    subset so both engines find the identical match set."""
    from .operators.pii import pii_stats

    docs = _readp(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 555-123-4567 host 10."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".0.1 end"),
        ).alias("text"))
    return pii_stats(injected).select(
        "doc_id", "n_emails", "n_phones", "n_ips",
        F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"))


def _sql_pii_redact() -> str:
    from .operators.pii import pii_stats_sql
    inner = ("SELECT doc_id, text || ' contact user' || doc_id"
             " || '@example.com tel 555-123-4567 host 10.'"
             " || (doc_id % 256) || '.0.1 end' AS text FROM documents")
    return ("SELECT doc_id, n_emails, n_phones, n_ips,"
            " md5(redacted) AS redacted_md5 FROM ("
            + pii_stats_sql(inner) + ")")


def q_minhash_verified(spark, sf_dir):
    """MinHash-LSH recall, ORACLE-CHECKED: every exact near-dup pair
    (word-3-gram Jaccard >= 0.95, SQL-computable) must surface as an LSH
    band candidate. Output = exact pairs ∩ LSH candidates; the oracle is
    the exact pairs alone — equality IS a 100%-recall assertion at the
    matched threshold (16 bands x 4 rows: P(miss | J=0.95) ≈ 1e-13, and
    J=1.0 pairs are found with certainty: identical signatures)."""
    from .operators.textops import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = _readp(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, threshold=0.0)  # ALL band candidates
    exact = ngram_jaccard_pairs(docs, threshold=0.95)
    return exact.join(cand.select("a", "b"), ["a", "b"], "left_semi") \
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))


SQL_MINHASH_VERIFIED = SQL_NGRAM_JACCARD.replace("0.2", "0.95")


def q_minhash_incremental(spark, sf_dir):
    """Incremental LSH dedup, ORACLE-CHECKED recall: the corpus is indexed
    once (minhash_index); a NEW batch of case/whitespace-perturbed twins
    (doc_id + 1000000, identical token set -> identical signature) probes
    the index. Every normalized-text-equal (twin, old) pair — SQL-computable
    — must surface from the probe at est_jaccard = 1.0 (identical
    signatures can't miss: every band collides). Output = fp-equal pairs
    joined to their probe rows; oracle = the fp-equal pairs with 1.0 —
    equality asserts 100% recall of the index-probe path."""
    from .operators.textops import minhash_index, minhash_probe, words_expr

    base = _readp(spark, sf_dir, "documents").select("doc_id", "text") \
        .filter(F.size(words_expr(F.col("text"))) >= 3)
    twin = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace(F.upper("text"), " ", "  ").alias("text"))
    idx_bands, idx_sigs = minhash_index(base)
    probe = minhash_probe(twin, idx_bands, idx_sigs, threshold=1.0)
    fp = F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")
               .cast("binary")).alias("fp")
    fp_new = twin.select(F.col("doc_id").alias("new_id"), fp)
    fp_old = base.select(F.col("doc_id").alias("old_id"), fp)
    pairs = fp_new.join(fp_old, "fp").select("new_id", "old_id")
    return pairs.join(probe, ["new_id", "old_id"]).select(
        "new_id", "old_id", F.round("est_jaccard", 4).alias("est_jaccard"))


SQL_MINHASH_INCREMENTAL = """
WITH w AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
  FROM documents
  WHERE len(list_filter(string_split_regex(lower(text), '\\s+'),
                        x -> x <> '')) >= 3
)
SELECT t.doc_id + 1000000 AS new_id, o.doc_id AS old_id,
       1.0 AS est_jaccard
FROM w t JOIN w o ON t.fp = o.fp
"""


def q_simhash_verified(spark, sf_dir):
    """SimHash recall, ORACLE-CHECKED and non-vacuous: the corpus is unioned
    with a case/whitespace-perturbed twin of every document (doc_id +
    1000000) — identical token SET, so identical 64-bit signature. Every
    fingerprint-equal pair (SQL-computable) must be found by the banded
    simhash join at hamming 0 (the 4x16-bit pigeonhole banding can never
    miss hamming-0). Output = dup pairs ∩ simhash hamming-0 pairs; oracle =
    the dup pairs alone; equality asserts 100% recall over ~|documents|
    pairs."""
    from .operators.textops import simhash_pairs

    base = _readp(spark, sf_dir, "documents").select("doc_id", "text")
    twin = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace(F.upper("text"), " ", "  ").alias("text"))
    docs = base.unionByName(twin)
    fp = docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " "))
         .alias("fingerprint"))
    dups = (fp.alias("x").join(fp.alias("y"), "fingerprint")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("y.doc_id").alias("b")))
    sh = simhash_pairs(docs, max_hamming=0).select("a", "b")
    return dups.join(sh, ["a", "b"], "left_semi")


SQL_SIMHASH_VERIFIED = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         replace(upper(text), ' ', '  ') AS text
  FROM documents
), fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
  FROM docs
)
SELECT x.doc_id AS a, y.doc_id AS b
FROM fp x JOIN fp y USING (fingerprint)
WHERE x.doc_id < y.doc_id
"""


def q_knn_cosine(spark, sf_dir):
    """Brute-force exact cosine top-5 for the first 10 vectors as queries.
    Both sides compute in float64 over the same values."""
    from .operators.similarity import brute_force_knn

    emb = _readp(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return brute_force_knn(emb, q, k=5)


SQL_KNN = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_dot_product(e.v, q.q_vec)
           / (sqrt(list_dot_product(e.v, e.v))
              * sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cos
  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
)
SELECT q_id, vec_id, round(cos, 4) AS cosine,
       row_number() OVER (PARTITION BY q_id
                          ORDER BY cos DESC, vec_id) AS rank
FROM scored
QUALIFY rank <= 5
"""


def q_embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup dedup, ORACLE-CHECKED recall: the corpus is
    unioned with a scaled twin of every vector (vec_id + 1000000, 2*v —
    cosine exactly 1, and sign-LSH signatures are scale-invariant, so every
    band agrees and the banded self-join can NEVER miss a twin pair). At
    threshold 0.9999 the output is exactly the twin pairs, which the oracle
    constructs arithmetically — equality is a 100%-recall assertion over
    the full LSH candidate pipeline + exact-cosine verify."""
    from .operators.similarity import cosine_dedup_pairs

    base = _read(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 500).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    twins = base.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2).alias("embedding"))
    u = base.unionByName(twins)
    return cosine_dedup_pairs(u, threshold=0.9999, n_planes=8, bands=16,
                              dim=64)


SQL_EMBEDDING_DEDUP = """
SELECT vec_id AS a, vec_id + 1000000 AS b, 1.0 AS cosine
FROM embeddings WHERE vec_id < 500
"""


def q_lsh_knn_verified(spark, sf_dir):
    """ANN top-1 recall, ORACLE-CHECKED (the embedding_dedup twin trick
    applied to the banded lsh_knn): queries are scaled twins
    (q_id = vec_id + 1000000, 2*v) of the first 500 corpus vectors.
    Sign-LSH signatures are scale-invariant — 2v lands on the same side of
    every hyperplane as v — so EVERY band agrees between a query and its
    twin and the banded candidate join provably cannot miss the pair; the
    twin's exact cosine is 1.0, strictly above any inter-vector cosine in
    this corpus (measured max 0.51), so it must surface at rank 1. The
    oracle constructs the expected (q_id, vec_id, 1.0, 1) table
    arithmetically; equality is a 100%-top-1-recall assertion over the
    complete pipeline: signature UDF -> band explode -> candidate join ->
    exact-cosine re-rank. The generic-path `lsh_knn` rows-only entry
    remains for arbitrary queries."""
    from .operators.similarity import lsh_knn

    base = _read(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 500).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    q = base.select(
        (F.col("vec_id") + 1000000).alias("q_id"),
        F.transform("embedding", lambda x: x * 2).alias("q_vec"))
    return lsh_knn(base, q, k=1, n_planes=8, bands=4, dim=64,
                   n_queries=500)


SQL_LSH_KNN_VERIFIED = """
SELECT vec_id + 1000000 AS q_id, vec_id, 1.0 AS cosine, 1 AS rank
FROM embeddings WHERE vec_id < 500
"""


def q_ivf_knn_verified(spark, sf_dir):
    """IVF (inverted-file) ANN top-1 recall, ORACLE-CHECKED via the same
    scaled-twin construction as lsh_knn_verified: assignment is by COSINE
    against unit-normalized spherical-k-means centroids, and a twin 2v
    normalizes to the bit-identical unit vector as v (power-of-two
    scaling is exact in IEEE), so query and twin land in the same bucket
    with probability 1 — the nprobe probe provably contains it, exact
    cosine is 1.0 and the rank-1 winner is forced. Equality against the
    arithmetically-constructed oracle covers the whole pipeline: codebook
    training (deterministic sample), assignment UDF, bucket join,
    re-rank."""
    from .operators.similarity import ivf_knn

    base = _read(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 500).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    q = base.select(
        (F.col("vec_id") + 1000000).alias("q_id"),
        F.transform("embedding", lambda x: x * 2).alias("q_vec"))
    return ivf_knn(base, q, k=1, n_centroids=16, nprobe=2, dim=64,
                   n_queries=500)


SQL_IVF_KNN_VERIFIED = """
SELECT vec_id + 1000000 AS q_id, vec_id, 1.0 AS cosine, 1 AS rank
FROM embeddings WHERE vec_id < 500
"""


def q_embedding_norm(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return emb.select("vec_id", F.round(norm, 4).alias("l2_norm"))


SQL_EMB_NORM = """
SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])), 4) AS l2_norm
FROM embeddings
"""


# =============================================================================
# rows-only (genuinely non-SQL-expressible): crawl loop, LSH internals,
# multimodal plumbing
# =============================================================================

def q_crawl_mini(spark, sf_dir):
    """The engine itself: deterministic mini-corpus, full wave-loop crawl."""
    from .plans.crawl import SparkCrawlConfig, SparkCrawler
    from .sources.corpus import DEFAULT_IGNORE, generate_corpus, write_parquet

    tmp = tempfile.mkdtemp(prefix="crawl_mini_")
    rows, seeds, _ = generate_corpus(n_domains=4, total_pages=120)
    pq = os.path.join(tmp, "pages.parquet")
    write_parquet(rows, pq)
    cfg = SparkCrawlConfig(wave_size=40, per_domain_budget=15,
                           maxsize=64 * 1024, ignore=DEFAULT_IGNORE,
                           max_waves=20)
    crawler = SparkCrawler(spark, os.path.join(tmp, "store"), cfg)
    out = crawler.run(spark.read.parquet(pq), seeds)
    return out.select("url_canon", "wave", "depth", "sortorder", "path",
                      "mimetype", "content_type", "isindex",
                      "extracted_text")


def q_minhash_lsh(spark, sf_dir):
    from .operators.textops import minhash_lsh_pairs
    return minhash_lsh_pairs(_readp(spark, sf_dir, "documents"),
                             threshold=0.2)


def q_simhash(spark, sf_dir):
    from .operators.textops import simhash_pairs
    return simhash_pairs(_readp(spark, sf_dir, "documents"), max_hamming=8)


def q_lsh_knn(spark, sf_dir):
    from .operators.similarity import lsh_knn

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("embedding"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return lsh_knn(emb, q, k=5, n_planes=8, dim=64, n_queries=10)


def q_session_windows(spark, sf_dir):
    """Gap-based session windows per user, ORACLE-CHECKED: Spark's
    session_window (streaming-capable builder run in batch) vs a DuckDB
    reconstruction — a session break is a >= gap jump between consecutive
    events (lag), session id is the running break count, end = last event
    + gap. Pins the exact merge semantics (half-open [ts, ts+gap))."""
    from .streaming.windows import sessionize

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s = sessionize(_read(spark, sf_dir, "events"), gap="30 minutes")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return s.select(
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        "user_id", "n_events", "sum_value")


SQL_SESSION_WINDOWS = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS session_end,
       user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
"""


def _be(col, nhex: int):
    """Big-endian unsigned int as binary via hex round-trip (Catalyst-only;
    nhex hex chars = nhex/2 bytes)."""
    return F.unhex(F.lpad(F.hex(col), nhex, "0"))


def _le(col, nbytes: int):
    """Little-endian unsigned int as binary (Catalyst-only): low byte
    first, one byte at a time."""
    return F.concat(*[
        _be(F.shiftright(col, 8 * i).bitwiseAND(255), 2)
        for i in range(nbytes)])


# Constant mvhd (version 0) bytes AFTER the duration field: rate 1.0,
# volume 1.0, 10 reserved bytes, the unity display matrix, 24 pre_defined
# zero bytes, next_track_ID 1 — exactly what real muxers emit (80 bytes,
# making the full mvhd body its canonical 100 bytes / box size 108).
_MVHD_TAIL = (
    (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big")
    + bytes(10)
    + b"".join(v.to_bytes(4, "big") for v in
               (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))
    + bytes(24) + (1).to_bytes(4, "big"))

# 16-byte ftyp box, then moov(116) wrapping mvhd(108): version/flags +
# creation + modification zeroed (12 bytes) precede the variable
# timescale/duration the fixture splices in per row.
_MP4_PREFIX = ((16).to_bytes(4, "big") + b"ftypisom" + bytes(4)
               + (116).to_bytes(4, "big") + b"moov"
               + (108).to_bytes(4, "big") + b"mvhd" + bytes(12))


def _media_fixture(spark, sf_dir):
    """Synthesized media table over documents with REAL container headers —
    PNG IHDR / GIF screen descriptor / JPEG SOF0 frames, canonical 44-byte
    WAV (RIFF fmt+data) files, and full ISO-BMFF ftyp+moov/mvhd MP4 shells
    built byte-exact from doc_id, so the decoded dimensions AND the
    WAV/MP4 durations are SQL-constructible."""
    d = _read(spark, sf_dir, "documents")
    did = F.col("doc_id")
    png = F.concat(
        F.lit(bytes.fromhex("89504E470D0A1A0A0000000D49484452")),
        _be(did % 200 + 1, 8), _be(did % 100 + 1, 8),
        F.lit(bytes.fromhex("0802000000")))
    gw, gh = did % 300 + 1, did % 150 + 1
    gif = F.concat(  # GIF screen w/h are LITTLE-endian uint16: low byte 1st
        F.lit(b"GIF89a"),
        _be(gw.bitwiseAND(255), 2), _be(F.shiftright(gw, 8), 2),
        _be(gh.bitwiseAND(255), 2), _be(F.shiftright(gh, 8), 2),
        F.lit(bytes.fromhex("000000")))
    jpg = F.concat(
        F.lit(bytes.fromhex("FFD8FFC0001108")),
        _be(did % 400 + 1, 4), _be(did % 500 + 1, 4),
        F.lit(bytes.fromhex("03010011020011030011FFD9")))
    # canonical PCM WAV: 1 channel x 8-bit => byte_rate == sample_rate;
    # duration = data_size / byte_rate (exact arithmetic both engines).
    # Sample data is a two-level pattern — (dsz - dsz//3) bytes of 'x'
    # (0x78) then dsz//3 bytes of 'P' (0x50) — so audio_features' decoded
    # sum/mean/min/max are doc_id-reconstructible AND nonconstant
    rate = did % 8 * 1000 + 8000       # byte_rate: 8000..15000
    dsz = did % 2000 + 100             # data chunk size: 100..2099
    third = F.floor(dsz / 3).cast("int")
    wav = F.concat(
        F.lit(b"RIFF"), _le(dsz + 36, 4),
        F.lit(b"WAVE" + b"fmt " + (16).to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")),
        _le(rate, 4), _le(rate, 4),
        F.lit((1).to_bytes(2, "little") + (8).to_bytes(2, "little")),
        F.lit(b"data"), _le(dsz, 4),
        F.concat(F.repeat(F.lit("x"), dsz.cast("int") - third),
                 F.repeat(F.lit("P"), third)).cast("binary"))
    # MP4: duration_s = mvhd duration units / timescale (big-endian u32s at
    # fixed offsets in the version-0 box) — exact arithmetic both engines
    ts = did % 7 * 1000 + 1000         # timescale: 1000..7000
    du = did % 4000 + 1000             # duration units: 1000..4999
    mp4 = F.concat(F.lit(_MP4_PREFIX), _be(ts, 8), _be(du, 8),
                   F.lit(_MVHD_TAIL))
    return d.select(
        did.alias("media_id"),
        F.when(did % 5 == 0, png).when(did % 5 == 1, gif)
        .when(did % 5 == 2, jpg).when(did % 5 == 3, wav)
        .otherwise(mp4).alias("payload"))


def q_multimodal_meta(spark, sf_dir):
    """Multimodal metadata, ORACLE-CHECKED: payloads carry real PNG/GIF/JPEG
    and WAV container bytes built from doc_id; the mapInPandas kernel
    parses the actual bytes (operators.multimodal.image_dimensions /
    wav_duration — the RIFF fmt/data chunk walk — and mp4_duration — the
    ISO-BMFF box walk to moov/mvhd), and the oracle SQL reconstructs every
    expected value arithmetically — a wrong byte offset anywhere in the
    parser or the fixture fails the hash compare. WAV duration is REAL
    decode (data_size/byte_rate), MP4 duration is REAL decode
    (mvhd duration/timescale); the remaining stub surface is non-MP4
    video-container duration + the feature vector."""
    from .operators.multimodal import extract_media_meta

    return extract_media_meta(_media_fixture(spark, sf_dir)).select(
        "media_id", "mimetype", F.col("n_bytes").cast("long").alias("n_bytes"),
        "width", "height", F.round("duration_s", 6).alias("duration_s"))


SQL_MULTIMODAL = """
SELECT doc_id AS media_id,
       CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
            WHEN 2 THEN 'image/jpeg' WHEN 3 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mimetype,
       (CASE doc_id % 5 WHEN 0 THEN 29 WHEN 1 THEN 13 WHEN 2 THEN 23
             WHEN 3 THEN 44 + doc_id % 2000 + 100
             ELSE 132 END)::BIGINT AS n_bytes,
       (CASE doc_id % 5 WHEN 0 THEN doc_id % 200 + 1
             WHEN 1 THEN doc_id % 300 + 1
             WHEN 2 THEN doc_id % 500 + 1 END)::INTEGER AS width,
       (CASE doc_id % 5 WHEN 0 THEN doc_id % 100 + 1
             WHEN 1 THEN doc_id % 150 + 1
             WHEN 2 THEN doc_id % 400 + 1 END)::INTEGER AS height,
       CASE doc_id % 5
            WHEN 3 THEN round((doc_id % 2000 + 100)
                              / (doc_id % 8 * 1000 + 8000.0), 6)
            WHEN 4 THEN round((doc_id % 4000 + 1000)
                              / (doc_id % 7 * 1000 + 1000.0), 6)
       END AS duration_s
FROM documents
"""


def q_media_resize(spark, sf_dir):
    """Multimodal resize plumbing, ORACLE-CHECKED: image payloads (PNG/GIF/
    JPEG fixture rows) come out flagged resized with the target dims and
    an UNCHANGED byte length (the header rewrite is length-preserving —
    a wrong offset would change n_bytes or break the flag); WAV and MP4
    rows pass through untouched. The decoded-dimensions round-trip
    (image_dimensions(resize(p)) == target) is pytest-asserted."""
    from .operators.multimodal import resize_media

    return resize_media(_media_fixture(spark, sf_dir), 64, 48).select(
        "media_id", "width", "height", "resized",
        F.length("payload").cast("long").alias("n_bytes"))


def q_png_pixel_resize(spark, sf_dir):
    """PIXEL-TRUE PNG resize, ORACLE-CHECKED end to end: real PNGs (IDAT,
    genuine CRCs) are encoded per doc_id with the deterministic pattern
    pixel(x,y) = (x*7 + y*13 + doc_id) % 256 at per-doc source dims,
    resized through the Spark operator (decode -> unfilter ->
    nearest-neighbor -> re-encode, operators/png.py), then DECODED BACK
    and summed. The oracle reconstructs the exact pixel sum arithmetically
    from the pinned nearest-neighbor map src_i = out_i * src // out — a
    wrong filter byte, CRC, resample index, or channel offset anywhere in
    the codec changes the sum and fails the hash compare."""
    from .operators.multimodal import resize_media

    d = _readp(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        from transmogrify_webcrawler_spark.operators.png import encode_png
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                sw, sh = did % 13 + 3, did % 11 + 3
                rows = [bytearray((x * 7 + y * 13 + did) % 256
                                  for x in range(sw)) for y in range(sh)]
                out.append(dict(media_id=did,
                                payload=encode_png(sw, sh, 0, rows)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    media = d.mapInPandas(make, "media_id long, payload binary")
    resized = resize_media(media, 16, 12)

    def check(batches):
        from transmogrify_webcrawler_spark.operators.png import decode_png
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _color, rows = decode_png(bytes(payload))
                out.append(dict(doc_id=mid, out_w=w, out_h=h,
                                pixel_sum=sum(sum(r) for r in rows)))
            yield pd.DataFrame(out, columns=["doc_id", "out_w", "out_h",
                                             "pixel_sum"])

    return resized.select("media_id", "payload").mapInPandas(
        check, "doc_id long, out_w int, out_h int, pixel_sum long")


SQL_PNG_PIXEL_RESIZE = """
SELECT d.doc_id AS doc_id, 16::INTEGER AS out_w, 12::INTEGER AS out_h,
       sum((((x.range * (d.doc_id % 13 + 3)) // 16) * 7
            + ((y.range * (d.doc_id % 11 + 3)) // 12) * 13
            + d.doc_id) % 256)::BIGINT AS pixel_sum
FROM documents d, range(16) x, range(12) y
GROUP BY d.doc_id
"""


SQL_MEDIA_RESIZE = """
SELECT doc_id AS media_id,
       (CASE WHEN doc_id % 5 < 3 THEN 64 END)::INTEGER AS width,
       (CASE WHEN doc_id % 5 < 3 THEN 48 END)::INTEGER AS height,
       doc_id % 5 < 3 AS resized,
       (CASE doc_id % 5 WHEN 0 THEN 29 WHEN 1 THEN 13 WHEN 2 THEN 23
             WHEN 3 THEN 44 + doc_id % 2000 + 100
             ELSE 132 END)::BIGINT AS n_bytes
FROM documents
"""


def q_audio_features(spark, sf_dir):
    """REAL PCM statistics, ORACLE-CHECKED: the WAV fixture rows carry a
    two-level 8-bit sample pattern ('x' then 'P' segments sized from
    doc_id); audio_features walks the RIFF chunks, slices the ACTUAL data
    bytes, and reduces them to exact integers (rate, count, sum, mean,
    min, max) — the oracle reconstructs all of it arithmetically, so a
    wrong chunk offset (sweeping header bytes into the sum) fails the
    hash. Non-WAV strata provably take the ok=false path."""
    from .operators.multimodal import audio_features

    return audio_features(_media_fixture(spark, sf_dir))


SQL_AUDIO_FEATURES = """
WITH p AS (
  SELECT doc_id,
         doc_id % 2000 + 100 AS dsz,
         (doc_id % 2000 + 100) // 3 AS third,
         doc_id % 8 * 1000 + 8000 AS rate
  FROM documents
)
SELECT doc_id AS media_id,
       doc_id % 5 = 3 AS ok,
       (CASE WHEN doc_id % 5 = 3 THEN rate END)::INTEGER AS sample_rate,
       (CASE WHEN doc_id % 5 = 3 THEN dsz END)::BIGINT AS n_samples,
       (CASE WHEN doc_id % 5 = 3
             THEN 120 * (dsz - third) + 80 * third END)::BIGINT AS byte_sum,
       (CASE WHEN doc_id % 5 = 3
             THEN (120 * (dsz - third) + 80 * third) // dsz
        END)::BIGINT AS byte_mean,
       (CASE WHEN doc_id % 5 = 3 THEN 80 END)::INTEGER AS byte_min,
       (CASE WHEN doc_id % 5 = 3 THEN 120 END)::INTEGER AS byte_max
FROM p
"""


def q_image_features(spark, sf_dir):
    """REAL pixel-statistics features, ORACLE-CHECKED: per-doc gray PNGs
    with pixel(x,y) = (x*7 + y*13 + doc_id) % 256 at per-doc dims are
    encoded (genuine IDAT/CRC), decoded back by image_features
    (zlib inflate + unfilter), and reduced to exact integer statistics —
    dimensions, pixel sum, mean, 4-bin intensity histogram. The oracle
    reconstructs every statistic arithmetically from doc_id, so any codec
    or feature-math defect fails the hash compare."""
    from .operators.multimodal import image_features

    d = _readp(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        from transmogrify_webcrawler_spark.operators.png import encode_png
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                sw, sh = did % 13 + 3, did % 11 + 3
                rows = [bytearray((x * 7 + y * 13 + did) % 256
                                  for x in range(sw)) for y in range(sh)]
                out.append(dict(media_id=did,
                                payload=encode_png(sw, sh, 0, rows)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    media = d.mapInPandas(make, "media_id long, payload binary")
    return image_features(media)


SQL_IMAGE_FEATURES = """
WITH dims AS (
  SELECT doc_id, doc_id % 13 + 3 AS w, doc_id % 11 + 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h,
         (x * 7 + y * 13 + doc_id) % 256 AS v
  FROM (SELECT doc_id, w, h, x,
               unnest(generate_series(0, h - 1)) AS y
        FROM (SELECT doc_id, w, h,
                     unnest(generate_series(0, w - 1)) AS x
              FROM dims))
)
SELECT doc_id AS media_id, true AS ok,
       w::INTEGER AS width, h::INTEGER AS height, 1::INTEGER AS n_channels,
       sum(v)::BIGINT AS px_sum,
       (sum(v) // (w * h))::BIGINT AS px_mean,
       (count(*) FILTER (v // 64 = 0))::BIGINT AS h0,
       (count(*) FILTER (v // 64 = 1))::BIGINT AS h1,
       (count(*) FILTER (v // 64 = 2))::BIGINT AS h2,
       (count(*) FILTER (v // 64 = 3))::BIGINT AS h3
FROM px GROUP BY doc_id, w, h
"""


def q_frame_sample(spark, sf_dir):
    """Video/audio frame-sampling plumbing (sequence+explode over decoded
    duration; rows-only generic path — see frame_sample_verified for the
    oracle-checked version over the WAV fixture)."""
    from .operators.multimodal import frame_sample_plan

    return frame_sample_plan(_media_fixture(spark, sf_dir), every_s=0.005)


def q_frame_sample_verified(spark, sf_dir):
    """Frame sampling, ORACLE-CHECKED end to end (possible since WAV and
    MP4 duration became real decode): the fixture's WAV and MP4 rows carry
    exactly SQL-constructible durations, so DuckDB reconstructs the whole
    sequence+explode via generate_series — every frame index and offset
    for every media row, through sniff -> RIFF chunk walk / ISO-BMFF box
    walk -> duration -> sequence -> explode."""
    from .operators.multimodal import frame_sample_plan

    frames = frame_sample_plan(_media_fixture(spark, sf_dir),
                               every_s=0.005)
    return frames.select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx"),
        F.round("t_offset_s", 6).alias("t_offset_s"))


SQL_FRAME_SAMPLE_VERIFIED = """
WITH d AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 5
              WHEN 3 THEN (doc_id % 2000 + 100)
                          / (doc_id % 8 * 1000 + 8000.0)
              WHEN 4 THEN (doc_id % 4000 + 1000)
                          / (doc_id % 7 * 1000 + 1000.0)
         END AS dur
  FROM documents WHERE doc_id % 5 IN (3, 4)
), f AS (
  SELECT media_id,
         unnest(generate_series(0,
             CAST(floor(dur / 0.005::DOUBLE) AS BIGINT))) AS i
  FROM d
)
SELECT media_id, i::INTEGER AS frame_idx,
       round(i * 0.005::DOUBLE, 6) AS t_offset_s
FROM f
"""


def q_dup_span_stats(spark, sf_dir):
    """Exact-substring duplicate-span accounting (Lee et al. 2022): every
    token position whose 5-gram repeats corpus-wide, merged into removable
    spans. All-integer output — bit-exact vs the oracle's identical
    digest-join + lag-window recurrence."""
    from .operators.textops import duplicate_span_stats
    return duplicate_span_stats(_readp(spark, sf_dir, "documents"),
                                k=5, min_count=2)


SQL_DUP_SPANS = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), g0 AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(ws) - 4, 0)),
                i -> {'pos': i,
                      'dg': md5(array_to_string(ws[i+1:i+5], ' '))})) AS u
  FROM w
), g AS (
  SELECT doc_id, u.pos AS pos, u.dg AS dg FROM g0
), dup AS (
  SELECT dg FROM g GROUP BY dg HAVING count(*) >= 2
), d AS (
  SELECT doc_id, pos FROM g JOIN dup USING (dg)
), sp AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM d
), agg AS (
  SELECT doc_id,
         count(*) AS n_dup_positions,
         sum(CASE WHEN prev IS NULL OR pos - prev >= 5
                  THEN 1 ELSE 0 END) AS n_spans,
         sum(CASE WHEN prev IS NULL THEN 5
                  ELSE least(pos - prev, 5) END) AS n_removed_tokens
  FROM sp GROUP BY 1
)
SELECT w.doc_id,
       len(ws)::BIGINT AS n_tokens,
       coalesce(n_dup_positions, 0)::BIGINT AS n_dup_positions,
       coalesce(n_spans, 0)::BIGINT AS n_spans,
       coalesce(n_removed_tokens, 0)::BIGINT AS n_removed_tokens,
       (len(ws) - coalesce(n_removed_tokens, 0))::BIGINT AS n_kept_tokens
FROM w LEFT JOIN agg USING (doc_id)
"""


def _c4_fixture(docs):
    """Line-structured text constructed deterministically from the (newline-
    free) synthetic documents: lines of 5 lowercased words; per (doc_id +
    line) % 4 a line gets terminal punctuation / none / a 'javascript'
    mention / truncation to 2 words, and doc_id % 11 / % 13 docs gain a
    'lorem ipsum' / '{' line — so every C4 rule fires non-vacuously. The
    oracle SQL builds the identical strings."""
    from .operators.textops import words_expr

    ws = F.slice(words_expr(F.col("text")), 1, 40)
    nl = F.greatest(F.floor(F.size(ws) / 5).cast("int"), F.lit(1))

    def mkline(i):
        base = F.concat_ws(" ", F.slice(ws, i * 5 + 1, 5))
        short = F.concat_ws(" ", F.slice(ws, i * 5 + 1, 2))
        m = (F.col("doc_id") + i) % 4
        return (F.when(m == 0, F.concat(base, F.lit(".")))
                 .when(m == 1, base)
                 .when(m == 2, F.concat(base, F.lit(" javascript required.")))
                 .otherwise(F.concat(short, F.lit("!"))))

    body = F.array_join(
        F.transform(F.sequence(F.lit(0), nl - 1), mkline), "\n")
    text2 = (
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(body, F.lit("\nneed lorem ipsum text here.")))
        .when(F.col("doc_id") % 13 == 0,
              F.concat(body, F.lit("\nvar config = { a: 1 };")))
        .otherwise(body))
    return docs.select("doc_id", text2.alias("text"))


def q_c4_filters(spark, sf_dir):
    """C4 line-level cleaning (Raffel et al. 2020) over a constructed
    line-structured fixture in which every rule provably fires: terminal-
    punctuation keep, min-words drop, javascript-line drop, lorem-ipsum and
    curly-brace whole-document drops."""
    from .operators.textops import c4_filters
    return c4_filters(_c4_fixture(_readp(spark, sf_dir, "documents")),
                      min_words=4)


_SQL_C4_FIXTURE = """
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0
           THEN body || chr(10) || 'need lorem ipsum text here.'
         WHEN doc_id % 13 = 0
           THEN body || chr(10) || 'var config = { a: 1 };'
         ELSE body END AS text
  FROM (
    SELECT doc_id,
      array_to_string(list_transform(range(0, greatest(len(ws) // 5, 1)),
        i -> CASE
          WHEN (doc_id + i) % 4 = 0
            THEN array_to_string(ws[i*5+1:i*5+5], ' ') || '.'
          WHEN (doc_id + i) % 4 = 1
            THEN array_to_string(ws[i*5+1:i*5+5], ' ')
          WHEN (doc_id + i) % 4 = 2
            THEN array_to_string(ws[i*5+1:i*5+5], ' ')
                 || ' javascript required.'
          ELSE array_to_string(ws[i*5+1:i*5+2], ' ') || '!'
        END), chr(10)) AS body
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '')[1:40] AS ws
      FROM documents))
"""

SQL_C4_FILTERS = f"""
WITH fx AS ({_SQL_C4_FIXTURE}
), ln AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM fx
), ev AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         (contains(lower(text), 'lorem ipsum') OR contains(text, '{{'))
             AS doc_bad,
         list_filter(lines, l ->
             regexp_matches(rtrim(l), '[.!?"]$')
             AND len(list_filter(string_split_regex(l, '\\s+'),
                                 x -> x <> '')) >= 4
             AND NOT contains(lower(l), 'javascript')) AS kept
  FROM ln
)
SELECT doc_id,
       n_lines::BIGINT AS n_lines,
       (CASE WHEN doc_bad THEN 0 ELSE len(kept) END)::BIGINT
           AS n_kept_lines,
       (CASE WHEN doc_bad THEN 0 ELSE
          len(list_filter(string_split_regex(
                coalesce(array_to_string(kept, chr(10)), ''), '\\s+'),
              x -> x <> ''))
        END)::BIGINT AS n_kept_words,
       (NOT doc_bad AND len(kept) > 0) AS passes_c4,
       CASE WHEN doc_bad THEN ''
            ELSE coalesce(array_to_string(kept, chr(10)), '') END
           AS kept_text
FROM ev
"""


def q_robots_rules(spark, sf_dir):
    """RFC 9309 wildcard robots evaluation, non-vacuous by construction:
    the url fixture exercises every semantic — '*' wildcards, trailing-'$'
    anchors (and a near-miss that must NOT anchor-match), longest-match
    precedence (a longer allow overriding a shorter disallow), the
    length-tie -> allow rule, per-domain rule-set differences, and the
    no-match default-allow."""
    from .operators.robots_rules import robots_evaluate

    pk = F.col("p_partkey")
    # domain derives from pk DIV 6 so every path class hits BOTH domain
    # parities (pk % 6 pins pk's parity; pk % 10 would alias it)
    dom = F.concat(F.lit("d"), (F.expr("p_partkey DIV 6") % 10)
                   .cast("string"))
    path = (
        F.when(pk % 6 == 0, F.concat(F.lit("/private/doc"),
                                     pk.cast("string")))
        .when(pk % 6 == 1, F.concat(F.lit("/private/pub/x"),
                                    pk.cast("string")))
        .when(pk % 6 == 2, F.concat(F.lit("/img/"), pk.cast("string"),
                                    F.lit(".gif")))
        .when(pk % 6 == 3, F.concat(F.lit("/img/"), pk.cast("string"),
                                    F.lit(".gifx")))
        .when(pk % 6 == 4, F.concat(F.lit("/dup/y"), pk.cast("string")))
        .otherwise(F.lit("/tmp")))
    urls = (_read(spark, sf_dir, "part")
            .select(dom.alias("domain"), path.alias("path")).distinct())

    def rule(allow, pattern):
        return F.struct(F.lit(allow).alias("allow"),
                        F.lit(pattern).alias("pattern"))

    base = F.array(rule(False, "/private/*"), rule(True, "/private/pub*"),
                   rule(False, "/*.gif$"),
                   rule(False, "/dup*"), rule(True, "/dup*"))
    extra = (F.when(F.col("id") % 2 == 0, F.array(rule(False, "/tmp$")))
             .otherwise(F.array().cast(
                 "array<struct<allow:boolean,pattern:string>>")))
    rules = (spark.range(10)
             .select(F.concat(F.lit("d"), F.col("id").cast("string"))
                     .alias("domain"),
                     F.explode(F.concat(base, extra)).alias("r"))
             .select("domain", "r.allow", "r.pattern"))
    return robots_evaluate(urls, rules)


def _sql_robots_rules() -> str:
    from .operators.robots_rules import robots_evaluate_sql
    urls = """
SELECT DISTINCT 'd' || ((p_partkey // 6) % 10) AS domain,
  CASE WHEN p_partkey % 6 = 0 THEN '/private/doc' || p_partkey
       WHEN p_partkey % 6 = 1 THEN '/private/pub/x' || p_partkey
       WHEN p_partkey % 6 = 2 THEN '/img/' || p_partkey || '.gif'
       WHEN p_partkey % 6 = 3 THEN '/img/' || p_partkey || '.gifx'
       WHEN p_partkey % 6 = 4 THEN '/dup/y' || p_partkey
       ELSE '/tmp' END AS path
FROM part"""
    rules = """
SELECT 'd' || i AS domain, u.allow AS allow, u.pattern AS pattern
FROM range(10) t(i), (SELECT unnest([
    {'allow': FALSE, 'pattern': '/private/*'},
    {'allow': TRUE,  'pattern': '/private/pub*'},
    {'allow': FALSE, 'pattern': '/*.gif$'},
    {'allow': FALSE, 'pattern': '/dup*'},
    {'allow': TRUE,  'pattern': '/dup*'}]) AS u)
UNION ALL
SELECT 'd' || i, FALSE, '/tmp$' FROM range(10) t(i) WHERE i % 2 = 0"""
    return robots_evaluate_sql(urls, rules)


def q_cdx_index(spark, sf_dir):
    """SURT-keyed CDX capture index over constructed URLs exercising every
    rule (mixed case, www/port stripping, query kept, fragment dropped).
    STRONG oracle: the expected SURT is built arithmetically from the part
    key, not by re-running the operator's regexes; idx is the 0-based
    global (surt, url) rank, computed distributed (two-phase prefix sum)
    on the Spark side and as one window in DuckDB."""
    from .operators.cdx import cdx_index

    pk = F.col("p_partkey")
    url = F.concat(
        F.lit("HTTP://"),
        F.when(pk % 4 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (pk % 30).cast("string"), F.lit(".Example.COM"),
        F.when(pk % 3 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/cat"), (pk % 5).cast("string"),
        F.lit("/item"), pk.cast("string"),
        F.when(pk % 2 == 0, F.lit(".html")).otherwise(F.lit("/")),
        F.when(pk % 7 == 0, F.lit("?q=1")).otherwise(F.lit("")),
        F.when(pk % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return cdx_index(_readp(spark, sf_dir, "part").select(url.alias("url")))


SQL_CDX_INDEX = """
WITH u AS (
  SELECT 'HTTP://' || CASE WHEN p_partkey % 4 = 0 THEN 'WWW.' ELSE '' END
      || 'Site' || (p_partkey % 30) || '.Example.COM'
      || CASE WHEN p_partkey % 3 = 0 THEN ':8080' ELSE '' END
      || '/cat' || (p_partkey % 5) || '/item' || p_partkey
      || CASE WHEN p_partkey % 2 = 0 THEN '.html' ELSE '/' END
      || CASE WHEN p_partkey % 7 = 0 THEN '?q=1' ELSE '' END
      || CASE WHEN p_partkey % 5 = 0 THEN '#frag' ELSE '' END AS url,
    'com,example,site' || (p_partkey % 30) || ')/cat' || (p_partkey % 5)
      || '/item' || p_partkey
      || CASE WHEN p_partkey % 2 = 0 THEN '.html' ELSE '/' END
      || CASE WHEN p_partkey % 7 = 0 THEN '?q=1' ELSE '' END AS surt
  FROM part
)
SELECT url, surt, md5(url) AS digest,
       (row_number() OVER (ORDER BY surt, url) - 1)::BIGINT AS idx
FROM u
"""


def q_hll_cardinality(spark, sf_dir):
    """Distributed HyperLogLog distinct-count of a key universe with natural
    duplicates (lineitem part keys), alongside the exact count so the
    estimate's accuracy is part of the checked result. The sketch math is
    exact BIGINT register arithmetic — the estimate matches DuckDB
    bit-for-bit (operators/sketches.py)."""
    from .operators.sketches import hll_cardinality

    keys = _read(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("k:"), F.col("l_partkey").cast("string")).alias("k"))
    est = hll_cardinality(keys, "k")
    exact = keys.agg(F.countDistinct("k").cast("long").alias("n_exact"))
    return est.crossJoin(exact)


def _sql_hll_cardinality() -> str:
    from .operators.sketches import hll_cardinality_sql
    inner = hll_cardinality_sql(
        "SELECT 'k:' || l_partkey AS k FROM lineitem", "k")
    return (f"SELECT hll_estimate, n_buckets_seen,"
            f" (SELECT count(DISTINCT 'k:' || l_partkey)"
            f" FROM lineitem)::BIGINT AS n_exact FROM ({inner})")


def q_tfidf_topk(spark, sf_dir):
    """Top-3 salient terms per doc by deterministic TF-IDF (tf*N/df — one
    IEEE division of exact integers, so the DOUBLE matches DuckDB bit-wise;
    ties break on the term string)."""
    from .operators.textops import tfidf_topk
    return tfidf_topk(_readp(spark, sf_dir, "documents"), k=3)


SQL_TFIDF = """
WITH t AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term, tf, df,
         (tf * (SELECT n_docs FROM n)) * 1.0 / df AS score
  FROM tf JOIN df USING (term)
), ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf::BIGINT AS tf, df::BIGINT AS df,
       round(score, 4) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= 3
"""


# =============================================================================
# registry
# =============================================================================

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ordered so keys with no prior driver CORRECTNESS row come
        # first (the driver samples a prefix; VERDICT r5 #2 — 22
        # keys had never been driver-checked)
        "sitemap_extract": q_sitemap_extract,
        "kmeans": q_kmeans,
        "mixture_sample": q_mixture_sample,
        "stratified_topn": q_stratified_topn,
        "pack_sequences": q_pack_sequences,
        "trap_urls": q_trap_urls,
        "robots_sitemap": q_robots_sitemap,
        "recrawl_schedule": q_recrawl_schedule,
        "dup_span_stats": q_dup_span_stats,
        "c4_filters": q_c4_filters,
        "tfidf_topk": q_tfidf_topk,
        "cdx_index": q_cdx_index,
        "hll_cardinality": q_hll_cardinality,
        "robots_rules": q_robots_rules,
        "dup_clusters": q_dup_clusters,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "pii_redact": q_pii_redact,
        "hash_split": q_hash_split,
        "dedup_retention": q_dedup_retention,
        "minhash_incremental": q_minhash_incremental,
        "png_pixel_resize": q_png_pixel_resize,
        # previously driver-sampled keys
        "pricing_summary": q_pricing_summary,
        "anti_join_dedup": q_anti_join_dedup,
        "bloom_seen_dedup": q_bloom_seen_dedup,
        "fetch_join": q_fetch_join,
        "backlink_collect": q_backlink_collect,
        "inlink_score": q_inlink_score,
        "politeness_topk": q_politeness_topk,
        "politeness_delay_budget": q_politeness_delay_budget,
        "salted_agg": q_salted_agg,
        "priority_topk": q_priority_topk,
        "sortorder_window": q_sortorder_window,
        "ignore_regex": q_ignore_regex,
        "maxsize_gate": q_maxsize_gate,
        "content_type_gate": q_content_type_gate,
        "union_pipeline": q_union_pipeline,
        "events_hourly": q_events_hourly,
        "url_canonicalize": q_url_canonicalize,
        "registered_domain": q_registered_domain,
        "url_to_path": q_url_to_path,
        "typerecognitor": q_typerecognitor,
        "robots_gate": q_robots_gate,
        "dedup_exact": q_dedup_exact,
        "doc_fingerprint": q_doc_fingerprint,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "gopher_quality": q_gopher_quality,
        "repetition_stats": q_repetition_stats,
        "decontaminate": q_decontaminate,
        "cleaning_decision": q_cleaning_decision,
        "exact_quantiles": q_exact_quantiles,
        "grouped_quantiles": q_grouped_quantiles,
        "snapshot_delta": q_snapshot_delta,
        "revisit_records": q_revisit_records,
        "cdxj_export": q_cdxj_export,
        "normalize_text": q_normalize_text,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "cms_topk": q_cms_topk,
        "chunk_documents": q_chunk_documents,
        "reciprocal_links": q_reciprocal_links,
        "inverted_postings": q_inverted_postings,
        "image_features": q_image_features,
        "audio_features": q_audio_features,
        "resolve_redirects": q_resolve_redirects,
        "strip_tracking": q_strip_tracking,
        "canonical_quality": q_canonical_quality,
        "rebalance_plan": q_rebalance_plan,
        "warc_roundtrip": q_warc_roundtrip,
        "wet_export": q_wet_export,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_verified": q_minhash_verified,
        "simhash_verified": q_simhash_verified,
        "knn_cosine": q_knn_cosine,
        "lsh_knn_verified": q_lsh_knn_verified,
        "ivf_knn_verified": q_ivf_knn_verified,
        "embedding_norm": q_embedding_norm,
        "embedding_dedup": q_embedding_dedup,
        "multimodal_meta": q_multimodal_meta,
        "media_resize": q_media_resize,
        "frame_sample_verified": q_frame_sample_verified,
        "session_windows": q_session_windows,
        # rows-only below
        "crawl_mini": q_crawl_mini,
        "minhash_lsh": q_minhash_lsh,
        "simhash_pairs": q_simhash,
        "lsh_knn": q_lsh_knn,
        "frame_sample": q_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": SQL_PRICING,
        "anti_join_dedup": SQL_ANTI_JOIN,
        "bloom_seen_dedup": SQL_BLOOM_SEEN,
        "fetch_join": SQL_FETCH_JOIN,
        "backlink_collect": SQL_BACKLINK,
        "inlink_score": SQL_INLINK,
        "politeness_topk": SQL_POLITENESS,
        "politeness_delay_budget": SQL_POLITENESS_DELAY,
        "salted_agg": SQL_SALTED,
        "priority_topk": SQL_PRIORITY_TOPK,
        "sortorder_window": SQL_SORTORDER,
        "ignore_regex": SQL_IGNORE_REGEX,
        "maxsize_gate": SQL_MAXSIZE,
        "content_type_gate": SQL_CONTENT_TYPE,
        "union_pipeline": SQL_UNION,
        "events_hourly": SQL_EVENTS_HOURLY,
        "url_canonicalize": SQL_URL_CANON,
        "registered_domain": SQL_REG_DOMAIN,
        "url_to_path": SQL_URL_TO_PATH,
        "typerecognitor": SQL_TYPERECOGNITOR,
        "robots_gate": SQL_ROBOTS_GATE,
        "dedup_exact": SQL_DEDUP_EXACT,
        "doc_fingerprint": SQL_FINGERPRINT,
        "lang_id": SQL_LANG_ID,
        "quality_score": SQL_QUALITY,
        "token_count": SQL_TOKEN_COUNT,
        "gopher_quality": SQL_GOPHER,
        "repetition_stats": SQL_REPETITION,
        "decontaminate": SQL_DECONTAMINATE,
        "cleaning_decision": _sql_cleaning_decision(),
        "exact_quantiles": _sql_exact_quantiles(),
        "grouped_quantiles": _sql_grouped_quantiles(),
        "snapshot_delta": _sql_snapshot_delta(),
        "revisit_records": _sql_revisit_records(),
        "cdxj_export": _sql_cdxj_export(),
        "normalize_text": _sql_normalize_text(),
        "bpe_merges": _sql_bpe_merges(),
        "bpe_encode": _sql_bpe_encode(),
        "cms_topk": _sql_cms_topk(),
        "chunk_documents": _sql_chunk_documents(),
        "reciprocal_links": _sql_reciprocal_links(),
        "inverted_postings": _sql_inverted_postings(),
        "image_features": SQL_IMAGE_FEATURES,
        "audio_features": SQL_AUDIO_FEATURES,
        "resolve_redirects": _sql_resolve_redirects(),
        "strip_tracking": _sql_strip_tracking(),
        "canonical_quality": _sql_canonical_quality(),
        "rebalance_plan": _sql_rebalance_plan(),
        "warc_roundtrip": SQL_WARC_ROUNDTRIP,
        "wet_export": SQL_WET_EXPORT,
        "sitemap_extract": SQL_SITEMAP_EXTRACT,
        "kmeans": _sql_kmeans(),
        "mixture_sample": _sql_mixture_sample(),
        "stratified_topn": _sql_stratified_topn(),
        "pack_sequences": _sql_pack_sequences(),
        "trap_urls": SQL_TRAP_URLS,
        "robots_sitemap": SQL_ROBOTS_SITEMAP,
        "recrawl_schedule": SQL_RECRAWL,
        "dup_span_stats": SQL_DUP_SPANS,
        "c4_filters": SQL_C4_FILTERS,
        "tfidf_topk": SQL_TFIDF,
        "cdx_index": SQL_CDX_INDEX,
        "hll_cardinality": _sql_hll_cardinality(),
        "robots_rules": _sql_robots_rules(),
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "dup_clusters": _sql_dup_clusters(),
        "pagerank": _sql_pagerank(),
        "hits": _sql_hits(),
        "pii_redact": _sql_pii_redact(),
        "hash_split": _sql_hash_split(),
        "dedup_retention": _sql_dedup_retention(),
        "minhash_verified": SQL_MINHASH_VERIFIED,
        "minhash_incremental": SQL_MINHASH_INCREMENTAL,
        "simhash_verified": SQL_SIMHASH_VERIFIED,
        "knn_cosine": SQL_KNN,
        "lsh_knn_verified": SQL_LSH_KNN_VERIFIED,
        "ivf_knn_verified": SQL_IVF_KNN_VERIFIED,
        "embedding_norm": SQL_EMB_NORM,
        "embedding_dedup": SQL_EMBEDDING_DEDUP,
        "multimodal_meta": SQL_MULTIMODAL,
        "media_resize": SQL_MEDIA_RESIZE,
        "png_pixel_resize": SQL_PNG_PIXEL_RESIZE,
        "frame_sample_verified": SQL_FRAME_SAMPLE_VERIFIED,
        "session_windows": SQL_SESSION_WINDOWS,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full distributed crawl on the deterministic corpus
    (sf0.001-scale), returning the crawled table."""
    return q_crawl_mini(spark, "/root/testdata/sf0.001")
