"""Recrawl snapshot diff — the change-feed a continuous crawl derives by
comparing two corpus snapshots: which URLs appeared, vanished, changed
content, or stayed identical. Downstream this is what drives re-extraction
(changed), tombstoning (gone), frontier seeding (added), and the
change-rate estimates the recrawl scheduler consumes
(operators of recrawl_schedule).

Scale shape: both sides reduce to the SKINNY (key, digest) projection in
their scans — body bytes never move — and the diff is ONE full-outer
equi-join on the key. Snapshot tables at 10^10 URLs are bucketed by
url_canon (sources/icetable.py layout), so successive snapshots co-locate
and the join plans shuffle-free; the digest is computed in the scan stage
(xxhash64/md5 of the stored text), never recomputed downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                   digest_col: str = "digest") -> DataFrame:
    """(key, status, old_digest, new_digest) per URL in either snapshot;
    status in {'added', 'gone', 'changed', 'unchanged'}."""
    o = old.select(F.col(key_col).alias("k"),
                   F.col(digest_col).alias("old_digest"))
    n = new.select(F.col(key_col).alias("k"),
                   F.col(digest_col).alias("new_digest"))
    j = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), "added")
        .when(F.col("new_digest").isNull(), "gone")
        .when(F.col("old_digest") == F.col("new_digest"), "unchanged")
        .otherwise("changed"))
    return j.select(F.col("k").alias(key_col), status.alias("status"),
                    "old_digest", "new_digest")


def delta_summary(delta: DataFrame) -> DataFrame:
    """(status, n) rollup of a snapshot_delta result — the wave-level metric
    row; partial-aggregates map-side like every count rollup here."""
    return delta.groupBy("status").agg(F.count("*").alias("n"))


def snapshot_delta_sql(old_sql: str, new_sql: str, key_sql: str = "url",
                       digest_sql: str = "digest") -> str:
    """DuckDB oracle: the identical full-outer diff."""
    return f"""
SELECT coalesce(o.k, n.k) AS {key_sql},
       CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'gone'
            WHEN o.old_digest = n.new_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.old_digest, n.new_digest
FROM (SELECT {key_sql} AS k, {digest_sql} AS old_digest FROM ({old_sql})) o
FULL OUTER JOIN
     (SELECT {key_sql} AS k, {digest_sql} AS new_digest FROM ({new_sql})) n
ON o.k = n.k
"""
