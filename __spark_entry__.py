"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over transmogrify_webcrawler_spark.harness — the driver's verify
runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash). Rows-only entries
(crawl_mini, minhash_lsh, simhash_pairs, lsh_knn, frame_sample) are
genuinely non-SQL-expressible (engine hashing / the full wave loop /
generic-input paths); each has an oracle-checked sibling covering its
substance (byte-identity pytest for the wave loop; minhash_verified /
simhash_verified / lsh_knn_verified / ivf_knn_verified / multimodal_meta /
frame_sample_verified).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transmogrify_webcrawler_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full distributed crawl of the deterministic synthetic corpus
    (wave loop, politeness, bloom dedup, extraction UDFs)."""
    return harness.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    return harness.oracle_sql()
