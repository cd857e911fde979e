"""fetch_mode='precompute' must be output-equivalent to the lazy per-wave
path (and therefore to the oracle): one corpus-wide extraction pass up front,
text attached at finalize, same bytes out."""

import pytest

from transmogrify_webcrawler_spark.plans.crawl import (
    SparkCrawlConfig, SparkCrawler,
)


def test_precompute_equals_oracle(spark, pages_df, corpus, oracle_result,
                                  tmp_path):
    o = oracle_result["cfg"]
    cfg = SparkCrawlConfig(
        wave_size=o.wave_size, per_domain_budget=o.per_domain_budget,
        maxsize=o.maxsize, ignore=o.ignore, n_bloom_shards=8, n_salts=4,
        fetch_mode="precompute")
    crawler = SparkCrawler(spark, str(tmp_path / "store"), cfg)
    got = {r["url_canon"]: r.asDict()
           for r in crawler.run(pages_df, corpus["seeds"]).collect()}
    want = oracle_result["crawled"]
    assert set(got) == {r["url_canon"] for r in want}
    for r in want:
        g = got[r["url_canon"]]
        assert g["extracted_text"] == r["extracted_text"], r["url_canon"]
        assert g["sortorder"] == r["sortorder"]
        assert g["backlinks"] == r["backlinks"]
        assert g["mimetype"] == r["mimetype"]
