#!/usr/bin/env python
"""spark-submit entrypoint (BASELINE.json north_rule:
``spark-submit --py-files engine.zip crawl.py --seeds ... --waves ...``).

Runs the distributed crawl against a pages table (parquet or Iceberg path),
committing checkpointed wave snapshots to --store; rerunning with the same
--store resumes from the last committed wave.

Examples:
  # package the engine, then submit at two cluster sizes
  python -c "from transmogrify_webcrawler_spark.shipping import package_zip; \
             print(package_zip('.'))"
  spark-submit --master local[8]  --py-files transmogrify_webcrawler_spark.zip \
      crawl.py --pages corpus.parquet --seeds http://example0.com/ \
      --store /tmp/crawl_store --waves 50
  spark-submit --master local[32] --py-files transmogrify_webcrawler_spark.zip \
      crawl.py --pages corpus.parquet --seeds http://example0.com/ \
      --store /tmp/crawl_store2 --waves 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True,
                   help="parquet path of the pages table "
                        "(url, warc_ts, html, text, lang)")
    p.add_argument("--seeds", nargs="+", required=True)
    p.add_argument("--store", required=True,
                   help="snapshot store dir (reuse to resume)")
    p.add_argument("--waves", type=int, default=100)
    p.add_argument("--wave-size", type=int, default=100_000)
    p.add_argument("--per-domain-budget", type=int, default=1000)
    p.add_argument("--maxsize", type=int, default=1 << 20)
    p.add_argument("--max-pages", type=int, default=10**9)
    p.add_argument("--ignore", nargs="*", default=[],
                   help="ignore regexes (re.search semantics)")
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--fetch-mode", choices=("per-wave", "precompute"),
                   default="per-wave",
                   help="precompute = one corpus-wide extraction pass up "
                        "front (right when the crawl visits most of the "
                        "corpus)")
    p.add_argument("--cache-corpus", choices=("full", "skinny"),
                   default="full",
                   help="skinny = never pin page bodies; re-scan the "
                        "corpus each wave (the 100 TB configuration)")
    p.add_argument("--parquet-codec", default="lz4_raw",
                   help="store parquet compression (lz4_raw measured "
                        "fastest on commit-encode-bound waves)")
    p.add_argument("--expire-keep-last", type=int, default=0,
                   help=">0: expire all but the newest K snapshots after "
                        "each commit (bounds store disk; 0 keeps full "
                        "time-travel history)")
    p.add_argument("--out", help="optional parquet path for the final "
                                 "crawled+backlinks table")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from transmogrify_webcrawler_spark.plans.crawl import (
        SparkCrawlConfig, SparkCrawler)

    spark = SparkSession.builder.appName("transmogrify-webcrawler-spark") \
        .getOrCreate()
    cfg = SparkCrawlConfig(
        wave_size=args.wave_size, per_domain_budget=args.per_domain_budget,
        max_pages=args.max_pages, maxsize=args.maxsize, max_waves=args.waves,
        ignore=tuple(args.ignore), use_bloom=not args.no_bloom,
        fetch_mode=args.fetch_mode, cache_corpus=args.cache_corpus,
        parquet_codec=args.parquet_codec,
        expire_keep_last=args.expire_keep_last)
    crawler = SparkCrawler(spark, args.store, cfg)
    t0 = time.time()
    out = crawler.run(spark.read.parquet(args.pages), args.seeds)
    n = out.count()
    wall = time.time() - t0
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    print(json.dumps(dict(
        pages_crawled=n, wall_sec=round(wall, 2),
        pages_per_sec=round(n / wall, 2) if wall > 0 else None,
        waves=crawler.store.current_wave() + 1, store=args.store)))
    spark.stop()


if __name__ == "__main__":
    main()
