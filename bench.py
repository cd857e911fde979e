#!/usr/bin/env python
"""Benchmark harness (driver-run per round; BASELINE.md protocol).

Runs (a) the distributed crawl on a cached deterministic corpus — the
headline metric, pages-crawled/sec — and (b) the heavy harness queries at
$SPARK_GRAFT_SF_DIR. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Every measurement is MEDIAN-OF-N (default 3, SPARK_GRAFT_BENCH_REPEATS):
this box's wall times vary up to ~1.7x between sessions (disclosed in
BENCH/BASELINE.md), so single-run numbers are noise-dominated; the JSON
line carries a "spread" field ([min, max] per query) so round-over-round
deltas can be judged against the measured same-session variance.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     SPARK_GRAFT_CRAWL_PAGES (default 20000),
     SPARK_GRAFT_BENCH_REPEATS (default 3),
     SPARK_GRAFT_STORE_DIR (snapshot-store parent, e.g. /dev/shm for the
     tmpfs disk-attribution experiment — BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "20000"))
BODY_WORDS = int(os.environ.get("SPARK_GRAFT_BODY_WORDS", "30"))
REPO = os.path.dirname(os.path.abspath(__file__))

BENCH_QUERIES = [
    "pricing_summary", "salted_agg", "backlink_collect", "politeness_topk",
    "dedup_exact", "token_count", "minhash_lsh", "knn_cosine",
    "ngram_jaccard", "simhash_pairs",
    # round-3 additions (keys appended — earlier keys stay comparable
    # across BENCH_r{N}.json)
    "embedding_dedup", "session_windows", "multimodal_meta",
    # round-4 additions: both ANN paths (oracle-checked) + media resize
    "lsh_knn_verified", "ivf_knn_verified", "media_resize",
    # round-5 addition: pixel-true PNG resample round trip (oracle-checked)
    "png_pixel_resize",
    # round-5 graph ops: fixed-point PageRank and pair->cluster components
    "pagerank", "dup_clusters",
    # round-5: PII scrub (Catalyst regex chain, oracle-checked)
    "pii_redact",
    # round-5: deterministic split + end-to-end dedup retention decision
    "hash_split", "dedup_retention",
    # round-5 session 3: quality/repetition/decontamination filters, the
    # WARC + sitemap container round-trips, exact-arithmetic k-means
    "gopher_quality", "repetition_stats", "decontaminate",
    "warc_roundtrip", "sitemap_extract", "kmeans",
    "mixture_sample", "stratified_topn", "pack_sequences",
    "trap_urls", "robots_sitemap", "recrawl_schedule",
    # round-5 session 4: exact-substring span dedup, C4 line filters,
    # TF-IDF keywording, SURT/CDX archive index, HLL cardinality sketch,
    # HITS hubs/authorities
    "dup_span_stats", "c4_filters", "tfidf_topk",
    "cdx_index", "hll_cardinality", "hits",
    "robots_rules", "wet_export", "minhash_incremental",
    # round-5 session 5: end-to-end cleaning verdict (keep/drop + reason),
    # sort-free exact percentiles, recrawl snapshot diff, NFC normalization
    "cleaning_decision", "exact_quantiles", "snapshot_delta",
    "normalize_text", "bpe_merges", "bpe_encode", "cms_topk",
    "chunk_documents", "reciprocal_links", "inverted_postings",
    "image_features", "audio_features", "resolve_redirects",
    "strip_tracking", "canonical_quality", "rebalance_plan",
    "grouped_quantiles", "revisit_records", "cdxj_export",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-{cpus}"))
    # disk-attribution experiment (BENCH/BASELINE.md): move shuffle/cache
    # spill off the single shared disk (e.g. /dev/shm) alongside
    # SPARK_GRAFT_STORE_DIR
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # moderate heap on purpose: an oversized (48g) heap measurably
        # stalls the Arrow-batch pipeline at high parallelism (extraction
        # stage 45s -> 24s at local[32] when dropped to 12g; G1 behaves
        # badly with a huge young gen full of ~20MB humongous batches).
        # Heavy-page benches (per-wave fetch at ~240KB pages) size up via
        # the env knob — disclosed in BENCH/BASELINE.md.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # PySpark's per-op call-site capture does TWO extra Py4J round
        # trips per DataFrame method (conf.get + origin.set) plus a Python
        # stack walk — pure serial driver overhead on the wave loop. Must
        # be set at session build: pyspark caches the flag on first use.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )


def ensure_corpus(n_pages: int, body_words: int = 30,
                  hot_share: float = 0.6) -> str:
    """Deterministic bench corpus, cached under BENCH/ (seed=42)."""
    suffix = f"_{body_words}" if body_words != 30 else ""
    if hot_share != 0.6:
        suffix += f"_h{int(hot_share * 100)}"
    path = os.path.join(REPO, "BENCH", f"corpus_{n_pages}{suffix}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        n_domains = max(8, n_pages // 500)
        if n_pages * max(body_words, 1) > 600_000_000:
            # too big for the in-memory path (the hot domain alone is GBs):
            # stream domains straight into the parquet writer
            from transmogrify_webcrawler_spark.sources.corpus import (
                generate_corpus_parquet)
            seeds = generate_corpus_parquet(
                path, n_domains=n_domains, total_pages=n_pages,
                body_words=body_words, hot_share=hot_share)
        else:
            from transmogrify_webcrawler_spark.sources.corpus import (
                generate_corpus, write_parquet)
            rows, seeds, _ = generate_corpus(n_domains=n_domains,
                                             total_pages=n_pages,
                                             body_words=body_words,
                                             hot_share=hot_share)
            write_parquet(rows, path)
        with open(path + ".seeds.json", "w") as f:
            json.dump(seeds, f)
    _ensure_small_row_groups(path)
    return path


def _ensure_small_row_groups(path: str, max_group_mb: int = 24) -> None:
    """Spark parallelizes a parquet file at ROW GROUP granularity and splits
    by ON-DISK offsets: a corpus of heavy pages written with 1024-row groups
    (~90 MB compressed at 40k words) caps the scan at ~49 tasks, which
    quantizes badly against 8/32 cores (the N->4N scaling gate). Rewrite in
    place with groups sized against the COMPRESSED footprint (what Spark's
    maxPartitionBytes sees — the uncompressed total_byte_size is ~3x larger
    and would trigger pointless rewrites). Streamed batch-by-batch: never
    materializes the corpus in driver RAM. Content unchanged."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    if md.num_row_groups == 0:
        return
    disk_bytes = os.path.getsize(path)
    if disk_bytes / md.num_row_groups <= max_group_mb * (1 << 20):
        return
    rows_per_group = max(
        int(md.num_rows * (max_group_mb * (1 << 20)) / disk_bytes), 64)
    tmp = path + ".rewrite.tmp"
    writer = pq.ParquetWriter(tmp, pf.schema_arrow)
    try:
        import pyarrow as pa
        for batch in pf.iter_batches(batch_size=rows_per_group):
            writer.write_table(pa.Table.from_batches([batch]),
                               row_group_size=rows_per_group)
    finally:
        writer.close()
    os.replace(tmp, path)


def bench_crawl(spark, n_pages: int, body_words: int = 30) -> dict:
    import shutil
    import tempfile

    from transmogrify_webcrawler_spark.plans.crawl import (
        SparkCrawlConfig, SparkCrawler)
    from transmogrify_webcrawler_spark.sources.corpus import DEFAULT_IGNORE

    hot = float(os.environ.get("SPARK_GRAFT_HOT_SHARE", "0.6"))
    path = ensure_corpus(n_pages, body_words, hot)
    with open(path + ".seeds.json") as f:
        seeds = json.load(f)
    pages = spark.read.parquet(path)
    seed_every = int(os.environ.get("SPARK_GRAFT_SEED_EVERY", "0"))
    if seed_every:
        # dense deterministic seed sample — shallow BFS (few waves), the
        # realistic shape for huge frontiers where each wave is millions of
        # URLs rather than a deep chain
        from pyspark.sql import functions as F
        extra = [r["url"] for r in pages.select("url").filter(
            (F.pmod(F.xxhash64("url"), F.lit(seed_every)) == 0)
            & ~F.col("url").endswith("robots.txt")).collect()]
        seeds = sorted(set(seeds) | set(extra))
    store = tempfile.mkdtemp(
        prefix="bench_store_",
        dir=os.environ.get("SPARK_GRAFT_STORE_DIR") or None)
    cfg = SparkCrawlConfig(
        wave_size=int(os.environ.get("SPARK_GRAFT_WAVE_SIZE",
                                     max(n_pages // 4, 1000))),
        per_domain_budget=int(os.environ.get("SPARK_GRAFT_DOMAIN_BUDGET",
                                             10**9)),
        maxsize=512 * 1024, ignore=DEFAULT_IGNORE, max_waves=50,
        use_bloom=os.environ.get("SPARK_GRAFT_BLOOM", "1") == "1",
        n_bloom_shards=32,
        cache_corpus=os.environ.get("SPARK_GRAFT_CACHE", "full"),
        # crawl_delay politeness window: the bench corpus has delay-bearing
        # domains; the bench default makes the delay non-binding (we measure
        # engine throughput, not sleeps the oracle also takes — correctness
        # of the binding rule is pytest's job, tests/test_config_knobs.py)
        wave_seconds=float(os.environ.get("SPARK_GRAFT_WAVE_SECONDS",
                                          "1e18")),
        arrow_batch=int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048")),
        fetch_mode=os.environ.get("SPARK_GRAFT_FETCH_MODE", "per-wave"),
        # default "0" = the SHIPPED engine default (pipeline_commits=False);
        # the pipelined loop is measured slower on this one box (187->199 s,
        # BENCH/BASELINE.md round-4 A/B) — the bench must measure what ships.
        # Export SPARK_GRAFT_PIPELINE=1 for the cluster-shaped experiment arm.
        pipeline_commits=os.environ.get("SPARK_GRAFT_PIPELINE", "0") == "1",
    )
    crawler = SparkCrawler(spark, store, cfg)
    t0 = time.time()
    out = crawler.run(pages, seeds)
    t_run = time.time() - t0
    n_crawled = out.count()
    wall = time.time() - t0
    crawler.timings.append(dict(wave=99, step="finalize_count",
                                sec=round(wall - t_run, 3)))
    if os.environ.get("SPARK_GRAFT_DEBUG"):
        import collections
        agg = collections.defaultdict(float)
        for t in crawler.timings:
            agg[t["step"]] += t["sec"]
        print("DEBUG steps:", dict(agg), file=sys.stderr)
        print("DEBUG timings:", json.dumps(crawler.timings), file=sys.stderr)
        print("DEBUG writes:", json.dumps(crawler.write_timings),
              file=sys.stderr)
    waves = crawler.store.current_wave() + 1
    shutil.rmtree(store, ignore_errors=True)
    import collections
    per_wave = collections.defaultdict(float)
    for t in crawler.timings:
        per_wave[t["wave"]] += t["sec"]
    return dict(crawl_sec=round(wall, 2), pages_crawled=n_crawled,
                waves=waves, pages_per_sec=round(n_crawled / wall, 1),
                per_wave_sec={str(k): round(v, 2)
                              for k, v in sorted(per_wave.items())})


REPEATS = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)


def bench_queries(spark, repeats: int = REPEATS) -> tuple[dict, dict]:
    """Median-of-`repeats` per query + [min, max] spread. The first run of
    a query pays plan compilation / UDF warmup; the median absorbs it.
    The cache is cleared BETWEEN queries (not between a query's repeats):
    several operators persist intermediates (LSH index, k-means base,
    graph checkpoints) and each invocation creates fresh entries, so
    without the clear every later query competes with dozens of leaked,
    unreachable cached tables — cross-query pollution, not signal."""
    from transmogrify_webcrawler_spark import harness

    qs = harness.queries()
    out, spread = {}, {}
    for name in BENCH_QUERIES:
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        ts.sort()
        out[name] = ts[len(ts) // 2]
        spread[name] = [ts[0], ts[-1]]
        spark.catalog.clearCache()
    return out, spread


def main():
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    crawls = [bench_crawl(spark, CRAWL_PAGES, BODY_WORDS)
              for _ in range(REPEATS)]
    crawls.sort(key=lambda c: c["crawl_sec"])
    crawl = crawls[len(crawls) // 2]  # the median run, reported whole
    crawl_spread = [crawls[0]["crawl_sec"], crawls[-1]["crawl_sec"]]
    if "--crawl-only" in sys.argv:
        crawl.update(metric="pages_crawled_per_sec",
                     value=crawl["pages_per_sec"], unit="pages/sec",
                     cpus=CPUS, repeats=REPEATS,
                     spread={"crawl": crawl_spread})
        print(json.dumps(crawl))
        spark.stop()
        return
    queries, spread = bench_queries(spark)
    total = round(crawl["crawl_sec"] + sum(queries.values()), 2)
    queries["crawl"] = crawl["crawl_sec"]
    spread["crawl"] = crawl_spread
    result = {
        "metric": "crawl+query wall time (headline: pages_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "spread": spread,
        "repeats": REPEATS,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pages_per_sec": crawl["pages_per_sec"],
        "pages_crawled": crawl["pages_crawled"],
        "waves": crawl["waves"],
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
