"""Streaming tests: exactly-once file ingestion with checkpoint resume, and
byte-identity of streamed extraction vs the batch oracle path."""

import os
import time

import pytest

from transmogrify_webcrawler_spark.sources.corpus import (
    generate_corpus, write_parquet,
)
from transmogrify_webcrawler_spark.streaming.ingest import (
    extraction_plan, start_ingest,
)


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    rows, _, _ = generate_corpus(n_domains=3, total_pages=80)
    half = len(rows) // 2
    write_parquet(rows[:half], str(d / "batch0.parquet"))
    return dict(dir=str(d), rows=rows, half=half)


def _wait(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


def test_stream_ingest_exactly_once_and_resume(spark, landing, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_ingest(spark, landing["dir"], out, ckpt, trigger_once=True)
    _wait(q)
    n1 = spark.read.parquet(out).count()
    assert n1 == landing["half"]

    # second file lands; a NEW query on the same checkpoint must process
    # only the new file (exactly-once pickup across restarts)
    write_parquet(landing["rows"][landing["half"]:],
                  os.path.join(landing["dir"], "batch1.parquet"))
    q2 = start_ingest(spark, landing["dir"], out, ckpt, trigger_once=True)
    _wait(q2)
    got = spark.read.parquet(out)
    assert got.count() == len(landing["rows"])
    # no duplicates: url+warc_ts unique per capture
    assert got.select("url", "warc_ts").distinct().count() == \
        len(landing["rows"])


def test_streamed_extraction_matches_oracle(spark, landing, tmp_path):
    from transmogrify_webcrawler_spark.oracle import (
        canonicalize, extract_text, sniff_mimetype)

    out = str(tmp_path / "out2")
    q = start_ingest(spark, landing["dir"], out, str(tmp_path / "ck2"),
                     trigger_once=True)
    _wait(q)
    got = {r["url"]: r for r in spark.read.parquet(out).collect()}
    for row in landing["rows"][: landing["half"]]:
        g = got[row["url"]]
        uc = canonicalize(row["url"])
        mt = sniff_mimetype(row["html"], uc)
        want = extract_text(row["html"], uc) if mt == "text/html" else ""
        assert g["extracted_text"] == want, row["url"]


def test_stateful_seen_dedup_across_restarts(spark, tmp_path):
    """applyInPandasWithState URL-seen dedup: first occurrence wins across
    micro-batches AND across query restarts (state resumes from the
    streaming checkpoint) — the crawl seen-set semantics, never forgotten,
    unlike watermarked dropDuplicates."""
    from transmogrify_webcrawler_spark.streaming.state import (
        stateful_seen_dedup)

    src = str(tmp_path / "urls")
    ckpt = str(tmp_path / "ck_state")
    os.makedirs(src)
    schema = "url_canon string, wave int"

    def run_once(collector):
        stream = (spark.readStream.schema(schema)
                  .option("recursiveFileLookup", "true").parquet(src))
        q = (stateful_seen_dedup(stream, n_shards=4)
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _i: collector.extend(
                 (r["url_canon"], r["wave"]) for r in b.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [("http://a/", 0), ("http://b/", 0), ("http://a/", 0)], schema
    ).write.parquet(os.path.join(src, "b0.parquet"))
    got1 = []
    run_once(got1)
    assert sorted(u for u, _ in got1) == ["http://a/", "http://b/"]

    # new file, NEW query on the same checkpoint: b is already seen in
    # restored state, only c emits
    spark.createDataFrame(
        [("http://b/", 1), ("http://c/", 1)], schema
    ).write.mode("append").parquet(os.path.join(src, "b1.parquet"))
    got2 = []
    run_once(got2)
    assert [(u, w) for u, w in got2] == [("http://c/", 1)]


def test_stateful_seen_dedup_bloom_bounded_state(spark, tmp_path):
    """state_mode='bloom' (the 10^10 design point): fixed-size bitmap per
    shard — (a) exact same emissions as exact mode at a well-sized filter
    (no suppression, never a duplicate, survives restart), and (b) state
    bytes BOUNDED independent of how many distinct keys stream through:
    the checkpoint's state-store footprint stays under the same absolute
    ceiling (batches x shards x bloom_bytes + metadata) at 100 keys and at
    200x that — the logical state value is always exactly bloom_bytes (the
    on-disk files are compressed, so they grow with bit-entropy up to the
    ceiling, never with the keyspace)."""
    from transmogrify_webcrawler_spark.streaming.state import (
        stateful_seen_dedup)

    schema = "url_canon string, wave int"

    def run_once(src, ckpt, collector, **kw):
        stream = (spark.readStream.schema(schema)
                  .option("recursiveFileLookup", "true").parquet(src))
        q = (stateful_seen_dedup(stream, n_shards=4, **kw)
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _i: collector.extend(
                 (r["url_canon"], r["wave"]) for r in b.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    def state_bytes(ckpt):
        total = 0
        for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files if not f.startswith("."))
        return total

    def drive(n_keys, tag):
        src = str(tmp_path / f"urls_{tag}")
        ckpt = str(tmp_path / f"ck_{tag}")
        os.makedirs(src)
        spark.createDataFrame(
            [(f"http://{tag}/{i}", 0) for i in range(n_keys)], schema
        ).write.parquet(os.path.join(src, "b0.parquet"))
        got = []
        run_once(src, ckpt, got, state_mode="bloom", bloom_bytes=16384)
        assert len(got) == n_keys  # no suppression at this sizing
        # restart + refeed the same keys plus one fresh: only the fresh
        # one may emit — a duplicate emission is IMPOSSIBLE by the
        # zero-false-negative construction
        spark.createDataFrame(
            [(f"http://{tag}/{i}", 1) for i in range(n_keys)]
            + [(f"http://{tag}/fresh", 1)], schema
        ).write.mode("append").parquet(os.path.join(src, "b1.parquet"))
        got2 = []
        run_once(src, ckpt, got2, state_mode="bloom", bloom_bytes=16384)
        assert got2 == [(f"http://{tag}/fresh", 1)]
        return state_bytes(ckpt)

    # ceiling: 2 committed batches x 4 shards x 16 KiB of logical state,
    # plus state-store/commit-log metadata — INDEPENDENT of key count
    bound = 2 * 4 * 16384 + 64 * 1024
    small = drive(100, "small")
    big = drive(20000, "big")
    assert small < bound, (small, bound)
    assert big < bound, (big, bound)  # 200x the keys, same ceiling


def test_windowed_rollup_batch_stream_parity(spark, tmp_path):
    """The same builder over a static frame and a stream (availableNow) must
    agree — unified batch/stream semantics."""
    import datetime as dt

    from transmogrify_webcrawler_spark.streaming.windows import (
        windowed_event_rollup)

    rows = [(i, dt.datetime(2026, 1, 1, 10 + (i % 3), i % 60), "t%d" % (i % 2),
             float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    src = str(tmp_path / "events")
    df.write.parquet(src)
    batch = {tuple(r) for r in windowed_event_rollup(
        spark.read.parquet(src)).collect()}

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = []
    q = (windowed_event_rollup(stream, watermark="1 minute")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: out.extend(
             tuple(r) for r in b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark closes all but the last window(s), so
    # emitted results must be a subset with identical values
    assert set(out) <= batch
    assert len(out) > 0


def test_reconciled_bloom_dedup_recovers_false_positives(spark, tmp_path):
    """The exact-at-scale composite the state module pins: bloom bitmaps in
    stream state + per-batch exact reconciliation of bloom-positives
    against the durable seen TABLE. At a deliberately tiny bloom (16 bits,
    50 keys) false positives are forced — the control arm (plain bloom
    mode) provably suppresses fresh keys; the reconciled arm must emit
    EVERY key exactly once, and across a restart duplicates still die
    while new keys emit once."""
    from transmogrify_webcrawler_spark.streaming.state import (
        reconciled_seen_dedup, stateful_seen_dedup)

    schema = "url_canon string, wave int"
    src = str(tmp_path / "urls")
    os.makedirs(src)
    keys = [f"http://k/{i}" for i in range(50)]
    # TWO files + maxFilesPerTrigger=1 => two micro-batches: the kernel
    # tests a batch against batch-START bits (vectorized, documented), so
    # false positives arise across batches — batch 0's 25 keys saturate
    # the 16-bit filter, batch 1's 25 all test positive
    spark.createDataFrame([(k, 0) for k in keys[:25]], schema) \
        .write.parquet(os.path.join(src, "b0.parquet"))
    spark.createDataFrame([(k, 0) for k in keys[25:]], schema) \
        .write.parquet(os.path.join(src, "b1.parquet"))

    # control arm: plain bloom at this sizing suppresses fresh keys (the
    # false-positive trade the reconciliation exists to undo)
    got = []
    stream = (spark.readStream.schema(schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stateful_seen_dedup(stream, n_shards=1, state_mode="bloom",
                             bloom_bytes=2)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: got.extend(
             r["url_canon"] for r in b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck_ctl"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(got) < 50, "sizing failed to force a false positive"

    seen_dir = str(tmp_path / "seen")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run():
        s = (spark.readStream.schema(schema)
             .option("recursiveFileLookup", "true")
             .option("maxFilesPerTrigger", 1).parquet(src))
        q = reconciled_seen_dedup(s, seen_dir, out, ck, n_shards=1,
                                  bloom_bytes=2, trigger_once=True)
        q.awaitTermination(120)

    run()
    rows = spark.read.parquet(out).collect()
    # every suppressed key recovered: all 50 emitted, each exactly once
    assert sorted(r["url_canon"] for r in rows) == sorted(keys)

    # restart on the same checkpoint: refeed all 50 (bloom-positive ->
    # reconciled against the table -> die) + 5 fresh (ALSO bloom-positive
    # at this saturation -> recovered) — exactly the fresh emit, once
    fresh = [f"http://fresh/{i}" for i in range(5)]
    spark.createDataFrame([(k, 1) for k in keys + fresh], schema) \
        .write.mode("append").parquet(os.path.join(src, "b2.parquet"))
    run()
    rows2 = spark.read.parquet(out).collect()
    assert sorted(r["url_canon"] for r in rows2) == sorted(keys + fresh)
    # the durable seen table is the exact set
    assert (spark.read.parquet(seen_dir).distinct().count()
            == len(keys) + len(fresh))
