"""Config-knob parity tests: robots Crawl-delay politeness (the pinned
wave_seconds//delay budget rule), the F6 `nonames` flag round-trip, and the
Iceberg writeTo-shaped store seam."""

import pytest

from transmogrify_webcrawler_spark.oracle import CrawlConfig, OracleCrawler
from transmogrify_webcrawler_spark.plans.crawl import (
    SparkCrawlConfig, SparkCrawler,
)
from transmogrify_webcrawler_spark.sources.corpus import (
    DEFAULT_IGNORE, generate_corpus, pages_index, write_parquet,
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    rows, seeds, robots = generate_corpus(n_domains=3, total_pages=90)
    p = tmp_path_factory.mktemp("tiny") / "pages.parquet"
    write_parquet(rows, str(p))
    return dict(rows=rows, seeds=seeds, robots=robots,
                index=pages_index(rows), path=str(p))


def _spark_rows(spark, tiny, tmp_path, **cfg_kw):
    cfg = SparkCrawlConfig(wave_size=40, per_domain_budget=20,
                           maxsize=64 * 1024, ignore=DEFAULT_IGNORE,
                           n_bloom_shards=8, n_salts=4, **cfg_kw)
    c = SparkCrawler(spark, str(tmp_path / "store"), cfg)
    out = c.run(spark.read.parquet(tiny["path"]), tiny["seeds"])
    return {r["url_canon"]: r.asDict() for r in out.collect()}, c


def _oracle(tiny, **cfg_kw):
    cfg = CrawlConfig(wave_size=40, per_domain_budget=20, maxsize=64 * 1024,
                      ignore=DEFAULT_IGNORE, **cfg_kw)
    c = OracleCrawler(tiny["index"], tiny["robots"], tiny["seeds"], cfg)
    return c.run(), c


def test_crawl_delay_reduces_budget_and_both_sides_agree(spark, tiny,
                                                         tmp_path):
    """Domain example1.com sets Crawl-delay: 2; with wave_seconds=10 its
    per-wave budget drops to 10//2 = 5 (< per_domain_budget=20). The rule
    must BIND (some wave crawls exactly 5 of its pages) and Spark must match
    the oracle crawl set + sortorder exactly under it."""
    want, oc = _oracle(tiny, wave_seconds=10.0)
    assert oc._domain_budget("example1.com") == 5
    assert oc._domain_budget("example0.com") == 20  # no delay -> full budget

    got, _ = _spark_rows(spark, tiny, tmp_path, wave_seconds=10.0)
    assert set(got) == {r["url_canon"] for r in want}
    for r in want:
        assert got[r["url_canon"]]["sortorder"] == r["sortorder"]

    # the cap actually constrained a wave (guards against a silently
    # non-binding rule): d1 pages crawled in some wave == exactly 5
    per_wave = {}
    for r in want:
        if "example1.com" in r["url_canon"]:
            per_wave[r["wave"]] = per_wave.get(r["wave"], 0) + 1
    assert 5 in per_wave.values(), per_wave


def test_nonames_knob_round_trips(spark, tiny, tmp_path):
    """F6: nonames=False collects name anchors as self-links (upstream
    webchecker default); nonames=True drops them. Both settings must match
    the oracle byte-for-byte; the flag must change the links table."""
    from transmogrify_webcrawler_spark.oracle.extract import extract_links

    # corpus pages with i % 31 == 9 carry <a name=...> anchors
    a_name = [r for r in tiny["rows"]
              if b"<a name=" in r["html"]]
    assert a_name, "fixture must contain name anchors"
    html = a_name[0]["html"]
    url = a_name[0]["url"]
    with_names = extract_links(html, url, nonames=False)
    without = extract_links(html, url, nonames=True)
    assert len(with_names) == len(without) + html.count(b"<a name=")

    want, _ = _oracle(tiny, nonames=True)
    got, _ = _spark_rows(spark, tiny, tmp_path, nonames=True)
    assert set(got) == {r["url_canon"] for r in want}
    for r in want:
        assert got[r["url_canon"]]["extracted_text"] == r["extracted_text"]
        assert got[r["url_canon"]]["backlinks"] == r["backlinks"]


def test_prepare_pages_kills_exact_duplicate_rows(spark, tmp_path):
    """Dirty crawl data often repeats a capture verbatim (same url, warc_ts,
    body). Exactly ONE row may survive corpus prep — duplicates fanning out
    would emit duplicate crawled rows and inflate counts (the oracle's dict
    index naturally keeps one)."""
    from datetime import datetime

    cfg = SparkCrawlConfig()
    crawler = SparkCrawler(spark, str(tmp_path / "s"), cfg)
    ts = datetime(2026, 1, 1)
    rows = [("http://a.com/x", ts, b"<p>hi</p>", "", "en")] * 3 + [
        ("http://a.com/x", datetime(2026, 1, 2), b"<p>new</p>", "", "en"),
        ("http://a.com/y", ts, b"<p>y</p>", "", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    got = crawler.prepare_pages(pages).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["url_canon"], []).append(r)
    assert len(by_url["http://a.com/x"]) == 1
    assert bytes(by_url["http://a.com/x"][0]["html"]) == b"<p>new</p>"
    assert len(by_url["http://a.com/y"]) == 1


def test_writeto_seam_single_table_snapshots(spark, tmp_path):
    """The Iceberg DataFrameWriterV2-shaped seam: append/createOrReplace
    publish one snapshot per call, counts recorded, reads see exactly the
    committed union — the call shape a real catalog swap-in keeps."""
    from transmogrify_webcrawler_spark.sources.icetable import SnapshotStore

    store = SnapshotStore(str(tmp_path / "ice"))
    df1 = spark.range(5).selectExpr("id", "id * 2 AS v")
    df2 = spark.range(5, 8).selectExpr("id", "id * 2 AS v")
    store.writeTo("t").append(df1)
    w0 = store.current_wave()
    store.writeTo("t").append(df2)
    assert store.current_wave() == w0 + 1
    assert store.current_manifest()["counts"]["t"] == 3  # last commit's count
    got = store.read(spark, "t")
    assert got.count() == 8
    store.writeTo("t").createOrReplace(df2)
    assert store.read(spark, "t").count() == 3
    # append dirs accumulated then replaced: manifest lists exactly one dir
    assert len(store.current_manifest()["tables"]["t"]) == 1
