"""Sitemap source: xpath extraction (namespaced + plain) and determinism."""

from pyspark.sql import functions as F

from transmogrify_webcrawler_spark.sources.sitemap import (
    synthesize_sitemaps, sitemap_urls,
)


def test_roundtrip_and_partition_invariance(spark):
    rows = [(f"d{i % 3}.example", f"https://d{i % 3}.example/p/{i}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "domain string, url string")
    a = synthesize_sitemaps(df).collect()
    b = synthesize_sitemaps(df.repartition(7)).collect()
    assert {r["domain"]: r["xml"] for r in a} == \
           {r["domain"]: r["xml"] for r in b}
    out = sitemap_urls(synthesize_sitemaps(df)).collect()
    assert sorted((r["domain"], r["loc"]) for r in out) == sorted(rows)


def test_xpath_handles_namespaced_and_plain_xml(spark):
    ns = ('<?xml version="1.0"?><urlset '
          'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          '<url><loc>https://a.example/1</loc></url>'
          '<url><loc>https://a.example/2</loc></url></urlset>')
    plain = ('<?xml version="1.0"?><urlset>'
             '<url><loc>https://b.example/1</loc></url></urlset>')
    df = spark.createDataFrame(
        [("a.example", ns), ("b.example", plain)], "domain string, xml string")
    out = sorted((r["domain"], r["loc"]) for r in sitemap_urls(df).collect())
    assert out == [("a.example", "https://a.example/1"),
                   ("a.example", "https://a.example/2"),
                   ("b.example", "https://b.example/1")]


def test_robots_sitemap_directive_extraction(spark):
    from transmogrify_webcrawler_spark.sources.sitemap import robots_sitemaps
    body_a = ("User-agent: *\nDisallow: /x\n"
              "Sitemap: https://a.example/sm.xml\n"
              "SITEMAP:https://a.example/sm2.xml\n"   # case-insensitive key
              "  sitemap:\thttps://a.example/sm3.xml\n"  # leading ws + tab
              "notasitemap: https://evil.example/x\n")   # must NOT match
    body_b = "User-agent: *\nAllow: /\n"  # no directive -> no rows
    df = spark.createDataFrame(
        [("a.example", body_a), ("b.example", body_b)],
        "domain string, robots_txt string")
    out = sorted((r["domain"], r["sitemap_url"])
                 for r in robots_sitemaps(df).collect())
    assert out == [("a.example", "https://a.example/sm.xml"),
                   ("a.example", "https://a.example/sm2.xml"),
                   ("a.example", "https://a.example/sm3.xml")]


def test_trap_signals(spark):
    from transmogrify_webcrawler_spark.operators.traps import trap_signals
    urls = [
        ("https://ok.example/a/b/c", False),                      # benign
        ("https://loop.example/a/b/a/b/a", True),                 # seg x3
        ("https://deep.example" + "/s" * 13, True),               # depth 13
        ("https://q.example/p?" + "&".join(f"k{i}=1" for i in range(9)),
         True),                                                   # 9 params
        ("https://q2.example/p?x=1&y=2", False),
        ("https://frag.example/a/b#c/d/c/d/c", False),            # fragment
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {r["url"]: r for r in trap_signals(df).collect()}
    for u, expect in urls:
        assert got[u]["is_trap"] is expect, (u, got[u])
    assert got["https://loop.example/a/b/a/b/a"]["max_seg_repeat"] == 3
    assert got["https://deep.example" + "/s" * 13]["depth"] == 13
    assert got[urls[3][0]]["n_params"] == 9
