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
