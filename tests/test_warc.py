"""WARC source: stdlib build/parse round-trips + the binaryFile read path."""

import glob
import os

from pyspark.sql import functions as F

from transmogrify_webcrawler_spark.sources.warc import (
    build_warc_file, parse_warc_bytes, synthesize_warc, warc_records,
)

ITEMS = [
    ("https://a.example/x", b"<html>alpha</html>"),
    ("https://b.example/y", b"payload with\r\nCRLF and\x00binary"),
    ("https://c.example/z", b""),
]


def test_parse_roundtrip_plain_and_gzip():
    for compress in (False, True):
        blob = build_warc_file(ITEMS, "t.warc", compress=compress)
        recs = list(parse_warc_bytes(blob))
        assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["response"] * 3
        got = [(r["target_uri"], r["payload"]) for r in recs[1:]]
        assert got == ITEMS
        assert all(r["http_status"] == 200 for r in recs[1:])


def test_build_is_deterministic():
    a = build_warc_file(ITEMS, "t.warc", compress=True)
    b = build_warc_file(ITEMS, "t.warc", compress=True)
    assert a == b


def test_parse_rejects_garbage():
    import pytest
    with pytest.raises(ValueError):
        list(parse_warc_bytes(b"NOT A WARC\r\n\r\n"))


def test_synthesize_partition_invariant(spark):
    rows = [(f"https://d{i % 7}.example/p/{i}", f"body {i}".encode())
            for i in range(100)]
    df1 = spark.createDataFrame(rows, "url string, payload binary")
    df8 = df1.repartition(8)
    a = {r["file_id"]: bytes(r["warc"])
         for r in synthesize_warc(df1, n_files=4).collect()}
    b = {r["file_id"]: bytes(r["warc"])
         for r in synthesize_warc(df8, n_files=4).collect()}
    assert a == b  # archive bytes are a pure function of the row SET


def test_binaryfile_read_path(spark, tmp_path):
    """The real ingestion path: .warc.gz files on disk -> binaryFile ->
    warc_records."""
    d = tmp_path / "warcs"
    d.mkdir()
    for fid in range(3):
        items = [(f"https://f{fid}.example/{i}", f"doc {fid}-{i}".encode())
                 for i in range(5)]
        (d / f"part-{fid}.warc.gz").write_bytes(
            build_warc_file(items, f"part-{fid}.warc", compress=True))
    blobs = (spark.read.format("binaryFile")
             .load(str(d) + "/*.warc.gz")
             .select(F.col("content").alias("warc")))
    recs = warc_records(blobs)
    out = recs.filter(F.col("warc_type") == "response").collect()
    assert len(out) == 15
    assert {r["http_status"] for r in out} == {200}
    uris = sorted(r["target_uri"] for r in out)
    assert uris[0] == "https://f0.example/0"
    assert all(r["content_length"] == len(f"doc x-{u.rsplit('/', 1)[1]}")
               for u, r in zip(uris, sorted(out, key=lambda r: r["target_uri"])))


def test_wet_conversion_roundtrip_and_refers_to(spark):
    from transmogrify_webcrawler_spark.sources.warc import (
        build_conversion_record, parse_warc_bytes, synthesize_wet,
        warc_records)
    import uuid

    # unit: a conversion record parses back with its text payload and
    # points at the response record's uuid5(url) id
    rec = build_conversion_record("https://a.org/x", "hello text".encode())
    parsed = list(parse_warc_bytes(rec))
    assert parsed[0]["warc_type"] == "conversion"
    assert parsed[0]["payload"] == b"hello text"
    raw = rec.decode("ascii")
    assert f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, 'https://a.org/x')}>" \
        in raw

    # distributed: synthesize -> parse round trip, partition-invariant bytes
    docs = spark.createDataFrame(
        [(f"https://a.org/{i}", f"text {i}") for i in range(40)],
        "url string, text string")
    a = {r["file_id"]: bytes(r["warc"]) for r in
         synthesize_wet(docs.coalesce(1), n_files=4).collect()}
    b = {r["file_id"]: bytes(r["warc"]) for r in
         synthesize_wet(docs.repartition(8), n_files=4).collect()}
    assert a == b
    out = warc_records(synthesize_wet(docs, n_files=4, compress=True)) \
        .filter("warc_type = 'conversion'").collect()
    assert len(out) == 40
    assert {r["target_uri"] for r in out} == \
        {f"https://a.org/{i}" for i in range(40)}
