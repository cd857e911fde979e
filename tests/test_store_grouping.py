"""Grouped snapshot commits (round-3 commit-floor fix): every skinny
unbucketed append rides ONE Spark job via a schema-harmonized union +
partitionBy(_table) + pre-publish renames. This pins the store-level
contract the crawl relies on."""

import os

from pyspark.sql import functions as F

from transmogrify_webcrawler_spark.sources.icetable import SnapshotStore


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_grouped_commit_layout_counts_and_reads(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    links = _df(spark, [("a", "b", 0), ("a", "c", 0)],
                "src string, dst string, wave int")
    errors = _df(spark, [("u1", 0, "robots")],
                 "url_canon string, wave int, reason string")
    seen = _df(spark, [("u1", 0), ("u2", 0), ("u3", 0)],
               "url_canon string, wave int")
    m = store.commit_wave(0, appends={"links": links, "errors": errors,
                                      "seen": seen}, replaces={})
    # per-table row counts from footers, per-table dirs in the manifest
    assert m["counts"] == {"links": 2, "errors": 1, "seen": 3}
    for t in ("links", "errors", "seen"):
        assert os.path.isdir(os.path.join(store.root, "data", t,
                                          "wave=000000"))
    # the grouped staging dir never survives a commit
    assert not os.path.exists(os.path.join(store.root, "data", "_grouped"))
    # schema-less read projects the table's TRUE columns (manifest list),
    # not the harmonized union schema
    got = store.read(spark, "errors")
    assert got.columns == ["url_canon", "wave", "reason"]
    assert got.collect()[0]["reason"] == "robots"
    # schema'd read works against grouped (superset-schema) files
    from transmogrify_webcrawler_spark.plans.crawl import SEEN_SCHEMA
    assert store.read(spark, "seen", SEEN_SCHEMA).count() == 3


def test_grouped_commit_empty_table_keeps_schema(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    links = _df(spark, [("a", "b", 0)], "src string, dst string, wave int")
    empty = _df(spark, [], "url_canon string, wave int, reason string")
    m = store.commit_wave(0, appends={"links": links, "errors": empty},
                          replaces={})
    assert m["counts"] == {"links": 1, "errors": 0}
    got = store.read(spark, "errors")
    assert got.columns == ["url_canon", "wave", "reason"]
    assert got.count() == 0


def test_type_conflict_falls_back_to_solo_write(spark, tmp_path):
    """Two tables sharing a column NAME with different TYPES cannot be
    harmonized — the conflicting one must write solo, values intact."""
    store = SnapshotStore(str(tmp_path / "s"))
    a = _df(spark, [("x", 1)], "k string, v int")
    b = _df(spark, [("y", 2.5)], "k string, v double")  # v: int vs double
    c = _df(spark, [("z", 3)], "k string, w int")
    m = store.commit_wave(0, appends={"a": a, "b": b, "c": c}, replaces={})
    assert m["counts"] == {"a": 1, "b": 1, "c": 1}
    assert store.read(spark, "b").collect()[0]["v"] == 2.5
    assert store.read(spark, "a").collect()[0]["v"] == 1


def test_appends_accumulate_across_grouped_waves(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    for wave in range(3):
        links = _df(spark, [(f"s{wave}", f"d{wave}", wave)],
                    "src string, dst string, wave int")
        seen = _df(spark, [(f"u{wave}", wave)], "url_canon string, wave int")
        store.commit_wave(wave, appends={"links": links, "seen": seen},
                          replaces={})
    got = store.read(spark, "links")
    assert got.count() == 3
    assert {r["wave"] for r in got.collect()} == {0, 1, 2}
    # bucketed replace table stays a SOLO write alongside grouped appends
    fr = _df(spark, [("u", 1, 2, "d.com")],
             "url_canon string, depth int, n_refs long, "
             "registered_domain string")
    store.commit_wave(3, appends={"seen": _df(spark, [("u9", 3)],
                                              "url_canon string, wave int"),
                                  "links": _df(spark, [("a", "b", 3)],
                                               "src string, dst string, "
                                               "wave int")},
                      replaces={"frontier": fr},
                      bucket_keys={"frontier": "registered_domain"},
                      n_buckets=4)
    assert store.read(spark, "frontier").count() == 1
    assert store.read(spark, "links").count() == 4
