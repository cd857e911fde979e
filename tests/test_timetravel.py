"""Snapshot time travel and incremental (CDC-style) reads on the store:
historical waves stay readable and consistent while new waves commit, and
a consumer can tail exactly the rows a snapshot range appended."""

import pytest

from transmogrify_webcrawler_spark.sources.icetable import SnapshotStore


@pytest.fixture()
def store3(spark, tmp_path):
    """Three single-table append snapshots: waves 0, 1, 2 with ids
    0-9 / 10-19 / 20-29."""
    store = SnapshotStore(str(tmp_path / "store"))
    for w in range(3):
        df = spark.range(10 * w, 10 * w + 10).withColumnRenamed("id", "v")
        store.writeTo("t").append(df)
    return store


def _vals(df):
    return sorted(r["v"] for r in df.collect())


def test_time_travel_reads_historical_snapshots(spark, store3):
    assert _vals(store3.read(spark, "t")) == list(range(30))
    assert _vals(store3.read(spark, "t", as_of_wave=0)) == list(range(10))
    assert _vals(store3.read(spark, "t", as_of_wave=1)) == list(range(20))
    with pytest.raises(KeyError):
        store3.read(spark, "t", as_of_wave=99)


def test_historical_snapshot_immutable_after_new_commits(spark, store3):
    before = _vals(store3.read(spark, "t", as_of_wave=1))
    store3.writeTo("t").append(
        spark.range(100, 110).withColumnRenamed("id", "v"))
    assert _vals(store3.read(spark, "t", as_of_wave=1)) == before
    assert _vals(store3.read(spark, "t")) == list(range(30)) + \
        list(range(100, 110))


def test_incremental_read_is_exactly_the_appended_rows(spark, store3):
    assert _vals(store3.read_changes(spark, "t", 0, 2)) == list(range(10, 30))
    assert _vals(store3.read_changes(spark, "t", 1, 2)) == list(range(20, 30))
    assert _vals(store3.read_changes(spark, "t", 2, 2)) == []


def test_incremental_read_rejects_replaced_tables(spark, store3):
    store3.writeTo("t").createOrReplace(
        spark.range(5).withColumnRenamed("id", "v"))
    last = store3.current_wave()
    with pytest.raises(ValueError):
        store3.read_changes(spark, "t", 0, last)


def test_expire_keeps_append_data_but_drops_old_manifests(spark, store3):
    res = store3.expire_snapshots(keep_last=1)
    assert res["expired_manifests"] == 2
    # append dirs are all still referenced by the retained manifest: no
    # data loss, current read intact
    assert res["removed_dirs"] == 0
    assert _vals(store3.read(spark, "t")) == list(range(30))
    with pytest.raises(KeyError):
        store3.read(spark, "t", as_of_wave=0)


def test_expire_reclaims_replaced_dirs_and_stale_blobs(spark, tmp_path):
    import os
    store = SnapshotStore(str(tmp_path / "store"))
    for w in range(3):
        df = spark.range(w * 5, w * 5 + 5).withColumnRenamed("id", "v")
        store.commit_wave(w, appends={}, replaces={"r": df},
                          blobs={"bloom": bytes([w]) * 8})
    res = store.expire_snapshots(keep_last=1)
    assert res["expired_manifests"] == 2
    assert res["removed_dirs"] == 2  # the two superseded replace dirs
    assert res["removed_blobs"] == 2
    assert _vals(store.read(spark, "r")) == list(range(10, 15))
    assert store.read_blob("bloom") == bytes([2]) * 8
    waves = os.listdir(os.path.join(store.root, "data", "r"))
    assert waves == ["wave=000002"]


def test_expire_never_touches_inflight_commit_dirs(spark, store3):
    import os
    inflight = os.path.join(store3.root, "data", "t", "wave=000099")
    os.makedirs(inflight)
    store3.expire_snapshots(keep_last=1)
    assert os.path.isdir(inflight)


def test_crawl_with_expiry_matches_and_bounds_manifests(
        spark, pages_df, corpus, tmp_path):
    """expire_keep_last=1 during a real crawl: identical final table to the
    default full-history run, and the store retains exactly one manifest."""
    import os
    from transmogrify_webcrawler_spark.plans.crawl import (
        SparkCrawlConfig, SparkCrawler,
    )

    def run(store, **kw):
        cfg = SparkCrawlConfig(wave_size=50, per_domain_budget=20,
                               maxsize=64 * 1024, ignore=corpus["ignore"],
                               n_bloom_shards=8, n_salts=4,
                               bloom_compact_every=2, **kw)
        out = SparkCrawler(spark, store, cfg).run(
            pages_df, corpus["seeds"])
        return sorted((r["url_canon"], r["extracted_text"], r["sortorder"])
                      for r in out.collect())

    base = run(str(tmp_path / "s_keep"))
    expired = run(str(tmp_path / "s_expire"), expire_keep_last=1)
    assert base == expired
    snaps = os.listdir(os.path.join(str(tmp_path / "s_expire"),
                                    "_snapshots"))
    assert len(snaps) == 1
    full = os.listdir(os.path.join(str(tmp_path / "s_keep"), "_snapshots"))
    assert len(full) > 1


def test_snapshot_tail_delivers_each_wave_exactly_once(spark, tmp_path):
    from transmogrify_webcrawler_spark.streaming.tail import SnapshotTail

    store = SnapshotStore(str(tmp_path / "store"))
    off = str(tmp_path / "offsets.json")
    for w in range(3):
        store.writeTo("t").append(
            spark.range(w * 10, w * 10 + 10).withColumnRenamed("id", "v"))
    tail = SnapshotTail(store, "t", off)
    df, to_wave, resync = tail.poll(spark)
    assert _vals(df) == list(range(30)) and not resync
    # at-least-once: uncommitted poll re-delivers (restart simulation)
    df2, _, _ = SnapshotTail(store, "t", off).poll(spark)
    assert _vals(df2) == list(range(30))
    tail.commit(to_wave)
    assert tail.poll(spark) == (None, to_wave, False)
    store.writeTo("t").append(
        spark.range(100, 105).withColumnRenamed("id", "v"))
    df3, w3, resync3 = tail.poll(spark)
    assert _vals(df3) == list(range(100, 105)) and not resync3
    tail.commit(w3)
    assert tail.poll(spark)[0] is None


def test_snapshot_tail_resyncs_after_offset_expired(spark, tmp_path):
    from transmogrify_webcrawler_spark.streaming.tail import SnapshotTail

    store = SnapshotStore(str(tmp_path / "store"))
    off = str(tmp_path / "offsets.json")
    store.writeTo("t").append(
        spark.range(5).withColumnRenamed("id", "v"))
    tail = SnapshotTail(store, "t", off)
    _, w, _ = tail.poll(spark)
    tail.commit(w)
    for i in range(1, 4):
        store.writeTo("t").append(
            spark.range(i * 5, i * 5 + 5).withColumnRenamed("id", "v"))
    store.expire_snapshots(keep_last=1)  # offset manifest now gone
    df, w2, resync = tail.poll(spark)
    assert resync is True  # over-delivery: full snapshot, rows never lost
    assert _vals(df) == list(range(20))
    tail.commit(w2)
    assert tail.poll(spark)[0] is None
