"""URL-seen dedup: partitioned Bloom-shard prefilter + exact anti-join backstop
(SURVEY.md J1/A4 — the core 10^10-scale idea, BASELINE.json north_star).

Upstream [UP webchecker.py Checker.newlink]: ``if url in self.done or url in
self.todo`` — an exact in-RAM dict, O(n) memory, single process. At a 10^10-URL
frontier an exact distributed anti-join shuffles every candidate against every
seen URL. The scale fix: candidates are first probed against a broadcast of
SHARDED Bloom filters (shard = pmod(xxhash64(url), n_shards), so each value is
checked against exactly one shard's bits); only probable-positives proceed to
the exact ``left_anti`` join that kills false positives. Bloom says
"definitely new" for the overwhelming majority of candidates (crawl frontiers
are mostly-new), so the exact join's build side shrinks by ~1/fpp.

Sizing at the design point (BASELINE.md "design scale point"): 10 bits/URL
gives fpp ~= 1%% with k=7; 10^10 URLs -> 12.5 GB total, sharded into
n_shards = 1024 -> ~12 MB/shard; executors broadcast-receive the full shard
set once per wave (torrent broadcast), probe cost is hash-only. Shard build is
embarrassingly parallel per partition; merge is a bitwise-OR tree
(groupBy(shard).applyInPandas), the DataFrame rendering of treeAggregate.

Zero false negatives by construction (property-tested): a URL inserted sets
exactly the bits probed later — the exact anti-join only ever sees fewer
candidates, never loses one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, IntegerType, LongType, StructField, StructType,
)

BLOOM_K = 7  # number of hash probes (optimal for ~10 bits/key)


def _hash2(values: "pd.Series") -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per value (double-hashing scheme
    h_i = h1 + i*h2). Vectorized via pandas str->bytes + numpy frombuffer
    over blake2b digests; per-batch Python, never per-row Spark."""
    import hashlib

    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b((v or "").encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1  # odd -> full cycle
    return h1, h2


def _set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> None:
    m = np.uint64(bits.size * 8)
    for k in range(BLOOM_K):
        idx = (h1 + np.uint64(k) * h2) % m
        np.bitwise_or.at(bits, (idx // 8).astype(np.int64),
                         (1 << (idx % 8)).astype(np.uint8))


def _test_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    m = np.uint64(bits.size * 8)
    out = np.ones(len(h1), dtype=bool)
    for k in range(BLOOM_K):
        idx = (h1 + np.uint64(k) * h2) % m
        out &= (bits[(idx // 8).astype(np.int64)]
                >> (idx % 8).astype(np.uint8)) & 1 == 1
    return out


SHARD_SCHEMA = StructType([
    StructField("shard_id", IntegerType()),
    StructField("filter_bytes", BinaryType()),
    StructField("n_items", LongType()),
])


def build_bloom_shards(
    seen: DataFrame, n_shards: int, bits_per_key: int = 10,
    expected_per_shard: int | None = None, nbytes: int | None = None,
) -> DataFrame:
    """A4: per-partition shard fragments built in mapInPandas, merged with a
    bitwise-OR groupBy(shard_id).applyInPandas — the DataFrame form of
    treeAggregate(OR). Returns SHARD_SCHEMA rows (one per shard).

    Pass ``nbytes`` for a FIXED shard size (required when fragments from
    different waves are OR-merged incrementally — sizes must agree)."""
    if nbytes is None:
        n = seen.count()
        per_shard = expected_per_shard or max(n // max(n_shards, 1), 1024)
        nbytes = max((per_shard * bits_per_key + 7) // 8, 64)

    shard_col = F.pmod(F.xxhash64("url_canon"), F.lit(n_shards)).cast("int")
    with_shard = seen.select(
        F.col("url_canon"), shard_col.alias("shard_id")
    ).repartition(n_shards, "shard_id")

    def build(pdfs):
        for pdf in pdfs:
            for sid, grp in pdf.groupby("shard_id"):
                bits = np.zeros(nbytes, dtype=np.uint8)
                h1, h2 = _hash2(grp["url_canon"])
                _set_bits(bits, h1, h2)
                yield pd.DataFrame({
                    "shard_id": [int(sid)],
                    "filter_bytes": [bits.tobytes()],
                    "n_items": [len(grp)],
                })

    fragments = with_shard.mapInPandas(build, SHARD_SCHEMA)

    def merge(key, pdf):
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["filter_bytes"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({
            "shard_id": [key[0]],
            "filter_bytes": [acc.tobytes()],
            "n_items": [int(pdf["n_items"].sum())],
        })

    return fragments.groupBy("shard_id").applyInPandas(merge, SHARD_SCHEMA)


def bloom_maybe_seen(
    candidates: DataFrame, shards: list[tuple[int, bytes]], n_shards: int,
    col: str = "url_canon",
) -> DataFrame:
    """Probe candidates against the broadcast shard set; adds boolean
    `_maybe_seen`. shards: collected [(shard_id, filter_bytes)] — broadcast
    once per wave via SparkContext.broadcast."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(
        {int(sid): np.frombuffer(b, dtype=np.uint8) for sid, b in shards}
    )

    @F.pandas_udf(BooleanType())
    def probe(urls: pd.Series, sids: pd.Series) -> pd.Series:
        table = bc.value
        out = np.zeros(len(urls), dtype=bool)
        if not table or len(urls) == 0:
            return pd.Series(out)
        h1, h2 = _hash2(urls)
        sid_arr = sids.to_numpy()
        # probe shard-by-shard so each shard's bit array is touched once,
        # vectorized over all rows routed to it
        for sid in np.unique(sid_arr):
            bits = table.get(int(sid))
            if bits is None:
                continue  # no shard -> nothing seen there -> stays False
            mask = sid_arr == sid
            out[mask] = _test_bits(bits, h1[mask], h2[mask])
        return pd.Series(out)

    # shard routing computed Catalyst-side with the SAME xxhash64 the build
    # used — the one source of truth for shard assignment
    shard_col = F.pmod(F.xxhash64(col), F.lit(n_shards)).cast("int")
    return candidates.withColumn(
        "_maybe_seen", probe(F.col(col), shard_col)
    )


def collect_bloom_fragments(new_urls: DataFrame, n_shards: int,
                            nbytes: int) -> dict[int, "np.ndarray"]:
    """Incremental path: build fixed-size shard fragments from ONLY the
    newly-seen URLs and collect them to the driver, where the crawler
    OR-merges them into its standing shard state (A4 at 10^10 scale: per-wave
    work is O(|new|), never a rescan of the full seen set).

    The merge runs driver-side (no groupBy shuffle): fragments are
    (n_partitions x n_shards) rows of nbytes each — tiny next to the data
    that produced them."""
    shard_col = F.pmod(F.xxhash64("url_canon"), F.lit(n_shards)).cast("int")
    with_shard = new_urls.select(F.col("url_canon"),
                                 shard_col.alias("shard_id"))

    def build(pdfs):
        for pdf in pdfs:
            for sid, grp in pdf.groupby("shard_id"):
                bits = np.zeros(nbytes, dtype=np.uint8)
                h1, h2 = _hash2(grp["url_canon"])
                _set_bits(bits, h1, h2)
                yield pd.DataFrame({
                    "shard_id": [int(sid)],
                    "filter_bytes": [bits.tobytes()],
                    "n_items": [len(grp)],
                })

    out: dict[int, np.ndarray] = {}
    for r in with_shard.mapInPandas(build, SHARD_SCHEMA).collect():
        sid = int(r["shard_id"])
        bits = np.frombuffer(r["filter_bytes"], dtype=np.uint8)
        if sid in out:
            out[sid] = out[sid] | bits
        else:
            out[sid] = bits.copy()
    return out


def merge_fragments(state: dict[int, "np.ndarray"],
                    frags: dict[int, "np.ndarray"]) -> None:
    for sid, bits in frags.items():
        cur = state.get(sid)
        if cur is None:
            state[sid] = bits.copy()
        else:
            cur |= bits


def seen_anti_join(candidates: DataFrame, seen: DataFrame,
                   col: str = "url_canon") -> DataFrame:
    """J1 exact backstop: left_anti against the seen table. At scale the
    candidates side arrives pre-filtered by the Bloom probe."""
    return candidates.join(seen.select(col), on=col, how="left_anti")
