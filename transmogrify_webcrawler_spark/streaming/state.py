"""Custom stateful streaming operator: cross-batch URL-seen deduplication
via applyInPandasWithState (the brief's custom-stateful-operator surface).

A continuously-arriving capture stream (see ingest.py) must emit each
url_canon at most once across ALL micro-batches and across query restarts.
Spark's dropDuplicates on a stream needs a watermark to bound state and
forgets beyond it; a crawl's seen-set must never forget. This operator keys
state by a SHARD of the URL space (pmod(xxhash64(url), n_shards) — same
routing idea as the batch bloom shards, operators/dedup.py) and keeps the
shard's seen-set in GroupState, so state is partitioned/distributed and a
restart resumes it from the streaming checkpoint.

Two state representations, chosen by ``state_mode``:

- ``"exact"`` (default, the pinned small-scale semantics): the exact key
  list per shard. Zero false positives, state grows O(#distinct keys) —
  right while the keyspace fits, and what the cross-restart tests pin.
- ``"bloom"`` (the 10^10-URL design point): a FIXED-SIZE Bloom bitmap per
  shard (``bloom_bytes``), reusing operators/dedup.py's exact bit math
  (JVM xxhash64 double-hashing computed in Catalyst BEFORE the state op,
  numpy bit ops inside it). State bytes are CONSTANT regardless of how
  many distinct keys stream through (tested). Zero false negatives by the
  dedup.py construction, so a duplicate is NEVER emitted; a genuinely-new
  key can be suppressed with the filter's false-positive probability —
  the standard crawl trade (size ``bloom_bytes`` for ~10+ bits/key at the
  shard's design cardinality and the rate is ~1e-4).

Why not "bounded AND exact"? It is information-theoretically impossible:
exact first-occurrence over an unbounded keyspace needs Omega(n) state (a
re-occurring key always bloom-tests positive, but so does a fresh key that
collides — distinguishing them requires remembering the inserted keys,
which is exactly the unbounded exact set; an "overflow set of
bloom-positives at insert time" cannot break the ambiguity because keys
inserted on the bloom-negative path are not in it). The EXACT-at-scale
architecture is therefore the batch path's: bloom prefilter in state +
periodic exact reconciliation against the durable seen TABLE
(operators/dedup.py bloom_probe + seen_anti_join inside foreachBatch),
where the exact set lives in storage, not in streaming state.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from ..operators.dedup import _np_hashes, _set_bits, _test_bits

EXACT_STATE_SCHEMA = StructType([
    StructField("seen_keys", ArrayType(StringType())),
])
BLOOM_STATE_SCHEMA = StructType([
    StructField("bloom_bits", BinaryType()),
    StructField("n_items", LongType()),
])


def stateful_seen_dedup(stream: DataFrame, key_col: str = "url_canon",
                        n_shards: int = 32, state_mode: str = "exact",
                        bloom_bytes: int = 1 << 17) -> DataFrame:
    """First occurrence of each key wins, forever (across micro-batches and
    restarts). Emits the input rows minus duplicates, plus the shard id.
    See the module docstring for the exact-vs-bloom state trade.

    Works on a streaming DataFrame; the same call on a batch DataFrame is
    rejected by Spark (applyInPandasWithState is streaming-only), which is
    the correct contract — batch dedup is operators/dedup.py's job."""
    out_fields = [StructField("shard_id", IntegerType())] + [
        f for f in stream.schema.fields
    ]
    out_schema = StructType(out_fields)
    in_cols = [f.name for f in stream.schema.fields]

    def dedup_exact(key, pdfs: Iterator[pd.DataFrame],
                    state) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        n0 = len(seen)
        for pdf in pdfs:
            keep = []
            for k in pdf[key_col]:
                if k in seen:
                    keep.append(False)
                else:
                    seen.add(k)
                    keep.append(True)
            out = pdf.loc[keep, in_cols].copy()
            if len(out):
                out.insert(0, "shard_id", key[0])
                yield out
        if len(seen) != n0:  # only serialize state when it actually grew
            state.update((list(seen),))

    def dedup_bloom(key, pdfs: Iterator[pd.DataFrame],
                    state) -> Iterator[pd.DataFrame]:
        if state.exists:
            bits = np.frombuffer(state.get[0], dtype=np.uint8).copy()
            n_items = int(state.get[1])
        else:
            bits = np.zeros(bloom_bytes, dtype=np.uint8)
            n_items = 0
        changed = False
        for pdf in pdfs:
            h1, h2 = _np_hashes(pdf)
            # vectorized: fresh = negative vs the PRIOR bits (an intra-batch
            # later duplicate of a fresh key is killed by duplicated(), not
            # by a premature bit-set — strictly fewer false suppressions
            # than a sequential insert loop)
            fresh = ~_test_bits(bits, h1, h2)
            first_in_batch = ~pdf[key_col].duplicated().to_numpy()
            keep = fresh & first_in_batch
            if keep.any():
                _set_bits(bits, h1[keep], h2[keep])
                n_items += int(keep.sum())
                changed = True
                out = pdf.loc[keep, in_cols].copy()
                out.insert(0, "shard_id", key[0])
                yield out
        if changed:
            state.update((bits.tobytes(), n_items))

    sharded = stream.withColumn(
        "_shard", F.pmod(F.xxhash64(key_col), F.lit(n_shards)).cast("int"))
    if state_mode == "bloom":
        # hashes computed JVM-side (same exprs as the batch bloom — the
        # zero-false-negative invariant rides on build/probe sharing them)
        sharded = (sharded
                   .withColumn("_h1", F.xxhash64(key_col))
                   .withColumn("_h2", F.xxhash64(F.lit(1), F.col(key_col))))
        fn, st_schema = dedup_bloom, BLOOM_STATE_SCHEMA
    elif state_mode == "exact":
        fn, st_schema = dedup_exact, EXACT_STATE_SCHEMA
    else:
        raise ValueError(f"unknown state_mode {state_mode!r}")
    return (
        sharded.groupBy("_shard")
        .applyInPandasWithState(
            fn, out_schema, st_schema,
            outputMode="append", timeoutConf="NoTimeout")
    )
