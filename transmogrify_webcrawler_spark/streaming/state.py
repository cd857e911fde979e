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
    ArrayType, BinaryType, BooleanType, IntegerType, LongType, StringType,
    StructField, StructType,
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
                        bloom_bytes: int = 1 << 17,
                        emit_maybe_dups: bool = False) -> DataFrame:
    """First occurrence of each key wins, forever (across micro-batches and
    restarts). Emits the input rows minus duplicates, plus the shard id.
    See the module docstring for the exact-vs-bloom state trade.

    ``emit_maybe_dups`` (bloom mode only): ALSO forward the bloom-POSITIVE
    suppressed rows, flagged `_maybe_dup=true` (kept rows carry false), one
    per key per batch. This is the hook the exact-at-scale composite
    (`reconciled_seen_dedup`) consumes: a bloom-positive is either a true
    duplicate or a false-positive fresh key, and only an exact check
    against the durable seen TABLE can tell them apart — the stream op
    itself cannot (see module docstring), so it hands them downstream
    instead of silently dropping them.

    Works on a streaming DataFrame; the same call on a batch DataFrame is
    rejected by Spark (applyInPandasWithState is streaming-only), which is
    the correct contract — batch dedup is operators/dedup.py's job."""
    if emit_maybe_dups and state_mode != "bloom":
        raise ValueError("emit_maybe_dups requires state_mode='bloom' "
                         "(exact state has no maybe-dups by definition)")
    out_fields = [StructField("shard_id", IntegerType())] + [
        f for f in stream.schema.fields
    ]
    if emit_maybe_dups:
        out_fields.append(StructField("_maybe_dup", BooleanType()))
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
                if emit_maybe_dups:
                    out["_maybe_dup"] = False
                yield out
            if emit_maybe_dups:
                maybe = (~fresh) & first_in_batch
                if maybe.any():
                    out = pdf.loc[maybe, in_cols].copy()
                    out.insert(0, "shard_id", key[0])
                    out["_maybe_dup"] = True
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


def reconciled_seen_dedup(stream: DataFrame, seen_table_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          key_col: str = "url_canon", n_shards: int = 32,
                          bloom_bytes: int = 1 << 17,
                          trigger_once: bool = False):
    """EXACT first-occurrence dedup with BOUNDED streaming state — the
    composite the module docstring pins as the 10^10-URL architecture:
    bloom bitmaps in stream state (constant bytes, zero false negatives)
    plus a per-batch exact reconciliation of the bloom-POSITIVE rows
    against the durable seen TABLE (parquet — the exact set lives in
    storage, not in state).

    Per micro-batch (foreachBatch):
    - `_maybe_dup=false` rows were bloom-negative at arrival: provably
      first-occurrence, emitted directly.
    - `_maybe_dup=true` rows are either true duplicates or false-positive
      collisions; an exact left_anti against (seen table ∪ this batch's
      fresh keys) recovers exactly the collided fresh keys — each emitted
      ONCE, because the reconciliation also appends every emitted key to
      the seen table, so a later occurrence (still bloom-positive) finds
      it there and dies in the anti-join. The union with the batch's own
      fresh keys closes the intra-batch race (a key emitted fresh earlier
      in the same batch is bloom-positive by the time a later chunk
      re-sees it, before the table append happens).

    Output rows land in `out_dir` with a batch_id column; the seen table
    accumulates one skinny key row per emission. Failure replay of an
    uncommitted batch can re-append (the batch_id column is the
    downstream dedup handle — same exactly-once story as ingest.py); the
    seen table is a SET under anti-join semantics, so replayed key rows
    are harmless."""
    import os

    flagged = stateful_seen_dedup(
        stream, key_col=key_col, n_shards=n_shards, state_mode="bloom",
        bloom_bytes=bloom_bytes, emit_maybe_dups=True)
    data_cols = [f.name for f in flagged.schema.fields
                 if f.name != "_maybe_dup"]

    def reconcile(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            fresh = batch_df.filter(~F.col("_maybe_dup")).select(data_cols)
            maybe = (batch_df.filter(F.col("_maybe_dup"))
                     .select(data_cols).dropDuplicates([key_col]))
            known = fresh.select(key_col)
            if os.path.isdir(seen_table_dir):
                known = known.unionByName(
                    spark.read.parquet(seen_table_dir).select(key_col))
            recovered = maybe.join(known, on=key_col, how="left_anti")
            emitted = fresh.unionByName(recovered).persist()
            (emitted.withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(out_dir))
            (emitted.select(key_col)
             .write.mode("append").parquet(seen_table_dir))
            emitted.unpersist()
        finally:
            batch_df.unpersist()

    writer = (flagged.writeStream.outputMode("append")
              .foreachBatch(reconcile)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
