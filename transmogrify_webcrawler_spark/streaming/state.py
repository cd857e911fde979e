"""Custom stateful streaming operator: cross-batch URL-seen deduplication
via applyInPandasWithState (the brief's custom-stateful-operator surface).

A continuously-arriving capture stream (see ingest.py) must emit each
url_canon exactly once across ALL micro-batches and across query restarts.
Spark's dropDuplicates on a stream needs a watermark to bound state and
forgets beyond it; a crawl's seen-set must never forget. This operator keys
state by a SHARD of the URL space (pmod(xxhash64(url), n_shards) — same
routing idea as the batch bloom shards, operators/dedup.py) and keeps the
shard's seen set in GroupState, so state is partitioned/distributed and a
restart resumes it from the streaming checkpoint.

State representation here is the exact key set per shard (testable, zero
false positives). At the 10^10-URL design point the same operator shape
swaps the array state for a fixed-size Bloom bitmap per shard (the
operators/dedup.py bit math applies unchanged) — GroupState holds binary
equally well; the exact set is the pinned semantics for this repo's scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

STATE_SCHEMA = StructType([
    StructField("seen_keys", ArrayType(StringType())),
])


def stateful_seen_dedup(stream: DataFrame, key_col: str = "url_canon",
                        n_shards: int = 32) -> DataFrame:
    """First occurrence of each key wins, forever (across micro-batches and
    restarts). Emits the input rows minus duplicates, plus the shard id.

    Works on a streaming DataFrame; the same call on a batch DataFrame is
    rejected by Spark (applyInPandasWithState is streaming-only), which is
    the correct contract — batch dedup is operators/dedup.py's job."""
    out_fields = [StructField("shard_id", IntegerType())] + [
        f for f in stream.schema.fields
    ]
    out_schema = StructType(out_fields)
    in_cols = [f.name for f in stream.schema.fields]

    def dedup(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
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
        state.update((sorted(seen),))

    sharded = stream.withColumn(
        "_shard", F.pmod(F.xxhash64(key_col), F.lit(n_shards)).cast("int"))
    return (
        sharded.groupBy("_shard")
        .applyInPandasWithState(
            dedup, out_schema, STATE_SCHEMA,
            outputMode="append", timeoutConf="NoTimeout")
    )
