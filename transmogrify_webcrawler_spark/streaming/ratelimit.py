"""Streaming politeness: a per-domain token-bucket admission controller
over the frontier stream (applyInPandasWithState). The batch crawl loop
enforces politeness with a per-wave WindowGroupLimit budget
(operators/frontier.py); a STREAMING frontier needs the stateful twin —
a domain's fetch rate must be capped across micro-batches, with the
bucket level surviving query restarts (GroupState in the streaming
checkpoint).

Determinism contract: refill is BATCH-indexed, not wall-clock — the
bucket gains `refill` tokens per micro-batch (capped at `capacity`), and
candidates within a (domain, batch) admit in `order_col` order. Wall
clock enters only through the trigger interval (refill per trigger ==
sustained rate), so tests and restarts replay identically — the same
reasoning as the batch loop's RNG-free salting.

Deferred rows are EMITTED with admitted=false rather than silently
dropped: the production topology routes them back to the frontier table
(requeue) in the same foreachBatch that sinks admitted rows to the
fetcher — the stream op stays a pure, replayable function of its input.

Scale shape: state is one bigint per domain; groups hash-partition across
executors exactly like the batch politeness salting, and a hot domain
costs O(its batch rows) in one task — the same skew profile as the batch
path, with the same registered-domain grouping upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

BUCKET_STATE_SCHEMA = StructType([StructField("tokens", LongType())])


def token_bucket_admission(stream: DataFrame, domain_col: str = "domain",
                           order_col: str = "url", capacity: int = 4,
                           refill: int = 2) -> DataFrame:
    """(domain, url, admitted) per input row. Buckets start full; each
    subsequent micro-batch refills `refill` tokens up to `capacity`;
    admission is deterministic (order_col ascending) while tokens last."""
    out_schema = StructType([
        StructField("domain", StringType()),
        StructField("url", StringType()),
        StructField("admitted", BooleanType()),
    ])

    def admit(key, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        rows = (pd.concat(chunks, ignore_index=True) if chunks
                else pd.DataFrame({domain_col: [], order_col: []}))
        if state.exists:
            (tokens,) = state.get
            tokens = min(capacity, tokens + refill)
        else:
            tokens = capacity
        rows = rows.sort_values(order_col, kind="mergesort",
                                ignore_index=True)
        k = min(int(tokens), len(rows))
        admitted = [i < k for i in range(len(rows))]
        state.update((tokens - k,))
        yield pd.DataFrame({
            "domain": [key[0]] * len(rows),
            "url": list(rows[order_col]),
            "admitted": admitted,
        })

    return (stream.select(domain_col, order_col)
            .groupBy(domain_col)
            .applyInPandasWithState(
                admit, out_schema, BUCKET_STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
