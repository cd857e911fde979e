"""CDC tail consumer over the snapshot store: a downstream pipeline follows
an append table wave-by-wave instead of rescanning it.

Delivery model — the same guarantee family as foreachBatch exactly-once:
`poll()` is at-least-once (a crash before `commit()` re-delivers the same
wave range), the offset commit is atomic (tmp + rename), and ranges are
contiguous (`from_wave` of the next poll == the committed `to_wave`), so an
idempotent or transactional sink gets exactly-once end-to-end.

At 100 TB this is the difference between a consumer that reads only each
wave's new data dirs (store.read_changes — file-list metadata plus the new
parquet) and a full-table job per sync. Interplay with snapshot expiry: if
the committed offset's manifest has been expired (retention window passed),
poll resyncs with a full snapshot read and reports it — the consumer never
silently loses rows, it over-delivers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.icetable import SnapshotStore


class SnapshotTail:
    def __init__(self, store: SnapshotStore, table: str, offsets_path: str):
        self.store = store
        self.table = table
        self.offsets_path = offsets_path

    def committed_wave(self) -> int | None:
        if not os.path.exists(self.offsets_path):
            return None
        with open(self.offsets_path) as f:
            return json.load(f)["wave"]

    def poll(self, spark: SparkSession):
        """(df, to_wave, resync) — rows appended after the committed offset
        up to the CURRENT snapshot, or (None, committed, False) when there
        is nothing new. resync=True means the offset's manifest was expired
        and df is a FULL snapshot read (over-delivery, never loss)."""
        current = self.store.current_wave()
        offset = self.committed_wave()
        if current < 0 or (offset is not None and current <= offset):
            return None, offset, False
        if offset is None:
            return (self.store.read(spark, self.table, as_of_wave=current),
                    current, False)
        try:
            return (self.store.read_changes(
                spark, self.table, offset, current), current, False)
        except KeyError:  # offset manifest expired out of the window
            return (self.store.read(spark, self.table, as_of_wave=current),
                    current, True)

    def commit(self, wave: int) -> None:
        tmp = self.offsets_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"wave": wave, "table": self.table}, f)
        os.replace(tmp, self.offsets_path)
