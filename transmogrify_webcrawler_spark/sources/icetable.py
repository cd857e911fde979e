"""Snapshotted multi-table store — Iceberg-semantics fallback (SURVEY.md §7.4).

No Iceberg runtime jar exists in this sandbox and there is no network, so this
thin layer implements the Iceberg semantics the contract actually uses:

- versioned snapshots: manifest JSON listing immutable parquet data dirs
- ATOMIC multi-table wave commit: write all new data dirs, write manifest
  v{n}.json, then os.replace() the CURRENT pointer — readers see either the
  whole wave or none of it (ST1/ST2, BASELINE.json "resumable mid-crawl from
  the last committed frontier snapshot")
- append tables (crawled/links/errors/metrics/seen) accumulate data dirs;
  replace tables (frontier) point at exactly one dir
- bucketed layout: writers repartition by the table's bucket key before the
  parquet write, so a wave's files are hash-bucketed by registered_domain
  (the Iceberg `bucket(N, col)` transform rendered as a repartition)

Call sites are writeTo-shaped so a real Iceberg catalog can be swapped in by
config when jars are available (documented in README).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- pointer ------------------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def current_manifest(self) -> dict | None:
        p = self._current_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            version = f.read().strip()
        with open(os.path.join(self.root, "_snapshots", version)) as f:
            return json.load(f)

    def current_wave(self) -> int:
        m = self.current_manifest()
        return -1 if m is None else m["wave"]

    # -- commit -------------------------------------------------------------
    def commit_wave(
        self,
        wave: int,
        appends: dict[str, DataFrame],
        replaces: dict[str, DataFrame],
        bucket_keys: dict[str, str] | None = None,
        n_buckets: int = 0,
        extra: dict | None = None,
        blobs: dict[str, bytes] | None = None,
        sort_keys: dict[str, list[str]] | None = None,
    ) -> dict:
        """Write every table's new data dir, then atomically publish the
        manifest. Data dirs written before the pointer flip are invisible to
        readers; a crash mid-commit leaves the previous snapshot intact."""
        prev = self.current_manifest() or {"tables": {}}
        tables: dict[str, list[str]] = {
            k: list(v) for k, v in prev["tables"].items()
        }
        bucket_keys = bucket_keys or {}
        import time as _time
        from concurrent.futures import ThreadPoolExecutor
        self.last_write_times: dict[str, float] = {}

        def _write(item):
            name, df = item
            _t0 = _time.time()
            rel = os.path.join("data", name, f"wave={wave:06d}")
            out = os.path.join(self.root, rel)
            key = bucket_keys.get(name)
            writer = df
            if key is not None and n_buckets > 0 and key in df.columns:
                writer = df.repartition(n_buckets, key)
            sk = (sort_keys or {}).get(name)
            if sk:  # Iceberg sortedBy rendered as sortWithinPartitions
                writer = writer.sortWithinPartitions(*sk)
            writer.write.mode("overwrite").parquet(out)
            self.last_write_times[name] = round(_time.time() - _t0, 3)
            return name, rel

        # all writes land before the manifest publishes, so they may run
        # concurrently — Spark schedules jobs from multiple threads fine and
        # per-job latency (not data volume) dominates small-wave commits
        items = list({**appends, **replaces}.items())
        with ThreadPoolExecutor(max_workers=max(len(items), 1)) as ex:
            written = list(ex.map(_write, items))
        for name, rel in written:
            if name in replaces:
                tables[name] = [rel]
            else:
                tables.setdefault(name, []).append(rel)
        blob_paths = dict((self.current_manifest() or {}).get("blobs", {}))
        for name, payload in (blobs or {}).items():
            rel = os.path.join("data", "_blobs", f"{name}.wave{wave:06d}.bin")
            full = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            with open(full + ".tmp", "wb") as f:
                f.write(payload)
            os.replace(full + ".tmp", full)
            blob_paths[name] = rel
        manifest = {"wave": wave, "tables": tables, "blobs": blob_paths,
                    **(extra or {})}
        version = f"v{wave:06d}.json"
        with open(os.path.join(self.root, "_snapshots", version), "w") as f:
            json.dump(manifest, f)
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._current_path())  # the atomic publish
        return manifest

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession, name: str,
             schema: StructType | None = None) -> DataFrame:
        m = self.current_manifest()
        dirs = (m or {"tables": {}})["tables"].get(name, [])
        paths = [os.path.join(self.root, d) for d in dirs]
        if not paths:
            if schema is None:
                raise KeyError(f"table {name} has no snapshot and no schema")
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*paths)

    def read_blob(self, name: str) -> bytes | None:
        m = self.current_manifest()
        rel = (m or {}).get("blobs", {}).get(name)
        if rel is None:
            return None
        with open(os.path.join(self.root, rel), "rb") as f:
            return f.read()

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
