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


def _write_empty_parquet(out_dir: str, schema: StructType) -> None:
    """Schema-bearing empty table dir without a Spark job (grouped commits:
    a table with zero rows this wave still needs a readable snapshot dir)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    a_schema = to_arrow_schema(schema)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in a_schema], schema=a_schema),
        os.path.join(out_dir, "part-empty.parquet"))
    open(os.path.join(out_dir, "_SUCCESS"), "w").close()


def _footer_row_count(data_dir: str) -> int:
    """Row count from parquet footers — metadata only, no Spark job (the
    analogue of Iceberg's per-snapshot record counts)."""
    import pyarrow.parquet as pq

    total = 0
    for fn in os.listdir(data_dir):
        if fn.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(data_dir, fn)).metadata.num_rows
    return total


class SnapshotStore:
    # lz4_raw over the snappy session default: commit IO is ~60% of crawl
    # wall (DEBUG breakdown) and parquet encode CPU dominates it; same-
    # session A/B (ENGINE shape, sf0.1, median-of-3, BENCH/BASELINE.md
    # round 5) measured 60.9 -> 53.5 s crawl wall. Set explicitly on the
    # store's writers so the shipped engine and the bench measure the same
    # thing regardless of session conf.
    def __init__(self, root: str, compression: str = "lz4_raw"):
        self.root = root
        self.compression = compression
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
        extra_fn=None,
    ) -> dict:
        """Write every table's new data dir, then atomically publish the
        manifest. Data dirs written before the pointer flip are invisible to
        readers; a crash mid-commit leaves the previous snapshot intact.

        Every write records its row count from the freshly-written parquet
        FOOTERS (driver-side metadata read, zero Spark jobs) — the counts
        land in manifest["counts"], exactly what a real Iceberg snapshot
        carries in its manifest files. ``extra_fn(counts) -> dict`` lets the
        caller derive manifest fields (e.g. a running crawled_count) from
        them post-write.

        SKINNY APPENDS ARE GROUPED INTO ONE SPARK JOB: every append table
        without a bucket key joins a schema-harmonized union written once
        with partitionBy('_table'); the per-table subdirectories are then
        renamed (same-filesystem, driver-side, pre-publish — atomicity
        unchanged) into the normal data/<name>/wave=N layout. Measured
        motivation: per-JOB scheduling latency, not data volume, dominated
        the wave commit (~6 tiny jobs x fixed cost was the 8->32 scaling
        floor). Grouped files carry the union schema with nulls in foreign
        columns; the manifest records each table's true column list and
        read() projects it, so readers are unaffected."""
        prev = self.current_manifest() or {"tables": {}}
        tables: dict[str, list[str]] = {
            k: list(v) for k, v in prev["tables"].items()
        }
        bucket_keys = bucket_keys or {}
        import time as _time
        from concurrent.futures import ThreadPoolExecutor
        self.last_write_times: dict[str, float] = {}
        self.last_write_counts: dict[str, int] = {}

        # -- split appends: groupable (skinny, unbucketed) vs solo ----------
        groupable: dict[str, DataFrame] = {}
        col_types: dict = {}  # column name -> Spark DataType (harmonized)
        for name, df in appends.items():
            if name in bucket_keys or (sort_keys or {}).get(name):
                continue
            if any(col_types.get(f.name, f.dataType) != f.dataType
                   for f in df.schema.fields):
                continue  # column-name/type conflict: write solo
            for f in df.schema.fields:
                col_types.setdefault(f.name, f.dataType)
            groupable[name] = df
        if len(groupable) < 2:
            groupable = {}

        def _write(item):
            name, df = item
            _t0 = _time.time()
            rel = os.path.join("data", name, f"wave={wave:06d}")
            out = os.path.join(self.root, rel)
            writer = df
            key = bucket_keys.get(name)
            if key is not None and n_buckets > 0 and key in df.columns:
                writer = writer.repartition(n_buckets, key)
            sk = (sort_keys or {}).get(name)
            if sk:  # Iceberg sortedBy rendered as sortWithinPartitions
                writer = writer.sortWithinPartitions(*sk)
            writer.write.mode("overwrite") \
                .option("compression", self.compression).parquet(out)
            self.last_write_counts[name] = _footer_row_count(out)
            self.last_write_times[name] = round(_time.time() - _t0, 3)
            return [(name, rel)]

        def _write_grouped(group: dict[str, DataFrame]):
            _t0 = _time.time()
            gout = os.path.join(self.root, "data", "_grouped",
                                f"wave={wave:06d}")
            union = None
            for name, df in group.items():
                harmonized = df.select(*[
                    (F.col(c) if c in df.columns
                     else F.lit(None).cast(t)).alias(c)
                    for c, t in col_types.items()
                ]).withColumn("_table", F.lit(name))
                union = harmonized if union is None \
                    else union.unionByName(harmonized)
            union.write.mode("overwrite") \
                .option("compression", self.compression) \
                .partitionBy("_table").parquet(gout)
            out_rels = []
            for name, df in group.items():
                rel = os.path.join("data", name, f"wave={wave:06d}")
                final = os.path.join(self.root, rel)
                os.makedirs(os.path.dirname(final), exist_ok=True)
                src = os.path.join(gout, f"_table={name}")
                if os.path.exists(src):
                    if os.path.exists(final):
                        shutil.rmtree(final)
                    os.replace(src, final)
                else:  # zero rows this wave: schema-bearing empty dir.
                    # Clear any stale dir first (a retried torn commit may
                    # have left data files from the failed attempt — they
                    # would survive next to the empty marker and leak into
                    # _footer_row_count and the published snapshot).
                    shutil.rmtree(final, ignore_errors=True)
                    _write_empty_parquet(final, df.schema)
                self.last_write_counts[name] = _footer_row_count(final)
                out_rels.append((name, rel))
            shutil.rmtree(gout, ignore_errors=True)
            try:  # drop the staging parent too once empty
                os.rmdir(os.path.dirname(gout))
            except OSError:
                pass
            self.last_write_times["_grouped"] = round(_time.time() - _t0, 3)
            return out_rels

        # all writes land before the manifest publishes, so they may run
        # concurrently — Spark schedules jobs from multiple threads fine and
        # per-job latency (not data volume) dominates small-wave commits
        solo = {k: v for k, v in {**appends, **replaces}.items()
                if k not in groupable}
        jobs = [lambda item=item: _write(item) for item in solo.items()]
        if groupable:
            jobs.append(lambda: _write_grouped(groupable))
        with ThreadPoolExecutor(max_workers=max(len(jobs), 1)) as ex:
            written = [pair for result in ex.map(lambda j: j(), jobs)
                       for pair in result]
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
        counts = dict(self.last_write_counts)
        table_columns = dict(prev.get("table_columns", {}))
        for name, df in {**appends, **replaces}.items():
            table_columns[name] = list(df.columns)
        carried = {k: v for k, v in prev.items()
                   if k not in ("wave", "tables", "blobs", "counts",
                                "table_columns")}
        manifest = {**carried, "wave": wave, "tables": tables,
                    "blobs": blob_paths, "counts": counts,
                    "table_columns": table_columns, **(extra or {}),
                    **(extra_fn(counts) if extra_fn else {})}
        version = f"v{wave:06d}.json"
        with open(os.path.join(self.root, "_snapshots", version), "w") as f:
            json.dump(manifest, f)
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._current_path())  # the atomic publish
        return manifest

    # -- writeTo facade -------------------------------------------------------
    def writeTo(self, name: str):  # noqa: N802 — mirrors Spark's API casing
        """Iceberg DataFrameWriterV2-shaped seam: ``store.writeTo(t).append(df)``
        / ``.createOrReplace(df)`` commit a single-table snapshot, exactly the
        call shape ``df.writeTo("catalog.t").append()`` has against a real
        Iceberg catalog — swapping one in is a config change, not a rewrite
        (SURVEY.md §7.4). Each call publishes one snapshot (wave auto-bumped)."""
        store = self

        class _WriterV2:
            def append(self, df: DataFrame) -> dict:
                return store.commit_wave(store.current_wave() + 1,
                                         appends={name: df}, replaces={})

            def createOrReplace(self, df: DataFrame) -> dict:
                return store.commit_wave(store.current_wave() + 1,
                                         appends={}, replaces={name: df})

        return _WriterV2()

    # -- read ---------------------------------------------------------------
    def manifest_at(self, wave: int) -> dict | None:
        """The published manifest for a specific wave (None if that wave
        never published). Snapshots are immutable once the pointer flip has
        happened, so this is Iceberg-style time travel: any historical wave
        remains readable with full consistency while new waves commit."""
        p = os.path.join(self.root, "_snapshots", f"v{wave:06d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def read(self, spark: SparkSession, name: str,
             schema: StructType | None = None,
             as_of_wave: int | None = None) -> DataFrame:
        """Read a table at the CURRENT snapshot, or — time travel — at the
        snapshot a given wave published (`as_of_wave`)."""
        if as_of_wave is not None:
            m = self.manifest_at(as_of_wave)
            if m is None:
                raise KeyError(f"no snapshot published at wave {as_of_wave}")
        else:
            m = self.current_manifest()
        dirs = (m or {"tables": {}})["tables"].get(name, [])
        paths = [os.path.join(self.root, d) for d in dirs]
        if not paths:
            if schema is None:
                raise KeyError(f"table {name} has no snapshot and no schema")
            return spark.createDataFrame([], schema)
        reader = spark.read
        if schema is not None:  # skip footer-based schema inference — the
            reader = reader.schema(schema)  # manifest IS the schema authority
            return reader.parquet(*paths)
        df = reader.parquet(*paths)
        cols = (m or {}).get("table_columns", {}).get(name)
        if cols:  # grouped snapshot files carry the union schema — project
            df = df.select(*cols)  # back to the table's true column list
        return df

    def read_changes(self, spark: SparkSession, name: str,
                     from_wave: int, to_wave: int) -> DataFrame:
        """Incremental read: the rows an append-only table gained AFTER
        `from_wave`'s snapshot, up to and including `to_wave`'s — the data
        dirs present in the later manifest but not the earlier one. This is
        the CDC primitive a downstream pipeline tails instead of rescanning
        the table (at 100 TB, reading only the new wave dirs is the
        difference between a streaming consumer and a full-table job).
        Raises on replace-style tables (their dirs are rewritten, not
        appended — a diff would be meaningless)."""
        m_from = self.manifest_at(from_wave)
        m_to = self.manifest_at(to_wave)
        if m_from is None or m_to is None:
            raise KeyError(f"missing snapshot: {from_wave} or {to_wave}")
        old = set(m_from["tables"].get(name, []))
        new_dirs = [d for d in m_to["tables"].get(name, []) if d not in old]
        if not set(m_from["tables"].get(name, [])) <= \
                set(m_to["tables"].get(name, [])):
            raise ValueError(
                f"table {name} was replaced between waves {from_wave} and "
                f"{to_wave}; incremental diff is only defined for appends")
        if not new_dirs:
            return self.read(spark, name, as_of_wave=to_wave).limit(0)
        df = spark.read.parquet(
            *[os.path.join(self.root, d) for d in new_dirs])
        cols = m_to.get("table_columns", {}).get(name)
        if cols:
            df = df.select(*cols)
        return df

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg's expire_snapshots + remove_orphan_files for this
        fallback store: drop all but the newest `keep_last` published
        manifests (the CURRENT pointer always survives — it names the max
        wave) and delete every data dir / blob file no retained manifest
        references. Time travel stays valid inside the retention window;
        outside it, `read(as_of_wave=...)` raises. Bounds the store's disk
        at long crawl lengths — without it every wave's dirs live forever.

        Safety: only dirs/blobs whose wave number is <= the CURRENT wave
        are eligible — a concurrent commit's freshly-written, not-yet-
        published dirs (wave N+1) are never treated as orphans, preserving
        write-all-then-flip atomicity.
        """
        snap_dir = os.path.join(self.root, "_snapshots")
        snaps = sorted(f for f in os.listdir(snap_dir)
                       if f.startswith("v") and f.endswith(".json"))
        keep = set(snaps[-max(keep_last, 1):])
        current = None
        if os.path.exists(self._current_path()):
            with open(self._current_path()) as f:
                current = f.read().strip()
            keep.add(current)
        current_wave = self.current_wave()
        referenced_dirs: set[str] = set()
        referenced_blobs: set[str] = set()
        for version in keep:
            with open(os.path.join(snap_dir, version)) as f:
                m = json.load(f)
            for rels in m.get("tables", {}).values():
                referenced_dirs.update(rels)
            referenced_blobs.update(m.get("blobs", {}).values())
        expired = [s for s in snaps if s not in keep]
        for s in expired:
            os.remove(os.path.join(snap_dir, s))

        def _wave_of(entry: str) -> int | None:
            if entry.startswith("wave="):
                return int(entry.split("=", 1)[1])
            if ".wave" in entry and entry.endswith(".bin"):
                return int(entry.rsplit(".wave", 1)[1][:-4])
            return None

        removed_dirs = removed_blobs = 0
        data_root = os.path.join(self.root, "data")
        for name in os.listdir(data_root):
            tdir = os.path.join(data_root, name)
            if not os.path.isdir(tdir):
                continue
            for entry in os.listdir(tdir):
                rel = os.path.join("data", name, entry)
                w = _wave_of(entry)
                if w is None or w > current_wave:
                    continue  # unknown layout or in-flight commit: keep
                if name == "_blobs":
                    if rel not in referenced_blobs:
                        os.remove(os.path.join(tdir, entry))
                        removed_blobs += 1
                elif rel not in referenced_dirs:
                    shutil.rmtree(os.path.join(tdir, entry),
                                  ignore_errors=True)
                    removed_dirs += 1
        return {"expired_manifests": len(expired),
                "removed_dirs": removed_dirs,
                "removed_blobs": removed_blobs}

    def read_blob(self, name: str) -> bytes | None:
        m = self.current_manifest()
        rel = (m or {}).get("blobs", {}).get(name)
        if rel is None:
            return None
        with open(os.path.join(self.root, rel), "rb") as f:
            return f.read()

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
