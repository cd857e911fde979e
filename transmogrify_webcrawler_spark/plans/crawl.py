"""The distributed crawl: checkpointed micro-batch waves over snapshot tables.

This is the Spark rendering of the oracle crawler's pinned wave algorithm
(oracle/crawler.py — [UP webchecker.py Checker.run] semantics). One wave =

    frontier snapshot ──(priority, salted politeness budget, global top-k)──▶ selected
    selected ──(⟕ broadcast robots, ⟕ pages on url_canon)──▶ fetched+status
    fetched ──(Arrow batch UDFs: sniff, extract_text, extract_links)──▶ emitted
    links ──(scope/ignore Catalyst filters, per-wave dedup)──▶ candidates
    candidates ──(Bloom-shard prefilter + exact left_anti vs seen)──▶ new frontier
    atomic multi-table commit {crawled, links, ext_links, errors, seen,
                               metrics, frontier'}  — resumable (ST1/ST2)

Everything except the five pinned pandas UDFs is Catalyst: filters are Column
exprs (pushdown-able), the fat `html BINARY` column is pruned before every
shuffle, robots is a broadcast join, the hot-domain budget is salted, the
global top-k is TakeOrderedAndProject, and the candidate dedup is a Bloom
prefilter + anti-join (10^10-scale story in operators/dedup.py).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from ..oracle.crawler import DEFAULT_AGENT
from ..oracle.extract import _TYPE_MAP
from ..functions.udfs import (
    canonicalize_udf, extract_links_udf, extract_text_udf,
    registered_domain_udf, robots_allowed_udf, sniff_mimetype_udf,
    url_to_path_udf,
)
from ..operators.frontier import (
    assign_sortorder, politeness_budget, wave_topk, with_priority,
)
from ..operators.dedup import (
    bloom_maybe_seen, build_bloom_shards, collect_bloom_fragments,
    merge_fragments, seen_anti_join,
)
from ..sources.icetable import SnapshotStore
from ..shipping import ship_package

FRONTIER_SCHEMA = StructType([
    StructField("url_canon", StringType()),
    StructField("depth", IntegerType()),
    StructField("n_refs", LongType()),
    # carried in the table so politeness never recomputes it and the
    # materialized frontier buckets by it (O1: sorted, bucketed frontier)
    StructField("registered_domain", StringType()),
])
SEEN_SCHEMA = StructType([
    StructField("url_canon", StringType()),
    StructField("wave", IntegerType()),
])


@dataclass
class SparkCrawlConfig:
    wave_size: int = 1000
    per_domain_budget: int = 100
    max_pages: int = 10**9
    maxsize: int = 1 << 20
    max_waves: int = 100
    ignore: tuple[str, ...] = ()
    roots: tuple[str, ...] = ()
    agent: str = DEFAULT_AGENT
    n_salts: int = 8
    use_bloom: bool = True
    n_bloom_shards: int = 32
    # fixed shard size so incremental OR-merges line up. 128 KiB/shard x 32
    # shards = 4 MiB total = ~10 bits/key for ~3.4M URLs. At the 10^10
    # design point: n_bloom_shards=1024, shard_bytes=12<<20 (~12 MiB/shard,
    # 12.5 GB total, fpp~1% at k=7) — per-executor probe still touches only
    # the shards its candidates hash to.
    bloom_shard_bytes: int = 1 << 17
    n_buckets: int = 16  # bucket(registered_domain) for table layout
    arrow_batch: int = 2048  # html is fat: keep Arrow batches small
    # corpus caching strategy: "full" persists the prepared corpus (right for
    # corpora that fit executor storage); "skinny" persists only the dedup
    # winners (url_canon, warc_ts, url) and re-scans the corpus parquet each
    # wave — the 100 TB shape, where the fetch join is a fresh parallel scan
    # (pure scalable work) and nothing body-sized is ever pinned in memory
    cache_corpus: str = "full"
    # fetch strategy:
    # - "per-wave": join each wave's frontier against the raw corpus and
    #   extract only that wave's pages. Lazy — right when the crawl will
    #   visit a small fraction of the corpus.
    # - "precompute": ONE extraction pass over the whole corpus up front
    #   (embarrassingly parallel CPU) writing an extracted table; waves then
    #   join against it with the fat text column COLUMN-PRUNED out of every
    #   scan, and extracted_text is attached by a single join at finalize.
    #   Right when the crawl visits most of the corpus (Common-Crawl-style):
    #   per-wave work stops decoding terabytes of body bytes it won't emit.
    fetch_mode: str = "per-wave"


def content_type_expr(mimetype):
    """T2 typerecognitor as a Catalyst CASE, generated FROM the oracle's
    pinned map so the two cannot diverge."""
    expr = F.when(mimetype.startswith("image/"), F.lit("Image"))
    for mt, ct in _TYPE_MAP.items():
        expr = expr.when(mimetype == mt, F.lit(ct))
    return expr.otherwise(F.lit("File"))


def site_url_expr(url, roots: tuple[str, ...]):
    """First matching root in sorted order (pinned, oracle._site_of)."""
    expr = None
    for r in sorted(roots):
        c = F.when(url.startswith(r), F.lit(r))
        expr = c if expr is None else expr.when(url.startswith(r), F.lit(r))
    host = F.concat(F.split(url, "/", 4)[0], F.lit("//"),
                    F.split(url, "/", 4)[2], F.lit("/"))
    return expr.otherwise(host) if expr is not None else host


class SparkCrawler:
    """Drives checkpointed waves against a SnapshotStore. Resumable: a fresh
    instance pointed at the same store continues from the last committed
    wave (BASELINE.json north_rule)."""

    def __init__(self, spark: SparkSession, store_path: str,
                 cfg: SparkCrawlConfig):
        self.spark = spark
        self.cfg = cfg
        self.store = SnapshotStore(store_path)
        self.timings: list[dict] = []  # per-wave step wall times (lineage)
        ship_package(spark)  # executors need the oracle inside the UDFs
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(cfg.arrow_batch))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        # frontier-state tables are tiny relative to shuffle.partitions —
        # let AQE coalesce aggressively instead of keeping parallelism-many
        # micro-tasks per stage (dominant fixed cost per wave otherwise)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        # cached plans freeze their output partitioning unless this is on —
        # without it every stage over a persisted state table runs
        # shuffle.partitions-many micro-tasks
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true")
        self._bloom: dict[int, "object"] | None = None  # sid -> np.uint8[]

    @contextmanager
    def _timed(self, wave: int, step: str):
        t0 = time.time()
        yield
        self.timings.append(
            dict(wave=wave, step=step, sec=round(time.time() - t0, 3)))

    # -- corpus prep ---------------------------------------------------------
    def prepare_pages(self, pages: DataFrame) -> DataFrame:
        """Canonicalize + 'latest capture wins' dedup (max (warc_ts, url) per
        url_canon).

        Scale-critical shape: the winner is chosen on SKINNY columns
        (url_canon, warc_ts, url) via a map-side-combinable max(struct(...)),
        then joined back — the fat `html BINARY` column never enters a
        shuffle. The window-function alternative would repartition the entire
        corpus body-bytes (terabytes at the design point) just to pick
        winners."""
        canon = pages.select("url", "warc_ts", "html") \
            .withColumn("url_canon", canonicalize_udf("url"))
        winners = (
            canon.select("url_canon", "warc_ts", "url")
            .groupBy("url_canon")
            .agg(F.max(F.struct("warc_ts", "url")).alias("_w"))
            .select("url_canon", F.col("_w.warc_ts").alias("warc_ts"),
                    F.col("_w.url").alias("url"))
        )
        if self.cfg.cache_corpus == "skinny":
            winners = winners.persist()  # the only thing pinned: no bodies
        return canon.join(winners, ["url_canon", "warc_ts", "url"])

    def robots_table(self, pages_prepared: DataFrame) -> DataFrame:
        """S6: robots universe = pages rows at path /robots.txt."""
        return (
            pages_prepared
            .filter(F.parse_url("url_canon", F.lit("PATH")) == "/robots.txt")
            .select(
                registered_domain_udf("url_canon").alias("registered_domain"),
                F.decode("html", "UTF-8").alias("robots_txt"),
            )
        )

    # -- bootstrap -----------------------------------------------------------
    def bootstrap(self, seeds: list[str],
                  robots_store: DataFrame | None = None) -> None:
        """S5: seeds -> frontier snapshot v0, depth=0; seeds enter seen."""
        from ..oracle.urlnorm import canonicalize as _canon
        from ..oracle.urlnorm import registered_domain as _regdom

        spark = self.spark
        seeds_c = sorted({_canon(u) for u in seeds})
        frontier = spark.createDataFrame(
            [(u, 0, 0, _regdom(u)) for u in seeds_c], FRONTIER_SCHEMA
        )
        seen = spark.createDataFrame([(u, -1) for u in seeds_c], SEEN_SCHEMA)
        appends = {"seen": seen}
        if robots_store is not None:
            appends["robots"] = robots_store
        self.store.commit_wave(
            -1, appends=appends, replaces={"frontier": frontier},
            extra={"crawled_count": 0, "roots": list(self.cfg.roots) or sorted(
                {u.split("://", 1)[0] + "://" + u.split("://", 1)[1].split("/", 1)[0] + "/"
                 for u in seeds_c}
            )},
        )

    # -- one wave ------------------------------------------------------------
    def run_wave(self, wave: int, pages_prepared: DataFrame,
                 robots: DataFrame, roots: tuple[str, ...],
                 crawled_count: int) -> int:
        cfg, spark = self.cfg, self.spark
        frontier = self.store.read(spark, "frontier",
                                   FRONTIER_SCHEMA).persist()

        # --- selection: priority -> salted politeness -> global top-k ------
        f = with_priority(frontier)
        f = politeness_budget(f, cfg.per_domain_budget, cfg.n_salts)
        budget = min(cfg.wave_size, cfg.max_pages - crawled_count)
        if budget <= 0:
            return 0
        selected = wave_topk(f, budget).persist()
        with self._timed(wave, "select"):
            n_selected = selected.count()
        if n_selected == 0:
            selected.unpersist()
            frontier.unpersist()
            return 0

        # --- robots (broadcast — tiny dim) + fetch join ---------------------
        sel = selected.join(F.broadcast(robots), "registered_domain", "left")
        sel = sel.withColumn(
            "allowed",
            robots_allowed_udf("robots_txt", "url_canon", F.lit(cfg.agent)),
        ).drop("robots_txt")
        fetched = sel.join(pages_prepared, "url_canon", "left")
        is_precomputed = "n_bytes" in pages_prepared.columns
        body_len = (F.col("n_bytes") if is_precomputed
                    else F.length("html"))
        fetched = fetched.withColumn(
            "status",
            F.when(~F.col("allowed"), F.lit("robots"))
            .when(body_len.isNull(), F.lit("notfound"))
            .when(body_len > cfg.maxsize, F.lit("maxsize"))
            .otherwise(F.lit("ok")),
        )

        is_ok = F.col("status") == "ok"
        if is_precomputed:
            # extraction already ran corpus-wide (fetch_mode="precompute");
            # null out gated rows so downstream semantics match the lazy path
            parsed = (
                fetched
                .withColumn("mimetype", F.when(is_ok, F.col("mimetype")))
                .withColumn("links",
                            F.coalesce(F.when(is_ok, F.col("links")),
                                       F.array().cast("array<string>")))
                .withColumn("extracted_text",
                            F.when(is_ok, F.lit(None).cast("string")))
                .withColumn("n_bytes",
                            F.when(is_ok, F.col("n_bytes")).otherwise(0))
                .persist()
            )
        else:
            # --- extraction (the Arrow boundaries), lazy per-wave ------------
            ok_html = F.when(is_ok, F.col("html"))  # null html for gated rows
            # → the oracle functions return ''/[] — UDF never parses gated bytes
            parsed = fetched.withColumn(
                "mimetype",
                F.when(is_ok, sniff_mimetype_udf(ok_html, F.col("url_canon"))),
            )
            is_html = is_ok & (F.col("mimetype") == "text/html")
            html_in = F.when(is_html, F.col("html"))
            parsed = (
                parsed
                .withColumn("extracted_text",
                            F.when(is_ok,
                                   F.coalesce(extract_text_udf(html_in, F.col("url_canon")),
                                              F.lit(""))))
                .withColumn("links",
                            F.coalesce(extract_links_udf(html_in, F.col("url_canon")),
                                       F.array().cast("array<string>")))
                .withColumn("n_bytes",
                            F.when(is_ok, F.length("html")).otherwise(0))
                .drop("html")
                .persist()
            )
        is_html = is_ok & (F.col("mimetype") == "text/html")

        errors = parsed.filter(~is_ok).select(
            "url_canon", F.lit(wave).alias("wave"),
            F.col("status").alias("reason"),
        )

        site = site_url_expr(F.col("url_canon"), roots)
        emitted = parsed.filter(is_ok).withColumn("site_url", site)
        crawled_new = assign_sortorder(
            emitted.select(
                "url", "url_canon", F.lit(wave).alias("wave"), "depth",
                "priority",
                url_to_path_udf("url_canon", "site_url").alias("path"),
                "site_url", "mimetype",
                content_type_expr(F.col("mimetype")).alias("content_type"),
                (F.parse_url("url_canon", F.lit("PATH")).endswith("/")
                 ).alias("isindex"),
                "extracted_text",
            ),
            offset=crawled_count,
        )

        # --- link pipeline: scope -> ignore -> dedup -> candidates ----------
        lk = (
            parsed.filter(is_html)
            .select(F.col("url_canon").alias("src"), "depth",
                    F.explode("links").alias("dst"))
        )
        in_scope = F.lit(False)
        for r in sorted(roots):
            in_scope = in_scope | F.col("dst").startswith(r)
        ext_links = lk.filter(~in_scope).select(
            "src", "dst", F.lit(wave).alias("wave"))
        scoped = lk.filter(in_scope)
        ignored_cond = F.lit(False)
        for pat in cfg.ignore:  # re.search semantics == rlike (pinned, F1)
            ignored_cond = ignored_cond | F.col("dst").rlike(pat)
        ignored = scoped.filter(ignored_cond)
        kept = scoped.filter(~ignored_cond).dropDuplicates(["src", "dst"])
        links_new = kept.select("src", "dst", F.lit(wave).alias("wave"))

        candidates = kept.groupBy("dst").agg(
            (F.min("depth") + 1).alias("depth"),
            F.count("*").alias("new_refs"),  # src distinct after dedup
        ).withColumnRenamed("dst", "url_canon")

        # --- frontier update: pending-entry merge + seen anti-join ----------
        remaining = frontier.join(selected.select("url_canon"), "url_canon",
                                  "left_anti")
        cand = candidates.persist()
        merged = (
            remaining.alias("f")
            .join(cand.alias("c"), "url_canon", "left")
            .select(
                "url_canon",
                F.least(F.col("f.depth"), F.coalesce(F.col("c.depth"),
                        F.lit(2**31 - 1))).alias("depth"),
                (F.col("f.n_refs") + F.coalesce(F.col("c.new_refs"),
                        F.lit(0))).alias("n_refs"),
                F.col("f.registered_domain").alias("registered_domain"),
            )
        )
        seen = self.store.read(spark, "seen", SEEN_SCHEMA)
        # frontier ⊆ seen (every pending URL was added to seen at discovery),
        # so the seen anti-join alone yields exactly the fresh candidates —
        # no separate anti-join against `remaining` is needed
        fresh_cand = cand
        if cfg.use_bloom:
            # standing shard state, updated incrementally per wave — the
            # build cost is O(|new urls this wave|), never a seen rescan
            shards = [(sid, arr.tobytes())
                      for sid, arr in self._bloom_state().items()]
            flagged = bloom_maybe_seen(fresh_cand, shards,
                                       cfg.n_bloom_shards)
            definitely_new = flagged.filter(~F.col("_maybe_seen")) \
                .drop("_maybe_seen")
            suspects = flagged.filter(F.col("_maybe_seen")) \
                .drop("_maybe_seen")
            new_entries = definitely_new.unionByName(
                seen_anti_join(suspects, seen))
        else:
            new_entries = seen_anti_join(fresh_cand, seen)
        new_entries = new_entries.select(
            "url_canon", "depth", F.col("new_refs").alias("n_refs"),
            registered_domain_udf("url_canon").alias("registered_domain"),
        ).persist()  # consumed by frontier', seen', and the bloom update

        frontier_next = merged.unionByName(new_entries)
        seen_new = new_entries.select(
            "url_canon", F.lit(wave).alias("wave"))

        # --- per-partition lineage metrics (A3) ------------------------------
        part_metrics = (
            parsed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.sum(F.when(is_ok, 1).otherwise(0)).alias("fetched"),
                F.sum(F.when(is_html, 1).otherwise(0)).alias("parsed"),
                F.sum(F.when(F.col("status") == "robots", 1).otherwise(0))
                 .alias("skipped_robots"),
                F.sum(F.when(F.col("status") == "maxsize", 1).otherwise(0))
                 .alias("skipped_maxsize"),
                F.sum(F.when(F.col("status") == "notfound", 1).otherwise(0))
                 .alias("skipped_notfound"),
                F.sum("n_bytes").alias("bytes"),
            )
            .withColumn("wave", F.lit(wave))
        )

        # materialize the wave concurrently: emit-count and the bloom
        # fragment build are independent once `parsed` is cached
        from concurrent.futures import ThreadPoolExecutor

        crawled_new = crawled_new.persist()
        with self._timed(wave, "extract_emit"):
            with ThreadPoolExecutor(max_workers=3) as ex:
                f_emit = ex.submit(crawled_new.count)
                f_ignored = ex.submit(ignored.count)
                f_frags = (
                    ex.submit(collect_bloom_fragments,
                              new_entries.select("url_canon"),
                              cfg.n_bloom_shards, cfg.bloom_shard_bytes)
                    if cfg.use_bloom else None)
                n_emitted = f_emit.result()
                n_ignored = f_ignored.result()
                if f_frags is not None:
                    merge_fragments(self._bloom_state(), f_frags.result())
        part_metrics = part_metrics.withColumn("skipped_ignore",
                                               F.lit(n_ignored))
        with self._timed(wave, "commit"):
            self._commit(wave, crawled_new, links_new, ext_links, errors,
                         seen_new, part_metrics, frontier_next, roots,
                         crawled_count + n_emitted)
        selected.unpersist()
        parsed.unpersist()
        cand.unpersist()
        new_entries.unpersist()
        crawled_new.unpersist()
        frontier.unpersist()
        return n_selected

    def _commit(self, wave, crawled_new, links_new, ext_links, errors,
                seen_new, part_metrics, frontier_next, roots, crawled_count):
        self.store.commit_wave(
            wave,
            appends={
                "crawled": crawled_new, "links": links_new,
                "ext_links": ext_links, "errors": errors,
                "seen": seen_new, "metrics": part_metrics,
            },
            replaces={"frontier": frontier_next},
            bucket_keys={"crawled": "url_canon",
                         "frontier": "registered_domain"},
            sort_keys={"frontier": ["depth", "url_canon"]},
            n_buckets=self.cfg.n_buckets,
            extra={"crawled_count": crawled_count, "roots": list(roots)},
            blobs=({"bloom": self._bloom_blob()}
                   if self.cfg.use_bloom else None),
        )

    def _extracted_path(self) -> str:
        return os.path.join(self.store.root, "data", "corpus_extracted")

    def _precompute_extraction(self, pages_prepared: DataFrame) -> DataFrame:
        """ONE extraction pass over the whole corpus -> corpus_extracted
        parquet (url, warc_ts, url_canon, mimetype, n_bytes, links,
        extracted_text). Idempotent (resume skips it). Returns the SLIM view
        (text column dropped — parquet column pruning keeps body-sized bytes
        out of every wave scan)."""
        path = self._extracted_path()
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            mt = sniff_mimetype_udf("html", "url_canon")
            ext = pages_prepared.withColumn("mimetype", mt)
            is_html = F.col("mimetype") == "text/html"
            html_in = F.when(is_html, F.col("html"))
            ext = ext.select(
                "url", "warc_ts", "url_canon", "mimetype",
                F.length("html").alias("n_bytes"),
                F.coalesce(extract_links_udf(html_in, F.col("url_canon")),
                           F.array().cast("array<string>")).alias("links"),
                F.coalesce(extract_text_udf(html_in, F.col("url_canon")),
                           F.lit("")).alias("extracted_text"),
            )
            ext.write.mode("overwrite").parquet(path)
        # the slim view is small by design (no bodies, no text): pin it so
        # every wave's fetch join probes memory, not parquet
        return self.spark.read.parquet(path).drop("extracted_text").persist()

    def _bloom_state(self) -> dict:
        """Standing Bloom shard state: loaded from the last committed blob
        (resume), rebuilt from the seen table if the blob is missing, or
        empty at bootstrap."""
        if self._bloom is not None:
            return self._bloom
        import pickle

        import numpy as np

        raw = self.store.read_blob("bloom")
        if raw is not None:
            self._bloom = {
                sid: np.frombuffer(b, dtype=np.uint8).copy()
                for sid, b in pickle.loads(raw).items()
            }
        else:
            seen = self.store.read(self.spark, "seen", SEEN_SCHEMA)
            self._bloom = collect_bloom_fragments(
                seen.select("url_canon"), self.cfg.n_bloom_shards,
                self.cfg.bloom_shard_bytes)
        return self._bloom

    def _bloom_blob(self) -> bytes:
        import pickle

        return pickle.dumps(
            {sid: arr.tobytes() for sid, arr in (self._bloom or {}).items()})

    # -- full crawl ------------------------------------------------------------
    def run(self, pages: DataFrame, seeds: list[str]) -> DataFrame:
        cfg = self.cfg
        pages_prepared = self.prepare_pages(pages)
        # robots is a tiny dim consulted every wave: materialize it once on
        # the driver instead of re-deriving from the corpus per wave (must
        # read the RAW prepared corpus — precompute drops the html column)
        robots_src = self.robots_table(pages_prepared)
        robots_rows = robots_src.collect()
        robots = self.spark.createDataFrame(robots_rows, robots_src.schema) \
            if robots_rows else robots_src
        # robots table persisted with parsed crawl-delay (FIXTURES.md B.3:
        # "parsed, recorded"); the per-wave gate uses robots_txt directly
        from ..oracle.robots import crawl_delay
        robots_store = self.spark.createDataFrame(
            [(r["registered_domain"], r["robots_txt"],
              crawl_delay(r["robots_txt"], cfg.agent))
             for r in robots_rows],
            "registered_domain string, robots_txt string, crawl_delay double")
        if cfg.fetch_mode == "precompute":
            with self._timed(-1, "precompute_extraction"):
                pages_prepared = self._precompute_extraction(pages_prepared)
        elif cfg.cache_corpus == "full":
            pages_prepared = pages_prepared.persist()
        manifest = self.store.current_manifest()
        if manifest is None:
            self.bootstrap(seeds, robots_store)
            manifest = self.store.current_manifest()
        roots = tuple(manifest["roots"])
        wave = manifest["wave"] + 1
        while wave < cfg.max_waves:
            manifest = self.store.current_manifest()
            n = self.run_wave(wave, pages_prepared, robots, roots,
                              manifest.get("crawled_count", 0))
            if n == 0:
                break
            wave += 1
        pages_prepared.unpersist()
        return self.finalize()

    def finalize(self) -> DataFrame:
        """Backlinks = ALL in-scope referrers over the whole crawl
        [UP: upstream accumulates into done items, yields at the end]."""
        spark = self.spark
        crawled = self.store.read(spark, "crawled")
        links = self.store.read(
            spark, "links",
            StructType([StructField("src", StringType()),
                        StructField("dst", StringType()),
                        StructField("wave", IntegerType())]))
        backs = links.groupBy("dst").agg(
            F.sort_array(F.collect_set("src")).alias("backlinks"))
        out = (
            crawled.join(backs, crawled["url_canon"] == backs["dst"], "left")
            .drop("dst")
            .withColumn("backlinks",
                        F.coalesce("backlinks",
                                   F.array().cast("array<string>")))
        )
        if self.cfg.fetch_mode == "precompute":
            # attach deferred text in ONE join (the only time the fat
            # extracted_text column is scanned after the precompute pass)
            text = spark.read.parquet(self._extracted_path()).select(
                "url_canon", F.col("extracted_text").alias("_text"))
            # broadcast the slim crawled side so the fat text column streams
            # map-side exactly once, never through a shuffle (crawled ⊆
            # corpus, so inner ≡ left here)
            out = (text.join(F.broadcast(out.drop("extracted_text")),
                             "url_canon")
                   .withColumnRenamed("_text", "extracted_text"))
        return out
