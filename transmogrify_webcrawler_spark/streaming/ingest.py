"""Continuous page ingestion: Common-Crawl-style captures landing as parquet
files are picked up by a file-source stream, run through the SAME pinned
extraction UDFs as the batch crawl, and appended to an extraction sink via
foreachBatch — exactly-once per file under the streaming checkpoint.

This is the streaming half of the engine: the wave-loop crawler decides WHAT
to fetch; this pipeline processes captures AS THEY ARRIVE (e.g. a fetcher
fleet writing WARC conversions). Both share oracle semantics, so extracted
text is byte-identical between paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from ..functions.udfs import (
    canonicalize_udf, extract_page_udf, registered_domain_udf,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def extraction_plan(pages: DataFrame) -> DataFrame:
    """The per-capture extraction dataflow — identical for batch and stream
    inputs (Structured Streaming's unified DataFrame model)."""
    url_c = canonicalize_udf("url")
    df = pages.withColumn("url_canon", url_c)
    # fused sniff+links+text: one Arrow transfer of html, one parser pass
    df = df.withColumn("_pg", extract_page_udf("html", "url_canon",
                                               F.lit(False)))
    return df.select(
        "url", "url_canon", "warc_ts",
        registered_domain_udf("url_canon").alias("registered_domain"),
        F.col("_pg.mimetype").alias("mimetype"),
        F.coalesce(F.col("_pg.text"), F.lit("")).alias("extracted_text"),
        F.coalesce(F.col("_pg.links"),
                   F.array().cast("array<string>")).alias("links"),
        F.length("html").alias("n_bytes"),
    )


def start_ingest(spark: SparkSession, landing_dir: str, out_dir: str,
                 checkpoint_dir: str, trigger_once: bool = False):
    """readStream over the landing dir -> extraction -> parquet append via
    foreachBatch. The checkpoint makes file pickup exactly-once; restart
    resumes from the last committed batch (same guarantee family as the
    crawl's wave snapshots)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(landing_dir)
    )
    extracted = extraction_plan(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    writer = extracted.writeStream.foreachBatch(sink) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
