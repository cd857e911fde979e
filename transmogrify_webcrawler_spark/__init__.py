"""transmogrify_webcrawler_spark — a PySpark-native re-creation of the
query/data-processing capabilities of ``collective/transmogrify.webcrawler``.

Architecture (SURVEY.md §3.3): a distributed URL frontier over snapshotted
columnar tables of Common-Crawl-style pages; each crawl wave is a checkpointed
micro-batch (fetch-join → vectorized extraction UDFs → dedup anti-join →
frontier update) expressed with the DataFrame API so Catalyst/AQE plan it.

The byte-exactness contract (BASELINE.json input_hint) is carried by
``transmogrify_webcrawler_spark.oracle`` — one pinned pure-Python module used
*unchanged* inside the Arrow/pandas UDFs and standalone by the pytest oracle
crawler, so extracted text is byte-identical by construction.
"""

__version__ = "0.1.0"

USER_AGENT = "transmogrify-webcrawler-spark/0.1"
