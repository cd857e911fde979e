"""Streaming token-bucket politeness: per-domain admission caps across
micro-batches with bucket state surviving query restarts."""

import os


def test_token_bucket_caps_and_resumes(spark, tmp_path):
    from transmogrify_webcrawler_spark.streaming.ratelimit import (
        token_bucket_admission)

    src = str(tmp_path / "frontier")
    ckpt = str(tmp_path / "ck_bucket")
    os.makedirs(src)
    schema = "domain string, url string"

    def run_once(collector):
        stream = (spark.readStream.schema(schema)
                  .option("recursiveFileLookup", "true").parquet(src))
        q = (token_bucket_admission(stream, capacity=2, refill=1)
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _i: collector.extend(
                 (r["domain"], r["url"], r["admitted"])
                 for r in b.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [("d1", "u1"), ("d1", "u2"), ("d1", "u3"), ("d2", "v1")], schema
    ).write.parquet(os.path.join(src, "b0.parquet"))
    got1 = []
    run_once(got1)
    out1 = {(d, u): a for d, u, a in got1}
    # bucket starts full at capacity=2: first two of d1 admit in url order
    assert out1 == {("d1", "u1"): True, ("d1", "u2"): True,
                    ("d1", "u3"): False, ("d2", "v1"): True}

    # restart: d1's bucket is EMPTY in restored state, +1 refill -> only
    # the first of the next two admits; d2 had 1 left, +1 capped at 2
    spark.createDataFrame(
        [("d1", "u4"), ("d1", "u5"), ("d2", "v2"), ("d2", "v3")], schema
    ).write.mode("append").parquet(os.path.join(src, "b1.parquet"))
    got2 = []
    run_once(got2)
    out2 = {(d, u): a for d, u, a in got2}
    assert out2 == {("d1", "u4"): True, ("d1", "u5"): False,
                    ("d2", "v2"): True, ("d2", "v3"): True}
