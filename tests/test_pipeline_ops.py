"""Deterministic corpus split + dedup retention decision table."""

from pyspark.sql import functions as F

from transmogrify_webcrawler_spark.operators.textops import (
    dedup_retention, hash_split,
)


def test_hash_split_deterministic_and_proportioned(spark):
    docs = spark.range(10000).withColumnRenamed("id", "doc_id")
    a = hash_split(docs).groupBy("split").count().collect()
    b = hash_split(docs).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 within generous tolerance at n=10k
    assert 0.88 < counts["train"] / 10000 < 0.92
    assert 0.03 < counts["val"] / 10000 < 0.07
    assert 0.03 < counts["test"] / 10000 < 0.07


def test_hash_split_salt_draws_independent_split(spark):
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = hash_split(docs, salt="s1").select("doc_id", "split")
    b = hash_split(docs, salt="s2").select(
        "doc_id", F.col("split").alias("split2"))
    diff = a.join(b, "doc_id").filter(F.col("split") != F.col("split2"))
    assert diff.count() > 0


def test_dedup_retention_decisions(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # clusters {1,2,3} and {5,6}; 0,4,7 unpaired
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a long, b long")
    out = {r["doc_id"]: (r["canonical_id"], r["keep"])
           for r in dedup_retention(docs, pairs, iterations=4).collect()}
    assert out == {0: (0, True), 1: (1, True), 2: (1, False), 3: (1, False),
                   4: (4, True), 5: (5, True), 6: (5, False), 7: (7, True)}
