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


def test_gopher_quality_signals(spark):
    good = ("the quick brown fox jumps over the lazy dog and runs to a "
            "house in the field that it likes for dinner ") * 3
    bullets = "- one\n- two\n- three\n- four"
    dups = "same line\nsame line\nsame line\nother"
    symbols = "# # # # hash ... tail"
    docs = spark.createDataFrame(
        [(0, good), (1, bullets), (2, dups), (3, symbols), (4, "")],
        "doc_id long, text string")
    from transmogrify_webcrawler_spark.operators.textops import gopher_quality
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(docs).collect()}
    assert out[0]["passes_gopher"] is True
    assert out[0]["n_stopwords"] >= 2
    assert out[1]["frac_bullet_lines"] == 1.0
    assert out[1]["passes_gopher"] is False
    assert out[2]["frac_dup_lines"] == 0.5  # 2 of 4 lines are repeats
    assert out[2]["frac_dup_line_chars"] > 0.5
    assert out[3]["symbol_ratio"] > 0.1
    assert out[4]["n_words"] == 0 and out[4]["passes_gopher"] is False


def test_repetition_stats_counts(spark):
    # "a b a b a b" -> 2-grams: [a b, b a, a b, b a, a b] = 5 grams,
    # top (a b)=3, all 5 are duplicated grams
    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "w x y z"), (2, "solo")],
        "doc_id long, text string")
    from transmogrify_webcrawler_spark.operators.textops import (
        repetition_stats)
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(docs, n=2).collect()}
    assert out[0]["n_grams"] == 5
    assert out[0]["top_gram_frac"] == 0.6
    assert out[0]["dup_gram_frac"] == 1.0
    assert out[1] == {"doc_id": 1, "n_grams": 3, "top_gram_frac": 0.3333,
                      "dup_gram_frac": 0.0, "dup_char_frac": 0.0}
    assert out[2]["n_grams"] == 0  # < n words -> zero grams, still a row


def test_decontaminate_flags_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    clean_text = "one two three four five six seven"
    leaked_text = bench_text + " extra tail words here"
    docs = spark.createDataFrame(
        [(0, bench_text), (1, clean_text), (2, leaked_text)],
        "doc_id long, text string")
    from transmogrify_webcrawler_spark.operators.textops import decontaminate
    out = {r["doc_id"]: r.asDict()
           for r in decontaminate(docs, bench_mod=20, shingle_n=3,
                                  frac_threshold=0.5).collect()}
    assert 0 not in out  # benchmark docs are not scored
    assert out[1]["n_contaminated"] == 0
    assert out[1]["is_contaminated"] is False
    assert out[2]["n_contaminated"] == 4  # the 4 shingles inside bench_text
    assert out[2]["is_contaminated"] is True


def test_mixture_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "web" if i % 2 == 0 else "forum") for i in range(20000)],
        "doc_id long, source string")
    from transmogrify_webcrawler_spark.operators.sampling import (
        mixture_sample)
    out = mixture_sample(docs, rates={"web": 0.5, "forum": 0.1})
    kept = {r["source"]: r["n"] for r in
            out.filter("keep").groupBy("source")
               .agg(F.count("*").alias("n")).collect()}
    assert 0.45 < kept["web"] / 10000 < 0.55
    assert 0.07 < kept["forum"] / 10000 < 0.13
    again = mixture_sample(docs.repartition(17), rates={"web": 0.5,
                                                        "forum": 0.1})
    assert sorted(map(tuple, out.collect())) == \
           sorted(map(tuple, again.collect()))


def test_stratified_topn_unique_and_plan(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(1000)], "doc_id long, source string")
    from transmogrify_webcrawler_spark.operators.sampling import (
        stratified_topn)
    out = stratified_topn(docs, n=10)
    rows = out.collect()
    assert len(rows) == 50
    per = {}
    for r in rows:
        per.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert all(len(v) == 10 for v in per.values())
    # rank-filter windows must plan as WindowGroupLimit (top-k pushdown),
    # not a full per-stratum sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_pack_sequences_contiguous_and_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7))) for i in range(500)],
        "doc_id long, text string")
    from transmogrify_webcrawler_spark.operators.sampling import (
        pack_sequences)
    out = pack_sequences(docs, context_len=64, block=50)
    rows = sorted(map(tuple, out.collect()))
    # offsets are a contiguous token layout in doc_id order
    acc = 0
    for doc_id, n_tokens, start, bin_id, bin_pos in rows:
        assert start == acc
        assert bin_id == start // 64 and bin_pos == start % 64
        acc += n_tokens
    other = pack_sequences(docs.repartition(11), context_len=64, block=50)
    assert rows == sorted(map(tuple, other.collect()))


def test_recrawl_schedule_change_semantics(spark):
    import datetime as dt
    from transmogrify_webcrawler_spark.operators.frontier import (
        recrawl_schedule)
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # url 1: changes on every fetch -> interval = span / 3 changes
        (1, t0, "a", 0), (1, t0 + dt.timedelta(hours=2), "b", 1),
        (1, t0 + dt.timedelta(hours=4), "c", 2),
        (1, t0 + dt.timedelta(hours=6), "d", 3),
        # url 2: never changes -> max interval
        (2, t0, "x", 0), (2, t0 + dt.timedelta(days=1), "x", 1),
        # url 3: single fetch -> no span, no changes -> max interval
        (3, t0, "y", 0),
    ]
    df = spark.createDataFrame(
        rows, "url_id long, ts timestamp_ntz, fingerprint string, "
              "fetch_id long")
    out = {r["url_id"]: r for r in recrawl_schedule(df).collect()}
    hours6 = 6 * 3_600_000_000
    assert out[1]["n_changes"] == 3 and out[1]["span_us"] == hours6
    assert out[1]["recrawl_us"] == hours6 // 3
    assert out[2]["n_changes"] == 0
    assert out[2]["recrawl_us"] == 2_592_000_000_000
    assert out[3]["n_fetches"] == 1
    assert out[3]["recrawl_us"] == 2_592_000_000_000
