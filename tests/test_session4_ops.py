"""Round-5 session-4 operators: duplicate-span accounting, C4 filters,
TF-IDF top-k, SURT/CDX indexing, and the deterministic HLL sketch."""

from pyspark.sql import functions as F

from transmogrify_webcrawler_spark.operators.textops import (
    c4_filters, duplicate_span_stats, tfidf_topk,
)
from transmogrify_webcrawler_spark.operators.cdx import cdx_index, surt_expr
from transmogrify_webcrawler_spark.operators.sketches import hll_cardinality


def test_duplicate_spans_known_geometry(spark):
    # doc 0 and doc 1 share tokens 0..6 ("a b c d e f g"): 5-gram positions
    # 0,1,2 duplicate in both docs -> one merged span of 7 tokens each.
    # doc 2 has no cross-doc or internal repeats.
    shared = "a b c d e f g"
    docs = spark.createDataFrame(
        [(0, shared + " x1 y1 z1 w1 v1"),
         (1, shared + " x2 y2 z2 w2 v2"),
         (2, "p q r s t u v w only once here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in duplicate_span_stats(docs, k=5).collect()}
    for d in (0, 1):
        assert out[d]["n_dup_positions"] == 3      # positions 0,1,2
        assert out[d]["n_spans"] == 1              # they overlap -> merged
        assert out[d]["n_removed_tokens"] == 7     # [0, 2+5) = 7 tokens
        assert out[d]["n_kept_tokens"] == out[d]["n_tokens"] - 7
    assert out[2]["n_dup_positions"] == 0
    assert out[2]["n_removed_tokens"] == 0


def test_duplicate_spans_disjoint_spans_not_merged(spark):
    # the repeated 5-gram occurs at positions 0 and 10 within BOTH docs:
    # gap 10 >= k -> two spans of 5 tokens each
    rep = "r1 r2 r3 r4 r5"
    filler = "f1 f2 f3 f4 f5"
    text = f"{rep} {filler} {rep} tail1 tail2"
    docs = spark.createDataFrame(
        [(0, text), (1, text.replace("tail", "end"))],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in duplicate_span_stats(docs, k=5).collect()}
    # positions 0 and 10 duplicate; filler+tail unique per doc... but the
    # grams spanning rep+filler ("r2..f1" etc) also repeat across docs:
    # positions 0..10 all duplicate except those touching the distinct tail
    assert out[0]["n_spans"] >= 1
    assert out[0]["n_removed_tokens"] >= 10
    assert out[0] == {**out[1], "doc_id": 0}


def test_c4_rules_fire_individually(spark):
    docs = spark.createDataFrame([
        (0, "this line is long and ends properly.\nno punct here at all\n"
            "enable javascript to continue.\nshort one!\n"
            'a quoted keeper line stands here."'),
        (1, "fine sentence that would pass easily.\nbut lorem ipsum kills"
            " the whole document."),
        (2, "function f() { return 1; }\nreal sentence that is long enough."),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_filters(docs).collect()}
    assert out[0]["n_lines"] == 5
    assert out[0]["n_kept_lines"] == 2   # line 1 (punct+words), line 5
    assert out[0]["passes_c4"]
    assert "javascript" not in out[0]["kept_text"]
    assert not out[1]["passes_c4"] and out[1]["n_kept_lines"] == 0
    assert not out[2]["passes_c4"] and out[2]["kept_text"] == ""


def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = spark.createDataFrame([
        (0, "common common zebra zebra zebra"),
        (1, "common common yak"),
        (2, "common common common"),
    ], "doc_id long, text string")
    out = tfidf_topk(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'zebra'/'yak' are unique to their doc (df=1) -> beat 'common' (df=3)
    assert top[0] == "zebra" and top[1] == "yak" and top[2] == "common"
    ranks = {(r["doc_id"], r["rank"]) for r in out}
    assert all(rk == 1 for _, rk in ranks)


def test_surt_key_rules(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Sub.Example.COM:8080/a/b.html?q=1#frag",),
         ("https://example.org",)], "url string")
    got = [r["s"] for r in
           df.select(surt_expr(F.col("url")).alias("s")).collect()]
    assert got[0] == "com,example,sub)/a/b.html?q=1"
    assert got[1] == "org,example)/"


def test_cdx_index_is_global_surt_order(spark):
    urls = [(f"http://site{i % 7}.example.com/p{i}",) for i in range(200)]
    df = spark.createDataFrame(urls, "url string").repartition(8)
    out = cdx_index(df).collect()
    assert sorted(r["idx"] for r in out) == list(range(200))
    by_idx = sorted(out, key=lambda r: r["idx"])
    keys = [(r["surt"], r["url"]) for r in by_idx]
    assert keys == sorted(keys)


def test_hll_accuracy_and_partition_invariance(spark):
    keys = spark.range(20000).select(
        F.concat(F.lit("u:"), (F.col("id") % 5000).cast("string")).alias("k"))
    one = hll_cardinality(keys.coalesce(1), "k").collect()[0]
    many = hll_cardinality(keys.repartition(16), "k").collect()[0]
    assert one == many                      # bit-exact under repartitioning
    # raw-HLL sigma at m=256 is ~6.5%; allow 4 sigma
    assert abs(one["hll_estimate"] - 5000) / 5000 < 0.26


def test_robots_rules_semantics(spark):
    from transmogrify_webcrawler_spark.operators.robots_rules import (
        robots_evaluate)
    rules = spark.createDataFrame(
        [("a", False, "/private/*"), ("a", True, "/private/pub*"),
         ("a", False, "/*.gif$"), ("a", False, "/t*"), ("a", True, "/t*")],
        "domain string, allow boolean, pattern string")
    urls = spark.createDataFrame(
        [("a", "/private/doc"), ("a", "/private/pub/ok"),
         ("a", "/x.gif"), ("a", "/x.gifs"), ("a", "/tie"),
         ("a", "/free"), ("b", "/anything")],
        "domain string, path string")
    out = {(r["domain"], r["path"]): (r["allowed"], r["winner_pattern"])
           for r in robots_evaluate(urls, rules).collect()}
    assert out[("a", "/private/doc")] == (False, "/private/*")
    # longer allow overrides shorter disallow
    assert out[("a", "/private/pub/ok")] == (True, "/private/pub*")
    # trailing $ anchors ...
    assert out[("a", "/x.gif")] == (False, "/*.gif$")
    # ... and must NOT match a longer path
    assert out[("a", "/x.gifs")] == (True, "")
    # length tie -> allow (least restrictive)
    assert out[("a", "/tie")] == (True, "/t*")
    # no matching rule / no rules for the domain -> allowed
    assert out[("a", "/free")] == (True, "")
    assert out[("b", "/anything")] == (True, "")


def test_minhash_probe_finds_twin_without_touching_corpus(spark):
    from transmogrify_webcrawler_spark.operators.textops import (
        minhash_index, minhash_probe)
    base = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc{i} zeta eta theta")
         for i in range(30)], "doc_id long, text string")
    bands_t, sigs_t = minhash_index(base)
    # new batch: a perturbed twin of doc 7 + one genuinely novel doc
    new = spark.createDataFrame(
        [(1007, "ALPHA  BETA GAMMA DELTA  EPSILON DOC7 ZETA ETA THETA"),
         (1008, "totally different words nothing shared at all here now")],
        "doc_id long, text string")
    out = minhash_probe(new, bands_t, sigs_t, threshold=1.0).collect()
    hits = {(r["new_id"], r["old_id"], r["est_jaccard"]) for r in out}
    assert (1007, 7, 1.0) in hits
    assert all(n != 1008 for n, _, _ in hits)
