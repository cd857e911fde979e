"""Randomized bulk checks for the session-5 operators: one seeded-random
batch per operator runs through Spark in a single job and is compared
against an independent pure-Python reference (the cheap analog of the
hypothesis suite for operators whose kernel IS the Spark dataflow)."""

import random


def test_exact_quantiles_random_multiset(spark):
    rng = random.Random(42)
    values = ([rng.randint(0, 50) for _ in range(300)]      # heavy ties
              + [rng.randint(0, 100000) for _ in range(200)]  # spread
              + [7] * 50)                                     # skew spike
    q_bps = [1, 1000, 2500, 5000, 7500, 9000, 9999, 10000]

    from transmogrify_webcrawler_spark.operators.quantiles import (
        exact_quantiles)

    df = spark.createDataFrame([(v,) for v in values], "x long")
    got = {r["q_bp"]: r["value"]
           for r in exact_quantiles(df, "x", q_bps, block=64).collect()}

    s = sorted(values)
    n = len(s)
    for q in q_bps:
        # PERCENTILE_DISC: smallest value whose cumulative count i has
        # i * 10000 >= q * n (1-based i) — same integer rank arithmetic
        want = next(s[i - 1] for i in range(1, n + 1)
                    if i * 10000 >= q * n)
        assert got[q] == want, (q, got[q], want)


def test_resolve_redirects_random_functional_graph(spark):
    """Random partial function with chains AND cycles: the operator must
    equal an exact pure-Python simulation of the pointer-doubling
    recurrence (same rounds, same n_hops accumulation)."""
    rng = random.Random(7)
    nodes = list(range(80))
    red = {}
    for v in nodes:
        roll = rng.random()
        if roll < 0.55:
            w = rng.choice(nodes)
            if w != v:
                red[v] = w

    from transmogrify_webcrawler_spark.operators.graph import (
        resolve_redirects)

    hops = 4
    edges = spark.createDataFrame(list(red.items()), "src long, dst long")
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {r["node"]: (r["final"], r["n_hops"], r["resolved"])
           for r in resolve_redirects(edges, ndf, hops=hops).collect()}

    # reference: the identical doubled-map recurrence
    f = {v: (red.get(v, v), 1 if v in red else 0) for v in nodes}
    rounds = max(1, (hops - 1).bit_length())
    for _ in range(rounds):
        f = {v: (f[fv][0], h + f[fv][1]) for v, (fv, h) in f.items()}
    for v in nodes:
        fv, h = f[v]
        assert got[v] == (fv, h, fv not in red), (v, got[v], f[v])


def _bpe_reference(words, k):
    """Greedy BPE trainer mirroring operators/bpe.py semantics exactly:
    pair weights from word counts, argmax by (weight desc, left, right),
    left-to-right non-overlapping merge application."""
    from collections import Counter

    counts = Counter(words)
    segs = {w: list(w) for w in counts}
    merges = []
    for rnd in range(1, k + 1):
        pw = Counter()
        for w, c in counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pw[(s[i], s[i + 1])] += c
        if not pw:
            break
        (l, r), wt = min(pw.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, wt))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_merges_random_corpus(spark):
    rng = random.Random(13)
    vocab = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
             for _ in range(30)]
    words = [rng.choice(vocab) for _ in range(400)]

    from transmogrify_webcrawler_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [(r["round"], r["left"], r["right"], r["merged"], r["weight"])
           for r in bpe_merges(df, k=5).orderBy("round").collect()]
    assert got == _bpe_reference(words, 5)


def test_strip_tracking_random_urls_idempotent(spark):
    rng = random.Random(99)
    tracked = ["utm_source=a", "utm_medium=b", "fbclid=xyz", "gclid=1",
               "msclkid=q"]
    kept = ["id=7", "a=1", "b=", "q=x+y"]
    urls = []
    for i in range(200):
        n = rng.randint(0, 4)
        params = [rng.choice(tracked + kept) for _ in range(n)]
        u = f"http://h{i}.com/p{i}"
        if params:
            u += "?" + "&".join(params)
        if rng.random() < 0.3:
            u += "#frag"
        urls.append(u)

    from transmogrify_webcrawler_spark.operators.cdx import strip_tracking

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = {r["url"]: r["url_clean"] for r in strip_tracking(df).collect()}
    df2 = spark.createDataFrame([(c,) for c in set(once.values())],
                                "url string")
    twice = {r["url"]: r["url_clean"] for r in strip_tracking(df2).collect()}
    for u, c in once.items():
        assert twice[c] == c, (u, c, twice[c])          # idempotent
        assert "utm_" not in c and "fbclid" not in c    # tracked gone
        for p in ("id=7", "a=1", "q=x+y"):
            if p in u and "utm_" + p not in u:
                assert p in c, (u, c)                   # kept params stay
