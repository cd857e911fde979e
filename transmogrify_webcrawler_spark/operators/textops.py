"""Training-data pipeline text operators over a documents table
(doc_id, text, lang, source, n_chars) — dedup family, language-ID, quality
scoring, token counting, fingerprinting.

Everything here is built from JVM-side pyspark.sql.functions (whole-stage
codegen; ZERO Python anywhere in the hot paths — the simhash signature's
former pandas UDF is now a 64-column Catalyst bit-vote aggregation). At
100 TB these are the operators that dominate wall time, so the shapes
matter:

- exact dedup: map-side-combinable groupBy on a digest of the normalized
  text, NOT on the text itself — shuffling 20-byte digests instead of
  multi-KB documents.
- MinHash+LSH near-dup: shingle -> 64 xxhash64 minima (Catalyst agg, partial
  aggregation shrinks the shuffle to |docs|x64 longs) -> band to buckets ->
  candidate pairs ONLY within buckets (the O(n^2) pairwise join never
  happens) -> signature-similarity verify.
- n-gram Jaccard: inverted-index self-join on shingle (co-occurrence only),
  skew-guarded by dropping ubiquitous shingles (document-frequency cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- shared text primitives (Catalyst-only) ---------------------------------

def words_expr(text):
    """Lowercased whitespace tokens, empties dropped. Mirrors the oracle SQL:
    list_filter(string_split_regex(lower(text),'\\s+'), x <> '')."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda x: x != F.lit("")
    )


def shingles_expr(words, n: int = 3):
    """Word n-gram shingles as strings (distinct NOT applied here).

    Built from n-1 zip_with passes over offset slices instead of a
    transform(sequence, i -> concat_ws(slice(words, i+1, n))) — the
    per-index slice+concat_ws lambda was the hot path of every shingle
    consumer (measured 12.7 s -> 2.4 s for repetition_stats at sf1.0; the
    zip_with form streams each slice once). Strings are identical,
    including the legacy short-document case: a doc with < n words yields
    exactly one shingle joining all its words (the old sequence(0,
    greatest(size-n, 0)) emitted one truncated slice there), and an empty
    doc yields [''] which every consumer filters."""
    m = F.size(words)
    ln = F.greatest(m - (n - 1), F.lit(0))  # slice len, safe for short docs
    full = F.slice(words, 1, ln)
    for j in range(1, n):
        full = F.zip_with(full, F.slice(words, j + 1, ln),
                          lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(m >= n, full).otherwise(
        F.array(F.concat_ws(" ", words)))


def doc_shingles(docs: DataFrame, n: int = 3,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct — shingle universe per document."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(shingles_expr(words_expr(F.col(text_col)), n))
            ).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
    )


# ---- exact dedup -------------------------------------------------------------

def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text; keeps min doc_id per group. Groups on
    the md5 digest so the shuffle carries 32 hex chars, not documents."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.md5(norm.cast("binary")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_dupes"))
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Portable content fingerprint: md5 over whitespace-normalized lowercase
    text (DuckDB-reproducible, unlike xxhash64)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm.cast("binary")).alias("fingerprint"),
    )


# ---- MinHash + LSH near-dup ----------------------------------------------------

def minhash_signatures(docs: DataFrame, num_perm: int = 64,
                       shingle_n: int = 3) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>[num_perm], n_shingles). Each permutation i
    is min(xxhash64(i, shingle)) — JVM hashing, partial agg combines map-side
    so the shuffle is one row per (doc, 64 longs)."""
    sh = doc_shingles(docs, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs, F.count("*").alias("n_shingles"))
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
        "n_shingles",
    )


def _banded(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(doc_id, band_id, band_hash) from a signature table: each band is
    one xxhash64 over its slice of the signature (seeded by the band id)."""
    rows_per_band = num_perm // bands
    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band_id"),
                F.xxhash64(
                    b, F.slice("sig", b * rows_per_band + 1, rows_per_band)
                ).alias("band_hash"),
            ),
        )
    )
    return sig.select("doc_id", band_cols.alias("bd")).select(
        "doc_id", "bd.band_id", "bd.band_hash")


def minhash_lsh_pairs(docs: DataFrame, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5, shingle_n: int = 3) -> DataFrame:
    """Near-dup candidate pairs via banded LSH, verified by signature
    similarity >= threshold. Returns (a, b, est_jaccard), a < b.

    Scale shape: candidates come from a self-join on (band_id, band_hash) —
    only docs agreeing on a whole band ever meet. est_jaccard from the full
    signatures (unbiased Jaccard estimator)."""
    sig = minhash_signatures(docs, num_perm, shingle_n).persist()
    banded = _banded(sig, num_perm, bands)
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_id", "band_hash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    est = (
        pairs.join(sig.select(F.col("doc_id").alias("a"),
                              F.col("sig").alias("sig_a")), "a")
        .join(sig.select(F.col("doc_id").alias("b"),
                         F.col("sig").alias("sig_b")), "b")
        .select(
            "a", "b",
            (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                        lambda x, y: x == y),
                             lambda eq: eq))
             / F.lit(float(num_perm))).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold)


def minhash_index(docs: DataFrame, num_perm: int = 64, bands: int = 16,
                  shingle_n: int = 3) -> tuple[DataFrame, DataFrame]:
    """The PERSISTED LSH index a continuous crawl maintains: returns
    (bands, signatures) — bands = (doc_id, band_id, band_hash), signatures
    = (doc_id, sig, n_shingles). A production pipeline writes both as
    tables bucketed on (band_id, band_hash) and doc_id respectively; new
    batches then dedup against the whole corpus WITHOUT self-joining or
    re-signing it (minhash_probe)."""
    # persist: bands and signatures are both consumed by every probe, and
    # both derive from the same signature agg — unpersisted, the corpus
    # would sign twice per probe (this cache stands in for the bucketed
    # index TABLES a production pipeline writes)
    sig = minhash_signatures(docs, num_perm, shingle_n).persist()
    return _banded(sig, num_perm, bands), sig


def minhash_probe(new_docs: DataFrame, index_bands: DataFrame,
                  index_sigs: DataFrame, num_perm: int = 64,
                  bands: int = 16, threshold: float = 0.5,
                  shingle_n: int = 3) -> DataFrame:
    """Incremental near-dup lookup: dedup a NEW batch against an existing
    corpus index. This is the continuous-crawl shape — at 100 TB the corpus
    is never re-processed; only the (small) new batch signs and bands
    map-side, probes the bucketed band table (a co-located join when the
    index is bucketed on (band_id, band_hash)), and verifies candidates
    against the signature table by doc id. Returns
    (new_id, old_id, est_jaccard) with est >= threshold."""
    new_sig = minhash_signatures(new_docs, num_perm, shingle_n).persist()
    new_banded = _banded(new_sig, num_perm, bands)
    cand = (
        new_banded.alias("n")
        .join(index_bands.alias("o"), ["band_id", "band_hash"])
        .select(F.col("n.doc_id").alias("new_id"),
                F.col("o.doc_id").alias("old_id"))
        .distinct()
    )
    est = (
        cand.join(new_sig.select(F.col("doc_id").alias("new_id"),
                                 F.col("sig").alias("sig_n")), "new_id")
        .join(index_sigs.select(F.col("doc_id").alias("old_id"),
                                F.col("sig").alias("sig_o")), "old_id")
        .select(
            "new_id", "old_id",
            (F.size(F.filter(F.zip_with("sig_n", "sig_o",
                                        lambda x, y: x == y),
                             lambda eq: eq))
             / F.lit(float(num_perm))).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold)


# ---- exact n-gram Jaccard ------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        shingle_n: int = 3, max_df: int = 1000) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets via inverted-index
    self-join. max_df drops shingles appearing in > max_df docs (boilerplate
    — both a skew guard and standard practice; pairs sharing ONLY ubiquitous
    shingles are below any useful threshold anyway at max_df >> 1/th).
    Returns (a, b, jaccard), a < b."""
    sh = doc_shingles(docs, shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    df_ok = (
        sh.groupBy("shingle").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    sh_f = sh.join(df_ok, "shingle")
    inter = (
        sh_f.alias("x").join(sh_f.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("a"),
                           F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"),
                           F.col("n_sh").alias("nb")), "b")
        .select(
            "a", "b",
            (F.col("n_inter")
             / (F.col("na") + F.col("nb") - F.col("n_inter"))
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---- SimHash -------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc, entirely JVM-side (whole-stage codegen; zero
    Python in the path — this was the last Python-heavy inner loop of the
    textops family). Tokens = distinct lowercased whitespace words; per
    token one xxhash64; per bit a +/-1 vote summed in a 64-column Catalyst
    aggregation (map-side partial agg: exploded token rows stay co-located
    with their doc, so the shuffle is one row of 64 longs per doc); the
    signature packs the positive-vote bits. Docs with no tokens carry
    signature 0 (left join back). Returns (doc_id, simhash LONG)."""
    ids = docs.select(F.col(id_col).alias("doc_id"))
    # materialize the token hash BEFORE the aggregation: agg expressions are
    # not common-subexpression-eliminated, so referencing xxhash64(tok)
    # inside all 64 sums would hash every token 64 times (measured 5x)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(words_expr(F.col(text_col))))
         .alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    h = F.col("h")
    votes = toks.groupBy("doc_id").agg(*[
        F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)
         .alias(f"v{b}")
        for b in range(64)
    ])
    bit_terms = [
        F.when(F.col(f"v{b}") > 0,
               F.shiftleft(F.lit(1).cast("long"), b))
        .otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    packed = bit_terms[0]
    for t in bit_terms[1:]:
        packed = packed + t
    sig = votes.select("doc_id", packed.alias("simhash"))
    return ids.join(sig, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit(0).cast("long"))
        .alias("simhash"))


SIMHASH_BROADCAST_MAX_DOCS = 1_000_000  # ~4M chunk rows / ~100 MB relation


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Banding: split
    the 64-bit hash into 4x16-bit chunks — any pair within hamming 3 agrees
    on >=1 chunk (pigeonhole), so the self-join runs per chunk bucket, never
    all-pairs. Exact hamming check via bit_count(a XOR b).

    Pair-space shape (this output is inherently quadratic on clustered
    corpora — 15% of ALL pairs sit within hamming 8 of each other on the
    sf1.0 documents fixture): the original plan deduped the up-to-4x
    candidate multiset with a post-join `distinct()`, i.e. one Exchange
    carrying every candidate pair (~GBs at sf1.0, the whole 117 s wall),
    and hot 16-bit buckets made the generating task a straggler. Now:

    - dedup is a MAP-SIDE predicate, not a shuffle: a pair is emitted only
      by its LOWEST agreeing chunk (recomputable from ha/hb in-row), so
      each qualifying pair appears exactly once and nothing shuffles after
      the join (guide §2.4 — remove the exchange outright).
    - the exact-hamming filter runs BEFORE the dedup predicate (cheapest
      first; most candidates at the default hamming 3 die here).
    - under SIMHASH_BROADCAST_MAX_DOCS the build side broadcasts and the
      probe side spreads round-robin, so hot buckets cost the same as cold
      ones (every task probes the same hash relation with an even mix of
      rows — skew-free by construction, guide §2.5/§3.1); above it the
      banded shuffle join remains, still without the distinct.
    """
    sig = simhash_signatures(docs).persist()
    n_docs = sig.count()  # also materializes the cache both sides reuse

    def _chunks(side):
        return side.select(
            "doc_id", "simhash",
            F.explode(F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_id"),
                    F.shiftright("simhash", c * 16).bitwiseAND(
                        F.lit(0xFFFF)).alias("chunk_val"),
                ) for c in range(4)
            ])).alias("ck"),
        ).select("doc_id", "simhash", "ck.chunk_id", "ck.chunk_val")

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    probe = _chunks(sig.repartition(parallelism))
    build = _chunks(sig)
    if n_docs <= SIMHASH_BROADCAST_MAX_DOCS:
        build = F.broadcast(build)
    joined = (
        probe.alias("x").join(build.alias("y"), ["chunk_id", "chunk_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"),
                F.col("x.simhash").alias("ha"),
                F.col("y.simhash").alias("hb"),
                F.col("chunk_id"))
        .withColumn("hamming",
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
    )

    def _agree(c):
        return (F.shiftright("ha", c * 16).bitwiseAND(F.lit(0xFFFF))
                == F.shiftright("hb", c * 16).bitwiseAND(F.lit(0xFFFF)))

    first_agreeing = (
        F.when(_agree(0), 0).when(_agree(1), 1).when(_agree(2), 2)
        .otherwise(3))
    return (joined.filter(F.col("chunk_id") == first_agreeing)
            .select("a", "b", "hamming"))


# ---- language ID / quality / tokens ---------------------------------------------

_EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")


def _lang_id_exprs(text_col: str = "text") -> dict:
    """Per-row language-ID expressions ({stopword_ratio, lang_pred}) —
    shared by lang_id and the fused cleaning_decision map stage."""
    words = words_expr(F.col(text_col))
    hits = F.size(F.filter(
        words, lambda w: w.isin(*[F.lit(s) for s in _EN_STOPWORDS])
    ))
    ratio = F.when(F.size(words) > 0,
                   hits.cast("double") / F.size(words)).otherwise(F.lit(0.0))
    return {
        "stopword_ratio": F.round(ratio, 4),
        "lang_pred": F.when(ratio >= 0.08, F.lit("en"))
                      .otherwise(F.lit("und")),
    }


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English stopword hit-ratio over tokens.
    SQL-portable by construction (CASE + array ops both engines support)."""
    ex = _lang_id_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ex["stopword_ratio"].alias("stopword_ratio"),
        ex["lang_pred"].alias("lang_pred"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / punctuation / token statistics — the standard webtext quality
    features, all Catalyst expressions."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = words_expr(t)
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:'\"()]", ""))
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(words, F.lit(0),
                                   lambda acc, w: acc + F.length(w))
                       .cast("double") / n_words).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(F.when(n_chars > 0, n_punct.cast("double") / n_chars)
                .otherwise(F.lit(0.0)), 4).alias("punct_ratio"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
    )


# BPE-ish pre-tokenizer (the GPT-2 pattern's portable core): letter runs,
# single digits, single non-space punctuation — subword merges only ever
# split WITHIN these pieces, so their count is a true lower bound and a
# far better LLM-token estimate than chars/4
_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Token counting three ways, all pure Catalyst: whitespace tokens, a
    BPE-ish regex pre-tokenization (see _BPE_RE), and the chars/4
    heuristic."""
    t = F.col(text_col)
    words = words_expr(t)
    non_space = F.length(F.regexp_replace(t, r"\s+", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), 0))
         .cast("long").alias("n_tokens_re"),
        F.ceil(non_space / F.lit(4.0)).cast("long").alias("n_tokens_bpe_est"),
    )


# ---- Gopher-style quality filters --------------------------------------------

# the Gopher paper's repetition/format heuristics, expressed as pure Catalyst
# per-row expressions (lines and words are array columns — no explode, no
# shuffle; this filter runs inside the scan stage at 100 TB)
_GOPHER_BULLETS = ("- ", "* ", "• ")


def _gopher_exprs(text_col: str = "text") -> dict:
    """Per-row Gopher signal expressions — shared by gopher_quality and the
    fused cleaning_decision map stage (each value is a Column over the text
    column; no DataFrame involved, so callers can fuse them into whatever
    projection they already run)."""
    t = F.col(text_col)
    words = words_expr(t)
    n_words = F.size(words)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    dlines = F.array_distinct(lines)
    line_chars = F.aggregate(lines, F.lit(0),
                             lambda acc, l: acc + F.length(l))
    dline_chars = F.aggregate(dlines, F.lit(0),
                              lambda acc, l: acc + F.length(l))
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(words, F.lit(0),
                                   lambda acc, w: acc + F.length(w))
                       .cast("double") / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#")))
    n_ellipsis = ((F.length(t) - F.length(F.replace(t, F.lit("..."))))
                  / F.lit(3)).cast("long")
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    is_bullet = lambda l: (F.ltrim(l).startswith(_GOPHER_BULLETS[0])
                           | F.ltrim(l).startswith(_GOPHER_BULLETS[1])
                           | F.ltrim(l).startswith(_GOPHER_BULLETS[2]))
    frac_bullet = F.size(F.filter(lines, is_bullet)).cast("double") / n_lines
    frac_ellipsis = (F.size(F.filter(
        lines, lambda l: F.rtrim(l).endswith("...")
    )).cast("double") / n_lines)
    frac_alpha = F.when(n_words > 0, F.size(F.filter(
        words, lambda w: w.rlike("[a-z]")
    )).cast("double") / n_words).otherwise(F.lit(0.0))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(s) for s in _EN_STOPWORDS])))
    frac_dup_lines = (n_lines - F.size(dlines)).cast("double") / n_lines
    frac_dup_chars = F.when(
        line_chars > 0,
        (line_chars - dline_chars).cast("double") / line_chars
    ).otherwise(F.lit(0.0))
    passes = ((n_words >= 50) & (n_words <= 100000)
              & (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
              & (symbol_ratio < 0.1) & (frac_bullet < 0.9)
              & (frac_ellipsis < 0.3) & (frac_alpha > 0.8)
              & (stop_hits >= 2) & (frac_dup_lines < 0.3))
    return {
        "n_words": n_words,
        "mean_word_len": F.round(mean_wlen, 4),
        "symbol_ratio": F.round(symbol_ratio, 4),
        "frac_bullet_lines": F.round(frac_bullet, 4),
        "frac_ellipsis_lines": F.round(frac_ellipsis, 4),
        "frac_alpha_words": F.round(frac_alpha, 4),
        "n_stopwords": stop_hits,
        "frac_dup_lines": F.round(frac_dup_lines, 4),
        "frac_dup_line_chars": F.round(frac_dup_chars, 4),
        "passes_gopher": passes,
    }


def gopher_quality(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Gopher-rules quality signals + verdict, all whole-stage-codegen
    Catalyst (zero shuffle: every signal is a per-row array expression).

    Signals: word count, mean word length, symbol-to-word ratio ('#' and
    '...'), bullet-start / ellipsis-end line fractions, fraction of words
    containing an alphabetic character, distinct-stopword hits, duplicate
    -line fraction (by line and by character mass). `passes_gopher` applies
    the published thresholds (50<=words<=100k, 3<=mean_wlen<=10,
    symbol<0.1, bullets<0.9, ellipsis<0.3, alpha>0.8, stopwords>=2,
    dup_lines<0.3)."""
    ex = _gopher_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[ex[name].alias(name) for name in (
            "n_words", "mean_word_len", "symbol_ratio",
            "frac_bullet_lines", "frac_ellipsis_lines", "frac_alpha_words",
            "n_stopwords", "frac_dup_lines", "frac_dup_line_chars",
            "passes_gopher")],
    )


def _dup_gram_frac_expr(n: int, text_col: str = "text"):
    """Just the dup_gram_frac column of _repetition_exprs, with a 3-field
    fold state instead of 5 — cleaning_decision only consumes this one
    signal, and the interpreted lambda's cost scales with the state width.
    Values identical to _repetition_exprs()['dup_gram_frac']."""
    words = words_expr(F.col(text_col))
    grams = F.filter(
        F.when(F.size(words) >= n, shingles_expr(words, n))
         .otherwise(F.array().cast("array<string>")),
        lambda g: g != F.lit(""))
    g = F.array_sort(grams)
    zero = F.lit(0).cast("long")
    dup_flush = lambda acc: (acc["dup"] + F.when(acc["run"] >= 2, acc["run"])
                             .otherwise(zero)).alias("dup")
    st = F.aggregate(
        g,
        F.struct(F.lit("").alias("prev"), zero.alias("run"),
                 zero.alias("dup")),
        lambda acc, x: F.when(
            x == acc["prev"],
            F.struct(acc["prev"].alias("prev"),
                     (acc["run"] + 1).alias("run"),
                     acc["dup"].alias("dup")),
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("run"),
                     dup_flush(acc))),
        lambda acc: F.struct(dup_flush(acc)),
    )
    ng = F.size(g).cast("long")
    return F.round(
        F.when(ng > 0, st["dup"].cast("double") / ng)
        .otherwise(F.lit(0.0)), 4)


def _repetition_exprs(n: int, text_col: str = "text") -> dict:
    """Per-ROW repetition profile expressions — the distributed gram
    explode + two aggregations this replaced shuffled ~(words per doc)
    rows per document twice; but every statistic is a function of ONE
    document's gram multiset, so it computes inside the scan stage with
    zero shuffle (guide §2.4): sort the row's gram array and fold it once,
    counting runs of equal grams (a run of length c IS the per-gram count
    the groupBy used to produce). Values are bit-identical: the same
    integer counts feed the same double divisions.

    Returns {n_grams, top_gram_frac, dup_gram_frac, dup_char_frac} Column
    expressions (n_grams as double — see repetition_stats docstring)."""
    words = words_expr(F.col(text_col))
    grams = F.filter(
        F.when(F.size(words) >= n, shingles_expr(words, n))
         .otherwise(F.array().cast("array<string>")),
        lambda g: g != F.lit(""))
    g = F.array_sort(grams)
    zero = F.lit(0).cast("long")

    def _flush(acc):
        # fold the trailing run into (top, dup, dupch)
        return (
            F.greatest(acc["top"], acc["run"]).alias("top"),
            (acc["dup"] + F.when(acc["run"] >= 2, acc["run"])
             .otherwise(zero)).alias("dup"),
            (acc["dupch"] + F.when(acc["run"] >= 2,
                                   acc["run"] * F.length(acc["prev"]))
             .otherwise(zero)).alias("dupch"),
        )

    st = F.aggregate(
        g,
        F.struct(F.lit("").alias("prev"), zero.alias("run"),
                 zero.alias("top"), zero.alias("dup"),
                 zero.alias("dupch")),
        lambda acc, x: F.when(
            x == acc["prev"],
            F.struct(acc["prev"].alias("prev"),
                     (acc["run"] + 1).alias("run"), acc["top"].alias("top"),
                     acc["dup"].alias("dup"), acc["dupch"].alias("dupch")),
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("run"),
                     *_flush(acc))),
        lambda acc: F.struct(*_flush(acc)),
    )
    ng = F.size(g).cast("long")
    chars = F.aggregate(g, zero, lambda acc, x: acc + F.length(x))
    return {
        "n_grams": ng.cast("double"),
        "top_gram_frac": F.round(
            F.when(ng > 0, st["top"].cast("double") / ng)
            .otherwise(F.lit(0.0)), 4),
        "dup_gram_frac": F.round(
            F.when(ng > 0, st["dup"].cast("double") / ng)
            .otherwise(F.lit(0.0)), 4),
        "dup_char_frac": F.round(
            F.when(chars > 0, st["dupch"].cast("double") / chars)
            .otherwise(F.lit(0.0)), 4),
    }


def repetition_stats(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document n-gram repetition profile (the Gopher 'fraction of
    characters in duplicate n-grams' family), computed per ROW with zero
    shuffle (_repetition_exprs — the former explode + double groupBy +
    join-back moved ~|words| rows per doc through two exchanges for a
    statistic that never crosses documents). Docs with < n words report
    zeros.

    Returns (doc_id, n_grams, top_gram_frac, dup_gram_frac,
    dup_char_frac): occurrence share of the most common gram, occurrence
    share of all grams seen more than once, and the same weighted by gram
    character mass. n_grams is emitted as DOUBLE: the driver's DuckDB
    oracle computes it via sum(BIGINT) -> HUGEINT which lands in pandas as
    float64, and the driver's value hash compares materialized values —
    CORRECTNESS_r05's one red family (475.0 vs 475, values identical).
    Counts are < 2^53 so the double is exact."""
    ex = _repetition_exprs(n, text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ex["n_grams"].alias("n_grams"),
        ex["top_gram_frac"].alias("top_gram_frac"),
        ex["dup_gram_frac"].alias("dup_gram_frac"),
        ex["dup_char_frac"].alias("dup_char_frac"),
    )


# ---- benchmark decontamination ------------------------------------------------

def decontaminate(docs: DataFrame, bench_mod: int = 20, shingle_n: int = 3,
                  frac_threshold: float = 0.8, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-gram shingles overlap an eval/benchmark set (here the deterministic
    doc_id % bench_mod == 0 slice stands in for the benchmark corpus).

    Scale shape — the standard inverted-index decontamination join: the
    benchmark's DISTINCT shingle universe (small: benchmarks are MBs, the
    corpus is TBs) joins against corpus shingles; at cluster scale Spark's
    AQE broadcasts it, so the corpus-side scan never shuffles its text.
    Returns one row per NON-benchmark doc: (doc_id, n_shingles,
    n_contaminated, contamination_frac, is_contaminated)."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    bench = d.filter(F.col("doc_id") % bench_mod == 0)
    corpus = d.filter(F.col("doc_id") % bench_mod != 0)
    bsh = doc_shingles(bench, shingle_n, text_col=text_col) \
        .select("shingle").distinct()
    csh = doc_shingles(corpus, shingle_n, text_col=text_col)
    # ONE pass over the corpus shingles (the old sizes/hits pair computed
    # doc_shingles twice — no ReusedExchange possible across the two
    # aggregation subtrees): left-join the bench set as a per-shingle flag,
    # then a single per-doc rollup counts total and contaminated together.
    # The bench side is broadcast outright — benchmarks are MBs by
    # definition while the corpus is TBs (guide §3.1), so the corpus-side
    # shingles never shuffle; the only exchange left is the skinny per-doc
    # count rollup.
    flagged = csh.join(
        F.broadcast(bsh.withColumn("_hit", F.lit(1))), "shingle", "left")
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
    )
    frac = F.col("n_contaminated").cast("double") / F.col("n_shingles")
    return agg.select(
        "doc_id", "n_shingles", "n_contaminated",
        F.round(frac, 4).alias("contamination_frac"),
        (frac >= frac_threshold).alias("is_contaminated"),
    )


# ---- deterministic corpus split + dedup retention ---------------------------

# lexicographic thresholds over the first 8 hex chars of md5(key): lowercase
# fixed-width hex compares identically to its numeric value, and both Spark
# and DuckDB emit lowercase hex — so the split is exact cross-engine string
# comparison, no hex->int conversion (which the engines spell differently)
_SPLIT_BOUNDS = (("train", "e6666666"), ("val", "f3333333"))  # 90 / 5 / 5


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               salt: str = "split-v1") -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by md5 of the salted
    doc id. Content-independent and stable across runs/engines/cluster
    sizes — the property a reproducible training-data pipeline needs from
    its split (no sampling, no RNG state). Change `salt` to draw a fresh
    independent split."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string")).cast("binary")), 1, 8)
    split = F.when(h < _SPLIT_BOUNDS[0][1], _SPLIT_BOUNDS[0][0]) \
             .when(h < _SPLIT_BOUNDS[1][1], _SPLIT_BOUNDS[1][0]) \
             .otherwise("test")
    return docs.select(F.col(id_col).alias("doc_id"),
                       h.alias("h8"), split.alias("split"))


def hash_split_sql(docs_sql: str, id_col: str = "doc_id",
                   salt: str = "split-v1") -> str:
    """DuckDB oracle for hash_split — the identical string comparison."""
    h = f"substring(md5('{salt}:' || {id_col}), 1, 8)"
    return (
        f"SELECT {id_col} AS doc_id, {h} AS h8,\n"
        f"       CASE WHEN {h} < '{_SPLIT_BOUNDS[0][1]}'"
        f" THEN '{_SPLIT_BOUNDS[0][0]}'\n"
        f"            WHEN {h} < '{_SPLIT_BOUNDS[1][1]}'"
        f" THEN '{_SPLIT_BOUNDS[1][0]}'\n"
        f"            ELSE 'test' END AS split\n"
        f"FROM ({docs_sql})"
    )


def dedup_retention(docs: DataFrame, pairs: DataFrame, iterations: int = 6,
                    id_col: str = "doc_id",
                    a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Pairs -> clusters -> keep/drop: the end of the dedup pipeline. Joins
    each document against its near-dup cluster label (graph.cc_labels over
    the pair graph); the label IS the canonical doc (cluster-min id), so
    keep = "this doc is its own canonical". Docs in no pair keep themselves.
    Returns (doc_id, canonical_id, keep) — the skinny decision table a
    100 TB retention pass joins back against the corpus."""
    from .graph import cc_labels

    labels = cc_labels(pairs, iterations, src=a_col, dst=b_col)
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        d.join(labels, d["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("canonical_id"),
            (F.coalesce("label", "doc_id") == F.col("doc_id")).alias("keep"),
        )
    )


# ---- exact-substring duplicate spans (Lee et al. 2022) -----------------------

def duplicate_span_stats(docs: DataFrame, k: int = 5, min_count: int = 2,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Exact-substring dedup accounting (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): mark every token position
    whose k-token gram occurs >= min_count times CORPUS-WIDE, merge
    overlapping [p, p+k) spans per document, and report the removable token
    mass. This is the suffix-array dedup's semantics restated as a
    distributed gram join — the standard way to scale it on Spark.

    Scale shape:
    - positions shuffle as (doc_id, pos, md5-of-gram) — a 32-hex digest, not
      the gram text (same trick as dedup_exact), so the corpus-wide gram
      count groupBy carries ~50 bytes/row and partial-aggregates map-side.
    - the duplicate-gram filter is an inverted-index join on the digest; the
      pair space is never materialized.
    - span merging is a per-doc lag window over ONLY the duplicated
      positions (a tiny minority of the corpus) — overlapping [p, p+k)
      intervals merge iff the gap to the previous duplicated position < k,
      so n_removed = k for the first position + min(gap, k) for each next.

    Returns (doc_id, n_tokens, n_dup_positions, n_spans, n_removed_tokens,
    n_kept_tokens) — all BIGINT, bit-exact under any partitioning."""
    from pyspark.sql import Window

    words = words_expr(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("ws"))
    # k-gram strings via the zip_with chain (shingles_expr — same strings,
    # no per-index slice+concat_ws lambda; for size >= k the short-doc
    # branch never fires, so the md5 digests are byte-identical)
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("ws") >= k,
                F.transform(shingles_expr(F.col("ws"), k),
                            lambda s: F.md5(s.cast("binary"))),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "dg"),
    )
    dup_digests = (grams.groupBy("dg").agg(F.count("*").alias("c"))
                   .filter(F.col("c") >= min_count).select("dg"))
    dup_pos = grams.join(dup_digests, "dg").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    spans = dup_pos.select(
        "doc_id",
        F.when(prev.isNull() | (F.col("pos") - prev >= k), 1)
         .otherwise(0).alias("new_span"),
        F.when(prev.isNull(), F.lit(k))
         .otherwise(F.least(F.col("pos") - prev, F.lit(k)))
         .alias("contrib"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_positions"),
        F.sum("new_span").alias("n_spans"),
        F.sum("contrib").alias("n_removed_tokens"),
    )
    sizes = base.select("doc_id", F.size("ws").cast("long").alias("n_tokens"))
    out = sizes.join(per_doc, "doc_id", "left")
    removed = F.coalesce("n_removed_tokens", F.lit(0)).cast("long")
    return out.select(
        "doc_id", "n_tokens",
        F.coalesce("n_dup_positions", F.lit(0)).cast("long")
         .alias("n_dup_positions"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        removed.alias("n_removed_tokens"),
        (F.col("n_tokens") - removed).alias("n_kept_tokens"),
    )


# ---- C4-style line filters (Raffel et al. 2020) -------------------------------

def c4_filters(docs: DataFrame, min_words: int = 4,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, §2.2): keep only lines that
    end in terminal punctuation (. ! ? ") AND have >= min_words words AND do
    not mention 'javascript'; drop the WHOLE document if it contains
    'lorem ipsum' or a curly brace '{' (boilerplate/code page signals).

    Catalyst-only — split / higher-order filter / array_join; the kept text
    never leaves the JVM. Per-line decisions are embarrassingly parallel, so
    at 100 TB this is a pure map stage with zero shuffle.

    Returns (doc_id, n_lines, n_kept_lines, n_kept_words, passes_c4,
    kept_text); a failed document reports 0 kept lines/words and ''."""
    lines = F.split(F.col(text_col), "\n")
    doc_bad = (F.lower(F.col(text_col)).contains("lorem ipsum")
               | F.col(text_col).contains("{"))

    def _line_ok(l):
        lw = F.filter(F.split(l, r"\s+"), lambda x: x != F.lit(""))
        return (F.rtrim(l).rlike(r'[.!?"]$')
                & (F.size(lw) >= min_words)
                & ~F.lower(l).contains("javascript"))

    kept = F.when(doc_bad, F.array().cast("array<string>")) \
            .otherwise(F.filter(lines, _line_ok))
    kept_text = F.array_join(kept, "\n")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.size(F.filter(F.split(kept_text, r"\s+"),
                        lambda x: x != F.lit("")))
         .cast("long").alias("n_kept_words"),
        (~doc_bad & (F.size(kept) > 0)).alias("passes_c4"),
        kept_text.alias("kept_text"),
    )


# ---- TF-IDF top-k keyword extraction ------------------------------------------

def tfidf_topk(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Top-k salient terms per document by a deterministic TF-IDF variant:
    score = tf * N / df as one IEEE double division of exact integers —
    identical on every engine, unlike ln-based idf whose libm rounding can
    differ. Ranking ties break on the term string, so the top-k set is
    unique.

    Scale shape: (doc, term, tf) partial-aggregates map-side; the document
    frequency table is a skinny (term, df) aggregate joined back on term —
    at cluster scale AQE broadcasts it when the vocabulary is small, and the
    per-doc top-k is a WindowGroupLimit (rank pushdown), never a full sort.

    Returns (doc_id, term, tf, df, score, rank), rank in 1..k."""
    from pyspark.sql import Window

    words = words_expr(F.col(text_col))
    terms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term", "tf", "df",
                      ((F.col("tf") * F.col("n_docs")).cast("double")
                       / F.col("df")).alias("score")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df",
                    F.round("score", 4).alias("score"), "rank"))


# ---- inverted posting-list index ---------------------------------------------

def inverted_postings(docs: DataFrame, min_df: int = 2,
                      max_df: int | None = None, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Term -> postings-list index (term, df, postings): the serving-side
    artifact of a text corpus — distinct doc ids per term, numerically
    sorted, serialized as a comma-joined string (engine-portable, hashable
    by the correctness gate like backlink_collect's referrer lists).

    Scale shape: (doc, term) pairs dedupe map-side (partial agg), ONE
    shuffle on term builds each postings list. Skew is the stopword
    problem — a term in half the corpus owns a posting list the size of
    the corpus — so `max_df` is the classic stopword cut (drop terms above
    it); a production index would additionally bucket-shard the survivors'
    lists. min_df drops hapax noise the way every IR index does."""
    terms = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(words_expr(F.col(text_col))).alias("term"),
    ).distinct()
    agg = (terms.groupBy("term")
           .agg(F.sort_array(F.collect_set("doc_id")).alias("p")))
    out = agg.select(
        "term", F.size("p").cast("long").alias("df"),
        F.concat_ws(",", F.transform(
            "p", lambda x: x.cast("string"))).alias("postings"))
    out = out.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out


def inverted_postings_sql(docs_sql: str, min_df: int = 2,
                          max_df: int | None = None, id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB oracle: identical distinct-pair aggregation and ordering."""
    w = (f"list_filter(string_split_regex(lower({text_col}), '\\s+'),"
         f" x -> x <> '')")
    cap = f" AND count(*) <= {int(max_df)}" if max_df is not None else ""
    return f"""
SELECT term, CAST(count(*) AS BIGINT) AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM (SELECT DISTINCT CAST({id_col} AS BIGINT) AS doc_id, term
      FROM (SELECT {id_col}, unnest({w}) AS term FROM ({docs_sql})))
GROUP BY term
HAVING count(*) >= {int(min_df)}{cap}
"""


# ---- Unicode text normalization ----------------------------------------------

# C0 controls minus \t \n \r, plus DEL — the bytes scrubbed from web text
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_text(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Web-text canonical form: Unicode NFC composition, C0-control/DEL
    strip, ASCII-whitespace collapse, trim. The prerequisite every dedup
    and fingerprint stage assumes — 'e'+COMBINING ACUTE and precomposed
    'é' must hash identically or near-dup recall silently drops.

    One pandas-UDF crossing for NFC (no JVM builtin exists); the strip and
    collapse are Catalyst regexes AROUND it so the Python stage touches each
    string exactly once. Zero shuffle — a pure map stage at any scale. NFC
    is stability-guaranteed by Unicode, so DuckDB's utf8proc produces the
    identical bytes (the oracle equality in the harness).

    Returns (doc_id, norm_text, changed)."""
    from ..functions.udfs import nfc_udf

    stripped = F.regexp_replace(F.col(text_col), _CTRL_RE, "")
    norm = F.trim(F.regexp_replace(nfc_udf(stripped), r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        norm.alias("norm_text"),
        (norm != F.col(text_col)).alias("changed"))


def normalize_text_sql(docs_sql: str, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB oracle: nfc_normalize (utf8proc) + the same regex pipeline."""
    stripped = f"regexp_replace({text_col}, '{_CTRL_RE}', '', 'g')"
    norm = (f"trim(regexp_replace(nfc_normalize({stripped}),"
            f" '\\s+', ' ', 'g'))")
    return (f"SELECT {id_col} AS doc_id, {norm} AS norm_text,\n"
            f"       {norm} <> {text_col} AS changed\nFROM ({docs_sql})")

