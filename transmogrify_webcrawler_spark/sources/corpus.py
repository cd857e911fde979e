"""Deterministic synthetic crawl corpus (FIXTURES.md §B; seed=42, no external data).

Generates the ``pages`` table in the exact contract shape
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING —
BASELINE.json input_hint), where ``text`` is produced by the pinned oracle
extractor at generation time, closing the byte-identity loop.

Page variety per FIXTURES.md B.1: link tags a/img/frame/area/link, <base href>
subset, index URLs ending '/', canonicalization traps (uppercase host, :80,
dot-segments, fragments, percent-encoding), ignore targets (/private/, .zip),
oversize pages, non-HTML payloads (PDF/JPEG/plain-text magic), link-heavy
anchor-text pages, script/style/head content + entities + \r\n runs, external
out-of-scope links. Host skew: domain 0 holds >=60%% of pages (Zipf-ish).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from ..oracle.extract import extract_text
from ..oracle.urlnorm import canonicalize

SEED = 42

_PARAGRAPH_WORDS = (
    "crawl frontier spark arrow shuffle partition bloom filter wave snapshot "
    "politeness domain priority queue link anchor robots parquet schema batch "
    "vector column codegen skew salt broadcast checkpoint resume lineage metric"
).split()


_BASE_WORDS: list[str] | None = None


def _words(rng: random.Random, n: int) -> str:
    """n pseudo-random words via a random slice of a fixed pre-shuffled base
    sequence — one rng call per paragraph instead of one per word (heavy
    corpora need 10^9 words). Deterministic given rng state."""
    global _BASE_WORDS
    if _BASE_WORDS is None:
        r = random.Random("words-base")
        _BASE_WORDS = [r.choice(_PARAGRAPH_WORDS) for _ in range(4096)]
    start = rng.randrange(4096)
    out: list[str] = []
    while n > 0:
        take = min(n, 4096 - start)
        out.extend(_BASE_WORDS[start:start + take])
        n -= take
        start = 0
    return " ".join(out)


def _page_url(domain: str, i: int, rng: random.Random) -> str:
    """Raw (pre-canonicalization) URL for page i; a slice of pages carries
    canonicalization traps that must collapse to the same url_canon."""
    base = f"http://{domain}"
    if i == 0:
        return base + "/"
    path = f"/p/{i}.html"
    if i % 17 == 3:
        path = f"/d{i % 5}/"  # index page (isindex, T4)
    elif i % 23 == 7:
        path = f"/docs/x/../p/{i}.html"  # dot-segment trap
    elif i % 23 == 11:
        path = f"/p/%7E{i}.html"  # percent-encoding trap (~ is unreserved)
    trap = i % 13
    if trap == 1:
        return f"HTTP://{domain.upper()}{path}"
    if trap == 2:
        return f"http://{domain}:80{path}"
    if trap == 3:
        return base + path + f"#frag{i}"
    return base + path


def _html_page(rng, url_c, domain, i, n_pages, domains, oversize=False,
               linkheavy=False, body_words=30):
    links = []
    deg = rng.randint(2, 12) if not linkheavy else rng.randint(20, 40)
    parts = [
        "<html><head><title>t%d</title><script>var x=1;</script>"
        "<style>.a{color:red}</style></head><body>" % i
    ]
    if i % 29 == 5:
        parts.append(f'<base href="http://{domain}/rebased/">')
    for k in range(deg):
        r = rng.random()
        if r < 0.15 and len(domains) > 1:  # cross-domain link
            tgt_dom = domains[rng.randrange(len(domains))]
        else:
            tgt_dom = domain
        tgt = rng.randrange(n_pages.get(tgt_dom, 1))
        href = _page_url(tgt_dom, tgt, rng)
        if tgt_dom == domain and rng.random() < 0.25:
            # root-relative href — exercises urljoin resolution (C1/T1)
            href = "/" + href.split("://", 1)[1].split("/", 1)[1]
        tag = rng.random()
        anchor_text = _words(rng, rng.randint(1, 4))
        if tag < 0.6:
            parts.append(f'<a href="{href}">{anchor_text}</a> ')
        elif tag < 0.7:
            parts.append(f'<img src="{href}">')
        elif tag < 0.8:
            parts.append(f'<link href="{href}">')
        elif tag < 0.9:
            parts.append(f'<area href="{href}">')
        else:
            parts.append(f'<frame src="{href}">')
        links.append(href)
    if rng.random() < 0.05:  # dangling link -> fetch_errors 'notfound'
        parts.append(f'<a href="http://{domain}/missing/{i}.html">gone</a>')
    if rng.random() < 0.2:  # external out-of-scope link (F2)
        parts.append('<a href="http://external.example.net/x">ext&nbsp;link</a>')
    if rng.random() < 0.3:  # ignore-pattern targets (F1)
        parts.append(f'<a href="http://{domain}/private/s{i}.html">secret</a>')
        parts.append(f'<a href="http://{domain}/a{i}.zip">zipfile</a>')
    if i % 31 == 9:  # name anchor (F6 nonames semantics)
        parts.append(f'<a name="sec{i}">section head</a>')
    # entities, \r\n runs, multi-whitespace (T5)
    parts.append(
        f"<p>body &amp; entit&eacute;s\r\n\r\n  {_words(rng, body_words)} </p>")
    if oversize:
        parts.append("<p>" + ("pad " * 40000) + "</p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


_PDF = b"%PDF-1.4 fake-minimal-pdf-payload\n%%EOF"
_JPG = b"\xff\xd8\xff\xe0" + b"\x00" * 32
_TXT = b"plain text payload, not html at all\nline two\n"


# pages generated per worker task: bounds BOTH worker RSS and the parent's
# ordered-map result buffer (a 40k-word page is ~280 KB of html; 2048 pages
# ~ 0.6 GB). The hot domain of a heavy corpus would otherwise accumulate
# tens of GB in one process (observed: 240k-page generation stalling with
# 16 workers at ~10 GB RSS each).
GEN_CHUNK = 2048


def _gen_domain(args):
    """One CHUNK of one domain's pages — independently seeded per
    (seed, domain, chunk start) so chunks generate identically whether run
    serially or in a process pool, at any chunk boundary placement chosen
    by the task planner. warc_ts is deterministic per (d_i, i): distinct
    monotone capture timestamps exercise 'latest capture wins' dedup on
    duplicate url_canons (e.g. two i values -> the same /dN/ index page)."""
    d_i, dom, n_pages, domains, seed, body_words, start, count = args
    rng = random.Random(f"{seed}:{d_i}:{start}")
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    rows = []
    for i in range(start, min(start + count, n_pages[dom])):
        url = _page_url(dom, i, rng)
        url_c = canonicalize(url)
        kind = rng.random()
        if i == 0:
            kind = 1.0  # roots are always HTML hubs
        if kind < 0.04:
            html = _PDF
        elif kind < 0.08:
            html = _JPG
        elif kind < 0.12:
            html = _TXT
        elif kind < 0.14:
            html = _html_page(rng, url_c, dom, i, n_pages, domains,
                              oversize=True, body_words=body_words)
        elif kind < 0.20:
            html = _html_page(rng, url_c, dom, i, n_pages, domains,
                              linkheavy=True, body_words=body_words)
        else:
            html = _html_page(rng, url_c, dom, i, n_pages, domains,
                              body_words=body_words)
        text = extract_text(html, url_c) if html[:1] == b"<" else ""
        rows.append(dict(
            url=url,
            warc_ts=ts0 + timedelta(minutes=d_i * 1_000_000 + i),
            html=html,
            text=text,
            lang="en",
        ))
    # robots.txt rows live in the pages table (FIXTURES.md B.3) — emitted
    # exactly once per domain, by its FIRST chunk
    if start > 0:
        return (d_i, start), rows
    if d_i == 1:
        robots = b"User-agent: *\nDisallow: /d1/\nCrawl-delay: 2\n"
    elif d_i == 2:
        robots = b"User-agent: *\nDisallow: /\n"
    elif d_i == 3:
        robots = None  # no robots.txt -> allow-all
    else:
        robots = b"User-agent: *\nDisallow: /private/\n"
    if robots is not None:
        rows.append(dict(
            url=f"http://{dom}/robots.txt", warc_ts=ts0, html=robots,
            text="", lang="en",
        ))
    if d_i == 4:
        # second robots.txt on a subdomain of the SAME registered domain —
        # the normal Common-Crawl case (www.example.com vs example.com).
        # Both engines must reduce to ONE robots row per registered_domain
        # via the pinned winner rule: max url_canon wins (www > bare host).
        rows.append(dict(
            url=f"http://www.{dom}/robots.txt", warc_ts=ts0,
            html=b"User-agent: *\nDisallow: /d3/\nCrawl-delay: 1\n",
            text="", lang="en",
        ))
    return (d_i, start), rows


def _gen_tasks(domains, n_pages, seed, body_words):
    """Chunked task list: (d_i, start) keys give a total order identical to
    the old per-domain ordering (rows concatenate as domain-major,
    index-minor), while bounding per-task memory at GEN_CHUNK pages."""
    tasks = []
    for d_i, dom in enumerate(domains):
        for start in range(0, n_pages[dom], GEN_CHUNK):
            tasks.append((d_i, dom, n_pages, domains, seed, body_words,
                          start, GEN_CHUNK))
    return tasks


def generate_corpus(n_domains: int = 8, total_pages: int = 400,
                    seed: int = SEED, maxsize: int = 64 * 1024,
                    body_words: int = 30, parallel: bool | None = None,
                    hot_share: float = 0.6):
    """Returns (pages_rows, seeds, robots_map).

    pages_rows: list of dicts (url, warc_ts, html, text, lang) — the contract
    shape. Deterministic for a given (n_domains, total_pages, seed,
    body_words) regardless of `parallel` (per-domain independent RNG).
    body_words scales page weight (30 -> ~4 KB; 2000 -> ~20 KB, closer to
    real web pages, used by the bench corpus so extraction dominates)."""
    domains = [f"example{d}.com" for d in range(n_domains)]
    # host skew: domain 0 gets 60% of pages, rest Zipf-ish
    n_pages: dict[str, int] = {}
    remaining = total_pages
    n_pages[domains[0]] = max(int(total_pages * hot_share), 1)
    remaining -= n_pages[domains[0]]
    weights = [1.0 / (k + 1) for k in range(1, n_domains)]
    wsum = sum(weights) or 1.0
    for k, d in enumerate(domains[1:]):
        n_pages[d] = max(int(remaining * weights[k] / wsum), 1)

    tasks = _gen_tasks(domains, n_pages, seed, body_words)
    if parallel is None:
        parallel = total_pages >= 20_000
    if parallel:
        import concurrent.futures as cf
        with cf.ProcessPoolExecutor(max_workers=min(16, len(tasks))) as ex:
            results = list(ex.map(_gen_domain, tasks))
    else:
        results = [_gen_domain(t) for t in tasks]
    rows = []
    for _key, chunk_rows in sorted(results, key=lambda r: r[0]):
        rows.extend(chunk_rows)

    seeds = [f"http://{domains[0]}/", f"http://{domains[0]}/p/1.html"]
    if n_domains > 1:
        seeds.append(f"http://{domains[1]}/")
    if n_domains > 2:
        seeds.append(f"http://{domains[2]}/")  # robots 'Disallow: /' domain
    if n_domains > 3:
        seeds.append(f"http://{domains[3]}/")
    robots_map = robots_best_map(rows)
    return rows, seeds, robots_map


def robots_best_map(rows) -> dict[str, str]:
    """One robots body per REGISTERED domain, pinned winner =
    max (url_canon, warc_ts, body) — mirrors the Spark robots_table
    groupBy(registered_domain).max(struct) exactly. ROOT-path only: a deep
    /mirror/robots.txt copy never enters the winner reduction (same rule as
    plans/crawl.py robots_table's canonical-path filter), so it can never
    lexically shadow the real root file for the whole domain."""
    from urllib.parse import urlsplit

    from ..oracle.urlnorm import registered_domain
    robots_best: dict[str, tuple] = {}
    for r in rows:
        if r["url"].endswith("/robots.txt"):
            c = canonicalize(r["url"])
            if urlsplit(c).path != "/robots.txt":
                continue
            dom = registered_domain(c)
            key = (c, r["warc_ts"], r["html"].decode("utf-8"))
            if dom not in robots_best or key > robots_best[dom]:
                robots_best[dom] = key
    return {dom: key[2] for dom, key in robots_best.items()}


DEFAULT_IGNORE = (r"/private/", r"\.zip$")


def pages_index(rows):
    """url_canon -> (raw_url, html) for the oracle crawler. Pinned winner for
    duplicate url_canon: max (warc_ts, url, html) — 'latest capture wins',
    matching the Spark side's max-struct winner; the html tie-break pins the
    pathological same-(url, ts)-different-body case to the bytewise-max body
    (identical bodies make it a no-op), exactly the engine's dup-slice
    rule in plans/crawl.py prepare_pages."""
    best = {}
    for r in rows:
        c = canonicalize(r["url"])
        key = (r["warc_ts"], r["url"], r["html"])
        if c not in best or key > best[c][0]:
            best[c] = (key, (r["url"], r["html"]))
    return {c: v for c, (_, v) in best.items()}


def generate_corpus_parquet(path: str, n_domains: int, total_pages: int,
                            seed: int = SEED, body_words: int = 30,
                            hot_share: float = 0.6,
                            row_group_size: int = 64):
    """Streaming variant of generate_corpus for corpora too big to hold in
    memory: each domain's rows are written to the parquet file as they
    arrive from the process pool (ordered map → byte-identical layout to the
    in-memory path modulo row-group boundaries). Returns seeds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    domains = [f"example{d}.com" for d in range(n_domains)]
    n_pages: dict[str, int] = {}
    remaining = total_pages
    n_pages[domains[0]] = max(int(total_pages * hot_share), 1)
    remaining -= n_pages[domains[0]]
    weights = [1.0 / (k + 1) for k in range(1, n_domains)]
    wsum = sum(weights) or 1.0
    for k, d in enumerate(domains[1:]):
        n_pages[d] = max(int(remaining * weights[k] / wsum), 1)

    tasks = _gen_tasks(domains, n_pages, seed, body_words)
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    import concurrent.futures as cf
    writer = pq.ParquetWriter(path, schema)
    try:
        with cf.ProcessPoolExecutor(max_workers=min(16, len(tasks))) as ex:
            for _key, rows in ex.map(_gen_domain, tasks):
                table = pa.table({
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"] for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }, schema=schema)
                writer.write_table(table, row_group_size=row_group_size)
                del table, rows
    finally:
        writer.close()

    seeds = [f"http://{domains[0]}/", f"http://{domains[0]}/p/1.html"]
    for d in (1, 2, 3):
        if n_domains > d:
            seeds.append(f"http://{domains[d]}/")
    return seeds


def write_parquet(rows, path: str, row_group_size: int = 1024):
    """Write pages rows to one parquet file via pyarrow (Spark-free, so the
    pytest oracle can build fixtures without a session).

    Small row groups matter: Spark parallelizes a single parquet file at row
    group granularity — one multi-GB row group means one scan task no matter
    how many cores (observed: a 3.6 GB single-group corpus pinned local[8]
    at ~1 busy core)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })
    pq.write_table(table, path, row_group_size=row_group_size)
