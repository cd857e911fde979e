"""Single-process oracle crawler — the executable spec for the Spark engine.

Reproduces the reference's breadth-first crawl semantics
[UP webchecker.py Checker.run/dopage + webcrawler.py WebCrawler.__iter__]
as a deterministic wave algorithm. pytest runs THIS, the distributed pipeline
runs the same rules as DataFrame ops, and the two must match exactly:
byte-identical extracted_text per url, identical crawl set, identical
sortorder, identical seen set (BASELINE.json north_rule).

Pinned wave algorithm (every tie broken on url_canon — SURVEY.md §7.3):

  priority  = depth * 1000.0 - min(n_referrers, 999)        # BFS + in-link score
  select    = per-domain top-budget by (priority, url_canon),
              then global top-wave_size by (priority, url_canon)
  robots    = checked AFTER selection (selected-but-disallowed consumes a slot,
              emits no row; reason='robots')
  gates     = notfound -> 'notfound'; len(html) > maxsize -> 'maxsize'
  parse     = only mimetype text/html yields links + text; non-HTML items are
              emitted with extracted_text = ''
  sortorder = wave_offset + rank by (priority, url_canon) over *emitted* rows
  seen      = url_canon added at discovery time (seeds included)
  ignore    = re.search semantics (== Spark rlike), applied to discovered links
  scope     = link must start with one of the root prefixes, else ext_links
  backlinks = ALL in-scope referrers over the whole crawl (upstream accumulates
              into done items and yields only at the end), finalized post-crawl
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .urlnorm import canonicalize, registered_domain, url_to_path, is_index_url
from .extract import extract_links, extract_text, sniff_mimetype, recognize_type
from .robots import crawl_delay, robots_allowed

DEFAULT_AGENT = "transmogrify-webcrawler-spark/0.1"


@dataclass
class CrawlConfig:
    wave_size: int = 1000
    per_domain_budget: int = 100  # politeness budget: URLs per registered domain per wave
    max_pages: int = 10**9
    maxsize: int = 1 << 20
    max_waves: int = 100
    ignore: tuple[str, ...] = ()
    roots: tuple[str, ...] = ()  # default: derived from seeds (scheme://host/)
    agent: str = DEFAULT_AGENT
    nonames: bool = False  # F6 [UP webchecker -n]: drop <a name=…> anchors
    # politeness window a wave notionally spans: a domain whose robots.txt
    # sets Crawl-delay d gets per-wave budget min(per_domain_budget,
    # max(1, int(wave_seconds // d))) — the pinned crawl-delay rule
    wave_seconds: float = 30.0


@dataclass
class _FrontierEntry:
    depth: int
    referrers: set = field(default_factory=set)


class OracleCrawler:
    """pages: dict url_canon -> (raw_url, html_bytes); robots: dict
    registered_domain -> robots_txt."""

    def __init__(self, pages, robots, seeds, config: CrawlConfig):
        self.pages = pages
        self.robots = robots
        self.cfg = config
        self.ignore_pats = [re.compile(p) for p in config.ignore]
        seeds_c = [canonicalize(s) for s in seeds]
        self.roots = tuple(config.roots) or tuple(
            sorted({self._root_of(s) for s in seeds_c})
        )
        self.frontier: dict[str, _FrontierEntry] = {}
        self.seen: set[str] = set()
        self.crawled: list[dict] = []
        self.errors: list[dict] = []
        self.ext_links: list[dict] = []
        self.links: list[tuple[str, str]] = []  # in-scope (src, dst) edges
        self.metrics: list[dict] = []
        for s in seeds_c:
            if s not in self.seen:
                self.seen.add(s)
                self.frontier[s] = _FrontierEntry(depth=0)

    @staticmethod
    def _root_of(url_canon: str) -> str:
        scheme, rest = url_canon.split("://", 1)
        return scheme + "://" + rest.split("/", 1)[0] + "/"

    def _in_roots(self, url: str) -> bool:
        return any(url.startswith(r) for r in self.roots)

    def _ignored(self, url: str) -> bool:
        return any(p.search(url) for p in self.ignore_pats)

    def _site_of(self, url: str) -> str:
        for r in self.roots:
            if url.startswith(r):
                return r
        return self._root_of(url)

    def _priority(self, e: _FrontierEntry) -> float:
        return e.depth * 1000.0 - float(min(len(e.referrers), 999))

    def _domain_budget(self, dom: str) -> int:
        """Per-domain wave budget honoring robots Crawl-delay (pinned rule:
        a wave spans cfg.wave_seconds; delay d caps fetches at
        wave_seconds // d, floor 1 so delay-heavy hosts still progress)."""
        d = crawl_delay(self.robots.get(dom), self.cfg.agent)
        if d is None or d <= 0:
            return self.cfg.per_domain_budget
        return min(self.cfg.per_domain_budget,
                   max(1, int(self.cfg.wave_seconds // d)))

    def select_wave(self) -> list[tuple[str, float, int]]:
        """Returns [(url_canon, priority, depth)] — the wave's fetch set."""
        entries = [
            (u, self._priority(e), e.depth) for u, e in self.frontier.items()
        ]
        # per-domain politeness budget (crawl_delay-aware)
        by_dom: dict[str, list] = {}
        for u, p, d in entries:
            by_dom.setdefault(registered_domain(u), []).append((p, u, d))
        kept = []
        for dom, lst in by_dom.items():
            lst.sort()
            kept.extend(lst[: self._domain_budget(dom)])
        kept.sort()
        budget = min(self.cfg.wave_size, self.cfg.max_pages - len(self.crawled))
        return [(u, p, d) for p, u, d in kept[: max(budget, 0)]]

    def run_wave(self, wave: int) -> int:
        selected = self.select_wave()
        if not selected:
            return 0
        m = dict(wave=wave, selected=len(selected), fetched=0, parsed=0,
                 skipped_robots=0, skipped_maxsize=0, skipped_notfound=0,
                 bytes=0, new_links=0, ext_links=0, skipped_ignore=0)
        emitted = []
        discovered: dict[str, dict] = {}  # dst -> {depth, refs}
        for url, prio, depth in selected:
            del self.frontier[url]
            dom = registered_domain(url)
            if not robots_allowed(self.robots.get(dom), url, self.cfg.agent):
                self.errors.append(dict(url_canon=url, wave=wave, reason="robots"))
                m["skipped_robots"] += 1
                continue
            page = self.pages.get(url)
            if page is None:
                self.errors.append(dict(url_canon=url, wave=wave, reason="notfound"))
                m["skipped_notfound"] += 1
                continue
            raw_url, html = page
            if len(html) > self.cfg.maxsize:
                self.errors.append(dict(url_canon=url, wave=wave, reason="maxsize"))
                m["skipped_maxsize"] += 1
                continue
            m["fetched"] += 1
            m["bytes"] += len(html)
            mimetype = sniff_mimetype(html, url)
            text = ""
            if mimetype == "text/html":
                m["parsed"] += 1
                text = extract_text(html, url)
                for link in extract_links(html, url,
                                          nonames=self.cfg.nonames):
                    if not self._in_roots(link):
                        self.ext_links.append(dict(src=url, dst=link))
                        m["ext_links"] += 1
                        continue
                    if self._ignored(link):
                        m["skipped_ignore"] += 1
                        continue
                    self.links.append((url, link))
                    d = discovered.setdefault(link, dict(depth=depth + 1, refs=set()))
                    d["depth"] = min(d["depth"], depth + 1)
                    d["refs"].add(url)
            site = self._site_of(url)
            emitted.append(dict(
                url=raw_url, url_canon=url, wave=wave, depth=depth,
                priority=prio, path=url_to_path(url, site), site_url=site,
                mimetype=mimetype, content_type=recognize_type(mimetype),
                isindex=is_index_url(url), extracted_text=text,
            ))
        # deterministic sortorder over emitted rows
        emitted.sort(key=lambda r: (r["priority"], r["url_canon"]))
        base = len(self.crawled)
        for i, r in enumerate(emitted):
            r["sortorder"] = base + i
        self.crawled.extend(emitted)
        # frontier update: merge discoveries (J5 intra-wave dedup is the
        # groupBy above; J1 seen anti-join is the `in self.seen` check)
        for dst, d in sorted(discovered.items()):
            if dst in self.seen:
                e = self.frontier.get(dst)
                if e is not None:  # still pending: accumulate referrers
                    e.referrers |= d["refs"]
                    e.depth = min(e.depth, d["depth"])
                continue
            self.seen.add(dst)
            self.frontier[dst] = _FrontierEntry(depth=d["depth"], referrers=set(d["refs"]))
            m["new_links"] += 1
        self.metrics.append(m)
        return len(selected)

    def run(self) -> list[dict]:
        wave = 0
        while self.frontier and wave < self.cfg.max_waves \
                and len(self.crawled) < self.cfg.max_pages:
            if self.run_wave(wave) == 0:
                break
            wave += 1
        # finalize backlinks: ALL in-scope referrers over the whole crawl
        backmap: dict[str, set] = {}
        for src, dst in self.links:
            backmap.setdefault(dst, set()).add(src)
        for r in self.crawled:
            r["backlinks"] = sorted(backmap.get(r["url_canon"], ()))
        return self.crawled
