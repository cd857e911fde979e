"""robots.txt semantics (SURVEY.md S6/J3).

[UP webchecker.py Checker.addrobot]: one robotparser.RobotFileParser per host,
fetched once, consulted before every page fetch. Here the robots universe is
rows of the pages table whose path is /robots.txt; parsing is pinned to
stdlib urllib.robotparser, absent row -> allow-all.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

# keyed by the robots body itself — dict equality, no hash-collision risk;
# memory bounded by the 4096-entry clear below
_CACHE: dict[str, RobotFileParser] = {}


def _parser_for(robots_txt: str) -> RobotFileParser:
    key = robots_txt
    rp = _CACHE.get(key)
    if rp is None:
        rp = RobotFileParser()
        rp.parse(robots_txt.splitlines())
        if len(_CACHE) > 4096:
            _CACHE.clear()
        _CACHE[key] = rp
    return rp


def robots_allowed(robots_txt: str | None, url: str, agent: str) -> bool:
    """True iff ``agent`` may fetch ``url`` under ``robots_txt``.
    None/empty robots (no robots.txt row for the domain) -> allowed."""
    if not robots_txt:
        return True
    try:
        return _parser_for(robots_txt).can_fetch(agent, url)
    except Exception:
        return True


def crawl_delay(robots_txt: str | None, agent: str) -> float | None:
    """Crawl-delay if present (recorded in metrics; FIXTURES.md B.3)."""
    if not robots_txt:
        return None
    try:
        d = _parser_for(robots_txt).crawl_delay(agent)
        return float(d) if d is not None else None
    except Exception:
        return None
