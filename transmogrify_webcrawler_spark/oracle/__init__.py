"""Pinned pure-Python semantics — the byte-identity truth (SURVEY.md §0, §5).

Everything here is plain Python with zero Spark imports. The distributed
pipeline calls these exact functions inside Arrow/pandas UDFs; pytest calls
them from the single-process oracle crawler. One implementation, two callers.

Reference parity notes: the upstream package (collective/transmogrify.webcrawler,
a fork of CPython Tools/webchecker/webchecker.py) is reconstructed from public
knowledge — the local checkout at /root/reference is empty (SURVEY.md §0), so
docstrings cite upstream-relative paths tagged [UP] instead of file:line.
"""

from .urlnorm import (
    canonicalize,
    join_and_canonicalize,
    registered_domain,
    url_to_path,
)
from .extract import (
    extract_links,
    extract_text,
    sniff_mimetype,
    recognize_type,
)
from .robots import robots_allowed
from .crawler import OracleCrawler, CrawlConfig

__all__ = [
    "canonicalize",
    "join_and_canonicalize",
    "registered_domain",
    "url_to_path",
    "extract_links",
    "extract_text",
    "sniff_mimetype",
    "recognize_type",
    "robots_allowed",
    "OracleCrawler",
    "CrawlConfig",
]
