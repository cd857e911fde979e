"""Crawler-trap detection — URL-shape heuristics every production frontier
applies before admitting a link (calendar pages, session-id mazes,
infinitely-nesting path loops). The reference's defense was its ignore-regex
list (F1) + maxsize; at 10^10-URL scale shape-based trap scoring is the
standard complement: it needs NO per-domain state and runs as per-row
Catalyst expressions inside the frontier's link-admission scan — zero
shuffle, zero Python.

Signals:
- path depth (trap mazes nest without bound),
- max path-segment multiplicity (/a/b/a/b/a... — the same segment
  reappearing is the classic loop signature; the per-row distinct×filter
  count is O(m^2) on m<=depth segments, trivially small vs regex cost),
- query-parameter count (session-id / faceted-search explosions).

`is_trap` applies conservative defaults (depth > 12, any segment seen 3x,
> 8 params). Tune per deployment; false positives only delay a URL (the
frontier re-sees it via other in-links), so conservative is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DEPTH = 12
MAX_SEG_REPEAT = 3
MAX_PARAMS = 8


def trap_signals(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, depth, max_seg_repeat, n_params, is_trap) — one row per input
    row, pure Catalyst."""
    u = F.col(url_col)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    max_rep = F.coalesce(
        F.array_max(F.transform(
            F.array_distinct(segs),
            lambda s: F.size(F.filter(segs, lambda x: x == s)))),
        F.lit(0))
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.when(q != "", F.size(F.split(q, "&"))).otherwise(F.lit(0))
    depth = F.size(segs)
    return urls.select(
        u.alias("url"),
        depth.alias("depth"),
        max_rep.alias("max_seg_repeat"),
        n_params.alias("n_params"),
        ((depth > MAX_DEPTH) | (max_rep >= MAX_SEG_REPEAT)
         | (n_params > MAX_PARAMS)).alias("is_trap"),
    )
