"""Reusable-expression cache: build unresolved Column/WindowSpec objects
once and reuse them across waves.

Why: in classic PySpark every `F.col`/operator/`alias` call is a Py4J
round trip (~1 ms on this box). `build_wave` constructs the same ~1,900
expression nodes EVERY wave — measured 1.9 s/wave of pure driver time at
local[4] (cProfile: 28k `send_command` calls per 10-wave crawl), a serial
cost that lands on the 2->8 scaling efficiency as an Amdahl term. An
unresolved Column (`F.col("x") + 1`) or name-based WindowSpec is an
immutable JVM expression tree bound to no DataFrame, so the SAME object
can be planted in any number of plans across waves; only wave-varying
literals (`F.lit(wave)`, the sortorder offset) must be rebuilt.

Lifetime: callers own the dict (the crawler keys it to one run/session),
so cached JVM objects can never outlive their gateway. Helpers accept
``exprs=None`` and then build fresh — single-shot callers (tests,
harness) pay nothing and see identical plans.
"""

from __future__ import annotations


def ecached(exprs: dict | None, key, build):
    """Fetch-or-build a reusable expression. ``key`` must capture every
    parameter the built expression depends on."""
    if exprs is None:
        return build()
    v = exprs.get(key)
    if v is None:
        v = exprs[key] = build()
    return v
