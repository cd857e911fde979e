#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol; BASELINE.json
north_rule). A real multi-executor cluster is unavailable in this sandbox, so
per the driver's instruction the N->4N executor criterion is evidenced by the
IDENTICAL crawl job on the IDENTICAL corpus at local[8] vs local[32], each in
a fresh JVM (subprocess), shuffle partitions scaled 2x cores.

Writes BENCH/BASELINE.md and prints the efficiency. Gate: >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "50000"))
BODY_WORDS = int(os.environ.get("SPARK_GRAFT_SCALE_BODY_WORDS", "20000"))


def run_at(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_CRAWL_PAGES=str(PAGES),
               SPARK_GRAFT_BODY_WORDS=str(BODY_WORDS),
               # the 100 TB shape: corpus re-scanned per wave (pure parallel
               # work), only skinny winners cached; realistic politeness
               SPARK_GRAFT_CACHE="skinny",
               SPARK_GRAFT_WAVE_SIZE="100000",
               SPARK_GRAFT_DOMAIN_BUDGET="5000",
               # ~170 KB pages: 256-row Arrow batches keep per-worker
               # extraction memory ~45 MB (2048 rows x 170 KB x 32 workers
               # thrashes at high core counts)
               SPARK_GRAFT_ARROW_BATCH="256")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only"],
        env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    # warm the corpus cache once so neither run pays generation
    sys.path.insert(0, REPO)
    import bench
    bench.ensure_corpus(PAGES, BODY_WORDS)

    r8 = run_at(8)
    r32 = run_at(32)
    t8, t32 = r8["pages_per_sec"], r32["pages_per_sec"]
    eff = (t32 / t8) / 4.0
    lines = [
        "# BENCH/BASELINE — measured numbers (this engine; reference has none)",
        "",
        f"Corpus: {PAGES} pages (seed=42, body_words={BODY_WORDS}, "
        f"avg ~{45 if BODY_WORDS==5000 else '?'} KB/page), identical for "
        "both runs; fresh JVM per run; shuffle partitions = 2 x cores.",
        "",
        "| config | pages crawled | waves | wall (s) | pages/sec |",
        "| --- | --- | --- | --- | --- |",
        f"| local[8]  | {r8['pages_crawled']} | {r8['waves']} | "
        f"{r8['crawl_sec']} | {t8} |",
        f"| local[32] | {r32['pages_crawled']} | {r32['waves']} | "
        f"{r32['crawl_sec']} | {t32} |",
        "",
        f"**Throughput scaling efficiency (T32/T8)/4 = {eff:.3f}** "
        f"(gate: >= 0.8)",
        "",
        "Per-wave frontier-expansion wall time (s):",
        "",
        f"- local[8]:  {json.dumps(r8['per_wave_sec'])}",
        f"- local[32]: {json.dumps(r32['per_wave_sec'])}",
        "",
        "Protocol: BASELINE.md (sandbox proxy for N->4N executors, per the ",
        "driver's two-parallelism-level instruction).",
    ]
    md = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps(dict(t8=t8, t32=t32, efficiency=round(eff, 3))))


if __name__ == "__main__":
    main()
