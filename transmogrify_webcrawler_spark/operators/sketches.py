"""Cardinality sketching — a deterministic HyperLogLog for "how many
distinct canonical URLs / shingles / hosts" questions where exact
count-distinct is a full shuffle of the key universe. At 10^10 URLs the
frontier wants cheap per-wave cardinality telemetry (seen-set growth,
distinct-host counts for politeness capacity planning); HLL answers in one
map-side-combinable aggregation of 256 registers.

Why hand-rolled instead of approx_count_distinct: Spark's HLL++ and any
other engine's sketch disagree in implementation details, so their
estimates can't be cross-checked. This one is pinned to md5 (both engines
emit identical lowercase hex), derives bucket and rank from hex characters
with pure string/integer expressions, and does ALL register math in exact
BIGINT (2^(53-rho) summands) — the estimate is bit-identical on Spark and
DuckDB, on any partitioning, at any cluster size. The estimator is the raw
HLL E = alpha_m * m^2 / sum(2^-M_j) (Flajolet et al. 2007) floor-divided to
an integer; the small/large-range bias corrections are intentionally
omitted (they'd add float branches) — documented accuracy is the raw
estimator's ~1.04/sqrt(256) ≈ 6.5% sigma.

Register layout (p = 8, m = 256 buckets):
- md5 hex chars 1..2  -> bucket (8 bits),
- md5 hex chars 3..15 -> a 52-bit window; rho = leading-zero count + 1
  (1..53), computed by trimming leading '0' hex chars and sizing the first
  non-zero nibble via bin() — no 64-bit shifts engines disagree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 256  # 2^8 buckets; the hex-char bucket math below pins p = 8
# alpha_256 * m^2 * 2^53 as an exact double literal (repr round-trips)
_HLL_NUM = 4.2399330249068963e+20
_POW53 = 1 << 53


def _rho_expr(h):
    """rho (leading zeros + 1) of the 52-bit window in md5-hex chars 3..15."""
    hx = F.substring(h, 3, 13)
    trimmed = F.regexp_replace(hx, "^0+", "")
    first_val = F.conv(F.substring(trimmed, 1, 1), 16, 10).cast("int")
    return (
        F.when(trimmed == "", F.lit(53))
        .otherwise((13 - F.length(trimmed)) * 4
                   + (4 - F.length(F.bin(first_val))) + 1)
    ).cast("int")


def hll_cardinality(df: DataFrame, key) -> DataFrame:
    """One-row (hll_estimate BIGINT, n_buckets_seen BIGINT) for the distinct
    count of `key` (a Column or column name).

    Scale shape: (bucket, rho) partial-aggregates map-side — every executor
    reduces its slice to <= 256 register rows before the shuffle, the exact
    merge `max(rho)` is associative/commutative, and the final rollup is one
    256-row stage. This IS the treeAggregate sketch-merge the north-star
    contract describes, expressed declaratively."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(key.cast("string").cast("binary"))
    regs = (
        df.select(
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            _rho_expr(h).alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("r"))
    )
    # 2^(53 - r) is an exact BIGINT for r in 1..53, so the register sum is
    # exact integer arithmetic — no float-order sensitivity anywhere
    summed = regs.agg(
        F.count("*").alias("n_seen"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - r)")).alias("s_fp"),
    )
    denom = (F.coalesce("s_fp", F.lit(0))
             + (F.lit(HLL_M) - F.col("n_seen")) * F.lit(_POW53))
    return summed.select(
        F.floor(F.lit(_HLL_NUM) / denom.cast("double"))
         .cast("long").alias("hll_estimate"),
        F.col("n_seen").cast("long").alias("n_buckets_seen"),
    )


CMS_D = 4    # hash rows
CMS_W = 256  # buckets per row — two md5-hex chars, like the HLL layout


def _cms_bucket(r, key):
    """Row-r bucket for a key: first two hex chars of md5(r || ':' || key)."""
    h = F.md5(F.concat(r.cast("string"), F.lit(":"),
                       key.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def cms_counters(df: DataFrame, key, weight_col: str | None = None) -> DataFrame:
    """Count-Min sketch counter table (row, bucket, cnt) over one
    occurrence per input row of `key` (Cormode & Muthukrishnan 2005) —
    or, with `weight_col`, over pre-aggregated (key, count) rows so a
    caller that already owns the frequency table doesn't re-expand it.

    Why this shape at 100 TB: exact heavy-hitter counting shuffles the full
    key universe; the CMS collapses every partition to <= d*w = 1024
    counter rows map-side (partial aggregation), the merge is a plain sum
    (associative/commutative — the declarative treeAggregate, exactly like
    hll_cardinality above), and the estimate for any key is min over d
    counters — deterministic integers, bit-identical on any engine or
    partitioning, with the one-sided guarantee est >= true count."""
    key = F.col(key) if isinstance(key, str) else key
    # Collapse to per-KEY counts first, then hash only the distinct keys:
    # the former shape md5-hashed every OCCURRENCE d times (4 md5/row —
    # ~11M digests at sf1.0, pure map CPU), where hashing the distinct key
    # once per sketch row and SUMMING its count produces the identical
    # counter table (guide §1.2 step 2: same shuffle shape — both partial-
    # aggregate map-side — ~99% less hashing).
    if weight_col is not None:
        per_key = df.select(key.alias("k"),
                            F.col(weight_col).cast("long").alias("c"))
    else:
        per_key = df.groupBy(key.alias("k")).agg(F.count("*").alias("c"))
    rows = per_key.select("k", "c",
                          F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1)))
                          .alias("r"))
    return (rows.select("r", "c", _cms_bucket(F.col("r"), F.col("k"))
                        .alias("bucket"))
            .groupBy("r", "bucket").agg(F.sum("c").alias("cnt")))


def cms_estimate(counters: DataFrame, keys: DataFrame,
                 key_col: str) -> DataFrame:
    """(key_col, cms_est) for each query key: min over the d row counters.
    The query side is tiny (candidate keys) and broadcasts into the
    1024-row counter table — no shuffle of anything large."""
    q = keys.select(F.col(key_col)).distinct()
    probes = q.select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r"))
    probes = probes.select(
        key_col, "r",
        _cms_bucket(F.col("r"), F.col(key_col)).alias("bucket"))
    j = probes.join(F.broadcast(counters), ["r", "bucket"], "left")
    return (j.groupBy(key_col)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est")))


def cms_sql(rows_sql: str, key_sql: str, keys_sql: str) -> str:
    """DuckDB oracle: identical bucket construction (strpos nibble values
    stand in for conv) and min-over-rows estimator."""
    hexv = "strpos('123456789abcdef', {c})"

    def bucket(r, k):
        h = f"md5(CAST({r} AS VARCHAR) || ':' || CAST({k} AS VARCHAR))"
        return (f"(16 * {hexv.format(c=f'substring({h}, 1, 1)')}"
                f" + {hexv.format(c=f'substring({h}, 2, 1)')})")

    return f"""
WITH occ AS (
  SELECT {key_sql} AS k FROM ({rows_sql})
), counters AS (
  SELECT r, bucket, count(*) AS cnt FROM (
    SELECT r, {bucket('r', 'k')} AS bucket
    FROM occ, range({CMS_D}) t(r)
  ) GROUP BY 1, 2
), q AS (
  SELECT DISTINCT k FROM (SELECT {key_sql} AS k FROM ({keys_sql}))
), probes AS (
  SELECT q.k, r, {bucket('r', 'q.k')} AS bucket
  FROM q, range({CMS_D}) t(r)
)
SELECT p.k, min(coalesce(c.cnt, 0)) AS cms_est
FROM probes p LEFT JOIN counters c USING (r, bucket)
GROUP BY p.k
"""


def hll_cardinality_sql(rows_sql: str, key_sql: str) -> str:
    """DuckDB oracle: the identical register construction and exact-integer
    estimator (strpos-based nibble values stand in for conv())."""
    h = f"md5(CAST({key_sql} AS VARCHAR))"
    hexv = "strpos('123456789abcdef', {c})"
    bucket = (f"(16 * {hexv.format(c=f'substring({h}, 1, 1)')}"
              f" + {hexv.format(c=f'substring({h}, 2, 1)')})")
    trimmed = f"regexp_replace(substring({h}, 3, 13), '^0+', '')"
    rho = (f"CASE WHEN {trimmed} = '' THEN 53"
           f" ELSE (13 - length({trimmed})) * 4"
           f" + (4 - length(bin({hexv.format(c=f'substring({trimmed}, 1, 1)')})))"
           f" + 1 END")
    return f"""
WITH regs AS (
  SELECT bucket, max(rho) AS r FROM (
    SELECT {bucket} AS bucket, {rho} AS rho FROM ({rows_sql})
  ) GROUP BY bucket
), summed AS (
  SELECT count(*) AS n_seen,
         sum(1::BIGINT << (53 - r)) AS s_fp
  FROM regs
)
SELECT CAST(floor({_HLL_NUM!r} /
            CAST(coalesce(s_fp, 0) + ({HLL_M} - n_seen) * {_POW53}
                 AS DOUBLE)) AS BIGINT) AS hll_estimate,
       CAST(n_seen AS BIGINT) AS n_buckets_seen
FROM summed
"""
