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
