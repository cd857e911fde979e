"""RFC 9309 robots path-rule evaluation as a distributed rule join — the
wildcard/anchor matching layer (`*`, trailing `$`, longest-match
precedence) that the stdlib-parser gate (oracle/robots.py, SURVEY §2 S6)
deliberately does not attempt: RobotFileParser is prefix-only, while
production crawlers (and the Google/RFC 9309 spec) must honor
`Disallow: /*.gif$`-style rules.

Semantics pinned here (RFC 9309 §2.2.2):
- a rule matches a path if its pattern — with `*` meaning any octet
  sequence and a trailing `$` anchoring the end — matches from the start
  of the path;
- the rule with the LONGEST pattern (octet length, `$` included) wins;
- on a length tie, the least-restrictive rule (allow) wins;
- no matching rule -> allowed.

Distributed shape: rules are a per-domain dimension (robots.txt files are
KB-sized; the whole web's rule set fits executor memory), so the
urls x rules join broadcasts the rules side; matching is a JVM `RLIKE`
with a rule-derived regex (built once per rule row, pinned to the
Java-regex/RE2 common subset so DuckDB evaluates the identical match
set); the winner is a per-url WindowGroupLimit (rank pushdown), never a
full sort. The fetch-path plumbing (registered-domain grouping, one
robots row per domain) already exists in plans/crawl.py:407-438 — this
operator upgrades the *decision* once rule-level data is carried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# characters that are regex metachars but literal in robots patterns
# ('*' and a TRAILING '$' are handled structurally before escaping)
_ESCAPE_RX = r"([.^$+?(){}\[\]|\\])"


def robots_pattern_rx(pattern):
    """Anchored Java/RE2 regex for an RFC 9309 path pattern (Column)."""
    anchored = pattern.endswith("$")
    body = F.when(anchored,
                  F.substring(pattern, 1, F.length(pattern) - 1)) \
            .otherwise(pattern)
    esc = F.regexp_replace(body, _ESCAPE_RX, r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), wild,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def robots_evaluate(urls: DataFrame, rules: DataFrame,
                    domain_col: str = "domain",
                    path_col: str = "path") -> DataFrame:
    """Verdict per (domain, path) against per-domain rule sets.

    `urls`: (domain, path, ...); `rules`: (domain, allow BOOLEAN, pattern).
    Returns one row per input url row: (domain, path, allowed BOOLEAN,
    winner_pattern STRING — '' when no rule matched)."""
    r = rules.select(
        F.col(domain_col).alias("r_domain"),
        F.col("allow"),
        F.col("pattern"),
        robots_pattern_rx(F.col("pattern")).alias("rx"),
        F.length("pattern").alias("plen"),
    )
    u = urls.select(F.col(domain_col).alias("domain"),
                    F.col(path_col).alias("path"))
    matched = (
        u.join(F.broadcast(r), u["domain"] == r["r_domain"])
        .filter(F.expr("path RLIKE rx"))
    )
    # longest pattern wins; ties -> allow (RFC 9309 least-restrictive)
    w = Window.partitionBy("domain", "path").orderBy(
        F.col("plen").desc(), F.col("allow").desc(), F.col("pattern").asc())
    best = (matched.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("domain", "path", "allow", "pattern"))
    # urls whose domain has no rules, or none that match, default to allow
    return u.join(best, ["domain", "path"], "left").select(
        "domain", "path",
        F.coalesce("allow", F.lit(True)).alias("allowed"),
        F.coalesce("pattern", F.lit("")).alias("winner_pattern"),
    )


def robots_evaluate_sql(urls_sql: str, rules_sql: str) -> str:
    """DuckDB oracle: the identical regex construction and precedence
    window. The regex text is built with the same structural steps
    (trailing-$ split, metachar escape, * -> .*) so both engines hand the
    IDENTICAL pattern string to their (RE2/Java common subset) engines."""
    esc = (r"regexp_replace(CASE WHEN pattern LIKE '%$' THEN"
           r" substring(pattern, 1, length(pattern) - 1)"
           r" ELSE pattern END, '([.^$+?(){}\[\]|\\\\])', '\\\1', 'g')")
    rx = (f"'^' || replace({esc}, '*', '.*')"
          " || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END")
    return f"""
WITH u AS ({urls_sql}),
r AS (SELECT domain AS r_domain, allow, pattern, {rx} AS rx,
             length(pattern) AS plen
      FROM ({rules_sql})),
m AS (
  SELECT u.domain, u.path, r.allow, r.pattern, r.plen
  FROM u JOIN r ON u.domain = r.r_domain
  WHERE regexp_matches(u.path, r.rx)
), best AS (
  SELECT domain, path, allow, pattern FROM (
    SELECT domain, path, allow, pattern,
           row_number() OVER (PARTITION BY domain, path
                              ORDER BY plen DESC, allow DESC, pattern ASC)
               AS rk
    FROM m
  ) WHERE rk = 1
)
SELECT u.domain, u.path,
       coalesce(b.allow, TRUE) AS allowed,
       coalesce(b.pattern, '') AS winner_pattern
FROM u LEFT JOIN best b ON u.domain = b.domain AND u.path = b.path
"""
