"""Scalar pandas UDFs wrapping the pinned oracle functions 1:1.

Each UDF maps the *same* pure-Python oracle function over an Arrow batch —
byte-identity between the distributed pipeline and the pytest oracle holds by
construction (SURVEY.md §0, §7.3). No per-row Spark Python UDFs exist anywhere
in this engine (BASELINE.json input_hint).

Note on "vectorized": HTML parsing is inherently per-value work; what Arrow
buys is batch transfer + one Python invocation per ~10k rows instead of per
row (cf. PAPERS.md "Accelerating Python UDFs in Vectorized Query Execution").
The html column is fat, so pipelines lower
spark.sql.execution.arrow.maxRecordsPerBatch (see plans/crawl.py).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField, StructType,
)

from ..oracle.urlnorm import (
    canonicalize,
    join_and_canonicalize,
    registered_domain,
    url_to_path,
)
from ..oracle.extract import (
    extract_links, extract_page, extract_text, sniff_mimetype,
)
from ..oracle.robots import crawl_delay, robots_allowed


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """C1: RFC-3986 canonicalization (oracle.urlnorm.canonicalize)."""
    return urls.map(canonicalize, na_action="ignore")


@pandas_udf(StringType())
def join_canonicalize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """C1 for relative refs: urljoin + defrag + canonicalize."""
    return pd.Series(
        [join_and_canonicalize(b, h) for b, h in zip(base, href)],
        dtype=object,
    )


@pandas_udf(StringType())
def registered_domain_udf(urls: pd.Series) -> pd.Series:
    """C2: eTLD+1 via the vendored public-suffix snapshot."""
    return urls.map(registered_domain, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series,
                      nonames: pd.Series) -> pd.Series:
    """T1: canonicalized link targets per page; explode downstream with
    F.explode (the UDTF shape, SURVEY.md §2.10). nonames (F6, a lit column)
    drops `<a name=…>` anchors when true."""
    return pd.Series(
        [extract_links(h, b, nonames=n)
         for h, b, n in zip(html, base_url, nonames)], dtype=object
    )


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """T3+T5: byte-exact visible-text extraction."""
    return pd.Series(
        [extract_text(h, b) for h, b in zip(html, base_url)], dtype=object
    )


_PAGE_SCHEMA = StructType([
    StructField("mimetype", StringType()),
    StructField("links", ArrayType(StringType())),
    StructField("text", StringType()),
])


@pandas_udf(_PAGE_SCHEMA)
def extract_page_udf(html: pd.Series, url: pd.Series,
                     nonames: pd.Series) -> pd.DataFrame:
    """C4+T1+T3+T5 fused: ONE Arrow transfer of the fat html column and ONE
    parser pass yield (mimetype, links, text) — the hot-path extraction
    (oracle.extract.extract_page). The separate single-purpose UDFs remain
    for operators that need just one facet."""
    mts, links, texts = [], [], []
    for h, u, n in zip(html, url, nonames):
        mt, lk, tx = extract_page(h, u, nonames=n)
        mts.append(mt)
        links.append(lk)
        texts.append(tx)
    return pd.DataFrame({"mimetype": mts, "links": links, "text": texts})


@pandas_udf(StringType())
def sniff_mimetype_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """C4: magic-bytes + extension mimetype sniff."""
    return pd.Series(
        [sniff_mimetype(h, u) for h, u in zip(html, url)], dtype=object
    )


@pandas_udf(StringType())
def url_to_path_udf(url_canon: pd.Series, site_url: pd.Series) -> pd.Series:
    """C3+T4: site-relative unquoted _path with isindex semantics."""
    return pd.Series(
        [url_to_path(u, s) for u, s in zip(url_canon, site_url)], dtype=object
    )


@pandas_udf(DoubleType())
def crawl_delay_udf(robots_txt: pd.Series, agent: pd.Series) -> pd.Series:
    """S6: parsed Crawl-delay per robots body (None when absent) — computed
    distributed-side so the robots dim never has to visit the driver."""
    return pd.Series(
        [crawl_delay(r, a) for r, a in zip(robots_txt, agent)], dtype=object
    )


@pandas_udf(StringType())
def nfc_udf(text: pd.Series) -> pd.Series:
    """Unicode NFC composition (unicodedata.normalize). Canonical
    composition is stability-guaranteed by Unicode policy, so the result is
    engine-portable: DuckDB's utf8proc nfc_normalize produces identical
    bytes for the same input — the cross-engine oracle for
    textops.normalize_text rests on that guarantee."""
    return text.map(
        lambda t: unicodedata.normalize("NFC", t), na_action="ignore")


@pandas_udf(BooleanType())
def robots_allowed_udf(
    robots_txt: pd.Series, url: pd.Series, agent: pd.Series
) -> pd.Series:
    """S6/J3: robots.txt gate; per-distinct-robots parser cache inside."""
    return pd.Series(
        [robots_allowed(r, u, a) for r, u, a in zip(robots_txt, url, agent)],
        dtype=bool,
    )
