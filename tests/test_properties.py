"""Property-based tests (SURVEY.md §5.2.3): canonicalization idempotence,
bloom zero-false-negatives, oracle invariants. Pure-Python (no Spark session)
so hypothesis can run hundreds of examples cheaply."""

import string

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from transmogrify_webcrawler_spark.oracle import (
    canonicalize, extract_links, extract_text, registered_domain,
    sniff_mimetype,
)
from transmogrify_webcrawler_spark.operators.dedup import (
    BLOOM_K, _set_bits, _test_bits,
)

_hostchars = st.text(alphabet=string.ascii_letters + string.digits + "-.",
                     min_size=1, max_size=20).filter(
    lambda s: not s.startswith((".", "-")) and ".." not in s)
_pathchars = st.text(alphabet=string.ascii_letters + string.digits
                     + "/-._~%?=&", max_size=40)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_hostchars)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_pathchars)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}/{path}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_no_fragment_lower_scheme_host(u):
    c = canonicalize(u)
    assert "#" not in c
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    host = rest.split("/", 1)[0]
    assert host == host.lower()


_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(st.tuples(_i64, _i64), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_zero_false_negatives(pairs):
    # hashes arrive as Catalyst xxhash64 int64 columns; the invariant that
    # matters is set(h)->test(h) can never miss for IDENTICAL hash inputs —
    # and build/probe share the same Catalyst exprs by construction
    # (operators/dedup.py with_bloom_hashes)
    bits = np.zeros(256, dtype=np.uint8)  # deliberately tiny: high fpp is
    # fine, false negatives never are
    h1 = np.array([p[0] for p in pairs], dtype=np.int64).view(np.uint64)
    h2 = np.array([p[1] for p in pairs],
                  dtype=np.int64).view(np.uint64) | np.uint64(1)
    _set_bits(bits, h1, h2)
    assert _test_bits(bits, h1, h2).all()


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_extract_text_never_raises_and_collapses_ws(s):
    out = extract_text(s.encode("utf-8", "replace"), "http://x.com/")
    assert "  " not in out
    assert out == out.strip()


@given(st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_sniff_total(b):
    mt = sniff_mimetype(b, "http://x.com/unknown")
    assert isinstance(mt, str) and "/" in mt


def test_registered_domain_snapshot_rules():
    assert registered_domain("http://a.b.example.com/") == "example.com"
    assert registered_domain("http://x.co.uk") == "x.co.uk"
    assert registered_domain("http://deep.x.co.uk") == "x.co.uk"
    assert registered_domain("localhost") == "localhost"


def test_extract_links_base_rewrite_order():
    html = (b'<a href="/one">1</a><base href="http://b.com/sub/">'
            b'<a href="two">2</a>')
    links = extract_links(html, "http://a.com/")
    assert links == ["http://a.com/one", "http://b.com/sub/two"]
