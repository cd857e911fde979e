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


@given(framerate=st.integers(1000, 96000), channels=st.integers(1, 8),
       sampwidth=st.sampled_from([1, 2, 3, 4]),
       n_frames=st.integers(0, 5000))
@settings(max_examples=200, deadline=None)
def test_wav_duration_matches_stdlib_writer(framerate, channels, sampwidth,
                                            n_frames):
    """wav_duration over ANY stdlib-`wave`-written file equals
    n_frames/framerate exactly: data_bytes/byte_rate is
    (n*ch*sw)/(fr*ch*sw) — the integer products are exact in float64 and
    a correctly-rounded quotient of the same real value is bit-identical
    to n/fr."""
    import io
    import wave

    from transmogrify_webcrawler_spark.operators.multimodal import (
        wav_duration)

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(sampwidth)
    w.setframerate(framerate)
    w.writeframes(b"\x00" * (n_frames * channels * sampwidth))
    w.close()
    assert wav_duration(buf.getvalue()) == n_frames / framerate


@given(w=st.integers(1, 65535), h=st.integers(1, 65535),
       container=st.sampled_from(["png", "gif", "jpeg"]))
@settings(max_examples=200, deadline=None)
def test_resize_dimension_round_trip(w, h, container):
    """image_dimensions(resize_image_bytes(p, w, h)) == (w, h) for every
    container across the full uint16 range (PNG carries uint32 but the
    shared range keeps one strategy), and byte length is preserved."""
    import struct

    from transmogrify_webcrawler_spark.operators.multimodal import (
        image_dimensions, resize_image_bytes)

    if container == "png":
        p = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
             + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    elif container == "gif":
        p = (b"GIF89a" + (320).to_bytes(2, "little")
             + (200).to_bytes(2, "little") + b"\x00\x00\x00")
    else:
        p = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
             + b"\x00" * 9 + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
             + struct.pack(">HH", 480, 640) + b"\x03"
             + b"\x01\x00\x11\x02\x00\x11\x03\x00\x11" + b"\xff\xd9")
    out = resize_image_bytes(p, w, h)
    assert image_dimensions(out) == (w, h)
    assert len(out) == len(p)


@given(kbps_index=st.integers(1, 14), audio_kb=st.integers(1, 64),
       tag_pad=st.integers(0, 200))
@settings(max_examples=200, deadline=None)
def test_mp3_estimate_formula(kbps_index, audio_kb, tag_pad):
    """The CBR estimate equals audio_bytes*8/bitrate for any bitrate index
    and any ID3v2 tag size (syncsafe skip must land exactly on the frame
    sync)."""
    from transmogrify_webcrawler_spark.operators.multimodal import (
        _MP3_KBPS_V1, mp3_duration_estimate)

    tag = (b"ID3\x04\x00\x00"
           + bytes([(tag_pad >> 21) & 0x7F, (tag_pad >> 14) & 0x7F,
                    (tag_pad >> 7) & 0x7F, tag_pad & 0x7F])
           + b"\x00" * tag_pad)
    audio = bytes([0xFF, 0xFB, kbps_index << 4, 0x00]) \
        + b"\x00" * (audio_kb * 1000 - 4)
    want = (audio_kb * 1000) * 8 / (_MP3_KBPS_V1[kbps_index] * 1000.0)
    assert mp3_duration_estimate(tag + audio) == want


# ---- WARC container: build->parse is the identity on any payload ----------

_warc_urls = st.text(alphabet=string.ascii_letters + string.digits
                     + ":/.-_~?=&", min_size=1, max_size=60).map(
    lambda s: "https://h.example/" + s)


@given(st.lists(st.tuples(_warc_urls, st.binary(max_size=2048)),
                min_size=0, max_size=8, unique_by=lambda t: t[0]),
       st.booleans())
@settings(max_examples=150, deadline=None)
def test_warc_roundtrip_any_payload(items, compress):
    """Payloads containing CRLFs, WARC/ magic, gzip magic, NULs — anything —
    must survive the container: Content-Length framing, not sentinels."""
    from transmogrify_webcrawler_spark.sources.warc import (
        build_warc_file, parse_warc_bytes)
    blob = build_warc_file(items, "t.warc", compress=compress)
    recs = [r for r in parse_warc_bytes(blob) if r["warc_type"] == "response"]
    assert [(r["target_uri"], r["payload"]) for r in recs] == items
