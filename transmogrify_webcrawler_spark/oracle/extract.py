"""HTML link + text extraction, mimetype sniffing, typerecognitor (SURVEY.md §2.9).

This module IS the byte-identity surface: the pandas UDFs in
``functions/udfs.py`` call these exact functions per value, and the pytest
oracle crawler calls them single-process. Parity targets (reconstructed from
public knowledge, local reference checkout empty — SURVEY.md §0):

- T1 link extraction  [UP webchecker.py MyHTMLParser / Page.getlinkinfos]:
  collect a@href img@src frame@src iframe@src area@href link@href; <base href>
  rewrites the resolution base; urljoin + defrag each.
- T2 typerecognitor   [UP transmogrify/webcrawler/typerecognitor.py]:
  MIME -> content-type map (text/html->Document, image/*->Image, else File).
- T3 linkremover: anchor markup stripped but anchor *text* preserved — which
  is exactly what tag-dropping text extraction yields; pinned here.
- T4 isindex          [UP webcrawler.py]: handled in urlnorm.url_to_path.
- T5 text extraction: drop script/style/head/template content, decode
  entities, collapse all whitespace runs to single spaces, strip.

Parser: stdlib html.parser (lxml is NOT installed in this environment [ENV];
BASELINE.json north_star names lxml — pinned deviation, still vectorized per
Arrow batch, no per-row Spark Python).
"""

from __future__ import annotations

from html.parser import HTMLParser

from .urlnorm import join_and_canonicalize

_LINK_ATTRS = {
    "a": "href",
    "img": "src",
    "frame": "src",
    "iframe": "src",
    "area": "href",
    "link": "href",
}

_SKIP_TEXT_TAGS = frozenset({"script", "style", "head", "template"})
# void elements never pushed on the skip stack
_VOID = frozenset(
    {"img", "br", "hr", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _Extractor(HTMLParser):
    """One pass: links + visible-text chunks. convert_charrefs=True decodes
    entities exactly once, in the parser (pinned)."""

    def __init__(self, base_url: str, nonames: bool = False):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.links: list[str] = []
        self.chunks: list[str] = []
        self._skip_depth = 0
        self.nonames = nonames

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
            return
        d = dict(attrs)
        if tag == "base" and d.get("href"):
            # <base href> rewrites the resolution base for subsequent links
            self.base = d["href"]
            return
        attr = _LINK_ATTRS.get(tag)
        if attr:
            v = d.get(attr)
            if v is not None:
                u = join_and_canonicalize(self.base, v)
                if u:
                    self.links.append(u)
            elif tag == "a" and not self.nonames and d.get("name"):
                # F6 [UP webchecker -n]: name anchors are collected by
                # default (pinned as a self-link — canonicalize defrags, so
                # `<a name=x>` resolves to the page's own canonical URL);
                # nonames=True drops them. PINNED DEVIATION (SURVEY §7.3):
                # upstream webchecker records name anchors as fragment
                # TARGETS for link checking, not as outgoing links — with
                # the reference checkout empty that behavior is
                # unverifiable, so this engine pins the self-link rendering
                # (defrag makes the target the page itself) and keeps both
                # engines + the -n knob in exact agreement.
                u = join_and_canonicalize(self.base, "#" + d["name"])
                if u:
                    self.links.append(u)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


def _decode(html: bytes) -> str:
    """Pinned decode: UTF-8 with replacement. Both the oracle and the UDF
    operate on raw bytes and decode here — pandas never coerces (SURVEY §7.3)."""
    if isinstance(html, str):
        return html
    return html.decode("utf-8", errors="replace")


def _parse(html: bytes, base_url: str, nonames: bool = False) -> _Extractor:
    p = _Extractor(base_url, nonames=nonames)
    try:
        p.feed(_decode(html))
        p.close()
    except Exception:
        pass  # tolerate malformed HTML; keep whatever was collected
    return p


def extract_links(html: bytes, base_url: str,
                  nonames: bool = False) -> list[str]:
    """T1: ordered list of canonicalized absolute link targets (dupes kept —
    dedup is the engine's job, J1/J5). nonames=True drops name anchors (F6)."""
    if html is None:
        return []
    return _parse(html, base_url, nonames=nonames).links


def extract_text(html: bytes, base_url: str = "") -> str:
    """T3+T5: visible text, entity-decoded, whitespace-collapsed. Byte-exact
    rule: join all text nodes, then ' '.join(s.split())."""
    if html is None:
        return ""
    chunks = _parse(html, base_url).chunks
    return " ".join("".join(chunks).split())


def extract_page(html: bytes, url: str,
                 nonames: bool = False) -> tuple[str, list[str], str]:
    """One-pass page extraction: (mimetype, links, text) from a SINGLE parse
    — the oracle crawler's exact per-page flow (sniff, then parse only
    text/html; non-HTML emits links=[] text=''). The hot path's UDF calls
    this so the fat html bytes cross the Arrow boundary once and the parser
    runs once per page, instead of sniff/links/text each re-shipping and
    re-parsing. Byte-identity holds by construction: _parse collects links
    and text chunks in the same pass the separate functions use."""
    if html is None:
        return None, [], ""
    mt = sniff_mimetype(html, url)
    if mt != "text/html":
        return mt, [], ""
    p = _parse(html, url, nonames=nonames)
    return mt, p.links, " ".join("".join(p.chunks).split())


# --- mimetype sniffing (C4) -------------------------------------------------

_MAGIC = [
    (b"%PDF", "application/pdf"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"GIF8", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    # raw MPEG audio frame sync (no ID3 tag): 11 set bits + version/layer
    (b"\xff\xfb", "audio/mpeg"), (b"\xff\xfa", "audio/mpeg"),
    (b"\xff\xf3", "audio/mpeg"), (b"\xff\xf2", "audio/mpeg"),
    # EBML magic (Matroska/WebM family); DocType disambiguation happens in
    # the decoder — the crawl gate only needs the container family
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"OggS", "audio/ogg"),
]

_EXT_MAP = {
    ".html": "text/html", ".htm": "text/html", ".txt": "text/plain",
    ".pdf": "application/pdf", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
    ".png": "image/png", ".gif": "image/gif", ".css": "text/css",
    ".js": "application/javascript", ".zip": "application/zip",
    ".xml": "text/xml", ".json": "application/json", ".mp3": "audio/mpeg",
    ".wav": "audio/wav", ".mp4": "video/mp4",
}


def sniff_mimetype(html: bytes, url: str) -> str:
    """C4, pinned order: magic bytes -> URL extension -> '<' HTML heuristic ->
    text/plain if decodable -> application/octet-stream.

    [UP webchecker.py: HTTP Content-Type header else mimetypes.guess_type] —
    the corpus has no headers, so magic bytes stand in for the header."""
    if html is None:
        html = b""
    if isinstance(html, str):
        html = html.encode("utf-8", errors="replace")
    head = html[:64]
    for magic, mt in _MAGIC:
        if head.startswith(magic):
            return mt
    # ISO-BMFF (MP4 family): the magic is 'ftyp' at offset 4 (bytes 0-3 are
    # the ftyp box size), so it can't live in the prefix table above
    if len(head) >= 12 and head[4:8] == b"ftyp":
        return "video/mp4"
    path = (url or "").split("?", 1)[0].split("#", 1)[0]
    dot = path.rfind(".")
    slash = path.rfind("/")
    if dot > slash:
        mt = _EXT_MAP.get(path[dot:].lower())
        if mt:
            return mt
    if path.endswith("/"):
        return "text/html"
    stripped = head.lstrip()
    if stripped.startswith(b"<"):
        return "text/html"
    try:
        html.decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError:
        return "application/octet-stream"


# --- typerecognitor (T2) ----------------------------------------------------

_TYPE_MAP = {
    "text/html": "Document",
    "application/pdf": "File",
    "text/plain": "File",
}


def recognize_type(mimetype: str) -> str:
    """T2 [UP typerecognitor.py]: text/html->Document, image/*->Image,
    everything else->File."""
    if mimetype is None:
        return "File"
    if mimetype.startswith("image/"):
        return "Image"
    return _TYPE_MAP.get(mimetype, "File")
