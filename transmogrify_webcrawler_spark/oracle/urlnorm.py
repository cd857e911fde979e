"""RFC-3986 URL canonicalization + registered-domain extraction (SURVEY.md §2.7).

Upstream parity [UP webchecker.py Page.getlinkinfos]: the reference only does
``urljoin`` + ``urldefrag``; BASELINE.json north_star upgrades the contract to
full RFC-3986 canonicalization, pinned here. Deterministic, stdlib-only.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, urljoin, unquote

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# Vendored public-suffix snapshot (SURVEY.md C2): the multi-label suffixes we
# recognize; every other suffix is treated as single-label. tldextract is not
# installed in this environment, and network fetch of the PSL is unavailable,
# so this snapshot is the pinned deterministic rule.
_TWO_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "co.in", "net.in", "org.in", "gen.in", "firm.in",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "co.nz", "net.nz", "org.nz",
        "co.za", "net.za", "org.za",
        "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
        "co.kr", "or.kr", "co.il", "org.il", "com.ua",
    }
)


def _normalize_percent(s: str) -> str:
    """Percent-encoding normalization (RFC 3986 §6.2.2.2):
    decode unreserved characters, uppercase remaining hex digits."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            hexpair = s[i + 1 : i + 3]
            if len(hexpair) == 2 and all(
                h in "0123456789abcdefABCDEF" for h in hexpair
            ):
                ch = chr(int(hexpair, 16))
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + hexpair.upper())
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            if inp.startswith("/"):
                j = inp.find("/", 1)
            else:
                j = inp.find("/")
            if j < 0:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:j])
                inp = inp[j:]
    return "".join(out)


def canonicalize(url: str) -> str:
    """Canonicalize one absolute URL. Idempotent (property-tested).

    Rules (pinned): lowercase scheme+host, drop default port, remove dot
    segments, normalize percent-encoding in path+query, strip fragment,
    empty path with authority -> '/'.
    """
    if url is None:
        return None
    url = url.strip()
    scheme, netloc, path, query, _frag = urlsplit(url)
    scheme = scheme.lower()
    # host lowercase; keep userinfo as-is (absent in our corpora)
    host, sep, port = netloc.partition(":")
    host = host.lower()
    if sep and port == _DEFAULT_PORTS.get(scheme):
        netloc = host
    elif sep and port == "":
        netloc = host
    else:
        netloc = host + (sep + port if sep else "")
    path = _normalize_percent(path)
    path = _remove_dot_segments(path)
    if netloc and not path:
        path = "/"
    query = _normalize_percent(query)
    return urlunsplit((scheme, netloc, path, query, ""))


def join_and_canonicalize(base: str, href: str) -> str | None:
    """urljoin + defrag + canonicalize — the link-resolution rule
    [UP webchecker.py Page.getlinkinfos: urljoin + urldefrag]."""
    href = (href or "").strip()
    if not href:
        return None
    if href.startswith(("javascript:", "mailto:", "data:", "tel:")):
        return None
    absu = urljoin(base, href)
    c = canonicalize(absu)
    if not c or not c.startswith(("http://", "https://", "file://", "ftp://")):
        return None
    return c


def host_of(url: str) -> str:
    return urlsplit(url).netloc.partition(":")[0].lower()


def registered_domain(url_or_host: str) -> str:
    """Registered domain (eTLD+1) via the vendored suffix snapshot.

    Absent upstream (per-host = netloc); mandated by BASELINE.json north_star
    for politeness grouping. 'www.a.example.co.uk' -> 'example.co.uk'.
    """
    if url_or_host is None:
        return None
    host = url_or_host
    if "//" in host or ":" in host or "/" in host:
        host = host_of(host if "//" in host else "//" + host)
    host = host.lower().rstrip(".")
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in _TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last2


def url_to_path(url_canon: str, site_url: str) -> str:
    """Site-relative, unquoted ``_path`` with isindex semantics
    [UP webcrawler.py: _path; URLs ending '/' become <path>index.html]."""
    path = url_canon
    if site_url and url_canon.startswith(site_url):
        path = url_canon[len(site_url):]
    else:
        path = urlsplit(url_canon).path.lstrip("/")
    path = unquote(path)
    if path == "" or path.endswith("/"):
        path = path + "index.html"
    return path


def is_index_url(url_canon: str) -> bool:
    """isindex semantics (SURVEY.md T4): URL path ends with '/'."""
    return urlsplit(url_canon).path.endswith("/")
