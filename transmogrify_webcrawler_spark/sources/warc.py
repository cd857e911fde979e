"""WARC (ISO 28500) source: the container format Common-Crawl ships pages
in. Two halves:

- a pure-Python record builder/parser (stdlib only — the env has no warcio;
  the format is CRLF-framed headers + Content-Length payloads, simple enough
  that a from-scratch parser is the honest move), and
- the Spark plumbing: `warc_records` turns a DataFrame of WARC blobs
  (e.g. from `spark.read.format("binaryFile").load("*.warc.gz")`) into one
  row per contained record via mapInPandas — one Arrow transfer in, one out,
  no per-row Python UDF calls.

Scale shape: Common-Crawl WARCs are ~1 GB gzip members; `binaryFile` gives
one task per file, so a 100 TB crawl dump parallelizes across files with no
shuffle at all — parsing is embarrassingly parallel and the extracted
records flow straight into the extract/dedup operators downstream.
Per-record gzip members (the Common-Crawl layout) decompress independently,
so a splittable reader could go finer-grained; one-file-one-task is the
right grain while files are ~1 GB.

The synthesizer exists so tests and the correctness oracle can round-trip:
synthesize WARC bytes from the documents table, parse them back, and the
result must equal a plain SQL projection of the same table (DuckDB-checkable
via sha256).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import uuid
import zlib
from typing import Iterable, Iterator

CRLF = b"\r\n"
_WARC_DATE = "2026-01-01T00:00:00Z"  # fixed: synthesized archives are
# deterministic functions of their payloads (no wall clock anywhere)


# ---- pure-Python WARC build / parse -----------------------------------------

def build_response_record(url: str, payload: bytes, status: int = 200,
                          content_type: str = "text/html") -> bytes:
    """One WARC/1.0 'response' record: WARC headers + an HTTP/1.1 response
    block. Record-ID is uuid5(URL) so identical inputs build identical
    bytes."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload
    rid = uuid.uuid5(uuid.NAMESPACE_URL, url)
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {_WARC_DATE}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return head + http + CRLF + CRLF


def build_conversion_record(url: str, text: bytes) -> bytes:
    """One WARC/1.0 'conversion' record — the WET layout (Common Crawl's
    extracted-text distribution): plain-text payload, WARC-Refers-To the
    response record the text was derived from (same uuid5(URL) scheme, so
    the pointer is reconstructible without the response file)."""
    rid = uuid.uuid5(uuid.NAMESPACE_URL, "conversion:" + url)
    refers = uuid.uuid5(uuid.NAMESPACE_URL, url)
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Refers-To: <urn:uuid:{refers}>\r\n"
        f"WARC-Date: {_WARC_DATE}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text)}\r\n\r\n"
    ).encode("ascii")
    return head + text + CRLF + CRLF


def build_warcinfo_record(filename: str) -> bytes:
    """The warcinfo header record real WARC files open with (parsers must
    skip records they don't want — this keeps ours honest)."""
    body = f"software: transmogrify-webcrawler-spark\r\nisPartOf: {filename}\r\n".encode()
    rid = uuid.uuid5(uuid.NAMESPACE_URL, "warcinfo:" + filename)
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {_WARC_DATE}\r\n"
        f"WARC-Filename: {filename}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body + CRLF + CRLF


def build_warc_file(records: Iterable[tuple[str, bytes]], filename: str,
                    compress: bool = False) -> bytes:
    """Concatenate a warcinfo record + one response record per (url,
    payload). compress=True gzips each record as its own member — the
    Common-Crawl layout (members are independently seekable)."""
    chunks = [build_warcinfo_record(filename)]
    chunks += [build_response_record(u, p) for u, p in records]
    if compress:
        # mtime=0: gzip headers carry a timestamp; zero it so identical
        # inputs produce identical archive bytes
        return b"".join(gzip.compress(c, 6, mtime=0) for c in chunks)
    return b"".join(chunks)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (zlib stdlib; loops on
    unused_data)."""
    out, rest = [], data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: warc_type, target_uri, http_status,
    payload (bytes; None for non-response records). Tolerates gzip
    (member-concatenated or whole-file) and skips trailing garbage loudly
    (ValueError) rather than silently."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    buf = io.BytesIO(data)
    while True:
        line = buf.readline()
        while line in (CRLF, b"\n"):  # inter-record blank lines
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        headers = {}
        while True:
            h = buf.readline()
            if h in (CRLF, b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        block = buf.read(length)
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "http_status": None,
            "payload": None,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            head, _, payload = block.partition(CRLF + CRLF)
            status_line = head.split(CRLF, 1)[0].decode("ascii", "replace")
            parts = status_line.split(" ")
            rec["http_status"] = int(parts[1]) if len(parts) > 1 else None
            rec["payload"] = payload
        elif rec["warc_type"] == "conversion":
            # WET records carry the text directly — no HTTP envelope
            rec["payload"] = block
        yield rec


# ---- Spark plumbing ----------------------------------------------------------

WARC_RECORD_SCHEMA = ("target_uri string, warc_type string, "
                      "http_status int, content_length long, "
                      "payload_sha256 string")


def warc_records(blobs, blob_col: str = "warc"):
    """(.., warc binary) -> one row per record: (target_uri, warc_type,
    http_status, content_length, payload_sha256). mapInPandas: each Arrow
    batch of blobs is parsed in one Python call; at cluster scale each
    ~1 GB WARC file is one task and nothing shuffles."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                for r in parse_warc_bytes(bytes(blob)):
                    p = r["payload"]
                    rows.append((
                        r["target_uri"], r["warc_type"], r["http_status"],
                        len(p) if p is not None else None,
                        hashlib.sha256(p).hexdigest() if p is not None
                        else None,
                    ))
            yield pd.DataFrame(rows, columns=[
                "target_uri", "warc_type", "http_status",
                "content_length", "payload_sha256"])

    return blobs.mapInPandas(parse, schema=WARC_RECORD_SCHEMA)


def synthesize_warc(df, url_col: str = "url", payload_col: str = "payload",
                    n_files: int = 32, compress: bool = False):
    """Pack (url, payload binary) rows into n_files WARC blobs:
    (file_id int, warc binary). Grouping key = crc32(url) % n_files and
    records sort by url within a file, so the archive bytes are a pure
    function of the input set — independent of partitioning or row order
    (the property the round-trip oracle needs)."""
    from pyspark.sql import functions as F

    def pack(key, pdf):
        import pandas as pd
        fid = int(key[0])
        items = sorted(
            (u, bytes(p)) for u, p in zip(pdf[url_col], pdf[payload_col]))
        blob = build_warc_file(items, f"part-{fid:05d}.warc", compress)
        return pd.DataFrame({"file_id": [fid], "warc": [blob]})

    with_fid = df.withColumn(
        "file_id", F.crc32(F.col(url_col).cast("binary")) % n_files)
    return (with_fid.groupBy("file_id")
            .applyInPandas(pack, schema="file_id int, warc binary"))


def synthesize_wet(df, url_col: str = "url", text_col: str = "text",
                   n_files: int = 32, compress: bool = False):
    """WET twin of synthesize_warc: pack (url, text) rows into n_files WET
    blobs of 'conversion' records (warcinfo first, urls sorted within each
    file — archive bytes are a pure function of the input set). The same
    warc_records reader parses the result; conversion rows carry the text
    bytes as their payload."""
    from pyspark.sql import functions as F

    def pack(key, pdf):
        import pandas as pd
        fid = int(key[0])
        items = sorted(
            (u, t.encode("utf-8") if isinstance(t, str) else bytes(t))
            for u, t in zip(pdf[url_col], pdf[text_col]))
        chunks = [build_warcinfo_record(f"part-{fid:05d}.warc.wet")]
        chunks += [build_conversion_record(u, t) for u, t in items]
        if compress:
            blob = b"".join(gzip.compress(c, 6, mtime=0) for c in chunks)
        else:
            blob = b"".join(chunks)
        return pd.DataFrame({"file_id": [fid], "warc": [blob]})

    with_fid = df.withColumn(
        "file_id", F.crc32(F.col(url_col).cast("binary")) % n_files)
    return (with_fid.groupBy("file_id")
            .applyInPandas(pack, schema="file_id int, warc binary"))
