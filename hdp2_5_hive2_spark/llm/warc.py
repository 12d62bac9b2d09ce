"""WARC (Web ARChive) ingestion from the public spec + HTML text extraction.

Crawled pretraining corpora ARRIVE as WARC: the ISO 28500 record format
(version line, named headers, Content-Length-delimited payload, CRLF CRLF
separator) and its `.warc.gz` form where EVERY RECORD IS ITS OWN GZIP
MEMBER — the property that makes petabyte crawls randomly accessible
(a member's (offset, length) is a ranged GET; this is how the public
crawl indexes address individual pages). Everything here derives from
the published WARC 1.0/1.1 specification and the gzip RFC 1952 member
framing; the HTML→text step uses only the stdlib parser.

Pieces:
- `parse_warc` / `parse_warc_gz`: record iteration over plain and
  per-member-gzip archives; `warc_gz_member_ranges` exposes the member
  (offset, length) index so a sampled record is one bounded read.
- `split_http_response`: status + headers/body split for `response`
  records carrying application/http payloads.
- `html_to_text`: script/style-dropping, entity-decoding, whitespace-
  collapsing text extraction (stdlib HTMLParser — no external deps).
- `read_warc`: the Spark operator — paths fan out across executors,
  records parse map-side into (path, record_idx, warc_type, target_uri,
  date, content_type, http_status, payload) rows; payloads never touch
  the driver. `warc_text_extract` chains the HTML step for response
  records.
- `build_warc` / `build_warc_gz`: spec-shaped writers so tests and
  fixtures need no external crawler.

Scale: one task per archive file (a crawl segment), headers read
record-by-record with payload-sized skips; the gz walk decompresses one
member at a time with bounded memory. Corrupt input raises ValueError
only (fuzz-pinned), matching the other container parsers.
"""

from __future__ import annotations

import gzip
import io
import zlib
from dataclasses import dataclass, field

__all__ = [
    "WarcRecord",
    "parse_warc",
    "parse_warc_gz",
    "warc_gz_member_ranges",
    "split_http_response",
    "html_to_text",
    "build_warc",
    "build_warc_gz",
    "read_warc",
    "warc_text_extract",
]


@dataclass
class WarcRecord:
    warc_type: str
    target_uri: str | None
    date: str | None
    content_type: str | None
    headers: dict = field(repr=False)
    payload: bytes = field(repr=False)


def _parse_records(data: bytes):
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("WARC corrupt: unterminated version line")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"WARC corrupt: bad version line {version[:20]!r}")
        pos = eol + 2
        headers: dict = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("WARC corrupt: unterminated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"WARC corrupt: bad header line {line[:30]!r}")
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC corrupt: missing/invalid Content-Length")
        if pos + clen > n:
            raise ValueError("WARC corrupt: payload overruns archive")
        payload = data[pos : pos + clen]
        pos += clen
        yield WarcRecord(
            headers.get("warc-type", "?"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            headers,
            payload,
        )


def parse_warc(data: bytes) -> list[WarcRecord]:
    return list(_parse_records(data))


def warc_gz_member_ranges(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) per gzip member — the record-level random-access
    index of a .warc.gz (one member per record per the WARC spec's
    recommendation; the public crawl's CDX indexes store exactly these)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("warc.gz corrupt: lost gzip member sync")
        d = zlib.decompressobj(wbits=31)
        try:
            d.decompress(data[pos:])
        except zlib.error as exc:
            raise ValueError(f"warc.gz corrupt: {exc}") from None
        if not d.eof:
            raise ValueError("warc.gz corrupt: truncated member")
        consumed = (n - pos) - len(d.unused_data)
        out.append((pos, consumed))
        pos += consumed
    return out


def parse_warc_gz(data: bytes) -> list[WarcRecord]:
    """One record per gzip member; a monolithic (single-member) archive
    still parses — the member walk simply yields every record inside."""
    records: list[WarcRecord] = []
    for off, ln in warc_gz_member_ranges(data):
        blob = gzip.decompress(data[off : off + ln])
        records.extend(_parse_records(blob))
    return records


def split_http_response(payload: bytes):
    """HTTP response payload → (status_code, headers_dict, body). The
    WARC 'response' record stores the raw HTTP message."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    head = payload[:sep].split(b"\r\n")
    parts = head[0].split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError("HTTP corrupt: bad status line")
    status = int(parts[1])
    headers = {}
    for line in head[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
    return status, headers, payload[sep + 4 :]


def html_to_text(html: str) -> str:
    """Visible-text extraction: script/style/template subtrees dropped,
    entities decoded (stdlib), block-level boundaries become newlines,
    whitespace collapsed per line. Deterministic — the oracle-safe
    foundation the curation pipeline runs on raw crawl HTML."""
    from html.parser import HTMLParser

    _BLOCK = {
        "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2", "h3",
        "h4", "h5", "h6", "section", "article", "header", "footer",
        "blockquote", "pre", "title", "body",
    }
    _DROP = {"script", "style", "template", "noscript"}

    class _X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.out: list[str] = []
            self.drop = 0

        def handle_starttag(self, tag, attrs):
            if tag in _DROP:
                self.drop += 1
            elif tag in _BLOCK:
                self.out.append("\n")

        def handle_endtag(self, tag):
            if tag in _DROP:
                self.drop = max(0, self.drop - 1)
            elif tag in _BLOCK:
                self.out.append("\n")

        def handle_data(self, d):
            if not self.drop:
                self.out.append(d)

    x = _X()
    x.feed(html)
    x.close()
    lines = ("".join(x.out)).split("\n")
    cleaned = [" ".join(ln.split()) for ln in lines]
    return "\n".join(ln for ln in cleaned if ln)


# ---------------------------------------------------------------------------
# Writers (spec-shaped fixtures)
# ---------------------------------------------------------------------------


def build_warc(records: list[dict]) -> bytes:
    """records: dicts with warc_type, payload (+ optional target_uri,
    date, content_type). Emits WARC/1.0 with exact Content-Lengths."""
    out = b""
    for i, r in enumerate(records):
        payload = r["payload"]
        headers = [
            ("WARC-Type", r["warc_type"]),
            ("WARC-Record-ID", f"<urn:uuid:{i:032x}>"),
            ("WARC-Date", r.get("date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if r.get("target_uri"):
            headers.append(("WARC-Target-URI", r["target_uri"]))
        if r.get("content_type"):
            headers.append(("Content-Type", r["content_type"]))
        out += (
            b"WARC/1.0\r\n"
            + b"".join(f"{k}: {v}\r\n".encode("latin-1") for k, v in headers)
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
    return out


def build_warc_gz(records: list[dict]) -> bytes:
    """One gzip member per record (the spec-recommended layout that makes
    per-record ranged access possible)."""
    out = b""
    for r in records:
        out += gzip.compress(build_warc([r]), mtime=0)
    return out


def http_response_payload(body: bytes, content_type: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def read_warc(spark, paths: list[str], parallelism: int | None = None):
    """(path, record_idx, warc_type, target_uri, date, content_type,
    http_status, payload) rows across WARC / .warc.gz archives — one
    task per archive, records parsed map-side, payloads never reach the
    driver. http_status is null for non-response records."""
    import pandas as pd

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    if parallelism:
        pdf = pdf.repartition(parallelism)

    cols = ["path", "record_idx", "warc_type", "target_uri", "date",
            "content_type", "http_status", "payload"]

    def run(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                with open(path, "rb") as fh:
                    blob = fh.read()
                recs = (
                    parse_warc_gz(blob)
                    if blob[:2] == b"\x1f\x8b"
                    else parse_warc(blob)
                )
                for i, r in enumerate(recs):
                    status = None
                    if r.warc_type == "response" and r.payload.startswith(b"HTTP/"):
                        try:
                            status, _, _ = split_http_response(r.payload)
                        except ValueError:
                            status = None
                    rows.append(
                        (path, i, r.warc_type, r.target_uri, r.date,
                         r.content_type, status, r.payload)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pdf.mapInPandas(
        run,
        "path string, record_idx int, warc_type string, target_uri string, "
        "date string, content_type string, http_status int, payload binary",
    )


def warc_text_extract(records):
    """response records → (target_uri, status, text) via the HTTP split +
    HTML extraction, Arrow-batched map-side — the handoff point into the
    text curation pipeline (quality/lang/dedup run on `text`)."""
    import pandas as pd

    def run(batches):
        for b in batches:
            rows = []
            for uri, wtype, payload in zip(
                b["target_uri"], b["warc_type"], b["payload"]
            ):
                if wtype != "response":
                    continue
                payload = bytes(payload)
                if not payload.startswith(b"HTTP/"):
                    continue
                status, headers, body = split_http_response(payload)
                text = html_to_text(body.decode("utf-8", "replace"))
                rows.append((uri, status, text))
            yield pd.DataFrame(rows, columns=["target_uri", "status", "text"])

    return records.select("target_uri", "warc_type", "payload").mapInPandas(
        run, "target_uri string, status int, text string"
    )
