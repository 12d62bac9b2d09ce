"""Document-format text extraction: DOCX, EPUB, and (minimal) PDF.

Document corpora are the other half of web text: office files and
ebooks are ZIP containers with XML/HTML inside (both stdlib-parseable),
and machine-generated PDFs carry text in FlateDecoded content streams
whose operators are published in the PDF specification. This module
extracts the visible text from all three without external libraries:

- DOCX (ECMA-376/OOXML): `word/document.xml` inside the ZIP; text lives
  in `w:t` elements, paragraphs (`w:p`) become line breaks.
- EPUB (IDPF spec): XHTML chapters inside the ZIP (located via the OPF
  manifest when present, falling back to every .x/html entry in reading
  order), extracted through the same HTML→text path WARC uses.
- PDF (ISO 32000 subset): classic xref tables or no-xref scanning,
  object graph, FlateDecode streams, and the text-showing operators
  (Tj, ', ", TJ) inside BT/ET blocks with literal/hex string syntax,
  escape sequences and paragraph breaks on Td/TD/T*. Scope is stated
  honestly: simple fonts with standard 1-byte encodings — the shape of
  machine-generated PDFs, which dominate crawls; CID-keyed composite
  fonts would need font-program parsing (documented non-goal).

All extractors honor the hostile-input contract (ValueError only) and
run map-side behind `extract_document_text` — the Arrow-batched Spark
operator that dispatches on magic bytes and hands text to the curation
pipeline, exactly like `warc_text_extract` does for crawl HTML.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib

__all__ = [
    "docx_text",
    "epub_text",
    "pdf_text",
    "sniff_document",
    "extract_document_text",
    "build_docx",
    "build_epub",
    "build_pdf",
]


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------


# RuntimeError: zipfile raises it for password-protected members, which a
# bit-flipped flag byte can fake — hostile input, not a programming error.
_ZIP_ERRORS = (
    zipfile.BadZipFile, KeyError, NotImplementedError, OSError, EOFError,
    zlib.error, RuntimeError,
)


def docx_text(payload: bytes) -> str:
    """Paragraph-per-line text from word/document.xml (w:t runs)."""
    import xml.etree.ElementTree as ET

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        xml = zf.read("word/document.xml")
    except _ZIP_ERRORS as exc:
        raise ValueError(f"DOCX corrupt: {exc}") from None
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"DOCX corrupt: bad XML ({exc})") from None
    w = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    lines = []
    for p in root.iter(f"{w}p"):
        runs = [t.text or "" for t in p.iter(f"{w}t")]
        line = " ".join("".join(runs).split())
        if line:
            lines.append(line)
    return "\n".join(lines)


def build_docx(paragraphs: list[str]) -> bytes:
    """Minimal conformant OOXML package for fixtures."""
    from xml.sax.saxutils import escape

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{w}"><w:body>{body}</w:body></w:document>'
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# EPUB
# ---------------------------------------------------------------------------


def epub_text(payload: bytes) -> str:
    """Chapter text in spine order (OPF manifest when present; otherwise
    every .xhtml/.html entry in archive order) via the shared HTML
    extractor."""
    from hdp2_5_hive2_spark.llm.warc import html_to_text

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        names = zf.namelist()
    except _ZIP_ERRORS as exc:
        raise ValueError(f"EPUB corrupt: {exc}") from None
    order: list[str] = []
    opf = next((n for n in names if n.endswith(".opf")), None)
    if opf:
        import xml.etree.ElementTree as ET

        try:
            root = ET.fromstring(zf.read(opf))
        except (ET.ParseError, *_ZIP_ERRORS) as exc:
            raise ValueError(f"EPUB corrupt: bad OPF ({exc})") from None
        ns = {"o": "http://www.idpf.org/2007/opf"}
        items = {
            it.get("id"): it.get("href")
            for it in root.findall(".//o:manifest/o:item", ns)
        }
        base = opf.rsplit("/", 1)[0] + "/" if "/" in opf else ""
        for ref in root.findall(".//o:spine/o:itemref", ns):
            href = items.get(ref.get("idref"))
            if href and base + href in names:
                order.append(base + href)
    if not order:
        order = [n for n in names if n.endswith((".xhtml", ".html", ".htm"))]
    parts = []
    for name in order:
        try:
            chapter = zf.read(name)
        except _ZIP_ERRORS as exc:
            raise ValueError(f"EPUB corrupt: {exc}") from None
        t = html_to_text(chapter.decode("utf-8", "replace"))
        if t:
            parts.append(t)
    return "\n".join(parts)


def build_epub(chapters: list[str], with_opf: bool = True) -> bytes:
    from xml.sax.saxutils import escape

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        hrefs = []
        for i, ch in enumerate(chapters):
            href = f"ch{i}.xhtml"
            hrefs.append(href)
            zf.writestr(
                f"OEBPS/{href}",
                f"<html><body><p>{escape(ch)}</p></body></html>",
            )
        if with_opf:
            manifest = "".join(
                f'<item id="c{i}" href="{h}" media-type="application/xhtml+xml"/>'
                for i, h in enumerate(hrefs)
            )
            spine = "".join(
                f'<itemref idref="c{i}"/>' for i in range(len(hrefs))
            )
            zf.writestr(
                "OEBPS/content.opf",
                '<package xmlns="http://www.idpf.org/2007/opf">'
                f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>",
            )
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF (minimal, from the published operator syntax)
# ---------------------------------------------------------------------------

_PDF_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _pdf_literal(buf: bytes, pos: int):
    """Parse a (literal string) with escapes and nested parens."""
    out = []
    depth = 1
    while pos < len(buf):
        c = buf[pos : pos + 1]
        if c == b"\\":
            nxt = buf[pos + 1 : pos + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                oct_s = b""
                while len(oct_s) < 3 and buf[pos + 1 : pos + 2].isdigit():
                    oct_s += buf[pos + 1 : pos + 2]
                    pos += 1
                out.append(chr(int(oct_s, 8)))
                pos += 1
                continue
            out.append(_PDF_ESCAPES.get(nxt, nxt.decode("latin-1")))
            pos += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return "".join(out), pos + 1
        out.append(c.decode("latin-1"))
        pos += 1
    raise ValueError("PDF corrupt: unterminated string")


def _content_text(stream: bytes) -> str:
    """Text-showing operators inside BT/ET: Tj ' \" TJ; Td/TD/T* break
    lines. Single-byte standard encodings (latin-1 view)."""
    out: list[str] = []
    pos = 0
    n = len(stream)
    in_text = False
    pending: list[str] = []

    def flush_line():
        line = " ".join("".join(pending).split())
        if line:
            out.append(line)
        pending.clear()

    while pos < n:
        c = stream[pos : pos + 1]
        if c == b"(":
            s, pos = _pdf_literal(stream, pos + 1)
            # find the operator that consumes this string
            m = re.match(rb"\s*(Tj|'|\")", stream[pos:])
            if in_text:
                pending.append(s)
                if m and m.group(1) in (b"'", b'"'):
                    flush_line()
            if m:
                pos += m.end()
            continue
        if c == b"<" and stream[pos : pos + 2] != b"<<":
            end = stream.find(b">", pos)
            if end < 0:
                raise ValueError("PDF corrupt: unterminated hex string")
            hx = re.sub(rb"\s", b"", stream[pos + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            if in_text:
                pending.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            pos = end + 1
            continue
        if stream[pos : pos + 2] == b"BT":
            in_text = True
            pos += 2
            continue
        if stream[pos : pos + 2] == b"ET":
            flush_line()
            in_text = False
            pos += 2
            continue
        if in_text and (
            stream[pos : pos + 2] in (b"Td", b"TD", b"T*")
        ):
            flush_line()
            pos += 2
            continue
        pos += 1
    flush_line()
    return "\n".join(out)


def pdf_text(payload: bytes) -> str:
    """Visible text from every content stream: objects scanned directly
    (robust to broken xref tables, which crawled PDFs routinely have),
    FlateDecode applied when declared, text operators parsed per spec."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF header)")
    parts: list[str] = []
    for m in re.finditer(rb"(?<!end)stream\r?\n", payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            raise ValueError("PDF corrupt: unterminated stream")
        raw = payload[start:end]
        # the dictionary immediately precedes 'stream'
        dict_at = payload.rfind(b"<<", 0, m.start())
        head = payload[dict_at : m.start()] if dict_at >= 0 else b""
        if b"/FlateDecode" in head:
            # decompressobj stops at the zlib stream end, so the spec's
            # EOL before 'endstream' needs no ambiguous stripping (the
            # compressed data may itself end in 0x0a/0x0d bytes)
            try:
                d = zlib.decompressobj()
                raw = d.decompress(raw) + d.flush()
            except zlib.error as exc:
                raise ValueError(f"PDF corrupt: bad Flate stream ({exc})") from None
        else:
            # plain stream: strip exactly the one EOL the spec writes
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        if b"BT" in raw:
            t = _content_text(raw)
            if t:
                parts.append(t)
    return "\n".join(parts)


def build_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Minimal one-page PDF with a classic xref table for fixtures."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content = "BT /F1 12 Tf 50 700 Td " + " T* ".join(
        f"({esc(ln)}) Tj" for ln in lines
    ) + " ET"
    data = content.encode("latin-1")
    if compress:
        data = zlib.compress(data)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        (b"<< /Length %d%s >>\nstream\n" % (
            len(data), b" /Filter /FlateDecode" if compress else b""
        )) + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Dispatch + Spark operator
# ---------------------------------------------------------------------------


def sniff_document(payload: bytes) -> str:
    if payload.startswith(b"%PDF-"):
        return "pdf"
    if payload[:2] == b"PK":
        try:
            names = zipfile.ZipFile(io.BytesIO(payload)).namelist()
        except _ZIP_ERRORS:
            return "unknown"
        if "word/document.xml" in names:
            return "docx"
        if "mimetype" in names or any(n.endswith(".opf") for n in names):
            return "epub"
        return "zip"
    return "unknown"


def extract_document_text(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """(id, format, text) over binary document payloads — Arrow-batched
    map-side dispatch on magic bytes; unknown formats yield null text
    rather than failing the corpus job (crawls are messy)."""
    import pandas as pd

    def run(batches):
        for b in batches:
            ids, fmts, texts = [], [], []
            for i, payload in zip(b[id_col], b[payload_col]):
                payload = bytes(payload)
                kind = sniff_document(payload)
                text = None
                try:
                    if kind == "pdf":
                        text = pdf_text(payload)
                    elif kind == "docx":
                        text = docx_text(payload)
                    elif kind == "epub":
                        text = epub_text(payload)
                except ValueError:
                    kind, text = "corrupt", None
                ids.append(int(i))
                fmts.append(kind)
                texts.append(text)
            yield pd.DataFrame({"id": ids, "format": fmts, "text": texts})

    return (
        df.select(id_col, payload_col)
        .mapInPandas(run, "id bigint, format string, text string")
        .withColumnRenamed("id", id_col)
    )
