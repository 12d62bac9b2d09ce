"""Document text extraction (llm/documents.py): DOCX/EPUB/PDF fixture
roundtrips, PDF operator syntax (hex strings, octal escapes, nested
parens, Flate streams), spine ordering, the Spark dispatch operator, and
the hostile-input contract."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.documents import (
    build_docx,
    build_epub,
    build_pdf,
    docx_text,
    epub_text,
    extract_document_text,
    pdf_text,
    sniff_document,
)

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=80,
).map(lambda s: " ".join(s.split())).filter(bool)


@settings(max_examples=30, deadline=None)
@given(paras=st.lists(_text, min_size=1, max_size=5))
def test_roundtrip_property_all_formats(paras):
    expect = "\n".join(paras)
    assert docx_text(build_docx(paras)) == expect
    assert epub_text(build_epub(paras)) == expect
    assert pdf_text(build_pdf(paras)) == expect
    assert pdf_text(build_pdf(paras, compress=False)) == expect


def test_pdf_operator_syntax():
    content = b"BT <48656C6C6F> Tj T* (\\101\\102 (nested) \\\\) Tj ET junk BT (x) Tj ET"
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_text(raw) == "Hello\nAB (nested) \\\nx"


def test_epub_spine_order_and_fallback():
    e = build_epub(["one", "two", "three"])
    assert epub_text(e) == "one\ntwo\nthree"
    assert epub_text(build_epub(["solo"], with_opf=False)) == "solo"


def test_sniff_and_corrupt():
    assert sniff_document(build_docx(["x"])) == "docx"
    assert sniff_document(build_epub(["x"])) == "epub"
    assert sniff_document(build_pdf(["x"])) == "pdf"
    assert sniff_document(b"plain text") == "unknown"
    with pytest.raises(ValueError, match="missing %PDF"):
        pdf_text(b"not a pdf")
    with pytest.raises(ValueError, match="DOCX corrupt"):
        docx_text(b"PK\x03\x04garbage")
    with pytest.raises(ValueError, match="unterminated stream"):
        pdf_text(b"%PDF-1.4\n<< >>\nstream\nnope")


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 10))
def test_fuzz_only_valueerror(seed, n_mut):
    import random as _random

    rnd = _random.Random(seed)
    for builder, fn in ((build_docx, docx_text), (build_epub, epub_text),
                        (build_pdf, pdf_text)):
        data = bytearray(builder(["some text here"]))
        for _ in range(n_mut):
            data[rnd.randrange(len(data))] = rnd.randrange(256)
        try:
            fn(bytes(data))
        except ValueError:
            pass


def test_spark_dispatch(spark):
    rows = [
        (0, build_docx(["alpha beta"])),
        (1, build_epub(["gamma delta"])),
        (2, build_pdf(["epsilon zeta"])),
        (3, b"PK\x03\x04broken"),
        (4, b"mystery bytes"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )
    got = {r.doc_id: (r.format, r.text) for r in extract_document_text(df).collect()}
    assert got[0] == ("docx", "alpha beta")
    assert got[1] == ("epub", "gamma delta")
    assert got[2] == ("pdf", "epsilon zeta")
    assert got[3][0] in ("corrupt", "unknown") and got[3][1] is None
    assert got[4] == ("unknown", None)
