"""Round-trip proofs for the stdlib PDF text codec (operators/pdfcodec):
for printable-ASCII pages, extract(encode(pages)) must reproduce the
input exactly — the property that lets multimodal_pdf_text carry a full
value oracle computed from the source text."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crocus_spark.operators.pdfcodec import (
    encode_pdf,
    extract_pdf_text,
    pdf_page_count,
)

PRINTABLE = string.ascii_letters + string.digits + string.punctuation + " "


def test_roundtrip_basic():
    pages = ["Hello world", "Second page 1234", ""]
    pdf = encode_pdf(pages)
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert extract_pdf_text(pdf).split("\f") == pages
    assert pdf_page_count(pdf) == 3


def test_roundtrip_escapes_and_nesting():
    tricky = [
        r"parens () and \ backslash",
        "((nested (deep)))",
        "\\\\double\\\\",
        ")" * 5 + "(" * 5,  # unbalanced run, escaped by the writer
    ]
    assert extract_pdf_text(encode_pdf(tricky)).split("\f") == tricky


def test_roundtrip_chunk_boundaries():
    for n in (0, 1, 39, 40, 41, 80, 137):
        t = (PRINTABLE * 3)[:n]
        assert extract_pdf_text(encode_pdf([t])).split("\f") == [t]


def test_encode_deterministic():
    pages = ["same input", "same bytes"]
    assert encode_pdf(pages) == encode_pdf(pages)


def test_octal_and_hex_strings_parse():
    # hand-written uncompressed-free stream exercising forms the writer
    # doesn't emit: Tj with octal escape, hex string
    import zlib

    content = b"BT (A\\101B) Tj <48495a> Tj ET"
    comp = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + comp
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "AABHIZ"


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(alphabet=PRINTABLE, max_size=300), min_size=1, max_size=4
    )
)
def test_roundtrip_property(pages):
    assert extract_pdf_text(encode_pdf(pages)).split("\f") == pages
    assert pdf_page_count(encode_pdf(pages)) == len(pages)
