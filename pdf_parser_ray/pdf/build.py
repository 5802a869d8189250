"""PDF fixture *builder*: generates the synthetic corpus PDFs from scratch.

Replicates the *structure* of the two reference fixture classes
(SURVEY.md §1.2, FIXTURES.md §2.1-2.2) without copying any reference bytes:

  - ``minimal_pdf``: PDF 1.4, explicit page tree, uncompressed content
    stream, literal-string ``(…) Tj`` text, Type1 /Helvetica, no ToUnicode
    → exercises the encoding-fallback decode path.
  - ``claim_form_pdf``: PDF 1.7, 5 pages, FlateDecode streams, a subset-style
    font with a /ToUnicode CMap (bfchar + bfrange), text drawn as hex strings
    of 1-byte glyph codes, Tm/Td positioning, and a fragmented table region
    (cell text split across runs) on page 3.
  - error-path fixtures: corrupt-page mix, no-text pages (FIXTURES.md §2.5).

Deterministic: no wall clock, no RNG.
"""

from __future__ import annotations

import zlib


class _Writer:
    """Minimal PDF serializer with a correct xref table."""

    def __init__(self, version: str = "1.7"):
        self.version = version
        self.bodies: list[bytes] = []  # object 1..n

    def add(self, body: bytes) -> int:
        """Add object body (without 'N 0 obj'/'endobj' wrapper); returns obj number."""
        self.bodies.append(body)
        return len(self.bodies)

    def add_stream(self, dict_extra: bytes, data: bytes, compress: bool) -> int:
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        body = (
            b"<< " + filt + b"/Length " + str(len(data)).encode() + b" "
            + dict_extra + b">>\nstream\n" + data + b"\nendstream"
        )
        return self.add(body)

    def build(self, root: int) -> bytes:
        out = bytearray(b"%PDF-" + self.version.encode() + b"\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(self.bodies, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.bodies) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(n).encode() + b" /Root "
            + str(root).encode() + b" 0 R >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n"
        )
        return bytes(out)


# ---------------------------------------------------------------------------
# Minimal PDF (literal strings, no ToUnicode)
# ---------------------------------------------------------------------------

def _escape_literal(s: str) -> bytes:
    b = s.encode("cp1252", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def minimal_pdf(lines: list[str] | None = None) -> bytes:
    """PDF 1.4 single page, uncompressed, literal-string Tj (FIXTURES.md §2.2)."""
    if lines is None:
        lines = ["Customer Name: John Doe"]
    w = _Writer(version="1.4")
    content = bytearray(b"BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
    for i, line in enumerate(lines):
        if i > 0:
            content += b"T*\n"
        content += b"(" + _escape_literal(line) + b") Tj\n"
    content += b"ET\n"
    font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    cont = w.add_stream(b"", bytes(content), compress=False)
    page_placeholder = w.add(b"")  # fixed up below via object numbering order
    pages = w.add(
        b"<< /Type /Pages /Kids [" + str(page_placeholder).encode() + b" 0 R] /Count 1 >>"
    )
    w.bodies[page_placeholder - 1] = (
        b"<< /Type /Page /Parent " + str(pages).encode() + b" 0 R "
        b"/MediaBox [0 0 612 792] /Resources << /Font << /F1 "
        + str(font).encode() + b" 0 R >> >> /Contents " + str(cont).encode() + b" 0 R >>"
    )
    catalog = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
    return w.build(catalog)


# ---------------------------------------------------------------------------
# Claim-form PDF (FlateDecode, ToUnicode CMap, hex strings)
# ---------------------------------------------------------------------------

class _SubsetFont:
    """Assigns 1-byte glyph codes in order of first use; emits a ToUnicode CMap."""

    def __init__(self) -> None:
        self.char_to_code: dict[str, int] = {}

    def encode(self, text: str) -> bytes:
        out = bytearray()
        for ch in text:
            code = self.char_to_code.get(ch)
            if code is None:
                code = len(self.char_to_code) + 1
                if code > 255:
                    raise ValueError("subset font overflow (>255 glyphs)")
                self.char_to_code[ch] = code
            out.append(code)
        return bytes(out)

    def tounicode_cmap(self) -> bytes:
        """bfchar for isolated mappings, bfrange for runs of ≥3 consecutive
        (code, unicode) increments — exercises both CMap sections."""
        items = sorted((code, ch) for ch, code in self.char_to_code.items())
        ranges: list[tuple[int, int, str]] = []
        chars: list[tuple[int, str]] = []
        i = 0
        while i < len(items):
            j = i
            while (
                j + 1 < len(items)
                and items[j + 1][0] == items[j][0] + 1
                and ord(items[j + 1][1]) == ord(items[j][1]) + 1
            ):
                j += 1
            if j - i + 1 >= 3:
                ranges.append((items[i][0], items[j][0], items[i][1]))
            else:
                chars.extend(items[i : j + 1])
            i = j + 1
        out = bytearray(
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
            b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        )
        if chars:
            out += f"{len(chars)} beginbfchar\n".encode()
            for code, ch in chars:
                u = ch.encode("utf-16-be").hex().upper()
                out += f"<{code:02X}> <{u}>\n".encode()
            out += b"endbfchar\n"
        if ranges:
            out += f"{len(ranges)} beginbfrange\n".encode()
            for lo, hi, ch in ranges:
                u = ch.encode("utf-16-be").hex().upper()
                out += f"<{lo:02X}> <{hi:02X}> <{u}>\n".encode()
            out += b"endbfrange\n"
        out += b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
        return bytes(out)


CLAIM_FORM_PAGES: list[list[str]] = [
    [
        "INSURANCE CLAIM FORM",
        "Claim Number: CLM-2024-00817",
        "Customer Name: Jan Kowalski",
        "Policy Number: POL-789456123",
        "Claim Amount: $3,450.00",
        "Address: ul. Floriańska 12, 31-019 Kraków",
        "Phone: +48 12 422 13 55",
    ],
    [
        "VEHICLE INFORMATION",
        "Make: Skoda",
        "Model: Octavia",
        "Year: 2019",
        "VIN: TMBJJ7NE5K0123456",
        "License Plate: KR 4567P",
    ],
    [
        "FINANCIAL SUMMARY",
        # page 3 carries the fragmented table region (built specially below)
    ],
    [
        "PROCESSING INFORMATION",
        "Adjuster: Maria Nowak",
        "Inspection Date: 2024-03-14",
        "Status: APPROVED",
    ],
    [
        "NOTES",
        "Front bumper replacement and paint.",
        "No injuries reported.",
        "Payment due within 30 days.",
    ],
]

# Fragmented rows for page 3: (label runs, value runs) — cell text split across
# multiple hex-string show ops, the canonical reading-order test case.
_TABLE_ROWS: list[tuple[list[str], list[str]]] = [
    (["Item"], ["Cost"]),
    (["Repair"], ["$2,1", "50.0", "0"]),
    (["Amo", "unt"], ["$2,8", "00.0", "0"]),
    (["Deductible"], ["$350.00"]),
    (["Total"], ["$3,450.00"]),
]

_FONT_SIZE = 11.0
_CHAR_W = 0.5  # must equal layout.CHAR_WIDTH_FACTOR for abutting fragments


def _claim_page_content(font: _SubsetFont, lines: list[str], with_table: bool) -> bytes:
    out = bytearray(b"BT\n/F1 11 Tf\n")
    y = 740.0
    for line in lines:
        out += f"1 0 0 1 72 {y:.1f} Tm\n".encode()
        out += b"<" + font.encode(line).hex().upper().encode() + b"> Tj\n"
        y -= 16.0
    if with_table:
        for label_runs, value_runs in _TABLE_ROWS:
            x = 72.0
            for run in label_runs:
                out += f"1 0 0 1 {x:.2f} {y:.1f} Tm\n".encode()
                out += b"<" + font.encode(run).hex().upper().encode() + b"> Tj\n"
                x += _CHAR_W * _FONT_SIZE * len(run)  # abut exactly → no space
            x = 300.0
            for run in value_runs:
                out += f"1 0 0 1 {x:.2f} {y:.1f} Tm\n".encode()
                out += b"<" + font.encode(run).hex().upper().encode() + b"> Tj\n"
                x += _CHAR_W * _FONT_SIZE * len(run)
            y -= 16.0
    out += b"ET\n"
    return bytes(out)


def claim_form_pdf(pages: list[list[str]] | None = None, repeat_pages: int = 1) -> bytes:
    """5-page FlateDecode claim form with ToUnicode hex-string text
    (FIXTURES.md §2.1). ``repeat_pages`` multiplies the page list for the
    oversized-document skew fixture (FIXTURES.md §3)."""
    page_lines = pages if pages is not None else CLAIM_FORM_PAGES
    page_lines = page_lines * repeat_pages
    w = _Writer(version="1.7")
    font = _SubsetFont()
    content_ids: list[int] = []
    for idx, lines in enumerate(page_lines):
        is_table = lines and lines[0] == "FINANCIAL SUMMARY"
        data = _claim_page_content(font, lines, with_table=bool(is_table))
        content_ids.append(w.add_stream(b"", data, compress=True))
    cmap_id = w.add_stream(b"", font.tounicode_cmap(), compress=True)
    font_id = w.add(
        b"<< /Type /Font /Subtype /TrueType /BaseFont /BAAAAA+NotoSynth "
        b"/FirstChar 1 /LastChar " + str(len(font.char_to_code)).encode()
        + b" /ToUnicode " + str(cmap_id).encode() + b" 0 R >>"
    )
    page_ids = [w.add(b"") for _ in page_lines]
    kids = b" ".join(f"{p} 0 R".encode() for p in page_ids)
    pages_id = w.add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(len(page_ids)).encode()
        + b" /Resources << /Font << /F1 " + str(font_id).encode() + b" 0 R >> >> >>"
    )
    for p, c in zip(page_ids, content_ids):
        w.bodies[p - 1] = (
            b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R "
            b"/MediaBox [0 0 612 792] /Contents " + str(c).encode() + b" 0 R >>"
        )
    catalog = w.add(b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>")
    return w.build(catalog)


# ---------------------------------------------------------------------------
# Error-path fixtures (FIXTURES.md §2.5)
# ---------------------------------------------------------------------------

def corrupt_page_mix_pdf() -> bytes:
    """2 pages: page 1 has a corrupt Flate stream, page 2 is valid → page 1
    lands in page_errors, doc succeeds with page 2 text."""
    w = _Writer(version="1.4")
    font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    bad = w.add(
        b"<< /Filter /FlateDecode /Length 16 >>\nstream\n"
        b"\xde\xad\xbe\xef\xde\xad\xbe\xef\xde\xad\xbe\xef\xde\xad\xbe\xef"
        b"\nendstream"
    )
    good = w.add_stream(
        b"", b"BT\n/F1 12 Tf\n72 720 Td\n(Recovered page two text) Tj\nET\n", compress=False
    )
    p1 = w.add(b"")
    p2 = w.add(b"")
    pages = w.add(
        b"<< /Type /Pages /Kids [" + f"{p1} 0 R {p2} 0 R".encode() + b"] /Count 2 "
        b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>"
    )
    for p, c in ((p1, bad), (p2, good)):
        w.bodies[p - 1] = (
            b"<< /Type /Page /Parent " + str(pages).encode() + b" 0 R "
            b"/MediaBox [0 0 612 792] /Contents " + str(c).encode() + b" 0 R >>"
        )
    catalog = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
    return w.build(catalog)


def no_text_pdf() -> bytes:
    """Valid single page whose content has no text ops → doc-level
    'Failed to extract text from any page' error."""
    w = _Writer(version="1.4")
    cont = w.add_stream(b"", b"0 0 612 792 re S\n", compress=False)
    p = w.add(b"")
    pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 >>")
    w.bodies[p - 1] = (
        b"<< /Type /Page /Parent " + str(pages).encode() + b" 0 R "
        b"/MediaBox [0 0 612 792] /Contents " + str(cont).encode() + b" 0 R >>"
    )
    catalog = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
    return w.build(catalog)


def not_a_pdf() -> bytes:
    """FIXTURES.md §2.5 invalid-magic payload."""
    return b"This is not a PDF file" + b"x" * 100


def objstm_pdf() -> bytes:
    """PDF 1.5-style fixture: page tree + font dicts packed into a compressed
    /ObjStm; only the content stream and the ObjStm are direct objects."""
    w = _Writer(version="1.5")
    content = b"BT\n/F1 12 Tf\n72 720 Td\n(Text from an object stream) Tj\nET\n"
    cont = w.add_stream(b"", content, compress=False)
    # objects 10..13 live inside the ObjStm: catalog, pages, page, font
    inner = {
        10: b"<< /Type /Catalog /Pages 11 0 R >>",
        11: b"<< /Type /Pages /Kids [12 0 R] /Count 1 >>",
        12: (b"<< /Type /Page /Parent 11 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 13 0 R >> >> /Contents "
             + str(cont).encode() + b" 0 R >>"),
        13: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    header = bytearray()
    body = bytearray()
    for num, objbytes in inner.items():
        header += f"{num} {len(body)} ".encode()
        body += objbytes + b"\n"
    first = len(header)
    w.add_stream(
        b"/Type /ObjStm /N " + str(len(inner)).encode() + b" /First "
        + str(first).encode() + b" ",
        bytes(header) + bytes(body), compress=True,
    )
    return w.build(root=10)
