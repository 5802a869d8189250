"""From-scratch PDF kernel: builder→parser roundtrip, golden content, CMap
decode, reading order, error recovery (reference text_extractor semantics)."""

import zlib

import pytest

from pdf_parser_ray.pdf import PdfError, extract_page_texts, extract_text
from pdf_parser_ray.pdf.build import (
    claim_form_pdf,
    corrupt_page_mix_pdf,
    minimal_pdf,
    no_text_pdf,
    not_a_pdf,
)
from pdf_parser_ray.pdf.fonts import parse_tounicode
from pdf_parser_ray.pdf.objects import Lexer, PdfDocument, Ref


class TestMinimalPdf:
    def test_single_line(self):
        assert extract_text(minimal_pdf()) == "Customer Name: John Doe"

    def test_multi_line(self):
        text = extract_text(minimal_pdf(["Line one", "Line two", "Line three"]))
        assert text == "Line one\nLine two\nLine three"

    def test_escaped_parens(self):
        assert extract_text(minimal_pdf(["a (b) c"])) == "a (b) c"


class TestClaimForm:
    def test_five_pages(self):
        texts, errors = extract_page_texts(claim_form_pdf())
        assert len(texts) == 5 and errors == []

    def test_golden_page1(self):
        texts, _ = extract_page_texts(claim_form_pdf())
        lines = texts[0].split("\n")
        assert lines[0] == "INSURANCE CLAIM FORM"
        assert "Customer Name: Jan Kowalski" in lines
        assert "Policy Number: POL-789456123" in lines
        assert "Claim Amount: $3,450.00" in lines
        assert any("Kraków" in ln for ln in lines)  # ToUnicode unicode decode

    def test_fragmented_table_merged(self):
        # cell text split into runs ("Amo"/"unt", "$2,8"/"00.0"/"0") must
        # reassemble via line clustering (SURVEY.md §1.2 canonical case)
        texts, _ = extract_page_texts(claim_form_pdf())
        page3 = texts[2]
        assert "Amount $2,800.00" in page3
        assert "Repair $2,150.00" in page3

    def test_deterministic(self):
        assert claim_form_pdf() == claim_form_pdf()
        assert extract_text(claim_form_pdf()) == extract_text(claim_form_pdf())

    def test_repeat_pages_skew_fixture(self):
        big = claim_form_pdf(repeat_pages=3)
        texts, _ = extract_page_texts(big)
        assert len(texts) == 15


class TestErrorSemantics:
    def test_corrupt_page_skipped(self):
        # reference text_extractor.py:49-56: skip bad page, keep going
        texts, errors = extract_page_texts(corrupt_page_mix_pdf())
        assert texts == ["Recovered page two text"]
        assert len(errors) == 1 and "page 1" in errors[0]

    def test_no_text_any_page(self):
        with pytest.raises(PdfError, match="Failed to extract text from any page"):
            extract_text(no_text_pdf())

    def test_not_a_pdf(self):
        with pytest.raises(PdfError):
            extract_text(not_a_pdf())

    def test_truncated_pdf(self):
        with pytest.raises(PdfError):
            extract_text(b"%PDF-1.4\njunk without objects")


class TestObjectParser:
    def test_values(self):
        lex = Lexer(b"<< /A 1 /B (lit) /C <414243> /D [1 2.5 /N] /E 3 0 R /F true >>")
        d = lex.parse_value()
        assert d["A"] == 1
        assert d["B"] == b"lit"
        assert d["C"] == b"ABC"
        assert d["D"] == [1, 2.5, "N"]
        assert d["E"] == Ref(3, 0)
        assert d["F"] is True

    def test_literal_escapes(self):
        lex = Lexer(rb"(a\(b\)c \\ \n \101)")
        assert lex.parse_value() == b"a(b)c \\ \n A"

    def test_nested_parens(self):
        lex = Lexer(b"(a (nested) b)")
        assert lex.parse_value() == b"a (nested) b"

    def test_odd_hex_padded(self):
        lex = Lexer(b"<41424>")
        assert lex.parse_value() == b"AB@"

    def test_name_hex_escape(self):
        lex = Lexer(b"/A#20B")
        assert lex.parse_value() == "A B"

    def test_flate_stream_roundtrip(self):
        doc = PdfDocument(minimal_pdf())
        pages = doc.pages()
        assert len(pages) == 1
        content = doc.page_content(pages[0])
        assert b"Customer Name" in content

    def test_comment_skipped(self):
        lex = Lexer(b"% a comment\n42")
        assert lex.parse_value() == 42


class TestToUnicode:
    def test_bfchar(self):
        cmap = b"2 beginbfchar\n<01> <0041>\n<02> <00F3>\nendbfchar\n"
        m = parse_tounicode(cmap)
        assert m == {1: "A", 2: "ó"}

    def test_bfrange_contiguous(self):
        cmap = b"1 beginbfrange\n<05> <07> <0061>\nendbfrange\n"
        m = parse_tounicode(cmap)
        assert m == {5: "a", 6: "b", 7: "c"}

    def test_bfrange_array(self):
        cmap = b"1 beginbfrange\n<01> <02> [<0058> <0059>]\nendbfrange\n"
        assert parse_tounicode(cmap) == {1: "X", 2: "Y"}

    def test_mixed_sections(self):
        cmap = (b"1 beginbfchar\n<10> <0041>\nendbfchar\n"
                b"1 beginbfrange\n<20> <21> <0061>\nendbfrange\n")
        assert parse_tounicode(cmap) == {0x10: "A", 0x20: "a", 0x21: "b"}

    def test_multibyte_target(self):
        # surrogate pair target (e.g. emoji) decodes via utf-16-be
        cmap = b"1 beginbfchar\n<01> <D83DDE00>\nendbfchar\n"
        assert parse_tounicode(cmap) == {1: "\U0001f600"}


class TestContentOps:
    def _single_page(self, content: bytes) -> bytes:
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        c = w.add_stream(b"", content, compress=False)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 "
                      b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>")
        w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode() +
                           b" 0 R /Contents " + str(c).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        return w.build(cat)

    def test_tj_array_with_kerning(self):
        pdf = self._single_page(b"BT /F1 12 Tf 72 700 Td [(Hel) -20 (lo)] TJ ET")
        assert extract_text(pdf) == "Hello"

    def test_quote_op_advances_line(self):
        pdf = self._single_page(b"BT /F1 12 Tf 14 TL 72 700 Td (one) Tj (two) ' ET")
        assert extract_text(pdf) == "one\ntwo"

    def test_tm_positioning_orders_lines(self):
        pdf = self._single_page(
            b"BT /F1 12 Tf 1 0 0 1 72 650 Tm (below) Tj 1 0 0 1 72 700 Tm (above) Tj ET")
        assert extract_text(pdf) == "above\nbelow"

    def test_space_inserted_on_gap(self):
        pdf = self._single_page(
            b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (left) Tj 1 0 0 1 200 700 Tm (right) Tj ET")
        assert extract_text(pdf) == "left right"


class TestXYCut:
    def _two_col(self, offset: float) -> bytes:
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        content = bytearray(b"BT /F1 10 Tf\n")
        for i, line in enumerate(["Left one", "Left two", "Left three", "Left four"]):
            content += f"1 0 0 1 72 {700 - 16 * i} Tm\n".encode() + b"(" + line.encode() + b") Tj\n"
        for i, line in enumerate(["Right one", "Right two", "Right three", "Right four"]):
            content += (f"1 0 0 1 340 {700 - offset - 16 * i} Tm\n".encode()
                        + b"(" + line.encode() + b") Tj\n")
        content += b"ET\n"
        c = w.add_stream(b"", bytes(content), compress=False)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 "
                      b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>")
        w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode()
                           + b" 0 R /Contents " + str(c).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        return w.build(cat)

    def test_misaligned_columns_read_in_order(self):
        # true two-column layout (independent baselines) → left col first
        text = extract_text(self._two_col(offset=7.0))
        assert text == ("Left one\nLeft two\nLeft three\nLeft four\n"
                        "Right one\nRight two\nRight three\nRight four")

    def test_aligned_baselines_merge_as_table(self):
        # shared baselines = table rows → cells merge per line (golden
        # contract: claim-form page 3 semantics)
        text = extract_text(self._two_col(offset=0.0))
        assert text.split("\n")[0] == "Left one Right one"


class TestObjectStreams:
    def test_objstm_pdf_parses(self):
        from pdf_parser_ray.pdf.build import objstm_pdf

        assert extract_text(objstm_pdf()) == "Text from an object stream"

    def test_direct_objects_win_over_objstm(self):
        # a direct object with the same number shadows the ObjStm copy
        from pdf_parser_ray.pdf.build import objstm_pdf

        doc = PdfDocument(objstm_pdf())
        assert 10 in doc.objects and 13 in doc.objects


class TestFormXObjects:
    def test_do_operator_extracts_form_text(self):
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        form = w.add_stream(
            b"/Subtype /Form /BBox [0 0 200 50] "
            b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> ",
            b"BT /F1 12 Tf 0 10 Td (Inside the form) Tj ET", compress=False)
        cont = w.add_stream(
            b"", b"BT /F1 12 Tf 72 700 Td (Page text) Tj ET\n/Fm1 Do\n", compress=False)
        p = w.add(b"")
        pages = w.add(
            b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 >>")
        w.bodies[p - 1] = (
            b"<< /Type /Page /Parent " + str(pages).encode() + b" 0 R "
            b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> "
            b"/XObject << /Fm1 " + str(form).encode() + b" 0 R >> >> "
            b"/Contents " + str(cont).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        text = extract_text(w.build(cat))
        assert "Page text" in text and "Inside the form" in text


class TestInlineImages:
    def test_bi_ei_binary_skipped(self):
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        content = (b"BT /F1 12 Tf 72 700 Td (before) Tj ET\n"
                   b"BI /W 2 /H 2 /BPC 8 /CS /G ID \xff\x00(\x29\\ garbage EI\n"
                   b"BT /F1 12 Tf 72 680 Td (after) Tj ET")
        c = w.add_stream(b"", content, compress=False)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 "
                      b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>")
        w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode()
                           + b" 0 R /Contents " + str(c).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        assert extract_text(w.build(cat)) == "before\nafter"

    def test_ei_bytes_inside_image_data_do_not_truncate(self):
        # pixel data contains a raw 'EI' pair with NON-whitespace neighbors;
        # only the whitespace-delimited EI terminates the image
        from pdf_parser_ray.pdf.content import tokenize_content

        content = (b"BT (before) Tj ET\n"
                   b"BI /W 2 /H 2 /BPC 8 /CS /G ID \xffEI\xfe(junkEIjunk EI\n"
                   b"BT (after) Tj ET")
        ops = [(operands, op) for operands, op in tokenize_content(content)]
        shown = [o[-1] for o, op in ops if op == "Tj"]
        assert shown == [b"before", b"after"]

    def test_ei_at_end_of_stream(self):
        from pdf_parser_ray.pdf.content import tokenize_content

        content = b"BI /W 1 /H 1 ID \x00 EI"
        assert list(tokenize_content(content)) == []


class TestTwoByteCid:
    def test_two_byte_cmap_decode(self):
        # CID-style font: 2-byte source codes in the CMap → FontDecoder
        # infers code_bytes=2 and decodes hex strings pairwise
        from pdf_parser_ray.pdf.fonts import parse_tounicode, FontDecoder

        cmap = (b"2 beginbfchar\n<0101> <0048>\n<0102> <0069>\nendbfchar\n")
        m = parse_tounicode(cmap)
        assert m == {0x0101: "H", 0x0102: "i"}
        dec = FontDecoder(m, code_bytes=2)
        assert dec.decode(bytes.fromhex("01010102")) == "Hi"

    def test_two_byte_font_in_document(self):
        import zlib as _z
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.7")
        cmap = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                b"3 beginbfchar\n<0101> <0041>\n<0102> <0042>\n<0103> <0043>\nendbfchar\n")
        cmap_id = w.add_stream(b"", cmap, compress=True)
        font = w.add(b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
                     b"/ToUnicode " + str(cmap_id).encode() + b" 0 R >>")
        cont = w.add_stream(
            b"", b"BT /F1 12 Tf 72 700 Td <010101020103> Tj ET", compress=True)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 "
                      b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>")
        w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode()
                           + b" 0 R /Contents " + str(cont).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        assert extract_text(w.build(cat)) == "ABC"


class TestCp1252Fallback:
    def test_win_ansi_characters_roundtrip(self):
        # em-dash / curly quotes exist in cp1252 but not latin-1 printables
        text = "em—dash and “curly” quotes"
        assert extract_text(minimal_pdf([text])) == text


class TestCtm:
    def test_cm_translation_affects_reading_order(self):
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        # second block drawn at the SAME Td but shifted DOWN 500pt via cm
        content = (b"BT /F1 12 Tf 72 700 Td (upper block) Tj ET\n"
                   b"q 1 0 0 1 0 -500 cm "
                   b"BT /F1 12 Tf 72 700 Td (lower block) Tj ET Q\n")
        c = w.add_stream(b"", content, compress=False)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 "
                      b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>")
        w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode()
                           + b" 0 R /Contents " + str(c).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        assert extract_text(w.build(cat)) == "upper block\nlower block"

    def test_q_restores_transform(self):
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        content = (b"q 1 0 0 1 0 -650 cm "
                   b"BT /F1 12 Tf 72 700 Td (shifted to bottom) Tj ET Q\n"
                   b"BT /F1 12 Tf 72 700 Td (back on top) Tj ET\n")
        c = w.add_stream(b"", content, compress=False)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 "
                      b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>")
        w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode()
                           + b" 0 R /Contents " + str(c).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        assert extract_text(w.build(cat)) == "back on top\nshifted to bottom"


class TestFormPlacement:
    def test_cm_placed_form(self):
        from pdf_parser_ray.pdf.build import _Writer

        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        form = w.add_stream(
            b"/Subtype /Form /BBox [0 0 200 50] "
            b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> ",
            b"BT /F1 12 Tf 0 0 Td (placed form text) Tj ET", compress=False)
        # page text at y=700; form drawn at (72, 100) via cm → reads second
        cont = w.add_stream(
            b"", b"BT /F1 12 Tf 72 700 Td (page heading) Tj ET\n"
                 b"q 1 0 0 1 72 100 cm /Fm1 Do Q\n", compress=False)
        p = w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p} 0 R".encode() + b"] /Count 1 >>")
        w.bodies[p - 1] = (
            b"<< /Type /Page /Parent " + str(pages).encode() + b" 0 R "
            b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> "
            b"/XObject << /Fm1 " + str(form).encode() + b" 0 R >> >> "
            b"/Contents " + str(cont).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        assert extract_text(w.build(cat)) == "page heading\nplaced form text"


class TestDecompressionBomb:
    def test_bomb_page_fails_soft(self):
        # a page whose content inflates past the cap must land in
        # page_errors, not OOM the worker
        from pdf_parser_ray.pdf.build import _Writer
        from pdf_parser_ray.pdf.objects import PdfDocument, PdfSyntaxError

        bomb = zlib.compress(b"\x00" * (300 * 1024 * 1024), 9)  # ~300MB → ~300KB
        w = _Writer("1.4")
        font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        c = w.add(b"<< /Filter /FlateDecode /Length " + str(len(bomb)).encode()
                  + b" >>\nstream\n" + bomb + b"\nendstream")
        good = w.add_stream(b"", b"BT /F1 12 Tf 72 700 Td (safe page) Tj ET",
                            compress=False)
        p1, p2 = w.add(b""), w.add(b"")
        pages = w.add(b"<< /Type /Pages /Kids [" + f"{p1} 0 R {p2} 0 R".encode()
                      + b"] /Count 2 /Resources << /Font << /F1 "
                      + str(font).encode() + b" 0 R >> >> >>")
        for p, cc in ((p1, c), (p2, good)):
            w.bodies[p - 1] = (b"<< /Type /Page /Parent " + str(pages).encode()
                               + b" 0 R /Contents " + str(cc).encode() + b" 0 R >>")
        cat = w.add(b"<< /Type /Catalog /Pages " + str(pages).encode() + b" 0 R >>")
        texts, errors = extract_page_texts(w.build(cat))
        assert texts == ["safe page"]
        assert len(errors) == 1 and "exceeds" in errors[0]
