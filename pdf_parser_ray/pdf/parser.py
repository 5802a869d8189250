"""Top-level PDF text extraction with reference error semantics.

Mirrors TextExtractor.extract_text
(/root/reference/src/pdf_parser/extractors/text_extractor.py:27-66):
  - no pages → PdfError("PDF contains no pages")
  - per-page failure → skip page, record error, continue (``:49-56``)
  - no page yields text → PdfError("Failed to extract text from any page")
  - page texts joined with "\\n" (``:61``)
"""

from __future__ import annotations

from .content import TextInterpreter
from .fonts import build_font_decoders
from .layout import page_text
from .objects import PdfDocument, PdfSyntaxError


class PdfError(ValueError):
    pass


def extract_page_texts(pdf_bytes: bytes) -> tuple[list[str], list[str]]:
    """Parse a PDF → (per-page texts in order, page error records).

    Pages that fail to parse are skipped (recorded in errors); raises
    PdfError only for document-level failures, matching reference
    text_extractor.py:45-59 semantics.
    """
    try:
        doc = PdfDocument(pdf_bytes)
        pages = doc.pages()
    except PdfSyntaxError as e:
        raise PdfError(f"PDF reading error: {e}") from e
    if not pages:
        raise PdfError("PDF contains no pages")

    texts: list[str] = []
    errors: list[str] = []
    for i, page in enumerate(pages):
        try:
            content = doc.page_content(page)
            decoders = build_font_decoders(doc, page.get("Resources"))
            xobjects = _build_form_xobjects(doc, page.get("Resources"))
            runs = TextInterpreter(decoders, xobjects).run(content)
            txt = page_text(runs)
            if txt:
                texts.append(txt)
        except Exception as e:  # per-page fail-soft (reference :53-56)
            errors.append(f"Failed to process page {i + 1}: {e}")
            continue
    if not texts:
        raise PdfError("Failed to extract text from any page")
    return texts, errors


def extract_text(pdf_bytes: bytes) -> str:
    """Flat document text: page texts joined with '\\n' (reference :61)."""
    texts, _ = extract_page_texts(pdf_bytes)
    return "\n".join(texts)


def _build_form_xobjects(doc, resources) -> dict:
    """name → (decoded form content, form-local font decoders) for /Form
    XObjects in the page resources (text inside forms is extracted inline)."""
    from .fonts import build_font_decoders
    from .objects import PdfSyntaxError, Ref

    out: dict = {}
    res = doc.resolve(resources)
    if not isinstance(res, dict):
        return out
    xobjs = doc.resolve(res.get("XObject"))
    if not isinstance(xobjs, dict):
        return out
    for name, ref in xobjs.items():
        xdict = doc.resolve(ref)
        if not (isinstance(xdict, dict) and str(doc.resolve(xdict.get("Subtype"))) == "Form"):
            continue
        try:
            _, data = doc.get_stream(ref if isinstance(ref, Ref) else ref)
            form_fonts = build_font_decoders(doc, xdict.get("Resources")) or None
            out[str(name)] = (data, form_fonts)
        except PdfSyntaxError:
            continue
    return out
