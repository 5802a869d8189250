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
            runs = TextInterpreter(decoders).run(content)
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
