"""From-scratch PDF text-extraction kernel (no pdfplumber/pypdf).

Covers the subset the reference fixtures exercise (SURVEY.md §1.2): object
scanning, page-tree walk, FlateDecode, content-stream tokenization
(BT/ET, Tf, Td/TD/Tm/T*/TL, Tj/TJ/'/\"), literal+hex string decoding,
ToUnicode CMap (bfchar+bfrange) glyph→unicode mapping with a WinAnsi-ish
fallback, per-page error recovery, and line-clustering reading order.

Pure Python, no Ray dependency — wrapped by stages.doc_parse for pipelines.
"""

from .parser import PdfError, extract_page_texts, extract_text

__all__ = ["extract_text", "extract_page_texts", "PdfError"]
