"""From-scratch HTML main-content extraction (boilerplate strip).

Tolerant tokenizer + block segmentation + text-density/link-density scoring
in the readability/jusText family (public heuristics; see PAPERS.md). No
external parser libraries. New capability vs the reference (SURVEY.md §2.9).
"""

from .extract import HtmlSpan, extract_main_content, extract_metadata

__all__ = ["extract_main_content", "extract_metadata", "HtmlSpan"]
