"""Tolerant HTML tokenizer + jusText-style block scoring.

Pipeline: tokenize → segment into blocks at block-level tag boundaries →
score each block on length, link density, and boilerplate ancestry
(nav/header/footer/aside/form/menu) → keep good blocks in document order.
Inline ``<img>`` elements inside kept flow are emitted as ``image`` spans
at their position with ``media_ref`` = the ``src`` attribute.

Thresholds are fixed constants (deterministic goldens — SURVEY.md §7.3):
  MIN_TEXT_LEN = 25      chars for a full text block
  MIN_HEADING_LEN = 8    chars for h1-h3 headings
  MAX_LINK_DENSITY = 0.33 for body blocks, 0.5 for headings
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MIN_TEXT_LEN = 25
MIN_HEADING_LEN = 8
MAX_LINK_DENSITY = 0.33
MAX_HEADING_LINK_DENSITY = 0.5

BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "main", "blockquote", "pre", "tr", "table",
    "ul", "ol", "nav", "header", "footer", "aside", "form", "br", "body", "title",
}
BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "form", "menu", "script", "style"}
HEADING_TAGS = {"h1", "h2", "h3"}
RAW_TEXT_TAGS = {"script", "style"}
VOID_TAGS = {"br", "img", "hr", "meta", "link", "input", "area", "base", "col", "embed", "source", "wbr"}

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_ATTR_RE = re.compile(r"([a-zA-Z-]+)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)")
_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")
_WS_RE = re.compile(r"\s+")

_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "mdash": "—", "ndash": "–", "hellip": "…", "copy": "©",
}


def _decode_entities(text: str) -> str:
    def _chr(code: int) -> str:
        # reject out-of-range and surrogate codepoints: a lone surrogate in
        # the output would make the string un-encodable as UTF-8 (Arrow
        # conversion would crash the batch)
        if code > 0x10FFFF or 0xD800 <= code <= 0xDFFF:
            return "�"
        return chr(code)

    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#x") or e.startswith("#X"):
            try:
                return _chr(int(e[2:], 16))
            except (ValueError, OverflowError):
                return m.group(0)
        if e.startswith("#"):
            try:
                return _chr(int(e[1:]))
            except (ValueError, OverflowError):
                return m.group(0)
        return _NAMED_ENTITIES.get(e.lower(), m.group(0))

    return _ENTITY_RE.sub(sub, text)


@dataclass
class HtmlSpan:
    kind: str  # "text" | "image"
    text: str
    media_ref: str


@dataclass
class _Block:
    parts: list[str]
    link_chars: int
    boiler_depth: int
    heading: str | None  # heading tag if the block is inside h1-h3
    items: list[tuple[str, str]]  # interleaved ("text"-part-index markers, images)

    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.parts)).strip()


def _parse_attrs(raw: str) -> dict[str, str]:
    out = {}
    for m in _ATTR_RE.finditer(raw):
        v = m.group(2)
        if v and v[0] in "\"'":
            v = v[1:-1]
        out[m.group(1).lower()] = v
    return out


def extract_main_content(html: str) -> list[HtmlSpan]:
    """Extract ordered main-content spans from an HTML document/fragment."""
    blocks: list[_Block] = []
    images: list[tuple[int, str]] = []  # (block_index_at_emit, src)
    boiler_depth = 0
    heading_stack: list[str] = []
    raw_until: str | None = None
    cur = _Block([], 0, 0, None, [])
    link_depth = 0

    def flush() -> None:
        nonlocal cur
        if cur.parts or cur.items:
            blocks.append(cur)
        cur = _Block([], 0, boiler_depth, heading_stack[-1] if heading_stack else None, [])

    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            lt = n
        if lt > pos and raw_until is None:
            chunk = _decode_entities(html[pos:lt])
            if chunk:
                cur.parts.append(chunk)
                if link_depth > 0:
                    cur.link_chars += len(_WS_RE.sub(" ", chunk).strip())
        if lt >= n:
            break
        # comment?
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            pos = n if end < 0 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt)
            pos = n if end < 0 else end + 1
            continue
        m = _TAG_RE.match(html, lt)
        if not m:
            if raw_until is None:
                cur.parts.append("<")
            pos = lt + 1
            continue
        closing, tag, rawattrs = m.group(1) == "/", m.group(2).lower(), m.group(3)
        pos = m.end()
        if raw_until is not None:
            if closing and tag == raw_until:
                raw_until = None
            continue
        if tag in RAW_TEXT_TAGS and not closing:
            # raw text element: skip to its close tag
            close = re.search(rf"</{tag}\s*>", html[pos:], re.I)
            pos = n if close is None else pos + close.end()
            continue
        if tag == "img" and not closing:
            attrs = _parse_attrs(rawattrs)
            src = attrs.get("src", "")
            cur.items.append(("image", src))
            continue
        if tag == "a":
            link_depth = max(0, link_depth + (-1 if closing else 1))
            if not closing:
                cur.parts.append(" ")  # anchor boundary acts as whitespace
            continue
        if tag in BLOCK_TAGS:
            flush()
            if tag in BOILERPLATE_TAGS and tag not in RAW_TEXT_TAGS:
                boiler_depth = max(0, boiler_depth + (-1 if closing else 1))
                cur.boiler_depth = boiler_depth
            if tag in HEADING_TAGS:
                if closing:
                    if heading_stack:
                        heading_stack.pop()
                elif tag not in VOID_TAGS:
                    heading_stack.append(tag)
                cur.heading = heading_stack[-1] if heading_stack else None
        # inline non-anchor tags: ignored (text flows through)
    flush()

    out: list[HtmlSpan] = []
    for b in blocks:
        text = b.text()
        imgs = [src for kind, src in b.items if kind == "image"]
        keep = False
        if text and b.boiler_depth == 0:
            density = (b.link_chars / len(text)) if text else 1.0
            if b.heading:
                keep = len(text) >= MIN_HEADING_LEN and density <= MAX_HEADING_LINK_DENSITY
            else:
                keep = len(text) >= MIN_TEXT_LEN and density <= MAX_LINK_DENSITY
        if keep:
            out.append(HtmlSpan("text", text, ""))
        if b.boiler_depth == 0:
            for src in imgs:
                out.append(HtmlSpan("image", "", src))
    return out


def extract_metadata(html: str) -> dict:
    """Head metadata: ``title``, meta ``description``, ``canonical`` link —
    the web-corpus provenance fields (extract_main_content deliberately
    drops <title> as boilerplate; this scanner reads it).  Same tolerant
    tokenizer (``_TAG_RE``/``_parse_attrs``/``_decode_entities``); first
    occurrence wins; missing fields are ''."""
    out = {"title": "", "description": "", "canonical": ""}
    pos, n = 0, len(html)
    while pos < n and not all(out.values()):
        lt = html.find("<", pos)
        if lt < 0:
            break
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            pos = n if end < 0 else end + 3
            continue
        m = _TAG_RE.match(html, lt)
        if not m:
            pos = lt + 1
            continue
        closing, tag = m.group(1) == "/", m.group(2).lower()
        pos = m.end()
        if closing:
            continue
        if tag in RAW_TEXT_TAGS:
            # skip script/style bodies — markup-like strings inside them
            # must not be parsed as real tags (same rule as the main
            # extractor at its RAW_TEXT_TAGS branch)
            close = re.search(rf"</{tag}\s*>", html[pos:], re.I)
            pos = n if close is None else pos + close.end()
            continue
        if tag == "title" and not out["title"]:
            close = re.search(r"</title\s*>", html[pos:], re.I)
            raw = html[pos:] if close is None else html[pos:pos + close.start()]
            out["title"] = _WS_RE.sub(" ", _decode_entities(raw)).strip()
            if close is not None:
                pos += close.end()
        elif tag == "meta" and not out["description"]:
            attrs = _parse_attrs(m.group(3))
            if attrs.get("name", "").lower() == "description":
                out["description"] = _WS_RE.sub(
                    " ", _decode_entities(attrs.get("content", ""))).strip()
        elif tag == "link" and not out["canonical"]:
            attrs = _parse_attrs(m.group(3))
            if attrs.get("rel", "").lower() == "canonical":
                out["canonical"] = attrs.get("href", "").strip()
        elif tag == "body":
            break  # head metadata only — don't scan the document body
    return out
