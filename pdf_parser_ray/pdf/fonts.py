"""Font decoding: ToUnicode CMap parsing + encoding fallback.

Covers the two fixture font classes (SURVEY.md §1.2):
  - TrueType subset fonts with a /ToUnicode CMap (bfchar + bfrange sections,
    1-byte glyph codes, UTF-16BE targets) — text drawn as hex strings.
  - Simple Type1 base fonts with no ToUnicode — byte values decoded via a
    WinAnsi-ish fallback (cp1252, latin-1 per byte on failure).
"""

from __future__ import annotations

import functools

from .objects import Lexer, PdfSyntaxError


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("utf-16-be", "replace")


def parse_tounicode(cmap: bytes) -> dict[int, str]:
    """Parse bfchar/bfrange sections of a ToUnicode CMap stream.

    Returns code→unicode for 1- and 2-byte source codes (code space width
    inferred from the source hex-string length).
    """
    mapping: dict[int, str] = {}
    data = cmap
    pos = 0
    while True:
        i_char = data.find(b"beginbfchar", pos)
        i_range = data.find(b"beginbfrange", pos)
        if i_char < 0 and i_range < 0:
            break
        if i_range < 0 or (0 <= i_char < i_range):
            start, endkw, is_range = i_char + len(b"beginbfchar"), b"endbfchar", False
        else:
            start, endkw, is_range = i_range + len(b"beginbfrange"), b"endbfrange", True
        end = data.find(endkw, start)
        if end < 0:
            break
        section = data[start:end]
        try:
            _parse_section(section, mapping, is_range)
        except PdfSyntaxError:
            pass  # tolerate malformed sections
        pos = end + len(endkw)
    return mapping


def _parse_section(section: bytes, mapping: dict[int, str], is_range: bool) -> None:
    lex = Lexer(section)
    items = []
    while True:
        lex.skip_ws()
        if lex.pos >= lex.n:
            break
        items.append(lex.parse_value())
    if not is_range:
        for i in range(0, len(items) - 1, 2):
            src, dst = items[i], items[i + 1]
            if isinstance(src, bytes) and isinstance(dst, bytes):
                mapping[int.from_bytes(src, "big")] = _utf16be(dst)
        return
    i = 0
    while i + 3 <= len(items):
        lo, hi, dst = items[i], items[i + 1], items[i + 2]
        i += 3
        if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
            continue
        lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
        if isinstance(dst, bytes):
            base = int.from_bytes(dst, "big")
            width = len(dst)
            for code in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                mapping[code] = _utf16be((base + code - lo_i).to_bytes(width, "big"))
        elif isinstance(dst, list):
            for off, d in enumerate(dst):
                if isinstance(d, bytes) and lo_i + off <= hi_i:
                    mapping[lo_i + off] = _utf16be(d)


class FontDecoder:
    """Decodes PDF string bytes to unicode for one font resource."""

    def __init__(self, cmap: dict[int, str] | None = None, code_bytes: int = 1):
        self.cmap = cmap
        self.code_bytes = code_bytes
        # 1-byte cmaps decode via str.translate (C speed); the table covers
        # ALL 256 codes so unmapped glyphs are DELETED (translate passes
        # unmapped codepoints through otherwise — wrong semantics)
        self._trans = (
            {i: (cmap.get(i) or None) for i in range(256)}
            if cmap and code_bytes == 1 else None
        )

    def decode(self, raw: bytes) -> str:
        if self._trans is not None:
            return raw.decode("latin-1").translate(self._trans)
        if self.cmap is not None:
            w = self.code_bytes
            out = []
            for i in range(0, len(raw) - w + 1, w):
                code = int.from_bytes(raw[i : i + w], "big")
                out.append(self.cmap.get(code, ""))
            return "".join(out)
        # encoding fallback: WinAnsi ≈ cp1252, per-byte latin-1 rescue
        try:
            return raw.decode("cp1252")
        except UnicodeDecodeError:
            return raw.decode("latin-1")


FALLBACK_DECODER = FontDecoder()


def build_font_decoders(doc, resources) -> dict[str, FontDecoder]:
    """Build name→decoder map from a page's /Resources/Font dict.

    ``doc`` is a PdfDocument; CMap streams are decoded (FlateDecode) before
    parsing. Fonts without /ToUnicode get the encoding-fallback decoder.
    """
    decoders: dict[str, FontDecoder] = {}
    res = doc.resolve(resources)
    if not isinstance(res, dict):
        return decoders
    fonts = doc.resolve(res.get("Font"))
    if not isinstance(fonts, dict):
        return decoders
    for fname, fref in fonts.items():
        fdict = doc.resolve(fref)
        decoder = FALLBACK_DECODER
        if isinstance(fdict, dict) and "ToUnicode" in fdict:
            try:
                _, cmap_bytes = doc.get_stream(fdict["ToUnicode"])
                decoder = _decoder_for_cmap(cmap_bytes)
            except PdfSyntaxError:
                pass
        decoders[str(fname)] = decoder
    return decoders


@functools.lru_cache(maxsize=256)
def _decoder_for_cmap(cmap_bytes: bytes) -> FontDecoder:
    """Warm per-font CMap cache (SURVEY.md ST4): identical ToUnicode streams
    (subset fonts repeated across a corpus' PDFs) are parsed ONCE per worker
    process — measured 40% of DocParse time without this."""
    cmap = parse_tounicode(cmap_bytes)
    if not cmap:
        return FALLBACK_DECODER
    width = 2 if max(cmap) > 0xFF else 1
    return FontDecoder(cmap, code_bytes=width)
