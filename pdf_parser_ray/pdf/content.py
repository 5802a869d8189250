"""Content-stream tokenizer + text-object interpreter.

Implements the text subset of the PDF content-stream operator set
(SURVEY.md §1.2 contract): BT/ET, Tf, Td/TD/Tm/T*/TL, Tj, TJ, ', ".
Produces positioned text runs; layout.py assembles them into reading order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from .fonts import FALLBACK_DECODER, FontDecoder
from .objects import Lexer, Name, PdfSyntaxError

# Operators are regular-character keywords; everything else parses as operands.
_OPERATOR_CHARS = set(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'\"*01")

_WS = b"\x00\t\n\x0c\r "


def _skip_inline_image(data: bytes, pos: int) -> int:
    """Skip an inline image (BI <params> ID <binary> EI) starting just after
    the BI keyword; return the position after the closing EI.

    The binary pixel data may itself contain the byte pair 'EI', so EI is
    accepted only when delimited by PDF whitespace (or EOF) on both sides —
    the standard tolerant-parser heuristic. Without this, data.find('EI')
    truncates mid-image and the tokenizer resumes inside pixel bytes.
    """
    n = len(data)
    idx = data.find(b"ID", pos)
    i = pos if idx < 0 else idx + 2
    if idx >= 0 and i < n and data[i] in _WS:
        i += 1  # exactly one whitespace byte separates ID from the data
    while True:
        idx = data.find(b"EI", i)
        if idx < 0:
            return n
        before_ok = idx == 0 or data[idx - 1] in _WS
        after = idx + 2
        after_ok = after >= n or data[after] in _WS
        if before_ok and after_ok:
            return after
        i = idx + 1


def tokenize_content(data: bytes) -> Iterator[tuple[list, str]]:
    """Yield (operands, operator) tuples from a decoded content stream."""
    lex = Lexer(data, allow_refs=False)
    operands: list = []
    while True:
        lex.skip_ws()
        if lex.pos >= lex.n:
            break
        c = data[lex.pos]
        if c in b"/([<+-.0123456789":
            try:
                operands.append(lex.parse_value())
            except PdfSyntaxError:
                lex.pos += 1  # skip junk byte, keep going (fail-soft)
            continue
        kw = lex.read_keyword()
        if not kw:
            lex.pos += 1
            continue
        if kw == "BI":
            # inline image: skip raw binary through the whitespace-delimited EI
            lex.pos = _skip_inline_image(data, lex.pos)
            operands = []
            continue
        if kw in ("true", "false", "null"):
            operands.append({"true": True, "false": False, "null": None}[kw])
            continue
        yield operands, kw
        operands = []


@dataclass
class TextRun:
    x: float
    y: float
    size: float
    text: str


class TextInterpreter:
    """Executes text operators, emitting TextRuns with (x, y) positions.

    The full text matrix is tracked as (a,b,c,d,e,f); for horizontal text the
    run position is (e, f). Glyph widths are unknown (no width tables in the
    fixture scope), so advance after a show op is estimated as
    0.5*size*len(text) — only *relative order within a line* depends on it,
    and runs separated by explicit Td keep exact positions.
    """

    CHAR_WIDTH_FACTOR = 0.5

    def __init__(self, font_decoders: dict[str, FontDecoder],
                 xobjects: dict | None = None, depth: int = 0):
        self.fonts = font_decoders
        self.xobjects = xobjects or {}
        self.depth = depth
        self.runs: list[TextRun] = []
        self._reset_text_state()

    def _reset_text_state(self) -> None:
        self.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
        self.tlm = list(self.tm)
        self.leading = 0.0
        self.size = 0.0
        self.decoder = FALLBACK_DECODER
        self.ctm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
        self.gs_stack: list[list[float]] = []

    def run(self, content: bytes) -> list[TextRun]:
        in_text = False
        for operands, op in tokenize_content(content):
            try:
                if op == "BT":
                    in_text = True
                    self.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
                    self.tlm = list(self.tm)
                elif op == "q":
                    self.gs_stack.append(list(self.ctm))
                elif op == "Q":
                    if self.gs_stack:
                        self.ctm = self.gs_stack.pop()
                elif op == "cm" and len(operands) >= 6:
                    m = [float(v) for v in operands[-6:]]
                    a, b, c, d, e, f = m
                    A, B, C, D, E, F = self.ctm
                    # ctm' = m × ctm
                    self.ctm = [a * A + b * C, a * B + b * D,
                                c * A + d * C, c * B + d * D,
                                e * A + f * C + E, e * B + f * D + F]
                elif op == "ET":
                    in_text = False
                elif op == "Tf" and len(operands) >= 2:
                    name, size = operands[-2], operands[-1]
                    if isinstance(name, Name):
                        self.decoder = self.fonts.get(str(name), FALLBACK_DECODER)
                    self.size = float(size)
                elif op == "TL" and operands:
                    self.leading = float(operands[-1])
                elif op == "Td" and len(operands) >= 2:
                    self._td(float(operands[-2]), float(operands[-1]))
                elif op == "TD" and len(operands) >= 2:
                    self.leading = -float(operands[-1])
                    self._td(float(operands[-2]), float(operands[-1]))
                elif op == "Tm" and len(operands) >= 6:
                    self.tm = [float(v) for v in operands[-6:]]
                    self.tlm = list(self.tm)
                elif op == "T*":
                    self._td(0.0, -self.leading)
                elif op == "Tj" and operands and in_text:
                    self._show(operands[-1])
                elif op == "'" and operands:
                    self._td(0.0, -self.leading)
                    self._show(operands[-1])
                elif op == '"' and len(operands) >= 3:
                    self._td(0.0, -self.leading)
                    self._show(operands[-1])
                elif op == "Do" and operands and self.depth < 8:
                    # form XObject: execute its content inline, inheriting the
                    # current CTM so `q ... cm /Fm Do Q` placement positions
                    # the form's text correctly (form /Matrix not applied —
                    # identity in the fixture scope)
                    name = operands[-1]
                    entry = self.xobjects.get(str(name)) if isinstance(name, Name) else None
                    if entry is not None:
                        form_content, form_fonts = entry
                        sub = TextInterpreter(form_fonts or self.fonts,
                                              self.xobjects, self.depth + 1)
                        sub.ctm = list(self.ctm)
                        self.runs.extend(sub.run(form_content))
                elif op == "TJ" and operands and isinstance(operands[-1], list):
                    for elem in operands[-1]:
                        if isinstance(elem, bytes):
                            self._show(elem)
                        elif isinstance(elem, (int, float)):
                            # kerning: negative values move right by n/1000*size
                            self.tm[4] -= float(elem) / 1000.0 * self.size
            except (TypeError, ValueError):
                continue  # malformed operands → skip op (fail-soft)
        return self.runs

    def _td(self, tx: float, ty: float) -> None:
        # tlm = translate(tx, ty) × tlm ; tm = tlm
        a, b, c, d, e, f = self.tlm
        self.tlm = [a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f]
        self.tm = list(self.tlm)

    def _show(self, raw: bytes) -> None:
        if not isinstance(raw, bytes):
            return
        text = self.decoder.decode(raw)
        if text:
            # device position = text-space origin through the CTM
            tx, ty = self.tm[4], self.tm[5]
            A, B, C, D, E, F = self.ctm
            x = tx * A + ty * C + E
            y = tx * B + ty * D + F
            self.runs.append(TextRun(x, y, self.size or 12.0, text))
        self.tm[4] += self.CHAR_WIDTH_FACTOR * (self.size or 12.0) * len(text)
