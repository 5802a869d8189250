"""PDF object model: lexer, recursive-descent value parser, document scan.

Robustness strategy: instead of trusting the xref table (often broken in the
wild), scan the byte stream for ``N G obj … endobj`` occurrences and build
the object table from what is actually present; the trailer/catalog is then
located by type. This handles both well-formed fixtures and mild corruption
(per-page fail-soft happens a level up).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass
from typing import Any


class PdfSyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


class Name(str):
    """A PDF name token (distinct from a string value)."""

    __slots__ = ()


_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


def _is_regular(ch: int) -> bool:
    return ch not in _WHITESPACE and ch not in _DELIMS


# C-speed scans for the lexer hot loops (profiled at ~25% of parse wall
# as per-byte Python loops). Byte-exact with the loop forms they replace:
# whitespace+comment runs, regular-character runs, number tokens, digits.
_WS_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_REGULAR_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_NUMBER_RE = re.compile(rb"[+\-.0-9eE]+")
_DIGITS_RE = re.compile(rb"[0-9]*")


class Lexer:
    """Byte-level lexer/parser for PDF object syntax.

    ``allow_refs=False`` (content streams) skips the ``N G R`` indirect-
    reference lookahead after integers — content operands are never refs and
    the lookahead double-scans every number otherwise.
    """

    def __init__(self, data: bytes, pos: int = 0, allow_refs: bool = True):
        self.data = data
        self.pos = pos
        self.n = len(data)
        self.allow_refs = allow_refs

    # -- low-level -------------------------------------------------------
    def skip_ws(self) -> None:
        m = _WS_RE.match(self.data, self.pos)
        if m:
            self.pos = m.end()

    def peek_keyword(self) -> str:
        """Peek the regular-character run at pos (no advance)."""
        return _REGULAR_RE.match(self.data, self.pos).group().decode("latin-1")

    def read_keyword(self) -> str:
        kw = self.peek_keyword()
        self.pos += len(kw)
        return kw

    # -- values ----------------------------------------------------------
    def parse_value(self) -> Any:
        self.skip_ws()
        if self.pos >= self.n:
            raise PdfSyntaxError("unexpected EOF")
        d = self.data
        c = d[self.pos]
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x3C:  # '<'
            if self.pos + 1 < self.n and d[self.pos + 1] == 0x3C:
                return self._parse_dict_or_stream()
            return self._parse_hex_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        kw = self.read_keyword()
        if kw == "true":
            return True
        if kw == "false":
            return False
        if kw == "null":
            return None
        raise PdfSyntaxError(f"unexpected token {kw!r} at {self.pos}")

    def _parse_name(self) -> Name:
        assert self.data[self.pos] == 0x2F
        self.pos += 1
        raw = _REGULAR_RE.match(self.data, self.pos).group()
        if b"#" not in raw:  # fast path: no escapes in the run
            self.pos += len(raw)
            return Name(raw.decode("utf-8", "replace"))
        out = bytearray()
        d, n = self.data, self.n
        while self.pos < n and _is_regular(d[self.pos]):
            c = d[self.pos]
            if c == 0x23 and self.pos + 2 < n:  # '#xx' escape
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return Name(out.decode("utf-8", "replace"))

    def _parse_literal_string(self) -> bytes:
        assert self.data[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        d, n = self.data, self.n
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = chr(e)
                    for _ in range(2):
                        if self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                            oct_digits += chr(d[self.pos])
                            self.pos += 1
                        else:
                            break
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfSyntaxError("unterminated literal string")

    _HEX_JUNK = bytes(
        c for c in range(256) if chr(c) not in "0123456789abcdefABCDEF"
    )

    def _parse_hex_string(self) -> bytes:
        assert self.data[self.pos] == 0x3C
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end < 0:
            end = self.n
        raw = self.data[self.pos : end]
        self.pos = min(end + 1, self.n)
        h = raw.translate(None, self._HEX_JUNK)
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))

    def _parse_array(self) -> list:
        assert self.data[self.pos] == 0x5B
        self.pos += 1
        out = []
        while True:
            self.skip_ws()
            if self.pos >= self.n:
                raise PdfSyntaxError("unterminated array")
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_dict_or_stream(self) -> Any:
        self.pos += 2  # '<<'
        d: dict[str, Any] = {}
        while True:
            self.skip_ws()
            if self.pos + 1 < self.n and self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            if self.pos >= self.n:
                raise PdfSyntaxError("unterminated dict")
            key = self.parse_value()
            if not isinstance(key, Name):
                raise PdfSyntaxError(f"dict key is not a name: {key!r}")
            d[str(key)] = self.parse_value()
        return d

    def _parse_number_or_ref(self) -> Any:
        d, n = self.data, self.n
        tok = _NUMBER_RE.match(d, self.pos).group().decode("latin-1")
        self.pos += len(tok)
        try:
            if "." in tok or "e" in tok or "E" in tok:
                return float(tok)
            value = int(tok)
        except ValueError as e:
            raise PdfSyntaxError(f"malformed number {tok!r}") from e
        if not self.allow_refs:
            return value
        # lookahead for 'G R' (indirect reference)
        save = self.pos
        self.skip_ws()
        gen_tok = _DIGITS_RE.match(d, self.pos).group().decode("latin-1")
        self.pos += len(gen_tok)
        if gen_tok:
            self.skip_ws()
            if self.pos < n and d[self.pos : self.pos + 1] == b"R" and (
                self.pos + 1 >= n or not _is_regular(d[self.pos + 1])
            ):
                self.pos += 1
                return Ref(value, int(gen_tok))
        self.pos = save
        return value


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Scanned PDF document: object table + page tree access."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF"):
            raise PdfSyntaxError("missing %PDF header")
        self.data = data
        self.objects: dict[int, tuple[Any, bytes | None]] = {}
        self._scan_objects()

    # -- object scan -----------------------------------------------------
    def _scan_objects(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            try:
                value, stream = self._parse_object_body(m.end())
            except PdfSyntaxError:
                continue  # tolerate broken objects; fail-soft later
            self.objects[num] = (value, stream)
        if not self.objects:
            raise PdfSyntaxError("no objects found")
        self._expand_object_streams()

    def _expand_object_streams(self) -> None:
        """PDF 1.5+ /ObjStm support: objects stored inside compressed object
        streams. Layout (PDF 32000-1 §7.5.7): stream data begins with N pairs
        ``objnum offset``, then the serialized objects at ``/First + offset``.
        Scanned objects win over ObjStm copies (revision safety)."""
        for num, (value, raw) in list(self.objects.items()):
            if not (isinstance(value, dict) and str(value.get("Type")) == "ObjStm"):
                continue
            if raw is None:
                continue
            try:
                data = self._decode_stream(value, raw)
                n = self.resolve(value.get("N"))
                first = self.resolve(value.get("First"))
                if not isinstance(n, int) or not isinstance(first, int):
                    continue
                lex = Lexer(data)
                pairs = []
                for _ in range(n):
                    lex.skip_ws()
                    objnum = lex.parse_value()
                    lex.skip_ws()
                    off = lex.parse_value()
                    if not (isinstance(objnum, int) and isinstance(off, int)):
                        raise PdfSyntaxError("bad ObjStm header")
                    pairs.append((objnum, off))
                for objnum, off in pairs:
                    if objnum in self.objects:
                        continue  # direct objects take precedence
                    try:
                        inner = Lexer(data, first + off).parse_value()
                        self.objects[objnum] = (inner, None)
                    except PdfSyntaxError:
                        continue
            except PdfSyntaxError:
                continue

    def _parse_object_body(self, pos: int) -> tuple[Any, bytes | None]:
        lex = Lexer(self.data, pos)
        value = lex.parse_value()
        lex.skip_ws()
        stream: bytes | None = None
        if lex.peek_keyword() == "stream":
            lex.pos += len("stream")
            # EOL after 'stream' keyword: CRLF or LF
            if self.data[lex.pos : lex.pos + 2] == b"\r\n":
                lex.pos += 2
            elif self.data[lex.pos : lex.pos + 1] in (b"\n", b"\r"):
                lex.pos += 1
            length = value.get("Length") if isinstance(value, dict) else None
            if isinstance(length, int) and lex.pos + length <= len(self.data):
                end = lex.pos + length
                if b"endstream" in self.data[end : end + 4 + len(b"endstream")]:
                    stream = self.data[lex.pos : end]
            if stream is None:
                idx = self.data.find(b"endstream", lex.pos)
                if idx < 0:
                    raise PdfSyntaxError("unterminated stream")
                raw = self.data[lex.pos : idx]
                stream = raw.rstrip(b"\r\n")
        return value, stream

    # -- resolution ------------------------------------------------------
    def resolve(self, value: Any) -> Any:
        seen = 0
        while isinstance(value, Ref):
            entry = self.objects.get(value.num)
            if entry is None:
                return None
            value = entry[0]
            seen += 1
            if seen > 32:
                raise PdfSyntaxError("reference cycle")
        return value

    def get_stream(self, ref_or_dict: Any) -> tuple[dict, bytes]:
        """Resolve to (dict, decoded stream bytes); applies FlateDecode."""
        if isinstance(ref_or_dict, Ref):
            entry = self.objects.get(ref_or_dict.num)
            if entry is None:
                raise PdfSyntaxError(f"missing object {ref_or_dict.num}")
            d, raw = entry
        else:
            raise PdfSyntaxError("stream must be an indirect reference")
        if raw is None:
            raise PdfSyntaxError("object has no stream")
        d = d if isinstance(d, dict) else {}
        return d, self._decode_stream(d, raw)

    def _decode_stream(self, d: dict, raw: bytes) -> bytes:
        filt = self.resolve(d.get("Filter"))
        if filt is None:
            return raw
        filters = [filt] if not isinstance(filt, list) else filt
        out = raw
        for f in filters:
            fname = str(self.resolve(f))
            if fname == "FlateDecode":
                # cap expansion: a crafted stream can inflate to GBs from a
                # few KB (decompression bomb) — fail the page, not the worker
                MAX_INFLATE = 256 * 1024 * 1024
                try:
                    d = zlib.decompressobj()
                    out = d.decompress(out, MAX_INFLATE)
                    if d.unconsumed_tail:
                        raise PdfSyntaxError(
                            f"FlateDecode output exceeds {MAX_INFLATE} bytes")
                except zlib.error as e:
                    raise PdfSyntaxError(f"FlateDecode failed: {e}") from e
            else:
                raise PdfSyntaxError(f"unsupported filter {fname}")
        return out

    # -- page tree -------------------------------------------------------
    def catalog(self) -> dict:
        # Prefer trailer /Root; fall back to scanning for /Type /Catalog.
        trailer_idx = self.data.rfind(b"trailer")
        if trailer_idx >= 0:
            try:
                lex = Lexer(self.data, trailer_idx + len(b"trailer"))
                tdict = lex.parse_value()
                root = self.resolve(tdict.get("Root"))
                if isinstance(root, dict) and str(root.get("Type")) == "Catalog":
                    return root
            except (PdfSyntaxError, AttributeError):
                pass
        for _num, (value, _s) in sorted(self.objects.items()):
            if isinstance(value, dict) and str(self.resolve(value.get("Type"))) == "Catalog":
                return value
        raise PdfSyntaxError("no catalog found")

    def pages(self) -> list[dict]:
        """Flattened page list in document order (inherits Resources)."""
        cat = self.catalog()
        root = self.resolve(cat.get("Pages"))
        if not isinstance(root, dict):
            raise PdfSyntaxError("catalog has no page tree")
        out: list[dict] = []

        def walk(node: dict, inherited_resources: Any, depth: int = 0) -> None:
            if depth > 64:
                raise PdfSyntaxError("page tree too deep")
            ntype = str(self.resolve(node.get("Type")))
            resources = node.get("Resources", inherited_resources)
            if ntype == "Pages":
                kids = self.resolve(node.get("Kids")) or []
                for kid in kids:
                    knode = self.resolve(kid)
                    if isinstance(knode, dict):
                        walk(knode, resources, depth + 1)
            elif ntype == "Page":
                page = dict(node)
                if "Resources" not in page and resources is not None:
                    page["Resources"] = resources
                out.append(page)

        walk(root, None)
        return out

    def page_content(self, page: dict) -> bytes:
        """Concatenated decoded content streams of a page."""
        contents = page.get("Contents")
        resolved = self.resolve(contents)
        parts: list[bytes] = []
        if isinstance(resolved, list):
            refs = contents if isinstance(contents, list) else resolved
            for c in refs:
                parts.append(self.get_stream(c if isinstance(c, Ref) else c)[1])
        elif contents is not None:
            parts.append(self.get_stream(contents)[1])
        return b"\n".join(parts)
