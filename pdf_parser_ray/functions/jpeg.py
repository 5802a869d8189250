"""From-scratch baseline JPEG (ITU-T T.81 / JFIF) codec — pure
numpy + stdlib, no imaging libraries.

JPEG is the dominant web image format, so a 100-TB multimodal corpus is
mostly JPEG; the decoder here is the real ``ImageDecode`` backend for it
(stages/media.py), the encoder exists to build deterministic test/query
fixtures (same split as functions/png.py / gif.py).

Scope — the two Huffman DCT profiles that cover essentially every JPEG
on the web:
  - decoder: SOI/APPn/COM/DQT/SOF0/SOF1/SOF2/DHT/DRI/SOS/EOI marker
    stream, 8-bit samples, 1 (grayscale) or 3 (YCbCr) components, any
    H/V sampling factors ≤ 2 (4:4:4, 4:2:2, 4:2:0), restart intervals,
    byte-unstuffing, per-component DC prediction, dequantize → IDCT
    (exact orthonormal DCT-III via one einsum over all blocks of a
    component) → chroma upsample → BT.601 full-range YCbCr→RGB.
    **Progressive (SOF2)** streams are fully supported: multi-scan
    coefficient accumulation with spectral selection (Ss..Se) and
    successive approximation (Ah/Al) per T.81 Annex G — DC first/refine
    scans (interleaved or not), single-component AC first/refine scans
    with EOB-run decoding and in-run correction bits, restart markers
    resetting prediction + EOB run per interval.
  - encoder: the matching writer (Annex K quantization tables scaled by
    the libjpeg quality formula, Annex K Huffman tables, 4:4:4 or 4:2:0),
    used only to synthesize fixtures — lossy like any JPEG, so tests
    assert tolerance/PSNR plus exact DC-only cases. ``progressive=True``
    emits an SOF2 stream under a configurable scan script (default: the
    classic 10-scan successive-approximation script), using a flat
    256-symbol AC Huffman table so EOBn run symbols up to r=14 exist;
    both paths quantize identically, so progressive and baseline encodes
    of the same image must DECODE IDENTICALLY — the test suite asserts
    that bit-for-bit, which pins the scan accumulation logic to the
    (simpler) sequential path rather than to itself.

Arithmetic-coded, hierarchical, lossless, 12-bit, and CMYK streams
raise ``ValueError`` (the caller's per-row fail-soft captures it).

Reference parity: the reference app delegates image handling to external
libraries (it has no codec of its own); this module exists because the
Ray pipeline's multimodal stages need a real in-container decode path.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan → position in the 8×8 block
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal DCT-II basis: C[u, x] = a(u) cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    _C[_u] = _a * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)

# Annex K Table K.1 / K.2 quantization tables (zigzag order NOT applied —
# these are in natural row-major order as printed in the spec tables)
K_LUM_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
K_CHR_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K Huffman tables: (BITS counts[1..16], HUFFVAL symbols)
K_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
K_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
K_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
K_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


# Flat AC table for the progressive ENCODER: all 256 (run,size) byte
# symbols — 255 at 9 bits + 1 at 10 bits (DHT counts are single bytes, so
# 256 codes cannot share one length). Unlike the Annex K AC tables it
# contains every EOBn symbol (r<<4 for r=0..14), which progressive AC
# scans need to code EOB runs spanning blocks. Kraft sum 255/512 + 1/1024
# < 1, and the largest assigned code (510 at 10 bits) is not all-ones, so
# 1-padding at scan end can never decode as a phantom symbol.
P_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
             list(range(256)))


def _canonical_codes(counts, symbols):
    """BITS/HUFFVAL → {(length, code): symbol} (T.81 C.2 canonical
    assignment)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(counts, symbols):
    """BITS/HUFFVAL → {symbol: (code, length)} for the encoder."""
    return {sym: (code, ln)
            for (ln, code), sym in _canonical_codes(counts, symbols).items()}


class _BitReader:
    """MSB-first bit reader over byte-unstuffed entropy data."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy data")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy data")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_symbol(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) samples, exact
    2-D orthonormal inverse DCT in one einsum."""
    return np.einsum("ux,nuv,vy->nxy", _C, blocks.astype(np.float64), _C)


def _decode_seq_block(reader, row, dc_tab, ac_tab, preds, cid):
    """Sequential (baseline/extended) block: DC diff + full AC band."""
    t = reader.read_symbol(dc_tab)
    preds[cid] += _extend(reader.read_bits(t), t)
    row[0] = preds[cid]
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break        # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        row[k] = _extend(reader.read_bits(s), s)
        k += 1


def _decode_ac_first_block(reader, row, ac_tab, ss, se, al, eobrun):
    """Progressive AC first scan (Ah=0), T.81 G.2.2: coefficients arrive
    point-transformed (<< Al); EOBn symbols start runs of whole-EOB
    blocks. Returns the remaining EOB run AFTER this block."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+ext blocks incl. this one
                return (1 << r) - 1 + (reader.read_bits(r) if r else 0)
            k += 16      # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band end")
        row[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine_block(reader, row, ac_tab, ss, se, al, eobrun):
    """Progressive AC refinement scan (Ah=Al+1), T.81 G.2.3 / figure
    G.10: each history-nonzero coefficient passed consumes one
    correction bit; zero-history runs place new ±(1<<Al) coefficients;
    EOB runs carry correction bits for the blocks they cover. Returns
    the remaining EOB run AFTER this block."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "AC refinement magnitude must be 1")
                newval = p1 if reader.read_bit() else -p1
            # advance over r zero-history coefficients (16 for ZRL via
            # r=15 + the placement slot), correcting nonzero ones passed
            while k <= se:
                c = int(row[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        row[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                row[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # tail of this block rides the EOB run
            c = int(row[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    row[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(coef, comps, scomps, ss, se, ah, al, segments,
                 huff_dc, huff_ac, restart_interval, geom, h, w,
                 progressive):
    """Decode one entropy-coded scan into the per-component coefficient
    buffers (MCU-grid layout, zigzag order). Handles interleaved and
    single-component scans, both sequential and all four progressive
    scan kinds; restart segments reset DC prediction and the EOB run."""
    mcux, mcuy, hmax, vmax = geom
    info = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    for cid, _td, _ta in scomps:
        if cid not in info:
            raise ValueError("scan references unknown component")
    if not (ss <= se <= 63):
        raise ValueError("invalid spectral selection")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if ah and ah != al + 1:
            raise ValueError("successive approximation must step by 1 bit")
    elif ss != 0 or se != 63 or ah or al:
        raise ValueError("sequential scan must cover the full band")
    dc_scan = ss == 0
    refine = ah != 0

    # resolve Huffman tables once per scan (only the kinds this scan uses)
    tabs = {}
    for cid, td, ta in scomps:
        dc_tab = ac_tab = None
        if (not progressive) or (dc_scan and not refine):
            dc_tab = huff_dc.get(td)
            if dc_tab is None:
                raise ValueError("scan references undefined DC table")
        if (not progressive) or not dc_scan:
            ac_tab = huff_ac.get(ta)
            if ac_tab is None:
                raise ValueError("scan references undefined AC table")
        tabs[cid] = (dc_tab, ac_tab)

    # data-unit geometry: interleaved scans walk MCUs; single-component
    # scans walk the component's OWN block grid (T.81 A.2.2 — not the
    # MCU-padded grid), mapped into the padded buffer by row stride
    if len(scomps) > 1:
        total_units = mcux * mcuy
    else:
        cid0 = scomps[0][0]
        hi0, vi0 = info[cid0]
        cw = -((-w * hi0) // hmax)          # ceil(w*hi/hmax)
        ch = -((-h * vi0) // vmax)
        bw_c = -(-cw // 8)
        bh_c = -(-ch // 8)
        total_units = bw_c * bh_c

    def unit_blocks(u):
        if len(scomps) > 1:
            my, mx = divmod(u, mcux)
            out = []
            for cid, _td, _ta in scomps:
                hi, vi = info[cid]
                for by in range(vi):
                    for bx in range(hi):
                        out.append(
                            (cid, (my * vi + by) * (mcux * hi) + mx * hi + bx))
            return out
        cid, _td, _ta = scomps[0]
        hi, _vi = info[cid]
        row_i, col = divmod(u, bw_c)
        return [(cid, row_i * (mcux * hi) + col)]

    unit = 0
    for seg_i, segment in enumerate(segments):
        reader = _BitReader(segment)
        preds = {cid: 0 for cid, *_ in comps}
        eobrun = 0
        seg_units = (restart_interval
                     if restart_interval and seg_i < len(segments) - 1
                     else total_units - unit)
        for _ in range(seg_units):
            if unit >= total_units:
                break
            for cid, bi in unit_blocks(unit):
                row = coef[cid][bi]
                dc_tab, ac_tab = tabs[cid]
                if not progressive:
                    _decode_seq_block(reader, row, dc_tab, ac_tab,
                                      preds, cid)
                elif dc_scan and not refine:
                    t = reader.read_symbol(dc_tab)
                    preds[cid] += _extend(reader.read_bits(t), t)
                    row[0] = preds[cid] << al
                elif dc_scan:
                    if reader.read_bit():
                        row[0] = int(row[0]) | (1 << al)
                elif not refine:
                    eobrun = _decode_ac_first_block(
                        reader, row, ac_tab, ss, se, al, eobrun)
                else:
                    eobrun = _decode_ac_refine_block(
                        reader, row, ac_tab, ss, se, al, eobrun)
            unit += 1
    if unit != total_units:
        raise ValueError("truncated JPEG scan (missing MCUs)")


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes (baseline SOF0, extended-sequential SOF1, or
    progressive SOF2 — all Huffman/8-bit) → uint8 array (h, w, 3) RGB,
    or (h, w, 1) for single-component grayscale streams."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None        # (h, w, [(comp_id, hi, vi, tq), ...])
    progressive = False
    coef = None         # cid → (n_blocks, 64) zigzag coefficient rows
    geom = None         # (mcux, mcuy, hmax, vmax)
    got_scan = False

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (fill bytes at EOF)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:          # stray SOI
            continue
        if marker == 0xD9:          # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # RSTn outside a scan: ignore
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if pos + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = zz
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                symbols = list(seg[i + 17:i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _canonical_codes(
                    counts, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            if frame is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            if h == 0 or w == 0:
                raise ValueError("zero-sized JPEG")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
                raise ValueError("sampling factors above 2 unsupported")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            geom = (mcux, mcuy, hmax, vmax)
            # coefficient buffers: per component, one (n_blocks, 64)
            # zigzag-order array, accumulated across all scans
            coef = {cid: np.zeros((mcux * mcuy * hi * vi, 64),
                                  dtype=np.int64)
                    for cid, hi, vi, _ in comps}
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:        # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:        # SOS
            ns = seg[0]
            scomps = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F)
                      for c in range(ns)]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            # entropy data: from here to the next non-RST marker, with
            # 0xFF00 byte-unstuffing; RST markers split it into segments
            p = pos + seglen
            segments: list[bytearray] = [bytearray()]
            while p < len(data):
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1] if p + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytearray())
                        p += 2
                        continue
                    break  # real marker ends the scan
                segments[-1].append(b)
                p += 1
            if frame is None:
                raise ValueError("SOS before SOF")
            _decode_scan(coef, frame[2], scomps, ss, se, ah, al,
                         [bytes(s) for s in segments], huff_dc, huff_ac,
                         restart_interval, geom, frame[0], frame[1],
                         progressive)
            got_scan = True
            pos = p
            continue
        elif marker in (0xC8, 0x01):
            pass
        # APPn / COM / anything else: skip
        pos += seglen

    if frame is None or not got_scan:
        raise ValueError("JPEG missing SOF or SOS")
    h, w, comps = frame
    mcux, mcuy, hmax, vmax = geom

    # dequantize + IDCT + assemble per component, then upsample
    planes = []
    for cid, hi, vi, tq in comps:
        if tq not in qtables:
            raise ValueError("frame references undefined quantization table")
        q = qtables[tq].reshape(-1)
        dez = np.zeros_like(coef[cid])
        dez[:, ZIGZAG] = coef[cid]          # zigzag → natural order
        blocks = _idct_blocks((dez * q[None, :]).reshape(-1, 8, 8)) + 128.0
        bw = mcux * hi                       # blocks per row
        bh = mcuy * vi
        plane = (blocks.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (fixture builder)
# ---------------------------------------------------------------------------

def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex K table (public formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            fill = 8 - self.nbits
            self.write((1 << fill) - 1, fill)  # 1-fill per T.81 F.1.2.3

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (unstuffed — it IS a marker)."""
        self.pad()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks.astype(np.float64), _C)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) plane (dims multiples of 8) → (n, 8, 8) raster blocks."""
    h8, w8 = plane.shape
    return (plane.reshape(h8 // 8, 8, w8 // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    zz = blk.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]
            bw.write(zc, zl)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_codes[0x00]
        bw.write(ec, el)
    return dc


# default progressive scan scripts (the classic successive-approximation
# layout popularized by libjpeg: DC first at Al=1, low-band luma early,
# chroma AC, then refinement passes down to Al=0)
_P_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)
_P_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _flush_eobrun_enc(bw: _BitWriter, ac_codes: dict, state: dict) -> None:
    """Emit the pending EOBn symbol + its extension bits, then the
    correction bits buffered for the blocks the run covers (T.81 G.1.2.3
    'BE' bits). Invariant: buffered bits exist only while eobrun > 0."""
    if state["eobrun"]:
        r = state["eobrun"].bit_length() - 1
        code, ln = ac_codes[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(state["eobrun"] - (1 << r), r)
        state["eobrun"] = 0
        for b in state["bits"]:
            bw.write(b, 1)
        state["bits"] = []


def _enc_ac_first_block(bw, zz, ss, se, al, ac_codes, state) -> None:
    """Progressive AC first scan: point transform = sign * (|c| >> Al)
    (truncation toward zero, NOT arithmetic shift), EOB runs accumulate
    across fully-zero band tails."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = (abs(v) >> al) if v >= 0 else -(abs(v) >> al)
        if v == 0:
            run += 1
            continue
        _flush_eobrun_enc(bw, ac_codes, state)
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun_enc(bw, ac_codes, state)


def _enc_ac_refine_block(bw, zz, ss, se, al, ac_codes, state) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3): newly-nonzero
    coefficients (|c|>>Al == 1) are coded as (run,1)+sign; already-nonzero
    ones contribute one correction bit each, buffered and emitted after
    the next symbol (or with the EOBn that covers them)."""
    absv = []
    eob = ss - 1          # position of the last newly-nonzero coefficient
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv.append(t)
        if t == 1:
            eob = k
    br: list[int] = []    # correction bits pending within this block
    run = 0
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            _flush_eobrun_enc(bw, ac_codes, state)
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _flush_eobrun_enc(bw, ac_codes, state)
        code, ln = ac_codes[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["bits"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun_enc(bw, ac_codes, state)


def _emit_progressive(out: bytearray, zz_blocks, samplings, mcux, mcuy,
                      h, w, gray, script, restart_interval) -> None:
    """Append one SOS + entropy segment per scan-script entry.
    ``zz_blocks``: per component, (n_blocks, 64) zigzag coefficients in
    MCU-grid raster layout (stride mcux*hi)."""
    ncomp = len(zz_blocks)
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    dc_codes = [_encode_codes(*K_DC_LUM)] + (
        [] if gray else [_encode_codes(*K_DC_CHR)] * 2)
    ac_codes = _encode_codes(*P_AC_FLAT)

    for comps_i, ss, se, ah, al in script:
        if (not comps_i or any(c not in range(ncomp) for c in comps_i)
                or not (0 <= ss <= se <= 63) or (ss == 0) != (se == 0)
                or (ss > 0 and len(comps_i) != 1)
                or (ah != 0 and ah != al + 1) or al > 13):
            raise ValueError(f"invalid progressive scan {comps_i, ss, se, ah, al}")
        ns = len(comps_i)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for c in comps_i:
            out += bytes([c + 1, ((0 if c == 0 else 1) << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])

        # unit list: MCUs when interleaved, the component's true (unpadded)
        # block grid when single-component — mirrors _decode_scan
        units: list[list[tuple[int, int]]] = []
        if ns > 1:
            for u in range(mcux * mcuy):
                my, mx = divmod(u, mcux)
                blocks = []
                for c in comps_i:
                    hi, vi = samplings[c]
                    for by in range(vi):
                        for bx in range(hi):
                            blocks.append(
                                (c, (my * vi + by) * (mcux * hi) + mx * hi + bx))
                units.append(blocks)
        else:
            c = comps_i[0]
            hi, vi = samplings[c]
            cw = -((-w * hi) // hmax)         # ceil(w*hi/hmax)
            ch = -((-h * vi) // vmax)
            bw_c = -(-cw // 8)
            bh_c = -(-ch // 8)
            for row_i in range(bh_c):
                for col in range(bw_c):
                    units.append([(c, row_i * (mcux * hi) + col)])

        bwr = _BitWriter()
        preds = [0] * ncomp
        state = {"eobrun": 0, "bits": []}
        rst = 0
        for i, unit in enumerate(units):
            if restart_interval and i and i % restart_interval == 0:
                if ss > 0:
                    _flush_eobrun_enc(bwr, ac_codes, state)
                bwr.restart(rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
                state = {"eobrun": 0, "bits": []}
            for c, bi in unit:
                zz = zz_blocks[c][bi]
                if ss == 0 and ah == 0:
                    v = int(zz[0]) >> al          # DC: arithmetic shift
                    diff = v - preds[c]
                    preds[c] = v
                    t = abs(diff).bit_length()
                    code, ln = dc_codes[c][t]
                    bwr.write(code, ln)
                    if t:
                        bwr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                elif ss == 0:
                    bwr.write((int(zz[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first_block(bwr, zz, ss, se, al, ac_codes, state)
                else:
                    _enc_ac_refine_block(bwr, zz, ss, se, al, ac_codes, state)
        if ss > 0:
            _flush_eobrun_enc(bwr, ac_codes, state)
        out += bwr.flush()


def encode_jpeg(pixels: np.ndarray, *, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0,
                progressive: bool = False, scan_script=None) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w)/(h, w, 1) grayscale → JFIF bytes.
    ``subsampling``: '444' or '420' (3-component only);
    ``restart_interval``: emit DRI + RSTn every N data units (0 = none);
    ``progressive``: emit SOF2 with ``scan_script`` (default: the classic
    10-scan/6-scan successive-approximation script). Baseline and
    progressive share the exact same quantized coefficients, so both
    encodings of one image decode identically."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    gray = nc == 1
    sub420 = (not gray) and subsampling == "420"

    px = pixels.astype(np.float64)
    if gray:
        y_plane, planes_c = px[:, :, 0], []
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub420:
            cbp = _pad_edge(cb, 2, 2)
            crp = _pad_edge(cr, 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                  + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
                  + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
        planes_c = [cb, cr]

    qy = _quality_scale(K_LUM_QUANT, quality).reshape(8, 8)
    qc = _quality_scale(K_CHR_QUANT, quality).reshape(8, 8)

    def quantized_blocks(plane: np.ndarray, q: np.ndarray,
                         mh: int, mw: int) -> np.ndarray:
        padded = _pad_edge(plane, mh, mw)
        blocks = _fdct_blocks(_plane_blocks(padded) - 128.0)
        return np.round(blocks / q[None]).astype(np.int64), padded.shape

    # per-component quantized block arrays in MCU-grid raster layout
    # (natural 8×8 order; stride = mcux*hi blocks per row)
    if gray:
        comp_nat = [quantized_blocks(y_plane, qy, 8, 8)[0]]
        samplings = [(1, 1)]
        mcux, mcuy = -(-w // 8), -(-h // 8)
    elif not sub420:
        comp_nat = [quantized_blocks(p, q, 8, 8)[0] for p, q in
                    ((y_plane, qy), (planes_c[0], qc), (planes_c[1], qc))]
        samplings = [(1, 1)] * 3
        mcux, mcuy = -(-w // 8), -(-h // 8)
    else:
        yb, (yh, yw) = quantized_blocks(y_plane, qy, 16, 16)
        comp_nat = [yb, quantized_blocks(planes_c[0], qc, 8, 8)[0],
                    quantized_blocks(planes_c[1], qc, 8, 8)[0]]
        samplings = [(2, 2), (1, 1), (1, 1)]
        mcux, mcuy = yw // 16, yh // 16

    out = bytearray()
    out += b"\xff\xd8"                                  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"        # APP0
    for tq, q in ((0, qy),) + (() if gray else ((1, qc),)):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    # SOF0 (baseline) / SOF2 (progressive)
    ncomp = 1 if gray else 3
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        yhv = 0x22 if sub420 else 0x11
        out += bytes([1, yhv, 0, 2, 0x11, 1, 3, 0x11, 1])
    # DHT: progressive scans use the flat AC table (it has the EOBn
    # symbols the Annex K tables lack); baseline uses the K tables
    if progressive:
        dht = ((0x00, K_DC_LUM), (0x10, P_AC_FLAT)) + (
            () if gray else ((0x01, K_DC_CHR),))
    else:
        dht = ((0x00, K_DC_LUM), (0x10, K_AC_LUM)) + (
            () if gray else ((0x01, K_DC_CHR), (0x11, K_AC_CHR)))
    for tc_th, (counts, syms) in dht:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) \
            + bytes([tc_th]) + bytes(counts) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if progressive:
        script = scan_script if scan_script is not None else (
            _P_SCRIPT_GRAY if gray else _P_SCRIPT_COLOR)
        zz_blocks = [cb.reshape(-1, 64)[:, ZIGZAG] for cb in comp_nat]
        _emit_progressive(out, zz_blocks, samplings, mcux, mcuy, h, w,
                          gray, script, restart_interval)
        out += b"\xff\xd9"                               # EOI
        return bytes(out)

    # baseline: one interleaved full-band SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    out += bytes([1, 0x00]) if gray else bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += bytes([0, 63, 0])

    # unified MCU stream: list of [(block, comp_idx), ...] per MCU
    if gray:
        mcus = [[(blk, 0)] for blk in comp_nat[0]]
    elif not sub420:
        mcus = [[(comp_nat[0][i], 0), (comp_nat[1][i], 1), (comp_nat[2][i], 2)]
                for i in range(comp_nat[0].shape[0])]
    else:
        ybw = mcux * 2                     # luma blocks per row
        mcus = []
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = [(comp_nat[0][(my * 2 + by) * ybw + mx * 2 + bx], 0)
                       for by in range(2) for bx in range(2)]
                ci = my * mcux + mx
                mcus.append(mcu + [(comp_nat[1][ci], 1), (comp_nat[2][ci], 2)])

    dc_y, ac_y = _encode_codes(*K_DC_LUM), _encode_codes(*K_AC_LUM)
    dc_c, ac_c = _encode_codes(*K_DC_CHR), _encode_codes(*K_AC_CHR)
    tabs = ((dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c))
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for i, mcu in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            bw.restart(rst)
            rst = (rst + 1) % 8
            preds = [0, 0, 0]
        for blk, c in mcu:
            preds[c] = _encode_block(bw, blk, preds[c], *tabs[c])
    out += bw.flush()
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)
