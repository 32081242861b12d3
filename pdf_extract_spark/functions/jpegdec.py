"""Baseline JPEG luma decoder (stdlib + numpy — no PIL/libjpeg).

Closes the round-2 gap "web images are overwhelmingly PNG/JPEG, so
image near-dedup on real corpora has no fingerprint": with PNG pixels
(mediacodec.parse_png_pixels) and this module, both dominant web image
formats produce a real aHash64.

Scope: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
spectral selection + successive approximation: DC first/refine scans,
AC first scans with EOB runs, AC refinement with correction bits,
T.81 G.2), 8-bit, Huffman entropy coding, 1 or 3 components, sampling
factors up to 2×2, restart intervals. Arithmetic coding, 12-bit,
lossless/hierarchical return ``None`` — the caller falls back to
header-dims-only (``jpeg-header``), the same contract as the PNG/BMP
parsers.

Only the LUMA plane is inverse-transformed (the fingerprint is
grayscale); chroma blocks are entropy-decoded to keep the bitstream
position but never IDCT'd. The per-block IDCT is one numpy einsum over
all blocks at once — the Python cost is the Huffman bit loop, so the
decode budget is capped at ``MAX_PIXELS``.

Reference: ITU-T T.81 (public spec); no code derived from libjpeg.
The reference engine shells out to poppler and has no image decode
surface at all (SURVEY.md §2.9).
"""

from __future__ import annotations

import struct

MAX_PIXELS = 4 << 20  # pure-Python entropy-decode budget

#: zigzag order: index in stream -> position in the 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_BASIS = None  # lazy 8x8 DCT-III basis (numpy)


def _idct_basis():
    global _IDCT_BASIS
    if _IDCT_BASIS is None:
        import numpy as np

        k = np.arange(8)
        n = np.arange(8)
        a = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
        _IDCT_BASIS = 0.5 * a[:, None] * np.cos(
            (2 * n[None, :] + 1) * k[:, None] * np.pi / 16.0
        )
    return _IDCT_BASIS


class _BitReader:
    """Entropy-segment bit reader: handles 0xFF00 stuffing, stops at
    any real marker (leaving it for the caller)."""

    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # marker byte encountered mid-stream

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed FF
            else:
                self.marker = d[p + 1] if p + 1 < len(d) else None
                return False  # real marker: stop
        else:
            self.pos = p + 1
        # Mask to live bits: without it acc grows ~8 bits per entropy
        # byte and every shift/AND copies the whole bigint, making
        # Huffman decode quadratic in scan size (a 450 KB JPEG took
        # minutes; masked it is ~1 s with identical output).
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | byte
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # missing data decodes as 0 (T.81 padding behavior)
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def reset(self) -> None:
        """Byte-align and clear state (after a restart marker)."""
        self.acc = 0
        self.nbits = 0
        self.marker = None


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """(length, code) -> symbol, per T.81 annex C canonical assignment."""
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


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_luma(b: bytes):
    """(width, height, grayscale_rows) for a baseline JPEG, or ``None``
    when the file is not baseline-Huffman-decodable (progressive etc.,
    truncated segments, or over the pixel budget) — caller falls back
    to header dims."""
    try:
        return _decode_jpeg_luma(b)
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def _decode_jpeg_luma(b: bytes):
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    import numpy as np

    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, components)
    progressive = False
    prog: dict | None = None  # luma coefficient state across scans
    n_scans = 0
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            if prog is not None:
                return _finalize_luma(prog, np)
            return None  # EOI before any decodable scan
        seg_len = struct.unpack(">H", b[i + 2: i + 4])[0]
        seg = b[i + 4: i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qtables[tq] = list(seg[p: p + 64])
                    p += 64
                else:  # 16-bit quant values
                    qtables[tq] = [
                        struct.unpack(">H", seg[p + 2 * j: p + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1: p + 17])
                nsym = sum(counts)
                symbols = seg[p + 17: p + 17 + nsym]
                table = _build_huffman(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if precision != 8 or ncomp not in (1, 3) or w == 0 or h == 0:
                return None
            if w * h > MAX_PIXELS:
                return None
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F,
                     "tq": tq}
                )
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic/hierarchical
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            w, h, comps = frame
            ns = seg[0]
            if not progressive:
                if ns != len(comps):
                    return None  # non-interleaved baseline: rare, skip
                sel = {}
                for c in range(ns):
                    cs, tables = seg[1 + 2 * c: 3 + 2 * c]
                    sel[cs] = (tables >> 4, tables & 0x0F)
                return _decode_scan(
                    b, i + 2 + seg_len, w, h, comps, sel,
                    qtables, huff_dc, huff_ac, restart_interval, np,
                )
            n_scans += 1
            if n_scans > 64:  # adversarial scan-count backstop
                return None
            if prog is None:
                prog = _init_prog(w, h, comps, qtables)
                if prog is None:
                    return None
            scomps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c: 3 + 2 * c]
                ci = next((k for k, cc in enumerate(comps)
                           if cc["id"] == cs), None)
                if ci is None:
                    return None
                scomps.append((ci, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            end = _decode_prog_scan(
                b, i + 2 + seg_len, prog, comps, scomps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            if end is None:
                return None
            i = end
            continue
        i += 2 + seg_len
    if prog is not None:  # EOI missing but scans decoded — salvage
        return _finalize_luma(prog, np)
    return None


def _decode_scan(b, pos, w, h, comps, sel, qtables, huff_dc, huff_ac,
                 restart_interval, np):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    luma = comps[0]
    try:
        lq = np.array(qtables[luma["tq"]], dtype=np.float64)
        tables = [
            (huff_dc[sel[c["id"]][0]], huff_ac[sel[c["id"]][1]])
            for c in comps
        ]
    except KeyError:
        return None

    lh, lv = luma["h"], luma["v"]
    blocks_w = mcux * lh
    blocks_h = mcuy * lv
    ycoef = np.zeros((blocks_h * blocks_w, 64), dtype=np.float64)

    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # skip to the RSTn marker and resync
                d = br.data
                p = br.pos
                while p + 1 < len(d) and not (
                    d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(d):
                    return None
                br.pos = p + 2
                br.reset()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                dc_t, ac_t = tables[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = _decode_block(br, dc_t, ac_t, preds, ci)
                        if coeffs is None:
                            return None
                        if ci == 0:
                            row = my * lv + by
                            col = mx * lh + bx
                            ycoef[row * blocks_w + col] = coeffs

    # dequantize + de-zigzag + one vectorized IDCT over all luma blocks
    dq = ycoef * lq[None, :]
    blocks = np.zeros((dq.shape[0], 64), dtype=np.float64)
    blocks[:, _ZIGZAG] = dq
    blocks = blocks.reshape(-1, 8, 8)
    basis = _idct_basis()
    pixels = np.einsum("ki,nkl,lj->nij", basis, blocks, basis)
    pixels = np.clip(np.round(pixels + 128.0), 0, 255).astype(np.int64)

    # assemble the luma plane and crop to (sampling-scaled) true size
    plane = (
        pixels.reshape(blocks_h, blocks_w, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(blocks_h * 8, blocks_w * 8)
    )
    # luma plane covers ceil(w*lh/hmax) x ceil(h*lv/vmax) samples
    pw = (w * lh + hmax - 1) // hmax
    ph = (h * lv + vmax - 1) // vmax
    plane = plane[:ph, :pw]
    return w, h, [list(map(int, r)) for r in plane]


def _decode_block(br, dc_table, ac_table, preds, ci):
    """One 8x8 block's 64 zigzag coefficients (DC predicted)."""
    t = _huff_decode(br, dc_table)
    if t is None:
        return None
    diff = _extend(br.bits(t), t) if t else 0
    preds[ci] += diff
    coeffs = [0.0] * 64
    coeffs[0] = float(preds[ci])
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_table)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        coeffs[k] = float(_extend(br.bits(s), s))
        k += 1
    return coeffs


# ---------------------------------------------------------------------------
# progressive (SOF2): multi-scan coefficient accumulation
# ---------------------------------------------------------------------------


def _init_prog(w, h, comps, qtables):
    """Per-frame progressive state: geometry + the LUMA coefficient
    store (chroma scans are entropy-decoded or skipped for bitstream
    position only — the fingerprint needs just the luma plane)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    geom = []
    for c in comps:
        compw = (w * c["h"] + hmax - 1) // hmax
        comph = (h * c["v"] + vmax - 1) // vmax
        geom.append({
            "bw_n": (compw + 7) // 8, "bh_n": (comph + 7) // 8,
            "bw_i": mcux * c["h"], "bh_i": mcuy * c["v"],
        })
    ycoef = [[0] * 64 for _ in range(geom[0]["bh_i"] * geom[0]["bw_i"])]
    return {"w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
            "mcux": mcux, "mcuy": mcuy, "geom": geom, "ycoef": ycoef,
            "qtables": qtables}


def _skip_entropy(b: bytes, pos: int) -> int:
    """Position of the next real marker (stuffed FF00 and RSTn are part
    of the entropy segment)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF:
            m = b[pos + 1]
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _resync_restart(br: _BitReader):
    """Skip to and over the next RSTn marker; False when none found."""
    d = br.data
    p = br.pos
    n = len(d)
    while p + 1 < n and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
        p += 1
    if p + 1 >= n:
        return False
    br.pos = p + 2
    br.reset()
    return True


def _decode_prog_scan(b, pos, prog, comps, scomps, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component) and AC first/refine (always single-component).
    Only luma coefficients are stored; a chroma-only AC scan is skipped
    wholesale to the next marker (its bits are self-contained)."""
    if ss == 0 and se != 0:
        return None  # spectral selection must not mix DC and AC
    if ss > 0:
        if len(scomps) != 1 or se > 63 or ss > se:
            return None
        ci, _tdc, tac = scomps[0]
        if ci != 0:
            return _skip_entropy(b, pos)  # chroma AC: position only
        table = huff_ac.get(tac)
        if ah == 0 and table is None:
            return None
        return _prog_ac_scan(b, pos, prog, ss, se, ah, al, table,
                             restart_interval)
    return _prog_dc_scan(b, pos, prog, comps, scomps, ah, al, huff_dc,
                         restart_interval)


def _prog_dc_scan(b, pos, prog, comps, scomps, ah, al, huff_dc,
                  restart_interval):
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    interleaved = len(scomps) > 1
    ycoef = prog["ycoef"]
    ybw = prog["geom"][0]["bw_i"]
    units = 0

    def unit_boundary():
        nonlocal preds
        if restart_interval and units and units % restart_interval == 0:
            if not _resync_restart(br):
                return False
            preds = [0] * len(comps)
        return True

    def dc_one(ci, tdc, blk_index):
        if ah == 0:
            table = huff_dc.get(tdc)
            if table is None:
                return False
            t = _huff_decode(br, table)
            if t is None:
                return False
            preds[ci] += _extend(br.bits(t), t) if t else 0
            if ci == 0:
                ycoef[blk_index][0] = preds[ci] << al
        else:
            bit = br.bit()
            if ci == 0 and bit:
                ycoef[blk_index][0] |= 1 << al
        return True

    if interleaved:
        for my in range(prog["mcuy"]):
            for mx in range(prog["mcux"]):
                if not unit_boundary():
                    return None
                units += 1
                for ci, tdc, _tac in scomps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = ((my * c["v"] + by) * ybw
                                   + mx * c["h"] + bx) if ci == 0 else 0
                            if not dc_one(ci, tdc, idx):
                                return None
    else:
        ci, tdc, _tac = scomps[0]
        g = prog["geom"][ci]
        for row in range(g["bh_n"]):
            for col in range(g["bw_n"]):
                if not unit_boundary():
                    return None
                units += 1
                idx = row * ybw + col if ci == 0 else 0
                if not dc_one(ci, tdc, idx):
                    return None
    return _skip_entropy(b, br.pos)


def _prog_ac_scan(b, pos, prog, ss, se, ah, al, table, restart_interval):
    br = _BitReader(b, pos)
    ycoef = prog["ycoef"]
    g = prog["geom"][0]
    ybw = g["bw_i"]
    eobrun = 0
    units = 0
    p1 = 1 << al
    m1 = -1 << al

    def refine_nonzero(coef, k):
        """Correction bit for an already-nonzero coefficient."""
        if br.bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    for row in range(g["bh_n"]):
        for col in range(g["bw_n"]):
            if restart_interval and units and units % restart_interval == 0:
                if not _resync_restart(br):
                    return None
                eobrun = 0
            units += 1
            coef = ycoef[row * ybw + col]

            if ah == 0:  # first AC scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, table)
                    if rs is None:
                        return None
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                        break
                    k += r
                    if k > se:
                        return None
                    coef[k] = _extend(br.bits(s), s) << al
                    k += 1
                continue

            # refinement AC scan (T.81 G.1.2.3 decode). EOBRUN here
            # counts the CURRENT block too — after the EOB symbol the
            # band's remaining nonzero coefficients still carry
            # correction bits (unlike first scans, where EOB ends the
            # block with nothing further to read).
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(br, table)
                    if rs is None:
                        return None
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) + (br.bits(r) if r else 0)
                            break
                        # r == 15: pass over 16 zero-history coeffs
                    else:
                        if s != 1:
                            return None  # refinement amplitudes are ±1
                        newval = p1 if br.bit() else m1
                    while k <= se:
                        if coef[k] != 0:
                            refine_nonzero(coef, k)
                        else:
                            if r == 0:
                                if newval:
                                    coef[k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:  # corrections through the band's tail
                    if coef[k] != 0:
                        refine_nonzero(coef, k)
                    k += 1
                eobrun -= 1
    return _skip_entropy(b, br.pos)


def _finalize_luma(prog, np):
    luma = prog["comps"][0]
    q = prog["qtables"].get(luma["tq"])
    if q is None:
        return None
    lq = np.array(q, dtype=np.float64)
    g = prog["geom"][0]
    blocks_h, blocks_w = g["bh_i"], g["bw_i"]
    dq = np.array(prog["ycoef"], dtype=np.float64) * lq[None, :]
    blocks = np.zeros((dq.shape[0], 64), dtype=np.float64)
    blocks[:, _ZIGZAG] = dq
    blocks = blocks.reshape(-1, 8, 8)
    basis = _idct_basis()
    pixels = np.einsum("ki,nkl,lj->nij", basis, blocks, basis)
    pixels = np.clip(np.round(pixels + 128.0), 0, 255).astype(np.int64)
    plane = (
        pixels.reshape(blocks_h, blocks_w, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(blocks_h * 8, blocks_w * 8)
    )
    w, h = prog["w"], prog["h"]
    hmax, vmax = prog["hmax"], prog["vmax"]
    pw = (w * luma["h"] + hmax - 1) // hmax
    ph = (h * luma["v"] + vmax - 1) // vmax
    plane = plane[:ph, :pw]
    return w, h, [list(map(int, r)) for r in plane]
