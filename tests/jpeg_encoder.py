# -*- coding: utf-8 -*-
"""Minimal baseline JPEG ENCODER — test fixture generator only.

Writes spec-valid baseline JFIF streams with simple custom canonical
Huffman tables (all DC categories at 4 bits, all 162 AC symbols at
8 bits — written to DHT, so any conforming decoder reads them) and a
flat quantization table, so the encode→decode round trip is
near-lossless and pixel comparisons in tests can use a tight
tolerance. Supports grayscale, 3-component 1×1, and 2×2-subsampled-Y
color, plus restart intervals."""

from __future__ import annotations

import struct

import numpy as np

from pdf_extract_spark.functions.jpegdec import _ZIGZAG, _idct_basis

_DC_SYMS = bytes(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # all 12 categories at 4 bits
_AC_SYMS = bytes(
    [0x00, 0xF0]
    + [(r << 4) for r in range(1, 15)]  # EOBn (progressive AC scans)
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8  # all at 8 bits


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per T.81


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _emit_value(bw: _BitWriter, v: int, t: int):
    if t:
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_block(bw: _BitWriter, block: "np.ndarray", pred: int) -> int:
    basis = _idct_basis()
    coeffs = basis @ (block - 128.0) @ basis.T
    zz = np.round(coeffs.reshape(64)[_ZIGZAG]).astype(int)
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    length, code = _DC_CODES[t]
    bw.write(code, length)
    _emit_value(bw, diff, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = _AC_CODES[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        _emit_value(bw, v, s)
        run = 0
    if last_nz < 63:
        length, code = _AC_CODES[0x00]
        bw.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _plane_blocks(plane: "np.ndarray"):
    h, w = plane.shape
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:, w:] = padded[:, w - 1: w]
    return padded, ph // 8, pw // 8


def encode_jpeg(pixels, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """pixels: (h, w) grayscale or (h, w, 3) RGB uint8-ish array."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels]
        samps = [(1, 1)]
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2

            def ds(p):
                pad = np.empty((ph, pw))
                pad[:h, :w] = p
                pad[h:, :w] = p[-1:, :]
                pad[:, w:] = pad[:, w - 1: w]
                return (pad[0::2, 0::2] + pad[1::2, 0::2]
                        + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0

            planes = [y, ds(cb), ds(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT: flat q=1
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        pp, _, _ = _plane_blocks(p)
        # pad further so every MCU's blocks exist
        bh = ((pp.shape[0] + 8 * sv - 1) // (8 * sv)) * 8 * sv
        bw_ = ((pp.shape[1] + 8 * sh - 1) // (8 * sh)) * 8 * sh
        full = np.empty((bh, bw_))
        full[: pp.shape[0], : pp.shape[1]] = pp
        full[pp.shape[0]:, : pp.shape[1]] = pp[-1:, :]
        full[:, pp.shape[1]:] = full[:, pp.shape[1] - 1: pp.shape[1]]
        padded.append(full)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval
                                             - 1) % 8)])
                bw = _BitWriter()
                preds = [0] * ncomp
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        block = padded[ci][r0: r0 + 8, c0: c0 + 8]
                        preds[ci] = _encode_block(bw, block, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------


def _block_zz(plane, row, col):
    basis = _idct_basis()
    block = plane[row * 8: row * 8 + 8, col * 8: col * 8 + 8]
    coeffs = basis @ (block - 128.0) @ basis.T
    return np.round(coeffs.reshape(64)[_ZIGZAG]).astype(int)


class _AcFirstState:
    """EOB-run batching for AC first scans (decoder convention: EOBn
    covers (1<<r)-1+ext FURTHER blocks beyond the breaking one)."""

    def __init__(self, bw):
        self.bw = bw
        self.run = 0

    def flush(self):
        if self.run:
            r = self.run.bit_length() - 1
            length, code = _AC_CODES[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.run - (1 << r), r)
            self.run = 0


def _encode_ac_first(bw, zz, al, st):
    band = [int(v) // 2**al if v >= 0 else -((-int(v)) >> al)
            for v in zz[1:]]
    band = [(v if v >= 0 else v) for v in band]
    last_nz = max((i for i, v in enumerate(band) if v), default=-1)
    if last_nz < 0:
        st.run += 1
        if st.run == 0x7FFF:
            st.flush()
        return
    st.flush()
    run = 0
    for i in range(last_nz + 1):
        v = band[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = _AC_CODES[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        _emit_value(bw, v, s)
        run = 0
    if last_nz < 62:
        st.run = 1  # this block ends in an EOB; may batch with next


class _AcRefineState:
    """EOB-run + correction-bit buffering for AC refinement scans
    (decoder convention: EOBn covers the CURRENT block too)."""

    def __init__(self, bw):
        self.bw = bw
        self.run = 0
        self.pending_bits: list[int] = []

    def flush(self):
        if self.run:
            r = self.run.bit_length() - 1
            length, code = _AC_CODES[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.run - (1 << r), r)
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.run = 0
        self.pending_bits = []


def _encode_ac_refine(bw, zz, al, st):
    band = [int(v) for v in zz[1:]]
    r = 0
    br_bits: list[int] = []
    emitted = False
    for v in band:
        if (abs(v) >> (al + 1)) == 0:  # zero history at this precision
            now = (abs(v) >> al) & 1
            if now == 0:
                r += 1
                continue
            # newly significant (magnitude exactly 1 at this precision)
            while r > 15:
                st.flush()
                length, code = _AC_CODES[0xF0]
                bw.write(code, length)
                for bb in br_bits:
                    bw.write(bb, 1)
                br_bits = []
                r -= 16
            st.flush()
            length, code = _AC_CODES[(r << 4) | 1]
            bw.write(code, length)
            bw.write(1 if v > 0 else 0, 1)
            for bb in br_bits:
                bw.write(bb, 1)
            br_bits = []
            r = 0
            emitted = True
        else:  # nonzero history: buffered correction bit
            br_bits.append((abs(v) >> al) & 1)
    if r > 0 or br_bits or not emitted:
        st.run += 1
        st.pending_bits.extend(br_bits)
        if st.run == 0x7FFF:
            st.flush()


def encode_jpeg_progressive(pixels, subsample=False) -> bytes:
    """Progressive JFIF: DC first (Al=1, interleaved) → DC refine →
    per-component AC first (ss=1..63, Al=1) → per-component AC refine
    (Ah=1, Al=0). Exercises every progressive decode path incl. EOB
    runs, ZRL-in-refine, and correction bits."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels]
        samps = [(1, 1)]
    else:
        r_, g_, b_ = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        if subsample:
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2

            def ds(p):
                pad = np.empty((ph, pw))
                pad[:h, :w] = p
                pad[h:, :w] = p[-1:, :]
                pad[:, w:] = pad[:, w - 1: w]
                return (pad[0::2, 0::2] + pad[1::2, 0::2]
                        + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0

            planes = [y, ds(cb), ds(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ncomp = len(planes)

    # pad each plane to its interleaved block grid and precompute zz
    zz_all = []
    grids = []
    for p, (sh, sv) in zip(planes, samps):
        bw_i, bh_i = mcux * sh, mcuy * sv
        full = np.empty((bh_i * 8, bw_i * 8))
        full[: p.shape[0], : p.shape[1]] = p
        full[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        full[:, p.shape[1]:] = full[:, p.shape[1] - 1: p.shape[1]]
        zz_all.append({(r0, c0): _block_zz(full, r0, c0)
                       for r0 in range(bh_i) for c0 in range(bw_i)})
        compw = (w * sh + hmax - 1) // hmax
        comph = (h * sv + vmax - 1) // vmax
        grids.append({"bw_i": bw_i, "bh_i": bh_i,
                      "bw_n": (compw + 7) // 8, "bh_n": (comph + 7) // 8})

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)

    def sos(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            p += bytes([cid, 0x00])
        p += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, p)

    # scan 1: DC first, interleaved, Al=1 (arithmetic shift for DC)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    bw_ = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(zz_all[ci][(my * sv + by,
                                             mx * sh + bx)][0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        t = _category(diff)
                        length, code = _DC_CODES[t]
                        bw_.write(code, length)
                        _emit_value(bw_, diff, t)
    bw_.flush()
    out += bw_.out

    # scan 2: DC refine (1 bit per block, same order)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    bw_ = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(zz_all[ci][(my * sv + by,
                                             mx * sh + bx)][0])
                        bw_.write(dc & 1, 1)
    bw_.flush()
    out += bw_.out

    # scans 3..: per-component AC first then (after all firsts) refines
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 0, 1)
        bw_ = _BitWriter()
        st = _AcFirstState(bw_)
        g = grids[ci]
        for r0 in range(g["bh_n"]):
            for c0 in range(g["bw_n"]):
                _encode_ac_first(bw_, zz_all[ci][(r0, c0)], 1, st)
        st.flush()
        bw_.flush()
        out += bw_.out
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 1, 0)
        bw_ = _BitWriter()
        st = _AcRefineState(bw_)
        g = grids[ci]
        for r0 in range(g["bh_n"]):
            for c0 in range(g["bw_n"]):
                _encode_ac_refine(bw_, zz_all[ci][(r0, c0)], 0, st)
        st.flush()
        bw_.flush()
        out += bw_.out

    out += b"\xff\xd9"
    return bytes(out)
