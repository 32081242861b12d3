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
