"""Pure-stdlib AES (FIPS-197) + CBC mode, for PDF standard-security
decryption (AESV2/AESV3 — the role itext's crypto plays in the
reference's decrypt-rewrite, PDFToHtml.java:74-109).

T-table implementation: SubBytes+ShiftRows+MixColumns fold into four
256-entry 32-bit lookup tables per direction (the classic software AES
layout), ~3× the byte-wise form in CPython — this matters because the
PDF 2.0 R6 password hash (pdfcrypt.hash_r6) encrypts ~130 KB per
evaluation and encrypted streams decrypt inside the per-doc time
budget. No third-party crypto dependency: the sandbox (and the minimal
cluster image) ships stdlib only.

Key sizes 128/192/256; encryption is included because the test fixtures
construct encrypted PDFs from scratch (the itext writer role) and the
R6 hash is itself AES-based. Verified against the FIPS-197 known-answer
vectors in tests/test_pdfcrypt.py.
"""

from __future__ import annotations

# -- S-box generation (GF(2^8) inverse + affine transform) ------------------


def _build_sbox() -> tuple[list[int], list[int]]:
    sbox = [0] * 256
    inv = [0] * 256
    p = q = 1
    # iterate multiplicative group via generator 3
    while True:
        # p *= 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q /= 3  (multiply by inverse of 3)
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = (
            q
            ^ ((q << 1) | (q >> 7))
            ^ ((q << 2) | (q >> 6))
            ^ ((q << 3) | (q >> 5))
            ^ ((q << 4) | (q >> 4))
        ) & 0xFF
        sbox[p] = x ^ 0x63
        if p == 1:
            break
    sbox[0] = 0x63
    for i, v in enumerate(sbox):
        inv[v] = i
    return sbox, inv


_SBOX, _INV_SBOX = _build_sbox()


def _gmul(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return r


# encryption T-tables: column contribution of one state byte through
# SubBytes+MixColumns; T_k is the table for ShiftRows source offset k
_T0 = [
    (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3) for s in _SBOX
]
_T1 = [
    (_gmul(s, 3) << 24) | (_gmul(s, 2) << 16) | (s << 8) | s for s in _SBOX
]
_T2 = [
    (s << 24) | (_gmul(s, 3) << 16) | (_gmul(s, 2) << 8) | s for s in _SBOX
]
_T3 = [
    (s << 24) | (s << 16) | (_gmul(s, 3) << 8) | _gmul(s, 2) for s in _SBOX
]

# decryption tables (InvSubBytes + InvMixColumns), and the bare
# InvMixColumns-of-a-byte tables used to transform middle round keys
# for the equivalent inverse cipher
_U0 = [
    (_gmul(x, 14) << 24) | (_gmul(x, 9) << 16)
    | (_gmul(x, 13) << 8) | _gmul(x, 11)
    for x in range(256)
]
_U1 = [
    (_gmul(x, 11) << 24) | (_gmul(x, 14) << 16)
    | (_gmul(x, 9) << 8) | _gmul(x, 13)
    for x in range(256)
]
_U2 = [
    (_gmul(x, 13) << 24) | (_gmul(x, 11) << 16)
    | (_gmul(x, 14) << 8) | _gmul(x, 9)
    for x in range(256)
]
_U3 = [
    (_gmul(x, 9) << 24) | (_gmul(x, 13) << 16)
    | (_gmul(x, 11) << 8) | _gmul(x, 14)
    for x in range(256)
]
_D0 = [_U0[x] for x in _INV_SBOX]
_D1 = [_U1[x] for x in _INV_SBOX]
_D2 = [_U2[x] for x in _INV_SBOX]
_D3 = [_U3[x] for x in _INV_SBOX]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


class AES:
    """Block cipher; round keys held as big-endian 32-bit column words."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
        nk = len(key) // 4
        self.rounds = nk + 6
        w = [int.from_bytes(key[4 * i: 4 * i + 4], "big") for i in range(nk)]
        for i in range(nk, 4 * (self.rounds + 1)):
            t = w[i - 1]
            if i % nk == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = (
                    (_SBOX[(t >> 24) & 0xFF] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
                t ^= _RCON[i // nk - 1] << 24
            elif nk > 6 and i % nk == 4:
                t = (
                    (_SBOX[(t >> 24) & 0xFF] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
            w.append(w[i - nk] ^ t)
        self.rk = w  # flat list: round r uses w[4r:4r+4]
        # equivalent-inverse-cipher keys: InvMixColumns on middle rounds
        drk = list(w)
        for r in range(1, self.rounds):
            for c in range(4):
                v = w[4 * r + c]
                drk[4 * r + c] = (
                    _U0[(v >> 24) & 0xFF]
                    ^ _U1[(v >> 16) & 0xFF]
                    ^ _U2[(v >> 8) & 0xFF]
                    ^ _U3[v & 0xFF]
                )
        self.drk = drk

    def encrypt_block(self, block: bytes) -> bytes:
        rk = self.rk
        t0, t1, t2, t3 = _T0, _T1, _T2, _T3
        s = _SBOX
        w0 = int.from_bytes(block[0:4], "big") ^ rk[0]
        w1 = int.from_bytes(block[4:8], "big") ^ rk[1]
        w2 = int.from_bytes(block[8:12], "big") ^ rk[2]
        w3 = int.from_bytes(block[12:16], "big") ^ rk[3]
        k = 4
        for _ in range(self.rounds - 1):
            n0 = (t0[(w0 >> 24) & 0xFF] ^ t1[(w1 >> 16) & 0xFF]
                  ^ t2[(w2 >> 8) & 0xFF] ^ t3[w3 & 0xFF] ^ rk[k])
            n1 = (t0[(w1 >> 24) & 0xFF] ^ t1[(w2 >> 16) & 0xFF]
                  ^ t2[(w3 >> 8) & 0xFF] ^ t3[w0 & 0xFF] ^ rk[k + 1])
            n2 = (t0[(w2 >> 24) & 0xFF] ^ t1[(w3 >> 16) & 0xFF]
                  ^ t2[(w0 >> 8) & 0xFF] ^ t3[w1 & 0xFF] ^ rk[k + 2])
            n3 = (t0[(w3 >> 24) & 0xFF] ^ t1[(w0 >> 16) & 0xFF]
                  ^ t2[(w1 >> 8) & 0xFF] ^ t3[w2 & 0xFF] ^ rk[k + 3])
            w0, w1, w2, w3 = n0, n1, n2, n3
            k += 4
        # final round: SubBytes + ShiftRows + AddRoundKey
        o0 = ((s[(w0 >> 24) & 0xFF] << 24) | (s[(w1 >> 16) & 0xFF] << 16)
              | (s[(w2 >> 8) & 0xFF] << 8) | s[w3 & 0xFF]) ^ rk[k]
        o1 = ((s[(w1 >> 24) & 0xFF] << 24) | (s[(w2 >> 16) & 0xFF] << 16)
              | (s[(w3 >> 8) & 0xFF] << 8) | s[w0 & 0xFF]) ^ rk[k + 1]
        o2 = ((s[(w2 >> 24) & 0xFF] << 24) | (s[(w3 >> 16) & 0xFF] << 16)
              | (s[(w0 >> 8) & 0xFF] << 8) | s[w1 & 0xFF]) ^ rk[k + 2]
        o3 = ((s[(w3 >> 24) & 0xFF] << 24) | (s[(w0 >> 16) & 0xFF] << 16)
              | (s[(w1 >> 8) & 0xFF] << 8) | s[w2 & 0xFF]) ^ rk[k + 3]
        return (
            o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
            + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
        )

    def decrypt_block(self, block: bytes) -> bytes:
        rk, drk = self.rk, self.drk
        d0, d1, d2, d3 = _D0, _D1, _D2, _D3
        si = _INV_SBOX
        k = 4 * self.rounds
        w0 = int.from_bytes(block[0:4], "big") ^ rk[k]
        w1 = int.from_bytes(block[4:8], "big") ^ rk[k + 1]
        w2 = int.from_bytes(block[8:12], "big") ^ rk[k + 2]
        w3 = int.from_bytes(block[12:16], "big") ^ rk[k + 3]
        k -= 4
        for _ in range(self.rounds - 1):
            n0 = (d0[(w0 >> 24) & 0xFF] ^ d1[(w3 >> 16) & 0xFF]
                  ^ d2[(w2 >> 8) & 0xFF] ^ d3[w1 & 0xFF] ^ drk[k])
            n1 = (d0[(w1 >> 24) & 0xFF] ^ d1[(w0 >> 16) & 0xFF]
                  ^ d2[(w3 >> 8) & 0xFF] ^ d3[w2 & 0xFF] ^ drk[k + 1])
            n2 = (d0[(w2 >> 24) & 0xFF] ^ d1[(w1 >> 16) & 0xFF]
                  ^ d2[(w0 >> 8) & 0xFF] ^ d3[w3 & 0xFF] ^ drk[k + 2])
            n3 = (d0[(w3 >> 24) & 0xFF] ^ d1[(w2 >> 16) & 0xFF]
                  ^ d2[(w1 >> 8) & 0xFF] ^ d3[w0 & 0xFF] ^ drk[k + 3])
            w0, w1, w2, w3 = n0, n1, n2, n3
            k -= 4
        # final round: InvShiftRows + InvSubBytes + AddRoundKey(rk0)
        o0 = ((si[(w0 >> 24) & 0xFF] << 24) | (si[(w3 >> 16) & 0xFF] << 16)
              | (si[(w2 >> 8) & 0xFF] << 8) | si[w1 & 0xFF]) ^ rk[0]
        o1 = ((si[(w1 >> 24) & 0xFF] << 24) | (si[(w0 >> 16) & 0xFF] << 16)
              | (si[(w3 >> 8) & 0xFF] << 8) | si[w2 & 0xFF]) ^ rk[1]
        o2 = ((si[(w2 >> 24) & 0xFF] << 24) | (si[(w1 >> 16) & 0xFF] << 16)
              | (si[(w0 >> 8) & 0xFF] << 8) | si[w3 & 0xFF]) ^ rk[2]
        o3 = ((si[(w3 >> 24) & 0xFF] << 24) | (si[(w2 >> 16) & 0xFF] << 16)
              | (si[(w1 >> 8) & 0xFF] << 8) | si[w0 & 0xFF]) ^ rk[3]
        return (
            o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
            + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
        )


def cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                unpad: bool = True) -> bytes:
    """AES-CBC decrypt; ``unpad=True`` strips PKCS#7 (PDF §7.6.2 stream
    padding), tolerating malformed padding by leaving it in place."""
    if len(data) % 16 != 0:
        data = data[: len(data) - len(data) % 16]  # writers pad sloppily
    aes = AES(key)
    dec = aes.decrypt_block
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i: i + 16]
        out += bytes(x ^ p for x, p in zip(dec(blk), prev))
        prev = blk
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16 and len(out) >= n and all(b == n for b in out[-n:]):
            del out[-n:]
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                pad: bool = True) -> bytes:
    """AES-CBC encrypt with PKCS#7 padding (fixture-writer side + the
    R6 hash primitive)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16 != 0:
        raise ValueError("unpadded CBC needs 16-byte-aligned input")
    aes = AES(key)
    enc = aes.encrypt_block
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ p for x, p in zip(data[i: i + 16], prev))
        prev = enc(blk)
        out += prev
    return bytes(out)
