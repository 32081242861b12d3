"""Pure-stdlib AES (FIPS-197) + CBC mode, for PDF standard-security
decryption (AESV2/AESV3 — the role itext's crypto plays in the
reference's decrypt-rewrite, PDFToHtml.java:74-109).

Scope: the S5 decrypt fallback runs on permission-locked web PDFs whose
streams are a few KB — a table-driven Python AES (~1 MB/s/core) is well
inside the per-doc time budget, and the Arrow-batched extraction UDF
parallelizes it across executor cores. No third-party crypto dependency:
the sandbox (and the minimal cluster image) ships stdlib only.

Key sizes 128/192/256; encryption is included because the test fixtures
construct encrypted PDFs from scratch (the itext writer role).
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
        # q /= 3  (multiply by inverse of 3: 0xF6 sequence trick)
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


_MUL2 = [_gmul(i, 2) for i in range(256)]
_MUL3 = [_gmul(i, 3) for i in range(256)]
_MUL9 = [_gmul(i, 9) for i in range(256)]
_MUL11 = [_gmul(i, 11) for i in range(256)]
_MUL13 = [_gmul(i, 13) for i in range(256)]
_MUL14 = [_gmul(i, 14) for i in range(256)]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


class AES:
    """Block cipher; state/rk laid out in FIPS input order (column-major:
    byte k is state[r=k%4][c=k//4])."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
        nk = len(key) // 4
        self.rounds = nk + 6
        # expand to (rounds+1) 16-byte round keys
        w = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.rounds + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([w[i - nk][j] ^ t[j] for j in range(4)])
        self.rk = [
            bytes(b for word in w[4 * r: 4 * r + 4] for b in word)
            for r in range(self.rounds + 1)
        ]

    def encrypt_block(self, block: bytes) -> bytes:
        s = bytearray(x ^ k for x, k in zip(block, self.rk[0]))
        for rnd in range(1, self.rounds):
            # SubBytes + ShiftRows fused
            t = bytearray(16)
            for c in range(4):
                for r in range(4):
                    t[r + 4 * c] = _SBOX[s[r + 4 * ((c + r) % 4)]]
            # MixColumns + AddRoundKey
            rk = self.rk[rnd]
            for c in range(4):
                i = 4 * c
                a0, a1, a2, a3 = t[i], t[i + 1], t[i + 2], t[i + 3]
                s[i] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3 ^ rk[i]
                s[i + 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3 ^ rk[i + 1]
                s[i + 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3] ^ rk[i + 2]
                s[i + 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3] ^ rk[i + 3]
        rk = self.rk[self.rounds]
        out = bytearray(16)
        for c in range(4):
            for r in range(4):
                i = r + 4 * c
                out[i] = _SBOX[s[r + 4 * ((c + r) % 4)]] ^ rk[i]
        return bytes(out)

    def decrypt_block(self, block: bytes) -> bytes:
        rk = self.rk[self.rounds]
        s = bytearray(x ^ k for x, k in zip(block, rk))
        # InvShiftRows + InvSubBytes
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = _INV_SBOX[s[r + 4 * ((c - r) % 4)]]
        s = t
        for rnd in range(self.rounds - 1, 0, -1):
            rk = self.rk[rnd]
            t = bytearray(16)
            # AddRoundKey + InvMixColumns
            for c in range(4):
                i = 4 * c
                a0 = s[i] ^ rk[i]
                a1 = s[i + 1] ^ rk[i + 1]
                a2 = s[i + 2] ^ rk[i + 2]
                a3 = s[i + 3] ^ rk[i + 3]
                t[i] = _MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3]
                t[i + 1] = _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3]
                t[i + 2] = _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3]
                t[i + 3] = _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3]
            # InvShiftRows + InvSubBytes
            s = bytearray(16)
            for c in range(4):
                for r in range(4):
                    s[r + 4 * c] = _INV_SBOX[t[r + 4 * ((c - r) % 4)]]
        return bytes(x ^ k for x, k in zip(s, self.rk[0]))


def cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                unpad: bool = True) -> bytes:
    """AES-CBC decrypt; ``unpad=True`` strips PKCS#7 (PDF §7.6.2 stream
    padding), tolerating malformed padding by leaving it in place."""
    if len(data) % 16 != 0:
        data = data[: len(data) - len(data) % 16]  # writers pad sloppily
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i: i + 16]
        out += bytes(x ^ p for x, p in zip(aes.decrypt_block(blk), prev))
        prev = blk
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16 and len(out) >= n and all(b == n for b in out[-n:]):
            del out[-n:]
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                pad: bool = True) -> bytes:
    """AES-CBC encrypt with PKCS#7 padding (fixture-writer side)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16 != 0:
        raise ValueError("unpadded CBC needs 16-byte-aligned input")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ p for x, p in zip(data[i: i + 16], prev))
        prev = aes.encrypt_block(blk)
        out += prev
    return bytes(out)
