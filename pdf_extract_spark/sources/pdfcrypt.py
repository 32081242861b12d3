"""PDF standard security handler: RC4 decrypt (S5) + permission probe (S6).

The reference handles encrypted PDFs in two steps: a permissions probe
via itext (``getAccessPermissions``/``setAccessPermissions``,
PDFExtract.java:574-625 — 9 booleans in HTMLObject.AccessPermission,
HTMLObject.java:87-98) and a decrypt-and-retry fallback when poppler
reports a permission error (``PDFToHtml.decrypt``, PDFToHtml.java:74-109,
which rewrites the file with all permissions via itext). Both fork or
call native/JVM libraries.

Here both are pure-stdlib and in-process (``hashlib.md5`` + a 20-line
RC4), applied lazily inside the Arrow-batched extraction UDF: documents
encrypted with the Standard security handler V1/V2 (RC4 40–128 bit, the
overwhelming majority of permission-locked web PDFs — they are "owner
password only", i.e. the user password is empty and the content is
extractable by design) decrypt transparently during stream decode.
AESV2/AESV3 (V≥4) documents surface a structured ``encrypted:`` error
row plus the decoded permission bits, the engine's error-sink path
(SURVEY.md §2.1 S5/S8).

Permission-bit semantics mirror itext's ``PdfEncryptor.is*Allowed``
(PDF 32000-1 Table 22): bit positions 3,4,5,6,9,10,11,12 with
full-quality printing requiring bits 3+12.
"""

from __future__ import annotations

import hashlib
import struct

# PDF 32000-1 §7.6.3.3 Algorithm 2 padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

# itext PdfWriter permission masks (PdfEncryptor.is*Allowed semantics)
_BIT_PRINT = 1 << 2          # bit 3
_BIT_MODIFY = 1 << 3         # bit 4
_BIT_COPY = 1 << 4           # bit 5
_BIT_ANNOT = 1 << 5          # bit 6
_BIT_FILL = 1 << 8           # bit 9
_BIT_SCREENREADER = 1 << 9   # bit 10
_BIT_ASSEMBLE = 1 << 10      # bit 11
_BIT_PRINT_HQ = 1 << 11      # bit 12


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def permissions_dict(p: int, encrypted: bool = True) -> dict:
    """Decode /P into the reference's 9 AccessPermission booleans
    (HTMLObject.java:87-98; bit semantics of PdfEncryptor.is*Allowed)."""
    return {
        "is_encrypted": encrypted,
        "can_assembly": bool(p & _BIT_ASSEMBLE),
        "can_copy": bool(p & _BIT_COPY),
        # itext: full printing needs bits 3+12; bit 3 alone is degraded
        "can_print": (p & (_BIT_PRINT | _BIT_PRINT_HQ))
        == (_BIT_PRINT | _BIT_PRINT_HQ),
        "can_print_degraded": bool(p & _BIT_PRINT),
        "can_modified": bool(p & _BIT_MODIFY),
        "can_modify_annotations": bool(p & _BIT_ANNOT),
        "can_fill_in_form": bool(p & _BIT_FILL),
        "can_screen_reader": bool(p & _BIT_SCREENREADER),
    }


class UnsupportedEncryption(Exception):
    """Raised for handlers we cannot decrypt (AES, crypt filters,
    non-Standard security handlers, or a required user password)."""


class StandardSecurityHandler:
    """V1/V2 Standard security handler with an empty user password.

    ``decrypt(raw, num, gen)`` implements Algorithm 1 (per-object RC4
    key: file key + 3-byte object number + 2-byte generation, MD5,
    first min(n+5, 16) bytes).
    """

    def __init__(self, encrypt: dict, doc_id: bytes, password: bytes = b""):
        filt = str(encrypt.get("Filter", ""))
        if filt != "Standard":
            raise UnsupportedEncryption(f"security handler /{filt}")
        self.v = int(encrypt.get("V", 0) or 0)
        self.r = int(encrypt.get("R", 2) or 2)
        self.p = _as_int32(encrypt.get("P", -1))
        self.o = _as_bytes(encrypt.get("O", b""))
        self.u = _as_bytes(encrypt.get("U", b""))
        self.length = int(encrypt.get("Length", 40) or 40)
        self.doc_id = doc_id
        if self.v not in (1, 2):
            raise UnsupportedEncryption(f"encryption V={self.v} (AES/crypt filters)")
        if len(self.o) < 32:
            raise UnsupportedEncryption("malformed /O entry")
        self.key = file_key(password, self.o, self.p, self.doc_id,
                            self.r, self.length)
        if not self.check_user_password():
            raise UnsupportedEncryption("user password required")

    def check_user_password(self) -> bool:
        """Algorithm 6: recompute /U from the file key and compare
        (R2: full 32 bytes; R3+: first 16)."""
        expect = compute_u(self.key, self.doc_id, self.r)
        if self.r == 2:
            return expect == self.u[:32]
        return expect[:16] == self.u[:16]

    def object_key(self, num: int, gen: int) -> bytes:
        n = len(self.key)
        h = hashlib.md5(
            self.key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
        ).digest()
        return h[: min(n + 5, 16)]

    def decrypt(self, raw: bytes, num: int, gen: int) -> bytes:
        return rc4(self.object_key(num, gen), raw)

    # encryption is the same operation (RC4 is symmetric) — used by the
    # test fixtures that construct encrypted PDFs from scratch
    encrypt = decrypt

    def permissions(self) -> dict:
        return permissions_dict(self.p, encrypted=True)


def file_key(password: bytes, o: bytes, p: int, doc_id: bytes,
             r: int, length: int) -> bytes:
    """Algorithm 2: the file encryption key."""
    n = max(5, min(16, length // 8)) if r >= 3 else 5
    h = hashlib.md5()
    h.update((password + PAD)[:32])
    h.update(o[:32])
    h.update(struct.pack("<i", _as_int32(p)))
    h.update(doc_id)
    key = h.digest()[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()[:n]
    return key


def compute_u(key: bytes, doc_id: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry for a given file key."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + doc_id).digest()
    out = rc4(key, h)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16  # 16 bytes of arbitrary padding per spec


def compute_o(owner_password: bytes, user_password: bytes, r: int,
              length: int) -> bytes:
    """Algorithm 3: the /O entry (needed to WRITE encrypted PDFs — the
    role of itext in the reference's decrypt-rewrite, PDFToHtml.java:96)."""
    n = max(5, min(16, length // 8)) if r >= 3 else 5
    h = hashlib.md5((owner_password or user_password) + PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    out = rc4(key, (user_password + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def _as_int32(v) -> int:
    """/P is a signed 32-bit value; some writers store it unsigned."""
    try:
        p = int(v)
    except (TypeError, ValueError):
        return -1
    if p > 0x7FFFFFFF:
        p -= 1 << 32
    return p


def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1")
    return b""
