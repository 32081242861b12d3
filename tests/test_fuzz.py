"""Deterministic corruption fuzz: at web scale malformed PDFs are
guaranteed — every corruption must yield a DocResult (spans or a
structured error row), never an exception escaping the UDF (the S8
error-sink contract, Common.java:588-607 / SURVEY.md §2.1)."""

import random

import pytest

from pdf_extract_spark.operators.extract import extract_pdf
from tests.conftest import fixture_bytes


def _corrupt(src: bytes, seed: int) -> bytes:
    rng = random.Random(seed)
    data = bytearray(src)
    mode = seed % 4
    if mode == 0:  # random byte flips
        for _ in range(rng.randint(1, 50)):
            data[rng.randrange(len(data))] = rng.randrange(256)
    elif mode == 1:  # truncation
        data = data[: rng.randrange(1, len(data))]
    elif mode == 2:  # garbage splice
        i = rng.randrange(len(data))
        data[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 500)))
    else:  # chunk deletion
        i = rng.randrange(len(data))
        del data[i : min(len(data), i + rng.randint(1, 2000))]
    return bytes(data)


@pytest.mark.parametrize("fixture", ["sample.pdf", "sample2.pdf", "sample3.pdf"])
def test_corrupted_pdfs_never_raise(fixture):
    src = fixture_bytes(fixture)
    if src is None:
        pytest.skip("reference fixtures unavailable")
    for seed in range(80):
        res = extract_pdf(_corrupt(src, seed), max_pages=8)
        assert res is not None  # DocResult with spans or error — no throw


def test_corrupted_encrypted_pdf_never_raises():
    from tests.test_pdfcrypt import _perm, make_encrypted_pdf

    src = make_encrypted_pdf(2, 3, 128, _perm(3, 5, 12))
    for seed in range(80):
        res = extract_pdf(_corrupt(src, seed), max_pages=8)
        assert res is not None


def test_garbage_inputs_never_raise():
    for payload in (b"", b"%PDF-", b"%PDF-1.4\n\x00\xff" * 100,
                    b"not a pdf at all", b"%PDF-1.4\n1 0 obj\n<<",
                    bytes(range(256)) * 4):
        res = extract_pdf(payload)
        assert res.error is not None
        assert res.spans == []


def test_corrupted_aes_pdf_never_raises():
    from tests.test_pdfcrypt import _perm, make_encrypted_pdf, make_encrypted_pdf_v5

    for src in (make_encrypted_pdf(4, 4, 128, _perm(3, 5, 12), cfm="AESV2"),
                make_encrypted_pdf_v5(6, _perm(3, 5, 12))):
        for seed in range(40):
            res = extract_pdf(_corrupt(src, seed), max_pages=8)
            assert res is not None
