"""Golden span tests: span-sequence equality (kind, text, media_ref, order)
against frozen, human-audited golden files (FIXTURES.md §3). This is the
north-rule per-row invariant surface."""

import json
import os

import pytest

from pdf_extract_spark.operators.extract import extract_pdf
from pdf_extract_spark.sources.corpus import synth_pdf
from tests.conftest import fixture_bytes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return json.load(fh)


def spans_of(res):
    return [[k, t, m] for k, t, m, _ in res.spans]


@pytest.mark.parametrize(
    "fixture", ["sample.pdf", "sample2.pdf", "sample3.pdf", "sample4.pdf"]
)
def test_reference_fixture_spans(fixture):
    data = fixture_bytes(fixture)
    if data is None:
        pytest.skip("reference fixtures unavailable")
    golden = load_golden(fixture.replace(".pdf", "") + ".spans.json")
    res = extract_pdf(data)
    assert res.error is None
    assert res.n_pages == golden["n_pages"]
    assert res.lang == golden["lang"]
    assert spans_of(res) == golden["spans"]


def test_synth_golden():
    golden = load_golden("synth42.spans.json")
    res = extract_pdf(synth_pdf(42, n_pages=2))
    assert spans_of(res) == golden["spans"]


def test_offsets_dense_and_ordered():
    res = extract_pdf(synth_pdf(7))
    assert [s[3] for s in res.spans] == list(range(len(res.spans)))


def test_determinism_repeated_runs():
    a = extract_pdf(synth_pdf(13, n_pages=3))
    b = extract_pdf(synth_pdf(13, n_pages=3))
    assert spans_of(a) == spans_of(b)
    assert a.lang_dist == b.lang_dist


def test_media_spans_present_and_ordered():
    data = fixture_bytes("sample3.pdf")
    if data is None:
        pytest.skip("reference fixtures unavailable")
    res = extract_pdf(data)
    media = [s for s in res.spans if s[0] == "media"]
    assert len(media) == res.n_media > 0
    # media refs are page-scoped and unique
    assert len({m[2] for m in media}) == len(media)


def test_error_row_for_garbage():
    res = extract_pdf(b"not a pdf")
    assert res.error is not None
    assert res.spans == []
