"""WARC source: web-archive files → interleaved table → extraction."""

from __future__ import annotations

import gzip


def _warc_record(rec_type: str, uri: str, payload: bytes,
                 content_type: str, rec_id: str) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + content_type.encode()
        + b"\r\nContent-Length: "
        + str(len(payload)).encode()
        + b"\r\n\r\n"
        + payload
    )
    body = http if rec_type == "response" else payload
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: <{rec_id}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


def _build_warc(records) -> bytes:
    return b"".join(records)


def _records():
    from pdf_extract_spark.sources.corpus import synth_pdf

    return [
        _warc_record("response", "http://a.example/one.pdf",
                     synth_pdf(1, n_pages=2), "application/pdf",
                     "urn:uuid:0001"),
        _warc_record("response", "http://a.example/page.html",
                     b"<html><body>nope</body></html>", "text/html",
                     "urn:uuid:0002"),
        _warc_record("request", "http://a.example/one.pdf",
                     b"GET /one.pdf HTTP/1.1", "application/http",
                     "urn:uuid:0003"),
        _warc_record("response", "http://b.example/two.pdf",
                     synth_pdf(2, n_pages=1),
                     "application/pdf; charset=binary", "urn:uuid:0004"),
    ]


def test_iter_warc_records_plain_and_gzip():
    from pdf_extract_spark.sources.warc import iter_warc_records, warc_docs

    raw = _build_warc(_records())
    assert len(list(iter_warc_records(raw))) == 4
    # multi-member gzip (one member per record, the Common Crawl layout)
    gz = b"".join(gzip.compress(r) for r in _records())
    assert len(list(iter_warc_records(gz))) == 4

    docs = warc_docs(raw, "t.warc", ("application/pdf",))
    assert [d["doc_id"] for d in docs] == ["urn:uuid:0001", "urn:uuid:0004"]
    assert docs[0]["spans"][0]["media_ref"] == "http://a.example/one.pdf"


def test_read_warc_to_extraction(spark, tmp_path):
    """End to end: WARC dir → (doc_id, spans) → extract_spans."""
    from pdf_extract_spark.plans.pipeline import extract_spans
    from pdf_extract_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(_build_warc(_records()[:2]))
    (tmp_path / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _records()[2:]))

    df = read_warc(spark, str(tmp_path))
    rows = {r.doc_id: r for r in extract_spans(df).collect()}
    assert set(rows) == {"urn:uuid:0001", "urn:uuid:0004"}
    assert all(r.error is None for r in rows.values())
    assert all(
        any(s["kind"] == "text" and s["text"] for s in r.spans)
        for r in rows.values()
    )
