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

    docs = warc_docs(raw, "t.warc", {"application/pdf": "pdf"})
    assert [d["doc_id"] for d in docs] == ["urn:uuid:0001", "urn:uuid:0004"]
    assert docs[0]["spans"][0]["media_ref"] == "http://a.example/one.pdf"


def test_read_warc_to_extraction(spark, tmp_path):
    """End to end: WARC dir → (doc_id, spans) → extract_spans."""
    from pdf_extract_spark.plans.pipeline import extract_spans
    from pdf_extract_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(_build_warc(_records()[:2]))
    (tmp_path / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _records()[2:]))

    df = read_warc(spark, str(tmp_path),
                   mime_kinds={"application/pdf": "pdf"})
    rows = {r.doc_id: r for r in extract_spans(df).collect()}
    assert set(rows) == {"urn:uuid:0001", "urn:uuid:0004"}
    assert all(r.error is None for r in rows.values())
    assert all(
        any(s["kind"] == "text" and s["text"] for s in r.spans)
        for r in rows.values()
    )


_HTML_PAGE = b"""<html><head><title>A Title</title>
<script>var x = "BOILER SCRIPT";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/b">Blog</a> <a href="/c">Contact</a></nav>
<div class="sidebar"><p>Subscribe to our newsletter for more content!</p></div>
<article>
<h1>Main headline</h1>
<p>This is the first paragraph of the main article content, long enough
to clear the block threshold easily.</p>
<img src="http://img.example/photo.jpg" alt="x"/>
<p>The second paragraph also carries substantial readable content that a
training pipeline wants to keep intact.</p>
<p><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></p>
</article>
<footer><p>Copyright 2024 Example Corp. All rights reserved worldwide.</p></footer>
</body></html>"""


def test_html_main_content_extraction():
    from pdf_extract_spark.functions.htmlextract import (
        extract_main_spans,
        extract_title,
    )

    spans = extract_main_spans(_HTML_PAGE.decode())
    texts = [t for k, t, _ in spans if k == "text"]
    media = [m for k, _, m in spans if k == "media"]
    assert texts[0] == "Main headline"
    assert any("first paragraph" in t for t in texts)
    assert any("second paragraph" in t for t in texts)
    assert media == ["http://img.example/photo.jpg"]
    joined = " ".join(texts)
    assert "Home" not in joined          # nav dropped
    assert "newsletter" not in joined    # sidebar-class div dropped
    assert "Copyright" not in joined     # footer dropped
    assert "BOILER SCRIPT" not in joined  # script dropped
    assert "one two three" not in joined  # link-list paragraph dropped
    assert extract_title(_HTML_PAGE.decode()) == "A Title"


def test_inline_img_does_not_split_block():
    """An inline <img> mid-paragraph keeps the paragraph whole (the old
    flush-on-img severed the leading fragment, which then fell under
    MIN_BLOCK_CHARS and lost the first sentence) and media refs keep
    document order."""
    from pdf_extract_spark.functions.htmlextract import extract_main_spans

    html = ('<html><body><p>Start of the paragraph '
            '<img src="http://img.example/a.png"/> and the rest of the '
            'paragraph continues long enough to keep around.</p>'
            '<img src="http://img.example/b.png"/>'
            '<p>Second paragraph is also long enough to survive the '
            'block threshold.</p></body></html>')
    spans = extract_main_spans(html)
    texts = [t for k, t, _ in spans if k == "text"]
    assert len(texts) == 2
    assert texts[0] == ("Start of the paragraph and the rest of the "
                        "paragraph continues long enough to keep around.")
    media = [m for k, _, m in spans if k == "media"]
    assert media == ["http://img.example/a.png", "http://img.example/b.png"]
    # a inline ref emits with its enclosing block, before the body-level
    # ref and before the following paragraph
    kinds = [(k, t or m) for k, t, m in spans]
    assert kinds.index(("media", "http://img.example/a.png")) \
        < kinds.index(("media", "http://img.example/b.png")) \
        < kinds.index(("text", texts[1]))


def test_warc_html_to_extraction_pipeline(spark, tmp_path):
    """WARC with an HTML response → html span → DOM boilerplate strip →
    ordered text/media spans with doc language."""
    from pdf_extract_spark.plans.pipeline import extract_spans
    from pdf_extract_spark.sources.warc import read_warc

    rec = _warc_record("response", "http://a.example/article.html",
                       _HTML_PAGE, "text/html; charset=utf-8",
                       "urn:uuid:h001")
    (tmp_path / "h.warc").write_bytes(rec)
    df = read_warc(spark, str(tmp_path))
    row = extract_spans(df).collect()[0]
    assert row.error is None
    kinds = [s["kind"] for s in row.spans]
    assert "media" in kinds
    texts = [s["text"] for s in row.spans if s["kind"] == "text"]
    assert texts[0] == "Main headline"
    assert all("Copyright" not in t for t in texts)
    assert row.lang == "en"
    assert [s["offset"] for s in row.spans] == list(range(len(row.spans)))


def test_html_extraction_never_raises():
    """Malformed/adversarial markup degrades, never throws."""
    import random

    from pdf_extract_spark.functions.htmlextract import extract_main_spans

    samples = [
        "",
        "<",
        "<html",
        "plain text with no tags at all, but long enough to be a block",
        "<p>unclosed paragraph with sufficient length to keep around here",
        "</div></p></body>stray end tags everywhere</nav>",
        "<p>" + "a" * 100000 + "</p>",
        "<div>" * 500 + "deep nesting but with enough text to keep" + "</div>" * 500,
        "<p>entity bomb &amp;&lt;&gt;&quot; &#65;&#x42; and unicode 中文</p>",
        "<a href='x'><p>block inside inline with plenty of text to consider</p></a>",
    ]
    rng = random.Random(7)
    base = ("<html><body><nav>x</nav><p>Real content paragraph that is long "
            "enough to keep for sure.</p></body></html>")
    for seed in range(60):
        s = list(base)
        for _ in range(rng.randint(1, 12)):
            i = rng.randrange(len(s))
            s[i] = chr(rng.randrange(1, 128))
        samples.append("".join(s))
    for html in samples:
        out = extract_main_spans(html)
        assert isinstance(out, list)  # no throw, structured output


def test_gzip_single_member_and_truncated():
    """Both gzip layouts work: one member per record (Common Crawl) and
    one member for the whole archive; a truncated final member salvages
    the complete records before it."""
    import gzip

    from pdf_extract_spark.sources.warc import iter_warc_records

    recs = _records()
    assert len(list(iter_warc_records(gzip.compress(_build_warc(recs))))) == 4
    per_member = b"".join(gzip.compress(r) for r in recs)
    assert len(list(iter_warc_records(per_member))) == 4
    # drop the tail of the last member: the 3 intact members' records
    # survive fully; the truncated one may salvage with a short body
    truncated = per_member[: len(per_member) - 40]
    got = list(iter_warc_records(truncated))
    assert 3 <= len(got) <= 4
    full = list(iter_warc_records(per_member))
    for (h_t, b_t), (h_f, b_f) in zip(got[:3], full[:3]):
        assert h_t == h_f and b_t == b_f


def test_gzip_many_members_linear_time():
    """A Common-Crawl-shaped archive (one gzip member per record, tens
    of thousands of members) parses in linear-ish time.  The round-2
    walk copied the whole remaining buffer per member — quadratic:
    ~12k members of this archive took minutes; the chunked memoryview
    walk takes well under a few seconds."""
    import time

    from pdf_extract_spark.sources.warc import (
        _iter_gzip_members,
        iter_warc_records,
    )

    n_members = 12000
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody!"
    rec = _warc_record("response", "http://x.example/r", payload[39:],
                       "text/plain", "urn:uuid:lin")
    one = gzip.compress(rec)
    archive = one * n_members

    t0 = time.monotonic()
    members = sum(1 for _ in _iter_gzip_members(archive))
    dt = time.monotonic() - t0
    assert members == n_members
    assert dt < 5.0, f"many-member gzip walk took {dt:.1f}s (quadratic?)"

    # and the record iterator on top sees every record
    t0 = time.monotonic()
    n_recs = sum(1 for _ in iter_warc_records(archive))
    assert n_recs == n_members
    assert time.monotonic() - t0 < 10.0


def test_gzip_mixed_member_sizes():
    """Member-size adaptivity: alternating tiny and large members all
    decode byte-exactly (the chunk-size seed from the previous member
    must not corrupt boundary recovery)."""
    from pdf_extract_spark.sources.warc import _iter_gzip_members

    import random

    rng = random.Random(3)
    parts = []
    for i in range(60):
        size = 30 if i % 2 == 0 else rng.randrange(50_000, 200_000)
        parts.append(bytes(rng.randrange(256) for _ in range(size)))
    archive = b"".join(gzip.compress(p) for p in parts)
    got = list(_iter_gzip_members(archive))
    assert got == parts


def test_html_lang_attribute_fallback(spark):
    """A doc whose blocks defeat stopword detection still gets the
    declared <html lang> as its language."""
    from pdf_extract_spark.plans.pipeline import extract_spans

    html = ('<html lang="fi-FI"><body><p>Lyhyt kappale ilman yleisiä '
            'pikkusanoja: tekstintunnistus epäonnistuu tässä varmasti '
            'kokonaan.</p></body></html>')
    df = spark.createDataFrame(
        [("h1", [{"kind": "html", "text": html, "media_ref": "",
                  "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    row = extract_spans(df).collect()[0]
    assert row.lang in ("fi",)  # attr fallback (or detection, both fi)


def test_aria_landmark_roles_are_boilerplate():
    from pdf_extract_spark.functions.htmlextract import extract_main_spans

    html = ('<html><body>'
            '<div role="navigation"><p>Home page link list goes here now</p></div>'
            '<div role="contentinfo"><p>Site information and legal notices.</p></div>'
            '<p>The real article body, with enough characters to keep.</p>'
            '</body></html>')
    texts = [t for k, t, _ in extract_main_spans(html) if k == "text"]
    assert texts == ["The real article body, with enough characters to keep."]


def test_search_results_class_is_not_chrome():
    from pdf_extract_spark.functions.htmlextract import extract_main_spans

    html = ('<html><body><div class="search-results">'
            '<p>First search result with a meaningful description text.</p>'
            '</div></body></html>')
    texts = [t for k, t, _ in extract_main_spans(html) if k == "text"]
    assert texts  # content inside a search-results container survives
