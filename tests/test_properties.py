"""Property-based tests (hypothesis) — SURVEY.md §5.4: idempotence,
round-trips, and never-crash invariants over generated inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extract_spark.functions.sentencejoin import NgramModel, SentenceJoinScorer
from pdf_extract_spark.functions.textops import tokenize_content
from pdf_extract_spark.functions.textrules import RuleSet
from pdf_extract_spark.sources.pdfcrypt import (
    compute_o,
    compute_u,
    file_key,
    rc4,
)

RULES = RuleSet()

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=60, deadline=None)
@given(text_strategy)
def test_normalize_idempotent(s):
    once = RULES.normalize_str(s)
    assert RULES.normalize_str(once) == once


@settings(max_examples=60, deadline=None)
@given(text_strategy)
def test_repair_stable_after_two_applications(s):
    # repair is convergent: a second application is a fixpoint of a third
    twice = RULES.repair_str(RULES.repair_str(s))
    assert RULES.repair_str(twice) == twice


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=512))
def test_tokenizer_never_crashes(data):
    for _ in tokenize_content(data):
        pass


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6).map(lambda f: round(f, 3)),
                min_size=1, max_size=12))
def test_tokenizer_number_runs_roundtrip(nums):
    stream = (" ".join(f"{n:.3f}" for n in nums) + " W n").encode()
    got = []
    for kind, val in tokenize_content(stream):
        if kind == "nums":
            got.extend(val)
        elif kind == "num":
            got.append(val)
    assert got == [float(f"{n:.3f}") for n in nums]


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=16), st.binary(max_size=256))
def test_rc4_roundtrip(key, data):
    assert rc4(key, rc4(key, data)) == data


@settings(max_examples=20, deadline=None)
@given(st.integers(-(2**31), 2**31 - 1), st.sampled_from([2, 3]),
       st.binary(min_size=16, max_size=16))
def test_security_handler_u_entry_verifies(p, r, doc_id):
    length = 40 if r == 2 else 128
    o = compute_o(b"owner", b"", r, length)
    key = file_key(b"", o, p, doc_id, r, length)
    u = compute_u(key, doc_id, r)
    # Algorithm 6 check as the handler performs it
    if r == 2:
        assert u == compute_u(key, doc_id, r)
    assert compute_u(key, doc_id, r)[:16] == u[:16]


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("alpha beta gamma delta".split()),
             min_size=1, max_size=6).map(" ".join),
    min_size=2, max_size=10,
))
def test_ngram_model_arpa_roundtrip_property(lines):
    m = NgramModel.train(
        [ln.split() + ["___BREAK___"] for ln in lines], order=3
    )
    m2 = NgramModel.from_arpa(m.to_arpa().splitlines())
    for ctx in [(), ("alpha",), ("alpha", "beta")]:
        for w in ("alpha", "gamma", "___BREAK___", "unseen-token"):
            assert abs(m.logprob(ctx, w) - m2.logprob(ctx, w)) < 1e-5


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("one two three four five".split()),
             min_size=2, max_size=8).map(" ".join),
    min_size=3, max_size=8,
))
def test_scorer_threshold_monotone(lines):
    sc = SentenceJoinScorer.train(lines, order=3)
    score = sc.score("one two", "three four")
    sc.threshold = score + 1.0
    assert sc.should_join("one two", "three four")
    sc.threshold = score - 1.0
    assert not sc.should_join("one two", "three four")


def test_aes_cbc_roundtrip_property():
    """Property: CBC decrypt ∘ encrypt = identity for random keys,
    IVs, and payload lengths (all three key sizes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extract_spark.sources.aes import cbc_decrypt, cbc_encrypt

    @settings(max_examples=40, deadline=None)
    @given(
        key=st.binary(min_size=16, max_size=16)
        | st.binary(min_size=24, max_size=24)
        | st.binary(min_size=32, max_size=32),
        iv=st.binary(min_size=16, max_size=16),
        payload=st.binary(min_size=0, max_size=300),
    )
    def check(key, iv, payload):
        assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, payload)) == payload

    check()


def test_rc4_aes_object_key_determinism():
    """Property: per-object keys are deterministic and distinct across
    object numbers (Algorithm 1 — a collision would decrypt one object
    with another's keystream)."""
    from tests.test_pdfcrypt import DOC_ID, _perm, make_encrypted_pdf
    from pdf_extract_spark.sources.pdfparse import PDFDocument

    pdf = make_encrypted_pdf(4, 4, 128, _perm(3, 5, 12), cfm="AESV2")
    doc = PDFDocument(pdf)
    keys = {doc.crypt.object_key(n, 0) for n in range(1, 40)}
    assert len(keys) == 39
    assert doc.crypt.object_key(7, 0) == doc.crypt.object_key(7, 0)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 14), st.integers(1, 14),
    st.sampled_from([0, 2, 4, 6]),
    st.booleans(),
    st.lists(st.sampled_from([0, 1, 2, 3, 4]), min_size=1, max_size=5),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_property(w, h, color_type, interlaced, filters, rng):
    """Any small image, any color type, any filter mix, interlaced or
    not: PNG encode (test encoder) → parse_png_pixels returns exactly
    the source luma grid."""
    from test_multimodal import TestPngPixelDecode

    from pdf_extract_spark.functions.mediacodec import parse_png_pixels

    pixels = {(r, c): (rng.randrange(256), rng.randrange(256),
                       rng.randrange(256))
              for r in range(h) for c in range(w)}
    png = TestPngPixelDecode._png(
        w, h, lambda r, c: pixels[(r, c)], color_type=color_type,
        row_filters=filters, interlace=1 if interlaced else 0)
    got = parse_png_pixels(png)
    assert got is not None and got[0] == w and got[1] == h
    want = [[
        (lambda p: (p[0] * 299 + p[1] * 587 + p[2] * 114) // 1000
         if color_type != 2 else None)(pixels[(r, c)])
        for c in range(w)] for r in range(h)]
    if color_type == 2:
        want = [[(pixels[(r, c)][0] * 299 + pixels[(r, c)][1] * 587
                  + pixels[(r, c)][2] * 114) // 1000
                 for c in range(w)] for r in range(h)]
    assert got[2] == want


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3), st.integers(1, 3),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_jpeg_roundtrip_property(bw, bh, progressive, rng):
    """Random block-sized images survive the baseline AND progressive
    JPEG round trip within the flat-quantizer error bound."""
    import numpy as np
    from jpeg_encoder import encode_jpeg, encode_jpeg_progressive

    from pdf_extract_spark.functions.jpegdec import decode_jpeg_luma

    w, h = bw * 8 - rng.randrange(0, 3), bh * 8 - rng.randrange(0, 3)
    img = np.array([[rng.randrange(256) for _ in range(w)]
                    for _ in range(h)], dtype=float)
    data = (encode_jpeg_progressive(img) if progressive
            else encode_jpeg(img))
    got = decode_jpeg_luma(data)
    assert got is not None and (got[0], got[1]) == (w, h)
    assert np.abs(np.array(got[2], dtype=float) - img).max() <= 2.0


# ---------------------------------------------------------------------------
# vectorized signature kernel vs the DuckDB oracle fragments
# ---------------------------------------------------------------------------

_token_alpha = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters=" ",
        exclude_categories=("Cs",),  # no lone surrogates
    ),
    min_size=1, max_size=8,
)


@given(st.lists(_token_alpha, min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_sigkernel_matches_duckdb_on_random_unicode(tokens):
    """Property form of the kernel↔oracle equality: for ARBITRARY
    unicode token streams, the numpy kernel's shingle hashes, sizes and
    min-wise values equal the DuckDB HOF fragments bit-for-bit (the
    pair the driver's gate actually compares)."""
    import duckdb

    from pdf_extract_spark.functions import sqlkit as K
    from pdf_extract_spark.functions.sigkernel import batch_signatures

    text = " ".join(tokens)
    sh_lists, n_sh, mh_cols, _ = batch_signatures(
        [text], 3, want_minhash=True, want_simhash=False)

    con = duckdb.connect()
    sh = K.shingle_hashes("text", 3, K.DUCK)
    row = con.execute(
        f"""select {sh} as sh,
                   {K.asize('sh0.sh', K.DUCK)} as n_sh,
                   {K.minhash('sh0.sh', 0, K.DUCK)} as mh0,
                   {K.minhash('sh0.sh', 7, K.DUCK)} as mh7
            from (select ? as text) t,
                 lateral (select {sh} as sh) sh0""",
        [text],
    ).fetchone()
    # sh as a SET: DuckDB's list_distinct does not preserve
    # first-occurrence order (sqlkit's contract: arrays only ever feed
    # order-insensitive reductions). Sizes and min-wise values are
    # exact.
    assert sorted(sh_lists[0]) == sorted(row[0])
    assert len(sh_lists[0]) == len(row[0])  # same dedup, no collisions lost
    assert n_sh[0] == row[1]
    assert int(mh_cols[0][0]) == row[2]
    assert int(mh_cols[7][0]) == row[3]
