"""W4 sentence join: pure-Python n-gram scorer (functions/sentencejoin)
vs the reference's KenLM-backed sentence-join.py semantics."""

import base64

import pytest

from pdf_extract_spark.functions.sentencejoin import (
    BREAK,
    NgramModel,
    SentenceJoinScorer,
    corpus_blocks,
    first_words,
    last_words,
)

CORPUS = ["the quick brown fox jumps over the lazy dog"] * 50


@pytest.fixture(scope="module")
def scorer():
    return SentenceJoinScorer.train(CORPUS)


def test_corpus_blocks_break_tokens_and_reversal():
    blocks = corpus_blocks(["a b c", "d e"])
    assert blocks == [["a", "b", "c", BREAK, "d", "e", BREAK]]
    rev = corpus_blocks(["a b c", "d e"], reverse=True)
    assert rev == [[BREAK, "e", "d", BREAK, "c", "b", "a"]]
    # 100-word block cut (sentence-join.py:47)
    big = corpus_blocks(["w" for _ in range(250)])
    assert [len(b) for b in big[:-1]] == [100, 100, 100, 100]


def test_model_is_a_distribution(scorer):
    m = scorer.forward
    # unigram mass ≈ 1 (Witten-Bell holds back a sliver for <unk>)
    uni = sum(10 ** lp for (_,), (lp, _) in m.ngrams[1].items())
    assert 0.95 < uni <= 1.0001
    # conditional mass given a seen 4-gram context ≈ 1
    ctx = ("the", "quick", "brown", "fox")
    vocab = [w for (w,) in m.ngrams[1] if w != "<unk>"]
    assert sum(10 ** m.logprob(ctx, w) for w in vocab) == pytest.approx(1.0, abs=1e-6)


def test_arpa_round_trip(scorer):
    m = scorer.forward
    m2 = NgramModel.from_arpa(m.to_arpa().splitlines())
    for ctx, w in [
        (("the", "quick", "brown", "fox"), "jumps"),
        (("the", "quick", "brown", "fox"), BREAK),
        (("over", "the", "lazy", "dog"), BREAK),
        (("never", "seen", "context", "words"), "dog"),
    ]:
        assert m2.logprob(ctx, w) == pytest.approx(m.logprob(ctx, w), abs=1e-6)


def test_join_decision(scorer):
    # mid-sentence split: break token never follows this context → join
    assert scorer.score("the quick brown fox", "jumps over the lazy dog") < 0
    assert scorer.should_join_texts("the quick brown fox", "jumps over the lazy dog")
    # true line boundary: break is the modal continuation → no join
    assert scorer.score("jumps over the lazy dog", "the quick brown fox") > 7.0
    assert not scorer.should_join_texts("jumps over the lazy dog", "the quick brown fox")


def test_java_wrapper_skip_rules(scorer):
    # PDFExtract.java:1769-1772: left ending '.' or right starting '•' skip
    assert not scorer.should_join_texts("the quick brown fox.", "jumps over")
    assert not scorer.should_join_texts("the quick brown fox", "• jumps over")
    assert not scorer.should_join_texts("", "jumps over")
    assert not scorer.should_join_texts("the quick brown fox", "")


def test_context_trimming():
    # getFirstWords/getLastWords keep ≤6 words (maxWordsJoin=5, inclusive
    # loops — PDFExtract.java:1671-1699)
    s = "one two three four five six seven eight"
    assert first_words(s) == "one two three four five six"
    assert last_words(s) == "three four five six seven eight"
    assert first_words("a b") == "a b"
    assert last_words("a b") == "a b"


def _two_line_pdf(line1: str, line2: str) -> bytes:
    parts = ["BT", "/F1 12 Tf", "72 700 Td", f"({line1}) Tj",
             "0 -14 Td", f"({line2}) Tj", "ET"]
    stream = "\n".join(parts).encode("latin-1")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>",
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /Name /F1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref}\n%%EOF\n").encode()
    return bytes(buf)


UPPER = ["THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"] * 50


def test_extract_pdf_w4_joins_what_w3_cannot():
    """Uppercase continuation lines defeat every W3 join rule (they all
    key on lowercase/punctuation) and trip absolute_eof — only the W4
    model can join them."""
    from pdf_extract_spark.operators.extract import extract_pdf

    pdf = _two_line_pdf("THE QUICK BROWN FOX", "JUMPS OVER THE LAZY DOG")
    plain = extract_pdf(pdf)
    texts = [t for k, t, _, _ in plain.spans if k == "text"]
    assert texts == ["THE QUICK BROWN FOX", "JUMPS OVER THE LAZY DOG"]

    sc = SentenceJoinScorer.train(UPPER)
    joined = extract_pdf(pdf, sj_scorer=sc)
    jtexts = [t for k, t, _, _ in joined.spans if k == "text"]
    assert jtexts == ["THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"]


def test_pipeline_sj_model_prefix_and_missing(spark, tmp_path):
    from pdf_extract_spark.plans.pipeline import extract_spans

    sc = SentenceJoinScorer.train(UPPER)
    prefix = str(tmp_path / "sj")
    sc.save_arpa(prefix)
    (tmp_path / "sj.threshold").write_text("0.9 7.0\n")

    pdf64 = base64.b64encode(
        _two_line_pdf("THE QUICK BROWN FOX", "JUMPS OVER THE LAZY DOG")
    ).decode()
    df = spark.createDataFrame(
        [("d0", [{"kind": "pdf", "text": pdf64, "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = extract_spans(df, sj_model=prefix).collect()[0]
    assert [s["text"] for s in out["spans"]] == [
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"
    ]
    assert out["error"] is None

    # unreadable model prefix → per-doc warning, stage skipped
    # (reference model-missing behavior, PDFExtract.java:1299-1324)
    out2 = extract_spans(df, sj_model=str(tmp_path / "nope")).collect()[0]
    assert [s["text"] for s in out2["spans"]] == [
        "THE QUICK BROWN FOX", "JUMPS OVER THE LAZY DOG"
    ]
    assert any(w["method"] == "sentencejoin" for w in out2["warnings"])


def test_tune_threshold_separates_perfectly(scorer):
    from pdf_extract_spark.functions.sentencejoin import tune_threshold

    t, f = tune_threshold(scorer, CORPUS[:10])
    # toy corpus: break (+10.3) and mid-sentence (−15.7) scores are
    # perfectly separable → near-perfect F at a threshold between them
    assert f > 0.9
    assert -15.0 < t < 10.0


def test_train_tune_apply_cli(tmp_path, monkeypatch, capsys):
    import io

    from scripts.train_sentencejoin import main

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(CORPUS) + "\n", encoding="utf-8")
    model = str(tmp_path / "m")

    main(["--train", "--model", model, "--text", str(corpus)])
    assert (tmp_path / "m.forward.lm").exists()
    assert (tmp_path / "m.backward.lm").exists()

    main(["--tune", "--model", model, "--dev", str(corpus)])
    assert (tmp_path / "m.threshold").exists()

    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO("the quick brown fox\tjumps over the lazy dog\n"
                    "jumps over the lazy dog\tthe quick brown fox\n"
                    "malformed-no-tab\n"),
    )
    capsys.readouterr()
    main(["--apply", "--model", model])
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["True", "False", "Invalid input"]


def test_config_declared_per_language_models(spark, tmp_path):
    """X2 parity: sentencejoin_model paths declared in the rule config
    auto-load per executor, keyed by language (doc lang, 'common'
    fallback)."""
    import copy

    from pdf_extract_spark.functions.textrules import DEFAULT_CONFIG
    from pdf_extract_spark.plans.pipeline import extract_spans

    prefix = str(tmp_path / "cm")
    SentenceJoinScorer.train(UPPER).save_arpa(prefix)
    cfg = copy.deepcopy(DEFAULT_CONFIG)
    cfg["languages"]["common"]["sentencejoin_model"] = prefix

    pdf64 = base64.b64encode(
        _two_line_pdf("THE QUICK BROWN FOX", "JUMPS OVER THE LAZY DOG")
    ).decode()
    df = spark.createDataFrame(
        [("d0", [{"kind": "pdf", "text": pdf64, "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = extract_spans(df, config=cfg).collect()[0]
    assert [s["text"] for s in out["spans"]] == [
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"
    ]


class TestBinaryInterop:
    """Round-trip: ARPA pair ↔ single-file binary .blm (VERDICT r1 item
    9 — the kenlm build_binary role, sentence-join.py:64-70)."""

    def _scorer(self):
        from pdf_extract_spark.functions.sentencejoin import SentenceJoinScorer

        lines = [
            "the quick brown fox jumps over the lazy dog",
            "a stitch in time saves nine every single day",
            "the dog sleeps while the fox runs far away",
        ] * 5
        return SentenceJoinScorer.train(lines, order=3)

    def test_roundtrip_identical_scores(self, tmp_path):
        from pdf_extract_spark.functions.sentencejoin import SentenceJoinScorer

        sc = self._scorer()
        path = str(tmp_path / "model.blm")
        sc.save_binary(path)
        sc2 = SentenceJoinScorer.from_binary(path)
        assert sc2.threshold == sc.threshold
        for n in range(1, sc.forward.order + 1):
            assert sc2.forward.ngrams[n] == sc.forward.ngrams[n]
            assert sc2.backward.ngrams[n] == sc.backward.ngrams[n]
        pair = ("the quick brown fox", "jumps over the dog")
        assert sc2.score(*pair) == sc.score(*pair)

    def test_load_dispatch(self, tmp_path):
        from pdf_extract_spark.functions.sentencejoin import SentenceJoinScorer

        sc = self._scorer()
        sc.save_arpa(str(tmp_path / "m"))
        sc.save_binary(str(tmp_path / "m.blm"))
        via_arpa = SentenceJoinScorer.load(str(tmp_path / "m"))
        via_blm = SentenceJoinScorer.load(str(tmp_path / "m.blm"))
        pair = ("one two three four", "five six seven eight")
        # binary preserves exact float64; ARPA text rounds to 7 decimals
        assert via_blm.score(*pair) == sc.score(*pair)
        assert abs(via_arpa.score(*pair) - sc.score(*pair)) < 1e-5

    def test_convert_cli(self, tmp_path):
        import subprocess
        import sys

        from pdf_extract_spark.functions.sentencejoin import SentenceJoinScorer

        sc = self._scorer()
        prefix = str(tmp_path / "m")
        sc.save_arpa(prefix)
        out = subprocess.run(
            [sys.executable, "scripts/train_sentencejoin.py",
             "--convert", "--model", prefix],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr
        blm = SentenceJoinScorer.from_binary(prefix + ".blm")
        # ARPA text round-trips at 7 decimals; binary must match the
        # reloaded-ARPA scorer exactly
        ref = SentenceJoinScorer.from_arpa(prefix)
        pair = ("the quick brown fox", "jumps over the dog")
        assert blm.score(*pair) == ref.score(*pair)

    def test_corrupt_binary_rejected(self, tmp_path):
        import pytest

        from pdf_extract_spark.functions.sentencejoin import SentenceJoinScorer

        p = tmp_path / "junk.blm"
        p.write_bytes(b"NOTAMODEL" + b"\x00" * 64)
        with pytest.raises(ValueError):
            SentenceJoinScorer.from_binary(str(p))


def test_pipeline_sj_model_blm(spark, tmp_path):
    """The Spark pipeline loads a binary .blm model end-to-end (same
    join decisions as the ARPA pair it was packed from)."""
    from pdf_extract_spark.plans.pipeline import extract_spans

    sc = SentenceJoinScorer.train(UPPER)
    blm = str(tmp_path / "sj.blm")
    sc.save_binary(blm)

    pdf64 = base64.b64encode(
        _two_line_pdf("THE QUICK BROWN FOX", "JUMPS OVER THE LAZY DOG")
    ).decode()
    df = spark.createDataFrame(
        [("d0", [{"kind": "pdf", "text": pdf64, "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = extract_spans(df, sj_model=blm).collect()[0]
    assert [s["text"] for s in out["spans"]] == [
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"
    ]
    assert out["error"] is None
