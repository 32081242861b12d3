"""Unit tests: normalize/repair/join/eof rules (functions/textrules)."""

import pandas as pd
import pytest

from pdf_extract_spark.functions.textrules import DEFAULT_CONFIG, RuleSet


@pytest.fixture(scope="module")
def rules():
    return RuleSet()


class TestNormalize:
    def test_ligatures(self, rules):
        assert rules.normalize_str("eﬀort ﬁne ﬂow oﬃce waﬄe") == "effort fine flow office waffle"

    def test_smart_quotes(self, rules):
        assert rules.normalize_str("“quoted” and ’apos’") == '"quoted" and \'apos\''

    def test_ellipsis_dash_nbsp(self, rules):
        assert rules.normalize_str("a… b–c d e") == "a... b-c d e"

    def test_idempotent(self, rules):
        s = "eﬀort “x” … – ﬁn"
        once = rules.normalize_str(s)
        assert rules.normalize_str(once) == once

    def test_series_matches_scalar(self, rules):
        texts = ["eﬀort ﬁne", "“q” – …", "plain"]
        ser = rules.normalize_series(pd.Series(texts))
        assert list(ser) == [rules.normalize_str(t) for t in texts]


class TestRepair:
    def test_space_before_punct(self, rules):
        assert rules.repair_str("word , next ) x ; y") == "word, next) x; y"

    def test_space_after_open(self, rules):
        assert rules.repair_str("a ( b") == "a (b"

    def test_space_before_period(self, rules):
        assert rules.repair_str("end . Next") == "end. Next"

    def test_dot_sequences(self, rules):
        # ([^.])\s(\.) is single-pass: only the first gap closes
        assert rules.repair_str("a . . .") == "a. . ."
        assert rules.repair_str("wait ...") == "wait..."


class TestJoinRules:
    def test_trailing_comma_joins(self, rules):
        assert rules.join_char("ends with,", "anything") == " "

    def test_hyphen_join_lowercase(self, rules):
        assert rules.join_char("hyphen-", "ated word") == ""

    def test_lowercase_continuation(self, rules):
        assert rules.join_char("ends lower", "case start") == " "

    def test_no_join_upper_after_period(self, rules):
        assert rules.join_char("Ends.", "Next") is None


class TestAbsoluteEof:
    def test_sentence_end_then_capital(self, rules):
        assert rules.is_absolute_eof("A sentence end", "Next sentence") is True

    def test_question_mark(self, rules):
        assert rules.is_absolute_eof("Really?", "yes") is True

    def test_word_period(self, rules):
        assert rules.is_absolute_eof("the end.", "and then") is True

    def test_bullet_start(self, rules):
        assert rules.is_absolute_eof("anything", "• bullet item") is True

    def test_comma_not_eof(self, rules):
        assert rules.is_absolute_eof("ends with,", "lower continuation") is False


class TestConfig:
    def test_custom_language_rules(self):
        cfg = {
            "languages": {
                "common": DEFAULT_CONFIG["languages"]["common"],
                "de": {"normalize": [["ß", "ss"]], "join_words": [],
                        "absolute_eof": [], "repair": []},
            }
        }
        rs = RuleSet(cfg)
        assert rs.normalize_str("straße", "de") == "strasse"
        assert rs.normalize_str("straße", "en") == "straße"


class TestReferenceConfigCompat:
    """RuleSet must consume the reference's SHIPPED PDFExtract.json
    verbatim: its {language:[{name,config}]} shape (Config.java:95-145),
    Java variable-width lookbehind alternations, and $1 replacement
    group refs."""

    REF_CONFIG = "/root/reference/PDFExtract.json"

    @pytest.fixture(scope="class")
    def ref_rules(self):
        import os

        from pdf_extract_spark.functions.textrules import RuleSet

        if not os.path.exists(self.REF_CONFIG):
            pytest.skip("reference config unavailable")
        return RuleSet.from_json(self.REF_CONFIG)

    def test_loads_both_languages(self, ref_rules):
        assert "common" in ref_rules.langs
        assert "en" in ref_rules.langs
        assert ref_rules.sj_models.get("en") == "/home/usr/models/toy-model"

    def test_normalize_ligatures(self, ref_rules):
        assert ref_rules.normalize_str("eﬀort oﬃce ﬁt") == "effort office fit"

    def test_repair_dollar_groups(self, ref_rules):
        # '$1' backrefs: strip space before , ) ] ; and before final .
        assert ref_rules.repair_str("word , next") == "word, next"
        assert ref_rules.repair_str("end .") == "end."

    def test_variable_width_lookbehind_eof(self, ref_rules):
        # rule 1: front must NOT end with , & ; : or space+capital
        assert ref_rules.is_absolute_eof("A sentence end", "Next line starts")
        assert not ref_rules.is_absolute_eof("ends with,", "Next line")
        assert not ref_rules.is_absolute_eof("initial A", "Next line")

    def test_join_cascade_same_as_default(self, ref_rules):
        # hyphen-split lowercase word joins with '' (rule 2)
        assert ref_rules.join_char("broken exam-", "ple word") == ""
        # trailing comma joins with ' ' (rule 1)
        assert ref_rules.join_char("a, b,", "c d") == " "


def test_positive_lookbehind_alternation_rejected():
    """(?<=a|bb) must NOT be split into consecutive lookbehinds (that
    would turn OR into AND) — it raises a clear unsupported error."""
    import pytest

    from pdf_extract_spark.functions.textrules import compile_compat

    # negative form still rewrites fine
    assert compile_compat(r"(?<!\,|\s[A-Z]{1,1})x").search("ax")
    with pytest.raises(ValueError, match="positive lookbehind"):
        compile_compat(r"(?<=foo|barbaz)x")
