"""Unit tests: heuristic language id (functions/langid)."""

from pdf_extract_spark.functions import langid


class TestGate:
    def test_short_line_not_detectable(self):
        assert langid.can_detect("short") is False

    def test_digits_punct_stripped(self):
        assert langid.can_detect("123 456 789 !!! ??? ...") is False

    def test_long_sentence_detectable(self):
        assert langid.can_detect(
            "this is a sentence with more than ten words in it for sure"
        ) is True


class TestDetect:
    def test_english(self):
        assert langid.detect(
            "the quick brown fox jumps over the lazy dog and it was not the end"
        ) == "en"

    def test_spanish(self):
        assert langid.detect(
            "el perro corre por la calle y los gatos duermen en la casa de su amigo"
        ) == "es"

    def test_german(self):
        assert langid.detect(
            "der hund läuft durch die stadt und die katze schläft in dem haus von einem freund"
        ) == "de"

    def test_french(self):
        assert langid.detect(
            "le chien court dans la rue et les chats dorment dans la maison de son ami"
        ) == "fr"

    def test_cyrillic_script(self):
        assert langid.detect("собака бежит по улице и кошки спят в доме") == "ru"

    def test_chinese_script(self):
        assert langid.detect("狗在街上跑猫在房子里睡觉这是一个测试句子") == "zh"

    def test_gibberish_none(self):
        assert langid.detect("zzz qqq xxx vvv kkk jjj www yyy") is None

    def test_reliable_gated(self):
        assert langid.detect_reliable("the cat") is None  # too short


def test_extended_language_coverage():
    from pdf_extract_spark.functions.langid import detect

    cases = {
        "pl": "w tym roku nie było to jednak tak łatwe jak się przez "
              "wiele lat wydawało że jest dla nas",
        "sv": "och det är en av de viktigaste frågorna som vi har att "
              "ta ställning till i år för att",
        "da": "og det er en af de vigtigste ting som vi skal tage "
              "stilling til når vi ikke har et",
        "ro": "în acest an nu a fost la fel de ușor cum se credea că "
              "este pentru noi și pentru care",
        "tr": "bu yıl için en önemli konulardan bir tanesi de bu "
              "olarak daha çok ve ne kadar ile",
        "fi": "ja se on yksi tärkeimmistä asioista joka meidän on "
              "otettava huomioon kun ei ole myös niin",
        "hu": "és ez az egyik legfontosabb kérdés hogy nem csak egy "
              "meg volt ha de el ki mint még",
        "th": "ภาษาไทยเป็นภาษาราชการของประเทศไทยและมีผู้พูดหลายสิบล้านคน",
        "hi": "हिन्दी भारत की आधिकारिक भाषाओं में से एक है और करोड़ों लोग इसे बोलते हैं",
    }
    for lang, text in cases.items():
        assert detect(text) == lang, (lang, detect(text))
