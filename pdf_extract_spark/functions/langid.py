"""Heuristic language identification (cld3 replacement).

The reference calls the cld3 neural net over JNI per line
(DetectLanguage.java:22, gated by canDetectLang PDFExtract.java:1613-1630).
We replace it with a deterministic stopword + character-profile scorer —
pure Python/pandas, broadcast-friendly, no native deps. Accuracy is lower
than cld3 but deterministic and adequate for doc-majority voting (A3).
"""

from __future__ import annotations

import re

# Top-frequency function words per language (public linguistic knowledge).
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is was for that it with as on be at by this have "
        "from are or an but not they his which has had were their more will "
        "would been its all there one when who also your can".split()
    ),
    "es": frozenset(
        "de la que el en y los del se las por un para con una su al es lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy sin "
        "sobre también me hasta hay donde quien desde todo nos".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans par plus "
        "pas au sur ne se ce il sont son avec ou mais nous comme cette aux "
        "être ses était sans leur elle même tout".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach wird "
        "bei einer um am sind noch wie einem über einen so zum war".split()
    ),
    "it": frozenset(
        "di e il la che in a per è un sono della le con non una dei si "
        "nel alla lo gli più come dal delle questo hanno quando anche ma "
        "loro nella tra sua suo può".split()
    ),
    "pt": frozenset(
        "de a o que e do da em um para é com não uma os no se na por mais "
        "as dos como mas foi ao ele das tem à seu sua ou ser quando muito "
        "há nos já está eu também só pelo pela até isso".split()
    ),
    "nl": frozenset(
        "de het een van en in is dat op te zijn met voor niet aan er ook "
        "als bij maar om uit dan zij nog naar dit wel worden door over ze "
        "tot je mijn kan geen wordt".split()
    ),
    "pl": frozenset(
        "w i na się nie z do to że jest jak przez dla od po przy za o ale "
        "czy tak jego być już tylko co ich może został która które tym był "
        "oraz przed także więc jednak".split()
    ),
    "sv": frozenset(
        "och i att det som en på är av för med till den har de inte om ett "
        "han var men sig från vi så kan man när år under också eller sin "
        "efter vid mot skulle kommer".split()
    ),
    "da": frozenset(
        "og i at det er en til af på de med den for som der har ikke et "
        "var han men sig fra vi så kan man når også eller sin efter ved "
        "skal blev bliver hvor".split()
    ),
    "ro": frozenset(
        "de la a în și cu pentru pe este care nu mai se din sau ca fi fost "
        "dar au prin despre între acest această după fiind lor dacă unei "
        "unui către sunt era fie".split()
    ),
    "cs": frozenset(
        "a se na v je že o s z do k i ale po jako za být byl jsou bylo "
        "tak jeho její při před této který která které však pro od nebo "
        "podle již může".split()
    ),
    "tr": frozenset(
        "ve bir bu da de için ile olarak daha gibi çok en ne kadar sonra "
        "ancak olan her ise var yok ama veya bu nun ki diye göre arasında "
        "üzerine kendi olduğu".split()
    ),
    "fi": frozenset(
        "ja on ei se että oli hän mutta ovat kun myös niin jos tai sen "
        "joka ole kuin mukaan vuonna jo vain sitä tämä hänen olla voi "
        "kanssa sekä jotka".split()
    ),
    "hu": frozenset(
        "a az és hogy nem is egy meg volt ha de el ki mint még csak már "
        "vagy fel le be ezt arra ezek azok pedig után előtt között által "
        "ennek annak lehet".split()
    ),
}

# scripts that decide without stopwords
_SCRIPT_RANGES = [
    ("zh", re.compile(r"[\u4e00-\u9fff]")),
    ("ja", re.compile(r"[\u3040-\u30ff]")),
    ("ko", re.compile(r"[\uac00-\ud7af]")),
    ("ru", re.compile(r"[\u0400-\u04ff]")),
    ("ar", re.compile(r"[\u0600-\u06ff]")),
    ("el", re.compile(r"[\u0370-\u03ff]")),
    ("he", re.compile(r"[\u0590-\u05ff]")),
    ("th", re.compile(r"[\u0e00-\u0e7f]")),
    ("hi", re.compile(r"[\u0900-\u097f]")),
]

_STRIP_RE = re.compile(r"[0-9\"'\\.,:;!?()\[\]{}&%#@*/+=<>|~^$_-]+")
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def can_detect(text: str) -> bool:
    """Reference gate: strip digits/punct; detect only if >10 words or
    >30 chars (canDetectLang PDFExtract.java:1613-1630)."""
    clean = _STRIP_RE.sub(" ", text or "")
    words = clean.split()
    return len(words) > 10 or len("".join(words)) > 30


def detect(text: str) -> str | None:
    """Best-guess ISO 639-1 code, or None when undecidable."""
    if not text:
        return None
    sample = text[:4000]
    non_space = max(1, len(sample.replace(" ", "")))
    for code, pat in _SCRIPT_RANGES:
        hits = len(pat.findall(sample))
        if hits * 3 >= non_space:  # ≥⅓ of chars in the script
            return code
    words = [w.lower() for w in _WORD_RE.findall(sample)]
    if not words:
        return None
    best_lang, best_hits = None, 0
    for lang, sw in _STOPWORDS.items():
        hits = sum(1 for w in words if w in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_lang is not None and best_hits * 12 >= len(words):  # ≥1/12 stopword density
        return best_lang
    return None


def detect_reliable(text: str) -> str | None:
    """Detection gated like the reference: only on detectable lines."""
    if not can_detect(text):
        return None
    return detect(text)
