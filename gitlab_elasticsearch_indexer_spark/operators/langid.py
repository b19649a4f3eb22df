"""Language identification — character-script gates + Cavnar–Trenkle-style
trigram profiles (reference analog: go-enry detection by filename+content,
indexer/blob.go:116-127; the input_hint's ``lang`` column carries upstream
truth when present, this operator recomputes it from content).

Two stages, both deterministic:

1. **Script gate** (pure unicode ranges): Han → zh (→ ja when kana present,
   → ko when hangul present), Cyrillic → ru, Arabic → ar, Greek → el — a
   script is near-conclusive and needs no statistics.
2. **Trigram profiles** for Latin-script languages: per-language profiles
   are built AT IMPORT from embedded sample paragraphs (normalized trigram
   frequencies); detection scores cosine similarity of the document's
   trigram vector against each profile.

Runs as one Arrow-batched pandas UDF (the same boundary as the analyzer
chains); a confidence below ``min_confidence`` falls back to 'und' rather
than guessing — the conservative choice for a training-data filter.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SAMPLES = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it was the best "
        "of times it was the worst of times a tale of two cities begins with "
        "this sentence which every english reader knows and the people would "
        "have been there for the first time in many years with all of their "
        "friends and family around them during the long summer evenings"
            " she did not know what to say about it because there were so many things that could have happened and nobody wanted to talk about them"
    ),
    "es": (
        "en un lugar de la mancha de cuyo nombre no quiero acordarme no ha "
        "mucho tiempo que vivia un hidalgo de los de lanza en astillero adarga "
        "antigua rocin flaco y galgo corredor una olla de algo mas vaca que "
        "carnero salpicon las mas noches duelos y quebrantos los sabados "
        "lentejas los viernes algun palomino de anadidura los domingos"
            " el nino y la nina estaban en la casa con el perro y el gato porque no querian salir a la calle cuando llovia y el cielo estaba muy oscuro pero la madre les dijo que tenian que ir a la escuela con los libros y los cuadernos para aprender las cosas que el maestro les iba a ensenar durante el dia"
    ),
    "de": (
        "als gregor samsa eines morgens aus unruhigen traumen erwachte fand er "
        "sich in seinem bett zu einem ungeheueren ungeziefer verwandelt er lag "
        "auf seinem panzerartig harten rucken und sah wenn er den kopf ein "
        "wenig hob seinen gewolbten braunen von bogenformigen versteifungen "
        "geteilten bauch auf dessen hohe sich die bettdecke kaum noch erhalten "
        "konnte und die vielen beine flimmerten ihm hilflos vor den augen"
            " der mann und die frau gingen mit dem hund durch den wald und uber die brucke weil sie nicht wussten wo sie waren und das wetter wurde immer schlechter"
    ),
    "fr": (
        "longtemps je me suis couche de bonne heure parfois a peine ma bougie "
        "eteinte mes yeux se fermaient si vite que je n'avais pas le temps de "
        "me dire je m'endors et une demi heure apres la pensee qu'il etait "
        "temps de chercher le sommeil m'eveillait je voulais poser le volume "
        "que je croyais avoir encore dans les mains et souffler ma lumiere"
            " le garcon et la fille etaient dans la maison avec le chien et le chat parce qu'ils ne voulaient pas sortir dans la rue quand il pleuvait et que le ciel etait sombre"
    ),
    "it": (
        "nel mezzo del cammin di nostra vita mi ritrovai per una selva oscura "
        "che la diritta via era smarrita ahi quanto a dir qual era e cosa dura "
        "esta selva selvaggia e aspra e forte che nel pensier rinova la paura "
        "tanto e amara che poco e piu morte ma per trattar del ben ch'io vi "
        "trovai diro de l'altre cose ch'i v'ho scorte"
            " il ragazzo e la ragazza erano nella casa con il cane e il gatto perche non volevano uscire nella strada quando pioveva e il cielo era molto scuro ma la madre disse che dovevano andare alla scuola con i libri e i quaderni per imparare le cose che il maestro gli avrebbe insegnato durante il giorno della settimana"
    ),
    "pt": (
        "no meio do caminho tinha uma pedra tinha uma pedra no meio do caminho "
        "nunca me esquecerei desse acontecimento na vida de minhas retinas tao "
        "fatigadas nunca me esquecerei que no meio do caminho tinha uma pedra "
        "havia muitas outras coisas para fazer naquele dia mas as pessoas nao "
        "queriam saber de nada alem das suas proprias vidas e dos seus sonhos"
            " o menino e a menina estavam na casa com o cachorro e o gato porque nao queriam sair para a rua quando chovia e o ceu estava muito escuro"
    ),
    "nl": (
        "in het begin was er niets dan water en duisternis over de diepte en "
        "de mensen wisten niet wat er zou gebeuren in de komende jaren want "
        "het leven was moeilijk en de winters waren lang en koud maar zij "
        "bleven werken op het land en in de steden waar de grachten door de "
        "oude straten liepen en de huizen dicht op elkaar stonden"
            " de jongen en het meisje waren in het huis met de hond en de kat omdat ze niet naar buiten wilden gaan als het regende en de lucht donker was"
    ),
}

_TRI_RE = re.compile(r"[a-z ]")


def _trigram_profile(text: str) -> dict[str, float]:
    t = " " + "".join(_TRI_RE.findall(text.lower())) + " "
    c = Counter(t[i : i + 3] for i in range(len(t) - 2))
    norm = math.sqrt(sum(v * v for v in c.values())) or 1.0
    return {g: v / norm for g, v in c.items()}


_PROFILES = {lang: _trigram_profile(s) for lang, s in _SAMPLES.items()}

_HAN = re.compile(r"[一-鿿]")
_KANA = re.compile(r"[぀-ヿ]")
_HANGUL = re.compile(r"[가-힯]")
_CYRILLIC = re.compile(r"[Ѐ-ӿ]")
_ARABIC = re.compile(r"[؀-ۿ]")
_GREEK = re.compile(r"[Ͱ-Ͽ]")


def detect_language(text: str, min_confidence: float = 0.15) -> tuple[str, float]:
    """→ (lang, confidence).  Deterministic; 'und' when nothing is
    confident enough."""
    if not text:
        return "und", 0.0
    sample = text[:4000]
    if _KANA.search(sample):
        return "ja", 1.0
    if _HANGUL.search(sample):
        return "ko", 1.0
    if _HAN.search(sample):
        return "zh", 1.0
    if _CYRILLIC.search(sample):
        return "ru", 1.0
    if _ARABIC.search(sample):
        return "ar", 1.0
    if _GREEK.search(sample):
        return "el", 1.0
    doc = _trigram_profile(sample)
    best_lang, best = "und", 0.0
    for lang, prof in _PROFILES.items():
        # cosine: both vectors are L2-normalized already
        s = sum(w * prof.get(g, 0.0) for g, w in doc.items())
        if s > best:
            best_lang, best = lang, s
    if best < min_confidence:
        return "und", best
    return best_lang, best


def language_id_ngram(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_confidence: float = 0.15,
) -> DataFrame:
    """(docid, pred_lang, confidence) via the trigram-profile detector —
    one Arrow-batched pandas UDF, profile lookups only (no model files)."""
    schema = T.StructType(
        [
            T.StructField("pred_lang", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def detect_udf(texts: pd.Series) -> pd.DataFrame:
        out = [detect_language(t or "", min_confidence) for t in texts]
        return pd.DataFrame(out, columns=["pred_lang", "confidence"])

    return df.select(
        F.col(id_col).cast("long").alias("docid"),
        detect_udf(F.col(text_col)).alias("d"),
    ).select(
        "docid",
        F.col("d.pred_lang").alias("pred_lang"),
        F.round(F.col("d.confidence"), 4).alias("confidence"),
    )
