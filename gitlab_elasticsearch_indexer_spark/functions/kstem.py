"""KStem (Krovetz) stemmer — the algorithm behind Lucene's KStemFilter,
which is what Elasticsearch's ``light_english`` stemmer token filter
resolves to (reference mapping: elastic/index.go:14-17,29-36).

Re-implemented from the published algorithm (R. Krovetz, "Viewing
Morphology as an Inference Process", SIGIR 1993; the Lucene/CIIR KStem
derivative is BSD-licensed): inflectional suffixes (plural, past tense,
progressive aspect) are removed with dictionary consultation for
exceptional forms, and derivational endings (-ity -ness -ion -er -ly -al
-ive -ize -ment -ble -ism -ic -ncy) are stripped ONLY when the resulting
stem is a dictionary headword — the defining property that makes KStem far
more conservative (and rank-stable) than Porter-family stemmers.

Divergence, documented: Lucene ships a ~30k-headword lexicon
(KStemData1-8); this module packages a curated lexicon of comparable
scope (~30k headwords as of round 4 — the exact count is ``len(_DICT)``
and is hashed into the catalog's analyzer-version fingerprint) and the
same conservative fallbacks.  Consequences:

- words COVERED by the embedded lexicon stem identically to Lucene KStem
  (golden-tested in tests/test_functions.py);
- out-of-vocabulary words receive only the default inflectional strips
  (plural -s/-es/-ies, -ed, -ing with undoubling) and NO derivational
  change — the same "no evidence → no change" behavior KStem itself shows
  for words outside its lexicon, so ranking degrades gracefully rather
  than wrongly;
- a larger lexicon can be supplied via ``load_lexicon`` without touching
  the rule engine.
"""

from __future__ import annotations

MAX_WORD_LEN = 50

# ---------------------------------------------------------------------------
# Direct conflations: irregular forms mapped straight to their lemma
# (KStem's directConflations / exceptionWords analog).
# ---------------------------------------------------------------------------
_DIRECT: dict[str, str] = {
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "oxen": "ox",
    "people": "people", "lives": "life", "wives": "wife", "knives": "knife",
    "leaves": "leaf", "loaves": "loaf", "halves": "half", "selves": "self",
    "shelves": "shelf", "thieves": "thief", "wolves": "wolf",
    "calves": "calf", "elves": "elf", "scarves": "scarf",
    "dying": "die", "lying": "lie", "tying": "tie", "aging": "age",
    "goes": "go", "going": "go", "doing": "do", "being": "be",
    "having": "have", "making": "make", "taking": "take", "using": "use",
    "was": "was", "is": "is", "has": "has", "this": "this", "its": "its",
}

# ---------------------------------------------------------------------------
# Lexicon: curated common-English headwords, packaged as DATA
# (kstem_lexicon.txt, one word per line) rather than source lines — the
# Lucene-parity path is loading a bigger published list (KStemData1-8, BSD)
# through the same file format / ``load_lexicon`` hook, not growing Python
# literals.  Loaded via importlib.resources so it works identically from a
# checkout and from the addPyFile'd package zip on executors.
# ---------------------------------------------------------------------------
def _load_packaged_lexicon() -> set[str]:
    from importlib import resources

    text = resources.files(__package__).joinpath("kstem_lexicon.txt").read_text()
    return {w for w in text.split() if w}


_DICT: set[str] = _load_packaged_lexicon()


def load_lexicon(words) -> None:
    """Merge additional headwords (e.g. a full KStem lexicon file) into the
    dictionary at runtime.  Refreshes the content-derived analyzer version
    so the catalog guard sees the mutated lexicon, not the import-time
    fingerprint (a stale fingerprint would let a mismatched index search
    silently)."""
    _DICT.update(w.strip().lower() for w in words if w.strip())
    _cache.clear()
    from . import analysis

    analysis.refresh_analyzer_versions()


def _in_dict(w: str) -> bool:
    return w in _DICT


_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _plural(w: str) -> str:
    """-s / -es / -ies removal (inflectional: applied even without
    dictionary evidence, like KStem, with dictionary tie-breaks)."""
    if not w.endswith("s") or len(w) < 4:
        return w
    if w.endswith(("ss", "us", "is")):
        return w
    if w.endswith("ies"):
        y = w[:-3] + "y"
        if _in_dict(y):
            return y
        ie = w[:-3] + "ie"
        return ie if _in_dict(ie) else y
    if w.endswith("es"):
        c1, c2 = w[:-1], w[:-2]
        if _in_dict(c1):
            return c1
        if _in_dict(c2):
            return c2
        if w.endswith(("sses", "ches", "shes", "xes", "zes", "oes")):
            return c2
        return c1
    return w[:-1]


def _past_tense(w: str) -> str:
    """-ed removal: dictionary-driven e-restoration and undoubling; no
    evidence → original kept (KStem conservatism)."""
    if not w.endswith("ed") or len(w) < 5:
        return w
    if w.endswith("ied"):
        y = w[:-3] + "y"
        return y if _in_dict(y) or not _in_dict(w[:-3] + "ie") else w[:-3] + "ie"
    root = w[:-2]
    if len(root) > 2 and root[-1] == root[-2] and _is_cons(root, len(root) - 1):
        # doubled final consonant signals a short-vowel stem: hopped -> hop
        und = root[:-1]
        if _in_dict(und):
            return und
        if _in_dict(root):
            return root  # passed -> pass
        return w
    # single final consonant: the e-restored form wins when both exist
    # (hoped -> hope, not hop)
    if _in_dict(w[:-1]):
        return w[:-1]  # agreed -> agree, hoped -> hope
    if _in_dict(root):
        return root  # walked -> walk
    return w


def _aspect(w: str) -> str:
    """-ing removal: dictionary-driven e-restoration and undoubling; the
    default (no evidence) strips the suffix — progressive forms are pure
    inflection."""
    if not w.endswith("ing") or len(w) < 6:
        return w
    root = w[:-3]
    if len(root) > 2 and root[-1] == root[-2] and _is_cons(root, len(root) - 1):
        # doubled final consonant: running -> run
        und = root[:-1]
        if _in_dict(und):
            return und
        return root  # telling -> tell (undoubled 'tel' unknown)
    # single final consonant: e-restored form wins when both exist
    # (hoping -> hope, not hop)
    if _in_dict(root + "e"):
        return root + "e"  # hoping -> hope, charging -> charge
    return root  # talking -> talk; OOV default strips the pure inflection


# --- derivational endings: fire ONLY with dictionary evidence --------------
def _ity(w: str) -> str:
    if not w.endswith("ity") or len(w) < 6:
        return w
    if w.endswith(("ability", "ibility")) and _in_dict(w[:-5] + "le"):
        return w[:-5] + "le"  # ability -> able, possibility -> possible
    root = w[:-3]
    if _in_dict(root):
        return root  # formality -> formal (via 'formal' lookup path)
    if _in_dict(root + "e"):
        return root + "e"  # purity -> pure, activity -> active
    return w


def _ness(w: str) -> str:
    if not w.endswith("ness") or len(w) < 7:
        return w
    if w.endswith("iness") and _in_dict(w[:-5] + "y"):
        return w[:-5] + "y"  # happiness -> happy
    root = w[:-4]
    return root if _in_dict(root) else w  # darkness -> dark


def _ion(w: str) -> str:
    if not w.endswith("ion") or len(w) < 7:
        return w
    if w.endswith("ization") and _in_dict(w[:-7] + "ize"):
        return w[:-7] + "ize"  # organization -> organize
    if w.endswith("ation"):
        if _in_dict(w[:-5] + "ate"):
            return w[:-5] + "ate"  # creation -> create? (via 'create': see below)
        if _in_dict(w[:-5] + "e"):
            return w[:-5] + "e"  # combination -> combine
        if _in_dict(w[:-5]):
            return w[:-5]  # transformation -> transform
    root = w[:-3]
    if _in_dict(root):
        return root  # production -> product? (root 'product')
    if _in_dict(root + "e"):
        return root + "e"
    return w


def _er_or(w: str) -> str:
    if len(w) < 6 or not (w.endswith("er") or w.endswith("or")):
        return w
    if w.endswith("izer") and _in_dict(w[:-1]):
        return w[:-1]
    if w.endswith("ier") and _in_dict(w[:-3] + "y"):
        return w[:-3] + "y"  # carrier -> carry
    root = w[:-2]
    if _in_dict(root):
        return root  # teacher -> teach? (if in dict)
    if _in_dict(root + "e"):
        return root + "e"  # writer -> write
    if len(root) > 2 and root[-1] == root[-2] and _is_cons(root, len(root) - 1):
        und = root[:-1]
        if _in_dict(und):
            return und  # runner -> run
    return w


def _ly(w: str) -> str:
    if not w.endswith("ly") or len(w) < 5:
        return w
    if w.endswith("ily") and _in_dict(w[:-3] + "y"):
        return w[:-3] + "y"  # happily -> happy
    if w.endswith("bly") and _in_dict(w[:-3] + "ble"):
        return w[:-3] + "ble"  # possibly -> possible
    root = w[:-2]
    return root if _in_dict(root) else w  # quickly -> quick, really -> real


def _al(w: str) -> str:
    if not w.endswith("al") or len(w) < 6:
        return w
    if w.endswith("ical"):
        if _in_dict(w[:-2]):
            return w[:-2]  # historical -> historic
        if _in_dict(w[:-4] + "y"):
            return w[:-4] + "y"  # biological -> biology
    root = w[:-2]
    if _in_dict(root):
        return root  # rental -> rent
    if _in_dict(root + "e"):
        return root + "e"  # arrival -> arrive
    return w


def _ive(w: str) -> str:
    if not w.endswith("ive") or len(w) < 7:
        return w
    if w.endswith("ative") and _in_dict(w[:-5]):
        return w[:-5]  # informative -> inform
    root = w[:-3]
    if _in_dict(root):
        return root  # supportive -> support
    if _in_dict(root + "e"):
        return root + "e"  # creative -> create
    return w


def _ize(w: str) -> str:
    if not w.endswith("ize") or len(w) < 7:
        return w
    root = w[:-3]
    if _in_dict(root):
        return root  # modernize -> modern
    if _in_dict(root + "y"):
        return root + "y"  # summarize -> summary
    if _in_dict(root + "e"):
        return root + "e"
    return w


def _ment(w: str) -> str:
    if not w.endswith("ment") or len(w) < 8:
        return w
    root = w[:-4]
    if _in_dict(root):
        return root  # development -> develop
    if _in_dict(root + "e"):
        return root + "e"  # management -> manage
    return w


def _ble(w: str) -> str:
    if not (w.endswith("able") or w.endswith("ible")) or len(w) < 7:
        return w
    root = w[:-4]
    if _in_dict(root):
        return root  # readable -> read
    if _in_dict(root + "e"):
        return root + "e"  # usable -> use
    return w


def _ism(w: str) -> str:
    if not w.endswith("ism") or len(w) < 7:
        return w
    root = w[:-3]
    return root if _in_dict(root) else w  # modernism -> modern


def _ic(w: str) -> str:
    if not w.endswith("ic") or len(w) < 6:
        return w
    root = w[:-2]
    if _in_dict(root + "y"):
        return root + "y"  # photographic -> photography
    if _in_dict(root):
        return root
    if _in_dict(root + "e"):
        return root + "e"  # microscopic -> microscope
    return w


def _ncy(w: str) -> str:
    if not w.endswith("ncy") or len(w) < 6:
        return w
    if _in_dict(w[:-2] + "t"):
        return w[:-2] + "t"  # urgency -> urgent
    if _in_dict(w[:-1] + "e"):
        return w[:-1] + "e"
    return w


_DERIVATIONAL = (
    _ity, _ness, _ion, _er_or, _ly, _al, _ive, _ize, _ment, _ble, _ism,
    _ic, _ncy,
)

_cache: dict[str, str] = {}


def stem(word: str) -> str:
    """KStem a single lowercase token.  Non-alphabetic and very short/long
    tokens pass through unchanged (KStem contract)."""
    if len(word) < 3 or len(word) > MAX_WORD_LEN or not word.isalpha():
        return word
    hit = _cache.get(word)
    if hit is not None:
        return hit
    out = _stem_uncached(word)
    if len(_cache) < (1 << 20):
        _cache[word] = out
    return out


def _stem_uncached(w: str) -> str:
    if w in _DIRECT:
        return _DIRECT[w]
    if _in_dict(w):
        return w
    w = _plural(w)
    if _in_dict(w):
        return w
    w = _past_tense(w)
    if _in_dict(w):
        return w
    w = _aspect(w)
    if _in_dict(w):
        return w
    for fn in _DERIVATIONAL:
        w2 = fn(w)
        if w2 != w:
            return w2  # derivational rules only fire with dict evidence
    return w
