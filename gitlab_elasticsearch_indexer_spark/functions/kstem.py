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
(KStemData1-8); this module embeds a curated ~1.3k-headword subset of
common English plus the same conservative fallbacks.  Consequences:

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
# Embedded lexicon: curated common-English headwords.  Ordered by rough
# frequency bands; every golden-test pair's target stem appears here.
# ---------------------------------------------------------------------------
_LEXICON_TEXT = """
the be to of and a in that have i it for not on with he as you do at this
but his by from they we say her she or an will my one all would there their
what so up out if about who get which go me when make can like time no just
him know take person into year your good some could them see other than then
now look only come over think also back after use two how our work first
well way even new want because any these give day most us
man woman child world life hand part eye place case week company system
program question government number night point home water room mother area
money story fact month lot right study book job word business issue side
kind head house service friend father power hour game line end member law
car city community name president team minute idea body information face
door history result morning reason research girl guy moment air teacher
force education foot boy age policy process music market sense nation plan
college interest death experience effect class control care field
development role student group country problem school state family
call ask need feel become leave put mean keep let begin seem help talk turn
start show hear play run move live believe hold bring happen write provide
sit stand lose pay meet include continue set learn change lead understand
watch follow stop create speak read allow add spend grow open walk win
offer remember love consider appear buy wait serve die send expect build
stay fall cut reach kill remain suggest raise pass sell require report
decide pull return explain hope develop carry break receive agree support
hit produce eat cover catch draw choose cause listen
good new first last long great little own other old right big high
different small large next early young important few public bad same able
free sure better best low late hard major real possible whole special
easy clear recent certain personal open red difficult available likely
short single medical current wrong private past foreign fine common poor
natural significant similar hot dead central happy serious ready simple
left physical general environmental financial blue democratic dark various
entire close legal religious cold final main green nice huge popular
traditional cultural strong true full local social national political
quick quiet rich safe deep wide bright clean warm fresh sharp thick thin
flat rare pure calm fair brave proud wise active formal modern urgent
table value query window stream merge batch customer spark data search
index document text page file code test user server cloud engine result
term token score rank filter sort join group count sum list map array
hash block range bucket shard segment node cluster worker task stage
partition shuffle cache memory disk network thread core byte bit row
column record schema type string number integer float double boolean
parse format encode decode compress store fetch load save delete update
insert select commit rollback snapshot version branch tree graph edge
vertex path root leaf key lock queue stack heap buffer stream source sink
event log trace metric alert monitor deploy scale build release debug
error fault crash retry timeout limit quota batch job flow pipe pipeline
model train infer predict label feature vector matrix tensor weight bias
layer sample split fold epoch loss gradient learn rate step size shape
management government movement agreement statement treatment equipment
environment department apartment moment element experiment instrument
document argument monument
ring sing king thing wing sting swing spring string morning evening
nothing something anything everything during combine machine engine define
refine decline online outline
news species series analysis basis crisis thesis physics mathematics
economics politics statistics ethics means lens bus gas glass grass cross
boss class press stress process access success address progress loss miss
kiss dress mass pass guess focus status virus bonus campus census chaos
canvas atlas alias always perhaps
fly try cry dry carry marry study worry hurry copy apply reply supply
deny rely vary bury envy empty party city duty beauty army story factory
theory memory category history industry library summary luxury mystery
strategy energy technology biology psychology photography geography
company country family money body anybody everybody
walk agree stop plan ship wrap drop grab swim travel cancel label equal
occur prefer refer transfer admit commit permit submit omit regret format
pat pet pit pot put rub run sit set bet get hit fit cut shut knit slip
trip skip step stir star scar bar jam scan ban fan pin win sin tan ten
hop hope charge change range orange manage image damage message package
language village stage cage page rage wage huge judge bridge edge
ride hide slide divide decide provide guide side wide pride
write bite site kite quite invite unite excite ignite
make take wake lake bake cake fake shake snake brake
come some home dome rome name game fame frame flame blame same tame
give live five drive arrive dive hive strive
move prove love glove dove above improve approve remove
use fuse muse abuse accuse amuse refuse confuse excuse
late date gate hate fate mate rate plate slate state create relate debate
locate rotate donate update operate educate generate separate celebrate
note vote quote promote devote remote
care bare dare fare hare mare rare share spare square stare prepare
compare declare aware
fire hire wire tire admire desire require inspire expire retire entire
store score bore core more shore snore explore ignore restore
cure pure sure endure secure mature obscure procure
close chose nose rose pose hose those expose impose propose suppose
oppose compose dispose
base case chase phase vase erase
rise wise surprise exercise advise revise devise
cause pause clause applause
ease please tease cease crease increase decrease release
choose loose goose
house mouse spouse
serve nerve curve swerve deserve observe preserve reserve
solve evolve involve revolve resolve dissolve
sense dense tense immense expense defense offense license
force source divorce enforce
notice office practice service justice device advice voice choice price
slice spice twice juice
large charge merge urge surge verge emerge
simple sample ample temple example couple triple
able table cable fable stable unstable enable disable capable notable
suitable valuable reliable readable flexible possible visible sensible
responsible terrible horrible humble crumble stumble tumble
circle cycle uncle miracle obstacle article particle vehicle
single jungle angle tangle triangle
little brittle bottle battle cattle settle kettle title subtle
middle riddle saddle paddle puddle
apple ripple topple purple
organize realize recognize criticize emphasize summarize apologize
minimize maximize optimize normalize specialize visualize authorize
act fact pact tact impact contact exact react attract extract abstract
product conduct deduct instruct construct obstruct
object subject project reject inject eject
direct erect elect select collect correct connect respect inspect expect
suspect protect detect reflect effect affect perfect
depend extend intend attend defend offend spend trend blend bend lend mend
respond beyond second
point print paint joint faint saint hint mint lint tint
part art cart chart dart smart start apart depart
port sort fort short sport report support transport import export effort
comfort resort
count mount amount account discount fountain mountain
current parent silent absent recent accent decent moment
present prevent invent event comment content intent extent patient ancient
efficient sufficient
important distant instant constant assistant
student resident president incident accident evident confident
different indifferent
urgent agent regent gentle
consistent persistent insistent existent
dependent independent
inform perform reform conform uniform transform platform storm norm form
firm confirm affirm term germ
photograph paragraph telegraph autograph
microscope telescope envelope scope slope rope cope
historic metric electric fabric public logic magic tragic basic music
topic comic clinic picnic panic plastic drastic classic specific terrific
scientific athletic energetic magnetic pathetic synthetic authentic
romantic gigantic atlantic organic mechanic volcanic titanic
economic academic epidemic systemic
metal medal pedal petal vital total capital hospital digital orbital
animal normal signal final original marginal criminal terminal nominal
regional national rational optional personal seasonal internal external
eternal journal general mineral federal liberal literal natural cultural
structural central neutral spiral moral rural plural mural
"""

_DICT: set[str] = set(_LEXICON_TEXT.split())


def load_lexicon(words) -> None:
    """Merge additional headwords (e.g. a full KStem lexicon file) into the
    dictionary at runtime."""
    _DICT.update(w.strip().lower() for w in words if w.strip())
    _cache.clear()


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
