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
(KStemData1-8); this module embeds a curated ~3.8k-headword subset of
common English (round 3 tripled the original ~1.3k set with frequency-
banded everyday vocabulary plus -ion/-ive/-ity/-ness lemma families) and
the same conservative fallbacks.  Consequences:

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

# ---------------------------------------------------------------------------
# Lexicon expansion (round 3): ~2.5k additional unambiguous English
# headwords in frequency/theme bands.  Two effects, both toward Lucene
# parity: (1) headwords are PROTECTED from suffix mis-strips ("news" stays
# "news"), (2) derivational rules may now conflate onto them
# ("effectiveness"→"effective").  Still a curated subset of Lucene's ~30k
# KStemData1-8 — documented divergence; load_lexicon() accepts the full
# published list where available.
# ---------------------------------------------------------------------------
_LEXICON_TEXT_2 = """
absence accept account accuse ache achieve acid acre adapt adjust
admire admit adopt adult advance advantage adventure advertise afford afraid
afternoon against agenda aggressive ago aid aim airport alarm album
alcohol alert alike alive alley allowance almost alone aloud alphabet
already alter alternative although altitude aluminum amaze ambulance among amount
ample amuse analyze ancestor anchor angel anger angle angry ankle
anniversary announce annoy annual answer ant antenna anxiety anxious apart
apology apparent appeal appetite applaud apple appoint appreciate approach approximate
april apron arch architect arctic area arena argue arise arithmetic
arm armor arrange arrest arrow ash ashamed aside asleep aspect
assault assemble assert assess asset assign assist assume assure astonish
athlete atmosphere atom attach attack attempt attend attention attic attitude
attorney audience august aunt author autumn avenue average avoid awake
award awful awkward axis baby bachelor bacon bacteria badge bag
balance balcony bald ball balloon ballot bamboo banana band bandage
bank banner barber bargain bark barn barrel barrier basic basin
basket bat bath bathe bay beach bead beam bean bear
beard beast beat beautiful beaver bed bee beef beer beetle
before beg begin behalf behave behind bell belly belong below
belt bench bend benefit berry beside besides between beware bicycle
bill bind bird birth biscuit bishop bitter black blade blank
blanket blast blaze bleed bless blind blink blister blizzard block
blood bloom blossom blow board boast boat boil bold bolt
bomb bond bone bonnet book boom boot border bored borrow
bottom bounce bowl box brain brake brass brand bread breadth
breakfast breast breath breathe breed breeze brick bride brief brilliant
brim bring broad broadcast bronze brook broom brother brow brown
brush bubble bucket buckle bud budget bug bulb bulk bull
bullet bundle burden bureau burn burst bush busy butter button
cabbage cabin cabinet cable cafe cage calendar calf calm camel
camera camp campaign canal candidate candle candy cane cannon canoe
canyon cap capable capacity cape captain capture carbon card cardboard
career careful cargo carpenter carpet carrot carve castle cat catalog
cattle caution cave ceiling cell cellar cement cemetery cent center
century cereal ceremony chain chair chalk challenge chamber champion chance
channel chapter character charity charm chart chase chat cheap cheat
check cheek cheer cheese chemical chemistry cherry chest chew chicken
chief chin china chip chocolate choir choke chop chorus church
cigarette cinema circuit circumstance citizen civil claim clap clarify clash
clasp claw clay clerk clever click client cliff climate climb
cling clinic clip cloak clock cloth clothe cloud clown club
clue clumsy coach coal coast coat coax cock cocoa coconut
coffee coil coin collar college colony color column comb combat
comedy comfort command commerce committee compact companion compass compel compete
complain complete complex component compound comprehend compute conceal concentrate concept
concern concert conclude concrete condemn conduct cone conference confess confidence
conflict confront congress conquer conscience conscious consent consequence conserve consider
consist console conspire constitute consult consume contain contempt contest context
continent contract contrast contribute convenient convention converse convert convey convince
cook cool copper copy cord cork corn corner corporation correspond
corridor corrupt cost costume cottage cotton couch cough council counsel
counter courage course court cousin crab crack cradle craft crane
crash crawl crazy cream creature credit creek creep crew cricket
crime crisp critic crop crowd crown crude cruel cruise crumb
crush crust crystal cube cubic cultivate culture cunning cup cupboard
curb curious curl currency curtain curse curve cushion custom customary
dairy daisy dam dance danger dawn dazzle dean dear debt
decade decay deceive december decent deck declare decorate decrease deed
deer defeat defect defense deficit degree delay deliberate delicate delicious
delight deliver demand democracy demonstrate dentist depart deposit depress depth
deputy derive descend describe desert design desk despair desperate despise
dessert destine destroy detail detect determine device devil devote dew
diagram dial diamond diary dictate dictionary diet differ digest dignity
dim dinner dip diploma disappoint disaster discipline discount discover discuss
disease disgust dish dismiss display dispute dissolve distance distinct distinguish
district disturb ditch dizzy dock doctor doctrine dog doll dollar
domain domestic dominate donkey dot doubt dough dozen draft drag
drain drama drawer dream drift drill drink drip drum dull
dumb dump dust dwell each eager eagle ear earn earnest
earth east easter echo ecology edit editor educate eel effective
egg eight either elaborate elastic elbow elder electron elegant elephant
elevate eleven eliminate elite else embarrass embrace emerge emergency emotion
emperor employ empire enclose encounter encourage endure enemy engage engineer
enjoy enormous enough ensure enter enterprise entertain enthusiasm entrance entry
envelope episode equation equator equip era erase erect erode errand
escape escort essay essence establish estate esteem estimate evaluate evaporate
eve evil exaggerate examine exceed excellent except exchange exclaim exclude
execute exempt exercise exhaust exhibit exile exist exit expand expense
expert expire explode exploit explore express extra extraordinary extreme fabric
facility fade fail faint faith falcon false fame familiar famine
famous fancy fantastic farm fashion fasten fat fatal fate fault
favor favorite fear feast feather february fee feeble feed fellow
female fence fertile festival fever fiber fiction fierce fifteen fifty
fig fight figure film fin finance finger finish fish fist
fix flag flake flash flask flavor flaw flee fleet flesh
flight fling flint flip float flock flood floor flour flourish
fluid flush foam fog fold folk fond food fool forbid
forecast forehead forest forever forge forgive fork fortune forty forum
forward fossil foster foul found fountain four fox fraction fragment
fragrant frame fraud freeze freight frequent friday fridge fright frog
front frontier frost frown fruit fry fuel fun fund funeral
funnel funny fur furious furnace furnish furniture future fuzzy gain
gallery gallon gallop gamble gang garage garbage garden garlic garment
gather gaze gear gem gene genius gentle genuine gesture ghost
giant gift giggle ginger giraffe glad glance glare glass glide
glimpse globe gloom glory glow glue goal goat gold golf
gossip govern gown grace grade gradual grain grand grant grape
grasp grateful grave gravel gravity gray grease greed greet grey
grief grill grim grin grind grip groan grocery groom groove
ground grove guarantee guard guest guilt guitar gulf gum gun
gut habit hail hair half hall halt hammer handle handsome
hang harbor harmony harsh harvest haste hatch haul hawk hay
hazard head heal health heap heart heat heaven heavy hedge
heel height hell hello helmet hen herd hero hesitate hill
hinge hip hire hollow holy honest honey honor hood hook
horizon horn horror horse hose hotel hound howl hug human
humor hunger hunt hurl hurricane hurt husband hut hymn ice
icon ideal identify identity idle ignorant ill illustrate imagine imitate
immediate immigrant immune implement imply impress impulse inch incline income
increase indeed indicate individual indoor infant infect inferior inflate influence
inherit initial initiative injure ink inn inner innocent inquire insect
insert insist inspect install instance instead institute insult insure intact
integrate intelligent intense interact interfere interior interpret interrupt interval interview
intimate introduce invade invent invest investigate invite involve iron irrigate
irritate island isolate item ivory jacket jail january jar jaw
jazz jealous jelly jet jewel join joke journey joy judge
juice july jump junction june junior jury kangaroo keen kettle
kick kid kidney kind kingdom kit kitchen kite kitten knee
kneel knife knock knot label labor laboratory lace lack ladder
lady lamb lame lamp land lane lantern lap laser laugh
launch laundry lawn lawyer layer lazy lean leap lease leather
lecture ledge legend leisure lemon length lesson letter lettuce level
lever liberty lid lift light lightning limb lime limp linen
linger link lion lip liquid liquor literary litter liver load
loan lobby lobster local locate lodge loft log lonely loop
lord lorry loud lounge loyal luck luggage lumber lump lunch
lung lure lurk machinery mad magazine magnet maid mail main
maintain majesty male mall mammal manner mansion manual manufacture manuscript
maple marble march margin marine mark market marsh marvel mask
mason mat match material mature maximum may maybe mayor meadow
meal measure meat mechanism medicine medium melody melon melt mention
menu mercy mere merit mermaid merry mess metal meter method
middle might mild mile military milk mill million mind mine
minimum minister minor mint miracle mirror mischief misery mist mistake
mix mixture mob mobile mock mode model moderate modest modify
moist mole monarch monday monitor monkey monster month mood moon
mop moral morale mortal mosquito moss motel moth motion motive
motor mount mourn mouth mud mule multiple multiply murder murmur
muscle museum mushroom mutter mutual myth nail naked narrow nasty
navy near neat necessary neck needle negative neglect negotiate neighbor
nephew nerve nest net nettle never nevertheless niece nine noble
nod noise none noon nor north nose notable notch notion
noun novel november nowhere nuclear nucleus nuisance numerous nun nurse
nut nylon oak oar oath obey oblige obscure observe obstacle
obtain obvious occasion occupy ocean october odd odor off offend
offense often oil old olive omit once onion onto onward
opera opponent opportunity oppose opposite oral ordinary organ orient ornament
orphan ostrich ought ounce outcome outdoor outer outfit output oval
oven overall overcome overlap overseas overtake owe owl own oxygen
oyster pace pack pad pail pain pair palace pale palm
pan pancake panel pant paper parade parallel parcel pardon park
parliament parrot participate particular partner pastry pasture patch patent patrol
pattern pause pave paw pea peace peach peak peanut pear
pearl peasant pebble peculiar pedal peel peer pen penalty pencil
penny pension pepper perceive percent perch perfume peril period permanent
persist personnel persuade pest pet petrol petty pharmacy phenomenon phrase
piano pick picture pie piece pierce pig pigeon pile pill
pillar pillow pilot pin pinch pine pink pint pioneer pipe
pirate pistol pit pitch pity pixel plain plane planet plant
plaster plate platform plead pleasant pledge plenty plot plow pluck
plug plum plumber plunge pocket poem poet poetry poison pole
police polish polite poll pond pony pool pop porch pork
porridge portion portrait possess post postpone pot potato pottery pouch
poultry pound pour poverty powder praise pray preach precious precise
prefer pregnant prejudice premise prescribe presence preside pretend pretty prey
priest prime primitive prince principal principle prison privilege prize probable
proceed proclaim profession professor profile profit prohibit prominent promise prompt
pronounce proof proper property proportion propose prosper protest protein proud
proverb pub publish pull pulse pump pumpkin punch punish pupil
puppet puppy purchase purpose purse pursue push puzzle pyramid qualify
quantity quarrel quarter queen quench quest quick quit rabbit race
rack radar radio rail railway rain rainbow rally ranch random
rank rapid rat rather ratio rattle raw ray razor reckon
recall recipe recite recommend reconcile recover recruit rectangle recycle reduce
reed reef refine refrain refresh refuge regard regime regiment register
regular rehearse reign rein reinforce relax relevant relief relieve religion
reluctant remark remedy remind remote render renew rent repair repeat
repent replace represent reproduce reptile republic reputation rescue resemble resent
reside resign resist resolute resource rest restaurant restrain restrict resume
retail retain retreat reveal revenge revenue reverse review revive reward
rhyme rhythm rib ribbon rice rid rifle rig rim riot
rip ripe risk rival river road roam roar roast rob
robe robin robot rock rocket rod roll roof rook rooster
rope rot rotate rough round route routine royal ruin rule
rumor rust sack sacred sacrifice sad saddle sail sake salad
salary salmon salt salute sand sandal sandwich sane satellite satisfy
saturday sauce saucer sausage savage saw scale scalp scandal scarce
scare scarf scene scent schedule scheme scholar science scissors scold
scoop scooter scorn scout scrap scrape scratch scream screen screw
script scrub sea seal seam season seat secret secretary section
secure seed seek seize seldom seminar senate senior sentence separate
september sergeant session settle seven severe sew shabby shade shadow
shaft shall shallow shame shampoo shape shatter shave shawl shed
sheep sheer sheet shelf shell shelter shepherd shield shift shine
shiver shock shoe shoot shop shore shoulder shout shovel shower
shrewd shriek shrink shrub shrug shun shy sick siege sigh
sight sign signature silence silk silly silver similar sincere sink
sir siren sister six sketch ski skill skin skirt skull
sky slab slack slam slap slave sleep sleeve slender slice
slide slight slim slime slogan slope slot slow slump smack
smart smash smell smile smoke smooth snack snail snap snatch
sneak sneeze sniff snow soak soap soar sob sober soccer
sociable sock soda sofa soft soil soldier sole solemn solid
solo solution somehow somewhat son song soon soothe sore sorrow
sorry soul sound soup sour south sow space spade spare
spark sparrow spear species specimen spectacle speech speed spell spider
spill spin spine spirit spit splash splendid splinter sponge spoon
spot spouse spray spread spy squad square squeeze squirrel stab
stable stadium staff stain stair stake stale stall stamp staple
stare startle starve station statue stature stature steady steak steal
steam steel steep steer stem stern stew stick stiff still
stimulate sting stitch stock stocking stomach stone stool stoop storage
store stork story stout stove straight strain strait strand strange
strap straw strawberry stray streak street strength stretch strict stride
strife strike strip stripe strive stroke stroll structure struggle stubborn
studio stuff stumble stun stupid sturdy style submit subscribe substance
substitute subtract suburb succeed such suck sudden sue suffer sufficient
sugar suit suitcase sullen summer summit summon sunday sunset superb
superior supervise supper supreme surface surgeon surname surplus surrender surround
survey survive suspend suspicion sustain swallow swamp swan swarm sway
sweat sweater sweep sweet swell swift switch sword syllable symbol
sympathy symptom syrup tablet tackle tact tail tailor talent tall
tame tank tap tape target tariff taste tax taxi tea
teach teacup tear tease technique tedious teenager telephone television temper
temperature tempt tenant tend tender tennis tent tenth terrace terror
testify testimony textbook texture thank theater theme therefore thermometer thick
thief thigh thirst thirteen thirty thorn thorough thousand thread threat
three thrill thrive throat throne throng throw thrust thumb thunder
thursday thus ticket tide tidy tie tiger tight tile till
tilt timber timid tin tiny tip tire tissue toad toast
tobacco today toe together toil toilet tomato tomb tomorrow tone
tongue tonight tool tooth top topic torch torment torrent tortoise
torture toss touch tough tour tournament tow towel tower town
toy trace track tractor trade tragedy trail trailer tramp trample
transit translate transmit transparent trap tray treason treasure treat treaty
tremble tremendous trench trial tribe tribute trick trifle trim trio
triumph trolley troop trophy tropical trot trouble trousers trout truck
trumpet trunk trust truth tub tube tuck tuesday tug tuition
tumble tune tunnel turkey turtle tutor twelve twenty twig twin
twist two tyranny ugly ultimate umbrella unanimous uncle underneath undertake
uneasy unfold uniform unique unit universe university unless upward urban
urge usual utensil utility utmost utter vacant vacation vaccine vague
vain valley van vanish vanity vapor variety vast vault vegetable
vehicle veil vein velvet vendor venture venue verb verdict verse
vertical vessel vest veteran veto vex vibrate vice victim victory
view vigor vine vinegar violet violin virtue visa visit vivid
vocabulary vogue volume voluntary volunteer vowel voyage vulgar wade wage
wagon waist wait wallet walnut wander ward warehouse warm warn
warrant wash wasp waste watch wax weak wealth weapon wear
weary weather weave web wedding wednesday weed weekend weep weigh
weight welcome welfare west wet whale wharf wheat wheel whenever
wherever whip whirl whisper whistle white wicked widow width wild
wilderness wing wink winter wipe wisdom wish wit witch withdraw
wither witness wonder wool worm worse worship worst worth wound
wrap wreck wrench wrestle wring wrinkle wrist yard yarn yawn
yell yellow yesterday yield yoke yolk youth zeal zebra zero
zigzag zinc zone zoo station nation section option action fiction
function fraction junction mission session passion fashion version vision decision
division occasion region opinion union billion position condition tradition edition
addition ambition revolution evolution situation population attention invention intention convention
collection connection direction election selection protection reflection correction affection infection
injection inspection instruction construction production introduction reduction destruction satisfaction reaction
attraction transaction relation translation operation cooperation generation celebration examination imagination
civilization communication application complication education dedication location vocation donation information
formation foundation plantation temptation quotation reputation preparation restoration declaration administration
illustration registration frustration concentration explanation observation conversation reservation motivation innovation
invitation limitation irritation medication publication qualification notification identification opposition composition
proposition competition definition recognition repetition exhibition ambition nutrition intuition institution
distribution contribution execution solution resolution pollution caution auction creativity electricity
capacity publicity simplicity velocity authority majority minority priority security maturity
curiosity generosity personality reality quality equality morality mortality loyalty royalty
novelty penalty casualty faculty difficulty community immunity opportunity unity dignity
vicinity infinity humanity vanity charity clarity rarity weakness illness wilderness
witness harness mattress fortress congress compress suppress express impress oppress
distress actress countess princess hostess passive massive active native captive
motive festive relative negative objective detective effective defective collective selective
perspective executive sensitive expensive offensive defensive extensive intensive impressive expressive
aggressive progressive possessive exclusive inclusive conclusive explosive persuasive decisive divisive
abusive elusive primitive positive competitive repetitive additive fugitive alternative narrative
cooperative comparative imperative conservative representative initiative
"""

_DICT: set[str] = set(_LEXICON_TEXT.split()) | set(_LEXICON_TEXT_2.split())


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
