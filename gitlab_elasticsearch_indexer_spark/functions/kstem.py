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
(KStemData1-8); this module embeds a curated subset of common English
(~10k headwords as of round 4 — the exact count is ``len(_DICT)`` and is
hashed into the catalog's analyzer-version fingerprint) and the same
conservative fallbacks.  Consequences:

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

# Round-3 expansion toward Lucene's ~30k KStemData coverage: base-form
# lemmas only (no plurals, no -ed/-ing inflections except lexicalized
# dictionary words), grouped by domain.  Surface forms whose conflation is
# golden-pinned in tests/test_functions.py (activity→active, writer→write,
# assessment→assess, …) are deliberately ABSENT — presence would block the
# strip.  Growing this list changes 'default' analyzer output on OOV-no-more
# words, covered by the ANALYZER_VERSIONS catalog guard.
_LEXICON_TEXT_3 = """
abandon abide absorb accelerate accept access acclaim accommodate accompany accomplish
accumulate accuse ache achieve acknowledge acquire adapt add address adhere
adjust administer admire admit adopt adore advance advertise advise advocate
affirm afford aggravate agitate aim alarm alert alienate align allege
allocate allow allude alter amaze amend amuse analyze anchor anger
announce annoy anticipate apologize appeal appear applaud apply appoint appraise
appreciate approach approve argue arise arrange arrest arrive articulate ascend
aspire assemble assert assess assign assist assume assure astonish attach
attack attain attempt attend attract attribute audit augment authorize automate
avert avoid await awake award backfire bake balance ban
bang banish bargain bark bat bathe batter beam bear beat
beckon become beg behave behold belong bend benefit bet betray
bid bind bite blame blast blaze bleed blend bless
blink block bloom blow blur blush boast boil bolster bomb
book boost borrow bounce bow brag brake branch brand breathe
breed brew bribe bridge brighten bring broadcast broaden browse bruise
brush buckle bud budge bump burn burst bury buy buzz
calculate calm camp cancel capture care carry carve cast catch
cater cause cease celebrate certify challenge change chant chase chat
cheat check cheer chew chill chip choke choose chop cite
claim clap clarify classify clean clench click climb cling clip
close clutch coach coincide collaborate collapse collect collide comb combat
combine come comfort command commence comment commit communicate commute compare
compel compensate compete compile complain complete comply compose comprehend comprise
compromise compute conceal concede conceive concentrate concern conclude condemn conduct
confer confess confide configure confine confirm conflict conform confront confuse
congratulate connect conquer consent conserve consider consist console consolidate conspire
constitute constrain construct consult consume contact contain contemplate contend contest
continue contract contradict contrast contribute convene converge converse convert convey
convict convince cook cooperate coordinate cope copy correct correlate correspond
corrupt cough counsel count counter cover crack craft crash crave
crawl creak criticize cross crouch crush cry cultivate cure
curl customize cut dampen dance dare dash date dazzle deal
debate decay deceive decide declare decline decompose decorate decrease dedicate
deduce deem deepen defeat defend defer define deflect defy degrade
delay delegate delete deliberate delight deliver demand demolish demonstrate denounce
deny depart depend depict deplete deploy deposit deprive derive descend
describe deserve design designate desire despise destroy detach detain detect
deter deteriorate determine devastate develop deviate devise devote diagnose dictate
differ differentiate dig digest dilute diminish dine dip direct disagree
disappear disappoint discard discern discharge disclose discount discourage discover discriminate
discuss disguise dislike dismiss dispatch dispense disperse displace display dispose
dispute disregard disrupt dissolve distinguish distort distract distribute disturb dive
divert divide divulge document dodge dominate donate doubt draft drag
drain draw dread dream drift drill drink drip drive drop
drown dry dump duplicate dwell earn ease eat echo edit
educate elaborate elect elevate eliminate embark embarrass embed embrace emerge
emphasize employ empower enable enact enclose encounter encourage endanger endorse
endure enforce engage engineer enhance enjoy enlarge enlighten enlist enrich
enroll ensure entail enter entertain entice entitle entrust envision equal
equip erase erect erode erupt escalate escape escort establish esteem
estimate evacuate evaluate evaporate evoke evolve exaggerate examine exceed excel
exchange excite exclaim exclude excuse execute exemplify exercise exert exhale
exhaust exhibit exist expand expect expel experiment expire explain explode
exploit explore export expose extend extract facilitate fade fail
fall falter fasten favor fear feature feed feel fetch fight
figure file fill film filter finalize find fine finish fire
fit fix flap flash flatten flatter flee fling flip float
flood flourish flow fluctuate flush fly focus fold follow forbid
force forecast forge forget forgive form formulate foster found frame
freeze frighten frown frustrate fulfill function fund furnish gain gather
gaze generate gesture give glance glare glide glow
glue gnaw govern grab grade graduate grant grasp greet grieve
grin grind grip groan grow growl guarantee guard guess guide
gulp gush halt hand handle hang happen harm harvest hatch
hate haul heal heap hear heat heighten help hesitate hide
highlight hinder hint hire hit hold honor hop hope host
hover howl hug hum hunt hurl hurry hurt identify ignite
ignore illuminate illustrate imagine imitate immerse impair implement implicate imply
import impose improve improvise include incorporate increase incur indicate induce
indulge infer inflate inflict influence inform inhabit inhale inherit inhibit
initiate inject injure innovate inquire insert insist inspect inspire install
instruct insulate insult integrate intend intensify interact intercept interfere interpret
interrupt intervene interview intimidate intrigue introduce invade invent invest investigate
invite invoke involve irritate isolate issue jam jog join joke
judge jump justify keep kick kidnap kill kiss kneel knit
knock knot know label lack land last laugh launch lay
lead leak lean leap learn leave lecture lend let liberate
lick lift light lighten like limit linger link list listen
live load loan locate lock long loom loosen lose love
lower lurk maintain manage mandate manipulate manufacture march mark market
marry match mature maximize mean measure mediate meet melt memorize
mention merge mess migrate mimic mind minimize miss mistake misunderstand
mix moan mobilize mock moderate modify monitor motivate mount mourn
move mow multiply mumble murder murmur mutter name narrate navigate
need neglect negotiate nod nominate note notice notify nourish nudge
nurture obey object oblige obscure observe obsess obstruct obtain occupy
occur offend offer officiate offset omit open operate oppose opt
optimize orbit orchestrate order organize orient originate outline outperform outrage
outweigh overcome overhaul overlap overlook override oversee overturn overwhelm owe
own pack paint pan panic parse participate pass pat
patrol pause pay peck peek peel peer penetrate perceive perfect
perform permit persist personalize persuade pertain pinch pile
pin pinpoint pitch pity place plan plant play plead please
pledge plot plug plunge point poke polish ponder pop pose
possess post postpone pour practice praise pray preach precede predict
prefer prepare prescribe present preserve preside press presume pretend prevail
prevent print prioritize proceed process proclaim produce profit progress prohibit
project promise promote prompt pronounce propose prosecute prosper protect protest
prove provide provoke publish pull pump punch punish purchase pursue
push qualify quantify quarrel question quit quote race raise
rally range rank rate reach react read realize reap rear
reassure rebel rebuild recall receive recite reckon recognize recommend reconcile
reconsider reconstruct record recover recruit recycle redeem reduce refer refine
reflect reform refrain refresh refuse refute regain regard register regret
regulate rehearse reign reinforce reiterate reject rejoice relate relax release
relieve rely remain remark remedy remember remind remove renew renovate
rent repair repeat repel replace replicate reply report represent repress
reproduce request require rescue resemble resent reserve reside resign resist
resolve resonate respect respond restore restrain restrict resume retain retaliate
retire retreat retrieve return reveal reverse review revise revive revoke
revolve reward rid ride ring rinse rip rise risk roam
roar roast rob rock roll rotate rub ruin rule run
rush sacrifice sail salute sample sanction satisfy save say scan
scare scatter schedule scold scoop score scratch scream screen
scrub seal search seat secure seduce see seek seem seize
select sell send sense separate serve settle sew shake shape
share sharpen shatter shave shed shift shine ship shiver shock
shoot shop shout shove show shrink shrug shut shuffle sigh
sign signal signify simplify simulate sing sink sip sit situate
skip slam slap sleep slice slide slip slow smash smell
smile smooth snap snatch sneak sniff soak soar sob socialize
soften solve soothe sort sound sow spare spark speak
specialize specify speculate speed spell spend spill spin split sponsor
spot spray spread spring sprinkle squeeze stab stabilize stack stand
stare start starve state stay steal steer stem step stick
stimulate stir stitch stop store strain stray streamline strengthen stress
stretch stride strike strive stroke stroll structure struggle study stumble
subject submit subscribe subside substitute succeed suck sue suffer suggest
suit summon supervise supply support suppose surge surpass surrender surround
survey survive suspect suspend sustain swallow swap sway swear sweep
swell swim swing switch symbolize sympathize synthesize tackle take talk
tap target taste teach tear tease tell tempt tend terminate
terrify test testify thank think thrive throw thrust tick tighten
tilt tip tolerate toss touch tour tow trace track trade
trail train transcend transfer translate transmit transport trap travel
tread treat tremble trick trigger trim trip triumph trust try
tuck tug tumble turn tutor tweak twist undergo undermine understand
undertake unfold unify unite unleash unlock unveil update upgrade uphold
upset urge use utilize utter validate value vanish vary venture
verify veto view violate visit visualize voice vote vow wade
wait wake walk wander want warn wash waste watch wave
weaken wear weave weigh welcome whip whisper widen win wind
wipe wish withdraw withhold withstand witness wonder work worry worship
wrap wreck wrestle write yawn yearn yell yield zoom
abbey abdomen accent accident accordion accountant acid acorn acre acrobat
adjective admiral adobe adolescent adult adverb adversary advert aerial aftermath
afternoon agenda agent alarm album alcohol alcove ale algebra alley
alligator alloy almond alphabet altar altitude aluminum amateur ambassador amber
ambulance amethyst ammunition amount amphibian anatomy ancestor anchor anecdote angel
angle animal ankle annex antelope antenna anthem antibiotic antique anvil
apartment ape apex apology apostrophe apparatus apparel appendix appetite applause
apple appliance apprentice apricot apron aquarium arc arcade arch archer
architect archive arena argument arithmetic ark arm armchair armor army
aroma arrow arsenal artery artifact artisan ash aspect asphalt aspirin
assassin asset asteroid asthma asylum athlete atlas atmosphere atom atrium
attic attorney auction audience auditorium aunt aura author autumn avalanche
avenue average aviation avocado axis axle bacon badge badger
bag bait balcony ball ballad ballet balloon ballot bamboo banana
band bandage banjo bank banner banquet bar barbecue barber bargain
barge bark barley barn barometer barracks barrel barrier basalt base
basement basin basket bass bat batch bath bathroom baton battery
battle bay bazaar beach bead beak beam bean beard beast
bed bedroom bee beef beer beet beetle bell belly belt
bench berry bicycle bill bin biography birch bird birthday biscuit
bishop bison bit blade blanket blaze blazer blister blizzard bloom
blossom blouse blueprint board boat bog bolt bone bonfire
bonnet bonus booklet boot booth border bottle bottom boulder boulevard
boundary bouquet bow bowl bracelet bracket brain brake bran
brass bread breakfast breast breath breeze brick bride bridge
briefcase brigade brim brink bronze brook broom broth brother
brow bubble bucket bud buffalo buffet bug bulb bull bullet
bundle bunk burden bureau burrow bus bush butler butter butterfly
button cab cabbage cabin cabinet cable cactus cafe cafeteria cage
cake calendar camel camera camp campaign campus canal canary candle
candy cane cannon canoe canopy canvas canyon cap cape capital
capsule captain caravan carbon cardboard cardigan cargo carnival carpenter carpet
carriage carrot cart cartoon cartridge cascade castle cat catalog
caterpillar cathedral cattle cauldron cave cedar ceiling cell cellar cement
cemetery century ceramic ceremony chain chair chalk chamber champagne champion
chandelier channel chapel chapter charcoal chariot charm chart charter chassis
chauffeur cheek cheese chef chemical chess chest chestnut chicken chief
chimney chin chocolate choir chord chorus chrome chunk cider
cigar cinema cinnamon circle circuit circus citadel citizen citrus clam
clan clasp clause claw clay clearing cleat clerk cliff climate
clinic cloak clock closet cloth cloud clover clown club clue
cluster coach coal coast coat cobalt cobweb cockpit cocoa coconut
cocoon cod code coffee coffin coil coin collar colleague college
colonel colony column comb comedy comet commander commerce committee commodity
compass compound concert concrete cone conference congress conscience constable consulate
continent contour convent convoy copper copse coral cord corps
corridor cosmos costume cottage cotton couch council county couple coupon
courage course court courtyard cousin cove cowboy crab cradle
crane crate crater crayon cream creature creek crescent crest crew
crib cricket crime crimson crisis critic crocodile crop crossroad crow
crowd crown crumb crust crutch crystal cube cucumber cuff cuisine
cup cupboard curb curfew current curriculum curtain curve cushion custard
custody custom cyclone cylinder cypress dagger dairy dam damage dame
dandelion dawn deacon debris debut decade deck decree deer
delta demon den denim dentist depot deputy desert desk dessert
destiny device devil dew diagram dial dialect dialogue diameter diamond
diary dice diesel diet dilemma dime dinner dinosaur diploma disaster
disc disciple discipline discourse disease dish disk district ditch dock
doctrine dogma doll dolphin dome domino donkey donor doorway
dormitory dose dough dove dozen dragon drama drawer
drawing dress drizzle drone drought drug drum duchess duck duct
duel duet duke dune dungeon dusk dust duty dwarf dye
dynasty eagle ear earl earthquake easel eclipse ecstasy eel
effigy egg elbow elder elm eloquence embassy ember emblem embryo
emerald emperor empire enamel enclave encore encyclopedia enemy engine enigma
ensemble enterprise entrance envelope envy epic episode epoch equator equinox
era errand escort essay essence estate estuary ether eve
evening exam example excerpt excursion exhaust exile exit expanse expedition
expense expert extent extract eyebrow fabric facade fairy
faith falcon fame famine fang fare farm fate
fatigue faucet fault fauna fawn feast feather fee fellow felt
fence fender fern ferry festival fever fiber fiddle fig
filament fin finance finger fir fire fireplace firm fish fist
flag flake flame flank flannel flare flask fleece fleet flesh
flint flock flora flour flute foam fog foil
folder folk folklore fondness font forehead forest forge fork fort
fortnight fortune forum fossil fountain fowl fox fraction fracture fragment
fragrance freckle freight fringe frog frontier frost fruit fuel
fume funnel fur furnace furniture fury fuse gadget galaxy gale
gallery gallon gallop gamble gang garage garbage garden garlic garment
gate gauge gazette gear gem gene general generation genre gentleman
geography geology geometry germ ghost giant gift gig ginger giraffe
glacier gland glass glaze glimpse globe gloom glory glove
goal goat goblet goblin gold golf gondola gong goose gorge
gorilla gospel gossip gourd gown grace grain gram grammar granite
grape graph grass gratitude grave gravel gravy grease greenhouse grenade
grid grief grill grin grocer groove grove guardian guest
guild guilt guitar gulf gull gum gut gutter gym habit
habitat hail hall hallway halo ham hamlet hammer hammock hamper
handbook handkerchief handle harbor hardship hare harmony harp harpoon hat
hatch hatchet haven hawk hay hazard haze hazel headline headquarters
heap heart hearth heather heaven hedge heel heir helicopter helmet
hemisphere hen herb herd heritage hermit hero heron hill
hinge hip hippopotamus hive hobby hog hole holiday hollow
honey honeymoon hood hoof hook horizon horn hornet horror horse
hose hospital hostage hotel hound household hub hue hull
humor hunger hut hybrid hydrogen hymn iceberg icicle icon
idiom idol igloo illusion image imagination inch incense incident income
index industry infant inferno ingot ingredient ink inlet inn insect
insignia instance instant instinct instrument intellect intersection interval intestine inventory
iris iron irony island isle isotope item ivory ivy jacket
jade jaguar jail jar jaw jazz jeep jelly jest jet
jewel jigsaw joint journal journey jug juice jungle junior junk
jury justice kangaroo keel keg kennel kernel kettle key keyboard
kidney kilogram kilometer kin kingdom kiosk kit kitchen kite kitten
knee knife knight knob knot knuckle koala lab ladder
lagoon lair lake lamb lamp lance landlord landmark landscape lane
language lantern lap lapel larva laser latch lattice laundry lava
lavender lawn lawsuit lawyer layer lead leaf league leather ledge
leek legacy legend legion lemon lemonade length lens leopard lesson
lettuce level lever liberty library license lid lieutenant ligament
lily limb lime limestone limousine linen liner lion lip
liquid liter literature litter liver lizard llama lobby lobster locomotive
lodge loft log logic loop lord lounge luggage lumber
lump lung luxury lyric machine mackerel magazine magnet magnitude
mahogany maid mail mainland maize malice mall mammal manner manor
mansion mantle manual manuscript map maple marathon marble mare margin
marina mariner marrow marsh mask mason mass mast mat
mate material mathematics matter mattress maze meadow meal meat
medal media medicine medium melody melon memoir memory menu merchant
mercury mercy mermaid mesh metal metaphor meteor meter method metro
microphone midnight mile militia milk mill millennium million mineral miniature
mink mint miracle mirror mischief missile mission mist mitten moat
mob mode model mole molecule monarch monastery monk monkey
monsoon monster monument mood moon moor moose morale
mosaic mosque mosquito moss motel moth motion motor motto mound
mountain mouth mud muffin mug mule muscle museum mushroom
musket mustache mustard myriad mystery myth nail napkin nation
nature navy nectar needle neighbor neighborhood nephew nerve nest net
network news niche nickel nickname niece noble nonsense
noodle noon nook noose nose nostril notebook notion novel nozzle
nucleus nugget nuisance nun nurse nut nylon oak oar oasis
oat oath oatmeal obelisk oboe occasion ocean octopus odor offense
office officer oil ointment olive omelet onion onset opera
opinion opponent oracle orange orchard orchestra ore organ origin ornament
orphan ostrich otter ounce outbreak outcome outfit outlet outpost outskirts
oven owl owner oxide oxygen oyster ozone pace packet pact
paddle paddock pagoda pail palace palette palm pamphlet panel
panther pants papaya paper parachute parade paradise paragraph parcel parchment
parish park parliament parlor parrot parsley particle partner party
passage passenger passport pasta paste pastry pasture patch path patience
patio patriot patron pattern pavement pavilion paw pea peace peach
peacock peak peanut pear pearl peasant pebble pedal pedestal pelican
pen pencil pendant pendulum penguin peninsula penny pension pepper perfume
peril perimeter period permit person petal petition petroleum pew
pharmacy phase pheasant phenomenon phrase piano pickle picnic
picture pie pier pig pigeon pigment pike pile pill pillar
pillow pilot pine pineapple pint pioneer pipe pipeline pirate pistol
piston pit pitch pity pivot pixel plague plain plan
plank planet plank plasma plaster plastic plate plateau platform platinum platoon
plaza plight plot plow plum plumber plume plywood pocket pod
poem poet poetry poison pole police pollen pond pony pool
porch pore pork porridge port portal porter portfolio portion portrait
post postcard poster pot potato pottery pouch poultry pound
powder prairie prayer premise present press prey price pride priest
prince princess principle prison privilege prize problem produce profile
prong proof property prophet prose protein proverb province
prowess proxy prune pub puddle pulse puma pump pumpkin punch
pupil puppet puppy purpose purse pyramid python quail quarry quart
quarter quartz queen quest queue quill quilt quart quota rabbit
raccoon rack radar radio radish raffle raft rag rail railroad
rain rainbow raincoat rake ram ramp ranch rank
rash raspberry rat ratio ration raven ravine ray razor realm
rebate rebel recipe recess record reed reef reel referee
refuge regime regiment region rein relic remainder remark remnant
remorse rendezvous rent reptile republic reputation resin resort resource rest
restaurant retail revenue rhubarb rhyme rhythm rib ribbon rice riddle
ridge rifle rift rim riot ripple rite ritual rival river
road robe robin robot rock rocket rod rogue role
roof rook room rooster root rope rose rosemary roster rostrum
rotor route routine row rubble ruby rudder rug rum
rumor rust rye sack saddle safari saga sage sail
sailor saint salad salary salmon salon saloon salt salute sample
sanctuary sand sandal sandwich sap sapphire satchel satellite satin sauce
saucer sausage savage saw scaffold scale scalp scar scarf
scene scent scepter scheme scholar school schooner science scissors scoop
scope score scorn scorpion scrap screw script scroll sculpture
scythe sea seal seam season seat seaweed second secret sector
sediment seed seminar senate senator sentence sentinel sequel sequence serenade
sergeant sermon serpent serum servant session shack shade shadow shaft
shale shallows shame shampoo shark shawl shear sheep sheet
shelf shell shelter shepherd sheriff shield shin shingle shirt
shoal shoe shore shoulder shovel shrine shrub shutter siege
sign silk sill silo silver siren sister skeleton sketch
ski skill skin skirt skull sky slab slate sled sleeve
slice slope slot smoke snack snail snake
soap soccer society sock sofa soil soldier sole
solo sonata sonnet soul soup source spade spaghetti span spark
sparrow spasm spatula spear specimen spectacle spectrum speech sphere spice
spider spike spinach spine spiral spirit spite spleen splinter spoke
sponge spool spoon spore sport spouse spout spruce spur squad
squadron square squash squirrel stable stadium staff stage stair stake
stall stallion stamp stanza staple star starch statue stature
statute steak steam steed steel stereo stern stew steward
stick stint stock stocking stomach stone stool storm story
stove strand stranger strap straw strawberry stream street stride strife
string stripe stroke stronghold stub studio stuff stump style
suburb subway sugar suit suite sulfur summit sun supper
surf surface surgeon surplus suspect swamp swan sweat sweater sword
syllable symbol symphony symptom syndrome syrup tab table tablet
tack tact tactic tail tailor tale talent tank tanker
tap tape tapestry tar tariff tart task tassel tavern tax
taxi tea teak teal team teapot tear technique teen telegraph
telephone telescope temper temperature tempest temple tempo tenant tennis tenor
tent term terrace terrain territory terror text textile texture
theater theme theory thicket thigh thimble thorn thread threshold thrill
throat throne thumb thunder ticket tide tiger tile timber
tin tissue title toad toast tobacco toe toll
tomato tomb ton tone tongue tool tooth topaz topic torch
tornado torrent tortoise total tourist tournament towel tower town
toy tractor tradition tragedy trail trait traitor tram trance
transit trap tray treason treasure treaty tree trek trench trend
tress tribe tribunal tribute trio trolley troop trophy trout
truce truck trumpet trunk tub tuba tube tulip tumor
tuna tundra tunic tunnel turbine turf turkey turnip turret turtle
tusk tutor tuxedo tweed twig twilight twin type typhoon
udder umbrella umpire uncle uniform universe uproar urn usher utensil
vaccine vacuum vale valley valve van vane vanilla vapor
varnish vase vault veal vegetable vehicle veil vein velvet vendor
veneer venom vent verb verdict verse vessel vest veteran
viaduct vial vice victim victory video villa village villain vine
vinegar vineyard viola violet violin viper virtue visa vision
vista vitamin vocabulary vodka vogue voice volcano volume voyage vulture
wafer wagon waist wallet walnut walrus waltz wand ward
wardrobe warehouse warrant warrior wart wasp watch waterfall watermelon wax
wealth weapon weasel weather web wedge weed week weekend
well whale wharf wheat wheel whim whisk whistle wick
widow width wig willow wind windmill window wine wing winter
wire wisdom wit witch wizard wolf wood wool
workshop worm wound wreath wren wrench wrist yacht yard
yarn yeast yoke yolk youth zeal zebra zenith zinc zone
abrupt absent absolute abstract absurd abundant academic acceptable accurate acute
adamant adept adequate adjacent adverse affluent afraid aggressive agile alert
alien alike alive alternate amber ambiguous ambitious ample ancient angry
anonymous anxious apparent appropriate apt arbitrary arid arrogant artificial ashamed
asleep astute attractive audible austere authentic automatic awake aware awful
awkward bald bare barren basic beautiful benign bitter bizarre bland
blank bleak blind blond blue blunt bold brave brief bright
brilliant brisk brittle broad brown brutal busy calm candid capable
careful careless casual cautious certain cheap cheerful chief chilly chronic
circular civic civil classic clean clear clever cloudy clumsy coarse
cognitive coherent cold colonial colorful comic common compact complex comprehensive
compulsory concise concrete confident conscious considerable consistent constant contemporary content
continuous convenient cool cordial correct corrupt costly courageous cozy crafty
crazy credible crisp critical crucial crude cruel cryptic cunning curious
curly current cute cynical daily damp dark deadly deaf dear
decent decisive deep defiant deficient definite deliberate delicate delicious delightful
dense dependent desperate destructive detailed devout diagonal different difficult diligent
dim diplomatic dire direct dirty discreet dismal distant distinct diverse
divine dizzy docile domestic dominant dormant double drab dramatic drastic
dreadful dry dual dubious dull dumb durable dynamic eager early
earnest easy eccentric economic edible eerie effective efficient elaborate elastic
elder elderly electric elegant elementary eligible eloquent elusive eminent emotional
empty endless enormous entire epic equal equivalent erratic essential eternal
ethical ethnic even evident evil exact excellent exceptional excess exotic
explicit expressive exquisite external extinct extra extraordinary extravagant extreme fabulous
faint fair faithful false familiar famous fancy fast fatal federal
feeble fellow female fertile fervent fickle fierce final fine
firm fiscal fit flat flawless flexible fluent fluffy fluid fond
foolish foreign formal former fortunate foul fragile frail frank frantic
free frequent fresh friendly frigid front frugal full fun fundamental
funny furious future fuzzy gallant generic generous genetic gentle genuine
giddy gigantic glad global glorious gloomy golden good gorgeous graceful
gradual grand graphic grateful grave gray great greedy green grim
gross grumpy guilty handsome handy happy hard harsh hasty healthy
heavy hectic hefty hidden high hilarious historic hoarse hollow holy
honest horizontal hostile hot huge humble humid hungry icy ideal
idle idyllic ill illegal immediate immense imminent immune implicit important impulsive
inevitable infamous informal inherent initial inner innocent intact integral intense
interior internal intimate intricate intrinsic invisible inward irate ironic jealous
joint jolly jovial joyful juicy junior just keen key kind
lame large late latent lateral lavish lax lazy lean left
legal legitimate lenient lethal liable liberal light likely limp linear
literal little lively local lofty logical lone lonely long loose
loud low loyal lucid lucky lukewarm lush luminous mad magnetic
main major male malicious mandatory manifest manual marine mature meager
mean meek mellow mental mere merry messy mid mild military
minor minute miserable mobile moderate modern modest moist molten moral
morbid mortal multiple mundane municipal mutual mute mysterious naive naked
narrow nasty national native natural naughty near neat necessary negative
nervous neutral new nice nimble noble nocturnal normal notable notorious
novel numb numerous obedient obese oblique oblivious obscure obsolete obstinate
obvious odd official old open optimal optimistic oral ordinary organic
ornate orthodox outdoor outer oval overall overt painful pale paramount
parallel partial particular passionate passive past patient peculiar pending perfect
perilous perpetual persistent personal pertinent petty physical pink pivotal plain
plausible pleasant plump polar polite poor popular portable possible potent
potential powerful practical precious precise pregnant premature premium presidential pretty
previous primary prime principal prior pristine private probable profound prominent
prone proper proud prudent public punctual pure purple quaint qualitative
quantitative quick quiet radiant radical rainy rampant rapid rare rational
raw ready real rear recent reckless red redundant regal regional
regular relevant reliable reluctant remote renowned resilient respective rich
right rigid rigorous ripe robust rosy rotten rough round routine
royal rural rustic ruthless sacred sad safe salient same sane
scarce scenic secondary secret secular secure senior sensible serene serious
several severe shabby shallow sharp sheer short shrewd shy sick
silent silly similar simple sincere single singular sinister skeptical slender
slick slight slim slow small smart smug sober social
soft solar sole solemn solid somber sore sorry sour spacious
spare sparse special specific spicy splendid spontaneous sporadic stale stark
stationary steady steep sterile stern sticky stiff still stout straight
strange strategic strict strong stubborn sturdy subsequent subtle successful such
sudden sufficient suitable sullen sunny superb superficial superior supreme sure
susceptible sweet swift tall tame tangible tart technical tedious temporary
tender tense tentative tepid terrible tidy tight timid tiny tired
top torrid tough toxic tragic tranquil transparent tremendous tricky trivial
true turbulent typical ugly ultimate unanimous uneasy unique universal unusual
upper upright urban urgent useful usual utter vacant vague vain
valiant valid vast verbal versatile vertical viable vibrant vicious vigilant
vigorous vile violent virtual visible vital vivid vocal void volatile
voluntary vulnerable warm wary weak weary weird wet white whole
wholesome wicked wide wild willing wise witty wooden worthy wrong
yellow young zealous
abdication aberration abolition abrasion abscess absorption abstraction acceleration acceptance accessory
accreditation accusation acquisition activation adaptation addiction adhesive adjustment admiration admission
adoption adoration advancement adventure adversity aeronautics affection affiliation affirmation affliction
aggression agility agriculture ailment alignment allegiance allergy alliance allocation allotment
allusion alteration altercation amendment amnesty amusement analogy anarchy anesthesia animation
annotation announcement annoyance anomaly anthropology anticipation anxiety apparition appointment appreciation
apprehension approval approximation aptitude arbitration archaeology archery architecture ardor argumentation
aristocracy armament arrangement arrogance articulation aspiration assembly assertion assignment assimilation
assistance association assumption assurance astronomy atrocity attachment attainment attendance attention
attraction auditory authenticity autobiography automation autonomy aversion aviation awareness
bacteria baggage bankruptcy baptism barricade behavior benediction benevolence betrayal beverage
bibliography bigotry biology biopsy blasphemy blockade bombardment bondage botany boycott
bravery brevity brutality bureaucracy burial calamity calculation calibration calligraphy candor
capitalism captivity carburetor cardiology cartography catastrophe causation celebration celebrity
censorship centrifuge certainty certificate certification cessation chancellor chaos chemistry
chivalry circulation circumference circumstance citation civilization classification clearance
clemency clergy climax closure coalition coexistence cognition collaboration collision
colonization combustion commandment commemoration commencement commentary commission commitment commotion
comparison compassion compatibility compensation competence complaint complexion complexity compliance complication
composure concentration conception concession condensation condition condolence conductor confederation
confession confidence configuration confinement confirmation confiscation conflict confrontation confusion congestion
conjecture conjunction conquest conscience consciousness consecration consensus consequence conservation
consideration consignment consistency consolation consolidation conspiracy constellation consternation constitution constraint
consultation consumption contamination contemplation contention contentment context continuation
contraction contradiction contraption contribution convention convergence conversation conversion conviction
conviviality coordination coronation corporation correction correlation correspondence corrosion corruption
counselor countdown courtesy covenant coverage creation credential credibility cremation
criterion criticism crusade cryptography culmination cultivation culture curvature customs
damnation database debris decadence deceit deception declaration
decoration dedication deduction defamation default defiance deficiency deficit deflation deformation
degradation dehydration deity dejection delegation deletion deliberation delicacy delinquency
deliverance delusion demeanor democracy demolition demonstration denial denomination density
denunciation departure dependence depiction depletion deployment deportation deposition depreciation depression
deprivation deregulation derivation descent desecration designation desolation despair desperation
destination destitution destruction detachment detention deterioration determination devaluation
devastation deviation devotion devolution diagnosis dictation dictatorship diction dictionary differentiation
diffusion digestion digression dilation diligence dimension diplomacy disagreement
disappearance disappointment disapproval disbelief discernment discharge disclosure discomfort discontent discord
discovery discrepancy discretion discrimination discussion disgrace disgust dishonor disillusion disintegration
dismay dismissal disobedience disorder disparity dispersion displacement disposal disposition disruption
dissatisfaction dissent dissertation dissolution distillation distinction distortion distraction distribution disturbance
divergence diversion diversity dividend divinity division divorce doctorate documentation domination
dominion donation dosage drudgery duplication duration dwelling dynamics
ecology economics ecosystem edification edition editorial eduction efficiency
effusion elasticity election electricity electrolysis elegance elevation eligibility elimination eloquence
emancipation embargo embarkation embezzlement emancipation emergence emigration eminence emission
emotion emphasis employment emporium empowerment emulation enactment enchantment encouragement endeavor
endowment endurance enforcement engagement engraving enjoyment enlargement enlightenment enrollment
enthusiasm entirety entitlement entrepreneur enumeration environment epidemic epilogue epiphany equation
equilibrium equity eruption escalation espionage establishment esteem estimation eternity
evacuation evaluation evaporation eviction evolution exaggeration examination excavation
exception excitement exclamation exclusion excursion execution exemption exhalation exhaustion exhibition
existence exodus expansion expectation expenditure experience expertise expiration exploration
explosion exposition exposure expulsion extension extermination extinction extortion
extraction extremity fabrication fascination fatality fatigue feasibility federation
fermentation ferocity fertility fidelity filtration flattery flotation fluctuation
forgery forgiveness formality formula foundation fragmentation framework fraternity
frequency friction friendship frivolity frustration fulfillment fumigation fusion futility
galvanization garrison gathering genealogy generality germination
glossary government graduation grandeur gratification gravitation gravity grievance
guidance gymnasium gymnastics habitation hallucination harassment hardware harmonization hesitation
hibernation hierarchy histology homage horticulture hospitality hostility humanism humiliation
humility hurricane hydraulics hygiene hypnosis hypothesis identity ideology idiom
illumination illustration imagination imitation immersion immigration immortality immunization impatience imperfection
implication importation imposition impression imprisonment improvement improvisation impulse impunity inaction
inauguration incarnation incentive inception inclination inclusion incompetence inconvenience incorporation indemnity
independence indication indifference indigestion indignation induction indulgence inertia infancy infatuation
infection inference inflammation inflation infliction influence influenza information infrastructure infusion
ingenuity inhalation inheritance inhibition injection injustice innovation inoculation inquiry inquisition
inscription insertion insolence insomnia inspection inspiration installation installment instigation institution
instruction insulation insurance insurgency insurrection integration integrity intellect intelligence intention
interaction interception interference interior interjection intermission interpretation interrogation interruption intersection
intervention intimacy intimidation intoxication intrusion intuition inundation invasion invention
investigation investment invitation invocation irrigation irritation isolation jubilation judgment junction
jurisdiction justification juvenile kinetics kinship laboratory laceration lamentation lamination
laughter laxity learning lecture legislation legislature legitimacy leisure leniency liability
liberation ligament likeness limitation lineage linguistics liquidation literacy litigation
locality location locomotion longevity lubrication luminosity machinery magistrate magnetism
magnification maintenance majesty malfunction malnutrition mandate manifestation manipulation mannerism
marketplace martyrdom masterpiece mechanism mediation meditation melancholy membership
mentality merriment metabolism metamorphosis methodology migration mineralogy
misconception misconduct misery misfortune moderation modesty modification
momentum monopoly monotony morality mortality motivation multitude mutation
mythology narration navigation necessity negligence negotiation neutrality nobility
nomination normality nostalgia notation notification notion nourishment novelty
nutrition obedience objection obligation obliteration observation obsession obstruction
occupation occurrence offering omission operation opposition oppression optimism
ordination orientation ornamentation oscillation ostentation ovation overture oxidation
pacification pagination parameter paralysis participation partition partnership passion pastime
paternity pathology patronage peculiarity pedestrian penetration perception
perfection performance perfusion permission perseverance persistence perspiration persuasion
perturbation pessimism pesticide petition philanthropy philosophy phonetics
physiology physique pigmentation pilgrimage plantation pluralism poise
polarity popularity population possession posterity postulate
precaution precision predicament prediction preference prehistory premonition preoccupation preparation
preposition prescription presentation preservation pressure prestige presumption prevention
probability probation procedure procession proclamation procrastination procurement production profession
proficiency progression prohibition projection proliferation prolongation promotion pronunciation propaganda
propagation proportion proposal proposition proprietor propulsion prosecution prosperity protection
provision provocation proximity psychiatry psychology puberty
punctuation purification pursuit qualification quarantine quotation radiation
ratification reaction realization rebellion recapitulation reception recession recitation
reclamation recollection recommendation reconciliation reconstruction recreation recruitment rectitude recuperation redemption
reduction redundancy refinement reflection reformation refraction refrigeration refusal refutation regeneration
regression regulation rehabilitation reimbursement reinforcement rejection relation relaxation relegation reliability
reliance religion relocation reluctance remembrance remuneration renaissance rendition renovation renunciation
reparation repentance repetition replacement replication repression reproduction repulsion requirement
requisition reservation reservoir residence residue resignation resistance respiration
restitution restoration restraint restriction resurgence resurrection retaliation retention retraction retribution
retrieval revelation reverence reversal revision revival revocation revolution
rotation saturation scarcity scrutiny seclusion secrecy secretion
sedation segregation selection sensation sentiment separation serenity servitude
significance simulation sincerity skepticism sobriety solidarity solitude
solution sophistication sovereignty specification spectator speculation splendor
spontaneity starvation statistics sterilization stimulation stipulation strangulation
subjugation submission subscription subsidy substance substitution subtlety
suffocation summary superstition supervision supplement supposition suppression supremacy
suspension suspicion syndicate synopsis synthesis taxation technology
temptation tenacity tendency termination terminology testimony
tolerance topography torment toxicity tradition trajectory
transaction transcription transfusion transgression transition translation transmission transplantation treatment
trepidation tuition turbulence tyranny unification
vaccination validation variation vegetation velocity veneration ventilation verification
vibration vindication violation visitation vocation
abacus algorithm alkali alloy alternator ammeter ampere amplifier amplitude anatomy
android anode antibody antigen antimony aorta aperture apogee arsenic artery
asteroid astronaut atom avionics axiom bandwidth barometer battery
benzene binary biochemistry biosphere bismuth bit blockchain bluetooth boson browser
buffer byte cache calcium calculus capacitor carbohydrate carbon cardiovascular cartilage
cathode cellulose centimeter chloride chlorine chromium chromosome circuitry
cobalt codec cortex cosine cursor cybernetics data debugger decibel
decimal dendrite detector diode dioxide diskette domain dopamine download
dropdown electrode electromagnet electron element ellipse embolism emulator
encryption entropy enzyme epidermis equation ester ethanol ethernet
exponent femur fiberglass firewall firmware fluoride formaldehyde fractal frequency
fulcrum fuselage galaxy gamma gastric gearbox generator genome gigabyte
glucose gluten graphite gravity gyroscope hardware helium hemoglobin hertz hexagon
hormone hydrate hydraulic hydroxide hypotenuse inductor insulin interface internet
ion iridium isotope kelvin kernel keyword kilobyte kinase laptop
larynx latency lithium logarithm magnesium magnum malware manganese matrix megabyte
membrane mercury metadata methane microbe microchip microprocessor microscope
microwave modem modulus molecule momentum monoxide morphine
nanometer nebula neon nephron neuron neutrino neutron niacin nicotine nitrate
nitrogen node nucleotide ohm optics orbit oscillator osmosis
parabola parser particle pathogen pendulum pentagon peptide perigee peroxide
pharmaceutical phosphate photon physics pixel placenta plasma platelet plutonium pointer
polygon polymer polynomial positron potassium processor programmer propane
protocol proton prototype pulley quantum quark quartz qubit radium radius
reactor receptor rectangle register relay resistor resistance retina rhombus
robotics router salinity sapphire scalar schema sediment semiconductor sensor serotonin
server silicon sine sinus socket sodium software solvent sonar spacecraft
spectrometer spreadsheet stamina steroid stratosphere sulfate surgery syntax
tangent telemetry template tendon terabyte testosterone tetanus theorem thermometer thermostat
thorax thyroid titanium toolbar torque toxin trachea transformer transistor trapezoid
trigonometry tungsten turbojet ultrasound upload uranium urethane username vaccine
vector vertex vertigo viscosity voltage volt watt wavelength webcam website
wifi workflow zirconium
accountant activist actor actress adjudicator administrator adviser advisor aide ambassador
analyst anthropologist apprentice arbiter archaeologist archbishop archivist artist assassin assessor
astronomer athlete attendant auditor babysitter baker ballerina banker
barrister bartender biologist blacksmith bodyguard botanist broker builder butcher
cameraman candidate captain cardiologist caretaker cartographer cartoonist cashier chairman
chancellor chaplain chemist choreographer cleric clown coach collector columnist comedian
commentator commissioner composer comptroller concierge conductor consul consultant contractor cook
coroner correspondent councilman counselor courier craftsman critic curator custodian dancer
dean dentist dermatologist designer detective dictator diplomat director dispatcher diver
doctor doorman dramatist drummer economist editor electrician engineer entertainer
entrepreneur envoy ergonomist examiner executioner executor explorer exporter
farmer financier firefighter fisherman florist forester founder freelancer gardener
geologist goalkeeper goldsmith governess governor guard guitarist gunner gynecologist hairdresser
handyman headmaster historian horticulturist hygienist illustrator importer inspector
instructor intern interpreter inventor investigator investor janitor jester jeweler journalist
judge juggler jurist laborer landscaper librarian lifeguard linguist
lobbyist locksmith lyricist magician magistrate manager manicurist masseur mathematician
mayor mechanic mediator medic mentor merchant messenger meteorologist midwife
milkman miner minister missionary moderator motorist musician narrator naturalist navigator
negotiator neurologist notary novelist nutritionist oculist oncologist operator
ophthalmologist optician optometrist organist ornithologist orthodontist paleontologist paralegal paramedic
pathologist patrolman pediatrician pharmacist philosopher photographer physician physicist
physiotherapist pianist plumber poet policeman politician pollster postman preacher
principal producer professor prosecutor psychiatrist psychologist publicist publisher
radiologist ranger realtor receptionist rector referee registrar regulator reporter researcher
sailor salesman scholar scientist scout sculptor secretary senator sheriff
singer sociologist solicitor soloist specialist spokesman sponsor statesman
stenographer stockbroker stonemason strategist stylist superintendent supervisor surveyor
technician tenor therapist trader translator treasurer trustee
typist umpire undertaker urologist valet veterinarian violinist vocalist waiter waitress
warden watchman welder zoologist
accounting advertising banking beginning bearing bedding blessing boxing briefing
building casing clothing computing coating crossing dwelling dressing engineering ending
evening farming feeling fencing finding fishing fitting footing gathering
handwriting hearing heading housing hunting landing learning lightning lining listing
lodging longing marketing meaning meeting mining morning offering opening outing
padding painting paving planning plumbing printing publishing racing ranching
reasoning recording roofing sailing saying schooling scouting seasoning seating
serving setting shipping shooting siding sighting spelling standing suffering
surfing sightseeing timing trading training undertaking understanding upbringing warning
wedding welding wellbeing whaling winning wiring wording
accustomed advanced aged alleged armed ashamed assorted beloved bowed
celebrated civilized complicated concerned concerted crooked crowded cultured curved detailed
devoted distinguished dotted educated established esteemed excited experienced fabled fatigued
gifted heated hooked hunched jagged learned marked motivated noted
pointed polished renowned reserved retired rugged sacred seasoned skilled sophisticated
spirited spotted striped talented tangled tinted twisted unexpected varied wicked
african american arabic asian australian austrian belgian brazilian british bulgarian
canadian caribbean chilean chinese colombian croatian cuban czech danish dutch
egyptian english estonian ethiopian european filipino finnish french german greek
hungarian icelandic indian indonesian iranian iraqi irish israeli italian jamaican
japanese jewish kenyan korean latin lebanese lithuanian malaysian mexican moroccan
nigerian norwegian pakistani persian peruvian polish portuguese romanian russian
scandinavian scottish serbian singaporean slavic somali spanish swedish swiss syrian
thai tibetan turkish ukrainian venezuelan vietnamese welsh
january february march april may june july august september october
november december monday tuesday wednesday thursday friday saturday sunday
almanac anniversary calendar decade era fortnight midday midweek semester
trimester weekday yesterday today tomorrow tonight
appetizer bagel basil batter biscuit brisket broccoli brownie burger burrito
cashew casserole caviar celery cereal cheddar cherry chili chowder chutney
cilantro clove cobbler cookie coriander cracker crepe croissant crouton cupcake
curry custard dough doughnut dumpling eggplant enchilada fajita falafel
fillet flapjack fondue frosting fudge garnish gelatin gherkin gingerbread gnocchi
granola gravy gruel guacamole gumbo hamburger hazelnut hummus icing jerky
kebab ketchup lasagna lentil licorice lollipop macaroni mango marinade marmalade
marshmallow mayonnaise meatball meringue milkshake muffin noodle nougat nutmeg omelette
oregano pancake paprika parfait parmesan pastrami pate pepperoni pesto pickle
pilaf pita pizza popcorn pretzel pudding quiche ravioli relish risotto
salsa sashimi scone shortbread smoothie sorbet souffle soy spatula
sprout steak stew strudel sushi taco tamale tangerine tapioca
teriyaki toffee tofu tortilla truffle turmeric vanilla waffle wasabi yogurt
zucchini
archery badminton baseball basketball billiards bobsled bowling boxing canoeing cricket
curling cycling darts decathlon diving dodgeball fencing football
golf gymnastics handball hockey hurdle javelin jogging judo karate kayak
lacrosse marathon netball parkour pentathlon polo regatta rowing rugby
skating skiing snooker snowboard softball sprinting squash surfing
tennis triathlon volleyball weightlifting wrestling yoga
anthem aria ballad banjo baritone bass cello chorale clarinet concerto
conga cymbal drumming ensemble falsetto fanfare flamenco fugue harmonica
lullaby mandolin melody metronome opera operetta oratorio orchestra percussion piccolo
polka quartet quintet refrain reggae rhapsody saxophone serenade sonata soprano
symphony tambourine tango tempo timpani trombone tuba ukulele viola
waltz xylophone
agenda arrears audit ballot barter bid bond boycott branding
brochure budget bulletin bureau cartel clientele collateral commerce
conglomerate consortium contraband copyright coupon creditor currency deed
deficit dividend dossier embargo entrepreneurship equity escrow expenditure franchise fraud
freight goodwill grant invoice layoff leasing ledger levy
liaison logo lease margin memo memorandum merger monopoly mortgage
outsourcing overhead patent payroll pension perk portfolio premium procurement profit
quota rebate receipt recession refund remittance retailer revenue royalty
salary stipend subsidy surcharge tariff trademark turnover
venture voucher wage warranty wholesale
acquittal affidavit alibi alimony amnesty annulment appellate arraignment arson bail
bailiff bylaw clemency codicil custody decree defendant deposition
embezzlement extradition felony forfeiture indictment injunction
larceny libel litigant manslaughter misdemeanor notary parole perjury plaintiff
plea precedent probate repeal statute subpoena summons testimony tort
verdict warrant
avatar blog chatroom cyberspace download email emoji hashtag homepage hyperlink
inbox login logout multimedia newsletter offline online password podcast
profile screenshot smartphone spam streaming tablet upload weblog wiki
abdominal aerobic alkaline amphibious anatomical ancestral angular aquatic arboreal astral
atmospheric auditory bacterial barometric behavioral biochemical bionic botanical bovine
cardiac carnivorous celestial cellular cerebral chemical chronological circulatory clinical coastal
colossal congenital coronary cosmic cranial cutaneous dental dermal dietary digestive
dorsal ecological electrical electronic embryonic endocrine environmental enzymatic equatorial
esophageal evolutionary facial fecal femoral fetal floral fluorescent follicular forensic
fungal gastrointestinal genealogical geographical geological geometric geothermal glacial glandular
gravitational herbal hereditary hormonal hygienic igneous inorganic intestinal intravenous
lunar lymphatic magnetic mammalian marine maternal mechanical medical medicinal membranous
metabolic metallic meteorological microbial mineral molecular muscular nasal nautical
neural neurological nuclear numerical nutritional oceanic olfactory optical orbital organic
ornamental orthopedic osseous ovarian oxidative pancreatic parasitic pastoral paternal pediatric
pelvic perennial peripheral pharmaceutical planetary pneumatic polar postal
prenatal pulmonary radioactive renal reproductive respiratory retinal rhythmic seismic sensory
"""  # noqa: E501  (photographic/microscopic deliberately absent — golden-conflated)

_LEXICON_TEXT_3B = """
sidereal skeletal solar spatial spinal statistical stellar sterile structural subatomic
subterranean surgical symmetrical synthetic telescopic terrestrial thermal tidal topical
tropical ultraviolet umbilical uterine vascular vegetal venous ventral vertebral veterinary
viral visual vocal volcanic zoological
abalone albatross alpaca anaconda anchovy antelope armadillo baboon badger barnacle
barracuda beagle beaver bedbug bloodhound boar bobcat buffalo bullfrog bumblebee
buzzard camel canary caribou cassowary caterpillar catfish centipede chameleon cheetah
chickadee chimpanzee chinchilla chipmunk cobra cockatoo cockroach condor cougar coyote
crayfish cricket crocodile crustacean cuckoo dachshund dalmatian dingo dolphin donkey
dormouse dragonfly duckling eagle earthworm earwig echidna eggplant egret elephant
elk emu ermine falcon ferret finch firefly flamingo flea flounder
fowl gazelle gecko gerbil gibbon gnat gnu goldfish gopher gorilla
grasshopper greyhound grizzly groundhog grouse gudgeon guppy haddock halibut hamster
hare hedgehog heron herring hippo hornet hound hummingbird hyena ibis
iguana impala jackal jackrabbit jellyfish kangaroo katydid kingfisher kiwi
ladybug lamprey lark lemming lemur leopard lioness lizard llama lobster
locust lynx macaw mackerel magpie mallard mammoth manatee mandrill mantis
marmoset marmot marsupial mastiff meerkat millipede mink minnow mockingbird mole
mongoose monkey moose mosquito moth mule mussel newt nightingale ocelot
octopus opossum orangutan oriole osprey ostrich otter owl ox oyster
panda panther parakeet parrot partridge peacock pelican penguin perch pheasant
pigeon piranha platypus plover pony porcupine porpoise possum poultry prawn
primate puffin puma python quail rabbit raccoon ram rat raven
reindeer rhinoceros roach robin rodent rooster salamander salmon sardine scorpion
seagull seahorse shark sheepdog shrimp skunk sloth slug snail snake
sparrow sphinx spider squid squirrel stallion starfish stingray stork sturgeon
swallow swan swordfish tadpole tapir tarantula termite terrier toad tortoise
toucan trout turkey turtle viper vulture wallaby walrus warbler wasp
weasel whale wildcat wolverine wombat woodchuck woodpecker worm wren yak
acacia alder alfalfa algae aloe amaryllis anemone aspen aster azalea
bamboo baobab barley bayberry begonia birch blackberry blossom bluebell bramble
buttercup cabbage cactus camellia carnation cattail cedar chestnut chrysanthemum clover
columbine conifer cornflower cowslip crocus cypress daffodil dahlia daisy dandelion
dogwood ebony edelweiss elm eucalyptus evergreen fern fir flax forsythia
foxglove fuchsia gardenia geranium ginkgo gladiolus goldenrod gooseberry gorse hawthorn
hazel heather hemlock hibiscus holly hollyhock honeysuckle hyacinth hydrangea iris
jasmine juniper kelp kudzu larch larkspur laurel lavender lichen lilac
lily lotus lupine magnolia mahogany mangrove maple marigold mimosa mistletoe
moss mulberry mushroom myrtle narcissus nasturtium nettle oak oleander orchid
pansy papyrus peony periwinkle petunia pine poinsettia poplar poppy primrose
pumpkin redwood reed rhododendron rhubarb rose rosebud rye saffron sage
sagebrush sapling seaweed sequoia shamrock shrub snapdragon snowdrop spruce sunflower
sycamore thistle thorn thyme tulip tumbleweed verbena vine violet walnut
waterlily wheat willow wisteria yarrow yew zinnia
archipelago basin bayou bluff butte cairn caldera cape cliff cove
crag crevasse delta drift dune eddy escarpment fjord floodplain foothill
geyser glacier glen gorge grotto gulch gully headland highland hillock
hinterland iceberg inlet isthmus knoll lagoon lowland mesa monsoon moraine
oasis outcrop peninsula plateau prairie quagmire rapids ravine reef ridge
riverbank savanna seabed shoal sinkhole steppe strait summit swale tarn
thicket tributary tundra upland watershed wetland
blizzard breeze chill cloudburst cyclone downpour drizzle fog frost gale
gust hail heatwave humidity lightning mist monsoon rainfall sleet slush
smog snowfall squall tempest thaw thunderstorm tornado whirlwind windchill
apron armchair ashtray basin bathtub bedspread blanket blender bookcase broom
bucket bureau candlestick carafe carpet chandelier coaster colander comforter cot
crib cupboard curtain cushion decanter doormat drape dresser duvet dustpan
faucet flannel footstool futon grater griddle hamper hassock headboard hearth
kettle ladle lampshade linen mantel mixer mop nightstand ottoman pantry
pillowcase pitcher placemat platter quilt recliner rug saucepan scissors shelf
shutter sideboard sink skillet sofa sponge spout stool strainer tablecloth
teaspoon thermos tong tray trivet tureen urn vase wardrobe whisk
anorak beanie beret blazer blouse bodice boot bowtie brogue buckle
cardigan chinos cloak clog corset cravat cufflink dungarees earmuff espadrille
fedora fleece galoshes garter gauntlet gown headband hoodie jersey jumpsuit
kimono legging leotard loafer loincloth mitten moccasin muffler necktie nightgown
overall overcoat pajama parka petticoat pinafore poncho pullover raincoat robe
sandal sarong sash scarf shawl slipper sneaker sock stocking suspenders
sweater sweatshirt trench trouser tunic turban tutu tuxedo undershirt vest
visor waistcoat wellington windbreaker
affection agony amazement ambition angst anguish annoyance apathy awe bliss
boredom candor compassion contempt contentment courage cowardice craving delight despair
disdain disgust dismay dread ecstasy elation embarrassment empathy enthusiasm envy
euphoria exasperation excitement fondness frustration fury glee gloom gratitude greed
grief guilt hatred homesickness hope horror humility hysteria indignation
infatuation jealousy joy loathing loneliness longing love lust malice melancholy
misery nostalgia optimism outrage panic paranoia passion pessimism pity pride
rage regret relief remorse resentment reverence sadness satisfaction scorn serenity
shame shock sorrow spite sympathy tenderness terror thrill vengeance wonder
wrath zest
amble appease argue ascertain backtrack baffle barge bask bawl beckon
bellow bemoan berate beseech bestow bewilder bicker blabber blurt bluster
bombard brandish bristle brood browbeat budge bungle burrow cajole capsize
careen carouse cavort chide chortle chuckle clamber clank clatter coax
cobble commandeer concoct connive contort convulse cower cringe croak croon
decry deface defame delve demean denigrate deride despair disdain dismantle
divulge dote douse dwindle elude embellish embroil emote encircle engrave
engulf enrage enthrall entangle entreat envelop evade exacerbate exalt exasperate
exhort expound extol falter fathom feign fester fidget flail flaunt
flinch flit flounder fluster foist forgo fortify fray frolic fume
gallivant galvanize gawk gloat gobble goad grapple grovel guzzle hamper
hanker harangue harass heave heckle hobble hoist hoard hound huddle
hustle idolize impede incite infuse instill jeer jostle juggle lament
languish lash latch laud lavish limber loathe loiter lull lumber
lunge lurch maim malign mangle maul meander meddle mend mingle
mope muse muster nag nestle nibble ogle ooze oust pamper
pander parch peruse pester pilfer pine placate plod plummet pounce
preen prod prowl pry quell quench quiver ramble ransack rant
ravage rave ravish rebuff rebuke recoil recount redouble relent relish
renege repent reprimand reproach repudiate revel revere rile rummage rupture
salvage saunter savor scamper scavenge scoff scour scowl scurry seethe
sever shun shudder simmer skulk slither smolder smother snarl snub
squander squirm stagger stammer stifle stoke stow strut stymie subdue
succumb sulk swagger swerve swindle swoon swoop tarnish taunt thrash
thwart topple trudge undulate unravel vanquish veer vex wallow wane
waver wheeze whittle wield wilt wince writhe
abutment alcove annex archway atrium awning balustrade banister barricade bastion
battlement belfry buttress casement catacomb cloister colonnade cornice crypt cupola
dovetail dormer drawbridge eave facade gable gargoyle gazebo girder
joist keystone lintel mantelpiece mezzanine minaret moat mullion niche parapet
pediment pergola plinth portcullis portico rafter rampart rotunda scaffold
spire staircase steeple stucco transom trellis truss turret vestibule
adhesive alabaster asbestos bitumen brocade burlap cashmere cellophane chintz
cork corduroy denim enamel felt fiberglass flannel foil gabardine gauze
gingham granite graphite gravel grout gypsum lacquer laminate latex
linoleum lint marble mortar muslin obsidian organza parchment pewter plaster
plexiglass plush polyester porcelain pumice quartzite rattan rayon resin
sealant shale shellac slag slate solder suede taffeta tarpaulin terracotta
tinfoil tweed twill veneer vellum vinyl wax wicker
anvil auger awl bellows blowtorch caliper chisel clamp cleaver crowbar
drill file forceps gimlet grindstone hacksaw hoe jackhammer jigsaw
lathe level mallet pickaxe pitchfork plane pliers pulley rasp ratchet
sander scalpel scythe shears shovel sickle sledgehammer spade spanner
stapler tongs trowel tweezers vise winch wrench
acetate acetone ammonia amide barium benzene borax bromine butane cadmium
calcite carbonate cellulose chlorophyll cholesterol citrate cobalt collagen cortisone cyanide
dioxide electrolyte emulsion fructose gelatin glycerin iodine keratin
lactose lanolin lecithin lignite lipid menthol methanol naphtha nitroglycerin
octane oxide ozone pectin pentane peptide pigment polymer propane quinine
reagent saccharin silica solute solvent starch sucrose tannin toluene turpentine
urea vitriol
aphelion asteroid aurora binary comet constellation corona cosmos eclipse ecliptic
galaxy meteorite nadir nova observatory parallax parsec perihelion planetarium pulsar
quasar satellite solstice supernova telescope zodiac
reappear rearrange reassemble rebuild recapture recharge reclaim reconnect reconsider recreate
redirect rediscover redo reenter refill refill reheat reinstate reintroduce rejoin
rekindle reload relocate remarry rename reopen reorganize repaint rephrase replant
replay reprint reread reroute reschedule reshape restate restructure resupply retell
rethink retrace retrain retry reunite reuse revisit rewind reword rework
rewrite unbind unbuckle unbutton unclog uncover undress unearth unfasten unhook
unload unmask unpack unplug unravel unroll unscrew unseat untangle untie
unveil unwind unwrap unzip outbid outdo outgrow outlast outlive outnumber
outpace outperform outrun outsell outshine outsmart overreach overcharge overcook overdo
overeat overestimate overflow overhear overheat overload overpay overpower overrate overreact
override overrule overrun oversee overshadow oversleep overspend overstate overtake overthrow
overturn overuse overwork underachieve undercut underestimate undergo underline undermine underpay
underperform underrate underscore understate undertake undervalue underwrite
achievable actionable adaptable adjustable admirable adorable advisable affordable agreeable amenable
amicable applicable approachable arable attainable avoidable bearable believable biodegradable breakable
breathable changeable chargeable commendable comparable conceivable configurable considerate culpable curable
customizable debatable definable dependable deplorable desirable detachable detectable disposable drinkable
durable editable employable enforceable enjoyable enviable excusable expandable explainable
favorable fashionable foldable forgivable formidable habitable honorable hospitable imaginable impeccable
inflatable insufferable laudable manageable measurable memorable navigable negotiable noticeable objectionable
obtainable palatable payable perishable permissible plausible portable predictable preferable presentable
printable profitable programmable punishable quantifiable questionable reachable readable rechargeable recognizable
recyclable redeemable refillable refundable regrettable remarkable removable renewable repairable repeatable
respectable retractable returnable reusable reversible salvageable scalable searchable serviceable sociable
sustainable tolerable traceable trainable transferable understandable unmistakable upgradable usable variable
venerable verifiable viable washable watchable workable
aimless ageless blameless boundless breathless careless ceaseless childless clueless colorless
countless dauntless defenseless doubtless effortless endless faceless faithless fearless flawless
flightless formless friendless fruitless guiltless hapless harmless heartless heedless helpless
homeless hopeless jobless landless lawless lifeless limitless listless meaningless merciless
mindless motionless nameless noiseless odorless painless paperless penniless pointless powerless
priceless reckless regardless relentless restless ruthless seamless seedless selfless senseless
shameless shapeless sleeveless speechless spineless spotless stainless tactless tasteless thankless
thoughtless timeless tireless toothless useless weightless wireless witless wordless worthless
bashful blissful bountiful cheerful colorful deceitful delightful disdainful disgraceful distasteful
doubtful dreadful dutiful eventful fanciful fateful fearful fitful forceful forgetful
fretful fruitful graceful grateful harmful hateful healthful helpful hopeful hurtful
insightful joyful lawful masterful merciful mindful mournful neglectful painful peaceful
pitiful playful plentiful prideful purposeful regretful remorseful resentful resourceful respectful
restful rightful scornful shameful sinful skillful sorrowful spiteful successful tactful
tasteful tearful thankful thoughtful truthful uneventful ungrateful unlawful useful vengeful
watchful willful wishful wistful wonderful wrathful youthful zestful
adventurous ambiguous amorous arduous auspicious barbarous blasphemous boisterous bulbous cancerous
cantankerous capricious cavernous censorious chivalrous conspicuous contagious contemptuous continuous courteous
covetous credulous dangerous deciduous delirious devious dubious envious fabulous felicitous
ferocious fibrous fortuitous frivolous furious generous glamorous gracious gratuitous gregarious
grievous hazardous hideous hilarious humongous humorous igneous industrious infectious ingenious
iniquitous innocuous insidious instantaneous intravenous jealous joyous laborious lecherous ludicrous
luminous lustrous luxurious malicious marvelous melodious meticulous miraculous mischievous momentous
monotonous monstrous mountainous mysterious nebulous nefarious nervous numerous nutritious oblivious
obnoxious odious ominous onerous outrageous perilous pernicious pious poisonous pompous
ponderous porous precarious precious precipitous predacious presumptuous pretentious previous prodigious
prosperous pugnacious querulous rambunctious rapturous raucous ravenous rebellious ridiculous righteous
rigorous riotous sanctimonious scandalous scrumptious scrupulous sensuous serious simultaneous slanderous
spacious spontaneous spurious strenuous studious sumptuous superfluous superstitious suspicious synonymous
tedious tempestuous tenacious tenuous thunderous torturous treacherous treasonous tremendous tumultuous
ubiquitous unanimous unconscious unscrupulous vainglorious valorous vaporous various venomous vicarious
victorious vigorous virtuous vivacious voluminous voracious wondrous zealous
amateurish babyish boorish boyish childish churlish devilish feverish foolish garish
ghoulish girlish hellish impish lavish loutish mannish mulish outlandish peevish
prudish sheepish skittish sluggish snobbish squeamish stylish swinish ticklish waspish
aerodynamics anthropology archaeology astrology astronomy bacteriology biotechnology cardiology cartography climatology
cosmology criminology cryptology dermatology ecology economics embryology entomology epidemiology ergonomics
ethnology etymology genealogy genetics geochemistry geophysics gerontology herpetology histology horticulture
hydrology ichthyology immunology kinesiology lexicography limnology meteorology microbiology mineralogy morphology
mycology neurology numismatics oceanography oncology ontology ophthalmology ornithology paleontology pathology
pedagogy petrology pharmacology philology phonology photography phrenology physiology psychiatry psychology
radiology seismology semantics sociology taxonomy theology toxicology virology volcanology zoology
acolyte altar angelology apostle baptism blessing cantor catechism chalice cherub
clergy communion confessional congregation covenant crucifix deacon devotion diocese disciple
doctrine evangelism exorcism friar gospel hermitage hymnal icon incense liturgy
martyr miracle monastery mosque novena nunnery pagoda parish penance pilgrim
prayer prophet psalm pulpit relic reliquary requiem ritual rosary sacrament
sanctum scripture seminary sermon shrine synagogue tabernacle temple theology vestment
ambush armada armistice arsenal artillery barrage battalion bayonet blockade bombardment
brigade camouflage cavalry ceasefire commando conscription convoy detonation flotilla fortification
garrison grenade infantry insurgent invasion logistics maneuver militia mobilization munitions
offensive platoon reconnaissance regiment reinforcement salvo siege skirmish squadron stratagem
trench truce vanguard
airliner airship barge biplane bobsled buggy bulldozer cabriolet camper canoe
caravan cargo carriage catamaran chariot chopper clipper coach convertible conveyance
cruiser cutter dinghy dirigible dogsled ferry forklift freighter frigate galleon
glider gondola hatchback hearse helicopter hovercraft jalopy jetliner kayak ketch
limousine locomotive minivan monorail moped motorboat motorcycle omnibus paddleboat pedicab
propeller raft ricksha rickshaw rowboat schooner scooter seaplane sedan skiff
sled sleigh sloop snowmobile snowplow speedboat stagecoach steamboat steamer streetcar
submarine subway tanker taxicab toboggan tractor trailer trawler tricycle trolley
tugboat unicycle wagon wheelbarrow yacht zeppelin
aeon afternoon autumn century dawn daybreak daytime decade dusk epoch
eternity evening forenoon fortnight hour instant interim interlude jiffy lifetime
midnight millennium minute moment month morrow nightfall noon season second
semester springtime summer sunrise sunset twilight week weekend winter year
yesteryear
armful batch bushel centimeter couple dollop dozen fathom fistful fraction
gallon gram handful heap hectare inch iota jumble kilogram kilometer
liter majority minority modicum morsel mouthful multitude myriad ounce percentage
pinch pint plethora portion pound quart quota ream scad smidgen
spoonful surplus tablespoon teaspoon trifle
abdomen ankle artery backbone biceps bladder bosom brow cheekbone clavicle
collarbone cornea cranium diaphragm earlobe elbow eyeball eyelash eyelid femur
fibula fingernail fingertip forearm forehead gallbladder gullet gum hairline hamstring
heel hipbone instep jawbone kneecap knuckle larynx ligament lobe lung
midriff mole mustache nape navel nostril palate pancreas pelvis pore
rib ribcage scalp shin shinbone sinew skull spleen sternum tailbone
temple tendon thigh thorax throat thumb tibia toenail tonsil torso
trachea triceps vein vertebra windpipe wrinkle wrist
amber aquamarine azure beige burgundy charcoal chartreuse cobalt crimson cyan
ebony emerald fuchsia indigo ivory khaki lavender lilac magenta maroon
mauve ochre olive pastel periwinkle russet saffron scarlet sepia sienna
silver tan taupe teal turquoise ultramarine umber vermilion
circle cone crescent cube cylinder decagon diamond dodecahedron ellipse heptagon
hexagon octagon octahedron oval parallelogram pentagon polygon prism pyramid quadrilateral
rectangle rhombus semicircle sphere spiral square tetrahedron trapezoid triangle wedge
baste blanch braise brine caramelize churn cure deglaze devein dice
drizzle ferment flambe fillet fold garnish glaze grate grill julienne
knead marinate mash microwave mince parboil pare pickle poach puree
render roast saute scald scramble sear season shred simmer skewer
skim steam steep stew tenderize toast whisk zest
applique batik beadwork bonsai calligraphy crochet decoupage embroidery enamelware filigree
glassblowing knitting lacework macrame marquetry millinery mosaic needlepoint needlework origami
patchwork pottery quilting scrimshaw stenciling taxidermy tilework tinsmith topiary weaving
whittling woodwork
abstraction actuality ambivalence anomaly antithesis apotheosis archetype axiom banality brevity
catalyst catharsis causality coherence conjuncture connotation construct continuum conundrum corollary
counterpart criterion dichotomy duality dynamism enigma entity epitome essence ethos
exemplar framework genesis gestalt hallmark hierarchy hypothesis impetus inference juxtaposition
leitmotif lexicon metaphor microcosm milieu modality motif nuance paradigm paradox
parameter pastiche pathos perspective phenomenon polarity postulate pragmatism precept premise
presupposition prototype quintessence rationale rubric schema spectrum stereotype substrate syllogism
synergy synthesis tautology template tenet threshold trope veracity zeitgeist
amble canter careen cartwheel clamber dart dash flit gallop hike
hobble jaunt limp lope lurch march mosey pace pedal pirouette
plod prance promenade ramble sashay scamper scoot scuttle shamble shuffle
sidle skedaddle skitter somersault sprint stampede stomp stride stroll strut
swagger tiptoe toddle traipse tramp trek trot trudge vault waddle
babble banter blab blather chatter chitchat converse declaim drone enunciate
exclaim gab gush harp intone jabber mumble murmur natter orate
palaver parley pontificate prattle proclaim pronounce quip recite rhapsodize soliloquize
spout stammer stutter vocalize whine yammer
anchorage acreage arbitrage blockage breakage brokerage carnage coinage cribbage
drainage dotage foliage forage haulage leakage leverage linkage mileage
mirage montage moorage outage parentage peerage pillage plumage postage
poundage roughage seepage sewage shrinkage signage slippage spillage spoilage
stoppage storage suffrage tillage tonnage tutelage umbrage vantage verbiage
vicarage vintage voltage wastage wattage wreckage yardage
bakery brewery bribery butchery cannery chicanery confectionery creamery crockery cutlery
debauchery delivery distillery drapery fakery finery fishery gadgetry gallantry greenery
grocery hatchery hosiery imagery jewelry joinery lottery mastery midwifery mockery
nursery perfumery periphery puppetry quackery recovery refinery revelry robbery rookery
savagery scenery shrubbery slavery snobbery sorcery tannery thievery treachery trickery
upholstery weaponry winery wizardry
apricot artichoke asparagus beetroot cantaloupe cauliflower chickpea clementine cranberry cucumber
currant eggplant elderberry endive fennel gooseberry grapefruit guava honeydew huckleberry
kale kohlrabi kumquat lychee mulberry nectarine okra parsnip pear persimmon
plantain pomegranate pomelo quince radicchio rhubarb rutabaga scallion shallot spinach
tangelo watercress watermelon yam
farewell goodbye greeting handshake hello howdy hug salutation welcome
ado agony alias alibi antidote armful avalanche awe ballyhoo bedlam
blemish blunder bonanza boon brouhaha calamity charade chore commotion conniption
debacle deluge dirge duress epitaph errand fiasco finesse flair fluke
folly fracas frenzy gaffe gimmick gist grudge gusto hassle havoc
heyday hindrance hoax hubbub hunch imbroglio innuendo jamboree jinx karma
kerfuffle knack lark limbo lull malaise mayhem melee mishap muddle
nicety omen ordeal panache pandemonium paragon pariah pitfall plight ploy
predicament prowess quandary quirk respite rigmarole ruckus rumpus ruse savvy
shindig snafu snag solace spree stint swindle tizzy turmoil tussle
uproar vendetta verve whim windfall zeal
adulthood boyhood brotherhood childhood falsehood fatherhood girlhood knighthood likelihood livelihood
manhood motherhood nationhood neighborhood parenthood priesthood sainthood sisterhood statehood widowhood
womanhood
airmanship apprenticeship authorship censorship chairmanship championship citizenship companionship comradeship courtship
craftsmanship dealership dictatorship fellowship flagship guardianship hardship horsemanship internship kinship
ladyship leadership lordship marksmanship membership mentorship ownership partnership penmanship premiership
professorship readership receivership relationship salesmanship scholarship seamanship showmanship sponsorship sportsmanship
statesmanship stewardship swordsmanship township trusteeship workmanship worship
absolutism activism altruism anachronism antagonism asceticism atheism barbarism behaviorism bilingualism
bolshevism buddhism capitalism catechism catholicism classicism collectivism colloquialism colonialism commercialism
communism conformism conservatism consumerism cubism cynicism darwinism despotism determinism dualism
dynamism egotism elitism empiricism environmentalism escapism euphemism exorcism expressionism extremism
fanaticism fascism fatalism favoritism federalism feminism feudalism formalism fundamentalism futurism
hedonism heroism hinduism humanism hypnotism idealism imperialism impressionism individualism industrialism
institutionalism islam journalism judaism legalism liberalism localism magnetism mannerism materialism
mechanism mercantilism militarism minimalism modernism monotheism mysticism narcissism nationalism naturalism
nepotism nihilism objectivism opportunism optimism pacifism paganism parallelism parochialism paternalism
patriotism perfectionism pessimism plagiarism pluralism polytheism populism positivism pragmatism professionalism
protectionism provincialism puritanism racism radicalism rationalism realism recidivism regionalism relativism
romanticism secularism separatism skepticism socialism stoicism surrealism syllogism symbolism terrorism
totalitarianism tourism traditionalism tribalism unionism utilitarianism vandalism vegetarianism ventriloquism vocalism
volunteerism witticism
blackboard bookbag chalkboard classroom coursework curriculum detention dormitory flashcard gradebook
graduation gymnasium homework kindergarten notebook playground preschool principal recess registrar
report schoolyard semester syllabus textbook truancy tuition valedictorian yearbook
backgammon billiards bingo charades checkers chess crossword darts dominoes hopscotch
horseshoes jigsaw lottery mahjong marbles monopoly pinball poker puzzle riddle
roulette scrabble solitaire sudoku trivia tug
bookmark boot browse click crash debug decrypt defragment download email
encrypt format hack initialize install livestream log network patch ping
pixelate program reboot recompile reconfigure refresh reinstall retweet scroll spellcheck
sync troubleshoot tweet uninstall unsubscribe
airy bony bossy brainy brawny breezy bubbly bulky bumpy burly
cheeky chewy choppy chubby chunky clammy classy comfy corny crabby
craggy cranky creaky creamy creepy crispy cuddly dainty dingy dodgy
dowdy dreamy dressy droopy drowsy dusty earthy edgy feisty filmy
fishy flabby flaky flashy fleshy flimsy floppy foamy foggy frosty
frothy fruity funky fussy gaudy gawky glassy glitzy glossy grainy
greasy grimy gritty groggy grouchy grubby grungy gutsy hairy hardy
hazy hearty hilly homely husky itchy jaunty jazzy jumpy kooky
lanky leafy leaky lousy lumpy mangy meaty mighty milky minty
misty moody mossy mousy muddy muggy murky mushy musty nerdy
nifty nippy noisy nosy nutty oily paltry pasty peppy perky
pesky phony pithy plucky portly pricey prickly pudgy puffy pushy
quirky risky ritzy rocky roomy rowdy runny rusty salty sandy
sassy saucy scaly scanty scrawny scruffy seedy shaggy shaky shiny
showy silky sketchy skimpy skinny sleazy sleepy slimy sloppy smoky
snazzy sneaky snowy soggy soupy speedy spiffy spongy spooky spotty
springy squishy starchy steamy steely stingy stocky stodgy stormy streaky
stringy stuffy sugary sulky sultry swanky sweaty tacky tangy tardy
tasty tawdry testy thorny thrifty tipsy touchy trusty tubby twitchy
wacky watery weedy wheezy whiny windy wiry wobbly woody woolly
wordy yummy zany zesty
blacken broaden cheapen coarsen darken deaden deafen embolden fatten freshen
gladden harden hasten hearten lengthen lessen liven madden moisten quicken
quieten redden ripen roughen sadden shorten sicken slacken smarten stiffen
straighten sweeten toughen whiten worsen
beep blare boom chime clang crackle din ding fizz gurgle
hiss jingle knell patter peal plink purr rattle rumble rustle
screech shriek sizzle splash squeak squeal swish thud thump tinkle
twang wail warble whir whoosh zing
amphora beaker canister carton cask casket crucible flagon jerrycan stein
atoll breaker buoy flotsam jetsam plankton undertow wake
"""

_DICT: set[str] = (
    set(_LEXICON_TEXT.split())
    | set(_LEXICON_TEXT_2.split())
    | set(_LEXICON_TEXT_3.split())
    | set(_LEXICON_TEXT_3B.split())
)


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
