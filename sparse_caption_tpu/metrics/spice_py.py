"""Jar-free SPICE analog: rule-based scene graphs + the SPICE F-score.

The official SPICE (reference ``coco_caption/pycocoevalcap/spice/spice.py``
+ ``spice-1.0.jar``) pipelines Stanford CoreNLP dependency parses through
the SceneGraphParser rules, then scores the candidate graph's semantic
tuples against the union of the reference graphs' tuples with an F1.
Neither the jar's LFS blob nor a ``java`` runtime exists in this
environment, so — like ``metrics/meteor_py.py`` for METEOR — this module
reimplements the metric without Java and reports under its OWN key
(``SPICE_py``), never impersonating official ``SPICE`` numbers.

What is exact vs approximate:

* **Scoring machinery — exact.** Tuples are the SPICE paper's (Anderson
  et al. 2016, §3.1): unary objects ``(o)``, binary attributes
  ``(o, attr)``, ternary relations ``(s, rel, o)``; duplicate tuples
  collapse (set semantics); reference tuples are the union over all
  references; P/R/F1 computed per image and mean-aggregated, matching the
  jar's per-image ``scores["All"]["f"]`` mean (reference spice.py:80-90).
  Synonym-equivalent matching (the paper's WordNet step) is supported by
  supplying synset data via ``SPARSE_CAPTION_SPICE_SYNONYMS`` (a JSON
  list of synonym groups); without it, matching is exact on stemmed
  lemmas — a documented approximation in BOTH directions (misses synonym
  credit; stemming may merge slightly more aggressively than lemmas).
* **Scene-graph extraction — rule-based approximation.** Instead of a
  trained dependency parser, a deterministic finite-state grammar over
  caption-ese (lexicon + context tagging, NP chunking, prepositional /
  verbal relation rules). On the SPICE paper's own running example
  ("A young girl standing on top of a tennis court", Fig. 1) it produces
  the paper's published tuple set exactly: {(girl), (court),
  (girl, young), (girl, standing), (court, tennis),
  (girl, on top of, court)} — pinned by tests/test_spice_py.py.

Grammar (documented so the approximation is auditable):

* multiword prepositions are collapsed first ("on top of", "in front
  of", "next to", ...);
* an NP is ``det/num? modifier* head-noun``; numeric and adjectival
  modifiers and pre-head nouns each yield an attribute tuple (the paper
  treats "tennis" in "tennis court" as an attribute);
* ``NP prep NP`` and ``NP verb NP`` yield relation tuples;
* ``NP verb prep NP`` yields ``(subj, verb)`` as an attribute plus
  ``(subj, prep, obj)`` — the paper's treatment of "standing on top of";
* copulas are transparent ("is on" → prep relation, "is red" →
  attribute), and copular PPs/adjectives bind the CLAUSE subject
  ("a man in a red shirt is on a motorcycle" → (man, on, motorcycle));
* finite verbs take the clause subject (nsubj), participles modify the
  nearest NP (acl) — except progressives after a copula ("is riding");
* directional/path PPs inside a verb phrase attach to the verb's
  subject ("riding a motorcycle down a road" → (man, down, road)),
  other post-object PPs to the nearest NP;
* verbs with no object become attributes; adverbs are skipped;
* NPs coordinated with "and" become co-subjects of what follows AND
  co-objects of the relation that produced the previous NP (Stanford
  enhanced-dependency conj propagation); a trailing PP binds the
  nearest conjunct only.

Synonym matching defaults to the built-in caption-domain table
(:mod:`sparse_caption_tpu.metrics.spice_synonyms_en`, WordNet-synset-
guided), the jar-free analog of official SPICE's WordNet step; the
``SPARSE_CAPTION_SPICE_SYNONYMS`` file replaces it when set.  Tuple
matching is an exact maximum bipartite matching.

All tuple elements are normalized with the self-contained Snowball
stemmer (``metrics/snowball_en.py``), so surface inflections ("riding" /
"rides", "dogs"/"dog") compare equal on both sides.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Sequence, Set, Tuple

from sparse_caption_tpu.metrics.snowball_en import stem

SYN_ENV = "SPARSE_CAPTION_SPICE_SYNONYMS"

# ----------------------------------------------------------------- lexicons

DETS = {
    "a", "an", "the", "this", "that", "these", "those", "some", "any", "no",
    "each", "every", "another", "other", "both", "all", "its", "his", "her",
    "their", "our", "my", "your", "it's",
}
NUMS = {
    "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
    "ten", "eleven", "twelve", "several", "many", "few", "couple", "numerous",
    "multiple", "dozen", "lots",
}
PREPS = {
    "on", "in", "at", "of", "with", "by", "near", "under", "over", "above",
    "below", "behind", "beside", "between", "against", "across", "along",
    "around", "atop", "onto", "into", "through", "toward", "towards",
    "inside", "outside", "beneath", "underneath", "amid", "among", "upon",
    "within", "past", "beyond", "from", "to", "down", "up", "off", "for",
}
# collapsed before tagging; longest first
MULTIWORD_PREPS = [
    ("on", "top", "of"), ("in", "front", "of"), ("in", "the", "middle", "of"),
    ("on", "the", "side", "of"), ("next", "to"), ("close", "to"),
    ("on", "either", "side", "of"), ("in", "the", "back", "of"),
    ("on", "the", "back", "of"), ("out", "of"),
]
COPULAS = {
    "is", "are", "was", "were", "be", "been", "being", "am",
    "has", "have", "had", "do", "does", "did", "can", "could", "will",
    "would", "there", "appears", "appear", "seems", "seem",
}
CONJS = {"and", "or", ",", "while", "as", "that", "which", "who", "whom", "where", "when"}
ADJS = {
    # colors
    "red", "blue", "green", "yellow", "black", "white", "brown", "gray",
    "grey", "orange", "purple", "pink", "golden", "gold", "silver", "tan",
    "beige", "dark", "light", "bright", "colorful", "blond", "blonde",
    # size / shape
    "big", "large", "small", "little", "tiny", "huge", "giant", "tall",
    "short", "long", "wide", "narrow", "thin", "thick", "round", "square",
    "flat", "deep", "shallow", "high", "low", "miniature", "oversized",
    # age / state
    "old", "young", "new", "vintage", "antique", "modern", "dirty", "clean",
    "wet", "dry", "empty", "full", "open", "closed", "broken", "shiny",
    "rusty", "fresh", "ripe", "raw", "cooked", "hot", "cold", "warm",
    "frozen", "busy", "crowded", "quiet", "cloudy", "sunny", "snowy",
    "rainy", "foggy", "grassy", "sandy", "rocky", "muddy", "dusty", "lush",
    "bare", "asleep", "awake", "alone", "united",
    # material-ish modifiers captions use adjectivally
    "wooden", "metal", "metallic", "plastic", "glass", "stone", "brick",
    "leather", "furry", "fluffy", "fuzzy", "hairy", "striped", "spotted",
    "checkered", "plaid", "floral", "ornate", "fancy", "plain",
    # judgement / misc
    "cute", "beautiful", "pretty", "handsome", "happy", "sad", "angry",
    "lovely", "nice", "delicious", "tasty", "healthy", "professional",
    "electric", "electronic", "digital", "public", "private", "male",
    "female", "double", "single", "triple", "upper", "lower", "middle",
    "top", "bottom", "front", "back", "left", "right", "different",
    "various", "assorted", "remote", "stuffed", "parked", "decorated",
    "dressed", "covered", "filled", "topped", "lit", "crossed", "curved",
    "overcast", "snowcovered", "homemade", "wild", "slow", "fast", "free",
    "busy", "heavy", "pointy", "sharp", "soft", "hard", "smooth", "rough",
}
# common caption verb lemmas; inflections generated below
VERB_LEMMAS = {
    "sit", "stand", "ride", "walk", "run", "hold", "wear", "eat", "drink",
    "play", "jump", "fly", "look", "watch", "carry", "pull", "push",
    "throw", "catch", "hit", "kick", "swing", "ski", "surf", "skate",
    "snowboard", "skateboard", "drive", "park", "sleep", "lay", "lie",
    "rest", "lean", "hang", "sail", "swim", "graze", "feed", "talk", "use",
    "cut", "cook", "prepare", "serve", "pose", "smile", "laugh", "wait",
    "cross", "climb", "perform", "read", "write", "point", "reach", "grab",
    "pet", "brush", "wash", "clean", "fix", "make", "take", "give", "show",
    "face", "stare", "gaze", "glance", "travel", "move", "race", "chase",
    "follow", "lead", "pass", "turn", "bend", "stretch", "kneel", "squat",
    "crouch", "float", "land", "approach", "enter", "leave", "exit",
    "attach", "contain", "display", "cover", "fill", "top", "decorate",
    "surround", "overlook", "line", "share", "enjoy", "celebrate", "work",
    "cook", "bake", "slice", "bite", "chew", "lick", "sniff", "smell",
    "herd", "pitch", "bat", "dribble", "serve", "return", "juggle", "row",
    "paddle", "dive", "splash", "wade", "drag", "load", "unload", "tow",
    "pour", "spray", "paint", "draw", "type", "text", "call", "speak",
    "sing", "dance", "march", "parade", "wave", "shake", "hug", "kiss",
}
IRREGULAR_VERB_FORMS = {
    "sat": "sit", "stood": "stand", "rode": "ride", "ridden": "ride",
    "ran": "run", "held": "hold", "wore": "wear", "worn": "wear",
    "ate": "eat", "eaten": "eat", "drank": "drink", "drunk": "drink",
    "flew": "fly", "flies": "fly", "flown": "fly", "threw": "throw",
    "thrown": "throw", "caught": "catch", "drove": "drive", "driven":
    "drive", "slept": "sleep", "lay": "lie", "lain": "lie", "hung": "hang",
    "swam": "swim", "swum": "swim", "grazed": "graze", "fed": "feed",
    "spoke": "speak", "spoken": "speak", "sang": "sing", "sung": "sing",
    "took": "take", "taken": "take", "gave": "give", "given": "give",
    "made": "make", "read": "read", "wrote": "write", "written": "write",
    "left": "leave", "led": "lead", "bent": "bend", "knelt": "kneel",
    "dove": "dive", "bit": "bite", "bitten": "bite",
}


def _inflections(lemma: str) -> List[str]:
    forms = [lemma]
    if lemma.endswith(("s", "sh", "ch", "x", "z")):
        forms.append(lemma + "es")
    elif lemma.endswith("y") and len(lemma) > 2 and lemma[-2] not in "aeiou":
        forms.append(lemma[:-1] + "ies")
    else:
        forms.append(lemma + "s")
    if lemma.endswith("e") and not lemma.endswith("ee"):
        base = lemma[:-1]
        forms += [base + "ing", base + "ed"]
    elif (len(lemma) >= 3 and lemma[-1] not in "aeiouwxy"
          and lemma[-2] in "aeiou" and lemma[-3] not in "aeiou"):
        forms += [lemma + lemma[-1] + "ing", lemma + lemma[-1] + "ed"]
    else:
        forms += [lemma + "ing", lemma + "ed"]
    return forms


VERB_FORMS: Dict[str, str] = {}
for _lemma in VERB_LEMMAS:
    for _f in _inflections(_lemma):
        VERB_FORMS.setdefault(_f, _lemma)
VERB_FORMS.update(IRREGULAR_VERB_FORMS)
# participle adjectives stay attributes when used pre-nominally (handled by
# position in the chunker), but a few are overwhelmingly adjectival:
for _adj_only in ("parked", "stuffed", "decorated", "dressed", "covered",
                  "filled", "topped", "striped", "spotted", "assorted"):
    VERB_FORMS.pop(_adj_only, None)


# ------------------------------------------------------------------ tagging

def _collapse_multiword(tokens: List[str]) -> List[str]:
    out: List[str] = []
    i = 0
    while i < len(tokens):
        hit = None
        for mw in MULTIWORD_PREPS:
            if tuple(tokens[i:i + len(mw)]) == mw:
                hit = mw
                break
        if hit:
            out.append(" ".join(hit))
            i += len(hit)
        else:
            out.append(tokens[i])
            i += 1
    return out


def _nounish(word: str) -> bool:
    """Could `word` continue a noun phrase? (not a boundary token)"""
    return bool(word) and " " not in word and word not in DETS \
        and word not in PREPS and word not in COPULAS and word not in CONJS \
        and word not in VERB_FORMS


def _tag(tokens: List[str]) -> List[str]:
    """Coarse tags: DET NUM PREP COP CONJ ADJ VERB ADV NOUN.

    Noun/verb-ambiguous surface forms ("wave", "waves", "riding") resolve
    by position: inside an NP (after a determiner/modifier/preposition)
    they are nouns — except -ing/-ed participles directly modifying a
    noun ("a smiling man", "grazing sheep"), which become attributes —
    and directly after a verb a non-gerund is its object noun
    ("riding waves")."""
    tags: List[str] = []
    for i, w in enumerate(tokens):
        nxt = tokens[i + 1] if i + 1 < len(tokens) else ""
        prev = tags[i - 1] if i > 0 else ""
        if " " in w or w in PREPS:
            tags.append("PREP")
        elif w in DETS:
            tags.append("DET")
        elif w in NUMS or w.isdigit():
            tags.append("NUM")
        elif w in COPULAS:
            tags.append("COP")
        elif w in CONJS:
            tags.append("CONJ")
        elif w in ADJS:
            tags.append("ADJ")
        elif w in VERB_FORMS or (w.endswith("ing") and len(w) > 4):
            ing_ed = w.endswith(("ing", "ed"))
            if prev in ("", "DET", "NUM", "ADJ", "PREP"):
                tags.append("ADJ" if ing_ed and _nounish(nxt) else "NOUN")
            elif prev == "VERB" and not w.endswith("ing"):
                tags.append("NOUN")
            else:
                tags.append("VERB")
        elif w.endswith("ly") and len(w) > 3:
            tags.append("ADV")
        else:
            tags.append("NOUN")
    return tags


# ------------------------------------------------------------------ parsing

class _NP:
    __slots__ = ("heads", "attrs")

    def __init__(self):
        self.heads: List[str] = []   # >1 when coordinated ("a man and a woman")
        self.attrs: List[Tuple[str, str]] = []


# irregular plurals the suffix stemmer can't merge with their singulars
IRREGULAR_NOUNS = {
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "sheep": "sheep", "cattle": "cow", "leaves": "leaf", "shelves": "shelf",
    "knives": "knife", "loaves": "loaf", "wolves": "wolf", "calves": "calf",
}


def _norm(word: str) -> str:
    return " ".join(stem(IRREGULAR_NOUNS.get(w, w)) for w in word.split())


# path/direction prepositions: a PP headed by one of these inside a verb
# phrase modifies the MOTION, so its relation subject is the verb's
# subject ("riding a motorcycle down a road" -> (man, down, road)); other
# in-VP-after-object PPs attach to the nearest NP ("holding a cup with a
# handle" -> (cup, with, handle)).  Mirrors SceneGraphParser's treatment
# of verb-attached nmod edges (SPICE Fig. 1: nmod(standing, court)
# becomes (girl, on top of, court), i.e. subject = verb's subject).
DIRECTIONAL_PREPS = {
    "down", "up", "through", "across", "along", "past", "toward", "towards",
    "around", "over", "into", "onto", "off",
}


def parse_scene_graph(tokens: Sequence[str]) -> Set[Tuple[str, ...]]:
    """Caption tokens -> set of SPICE tuples (objects/attributes/relations),
    elements stem-normalized."""
    # the eval driver feeds PTB-tokenized text (punctuation already
    # stripped); guard direct callers against raw punctuation tokens,
    # which would otherwise default-tag as nouns
    toks = _collapse_multiword(
        [t.lower() for t in tokens if any(c.isalnum() for c in t)])
    tags = _tag(toks)

    tuples: Set[Tuple[str, ...]] = set()
    nps: List[_NP] = []

    i, n = 0, len(toks)
    # pending relation between the previous NP and the next one
    pending: List[Tuple[List[str], str]] = []  # (subject heads, relation word)
    last_np: _NP | None = None
    pending_verb: Tuple[List[str], str] | None = None  # (subject heads, lemma)
    clause_subj: List[str] | None = None  # first NP of the clause (nsubj)
    verb_subj: List[str] | None = None  # subject of the clause's verb
    after_cop = False  # a copula was just seen (next PP/ADJ binds nsubj)
    # relations that produced last_np as their OBJECT; a coordinated NP
    # joins them too ((area, with, bridge) and (... and a background) ->
    # (area, with, background)) — Stanford enhanced-dependency conj
    # propagation, which SceneGraphParser consumes
    last_incoming: List[Tuple[str, str]] = []

    def flush_verb_as_attr():
        nonlocal pending_verb
        if pending_verb is not None:
            subj, lemma = pending_verb
            for h in subj:
                tuples.add((h, _norm(lemma)))
        pending_verb = None

    def chunk_np(j):
        """Chunk [DET]? (NUM|ADJ|NOUN)* starting at j; returns (head, stop)
        with the head/attr tuples emitted, or (None, j') on a bare DET."""
        if tags[j] == "DET":
            j += 1
        mods: List[Tuple[str, str]] = []
        while j < n and tags[j] in ("NUM", "ADJ", "NOUN"):
            mods.append((tags[j], toks[j]))
            j += 1
        if not mods:
            return None, j
        head_idx = max((k for k, (t, _) in enumerate(mods) if t == "NOUN"),
                       default=len(mods) - 1)
        head = _norm(mods[head_idx][1])
        tuples.add((head,))
        for k, (_, w) in enumerate(mods):
            if k != head_idx:
                tuples.add((head, _norm(w)))
        return head, j

    while i < n:
        tag, tok = tags[i], toks[i]
        if tag in ("DET", "NUM", "ADJ", "NOUN"):
            head, i = chunk_np(i)
            if head is None:
                # bare determiner ("the" at end / before a non-NP token):
                # i already advanced past it — reprocess the next token
                continue
            np_ = _NP()
            np_.heads = [head]
            # attach pending relations (prep or verb) to this NP as object
            if pending:
                last_incoming = []
                for subj_heads, rel in pending:
                    for s in subj_heads:
                        tuples.add((s, _norm(rel), head))
                        last_incoming.append((s, _norm(rel)))
                pending = []
                pending_verb = None
            elif pending_verb is not None:
                subj, lemma = pending_verb
                verb_subj = subj
                last_incoming = []
                for s in subj:
                    tuples.add((s, _norm(lemma), head))
                    last_incoming.append((s, _norm(lemma)))
                pending_verb = None
            else:
                last_incoming = []
            if clause_subj is None:
                clause_subj = np_.heads  # shared list: coordination extends it
            after_cop = False
            nps.append(np_)
            last_np = np_
            continue
        if tag == "PREP":
            if pending_verb is not None:
                # "standing on top of X": verb becomes an attribute, the
                # preposition carries the relation from the verb's subject
                # (SPICE paper Fig. 1)
                subj = pending_verb[0]
                verb_subj = subj
                flush_verb_as_attr()
                pending.append((list(subj), tok))
            elif after_cop and clause_subj:
                # "a man in a red shirt IS ON a motorcycle": the copular PP
                # binds the clause subject, not the nearest NP
                pending.append((list(clause_subj), tok))
            elif tok in DIRECTIONAL_PREPS and verb_subj:
                pending.append((list(verb_subj), tok))
            elif last_np is not None:
                # plain NP attachment: nearest (= last) conjunct only
                pending.append((list(last_np.heads[-1:]), tok))
            i += 1
            continue
        if tag == "VERB":
            flush_verb_as_attr()
            # participles ("a man with a dog RIDING a horse") modify the
            # nearest NP (acl attachment); finite verbs ("a dirt path with
            # a person RESTS ...") take the clause subject (nsubj) — and a
            # progressive after a copula ("is riding") is finite too
            participial = tok.endswith("ing") and not after_cop
            if participial or clause_subj is None:
                subj = list(last_np.heads) if last_np is not None else []
            else:
                subj = list(clause_subj)
            pending_verb = (subj, VERB_FORMS.get(tok, tok))
            verb_subj = subj
            after_cop = False
            i += 1
            continue
        if tag == "COP":
            # transparent: "is on" -> prep relation; "is red" -> attribute
            after_cop = True
            i += 1
            if i < n and tags[i] == "ADJ" and (clause_subj or last_np is not None):
                for h in (clause_subj if clause_subj else last_np.heads):
                    tuples.add((h, _norm(toks[i])))
                i += 1
                after_cop = False
            continue
        if tag == "CONJ" and tok == "and":
            # coordinate the NEXT NP with the previous one: co-subjects for
            # what follows, co-objects of the relations that produced the
            # previous NP (enhanced-dependency conj propagation)
            j = i + 1
            if j < n and tags[j] in ("DET", "NUM", "ADJ", "NOUN") and last_np is not None \
                    and pending_verb is None and not pending:
                head, j2 = chunk_np(j)
                if head is not None:
                    for s, rel in last_incoming:
                        tuples.add((s, rel, head))
                    last_np.heads.append(head)
                    i = j2
                    continue
            i += 1
            continue
        # ADV / other CONJ: clause boundary for relation state
        if tag == "CONJ":
            flush_verb_as_attr()
            pending = []
            clause_subj = None
            verb_subj = None
            last_incoming = []
            after_cop = False
        i += 1

    flush_verb_as_attr()
    return tuples


# ------------------------------------------------------------------ scoring

def _load_synonyms() -> Dict[str, Set[int]]:
    """Synonym groups: JSON list of word lists. A tuple element matches if
    the stemmed words are equal or share a group.  Default: the built-in
    caption-domain table (``metrics/spice_synonyms_en.py``, the jar-free
    analog of official SPICE's WordNet synset matching); the
    ``SPARSE_CAPTION_SPICE_SYNONYMS`` file REPLACES it when set."""
    path = os.environ.get(SYN_ENV, "")
    if path and os.path.isfile(path):
        with open(path) as f:
            groups = json.load(f)
    else:
        from sparse_caption_tpu.metrics.spice_synonyms_en import SYNONYM_GROUPS

        groups = SYNONYM_GROUPS
    word_to_groups: Dict[str, Set[int]] = {}
    for gi, group in enumerate(groups):
        for w in group:
            word_to_groups.setdefault(_norm(w.lower()), set()).add(gi)
    return word_to_groups


def _elems_match(a: str, b: str, syn: Dict[str, Set[int]]) -> bool:
    if a == b:
        return True
    if syn:
        ga, gb = syn.get(a), syn.get(b)
        return bool(ga and gb and ga & gb)
    return False


def _tuples_match(a: Tuple[str, ...], b: Tuple[str, ...], syn) -> bool:
    return len(a) == len(b) and all(_elems_match(x, y, syn) for x, y in zip(a, b))


def _count_matches(cand: Set[Tuple[str, ...]], ref: Set[Tuple[str, ...]], syn) -> int:
    """Maximum one-to-one tuple matching (augmenting paths — the tuple
    sets are tiny, so the exact optimum is cheap; a greedy pass can
    under-count when one candidate tuple blocks another's only match)."""
    if not syn:
        return len(cand & ref)
    ref_l = list(ref)
    adj = {c: [i for i, r in enumerate(ref_l) if _tuples_match(c, r, syn)]
           for c in cand}
    match_r: Dict[int, Tuple[str, ...]] = {}

    def assign(c, seen):
        for i in adj[c]:
            if i in seen:
                continue
            seen.add(i)
            if i not in match_r or assign(match_r[i], seen):
                match_r[i] = c
                return True
        return False

    return sum(1 for c in cand if assign(c, set()))


def f_score(cand: Set[Tuple[str, ...]], ref: Set[Tuple[str, ...]], syn=None) -> float:
    """SPICE F1 over tuple sets (paper eq. 1-3): binary matching, set
    semantics, F=0 when either side is empty."""
    syn = syn or {}
    if not cand or not ref:
        return 0.0
    m = _count_matches(cand, ref, syn)
    p, r = m / len(cand), m / len(ref)
    return 0.0 if m == 0 else 2 * p * r / (p + r)


def graph_tuples(sentences: Iterable[str]) -> Set[Tuple[str, ...]]:
    """Union of scene-graph tuples over sentences (the reference-side
    merge: the jar unions all reference graphs before matching)."""
    out: Set[Tuple[str, ...]] = set()
    for s in sentences:
        out |= parse_scene_graph(s.split())
    return out


def compute_spice_py(gts: Dict, res: Dict):
    """(mean, per-image scores) over PTB-tokenized caption dicts — the
    same call shape as compute_bleu/compute_cider (candidate dicts hold a
    single caption per image)."""
    syn = _load_synonyms()
    ids = sorted(res.keys())
    per = []
    for i in ids:
        cand = graph_tuples(res[i][:1])
        ref = graph_tuples(gts[i])
        per.append(f_score(cand, ref, syn))
    mean = sum(per) / len(per) if per else 0.0
    return mean, per
