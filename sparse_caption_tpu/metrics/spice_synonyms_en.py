"""Built-in English synonym groups for SPICE_py tuple matching.

Official SPICE matches tuple elements when their lemmas share a WordNet
synset (Anderson et al. 2016 §3.2; jar contract
``coco_caption/pycocoevalcap/spice/spice.py:32-87``).  WordNet is not
available in this environment, so this module ships a curated table of
caption-domain synonym groups, WordNet-synset-guided (each group below is
a real synset's lemma set, restricted to words that appear in COCO-style
captions), plus a few caption-domain equivalences WordNet splits across
synsets (marked).  A word may belong to several groups (``bike`` is a
lemma of both ``motorcycle.n.01`` and ``bicycle.n.01``); two elements
match when stem-equal or sharing any group — exactly the matcher
semantics of ``SPARSE_CAPTION_SPICE_SYNONYMS`` files.

Setting ``SPARSE_CAPTION_SPICE_SYNONYMS`` REPLACES this table (point it
at an empty JSON list to recover exact-only matching).
"""

from __future__ import annotations

SYNONYM_GROUPS = [
    # vehicles
    ["motorcycle", "motorbike", "bike", "cycle"],  # motorcycle.n.01
    ["bicycle", "bike", "cycle", "wheel"],  # bicycle.n.01
    ["car", "auto", "automobile", "motorcar", "machine"],  # car.n.01
    ["airplane", "aeroplane", "plane"],  # airplane.n.01
    ["bus", "autobus", "coach", "omnibus", "motorbus"],  # bus.n.01
    ["truck", "lorry", "motortruck"],  # truck.n.01
    ["taxi", "taxicab", "cab", "hack"],  # cab.n.03
    ["train", "railroad train"],  # train.n.01
    ["ship", "vessel"],  # caption-domain (hypernym pair in WordNet)
    ["sailboat", "sailing boat"],  # sailboat.n.01
    # people / animals
    ["child", "kid", "youngster", "tyke", "tike"],  # child.n.01
    ["baby", "babe", "infant"],  # baby.n.01
    ["guy", "fellow", "bloke", "chap"],  # guy.n.01
    ["lady", "woman"],  # caption-domain (woman.n.01 lemma "lady" archaic)
    ["policeman", "officer", "cop"],  # caption-domain
    ["kitten", "kitty"],  # kitten.n.01
    ["puppy", "pup"],  # puppy.n.01
    ["rabbit", "bunny"],  # bunny.n.02
    ["bird", "fowl"],  # caption-domain
    # places / scenery
    ["road", "route", "path", "trail"],  # caption-domain (road.n.01 + path)
    ["street", "road"],  # caption-domain
    ["sidewalk", "pavement"],  # sidewalk.n.01
    ["forest", "wood", "woods"],  # forest.n.01
    ["mountain", "mount"],  # mountain.n.01
    ["sea", "ocean"],  # caption-domain
    ["shop", "store"],  # shop.n.01
    ["pier", "wharf", "dock"],  # pier.n.01
    ["railroad", "railway"],  # railroad.n.01
    ["bathroom", "toilet", "lavatory", "loo", "restroom"],  # toilet.n.01
    ["kitchen counter", "countertop", "counter"],  # caption-domain
    ["field", "meadow", "pasture"],  # caption-domain
    # household / objects
    ["couch", "sofa", "lounge"],  # sofa.n.01
    ["television", "tv", "telly"],  # television.n.01
    ["refrigerator", "fridge", "icebox"],  # refrigerator.n.01
    ["telephone", "phone"],  # telephone.n.01
    ["cellphone", "cell", "mobile"],  # cellular_telephone.n.01
    ["photo", "photograph", "picture", "pic"],  # photograph.n.01
    ["glasses", "spectacles", "eyeglasses", "specs"],  # spectacles.n.01
    ["handbag", "purse", "pocketbook"],  # handbag.n.01
    ["luggage", "baggage"],  # luggage.n.01
    ["curtain", "drape", "drapery"],  # curtain.n.01
    ["faucet", "tap", "spigot"],  # faucet.n.01
    ["trash", "garbage", "rubbish", "refuse"],  # trash.n.01
    ["rock", "stone"],  # rock.n.01
    ["laptop", "laptop computer", "notebook"],  # laptop.n.01
    ["cap", "hat"],  # caption-domain
    ["sweater", "jumper"],  # sweater.n.01
    ["trousers", "pants"],  # trousers.n.01
    ["doughnut", "donut"],  # doughnut.n.02
    ["soda", "pop", "soda pop"],  # pop.n.02
    ["slice", "piece"],  # slice.n.02
    ["plate", "dish"],  # caption-domain
    ["mug", "cup"],  # caption-domain
    ["sign", "signboard"],  # signboard.n.01
    # verbs
    ["talk", "speak"],  # talk.v.02
    ["jump", "leap", "bound", "spring"],  # jump.v.01
    ["look", "watch"],  # caption-domain
    ["ride", "sit on"],  # caption-domain
    ["walk", "stroll"],  # caption-domain
    ["cut", "slice"],  # cut.v.01/slice
    ["throw", "toss"],  # caption-domain
    ["hold", "grasp", "grip"],  # caption-domain
    # attributes
    ["big", "large"],  # large.a.01
    ["small", "little"],  # small.a.01
    ["quick", "fast", "speedy"],  # fast.a.01
    ["gray", "grey"],  # gray.a.01
    ["blond", "blonde"],  # blond.a.01
]
