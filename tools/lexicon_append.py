#!/usr/bin/env python
"""Guarded lexicon growth: append base-form headwords to kstem_lexicon.txt.

Rules enforced here (learned the hard way in r3 — 'writ' broke
writer->write via _er ordering):
- base forms only: reject tokens ending -ed/-ing and common plurals;
- never add a word the golden tests expect to CONFLATE (adding it would
  protect it and freeze the conflation);
- reject non-alpha and duplicates.
Run the kstem goldens after every batch.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEX = "gitlab_elasticsearch_indexer_spark/functions/kstem_lexicon.txt"

# golden-test conflation SOURCES (test_functions.py): adding any of these
# as a headword changes documented stemmer output
DENY = {
    "happiness", "darkness", "ability", "possibility", "activity", "purity",
    "organization", "combination", "transformation", "writer", "carrier",
    "quickly", "really", "happily", "possibly", "historical", "biological",
    "arrival", "informative", "creative", "supportive", "modernize",
    "photographic", "microscopic", "urgency", "effectiveness",
    "availability", "restrictive", "stability", "assessment",
    # golden-conflation INTERMEDIATES: biological->_al->biologic would win
    # over the documented biological->biology if 'biologic' were a headword
    # ('historic' by contrast IS a headword: historical->historic is the
    # documented output); 'writ' broke writer->write in r3 the same way
    "biologic", "writ",
    # inflected golden sources
    "cars", "flies", "classes", "boxes", "churches", "wages", "heroes",
    "tables", "features", "walked", "agreed", "stopped", "tried", "hoped",
    "created", "updated", "supported", "passed", "running", "talking",
    "hoping", "hopped", "charging", "writing", "sitting", "telling",
    "formations", "decisions", "connections", "objectives",
}

def main():
    from gitlab_elasticsearch_indexer_spark.functions.kstem import _DIRECT

    # irregular-form keys stem to their lemma by table lookup; as headwords
    # they would violate the every-headword-is-a-fixed-point invariant
    deny = DENY | {k for k, v in _DIRECT.items() if k != v}
    words = set(open(LEX).read().split())
    new = []
    rejected = []
    for w in sys.stdin.read().split():
        w = w.strip().lower()
        if not w or not w.isalpha() or not w.isascii():
            continue
        if w in words or w in deny or len(w) < 3 or len(w) > 24:
            continue
        if re.search(r"(?<!e)ed$|ing$", w) and w not in (
            "bed", "red", "shed", "sled", "wed", "bring", "king", "ring",
            "sing", "sling", "spring", "sting", "string", "swing", "thing",
            "wing", "cling", "fling", "wring", "ceiling", "darling",
            "duckling", "dumpling", "evening", "morning", "herring",
            "lightning", "pudding", "sapling", "sibling", "stocking",
            "viking", "wedding", "shilling", "gosling", "inkling",
            "hundred", "kindred", "sacred", "hatred", "naked", "wicked",
            "wretched", "rugged", "ragged", "crooked", "jagged", "biped",
            "forthcoming", "upbringing", "building", "painting", "meeting",
            "feeling", "clothing", "nothing", "something", "anything",
            "everything", "warning", "housing", "awning", "outing",
            "lodging", "offspring", "plumbing", "belated",
        ):
            rejected.append(w)
            continue
        new.append(w)
        words.add(w)
    with open(LEX, "a") as f:
        for w in new:
            f.write(w + "\n")
    print(f"appended {len(new)}, rejected {len(rejected)}: {rejected[:20]}")
    print(f"total now {len(words)}")

if __name__ == "__main__":
    main()
