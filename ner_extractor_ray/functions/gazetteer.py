"""Fixed gazetteers, alias groups and relation templates.

Plays two roles, mirroring the reference's entity-pool pattern
(DistilBERT-CRF/src/augmentation.py:59-69: aggregate entities by type once,
then consult per sentence):
  1. the synthetic-pages generator plants entities from these lists so gold
     mentions/triples are known at generation time (FIXTURES.md §2);
  2. the DeterministicTagger uses them as the feature source of its emission
     function (the sandbox has no torch; SURVEY.md §7.0 scorer plug point).

The lists deliberately include the reference's reported hard cases: headword-
ambiguous ORGs ("City University of Hong Kong" — report/chapters/chapter3.tex:
88-101), ORG↔LOC confusables ("EU"), nationality-adjective MISC (CoNLL
convention), and alias groups ("IBM"/"I.B.M.") for canonicalization tests.
"""

from __future__ import annotations

PER = [
    "Bill Gates", "Paul Allen", "Mark Watney", "Ada Lovelace", "Alan Turing",
    "Grace Hopper", "Marie Curie", "Satya Nadella", "Tim Cook", "Lisa Su",
    "Andrew Ng", "Fei Li", "John von Neumann", "Claude Shannon",
    "William Gates", "Margaret Hamilton", "Linus Torvalds", "Guido van Rossum",
]

ORG = [
    "Microsoft", "Apple", "IBM", "I.B.M.", "Google", "Intel", "Nvidia",
    "City University of Hong Kong", "University of Cambridge",
    "Stanford University", "the University", "EU", "UN", "NATO",
    "Acme Corp", "Globex", "Initech", "Hooli", "Bell Labs", "Xerox PARC",
]

LOC = [
    "Hong Kong", "New York", "Frankfurt", "London", "Paris", "Tokyo",
    "Seattle", "Cupertino", "Cambridge", "Shenzhen", "Berlin", "Zurich",
    "California", "Germany", "Japan",
]

MISC = [
    "German", "British", "American", "Chinese", "Japanese", "French",
    "Swiss", "European",
]

GAZETTEER: dict[str, list[str]] = {"PER": PER, "ORG": ORG, "LOC": LOC, "MISC": MISC}

# Alias groups for entity linking / canonicalization (gold_entities,
# FIXTURES.md §2): surfaces in one group must map to one canonical id.
ALIAS_GROUPS: list[list[str]] = [
    ["IBM", "I.B.M."],
    ["Bill Gates", "William Gates"],
    ["EU", "European Union"],
]

# Relation templates: connective phrase (the exact tokens between two adjacent
# mentions) → (predicate, subject_role). subject_role "first" keeps
# (m1, pred, m2); "second" inverts to (m2, pred, m1) — e.g.
# "X was founded by Y" yields (Y, founded, X). Types are constrained so a
# pattern only fires on the right pair (simple dependency-pattern analog).
RELATION_PATTERNS: dict[str, tuple[str, str, str, str]] = {
    # gap phrase                  predicate     subj_role  type1   type2
    "founded": ("founded", "first", "PER", "ORG"),
    "was founded by": ("founded", "second", "ORG", "PER"),
    "works for": ("works_for", "first", "PER", "ORG"),
    "is located in": ("located_in", "first", "*", "LOC"),
    "is based in": ("located_in", "first", "ORG", "LOC"),
    "acquired": ("acquired", "first", "ORG", "ORG"),
    "was born in": ("born_in", "first", "PER", "LOC"),
    "visited": ("visited", "first", "PER", "LOC"),
}


import functools


@functools.lru_cache(maxsize=65536)
def normalize_surface(s: str) -> str:
    """Normalization used for alias keys: lowercase, drop periods, strip a
    leading article. ("I.B.M." → "ibm", "the University" → "university").
    Pure + memoized (surfaces repeat heavily within a worker)."""
    s = s.lower().replace(".", "").strip()
    for art in ("the ", "a ", "an "):
        if s.startswith(art):
            s = s[len(art):]
            break
    return " ".join(s.split())


def alias_canonical_map() -> dict[str, str]:
    """normalized surface → canonical group key (lexicographically-min member)."""
    out: dict[str, str] = {}
    for group in ALIAS_GROUPS:
        norm = sorted(normalize_surface(g) for g in group)
        for n in norm:
            out[n] = norm[0]
    return out


def gazetteer_token_trie() -> dict:
    """Token-level trie over all gazetteer surfaces for longest-match lookup.

    Node = {token: child_node}, with "__hit__" → entity type at accepting
    nodes. Built once per actor (__init__), consulted per sentence.
    """
    root: dict = {}
    for ent_type, surfaces in GAZETTEER.items():
        for surf in surfaces:
            node = root
            for tok in surf.split():
                node = node.setdefault(tok, {})
            node["__hit__"] = ent_type
    return root
