#!/usr/bin/env python
"""Build the packaged WordPiece vocabulary deterministically.

Training corpus: the engine's own word sources — gazetteer surfaces, alias
groups, relation/plain sentence templates (sources/pages.py) — plus a small
embedded list of common English function/content words so frequent corpus
words get whole-word pieces. No RNG, no external data; rerunning this script
reproduces resources/wordpiece_vocab.txt byte-identically.

    python tools/build_wordpiece_vocab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ner_extractor_ray.functions.gazetteer import ALIAS_GROUPS, GAZETTEER  # noqa: E402
from ner_extractor_ray.functions.wordpiece import train_wordpiece_vocab  # noqa: E402
from ner_extractor_ray.sources.pages import (  # noqa: E402
    _PLAIN_TEMPLATES,
    _REL_TEMPLATES,
)

COMMON = """
the of and to in a is was for that with on as by at from it his her their this
which or an be are were been has have had not but they you all can will would
there what so if out up about into over after under between during before
report quarterly published analysts expected growth percent year delegation
arrived officials declined comment matter shares rose announcement researcher
joined founded works located based acquired born visited university company
corporation international holdings limited technology systems research center
institute national global group data science engineering market financial
""".split()


def corpus_words() -> dict[str, int]:
    counts: dict[str, int] = {}

    def add(w: str, c: int = 1) -> None:
        counts[w] = counts.get(w, 0) + c

    for surfaces in GAZETTEER.values():
        for s in surfaces:
            for w in s.split():
                add(w, 20)
    for grp in ALIAS_GROUPS:
        for s in grp:
            for w in s.split():
                add(w, 20)
    for tpl, _ in _REL_TEMPLATES:
        for w in tpl:
            if not (w.startswith("{") or len(w) == 1):
                add(w, 50)
    for tpl in _PLAIN_TEMPLATES:
        for w in tpl:
            if not (w.startswith("{") or len(w) == 1):
                add(w, 50)
    for w in COMMON:
        add(w, 100)
        add(w.capitalize(), 10)
    return counts


def main() -> None:
    vocab = train_wordpiece_vocab(corpus_words(), n_merges=1200)
    out = os.path.join(
        os.path.dirname(__file__), "..", "ner_extractor_ray", "resources",
        "wordpiece_vocab.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} pieces to {out}")


if __name__ == "__main__":
    main()
