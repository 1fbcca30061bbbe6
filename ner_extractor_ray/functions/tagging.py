"""DeterministicTagger emission function + decode — the pluggable scorer core.

The sandbox has no torch/transformers, so the NER forward pass
(DistilBERT-CRF/src/modeling.py:83-141: encoder → emissions → CRF Viterbi) is
replaced by a deterministic emission function (gazetteer longest-match + shape
features) feeding the SAME pure-numpy Viterbi (functions/viterbi.py) that the
single-process oracle uses. The distributed pipeline and the oracle share only
these leaf functions — orchestration differs entirely — so any P/R gap vs the
oracle isolates an orchestration bug (SURVEY.md §7.0, §7.3).

An ``HFTagger`` with the same interface can be dropped in when torch is
installed (import-guarded in stages/tagger.py).
"""

from __future__ import annotations

import numpy as np

from .. import LABELS, LABEL_TO_ID
from .gazetteer import gazetteer_token_trie
from .viterbi import viterbi_decode

N_LABELS = len(LABELS)
_O = LABEL_TO_ID["O"]

# Emission magnitudes. Gazetteer evidence must dominate shape evidence which
# must stay below the O prior so capitalization alone never starts an entity.
_O_PRIOR = 5.0
_GAZ_SCORE = 12.0
_SHAPE_SCORE = 1.0


def gazetteer_matches(tokens: list[str], trie: dict) -> list[tuple[str, int, int]]:
    """Greedy left-to-right longest-match of gazetteer surfaces.

    Returns (type, start, end) half-open word spans. Deterministic: longest
    match wins; on equal length the trie stores one type per surface.
    """
    matches = []
    i, n = 0, len(tokens)
    while i < n:
        node = trie
        best_end, best_type = -1, None
        j = i
        while j < n and tokens[j] in node:
            node = node[tokens[j]]
            j += 1
            if "__hit__" in node:
                best_end, best_type = j, node["__hit__"]
        if best_type is not None:
            matches.append((best_type, i, best_end))
            i = best_end
        else:
            i += 1
    return matches


def emissions_for_sentence(tokens: list[str], trie: dict) -> np.ndarray:
    """(T, 9) float64 emission matrix for one sentence."""
    T = len(tokens)
    em = np.zeros((T, N_LABELS), dtype=np.float64)
    em[:, _O] = _O_PRIOR
    # shape feature: capitalized mid-sentence token leans weakly entity-ward
    for t in range(1, T):
        tok = tokens[t]
        if tok[:1].isupper():
            em[t, LABEL_TO_ID["B-PER"]] += _SHAPE_SCORE
            em[t, LABEL_TO_ID["B-ORG"]] += _SHAPE_SCORE * 0.5
    for ent_type, s, e in gazetteer_matches(tokens, trie):
        em[s, LABEL_TO_ID[f"B-{ent_type}"]] += _GAZ_SCORE
        em[s, _O] -= _O_PRIOR
        for t in range(s + 1, e):
            em[t, LABEL_TO_ID[f"I-{ent_type}"]] += _GAZ_SCORE
            em[t, _O] -= _O_PRIOR
    return em


def tag_sentence(tokens: list[str], trie: dict | None = None) -> list[str]:
    """tokens → BIO tags via emissions + shared Viterbi."""
    if trie is None:
        trie = gazetteer_token_trie()
    if not tokens:
        return []
    em = emissions_for_sentence(tokens, trie)
    path = viterbi_decode(em)
    return [LABELS[i] for i in path]
