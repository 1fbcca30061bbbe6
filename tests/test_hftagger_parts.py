"""HFTagger's pure parts, tested WITHOUT torch: label-space projection,
first-subword emission selection, Viterbi decode + truncation padding.
These are the only previously-untested code paths of the HF scorer
(stages/tagger.py; reference contracts: src/modeling.py:123-132 projection,
src/data_module.py:98-110 alignment)."""

import numpy as np

from ner_extractor_ray import LABELS
from ner_extractor_ray.stages.tagger import (
    decode_projected,
    first_subword_emissions,
    project_emissions,
)


def test_project_reorders_model_label_space():
    # model emits labels in its own order, incl. one we don't know
    model_order = ["O", "B-PER", "WEIRD", "I-PER"]
    em = np.array([[1.0, 2.0, 9.0, 3.0],
                   [4.0, 5.0, 9.0, 6.0]])
    out = project_emissions(em, model_order)
    assert out.shape == (2, len(LABELS))
    assert out[0, LABELS.index("O")] == 1.0
    assert out[0, LABELS.index("B-PER")] == 2.0
    assert out[1, LABELS.index("I-PER")] == 6.0
    # labels the model never emits are effectively masked
    assert out[0, LABELS.index("B-ORG")] == -1e4
    # the unknown model label is dropped entirely
    assert 9.0 not in out


def test_first_subword_selection():
    # layout: [CLS] w0 w0' w1 [SEP]  (w0 has 2 subwords; specials = None)
    logits = np.arange(5 * 3, dtype=np.float64).reshape(5, 3)
    word_ids = [None, 0, 0, 1, None]
    em = first_subword_emissions(logits, word_ids)
    assert em.shape == (2, 3)
    assert np.array_equal(em[0], logits[1])  # FIRST subword of w0, not the second
    assert np.array_equal(em[1], logits[3])


def test_first_subword_empty_sentence():
    logits = np.zeros((2, 4))
    em = first_subword_emissions(logits, [None, None])
    assert em.shape == (0, 4)


def test_decode_projected_tags_and_truncation_padding():
    # 2 decodable words, sentence of 4 → truncated tail padded with "O"
    em = np.full((2, len(LABELS)), -1e4)
    em[0, LABELS.index("B-LOC")] = 5.0
    em[1, LABELS.index("I-LOC")] = 5.0
    em[:, LABELS.index("O")] = 0.0
    tags = decode_projected(em, 4)
    assert tags == ["B-LOC", "I-LOC", "O", "O"]
    assert decode_projected(np.zeros((0, len(LABELS))), 3) == ["O", "O", "O"]


def test_pipeline_composition_fake_logits():
    """fake model logits end-to-end through the three pure stages produce
    the expected BIO tags — the full HFTagger.__call__ inner loop minus the
    torch forward pass."""
    model_order = ["O", "B-PER", "I-PER", "B-LOC", "I-LOC"]
    n_sub, L = 6, len(model_order)
    logits = np.full((n_sub, L), -10.0)
    # [CLS] Ada(2 subwords) Lovelace visited [SEP] → B-PER I-PER O
    word_ids = [None, 0, 0, 1, 2, None]
    logits[1, model_order.index("B-PER")] = 8.0
    logits[2, model_order.index("B-LOC")] = 8.0  # 2nd subword must be IGNORED
    logits[3, model_order.index("I-PER")] = 8.0
    logits[4, model_order.index("O")] = 8.0
    em = project_emissions(first_subword_emissions(logits, word_ids), model_order)
    assert decode_projected(em, 3) == ["B-PER", "I-PER", "O"]
