"""S4 — NER scoring stage: emissions → Viterbi BIO tags (actor-pool map_batches).

The canonical stateful stage (SURVEY.md §2.3 T2/T4): state (gazetteer trie /
model weights) is built ONCE per actor in ``__init__``; ``__call__`` scores one
Arrow batch. Reference analog: DistilBERT-CRF forward + ``crf.viterbi_decode``
(DistilBERT-CRF/src/modeling.py:83-141, 123-132).

Two interchangeable scorers (SURVEY.md §7.0):
  * ``DeterministicTagger`` — pure-numpy emission function + shared Viterbi;
    used in this sandbox (no torch) and by tests/bench.
  * ``HFTagger`` — DistilBERT-CRF checkpoint, import-guarded; same interface;
    pass ``num_gpus=...`` to map_batches when used.
"""

from __future__ import annotations

import pyarrow as pa

from .. import LABELS
from ..functions.gazetteer import gazetteer_token_trie
from ..functions.tagging import emissions_for_sentence
from ..functions.viterbi import viterbi_decode


class DeterministicTagger:
    def __init__(self):
        # once per actor: build the lookup state (the reference loads model
        # weights / tokenizer here — src/tokenization.py:11-47 lru_cache analog)
        self.trie = gazetteer_token_trie()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens_col = batch.column("tokens").to_pylist()
        tags_out = []
        for tokens in tokens_col:
            if not tokens:
                tags_out.append([])
                continue
            em = emissions_for_sentence(tokens, self.trie)
            path = viterbi_decode(em)
            tags_out.append([LABELS[i] for i in path])
        return batch.append_column("tags", pa.array(tags_out, pa.list_(pa.string())))


try:  # optional real-model scorer when torch/transformers are installed
    import torch  # noqa: F401

    class HFTagger:
        """DistilBERT-CRF checkpoint scorer (same interface). Only importable
        when torch is present; the checkpoint loads once per actor
        (reference: scripts/train_distilbert_crf.py:222-234)."""

        def __init__(self, checkpoint_path: str):
            raise NotImplementedError(
                "HFTagger requires a trained checkpoint; wire up when torch "
                "and a checkpoint are available."
            )

except ImportError:  # pragma: no cover
    HFTagger = None
