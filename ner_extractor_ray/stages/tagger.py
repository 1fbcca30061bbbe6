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


class DeterministicTagger:
    def __init__(self):
        # once per actor: build the lookup state (the reference loads model
        # weights / tokenizer here — src/tokenization.py:11-47 lru_cache analog)
        self.trie = gazetteer_token_trie()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.viterbi import N_LABELS, viterbi_decode_padded

        tokens_col = batch.column("tokens").to_pylist()
        n = len(tokens_col)
        emissions = [
            emissions_for_sentence(toks, self.trie) if toks else None
            for toks in tokens_col
        ]
        # batched Viterbi in length-sorted chunks: padding cost is O(N × Tmax)
        # per chunk, so one 192-token straggler must not pad a whole batch of
        # ~10-token sentences
        order = sorted(range(n), key=lambda i: len(tokens_col[i]))
        paths: list = [None] * n
        CHUNK = 256
        for c in range(0, n, CHUNK):
            idx = [i for i in order[c : c + CHUNK] if emissions[i] is not None]
            if not idx:
                continue
            lengths = np.array([emissions[i].shape[0] for i in idx], dtype=np.int64)
            tmax = int(lengths.max())
            em = np.zeros((len(idx), tmax, N_LABELS), dtype=np.float64)
            for j, i in enumerate(idx):
                em[j, : lengths[j]] = emissions[i]
            for j, path in zip(idx, viterbi_decode_padded(em, lengths)):
                paths[j] = path
        tags_out = [
            [LABELS[k] for k in paths[i]] if paths[i] is not None else []
            for i in range(n)
        ]
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
