"""S3 — subword tokenization + first-subword label alignment (map_batches).

Reproduces the structural invariant of the reference's tokenize_and_align
transform (DistilBERT-CRF/src/data_module.py:83-119, core loop 98-110): each
word expands to 1..k subwords; only the FIRST subword of a word carries the
word's label position; continuations get the ignore marker. We keep the data
columnar — ``input_ids: list<int32>`` and ``word_ids: list<int32>`` (−1 =
continuation/special, the −100 analog) — no padding, because decode is per-row
(SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

from .. import IGNORE_LABEL_ID  # noqa: F401  (documented constant; −1 used in word_ids)
from ..functions.textfns import subword_id, subword_tokenize
from ..functions.wordpiece import default_vocab, wordpiece_tokenize

# (use_hash_vocab, word) → subword ids; shared across calls in one worker.
# Valid only for ONE default-vocab object: default_vocab() is lru_cached so it
# normally returns the same dict for the process lifetime, but if the cache is
# ever cleared / the packaged vocab becomes configurable, the identity check
# below invalidates _WP_CACHE instead of silently serving stale piece ids.
_WP_CACHE: dict = {}
_WP_CACHE_VOCAB: dict | None = None  # the default-vocab object _WP_CACHE maps


def tokenize_batch(
    batch: pa.Table, *, label_all_tokens: bool = False, vocab: dict | None = None,
    use_hash_vocab: bool = False,
) -> pa.Table:
    """``label_all_tokens`` propagates the word index to continuation subwords
    instead of −1, mirroring the reference's config flag
    (src/data_module.py:104-110; RoBERTa variant NER_roberta.ipynb cell 10).

    Subwords come from the packaged greedy-longest-match WordPiece vocabulary
    (functions/wordpiece.py; ids = vocab line index, the real tokenizer
    contract of src/tokenization.py:11-47). ``use_hash_vocab=True`` selects
    the vocab-free chunker+crc-id fallback (textfns.subword_tokenize) for
    callers without a vocabulary file."""
    default = False
    if not use_hash_vocab:
        if vocab is None:
            vocab = default_vocab()
            default = True
    # per-WORD memo (process-lifetime, bounded): WordPiece is a pure function
    # of the word, and a corpus batch repeats its vocabulary heavily — the
    # greedy longest-match loop runs once per DISTINCT word per worker
    # instead of once per occurrence (measured 12.6 → ~1 µs/sentence on the
    # bench corpus). Only the packaged default vocab (and the vocab-free
    # hash path) may use the shared cache — a caller-supplied vocab would
    # alias entries across different vocabularies.
    cacheable = use_hash_vocab or default
    cache = _WP_CACHE if cacheable else None
    if default:
        global _WP_CACHE_VOCAB
        if _WP_CACHE_VOCAB is not vocab:  # new default-vocab object → stale
            _WP_CACHE.clear()
            _WP_CACHE_VOCAB = vocab
    tokens_col = batch.column("tokens").to_pylist()
    ids_out, wids_out = [], []
    for words in tokens_col:
        ids: list[int] = []
        wids: list[int] = []
        for w_idx, w in enumerate(words):
            pids = cache.get((use_hash_vocab, w)) if cache is not None else None
            if pids is None:
                if use_hash_vocab:
                    pieces = subword_tokenize(w)
                    pids = [subword_id(p) for p in pieces]
                else:
                    pieces = wordpiece_tokenize(w, vocab)
                    pids = [vocab.get(p, 0) for p in pieces]
                if cache is not None and len(cache) < (1 << 16):
                    cache[(use_hash_vocab, w)] = pids
            for p_i, pid in enumerate(pids):
                ids.append(pid)
                if p_i == 0 or label_all_tokens:
                    wids.append(w_idx)
                else:
                    wids.append(-1)
        ids_out.append(ids)
        wids_out.append(wids)
    return batch.append_column(
        "input_ids", pa.array(ids_out, pa.list_(pa.int32()))
    ).append_column("word_ids", pa.array(wids_out, pa.list_(pa.int32())))
