"""S2 — sentence segmentation + word tokenization (flat-map-shaped map_batches).

One page row → N sentence rows ``(url, sent_id, sentence, tokens, n_tokens)``.
Carrying the ``(url, sent_id)`` key on every row is what removes the
reference's reliance on iteration order for eval alignment
(DistilBERT-CRF/src/trainer.py:380-381; SURVEY.md §2.9).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textfns import split_sentences, tokenize_words


def sentseg_batch(batch: pa.Table, *, max_tokens: int = 192) -> pa.Table:
    """Truncation at ``max_tokens`` mirrors the reference's max_seq_length
    truncation semantics (src/data_module.py:88-90; configs/default.yaml:12)."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = (
        batch.column("lang").to_pylist()
        if "lang" in batch.column_names
        else [None] * len(urls)
    )
    o_url, o_sid, o_sent, o_toks, o_lang = [], [], [], [], []
    for url, text, lang in zip(urls, texts, langs):
        for sid, sent in enumerate(split_sentences(text or "")):
            toks = tokenize_words(sent)[:max_tokens]
            if not toks:
                continue
            o_url.append(url)
            o_sid.append(sid)
            o_sent.append(sent)
            o_toks.append(toks)
            o_lang.append(lang)
    return pa.table(
        {
            "url": pa.array(o_url, pa.string()),
            "sent_id": pa.array(o_sid, pa.int32()),
            "sentence": pa.array(o_sent, pa.string()),
            "tokens": pa.array(o_toks, pa.list_(pa.string())),
            "n_tokens": pa.array([len(t) for t in o_toks], pa.int32()),
            "lang": pa.array(o_lang, pa.string()),
        }
    )
