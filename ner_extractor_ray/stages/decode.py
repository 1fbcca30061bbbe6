"""S5 — BIO tag stream → mentions table (flat-map-shaped map_batches).

``fix_bio`` canonicalization then span decode, per the reference's
`extract_entities` semantics (BiLSTM-CRF/5489Project_testv2.ipynb cell 7;
fix_bio: 5489Project_trainv2.ipynb cell 3). One sentence row → k mention rows
``(url, sent_id, start, end, type, surface)`` — the mentions table of
SURVEY.md §1.3.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.bio import extract_entities, fix_bio


def decode_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    sids = batch.column("sent_id").to_pylist()
    tokens_col = batch.column("tokens").to_pylist()
    tags_col = batch.column("tags").to_pylist()
    o = {"url": [], "sent_id": [], "start": [], "end": [], "type": [], "surface": []}
    for url, sid, tokens, tags in zip(urls, sids, tokens_col, tags_col):
        for (typ, s, e) in extract_entities(fix_bio(list(tags))):
            o["url"].append(url)
            o["sent_id"].append(sid)
            o["start"].append(s)
            o["end"].append(e)
            o["type"].append(typ)
            o["surface"].append(" ".join(tokens[s:e]))
    return pa.table(
        {
            "url": pa.array(o["url"], pa.string()),
            "sent_id": pa.array(o["sent_id"], pa.int32()),
            "start": pa.array(o["start"], pa.int32()),
            "end": pa.array(o["end"], pa.int32()),
            "type": pa.array(o["type"], pa.string()),
            "surface": pa.array(o["surface"], pa.string()),
        }
    )
