"""S6 — dependency-pattern relation extraction → raw triples (map_batches).

Operates on tagged sentence rows. Mentions are decoded in-stage (shared BIO
decode), then every ADJACENT mention pair is tested against the connective-
phrase pattern table (functions/gazetteer.py RELATION_PATTERNS): the exact
token gap between the two mentions selects a predicate, with type constraints
and subject-role direction ("X was founded by Y" → (Y, founded, X)).

Output rows: (url, sent_id, subj, subj_type, pred, obj, obj_type).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.bio import extract_entities, fix_bio
from ..functions.gazetteer import RELATION_PATTERNS


def relations_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    sids = batch.column("sent_id").to_pylist()
    tokens_col = batch.column("tokens").to_pylist()
    tags_col = batch.column("tags").to_pylist()
    o = {"url": [], "sent_id": [], "subj": [], "subj_type": [],
         "pred": [], "obj": [], "obj_type": []}
    for url, sid, tokens, tags in zip(urls, sids, tokens_col, tags_col):
        spans = extract_entities(fix_bio(list(tags)))
        if len(spans) < 2:
            continue
        spans.sort(key=lambda x: x[1])
        for (t1, s1, e1), (t2, s2, e2) in zip(spans, spans[1:]):
            gap = " ".join(tokens[e1:s2])
            pat = RELATION_PATTERNS.get(gap)
            if pat is None:
                continue
            pred, subj_role, want1, want2 = pat
            if (want1 != "*" and t1 != want1) or (want2 != "*" and t2 != want2):
                continue
            m1 = " ".join(tokens[s1:e1])
            m2 = " ".join(tokens[s2:e2])
            if subj_role == "first":
                subj, styp, obj, otyp = m1, t1, m2, t2
            else:
                subj, styp, obj, otyp = m2, t2, m1, t1
            o["url"].append(url)
            o["sent_id"].append(sid)
            o["subj"].append(subj)
            o["subj_type"].append(styp)
            o["pred"].append(pred)
            o["obj"].append(obj)
            o["obj_type"].append(otyp)
    return pa.table(
        {
            "url": pa.array(o["url"], pa.string()),
            "sent_id": pa.array(o["sent_id"], pa.int32()),
            "subj": pa.array(o["subj"], pa.string()),
            "subj_type": pa.array(o["subj_type"], pa.string()),
            "pred": pa.array(o["pred"], pa.string()),
            "obj": pa.array(o["obj"], pa.string()),
            "obj_type": pa.array(o["obj_type"], pa.string()),
        }
    )
