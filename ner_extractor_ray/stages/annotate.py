"""Fused S5+S6+S7a — one corpus pass: tagged sentences → annotations table.

BIO decode (mentions), relation-pattern matching (raw triples) and surface
normalization/alias resolution happen in a SINGLE map_batches over the tagged
checkpoint, emitting a union-layout table (``kind`` = 'm' | 't'). The corpus
is scanned ONCE; the annotations table is orders of magnitude smaller than
the corpus (a few rows per sentence), so downstream consumers filter IT
instead of re-scanning tagged — this halved the end-to-end wall time vs
separate decode and relation passes (BENCH profile, 50k pages).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.bio import extract_entities_fixbio
from ..functions.gazetteer import RELATION_PATTERNS, normalize_surface


class Annotator:
    """Actor-pool callable; state = broadcast alias map (once per actor)."""

    def __init__(self, alias_ref=None):
        from ..functions.gazetteer import alias_canonical_map

        if alias_ref is None:
            self.alias = alias_canonical_map()
        elif isinstance(alias_ref, ray.ObjectRef):
            self.alias = ray.get(alias_ref)
        else:
            self.alias = alias_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        # hot path of the fused corpus pass (~150 µs/page before this shape):
        # one tuple append per output row into per-KIND buffers instead of 17
        # dict-column appends into the union layout; the union's null halves
        # are built as bulk [None]*n columns at the end. Row order within a
        # batch becomes mentions-then-triples — downstream is order-free by
        # design (keys carried everywhere, SURVEY.md O6) and the
        # batch-invariance test compares sorted rows.
        alias = self.alias
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        tokens_col = batch.column("tokens").to_pylist()
        tags_col = batch.column("tags").to_pylist()
        m_rows: list[tuple] = []  # (url, sid, start, end, type, surface, norm, node)
        t_rows: list[tuple] = []  # (url, sid, subj, styp, snode, pred, obj, otyp, onode, prov)

        def node_of(surface: str, typ: str) -> tuple[str, str]:
            n = normalize_surface(surface)
            n = alias.get(n, n)
            return n, f"{typ}:{n}"

        for url, sid, tokens, tags in zip(urls, sids, tokens_col, tags_col):
            spans = extract_entities_fixbio(tags)  # fused fix_bio + decode
            for (typ, s, e) in spans:
                surface = " ".join(tokens[s:e])
                norm, node = node_of(surface, typ)
                m_rows.append((url, sid, s, e, typ, surface, norm, node))
            if len(spans) >= 2:
                # spans are start-ordered by construction of the decode
                for (t1, s1, e1), (t2, s2, e2) in zip(spans, spans[1:]):
                    gap = " ".join(tokens[e1:s2])
                    pat = RELATION_PATTERNS.get(gap)
                    if pat is None:
                        continue
                    pred, role, w1, w2 = pat
                    if (w1 != "*" and t1 != w1) or (w2 != "*" and t2 != w2):
                        continue
                    m1 = " ".join(tokens[s1:e1])
                    m2 = " ".join(tokens[s2:e2])
                    if role == "first":
                        subj, styp, obj, otyp = m1, t1, m2, t2
                    else:
                        subj, styp, obj, otyp = m2, t2, m1, t1
                    _, snode = node_of(subj, styp)
                    _, onode = node_of(obj, otyp)
                    t_rows.append((url, sid, subj, styp, snode, pred, obj,
                                   otyp, onode, f"{url}#{sid:06d}"))

        nm, nt = len(m_rows), len(t_rows)
        mc = list(zip(*m_rows)) if m_rows else [[]] * 8
        tc = list(zip(*t_rows)) if t_rows else [[]] * 10
        m_null = [None] * nm
        t_null = [None] * nt

        def col(m_part, t_part, typ):
            return pa.array(list(m_part) + list(t_part), typ)

        return pa.table(
            {
                "kind": col(["m"] * nm, ["t"] * nt, pa.string()),
                "url": col(mc[0], tc[0], pa.string()),
                "sent_id": col(mc[1], tc[1], pa.int32()),
                "start": col(mc[2], t_null, pa.int32()),
                "end": col(mc[3], t_null, pa.int32()),
                "type": col(mc[4], t_null, pa.string()),
                "surface": col(mc[5], t_null, pa.string()),
                "norm_key": col(mc[6], t_null, pa.string()),
                "node": col(mc[7], t_null, pa.string()),
                "subj": col(m_null, tc[2], pa.string()),
                "subj_type": col(m_null, tc[3], pa.string()),
                "subj_node": col(m_null, tc[4], pa.string()),
                "pred": col(m_null, tc[5], pa.string()),
                "obj": col(m_null, tc[6], pa.string()),
                "obj_type": col(m_null, tc[7], pa.string()),
                "obj_node": col(m_null, tc[8], pa.string()),
                "prov": col(m_null, tc[9], pa.string()),
            }
        )


MENTION_COLS = ["url", "sent_id", "start", "end", "type", "surface", "norm_key", "node"]
TRIPLE_COLS = ["url", "sent_id", "subj", "subj_type", "subj_node",
               "pred", "obj", "obj_type", "obj_node", "prov"]


def split_annotations(annotations: "ray.data.Dataset"):
    """annotations → (mentions_ds, triples_ds) via cheap filters over the
    small materialized table (no corpus re-scan)."""
    import pyarrow.compute as pc

    mentions = annotations.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "m")).select(MENTION_COLS),
        batch_format="pyarrow",
    )
    triples = annotations.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "t")).select(TRIPLE_COLS),
        batch_format="pyarrow",
    )
    return mentions, triples
