"""Strict entity/triple-level P/R/F1 as set matching (SURVEY.md J6/A5).

The reference scores with seqeval's strict entity matching: TP = exact
(type, start, end) agreement per sentence (DistilBERT-CRF/src/metrics.py:46-59,
seqeval internals). Re-expressed relationally: an inner join of the pred and
gold span tables on ALL key columns, counted — plus micro P/R/F1 from the
three counts. Works on small in-memory Arrow tables (tests) and on Datasets
(distributed inner join + count) with identical semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


@dataclass(frozen=True)
class PRF:
    """Mirror of the reference's frozen metrics record (src/metrics.py:12-19)."""

    precision: float
    recall: float
    f1: float
    tp: int
    n_pred: int
    n_gold: int


def _key_set(table: pa.Table, keys: list[str]) -> set[tuple]:
    cols = [table.column(k).to_pylist() for k in keys]
    return set(zip(*cols)) if cols and len(cols[0]) else set()


def span_prf(pred: pa.Table, gold: pa.Table, keys: list[str]) -> PRF:
    """Strict micro P/R/F1 between two span/triple tables on exact key match.

    NOTE set semantics (duplicates collapse), matching seqeval's per-sentence
    span-set intersection — keys should include the sentence identity
    (url, sent_id) to scope matches, exactly as the reference does.
    """
    p = _key_set(pred, keys)
    g = _key_set(gold, keys)
    tp = len(p & g)
    prec = tp / len(p) if p else 0.0
    rec = tp / len(g) if g else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return PRF(prec, rec, f1, tp, len(p), len(g))


def span_prf_distributed(pred_ds, gold_ds, keys: list[str]) -> PRF:
    """Same metric over Datasets: dedup both sides (pre-aggregated), inner
    hash join, three counts. Use when pred/gold don't fit on the driver."""
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    p = pre_aggregated_count(pred_ds.select_columns(keys), keys, "_np").select_columns(keys)
    g = pre_aggregated_count(gold_ds.select_columns(keys), keys, "_ng").select_columns(keys)
    n_pred = p.count()
    n_gold = g.count()
    tp = hash_join(p, g, on=tuple(keys)).count() if n_pred and n_gold else 0
    prec = tp / n_pred if n_pred else 0.0
    rec = tp / n_gold if n_gold else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return PRF(prec, rec, f1, tp, n_pred, n_gold)
