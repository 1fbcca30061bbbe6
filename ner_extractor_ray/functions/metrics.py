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


def align_predictions(
    pred_ids: list[int], label_ids: list[int], id_to_label: dict[int, str],
    *, ignore: int = -100,
) -> tuple[list[str], list[str]]:
    """M9 — zip pred/gold id sequences, drop positions where gold==ignore,
    map ids→tags (DistilBERT-CRF/src/metrics.py:22-43 semantics)."""
    pred_tags, gold_tags = [], []
    for p, g in zip(pred_ids, label_ids):
        if g == ignore:
            continue
        pred_tags.append(id_to_label[p])
        gold_tags.append(id_to_label[g])
    return pred_tags, gold_tags


def confusion_topk(pred_ds, gold_ds, keys: list[str], label_col: str, k: int = 10):
    """A8 — confusion pairs between two labeled span tables: join on the span
    identity keys, group by (gold_label, pred_label), count, top-k with the
    canonical groupby→sort→limit pattern (scripts/error_analysis.py:35,80-88).

    Returns a Dataset of (gold_label, pred_label, n) rows, count-desc."""
    import pyarrow as _pa

    from ..stages.canonicalize import grouped_aggregate, pre_aggregated_count
    from ..stages.joins import hash_join

    p = pred_ds.select_columns(keys + [label_col]).map_batches(
        lambda t: t.rename_columns(keys + ["pred_label"]), batch_format="pyarrow"
    )
    g = gold_ds.select_columns(keys + [label_col]).map_batches(
        lambda t: t.rename_columns(keys + ["gold_label"]), batch_format="pyarrow"
    )
    joined = hash_join(p, g, on=tuple(keys))
    counts = pre_aggregated_count(
        joined.select_columns(["gold_label", "pred_label"]),
        ["gold_label", "pred_label"],
        "n",
    )
    return counts.sort(["n", "gold_label", "pred_label"], descending=[True, False, False]).limit(k)


def clustering_homogeneity(assigned_ds, cluster_col: str, label_col: str) -> float:
    """A9 — homogeneity score h = 1 - H(label|cluster)/H(label) over a
    clustered, labeled table (scripts/visualize_embeddings.py:217-247 analog,
    KMeans quality). Distributed counts, driver-side entropy (tiny)."""
    import math

    from ..stages.canonicalize import pre_aggregated_count

    rows = pre_aggregated_count(
        assigned_ds.select_columns([cluster_col, label_col]),
        [cluster_col, label_col],
        "n",
    ).take_all()
    total = sum(r["n"] for r in rows)
    if total == 0:
        return 1.0
    by_label: dict = {}
    by_cluster: dict = {}
    for r in rows:
        by_label[r[label_col]] = by_label.get(r[label_col], 0) + r["n"]
        by_cluster.setdefault(r[cluster_col], {})[r[label_col]] = r["n"]
    h_label = -sum((c / total) * math.log(c / total) for c in by_label.values())
    if h_label == 0:
        return 1.0
    h_cond = 0.0
    for members in by_cluster.values():
        csize = sum(members.values())
        for c in members.values():
            h_cond -= (c / total) * math.log(c / csize)
    return 1.0 - h_cond / h_label


def clustering_homogeneity_gini_ppm(assigned_ds, cluster_col: str,
                                    label_col: str) -> int:
    """A9, integer-exact variant — GINI-impurity homogeneity in parts-per-
    million: h_ppm = 10⁶ − ⌊C·N / (N² − Σ_c L_c²)⌋ with
    C = Σ_k ⌊10⁶·(S_k² − Σ_c n_{k,c}²) / S_k⌋, where N is the row count,
    L_c the label counts, S_k the cluster sizes and n_{k,c} the
    cluster-label counts. Same ORDERING intuition as the entropy form
    (pure clusters → 10⁶) with none of the float-log parity risk — every
    op is arbitrary-precision integer on the driver and HUGEINT in the
    DuckDB oracle (queries.py), so the result is bit-reproducible at any
    parallelism. All intermediate terms are non-negative, so truncating
    division == floor on both sides. Driver working set is the
    (cluster × label)-vocabulary count table, never the corpus."""
    from ..stages.canonicalize import pre_aggregated_count

    rows = pre_aggregated_count(
        assigned_ds.select_columns([cluster_col, label_col]),
        [cluster_col, label_col],
        "n",
    ).take_all()
    total = sum(int(r["n"]) for r in rows)
    if total == 0:
        return 1_000_000
    by_label: dict = {}
    by_cluster: dict = {}
    for r in rows:
        n = int(r["n"])
        by_label[r[label_col]] = by_label.get(r[label_col], 0) + n
        by_cluster.setdefault(r[cluster_col], []).append(n)
    tot = total * total - sum(c * c for c in by_label.values())
    if tot == 0:  # one label: conditional impurity is 0 everywhere
        return 1_000_000
    cond = 0
    for members in by_cluster.values():
        s = sum(members)
        cond += (1_000_000 * (s * s - sum(n * n for n in members))) // s
    return 1_000_000 - (cond * total) // tot


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


def best_config(rows: list[dict], metric: str, *, maximize: bool = True,
                tiebreak: list[str] | None = None) -> dict:
    """A10 — grid-search argmax over per-config result rows (the driver
    reduce of the reference's BiLSTM grid search,
    BiLSTM-CRF/5489Project_trainv2.ipynb cells 7-8: best F1 over the
    (hidden, lr, embedding) grid). Deterministic: ties break on the sorted
    ``tiebreak`` columns ascending."""
    if not rows:
        raise ValueError("best_config: empty result set")
    tb = tiebreak or sorted(k for k in rows[0] if k != metric)
    # stable two-stage sort: tiebreak columns ascending first, then the
    # metric — the first row of the best metric value wins ties
    by_tb = sorted(rows, key=lambda r: tuple(r[t] for t in tb))
    by_metric = sorted(by_tb, key=lambda r: r[metric], reverse=maximize)
    return by_metric[0]
