"""Sampling / packing / fold query family (split from pipelines/queries.py — its module
docstring holds the catalogue conventions; the queries()/oracle_sql()
catalogue there re-exports every entry in the driver-stable order)."""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ._qcommon import (
    _ALNUM, _gagg, _nonempty_or_empty_table, _rp,
)



def q_doc_sample_hash(sf_dir: str):
    """O5/O7 analog at scale: deterministic Bernoulli sampling by content hash
    (seeded RNG order doesn't survive distribution; md5 < threshold does, and
    the SQL oracle reproduces it exactly). ~1/8 of rows."""
    import hashlib as _hl

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def pick(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        mask = [_hl.md5(str(i).encode()).hexdigest() < "2" for i in ids]
        out = t.filter(pa.array(mask, pa.bool_()))
        return pa.table({"doc_id": pc.cast(out.column("doc_id"), pa.int64())})

    return ds.map_batches(pick, batch_format="pyarrow")


def q_fold_counts(sf_dir: str):
    """O3 GroupKFold analog: deterministic partition column doc_id % 5."""
    ds = _rp(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        fold = pc.cast(t.column("doc_id"), pa.int64()).to_numpy() % 5
        df = pd.DataFrame({"fold": fold})
        g = df.groupby("fold", as_index=False).size().rename(columns={"size": "n_docs"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fold")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def q_sample_events(sf_dir: str):
    """O7 sampling analog, made deterministic: systematic 1-in-20 sample by
    key (hash/RNG-free so the SQL oracle reproduces it exactly)."""
    ds = _rp(sf_dir, "events", ["event_id", "event_type"])

    def pick(t: pa.Table) -> pa.Table:
        mask = (pc.cast(t.column("event_id"), pa.int64()).to_numpy() % 20) == 0
        return t.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow")


def q_fold_stats(sf_dir: str):
    """A7 per-fold mean/variance — computed from exact integer sums so the
    double arithmetic is the identical expression on both sides."""
    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        doc = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        nc = pc.cast(t.column("n_chars"), pa.int64()).to_numpy()
        df = pd.DataFrame({"fold": doc % 5, "s": nc, "ss": nc * nc})
        g = df.groupby("fold", as_index=False).agg(
            n=("s", "size"), s=("s", "sum"), ss=("ss", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fold")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.float64())
        s = pc.cast(t.column("s"), pa.float64())
        ss = pc.cast(t.column("ss"), pa.float64())
        mean = pc.divide(s, n)
        var = pc.subtract(pc.divide(ss, n), pc.multiply(mean, mean))
        return pa.table(
            {
                "fold": t.column("fold"),
                "n_docs": t.column("n"),
                "mean_chars": mean,
                "var_chars": var,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_best_fold(sf_dir: str):
    """A10 grid-search argmax analog: the fold with the highest mean_chars
    (tie → lowest fold), computed as a driver reduce over the tiny per-fold
    stats table — the best-config selection of the reference's BiLSTM grid
    search (BiLSTM-CRF/5489Project_trainv2.ipynb cells 7-8)."""
    from ..functions.metrics import best_config

    rows = q_fold_stats(sf_dir).take_all()  # 5 rows — the A10 reduce is driver-side
    best = best_config(rows, "mean_chars", tiebreak=["fold"])
    return pa.table(
        {"fold": pa.array([int(best["fold"])], pa.int64()),
         "mean_chars": pa.array([float(best["mean_chars"])], pa.float64())}
    )


def q_per_source_sample(sf_dir: str, *, k: int = 5):
    """Deterministic k-per-stratum downsample (data-mix curation): keep the
    k docs with the smallest md5(doc_id) per source. Per-batch partial
    top-k caps the shuffle at k rows per (batch, source) — the stratified
    variant of the partial-top-k pattern; the final per-source merge sees
    ≤ k·n_blocks rows however large the corpus is."""
    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    import hashlib

    def _hx(ids) -> list[str]:
        return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": pc.cast(t.column("doc_id"), pa.int64()).to_numpy(),
                           "source": t.column("source").to_pylist()})
        df["h"] = _hx(df["doc_id"])
        df = df.sort_values(["source", "h", "doc_id"]).groupby("source").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["h", "doc_id"]).head(k)
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["source", "doc_id", "rk"]], preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


SEQ_CAPACITY = 2048


def q_seq_packing(sf_dir: str):
    """LLM sequence packing: concatenate documents in doc_id order and cut
    fixed-capacity training sequences — every doc gets (seq_id, seq_offset)
    from a GLOBAL exclusive prefix sum of token counts, computed with the
    range-partitioned two-pass scan (functions/rank.keyed_prefix_sum): no
    global sort, one narrow histogram pass + one row shuffle."""
    from ..functions.rank import keyed_prefix_sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = [len(_ALNUM.findall((s or "").lower())) for s in t.column("text").to_pylist()]
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_tokens": pa.array(n, pa.int64())}
        )

    scanned = keyed_prefix_sum(
        ds.map_batches(toks, batch_format="pyarrow"), "doc_id", "n_tokens",
        out="cum0",
    )

    def finish(t: pa.Table) -> pa.Table:
        cum0 = np.asarray(t.column("cum0"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "seq_id": pa.array(cum0 // SEQ_CAPACITY, pa.int64()),
                "seq_offset": pa.array(cum0 % SEQ_CAPACITY, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


_MIX_RATES = {"en": "2", "de": "8"}  # md5-hex thresholds: en ≈ 1/8, de ≈ 1/2
_MIX_DEFAULT = "4"                   # other langs ≈ 1/4


def q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling — the data-MIXING primitive: each
    language keeps a different hash-Bernoulli fraction (downsample the
    dominant source, upweight the rest), reproducible at any parallelism
    because membership is a pure function of the row key, never RNG order."""
    import hashlib as _hl

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def pick(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        langs = t.column("lang").to_pylist()
        mask = [
            _hl.md5(str(i).encode()).hexdigest() < _MIX_RATES.get(l, _MIX_DEFAULT)
            for i, l in zip(ids, langs)
        ]
        out = t.filter(pa.array(mask, pa.bool_()))
        return pa.table(
            {"doc_id": pc.cast(out.column("doc_id"), pa.int64()),
             "lang": out.column("lang")}
        )

    return ds.map_batches(pick, batch_format="pyarrow")


_WS_K = 20


def q_weighted_sample(sf_dir: str, *, k: int = _WS_K):
    """Deterministic WEIGHTED global top-k — the data-mixing primitive for
    unequal per-doc weights (integer Efraimidis–Spirakis analog): priority =
    md5_62(doc_id) // w with w = char length + 1, keep the k smallest, so
    selection probability grows with document weight yet the sample is
    bit-reproducible at any parallelism (no RNG state). Per-batch partial
    top-k ships ≤ k rows per block; the final merge sees ≤ k·n_blocks rows
    however large the corpus is."""
    from ..functions.textfns import md5_hash64

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        w = np.array([len(s or "") + 1 for s in t.column("text").to_pylist()],
                     dtype=np.int64)
        h = np.fromiter((md5_hash64(str(i)) >> 2 for i in ids),
                        dtype=np.int64, count=len(ids))  # 62-bit → int64 ≥ 0
        pr = h // w
        df = pd.DataFrame({"doc_id": ids, "w": w, "priority": pr, "g": 0})
        df = df.sort_values(["priority", "doc_id"]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["priority", "doc_id"]).head(k)
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["doc_id", "w", "priority", "rk"]], preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def q_balanced_sample(sf_dir: str):
    """BALANCED class downsampling: every event type keeps exactly
    min-class-count rows, selected deterministically by md5(event_id) —
    the class-equalization step before training on skewed labels (no RNG:
    the hash IS the sampling order, so the result is parallelism- and
    rerun-stable). Per-batch lossless top-k combiner (each batch keeps its
    k hash-smallest rows per type, k = min class count from a 5-row
    aggregate), then the per-type exact re-rank runs on ≤ k·blocks rows —
    the fact table never shuffles whole."""
    import hashlib as _hl

    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_id", "event_type"])
    counts = grouped_aggregate(
        ds.map_batches(
            lambda t: pa.table(
                {"event_type": t.column("event_type"),
                 "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["event_type"], Sum("one", alias_name="n")).take_all()
    k = min(int(r["n"]) for r in counts)

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("event_id"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {"event_id": ids,
             "event_type": t.column("event_type").to_pylist(),
             "h": [_hl.md5(str(i).encode()).hexdigest() for i in ids]})
        df = df.sort_values(["event_type", "h", "event_id"])
        return pa.Table.from_pandas(
            df.groupby("event_type", sort=False).head(k),
            preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"]).head(k)
        return pd.DataFrame({"event_id": g["event_id"].astype("int64"),
                             "event_type": g["event_type"]})

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(final_topk, batch_format="pandas")
    )


_MIX_TARGET = 50


def q_temperature_mix(sf_dir: str):
    """Temperature-weighted data mixing (α = 1/2): per-source sampling quotas
    ∝ √n_s — the standard move to up-weight small sources in a training mix —
    with EXACT integer square roots (math.isqrt in the engine; the SQL oracle
    corrects FLOOR(SQRT(·)) by ±1 against the integer squares, so the two
    agree even where float sqrt rounds across a perfect-square boundary).
    Quotas are q_s = TARGET·w_s // Σw (trunc division, no float shares);
    selection inside each source is the deterministic smallest-md5(doc_id)
    rank — per-batch partial top-max(q) caps the shuffle at quota rows per
    (batch, source), so selection never ships a source's full slice. The
    source-count table (take_all) is mix-config-sized, not corpus-sized."""
    import hashlib
    import math

    counts = _gagg(
        _rp(sf_dir, "documents", ["source"]).map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({"source": t.column("source").to_pylist()})
                .groupby("source", as_index=False).size()
                .rename(columns={"size": "n"}), preserve_index=False),
            batch_format="pyarrow"),
        "source", Sum("n", alias_name="n")).take_all()
    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])
    if not counts:
        return schema.empty_table()
    w = {r["source"]: math.isqrt(int(r["n"])) for r in counts}
    tw = sum(w.values()) or 1
    quota = {s: _MIX_TARGET * ws // tw for s, ws in w.items()}
    qref = ray.put(quota)
    qmax = max(quota.values())

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        df = pd.DataFrame(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()).to_numpy(),
             "source": t.column("source").to_pylist()})
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest()
                   for i in df["doc_id"]]
        df = (df.sort_values(["source", "h", "doc_id"])
              .groupby("source", as_index=False).head(max(qmax, 1)))
        df = df[df["source"].map(q).fillna(0) > 0]
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        q = int(ray.get(qref).get(g["source"].iloc[0], 0))
        g = g.sort_values(["h", "doc_id"]).head(q)
        return g[["doc_id", "source"]].astype({"doc_id": "int64"})

    kept = (_rp(sf_dir, "documents", ["doc_id", "source"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("source").map_groups(final, batch_format="pandas"))
    return _nonempty_or_empty_table(kept, schema)


def q_curriculum_pack(sf_dir: str):
    """CURRICULUM-ordered sequence packing: concatenate documents
    shortest-first (the classic length curriculum) and cut fixed-capacity
    training sequences — q_seq_packing's plan with the scan order changed
    from doc_id to the COMPUTED (n_tokens, doc_id) key, exercising
    keyed_prefix_sum's duplicate-key + tiebreak path (many docs share a
    length; the bucket stays a pure function of the key, ties order by
    doc_id inside). Still no global sort: one narrow histogram pass + one
    row shuffle. Output: (doc_id, n_tokens, seq_id, seq_offset)."""
    from ..functions.rank import keyed_prefix_sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = [len(_ALNUM.findall((s or "").lower()))
             for s in t.column("text").to_pylist()]
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_tokens": pa.array(n, pa.int64())})

    scanned = keyed_prefix_sum(
        ds.map_batches(toks, batch_format="pyarrow"),
        "n_tokens", "n_tokens", tiebreak_col="doc_id", out="cum0")

    def finish(t: pa.Table) -> pa.Table:
        cum0 = np.asarray(t.column("cum0"), dtype=np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_tokens": t.column("n_tokens"),
             "seq_id": pa.array(cum0 // SEQ_CAPACITY, pa.int64()),
             "seq_offset": pa.array(cum0 % SEQ_CAPACITY, pa.int64())})

    return scanned.map_batches(finish, batch_format="pyarrow")


def q_coverage_select(sf_dir: str, *, k: int = 3):
    """Greedy MAX-COVERAGE document selection (the facility-location /
    submodular data-selection step: pick k documents that together cover the
    most distinct vocabulary — the classic 1−1/e greedy). Each of the k
    rounds is ONE row-local corpus pass: every doc counts its tokens not yet
    in the covered set (broadcast via ``ray.put`` — bounded by k × tokens
    per doc, never corpus-sized), a per-batch lossless argmax combiner packs
    (count ≪ 33) ∣ (2³³−1−doc_id) so ties break to the SMALLEST id, and the
    global winner is a one-row Max fold; only the winner's own token set is
    fetched back (one filtered take, doc-sized). Docs contributing zero new
    tokens drop from the argmax (mirrors the SQL GROUP BY over the filtered
    token table); selection stops early when nothing new remains.
    Output: (round, doc_id, new_tokens). Reference analog: the grid-search
    argmax loop (BiLSTM notebook cell 7) turned into a distributed
    coverage-gain argmax per round."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"]).materialize()
    _TIE = (1 << 33) - 1

    covered: frozenset = frozenset()
    selected: list[tuple[int, int, int]] = []
    chosen: set[int] = set()
    for rnd in range(1, k + 1):
        cref = ray.put(covered)
        sel = frozenset(chosen)

        def gain(t: pa.Table, _c=cref, _s=sel) -> pa.Table:
            cov = ray.get(_c)
            best = -1
            for did, s in zip(
                    pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                    t.column("text").to_pylist()):
                if did in _s:
                    continue
                new = len(frozenset(_ALNUM.findall((s or "").lower())) - cov)
                if new > 0:
                    packed = (new << 33) | (_TIE - did)
                    if packed > best:
                        best = packed
            if best < 0:
                return pa.table({"packed": pa.array([], pa.int64())})
            return pa.table({"packed": pa.array([best], pa.int64())})

        top = ds.map_batches(gain, batch_format="pyarrow").max("packed")
        if top is None:
            break
        new_cnt, win_id = int(top) >> 33, _TIE - (int(top) & _TIE)
        wtext = ds.filter(
            lambda r, _w=win_id: int(r["doc_id"]) == _w).take(1)[0]["text"]
        covered = covered | frozenset(_ALNUM.findall((wtext or "").lower()))
        chosen.add(win_id)
        selected.append((rnd, win_id, new_cnt))

    return pa.table({
        "round": pa.array([r for r, _, _ in selected], pa.int64()),
        "doc_id": pa.array([d for _, d, _ in selected], pa.int64()),
        "new_tokens": pa.array([n for _, _, n in selected], pa.int64()),
    })
