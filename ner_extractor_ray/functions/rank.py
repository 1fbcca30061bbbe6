"""Global row-number / rank over a total order — a distributed operator Ray
Data lacks (``ds.sort()`` orders blocks but exposes no row position).

Physical plan (range-partitioned rank, NO global sort of full rows):

  1. bucket edges from a bounded PREFIX SAMPLE of the key column (a
     ``limit(sample_rows)`` scan — early-terminating, reads only the first
     blocks at any scale), as sample quantiles so skewed key distributions
     still give balanced buckets;
  2. ONE tree-reduced ``aggregate`` over the key column → exact per-bucket
     histogram (a custom ``AggregateFn`` summing a B-vector per block — no
     groupby shuffle, no driver take_all of per-block partials);
  3. the driver turns bucket counts into exclusive rank offsets in key order;
  4. one shuffle of the full rows by bucket; inside each bucket group the rows
     are sorted locally and ranked ``offset + 1 + arange``.

Only step 4 moves whole rows, and it is a single hash-sized shuffle — at
100 TB this beats a global ``ds.sort`` because the heavy data moves once and
each bucket sorts independently. Exactness does NOT depend on the sample or
on bucket balance: ``searchsorted`` clamps keys outside the sampled range
into the end buckets, the bucket is a pure function of the key value, and
the histogram is exact — estimation quality affects only skew, never values.

Requires a total order: (key_col, tiebreak_col) must be duplicate-free
(e.g. any unique id as tie-break) and non-null.

Reference analog: the reference ranks grid-search rows with a pandas
``sort_values`` on the driver (BiLSTM notebook cell 8); this is the same
semantics made distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import AggregateFn


def _block_col(block, col: str) -> np.ndarray:
    if isinstance(block, pa.Table):
        return np.asarray(block.column(col), dtype=np.float64)
    return block[col].to_numpy(dtype=np.float64)


def _sample_edges(
    ds: "ray.data.Dataset", key_col: str, n_buckets: int,
    sample_rows: int = 65536,
) -> np.ndarray:
    """Internal bucket edges (ascending, deduplicated) from the quantiles of
    a bounded prefix sample. Affects balance only — never output values."""
    rows = ds.select_columns([key_col]).limit(sample_rows).take_all()
    vals = np.array([r[key_col] for r in rows], dtype=np.float64)
    if vals.size == 0:
        return np.empty(0)
    qs = np.linspace(0.0, 1.0, n_buckets + 1)[1:-1]
    return np.unique(np.quantile(vals, qs))


def _hist_aggregate(
    ds: "ray.data.Dataset", key_col: str, edges: np.ndarray,
    val_col: str | None = None,
) -> np.ndarray:
    """Exact per-bucket histogram (counts, or int64 sums of ``val_col``) in
    ONE tree-combined pass — no shuffle, nothing block-count-sized on the
    driver."""
    B = len(edges) + 1
    # key_col may double as val_col (e.g. prefix sum of the sort key itself)
    cols = [key_col] if val_col in (None, key_col) else [key_col, val_col]

    def acc(a: np.ndarray, block) -> np.ndarray:
        b = np.searchsorted(edges, _block_col(block, key_col), side="right")
        if val_col is None:
            return a + np.bincount(b, minlength=B)
        v = (np.asarray(block.column(val_col), dtype=np.int64)
             if isinstance(block, pa.Table)
             else block[val_col].to_numpy(dtype=np.int64))
        out = a.copy()
        np.add.at(out, b, v)  # integer-exact (bincount weights are float64)
        return out

    fn = AggregateFn(
        init=lambda k: np.zeros(B, dtype=np.int64),
        merge=lambda a, b: a + b,
        name="hist",
        accumulate_block=acc,
        finalize=lambda a: a,
    )
    res = ds.select_columns(cols).aggregate(fn)
    return np.asarray(res["hist"], dtype=np.int64)


def global_rank(
    ds: "ray.data.Dataset",
    key_col: str,
    tiebreak_col: str,
    *,
    descending: bool = True,
    n_buckets: int = 64,
    out: str = "rank",
) -> "ray.data.Dataset":
    edges = _sample_edges(ds, key_col, n_buckets)
    B = len(edges) + 1

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(edges, vals, side="right").astype(np.int64)

    per_bucket = _hist_aggregate(ds, key_col, edges)
    scan_order = range(B - 1, -1, -1) if descending else range(B)
    offsets = np.zeros(B, dtype=np.int64)
    acc = 0
    for b in scan_order:
        offsets[b] = acc
        acc += per_bucket[b]
    off_list = offsets.tolist()  # tiny; ships in the task closure

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_of(np.asarray(t.column(key_col), dtype=np.float64))
        return t.append_column("__rb", pa.array(b, pa.int64()))

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__rb"].iloc[0])
        g = g.sort_values(
            [key_col, tiebreak_col], ascending=[not descending, True], kind="mergesort"
        )
        g[out] = off_list[b] + 1 + np.arange(len(g), dtype=np.int64)
        return g.drop(columns="__rb")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(rank_group, batch_format="pandas")
    )


def keyed_prefix_sum(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    *,
    n_buckets: int = 64,
    out: str = "prefix_sum",
    tiebreak_col: str | None = None,
) -> "ray.data.Dataset":
    """EXCLUSIVE prefix sum of ``val_col`` in ``key_col`` order — the
    distributed scan primitive (sequence packing, global byte offsets,
    watermark accounting) built with the same sampled-edges + tree-reduced
    histogram plan as :func:`global_rank`, with per-bucket SUMS instead of
    counts; then ONE shuffle of the rows by bucket with a local sorted cumsum
    inside. No global sort; exactness independent of the sample and of bucket
    balance. Keys must be non-null and either unique, or made a total order
    by passing a duplicate-free ``tiebreak_col`` (duplicate keys share a
    bucket — the bucket is a pure function of the key — and order inside by
    the tiebreak)."""
    edges = _sample_edges(ds, key_col, n_buckets)
    B = len(edges) + 1

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(edges, vals, side="right").astype(np.int64)

    per_bucket = _hist_aggregate(ds, key_col, edges, val_col=val_col)
    offsets = np.zeros(B, dtype=np.int64)
    acc = 0
    for b in range(B):
        offsets[b] = acc
        acc += per_bucket[b]
    off_list = offsets.tolist()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_of(np.asarray(t.column(key_col), dtype=np.float64))
        return t.append_column("__rb", pa.array(b, pa.int64()))

    sort_cols = [key_col] if tiebreak_col is None else [key_col, tiebreak_col]

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__rb"].iloc[0])
        g = g.sort_values(sort_cols, kind="mergesort")
        v = g[val_col].to_numpy(dtype=np.int64)
        g[out] = off_list[b] + np.concatenate(([0], np.cumsum(v)[:-1]))
        return g.drop(columns="__rb")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(scan_group, batch_format="pandas")
    )


_I64_MIN = np.iinfo(np.int64).min


def _max_aggregate(
    ds: "ray.data.Dataset", key_col: str, edges: np.ndarray, val_col: str,
) -> np.ndarray:
    """Exact per-bucket int64 MAX of ``val_col`` in ONE tree-combined pass
    (``_I64_MIN`` for empty buckets) — the max-monoid sibling of
    :func:`_hist_aggregate`."""
    B = len(edges) + 1

    def acc(a: np.ndarray, block) -> np.ndarray:
        b = np.searchsorted(edges, _block_col(block, key_col), side="right")
        v = (np.asarray(block.column(val_col), dtype=np.int64)
             if isinstance(block, pa.Table)
             else block[val_col].to_numpy(dtype=np.int64))
        out = a.copy()
        np.maximum.at(out, b, v)
        return out

    fn = AggregateFn(
        init=lambda k: np.full(B, _I64_MIN, dtype=np.int64),
        merge=np.maximum,
        name="bmax",
        accumulate_block=acc,
        finalize=lambda a: a,
    )
    res = ds.select_columns([key_col, val_col]).aggregate(fn)
    return np.asarray(res["bmax"], dtype=np.int64)


def keyed_prefix_max(
    ds: "ray.data.Dataset",
    key_col: str,
    tiebreak_col: str,
    val_col: str,
    *,
    n_buckets: int = 64,
    out: str = "prefix_max",
) -> "ray.data.Dataset":
    """EXCLUSIVE prefix max of ``val_col`` in (``key_col``, ``tiebreak_col``)
    order — the streaming-scan primitive behind watermarks, record-high
    detection and high-water-mark accounting. Same physical plan as
    :func:`keyed_prefix_sum` with the max monoid: sampled bucket edges, ONE
    tree-reduced per-bucket max pass, driver-side exclusive scan over the
    B-vector, then ONE shuffle of the rows by bucket with a local sorted
    cummax inside. Rows strictly first in the total order get ``_I64_MIN``.
    (key, tiebreak) must be duplicate-free and non-null; duplicate KEYS are
    fine — the bucket is a pure function of the key, ties order inside."""
    edges = _sample_edges(ds, key_col, n_buckets)
    B = len(edges) + 1

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(edges, vals, side="right").astype(np.int64)

    per_bucket = _max_aggregate(ds, key_col, edges, val_col)
    offsets = np.full(B, _I64_MIN, dtype=np.int64)
    acc = _I64_MIN
    for b in range(B):
        offsets[b] = acc
        acc = max(acc, int(per_bucket[b]))
    off_list = offsets.tolist()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_of(np.asarray(t.column(key_col), dtype=np.float64))
        return t.append_column("__rb", pa.array(b, pa.int64()))

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__rb"].iloc[0])
        g = g.sort_values([key_col, tiebreak_col], kind="mergesort")
        v = g[val_col].to_numpy(dtype=np.int64)
        run = np.maximum.accumulate(v)
        prior = np.concatenate(([np.int64(_I64_MIN)], run[:-1]))
        g[out] = np.maximum(np.int64(off_list[b]), prior)
        return g.drop(columns="__rb")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(scan_group, batch_format="pandas")
    )
