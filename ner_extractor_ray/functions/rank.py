"""Global row-number / rank over a total order — a distributed operator Ray
Data lacks (``ds.sort()`` orders blocks but exposes no row position).

Physical plan (range-partitioned rank, NO global sort of full rows):

  1. one tiny aggregate over the key column → global [min, max];
  2. one narrow pass over the key column → per-bucket histogram for B uniform
     value buckets (per-batch partials, then a B-row groupby);
  3. the driver turns bucket counts into exclusive rank offsets in key order;
  4. one shuffle of the full rows by bucket; inside each bucket group the rows
     are sorted locally and ranked ``offset + 1 + arange``.

Only step 4 moves whole rows, and it is a single hash-sized shuffle — at
100 TB this beats a global ``ds.sort`` because the heavy data moves once and
each bucket sorts independently. Exactness does NOT depend on bucket balance
(skewed buckets only cost time); ties across bucket boundaries cannot happen
because the bucket is a pure function of the key value.

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
from ray.data.aggregate import Max, Min, Sum


def global_rank(
    ds: "ray.data.Dataset",
    key_col: str,
    tiebreak_col: str,
    *,
    descending: bool = True,
    n_buckets: int = 64,
    out: str = "rank",
) -> "ray.data.Dataset":
    mm = ds.aggregate(Min(key_col), Max(key_col))
    lo = float(mm[f"min({key_col})"])
    hi = float(mm[f"max({key_col})"])
    # internal edges of B uniform value buckets over [lo, hi]
    edges = np.linspace(lo, hi, n_buckets + 1)[1:-1] if hi > lo else np.empty(0)

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(edges, vals, side="right").astype(np.int64)

    def hist(t: pa.Table) -> pa.Table:
        b = bucket_of(np.asarray(t.column(key_col), dtype=np.float64))
        idx, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(idx, pa.int64()), "n": pa.array(cnt, pa.int64())})

    counts = (
        ds.select_columns([key_col])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    per_bucket = np.zeros(n_buckets, dtype=np.int64)
    for r in counts:
        per_bucket[r["b"]] = r["n"]
    scan_order = range(n_buckets - 1, -1, -1) if descending else range(n_buckets)
    offsets = np.zeros(n_buckets, dtype=np.int64)
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
) -> "ray.data.Dataset":
    """EXCLUSIVE prefix sum of ``val_col`` in ``key_col`` order — the
    distributed scan primitive (sequence packing, global byte offsets,
    watermark accounting) built with the same range-partitioned two-pass plan
    as global_rank: value-bucket histogram of per-bucket SUMS (narrow
    columns), driver turns B bucket sums into exclusive offsets, then ONE
    shuffle of the rows by bucket with a local sorted cumsum inside. No
    global sort; exactness independent of bucket balance. Requires unique
    non-null keys (any unique id)."""
    mm = ds.aggregate(Min(key_col), Max(key_col))
    lo = float(mm[f"min({key_col})"])
    hi = float(mm[f"max({key_col})"])
    edges = np.linspace(lo, hi, n_buckets + 1)[1:-1] if hi > lo else np.empty(0)

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(edges, vals, side="right").astype(np.int64)

    def partial_sums(t: pa.Table) -> pa.Table:
        b = bucket_of(np.asarray(t.column(key_col), dtype=np.float64))
        v = np.asarray(t.column(val_col), dtype=np.int64)
        idx = np.unique(b)
        sums = np.array([v[b == i].sum() for i in idx], dtype=np.int64)
        return pa.table({"b": pa.array(idx, pa.int64()), "s": pa.array(sums, pa.int64())})

    counts = (
        ds.select_columns([key_col, val_col])
        .map_batches(partial_sums, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )
    per_bucket = np.zeros(n_buckets, dtype=np.int64)
    for r in counts:
        per_bucket[r["b"]] = r["s"]
    offsets = np.zeros(n_buckets, dtype=np.int64)
    acc = 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += per_bucket[b]
    off_list = offsets.tolist()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_of(np.asarray(t.column(key_col), dtype=np.float64))
        return t.append_column("__rb", pa.array(b, pa.int64()))

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__rb"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort")
        v = g[val_col].to_numpy(dtype=np.int64)
        g[out] = off_list[b] + np.concatenate(([0], np.cumsum(v)[:-1]))
        return g.drop(columns="__rb")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(scan_group, batch_format="pandas")
    )
