"""Integer-exact distributed Lloyd's k-means over an embedding column.

The float variant (functions/similarity.py ``ivf_build_centroids``) is the
production ANN primitive; THIS module is the batch-order-independent,
SQL-replicable form: vectors are quantized to int64 once, every distance /
centroid update is exact integer arithmetic, so the final assignment is
bit-identical at any parallelism AND expressible as an unrolled DuckDB CTE
(the same trick as the integer PageRank in functions/graph.py:595).

Distributed shape — the canonical scalable k-means:
  * centroids (k × d int64, a few KB) are BROADCAST each round via
    ``ray.put``, never joined;
  * assignment + per-cluster partial sums happen inside one vectorized
    ``map_batches`` pass (numpy int64 broadcasting — exact);
  * partials are k·d-row long-format tables combined by a tiny
    ``grouped_aggregate`` — the only shuffle is over k·(d+1) rows per
    block, independent of corpus size;
  * the driver touches k·(d+1) rows per round (bounded by k, never by n).

Reference analog: the reference clusters entity mentions only implicitly
(notebooks); this is the from-scratch Ray-native clustering stage a KG
canonicalizer / data-mix curator needs at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

# Quantization: q = floor((float64(v) + OFFSET) * SCALE).  OFFSET shifts the
# (unit-ish) embedding range strictly positive so integer division during the
# centroid update is truncation == floor on BOTH numpy and DuckDB (negative
# operands would diverge: DuckDB // truncates toward zero, Python floors).
KM_SCALE = 1_000_000
KM_OFFSET = 1.0


def quantize_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) int64 matrix of quantized vectors — zero-copy from Arrow."""
    lst = t.column(col).combine_chunks()
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    vals = lst.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(lst)
    d = len(vals) // n if n else 0
    q = np.floor((vals + KM_OFFSET) * KM_SCALE).astype(np.int64)
    return q.reshape(n, d)


def list_matrix(t: pa.Table, col: str) -> np.ndarray:
    """(n, d) int64 matrix from an ALREADY-quantized list<int64> column."""
    lst = t.column(col).combine_chunks()
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    vals = lst.values.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(lst)
    d = len(vals) // n if n else 0
    return vals.reshape(n, d)


def _assign(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact int64 argmin of squared L2 distance; ties → lowest cluster id
    (numpy argmin picks the first occurrence — the SQL oracle tie-breaks
    identically with ``ORDER BY dist, cj``)."""
    # (n, k) distances via broadcasting: diffs ≤ 2·SCALE, squared ≤ 4e12,
    # × d=64 dims ≈ 2.6e14 — comfortably exact in int64.
    d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)


def seed_centroids(
    ds: "ray.data.Dataset", k: int, *, col: str = "embedding",
    id_col: str = "vec_id", quantized: bool = False,
) -> np.ndarray:
    """Deterministic seeds: quantized vectors of the k LOWEST ids, found with
    a per-batch partial min-k (each batch ships ≤ k rows to the driver — no
    global sort; same pattern as similarity.py ivf_build_centroids).
    ``quantized=True`` reads ``col`` as an already-quantized list<int64>."""

    def partial_min_k(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy()
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.int64()))})
        kk = min(k, len(ids))
        idx = np.argpartition(ids, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
        m = list_matrix(t, col) if quantized else quantize_matrix(t, col)
        return pa.table({id_col: pa.array(ids[idx], pa.int64()),
                         "q": pa.array(list(m[idx]), pa.list_(pa.int64()))})

    rows = sorted(
        ds.map_batches(partial_min_k, batch_format="pyarrow").take_all(),
        key=lambda r: r[id_col],
    )[:k]
    return np.array([r["q"] for r in rows], dtype=np.int64)


def kmeans_fixed(
    ds: "ray.data.Dataset",
    *,
    k: int = 8,
    n_iters: int = 3,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """(id, cluster) after ``n_iters`` exact-integer Lloyd updates from the
    lowest-id seeds, then one final assignment against the settled centroids.

    Update rule (all int64): c'ⱼ[dim] = Σ_{x∈j} x[dim] // |j|; empty clusters
    keep their previous centroid. Output is independent of block order and
    parallelism, and replicated row-for-row by the unrolled-CTE oracle
    (pipelines/queries.py _kmeans_oracle_sql).
    """
    from ..stages.canonicalize import data_partitions, grouped_aggregate

    # Iterative-algorithm input cache: project to (id, embedding), quantize
    # ONCE, and compact to DATA-sized blocks before the rounds. Without this
    # every round re-decodes parquet and re-quantizes, and a tiny table split
    # into cluster-sized blocks pays per-task scheduling (~50 ms × blocks ×
    # rounds) while moving kilobytes. At 100 TB the materialize is an object
    # -store cache that spills — still strictly cheaper than n_iters extra
    # storage decodes of the same bytes.
    def project_q(t: pa.Table) -> pa.Table:
        m = quantize_matrix(t, col)
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         "q": pa.array(list(m), pa.list_(pa.int64()))})

    qds = ds.map_batches(project_q, batch_format="pyarrow").materialize()
    qds = qds.repartition(data_partitions(qds.size_bytes() or 0)).materialize()

    cent = seed_centroids(qds, k, col="q", id_col=id_col, quantized=True)
    k_eff, d = cent.shape

    for _ in range(n_iters):
        cref = ray.put(cent)

        def partial_sums(t: pa.Table, cref=cref) -> pa.Table:
            c = ray.get(cref)
            m = list_matrix(t, "q")
            if m.shape[0] == 0:
                return pa.table({"cj": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            a = _assign(m, c)
            sums = np.zeros((len(c), m.shape[1]), dtype=np.int64)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, a, m)
            np.add.at(counts, a, 1)
            # long format: (cj, dim, s) with dim = -1 carrying the count —
            # k·(d+1) rows per batch, the ONLY shuffled payload per round
            cj = np.repeat(np.arange(len(c), dtype=np.int64), m.shape[1] + 1)
            dim = np.tile(np.concatenate([[-1], np.arange(m.shape[1])]), len(c))
            s = np.concatenate(
                [np.concatenate([[counts[j]], sums[j]]) for j in range(len(c))]
            )
            return pa.table({"cj": pa.array(cj, pa.int64()),
                             "dim": pa.array(dim, pa.int64()),
                             "s": pa.array(s, pa.int64())})

        agg = grouped_aggregate(
            qds.map_batches(partial_sums, batch_format="pyarrow"),
            ["cj", "dim"], Sum("s", alias_name="s"),
        ).to_pandas()  # k·(d+1) rows — bounded by k, not by corpus size

        new = cent.copy()
        counts = {int(r.cj): int(r.s) for r in agg[agg["dim"] == -1].itertuples()}
        body = agg[agg["dim"] >= 0]
        for cj_val, g in body.groupby("cj"):
            n_j = counts.get(int(cj_val), 0)
            if n_j > 0:
                g = g.sort_values("dim")
                new[int(cj_val)] = g["s"].to_numpy(dtype=np.int64) // n_j
        cent = new

    cref = ray.put(cent)

    def final_assign(t: pa.Table, cref=cref) -> pa.Table:
        c = ray.get(cref)
        m = list_matrix(t, "q")
        ids = pc.cast(t.column(id_col), pa.int64())
        a = (_assign(m, c) if m.shape[0] else np.array([], dtype=np.int64))
        return pa.table({id_col: ids, "cluster": pa.array(a, pa.int64())})

    return qds.map_batches(final_assign, batch_format="pyarrow")
