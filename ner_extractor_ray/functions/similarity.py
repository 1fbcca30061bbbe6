"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
BROADCAST query matrix (ray.put once, fetched once per actor; never re-shipped
per batch), with per-batch partial top-k so the global sort touches k rows per
batch, not the corpus. Scale path: IVF — deterministic k-means-lite centroids,
vectors bucketed by nearest centroid, queries probe the nearest ``n_probe``
buckets only. Reference analog of the broadcast-matrix pattern: the GloVe
embedding lookup held per process (BiLSTM-CRF/5489Project_trainv2.ipynb cell 5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    # list<float> column → (n, d) float64 matrix (float64 keeps parity with
    # SQL doubles for the oracle comparison)
    arr = t.column(col)
    flat = np.asarray(arr.combine_chunks().flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


class _TopKScorer:
    """Actor-pool callable: per-batch cosine vs broadcast queries + partial top-k."""

    def __init__(self, query_ref, col: str, id_col: str, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)          # (m, d)
        self.qn = np.linalg.norm(self.q, axis=1)
        self.col, self.id_col, self.k = col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, self.col)
        ids = np.asarray(t.column(self.id_col).to_pylist(), dtype=np.int64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ self.q.T) / (norms[:, None] * self.qn[None, :])  # (n, m)
        out_q, out_id, out_sim = [], [], []
        k = min(self.k, len(ids))
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            idx = np.argpartition(-s, k - 1)[:k] if k < len(s) else np.arange(len(s))
            for i in idx:
                out_q.append(qi)
                out_id.append(int(ids[i]))
                out_sim.append(float(s[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Cosine top-k per query. Output (query_id, vec_id, sim, rank), rank 1-based
    ordered by (sim desc, vec_id asc) — the deterministic tie-break."""
    qref = ray.put(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    partials = ds.map_batches(
        _TopKScorer,
        batch_format="pyarrow",
        fn_constructor_kwargs={"query_ref": qref, "col": col, "id_col": id_col, "k": k},
        concurrency=concurrency,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ------------------------------------------------------------------- IVF path

def ivf_build_centroids(
    ds: "ray.data.Dataset", *, col: str = "embedding", id_col: str = "vec_id",
    n_centroids: int = 16, refine_rounds: int = 2,
) -> np.ndarray:
    """Deterministic centroids: seed = the ``n_centroids`` lowest-id vectors,
    then ``refine_rounds`` of distributed Lloyd updates (per-batch partial
    sums → tiny driver reduce). No RNG — identical at any parallelism.

    Seed selection is a per-batch partial min-k (each batch emits its k
    lowest-id vectors) merged on the driver — NOT a global ``sort().limit()``,
    which would shuffle the whole corpus to pick k rows."""

    def partial_min_k(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t.column(id_col), pa.int64()).to_numpy())
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             col: pa.array([], pa.list_(pa.float64()))})
        k = min(n_centroids, len(ids))
        idx = np.sort(np.argpartition(ids, k - 1)[:k]) if k < len(ids) else np.arange(len(ids))
        m = _batch_matrix(t, col)
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                col: pa.array([m[i] for i in idx], pa.list_(pa.float64())),
            }
        )

    seeds = sorted(
        ds.map_batches(partial_min_k, batch_format="pyarrow").take_all(),
        key=lambda r: r[id_col],
    )[:n_centroids]
    cent = np.array([r[col] for r in seeds], dtype=np.float64)
    for _ in range(refine_rounds):
        cref = ray.put(cent)

        def partial_sums(t: pa.Table, cref=cref) -> pa.Table:
            c = ray.get(cref)
            m = _batch_matrix(t, col)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(c)), pa.int32()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "cnt": pa.array(counts, pa.int64()),
                }
            )

        rows = ds.map_batches(partial_sums, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["cnt"]
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    return cent


def ivf_assign(
    ds: "ray.data.Dataset", centroids: np.ndarray, *, col: str = "embedding",
) -> "ray.data.Dataset":
    """Add the nearest-centroid bucket id (the IVF partition key)."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _batch_matrix(t, col)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return t.append_column("ivf_bucket", pa.array(d2.argmin(axis=1).astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow")


def knn_ivf(
    ds_assigned: "ray.data.Dataset",
    centroids: np.ndarray,
    queries: np.ndarray,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probe: int = 4,
) -> "ray.data.Dataset":
    """Approximate top-k: scan only the ``n_probe`` buckets nearest each query.
    At scale the bucket filter prunes the read (predicate on the IVF partition
    column); the scan itself is the brute kernel on the surviving rows."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    d2 = ((q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = set()
    for qi in range(len(q)):
        for b in np.argsort(d2[qi])[:n_probe]:
            probe.add(int(b))
    probe_arr = pa.array(sorted(probe), pa.int32())
    filtered = ds_assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("ivf_bucket"), value_set=probe_arr)),
        batch_format="pyarrow",
    )
    return knn_brute(filtered, q, col=col, id_col=id_col, k=k)


# ------------------------------------------------------------------ SRP-LSH

def srp_planes(n_planes: int, dim: int) -> np.ndarray:
    """(n_planes, dim) Rademacher ±1 hyperplanes, deterministically derived
    from md5("srp:h:d") — signed-random-projection LSH (Charikar's simhash
    for cosine) with no RNG state to ship: any worker can rebuild the
    planes from the two integers alone."""
    from .textfns import md5_hash64

    w = np.empty((n_planes, dim), dtype=np.float64)
    for h in range(n_planes):
        for d in range(dim):
            w[h, d] = 1.0 if md5_hash64(f"srp:{h}:{d}") % 2 else -1.0
    return w


def srp_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n,) int64 bucket codes: bit h = [v · w_h ≥ 0]. Vectors with equal
    code lie in the same 2^H-ant of cosine space."""
    bits = (m @ planes.T) >= 0.0  # (n, H)
    return (bits.astype(np.int64)
            << np.arange(planes.shape[0], dtype=np.int64)).sum(axis=1)


def knn_srp(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 1,
) -> "ray.data.Dataset":
    """LSH-BUCKETED cosine top-k (the brief's alternative to IVF as the ANN
    scale path): rows whose SRP code lies within ``probe_hamming`` bits of
    the query's code pass a ROW-LOCAL filter — no shuffle, no index build —
    and only those candidates reach the brute-force scorer. Expected scan
    fraction ≈ (1 + H + C(H,2) + …) / 2^H (~0.32% of the corpus at H=12,
    hamming ≤ 1). At 100 TB the codes would be a persisted column
    (zonemap-style data-skipping: the filter prunes at the read); here they
    are recomputed per batch, which is one (n×d)·(d×H) matmul. Approximate
    by construction (recall and determinism are pinned by tests, not an
    SQL oracle). Output: (query_id, vec_id, sim, rank) like knn_brute."""
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    planes = srp_planes(n_planes, q.shape[1])
    qcode = int(srp_codes(q, planes)[0])
    probe = {qcode}
    frontier = {qcode}
    for _ in range(probe_hamming):
        frontier = {c ^ (1 << h) for c in frontier for h in range(n_planes)}
        probe |= frontier
    probe_arr = np.fromiter(sorted(probe), dtype=np.int64)
    pref = ray.put(planes)

    def bucket_filter(t: pa.Table) -> pa.Table:
        w = ray.get(pref)
        m = _batch_matrix(t, col)
        codes = srp_codes(m, w)
        mask = np.isin(codes, probe_arr)
        return t.filter(pa.array(mask))

    cand = ds.map_batches(bucket_filter, batch_format="pyarrow")
    return knn_brute(cand, q, col=col, id_col=id_col, k=k)
