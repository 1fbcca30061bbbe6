"""Vector similarity & multimodal query family (split from pipelines/queries.py — its module
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
    EMBED_DIM, _gagg, _nonempty_or_empty_table, _rp,
)



def q_label_hist(sf_dir: str):
    ds = _rp(sf_dir, "embeddings", ["label"])

    def partial(t: pa.Table) -> pa.Table:
        lab = pc.cast(t.column("label"), pa.int64()).to_numpy()
        df = pd.DataFrame({"label": lab})
        g = df.groupby("label", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_knn_cosine(sf_dir: str):
    """Similarity search baseline: brute-force cosine top-10 vs a fixed query
    (all-ones), per-batch partial top-k → global rank. Ints only in output."""
    from ..functions.similarity import knn_brute

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_brute(ds, np.ones((1, EMBED_DIM)), k=10)
    return out.map_batches(
        lambda t: pa.table(
            {"vec_id": t.column("vec_id"), "rank": pc.cast(t.column("rank"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def q_knn_ivf(sf_dir: str):
    from ..functions.similarity import ivf_assign, ivf_build_centroids, knn_ivf

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = ivf_build_centroids(ds, n_centroids=8, refine_rounds=1)
    assigned = ivf_assign(ds, cent)
    out = knn_ivf(assigned, cent, np.ones((1, EMBED_DIM)), k=10, n_probe=4)
    return out.select_columns(["vec_id", "rank"])


def q_knn_ivf_full(sf_dir: str):
    """IVF with n_probe == n_centroids probes every partition, so the result
    is EXACT by construction — this pins the whole IVF plumbing (deterministic
    centroid build, bucket assign, probe filter, per-bucket scan) to the
    brute-force SQL oracle. q_knn_ivf (n_probe=4) is the pruned approximate
    variant of the same plan (rows-only check; recall is data-dependent)."""
    from ..functions.similarity import ivf_assign, ivf_build_centroids, knn_ivf

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = ivf_build_centroids(ds, n_centroids=8, refine_rounds=1)
    assigned = ivf_assign(ds, cent)
    out = knn_ivf(assigned, cent, np.ones((1, EMBED_DIM)), k=10, n_probe=8)
    return out.select_columns(["vec_id", "rank"])


def q_kmeans_fixed(sf_dir: str):
    """Integer-exact distributed Lloyd's k-means (functions/kmeans.py):
    centroids broadcast per round via ray.put, assignment + per-cluster
    partial sums in ONE vectorized int64 map_batches pass, the only shuffle
    a k·(d+1)-row partial combine — the canonical corpus-scale clustering
    shape (driver state bounded by k, never by n). Quantization offsets the
    embedding range positive so ``//`` is floor on BOTH numpy and DuckDB;
    the oracle unrolls the rounds as CTEs (same trick as graph_pagerank)."""
    from ..functions.kmeans import kmeans_fixed

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_fixed(ds, k=8, n_iters=3)


def q_image_features(sf_dir: str):
    """Multimodal binary-column stage (stages/multimodal.py): the documents
    table's text bytes stand in as an opaque binary payload column; decode +
    resize + feature-extract runs with the deterministic FakeCodec (real
    codec is a documented plug — the libs are absent here). Exercises the
    fat-row plumbing: small batch_size, payload dropped on output. Rows-only."""
    from ..stages.multimodal import image_features

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                  pa.binary())}
        )

    return image_features(ds.map_batches(to_payload, batch_format="pyarrow"))


def q_video_frames(sf_dir: str):
    """Multimodal frame sampling (stages/multimodal.FrameSampleStage): binary
    'video' payload → one row per sampled frame with its pixel feature —
    flat-map shaped like sentseg, small batch_size for fat rows, payload
    dropped on output. FakeCodec deterministic; real codec is the documented
    plug. Rows-only."""
    from ..stages.multimodal import frame_samples

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                  pa.binary())}
        )

    return frame_samples(ds.map_batches(to_payload, batch_format="pyarrow"), n_frames=4)


def q_audio_chunks(sf_dir: str):
    """Multimodal audio chunking (stages/multimodal.AudioChunkStage): binary
    'audio' payload → one row per fixed-length chunk with integer energy /
    zero-crossing features — the VAD front-end shape. FakeCodec
    deterministic; real codec is the documented plug. Rows-only."""
    from ..stages.multimodal import audio_chunks

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                  pa.binary())}
        )

    return audio_chunks(ds.map_batches(to_payload, batch_format="pyarrow"))


def q_cluster_homogeneity(sf_dir: str):
    """A9 — clustering quality: integer-exact GINI homogeneity (ppm) of the
    deterministic kmeans_fixed clusters vs the embeddings table's labels
    (the KMeans-homogeneity analog, scripts/visualize_embeddings.py:217-247).

    Round-5 integerization: the cluster source is the oracle-replicable
    integer kmeans (same k/n_iters as the ``kmeans_fixed`` entry, unrolled
    CTEs in _kmeans_oracle_sql) and the metric is the Gini-impurity
    polynomial form in ppm (functions/metrics.py
    clustering_homogeneity_gini_ppm) — no float entropy, so the single-row
    result is hash-checked against DuckDB instead of rows-only. The float
    entropy variant remains available as
    functions.metrics.clustering_homogeneity."""
    from ..functions.kmeans import kmeans_fixed
    from ..functions.metrics import clustering_homogeneity_gini_ppm
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    assigned = kmeans_fixed(ds, k=8, n_iters=3)
    labels = _rp(sf_dir, "embeddings", ["vec_id", "label"]).map_batches(
        lambda t: pa.table({"vec_id": pc.cast(t.column("vec_id"), pa.int64()),
                            "label": t.column("label")}),
        batch_format="pyarrow")
    joined = hash_join(assigned, labels, on=["vec_id"])
    h = clustering_homogeneity_gini_ppm(joined, "cluster", "label")
    return pa.table({"homogeneity_ppm": pa.array([h], pa.int64())})


def q_embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION statistics of the embedding vector column — the
    whitening / feature-normalization precompute (mean and second moment
    per dim) every ANN index build runs first. The list<float> column is
    unnested BATCH-LOCALLY into a (dim, Σq, Σq², n) partial per batch
    (matrix reshape, no per-row Python), so the exchange is dim-sized
    however many vectors stream through; values quantize with kmeans'
    exact grid (floor((x+1)·10⁶) — functions/kmeans.py) so the sums are
    integer-exact and engine-comparable. mean_q = Σq // n."""
    from ..functions.kmeans import KM_OFFSET, KM_SCALE
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "sqq": pa.array([], pa.int64())})
        q = np.floor((mat + KM_OFFSET) * KM_SCALE).astype(np.int64)
        return pa.table(
            {"dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
             "n": pa.array(np.full(q.shape[1], q.shape[0], np.int64)),
             "sq": pa.array(q.sum(axis=0), pa.int64()),
             "sqq": pa.array((q * q).sum(axis=0), pa.int64())})

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"], Sum("n", alias_name="n"), Sum("sq", alias_name="sq"),
        Sum("sqq", alias_name="sqq"))
    return agg.map_batches(
        lambda t: pa.table(
            {"dim": pc.cast(t.column("dim"), pa.int64()),
             "n": pc.cast(t.column("n"), pa.int64()),
             "sum_q": pc.cast(t.column("sq"), pa.int64()),
             "sum_qq": pc.cast(t.column("sqq"), pa.int64()),
             "mean_q": pa.array(
                 pc.cast(t.column("sq"), pa.int64()).to_numpy()
                 // pc.cast(t.column("n"), pa.int64()).to_numpy(),
                 pa.int64())}),
        batch_format="pyarrow")


_MKNN_K = 3
_MKNN_SCALE = 10_000


def q_mutual_knn(sf_dir: str, *, broadcast_limit: int = 100_000):
    """Reciprocal nearest neighbors — the high-precision near-dup / ER
    primitive (a pair survives only if EACH is in the other's top-k):
    mutual top-3 by inner product over integer-scaled embeddings
    (floor(v·10⁴) — dots stay < 2⁶³ AND < 2⁵³, so numpy int64 matmul and
    DuckDB's float-accumulated list_dot_product are both exact, making an
    approximate-looking op hash-checkable). Plan: the scaled matrix
    broadcasts once below ``broadcast_limit`` vectors and every batch
    computes its own top-k with one integer matmul (ties: higher dot, then
    smaller id — replicated as ROW_NUMBER ORDER BY dot DESC, dst); directed
    edges pack into unordered pair keys and the mutual filter is a pair
    groupby with count = 2. Mutual-kNN is inherently quadratic — above the
    limit the corpus must be blocked first (the knn_ivf / embedding_neardup
    path), so the gate raises rather than silently shuffling n² rows."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("dot", pa.int64())])
    n = ds.count()
    if n == 0:
        return schema.empty_table()
    if n > broadcast_limit:
        raise ValueError(
            f"mutual_knn is quadratic: {n} vectors > broadcast_limit="
            f"{broadcast_limit}; block first (knn_ivf / embedding_neardup)")

    ids_chunks, mat_chunks = [], []
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids_chunks.append(pc.cast(b.column("vec_id"), pa.int64()).to_numpy())
        emb = np.stack([np.asarray(x, dtype=np.float64)
                        for x in b.column("embedding").to_pylist()])
        mat_chunks.append(np.floor(emb * _MKNN_SCALE).astype(np.int64))
    ids = np.concatenate(ids_chunks)
    mat = np.concatenate(mat_chunks)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    mref = ray.put((ids, mat))

    def topk(t: pa.Table) -> pa.Table:
        all_ids, m = ray.get(mref)
        bids = pc.cast(t.column("vec_id"), pa.int64()).to_numpy()
        bemb = np.stack([np.asarray(x, dtype=np.float64)
                         for x in t.column("embedding").to_pylist()])
        bm = np.floor(bemb * _MKNN_SCALE).astype(np.int64)
        scores = bm @ m.T  # exact: |dot| ≤ 64·(2·10⁵)² ≪ 2⁶³
        self_pos = np.searchsorted(all_ids, bids)
        # min+1, NOT min: the top-k sort negates scores, and -INT64_MIN
        # overflows back to INT64_MIN, which would rank self FIRST
        scores[np.arange(len(bids)), self_pos] = np.iinfo(np.int64).min + 1
        # top-k by (dot DESC, id ASC): lexsort on (-scores, ids)
        srcs, dsts, dots = [], [], []
        for i in range(len(bids)):
            ordr = np.lexsort((all_ids, -scores[i]))[:_MKNN_K]
            srcs.append(np.full(_MKNN_K, bids[i], np.int64))
            dsts.append(all_ids[ordr])
            dots.append(scores[i][ordr])
        return pa.table({"src": pa.array(np.concatenate(srcs), pa.int64()),
                         "dst": pa.array(np.concatenate(dsts), pa.int64()),
                         "dot": pa.array(np.concatenate(dots), pa.int64())})

    directed = ds.map_batches(topk, batch_format="pyarrow")

    def pack(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("src"), pa.int64()).to_numpy()
        d = pc.cast(t.column("dst"), pa.int64()).to_numpy()
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"pk": pa.array(lo * (1 << 32) + hi, pa.int64()),
                         "one": pa.array(np.ones(len(s), np.int64), pa.int64()),
                         "dot": t.column("dot")})

    pairs = _gagg(directed.map_batches(pack, batch_format="pyarrow"),
                  "pk", Sum("one", alias_name="cnt"),
                  Max("dot", alias_name="dot"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.cast(t.column("cnt"), pa.int64()), 2))
        pk = pc.cast(t.column("pk"), pa.int64()).to_numpy()
        return pa.table({"a": pa.array(pk >> 32, pa.int64()),
                         "b": pa.array(pk & 0xFFFFFFFF, pa.int64()),
                         "dot": pc.cast(t.column("dot"), pa.int64())})

    return _nonempty_or_empty_table(
        pairs.map_batches(finish, batch_format="pyarrow"), schema)


def q_knn_srp(sf_dir: str):
    """LSH-bucketed ANN (SRP / Charikar simhash for cosine) — the scale
    path alternative to q_knn_ivf: a ROW-LOCAL sign-code filter (12
    deterministic Rademacher hyperplanes, probe = Hamming ≤ 1 → ~0.32% of
    buckets) prunes the corpus before the brute-force scorer ever sees it;
    no shuffle, no index build, and at 100 TB the codes persist as a
    column so the filter prunes at the read (zonemap-style data-skipping).
    Approximate by construction → rows-only for the driver; determinism
    and exact recovery of PLANTED strong neighbors (cosine ≥ 0.99) are
    pinned in pytest — the sf embeddings' own top-10 sit at cosine ~0.3
    (expected Hamming ~5/12), correctly OUTSIDE a 1-bit probe, so this op
    filters weak matches by design. Output: (vec_id, rank) of the query's
    bucket-probed top-10."""
    from ..functions.similarity import knn_srp

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_srp(ds, np.ones((1, EMBED_DIM)), k=10)
    return out.map_batches(
        lambda t: pa.table(
            {"vec_id": t.column("vec_id"),
             "rank": pc.cast(t.column("rank"), pa.int64())}),
        batch_format="pyarrow")
