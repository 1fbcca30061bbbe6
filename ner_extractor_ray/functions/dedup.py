"""Deduplication operators over document tables (training-data pipeline ops).

All are Dataset→Dataset transforms built from map_batches + groupby with the
same skew discipline as the KG stages: per-batch partial aggregation before
any shuffle, bucket caps with connectivity-preserving chains. Exact-dedup
mirrors the reference's duplicate-sentence multiset matching by serialized key
(scripts/generate_kfold_splits.py:122-131 → SURVEY.md D2), generalized to
content hashes; near-dup families (MinHash-LSH, SimHash, n-gram Jaccard) are
the web-scale additions.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from .textfns import (
    band_keys,
    char_shingles,
    jaccard,
    minhash_signature,
    simhash64,
    word_ngrams,
)

SHINGLERS = {
    "char3": char_shingles,
    "word3": lambda s: word_ngrams(s, 3),
    "word1": lambda s: word_ngrams(s, 1),
}


def add_md5(ds: "ray.data.Dataset", col: str, out: str = "h") -> "ray.data.Dataset":
    """Content hash column (md5 hex — intentionally matches SQL md5())."""

    def fn(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        hs = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
        return t.append_column(out, pa.array(hs, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup_groups(
    ds: "ray.data.Dataset", text_col: str, id_col: str
) -> "ray.data.Dataset":
    """hash-partitioned exact dedup: one row per distinct content with the
    kept (min) id and the duplicate count. groupby on the 32-char hash, never
    on the full text, so shuffle rows stay narrow."""
    hashed = add_md5(ds, text_col).select_columns(["h", id_col])
    return hashed.groupby("h").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


def with_simhash(
    ds: "ray.data.Dataset", text_col: str, id_col: str, out: str = "simhash"
) -> "ray.data.Dataset":
    """64-bit SimHash per document (sign-masked to int63 for Arrow int64)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        hs = [
            simhash64([w.lower() for w in (txt or "").split()]) & 0x7FFFFFFFFFFFFFFF
            for txt in texts
        ]
        return pa.table(
            {id_col: t.column(id_col), out: pa.array(hs, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def lsh_near_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    shingle: str = "word3",
    threshold: float = 0.8,
    n_bands: int = 16,
    num_perm: int = 64,
    bucket_cap: int = 64,
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate candidate pairs, Jaccard-verified.

    shingle→minhash→band→bucket-groupby→verify, the canonical near-dup plan
    (same machinery as entity canonicalization, stages/canonicalize.py).
    Oversized buckets emit a sorted chain (O(n), connectivity-preserving)
    instead of O(n²) pairs — the explicit skew cap.
    Output: (id_a, id_b, jaccard) with id_a < id_b, deduped across bands.
    """
    shingler = SHINGLERS[shingle]

    def bands(t: pa.Table) -> pa.Table:
        from ..stages.canonicalize import _bucket_key

        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        o_b, o_id, o_txt = [], [], []
        for i, txt in zip(ids, texts):
            sig = minhash_signature(shingler(txt or ""), num_perm)
            for b, h in enumerate(band_keys(sig, n_bands)):
                o_b.append(_bucket_key(b, h))
                o_id.append(i)
                o_txt.append(txt)
        return pa.table(
            {
                "bucket": pa.array(o_b, pa.int64()),
                "doc": pa.array(o_id, pa.int64()),
                "txt": pa.array(o_txt, pa.string()),
            }
        )

    def part_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # many buckets per Ray group (bucket % P) — see canonicalize.py note
        # on map_groups per-group overhead
        a, b, jc = [], [], []
        for _, g in group.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("doc").sort_values("doc")
            ids = g["doc"].tolist()
            txts = g["txt"].tolist()
            n = len(ids)
            if n < 2:
                continue
            sh = [set(shingler(t or "")) for t in txts]
            pairs = (
                [(i, j) for i in range(n) for j in range(i + 1, n)]
                if n <= bucket_cap
                else [(i, i + 1) for i in range(n - 1)]
            )
            for i, j in pairs:
                jv = jaccard(sh[i], sh[j])
                if jv >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
                    jc.append(round(jv, 6))
        return pd.DataFrame({"id_a": a, "id_b": b, "jaccard": jc})

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        from ..stages.canonicalize import _compact_blocks

        part = _pc.cast(t.column("bucket"), pa.int64()).to_numpy() % _compact_blocks()
        return t.append_column("__part", pa.array(part, pa.int64()))

    pair_rows = (
        ds.select_columns([id_col, text_col])
        .map_batches(bands, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_pairs, batch_format="pandas")
    )
    # dedup pairs found in multiple bands (partial per-batch combine first)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "id_a" not in df.columns:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        return df.groupby(["id_a", "id_b"], as_index=False)["jaccard"].min()

    from ..stages.canonicalize import grouped_aggregate

    return grouped_aggregate(
        pair_rows.map_batches(partial, batch_format="pandas"),
        ["id_a", "id_b"],
        Min("jaccard", alias_name="jaccard"),
    )


def near_dup_keep_ids(pairs_ds: "ray.data.Dataset", all_ids_ds: "ray.data.Dataset",
                      id_col: str) -> "ray.data.Dataset":
    """Resolve near-dup pairs to keep/drop decisions via connected components:
    every doc maps to its component representative (min id); keep = (doc ==
    representative). Reuses the distributed CC of the canonicalization stage."""
    from ..stages.canonicalize import connected_components

    def pad(v):  # zero-pad ids so lexicographic min == numeric min
        return f"{v:020d}"

    def pair_str(t: pa.Table) -> pa.Table:
        a = [pad(v) for v in t.column("id_a").to_pylist()]
        b = [pad(v) for v in t.column("id_b").to_pylist()]
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    nodes = all_ids_ds.map_batches(
        lambda t: pa.table({"node": pa.array([pad(v) for v in t.column(id_col).to_pylist()])}),
        batch_format="pyarrow",
    )
    labels = connected_components(pairs_ds.map_batches(pair_str, batch_format="pyarrow"), nodes)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64())})
        n = [int(v) for v in t.column("node").to_pylist()]
        c = [int(v) for v in t.column("comp").to_pylist()]
        return pa.table({id_col: pa.array(n, pa.int64()), "keep_id": pa.array(c, pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow")
