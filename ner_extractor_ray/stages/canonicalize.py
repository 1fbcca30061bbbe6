"""S8 — canonicalization: MinHash-LSH blocking → candidate pairs → distributed
connected components → canonical entity ids.

The genuinely wide/iterative stage (SURVEY.md §7.1 S8, §7.3). Pipeline:

  mentions(+node) ──pre-aggregated count──▶ distinct nodes (node, type, norm_key, n_mentions)
      ▶ minhash over char-3-shingles of norm_key → explode (band_id, band_hash, node)
      ▶ groupby(band) buckets → verified candidate pairs (same type, Jaccard ≥ τ)
      ▶ iterative min-label propagation (groupby-min rounds) → components
      ▶ entity_id = blake2(min node of component); canonical_name = min norm_key

Skew handling (explicit, per the north rule):
  * counts are PARTIALLY AGGREGATED inside map_batches before the groupby, so a
    hot alias ("university", head domains) contributes ≤ 1 row per input batch
    to the shuffle instead of one row per mention;
  * oversized LSH buckets (> ``bucket_cap``) emit a SORTED CHAIN of pairs
    (a1-a2, a2-a3, …) instead of all O(n²) pairs — connectivity-preserving and
    linear in bucket size, the salting cap of SURVEY.md §7.1.

Determinism: representatives are lexicographic minima, hashes are blake2 —
identical output at any parallelism. Reference analog of the clustering step:
KMeans canonicalization of embeddings (scripts/visualize_embeddings.py:217-247)
re-expressed as LSH blocking + components (SURVEY.md A9).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.hashing import stable_id
from ..functions.textfns import band_keys, char_shingles, jaccard, minhash_signature
from .joins import hash_join

NUM_PERM = 64
N_BANDS = 16


def pre_aggregated_count(
    ds: "ray.data.Dataset", keys: list[str], count_col: str = "n_mentions"
) -> "ray.data.Dataset":
    """groupby(keys).count() with a per-batch combiner (partial aggregation)
    so hot keys never ship one shuffle row per input row (SURVEY.md §2.5 A2)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).size().rename(columns={"size": count_col})

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))


def distinct_nodes(mentions_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """mentions (with node/norm_key/type) → distinct node table with counts."""
    return pre_aggregated_count(
        mentions_ds.select_columns(["node", "type", "norm_key"]),
        ["node", "type", "norm_key"],
    )


def _band_rows(batch: pa.Table) -> pa.Table:
    nodes = batch.column("node").to_pylist()
    keys = batch.column("norm_key").to_pylist()
    types = batch.column("type").to_pylist()
    o_band, o_hash, o_node, o_key, o_type = [], [], [], [], []
    for node, key, typ in zip(nodes, keys, types):
        sig = minhash_signature(char_shingles(key), NUM_PERM)
        for b, h in enumerate(band_keys(sig, N_BANDS)):
            o_band.append(b)
            o_hash.append(h)
            o_node.append(node)
            o_key.append(key)
            o_type.append(typ)
    return pa.table(
        {
            "band_id": pa.array(o_band, pa.int32()),
            "band_hash": pa.array(o_hash, pa.int64()),
            "node": pa.array(o_node, pa.string()),
            "norm_key": pa.array(o_key, pa.string()),
            "type": pa.array(o_type, pa.string()),
        }
    )


def candidate_pairs(
    nodes_ds: "ray.data.Dataset",
    *,
    threshold: float = 0.6,
    bucket_cap: int = 64,
) -> "ray.data.Dataset":
    """LSH blocking + in-bucket verification → pair rows (a, b), a < b."""
    bands = nodes_ds.map_batches(_band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("node").sort_values("node")
        n = len(g)
        out_a, out_b = [], []
        if n >= 2:
            nodes = g["node"].tolist()
            keys = g["norm_key"].tolist()
            types = g["type"].tolist()
            sh = [set(char_shingles(k)) for k in keys]
            if n <= bucket_cap:
                idx_pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
            else:
                # salting cap: sorted chain keeps clusters connected at O(n)
                idx_pairs = [(i, i + 1) for i in range(n - 1)]
            for i, j in idx_pairs:
                if types[i] != types[j]:
                    continue
                if jaccard(sh[i], sh[j]) >= threshold:
                    out_a.append(nodes[i])
                    out_b.append(nodes[j])
        return pd.DataFrame({"a": out_a, "b": out_b}, dtype="object")

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # dedup pairs discovered in multiple bands
    return pre_aggregated_count(pairs, ["a", "b"], count_col="_nb").select_columns(["a", "b"])


def _rename_project(t: pa.Table, cols: list[tuple[str, str]]) -> pa.Table:
    """Project+rename that is safe on the zero-column empty blocks Ray's
    groupby/sort operators emit — always returns the target schema, so a
    downstream join never sees a schema-less block (pyarrow acero raises
    "No match for FieldRef" otherwise). ``cols`` = [(src, dst), ...]."""
    if t.num_rows == 0 or not {s for s, _ in cols} <= set(t.column_names):
        return pa.table({dst: pa.array([], pa.string()) for _, dst in cols})
    return pa.table({dst: t.column(src) for src, dst in cols})


def connected_components(
    pairs_ds: "ray.data.Dataset",
    nodes_ds: "ray.data.Dataset",
    *,
    max_rounds: int = 8,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Distributed min-label propagation → (node, comp) labels.

    Each round: comp(dst) = min over {comp(src) | (src,dst) ∈ E ∪ self-loops}.
    Labels are materialized per round (they are the small distinct-surface
    table, not the corpus) so the lazy lineage doesn't re-execute; converges in
    O(log n) rounds on alias-graph components, with a checksum-based fixpoint
    test (SURVEY.md §7.3 "connected components on Ray Data").
    """
    nodes_only = nodes_ds.select_columns(["node"])
    identity = nodes_only.map_batches(
        lambda t: _rename_project(t, [("node", "node"), ("node", "comp")]),
        batch_format="pyarrow",
    )
    # No candidate pairs (all surfaces already distinct after alias resolution):
    # every node is its own component — skip the iterative joins entirely. Also
    # avoids schema-less empty blocks poisoning the union/join below.
    if pairs_ds.count() == 0:
        return identity.materialize()
    fwd = pairs_ds.map_batches(
        lambda t: _rename_project(t, [("a", "src"), ("b", "dst")]),
        batch_format="pyarrow",
    )
    rev = pairs_ds.map_batches(
        lambda t: _rename_project(t, [("b", "src"), ("a", "dst")]),
        batch_format="pyarrow",
    )
    self_loops = nodes_only.map_batches(
        lambda t: _rename_project(t, [("node", "src"), ("node", "dst")]),
        batch_format="pyarrow",
    )
    edges = fwd.union(rev).union(self_loops).materialize()

    labels = identity.materialize()

    def checksum(lab: "ray.data.Dataset") -> int:
        import zlib

        def part(df: pd.DataFrame) -> pd.DataFrame:
            if "node" not in df.columns:
                return pd.DataFrame({"s": [0]})
            s = sum(zlib.crc32(f"{n}\x00{c}".encode()) for n, c in zip(df["node"], df["comp"]))
            return pd.DataFrame({"s": [s]})

        row = lab.map_batches(part, batch_format="pandas").sum("s")
        return int(row or 0)

    prev = checksum(labels)
    for _ in range(max_rounds):
        lab_src = labels.map_batches(
            lambda t: _rename_project(t, [("node", "src"), ("comp", "comp")]),
            batch_format="pyarrow",
        )
        joined = hash_join(edges, lab_src, on=("src",), num_partitions=num_partitions)
        new_labels = (
            joined.groupby("dst")
            .aggregate(Min("comp", alias_name="comp"))
            .map_batches(
                lambda t: _rename_project(t, [("dst", "node"), ("comp", "comp")]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur = checksum(new_labels)
        labels = new_labels
        if cur == prev:
            break
        prev = cur
    return labels


def entity_assignments(
    labels_ds: "ray.data.Dataset", nodes_ds: "ray.data.Dataset", num_partitions: int = 8
) -> "ray.data.Dataset":
    """(node, comp) × node metadata → (node, entity_id, canonical_name, type).

    entity_id is a stable hash of the component representative (min node id),
    canonical_name the lexicographically-min norm_key in the component.
    """
    lab_nodes = hash_join(labels_ds, nodes_ds, on=("node",), num_partitions=num_partitions)
    canon = (
        lab_nodes.groupby("comp")
        .aggregate(Min("norm_key", alias_name="canonical_name"))
        .map_batches(
            lambda t: _rename_project(t, [("comp", "comp"), ("canonical_name", "canonical_name")]),
            batch_format="pyarrow",
        )
    )
    with_canon = hash_join(lab_nodes, canon, on=("comp",), num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        comps = t.column("comp").to_pylist()
        ids = [stable_id(f"ent:{c}") for c in comps]
        return t.append_column("entity_id", pa.array(ids, pa.string()))

    return with_canon.map_batches(finish, batch_format="pyarrow").select_columns(
        ["node", "entity_id", "canonical_name", "type", "n_mentions"]
    )
