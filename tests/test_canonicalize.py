"""Canonicalization stage tests: LSH pairing, CC merging, salting, skew."""

import pandas as pd
import pyarrow as pa
import ray.data

from ner_extractor_ray.stages.canonicalize import (
    candidate_pairs,
    connected_components,
    entity_assignments,
    pre_aggregated_count,
)


def _nodes_ds(keys: list[tuple[str, str]], n=1):
    # (type, norm_key) → distinct-nodes table shape
    return ray.data.from_items(
        [
            {"node": f"{t}:{k}", "type": t, "norm_key": k, "n_mentions": n}
            for t, k in keys
        ]
    )


def test_candidate_pairs_find_near_duplicates():
    nd = _nodes_ds(
        [
            ("ORG", "acme corporation international"),
            ("ORG", "acme corporation internationale"),
            ("ORG", "zzz totally different company"),
            ("LOC", "acme corporation international"),  # same key, other type
        ]
    )
    pairs = candidate_pairs(nd).take_all()
    got = {(p["a"], p["b"]) for p in pairs}
    assert ("ORG:acme corporation international", "ORG:acme corporation internationale") in got
    # never across types, never with the unrelated key
    for a, b in got:
        assert a.split(":")[0] == b.split(":")[0]
        assert "zzz" not in a and "zzz" not in b


def test_connected_components_transitive_merge():
    # a~b and b~c but a,c never directly paired → one component via propagation
    nd = _nodes_ds([("ORG", k) for k in ["aaaa bbbb cccc", "dddd eeee", "ffff gggg"]])
    pairs = ray.data.from_items(
        [
            {"a": "ORG:aaaa bbbb cccc", "b": "ORG:dddd eeee"},
            {"a": "ORG:dddd eeee", "b": "ORG:ffff gggg"},
        ]
    )
    labels = {r["node"]: r["comp"] for r in connected_components(pairs, nd).take_all()}
    assert len(set(labels.values())) == 1
    assert set(labels.values()) == {"ORG:aaaa bbbb cccc"}  # lexicographic min rep


def test_entity_assignments_shape():
    nd = _nodes_ds([("ORG", "alpha"), ("ORG", "beta")], n=3)
    pairs = ray.data.from_items([{"a": "ORG:alpha", "b": "ORG:beta"}])
    labels = connected_components(pairs, nd)
    asg = entity_assignments(labels, nd).take_all()
    assert len(asg) == 2
    eids = {a["entity_id"] for a in asg}
    assert len(eids) == 1  # merged into one entity
    assert all(a["canonical_name"] == "alpha" for a in asg)


def test_connected_components_long_chain_converges():
    # a path graph (diameter n-1) — the shape the bucket-cap chain fallback
    # emits for hot LSH buckets. Plain min-relaxation capped at 8 rounds (the
    # old behavior) would silently return a SPLIT component for this graph;
    # pointer doubling must converge in O(log d) rounds to the global min.
    n = 12
    names = [f"node{i:04d}" for i in range(n)]
    nd = ray.data.from_items(
        [{"node": m, "type": "ORG", "norm_key": m, "n_mentions": 1} for m in names]
    )
    pairs = ray.data.from_items(
        [{"a": names[i], "b": names[i + 1]} for i in range(n - 1)]
    )
    # driver_threshold=0 forces the distributed pointer-doubling plan
    labels = {
        r["node"]: r["comp"]
        for r in connected_components(pairs, nd, driver_threshold=0).take_all()
    }
    assert len(labels) == n
    assert set(labels.values()) == {"node0000"}


def test_grouped_aggregate_null_and_separator_keys():
    from ray.data.aggregate import Sum

    from ner_extractor_ray.stages.canonicalize import grouped_aggregate

    rows = [
        {"k1": "a", "k2": "b", "v": 1},
        {"k1": "a\x00b", "k2": "", "v": 2},   # separator inside a component
        {"k1": "a", "k2": None, "v": 4},      # null key component
        {"k1": None, "k2": "b", "v": 8},      # null in the other component
        {"k1": "a", "k2": None, "v": 16},     # second row of the null group
    ]
    ds = ray.data.from_items(rows)
    out = {
        (r["k1"], r["k2"]): r["v"]
        for r in grouped_aggregate(ds, ["k1", "k2"], Sum("v", alias_name="v")).take_all()
    }
    assert out[("a", "b")] == 1
    assert out[("a\x00b", "")] == 2      # must NOT merge with ("a", "b")
    assert out[("a", None)] == 20        # nulls group together…
    assert out[(None, "b")] == 8         # …but only per distinct key tuple
    assert len(out) == 4


def test_pre_aggregated_count_skew():
    # one hot key = 50% of rows (FIXTURES.md §4 skew fixture): result exact
    rows = [{"k": "hot"} for _ in range(500)] + [{"k": f"cold{i}"} for i in range(500)]
    ds = ray.data.from_items(rows).repartition(8)
    out = {r["k"]: r["n"] for r in pre_aggregated_count(ds, ["k"], "n").take_all()}
    assert out["hot"] == 500
    assert sum(out.values()) == 1000
    assert len(out) == 501


def test_oversized_bucket_chain_preserves_connectivity():
    # >bucket_cap identical keys in one LSH bucket → chain pairs, still 1 comp
    keys = [("ORG", f"megacorp holdings {chr(97+i)}") for i in range(10)]
    # identical shingle-heavy prefix ⇒ same buckets, high jaccard
    nd = _nodes_ds(keys)
    pairs = candidate_pairs(nd, threshold=0.5, bucket_cap=4)
    labels = connected_components(pairs, nd)
    comps = {r["comp"] for r in labels.take_all()}
    assert len(comps) == 1
