"""Near-dup keep/drop resolution + canonicalization physical-plan parity."""

import pyarrow as pa
import ray.data

from ner_extractor_ray.functions.dedup import (
    exact_dedup_groups,
    lsh_near_dup_pairs,
    near_dup_keep_ids,
)
from ner_extractor_ray.stages.canonicalize import canonicalize_nodes


def test_near_dup_keep_ids_components():
    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog today"},
            {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog today"},
            {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog tonight"},
            {"doc_id": 4, "text": "completely different content about spark and ray data"},
        ]
    )
    pairs = lsh_near_dup_pairs(docs, "text", "doc_id", shingle="word3", threshold=0.6)
    keep = {r["doc_id"]: r["keep_id"] for r in near_dup_keep_ids(pairs, docs, "doc_id").take_all()}
    assert keep[1] == 1 and keep[2] == 1  # exact dups share representative
    assert keep[3] == 1                   # near-dup joins the component
    assert keep[4] == 4                   # unrelated doc keeps itself


def test_exact_dedup_counts():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": "same text" if i < 3 else f"unique {i}"} for i in range(6)]
    )
    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup_groups(docs, "text", "doc_id").take_all()}
    assert out[0] == 3
    assert all(v == 1 for k, v in out.items() if k != 0)


def _nodes(keys):
    return ray.data.from_items(
        [{"node": f"ORG:{k}", "type": "ORG", "norm_key": k, "n_mentions": 1} for k in keys]
    )


def test_canonicalize_plans_agree():
    """Driver union-find plan (small vocab) and distributed CC plan must
    produce byte-identical assignments — same pair generation by design."""
    keys = [
        "acme corporation international",
        "acme corporation internationale",
        "globex holdings limited",
        "globex holdings ltd",
        "unrelated zebra company",
    ]
    driver = sorted(
        (r["node"], r["entity_id"], r["canonical_name"])
        for r in canonicalize_nodes(_nodes(keys), driver_threshold=10_000).take_all()
    )
    dist = sorted(
        (r["node"], r["entity_id"], r["canonical_name"])
        for r in canonicalize_nodes(_nodes(keys), driver_threshold=0).take_all()
    )
    assert driver == dist
    eids = {e for _, e, _ in driver}
    assert len(eids) == 3  # two merged pairs + one singleton


def test_bloom_filter_no_false_negatives():
    from ner_extractor_ray.functions.bloom import BloomFilter, build_bloom, semi_join_prefilter

    keys = ray.data.from_items([{"k": f"key-{i}"} for i in range(0, 1000, 2)])
    bf = build_bloom(keys, "k", n_bits=1 << 16)
    for i in range(0, 1000, 2):
        assert f"key-{i}" in bf  # zero false negatives, guaranteed
    fp = sum(1 for i in range(1, 1000, 2) if f"key-{i}" in bf)
    assert fp < 50  # false-positive rate stays small at this sizing

    import ray as _r

    probe = ray.data.from_items([{"k": f"key-{i}"} for i in range(1000)])
    kept = semi_join_prefilter(probe, "k", _r.put(bf)).take_all()
    kept_keys = {r["k"] for r in kept}
    assert {f"key-{i}" for i in range(0, 1000, 2)} <= kept_keys  # all true members survive


def test_asof_join_backward_semantics():
    import datetime as dt

    from ner_extractor_ray.stages.asof import asof_join

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = ray.data.from_items(
        [{"event_id": 1, "k": "a", "ts": T(10)},
         {"event_id": 2, "k": "a", "ts": T(20)},
         {"event_id": 3, "k": "b", "ts": T(5)}]
    )
    right = ray.data.from_items(
        [{"event_id": 10, "k": "a", "ts": T(8)},
         {"event_id": 11, "k": "a", "ts": T(15)},
         {"event_id": 12, "k": "b", "ts": T(9)}]  # after left b → no match
    )
    out = {r["event_id"]: r.get("event_id_r") for r in
           asof_join(left, right, on="k", ts_col="ts", num_partitions=4).take_all()}
    assert out[1] == 10       # latest right ts ≤ 10 is 8
    assert out[2] == 11       # latest ≤ 20 is 15
    assert out[3] is None or (out[3] != out[3])  # no prior right row for b
