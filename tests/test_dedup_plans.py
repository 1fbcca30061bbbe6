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


def test_neardup_keep_best_argmax_and_ties(tmp_path):
    """Quality-weighted keeper: max token count wins within a component;
    equal counts tie-break to min doc_id; singletons keep themselves."""
    import pyarrow.parquet as pq

    base = "the quick brown fox jumps over the lazy dog today"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    base,                      # comp {1,2,3}: 10 tokens
                    base + " tonight",         # 11 tokens, J=8/9≥0.8 — keeper
                    base,                      # 10 tokens
                    "completely different content about spark and ray data",
                    "completely different content about spark and ray data",
                    # 4+5 are exact dups with EQUAL counts → min id (4) keeps
                ]
            ),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    from ner_extractor_ray.pipelines.queries import q_neardup_keep_best

    keep = {r["doc_id"]: r["keep_id"] for r in q_neardup_keep_best(str(d)).take_all()}
    assert keep[1] == 2 and keep[2] == 2 and keep[3] == 2  # longest version wins
    assert keep[4] == 4 and keep[5] == 4                   # tie → min doc_id


def test_lsh_pairs_match_driver_oracle():
    """The narrow-shuffle plan (band rows = (bucket, id); texts re-joined for
    candidates only) must produce the IDENTICAL verified pair set as a
    single-process replication of the text-carrying plan: same bands, same
    bucket cap/chaining, same exact-Jaccard verify."""
    from ner_extractor_ray.functions.dedup import SHINGLERS
    from ner_extractor_ray.functions.textfns import (
        band_buckets,
        jaccard,
        minhash_signature_sql,
    )

    docs_dir = "/root/testdata/sf0.01/documents.parquet"
    ds = ray.data.read_parquet(docs_dir, columns=["doc_id", "text"])
    rows = ds.take_all()

    shingler = SHINGLERS["word3"]
    threshold, n_bands, num_perm, bucket_cap = 0.8, 16, 64, 64
    buckets: dict[int, list[int]] = {}
    texts = {}
    for r in rows:
        texts[r["doc_id"]] = r["text"]
        sig = minhash_signature_sql(shingler(r["text"] or ""), num_perm)
        for bk in band_buckets(sig, n_bands):
            buckets.setdefault(bk, []).append(r["doc_id"])
    expected = set()
    for members in buckets.values():
        ids = sorted(set(members))
        n = len(ids)
        if n < 2:
            continue
        prs = (
            [(i, j) for i in range(n) for j in range(i + 1, n)]
            if n <= bucket_cap
            else [(i, i + 1) for i in range(n - 1)]
        )
        for i, j in prs:
            jv = jaccard(set(shingler(texts[ids[i]] or "")), set(shingler(texts[ids[j]] or "")))
            if jv >= threshold:
                expected.add((ids[i], ids[j]))

    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            ds, "text", "doc_id", shingle="word3", threshold=threshold
        ).take_all()
    }
    assert got == expected
    assert expected  # the fixture must actually contain near-dups


def test_lsh_pairs_broadcast_and_join_plans_agree():
    """broadcast_limit=0 forces the bloom + hash-join text-fetch plan (the
    huge-candidate-set path); its verified pair set must equal the broadcast
    fast path's."""
    ds = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet",
                               columns=["doc_id", "text"])
    fast = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in lsh_near_dup_pairs(ds, "text", "doc_id").take_all()}
    joined = {(r["id_a"], r["id_b"], r["jaccard"])
              for r in lsh_near_dup_pairs(ds, "text", "doc_id",
                                          broadcast_limit=0).take_all()}
    assert fast == joined
    assert fast


def test_lsh_pairs_empty_corpus():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"totally unique sentence number {i} with word salad {i*7}"}
         for i in range(8)]
    )
    out = lsh_near_dup_pairs(docs, "text", "doc_id", shingle="word3", threshold=0.95)
    assert out.take_all() == []


def test_exact_dedup_counts():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": "same text" if i < 3 else f"unique {i}"} for i in range(6)]
    )
    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup_groups(docs, "text", "doc_id").take_all()}
    assert out[0] == 3
    assert all(v == 1 for k, v in out.items() if k != 0)


def _write_embeddings(tmp_path, n=64, dim=16):
    """Synthetic embeddings table with a PLANTED near-identical pair
    (vec_id 10 and 11) and otherwise well-separated vectors."""
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[11] = vecs[10] + 1e-4 * rng.normal(size=dim).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_embedding_neardup_finds_planted_pair(tmp_path):
    from ner_extractor_ray.pipelines.queries import q_embedding_neardup

    d = _write_embeddings(tmp_path)
    pairs = {(r["id_a"], r["id_b"]) for r in q_embedding_neardup(d).take_all()}
    assert (10, 11) in pairs
    # random gaussian vectors in 16-d are nowhere near cos > 0.95
    assert pairs == {(10, 11)}


def test_embedding_neardup_bucket_cap_chain(tmp_path):
    """With a tiny bucket_cap every bucket takes the chain fallback; the
    planted pair has ADJACENT ids, so the O(n) consecutive scan keeps it."""
    from ner_extractor_ray.pipelines.queries import q_embedding_neardup

    d = _write_embeddings(tmp_path)
    pairs = {(r["id_a"], r["id_b"]) for r in q_embedding_neardup(d, bucket_cap=2).take_all()}
    assert (10, 11) in pairs


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
