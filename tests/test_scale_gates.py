"""Both physical plans of every size-gated operator must produce identical
results: the broadcast plan (small side fits) and the at-scale plan (Bloom
prefilter + partitioned hash join / pre-aggregated fact side). Forcing
``broadcast_limit=0`` exercises the at-scale branch on the small fixtures."""

import numpy as np
import pandas as pd

from ner_extractor_ray.pipelines.queries import (
    q_customers_with_orders,
    q_revenue_by_brand,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_customers_with_orders_bloom_path_matches_broadcast():
    bc = _norm(q_customers_with_orders(SF_DIR))
    at_scale = _norm(q_customers_with_orders(SF_DIR, broadcast_limit=0))
    pd.testing.assert_frame_equal(bc, at_scale)
    assert len(bc) > 0


def test_revenue_by_brand_join_path_matches_broadcast():
    bc = _norm(q_revenue_by_brand(SF_DIR))
    at_scale = _norm(q_revenue_by_brand(SF_DIR, broadcast_limit=0))
    pd.testing.assert_frame_equal(bc, at_scale)
    assert len(bc) > 0


def test_batched_minhash_matches_scalar():
    """minhash_signatures_sql_batch / band_buckets_batch are drop-in
    vectorizations of the per-doc functions the SQL oracle replicates —
    values must agree element for element (including the empty-doc
    sentinel)."""
    from ner_extractor_ray.functions.textfns import (
        band_buckets,
        band_buckets_batch,
        minhash_signature_sql,
        minhash_signatures_sql_batch,
        word_ngrams,
    )

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "",  # empty → all-max sentinel signature
        "pack my box with five dozen liquor jugs right now",
        "the quick brown fox jumps over the lazy dog today",
    ]
    sh_lists = [word_ngrams(d, 3) for d in docs]
    batch = minhash_signatures_sql_batch(sh_lists, 64)
    for i, sh in enumerate(sh_lists):
        np.testing.assert_array_equal(batch[i], minhash_signature_sql(sh, 64))
    bb = band_buckets_batch(batch, 16)
    for i in range(len(docs)):
        assert list(bb[i]) == band_buckets(batch[i], 16)


def test_setsim_prefix_blocking_is_lossless():
    """Hand-built docs where the near pair shares most trigrams; setsim must
    find exactly the pairs the brute-force check finds (blocking lossless)."""
    import itertools

    import ray.data

    from ner_extractor_ray.functions.dedup import SHINGLERS, setsim_join_pairs

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
        2: "one two three four five six seven eight nine",
        3: "completely different words in this document here",
        4: "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
    }
    ds = ray.data.from_items([{"doc_id": k, "text": v} for k, v in texts.items()])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in setsim_join_pairs(ds, "text", "doc_id",
                                   threshold_num=3, threshold_den=5).take_all()
    }
    sh = SHINGLERS["word3"]
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = set(sh(texts[a])), set(sh(texts[b]))
        ni = len(sa & sb)
        un = len(sa) + len(sb) - ni
        if un and ni * 5 >= un * 3:
            want[(a, b)] = (ni * 1_000_000) // un
    assert got == want
    assert (0, 4) in got and got[(0, 4)] == 1_000_000


def test_khop_distances_bfs():
    import pyarrow as pa
    import ray.data

    from ner_extractor_ray.functions.graph import khop_distances

    # path 1-2-3-4-5 plus separate component 10-11: BFS from min node (1)
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 2, 3, 4, 10], pa.int64()),
        "v": pa.array([2, 3, 4, 5, 11], pa.int64()),
        "n": pa.array([1] * 5, pa.int64()),
    }))
    got = sorted((r["node"], r["hops"]) for r in khop_distances(edges, k=3).take_all())
    assert got == [(1, 0), (2, 1), (3, 2), (4, 3)]  # 5 is 4 hops away; 10/11 unreachable
    got2 = sorted((r["node"], r["hops"]) for r in khop_distances(edges, k=3, seed=10).take_all())
    assert got2 == [(10, 0), (11, 1)]


def test_paragraph_dedup_counts(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_extractor_ray.pipelines.queries import q_paragraph_dedup

    rep = " ".join(f"w{i}" for i in range(10))          # one exact 10-token chunk
    uniq = " ".join(f"u{i}" for i in range(10))
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # doc0: rep + uniq (2 chunks, both kept — first occurrence)
        # doc1: rep twice (2 chunks of identical content; keeper is doc0's)
        # doc2: 5 tokens (1 short chunk, unique)
        "text": pa.array([rep + " " + uniq, rep + " " + rep, "a b c d e"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: (r["n_chunks"], r["n_kept"])
           for r in q_paragraph_dedup(str(tmp_path)).take_all()}
    assert got == {0: (2, 2), 1: (2, 0), 2: (1, 1)}
