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
