"""The driver's CORRECTNESS harness checks the FIRST 50 queries() entries —
that window is deliberately filled with marquee oracle-backed operators and
MUST stay byte-stable across refactors (the round-4 split of queries.py into
family modules re-exports every entry in the same dict order; this test is
the guard). New entries are appended at the END of the dict only."""

from ner_extractor_ray.pipelines.queries import oracle_sql, queries

DRIVER_WINDOW = [
    "pricing_summary", "revenue_by_region", "order_rank",
    "purchase_clicks_window", "dup_ngram_fraction", "neardup_keep",
    "scd_segment_orders", "nation_presence_outer", "snapshot_delta",
    "value_hist_quantiles", "table_checksum", "price_qty_cov",
    "price_deciles", "decayed_clicks", "user_funnel", "stratified_sample",
    "per_source_sample", "weighted_sample", "paragraph_dedup",
    "normalized_dedup", "minhash_neardup", "ngram_jaccard_neardup",
    "simhash", "setsim_neardup", "domain_dup_rate", "knn_ivf_full",
    "kmeans_fixed", "heavy_hitters", "langid", "quality", "phrase_search",
    "subword_counts", "tfidf_top_terms", "pmi_bigrams", "decontamination",
    "fingerprint", "repetition_stats", "length_buckets", "oov_rate",
    "word_commonness", "hll_users", "hll_per_type", "cms_users",
    "graph_degree", "graph_triangles", "graph_components", "graph_pagerank",
    "graph_khop", "link_predict", "kcore",
]


def test_driver_window_is_stable():
    assert list(queries())[:50] == DRIVER_WINDOW


def test_catalog_size_never_shrinks():
    qs = queries()
    assert len(qs) >= 261
    # every oracle key has a queries() entry (the driver joins on the key)
    assert set(oracle_sql()) <= set(qs)
    # round-4 floor: at least 249 externally hash-checked entries
    assert len(oracle_sql()) >= 249


def test_family_modules_cover_catalog():
    """Every q_* callable in the dict resolves to one of the family modules
    (no stragglers left in the facade) and is importable from
    pipelines.queries for backward compatibility."""
    import importlib

    import ner_extractor_ray.pipelines.queries as Q

    fams = [
        "q_relational", "q_dedup", "q_text", "q_vector", "q_web",
        "q_stream", "q_stats", "q_graph", "q_sketch", "q_sample",
    ]
    owners = set()
    for name, fn in queries().items():
        mod = getattr(fn, "__module__", "")
        owners.add(mod.rsplit(".", 1)[-1])
        assert getattr(Q, fn.__name__, None) is fn, name
    assert owners <= set(fams), owners
    for f in fams:
        importlib.import_module(f"ner_extractor_ray.pipelines.{f}")
