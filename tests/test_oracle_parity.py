"""End-to-end golden tests: Ray pipeline vs single-process oracle vs gold.

FIXTURES.md §5 contract: (1) byte-identical text per url; (2) triple-level
P/R ≥ 0.95 (target 1.0); (3) identical outputs across parallelism is covered
by determinism of every stage (hash-derived identity, no RNG call order).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_extractor_ray.functions.metrics import span_prf
from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg
from reference_impl.oracle import run_oracle


@pytest.fixture(scope="module")
def pipeline_and_oracle(small_pages_dir):
    import glob

    rows = []
    for f in sorted(glob.glob(small_pages_dir + "/pages-*.parquet")):
        rows.extend(pq.read_table(f).to_pylist())
    oracle = run_oracle(rows)
    res = run_kg(pages_dataset(small_pages_dir), out_dir=None, n_partitions=4)
    return res, oracle, small_pages_dir


def test_text_byte_identical_per_url(pipeline_and_oracle, small_pages_dir):
    """Per-row invariant (input_hint): extracted text byte-identical per url."""
    import glob

    from ner_extractor_ray.functions.textfns import extract_text

    _, oracle, _ = pipeline_and_oracle
    gold = pq.read_table(small_pages_dir + "/gold_text.parquet")
    gold_map = dict(zip(gold.column("url").to_pylist(), gold.column("text").to_pylist()))
    assert oracle["text_by_url"] == gold_map
    for f in sorted(glob.glob(small_pages_dir + "/pages-*.parquet")):
        for row in pq.read_table(f).to_pylist():
            assert extract_text(row["html"]) == gold_map[row["url"]]


def test_mentions_match_oracle_exactly(pipeline_and_oracle):
    res, oracle, _ = pipeline_and_oracle
    pred = pa.concat_tables(
        [
            b
            for b in res["mentions"]
            .select_columns(["url", "sent_id", "start", "end", "type"])
            .iter_batches(batch_format="pyarrow")
        ]
    )
    gold = pa.table(
        {
            "url": [m["url"] for m in oracle["mentions"]],
            "sent_id": [m["sent_id"] for m in oracle["mentions"]],
            "start": [m["start"] for m in oracle["mentions"]],
            "end": [m["end"] for m in oracle["mentions"]],
            "type": [m["type"] for m in oracle["mentions"]],
        }
    )
    prf = span_prf(pred, gold, ["url", "sent_id", "start", "end", "type"])
    assert prf.f1 == 1.0, prf


def test_mentions_match_generator_gold(pipeline_and_oracle, small_pages_dir):
    res, _, _ = pipeline_and_oracle
    pred_batches = [
        b for b in res["mentions"]
        .select_columns(["url", "sent_id", "start", "end", "type"])
        .iter_batches(batch_format="pyarrow")
    ]
    pred = pa.concat_tables(pred_batches)
    gold = pq.read_table(small_pages_dir + "/gold_mentions.parquet")
    prf = span_prf(pred, gold, ["url", "sent_id", "start", "end", "type"])
    assert prf.f1 == 1.0, prf


def test_triples_prf_vs_oracle(pipeline_and_oracle):
    """North-rule gate: triple-level P/R ≥ 0.95 vs the oracle (expect 1.0)."""
    res, oracle, _ = pipeline_and_oracle
    keys = ["url", "sent_id", "subj", "pred", "obj"]
    pred = pa.concat_tables(
        [b for b in res["triples"].select_columns(keys).iter_batches(batch_format="pyarrow")]
    )
    gold = pa.table({k: [t[k] for t in oracle["triples"]] for k in keys})
    prf = span_prf(pred, gold, keys)
    assert prf.precision >= 0.95 and prf.recall >= 0.95, prf
    assert prf.f1 == 1.0, prf


def test_triples_vs_generator_gold(pipeline_and_oracle, small_pages_dir):
    res, _, _ = pipeline_and_oracle
    keys = ["url", "sent_id", "subj", "pred", "obj"]
    pred = pa.concat_tables(
        [b for b in res["triples"].select_columns(keys).iter_batches(batch_format="pyarrow")]
    )
    gold = pq.read_table(small_pages_dir + "/gold_triples.parquet")
    prf = span_prf(pred, gold, keys)
    assert prf.precision >= 0.95 and prf.recall >= 0.95, prf


def test_graph_matches_oracle(pipeline_and_oracle):
    """Nodes and deduped edges agree with the oracle's union-find graph."""
    res, oracle, _ = pipeline_and_oracle
    nodes = sorted(
        res["nodes"].take_all(),
        key=lambda d: d["entity_id"],
    )
    o_nodes = oracle["nodes"]
    assert {(n["entity_id"], n["canonical_name"], n["type"], n["n_mentions"]) for n in nodes} == {
        (n["entity_id"], n["canonical_name"], n["type"], n["n_mentions"]) for n in o_nodes
    }
    edges = res["edges"].take_all()
    assert {(e["subj_id"], e["pred"], e["obj_id"], e["n_occurrences"], e["prov"]) for e in edges} == {
        (e["subj_id"], e["pred"], e["obj_id"], e["n_occurrences"], e["prov"])
        for e in oracle["edges"]
    }


def test_alias_groups_share_entity_id(pipeline_and_oracle, small_pages_dir):
    """gold_entities contract (FIXTURES.md §2): all surfaces of one alias
    group ("IBM"/"I.B.M.", "Bill Gates"/"William Gates") that appear in the
    corpus resolve to ONE canonical entity id."""
    from ner_extractor_ray.functions.gazetteer import ALIAS_GROUPS, GAZETTEER

    res, _, _ = pipeline_and_oracle
    surf_to_eid = {}
    for r in res["mentions"].select_columns(["surface", "type", "entity_id"]).take_all():
        surf_to_eid[(r["type"], r["surface"])] = r["entity_id"]

    type_of = {s: t for t, ss in GAZETTEER.items() for s in ss}
    checked = 0
    for group in ALIAS_GROUPS:
        eids = {
            surf_to_eid[(type_of[s], s)]
            for s in group
            if s in type_of and (type_of[s], s) in surf_to_eid
        }
        if len(eids) >= 1:
            assert len(eids) == 1, (group, eids)
            checked += 1
    assert checked >= 2  # at least IBM and Bill Gates groups appear in 300 pages
