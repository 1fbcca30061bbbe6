"""Incremental curation (pipelines/curation_update.py): frozen corpus wins,
new-only components keep the longest, snapshot chain reads, idempotency."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ner_extractor_ray.pipelines.curation import run_curation
from ner_extractor_ray.pipelines.curation_update import (
    read_curated_chain,
    update_curation,
)

BASE = "the quick brown fox jumps over the lazy dog today"


def _write(tmp_path, name, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_update_curation_frozen_corpus_wins(tmp_path):
    old_rows = [
        (1, BASE),                                              # kept
        (2, "completely different content about spark and ray data"),  # kept
    ]
    prev_src = _write(tmp_path, "old", old_rows)
    prev_dir = str(tmp_path / "snap0")
    res0 = run_curation(ray.data.read_parquet(prev_src), out_dir=prev_dir,
                        n_partitions=4)
    assert res0["stats"]["n_curated"] == 2

    new_rows = [
        (10, BASE),                       # exact dup of frozen doc 1 → drop
        (11, BASE + " tonight"),          # NEAR-dup of frozen doc 1 → drop
                                          # (frozen wins even though longer!)
        (12, "entirely novel prose about distributed data engines"),   # keep
        (13, "entirely novel prose about distributed data engines now"),  # near-dup
                                          # of 12 (new-only comp) → 13 longer, keeps
        (14, "tiny"),                     # quality → drop
    ]
    new_src = _write(tmp_path, "new", new_rows)
    out_dir = str(tmp_path / "snap1")
    res = update_curation(
        prev_dir,
        ray.data.read_parquet(new_src),
        ray.data.read_parquet(prev_src),
        out_dir,
        n_partitions=4,
    )
    st = res["stats"]
    assert st["n_new_input"] == 5
    assert st["n_after_exact"] == 3       # 10 (exact-vs-frozen) and 14 dropped
    kept_new = sorted(r["doc_id"] for r in res["curated_new"].take_all())
    assert kept_new == [13]               # 11 lost to frozen 1; 12 lost to 13
    chain = sorted(r["doc_id"] for r in read_curated_chain(out_dir).take_all())
    assert chain == [1, 2, 13]

    # idempotency: replaying the same new batch on the NEW snapshot drops
    # everything (13 is now frozen; 12 near-dups it; 10/11 unchanged)
    out2 = str(tmp_path / "snap2")
    res2 = update_curation(
        out_dir,
        ray.data.read_parquet(new_src),
        ray.data.read_parquet(prev_src).union(ray.data.read_parquet(new_src)),
        out2,
        n_partitions=4,
    )
    assert res2["stats"]["n_new_kept"] == 0
    assert sorted(r["doc_id"] for r in read_curated_chain(out2).take_all()) \
        == [1, 2, 13]


def test_update_curation_guards(tmp_path):
    prev_src = _write(tmp_path, "old", [(1, BASE)])
    prev_dir = str(tmp_path / "snap0")
    run_curation(ray.data.read_parquet(prev_src), out_dir=prev_dir, n_partitions=2)
    try:
        update_curation(prev_dir, ray.data.read_parquet(prev_src),
                        ray.data.read_parquet(prev_src), prev_dir)
        raise AssertionError("expected ValueError for out_dir == prev_dir")
    except ValueError as e:
        assert "immutability" in str(e)
