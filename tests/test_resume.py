"""Checkpoint/resume: killed-run simulation must reproduce the full output.

Generalizes the reference's skip-completed patterns (grid-search `visited`,
k-fold metrics-file skip — SURVEY.md D1/T8) to partitioned-Parquet manifests.
"""

import os

from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg
from ner_extractor_ray.state.manifest import completed_partitions, table_complete


def _edge_set(res):
    return sorted(
        (e["subj_id"], e["pred"], e["obj_id"], e["n_occurrences"]) for e in res["edges"].take_all()
    )


def test_resume_after_partial_loss(small_pages_dir, tmp_path):
    out = str(tmp_path / "kg")
    res1 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    full = _edge_set(res1)
    assert table_complete(os.path.join(out, "edges"))
    assert table_complete(os.path.join(out, "annotations"))

    # simulate a killed run: one finished partition lost mid-write (files but
    # no manifest) + table manifest gone
    edir = os.path.join(out, "edges")
    parts = sorted(completed_partitions(edir))
    victim = os.path.join(edir, f"part={parts[0]}")
    os.remove(os.path.join(victim, "_MANIFEST.json"))  # torn write
    os.remove(os.path.join(edir, "_TABLE_MANIFEST.json"))

    res2 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    assert _edge_set(res2) == full
    assert table_complete(edir)


def test_resume_skips_completed_tables(small_pages_dir, tmp_path):
    out = str(tmp_path / "kg2")
    res1 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    full = _edge_set(res1)
    # annotations checkpoint manifest mtime must not change on resume
    adir = os.path.join(out, "annotations")
    before = os.path.getmtime(os.path.join(adir, "_TABLE_MANIFEST.json"))
    res2 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    after = os.path.getmtime(os.path.join(adir, "_TABLE_MANIFEST.json"))
    assert before == after
    assert _edge_set(res2) == full


def test_actor_pool_plan_matches_task_plan(small_pages_dir):
    """use_actors=True (the heavy-model physical plan) produces identical
    output to the default task plan."""
    a = run_kg(pages_dataset(small_pages_dir), out_dir=None, n_partitions=4)
    b = run_kg(
        pages_dataset(small_pages_dir), out_dir=None, n_partitions=4, use_actors=True
    )
    assert _edge_set(a) == _edge_set(b)


def test_partition_aware_compute_skip(small_pages_dir, tmp_path):
    """Deleting one annotations partition and rerunning must leave the other
    completed partitions' files untouched (their compute was pruned at the
    page level) while reproducing identical final output."""
    import shutil

    out = str(tmp_path / "kg3")
    res1 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    full = _edge_set(res1)
    adir = os.path.join(out, "annotations")
    parts = sorted(completed_partitions(adir))
    victim = os.path.join(adir, f"part={parts[-1]}")
    shutil.rmtree(victim)
    os.remove(os.path.join(adir, "_TABLE_MANIFEST.json"))
    # edges/nodes depend on annotations → rebuild them too
    shutil.rmtree(os.path.join(out, "edges"))
    shutil.rmtree(os.path.join(out, "nodes"))

    import hashlib

    def snapshot():
        out_map = {}
        for p in parts[:-1]:
            pdir = os.path.join(adir, f"part={p}")
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    with open(os.path.join(pdir, f), "rb") as fh:
                        out_map[(p, f)] = hashlib.sha1(fh.read()).hexdigest()
        return out_map

    surviving = snapshot()
    res2 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    assert _edge_set(res2) == full
    assert snapshot() == surviving  # completed partitions byte-identical, untouched


def test_partition_manifests_written_eagerly(small_pages_dir, tmp_path):
    """Every part dir must carry its own manifest (written by the write task
    when the file lands), so a run killed BEFORE finalize still resumes at
    partition granularity — completed_partitions must not depend on the
    table manifest existing."""
    out = str(tmp_path / "kg4")
    run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    adir = os.path.join(out, "annotations")
    os.remove(os.path.join(adir, "_TABLE_MANIFEST.json"))  # as if finalize never ran
    parts = completed_partitions(adir)
    assert parts  # partition-level resume state survives without the table manifest
    for p in parts:
        assert os.path.exists(os.path.join(adir, f"part={p}", "_MANIFEST.json"))


def test_partition_sizing_contract(tmp_path):
    """SCALE CONTRACT (materialize.write_partitioned): n_partitions bounds
    per-partition bytes. 64 partitions over a skewed-but-high-cardinality
    corpus → max partition stays within a small factor of the mean, so the
    'thousands of partitions at 100 TB' knob demonstrably controls worker
    heap footprint."""
    import ray.data

    from ner_extractor_ray.stages.materialize import write_partitioned

    rows = [
        {"k": f"key-{i % 4000}", "payload": "x" * 200}  # 4000 distinct keys
        for i in range(20_000)
    ]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "sized")
    info = write_partitioned(ds, out, "k", n_partitions=64, resume=False)
    sizes = [p["bytes"] for p in info["partitions"].values()]
    assert len(sizes) == 64
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes))


def test_hash_join_linking_plan_matches_broadcast(small_pages_dir):
    """broadcast_limit=0 forces the partitioned hash-join resolution path
    (the 1e9-surface-vocabulary plan); output must equal the broadcast plan."""
    a = run_kg(pages_dataset(small_pages_dir), out_dir=None, n_partitions=4)
    b = run_kg(
        pages_dataset(small_pages_dir), out_dir=None, n_partitions=4, broadcast_limit=0
    )
    assert _edge_set(a) == _edge_set(b)


def test_compact_table_repartitions_identically(small_pages_dir, tmp_path):
    """compact_table re-buckets a finished table to a new partition count:
    same rows, new layout, fresh per-partition manifests + completeness
    marker; a source without its completeness marker is refused."""
    import pytest
    import ray.data

    from ner_extractor_ray.stages.materialize import compact_table

    out = str(tmp_path / "kg")
    res = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=8)
    full = _edge_set(res)
    edir = os.path.join(out, "edges")
    assert len(completed_partitions(edir)) > 2

    cdir = str(tmp_path / "edges_compact")
    compact_table(edir, cdir, "subj_id", n_partitions=2,
                  sort_key=["subj_id", "pred", "obj_id"])
    assert table_complete(cdir)
    assert completed_partitions(cdir) == {0, 1}
    got = sorted(
        (e["subj_id"], e["pred"], e["obj_id"], e["n_occurrences"])
        for e in ray.data.read_parquet(cdir).take_all())
    assert got == full

    os.remove(os.path.join(edir, "_TABLE_MANIFEST.json"))
    with pytest.raises(ValueError, match="refusing"):
        compact_table(edir, str(tmp_path / "x"), "subj_id", n_partitions=2)
