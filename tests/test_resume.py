"""Checkpoint/resume: killed-run simulation must reproduce the full output.

Generalizes the reference's skip-completed patterns (grid-search `visited`,
k-fold metrics-file skip — SURVEY.md D1/T8) to partitioned-Parquet manifests.
"""

import json
import os
import shutil

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
    # tagged checkpoint manifest mtimes must not change on resume
    tdir = os.path.join(out, "tagged")
    before = os.path.getmtime(os.path.join(tdir, "_TABLE_MANIFEST.json"))
    res2 = run_kg(pages_dataset(small_pages_dir), out_dir=out, n_partitions=4)
    after = os.path.getmtime(os.path.join(tdir, "_TABLE_MANIFEST.json"))
    assert before == after
    assert _edge_set(res2) == full
