"""Round-5 directive #3 — TASK-retry idempotency of the kg pipeline.

Kill/resume tests (test_kill_resume.py / test_resume.py) cover DRIVER
restart; nothing exercised Ray's task retry until this module. With
GRAFT_FAULT_INJECT=1, stages/faults.py fails (a) every input block's first
attempt in the fused corpus pass and (b) every write task's first attempt
BETWEEN the parquet rename and the partition manifest. Ray retries the
tasks (retry_exceptions on the injected stages); the run must complete with
output byte-identical to a clean run and all manifests present — pinning
that every stage is idempotent under re-execution.
"""

import json
import os

import pytest
import ray


def _kg(pdir, out_dir):
    from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg

    res = run_kg(pages_dataset(pdir), out_dir=out_dir, n_partitions=8)
    edges = sorted(
        tuple(sorted(r.items())) for r in res["edges"].take_all())
    nodes = sorted(
        tuple(sorted(r.items())) for r in res["nodes"].take_all())
    return edges, nodes


def test_task_retry_idempotent(tmp_path, monkeypatch):
    from ner_extractor_ray.sources.pages import write_pages
    from ner_extractor_ray.stages import faults

    pdir = str(tmp_path / "pages")
    write_pages(pdir, 150, n_files=4)

    monkeypatch.delenv(faults.FAULT_ENV, raising=False)
    clean_edges, clean_nodes = _kg(pdir, str(tmp_path / "clean"))
    assert clean_edges

    monkeypatch.setenv(faults.FAULT_ENV, "1")
    faults.reset()
    faulty_out = str(tmp_path / "faulty")
    faulty_edges, faulty_nodes = _kg(pdir, faulty_out)
    fired = faults.fired_count()
    assert fired > 0, "no fault was injected — the harness is dead"

    assert faulty_edges == clean_edges
    assert faulty_nodes == clean_nodes

    # every table completed: table manifest + per-partition manifests, and
    # the retried write landed each partition's manifest exactly once with
    # rows matching the parquet file it describes
    for table in ("annotations", "assignments", "nodes", "edges"):
        tdir = os.path.join(faulty_out, table)
        assert os.path.exists(os.path.join(tdir, "_TABLE_MANIFEST.json")), table
        import pyarrow.parquet as pq
        for part in sorted(os.listdir(tdir)):
            if not part.startswith("part="):
                continue
            pdirp = os.path.join(tdir, part)
            man = json.load(open(os.path.join(pdirp, "_MANIFEST.json")))
            n = pq.read_table(
                os.path.join(pdirp, man["files"][0])).num_rows
            assert n == man["rows"], (table, part)

    faults.reset()


def test_task_retry_idempotent_8cpu_subprocess(tmp_path):
    """Second CPU level (directive: green at 2 levels): the same
    fault-injected run in a FRESH 8-cpu Ray session, compared against the
    session's clean counts via the deterministic (200 pages, seed 42)
    corpus expectation (mentions 1616, edges 549 — the /verify recipe
    numbers scale-pinned at 200 pages; here 150 pages, so the subprocess
    recomputes its own clean baseline)."""
    import subprocess
    import sys

    script = r"""
import os, ray, sys
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ner_extractor_ray.sources.pages import write_pages
from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg
from ner_extractor_ray.stages import faults

pdir = sys.argv[1]
write_pages(pdir, 150, n_files=4)
clean = run_kg(pages_dataset(pdir), out_dir=sys.argv[2] + "_clean",
               n_partitions=8)
ce = sorted(tuple(sorted(r.items())) for r in clean["edges"].take_all())

os.environ[faults.FAULT_ENV] = "1"
res = run_kg(pages_dataset(pdir), out_dir=sys.argv[2], n_partitions=8)
fe = sorted(tuple(sorted(r.items())) for r in res["edges"].take_all())
assert faults.fired_count() > 0
assert fe == ce and len(ce) > 0
print("OK", len(ce), faults.fired_count())
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "p8"),
         str(tmp_path / "o8")],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_fault_stage_noop_without_flag(monkeypatch):
    """Production path: fault_stage must return the dataset UNTOUCHED (no
    extra stage, no oracle actor) when the env flag is absent."""
    from ner_extractor_ray.stages.faults import fault_stage

    monkeypatch.delenv("GRAFT_FAULT_INJECT", raising=False)
    ds = ray.data.range(10)
    assert fault_stage(ds, "x") is ds


def test_curation_task_retry_idempotent(tmp_path, monkeypatch):
    """The curation flagship under the same injection: its three
    write_partitioned calls hit the write-point fault (rename→manifest gap)
    automatically; survivors must match the clean run exactly."""
    import pyarrow as pa

    from ner_extractor_ray.pipelines.curation import run_curation
    from ner_extractor_ray.stages import faults

    n = 400
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(
            [" ".join(f"d{i}w{j}" for j in range(30)) if i % 3 else
             " ".join(f"c w{j}" for j in range(30)) for i in range(n)],
            pa.string()),
    })
    ds = ray.data.from_arrow(docs)

    monkeypatch.delenv(faults.FAULT_ENV, raising=False)
    clean = run_curation(ds, out_dir=str(tmp_path / "c1"), n_partitions=8)
    c_ids = sorted(clean["curated"].to_pandas()["doc_id"].astype(int))

    monkeypatch.setenv(faults.FAULT_ENV, "1")
    faults.reset()
    faulty = run_curation(ds, out_dir=str(tmp_path / "c2"), n_partitions=8)
    f_ids = sorted(faulty["curated"].to_pandas()["doc_id"].astype(int))
    assert faults.fired_count() > 0
    assert f_ids == c_ids and len(c_ids) > 0
    faults.reset()


def test_update_kg_task_retry_idempotent(tmp_path, monkeypatch):
    """Incremental update under injection: prev snapshot built clean, then
    the SAME update run twice (clean vs fault-injected) must produce
    identical merged edge sets with frozen ids intact."""
    import glob

    import ray.data as _rd

    from ner_extractor_ray.pipelines.kg import PAGE_COLUMNS, run_kg
    from ner_extractor_ray.pipelines.kg_update import update_kg
    from ner_extractor_ray.sources.pages import write_pages
    from ner_extractor_ray.stages import faults

    base = tmp_path
    write_pages(str(base / "pages"), 120, n_files=8)
    files = sorted(glob.glob(str(base / "pages" / "pages-*.parquet")))
    rd = lambda fs: _rd.read_parquet(fs, columns=PAGE_COLUMNS)

    monkeypatch.delenv(faults.FAULT_ENV, raising=False)
    run_kg(rd(files[:1]), out_dir=str(base / "prev"), n_partitions=8)
    clean = update_kg(str(base / "prev"), rd(files[1:]),
                      str(base / "upd_clean"), n_partitions=8)
    ce = sorted(tuple(sorted(r.items())) for r in clean["edges"].take_all())

    monkeypatch.setenv(faults.FAULT_ENV, "1")
    faults.reset()
    faulty = update_kg(str(base / "prev"), rd(files[1:]),
                       str(base / "upd_fault"), n_partitions=8)
    fe = sorted(tuple(sorted(r.items())) for r in faulty["edges"].take_all())
    assert faults.fired_count() > 0
    assert fe == ce and len(ce) > 0
    faults.reset()
