"""True kill-and-resume (FIXTURES.md §5e): SIGKILL a running pipeline process
after the annotations checkpoint lands, resume in a fresh process, and require
output identical to an uninterrupted run. Runs through the CLI surface (own
Ray session per process), so this also covers the ray-job entry path."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest


def _run_cli(args, **kw):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    return subprocess.run(
        [sys.executable, "-m", "ner_extractor_ray.cli", *args],
        cwd="/root/repo", env=env, capture_output=True, text=True, **kw,
    )


@pytest.fixture(scope="module")
def cli_pages(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_pages") / "pages")
    r = _run_cli(["gen", "--out", d, "--n-pages", "800", "--n-files", "4"])
    assert r.returncode == 0, r.stderr[-500:]
    return d


def test_sigkill_then_resume_matches_uninterrupted(cli_pages, tmp_path):
    out_a = str(tmp_path / "uninterrupted")
    r = _run_cli(["kg", "--pages", cli_pages, "--out", out_a])
    assert r.returncode == 0, r.stderr[-500:]
    ref = json.loads(r.stdout.strip().splitlines()[-1])

    out_b = str(tmp_path / "killed")
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "ner_extractor_ray.cli", "kg",
         "--pages", cli_pages, "--out", out_b],
        cwd="/root/repo", env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    marker = os.path.join(out_b, "annotations", "_TABLE_MANIFEST.json")
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.exists(marker):
        if proc.poll() is not None:
            pytest.fail("pipeline finished before the kill could land")
        time.sleep(0.2)
    assert os.path.exists(marker), "annotations checkpoint never appeared"
    os.killpg(proc.pid, signal.SIGKILL)  # hard kill, no cleanup
    proc.wait()

    r2 = _run_cli(["kg", "--pages", cli_pages, "--out", out_b])
    assert r2.returncode == 0, r2.stderr[-500:]
    resumed = json.loads(r2.stdout.strip().splitlines()[-1])
    assert resumed["nodes"] == ref["nodes"]
    assert resumed["edges"] == ref["edges"]

    # byte-level check: sorted edge tables identical across the two out dirs
    import pyarrow.parquet as pq

    def edge_rows(root):
        import glob

        rows = []
        for f in glob.glob(os.path.join(root, "edges", "part=*", "*.parquet")):
            rows.extend(
                (r["subj_id"], r["pred"], r["obj_id"], r["n_occurrences"], r["prov"])
                for r in pq.read_table(f).to_pylist()
            )
        return sorted(rows)

    assert edge_rows(out_a) == edge_rows(out_b)
