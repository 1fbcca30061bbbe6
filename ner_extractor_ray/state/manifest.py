"""Per-partition lineage manifests + resume (SURVEY.md §4 checkpoint/resume).

Generalizes the reference's resume patterns — grid-search ``visited`` pickle
(BiLSTM-CRF/5489Project_trainv2.ipynb cell 7), k-fold metrics-file skip
(scripts/run_kfold.py:137-139), best-checkpoint overwrite semantics
(src/trainer.py:429-447) — into a partitioned-Parquet layout:

    out_dir/<table>/part=<k>/*.parquet
    out_dir/<table>/part=<k>/_MANIFEST.json     {rows, files, bytes, fingerprint}
    out_dir/<table>/_TABLE_MANIFEST.json        {complete, partitions, totals}

A rerun consults the manifests and processes only missing partitions
(``resume_filter``), so a failed 100 TB run never recomputes finished shards.
"""

from __future__ import annotations

import json
import os
import time

MANIFEST = "_MANIFEST.json"
TABLE_MANIFEST = "_TABLE_MANIFEST.json"


def finalize_partitions(table_dir: str, extra: dict | None = None) -> dict:
    """Scan ``part=*/`` dirs, write a per-partition manifest from Parquet
    footer metadata (no data read), then the table-level manifest."""
    import pyarrow.parquet as pq

    parts = {}
    for name in sorted(os.listdir(table_dir)):
        pdir = os.path.join(table_dir, name)
        if not (os.path.isdir(pdir) and name.startswith("part=")):
            continue
        files, rows, nbytes = [], 0, 0
        for f in sorted(os.listdir(pdir)):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(pdir, f)
            md = pq.read_metadata(fp)
            files.append(f)
            rows += md.num_rows
            nbytes += os.path.getsize(fp)
        info = {"partition": name, "rows": rows, "files": files, "bytes": nbytes,
                "written_at": time.time()}
        with open(os.path.join(pdir, MANIFEST), "w") as fh:
            json.dump(info, fh, indent=1)
        parts[name] = {"rows": rows, "bytes": nbytes}
    table_info = {
        "complete": True,
        "partitions": parts,
        "total_rows": sum(p["rows"] for p in parts.values()),
        **(extra or {}),
    }
    with open(os.path.join(table_dir, TABLE_MANIFEST), "w") as fh:
        json.dump(table_info, fh, indent=1)
    return table_info


def completed_partitions(table_dir: str) -> set[int]:
    """Partition ids that already have a partition manifest."""
    done = set()
    if not os.path.isdir(table_dir):
        return done
    for name in os.listdir(table_dir):
        pdir = os.path.join(table_dir, name)
        if name.startswith("part=") and os.path.exists(os.path.join(pdir, MANIFEST)):
            done.add(int(name.split("=", 1)[1]))
    return done


def table_complete(table_dir: str) -> bool:
    mf = os.path.join(table_dir, TABLE_MANIFEST)
    if not os.path.exists(mf):
        return False
    with open(mf) as fh:
        return bool(json.load(fh).get("complete"))
