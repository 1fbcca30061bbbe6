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


def write_partition_manifest(pdir: str, files: list[str], rows: int, nbytes: int) -> None:
    """Write one partition's manifest ATOMICALLY (tmp + rename), called from
    the write task as soon as the partition's file lands — so a mid-write
    kill leaves every finished partition resumable, not just finished
    tables."""
    info = {
        "partition": os.path.basename(pdir),
        "rows": int(rows),
        "files": files,
        "bytes": int(nbytes),
        "written_at": time.time(),
    }
    tmp = os.path.join(pdir, f".{MANIFEST}.tmp")
    with open(tmp, "w") as fh:
        json.dump(info, fh, indent=1)
    os.replace(tmp, os.path.join(pdir, MANIFEST))


def finalize_table(table_dir: str, extra: dict | None = None) -> dict:
    """Assemble the table-level manifest from the per-partition manifests the
    write tasks already emitted (no data or footer re-reads)."""
    parts = {}
    for name in sorted(os.listdir(table_dir)):
        pdir = os.path.join(table_dir, name)
        mf = os.path.join(pdir, MANIFEST)
        if not (name.startswith("part=") and os.path.isdir(pdir) and os.path.exists(mf)):
            continue
        with open(mf) as fh:
            info = json.load(fh)
        parts[name] = {"rows": info["rows"], "bytes": info["bytes"]}
    table_info = {
        "complete": True,
        "partitions": parts,
        "total_rows": sum(p["rows"] for p in parts.values()),
        **(extra or {}),
    }
    tmp = os.path.join(table_dir, f".{TABLE_MANIFEST}.tmp")
    with open(tmp, "w") as fh:
        json.dump(table_info, fh, indent=1)
    os.replace(tmp, os.path.join(table_dir, TABLE_MANIFEST))
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
