"""S9 — per-run results CSV appender / reader / summarizer.

Reference parity: the k-fold orchestrator appends one row per finished fold
to a results CSV, writing the header only on first touch
(DistilBERT-CRF/scripts/run_kfold.py:83-111), skips folds already present
(:137-139), and the summarizer re-reads rows filtered by run-name prefix and
aggregates mean/std (scripts/summarize_kfold.py:42-70). Driver-side state —
a few rows per grid point — so plain files, not a Dataset.
"""

from __future__ import annotations

import csv
import math
import os

FIELDNAMES = ["run_name", "fold_index", "metric", "value"]


def append_result(csv_path: str, row: dict, fieldnames: list[str] | None = None) -> None:
    """Append one result row; write the header only when creating the file."""
    fieldnames = fieldnames or FIELDNAMES
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    exists = os.path.exists(csv_path)
    with open(csv_path, "a", newline="", encoding="utf-8") as fh:
        w = csv.DictWriter(fh, fieldnames=fieldnames)
        if not exists:
            w.writeheader()
        w.writerow({k: row.get(k) for k in fieldnames})


def load_results(csv_path: str, run_prefix: str | None = None) -> list[dict]:
    """Rows back, optionally filtered by run-name prefix."""
    if not os.path.exists(csv_path):
        return []
    with open(csv_path, newline="", encoding="utf-8") as fh:
        rows = list(csv.DictReader(fh))
    if run_prefix:
        rows = [r for r in rows if (r.get("run_name") or "").startswith(run_prefix)]
    return rows


def completed_folds(csv_path: str, run_name: str) -> set[int]:
    """Folds already recorded for a run — the skip-completed resume set
    (run_kfold.py:137-139 pattern)."""
    return {
        int(r["fold_index"])
        for r in load_results(csv_path)
        if r.get("run_name") == run_name and r.get("fold_index") not in (None, "")
    }


def aggregate(rows: list[dict], value_col: str = "value") -> dict:
    """mean/std/count over a result column (summarize_kfold.py aggregate)."""
    vals = [float(r[value_col]) for r in rows if r.get(value_col) not in (None, "")]
    if not vals:
        return {"count": 0, "mean": None, "std": None}
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    return {"count": len(vals), "mean": mean, "std": math.sqrt(var)}
