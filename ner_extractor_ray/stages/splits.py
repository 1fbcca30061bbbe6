"""Deterministic dataset splitting — the reference's split semantics without
RNG call order (SURVEY.md O2/O3, §2.9).

  * ``stratified_split`` — the reference stratifies 80/20 on the sentence's
    primary entity label with a seeded RNG (src/datasets.py:90-115). Here the
    assignment is a pure function of the row key: per stratum, a row goes to
    "test" iff ``stable_hash64(key) % 10_000 < frac*10_000`` — proportions
    hold per stratum, identical at any parallelism.
  * ``kfold_assign`` — GroupKFold grouped by document (scripts/
    generate_kfold_splits.py:138-149): fold = ``stable_hash64(doc_key) % k``,
    so all sentences of a document land in one fold (the partition-identity
    rule the whole resume layout shares, SURVEY.md §7.1).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.hashing import stable_hash64


def stratified_split(
    ds: "ray.data.Dataset",
    key_col: str,
    stratum_col: str,
    *,
    test_frac: float = 0.2,
    out_col: str = "split",
) -> "ray.data.Dataset":
    threshold = int(test_frac * 10_000)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        strata = t.column(stratum_col).to_pylist()
        split = [
            "test" if stable_hash64(f"split:{s}:{k}") % 10_000 < threshold else "train"
            for k, s in zip(keys, strata)
        ]
        return t.append_column(out_col, pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def kfold_assign(
    ds: "ray.data.Dataset", doc_col: str, *, k: int = 5, out_col: str = "fold"
) -> "ray.data.Dataset":
    def assign(t: pa.Table) -> pa.Table:
        docs = t.column(doc_col).to_pylist()
        folds = [stable_hash64(f"fold:{d}") % k for d in docs]
        return t.append_column(out_col, pa.array(folds, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")
