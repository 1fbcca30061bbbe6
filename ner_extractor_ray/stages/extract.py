"""S1 — deterministic HTML→text extraction (map_batches, stateless task).

Reference analog: the file→records parse boundary
(DistilBERT-CRF/src/datasets.py:47-72). Contract (SURVEY.md §7.3): a pure
per-row function of ``html`` only; byte-identical per ``url`` vs the oracle.
Rows that arrive with ``text`` already present are passed through unchanged
(and can be asserted equal to the re-extraction — FIXTURES.md §1).

The fat ``html`` binary column is dropped here so no downstream shuffle ever
carries it (SURVEY.md §7.3 "very wide rows").
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textfns import extract_text


def extract_batch(batch: pa.Table, *, verify: bool = False) -> pa.Table:
    htmls = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist() if "text" in batch.column_names else [None] * len(htmls)
    out = []
    for h, t in zip(htmls, texts):
        if t:  # pre-extracted row: pass through (optionally verify)
            if verify:
                ext = extract_text(h)
                if ext != t:
                    raise ValueError("extraction mismatch for pre-extracted row")
            out.append(t)
        else:
            out.append(extract_text(h))
    keep = [c for c in batch.column_names if c not in ("html", "text")]
    result = batch.select(keep).append_column("text", pa.array(out, pa.string()))
    return result
