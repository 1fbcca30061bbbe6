"""Text-analysis operators over document tables (map_batches stages).

Language-ID (stopword-profile heuristic), quality scoring (length / punct /
stopword ratios — the web-scale generalization of the reference's corpus
statistics, SURVEY.md A3/A4), token counting, and winnowing fingerprints.
All pure per-row functions, vectorized at the batch level.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.textfns import lang_id, quality_features, rolling_fingerprint

_ALNUM = re.compile(r"[a-z0-9]+")


def token_stats_batch(t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Integer token/char statistics (kept integral so the DuckDB oracle can
    reproduce them bit-exactly: len(regexp_extract_all(lower(text), ...)))."""
    texts = t.column(text_col).to_pylist()
    n_tok = [len(_ALNUM.findall((s or "").lower())) for s in texts]
    return pa.table(
        {
            id_col: t.column(id_col),
            "text_len": pa.array([len(s or "") for s in texts], pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
        }
    )


def langid_batch(t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    texts = t.column(text_col).to_pylist()
    return pa.table(
        {
            id_col: t.column(id_col),
            "detected_lang": pa.array([lang_id(s or "") for s in texts], pa.string()),
        }
    )


def quality_batch(
    t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id",
    min_tokens: int = 20, max_punct_ratio: float = 0.5,
    min_stopword_ratio: float = 0.01,
) -> pa.Table:
    """Quality features + keep flag (C4/Gopher-style rule filter)."""
    texts = t.column(text_col).to_pylist()
    feats = [quality_features(s or "") for s in texts]
    keep = [
        f["n_tokens"] >= min_tokens
        and f["punct_ratio"] <= max_punct_ratio
        and f["stopword_ratio"] >= min_stopword_ratio
        for f in feats
    ]
    return pa.table(
        {
            id_col: t.column(id_col),
            "n_tokens": pa.array([f["n_tokens"] for f in feats], pa.int64()),
            "mean_token_len": pa.array([f["mean_token_len"] for f in feats], pa.float64()),
            "punct_ratio": pa.array([f["punct_ratio"] for f in feats], pa.float64()),
            "stopword_ratio": pa.array([f["stopword_ratio"] for f in feats], pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def fingerprint_batch(t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    texts = t.column(text_col).to_pylist()
    fps = [rolling_fingerprint(s or "") & 0x7FFFFFFFFFFFFFFF for s in texts]
    return pa.table(
        {id_col: t.column(id_col), "fingerprint": pa.array(fps, pa.int64())}
    )
