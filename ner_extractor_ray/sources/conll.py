"""CoNLL-2003-format source/sink (reference parity: S1/S2/S3, M1/M2).

Parses the reference's exact on-disk format — 4 whitespace-separated columns
``token pos chunk ner`` per line, blank-line sentence delimiter, ``-DOCSTART-``
document markers (DistilBERT-CRF/src/datasets.py:21-35, 47-72) — into an Arrow
sentences table, and serializes back (src/datasets.py:75-87). Malformed lines
raise, mirroring the reference's fail-fast validation (src/datasets.py:28-29).

Ray-Data-first: files are read with ``read_binary_files`` and exploded to
sentence rows inside ``map_batches`` (one file → many rows), carrying
``doc_id`` per sentence the way scripts/generate_kfold_splits.py:66-91 derives
it from the markers.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

DOCSTART = "-DOCSTART-"


def parse_conll(text: str, *, source: str = "") -> list[dict]:
    """CoNLL text → list of sentence records
    (doc_id, sent_id, tokens, pos_tags, chunk_tags, ner_tags)."""
    sentences: list[dict] = []
    cur: list[list[str]] = []
    doc_idx = -1
    sent_idx = 0

    def flush():
        nonlocal cur, sent_idx
        if cur:
            sentences.append(
                {
                    "doc_id": f"{source}#{max(doc_idx, 0)}",
                    "sent_id": sent_idx,
                    "tokens": [c[0] for c in cur],
                    "pos_tags": [c[1] for c in cur],
                    "chunk_tags": [c[2] for c in cur],
                    "ner_tags": [c[3] for c in cur],
                }
            )
            sent_idx += 1
            cur = []

    for lineno, line in enumerate(text.splitlines(), 1):
        stripped = line.strip()
        if not stripped:
            flush()
            continue
        cols = stripped.split()
        if cols[0] == DOCSTART:
            flush()
            doc_idx += 1
            sent_idx = 0
            continue
        if len(cols) != 4:
            raise ValueError(
                f"malformed CoNLL line {lineno}: expected 4 columns, got {len(cols)}: {stripped!r}"
            )
        cur.append(cols)
    flush()
    return sentences


def sentences_to_conll(rows: list[dict]) -> str:
    """Inverse of parse_conll for one document's sentences (M2 semantics)."""
    out = []
    for r in rows:
        for tok, pos, chk, ner in zip(
            r["tokens"], r["pos_tags"], r["chunk_tags"], r["ner_tags"]
        ):
            out.append(f"{tok} {pos} {chk} {ner}")
        out.append("")
    return "\n".join(out)


_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sent_id", pa.int32()),
        ("tokens", pa.list_(pa.string())),
        ("pos_tags", pa.list_(pa.string())),
        ("chunk_tags", pa.list_(pa.string())),
        ("ner_tags", pa.list_(pa.string())),
    ]
)


def read_conll(paths) -> "ray.data.Dataset":
    """CoNLL files → sentences Dataset (flat-map-shaped explode per file)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def explode(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, data in zip(t.column("path").to_pylist(), t.column("bytes").to_pylist()):
            rows.extend(parse_conll(data.decode("utf-8"), source=path))
        if not rows:
            return _SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_SCHEMA)

    return files.map_batches(explode, batch_format="pyarrow")


def write_conll(ds: "ray.data.Dataset", out_dir: str, *, n_files: int = 8) -> int:
    """Sentences Dataset → CoNLL files (the S2/S9 WRITE side, Dataset-native).

    Partition-aligned sink: sentences are bucketed by ``crc(doc_id) %
    n_files`` (a document never straddles files — the GroupKFold-by-doc
    invariant, SURVEY.md O3), each write task sorts its bucket by (doc_id,
    sent_id), emits ``-DOCSTART-`` markers between documents and writes
    ``part-<k>.conll`` atomically (tmp + rename; task retries idempotent).
    Inverse of ``read_conll`` (reference serializer: src/datasets.py:75-87).
    Returns the number of sentences written.
    """
    import os

    from ..functions.hashing import crc_bucket

    os.makedirs(out_dir, exist_ok=True)

    def add_part(t: pa.Table) -> pa.Table:
        part = crc_bucket(t.column("doc_id").to_pylist(), n_files)
        return t.append_column("part", pa.array(part, pa.int32()))

    def write_group(t: pa.Table) -> pa.Table:
        empty = pa.table({"part": pa.array([], pa.int32()),
                          "n_sentences": pa.array([], pa.int64())})
        if t.num_rows == 0 or "part" not in t.column_names:
            return empty
        part = int(t.column("part")[0].as_py())
        t = t.sort_by([("doc_id", "ascending"), ("sent_id", "ascending")])
        lines: list[str] = []
        prev_doc = None
        for r in t.to_pylist():
            if r["doc_id"] != prev_doc:
                lines.append(f"{DOCSTART} -X- -X- O")
                lines.append("")
                prev_doc = r["doc_id"]
            for tok, pos, chk, ner in zip(
                r["tokens"], r["pos_tags"], r["chunk_tags"], r["ner_tags"]
            ):
                lines.append(f"{tok} {pos} {chk} {ner}")
            lines.append("")
        fname = f"part-{part:05d}.conll"
        tmp = os.path.join(out_dir, f".{fname}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(tmp, os.path.join(out_dir, fname))
        return pa.table({"part": pa.array([part], pa.int32()),
                         "n_sentences": pa.array([t.num_rows], pa.int64())})

    written = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_group, batch_format="pyarrow")
        .sum("n_sentences")
    )
    return int(written or 0)


def primary_label(ner_tags: list[str]) -> str:
    """First non-O tag's entity type, else "O" — the stratification key
    (src/datasets.py:40-44)."""
    for t in ner_tags:
        if t != "O" and "-" in t:
            return t.split("-", 1)[1]
    return "O"
