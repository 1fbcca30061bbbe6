"""PII detection and redaction over Arrow string columns.

The standard pre-training curation stage the reference has no analog for
(its CoNLL corpus is already anonymized): find emails / NANP-style phone
numbers / IPv4 addresses and replace them with typed placeholders before any
text ships to a training corpus (the BigScience ROOTS / Dolma pipeline
position: PII scrubbing runs after dedup, before tokenization).

Everything here is a pure VECTORIZED function of a ``pa.ChunkedArray`` of
strings: ``pyarrow.compute.replace_substring_regex`` /
``count_substring_regex`` run Google RE2 over the whole column with zero
Python-per-row cost, so a redaction stage is a row-local ``map_batches`` with
NO shuffle and NO state — the property that makes it free at 100 TB (it
pipelines inside whatever pass already reads the text). DuckDB's regexp
functions are the same RE2 engine, so the SQL oracle replicates the kernel
exactly (tested in tests/test_queries_oracle.py via the ``pii_redact`` /
``pii_stats`` entries).

Pattern notes (RE2-safe, shared verbatim with the SQL oracle):
- EMAIL has no word-boundary anchor: RE2 ``\\b`` before ``[A-Za-z0-9._%+-]``
  would split mid-token on ``%``/``+`` prefixes; the greedy local-part is the
  conventional conservative form.
- PHONE matches the NNN-NNN-NNNN shape only — detection beyond one locale's
  format is a model problem, not a regex problem, and false positives on
  numeric data are worse than misses in a curation pipeline.
- Redaction order is EMAIL → PHONE → IPV4 on the running string; counts are
  taken per type on the ORIGINAL string, so the per-type tallies are
  independent of redaction order. A dotted-quad mail domain
  (``user@10.0.0.1``) is NOT an email match (the TLD must be alphabetic);
  its quad still redacts as ``[IP]``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (type tag, pattern, placeholder) — redaction applies in this order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ipv4", IPV4_RE, "[IP]"),
)


def pii_counts(col: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Per-row occurrence counts of each PII type on the original text.

    Returns {"n_email": int64 array, "n_phone": ..., "n_ipv4": ...} aligned
    with ``col``. One RE2 pass per pattern, fully vectorized.
    """
    out: dict[str, pa.Array] = {}
    for tag, pat, _ in PII_PATTERNS:
        out[f"n_{tag}"] = pc.cast(
            pc.count_substring_regex(col, pat), pa.int64()
        )
    return out


def redact(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Replace every PII match with its typed placeholder (EMAIL → PHONE →
    IPV4, global replacement per pattern)."""
    for _, pat, placeholder in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pat, placeholder)
    return col
