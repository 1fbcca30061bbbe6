"""BIO tag-stream utilities: repair, span decode, span encode.

Semantics parity with the reference:
  * ``fix_bio``   — orphan ``I-X`` becomes ``B-X`` when the previous tag is not
                    ``B-X``/``I-X`` (BiLSTM-CRF/5489Project_trainv2.ipynb cell 3).
  * ``extract_entities`` — B- starts a span, matching I- extends, anything else
                    flushes (BiLSTM-CRF/5489Project_testv2.ipynb cell 7;
                    seqeval ``get_entities`` as used in src/augmentation.py:154-160).
  * ``build_bio_tags`` — type + length → ``[B-X, I-X, ...]``
                    (src/augmentation.py:143-151).
Spans are half-open word-index intervals ``[start, end)``.
"""

from __future__ import annotations


def fix_bio(tags: list[str]) -> list[str]:
    out = list(tags)
    prev = "O"
    for i, tag in enumerate(out):
        if tag.startswith("I-"):
            ent = tag[2:]
            if prev not in (f"B-{ent}", f"I-{ent}"):
                out[i] = f"B-{ent}"
        prev = out[i]
    return out


def extract_entities(tags: list[str]) -> list[tuple[str, int, int]]:
    """Decode a BIO tag stream into ``(type, start, end)`` spans, half-open."""
    spans: list[tuple[str, int, int]] = []
    cur_type = None
    cur_start = 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if cur_type is not None:
                spans.append((cur_type, cur_start, i))
            cur_type, cur_start = tag[2:], i
        elif tag.startswith("I-") and cur_type == tag[2:]:
            continue
        else:
            if cur_type is not None:
                spans.append((cur_type, cur_start, i))
                cur_type = None
    if cur_type is not None:
        spans.append((cur_type, cur_start, len(tags)))
    return spans


def extract_entities_fixbio(tags) -> list[tuple[str, int, int]]:
    """ONE-pass fusion of ``extract_entities(fix_bio(tags))`` — the hot path
    of the Annotator (two passes + two list copies fused into one loop).

    Equivalence: fix_bio rewrites an orphan ``I-X`` (previous post-fix tag
    not ``B-X``/``I-X``) to ``B-X``; in the fused decode that is exactly the
    ``I-X with cur_type != X`` case, which flushes the open span and starts
    a new X span — and ``cur_type == X`` holds iff the previous post-fix tag
    was ``B-X``/``I-X``. Pinned equal by the property test in
    test_functions.py."""
    spans: list[tuple[str, int, int]] = []
    cur = None
    start = 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if cur is not None:
                spans.append((cur, start, i))
            cur, start = tag[2:], i
        elif tag.startswith("I-"):
            ent = tag[2:]
            if cur != ent:
                if cur is not None:
                    spans.append((cur, start, i))
                cur, start = ent, i
        else:
            if cur is not None:
                spans.append((cur, start, i))
                cur = None
    if cur is not None:
        spans.append((cur, start, len(tags)))
    return spans


def build_bio_tags(ent_type: str, length: int) -> list[str]:
    if length <= 0:
        return []
    return [f"B-{ent_type}"] + [f"I-{ent_type}"] * (length - 1)
