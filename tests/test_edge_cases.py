"""FIXTURES.md §4 empty/edge fixtures: empty html, pre-extracted text-only
rows, over-length sentences (truncation), non-English rows — no silent
crashes, documented behaviors."""

import pyarrow as pa
import ray.data

from ner_extractor_ray.pipelines.kg import run_kg, tag_sentences

_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _pages():
    long_sent = " ".join(["word"] * 300) + " ."
    rows = [
        # empty html AND empty text → zero sentences, no crash
        {"url": "https://e/empty", "html": b"", "text": "", "lang": "en"},
        # text-only row (arrives pre-extracted; html empty)
        {"url": "https://e/textonly", "html": b"",
         "text": "Bill Gates founded Microsoft .", "lang": "en"},
        # over-length sentence → truncated to max_tokens
        {"url": "https://e/long", "html": b"", "text": long_sent, "lang": "en"},
        # non-English row → filtered by the lang gate
        {"url": "https://e/de", "html": b"",
         "text": "der Bericht ist von der Kommission .", "lang": "de"},
        # html-only row → extracted
        {"url": "https://e/html",
         "html": b"<html><body><p>Ada Lovelace visited London .</p></body></html>",
         "text": None, "lang": "en"},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=_SCHEMA))


def test_tag_sentences_edge_rows():
    rows = tag_sentences(_pages()).take_all()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    assert "https://e/empty" not in by_url          # zero sentences
    assert "https://e/de" not in by_url             # filtered
    assert len(by_url["https://e/textonly"]) == 1   # pre-extracted passes through
    assert by_url["https://e/long"][0]["n_tokens"] == 192  # truncation
    assert by_url["https://e/html"][0]["tokens"][:2] == ["Ada", "Lovelace"]


def test_run_kg_on_edge_pages(tmp_path):
    res = run_kg(_pages(), out_dir=str(tmp_path / "kg"), n_partitions=2)
    edges = res["edges"].take_all()
    # relations present: (Bill Gates, founded, Microsoft), (Ada Lovelace, visited, London)
    assert sorted(e["pred"] for e in edges) == ["founded", "visited"]
    nodes = res["nodes"].take_all()
    types = {n["type"] for n in nodes}
    assert {"PER", "ORG", "LOC"} <= types
