"""Recrawl dedup (stages/recrawl.py): latest warc_ts wins per url; ties go
to max text hash; byte-identical duplicates collapse to one row."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ner_extractor_ray.functions.hashing import stable_hash64
from ner_extractor_ray.stages.recrawl import latest_crawl_filter

_TS0 = 1_700_000_000_000_000  # epoch µs


def _pages_table() -> pa.Table:
    rows = [
        # url A: three captures — latest ts must win
        ("http://a.example/x", _TS0 + 1, "old text version one"),
        ("http://a.example/x", _TS0 + 2, "middle text version two"),
        ("http://a.example/x", _TS0 + 3, "newest text version three"),
        # url B: ts tie — max blake2-64(text) wins deterministically
        ("http://b.example/y", _TS0 + 5, "tie candidate alpha"),
        ("http://b.example/y", _TS0 + 5, "tie candidate beta"),
        # url C: byte-identical duplicate captures — collapse to ONE row
        ("http://c.example/z", _TS0 + 7, "identical capture"),
        ("http://c.example/z", _TS0 + 7, "identical capture"),
        # url D: single capture passes through
        ("http://d.example/w", _TS0 + 9, "lone capture"),
    ]
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2].encode() for r in rows], pa.binary()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })


def _expected_b_winner() -> str:
    m = (1 << 63) - 1
    a, b = "tie candidate alpha", "tie candidate beta"
    return a if (stable_hash64(a) & m) > (stable_hash64(b) & m) else b


def _check(kept_rows):
    by_url = {}
    for r in kept_rows:
        by_url.setdefault(r["url"], []).append(r["text"])
    assert {u: len(v) for u, v in by_url.items()} == {
        "http://a.example/x": 1, "http://b.example/y": 1,
        "http://c.example/z": 1, "http://d.example/w": 1,
    }
    assert by_url["http://a.example/x"] == ["newest text version three"]
    assert by_url["http://b.example/y"] == [_expected_b_winner()]
    assert by_url["http://c.example/z"] == ["identical capture"]


def test_latest_crawl_filter_broadcast_and_join_paths(tmp_path):
    src = tmp_path / "pages.parquet"
    pq.write_table(_pages_table(), str(src))
    pages = ray.data.read_parquet(str(src))
    _check(latest_crawl_filter(pages).take_all())
    # broadcast_limit=0 forces the partitioned semi-join path — same result
    _check(latest_crawl_filter(
        ray.data.read_parquet(str(src)), broadcast_limit=0).take_all())


def test_run_kg_dedup_recrawls_guard_and_run(tmp_path):
    import shutil

    from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg
    from ner_extractor_ray.sources.pages import write_pages

    d = str(tmp_path / "pages")
    write_pages(d, 60, seed=7, n_files=2)
    # pruned dataset → clear error
    try:
        run_kg(pages_dataset(d), dedup_recrawls=True)
        raise AssertionError("expected ValueError for missing warc_ts")
    except ValueError as e:
        assert "warc_ts" in str(e)
    # unique-url corpus: recrawl dedup is an identity — counts match baseline
    out1 = str(tmp_path / "kg1")
    base = run_kg(pages_dataset(d), out_dir=out1, n_partitions=4)
    n_base = base["edges"].count()
    out2 = str(tmp_path / "kg2")
    shutil.rmtree(out2, ignore_errors=True)
    res = run_kg(pages_dataset(d, with_ts=True), out_dir=out2,
                 n_partitions=4, dedup_recrawls=True)
    assert res["edges"].count() == n_base
