"""WARC source format: Common-Crawl-style archive shards parse into the
exact pages schema and produce identical KG results vs the Parquet path."""

import gzip

import pytest


def test_warc_roundtrip_matches_parquet(tmp_path):
    from ner_extractor_ray.pipelines.kg import pages_dataset
    from ner_extractor_ray.sources.pages import write_pages
    from ner_extractor_ray.sources.warc import pages_dataset_warc, write_pages_warc

    pdir = str(tmp_path / "pq")
    wdir = str(tmp_path / "wc")
    write_pages(pdir, 60, seed=7, n_files=3, write_gold=False)
    write_pages_warc(wdir, 60, seed=7, n_files=3)

    a = pages_dataset(pdir).to_pandas().sort_values("url").reset_index(drop=True)
    b = pages_dataset_warc(wdir).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a["url"].tolist() == b["url"].tolist()
    assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]
    assert a["lang"].tolist() == b["lang"].tolist()
    assert b["text"].isna().all()  # text is extracted downstream, not stored


def test_warc_ts_survives_roundtrip_exact(tmp_path):
    """warc_ts microseconds survive the WARC-Date text encoding exactly —
    the recrawl-dedup stage orders on this column."""
    from ner_extractor_ray.sources.pages import generate_pages
    from ner_extractor_ray.sources.warc import pages_dataset_warc, write_pages_warc

    wdir = str(tmp_path / "wc")
    write_pages_warc(wdir, 40, seed=5, n_files=2)
    got = (
        pages_dataset_warc(wdir, columns=["url", "warc_ts"])
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    exp = generate_pages(40, seed=5)[0].to_pandas()[["url", "warc_ts"]]
    exp = exp.sort_values("url").reset_index(drop=True)
    assert (got["warc_ts"] == exp["warc_ts"]).all()


def test_warc_kg_run_matches_parquet(tmp_path):
    from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg
    from ner_extractor_ray.sources.pages import write_pages
    from ner_extractor_ray.sources.warc import pages_dataset_warc, write_pages_warc

    pdir = str(tmp_path / "pq")
    wdir = str(tmp_path / "wc")
    write_pages(pdir, 80, seed=11, n_files=2, write_gold=False)
    write_pages_warc(wdir, 80, seed=11, n_files=2)

    ea = run_kg(pages_dataset(pdir), out_dir=None, n_partitions=4)["edges"].to_pandas()
    eb = run_kg(pages_dataset_warc(wdir), out_dir=None, n_partitions=4)["edges"].to_pandas()
    key = ["subj_id", "pred", "obj_id"]
    assert (
        ea.sort_values(key).reset_index(drop=True)[key + ["n_occurrences"]]
        .equals(eb.sort_values(key).reset_index(drop=True)[key + ["n_occurrences"]])
    )


def test_warc_parser_edges(tmp_path):
    """Parser unit semantics: warcinfo/request records skipped, plain and gz
    shards both readable, missing language header → null lang, malformed
    head raises (fail fast, no silent truncation)."""
    from ner_extractor_ray.sources.warc import parse_warc_records

    html = b"<html><body><p>Ada Lovelace visited London .</p></body></html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode() + html)
    info = b"software: t\r\n"
    req = b"GET / HTTP/1.1\r\nHost: e\r\n\r\n"
    blob = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(info)}\r\n\r\n".encode() + info + b"\r\n\r\n"
        + b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://e/x\r\n"
        + f"Content-Length: {len(req)}\r\n\r\n".encode() + req + b"\r\n\r\n"
        + b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://e/x\r\n"
        + b"WARC-Date: 2020-06-01T12:00:00.000123Z\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode() + http + b"\r\n\r\n"
    )
    for raw in (blob, gzip.compress(blob)):
        recs = list(parse_warc_records(raw))
        assert len(recs) == 1  # warcinfo + request skipped
        assert recs[0]["url"] == "https://e/x"
        assert recs[0]["html"] == html
        assert recs[0]["lang"] is None  # no language header on this record
        assert recs[0]["warc_ts_us"] % 1_000_000 == 123  # µs survive

    with pytest.raises(ValueError, match="not a WARC record head"):
        list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
