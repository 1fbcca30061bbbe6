"""WARC source — ingest Common-Crawl-style web archives into the pages table.

The engine's input contract is the Parquet pages schema
(url, warc_ts, html, text, lang); real crawl data arrives as WARC files
(ISO 28500: self-delimiting records of WARC headers + Content-Length payload,
usually gzipped). This module gives the third source format next to Parquet
and JSONL: a pure-stdlib WARC/1.0 parser mapped over binary file shards, so
``run_kg`` and every downstream stage work unchanged on crawl archives.

Scale contract: ``ray.data.read_binary_files`` makes one task per WARC shard
— the natural unit, since a WARC file is a sequential stream (records are
found by Content-Length hops, not by seekable offsets) and crawl shards are
sized for exactly this (~1 GB gz). Parallelism = number of shards; parsing is
streaming within a shard and nothing is retained beyond the emitted rows.
``text`` is left null — extraction from the archived HTML happens in the same
S1 stage as every other source, which is what keeps the byte-identical-text
invariant source-agnostic.

Language: rows carry the crawler-identified language when the record has a
``WARC-Identified-Content-Language`` header (Common Crawl emits this since
2018); absent the header the row gets lang=None and the language-ID stage
(stages/textops.langid) decides downstream.
"""

from __future__ import annotations

import calendar
import gzip
from collections.abc import Iterator
from datetime import datetime, timezone

import pyarrow as pa

_GZIP_MAGIC = b"\x1f\x8b"


def _warc_date(us_epoch: int) -> str:
    dt = datetime.fromtimestamp(us_epoch / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    """ISO-8601 WARC-Date → epoch microseconds, exact integer arithmetic
    (fractional seconds optional, per WARC 1.1; WARC 1.0 writers emit whole
    seconds)."""
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt)
    return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond


def parse_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield one dict per WARC *response* record in ``blob``.

    Records are delimited by their own Content-Length (the only correct way —
    payloads may contain blank lines); non-response records (warcinfo,
    request, metadata) are skipped. The HTTP envelope inside a response
    payload is stripped: the html is everything after the first CRLFCRLF.
    Raises ValueError on a malformed record head — fail fast, no silent
    truncation of a corrupt shard.
    """
    if blob[:2] == _GZIP_MAGIC:
        blob = gzip.decompress(blob)
    pos, n = 0, len(blob)
    while pos < n:
        # tolerate inter-record CRLF padding
        while blob[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end_hdr = blob.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            raise ValueError("truncated WARC record header")
        head = blob[pos:end_hdr].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record head: {lines[0][:40]!r}")
        hdrs = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        payload = blob[end_hdr + 4:end_hdr + 4 + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        pos = end_hdr + 4 + clen
        if hdrs.get("warc-type") != "response":
            continue
        http_end = payload.find(b"\r\n\r\n")
        html = payload[http_end + 4:] if http_end >= 0 else payload
        yield {
            "url": hdrs.get("warc-target-uri"),
            "warc_ts_us": _parse_warc_date(hdrs["warc-date"]) if "warc-date" in hdrs else None,
            "html": html,
            "lang": hdrs.get("warc-identified-content-language"),
        }


def pages_dataset_warc(path: str, columns: list[str] | None = None):
    """Read WARC shards (plain or .gz) into the pages schema.

    One read task per shard (see module docstring); the parse is a
    ``map_batches`` over the binary rows, emitting (url, warc_ts, html,
    text=None, lang) — downstream stages are source-agnostic from here.
    """
    import glob
    import os

    import ray.data

    cols = columns or ["url", "html", "text", "lang"]
    files = (sorted(glob.glob(os.path.join(path, "pages-*.warc"))
                    + glob.glob(os.path.join(path, "pages-*.warc.gz"))) or path)
    ds = ray.data.read_binary_files(files)

    def parse(t: pa.Table) -> pa.Table:
        rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        for blob in t.column("bytes").to_pylist():
            for rec in parse_warc_records(blob):
                rows["url"].append(rec["url"])
                rows["warc_ts"].append(rec["warc_ts_us"])
                rows["html"].append(rec["html"])
                rows["text"].append(None)
                rows["lang"].append(rec["lang"])
        out = {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
        return pa.table({c: out[c] for c in cols})

    return ds.map_batches(parse, batch_format="pyarrow")


def write_pages_warc(
    out_dir: str, n_pages: int, seed: int = 42, n_files: int = 4,
    compress: bool = True,
) -> str:
    """Serialize the deterministic synthetic corpus as WARC/1.0 shards — the
    same pages as sources/pages.write_pages, in crawl-archive wire format
    (a warcinfo record, then one response record per page with the html as
    an HTTP/1.1 envelope payload). Exercises the reader against realistic
    structure: multi-record files, non-response records, gz compression."""
    import os

    from .pages import generate_pages

    os.makedirs(out_dir, exist_ok=True)
    per = (n_pages + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * per
        cnt = max(0, min(per, n_pages - lo))
        if cnt == 0:
            break
        tbl, _ = generate_pages(cnt, seed=seed, start_index=lo)
        parts: list[bytes] = []
        info = b"software: ner-extractor-ray synthetic crawler\r\n"
        parts.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            + f"Content-Length: {len(info)}\r\n\r\n".encode()
            + info + b"\r\n\r\n"
        )
        for row in tbl.to_pylist():
            html = row["html"]
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + f"Content-Length: {len(html)}\r\n\r\n".encode()
                + html
            )
            ts = row["warc_ts"]
            ts_us = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
            parts.append(
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {row['url']}\r\n".encode()
                + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode()
                + f"WARC-Identified-Content-Language: {row['lang']}\r\n".encode()
                + b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n\r\n".encode()
                + http + b"\r\n\r\n"
            )
        blob = b"".join(parts)
        name = f"pages-{f:04d}.warc.gz" if compress else f"pages-{f:04d}.warc"
        fpath = os.path.join(out_dir, name)
        with open(fpath, "wb") as fh:
            fh.write(gzip.compress(blob, mtime=0) if compress else blob)
    return out_dir
