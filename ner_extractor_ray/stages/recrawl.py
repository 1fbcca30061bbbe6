"""Recrawl dedup — keep each url's LATEST capture (Common-Crawl re-fetch
semantics; the first consumer of the input_hint's ``warc_ts`` column).

Winner per url = max ``warc_ts``, ties broken by max blake2-64(text); any
byte-identical residual duplicates (same url, same ts, same text) collapse
to one row. Scale shape:

  * pass 1 builds a NARROW winner table — per-batch partials reduce each
    batch to one (url, ts_us, h63) row per url (16+8+8 B), then two bucketed
    Max aggregates resolve the (ts, then h) lexicographic max without ever
    packing the pair into one word;
  * the pages stream is then FILTERED row-locally against the winner table —
    broadcast as a dict below ``broadcast_limit`` urls, partitioned hash
    semi-join above it. The corpus itself is NOT reshuffled;
  * residual identical duplicates are detected by count (kept > n_urls —
    pathological inputs only) and collapsed with one coarse-bucketed
    groupby(url) head(1), which is deterministic because the surviving rows
    are byte-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max

from ..functions.hashing import stable_hash64

_MASK63 = (1 << 63) - 1


def _ts_h(t: pa.Table) -> tuple[np.ndarray, list[int]]:
    ts = pc.cast(t.column("warc_ts"), pa.int64()).to_numpy(zero_copy_only=False)
    h = [stable_hash64(s or "") & _MASK63 for s in t.column("text").to_pylist()]
    return ts, h


def latest_crawl_filter(
    pages: "ray.data.Dataset",
    *,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """pages (url, warc_ts, html, text, lang, ...) → same schema, one row per
    url: the latest capture. See module docstring for the plan."""
    from .canonicalize import _compact_blocks, grouped_aggregate
    from .joins import hash_join

    def partial(t: pa.Table) -> pa.Table:
        ts, h = _ts_h(t)
        df = pd.DataFrame({"url": t.column("url").to_pylist(),
                           "ts": ts, "h": pd.Series(h, dtype="int64")})
        best = df.sort_values(["url", "ts", "h"]).groupby(
            "url", as_index=False).tail(1)
        return pa.Table.from_pandas(best, preserve_index=False)

    narrow = pages.select_columns(["url", "warc_ts", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    w_ts = grouped_aggregate(narrow, ["url"], Max("ts", alias_name="max_ts"))
    # lexicographic (ts, h) max: restrict partials to ts winners, then max h.
    # winner table is url-cardinality — join partials against it partitioned.
    p2 = hash_join(narrow, w_ts, on=("url",)).map_batches(
        lambda t: t.filter(pc.equal(t.column("ts"), t.column("max_ts")))
        if t.num_rows else t,
        batch_format="pyarrow",
    )
    winners = grouped_aggregate(
        p2, ["url"], Max("ts", alias_name="w_ts"), Max("h", alias_name="w_h")
    ).materialize()  # consumed by the count probe AND the filter below
    n_urls = winners.count()

    if n_urls <= broadcast_limit:
        wmap: dict[str, tuple[int, int]] = {}
        for b in winners.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for u, ts, h in zip(b.column("url").to_pylist(),
                                b.column("w_ts").to_pylist(),
                                b.column("w_h").to_pylist()):
                wmap[u] = (ts, h)
        wref = ray.put(wmap)

        class _Keep:
            def __init__(self, ref):
                self.m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

            def __call__(self, t: pa.Table) -> pa.Table:
                ts, h = _ts_h(t)
                m = self.m
                mask = [
                    m.get(u) == (int(ts[i]), h[i])
                    for i, u in enumerate(t.column("url").to_pylist())
                ]
                return t.filter(pa.array(mask, pa.bool_()))

        kept = pages.map_batches(_Keep(wref), batch_format="pyarrow")
    else:  # url table too big to broadcast: partitioned semi-join
        def add_th(t: pa.Table) -> pa.Table:
            # NOT "__"-prefixed: hash_join drops "__" columns by convention
            ts, h = _ts_h(t)
            return (t.append_column("cap_ts", pa.array(ts, pa.int64()))
                     .append_column("cap_h", pa.array(h, pa.int64())))

        _DROP = ["cap_ts", "cap_h", "w_ts", "w_h"]
        j = hash_join(pages.map_batches(add_th, batch_format="pyarrow"),
                      winners, on=("url",))
        kept = j.map_batches(
            lambda t: t.filter(
                pc.and_(pc.equal(t.column("cap_ts"), t.column("w_ts")),
                        pc.equal(t.column("cap_h"), t.column("w_h")))
            ).drop_columns(_DROP)
            if t.num_rows else t.drop_columns([c for c in _DROP if c in t.column_names]),
            batch_format="pyarrow",
        )

    # residual byte-identical duplicates (same url, ts, text): collapse.
    # count probe costs one extra pass of the cheap row-local filter; the
    # collapse shuffle only ever runs on pathological inputs.
    if kept.count() > n_urls:
        P = _compact_blocks()

        def add_part(t: pa.Table) -> pa.Table:
            from ..functions.hashing import crc_bucket

            part = crc_bucket(t.column("url").to_pylist(), P)
            return t.append_column("__part", pa.array(part, pa.int64()))

        def first_per_url(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("url", as_index=False, sort=False).head(1)
            return out.drop(columns=["__part"])

        kept = (
            kept.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(first_per_url, batch_format="pandas")
        )
    return kept
