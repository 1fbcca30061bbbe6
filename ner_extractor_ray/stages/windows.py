"""Event-time window operators (SURVEY.md §2.9 streaming-shaped ops at rest).

Tumbling windows are a plain grouped aggregate over ``floor(epoch/size)``
(pipelines/queries.q_events_hourly). This module adds the two shapes that need
row replication, with the replication bounded by a constant so the shuffle
volume stays O(input), never O(matches):

  * hopping (sliding) windows — explode each row into ``size/hop`` window
    ids, then aggregate as usual. Callers should pre-aggregate per batch
    AFTER the explode so the shuffle carries k× the partial aggregates, not
    k× the corpus.
  * banded interval join — all (left, right) pairs with the same key whose
    timestamps satisfy ``0 <= left.ts - right.ts <= window_s``. Each RIGHT
    row is replicated to time bands {b, b+1} (band = floor(epoch/window));
    a left row in band bl can only match right rows banded at bl, so every
    qualifying pair co-locates in exactly one (key, band) cell and is
    emitted exactly once. Shuffle volume = |left| + 2|right| projected rows,
    independent of how many pairs match.

Partitioning assumption (per the brief's custom-operator contract): one
(key, band) cell must fit in a task's heap — keys are user/session-grained
and bands are window-sized, so a cell is one user's activity in one window.
Salt a pathological key upstream if that breaks.

The reference has no temporal operators (its only time logic is checkpoint
mtimes); these are the web-scale streaming-window additions the engine needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def explode_hopping_windows(
    ds: "ray.data.Dataset",
    ts_col: str,
    *,
    size_s: int,
    hop_s: int,
    out: str = "window_id",
) -> "ray.data.Dataset":
    """Replicate each row into every hopping window containing its timestamp.

    ``window_id = start_epoch // hop_s``; a row at time t belongs to the k =
    size_s/hop_s consecutive windows ending at floor(t/hop_s). size_s must be
    a multiple of hop_s."""
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def fn(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64()).to_numpy()
        h = us // (hop_s * 1_000_000)
        parts = [
            t.append_column(out, pa.array(h - j, pa.int64())) for j in range(k)
        ]
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    ts_col: str,
    right_ts_col: str | None = None,
    window_s: int,
    num_partitions: int | None = None,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """All pairs with equal integer key ``on`` and 0 <= l.ts - r.ts <= window_s.

    Differs from stages/asof.asof_join (which keeps only the LATEST right row
    per left row): this keeps EVERY right row inside the window."""
    from .canonicalize import _compact_blocks

    P = num_partitions or _compact_blocks()
    right_ts = right_ts_col or ts_col
    win_us = window_s * 1_000_000

    from .joins import _schema_autocache

    left, lsch = _schema_autocache(left)
    right, rsch = _schema_autocache(right)
    if lsch is None or rsch is None:
        # a fully-filtered Dataset can lose its schema; callers must provide
        # one (e.g. build the empty side with from_arrow(schema.empty_table()))
        raise ValueError("interval_join requires both sides to have a schema")
    l_cols = [c for c in lsch.names if not c.startswith("__")]
    r_cols = [c for c in rsch.names if not c.startswith("__")]
    r_out = {c: (c + suffix if c in l_cols else c) for c in r_cols if c != on}
    l_types = dict(zip(lsch.names, lsch.types))
    r_types = dict(zip(rsch.names, rsch.types))
    all_cols: dict[str, pa.DataType] = {}
    for c in l_cols:
        all_cols[c] = l_types[c]
    for c, oc in r_out.items():
        all_cols[oc] = r_types[c]
    out_l = [c for c in l_cols if c != on]
    out_r = list(r_out.values())

    def _aligned(n: int, present: dict[str, pa.Array]) -> dict[str, pa.Array]:
        cols = {}
        for c, typ in all_cols.items():
            cols[c] = present.get(c, pa.nulls(n, typ))
        return cols

    def _bucket(key: np.ndarray, band: np.ndarray) -> np.ndarray:
        h = (key.astype(np.uint64) * _GOLDEN) ^ band.astype(np.uint64)
        return (h % np.uint64(P)).astype(np.int64)

    def prep_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        us = pc.cast(t.column(ts_col), pa.int64()).to_numpy()
        band = us // win_us
        key = pc.cast(t.column(on), pa.int64()).to_numpy()
        cols = _aligned(n, {c: t.column(c) for c in l_cols})
        cols["__side"] = pa.array(np.repeat("l", n), pa.string())
        cols["__band"] = pa.array(band, pa.int64())
        cols["__us"] = pa.array(us, pa.int64())
        cols["__bucket"] = pa.array(_bucket(key, band), pa.int64())
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        us = pc.cast(t.column(right_ts), pa.int64()).to_numpy()
        band0 = us // win_us
        key = pc.cast(t.column(on), pa.int64()).to_numpy()
        parts = []
        for shift in (0, 1):
            band = band0 + shift
            cols = _aligned(
                n, {on: t.column(on), **{r_out[c]: t.column(c) for c in r_out}}
            )
            cols["__side"] = pa.array(np.repeat("r", n), pa.string())
            cols["__band"] = pa.array(band, pa.int64())
            cols["__us"] = pa.array(us, pa.int64())
            cols["__bucket"] = pa.array(_bucket(key, band), pa.int64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    lt = left.map_batches(prep_left, batch_format="pyarrow")
    rt = right.map_batches(prep_right, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["__side"] == "l", [on, "__band", "__us", *out_l]]
        rg = group.loc[group["__side"] == "r", [on, "__band", "__us", *out_r]]
        m = lg.merge(rg, on=[on, "__band"], how="inner", suffixes=("", "__rr"))
        dt = m["__us"] - m["__us__rr"]
        m = m.loc[(dt >= 0) & (dt <= win_us), [on, *out_l, *out_r]]
        return m

    return lt.union(rt).groupby("__bucket").map_groups(merge, batch_format="pandas")
