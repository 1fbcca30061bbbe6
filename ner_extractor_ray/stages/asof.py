"""As-of join — a custom operator Ray Data lacks (prompt §custom operators).

Semantics: for each left row, attach the right row with the same key and the
LARGEST right timestamp ≤ the left timestamp (backward as-of, the DuckDB
``ASOF JOIN`` / pandas ``merge_asof`` semantics).

Physical plan: hash-bucket both sides on the key, co-locate matching buckets
with the union+groupby pattern (same machinery as stages/joins.hash_join —
blocks stay ARROW through the shuffle, bucket key vectorized), sort within
the bucket and run ``pd.merge_asof`` per key group. Partitioning assumption
(documented per SURVEY.md): a single key's rows must fit in one bucket group
— keys are user/session-grained, not corpus-grained; salt or range-split a
pathological key upstream if that breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .joins import _NULL_KEY, _as_pa_type, _bucket_hash


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    ts_col: str,
    right_ts_col: str | None = None,
    num_partitions: int | None = None,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    if num_partitions is None:
        from .canonicalize import _compact_blocks

        num_partitions = _compact_blocks()
    right_ts = right_ts_col or ts_col
    from .joins import _schema_autocache

    left, lsch = _schema_autocache(left)
    right, rsch = _schema_autocache(right)
    left_cols = list(lsch.names)
    right_cols = list(rsch.names)
    all_cols = list(dict.fromkeys(left_cols + [c + suffix for c in right_cols]))
    types: dict[str, pa.DataType] = {}
    for n, t in zip(lsch.names, lsch.types):
        types.setdefault(n, _as_pa_type(t))
    for n, t in zip(rsch.names, rsch.types):
        types.setdefault(n + suffix, _as_pa_type(t))

    def _empty() -> pa.Table:
        cols = {c: pa.nulls(0, types[c]) for c in all_cols}
        cols["__side"] = pa.nulls(0, pa.string())
        cols["__bucket"] = pa.nulls(0, pa.int64())
        return pa.table(cols)

    def prep(tag: str, mapping: dict[str, str]):
        # mapping: output column name → source column in this side's batch
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or on not in t.column_names:
                return _empty()
            n = t.num_rows
            cols: dict[str, pa.Array] = {}
            for c in all_cols:
                src = mapping.get(c)
                if src is not None and src in t.column_names:
                    col = t.column(src)
                    if not col.type.equals(types[c]):
                        col = pc.cast(col, types[c])
                    cols[c] = col
                else:
                    cols[c] = pa.nulls(n, types[c])
            key = pc.fill_null(pc.cast(t.column(on), pa.string()), _NULL_KEY)
            cols["__side"] = pa.array(np.repeat(tag, n), pa.string())
            cols["__bucket"] = pa.array(_bucket_hash(key, num_partitions), pa.int64())
            return pa.table(cols)

        return fn

    lt = left.map_batches(prep("l", {c: c for c in left_cols}), batch_format="pyarrow")
    rt = right.map_batches(
        prep("r", {c + suffix: c for c in right_cols}), batch_format="pyarrow"
    )

    right_out = [c + suffix for c in right_cols]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["__side"] == "l", left_cols].sort_values(ts_col, kind="mergesort")
        rg = group.loc[group["__side"] == "r", right_out].sort_values(
            right_ts + suffix, kind="mergesort"
        )
        if lg.empty:
            return pd.DataFrame({c: [] for c in all_cols})
        out = pd.merge_asof(
            lg,
            rg,
            left_on=ts_col,
            right_on=right_ts + suffix,
            left_by=on,
            right_by=on + suffix,
            direction="backward",
        )
        return out[all_cols]

    return lt.union(rt).groupby("__bucket").map_groups(merge, batch_format="pandas")
