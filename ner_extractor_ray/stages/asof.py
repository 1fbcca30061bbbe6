"""As-of join — a custom operator Ray Data lacks (prompt §custom operators).

Semantics: for each left row, attach the right row with the same key and the
LARGEST right timestamp ≤ the left timestamp (backward as-of, the DuckDB
``ASOF JOIN`` / pandas ``merge_asof`` semantics).

Physical plan: hash-bucket both sides on the key, co-locate matching buckets
with the union+groupby pattern (same machinery as stages/joins.hash_join),
sort within the bucket and run ``pd.merge_asof`` per key group. Partitioning
assumption (documented per SURVEY.md): a single key's rows must fit in one
bucket group — keys are user/session-grained, not corpus-grained; salt or
range-split a pathological key upstream if that breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    ts_col: str,
    right_ts_col: str | None = None,
    num_partitions: int = 8,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    import zlib

    right_ts = right_ts_col or ts_col
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    all_cols = list(dict.fromkeys(left_cols + [c + suffix for c in right_cols]))

    def prep(tag: str, cols: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame()
            df = df[cols].copy()
            df["__side"] = tag
            df["__bucket"] = np.fromiter(
                (zlib.crc32(str(k).encode()) % num_partitions for k in df[on]),
                dtype=np.int64,
                count=len(df),
            )
            return df

        return fn

    lt = left.map_batches(prep("l", left_cols), batch_format="pandas")
    rt = right.map_batches(prep("r", right_cols), batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["__side"] == "l", left_cols].sort_values(ts_col, kind="mergesort")
        rg = group.loc[group["__side"] == "r", right_cols].sort_values(right_ts, kind="mergesort")
        if lg.empty:
            return pd.DataFrame({c: [] for c in all_cols})
        rg = rg.rename(columns={c: c + suffix for c in right_cols})
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
