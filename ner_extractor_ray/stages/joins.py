"""Join strategies (SURVEY.md §2.4).

Two physical plans, chosen by side size — the scale rule that matters at
10^12 documents:

  * ``broadcast_lookup`` — small side (alias table, label map, entity-id map):
    ``ray.put`` ONCE on the driver, ``ray.get`` once per actor/task closure,
    dict/pandas merge per batch. No shuffle. Reference analog: the 9-key label
    maps and the GloVe matrix held per process (src/data_module.py:105,
    BiLSTM-CRF/5489Project_trainv2.ipynb cell 5).

  * ``hash_join`` — both sides large: explicit partitioned hash join. We add a
    stable ``__bucket = crc32(key) % B`` column to both sides, align schemas,
    union, ``groupby(__bucket)`` and pandas-merge each bucket. Hot keys are
    handled by callers pre-aggregating before the join (canonicalize.py).

    Ray 2.49's native ``Dataset.join`` exists but chokes on the zero-column
    empty blocks that ``groupby().aggregate()`` emits ("No match for FieldRef"
    in pyarrow acero), so the portable plan is the default; pass
    ``use_native=True`` for inputs guaranteed free of empty blocks.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray
import ray.data


def broadcast(obj) -> "ray.ObjectRef":
    """Put a small lookup structure in the object store once."""
    return ray.put(obj)


class BroadcastLookup:
    """Actor-pool callable: maps a key column through a broadcast dict.

    ``mapping_ref`` may be an ObjectRef (fetched once per actor, zero-copy
    from the local object store on every node) or a plain dict (tests).
    """

    def __init__(self, mapping_ref, key_col: str, out_col: str, default=None):
        self.mapping = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        )
        self.key_col = key_col
        self.out_col = out_col
        self.default = default

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = self.mapping
        d = self.default
        batch[self.out_col] = [m.get(k, d) for k in batch[self.key_col]]
        return batch


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Iterable[str],
    *,
    how: str = "inner",
    num_partitions: int = 8,
    use_native: bool = False,
) -> "ray.data.Dataset":
    """Hash-partitioned join of two Datasets on equal column names."""
    on = list(on)
    if use_native and hasattr(left, "join"):
        return left.join(right, join_type=how, num_partitions=num_partitions, on=tuple(on))

    import zlib

    left_cols = [c for c in left.schema().names if not c.startswith("__")]
    right_cols = [c for c in right.schema().names if not c.startswith("__")]
    all_cols = list(dict.fromkeys(left_cols + right_cols))  # stable order

    def prepare(tag: str, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or not set(on) <= set(df.columns):
                return pd.DataFrame(
                    {
                        **{c: pd.Series([], dtype="object") for c in all_cols},
                        "__side": pd.Series([], dtype="object"),
                        "__bucket": pd.Series([], dtype="int64"),
                    }
                )
            df = df[keep].copy()
            for c in all_cols:  # align schemas so union blocks concat cleanly
                if c not in df.columns:
                    df[c] = None
            key = df[on].astype(str).agg("\x00".join, axis=1)
            df["__side"] = tag
            df["__bucket"] = np.fromiter(
                (zlib.crc32(k.encode()) % num_partitions for k in key),
                dtype=np.int64,
                count=len(df),
            )
            return df[all_cols + ["__side", "__bucket"]]

        return fn

    lt = left.map_batches(prepare("l", left_cols), batch_format="pandas")
    rt = right.map_batches(prepare("r", right_cols), batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["__side"] == "l", left_cols]
        rg = group.loc[group["__side"] == "r", right_cols]
        out = lg.merge(rg, on=on, how=how)
        return out

    return lt.union(rt).groupby("__bucket").map_groups(merge, batch_format="pandas")
