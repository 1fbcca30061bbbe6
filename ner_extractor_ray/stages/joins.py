"""Join strategies (SURVEY.md §2.4).

Two physical plans, chosen by side size — the scale rule that matters at
10^12 documents:

  * ``broadcast_lookup`` — small side (alias table, label map, entity-id map):
    ``ray.put`` ONCE on the driver, ``ray.get`` once per actor/task closure,
    dict/pandas merge per batch. No shuffle. Reference analog: the 9-key label
    maps and the GloVe matrix held per process (src/data_module.py:105,
    BiLSTM-CRF/5489Project_trainv2.ipynb cell 5).

  * ``hash_join`` — both sides large: explicit partitioned hash join. We add a
    stable ``__bucket = crc32(key) % B`` column to both sides and use the
    native ``Dataset.join`` when present (ray 2.49 has it), else
    union+groupby(bucket)+map_groups merge. Hot keys are handled by the
    caller pre-aggregating before the join (see canonicalize.py salting).
"""

from __future__ import annotations

from typing import Iterable

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
) -> "ray.data.Dataset":
    """Hash-partitioned join of two Datasets on equal column names."""
    on = tuple(on)
    if hasattr(left, "join"):
        return left.join(right, join_type=how, num_partitions=num_partitions, on=on)
    # portable fallback: bucketed union + per-bucket pandas merge
    import zlib

    def add_bucket(df: pd.DataFrame, tag: str) -> pd.DataFrame:
        key = df[list(on)].astype(str).agg("\x00".join, axis=1)
        df["__bucket"] = [zlib.crc32(k.encode()) % num_partitions for k in key]
        df["__side"] = tag
        return df

    lt = left.map_batches(lambda df: add_bucket(df, "l"), batch_format="pandas")
    rt = right.map_batches(lambda df: add_bucket(df, "r"), batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"].drop(columns=["__side", "__bucket"])
        rg = group[group["__side"] == "r"].drop(columns=["__side", "__bucket"])
        return lg.merge(rg, on=list(on), how=how)

    return lt.union(rt).groupby("__bucket").map_groups(merge, batch_format="pandas")
