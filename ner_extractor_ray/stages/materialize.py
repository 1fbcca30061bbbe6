"""S9 — graph materialization: dedup, partition-by-hash, sort, write + manifests.

Edges: ``groupby(subj_id, pred, obj_id)`` dedup-count (reference pattern D2/A8:
duplicate-key groupby + count, scripts/generate_kfold_splits.py:122-131,
scripts/error_analysis.py:80-88), partial-aggregated before the shuffle.
Nodes: per-entity aggregate. Both written as ``part=<hash % P>`` Parquet
directories (the resume unit — a url/entity never straddles partitions, the
GroupKFold-by-doc analog, SURVEY.md O3) with per-partition lineage manifests.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.hashing import crc_bucket
from ..state.manifest import completed_partitions, finalize_partitions
from .canonicalize import pre_aggregated_count  # noqa: F401  (re-exported pattern)


def dedup_edges(triples_with_ids: "ray.data.Dataset") -> "ray.data.Dataset":
    """(subj_id, pred, obj_id, prov) → deduped edges with occurrence counts and
    a deterministic provenance sample (min "url#sent_id")."""

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
            n_occurrences=("prov", "size"), prov=("prov", "min")
        )
        return pa.Table.from_pandas(g, preserve_index=False)  # Arrow blocks shuffle fast

    from .canonicalize import _compact_blocks, grouped_aggregate

    partials = triples_with_ids.map_batches(partial, batch_format="pandas")
    return grouped_aggregate(
        partials.repartition(_compact_blocks()),
        ["subj_id", "pred", "obj_id"],
        Sum("n_occurrences", alias_name="n_occurrences"),
        Min("prov", alias_name="prov"),
    )


def build_nodes(assignments: "ray.data.Dataset") -> "ray.data.Dataset":
    """(node, entity_id, canonical_name, type, n_mentions) → nodes table."""
    return assignments.groupby("entity_id").aggregate(
        Min("canonical_name", alias_name="canonical_name"),
        Min("type", alias_name="type"),
        Sum("n_mentions", alias_name="n_mentions"),
    )


def write_partitioned(
    ds: "ray.data.Dataset",
    table_dir: str,
    part_key: str,
    *,
    n_partitions: int = 16,
    sort_key: str | list[str] | None = None,
    resume: bool = True,
    lineage: dict | None = None,
) -> dict:
    """Write ``part=<crc32(part_key) % n>`` Parquet dirs + manifests.

    With ``resume=True``, partitions that already have a manifest are filtered
    out BEFORE any work is written (kill-and-rerun skips finished shards).

    SCALE CONTRACT: with ``sort_key`` set, one partition is compacted into one
    block — callers must size ``n_partitions`` so table_size / n_partitions
    fits a worker heap (at 100 TB that means thousands of partitions, not 16;
    n_partitions is the knob the cluster-size config scales).
    """

    def add_part(t: pa.Table) -> pa.Table:
        keys = t.column(part_key).to_pylist()
        return t.append_column("part", pa.array(crc_bucket(keys, n_partitions), pa.int32()))

    import os
    import shutil

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    done = completed_partitions(table_dir) if resume else set()
    # a part dir with files but NO manifest is a torn write from a killed run:
    # clear it so the rerun can't produce duplicate rows
    if os.path.isdir(table_dir):
        for name in os.listdir(table_dir):
            pdir = os.path.join(table_dir, name)
            if (
                name.startswith("part=")
                and os.path.isdir(pdir)
                and int(name.split("=", 1)[1]) not in done
            ):
                shutil.rmtree(pdir)
    if done:
        done_arr = list(done)
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("part"), value_set=pa.array(done_arr, pa.int32())))
            ),
            batch_format="pyarrow",
        )
    # Co-locate each output partition into one block before the hive write:
    # a naive write_parquet(partition_cols) emits one file per (block ×
    # partition) — 3072 ~50KB files for a 160MB table — and every downstream
    # read then pays per-file costs. One shuffle by the (already narrow)
    # partition key yields one file per partition, sorted WITHIN the
    # partition (the global sort is unnecessary: order within hash partitions
    # is the layout contract). NOTE min_rows_per_file is also not the answer:
    # combined with partition_cols it is ~10× slower (46s vs 4.6s observed).
    sk = [sort_key] if isinstance(sort_key, str) else sort_key

    if sk:
        # sorted layout: co-locate each partition into one block (groupby
        # shuffle) and sort WITHIN it — one sorted file per partition
        def compact(t: pa.Table) -> pa.Table:
            if t.num_rows and set(sk) <= set(t.column_names):
                t = t.sort_by([(k, "ascending") for k in sk])
            return t

        ds = ds.groupby("part").map_groups(compact, batch_format="pyarrow")
    else:
        # unsorted layout: a cheap block coalesce keeps the file count at
        # blocks × partitions ≈ manageable without a keyed shuffle
        from .canonicalize import _compact_blocks

        ds = ds.repartition(_compact_blocks())
    ds.write_parquet(table_dir, partition_cols=["part"])
    return finalize_partitions(table_dir, extra={"lineage": lineage} if lineage else None)
