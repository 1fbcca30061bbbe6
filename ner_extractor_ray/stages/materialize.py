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
from ..state.manifest import (
    completed_partitions,
    finalize_table,
    write_partition_manifest,
)
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
    """(node, entity_id, canonical_name, type, n_mentions) → nodes table.

    entity_id cardinality is corpus-scale (one group per canonical entity),
    so this takes grouped_aggregate's bucketed vectorized plan rather than
    the native per-group reduce."""
    from .canonicalize import grouped_aggregate

    return grouped_aggregate(
        assignments,
        ["entity_id"],
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

    Writes are PARTITION-ALIGNED (one write task per partition, via a keyed
    shuffle) and each task writes its partition's manifest the moment its
    file lands — so a mid-write kill leaves every finished partition
    resumable immediately, not only after the whole table completes. The
    table manifest, written last, stays the completeness marker.

    SCALE CONTRACT: one partition is written by one task as one block —
    callers must size ``n_partitions`` so table_size / n_partitions fits a
    worker heap (at 100 TB that means thousands of partitions, not 16;
    n_partitions is the knob the cluster-size config scales).
    """

    def add_part(t: pa.Table) -> pa.Table:
        keys = t.column(part_key).to_pylist()
        return t.append_column("part", pa.array(crc_bucket(keys, n_partitions), pa.int32()))

    import os
    import shutil

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    # Pack each block's per-partition slice into COMPRESSED Arrow-IPC bytes
    # BEFORE the exchange: the partition-aligning shuffle then moves ~15×
    # fewer bytes (one (part, blob) row per block×partition instead of every
    # raw row), which is what makes the aligned write scale — measured
    # 1.4 GB raw → ~90 MB packed on the 800k-page annotations table, write
    # phase 33 s → ~5 s at 32 CPUs. IPC+lz4, not parquet, for the blob
    # codec: 3.4× cheaper to encode at similar size (no column stats/
    # dictionary encoding work for bytes that live only inside the
    # exchange). The writer decodes its blobs and still emits ONE parquet
    # file per partition, so layout/manifest/resume semantics are unchanged.
    import io

    def pack(t: pa.Table) -> pa.Table:
        # constructed per call: IpcWriteOptions is not cloudpickle-able
        _IPC_OPTS = pa.ipc.IpcWriteOptions(compression="lz4")
        if t.num_rows == 0 or "part" not in t.column_names:
            return pa.table({"part": pa.array([], pa.int32()),
                             "blob": pa.array([], pa.large_binary()),
                             "nrows": pa.array([], pa.int64())})
        import numpy as np

        # sort-based split: ONE stable argsort + gather, then a zero-copy
        # slice per partition present — O(rows log rows + parts), vs the
        # obvious filter-per-partition which re-scans the whole batch once
        # per partition (64 parts → 64× the row scans on the hot fused pass)
        parts_np = t.column("part").to_numpy(zero_copy_only=False)
        order = np.argsort(parts_np, kind="stable")
        sorted_t = t.take(pa.array(order)).drop_columns(["part"])
        sp = parts_np[order]
        bounds = np.flatnonzero(np.diff(sp)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sp)]))
        o_part, o_blob, o_rows = [], [], []
        for s, e in zip(starts, ends):
            sub = sorted_t.slice(int(s), int(e - s))
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, sub.schema, options=_IPC_OPTS) as w:
                w.write_table(sub)
            o_part.append(int(sp[s]))
            o_blob.append(sink.getvalue())
            o_rows.append(int(e - s))
        return pa.table({"part": pa.array(o_part, pa.int32()),
                         "blob": pa.array(o_blob, pa.large_binary()),
                         "nrows": pa.array(o_rows, pa.int64())})
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
    # Partition-aligned write: co-locate each output partition into one write
    # task (groupby shuffle on the already-narrow part key), sort WITHIN the
    # partition when requested, write the file atomically (tmp + rename, so
    # task retries are idempotent) and emit the partition manifest right
    # there. A naive write_parquet(partition_cols) emits one file per (block
    # × partition) — 3072 ~50KB files for a 160MB table — and can only
    # manifest partitions after the whole table lands. NOTE min_rows_per_file
    # is also not the answer: combined with partition_cols it is ~10× slower
    # (46s vs 4.6s observed).
    sk = [sort_key] if isinstance(sort_key, str) else sort_key
    os.makedirs(table_dir, exist_ok=True)

    # driver-side capture: worker envs don't see a driver-set flag, and the
    # oracle handle must be driver-owned (see stages/faults.py get_oracle)
    from .faults import (
        fault_injection_on,
        fault_remote_args,
        get_oracle,
        inject_fault,
    )

    _inject = fault_injection_on()
    _retry_args = fault_remote_args()
    _oracle = get_oracle() if _inject else None

    def write_group(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        empty = pa.table({"part": pa.array([], pa.int32()),
                          "rows": pa.array([], pa.int64()),
                          "bytes": pa.array([], pa.int64())})
        if t.num_rows == 0 or "part" not in t.column_names:
            return empty
        part = int(t.column("part")[0].as_py())
        blobs = t.column("blob").to_pylist()
        # deterministic concat order regardless of shuffle arrival order:
        # slices sort by content bytes (with sort_key the final row sort
        # would fix it anyway; this also pins the no-sort-key layout)
        blobs.sort()
        subs = [pa.ipc.open_stream(io.BytesIO(b)).read_all() for b in blobs]
        out = pa.concat_tables(subs) if subs else None
        if out is None or out.num_rows == 0:
            return empty
        if sk and set(sk) <= set(out.column_names):
            out = out.sort_by([(k, "ascending") for k in sk])
        pdir = os.path.join(table_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        fname = "data-0.parquet"
        tmp = os.path.join(pdir, f".{fname}.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(pdir, fname))
        if _inject:
            # fault injection lands BETWEEN the data-file rename and the
            # partition manifest — the worst-case kill point; the retried
            # task must rewrite the file (tmp+rename is idempotent) and
            # land the manifest exactly once (tests/test_fault_injection.py)
            inject_fault(("write", table_dir, part), _oracle)
        nbytes = os.path.getsize(os.path.join(pdir, fname))
        write_partition_manifest(pdir, [fname], out.num_rows, nbytes)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "rows": pa.array([out.num_rows], pa.int64()),
                         "bytes": pa.array([nbytes], pa.int64())})

    # count() drives execution; summaries also flow into logs via Ray stats.
    # pack runs on WHOLE blocks (batch_size=None): its scan cost is
    # batch-size-independent (sort-based split), but blob COUNT is not —
    # 1024-row batches over 64 partitions emit ~16-row blobs, and the
    # groupby + write_group concat then pay per-blob overhead ~50× over.
    # (A/B at 800k pages/32cpus measured the two within ambient noise on the
    # e2e wall; the blob-count argument decides.)
    (
        ds.map_batches(pack, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(write_group, batch_format="pyarrow", **_retry_args)
        .count()
    )
    return finalize_table(table_dir, extra={"lineage": lineage} if lineage else None)


def compact_table(
    in_dir: str,
    out_dir: str,
    part_key: str,
    *,
    n_partitions: int,
    sort_key: str | list[str] | None = None,
) -> dict:
    """MAINTENANCE: re-partition a written table to a new partition count —
    the compaction / re-bucketing job run when a table's layout no longer
    matches the cluster (a 10k-partition incremental output consolidated
    for reads, or a grown table split finer before the next join). Pure
    composition of the existing machinery: streaming read of the old
    layout → ``write_partitioned`` with the new ``n_partitions`` — so the
    output carries the same per-partition manifests, atomic tmp+rename
    files, torn-write cleanup and resume semantics as any first-class
    table; crc-bucket partition identity means rows land deterministically
    whatever the old layout was. Never materializes the table: blocks
    stream from old files to new partitions with one keyed exchange.
    Refuses to compact a table whose completeness marker is missing
    (a half-written source would silently lose rows)."""
    import os

    import ray.data as _rd

    from ..state.manifest import table_complete

    if not table_complete(in_dir):
        raise ValueError(
            f"compact_table: {in_dir} has no completeness marker — "
            "refusing to compact a possibly torn table")
    # read the table root: Ray's parquet datasource skips _-prefixed
    # manifest files at both levels, so the part= layout reads as one table;
    # the hive read materializes the OLD "part" as a column — drop it, the
    # new bucketing owns that name
    ds = _rd.read_parquet(in_dir).map_batches(
        lambda t: t.drop_columns(["part"]) if "part" in t.column_names else t,
        batch_format="pyarrow")
    return write_partitioned(ds, out_dir, part_key,
                             n_partitions=n_partitions, sort_key=sort_key,
                             resume=False)
