"""Sketch (HLL/CMS/KMV/HDR/checksum) query family (split from pipelines/queries.py — its module
docstring holds the catalogue conventions; the queries()/oracle_sql()
catalogue there re-exports every entry in the driver-stable order)."""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ._qcommon import (
    _ALNUM, _cents, _rp,
)



# Two small primes ≈ 10^6: per-row terms h%p keep the GLOBAL int64 Sum exact
# to ~9·10^12 rows per group (2^63 / 10^6) — beyond the 10^12-document target
# with no custom aggregate; the (p1, p2) pair gives ~10^12 combined checksum
# space. (A 2^64 multiset sum would need mod-aware combiners at every level.)
_CKSUM_P1, _CKSUM_P2 = 999983, 999979


def q_table_checksum(sf_dir: str):
    """Order-independent per-partition content fingerprint — the 100-TB data
    validation primitive (compare snapshots / replicas / resumed writes
    without moving rows): each row is canonically serialized, md5-hashed,
    and the top-8-byte hashes are multiset-summed mod two primes inside
    map_batches; the only shuffle is the groups × 3-column partial combine."""
    from ..functions.textfns import md5_hash64
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        ln = pc.cast(t.column("l_linenumber"), pa.int64()).to_numpy()
        qty = _cents(np.asarray(t.column("l_quantity")))
        hs = np.fromiter(
            (md5_hash64(f"{o}|{l}|{q}") for o, l, q in zip(ok, ln, qty)),
            dtype=np.uint64, count=len(ok),
        )
        df = pd.DataFrame(
            {"l_returnflag": t.column("l_returnflag").to_pylist(),
             "ck_a": (hs % np.uint64(_CKSUM_P1)).astype(np.int64),
             "ck_b": (hs % np.uint64(_CKSUM_P2)).astype(np.int64),
             "n_rows": np.ones(len(ok), np.int64)}
        )
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        Sum("ck_a", alias_name="ck_a"),
        Sum("ck_b", alias_name="ck_b"),
        Sum("n_rows", alias_name="n_rows"),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {"l_returnflag": t.column("l_returnflag"),
             "n_rows": pc.cast(t.column("n_rows"), pa.int64()),
             "ck_a": pa.array(
                 pc.cast(t.column("ck_a"), pa.int64()).to_numpy() % _CKSUM_P1,
                 pa.int64()),
             "ck_b": pa.array(
                 pc.cast(t.column("ck_b"), pa.int64()).to_numpy() % _CKSUM_P2,
                 pa.int64())}
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def q_distinct_users_per_type(sf_dir: str):
    """COUNT(DISTINCT ...) the scale-safe way: two-level aggregation — dedup
    (type, user) pairs with a groupby on the PAIR key (splits hot types across
    the cluster), then a tiny per-type count."""
    ds = _rp(sf_dir, "events", ["event_type", "user_id"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pylist(),
             "user_id": t.column("user_id").to_pylist()}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ..stages.canonicalize import grouped_aggregate

    pairs = grouped_aggregate(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["event_type", "user_id"],
        Count(alias_name="_n"),
    )

    def count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t.column("event_type").to_pylist()})
        g = df.groupby("event_type", as_index=False).size().rename(columns={"size": "n_users"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def q_hll_users(sf_dir: str):
    """HyperLogLog register table for COUNT(DISTINCT user_id) — the mergeable
    sketch that replaces an exact distinct's full key shuffle with 256 rows
    per stage at any cardinality (functions/sketches.py). The md5-derived
    registers are deterministic, so the TABLE is hash-checked against SQL;
    only the final fold (hll_estimate) is approximate."""
    from ..functions.sketches import hll_registers

    return hll_registers(_rp(sf_dir, "events", ["user_id"]), "user_id")


def q_cms_users(sf_dir: str):
    """Count-Min sketch counters for per-user event frequencies
    (functions/sketches.py): depth×width exact-int64 counters merging by
    SUM — heavy-hitter estimation whose shuffle is 4×256 cells at any key
    cardinality. Deterministic md5 column hashing makes the counter table
    itself hash-checkable against SQL."""
    from ..functions.sketches import cms_counters

    return cms_counters(_rp(sf_dir, "events", ["user_id"]), "user_id")


def q_heavy_hitters(sf_dir: str):
    """Exact φ-heavy-hitter words (φ = 1/41) of the corpus via the
    Misra–Gries two-phase plan: per-batch top-C candidate generation (no
    vocabulary-wide shuffle), broadcast candidates, one exact verify pass
    (functions/sketches.heavy_hitters_exact). Output independent of batch
    boundaries, so the oracle is the plain HAVING cnt*41 > N."""
    from ..functions.sketches import heavy_hitters_exact

    ds = _rp(sf_dir, "documents", ["text"])

    def words(t: pa.Table) -> pa.Table:
        out: list[str] = []
        for s in t.column("text").to_pylist():
            out.extend(_ALNUM.findall((s or "").lower()))
        return pa.table({"w": pa.array(out, pa.string())})

    return heavy_hitters_exact(
        ds.map_batches(words, batch_format="pyarrow"), "w", capacity=40
    )


def q_hll_per_type(sf_dir: str):
    """HyperLogLog as a GROUPBY AGGREGATE: per-event-type distinct-user
    registers — the shape that replaces COUNT(DISTINCT) per group (a full
    (group, key) pair shuffle at 10^12 rows) with ≤ 256 register rows per
    group merged by MAX. Same md5 hash convention as hll_users, so the
    grouped register table is exactly SQL-replicable."""
    from ..functions.sketches import _REM_BITS, _hash64
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = _hash64(t.column("user_id").to_pylist())
        bucket = (h >> np.uint64(_REM_BITS)).astype(np.int64)
        rem = h & np.uint64((1 << _REM_BITS) - 1)
        rho = np.fromiter(
            (57 - int(r).bit_length() for r in rem), np.int64, len(rem))
        df = pd.DataFrame({"event_type": t.column("event_type").to_pylist(),
                           "bucket": bucket, "rho": rho})
        g = df.groupby(["event_type", "bucket"], as_index=False)["rho"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bucket"],
        Max("rho", alias_name="rho"),
    )


def q_hll_join_card(sf_dir: str):
    """Join-cardinality pre-estimate via the HLL MERGE LAW: register tables
    for orders.o_custkey ('a'), customer.c_custkey ('b') and their UNION
    ('u' = per-bucket max of a and b — the mergeability that makes HLL the
    100-TB primitive). From the triplet, |A∩B| ≈ est(a)+est(b)−est(u) prices
    a join before running it. Registers are md5-deterministic so all three
    TABLES hash-check against SQL; only the final fold is approximate. The
    per-side sketches are ≤ 256 rows, so materializing them before the merge
    costs nothing and avoids re-executing the fact scans."""
    from ..functions.sketches import hll_registers
    from ..stages.canonicalize import grouped_aggregate

    ra = hll_registers(_rp(sf_dir, "orders", ["o_custkey"]), "o_custkey").materialize()
    rb = hll_registers(_rp(sf_dir, "customer", ["c_custkey"]), "c_custkey").materialize()

    def tag(s: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array([s] * t.num_rows, pa.string()))
        return fn

    union = grouped_aggregate(
        ra.union(rb), ["bucket"], Max("rho", alias_name="rho"),
    )
    return (
        ra.map_batches(tag("a"), batch_format="pyarrow")
        .union(rb.map_batches(tag("b"), batch_format="pyarrow"))
        .union(union.map_batches(tag("u"), batch_format="pyarrow"))
    )


_KMV_K = 16


def q_kmv_users(sf_dir: str):
    """KMV (k-minimum-values) distinct sketch per event type — the third
    mergeable-sketch family member (HLL counts leading zeros, CMS counts
    collisions; KMV keeps the k SMALLEST 63-bit hashes, so unlike both its
    state is fully deterministic and the whole sketch — not just the
    estimate — hash-matches the SQL oracle). Per-batch partial: the k
    smallest distinct hashes per (batch, type) — merge of two sketches is
    k-smallest of the union, so the exchange is ≤ k rows per (batch, type)
    at any cardinality. Estimate = (k−1)·2⁶³ // h_k (exact trunc division
    on Python ints / HUGEINT in SQL) when ≥ k distinct hashes survive,
    else the EXACT distinct count (the small-type branch)."""
    from ..functions.textfns import md5_hash64

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pylist(),
             "h": [md5_hash64(str(u)) >> 1
                   for u in pc.cast(t.column("user_id"),
                                    pa.int64()).to_pylist()]})
        df = df.drop_duplicates()
        df = (df.sort_values(["event_type", "h"])
              .groupby("event_type", as_index=False).head(_KMV_K))
        return pa.Table.from_pandas(df, preserve_index=False)

    sketches = (_rp(sf_dir, "events", ["event_type", "user_id"])
                .map_batches(partial, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hs = sorted(set(int(x) for x in g["h"]))[:_KMV_K]
        if len(hs) >= _KMV_K:
            est = (_KMV_K - 1) * (1 << 63) // hs[-1]
        else:
            est = len(hs)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_hashes": [len(hs)],
                             "kth_hash": [hs[-1]],
                             "est_distinct": [est]}).astype(
            {"n_hashes": "int64", "kth_hash": "int64",
             "est_distinct": "int64"})

    return sketches.groupby("event_type").map_groups(
        merge, batch_format="pandas")


def q_hdr_quantiles(sf_dir: str):
    """Mergeable HDR-histogram quantile sketch (p50/p90/p99 of event value
    cents) — the quantile member of the sketch family (HLL / CMS / KMV).
    Bucket = exact below 32, else leading bit + next 4 mantissa bits
    (≤ 1/16 relative error), all integer arithmetic, so the bucket counts
    are Sum-mergeable AND bit-identical to the SQL replication (BIN()
    length + shifts) — unlike t-digest/KLL there is no order- or
    batch-dependence anywhere. The whole sketch is ≤ ~1000 rows at any
    cardinality; estimates use the same 100·cum ≥ q·n integer rank rule
    as value_p90."""
    from ..functions.sketches import hdr_quantiles

    cents = _rp(sf_dir, "events", ["value"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"cents": pa.array(_cents(np.asarray(f.column("value"))),
                               pa.int64())}))(
            t.filter(pc.is_valid(t.column("value")))),
        batch_format="pyarrow")
    return hdr_quantiles(cents, "cents")


def q_hdr_quantiles_by_type(sf_dir: str):
    """Per-event-type p50/p90/p99 off the grouped HDR sketch — the sketch ×
    groupby composition (functions/sketches.hdr_quantiles_grouped): the
    shuffle carries (type, bucket) counts only (group_count × ≤ ~1000 rows
    at ANY cardinality) and the integer rank walk runs per type. Same
    bit-identical bucket mapping as q_hdr_quantiles, so the SQL replication
    just adds PARTITION BY. Output: (event_type, q_pct, est_cents,
    n_rows)."""
    from ..functions.sketches import hdr_quantiles_grouped

    ds = _rp(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"event_type": f.column("event_type"),
             "cents": pa.array(_cents(np.asarray(f.column("value"))),
                               pa.int64())}))(
            t.filter(pc.is_valid(t.column("value")))),
        batch_format="pyarrow")
    return hdr_quantiles_grouped(ds, "event_type", "cents")
