"""Statistics & distribution query family (split from pipelines/queries.py — its module
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
    _cents, _floor_log2, _gagg, _rp,
)



_HQ_BIN_CENTS = 100  # $1-wide bins over integer cents


def q_value_hist_quantiles(sf_dir: str):
    """Mergeable fixed-width-histogram quantiles (p50/p90/p99 lower bin
    bounds) per event_type: the bounded-state complement to the exact
    value_median — per-batch bincounts shuffle (type × bin) rows whose
    cardinality is fixed by the bin width, NOT by the number of distinct
    values, so the sketch state stays bounded on an unbounded value stream.
    Deterministic bins ⇒ exactly SQL-replicable (approx only in the sense
    that quantiles land on bin boundaries)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pylist(),
             "bin": _cents(np.asarray(t.column("value"))) // _HQ_BIN_CENTS}
        )
        g = df.groupby(["event_type", "bin"], as_index=False).size().rename(
            columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bin"], Sum("n", alias_name="n"),
    ).to_pandas()  # (types × bins) rows — bounded by bin width, not by data

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("bin")
        bins = g["bin"].to_numpy(dtype=np.int64)
        cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        # first bin with cum·100 ≥ q·n — identical to the oracle's
        # MIN(bin) FILTER (cum*100 >= q*tot)
        qs = [int(bins[np.searchsorted(cum * 100, q * n, side="left")])
              * _HQ_BIN_CENTS for q in (50, 90, 99)]
        rows.append((etype, n, *qs))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n": pa.array([r[1] for r in rows], pa.int64()),
         "p50_lo_cents": pa.array([r[2] for r in rows], pa.int64()),
         "p90_lo_cents": pa.array([r[3] for r in rows], pa.int64()),
         "p99_lo_cents": pa.array([r[4] for r in rows], pa.int64())}
    )


def q_value_median(sf_dir: str):
    """Exact distributed median via value-count histogram: integer cents have
    bounded cardinality, so groupby (type, cents) counts is a SMALL aggregate
    regardless of corpus size; the driver walks the per-type cumulative counts
    — the scalable exact-quantile-over-ints pattern (no per-group sort of raw
    rows, no single-task group materialization)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pylist(),
                "value_cents": _cents(np.asarray(t.column("value"))),
            }
        )
        g = df.groupby(["event_type", "value_cents"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "value_cents"],
        Sum("n", alias_name="n"),
    ).to_pandas()

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_cents")
        vals = g["value_cents"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        lo = vals[np.searchsorted(cum, (n - 1) // 2 + 1)]
        hi = vals[np.searchsorted(cum, n // 2 + 1)]
        rows.append((etype, n, (float(lo) + float(hi)) / 2.0))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "median_cents": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def q_value_p90(sf_dir: str):
    """Exact distributed 90th percentile via the same value-count histogram
    as value_median (integer cents ⇒ bounded-cardinality aggregate): p90 =
    smallest v with cum_count ≥ 0.9·n, checked in pure integers
    (10·cum ≥ 9·n) so the SQL comparison is exact."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pylist(),
             "value_cents": _cents(np.asarray(t.column("value")))}
        )
        g = df.groupby(["event_type", "value_cents"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "value_cents"],
        Sum("n", alias_name="n"),
    ).to_pandas()

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_cents")
        vals = g["value_cents"].to_numpy(dtype=np.int64)
        cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        idx = int(np.argmax(10 * cum >= 9 * n))
        rows.append((etype, n, int(vals[idx])))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n": pa.array([r[1] for r in rows], pa.int64()),
         "p90_cents": pa.array([r[2] for r in rows], pa.int64())}
    )


def q_customer_p90_spend(sf_dir: str):
    """Exact PER-GROUP p90 at GROUP-TABLE cardinality — the per-entity
    quantile a feature store computes for millions of keys, where
    ``value_p90``'s driver-side finish (fine for 5 event types) would
    collect a corpus-sized histogram. Fully distributed: per-batch
    (custkey, cents) count partials, one bucketed grouped_aggregate, then
    the integer cum rule (10·cum ≥ 9·n) runs INSIDE a coarse-bucketed
    map_groups — the driver never sees a histogram row. Output:
    (o_custkey, n_orders, p90_cents), all exact integers."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    P = _compact_blocks()

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_custkey": pc.cast(t.column("o_custkey"), pa.int64()).to_numpy(),
             "cents": _cents(np.asarray(t.column("o_totalprice")))}
        )
        g = df.groupby(["o_custkey", "cents"], as_index=False).size().rename(
            columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey", "cents"],
        Sum("n", alias_name="n"),
    )

    def add_cb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "__cb": pa.array([], pa.int64())})
        c = pc.cast(t.column("o_custkey"), pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column("__cb", pa.array(c % P, pa.int64()))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "cents"])
        cum = g.groupby("o_custkey")["n"].cumsum().to_numpy(dtype=np.int64)
        tot = g.groupby("o_custkey")["n"].transform("sum").to_numpy(dtype=np.int64)
        hit = g.loc[10 * cum >= 9 * tot, ["o_custkey", "cents"]]
        first = hit.groupby("o_custkey", as_index=False).first()  # smallest cents
        nn = g.groupby("o_custkey", as_index=False)["n"].sum().rename(
            columns={"n": "n_orders"})
        out = nn.merge(first, on="o_custkey")
        return pd.DataFrame({"o_custkey": out["o_custkey"].astype("int64"),
                             "n_orders": out["n_orders"].astype("int64"),
                             "p90_cents": out["cents"].astype("int64")})

    return (
        hist.map_batches(add_cb, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(finish, batch_format="pandas")
    )


def q_price_qty_cov(sf_dir: str):
    """Moment-sketch statistics: exact per-group covariance between quantity
    and price from ONE pass of four mergeable integer partial sums
    (n, Σx, Σy, Σxy) — the numerically-exact distributed form of the
    reference's driver-side `statistics.mean/pstdev` fold reduce
    (scripts/summarize_kfold.py:54-74) for product moments. The shuffle is
    4 int64 cells per group per batch regardless of row count; the final
    combine runs on the group-cardinality table with Python big ints, so no
    intermediate overflows (at 100-TB row counts the partials themselves
    would move to hi/lo int64 pairs — same plan). cov_num = n·Σxy − Σx·Σy is
    emitted un-divided (exact; positive here since price = qty × unit price),
    plus cov_avg = trunc(cov_num / n²) — truncation toward zero, NOT floor,
    because DuckDB's ``//`` truncates and cov_num can be negative."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(np.asarray(t.column("l_quantity"), dtype=np.float64) + 0.5).astype(np.int64)
        y = np.floor(np.asarray(t.column("l_extendedprice"), dtype=np.float64)).astype(np.int64)
        df = pd.DataFrame({"l_returnflag": t.column("l_returnflag").to_pylist(),
                           "n_rows": np.ones(len(x), np.int64),
                           "sx": x, "sy": y, "sxy": x * y})
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        Sum("n_rows", alias_name="n_rows"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # group-cardinality table: exact big-int combine on the driver side
        # of the shuffle (n·Σxy and Σx·Σy exceed int64 long before the
        # partials do)
        out = {"l_returnflag": [], "n_rows": [], "cov_num": [], "cov_avg": []}
        for r in df.itertuples(index=False):
            n, sx, sy, sxy = int(r.n_rows), int(r.sx), int(r.sy), int(r.sxy)
            num = n * sxy - sx * sy
            d = n * n
            out["l_returnflag"].append(r.l_returnflag)
            out["n_rows"].append(n)
            out["cov_num"].append(num)
            # truncate toward zero (DuckDB // semantics), not Python floor
            out["cov_avg"].append(-((-num) // d) if num < 0 else num // d)
        return pd.DataFrame({k: pd.Series(v, dtype="int64") if k != "l_returnflag"
                             else pd.Series(v, dtype="object")
                             for k, v in out.items()})

    return agg.map_batches(finish, batch_format="pandas")


def q_price_deciles(sf_dir: str):
    """Equi-depth decile boundaries (the engine's own range-partitioner
    primitive): the order-price values at global ranks ⌊n·d/10⌋, d = 1..9,
    under the total order (cents, orderkey) — computed with the
    range-partitioned global_rank (functions/rank.py): one narrow histogram
    pass + ONE full-row shuffle, NO global sort; the 9-element rank→decile
    map ships in the task closure. Assumes n ≥ 10 (distinct target ranks)."""
    from ..functions.rank import global_rank

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n = ds.count()  # parquet metadata count — no scan
    targets = {(n * d) // 10: d for d in range(1, 10)}

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "cents": pa.array(_cents(np.asarray(t.column("o_totalprice"))), pa.int64())}
        )

    ranked = global_rank(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "cents", "o_orderkey", descending=False, out="rn",
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["rn"].isin(targets)]
        return pd.DataFrame(
            {"decile": pd.Series([targets[int(r)] for r in sub["rn"]], dtype="int64"),
             "boundary_cents": sub["cents"].astype("int64").reset_index(drop=True)}
        )

    return ranked.map_batches(pick, batch_format="pandas")


def q_key_skew_stats(sf_dir: str):
    """Partition-skew diagnostic run BEFORE choosing a shuffle key: the
    histogram of per-key row counts (power-of-two buckets) plus the rows
    carried per bucket, over events.user_id. A heavy top bucket says the key
    needs salting / coarse-bucket treatment; a flat histogram says plain hash
    partitioning is safe. Plan: per-batch partial counts → bucketed key
    aggregate (key-sized, never per-group reduce) → row-local integer
    bucketing → bucket-sized final aggregate (≤ 64 rows at any scale)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        uniq, cnt = np.unique(u, return_counts=True)
        return pa.table({"user_id": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    counts = _gagg(ds.map_batches(partial, batch_format="pyarrow"),
                   "user_id", Sum("n", alias_name="n"))

    def bucketize(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.int64()).to_numpy()
        df = pd.DataFrame({"bucket": _floor_log2(n), "n": n})
        g = df.groupby("bucket", as_index=False).agg(
            n_keys=("n", "size"), n_rows=("n", "sum"))
        g = g.astype({"n_keys": "int64", "n_rows": "int64"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        counts.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], Sum("n_keys", alias_name="n_keys"),
        Sum("n_rows", alias_name="n_rows"),
    )


def q_value_outliers(sf_dir: str):
    """Tukey IQR outlier gate per event type — the numeric data-cleaning
    staple: count values outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]. Quartiles use
    the exact integer 4·cum ≥ k·n rule on the value-count histogram (same
    bounded-cardinality plan as value_median), and the outlier count is read
    from the SAME histogram — one corpus scan total, no second pass, all
    arithmetic in integer cents (bounds tested as 2·c vs 2·Q ± 3·IQR so the
    half-cent never needs a float)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pylist(),
             "value_cents": _cents(np.asarray(t.column("value")))}
        )
        g = df.groupby(["event_type", "value_cents"], as_index=False).size().rename(
            columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "value_cents"], Sum("n", alias_name="n"),
    ).to_pandas()

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_cents")
        vals = g["value_cents"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        q1 = int(vals[np.searchsorted(4 * cum, n, side="left")])
        q3 = int(vals[np.searchsorted(4 * cum, 3 * n, side="left")])
        iqr = q3 - q1
        out_mask = (2 * vals < 2 * q1 - 3 * iqr) | (2 * vals > 2 * q3 + 3 * iqr)
        rows.append((etype, n, q1, q3, int(cnt[out_mask].sum())))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n": pa.array([r[1] for r in rows], pa.int64()),
         "q1_cents": pa.array([r[2] for r in rows], pa.int64()),
         "q3_cents": pa.array([r[3] for r in rows], pa.int64()),
         "n_outliers": pa.array([r[4] for r in rows], pa.int64())}
    )


def q_spend_rank_corr(sf_dir: str):
    """SPEARMAN rank correlation between a customer's order count and
    total spend — the monotone-association probe (robust to outliers where
    Pearson is not). Under the tie-broken TOTAL orders (metric, custkey)
    the ranks are distinct permutations, so Spearman's exact rational form
    applies: ρ_ppm = 10⁶ − (6·10⁶·Σd²) // (n·(n²−1)) — no sqrt, engine-
    exact. Distributed shape: one customer-cardinality aggregate, TWO
    range-partitioned global_ranks (no global sort), one partitioned hash
    join to pair the ranks, and a Σd² big-int fold to a single row."""
    from ..functions.rank import global_rank
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c": pc.cast(t.column("o_custkey"), pa.int64())
                           .to_numpy(),
                           "n": np.ones(t.num_rows, np.int64),
                           "v": _cents(np.asarray(t.column("o_totalprice")))})
        g = df.groupby("c", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c"], Sum("n", alias_name="n"), Sum("v", alias_name="v")
    ).materialize()

    rn = global_rank(per_cust.select_columns(["c", "n"]), "n", "c",
                     descending=False, n_buckets=32, out="rn")
    rv = global_rank(per_cust.select_columns(["c", "v"]), "v", "c",
                     descending=False, n_buckets=32, out="rv")
    paired = hash_join(
        rn.map_batches(lambda df: df[["c", "rn"]].astype("int64"),
                       batch_format="pandas"),
        rv.map_batches(lambda df: df[["c", "rv"]].astype("int64"),
                       batch_format="pandas"),
        on=("c",))

    def d2(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"g": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "sd2": pd.Series([], dtype="int64")})
        d = df["rn"].to_numpy(np.int64) - df["rv"].to_numpy(np.int64)
        return pd.DataFrame({"g": [0], "n": [len(d)],
                             "sd2": [int((d * d).sum())]})

    agg = grouped_aggregate(
        paired.map_batches(d2, batch_format="pandas"), ["g"],
        Sum("n", alias_name="n"), Sum("sd2", alias_name="sd2")).to_pandas()
    n, sd2 = int(agg["n"][0]), int(agg["sd2"][0])
    rho_ppm = 1_000_000 - (6_000_000 * sd2) // (n * (n * n - 1))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "sum_d2": pa.array([sd2], pa.int64()),
                     "rho_ppm": pa.array([rho_ppm], pa.int64())})


_KT_BUCKETS = 16


def q_spend_kendall_tau(sf_dir: str):
    """Exact KENDALL τ between order count and spend per customer —
    τ_ppm = 10⁶ − (4·10⁶·inv)//(n(n−1)) where inv = discordant pairs,
    i.e. the INVERSION COUNT between the two rankings (tie-broken total
    orders ⇒ τ-a applies exactly, no sqrt). Distributed inversion
    counting with NO global sort and NO driver materialization of the
    rank table: ranks come from two range-partitioned global_ranks; rows
    bucket by rv-range (ranks are a permutation ⇒ buckets exactly
    balanced); each bucket counts its WITHIN inversions locally and emits
    its rn array as one binary blob; every unordered bucket pair is then
    co-located by a pair-keyed exchange (each blob replicated B−1 times —
    O(B·n) bytes moved) and CROSS inversions fall out of one vectorized
    searchsorted per pair: x in the higher-rv bucket is discordant with
    every lower-rv y having rn_y > rn_x. Within-bucket counting is the
    O(m²) broadcast comparison (m = n/B; size B so m² fits a task — the
    at-scale knob)."""
    from ..functions.rank import global_rank
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c": pc.cast(t.column("o_custkey"), pa.int64())
                           .to_numpy(),
                           "n": np.ones(t.num_rows, np.int64),
                           "v": _cents(np.asarray(t.column("o_totalprice")))})
        g = df.groupby("c", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c"], Sum("n", alias_name="n"), Sum("v", alias_name="v")
    ).materialize()
    n_rows = per_cust.count()
    B = min(_KT_BUCKETS, max(1, n_rows))
    size = -(-n_rows // B)  # ceil

    rn = global_rank(per_cust.select_columns(["c", "n"]), "n", "c",
                     descending=False, n_buckets=32, out="rn")
    rv = global_rank(per_cust.select_columns(["c", "v"]), "v", "c",
                     descending=False, n_buckets=32, out="rv")
    paired = hash_join(
        rn.map_batches(lambda df: df[["c", "rn"]].astype("int64"),
                       batch_format="pandas"),
        rv.map_batches(lambda df: df[["c", "rv"]].astype("int64"),
                       batch_format="pandas"),
        on=("c",))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"b": pd.Series([], dtype="int64"),
                                 "rn": pd.Series([], dtype="int64"),
                                 "rv": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"b": (df["rv"].astype("int64") - 1) // size,
                            "rn": df["rn"], "rv": df["rv"]})
        return out.astype("int64")

    def bucket_blob(g: pd.DataFrame) -> pd.DataFrame:
        # within-bucket discordant pairs: order by rn, count rv inversions
        # (O(m²) broadcast comparison — B sizes m so this fits a task)
        g = g.sort_values(["rn"])
        rv_seq = g["rv"].to_numpy(dtype=np.int64)
        inv_w = int(np.triu(rv_seq[:, None] > rv_seq[None, :], 1).sum())
        rn_sorted = np.sort(g["rn"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"b": [int(g["b"].iloc[0])],
                             "nb": [len(rv_seq)], "inv_w": [inv_w],
                             "blob": [rn_sorted.tobytes()]})

    blobs = (
        paired.map_batches(bucketize, batch_format="pandas")
        .groupby("b")
        .map_groups(bucket_blob, batch_format="pandas")
    ).materialize()

    def pair_out(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"pk": [], "side": [], "blob": []}
        for r in df.itertuples(index=False):
            for other in range(B):
                if other == r.b:
                    continue
                lo, hi = min(r.b, other), max(r.b, other)
                rows["pk"].append(lo * B + hi)
                rows["side"].append("A" if r.b == lo else "B")
                rows["blob"].append(r.blob)
        return pd.DataFrame(rows)

    def pair_cross(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["side"] == "A", "blob"]
        bb = g.loc[g["side"] == "B", "blob"]
        if a.empty or bb.empty:
            return pd.DataFrame({"inv": pd.Series([], dtype="int64")})
        A = np.frombuffer(a.iloc[0], dtype=np.int64)
        Bx = np.frombuffer(bb.iloc[0], dtype=np.int64)
        # x ∈ higher-rv bucket discordant with lower-rv y iff rn_y > rn_x
        cross = int((len(A) - np.searchsorted(A, Bx, side="right")).sum())
        return pd.DataFrame({"inv": pd.Series([cross], dtype="int64")})

    cross_ds = (
        blobs.map_batches(pair_out, batch_format="pandas")
        .groupby("pk")
        .map_groups(pair_cross, batch_format="pandas")
    )
    inv = int(sum(r["inv"] for r in cross_ds.take_all()))
    inv += int(sum(r["inv_w"] for r in
                   blobs.select_columns(["inv_w"]).take_all()))
    n = n_rows
    tau_ppm = 1_000_000 - (4_000_000 * inv) // (n * (n - 1))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "n_discordant": pa.array([inv], pa.int64()),
                     "tau_ppm": pa.array([tau_ppm], pa.int64())})


def q_value_mannwhitney_u(sf_dir: str):
    """MANN-WHITNEY U between two event populations (purchase vs view
    values) — the standard nonparametric two-sample test, computed EXACTLY
    from the value histogram with ties handled by midranks kept integer at
    2× scale: U₂ = Σ_v n₁(v)·(2·|{view < v}| + n₂(v)) = 2U. The fact
    reduces to per-value (n₁, n₂) counts; |{view < v}| is the
    range-partitioned exclusive prefix sum of n₂ in value order (no global
    sort); the final reduce is one scalar partial sum per block. Never a
    float, so the oracle hash-matches. Output: (n1, n2, u2)."""
    from ..functions.rank import keyed_prefix_sum
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        cents = _cents(np.asarray(t.column("value")))
        is1 = np.fromiter((e == "purchase" for e in et), bool, len(et))
        is2 = np.fromiter((e == "view" for e in et), bool, len(et))
        keep = is1 | is2
        c, one = cents[keep], is1[keep]
        u, inv = np.unique(c, return_inverse=True)
        n1 = np.bincount(inv, weights=one).astype(np.int64)
        n2 = np.bincount(inv, weights=~one).astype(np.int64)
        return pa.table({"c": pa.array(u, pa.int64()),
                         "n1": pa.array(n1, pa.int64()),
                         "n2": pa.array(n2, pa.int64())})

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c"], Sum("n1", alias_name="n1"), Sum("n2", alias_name="n2"))
    cum = keyed_prefix_sum(hist, "c", "n2", out="n2_less")

    def reduce_u(t: pa.Table) -> pa.Table:
        n1 = pc.cast(t.column("n1"), pa.int64()).to_numpy()
        n2 = pc.cast(t.column("n2"), pa.int64()).to_numpy()
        le = pc.cast(t.column("n2_less"), pa.int64()).to_numpy()
        return pa.table({"n1": pa.array([int(n1.sum())], pa.int64()),
                         "n2": pa.array([int(n2.sum())], pa.int64()),
                         "u2": pa.array([int((n1 * (2 * le + n2)).sum())],
                                        pa.int64())})

    out = grouped_aggregate(
        cum.map_batches(reduce_u, batch_format="pyarrow")
        .map_batches(lambda t: t.append_column(
            "__g", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["__g"], Sum("n1", alias_name="n1"), Sum("n2", alias_name="n2"),
        Sum("u2", alias_name="u2"))
    return out.map_batches(lambda t: t.select(["n1", "n2", "u2"]),
                           batch_format="pyarrow")


def q_user_type_gini(sf_dir: str):
    """Behavioral-diversity score per user: Gini impurity of the user's
    event-type distribution, in integer ppm — 0 for a single-type user,
    → 1 − 1/k for a uniform k-type user. Entropy's log2 is NOT
    bit-reproducible across engines, so the diversity score uses the
    polynomial impurity 1 − Σ(nᵗ/N)² computed as
    (10⁶·(N² − Σnᵗ²)) // N² from exact integer sums (the integer-ppm
    Jaccard trick). Plan: per-batch (user, type) count partials → one
    pair-keyed aggregate → row-local squares → one user-keyed aggregate
    (Σn, Σn², #types all Sum-mergeable) → vectorized finish on the
    user-cardinality table. Bound: int64 holds 10⁶·N² for N < 3·10⁶
    events/user; beyond that the finish moves to the hi/lo big-int combine
    (same note as price_qty_cov). Mirrors the reference's per-entity label
    diversity probe (scripts/summarize_kfold.py distribution folds) as a
    distributed two-level aggregate."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                           "event_type": t.column("event_type").to_pylist()})
        g = (df.groupby(["user_id", "event_type"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "event_type": pa.array(g["event_type"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    pair = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], Sum("n", alias_name="n"))

    def squares(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.int64()).to_numpy()
        return pa.table({"user_id": t.column("user_id"),
                         "n": pa.array(n, pa.int64()),
                         "nsq": pa.array(n * n, pa.int64()),
                         "one": pa.array(np.ones(len(n), np.int64))})

    user = grouped_aggregate(
        pair.map_batches(squares, batch_format="pyarrow"),
        ["user_id"],
        Sum("n", alias_name="n_events"), Sum("nsq", alias_name="sum_sq"),
        Sum("one", alias_name="n_types"))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_events"), pa.int64()).to_numpy()
        s = pc.cast(t.column("sum_sq"), pa.int64()).to_numpy()
        nn = n * n
        gini = (1_000_000 * (nn - s)) // nn
        return pa.table({"user_id": t.column("user_id"),
                         "n_events": pa.array(n, pa.int64()),
                         "n_types": pc.cast(t.column("n_types"), pa.int64()),
                         "gini_ppm": pa.array(gini, pa.int64())})

    return user.map_batches(finish, batch_format="pyarrow")


def q_value_trend(sf_dir: str):
    """Per-type linear TREND of event value over time: the least-squares
    slope of value (cents) against epoch day, the drift detector run over
    every metric of a 100-TB event log. One pass of five Sum-mergeable
    integer partials per group (n, Σx, Σy, Σxy, Σx²) — the regression
    extension of price_qty_cov's product-moment plan; the shuffle is five
    int64 cells per group per batch whatever the row count. Finish on the
    group-cardinality table with Python big ints (n·Σxy and Σx·Σy exceed
    int64 long before the partials do) emitting the exact rational slope
    truncated to micro-cents/day: slope_ucpd = trunc(10⁶·(n·Σxy − Σx·Σy) /
    (n·Σx² − Σx²)) — truncation toward zero to match DuckDB's ``//``."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = (t.column("ts").cast(pa.int64()).to_numpy()
             // 86_400_000_000).astype(np.int64)
        y = np.floor(np.asarray(t.column("value"), dtype=np.float64)
                     * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({"event_type": t.column("event_type").to_pylist(),
                           "n": np.ones(len(x), np.int64),
                           "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = {"event_type": [], "n_rows": [], "slope_ucpd": []}
        for r in df.itertuples(index=False):
            n, sx, sy, sxy, sxx = (int(r.n), int(r.sx), int(r.sy),
                                   int(r.sxy), int(r.sxx))
            num = 1_000_000 * (n * sxy - sx * sy)
            den = n * sxx - sx * sx
            out["event_type"].append(r.event_type)
            out["n_rows"].append(n)
            out["slope_ucpd"].append(-((-num) // den) if (num < 0) != (den < 0)
                                     else abs(num) // abs(den))
        return pd.DataFrame({
            "event_type": pd.Series(out["event_type"], dtype="object"),
            "n_rows": pd.Series(out["n_rows"], dtype="int64"),
            "slope_ucpd": pd.Series(out["slope_ucpd"], dtype="int64")})

    return agg.map_batches(finish, batch_format="pandas")


def _value_hist(sf_dir: str) -> pd.DataFrame:
    """(event_type, value_cents, n) value-count histogram — ONE corpus scan;
    integer cents have bounded cardinality so the aggregate stays small at
    any row count (the value_median / value_outliers shared skeleton)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t.column("event_type").to_pylist(),
                           "value_cents": _cents(np.asarray(t.column("value")))})
        g = (df.groupby(["event_type", "value_cents"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "value_cents"], Sum("n", alias_name="n"),
    ).to_pandas()


def q_value_trimmed_mean(sf_dir: str):
    """5%-TRIMMED mean per group — the robust location estimate (MAD's
    dispersion complement): drop the lowest and highest n//20 rows by
    value, average the rest. Read from the SAME one-scan value-count
    histogram as median/mode/MAD: with lo = n//20 and hi = n − n//20,
    a value whose cumulative range is (prev, cum] contributes
    max(0, min(cum, hi) − max(prev, lo)) copies — exact integer interval
    clipping, so partial bins at the cut points are handled without
    per-row work. tmean_cents = Σv·inc // (hi − lo)."""
    hist = _value_hist(sf_dir)
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_cents")
        vals = g["value_cents"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        prev = np.concatenate(([0], cum[:-1]))
        n = int(cum[-1])
        lo, hi = n // 20, n - n // 20
        inc = np.maximum(0, np.minimum(cum, hi) - np.maximum(prev, lo))
        tsum = int((vals * inc).sum())
        rows.append((etype, hi - lo, tsum // (hi - lo)))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "trimmed_n": pa.array([r[1] for r in rows], pa.int64()),
         "tmean_cents": pa.array([r[2] for r in rows], pa.int64())})


def q_value_mode(sf_dir: str):
    """Exact per-group MODE (most frequent value, ties → smallest value)
    read from the one-scan value-count histogram — the argmax-by-count dual
    of value_median's quantile walk; at 100 TB the histogram is the only
    exchange and the argmax runs on its bounded cardinality."""
    hist = _value_hist(sf_dir)
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values(["n", "value_cents"], ascending=[False, True])
        rows.append((etype, int(g.iloc[0]["value_cents"]), int(g.iloc[0]["n"])))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "mode_cents": pa.array([r[1] for r in rows], pa.int64()),
         "n_mode": pa.array([r[2] for r in rows], pa.int64())})


def q_value_mad(sf_dir: str):
    """Median absolute deviation per group — the robust dispersion gate
    (quality filters prefer MAD to stddev because one corrupt value moves
    stddev unboundedly). Both medians use the exact integer lower-median
    rule (2·cum ≥ n) and BOTH are read from the SAME one-scan value-count
    histogram: the deviation histogram |x − med| is a re-bucketing of the
    value histogram, not a second corpus pass."""
    hist = _value_hist(sf_dir)
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_cents")
        vals = g["value_cents"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        med = int(vals[np.searchsorted(2 * cum, n, side="left")])
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        dcum = np.cumsum(cnt[order])
        mad = int(dev[order][np.searchsorted(2 * dcum, n, side="left")])
        rows.append((etype, n, med, mad))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n": pa.array([r[1] for r in rows], pa.int64()),
         "median_cents": pa.array([r[2] for r in rows], pa.int64()),
         "mad_cents": pa.array([r[3] for r in rows], pa.int64())})


def q_value_minmax(sf_dir: str):
    """Per-row min-max feature scaling within each group — the normalize
    step before any model consumes a raw metric. Two-phase shape: a
    group-cardinality (type, min, max) aggregate is broadcast back (group
    vocabulary is bounded — type-sized, NOT corpus-sized, so the broadcast
    is always legal), then a row-local integer rescale
    scaled_ppm = 10⁶·(x − min) // (max − min) — no sqrt/log, so the value
    is bit-exact and hash-comparable (the z-score variant is NOT: sqrt
    differs in the last ulp across engines). Emits (event_id, event_type,
    scaled_ppm); degenerate max == min groups pin to 0."""
    from ray.data.aggregate import Max as AMax
    from ray.data.aggregate import Min as AMin

    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": pc.cast(t.column("event_id"), pa.int64()),
             "event_type": t.column("event_type"),
             "c": pa.array(_cents(np.asarray(t.column("value"))), pa.int64())})

    cds = ds.map_batches(cents, batch_format="pyarrow")
    mm = {r["event_type"]: (int(r["lo"]), int(r["hi"]))
          for r in grouped_aggregate(
              cds, ["event_type"],
              AMin("c", alias_name="lo"), AMax("c", alias_name="hi")
          ).take_all()}

    def scale(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        c = pc.cast(t.column("c"), pa.int64()).to_numpy()
        lo = np.array([mm[e][0] for e in et], np.int64)
        hi = np.array([mm[e][1] for e in et], np.int64)
        span = np.maximum(hi - lo, 1)
        return pa.table(
            {"event_id": t.column("event_id"),
             "event_type": t.column("event_type"),
             "scaled_ppm": pa.array(1_000_000 * (c - lo) // span, pa.int64())})

    return cds.map_batches(scale, batch_format="pyarrow")


def q_weighted_median(sf_dir: str):
    """Exact WEIGHTED median per group (price weighted by quantity, per
    return flag): lower weighted median = min value v with 2·cumw(≤v) ≥
    totw. Unlike value_median's driver-walked histogram (bounded-cardinality
    values), price cents are near-continuous, so the cumulative NEVER
    reaches the driver: the (flag, value)→weight histogram stays
    distributed, (flag, value) packs into one ordered int64 key
    (fid·2⁴⁴ + cents — prefix order within a flag is value order), the
    range-partitioned EXCLUSIVE scan (functions/rank.keyed_prefix_sum — no
    global sort) runs once over the packed keys, and each row recovers its
    within-flag inclusive cumulative by subtracting the broadcast preceding-
    flag totals (one tiny groups-sized aggregate). The answer is then a
    distributed filter + Min per flag."""
    from ..functions.rank import keyed_prefix_sum
    from ..stages.canonicalize import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"l_returnflag": t.column("l_returnflag").to_pylist(),
             "v": _cents(np.asarray(t.column("l_extendedprice"))),
             "w": np.asarray(t.column("l_quantity"),
                             dtype=np.float64).astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["l_returnflag", "v"], as_index=False)["w"].sum(),
            preserve_index=False)

    hist = grouped_aggregate(
        _rp(sf_dir, "lineitem",
            ["l_returnflag", "l_extendedprice", "l_quantity"]).map_batches(
            partial, batch_format="pyarrow"),
        ["l_returnflag", "v"], Sum("w", alias_name="w"))

    totals = sorted(
        (r["l_returnflag"], int(r["w"]))
        for r in grouped_aggregate(hist, ["l_returnflag"],
                                   Sum("w", alias_name="w")).take_all())
    if not totals:
        return pa.schema([("l_returnflag", pa.string()),
                          ("wmedian_cents", pa.int64())]).empty_table()
    fid = {f: i for i, (f, _) in enumerate(totals)}
    tot = np.array([w for _, w in totals], np.int64)
    # exclusive prefix over the PACKED order crosses flag boundaries; the
    # preceding flags' grand totals are the per-flag correction
    pre = np.concatenate(([0], np.cumsum(tot)[:-1]))
    fref, tref, pref = ray.put(fid), ray.put(tot), ray.put(pre)

    def pack(t: pa.Table) -> pa.Table:
        fm = ray.get(fref)
        f = np.fromiter((fm[x] for x in t.column("l_returnflag").to_pylist()),
                        np.int64, t.num_rows)
        v = pc.cast(t.column("v"), pa.int64()).to_numpy()
        return t.append_column("k", pa.array((f << 44) | v, pa.int64()))

    scanned = keyed_prefix_sum(
        hist.map_batches(pack, batch_format="pyarrow"), "k", "w")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"l_returnflag": pd.Series([], dtype="object"),
                              "wmedian_cents": pd.Series([], dtype="int64")})
        if df.empty:
            return empty
        t_arr, p_arr = ray.get(tref), ray.get(pref)
        f = (df["k"].to_numpy(dtype=np.int64) >> 44)
        incl = (df["prefix_sum"].to_numpy(dtype=np.int64) - p_arr[f]
                + df["w"].to_numpy(dtype=np.int64))
        keep = 2 * incl >= t_arr[f]
        if not keep.any():
            return empty
        out = df.loc[keep, ["l_returnflag", "v"]].rename(
            columns={"v": "wmedian_cents"})
        return out.astype({"wmedian_cents": "int64"})

    return (scanned.map_batches(pick, batch_format="pandas")
            .groupby("l_returnflag")
            .aggregate(Min("wmedian_cents", alias_name="wmedian_cents")))


def q_spend_gini(sf_dir: str):
    """Exact Gini coefficient of customer spend (inequality audit — the
    dual of rfm_segments' quintiles): G = Σ(2i−n−1)·cᵢ / (n·Σc) over
    ascending-sorted spends. The fact table folds to a customer-sized
    cents aggregate, the range-partitioned global_rank supplies i with
    custkey tiebreak (no global sort), and the rank-weighted numerator
    partial-sums per batch; the three driver scalars combine in Python
    big ints so n·Σc never overflows (the SQL side sums in HUGEINT).
    Output: one row (n_users, total_cents, gini_ppm)."""
    from ..functions.rank import global_rank

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_custkey": pc.cast(t.column("o_custkey"), pa.int64()).to_numpy(),
             "cents": _cents(np.asarray(t.column("o_totalprice")))})
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False)["cents"].sum(),
            preserve_index=False)

    spend = _gagg(
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"),
        "o_custkey", Sum("cents", alias_name="cents")).materialize()
    n = spend.count()
    if n == 0:
        return pa.table({"n_users": pa.array([0], pa.int64()),
                         "total_cents": pa.array([0], pa.int64()),
                         "gini_ppm": pa.array([0], pa.int64())})

    ranked = global_rank(spend, "cents", "o_custkey",
                         descending=False, out="i")

    def fold(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("cents"), pa.int64()).to_numpy()
        i = pc.cast(t.column("i"), pa.int64()).to_numpy()
        # int64-safe at bench scale; objects would be needed past ~10^9 rows
        num = int(((2 * i - n - 1) * c).sum())
        return pa.table({"num": pa.array([num], pa.int64()),
                         "tot": pa.array([int(c.sum())], pa.int64())})

    parts = ranked.map_batches(fold, batch_format="pyarrow").take_all()
    num = sum(int(r["num"]) for r in parts)
    tot = sum(int(r["tot"]) for r in parts)
    return pa.table(
        {"n_users": pa.array([n], pa.int64()),
         "total_cents": pa.array([tot], pa.int64()),
         "gini_ppm": pa.array([num * 1_000_000 // max(n * tot, 1)],
                              pa.int64())})


def q_price_qty_hist2d(sf_dir: str):
    """2-D HISTOGRAM heat grid (price × quantity) — the joint-distribution
    profiler behind heatmap dataviz and independence eyeballing, and the
    2-D sibling of `key_skew_stats`. Equi-width integer buckets ($10
    price cells via cents // 1000, quantity is already integral), counted
    per batch into (bucket, bucket) partials — the exchange is bounded by
    the grid cardinality × blocks, never the fact table, at any scale.
    Output: (price_bucket, qty, n)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            pc.cast(t.column("l_extendedprice"), pa.float64()).to_numpy()
            * 100 + 0.5).astype(np.int64)
        qty = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy()
        df = pd.DataFrame({"price_bucket": cents // 1000, "qty": qty})
        g = df.groupby(["price_bucket", "qty"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["price_bucket", "qty"], Sum("n", alias_name="n"),
    )
