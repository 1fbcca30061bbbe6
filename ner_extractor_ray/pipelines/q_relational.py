"""Relational / TPC-H-shaped query family (split from pipelines/queries.py — its module
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
    _cents, _gagg, _nonempty_or_empty_table, _rp, _ts_us,
)



# --------------------------------------------------------------------------
# Relational operator family (TPC-H-ish tables)
# --------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """A5/A6 analog: grouped sums with per-batch partial aggregation."""
    ds = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t.column("l_returnflag").to_pylist(),
                "l_linestatus": t.column("l_linestatus").to_pylist(),
                "sum_qty": np.asarray(t.column("l_quantity"), dtype=np.float64),
                "sum_price_cents": _cents(np.asarray(t.column("l_extendedprice"))),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_price_cents=("sum_price_cents", "sum"),
            n_items=("sum_qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..stages.canonicalize import grouped_aggregate

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("n_items", alias_name="n_items"),
    )


def q_top_orders(sf_dir: str):
    """O8 top-k: global sort with total-order tie-break, then limit."""
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_customer_by_nation(sf_dir: str):
    """J1/J4 broadcast join: 25-row nation dict shipped once, no shuffle."""
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in _rp(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    }
    nref = ray.put(nation)
    ds = _rp(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(nref)
        names = [m.get(k) for k in t.column("c_nationkey").to_pylist()]
        df = pd.DataFrame(
            {"n_name": names, "acctbal_cents": _cents(np.asarray(t.column("c_acctbal")))}
        )
        g = df.groupby("n_name", as_index=False).agg(
            n_customers=("acctbal_cents", "size"), acctbal_cents=("acctbal_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
    )


def q_orders_by_month(sf_dir: str):
    """§2.8 date functions: month truncation + grouped exact aggregates."""
    ds = _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        months = pd.Series(t.column("o_orderdate").to_pandas()).dt.strftime("%Y-%m")
        df = pd.DataFrame(
            {"month": months,
             "total_cents": _cents(np.asarray(t.column("o_totalprice")))}
        )
        g = df.groupby("month", as_index=False).agg(
            n_orders=("total_cents", "size"), total_cents=("total_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents"))
    )


def q_union_nationkeys(sf_dir: str):
    """D5 union + distinct over two sources."""
    c = _rp(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: pa.table({"k": pc.cast(t.column("c_nationkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    s = _rp(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: pa.table({"k": pc.cast(t.column("s_nationkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    # distinct via the narrow key groupby; the RESULT stays a Dataset (no
    # driver collect — the consumer decides whether to materialize)
    return (
        c.union(s)
        .groupby("k")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["k"])
    )


def q_nations_without_suppliers(sf_dir: str):
    """Anti-join via broadcast key set (exact; a Bloom filter is the semi-join
    PREfilter at scale — functions/bloom.py — but anti-joins need the exact
    set to avoid dropping false-positive non-members)."""
    skeys = set(_rp(sf_dir, "supplier", ["s_nationkey"]).unique("s_nationkey"))
    kref = ray.put(skeys)
    ds = _rp(sf_dir, "nation", ["n_nationkey", "n_name"])

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        mask = [k not in ks for k in t.column("n_nationkey").to_pylist()]
        out = t.filter(pa.array(mask, pa.bool_()))
        return pa.table(
            {"n_nationkey": pc.cast(out.column("n_nationkey"), pa.int64()),
             "n_name": out.column("n_name")}
        )

    schema = pa.schema([("n_nationkey", pa.int64()), ("n_name", pa.string())])
    batches = [
        b
        for b in ds.map_batches(anti, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    # a fully-filtered Dataset has no blocks and therefore no schema — return
    # an explicit-schema (possibly empty) Table so the oracle compare holds at
    # every sf (at sf≥0.01 every nation has suppliers)
    return pa.concat_tables(batches) if batches else schema.empty_table()


_SCD_DAY0 = 9496  # epoch days of 1996-01-01, the first possible version flip


def q_scd_segment_orders(sf_dir: str):
    """Slowly-changing-dimension (SCD type 2) join — every order resolved to
    the dimension version VALID AT ORDER TIME, the warehouse op behind any
    time-correct fact×dimension report. The versioned dimension is derived
    deterministically from ``customer``: version 1 (the original market
    segment) effective from epoch, version 2 ('UPGRADED-<segment>') effective
    on day ``_SCD_DAY0 + c_custkey % 1500`` — flips span 1996-2000, inside
    the orders range, so both versions appear in the output.

    Physical plan: the dimension-change table (2 rows/customer) and the fact
    rows co-partition by customer through the banded as-of join
    (stages/asof.py, pandas merge_asof backward == SQL eff <= order_date),
    then a tiny groupby(segment) count — no broadcast, no driver
    materialization; shuffle is O(facts + 2·dim versions)."""
    from ..stages.asof import asof_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def dim_rows(t: pa.Table) -> pa.Table:
        k = pc.cast(t.column("c_custkey"), pa.int64()).to_numpy()
        seg = t.column("c_mktsegment").to_pylist()
        return pa.table(
            {"c_custkey": pa.array(np.concatenate([k, k]), pa.int64()),
             "eff_day": pa.array(
                 np.concatenate([np.zeros(len(k), np.int64),
                                 _SCD_DAY0 + k % 1500]), pa.int64()),
             "seg": pa.array(seg + [f"UPGRADED-{s}" for s in seg], pa.string())}
        )

    def fact_rows(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
             "day": pa.array(us // 86_400_000_000, pa.int64())}
        )

    joined = asof_join(
        orders.map_batches(fact_rows, batch_format="pyarrow"),
        cust.map_batches(dim_rows, batch_format="pyarrow"),
        on="c_custkey", ts_col="day", right_ts_col="eff_day",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "seg_r" not in df.columns:
            return pd.DataFrame({"segment": pd.Series([], dtype="object"),
                                 "n_orders": pd.Series([], dtype="int64")})
        g = df.groupby("seg_r", as_index=False).size()
        return pd.DataFrame({"segment": g["seg_r"],
                             "n_orders": g["size"].astype("int64")})

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("segment")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


def q_part_type_prefix(sf_dir: str):
    """§2.8 string functions: split/upper on p_type + grouped exact sums."""
    ds = _rp(sf_dir, "part", ["p_type", "p_size"])

    def partial(t: pa.Table) -> pa.Table:
        pref = [(s or "").split(" ")[0].upper() for s in t.column("p_type").to_pylist()]
        df = pd.DataFrame(
            {"type_prefix": pref,
             "sum_size": pc.cast(t.column("p_size"), pa.int64()).to_numpy()}
        )
        g = df.groupby("type_prefix", as_index=False).agg(
            n=("sum_size", "size"), sum_size=("sum_size", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("type_prefix")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_size", alias_name="sum_size"))
    )


def q_orders_priority_share(sf_dir: str):
    """§2.8 conditional aggregation (CASE WHEN): big-order count per priority."""
    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        big = (np.asarray(t.column("o_totalprice"), dtype=np.float64) > 150000.0)
        df = pd.DataFrame(
            {"o_orderpriority": t.column("o_orderpriority").to_pylist(),
             "n_big": big.astype(np.int64)}
        )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("n_big", "size"), n_big=("n_big", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"), Sum("n_big", alias_name="n_big"))
    )


def q_ship_days(sf_dir: str):
    """§2.8 date arithmetic: days since a fixed epoch, exact integer sums."""
    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_shipdate"])
    base_us = pd.Timestamp("1995-01-01").value // 1000  # μs since Unix epoch

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        days = (us - base_us) // 86_400_000_000
        df = pd.DataFrame(
            {"l_returnflag": t.column("l_returnflag").to_pylist(), "sum_days": days}
        )
        g = df.groupby("l_returnflag", as_index=False).agg(
            n=("sum_days", "size"), sum_days=("sum_days", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_days", alias_name="sum_days"))
    )


def q_customer_order_counts(sf_dir: str):
    """J4 LEFT join: every customer with their order count (0 kept).
    Orders are pre-aggregated to per-custkey counts BEFORE the join, so the
    join's right side is bounded by customer cardinality, and the left join
    itself runs on the partitioned hash-join path (how="left")."""
    from ..stages.joins import hash_join

    cust = _rp(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    orders = _rp(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c_custkey": pc.cast(t.column("o_custkey"), pa.int64()).to_numpy()})
        g = df.groupby("c_custkey", as_index=False).size().rename(columns={"size": "n_orders"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = _gagg(
        orders.map_batches(partial, batch_format="pyarrow"),
        "c_custkey", Sum("n_orders", alias_name="n_orders"),
    )
    joined = hash_join(cust, counts, on=("c_custkey",), how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                                 "n_orders": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"c_custkey": df["c_custkey"].astype("int64"),
             "n_orders": df["n_orders"].fillna(0).astype("int64")}
        )

    return joined.map_batches(finish, batch_format="pandas")


def q_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by order count, zero-order
    customers KEPT — the aggregate-of-an-aggregate. Level 1 reuses the
    customer_order_counts plan (fact table folds to per-batch partial counts
    → ONE bucketed Sum at customer cardinality → LEFT hash join for the
    zero-fill); level 2 re-aggregates that customer-sized table down to the
    order-count histogram with the same partial-then-Sum shape, so the second
    exchange carries at most (distinct n_orders × blocks) rows and nothing
    customer-sized ever reaches the driver. Reference analog: the fold-metric
    histogram (scripts/summarize_kfold.py:54-74) lifted to two aggregation
    levels over a join."""
    counts = q_customer_order_counts(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_orders", as_index=False).size().rename(
            columns={"size": "n_customers"})
        return g[["n_orders", "n_customers"]]

    return _gagg(
        counts.map_batches(partial, batch_format="pandas"),
        "n_orders", Sum("n_customers", alias_name="n_customers"),
    )


def q_customers_with_orders(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """J-family semi join: customers having ≥1 order. Two physical plans
    gated on the DISTINCT key count of the fact side (the kg.py S7b switch —
    a fact-table-derived key set must never be broadcast unconditionally):

      * ≤ ``broadcast_limit`` distinct keys: broadcast the exact key set
        once (``ray.put``), filter map-side — zero shuffle of the big side;
      * above it: Bloom prefilter on the probe side (no false negatives,
        built distributively from the key side) + partitioned ``hash_join``
        semi join against the distinct-key table — exact output, text/key
        traffic ∝ survivors, nothing fact-sized on the driver.
    """
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "customer", ["c_custkey"])
    okeys_ds = grouped_aggregate(
        _rp(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda t: pa.table(
                {"c_custkey": pc.unique(pc.cast(t.column("o_custkey"), pa.int64()))}
            ),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        Count(alias_name="_n"),
    ).select_columns(["c_custkey"]).materialize()

    if okeys_ds.count() <= broadcast_limit:
        okeys = {
            int(v)
            for b in okeys_ds.iter_batches(batch_size=65536, batch_format="pyarrow")
            for v in b.column("c_custkey").to_pylist()
        }
        kref = ray.put(okeys)

        def semi(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ids = pc.cast(t.column("c_custkey"), pa.int64())
            mask = [k in ks for k in ids.to_pylist()]
            return pa.table({"c_custkey": ids.filter(pa.array(mask, pa.bool_()))})

        return ds.map_batches(semi, batch_format="pyarrow")

    from ..functions.bloom import build_bloom, semi_join_prefilter

    bloom_ref = ray.put(build_bloom(okeys_ds, "c_custkey"))
    cust = ds.map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    survivors = semi_join_prefilter(cust, "c_custkey", bloom_ref)
    joined = hash_join(survivors, okeys_ds, on=("c_custkey",))
    return joined.map_batches(
        lambda df: pd.DataFrame({"c_custkey": df["c_custkey"].astype("int64")}),
        batch_format="pandas",
    )


def q_bloom_semi_orders(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """Bloom semi-join prefilter (functions/bloom.py) on the query surface:
    order counts/revenue per priority for BUILDING-segment customers. The
    bloom is built distributively over the small side (per-batch partial
    bitmaps OR-merged, broadcast once via ray.put) and prunes the big orders
    side MAP-SIDE with no false negatives. The ≤fpr false positives are then
    removed by an exact verify, GATED on the distinct filtered-key count
    (the q_customers_with_orders switch — a segment of a 10⁸-row customer
    table must never be broadcast unconditionally):

      * ≤ ``broadcast_limit`` keys: sorted int64 key array broadcast once
        (8 B/key, zero-copy Arrow collect), vectorized ``np.isin`` verify
        per batch;
      * above it: partitioned ``hash_join`` of the survivors against the
        distinct-key table — the prefilter already cut the shuffle to
        ~matching rows, so the join side is survivor-sized.

    Exact output on BOTH paths (the limit=0 test forces the join path), so
    the DuckDB oracle is a plain IN-subquery semi join."""
    from ..functions.bloom import build_bloom, semi_join_prefilter
    from ..stages.joins import hash_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(
                t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING"))
                .column("c_custkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    bloom_ref = ray.put(build_bloom(cust, "c_custkey"))

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
    survivors = semi_join_prefilter(orders, "o_custkey", bloom_ref)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_orderpriority": t.column("o_orderpriority").to_pylist(),
             "cents": _cents(np.asarray(t.column("o_totalprice")))}
        )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum")
        )
        return pa.table(
            {"o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
             "n_orders": pa.array(g["n_orders"].astype("int64"), pa.int64()),
             "total_cents": pa.array(g["total_cents"].astype("int64"), pa.int64())}
        )

    if cust.count() <= broadcast_limit:
        exact_keys = ray.put(np.unique(np.concatenate(
            [b.column("c_custkey").to_numpy()
             for b in cust.iter_batches(batch_size=65536,
                                        batch_format="pyarrow")]
            or [np.array([], np.int64)])))

        def verify_and_partial(t: pa.Table) -> pa.Table:
            ks = ray.get(exact_keys)
            keys = pc.cast(t.column("o_custkey"), pa.int64()).to_numpy()
            mask = np.isin(keys, ks, assume_unique=False)
            return partial(t.filter(pa.array(mask, pa.bool_())))

        verified = survivors.map_batches(verify_and_partial, batch_format="pyarrow")
    else:
        key_tbl = _gagg(
            cust, "c_custkey", Count(alias_name="_n")
        ).map_batches(
            lambda t: pa.table({"o_custkey": pc.cast(t.column("c_custkey"),
                                                     pa.int64())}),
            batch_format="pyarrow",
        )
        joined = hash_join(
            survivors.map_batches(
                lambda t: pa.table(
                    {"o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                     "o_orderpriority": t.column("o_orderpriority"),
                     "o_totalprice": t.column("o_totalprice")}),
                batch_format="pyarrow",
            ),
            key_tbl, on=("o_custkey",),
        )
        verified = joined.map_batches(
            lambda df: partial(pa.Table.from_pandas(df, preserve_index=False)),
            batch_format="pandas",
        )

    return (
        verified
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents"))
    )


# --------------------------------------------------------------------------
# Window / rank / rollup / interval-join family (round-2 additions)
# --------------------------------------------------------------------------

def q_order_rank(sf_dir: str):
    """Global row-number over a total order WITHOUT a full-row global sort:
    histogram → bucket offsets → per-bucket local sort (functions/rank.py)."""
    from ..functions.rank import global_rank

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    ranked = global_rank(
        ds, "o_totalprice", "o_orderkey", descending=True, n_buckets=32
    )
    return ranked.map_batches(
        lambda df: df[["o_orderkey", "rank"]].astype({"o_orderkey": "int64", "rank": "int64"}),
        batch_format="pandas",
    )


def q_orders_rollup(sf_dir: str):
    """GROUPING SETS / rollup: aggregate once at the finest grain (priority ×
    month — bounded cardinality, so the rollup input is tiny no matter the
    corpus size), then derive the coarser grains from the pre-aggregate."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        months = pd.Series(t.column("o_orderdate").to_pandas()).dt.strftime("%Y-%m")
        df = pd.DataFrame(
            {
                "priority": t.column("o_orderpriority").to_pylist(),
                "month": months,
                "total_cents": _cents(np.asarray(t.column("o_totalprice"))),
            }
        )
        g = df.groupby(["priority", "month"], as_index=False).agg(
            n_orders=("total_cents", "size"), total_cents=("total_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["priority", "month"],
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    ).to_pandas()

    by_prio = fine.groupby("priority", as_index=False)[["n_orders", "total_cents"]].sum()
    by_prio["month"] = "ALL"
    total = pd.DataFrame(
        {
            "priority": ["ALL"],
            "month": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "total_cents": [fine["total_cents"].sum()],
        }
    )
    out = pd.concat([fine, by_prio, total], ignore_index=True)
    cols = ["priority", "month", "n_orders", "total_cents"]
    out = out[cols].astype({"n_orders": "int64", "total_cents": "int64"})
    return pa.Table.from_pandas(out, preserve_index=False)


def q_revenue_by_region(sf_dir: str):
    """TPC-H Q5-style 4-table join: orders ⋈ customer via the partitioned
    Arrow hash join (both sides corpus-scaled), nation+region broadcast as one
    composed dict (tiny), then grouped exact aggregate."""
    from ..stages.joins import hash_join

    n2r = {
        n["n_nationkey"]: n["n_regionkey"]
        for n in _rp(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).take_all()
    }
    rnames = {
        r["r_regionkey"]: r["r_name"]
        for r in _rp(sf_dir, "region", ["r_regionkey", "r_name"]).take_all()
    }
    nation_region = {k: rnames[v] for k, v in n2r.items()}
    nref = ray.put(nation_region)

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "total_cents": pa.array(
                    _cents(np.asarray(t.column("o_totalprice"))), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    customer = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(orders, customer, ["c_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nref)
        if df.empty:
            return pd.DataFrame(
                {"r_name": pd.Series([], dtype="object"),
                 "n_orders": pd.Series([], dtype="int64"),
                 "total_cents": pd.Series([], dtype="int64")}
            )
        df["r_name"] = [m[int(k)] for k in df["c_nationkey"]]
        g = df.groupby("r_name", as_index=False).agg(
            n_orders=("total_cents", "size"), total_cents=("total_cents", "sum")
        )
        # the join union null-pads each side's columns, which makes pandas
        # promote int64 → float64; values are exact ints, so cast back
        return g.astype({"n_orders": "int64", "total_cents": "int64"})

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("r_name")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents"))
    )


# --------------------------------------------------------------------------
# Round-2 additions: set ops, distinct-count, pivot, big×big join top-k
# --------------------------------------------------------------------------

def q_revenue_by_brand(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """Fact×dimension join the 100-TB way, with the size gate made explicit:
    up to ``broadcast_limit`` dimension rows `part` is broadcast once
    (ray.put dict) and the revenue aggregate happens map-side on `lineitem`
    — no shuffle of the big side at all (contrast q_revenue_by_region, which
    always exercises the partitioned hash join). Above the limit the
    dimension is NOT broadcastable, so the fact side is pre-aggregated to
    (l_partkey, n, cents) — bounded by part cardinality — and hash-joined."""
    part = _rp(sf_dir, "part", ["p_partkey", "p_brand"])
    ds = _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def cents_of(t: pa.Table) -> np.ndarray:
        ep = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        return np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)

    if part.count() <= broadcast_limit:  # parquet metadata count — no scan
        brand = {r["p_partkey"]: r["p_brand"] for r in part.take_all()}
        bref = ray.put(brand)

        def partial(t: pa.Table) -> pa.Table:
            m = ray.get(bref)
            df = pd.DataFrame(
                {"p_brand": [m.get(k) for k in t.column("l_partkey").to_pylist()],
                 "revenue_cents": cents_of(t)}
            )
            g = df.groupby("p_brand", as_index=False).agg(
                n_items=("revenue_cents", "size"),
                revenue_cents=("revenue_cents", "sum"),
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("p_brand")
            .aggregate(Sum("n_items", alias_name="n_items"),
                       Sum("revenue_cents", alias_name="revenue_cents"))
        )

    from ..stages.joins import hash_join

    def fact_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(),
             "revenue_cents": cents_of(t)}
        )
        g = df.groupby("p_partkey", as_index=False).agg(
            n_items=("revenue_cents", "size"), revenue_cents=("revenue_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = _gagg(
        ds.map_batches(fact_partial, batch_format="pyarrow"),
        "p_partkey",
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )
    dim = part.map_batches(
        lambda t: pa.table({"p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                            "p_brand": t.column("p_brand")}),
        batch_format="pyarrow",
    )
    joined = hash_join(per_part, dim, on=("p_partkey",))

    def brand_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_brand", as_index=False).agg(
            n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum")
        )
        return g.astype({"n_items": "int64", "revenue_cents": "int64"})

    return (
        joined.map_batches(brand_partial, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
    )


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: the two LARGEST tables joined via the partitioned
    Arrow hash join (neither side broadcastable at scale), with predicate
    pushdown at the parquet read (row-group pruning), grouped revenue, and
    partial-top-k → tiny global sort."""
    import datetime as _dt

    import pyarrow.dataset as pads

    from ..stages.joins import hash_join

    cutoff = _dt.datetime(1998, 1, 1)
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < pa.scalar(cutoff, pa.timestamp("us")),
    ).map_batches(
        lambda t: pa.table({"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64())}),
        batch_format="pyarrow",
    )
    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > pa.scalar(cutoff, pa.timestamp("us")),
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                "revenue_cents": pa.array(
                    np.floor(
                        np.asarray(t.column("l_extendedprice"), dtype=np.float64)
                        * (1.0 - np.asarray(t.column("l_discount"), dtype=np.float64))
                        * 100.0
                        + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(orders, lineitem, ["o_orderkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # the join's schema-aligned union makes right-only columns nullable
        # (float64 in pandas); values are exact ints < 2^53, cast back
        g = df.groupby("o_orderkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum")
        )
        return g.astype({"revenue_cents": "int64"})

    agg = _gagg(
        joined.map_batches(partial, batch_format="pandas"),
        "o_orderkey", Sum("revenue_cents", alias_name="revenue_cents"),
    )
    return agg.sort(["revenue_cents", "o_orderkey"], descending=[True, False]).limit(10)


def _set_op(sf_dir: str, keep: str):
    """Distributed INTERSECT / EXCEPT over two fact-side key columns with NO
    driver-side key set: each side emits per-batch distinct (k, side-flag)
    partials, both union into ONE narrow groupby on the key, and presence
    flags (Max) decide membership map-side. Nothing fact-derived is ever
    collected — the output Dataset IS the result, whatever its cardinality.
    ``keep``: 'both' → INTERSECT, 'left_only' → EXCEPT."""

    def tag(col: str, lflag: int):
        def fn(t: pa.Table) -> pa.Table:
            ks = pc.unique(pc.cast(t.column(col), pa.int64()))
            n = len(ks)
            return pa.table(
                {"k": ks,
                 "in_l": pa.array(np.full(n, lflag, np.int64), pa.int64()),
                 "in_r": pa.array(np.full(n, 1 - lflag, np.int64), pa.int64())}
            )

        return fn

    c = _rp(sf_dir, "customer", ["c_nationkey"]).map_batches(
        tag("c_nationkey", 1), batch_format="pyarrow"
    )
    s = _rp(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        tag("s_nationkey", 0), batch_format="pyarrow"
    )
    flags = _gagg(
        c.union(s), "k",
        Max("in_l", alias_name="in_l"), Max("in_r", alias_name="in_r"),
    )

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"k": pa.array([], pa.int64())})
        inl = pc.equal(t.column("in_l"), 1)
        inr = pc.equal(t.column("in_r"), 1)
        mask = pc.and_(inl, inr) if keep == "both" else pc.and_(inl, pc.invert(inr))
        return pa.table({"k": pc.cast(t.filter(mask).column("k"), pa.int64())})

    return flags.map_batches(pick, batch_format="pyarrow")


def q_nations_overlap(sf_dir: str):
    """INTERSECT set op: nation keys present on BOTH fact sides — fully
    distributed (see _set_op; no exact key set ever leaves the cluster)."""
    return _nonempty_or_empty_table(
        _set_op(sf_dir, "both"), pa.schema([("k", pa.int64())]))


def q_customer_only_nations(sf_dir: str):
    """EXCEPT set op on the same distributed presence-flag plan."""
    return _nonempty_or_empty_table(
        _set_op(sf_dir, "left_only"), pa.schema([("k", pa.int64())]))


def q_orders_above_avg(sf_dir: str):
    """Join-against-aggregate (TPC-H Q17 shape): per-customer average order
    value computed distributed, then joined BACK to the fact table via the
    partitioned hash join (custkey cardinality is corpus-scaled — no
    broadcast), filter in exact integer arithmetic (2·cents·n > 3·sum ⟺
    price > 1.5·avg, no float compare), tiny grouped count out."""
    from ..stages.joins import hash_join

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])

    def cents_tbl(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "cents": pa.array(_cents(np.asarray(t.column("o_totalprice"))), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    facts = orders.map_batches(cents_tbl, batch_format="pyarrow")

    def agg_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_custkey": t.column("o_custkey").to_pylist(),
             "s": t.column("cents").to_pylist()}
        )
        g = df.groupby("o_custkey", as_index=False).agg(s=("s", "sum"), c=("s", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cust_stats = _gagg(
        facts.map_batches(agg_partial, batch_format="pyarrow"),
        "o_custkey", Sum("s", alias_name="s"), Sum("c", alias_name="c"),
    )
    joined = hash_join(facts, cust_stats, ["o_custkey"])

    def filt_count(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                                 "n_above": pd.Series([], dtype="int64")})
        keep = 2 * df["cents"].astype("int64") * df["c"].astype("int64") \
            > 3 * df["s"].astype("int64")
        g = (
            df.loc[keep]
            .groupby("o_orderpriority", as_index=False)
            .size()
            .rename(columns={"size": "n_above"})
        )
        g["n_above"] = g["n_above"].astype("int64")
        return g

    return (
        joined.map_batches(filt_count, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_above", alias_name="n_above"))
    )


def q_customers_without_urgent_orders(sf_dir: str):
    """Exact distributed ANTI join at fact-table scale: customers with no
    1-URGENT order (every customer has SOME order at test scale, so the
    unfiltered anti would pass vacuously). A Bloom filter CANNOT prune an
    anti-join safely (a false positive would silently DROP a legitimate
    survivor — the dual of the semi-join case, where false positives only
    cost verify work), so the plan is exact end-to-end: the fact side is
    predicate-filtered at the read, reduces to DISTINCT keys via a
    per-batch combiner (narrow shuffle, one row per key), then ONE
    partitioned hash LEFT join against customers keeps rows with no match.
    Neither side is ever broadcast or collected."""
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    urgent = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                    "1-URGENT")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    okeys = pre_aggregated_count(urgent, ["o_custkey"], "m").map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                            "m": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})
        if t.num_rows else pa.table({"c_custkey": pa.array([], pa.int64()),
                                     "m": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    joined = hash_join(cust, okeys, on=("c_custkey",), how="left")

    def anti(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "m" not in t.column_names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "c_name": pa.array([], pa.string())})
        # the pandas left-merge surfaces misses as NaN in a float column;
        # depending on the block conversion they arrive as null OR NaN
        keep = t.filter(pc.is_null(t.column("m"), nan_is_null=True))
        return pa.table({"c_custkey": pc.cast(keep.column("c_custkey"), pa.int64()),
                         "c_name": pc.cast(keep.column("c_name"), pa.string())})

    return joined.map_batches(anti, batch_format="pyarrow")


def q_customers_all_priorities(sf_dir: str):
    """RELATIONAL DIVISION (set-containment join): customers whose orders
    cover EVERY priority level that occurs in the fact table — the
    'suppliers who stock all parts' query shape, absent from most engines'
    primitive sets. Scale plan: distinct (custkey, priority) pairs via the
    per-batch combiner (narrow shuffle, one row per pair), per-customer
    pair counts the same way, the divisor cardinality from the
    vocabulary-sized priority table (broadcast as a scalar), and one
    partitioned hash join to attach customer names. No side is ever
    collected at fact scale."""
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    pairs = pre_aggregated_count(
        _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"]),
        ["o_custkey", "o_orderpriority"], "m"
    )
    per_cust = pre_aggregated_count(
        pairs.map_batches(lambda t: t.select(["o_custkey"]), batch_format="pyarrow"),
        ["o_custkey"], "n_prio"
    )
    divisor = pre_aggregated_count(
        _rp(sf_dir, "orders", ["o_orderpriority"]), ["o_orderpriority"], "m"
    ).count()  # vocabulary-sized (5) — the broadcast scalar

    covering = per_cust.map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(
            t.filter(pc.equal(t.column("n_prio"), divisor)).column("o_custkey"),
            pa.int64())})
        if t.num_rows else pa.table({"c_custkey": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    out = hash_join(cust, covering, on=("c_custkey",))
    return out.map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                            "c_name": pc.cast(t.column("c_name"), pa.string())}),
        batch_format="pyarrow",
    )


def q_nation_presence_outer(sf_dir: str):
    """J-family FULL OUTER join on the partitioned hash-join path
    (how="outer"): nations of the first 50 customers vs nations of the first
    50 suppliers — the capped key sets genuinely differ, so both sides
    contribute null-extended rows (COALESCEd to 0 counts). Both sides are
    pre-aggregated to nation granularity before the join."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    def side(table: str, key_col: str, id_col: str, out: str):
        ds = _rp(sf_dir, table, [id_col, key_col])

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less_equal(pc.cast(t.column(id_col), pa.int64()), 50))
            k = pc.cast(t.column(key_col), pa.int64()).to_numpy()
            uniq, cnt = np.unique(k, return_counts=True)
            return pa.table({"nationkey": pa.array(uniq.astype(np.int64), pa.int64()),
                             out: pa.array(cnt.astype(np.int64), pa.int64())})

        return grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["nationkey"],
            Sum(out, alias_name=out),
        )

    joined = hash_join(
        side("customer", "c_nationkey", "c_custkey", "n_cust"),
        side("supplier", "s_nationkey", "s_suppkey", "n_supp"),
        on=("nationkey",), how="outer",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                                 "n_cust": pd.Series([], dtype="int64"),
                                 "n_supp": pd.Series([], dtype="int64")})
        df["nationkey"] = df["nationkey"].astype("int64")
        df["n_cust"] = df["n_cust"].fillna(0).astype("int64")
        df["n_supp"] = df["n_supp"].fillna(0).astype("int64")
        return df[["nationkey", "n_cust", "n_supp"]]

    return joined.map_batches(finish, batch_format="pandas")


def q_orders_cube(sf_dir: str):
    """Full CUBE(priority, status): all four grouping sets derived from ONE
    finest distributed pre-aggregate (priority × status is bounded — ≤ |P|·|S|
    rows no matter the corpus), so the fact table is scanned exactly once.
    The coarser grains are rolled up from the tiny finest table — the same
    plan shape as ``orders_rollup``, extended from the linear ROLLUP lattice
    to the full 2^k CUBE lattice."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "priority": t.column("o_orderpriority").to_pylist(),
                "status": t.column("o_orderstatus").to_pylist(),
                "total_cents": _cents(np.asarray(t.column("o_totalprice"))),
            }
        )
        g = df.groupby(["priority", "status"], as_index=False).agg(
            n_orders=("total_cents", "size"), total_cents=("total_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["priority", "status"],
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    ).to_pandas()

    def roll(dims: list[str]) -> pd.DataFrame:
        if dims:
            g = fine.groupby(dims, as_index=False)[["n_orders", "total_cents"]].sum()
        else:
            g = pd.DataFrame(
                {"n_orders": [fine["n_orders"].sum()],
                 "total_cents": [fine["total_cents"].sum()]}
            )
        for c in ("priority", "status"):
            if c not in g.columns:
                g[c] = "ALL"
        return g

    out = pd.concat([fine, roll(["priority"]), roll(["status"]), roll([])],
                    ignore_index=True)
    out = out[["priority", "status", "n_orders", "total_cents"]].astype(
        {"n_orders": "int64", "total_cents": "int64"})
    return pa.Table.from_pandas(out, preserve_index=False)


def q_nations_except_all(sf_dir: str):
    """EXCEPT ALL — BAG semantics the set-op family lacks: multiplicities
    survive (a key occurring l times among customers and r times among
    suppliers keeps max(0, l−r) occurrences). Represented as (k, n) counts —
    the multiset in aggregate form, so the result is key-vocabulary-sized
    instead of exploding surviving rows. Per-batch side-tagged count partials
    → one bucketed aggregate → row-local clamp; no joins, no driver sets."""
    from ..stages.canonicalize import grouped_aggregate

    def side(name: str, col: str, tag: int) -> "ray.data.Dataset":
        def partial(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column(col), pa.int64()).to_numpy()
            uniq, cnt = np.unique(k, return_counts=True)
            c = cnt.astype(np.int64)
            return pa.table(
                {"k": pa.array(uniq, pa.int64()),
                 "l": pa.array(c if tag == 0 else np.zeros_like(c), pa.int64()),
                 "r": pa.array(c if tag == 1 else np.zeros_like(c), pa.int64())}
            )

        return _rp(sf_dir, name, [col]).map_batches(partial, batch_format="pyarrow")

    both = side("customer", "c_nationkey", 0).union(side("supplier", "s_nationkey", 1))
    agg = grouped_aggregate(both, ["k"], Sum("l", alias_name="l"),
                            Sum("r", alias_name="r"))

    def finish(t: pa.Table) -> pa.Table:
        l = pc.cast(t.column("l"), pa.int64()).to_numpy()
        r = pc.cast(t.column("r"), pa.int64()).to_numpy()
        n = l - r
        keep = n > 0
        return pa.table({"k": pa.array(pc.cast(t.column("k"), pa.int64()).to_numpy()[keep], pa.int64()),
                         "n": pa.array(n[keep], pa.int64())})

    return _nonempty_or_empty_table(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema([("k", pa.int64()), ("n", pa.int64())]))


_COOC_MIN_ORDERS = 2


def q_part_cooccurrence(sf_dir: str):
    """Market-basket pair co-occurrence: for every unordered part pair
    (a < b) that ships together in ≥ 2 orders, the number of co-orders —
    the candidate-pair primitive behind item-item recommenders and
    association-rule mining (the within-group pair ENUMERATION dual of the
    meta_blocking weight rule). Plan: the fact table reduces to distinct
    16-byte (orderkey, partkey) rows; coarse hash buckets (orderkey % P)
    co-locate whole baskets, a vectorized within-bucket self-merge emits
    each basket's O(k²) pairs PRE-AGGREGATED per bucket, and one
    pair-keyed aggregate folds buckets. Pair blow-up is bounded by the
    basket cap k (TPC-H: ≤ 7 lineitems/order; real carts are UI-bounded),
    so the exchange is O(rows·k), never O(|parts|²) — the same
    bounded-group contract as event_type_transitions. Mirrors the
    reference's entity co-occurrence counting (notebooks/project_code.ipynb
    augmentation pool, pairs within a sentence) at order granularity."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        ok = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(ok % P, pa.int64()))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pair key packed into ONE int64 (a<<32 | b, 31-bit ids enforced)
        # so the pair aggregate takes the single-int groupby fast path
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        if m.empty:
            return pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        a = m["l_partkey_a"].to_numpy(dtype=np.int64)
        b = m["l_partkey_b"].to_numpy(dtype=np.int64)
        if a.max() >= 1 << 31 or b.max() >= 1 << 31:
            raise ValueError("part ids exceed 31 bits — widen the pair key")
        out = (pd.DataFrame({"k": (a << 32) | b})
               .groupby("k", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    pairs = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    agg = grouped_aggregate(pairs, ["k"], Sum("n", alias_name="n_orders"))

    def unpack_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t.column("n_orders"),
                                      _COOC_MIN_ORDERS))
        k = pc.cast(f.column("k"), pa.int64()).to_numpy()
        return pa.table(
            {"part_a": pa.array(k >> np.int64(32), pa.int64()),
             "part_b": pa.array(k & ((1 << 32) - 1), pa.int64()),
             "n_orders": pc.cast(f.column("n_orders"), pa.int64())})

    return agg.map_batches(unpack_filter, batch_format="pyarrow")


def q_part_triples(sf_dir: str):
    """Apriori step 2: frequent 3-ITEMSETS — unordered part triples
    co-ordered in ≥ 2 orders, extending part_cooccurrence's pairs to the
    next lattice level. Same bounded-basket contract: the double
    self-merge inside a coarse order-hash bucket emits each basket's
    O(k³) triples pre-aggregated (k ≤ 7 for TPC-H baskets, so ≤ 35
    triples/order); at production scale the Apriori pruning (only extend
    frequent pairs) bounds the candidate set instead — documented here,
    unnecessary at catalogue sizes. Exchange is O(rows·k²), never
    O(|parts|³)."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        ok = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(ok % P, pa.int64()))

    def bucket_triples(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        m3 = m.merge(g.rename(columns={"l_partkey": "l_partkey_c"}),
                     on="l_orderkey")
        m3 = m3[m3["l_partkey_b"] < m3["l_partkey_c"]]
        if m3.empty:
            return pd.DataFrame({"part_a": pd.Series([], dtype="int64"),
                                 "part_b": pd.Series([], dtype="int64"),
                                 "part_c": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        out = (m3.groupby(["l_partkey_a", "l_partkey_b", "l_partkey_c"],
                          as_index=False)
               .size().rename(columns={"l_partkey_a": "part_a",
                                       "l_partkey_b": "part_b",
                                       "l_partkey_c": "part_c",
                                       "size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    agg = grouped_aggregate(
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_triples, batch_format="pandas"),
        ["part_a", "part_b", "part_c"], Sum("n", alias_name="n_orders"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_orders"),
                                            _COOC_MIN_ORDERS)),
        batch_format="pyarrow")


def q_part_lift(sf_dir: str):
    """Association-rule LIFT for frequent part pairs in integer ppm:
    lift(a,b) = P(ab)/(P(a)·P(b)) = n_ab·N / (n_a·n_b) — the rule-mining
    score layered on part_cooccurrence's pair counts (> 10⁶ ppm ⇒
    positively associated). Item supports are attached to the pair table
    by TWO partitioned hash joins (item vocabulary is corpus-scale at
    100 TB — never broadcast); N is one count. All integers:
    lift_ppm = 10⁶·n_ab·N // (n_a·n_b), big-int finish per row on the
    pair-cardinality table."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        ok = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(ok % P, pa.int64()))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pair key packed into ONE int64 (a<<32 | b, 31-bit ids enforced —
        # co_order_edges' convention) so the pair aggregate takes the
        # single-int groupby fast path, not the ~10×-slower multi-key path
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        if m.empty:
            return pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        a = m["l_partkey_a"].to_numpy(dtype=np.int64)
        b = m["l_partkey_b"].to_numpy(dtype=np.int64)
        if a.max() >= 1 << 31 or b.max() >= 1 << 31:
            raise ValueError("part ids exceed 31 bits — widen the pair key")
        out = (pd.DataFrame({"k": (a << 32) | b})
               .groupby("k", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    def bucket_items(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (order, part) must dedupe across the WHOLE order — the
        # coarse bucket co-locates whole orders (a per-batch dedup would
        # double-count orders straddling batches and skew every lift)
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        out = (g.groupby("l_partkey", as_index=False)
               .size().rename(columns={"l_partkey": "pk", "size": "ni"}))
        return out.astype({"pk": "int64", "ni": "int64"})

    pre = ds.map_batches(add_part, batch_format="pyarrow").materialize()
    pairs = grouped_aggregate(
        pre.groupby("__part").map_groups(bucket_pairs, batch_format="pandas"),
        ["k"], Sum("n", alias_name="n_ab"))
    # materialize the two aggregate outputs (pair- and vocab-cardinality):
    # hash_join reads .schema() from each side, which on a LAZY aggregate
    # re-executes its whole lineage — unmaterialized, this plan ran the
    # pair/item aggregates up to 3× (60 s → 13 s at sf0.1/32cpus)
    _UNPACK32 = (1 << 32) - 1

    def unpack_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t.column("n_ab"), _COOC_MIN_ORDERS))
        k = pc.cast(f.column("k"), pa.int64()).to_numpy()
        return pa.table({"part_a": pa.array(k >> np.int64(32), pa.int64()),
                         "part_b": pa.array(k & _UNPACK32, pa.int64()),
                         "n_ab": pc.cast(f.column("n_ab"), pa.int64())})

    pairs = pairs.map_batches(unpack_filter,
                              batch_format="pyarrow").materialize()
    items = grouped_aggregate(
        pre.groupby("__part").map_groups(bucket_items, batch_format="pandas"),
        ["pk"], Sum("ni", alias_name="ni")).materialize()
    n_orders = int(_rp(sf_dir, "orders", ["o_orderkey"]).count())

    ja = hash_join(
        pairs.map_batches(
            lambda t: pa.table({"pk": t.column("part_a"),
                                "part_b": t.column("part_b"),
                                "n_ab": t.column("n_ab")}),
            batch_format="pyarrow"),
        items.map_batches(
            lambda t: pa.table({"pk": t.column("pk"),
                                "n_a": t.column("ni")}),
            batch_format="pyarrow"),
        on=("pk",)).materialize()  # pair-sized; jb's schema probe re-runs ja otherwise
    jb = hash_join(
        ja.map_batches(
            lambda df: pd.DataFrame(
                {"part_a": df["pk"], "pk": df["part_b"],
                 "n_ab": df["n_ab"], "n_a": df["n_a"]}).astype("int64")
            if len(df) else pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("part_a", "pk", "n_ab", "n_a")}),
            batch_format="pandas"),
        items.map_batches(
            lambda t: pa.table({"pk": t.column("pk"),
                                "n_b": t.column("ni")}),
            batch_format="pyarrow"),
        on=("pk",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("part_a", "part_b", "n_ab",
                                           "lift_ppm")})
        out = pd.DataFrame({"part_a": df["part_a"], "part_b": df["pk"],
                            "n_ab": df["n_ab"]})
        lift = [(1_000_000 * int(ab) * n_orders) // (int(a) * int(b))
                for ab, a, b in zip(df["n_ab"], df["n_a"], df["n_b"])]
        out["lift_ppm"] = lift
        return out.astype("int64")

    return jb.map_batches(finish, batch_format="pandas")


def q_nation_share_of_region(sf_dir: str):
    """Share-of-parent in a dimension hierarchy: each nation's revenue as
    integer ppm of its REGION's revenue — the drill-down percentage every
    rollup report shows next to the absolute number. One fact scan feeds a
    nation-keyed integer aggregate; the parent totals are a second
    aggregate OF THE FIRST (region table is dimension-sized), attached by
    a dimension-side join — the fact table is never re-scanned or
    re-shuffled for the parent level (same one-scan contract as
    orders_cube). share_ppm = 10⁶·nation // region, exact."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _rp(sf_dir, "region", ["r_regionkey", "r_name"])

    facts = hash_join(
        orders.map_batches(
            lambda t: pa.table(
                {"c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                 "cents": pa.array(_cents(np.asarray(t.column("o_totalprice"))),
                                   pa.int64())}),
            batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.table(
                {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                 "n_nationkey": pc.cast(t.column("c_nationkey"),
                                        pa.int64())}),
            batch_format="pyarrow"),
        on=("c_custkey",))

    def npart(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n_nationkey": pd.Series([], dtype="int64"),
                                 "cents": pd.Series([], dtype="int64")})
        return (df.groupby("n_nationkey", as_index=False)["cents"].sum()
                .astype("int64"))

    per_nation = grouped_aggregate(
        facts.map_batches(npart, batch_format="pandas"),
        ["n_nationkey"], Sum("cents", alias_name="cents")).to_pandas()

    nat = {int(r["n_nationkey"]): (str(r["n_name"]), int(r["n_regionkey"]))
           for r in nation.take_all()}
    reg = {int(r["r_regionkey"]): str(r["r_name"]) for r in region.take_all()}
    per_nation["rk"] = [nat[k][1] for k in per_nation["n_nationkey"]]
    rtot = per_nation.groupby("rk")["cents"].sum().to_dict()
    rows = sorted(
        (nat[int(k)][0], reg[int(r)], int(c),
         (1_000_000 * int(c)) // int(rtot[r]))
        for k, r, c in zip(per_nation["n_nationkey"], per_nation["rk"],
                           per_nation["cents"]))
    return pa.table(
        {"n_name": pa.array([r[0] for r in rows], pa.string()),
         "r_name": pa.array([r[1] for r in rows], pa.string()),
         "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
         "share_ppm": pa.array([r[3] for r in rows], pa.int64())})


def q_priority_month_chi2(sf_dir: str):
    """CHI-SQUARE independence statistic for the (order priority × month)
    contingency table in exact integers — does priority mix drift by
    season? Cell χ² contribution ≈ (o·N − r·c)²/(r·c·N), scaled to ppm
    with the SAME truncation on both engines, so the summed statistic is
    hash-exact (a float χ² would differ in the last ulp). Shuffle is one
    contingency-cell aggregate (≤ |priorities|·|months| rows); margins and
    the fold run on that bounded table."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        months = pd.Series(t.column("o_orderdate").to_pandas()).dt.strftime("%Y-%m")
        df = pd.DataFrame({"priority": t.column("o_orderpriority").to_pylist(),
                           "month": months,
                           "n": np.ones(t.num_rows, np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["priority", "month"], as_index=False).sum(),
            preserve_index=False)

    cells = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["priority", "month"], Sum("n", alias_name="n")).to_pandas()
    N = int(cells["n"].sum())
    rm = cells.groupby("priority")["n"].sum().to_dict()
    cm = cells.groupby("month")["n"].sum().to_dict()
    chi2 = 0
    for r in cells.itertuples(index=False):
        o, rr, cc = int(r.n), int(rm[r.priority]), int(cm[r.month])
        num = (o * N - rr * cc)
        chi2 += (1_000_000 * num * num) // (rr * cc * N)
    return pa.table({"n": pa.array([N], pa.int64()),
                     "n_cells": pa.array([len(cells)], pa.int64()),
                     "chi2_ppm": pa.array([chi2], pa.int64())})


_Z_BITS = 16


def q_orders_zorder(sf_dir: str):
    """Z-ORDER (Morton) curve index per order from (price, date) — the
    multi-dimensional clustering key a lakehouse sorts by before writing
    so range predicates on EITHER column prune row groups (1-D sort keys
    prune only their own column). Both dimensions quantize to 16-bit
    lattice coordinates with exact integer scaling, then bits interleave
    (x even positions, y odd) — a pure row-local vectorized map, ZERO
    shuffle; the layout sort itself is the existing range-partitioned
    machinery. Emits (o_orderkey, zx, zy, zvalue)."""
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def zmap(t: pa.Table) -> pa.Table:
        cents = _cents(np.asarray(t.column("o_totalprice")))
        day = (t.column("o_orderdate").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        # 16-bit lattice: cents // 4096 (≤ ~$2.7M), day − 9131 (1995-01-01
        # epoch day) — both clamped into [0, 2^16)
        zx = np.clip(cents // 4096, 0, (1 << _Z_BITS) - 1)
        zy = np.clip(day - 9131, 0, (1 << _Z_BITS) - 1)
        z = np.zeros(len(zx), np.int64)
        for i in range(_Z_BITS):
            z |= ((zx >> i) & 1) << (2 * i)
            z |= ((zy >> i) & 1) << (2 * i + 1)
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "zx": pa.array(zx, pa.int64()), "zy": pa.array(zy, pa.int64()),
             "zvalue": pa.array(z, pa.int64())})

    return ds.map_batches(zmap, batch_format="pyarrow")


_CUME_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_order_cume_dist(sf_dir: str):
    """Per-group CUME_DIST (fraction of the group at or below each value) in
    exact ppm for every order within its priority class — the window
    function SQL computes with PARTITION BY … RANGE UNBOUNDED PRECEDING,
    done distributed WITHOUT a global sort: the fact reduces to a
    (priority, cents) value HISTOGRAM (distinct-value sized); the
    within-group cumulative comes from the range-partitioned
    ``keyed_prefix_sum`` over a PACKED (prio_idx << 44 | cents) int key —
    group boundaries fall out by subtracting each group's base offset
    (five numbers from a tiny per-group total, shipped in the closure) —
    and every order row meets its group cumulative via ONE
    single-int-key hash join. cume_ppm = 10⁶·|{≤ v}| // n exactly.
    Output: (o_orderkey, o_orderpriority, cents, cume_ppm)."""
    from ..functions.rank import keyed_prefix_sum
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    pidx = {p: i for i, p in enumerate(_CUME_PRIOS)}

    def keyed(t: pa.Table) -> pa.Table:
        cents = _cents(np.asarray(t.column("o_totalprice")))
        pi = np.fromiter((pidx[p] for p in
                          t.column("o_orderpriority").to_pylist()),
                         np.int64, t.num_rows)
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "pk": pa.array((pi << 44) | cents, pa.int64())})

    rows = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"pk": t.column("pk"),
                         "k": pa.array(np.ones(t.num_rows, np.int64))})

    hist = grouped_aggregate(
        rows.map_batches(ones, batch_format="pyarrow"),
        ["pk"], Sum("k", alias_name="k"),
    ).materialize()

    def to_prio(t: pa.Table) -> pa.Table:
        return pa.table(
            {"pi": pa.array(pc.cast(t.column("pk"), pa.int64()).to_numpy()
                            >> 44, pa.int64()),
             "k": t.column("k")})

    totals = {int(r["pi"]): int(r["k"]) for r in grouped_aggregate(
        hist.map_batches(to_prio, batch_format="pyarrow"),
        ["pi"], Sum("k", alias_name="k")).take_all()}
    base, acc = {}, 0
    for i in range(len(_CUME_PRIOS)):
        base[i] = acc
        acc += totals.get(i, 0)

    cum = keyed_prefix_sum(hist, "pk", "k", out="ps")

    def finish(t: pa.Table) -> pa.Table:
        pk = pc.cast(t.column("pk"), pa.int64()).to_numpy()
        pi = pk >> 44
        k = pc.cast(t.column("k"), pa.int64()).to_numpy()
        ps = pc.cast(t.column("ps"), pa.int64()).to_numpy()
        b = np.fromiter((base[int(i)] for i in pi), np.int64, len(pi))
        n = np.fromiter((totals[int(i)] for i in pi), np.int64, len(pi))
        cle = ps + k - b
        return pa.table(
            {"pk": pa.array(pk, pa.int64()),
             "cume_ppm": pa.array(1_000_000 * cle // n, pa.int64())})

    joined = hash_join(rows, cum.map_batches(finish, batch_format="pyarrow"),
                       on=("pk",))

    def out(t: pa.Table) -> pa.Table:
        pk = pc.cast(t.column("pk"), pa.int64()).to_numpy()
        pi = (pk >> 44).astype(np.int64)
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "o_orderpriority": pa.array([_CUME_PRIOS[i] for i in pi],
                                         pa.string()),
             "cents": pa.array(pk & ((1 << 44) - 1), pa.int64()),
             "cume_ppm": pc.cast(t.column("cume_ppm"), pa.int64())})

    return joined.map_batches(out, batch_format="pyarrow")


def q_orders_zonemap(sf_dir: str):
    """ZONE-MAP (data-skipping metadata) generation — the lakehouse
    companion to `orders_zorder` and the `compact` maintenance op: per
    1000-key tile of the order-key space, min/max of price and date plus
    the row count, i.e. exactly the per-row-group stats a reader consults
    to prune scans. Min/max/count are all mergeable, so each batch emits
    one pre-aggregated row per tile it touches and the shuffle is
    tile-sized, never fact-sized. Output: (tile, n, min_cents, max_cents,
    min_day, max_day)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "orders",
             ["o_orderkey", "o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()
        cents = _cents(np.asarray(t.column("o_totalprice")))
        day = (t.column("o_orderdate").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        tile = key // 1000
        u, inv = np.unique(tile, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mn_c = np.full(len(u), np.iinfo(np.int64).max)
        mx_c = np.full(len(u), np.iinfo(np.int64).min)
        mn_d = mn_c.copy(); mx_d = mx_c.copy()
        np.minimum.at(mn_c, inv, cents); np.maximum.at(mx_c, inv, cents)
        np.minimum.at(mn_d, inv, day); np.maximum.at(mx_d, inv, day)
        return pa.table(
            {"tile": pa.array(u, pa.int64()),
             "n": pa.array(n, pa.int64()),
             "min_cents": pa.array(mn_c, pa.int64()),
             "max_cents": pa.array(mx_c, pa.int64()),
             "min_day": pa.array(mn_d, pa.int64()),
             "max_day": pa.array(mx_d, pa.int64())})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["tile"], Sum("n", alias_name="n"),
        Min("min_cents", alias_name="min_cents"),
        Max("max_cents", alias_name="max_cents"),
        Min("min_day", alias_name="min_day"),
        Max("max_day", alias_name="max_day"))


_NTILE_K = 10


def q_order_deciles(sf_dir: str):
    """Per-row NTILE(10) decile assignment over the (price, orderkey) total
    order — equi-depth bucketing of every row, the label the feature store
    attaches before stratified sampling (complements price_deciles, which
    emits only the 9 boundaries). Plan: range-partitioned global_rank (one
    narrow histogram pass + ONE full-row shuffle, no global sort), a
    metadata-cheap count() for n, then a row-local piecewise map replicating
    SQL NTILE exactly: the first n mod k tiles hold ⌈n/k⌉ rows, the rest
    ⌊n/k⌋ — NOT the ⌊(rank−1)·k/n⌋ approximation, which diverges from NTILE
    whenever k ∤ n."""
    from ..functions.rank import global_rank

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n = ds.count()
    base, rem = divmod(n, _NTILE_K)
    cut = rem * (base + 1)
    ranked = global_rank(ds, "o_totalprice", "o_orderkey",
                         descending=False, n_buckets=32)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rank"].to_numpy(dtype=np.int64)
        if base == 0:
            tile = (r - 1) // (base + 1) + 1
        else:
            tile = np.where(r <= cut, (r - 1) // (base + 1) + 1,
                            rem + (r - cut - 1) // base + 1)
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].astype("int64"),
                             "decile": tile.astype("int64")})

    return ranked.map_batches(finish, batch_format="pandas")


_MELT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT / melt wide→long (the inverse of events_pivot): the four
    lineitem measures become (orderkey, linenumber, measure, value_cents)
    rows — the reshape feeding any per-measure generic pipeline (histogram,
    outlier gate, drift) without per-measure code. Pure row-local
    vectorized expansion inside map_batches — a k× row flat-map with ZERO
    shuffle at any scale; value unification to integer centi-units keeps
    the long column hash-comparable."""
    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", *_MELT_MEASURES])

    def melt(t: pa.Table) -> pa.Table:
        ok = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        ln = pc.cast(t.column("l_linenumber"), pa.int64()).to_numpy()
        oks, lns, ms, vs = [], [], [], []
        for m in _MELT_MEASURES:
            v = np.floor(np.asarray(t.column(m), dtype=np.float64)
                         * 100 + 0.5).astype(np.int64)
            oks.append(ok)
            lns.append(ln)
            ms.append(np.full(len(ok), m, dtype=object))
            vs.append(v)
        return pa.table(
            {"l_orderkey": pa.array(np.concatenate(oks), pa.int64()),
             "l_linenumber": pa.array(np.concatenate(lns), pa.int64()),
             "measure": pa.array(np.concatenate(ms), pa.string()),
             "value_cents": pa.array(np.concatenate(vs), pa.int64())})

    return ds.map_batches(melt, batch_format="pyarrow")


def q_revenue_mom(sf_dir: str):
    """Month-over-month revenue GROWTH in integer basis points — the
    period-over-period delta every reporting pipeline derives after the
    calendar rollup. The corpus reduces to a month-keyed Sum aggregate
    (timeline-sized at any scale — same contract as
    cumulative_distinct_users); the lag + ratio then run on that small
    table: delta_bps = trunc(10⁴·(cur − prev) / prev), truncation toward
    zero to match DuckDB ``//``. First month has no predecessor and is
    dropped (not zero-filled) on both sides."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        months = pd.Series(t.column("o_orderdate").to_pandas()).dt.strftime("%Y-%m")
        df = pd.DataFrame({"month": months,
                           "rev": _cents(np.asarray(t.column("o_totalprice")))})
        g = df.groupby("month", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["month"], Sum("rev", alias_name="rev")).to_pandas()
    m = m.sort_values("month").reset_index(drop=True)
    rows = []
    for i in range(1, len(m)):
        cur, prev = int(m["rev"][i]), int(m["rev"][i - 1])
        num = 10_000 * (cur - prev)
        bps = -((-num) // prev) if num < 0 else num // prev
        rows.append((str(m["month"][i]), cur, bps))
    return pa.table(
        {"month": pa.array([r[0] for r in rows], pa.string()),
         "revenue_cents": pa.array([r[1] for r in rows], pa.int64()),
         "delta_bps": pa.array([r[2] for r in rows], pa.int64())})


def q_nation_priority_grid(sf_dir: str):
    """DENSE dimension grid with zero-fill: every (nation, priority) cell
    of the report matrix, including combinations no order hit — reporting
    and ML feature matrices need the zeros a plain groupby never emits.
    Plan: facts reduce to a (nation, priority) count aggregate (orders ⋈
    customer on the partitioned hash-join path); the full grid is the
    CROSS PRODUCT of the nation dimension with the (bounded) priority
    vocabulary — 25 × 5 rows built in-memory — LEFT-joined to the counts,
    nulls → 0. The grid side is dimension-sized at any fact count."""
    import ray.data as _rd

    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_name"])

    joined = hash_join(
        orders.map_batches(
            lambda t: pa.table({"c_custkey": pc.cast(t.column("o_custkey"),
                                                     pa.int64()),
                                "priority": t.column("o_orderpriority")}),
            batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.table({"c_custkey": pc.cast(t.column("c_custkey"),
                                                     pa.int64()),
                                "n_nationkey": pc.cast(
                                    t.column("c_nationkey"), pa.int64())}),
            batch_format="pyarrow"),
        on=("c_custkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n_nationkey": pd.Series([], dtype="int64"),
                                 "priority": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        g = (df.groupby(["n_nationkey", "priority"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return g.astype({"n_nationkey": "int64", "n": "int64"})

    counts = grouped_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["n_nationkey", "priority"], Sum("n", alias_name="n"))

    nat = sorted((int(r["n_nationkey"]), str(r["n_name"]))
                 for r in nation.take_all())
    prios = sorted(set(
        r["priority"] for r in
        orders.map_batches(
            lambda t: pa.table(
                {"priority": pc.unique(t.column("o_orderpriority"))}),
            batch_format="pyarrow").take_all()))
    grid = _rd.from_arrow(pa.table(
        {"n_nationkey": pa.array([k for k, _ in nat for _p in prios],
                                 pa.int64()),
         "n_name": pa.array([nm for _, nm in nat for _p in prios],
                            pa.string()),
         "priority": pa.array([p for _ in nat for p in prios],
                              pa.string())}))

    out = hash_join(grid, counts, on=("n_nationkey", "priority"), how="left")
    return out.map_batches(
        lambda df: pd.DataFrame(
            {"n_name": df["n_name"].astype("object"),
             "priority": df["priority"].astype("object"),
             "n_orders": df["n"].fillna(0).astype("int64")})
        if len(df) else pd.DataFrame(
            {"n_name": pd.Series([], dtype="object"),
             "priority": pd.Series([], dtype="object"),
             "n_orders": pd.Series([], dtype="int64")}),
        batch_format="pandas")


def q_integrity_audit(sf_dir: str):
    """Referential-INTEGRITY audit between a fact table and its parent:
    orphan lineitems (no matching order) and childless orders (no lines) —
    the consistency check an ingest job runs before trusting a join. ONE
    side-tagged union keyed on orderkey (orders emit (k, 1, 0); lineitem
    batches pre-aggregate to (k, 0, n)), one keyed aggregate
    (Max tag / Sum lines), then 4 global sums over the key-cardinality
    table — no join, no second pass, and only 24 B/key ever shuffles.
    Output is a single audit row."""
    from ..stages.canonicalize import grouped_aggregate

    o = _rp(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda t: pa.table(
            {"k": pc.cast(t.column("o_orderkey"), pa.int64()),
             "is_order": pa.array(np.ones(t.num_rows, np.int64)),
             "nl": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow")

    def li_part(t: pa.Table) -> pa.Table:
        k, cnt = np.unique(pc.cast(t.column("l_orderkey"), pa.int64())
                           .to_numpy(), return_counts=True)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "is_order": pa.array(np.zeros(len(k), np.int64)),
                         "nl": pa.array(cnt.astype(np.int64), pa.int64())})

    li = _rp(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        li_part, batch_format="pyarrow")

    per_key = grouped_aggregate(o.union(li), ["k"],
                                Max("is_order", alias_name="is_order"),
                                Sum("nl", alias_name="nl"))

    def tallies(t: pa.Table) -> pa.Table:
        iso = pc.cast(t.column("is_order"), pa.int64()).to_numpy()
        nl = pc.cast(t.column("nl"), pa.int64()).to_numpy()
        return pa.table(
            {"n_orders": pa.array([int(iso.sum())], pa.int64()),
             "n_lines": pa.array([int(nl.sum())], pa.int64()),
             "n_orphan_lines": pa.array([int(nl[iso == 0].sum())], pa.int64()),
             "n_childless_orders": pa.array(
                 [int(((iso == 1) & (nl == 0)).sum())], pa.int64())})

    sums = per_key.map_batches(tallies, batch_format="pyarrow").sum(
        ["n_orders", "n_lines", "n_orphan_lines", "n_childless_orders"])
    return pa.table({c: pa.array([int(sums[f"sum({c})"])], pa.int64())
                     for c in ("n_orders", "n_lines", "n_orphan_lines",
                               "n_childless_orders")})


def q_order_skyline(sf_dir: str):
    """SKYLINE / Pareto frontier: orders not dominated on
    (totalprice, orderdate) — b dominates a when b ≥ a on both axes and
    > on at least one; maximal-tradeoff selection (best price for every
    recency, the multi-objective top-k). Distributed dominance: each batch
    reduces to its LOCAL skyline with a vectorized sort-desc + running-max
    sweep (a globally dominated point is dominated inside its own batch
    too, so global ⊆ union of locals), then the union — skyline-sized,
    typically O(log n) for correlated axes; anti-correlated data widens
    it, documented — is resolved exactly on the driver with the same
    sweep. Equal (price, date) duplicates do not dominate each other and
    are all kept."""
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local_sky(t: pa.Table) -> pa.Table:
        pk = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()
        price = _cents(np.asarray(t.column("o_totalprice")))
        day = (t.column("o_orderdate").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)  # timestamp[us] → days
        order, keep = _skyline_mask(pk, price, day)
        sel = order[keep]
        return pa.table({"o_orderkey": pa.array(pk[sel], pa.int64()),
                         "price_cents": pa.array(price[sel], pa.int64()),
                         "day": pa.array(day[sel], pa.int64())})

    cand = ds.map_batches(local_sky, batch_format="pyarrow").take_all()
    pk = np.array([r["o_orderkey"] for r in cand], np.int64)
    price = np.array([r["price_cents"] for r in cand], np.int64)
    day = np.array([r["day"] for r in cand], np.int64)
    order, keep = _skyline_mask(pk, price, day)
    sel = np.sort(order[keep])
    return pa.table({"o_orderkey": pa.array(pk[sel], pa.int64()),
                     "price_cents": pa.array(price[sel], pa.int64()),
                     "day": pa.array(day[sel], pa.int64())})


def _skyline_mask(pk: np.ndarray, price: np.ndarray, day: np.ndarray):
    """(order, keep): rows on the max-max Pareto frontier of (price, day).
    Sweep price groups in descending order; a row survives iff it holds
    its group's max day (an equal-price higher-day row dominates it) AND
    that max strictly exceeds the best day of every strictly-higher price
    group. Exact duplicates on both axes never dominate each other, so
    max-day ties within a group all survive."""
    order = np.lexsort((pk, -day, -price))
    p, d = price[order], day[order]
    keep = np.zeros(len(p), dtype=bool)
    best = np.int64(-(2**62))
    i = 0
    while i < len(p):
        j = i
        while j < len(p) and p[j] == p[i]:
            j += 1
        grp_max = d[i:j].max()
        if grp_max > best:
            keep[i:j] = d[i:j] == grp_max
            best = grp_max
        i = j
    return order, keep


def q_late_order_priority(sf_dir: str):
    """TPC-H Q4 shape — EXISTS semi-join at fact scale: count Q1-1996 orders
    per priority that have at least one RETURNED lineitem. The EXISTS side
    (lineitem, the bigger table) is predicate-filtered at the read and
    reduced to DISTINCT order keys by a per-batch combiner (one 8 B row per
    key — the matching rows themselves never ship), then ONE partitioned
    hash join flags membership; the date window prunes orders BEFORE the
    join. Bloom would be a legal prefilter here (semi-join false positives
    only cost verify work, unlike the anti case) but the distinct-key table
    is already ≤ order-cardinality, so the exact plan wins. Final priority
    histogram is ≤ 5 rows at any scale."""
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    lo, hi = _ts_us("1996-01-01"), _ts_us("1996-04-01")

    def date_window(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, lo), pc.less(us, hi)))
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "o_orderpriority": pc.cast(t.column("o_orderpriority"), pa.string())})

    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        date_window, batch_format="pyarrow")
    returned = _rp(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("l_returnflag"), "R"))
                   .select(["l_orderkey"]),
        batch_format="pyarrow")
    rkeys = pre_aggregated_count(returned, ["l_orderkey"], "m").map_batches(
        lambda t: pa.table({"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64())})
        if t.num_rows else pa.table({"o_orderkey": pa.array([], pa.int64())}),
        batch_format="pyarrow")

    joined = hash_join(orders, rkeys, on=("o_orderkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                                 "n_orders": pd.Series([], dtype="int64")})
        g = df.groupby("o_orderpriority", as_index=False).size().rename(
            columns={"size": "n_orders"})
        return g.astype({"n_orders": "int64"})

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_orders", alias_name="n_orders")))


def q_top_return_customers(sf_dir: str):
    """TPC-H Q10 shape — who returned the most money in H1-1996. Fact×fact
    hash-join chain with aggregation pushed BELOW each join: returned-item
    revenue (exact integer cents, the same IEEE FLOOR(price·(1−disc)·100
    + 0.5) expression both engines) is pre-aggregated PER ORDER before
    joining the date-windowed orders — the join ships one row per order,
    not per lineitem — then re-aggregated per customer, and the top 20 is
    found with a lossless per-batch top-k combiner (any global top-20 row
    is a batch top-20 row), so the customer-sized table never sorts
    globally. Names attach by filtering the customer DIMENSION against the
    broadcast 20-key winner set — never the reverse."""
    from ..stages.joins import hash_join

    lo, hi = _ts_us("1996-01-01"), _ts_us("1996-07-01")
    K = 20

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy(),
             "rev_cents": rev})
        g = df.groupby("o_orderkey", as_index=False)["rev_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_order = _gagg(
        _rp(sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
            ).map_batches(li_partial, batch_format="pyarrow"),
        "o_orderkey", Sum("rev_cents", alias_name="rev_cents"))

    def date_window(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, lo), pc.less(us, hi)))
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "c_custkey": pc.cast(t.column("o_custkey"), pa.int64())})

    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        date_window, batch_format="pyarrow")

    joined = hash_join(per_order, orders, on=("o_orderkey",))

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                                 "revenue_cents": pd.Series([], dtype="int64")})
        g = df.groupby("c_custkey", as_index=False).agg(
            revenue_cents=("rev_cents", "sum"))
        return g.astype({"c_custkey": "int64", "revenue_cents": "int64"})

    per_cust = _gagg(joined.map_batches(cust_partial, batch_format="pandas"),
                     "c_custkey", Sum("revenue_cents", alias_name="revenue_cents"))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "c_custkey"],
                              ascending=[False, True]).head(K)

    top = (per_cust.map_batches(topk, batch_format="pandas")
           .repartition(1).map_batches(topk, batch_format="pandas").take_all())
    winners = {int(r["c_custkey"]): int(r["revenue_cents"]) for r in top}
    wref = ray.put(winners)
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _rp(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()}
    nref = ray.put(nation)

    def attach(t: pa.Table) -> pa.Table:
        w, nm = ray.get(wref), ray.get(nref)
        keys = pc.cast(t.column("c_custkey"), pa.int64()).to_numpy()
        keep = np.array([int(k) in w for k in keys], dtype=bool)
        t = t.filter(pa.array(keep))
        keys = pc.cast(t.column("c_custkey"), pa.int64()).to_numpy()
        return pa.table(
            {"c_custkey": pa.array(keys, pa.int64()),
             "c_name": pc.cast(t.column("c_name"), pa.string()),
             "n_name": pa.array(
                 [nm[int(k)] for k in pc.cast(t.column("c_nationkey"),
                                              pa.int64()).to_numpy()], pa.string()),
             "revenue_cents": pa.array([w[int(k)] for k in keys], pa.int64())})

    return _nonempty_or_empty_table(
        _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).map_batches(
            attach, batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                   ("n_name", pa.string()), ("revenue_cents", pa.int64())]))


def q_part_revenue_share(sf_dir: str):
    """TPC-H Q11 shape — groups exceeding a FRACTION of the GLOBAL total:
    parts whose revenue share exceeds 100 ppm. Two-level exact plan: the
    fact table is scanned ONCE into a per-part integer-cents aggregate;
    the global total is then an aggregate OF THE PART-SIZED TABLE (one
    scalar to the driver — legal at any scale), and the threshold is the
    cross-multiplied integer rev·10⁴ > total — no division in the filter,
    so no rounding ambiguity. share_ppm = rev·10⁶ // total is exact trunc
    division, identical in DuckDB."""
    per_part = _gagg(
        _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]).map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame(
                    {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(),
                     "rev_cents": _cents(np.asarray(t.column("l_extendedprice")))})
                .groupby("p_partkey", as_index=False)["rev_cents"].sum(),
                preserve_index=False),
            batch_format="pyarrow"),
        "p_partkey", Sum("rev_cents", alias_name="rev_cents")).materialize()
    total = int(per_part.sum("rev_cents"))

    def finish(t: pa.Table) -> pa.Table:
        rev = pc.cast(t.column("rev_cents"), pa.int64()).to_numpy()
        keep = rev * 10_000 > total
        rev = rev[keep]
        return pa.table(
            {"p_partkey": pa.array(
                pc.cast(t.column("p_partkey"), pa.int64()).to_numpy()[keep], pa.int64()),
             "rev_cents": pa.array(rev, pa.int64()),
             "share_ppm": pa.array(rev * 1_000_000 // total, pa.int64())})

    return _nonempty_or_empty_table(
        per_part.map_batches(finish, batch_format="pyarrow"),
        pa.schema([("p_partkey", pa.int64()), ("rev_cents", pa.int64()),
                   ("share_ppm", pa.int64())]))


def q_supplier_diversity(sf_dir: str):
    """TPC-H Q16 shape — COUNT(DISTINCT supplier) per part attribute group,
    excluding a dimension-derived blocklist (suppliers in deficit). The
    exclusion must be EXACT (a Bloom false positive would silently DROP a
    legitimate supplier — the anti-join dual), so the blocklist attaches
    via one partitioned hash LEFT join against the DISTINCT (supp, part)
    pair table, which a per-batch combiner reduces FIRST — the join and
    everything downstream run at pair, not lineitem, cardinality. Part
    attributes attach by a second hash join; the distinct count is a third
    combiner + count at group cardinality. Blocklist is empty at sf0.001
    (6 suppliers at sf0.01) — the exclusion path is pinned by a synthetic
    fixture in tests/test_round3_ops.py."""
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    pairs = pre_aggregated_count(
        _rp(sf_dir, "lineitem", ["l_suppkey", "l_partkey"]),
        ["l_suppkey", "l_partkey"], "m").map_batches(
        lambda t: pa.table(
            {"l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
             "p_partkey": pc.cast(t.column("l_partkey"), pa.int64())}),
        batch_format="pyarrow")
    bad = _rp(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"l_suppkey": pc.cast(f.column("s_suppkey"), pa.int64()),
             "bad": pa.array(np.ones(f.num_rows, np.int64), pa.int64())}))(
            t.filter(pc.less(t.column("s_acctbal"), 0.0))),
        batch_format="pyarrow")
    survivors = hash_join(pairs, bad, on=("l_suppkey",), how="left").map_batches(
        lambda t: (t.filter(pc.is_null(t.column("bad"), nan_is_null=True))
                   .select(["l_suppkey", "p_partkey"]))
        if t.num_rows and "bad" in t.column_names
        else (t.select(["l_suppkey", "p_partkey"]) if t.num_rows else pa.table(
            {"l_suppkey": pa.array([], pa.int64()),
             "p_partkey": pa.array([], pa.int64())})),
        batch_format="pyarrow")
    part = _rp(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
             "p_brand": pc.cast(t.column("p_brand"), pa.string()),
             "p_size": pc.cast(t.column("p_size"), pa.int64())}),
        batch_format="pyarrow")
    attrs = hash_join(survivors, part, on=("p_partkey",))
    triple = pre_aggregated_count(
        attrs, ["p_brand", "p_size", "l_suppkey"], "m")
    return pre_aggregated_count(triple, ["p_brand", "p_size"], "n_suppliers")


def q_churned_high_value(sf_dir: str):
    """TPC-H Q22 shape — high-balance customers gone quiet: balance above
    the mean POSITIVE balance, no order since 2000-08-01. The global mean
    is carried as the exact integer pair (total, n) and applied by
    cross-multiplication bal·n > total — no division, so the threshold is
    hash-exact. Recent-order keys reduce to a distinct-key combiner at
    order scale; the anti step is the exact LEFT-join null-match (Bloom is
    unsafe for antis — an FP would drop a legitimate churn risk). Output:
    per-nation count + total balance of the at-risk book."""
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    cutoff = _ts_us("2000-08-01")
    cust = _rp(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
             "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
             "bal_cents": pa.array(_cents(np.asarray(t.column("c_acctbal"))),
                                   pa.int64())}),
        batch_format="pyarrow").materialize()
    stats = cust.map_batches(
        lambda t: (lambda b: pa.table(
            {"tot": pa.array([int(b.sum())], pa.int64()),
             "n": pa.array([int(b.size)], pa.int64())}))(
            pc.cast(t.column("bal_cents"), pa.int64()).to_numpy()[
                pc.cast(t.column("bal_cents"), pa.int64()).to_numpy() > 0]),
        batch_format="pyarrow").sum(["tot", "n"])
    tot, n_pos = int(stats["sum(tot)"]), int(stats["sum(n)"])

    recent = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(
            pc.cast(t.column("o_orderdate"), pa.int64()), cutoff))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    rkeys = pre_aggregated_count(recent, ["o_custkey"], "m").map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
             "m": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})
        if t.num_rows else pa.table({"c_custkey": pa.array([], pa.int64()),
                                     "m": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    joined = hash_join(cust, rkeys, on=("c_custkey",), how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"c_nationkey": pd.Series([], dtype="int64"),
                              "n_customers": pd.Series([], dtype="int64"),
                              "total_bal_cents": pd.Series([], dtype="int64")})
        if df.empty or "m" not in df.columns:
            return empty
        keep = df[df["m"].isna()
                  & (df["bal_cents"].to_numpy(dtype=np.int64) * n_pos > tot)]
        if keep.empty:
            return empty
        g = keep.groupby("c_nationkey", as_index=False).agg(
            n_customers=("bal_cents", "size"), total_bal_cents=("bal_cents", "sum"))
        return g.astype({"c_nationkey": "int64", "n_customers": "int64",
                         "total_bal_cents": "int64"})

    return (joined.map_batches(finish, batch_format="pandas")
            .groupby("c_nationkey")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("total_bal_cents", alias_name="total_bal_cents")))


def q_orders_benford(sf_dir: str):
    """Benford first-digit profile of order totals — the classic fraud /
    synthetic-data smell test. The leading digit comes from a vectorized
    integer divide-down loop (≤ 9 ``//10`` steps on cents — no log10: float
    logs are not bit-reproducible across engines); per-batch digit-count
    partials fold into a ≤ 9-row histogram, and the ppm share is computed
    against the total INSIDE the single final block. Zero joins; the
    exchange is 9 rows at any corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        d = _cents(np.asarray(t.column("o_totalprice")))
        m = d >= 10
        while m.any():
            d[m] //= 10
            m = d >= 10
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(uniq, pa.int64()),
                         "n_orders": pa.array(cnt.astype(np.int64), pa.int64())})

    hist = (_rp(sf_dir, "orders", ["o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("digit").aggregate(Sum("n_orders", alias_name="n_orders")))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_orders"), pa.int64()).to_numpy()
        total = int(n.sum()) or 1
        return pa.table({"digit": pc.cast(t.column("digit"), pa.int64()),
                         "n_orders": pa.array(n, pa.int64()),
                         "share_ppm": pa.array(n * 1_000_000 // total, pa.int64())})

    return hist.repartition(1).map_batches(finish, batch_format="pyarrow")


def q_nations_intersect_all(sf_dir: str):
    """INTERSECT ALL — the bag complement of nations_except_all: a key with
    multiplicity l among customers and r among suppliers keeps min(l, r)
    occurrences. Identical side-tagged count-partial plan (the multiset
    stays in (k, n) aggregate form end to end; no joins, no driver sets);
    only the row-local finish differs (min instead of clamped difference)."""
    from ..stages.canonicalize import grouped_aggregate

    def side(name: str, col: str, tag: int) -> "ray.data.Dataset":
        def partial(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column(col), pa.int64()).to_numpy()
            uniq, cnt = np.unique(k, return_counts=True)
            c = cnt.astype(np.int64)
            return pa.table(
                {"k": pa.array(uniq, pa.int64()),
                 "l": pa.array(c if tag == 0 else np.zeros_like(c), pa.int64()),
                 "r": pa.array(c if tag == 1 else np.zeros_like(c), pa.int64())})

        return _rp(sf_dir, name, [col]).map_batches(partial, batch_format="pyarrow")

    both = side("customer", "c_nationkey", 0).union(side("supplier", "s_nationkey", 1))
    agg = grouped_aggregate(both, ["k"], Sum("l", alias_name="l"),
                            Sum("r", alias_name="r"))

    def finish(t: pa.Table) -> pa.Table:
        l = pc.cast(t.column("l"), pa.int64()).to_numpy()
        r = pc.cast(t.column("r"), pa.int64()).to_numpy()
        n = np.minimum(l, r)
        keep = n > 0
        return pa.table(
            {"k": pa.array(pc.cast(t.column("k"), pa.int64()).to_numpy()[keep],
                           pa.int64()),
             "n": pa.array(n[keep], pa.int64())})

    return _nonempty_or_empty_table(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema([("k", pa.int64()), ("n", pa.int64())]))


_WAIT_GRACE_US = 90 * 86_400_000_000  # 90 days in µs


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape — suppliers who were the SOLE late supplier on a
    multi-supplier order ("late" = any lineitem shipped > 90 days after the
    order date; the schema has no commit/receipt dates). The classic plan is
    EXISTS(other supplier) AND NOT EXISTS(other LATE supplier) — two fact
    self-joins; here both fold into ONE per-order aggregate pass: lineitem
    first reduces to DISTINCT (order, supplier, max_shipdate) — a supplier is
    late iff its LATEST line is (max is the OR-fold of per-line lateness) —
    the pair table hash-joins the date-keyed orders (one row per pair, never
    per lineitem), and a second grouped aggregate computes per order
    (n_suppliers, n_late, argmax-late-supplier) in integer form. The sole
    late supplier is exactly the max of late·suppkey when n_late = 1, so
    the filter + final per-supplier count never revisit the fact table."""
    from ..stages.canonicalize import grouped_aggregate, pre_aggregated_count
    from ..stages.joins import hash_join

    pairs = grouped_aggregate(
        _rp(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame(
                    {"o_orderkey": pc.cast(t.column("l_orderkey"),
                                           pa.int64()).to_numpy(),
                     "l_suppkey": pc.cast(t.column("l_suppkey"),
                                          pa.int64()).to_numpy(),
                     "ship_us": pc.cast(t.column("l_shipdate"),
                                        pa.int64()).to_numpy()})
                .groupby(["o_orderkey", "l_suppkey"], as_index=False)["ship_us"]
                .max(), preserve_index=False),
            batch_format="pyarrow"),
        ["o_orderkey", "l_suppkey"], Max("ship_us", alias_name="ship_us"))

    odates = _rp(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "odate_us": pc.cast(t.column("o_orderdate"), pa.int64())}),
        batch_format="pyarrow")
    joined = hash_join(pairs, odates, on=("o_orderkey",))

    def per_pair(t: pa.Table) -> pa.Table:
        sk = pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy()
        late = (pc.cast(t.column("ship_us"), pa.int64()).to_numpy()
                > pc.cast(t.column("odate_us"), pa.int64()).to_numpy()
                + _WAIT_GRACE_US).astype(np.int64)
        return pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "one": pa.array(np.ones(len(sk), np.int64), pa.int64()),
             "late": pa.array(late, pa.int64()),
             # max(cand) over the order = the late supplier when n_late == 1;
             # -1 sentinel keeps the max well-defined for all-on-time orders
             "cand": pa.array(np.where(late == 1, sk, -1), pa.int64())})

    per_order = grouped_aggregate(
        joined.map_batches(per_pair, batch_format="pyarrow"),
        ["o_orderkey"], Sum("one", alias_name="n_supp"),
        Sum("late", alias_name="n_late"), Max("cand", alias_name="cand"))

    def sole(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(pc.cast(t.column("n_supp"), pa.int64()), 2),
            pc.equal(pc.cast(t.column("n_late"), pa.int64()), 1))
        t = t.filter(keep)
        return pa.table({"l_suppkey": pc.cast(t.column("cand"), pa.int64())})

    return _nonempty_or_empty_table(
        pre_aggregated_count(
            per_order.map_batches(sole, batch_format="pyarrow"),
            ["l_suppkey"], "n_orders"),
        pa.schema([("l_suppkey", pa.int64()), ("n_orders", pa.int64())]))


def q_nation_pair_volume(sf_dir: str):
    """TPC-H Q7 shape — 1996 trade volume by (customer nation, supplier
    nation) pair: a FOUR-table chain where aggregation is pushed below every
    join so each exchange runs at the smaller post-aggregate cardinality:
    lineitem (date-pruned at the read) pre-aggregates to (order, supplier)
    cents, the supplier nation attaches by partitioned hash join (supplier
    is customer-scale at 100 TB — never broadcast), rows re-aggregate to
    (order, supp_nation) before the orders join, then to (custkey,
    supp_nation) before the customer join, and the final pair groupby is
    nations² rows. Revenue in exact integer cents throughout."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    lo, hi = _ts_us("1996-01-01"), _ts_us("1997-01-01")

    def li_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, lo), pc.less(us, hi)))
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        df = pd.DataFrame(
            {"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy(),
             "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(),
             "rev_cents": np.floor(price * (1.0 - disc) * 100.0 + 0.5)
                            .astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["o_orderkey", "s_suppkey"], as_index=False)["rev_cents"]
              .sum(), preserve_index=False)

    per_pair = grouped_aggregate(
        _rp(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount"]).map_batches(li_partial, batch_format="pyarrow"),
        ["o_orderkey", "s_suppkey"], Sum("rev_cents", alias_name="rev_cents"))

    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
             "supp_nation": pc.cast(t.column("s_nationkey"), pa.int64())}),
        batch_format="pyarrow")
    per_osn = grouped_aggregate(
        hash_join(per_pair, supp, on=("s_suppkey",)).map_batches(
            lambda t: t.select(["o_orderkey", "supp_nation", "rev_cents"]),
            batch_format="pyarrow"),
        ["o_orderkey", "supp_nation"], Sum("rev_cents", alias_name="rev_cents"))

    ocust = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "c_custkey": pc.cast(t.column("o_custkey"), pa.int64())}),
        batch_format="pyarrow")
    per_csn = grouped_aggregate(
        hash_join(per_osn, ocust, on=("o_orderkey",)).map_batches(
            lambda t: t.select(["c_custkey", "supp_nation", "rev_cents"]),
            batch_format="pyarrow"),
        ["c_custkey", "supp_nation"], Sum("rev_cents", alias_name="rev_cents"))

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
             "cust_nation": pc.cast(t.column("c_nationkey"), pa.int64())}),
        batch_format="pyarrow")
    return _nonempty_or_empty_table(
        grouped_aggregate(
            hash_join(per_csn, cust, on=("c_custkey",)).map_batches(
                lambda t: t.select(["cust_nation", "supp_nation", "rev_cents"]),
                batch_format="pyarrow"),
            ["cust_nation", "supp_nation"],
            Sum("rev_cents", alias_name="rev_cents")),
        pa.schema([("cust_nation", pa.int64()), ("supp_nation", pa.int64()),
                   ("rev_cents", pa.int64())]))


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — the revenue-champion supplier(s) of Q1-1996, TIES
    KEPT (= the view + WHERE rev = (SELECT MAX ...) formulation). Per-batch
    partials fold into a supplier-sized integer-cents aggregate; the global
    max is then ONE scalar off that aggregate (never the fact table) and
    the winners are a distributed equality filter — no global sort, no
    top-k heap, and exact under ties, which LIMIT 1 would break."""
    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, _ts_us("1996-01-01")),
                             pc.less(us, _ts_us("1996-04-01"))))
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        df = pd.DataFrame(
            {"l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(),
             "revenue_cents": np.floor(price * (1.0 - disc) * 100.0 + 0.5)
                                .astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("l_suppkey", as_index=False)["revenue_cents"].sum(),
            preserve_index=False)

    per_supp = _gagg(
        _rp(sf_dir, "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
            ).map_batches(partial, batch_format="pyarrow"),
        "l_suppkey", Sum("revenue_cents", alias_name="revenue_cents")
    ).materialize()
    schema = pa.schema([("l_suppkey", pa.int64()),
                        ("revenue_cents", pa.int64())])
    if per_supp.count() == 0:
        return schema.empty_table()
    mx = int(per_supp.max("revenue_cents"))
    return per_supp.map_batches(
        lambda t: (lambda f: pa.table(
            {"l_suppkey": pc.cast(f.column("l_suppkey"), pa.int64()),
             "revenue_cents": pc.cast(f.column("revenue_cents"), pa.int64())}))(
            t.filter(pc.equal(pc.cast(t.column("revenue_cents"), pa.int64()),
                              mx))),
        batch_format="pyarrow")


_BIG_ORDER_MIN_QTY = 250


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape — large-volume orders: HAVING on a fact aggregate,
    then a join BACK to the parent table for attributes. The per-order
    quantity sum (quantities are integral — summed as int64, hash-exact)
    filters DISTRIBUTED right off the aggregate (~1% of orders survive
    at threshold 250), and only the survivor keys join orders — a
    semi-join-shaped hash join whose build side is the filtered aggregate,
    so the wide order attributes never ship for non-qualifying orders."""
    from ..stages.joins import hash_join

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy(),
             "total_qty": np.asarray(t.column("l_quantity"),
                                     dtype=np.float64).astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("o_orderkey", as_index=False)["total_qty"].sum(),
            preserve_index=False)

    big = _gagg(
        _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            partial, batch_format="pyarrow"),
        "o_orderkey", Sum("total_qty", alias_name="total_qty")).map_batches(
        lambda t: t.filter(pc.greater(pc.cast(t.column("total_qty"), pa.int64()),
                                      _BIG_ORDER_MIN_QTY)),
        batch_format="pyarrow")

    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
             "price_cents": pa.array(_cents(np.asarray(t.column("o_totalprice"))),
                                     pa.int64())}),
        batch_format="pyarrow")
    return _nonempty_or_empty_table(
        hash_join(big, orders, on=("o_orderkey",)).map_batches(
            lambda t: t.select(["o_orderkey", "o_custkey", "total_qty",
                                "price_cents"]),
            batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                   ("total_qty", pa.int64()), ("price_cents", pa.int64())]))


# Q19 brackets: (brand, max size, qty lo, qty hi) — disjuncts share nothing,
# so only the UNION of the part-side predicates can prune before the join.
_BRACKETS = (("Brand#11", 15, 1, 15), ("Brand#22", 25, 10, 25),
             ("Brand#33", 35, 20, 35))


def q_brand_bracket_revenue(sf_dir: str):
    """TPC-H Q19 shape — disjunctive multi-bracket predicate spanning BOTH
    join sides: revenue where (brand, size, quantity) satisfies any of three
    OR'd brackets. No single conjunct can be pushed down, but the UNION of
    each side's disjuncts can: the part side prunes to the three brands
    (dimension-side filter), the lineitem side to the overall quantity hull
    [1, 35] at the read — then the exact OR mask evaluates VECTORIZED after
    one partitioned hash join, and the survivors fold to a single integer
    cents scalar (per-batch partial sums; the exchange is one row/batch)."""
    from ..stages.joins import hash_join

    brands = [b for b, _, _, _ in _BRACKETS]
    qty_hull = (min(lo for _, _, lo, _ in _BRACKETS),
                max(hi for _, _, _, hi in _BRACKETS))

    part = _rp(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"p_partkey": pc.cast(f.column("p_partkey"), pa.int64()),
             "p_brand": pc.cast(f.column("p_brand"), pa.string()),
             "p_size": pc.cast(f.column("p_size"), pa.int64())}))(
            t.filter(pc.is_in(t.column("p_brand"),
                              value_set=pa.array(brands)))),
        batch_format="pyarrow")

    def li_prune(t: pa.Table) -> pa.Table:
        qty = np.asarray(t.column("l_quantity"), dtype=np.float64)
        keep = (qty >= qty_hull[0]) & (qty <= qty_hull[1])
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)[keep]
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)[keep]
        return pa.table(
            {"p_partkey": pa.array(
                pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()[keep],
                pa.int64()),
             "qty": pa.array(qty[keep].astype(np.int64), pa.int64()),
             "rev_cents": pa.array(
                 np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64),
                 pa.int64())})

    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
             ).map_batches(li_prune, batch_format="pyarrow")
    joined = hash_join(li, part, on=("p_partkey",))

    def bracket_sum(t: pa.Table) -> pa.Table:
        brand = t.column("p_brand").to_pandas().to_numpy(dtype=object)
        size = pc.cast(t.column("p_size"), pa.int64()).to_numpy()
        qty = pc.cast(t.column("qty"), pa.int64()).to_numpy()
        rev = pc.cast(t.column("rev_cents"), pa.int64()).to_numpy()
        mask = np.zeros(len(rev), dtype=bool)
        for b, smax, qlo, qhi in _BRACKETS:
            mask |= (brand == b) & (size >= 1) & (size <= smax) \
                    & (qty >= qlo) & (qty <= qhi)
        return pa.table({"revenue_cents":
                         pa.array([int(rev[mask].sum())], pa.int64())})

    total = joined.map_batches(bracket_sum, batch_format="pyarrow"
                               ).sum("revenue_cents")
    return pa.table({"revenue_cents": pa.array([int(total or 0)], pa.int64())})


def q_segment_spend_skewed(sf_dir: str):
    """Fact×dimension attach through stages/joins.skewed_hash_join — the
    explicit hot-key plan for probe sides that can NOT be pre-aggregated
    below the join (each event row must survive to carry its own payload).
    Keys whose exact count crosses the threshold join MAP-SIDE against the
    broadcast hot slice of the dimension (no shuffle — a 10⁹-row key costs
    each task only its own batch); cold keys take the ordinary partitioned
    hash join; the split is correctness-neutral. threshold=64 makes the sf
    data itself exercise BOTH plans: every user is hot at sf0.01 (~100
    events each) and cold at sf0.001 (~10) — the mixed hot+cold split is
    pinned by a synthetic fixture in test_round3_ops."""
    from ..stages.joins import skewed_hash_join

    ev = _rp(sf_dir, "events", ["user_id", "event_type", "value"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("user_id"), pa.int64()),
             "event_type": pc.cast(t.column("event_type"), pa.string()),
             "value_cents": pa.array(_cents(np.asarray(t.column("value"))),
                                     pa.int64())}),
        batch_format="pyarrow")
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
             "c_mktsegment": pc.cast(t.column("c_mktsegment"), pa.string())}),
        batch_format="pyarrow")
    joined = skewed_hash_join(ev, cust, "c_custkey", hot_row_threshold=64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="object"),
                                 "event_type": pd.Series([], dtype="object"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "value_cents": pd.Series([], dtype="int64")})
        g = df.groupby(["c_mktsegment", "event_type"], as_index=False).agg(
            n_events=("value_cents", "size"), value_cents=("value_cents", "sum"))
        return g.astype({"n_events": "int64", "value_cents": "int64"})

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby(["c_mktsegment", "event_type"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("value_cents", alias_name="value_cents")))


def q_discount_revenue(sf_dir: str):
    """TPC-H Q6 shape — the forecasting-delta scan: revenue that a discount
    bracket gave away in 1996 (SUM(price·disc) under three conjunctive
    range predicates). Pure scan→filter→one-scalar fold: per-batch partial
    sums, a one-row-per-batch exchange, no join, no groupby — the query
    every column-pruned read should make IO-bound. Discount bounds compare
    as the same IEEE doubles in both engines (0.05/0.07 literals)."""
    lo, hi = _ts_us("1996-01-01"), _ts_us("1997-01-01")

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        qty = np.asarray(t.column("l_quantity"), dtype=np.float64)
        keep = ((us >= lo) & (us < hi) & (disc >= 0.05) & (disc <= 0.07)
                & (qty < 24))
        rev = np.floor(price[keep] * disc[keep] * 100.0 + 0.5).astype(np.int64)
        return pa.table({"revenue_cents": pa.array([int(rev.sum())], pa.int64())})

    total = (_rp(sf_dir, "lineitem",
                 ["l_shipdate", "l_extendedprice", "l_discount", "l_quantity"])
             .map_batches(partial, batch_format="pyarrow").sum("revenue_cents"))
    return pa.table({"revenue_cents": pa.array([int(total or 0)], pa.int64())})


def q_brand_market_share(sf_dir: str):
    """TPC-H Q8 shape — market share over time: Brand#11's ppm share of
    each month's total revenue. The numerator-flag travels WITH the row
    (brand attach via one partitioned hash join against the part
    dimension), so a single per-month aggregate carries (total, branded)
    and the ratio is an exact trunc-division inside the month-sized final
    block — never a join of two separately-aggregated streams."""
    from ..stages.joins import hash_join

    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_shipdate", "l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
             "ship": t.column("l_shipdate"),
             "rev_cents": pa.array(_cents(np.asarray(t.column("l_extendedprice"))),
                                   pa.int64())}),
        batch_format="pyarrow")
    part = _rp(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
             "is_brand": pc.cast(pc.equal(t.column("p_brand"), "Brand#11"),
                                 pa.int64())}),
        batch_format="pyarrow")
    joined = hash_join(li, part, on=("p_partkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"month": pd.Series([], dtype="object"),
                                 "total_cents": pd.Series([], dtype="int64"),
                                 "brand_cents": pd.Series([], dtype="int64")})
        df = df.assign(
            month=pd.Series(df["ship"]).dt.strftime("%Y-%m"),
            brand_cents=df["rev_cents"].to_numpy(np.int64)
            * df["is_brand"].to_numpy(np.int64))
        g = df.groupby("month", as_index=False).agg(
            total_cents=("rev_cents", "sum"), brand_cents=("brand_cents", "sum"))
        return g.astype({"total_cents": "int64", "brand_cents": "int64"})

    agg = (joined.map_batches(partial, batch_format="pandas")
           .groupby("month")
           .aggregate(Sum("total_cents", alias_name="total_cents"),
                      Sum("brand_cents", alias_name="brand_cents")))

    def finish(t: pa.Table) -> pa.Table:
        tot = pc.cast(t.column("total_cents"), pa.int64()).to_numpy()
        br = pc.cast(t.column("brand_cents"), pa.int64()).to_numpy()
        return pa.table({"month": pc.cast(t.column("month"), pa.string()),
                         "brand_cents": pa.array(br, pa.int64()),
                         "share_ppm": pa.array(
                             br * 1_000_000 // np.maximum(tot, 1), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape — grouped ARGMIN with attribute recovery: per part,
    the supplier quoting the lowest price (min cents, supplier-id tiebreak),
    then the winner's name joined back from the dimension. The argmin is
    ONE packed-int64 Min aggregate (price·2³² | suppkey — price < 2³⁰ keeps
    the product under 2⁶³; minimizing the packed key IS (price ASC, supp
    ASC)), decoded row-locally, so no per-group sort and no
    row_number window; the name attach is a partitioned hash join at part
    cardinality — the classic correlated subquery flattened to
    aggregate + join."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    def partial(t: pa.Table) -> pa.Table:
        price = _cents(np.asarray(t.column("l_extendedprice")))
        if price.size and int(price.max()) >= (1 << 30):
            raise ValueError("price cents exceed 30 bits — widen the packing")
        sk = pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(),
             "pk": price * (1 << 32) + sk})
        return pa.Table.from_pandas(
            df.groupby("p_partkey", as_index=False)["pk"].min(),
            preserve_index=False)

    argmin = grouped_aggregate(
        _rp(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"]).map_batches(
            partial, batch_format="pyarrow"),
        ["p_partkey"], Min("pk", alias_name="pk")).map_batches(
        lambda t: (lambda k: pa.table(
            {"p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
             "s_suppkey": pa.array(k & 0xFFFFFFFF, pa.int64()),
             "min_price_cents": pa.array(k >> 32, pa.int64())}))(
            pc.cast(t.column("pk"), pa.int64()).to_numpy()),
        batch_format="pyarrow")

    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
             "s_name": pc.cast(t.column("s_name"), pa.string())}),
        batch_format="pyarrow")
    return _nonempty_or_empty_table(
        hash_join(argmin, supp, on=("s_suppkey",)).map_batches(
            lambda t: t.select(["p_partkey", "s_suppkey", "s_name",
                                "min_price_cents"]),
            batch_format="pyarrow"),
        pa.schema([("p_partkey", pa.int64()), ("s_suppkey", pa.int64()),
                   ("s_name", pa.string()), ("min_price_cents", pa.int64())]))


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation (recency / frequency / monetary quintiles,
    5 = best) — the classic curation/marketing composite. The fact table
    folds ONCE into a per-user (last purchase day, n purchases, total
    cents) aggregate; each dimension then gets an exact 1-based global rank
    from the range-partitioned rank primitive (functions/rank.global_rank —
    sampled bucket edges + per-bucket offsets, ONE shuffle per dimension of
    the USER-sized table, no global sort) with user_id as the deterministic
    tiebreak, and the quintile is the rank arithmetic 1 + (rank−1)·5 // n —
    no percentile thresholds, so ties and boundaries are hash-exact.
    Output: per-user scores + the packed 100r+10f+m segment code."""
    from ..functions.rank import global_rank
    from ..stages.canonicalize import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        df = pd.DataFrame(
            {"user_id": pc.cast(t.column("user_id"), pa.int64()).to_numpy(),
             "last_day": pc.cast(t.column("ts"), pa.int64()).to_numpy()
             // 86_400_000_000,
             "freq": np.ones(t.num_rows, np.int64),
             "cents": _cents(np.asarray(t.column("value")))})
        g = df.groupby("user_id", as_index=False).agg(
            last_day=("last_day", "max"), freq=("freq", "sum"),
            cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = grouped_aggregate(
        _rp(sf_dir, "events", ["user_id", "event_type", "ts", "value"]
            ).map_batches(partial, batch_format="pyarrow"),
        ["user_id"], Max("last_day", alias_name="last_day"),
        Sum("freq", alias_name="freq"),
        Sum("cents", alias_name="cents")).materialize()
    schema = pa.schema([("user_id", pa.int64()), ("r", pa.int64()),
                        ("f", pa.int64()), ("m", pa.int64()),
                        ("rfm", pa.int64())])
    n = per_user.count()
    if n == 0:
        return schema.empty_table()

    ranked = global_rank(per_user, "last_day", "user_id",
                         descending=False, out="rr")
    ranked = global_rank(ranked, "freq", "user_id",
                         descending=False, out="rf")
    ranked = global_rank(ranked, "cents", "user_id",
                         descending=False, out="rm")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ["user_id", "r", "f", "m", "rfm"]})
        r = 1 + (df["rr"].to_numpy(np.int64) - 1) * 5 // n
        f = 1 + (df["rf"].to_numpy(np.int64) - 1) * 5 // n
        m = 1 + (df["rm"].to_numpy(np.int64) - 1) * 5 // n
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "r": r, "f": f, "m": m,
                             "rfm": 100 * r + 10 * f + m})

    return ranked.map_batches(finish, batch_format="pandas")


def q_nation_profit(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """TPC-H Q9 shape adapted to this schema (no partsupp table): profit on
    red parts by (supplier nation, order year), with unit cost standing in
    for ps_supplycost as half the part's retail cents —
    ``cost_unit = FLOOR(p_retailprice*100 + 0.5) // 2``, integer-exact and
    mirrored verbatim in the oracle. The part-name filter prunes ~7/8 of
    the dimension BEFORE it touches the fact table; below
    ``broadcast_limit`` parts the (partkey → cost) map is broadcast once
    (ray.put + per-batch searchsorted — no fact shuffle for the dimension
    attach), above it the same chain runs through a partitioned hash join.
    Profit then pre-aggregates to (order, supplier) rows so the supplier
    and orders joins ship post-aggregate cardinality, exactly the
    nation_pair_volume discipline; the final (nation, year) groupby is a
    few hundred rows at any scale. Reference analog: the grouped
    fold-metric aggregation of scripts/run_kfold.py:83-111 lifted to a
    multi-join star."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    part = _rp(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def red_costs(t: pa.Table) -> pa.Table:
        f = t.filter(pc.match_substring(t.column("p_name"), "red"))
        return pa.table(
            {"p_partkey": pc.cast(f.column("p_partkey"), pa.int64()),
             "cost_unit": pa.array(
                 _cents(np.asarray(f.column("p_retailprice"))) // 2,
                 pa.int64())})

    li_cols = ["l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
               "l_extendedprice", "l_discount"]

    def profit_of(t: pa.Table, cost: np.ndarray) -> pa.Table:
        """Per-row profit, then a per-batch partial to (order, supplier)."""
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        qty = np.asarray(t.column("l_quantity"), dtype=np.float64).astype(np.int64)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy(),
             "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(),
             "profit_cents": rev - qty * cost})
        return pa.Table.from_pandas(
            df.groupby(["o_orderkey", "s_suppkey"], as_index=False)
              ["profit_cents"].sum(), preserve_index=False)

    if part.count() <= broadcast_limit:  # parquet metadata count — no scan
        ct = pa.concat_tables(
            [red_costs(b) for b in
             part.iter_batches(batch_format="pyarrow", batch_size=65536)],
            promote_options="default")
        keys = ct.column("p_partkey").to_numpy()
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        costs = ct.column("cost_unit").to_numpy()[order]
        cref = ray.put((keys, costs))

        def bc_partial(t: pa.Table) -> pa.Table:
            k, c = ray.get(cref)
            pk = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()
            if k.size == 0:
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "s_suppkey": pa.array([], pa.int64()),
                                 "profit_cents": pa.array([], pa.int64())})
            idx = np.clip(np.searchsorted(k, pk), 0, k.size - 1)
            hit = k[idx] == pk
            return profit_of(t.filter(pa.array(hit)), c[idx[hit]])

        per_os = _rp(sf_dir, "lineitem", li_cols).map_batches(
            bc_partial, batch_format="pyarrow")
    else:
        costs_ds = part.map_batches(red_costs, batch_format="pyarrow")
        fact = _rp(sf_dir, "lineitem", li_cols).map_batches(
            lambda t: t.rename_columns(
                ["p_partkey"] + li_cols[1:]),
            batch_format="pyarrow")
        per_os = hash_join(fact, costs_ds, on=("p_partkey",)).map_batches(
            lambda t: profit_of(
                t, pc.cast(t.column("cost_unit"), pa.int64()).to_numpy()),
            batch_format="pyarrow")

    per_os = grouped_aggregate(per_os, ["o_orderkey", "s_suppkey"],
                               Sum("profit_cents", alias_name="profit_cents"))

    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
             "supp_nation": pc.cast(t.column("s_nationkey"), pa.int64())}),
        batch_format="pyarrow")
    per_on = grouped_aggregate(
        hash_join(per_os, supp, on=("s_suppkey",)).map_batches(
            lambda t: t.select(["o_orderkey", "supp_nation", "profit_cents"]),
            batch_format="pyarrow"),
        ["o_orderkey", "supp_nation"],
        Sum("profit_cents", alias_name="profit_cents"))

    oyear = _rp(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64())}),
        batch_format="pyarrow")
    return _nonempty_or_empty_table(
        grouped_aggregate(
            hash_join(per_on, oyear, on=("o_orderkey",)).map_batches(
                lambda t: t.select(["supp_nation", "o_year", "profit_cents"]),
                batch_format="pyarrow"),
            ["supp_nation", "o_year"],
            Sum("profit_cents", alias_name="profit_cents")),
        pa.schema([("supp_nation", pa.int64()), ("o_year", pa.int64()),
                   ("profit_cents", pa.int64())]))


def q_returnflag_priority(sf_dir: str):
    """TPC-H Q12 shape adapted to this schema (no l_shipmode /
    l_commitdate): per return flag of 1996 shipments, how many lineitems
    belong to critical-priority orders (1-URGENT / 2-HIGH) vs the rest —
    the classic fact→parent join followed by conditional counting. The
    fact side pre-aggregates to (order, flag, n) — one row per order-flag
    pair instead of one per lineitem — before the partitioned hash join
    attaches the priority, so the exchange ships post-aggregate rows;
    the conditional split is a vectorized int mask and the final groupby
    is ≤ 3 rows. Reference analog: the confusion-bucket conditional
    counting of src/metrics.py:66 as a joined aggregate."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    lo, hi = _ts_us("1996-01-01"), _ts_us("1997-01-01")

    def li_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, lo), pc.less(us, hi)))
        df = pd.DataFrame(
            {"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy(),
             "l_returnflag": t.column("l_returnflag").to_pylist(),
             "n": np.ones(t.num_rows, np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["o_orderkey", "l_returnflag"], as_index=False)["n"]
              .sum(), preserve_index=False)

    per_of = grouped_aggregate(
        _rp(sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_shipdate"]).map_batches(
            li_partial, batch_format="pyarrow"),
        ["o_orderkey", "l_returnflag"], Sum("n", alias_name="n"))

    prio = _rp(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "is_high": pc.cast(
                 pc.is_in(t.column("o_orderpriority"),
                          value_set=pa.array(["1-URGENT", "2-HIGH"])),
                 pa.int64())}),
        batch_format="pyarrow")

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"l_returnflag": pd.Series([], dtype="object"),
                 "high_line_count": pd.Series([], dtype="int64"),
                 "low_line_count": pd.Series([], dtype="int64")})
        n = df["n"].to_numpy(np.int64)
        hi_mask = df["is_high"].to_numpy(np.int64)
        df = df.assign(high_line_count=n * hi_mask,
                       low_line_count=n * (1 - hi_mask))
        g = df.groupby("l_returnflag", as_index=False).agg(
            high_line_count=("high_line_count", "sum"),
            low_line_count=("low_line_count", "sum"))
        return g.astype({"high_line_count": "int64",
                         "low_line_count": "int64"})

    return (hash_join(per_of, prio, on=("o_orderkey",))
            .map_batches(split, batch_format="pandas")
            .groupby("l_returnflag")
            .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count")))


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promo revenue share for 1996-03. Unlike the Q8
    plan (flag travels with the fact rows), here revenue needs NOTHING
    from the dimension except a boolean, so the fact table folds FIRST to
    a (partkey, rev_cents) aggregate — bounded by part cardinality — and
    only that aggregate hash-joins `part` for the PROMO flag: the month's
    lineitems never enter a shuffle. Output is one row of exact integers:
    promo cents, total cents, and the ppm share by trunc division."""
    from ..stages.joins import hash_join

    lo, hi = _ts_us("1996-03-01"), _ts_us("1996-04-01")

    def li_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, lo), pc.less(us, hi)))
        price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
        disc = np.asarray(t.column("l_discount"), dtype=np.float64)
        df = pd.DataFrame(
            {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(),
             "rev_cents": np.floor(price * (1.0 - disc) * 100.0 + 0.5)
                            .astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("p_partkey", as_index=False)["rev_cents"].sum(),
            preserve_index=False)

    per_part = _gagg(
        _rp(sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
            ).map_batches(li_partial, batch_format="pyarrow"),
        "p_partkey", Sum("rev_cents", alias_name="rev_cents"))

    promo = _rp(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
             "is_promo": pc.cast(pc.equal(t.column("p_type"), "PROMO"),
                                 pa.int64())}),
        batch_format="pyarrow")

    def fold(t: pa.Table) -> pa.Table:
        rev = pc.cast(t.column("rev_cents"), pa.int64()).to_numpy()
        promo_mask = pc.cast(t.column("is_promo"), pa.int64()).to_numpy()
        return pa.table(
            {"promo_cents": pa.array([int((rev * promo_mask).sum())], pa.int64()),
             "total_cents": pa.array([int(rev.sum())], pa.int64())})

    partials = (hash_join(per_part, promo, on=("p_partkey",))
                .map_batches(fold, batch_format="pyarrow").take_all())
    promo_c = sum(r["promo_cents"] for r in partials)
    total_c = sum(r["total_cents"] for r in partials)
    return pa.table(
        {"promo_cents": pa.array([promo_c], pa.int64()),
         "total_cents": pa.array([total_c], pa.int64()),
         "promo_ppm": pa.array(
             [promo_c * 1_000_000 // max(total_c, 1)], pa.int64())})


_EXCESS_QTY_MIN = 300


def q_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape adapted to this schema (no partsupp availqty):
    suppliers who shipped MORE than _EXCESS_QTY_MIN units of widget parts
    during 1996 — the nested aggregate-subquery semi-join chain. The part
    filter reduces the dimension to keys only (~1/8), the date-windowed
    fact pre-aggregates quantity to (partkey, suppkey) pairs before the
    partitioned semi join, survivors re-aggregate per supplier, the HAVING
    filter runs distributed off that aggregate, and only qualifying keys
    join `supplier` for names — wide supplier attributes never ship for
    the non-qualifying. Quantities are integral in this data and summed
    as int64, so the threshold compare is hash-exact."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    lo, hi = _ts_us("1996-01-01"), _ts_us("1997-01-01")

    widget_keys = _rp(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"p_partkey": pc.cast(f.column("p_partkey"), pa.int64())}))(
            t.filter(pc.match_substring(t.column("p_name"), "widget"))),
        batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, lo), pc.less(us, hi)))
        df = pd.DataFrame(
            {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(),
             "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(),
             "total_qty": np.asarray(t.column("l_quantity"),
                                     dtype=np.float64).astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["p_partkey", "s_suppkey"], as_index=False)["total_qty"]
              .sum(), preserve_index=False)

    per_ps = grouped_aggregate(
        _rp(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
            ).map_batches(li_partial, batch_format="pyarrow"),
        ["p_partkey", "s_suppkey"], Sum("total_qty", alias_name="total_qty"))

    qualifying = _gagg(
        hash_join(per_ps, widget_keys, on=("p_partkey",)).map_batches(
            lambda t: t.select(["s_suppkey", "total_qty"]),
            batch_format="pyarrow"),
        "s_suppkey", Sum("total_qty", alias_name="total_qty")).map_batches(
        lambda t: t.filter(pc.greater(
            pc.cast(t.column("total_qty"), pa.int64()), _EXCESS_QTY_MIN)),
        batch_format="pyarrow")

    names = _rp(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
             "s_name": pc.cast(t.column("s_name"), pa.string())}),
        batch_format="pyarrow")
    return _nonempty_or_empty_table(
        hash_join(qualifying, names, on=("s_suppkey",)).map_batches(
            lambda t: t.select(["s_suppkey", "s_name", "total_qty"]),
            batch_format="pyarrow"),
        pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                   ("total_qty", pa.int64())]))


def q_small_qty_revenue(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """TPC-H Q17 shape — revenue locked in small-quantity orders: lineitems
    whose quantity is below HALF the part's average quantity, a correlated
    aggregate-subquery join-back onto the SAME fact table. The per-part
    average folds first to (partkey, qty_sum, n) — bounded by part
    cardinality — and the threshold compare is the integer cross-multiplied
    form ``2·qty·n < qty_sum`` (quantities are integral here), so both
    engines compare exact int64s and no float average ever exists. Below
    ``broadcast_limit`` parts the aggregate is broadcast (ray.put +
    searchsorted) and the second fact pass filters map-side with NO
    shuffle; above it the same compare runs through a partitioned hash
    join of the fact against the part-sized aggregate."""
    from ..stages.joins import hash_join

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def avg_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(),
             "qty_sum": np.asarray(t.column("l_quantity"),
                                   dtype=np.float64).astype(np.int64),
             "n": np.ones(t.num_rows, np.int64)})
        return pa.Table.from_pandas(
            df.groupby("p_partkey", as_index=False).agg(
                qty_sum=("qty_sum", "sum"), n=("n", "sum")),
            preserve_index=False)

    per_part = _gagg(
        _rp(sf_dir, "lineitem", ["l_partkey", "l_quantity"]).map_batches(
            avg_partial, batch_format="pyarrow"),
        "p_partkey", Sum("qty_sum", alias_name="qty_sum"),
        Sum("n", alias_name="n")).materialize()

    def fold(qty: np.ndarray, price: np.ndarray, qsum: np.ndarray,
             n: np.ndarray) -> pa.Table:
        keep = 2 * qty * n < qsum
        rev = np.floor(price[keep] * 100.0 + 0.5).astype(np.int64)
        return pa.table({"n_items": pa.array([int(keep.sum())], pa.int64()),
                         "revenue_cents": pa.array([int(rev.sum())], pa.int64())})

    if per_part.count() <= broadcast_limit:
        agg = per_part.to_pandas()
        order = np.argsort(agg["p_partkey"].to_numpy(np.int64), kind="stable")
        keys = agg["p_partkey"].to_numpy(np.int64)[order]
        qsums = agg["qty_sum"].to_numpy(np.int64)[order]
        ns = agg["n"].to_numpy(np.int64)[order]
        aref = ray.put((keys, qsums, ns))

        def bc_fold(t: pa.Table) -> pa.Table:
            k, qs, nn = ray.get(aref)
            pk = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()
            qty = np.asarray(t.column("l_quantity"),
                             dtype=np.float64).astype(np.int64)
            price = np.asarray(t.column("l_extendedprice"), dtype=np.float64)
            idx = np.searchsorted(k, pk)  # every fact key exists in its own agg
            return fold(qty, price, qs[idx], nn[idx])

        parts = (_rp(sf_dir, "lineitem", li_cols)
                 .map_batches(bc_fold, batch_format="pyarrow").take_all())
    else:
        fact = _rp(sf_dir, "lineitem", li_cols).map_batches(
            lambda t: pa.table(
                {"p_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                 "l_quantity": t.column("l_quantity"),
                 "l_extendedprice": t.column("l_extendedprice")}),
            batch_format="pyarrow")
        parts = (hash_join(fact, per_part, on=("p_partkey",)).map_batches(
            lambda t: fold(
                np.asarray(t.column("l_quantity"),
                           dtype=np.float64).astype(np.int64),
                np.asarray(t.column("l_extendedprice"), dtype=np.float64),
                pc.cast(t.column("qty_sum"), pa.int64()).to_numpy(),
                pc.cast(t.column("n"), pa.int64()).to_numpy()),
            batch_format="pyarrow").take_all())

    return pa.table(
        {"n_items": pa.array([sum(r["n_items"] for r in parts)], pa.int64()),
         "revenue_cents": pa.array([sum(r["revenue_cents"] for r in parts)],
                                   pa.int64())})


def q_bucketed_join_revenue(sf_dir: str):
    """STORAGE-PARTITIONED JOIN (Spark SPJ / Iceberg bucketed-join analog):
    orders and lineitem are first laid out by ``write_partitioned`` on the
    join key (crc32(orderkey) % 16, both sides — the one-time compaction a
    100-TB table pays once and every subsequent join reuses), then joined
    with ZERO exchange: one task per co-partition reads ``part=i`` from
    both roots and merges locally (stages/joins.bucketed_join). The layout
    is cached under /tmp keyed by the input dir and reused across runs —
    exactly the amortization argument for bucketing. Result: revenue cents
    per order priority (≤ 5 rows)."""
    import hashlib as _hl

    from ..stages.joins import bucketed_join
    from ..stages.materialize import write_partitioned
    from ..state.manifest import table_complete

    cache = os.path.join("/tmp/graft_spj_cache",
                         _hl.md5(sf_dir.encode()).hexdigest()[:12])
    odir, ldir = os.path.join(cache, "orders"), os.path.join(cache, "lineitem")
    if not table_complete(odir):
        write_partitioned(
            _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
                ).map_batches(
                lambda t: pa.table(
                    {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                     "o_orderpriority": pc.cast(t.column("o_orderpriority"),
                                                pa.string())}),
                batch_format="pyarrow"),
            odir, "o_orderkey", n_partitions=16)
    if not table_complete(ldir):
        write_partitioned(
            _rp(sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
                lambda t: pa.table(
                    {"o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                     "rev_cents": pa.array(
                         np.floor(np.asarray(t.column("l_extendedprice"),
                                             dtype=np.float64)
                                  * (1.0 - np.asarray(t.column("l_discount"),
                                                      dtype=np.float64))
                                  * 100.0 + 0.5).astype(np.int64), pa.int64())}),
                batch_format="pyarrow"),
            ldir, "o_orderkey", n_partitions=16)

    joined = bucketed_join(ldir, odir, on=["o_orderkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                                 "revenue_cents": pd.Series([], dtype="int64")})
        g = df.groupby("o_orderpriority", as_index=False)["rev_cents"].sum()
        return g.rename(columns={"rev_cents": "revenue_cents"}).astype(
            {"revenue_cents": "int64"})

    return (joined.map_batches(partial, batch_format="pandas")
            .groupby("o_orderpriority")
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))


# --------------------------------------------------------------------------
# Round-4 TPC-H shapes (Q16 / Q19 / Q22 analogs on the slim schema)
# --------------------------------------------------------------------------

def q_brand_supplier_cnt(sf_dir: str):
    """TPC-H Q16 shape on the slim schema (lineitem stands in for partsupp):
    per p_brand, the number of DISTINCT suppliers observed shipping that
    brand. Plan: project (l_partkey, l_suppkey) → distinct via one bucketed
    pair aggregate → partitioned hash_join to attach p_brand (part is
    dimension-sized but joined, not broadcast, to keep the Q16 shape) →
    per-batch (brand, supplier) dedup rows → distinct-pair aggregate →
    brand-keyed count. Every exchange is vocabulary-sized."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    pairs = grouped_aggregate(
        _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
            lambda t: pa.Table.from_pandas(
                pa.Table.from_arrays(
                    [pc.cast(t.column("l_partkey"), pa.int64()),
                     pc.cast(t.column("l_suppkey"), pa.int64())],
                    names=["l_partkey", "l_suppkey"]).to_pandas()
                .drop_duplicates().assign(one=np.int64(1)),
                preserve_index=False),
            batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        Sum("one", alias_name="one"),
    ).drop_columns(["one"])
    part = _rp(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.cast(t.column("p_partkey"), pa.int64()), t.column("p_brand")],
            names=["l_partkey", "p_brand"]),
        batch_format="pyarrow")
    joined = hash_join(pairs, part, on=["l_partkey"])
    bs = grouped_aggregate(
        joined.map_batches(
            lambda df: df[["p_brand", "l_suppkey"]].drop_duplicates()
            .assign(one=np.int64(1)),
            batch_format="pandas"),
        ["p_brand", "l_suppkey"],
        Sum("one", alias_name="one"),
    )
    out = grouped_aggregate(
        bs.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("p_brand"), pa.array(np.ones(t.num_rows, np.int64))],
                names=["p_brand", "supplier_cnt"]),
            batch_format="pyarrow"),
        ["p_brand"],
        Sum("supplier_cnt", alias_name="supplier_cnt"),
    )
    return out.sort("p_brand")


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under an OR-of-conjunctions predicate mixing
    part attributes and lineitem quantity brackets — the filter a columnar
    engine must push as one fused row-local mask, not three scans:
        (brand #1x AND qty ≤ 10) OR (size ≥ 30 AND 10 < qty ≤ 25)
                                 OR (type starts 'STANDARD' AND qty > 25).
    Plan: part's (brand, size, type) attach via partitioned hash_join on
    partkey, then ONE vectorized numpy mask per batch and per-batch cents
    partials into a single-row Sum."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    li = _rp(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
             ).map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.cast(t.column("l_partkey"), pa.int64()),
             pc.cast(t.column("l_quantity"), pa.float64()),
             t.column("l_extendedprice"), t.column("l_discount")],
            names=["l_partkey", "qty", "price", "disc"]),
        batch_format="pyarrow")
    part = _rp(sf_dir, "part", ["p_partkey", "p_brand", "p_size", "p_type"]
               ).map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.cast(t.column("p_partkey"), pa.int64()), t.column("p_brand"),
             pc.cast(t.column("p_size"), pa.int64()), t.column("p_type")],
            names=["l_partkey", "p_brand", "p_size", "p_type"]),
        batch_format="pyarrow")
    joined = hash_join(li, part, on=["l_partkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["qty"].to_numpy(np.float64)
        size = df["p_size"].to_numpy(np.int64)
        brand = df["p_brand"].to_numpy(object)
        ptype = df["p_type"].astype(str)
        m = (
            ((brand == "Brand#13") & (qty <= 10))
            | ((size >= 30) & (qty > 10) & (qty <= 25))
            | (ptype.str.startswith("STANDARD").to_numpy(bool) & (qty > 25))
        )
        # discounted revenue in exact cents: floor(price*(1-disc)*100+0.5)
        rev = np.floor(
            df["price"].to_numpy(np.float64)
            * (1.0 - df["disc"].to_numpy(np.float64)) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame({
            "revenue_cents": [int(rev[m].sum())],
            "n_items": [int(m.sum())],
        })

    out = joined.map_batches(partial, batch_format="pandas")
    return grouped_aggregate(
        out.map_batches(lambda df: df.assign(_k=np.int64(0)),
                        batch_format="pandas"),
        ["_k"],
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    ).drop_columns(["_k"])


def q_idle_customers_by_segment(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """TPC-H Q22 shape on the slim schema: LAPSED high-value customers —
    no order on/after the 2001-01-01 recency cutoff (every customer has
    SOME order in this data, so the classic no-orders-ever form is
    vacuous; Q22's spirit is "unlikely to order again"), account balance
    above the average POSITIVE balance, counted per market segment with
    their balance mass. Plan: the global avg is a two-scalar driver reduce
    over per-batch (sum, count) partials, applied as an integer-exact
    cross-multiplication (bal·n > sum — no float division); the
    recent-orderer ANTI join is GATED on the distinct recent-key count —
    broadcast frozenset below the limit, partitioned LEFT hash_join +
    null-filter above it (a fact-derived key set is never broadcast
    unconditionally)."""
    import ray as _ray

    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    cust = _rp(sf_dir, "customer",
               ["c_custkey", "c_acctbal", "c_mktsegment"]).materialize()
    pos = cust.map_batches(
        lambda t: (lambda c: pa.table(
            {"s": pa.array([int(c[c > 0].sum())], pa.int64()),
             "n": pa.array([int((c > 0).sum())], pa.int64())}))(
            _cents(np.asarray(t.column("c_acctbal")))),
        batch_format="pyarrow")
    tot = pos.to_pandas().sum()
    s_cents, n_pos = int(tot["s"]), int(tot["n"])

    cutoff_us = np.datetime64("2001-01-01").astype("datetime64[us]").astype(np.int64)

    def recent(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("o_orderdate"), pa.timestamp("us"))
        keep = pc.greater_equal(pc.cast(ts, pa.int64()), cutoff_us)
        return pa.table(
            {"c_custkey": pc.unique(pc.cast(
                t.filter(keep).column("o_custkey"), pa.int64()))})

    okeys_ds = _gagg(
        _rp(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            recent, batch_format="pyarrow"),
        "c_custkey", Count(alias_name="_n"),
    ).select_columns(["c_custkey"]).materialize()

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(np.asarray(t.column("c_acctbal")))
        mask = cents * n_pos > s_cents
        return pa.table(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())
             .filter(pa.array(mask)),
             "c_mktsegment": t.column("c_mktsegment").filter(pa.array(mask)),
             "cents": pa.array(cents[mask], pa.int64())})

    rich_ds = cust.map_batches(rich, batch_format="pyarrow")

    if okeys_ds.count() <= broadcast_limit:
        kref = _ray.put(frozenset(
            int(r["c_custkey"]) for r in okeys_ds.take_all()))

        def anti(t: pa.Table) -> pa.Table:
            ks = _ray.get(kref)
            mask = [int(k) not in ks
                    for k in t.column("c_custkey").to_pylist()]
            return t.filter(pa.array(mask, pa.bool_()))

        idle = rich_ds.map_batches(anti, batch_format="pyarrow")
    else:
        flagged = hash_join(
            rich_ds,
            okeys_ds.map_batches(
                lambda t: pa.table(
                    {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                     "hit": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            on=["c_custkey"], how="left",
        )
        idle = flagged.map_batches(
            lambda df: df[df["hit"].isna()][
                ["c_custkey", "c_mktsegment", "cents"]],
            batch_format="pandas",
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("c_mktsegment", sort=False)
                .agg(n_customers=("c_custkey", "size"),
                     acctbal_cents=("cents", "sum"))
                .reset_index())

    out = grouped_aggregate(
        idle.map_batches(partial, batch_format="pandas"),
        ["c_mktsegment"],
        Sum("n_customers", alias_name="n_customers"),
        Sum("acctbal_cents", alias_name="acctbal_cents"),
    )
    return out.sort("c_mktsegment")
