"""Query catalogue: one entry per implemented operator family (SURVEY.md §2),
each with a DuckDB-equivalent oracle SQL where ANSI-SQL can express it.

Conventions that make the driver's order-insensitive value-hash comparison
succeed (CORRECTNESS gate):
  * every computed/aggregate column is NAMED, identically in Ray and SQL;
  * money/float sums are computed on exact integers
    (``cents = floor(x*100 + 0.5)`` — identical IEEE double ops on both
    sides, then exact int64 addition in any order); raw double sums are
    order-dependent in the last ulp and would hash-mismatch;
  * count columns are int64 on both sides; int32 keys are cast to int64;
  * top-k queries carry a total-order tie-break (value desc, key asc).

Scale discipline: column pruning at read_parquet; per-batch partial
aggregation before every groupby; broadcast small sides (nation) instead of
shuffle joins; top-k as per-batch partial top-k → tiny global sort.
"""

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

_ALNUM = re.compile(r"[a-z0-9]+")
EMBED_DIM = 64  # testdata embeddings dim (TESTDATA.md tables)


def _rp(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _gagg(ds: "ray.data.Dataset", key: str, *aggs) -> "ray.data.Dataset":
    """groupby(key).aggregate(*aggs) through grouped_aggregate's bucketed
    vectorized plan — used on every HIGH-cardinality key (tokens, doc/order/
    customer ids, content hashes), where Ray's native per-group reduce pays
    ~140 µs/group (170 s at 1.2M groups, measured)."""
    from ..stages.canonicalize import grouped_aggregate

    return grouped_aggregate(ds, [key], *aggs)


def _cents(values: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(values, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


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


def q_events_hourly(sf_dir: str):
    """§2.9 streaming analog: tumbling 1-hour event-time window as a grouped
    aggregate over floor(epoch/3600) (ordering-free, key carried per row)."""
    ds = _rp(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "window_id": us // 3_600_000_000,
                "event_type": t.column("event_type").to_pylist(),
                "value_cents": _cents(np.asarray(t.column("value"))),
            }
        )
        g = df.groupby(["window_id", "event_type"], as_index=False).agg(
            n_events=("value_cents", "size"), value_cents=("value_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..stages.canonicalize import grouped_aggregate

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_id", "event_type"],
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )


def q_user_event_stats(sf_dir: str):
    """A6 running-aggregate analog: per-(user, type) count + exact max."""
    ds = _rp(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t.column("user_id").to_pylist(),
                "event_type": t.column("event_type").to_pylist(),
                "max_value_cents": _cents(np.asarray(t.column("value"))),
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("max_value_cents", "size"), max_value_cents=("max_value_cents", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..stages.canonicalize import grouped_aggregate

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"],
        Sum("n", alias_name="n"),
        Max("max_value_cents", alias_name="max_value_cents"),
    )


def q_props_stats(sf_dir: str):
    """§2.8 JSON decode: parse the events.props JSON column, aggregate the
    extracted integer (exact) — vectorized per batch with the stdlib parser."""
    import json as _json

    ds = _rp(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ks = [int(_json.loads(p or "{}").get("k", 0)) for p in t.column("props").to_pylist()]
        df = pd.DataFrame({"event_type": t.column("event_type").to_pylist(), "sum_k": ks})
        g = df.groupby("event_type", as_index=False).agg(
            n=("sum_k", "size"), sum_k=("sum_k", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
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


def q_doc_sample_hash(sf_dir: str):
    """O5/O7 analog at scale: deterministic Bernoulli sampling by content hash
    (seeded RNG order doesn't survive distribution; md5 < threshold does, and
    the SQL oracle reproduces it exactly). ~1/8 of rows."""
    import hashlib as _hl

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def pick(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        mask = [_hl.md5(str(i).encode()).hexdigest() < "2" for i in ids]
        out = t.filter(pa.array(mask, pa.bool_()))
        return pa.table({"doc_id": pc.cast(out.column("doc_id"), pa.int64())})

    return ds.map_batches(pick, batch_format="pyarrow")


def q_top_event_per_user(sf_dir: str):
    """Top-1-per-group (window-function analog): each user's max-value event,
    deterministic tie-break on event_id. Grouped by COARSE hash buckets
    (user_id % P), exact per-user groupby in pandas inside — Ray's map_groups
    costs ~80μs per group, so one-Ray-group-per-user makes per-group overhead
    dominate at web-scale user cardinality."""
    ds = _rp(sf_dir, "events", ["user_id", "event_id", "value"])
    from ..stages.canonicalize import _compact_blocks

    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_top1(g: pd.DataFrame) -> pd.DataFrame:
        # (value desc, event_id asc) is a total order per user → head(1) exact
        g = g.sort_values(["value", "event_id"], ascending=[False, True])
        out = g.groupby("user_id", as_index=False, sort=False).head(1)
        return out[["user_id", "event_id"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_top1, batch_format="pandas")
    )


def q_user_event_seq(sf_dir: str):
    """ORDERED per-group aggregation (SQL string_agg ... ORDER BY): each
    user's full event-type sequence in (ts, event_id) order — the behavioral
    'clickstream signature' a sessionization pipeline feeds to sequence
    models. Ordering is a TOTAL order (event_id unique), so the output is
    deterministic at any parallelism. Plan: coarse user buckets (full rows
    ship once — an ordered concat is not pre-reducible), per-user sort +
    join inside the bucket. Output: (user_id, n_events, seq)."""
    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    from ..stages.canonicalize import _compact_blocks

    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = g.groupby("user_id", as_index=False).agg(
            n_events=("event_id", "size"),
            seq=("event_type", lambda s: ">".join(s)),
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_events", "seq"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_seq, batch_format="pandas")
    )


_TOPK_PER_GROUP = 3


def q_top3_events_per_user(sf_dir: str):
    """Top-K-per-group (K=3) with a PER-BATCH COMBINER — the shape
    ``top_event_per_user`` (K=1) lacks: every batch first reduces to ≤ K
    rows per user, so the shuffle ships O(users·K·blocks-touched) rows, not
    the whole fact table; the coarse-bucketed final pass re-ranks exactly.
    Ordering is (value DESC, event_id ASC) — a total order per user, so the
    result is deterministic and the combiner is lossless (any global top-K
    row is a batch top-K row). Output: (user_id, rk, event_id, value_cents)."""
    ds = _rp(sf_dir, "events", ["user_id", "event_id", "value"])
    from ..stages.canonicalize import _compact_blocks

    P = _compact_blocks()
    K = _TOPK_PER_GROUP

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"], ascending=[False, True])
        out = df.groupby("user_id", sort=False).head(K).copy()
        out["__part"] = (out["user_id"].to_numpy(dtype=np.int64)) % P
        return out[["user_id", "event_id", "value", "__part"]]

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ascending=[False, True])
        out = g.groupby("user_id", sort=False).head(K).copy()
        out["rk"] = out.groupby("user_id", sort=False).cumcount() + 1
        out["value_cents"] = _cents(out["value"].to_numpy())
        return out[["user_id", "rk", "event_id", "value_cents"]].astype("int64")

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("__part")
        .map_groups(part_topk, batch_format="pandas")
    )


def q_fold_counts(sf_dir: str):
    """O3 GroupKFold analog: deterministic partition column doc_id % 5."""
    ds = _rp(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        fold = pc.cast(t.column("doc_id"), pa.int64()).to_numpy() % 5
        df = pd.DataFrame({"fold": fold})
        g = df.groupby("fold", as_index=False).size().rename(columns={"size": "n_docs"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fold")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def q_distinct_langs(sf_dir: str):
    """A1 vocabulary collection: global distinct + sort (tiny result)."""
    langs = sorted(_rp(sf_dir, "documents", ["lang"]).unique("lang"))
    return pa.table({"lang": pa.array(langs, pa.string())})


def q_lang_stats(sf_dir: str):
    """A2/A3 histogram: groupby-count + exact integer sum."""
    ds = _rp(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": t.column("lang").to_pylist(),
             "sum_chars": pc.cast(t.column("n_chars"), pa.int64()).to_numpy()}
        )
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("sum_chars", "size"), sum_chars=("sum_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
    )


def q_word_freq(sf_dir: str):
    """A4 word-frequency vocabulary with MIN_FREQ threshold (explode + count)."""
    ds = _rp(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            for w in _ALNUM.findall((s or "").lower()):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {"token": pa.array(list(counts), pa.string()),
             "n": pa.array(list(counts.values()), pa.int64())}
        )

    agg = _gagg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "token", Sum("n", alias_name="n"),
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 5)), batch_format="pyarrow"
    )


def q_exact_dedup(sf_dir: str):
    """D2 exact dedup by serialized content key (md5), keep-min-id + count."""
    from ..functions.dedup import exact_dedup_groups

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_groups(ds, "text", "doc_id")


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


def q_token_stats(sf_dir: str):
    """M13/A3 per-document token statistics (integers only — SQL-exact)."""
    from ..stages.textops import token_stats_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow")


def q_label_hist(sf_dir: str):
    ds = _rp(sf_dir, "embeddings", ["label"])

    def partial(t: pa.Table) -> pa.Table:
        lab = pc.cast(t.column("label"), pa.int64()).to_numpy()
        df = pd.DataFrame({"label": lab})
        g = df.groupby("label", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_knn_cosine(sf_dir: str):
    """Similarity search baseline: brute-force cosine top-10 vs a fixed query
    (all-ones), per-batch partial top-k → global rank. Ints only in output."""
    from ..functions.similarity import knn_brute

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_brute(ds, np.ones((1, EMBED_DIM)), k=10)
    return out.map_batches(
        lambda t: pa.table(
            {"vec_id": t.column("vec_id"), "rank": pc.cast(t.column("rank"), pa.int64())}
        ),
        batch_format="pyarrow",
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


def q_click_after_purchase(sf_dir: str):
    """As-of join (custom operator, stages/asof.py): each click matched to the
    user's latest prior purchase; inner (matched-only) output."""
    from ..stages.asof import asof_join

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    joined = asof_join(clicks, purchases, on="user_id", ts_col="ts")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "event_id_r" not in df.columns:
            return pd.DataFrame({"click_id": pd.Series([], dtype="int64"),
                                 "purchase_id": pd.Series([], dtype="int64")})
        out = df.dropna(subset=["event_id_r"])
        return pd.DataFrame(
            {"click_id": out["event_id"].astype("int64"),
             "purchase_id": out["event_id_r"].astype("int64")}
        )

    return joined.map_batches(finish, batch_format="pandas")


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


def q_sample_events(sf_dir: str):
    """O7 sampling analog, made deterministic: systematic 1-in-20 sample by
    key (hash/RNG-free so the SQL oracle reproduces it exactly)."""
    ds = _rp(sf_dir, "events", ["event_id", "event_type"])

    def pick(t: pa.Table) -> pa.Table:
        mask = (pc.cast(t.column("event_id"), pa.int64()).to_numpy() % 20) == 0
        return t.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow")


def q_fold_stats(sf_dir: str):
    """A7 per-fold mean/variance — computed from exact integer sums so the
    double arithmetic is the identical expression on both sides."""
    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        doc = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        nc = pc.cast(t.column("n_chars"), pa.int64()).to_numpy()
        df = pd.DataFrame({"fold": doc % 5, "s": nc, "ss": nc * nc})
        g = df.groupby("fold", as_index=False).agg(
            n=("s", "size"), s=("s", "sum"), ss=("ss", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fold")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.float64())
        s = pc.cast(t.column("s"), pa.float64())
        ss = pc.cast(t.column("ss"), pa.float64())
        mean = pc.divide(s, n)
        var = pc.subtract(pc.divide(ss, n), pc.multiply(mean, mean))
        return pa.table(
            {
                "fold": t.column("fold"),
                "n_docs": t.column("n"),
                "mean_chars": mean,
                "var_chars": var,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_FUNNEL_STEPS = ("view", "click", "purchase")


def q_user_funnel(sf_dir: str):
    """Ordered-step funnel (view → click → purchase by strictly increasing
    first-occurrence time): per-(user, step) Min-timestamp partial
    aggregation collapses the stream to ≤ |steps| rows per user BEFORE the
    only shuffle, then a per-user width-|steps| pivot evaluates step order
    row-locally and a global integer sum yields one row. User cardinality
    never reaches the driver."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        types = t.column("event_type").to_pylist()
        mask = pa.array([x in _FUNNEL_STEPS for x in types], pa.bool_())
        t = t.filter(mask)
        df = pd.DataFrame(
            {"user_id": pc.cast(t.column("user_id"), pa.int64()).to_numpy(),
             "event_type": t.column("event_type").to_pylist(),
             "ts_us": pc.cast(t.column("ts"), pa.int64()).to_numpy()}
        )
        g = df.groupby(["user_id", "event_type"], as_index=False)["ts_us"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    firsts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], Min("ts_us", alias_name="ts_us"),
    )

    def per_user_flags(g: pa.Table) -> pa.Table:
        m = dict(zip(g.column("event_type").to_pylist(),
                     pc.cast(g.column("ts_us"), pa.int64()).to_pylist()))
        v, c, p = (m.get(s) for s in _FUNNEL_STEPS)
        f1 = int(v is not None)
        f2 = int(f1 and c is not None and v < c)
        f3 = int(f2 and p is not None and c < p)
        return pa.table({"n_view": pa.array([f1], pa.int64()),
                         "n_view_click": pa.array([f2], pa.int64()),
                         "n_view_click_purchase": pa.array([f3], pa.int64())})

    agg = firsts.groupby("user_id").map_groups(per_user_flags, batch_format="pyarrow")
    out = grouped_aggregate(
        agg.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["g"],
        Sum("n_view", alias_name="n_view"),
        Sum("n_view_click", alias_name="n_view_click"),
        Sum("n_view_click_purchase", alias_name="n_view_click_purchase"),
    )
    return out.map_batches(
        lambda t: t.drop_columns(["g"]), batch_format="pyarrow")


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (streaming-shaped op, SURVEY.md §2.9 analog):
    events partitioned by user, sorted by ts within the group, new session
    when the gap exceeds 1h. n_sessions = 1 + count(gap > 1h)."""
    ds = _rp(sf_dir, "events", ["user_id", "ts"])
    from ..stages.canonicalize import _compact_blocks

    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_sessions(g: pd.DataFrame) -> pd.DataFrame:
        # coarse hash-bucket group; exact per-user sessionization inside
        # (one Ray group per USER would pay ~80μs/group at web-scale)
        g = g.sort_values(["user_id", "ts"])
        gap = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds() > 3600
        out = (
            g.assign(__gap=gap)
            .groupby("user_id", as_index=False, sort=False)
            .agg(n_events=("ts", "size"), n_sessions=("__gap", "sum"))
        )
        out["n_sessions"] = (out["n_sessions"] + 1).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_events", "n_sessions"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_sessions, batch_format="pandas")
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


def q_best_fold(sf_dir: str):
    """A10 grid-search argmax analog: the fold with the highest mean_chars
    (tie → lowest fold), computed as a driver reduce over the tiny per-fold
    stats table — the best-config selection of the reference's BiLSTM grid
    search (BiLSTM-CRF/5489Project_trainv2.ipynb cells 7-8)."""
    from ..functions.metrics import best_config

    rows = q_fold_stats(sf_dir).take_all()  # 5 rows — the A10 reduce is driver-side
    best = best_config(rows, "mean_chars", tiebreak=["fold"])
    return pa.table(
        {"fold": pa.array([int(best["fold"])], pa.int64()),
         "mean_chars": pa.array([float(best["mean_chars"])], pa.float64())}
    )


# --------------------------------------------------------------------------
# Training-data ops without a SQL equivalent (rows-only driver check)
# --------------------------------------------------------------------------

def _project_pairs(pairs):
    """(id_a, id_b, jaccard_ppm) — the exact-integer columns the DuckDB
    oracle replicates (the float jaccard stays internal)."""
    cols = ["id_a", "id_b", "jaccard_ppm"]

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows:
            return pa.table({c: pc.cast(t.column(c), pa.int64()) for c in cols})
        return pa.table({c: pa.array([], pa.int64()) for c in cols})

    return pairs.map_batches(fn, batch_format="pyarrow")


def q_minhash_neardup(sf_dir: str):
    from ..functions.dedup import lsh_near_dup_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return _project_pairs(
        lsh_near_dup_pairs(ds, "text", "doc_id", shingle="word3", threshold=0.8)
    )


def q_simhash(sf_dir: str):
    from ..functions.dedup import with_simhash

    return with_simhash(_rp(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id")


def q_ngram_jaccard_neardup(sf_dir: str):
    from ..functions.dedup import lsh_near_dup_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return _project_pairs(
        lsh_near_dup_pairs(ds, "text", "doc_id", shingle="word1", threshold=0.9)
    )


def q_setsim_neardup(sf_dir: str):
    """EXACT set-similarity self-join (Jaccard ≥ 3/5 over word-3 shingle
    sets) via hash-ordered prefix filtering — the deterministic complement
    to the MinHash family: blocking is provably lossless under any global
    shingle order, so the oracle is the plain all-pairs exact Jaccard SQL
    (functions/dedup.setsim_join_pairs)."""
    from ..functions.dedup import setsim_join_pairs

    return setsim_join_pairs(
        _rp(sf_dir, "documents", ["doc_id", "text"]), "text", "doc_id",
        threshold_num=3, threshold_den=5, shingle="word3",
    )


def q_paragraph_dedup(sf_dir: str):
    """Sub-document (paragraph-granular) exact dedup — the RefinedWeb/C4
    pass that removes boilerplate chunks repeated ACROSS documents while
    keeping the first occurrence. Paragraph := consecutive 10-token chunk
    (the fixture corpus has no newlines). Plan: flat-map docs → (chunk md5,
    packed keeper key) rows; ONE narrow groupby on the 32-char hash picks
    each content's global keeper (min (doc_id, idx)); per-doc totals and
    kept counts then meet through a side-tagged union + int-key groupby —
    no join, no text ever crosses a shuffle. Output: (doc_id, n_chunks,
    n_kept)."""
    import hashlib

    CH = 10
    KEY_BASE = 1_000_000  # keeper key = doc_id * BASE + chunk_idx
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        o_doc, o_key, o_h = [], [], []
        for did, s in zip(
            pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
            t.column("text").to_pylist(),
        ):
            ws = [w for w in re.split(r"\s+", s or "") if w]
            n_chunks = (len(ws) + CH - 1) // CH
            if n_chunks >= KEY_BASE:
                raise ValueError("document exceeds 10M tokens — widen KEY_BASE")
            for i in range(n_chunks):
                chunk = " ".join(ws[i * CH:(i + 1) * CH])
                o_doc.append(did)
                o_key.append(did * KEY_BASE + i)
                o_h.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
        return pa.table(
            {"doc_id": pa.array(o_doc, pa.int64()),
             "key": pa.array(o_key, pa.int64()),
             "h": pa.array(o_h, pa.string())}
        )

    chunked = ds.map_batches(chunks, batch_format="pyarrow")
    keepers = _gagg(chunked, "h", Min("key", alias_name="k"))

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t.column("doc_id").to_pylist()})
        g = df.groupby("doc_id", as_index=False).size()
        return pa.table(
            {"doc_id": pa.array(g["doc_id"], pa.int64()),
             "n_chunks": pa.array(g["size"].astype("int64"), pa.int64()),
             "n_kept": pa.array(np.zeros(len(g), np.int64), pa.int64())}
        )

    def kept(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chunks": pa.array([], pa.int64()),
                             "n_kept": pa.array([], pa.int64())})
        k = pc.cast(t.column("k"), pa.int64()).to_numpy()
        df = pd.DataFrame({"doc_id": k // KEY_BASE})
        g = df.groupby("doc_id", as_index=False).size()
        return pa.table(
            {"doc_id": pa.array(g["doc_id"], pa.int64()),
             "n_chunks": pa.array(np.zeros(len(g), np.int64), pa.int64()),
             "n_kept": pa.array(g["size"].astype("int64"), pa.int64())}
        )

    return _gagg(
        chunked.map_batches(totals, batch_format="pyarrow")
        .union(keepers.map_batches(kept, batch_format="pyarrow")),
        "doc_id",
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("n_kept", alias_name="n_kept"),
    )


def q_langid(sf_dir: str):
    from ..stages.textops import langid_batch

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pyarrow"
    )


def q_quality(sf_dir: str):
    from ..stages.textops import quality_batch

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow"
    )


def q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio in ppm — the classic cheap web-curation
    signal (boilerplate / template / repeated-spam text compresses far below
    natural prose; cf. Gopher/CCNet-style quality filters). Pure row-local
    map, no shuffle; deterministic for a fixed zlib, pinned by unit tests
    (ordering + batch invariance), rows-only for the driver (no SQL zlib)."""
    import zlib

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        ratios = []
        for txt in t.column("text").to_pylist():
            raw = (txt or "").encode("utf-8")
            ratios.append(
                len(zlib.compress(raw, 6)) * 1_000_000 // len(raw) if raw else 0)
        return pa.table({"doc_id": ids,
                         "compress_ppm": pa.array(ratios, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    from ..stages.textops import fingerprint_batch

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def q_knn_ivf(sf_dir: str):
    from ..functions.similarity import ivf_assign, ivf_build_centroids, knn_ivf

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = ivf_build_centroids(ds, n_centroids=8, refine_rounds=1)
    assigned = ivf_assign(ds, cent)
    out = knn_ivf(assigned, cent, np.ones((1, EMBED_DIM)), k=10, n_probe=4)
    return out.select_columns(["vec_id", "rank"])


def q_knn_ivf_full(sf_dir: str):
    """IVF with n_probe == n_centroids probes every partition, so the result
    is EXACT by construction — this pins the whole IVF plumbing (deterministic
    centroid build, bucket assign, probe filter, per-bucket scan) to the
    brute-force SQL oracle. q_knn_ivf (n_probe=4) is the pruned approximate
    variant of the same plan (rows-only check; recall is data-dependent)."""
    from ..functions.similarity import ivf_assign, ivf_build_centroids, knn_ivf

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = ivf_build_centroids(ds, n_centroids=8, refine_rounds=1)
    assigned = ivf_assign(ds, cent)
    out = knn_ivf(assigned, cent, np.ones((1, EMBED_DIM)), k=10, n_probe=8)
    return out.select_columns(["vec_id", "rank"])


def q_embedding_neardup(sf_dir: str, *, bucket_cap: int = 1024):
    """Embedding-cosine near-dup: brute pairwise per IVF bucket.

    Scale discipline: ``n_centroids`` grows as √n (expected bucket size √n,
    pairwise work n·√n, never quadratic in the corpus), and a bucket that
    still exceeds ``bucket_cap`` falls back to a sorted CHAIN of consecutive
    comparisons (O(n), connectivity-preserving) — the same skew cap as the
    LSH dedup family. Buckets are grouped by COARSE hash partitions; exact
    buckets iterate in pandas inside (map_groups per-group overhead)."""
    from ..functions.similarity import ivf_assign, ivf_build_centroids
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()
    n_centroids = max(8, min(4096, int(np.sqrt(max(n, 1)))))
    cent = ivf_build_centroids(ds, n_centroids=n_centroids, refine_rounds=1)
    assigned = ivf_assign(ds, cent)
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        b = pc.cast(t.column("ivf_bucket"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(b % P, pa.int64()))

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, gb in g.groupby("ivf_bucket", sort=False):
            gb = gb.sort_values("vec_id")
            ids = gb["vec_id"].to_numpy()
            if len(ids) < 2:
                continue
            m = np.stack(gb["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            if len(ids) <= bucket_cap:
                sims = (m @ m.T) / np.outer(norms, norms)
                ii, jj = np.where(np.triu(sims > 0.95, k=1))
            else:  # skew cap: consecutive sorted pairs only, O(n)
                mn = m / norms[:, None]
                s = (mn[:-1] * mn[1:]).sum(axis=1)
                ii = np.where(s > 0.95)[0]
                jj = ii + 1
            out_a.extend(ids[ii].astype(np.int64))
            out_b.extend(ids[jj].astype(np.int64))
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64")}
        )

    return (
        assigned.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_pairs, batch_format="pandas")
    )


def q_subword_counts(sf_dir: str):
    """Subword token counting: whitespace words → greedy longest-match
    WordPiece against the packaged vocabulary (functions/wordpiece.py —
    vocab loaded once per worker process). Rows-only."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        from ..functions.wordpiece import default_vocab, wordpiece_tokenize

        vocab = default_vocab()
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        counts = [
            sum(len(wordpiece_tokenize(w, vocab)) for w in (txt or "").split())
            for txt in texts
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_subwords": pa.array(counts, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_kmeans_fixed(sf_dir: str):
    """Integer-exact distributed Lloyd's k-means (functions/kmeans.py):
    centroids broadcast per round via ray.put, assignment + per-cluster
    partial sums in ONE vectorized int64 map_batches pass, the only shuffle
    a k·(d+1)-row partial combine — the canonical corpus-scale clustering
    shape (driver state bounded by k, never by n). Quantization offsets the
    embedding range positive so ``//`` is floor on BOTH numpy and DuckDB;
    the oracle unrolls the rounds as CTEs (same trick as graph_pagerank)."""
    from ..functions.kmeans import kmeans_fixed

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_fixed(ds, k=8, n_iters=3)


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


def q_per_source_sample(sf_dir: str, *, k: int = 5):
    """Deterministic k-per-stratum downsample (data-mix curation): keep the
    k docs with the smallest md5(doc_id) per source. Per-batch partial
    top-k caps the shuffle at k rows per (batch, source) — the stratified
    variant of the partial-top-k pattern; the final per-source merge sees
    ≤ k·n_blocks rows however large the corpus is."""
    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    import hashlib

    def _hx(ids) -> list[str]:
        return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": pc.cast(t.column("doc_id"), pa.int64()).to_numpy(),
                           "source": t.column("source").to_pylist()})
        df["h"] = _hx(df["doc_id"])
        df = df.sort_values(["source", "h", "doc_id"]).groupby("source").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["h", "doc_id"]).head(k)
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["source", "doc_id", "rk"]], preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


def q_phrase_search(sf_dir: str, *, phrase: tuple = ("stream", "table", "hash")):
    """Exact phrase match via a POSITIONAL inverted index: one corpus pass
    emits (doc_id, token_pos) postings for the query tokens only (the
    \"index probe\" — postings volume ∝ query-token frequency, not corpus
    size), then adjacency is resolved with chained hash-partitioned joins
    on (doc_id, pos+i) and match counts by grouped aggregate. The row-local
    scan (decontamination-style) answers one phrase cheaper; the postings
    join is the batch-of-phrases / index-reuse shape."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    qmap = {w: i for i, w in enumerate(phrase)}

    def postings(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        texts = t.column("text").to_pylist()
        o_id, o_p, o_ti = [], [], []
        for did, txt in zip(ids, texts):
            for p, w in enumerate(_ALNUM.findall((txt or "").lower())):
                ti = qmap.get(w)
                if ti is not None:
                    o_id.append(int(did)); o_p.append(p); o_ti.append(ti)
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "p": pa.array(o_p, pa.int64()),
                         "ti": pa.array(o_ti, pa.int64())})

    post = ds.map_batches(postings, batch_format="pyarrow").materialize()

    def term(ti: int):
        # anchor coordinates: term ti at pos p matches anchor p - ti
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("ti"), ti))
            return pa.table(
                {"doc_id": t.column("doc_id"),
                 "p": pc.subtract(t.column("p"), ti)})
        return fn

    cur = post.map_batches(term(0), batch_format="pyarrow")
    for i in range(1, len(phrase)):
        nxt = post.map_batches(term(i), batch_format="pyarrow")
        cur = hash_join(cur, nxt, on=("doc_id", "p"))

    return grouped_aggregate(
        cur.map_batches(
            lambda t: pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["doc_id"], Sum("one", alias_name="n_matches"),
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


def q_image_features(sf_dir: str):
    """Multimodal binary-column stage (stages/multimodal.py): the documents
    table's text bytes stand in as an opaque binary payload column; decode +
    resize + feature-extract runs with the deterministic FakeCodec (real
    codec is a documented plug — the libs are absent here). Exercises the
    fat-row plumbing: small batch_size, payload dropped on output. Rows-only."""
    from ..stages.multimodal import image_features

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                  pa.binary())}
        )

    return image_features(ds.map_batches(to_payload, batch_format="pyarrow"))


def q_video_frames(sf_dir: str):
    """Multimodal frame sampling (stages/multimodal.FrameSampleStage): binary
    'video' payload → one row per sampled frame with its pixel feature —
    flat-map shaped like sentseg, small batch_size for fat rows, payload
    dropped on output. FakeCodec deterministic; real codec is the documented
    plug. Rows-only."""
    from ..stages.multimodal import frame_samples

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                  pa.binary())}
        )

    return frame_samples(ds.map_batches(to_payload, batch_format="pyarrow"), n_frames=4)


def q_audio_chunks(sf_dir: str):
    """Multimodal audio chunking (stages/multimodal.AudioChunkStage): binary
    'audio' payload → one row per fixed-length chunk with integer energy /
    zero-crossing features — the VAD front-end shape. FakeCodec
    deterministic; real codec is the documented plug. Rows-only."""
    from ..stages.multimodal import audio_chunks

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "").encode("utf-8") for s in texts],
                                  pa.binary())}
        )

    return audio_chunks(ds.map_batches(to_payload, batch_format="pyarrow"))


def q_cluster_homogeneity(sf_dir: str):
    """A9 — clustering quality: homogeneity of deterministic IVF clusters vs
    the embeddings table's labels (the KMeans-homogeneity analog,
    scripts/visualize_embeddings.py:217-247). Single-row result, rows-only."""
    from ..functions.metrics import clustering_homogeneity
    from ..functions.similarity import ivf_assign, ivf_build_centroids

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    cent = ivf_build_centroids(ds, n_centroids=10, refine_rounds=2)
    assigned = ivf_assign(ds, cent)
    h = clustering_homogeneity(assigned, "ivf_bucket", "label")
    return pa.table({"homogeneity": pa.array([round(h, 9)], pa.float64())})


def q_mention_confusion(sf_dir: str):
    """A8 — confusion top-k between pipeline mentions and generator gold over
    the synthetic pages corpus (groupby→sort→limit pattern). Rows-only."""
    import pyarrow.parquet as _pq
    import ray.data as _rd

    from ..functions.metrics import confusion_topk
    from .kg import pages_dataset, run_kg

    pdir = _synthetic_pages_dir(sf_dir)
    res = run_kg(pages_dataset(pdir), out_dir=None, n_partitions=8)
    pred = res["mentions"].map_batches(
        lambda t: t.select(["url", "sent_id", "start", "end", "type"]),
        batch_format="pyarrow",
    )
    gold = _rd.from_arrow(_pq.read_table(os.path.join(pdir, "gold_mentions.parquet")))
    return confusion_topk(pred, gold, ["url", "sent_id", "start", "end"], "type", k=10)


def q_kg_edges(sf_dir: str):
    """Flagship KG pipeline over the deterministic synthetic pages corpus
    (size scaled by sf). Rows-only driver check; full parity vs the oracle is
    asserted in tests/test_oracle_parity.py."""
    from .kg import pages_dataset, run_kg

    pdir = _synthetic_pages_dir(sf_dir)
    res = run_kg(pages_dataset(pdir), out_dir=None, n_partitions=8)
    return res["edges"]


def _synthetic_pages_dir(sf_dir: str) -> str:
    """Shared cache of the deterministic synthetic crawl, scaled by sf.

    Self-heals caches written before the link-planting generator revision:
    ``gold_links.parquet`` doubles as the generation-version sentinel, so a
    pre-link cache is regenerated in place (page text/urls are unchanged
    across that revision — only the html gains an <aside> link block)."""
    import re as _re

    from ..sources.pages import write_pages

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n_pages = max(100, int(20000 * sf))
    pdir = f"/tmp/ner_ray_pages_sf{sf}"
    if not os.path.exists(os.path.join(pdir, "gold_links.parquet")):
        write_pages(pdir, n_pages, seed=42, n_files=8)
    return pdir


def q_host_link_graph(sf_dir: str):
    """Host-level link graph of the synthetic crawl: html → <a href> links →
    (src_host, dst_host, n_links), intra-host nav dropped; per-batch partial
    pair counts before ONE bucketed exchange (functions/weblinks.py).
    ORACLE-BACKED on the planted gold_links table (_web_oracle_sqls); the
    html parse itself stays pinned by the independent html.parser parity
    test in tests/test_weblinks.py."""
    from ..functions.weblinks import host_link_graph
    from .kg import pages_dataset

    pdir = _synthetic_pages_dir(sf_dir)
    g = host_link_graph(pages_dataset(pdir))
    return g.sort(["src_host", "dst_host"])


def q_anchor_texts(sf_dir: str):
    """Top-3 anchor texts per destination host (count desc, text asc) — the
    weak-label aggregation retrieval corpora are built from. Vocabulary-sized
    grouped top-k after per-batch partial counting. Oracle-backed on
    gold_links (grouped QUALIFY top-k, _web_oracle_sqls)."""
    from ..functions.weblinks import anchor_top_terms
    from .kg import pages_dataset

    pdir = _synthetic_pages_dir(sf_dir)
    out = anchor_top_terms(pages_dataset(pdir), k=3)
    return out.sort(["dst_host", "anchor"])


def q_host_pagerank(sf_dir: str):
    """Integer-exact PageRank over the host link graph (crawl-prioritization
    signal): link extraction → host-pair aggregate → hash_join power
    iteration → name attach, every step partitioned. Oracle-backed: the
    unrolled integer-CTE replication over gold_links (_web_oracle_sqls)."""
    from ..functions.weblinks import host_pagerank
    from .kg import pages_dataset

    pdir = _synthetic_pages_dir(sf_dir)
    pr = host_pagerank(pages_dataset(pdir), n_iters=3)
    return pr.sort(["pr", "host"], descending=[True, False])


def q_url_canonical_dedup(sf_dir: str):
    """Canonical-URL dedup — the first pass of every crawl pipeline: the same
    article arrives as clean / SHOUTING-host + trailing-slash / tracking-param
    variants, and dedup keys on ``canonical_url`` (functions/weblinks.py:
    lowercase authority, drop fragment + utm_*/ref params, strip trailing
    slash). URLs are derived deterministically from ``doc_id`` — three
    variants per article index — so the oracle replicates both the derivation
    and the normalization in SQL and the match is exact.

    Plan: read doc_id ONLY → row-local derive+canonicalize → PER-BATCH
    (canonical_url, partial count, partial min) partials → ONE bucketed
    exchange of Sum + Min. At crawl scale the shuffle ships distinct-url-,
    not corpus-, sized rows — never page bytes — and variant triples that
    co-reside in a batch collapse before the exchange."""
    from ray.data.aggregate import Min, Sum

    from ..functions.weblinks import canonical_url
    from ..stages.canonicalize import grouped_aggregate

    def derive(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        urls = []
        for d in ids:
            a = int(d) // 3
            s = a % 7
            v = int(d) % 3
            if v == 0:
                u = f"https://www.s{s}.example.org/a/{a}"
            elif v == 1:
                u = f"HTTPS://WWW.S{s}.EXAMPLE.ORG/a/{a}/"
            else:
                u = f"https://www.s{s}.example.org/a/{a}?utm_source=feed&ref=tw#frag"
            urls.append(canonical_url(u))
        part = (
            pd.DataFrame({"canonical_url": urls, "doc_id": ids})
            .groupby("canonical_url", sort=False)
            .agg(n_variants=("doc_id", "size"), keep_doc_id=("doc_id", "min"))
            .reset_index()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    docs = _rp(sf_dir, "documents", ["doc_id"]).map_batches(
        derive, batch_format="pyarrow"
    )
    out = grouped_aggregate(
        docs,
        ["canonical_url"],
        Sum("n_variants", alias_name="n_variants"),
        Min("keep_doc_id", alias_name="keep_doc_id"),
    )
    return out.sort("canonical_url")


def q_redirect_resolve(sf_dir: str):
    """Redirect/alias CHAIN RESOLUTION — the crawl op that maps every URL to
    its terminal target through arbitrarily long redirect chains (301 hops,
    URL aliases), plus the hop count. The synthetic redirect function is
    next(d) = d/2 for even d (odd ids and 0 are terminal), so chains are
    d → d/2 → … → odd, length = trailing-zero count of d — which gives the
    oracle a CLOSED FORM: target = d // (d & -d), hops = bit_count((d & -d)
    − 1). No recursion in SQL, yet the engine must genuinely follow chains.

    Plan: RECURSIVE DOUBLING — ptr_{k+1}(x) = ptr_k(ptr_k(x)), hops add —
    one partitioned self-``hash_join`` per round on the node-sized pointer
    table, rounds = ⌈log₂(bit-length of max id)⌉ ≥ ⌈log₂ max_chain⌉ (4 at
    sf0.01; a 10¹²-url table needs 6). Terminals self-loop so saturation
    is free. This is the pointer-jumping primitive canonicalization's
    connected components already uses, applied to a functional graph."""
    from ..stages.joins import hash_join

    def init(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        even = (d % 2 == 0) & (d > 0)
        ptr = np.where(even, d // 2, d)
        hops = even.astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()),
             "ptr": pa.array(ptr, pa.int64()),
             "hops": pa.array(hops, pa.int64())}
        )

    state = _rp(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow"
    ).materialize()
    # rounds sized to the longest POSSIBLE chain: max hops = bit-length of
    # the max id, doubling covers 2^rounds hops. Partition count stays small
    # — the pointer table is node-sized, and each extra partition is a fixed
    # per-round task cost, not a win, until the table outgrows one heap.
    max_id = int(state.max("doc_id") or 0)
    rounds = max(1, math.ceil(math.log2(max(2, max_id.bit_length()))))
    nparts = 8
    for _ in range(rounds):
        right = state.map_batches(
            lambda t: pa.table(
                {"ptr": pc.cast(t.column("doc_id"), pa.int64()),
                 "ptr_b": pc.cast(t.column("ptr"), pa.int64()),
                 "hops_b": pc.cast(t.column("hops"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        # LEFT join + coalesce: a pointer target outside the id domain
        # (non-dense tables, filtered subsets) keeps its row as-is instead
        # of being silently dropped by an inner join
        joined = hash_join(state, right, on=["ptr"], how="left",
                           num_partitions=nparts)
        state = joined.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"].astype("int64"),
                 "ptr": df["ptr_b"].where(df["ptr_b"].notna(), df["ptr"])
                 .astype("int64"),
                 "hops": (df["hops"] + df["hops_b"].fillna(0)).astype("int64")}
            ),
            batch_format="pandas",
        ).materialize()

    out = state.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "target_id": df["ptr"].astype("int64"),
             "n_hops": df["hops"].astype("int64")}
        ),
        batch_format="pandas",
    )
    return out.sort("doc_id")


def q_dangling_links(sf_dir: str):
    """Broken-link audit of the synthetic crawl: per destination host, how
    many cross-host link targets were never captured (Bloom prefilter +
    gated exact verify — functions/weblinks.dangling_links). Oracle-backed:
    LEFT-join anti-join audit over gold_links × gold_text
    (_web_oracle_sqls); a pandas replication additionally pins BOTH verify
    paths in tests/test_weblinks.py."""
    from ..functions.weblinks import dangling_links
    from .kg import pages_dataset

    pdir = _synthetic_pages_dir(sf_dir)
    out = dangling_links(pages_dataset(pdir))
    return out.sort("dst_host")


def q_robots_filter(sf_dir: str):
    """Robots-compliance gate on the crawl frontier: per destination host,
    how many cross-host link targets are blocked by the host's robots.txt
    (RFC 9309 longest-match over a deterministic per-host rules cache).
    Oracle-backed: the fixture's rule SHAPE (Disallow prefix + longer Allow
    carve-out) is replicated in SQL over robots.parquet × gold_links
    (_web_oracle_sqls); general parser semantics stay pinned in
    tests/test_weblinks.py."""
    import ray.data as _rd

    from ..functions.weblinks import robots_frontier_filter
    from ..sources.pages import write_robots
    from .kg import pages_dataset

    pdir = _synthetic_pages_dir(sf_dir)
    rpath = os.path.join(pdir, "robots.parquet")
    if not os.path.exists(rpath):
        write_robots(pdir, seed=42)
    out = robots_frontier_filter(pages_dataset(pdir), _rd.read_parquet(rpath))
    return out.sort("dst_host")


def q_rendezvous_shards(sf_dir: str):
    """Rendezvous (highest-random-weight) consistent shard assignment + the
    RESHARD MOVEMENT MATRIX for growing 8 → 9 shards — the partitioner
    primitive a 100-TB store uses so adding capacity moves only ~1/(S+1) of
    the data: shard(d) = argmax_s md5(d:s), and because every candidate
    weight is independent of S, a document's argmax under S+1 shards either
    stays put or moves TO the new shard — never between old shards. The
    output (old_shard, new_shard, n_docs) makes that invariant visible
    (every off-diagonal row has new_shard = 8) and the oracle replicates
    both argmaxes in SQL (md5 hex compares identically). md5 is the
    oracle-parity choice; a production reshard would use the crc32-style
    fast path, same convention as the minhash family.

    Plan: row-local double argmax inside map_batches, per-batch (old, new)
    partial counts, ONE bucketed exchange over the ≤ S·(S+1) matrix cells."""
    import hashlib

    from ray.data.aggregate import Sum

    from ..stages.canonicalize import grouped_aggregate

    S_OLD, S_NEW = 8, 9

    def assign(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        old = np.empty(len(ids), dtype=np.int64)
        new = np.empty(len(ids), dtype=np.int64)
        for i, d in enumerate(ids):
            hs = [hashlib.md5(f"{d}:{s}".encode()).hexdigest()
                  for s in range(S_NEW)]
            old[i] = max(range(S_OLD), key=hs.__getitem__)
            new[i] = max(range(S_NEW), key=hs.__getitem__)
        part = (
            pd.DataFrame({"old_shard": old, "new_shard": new})
            .groupby(["old_shard", "new_shard"], sort=False)
            .size()
            .reset_index(name="n_docs")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    cells = grouped_aggregate(
        _rp(sf_dir, "documents", ["doc_id"]).map_batches(
            assign, batch_format="pyarrow"
        ),
        ["old_shard", "new_shard"],
        Sum("n_docs", alias_name="n_docs"),
    )
    return cells.sort(["old_shard", "new_shard"])


def q_crawl_frontier(sf_dir: str):
    """Recrawl-prioritization frontier over the synthetic crawl: per host —
    page count, latest capture, PageRank, priority = pr × staleness in
    whole DAYS (integer-exact and int64-overflow-safe; see
    functions/weblinks.crawl_frontier). Uncrawled link targets surface with
    n_pages=0 and maximal staleness — the discover-new-hosts path; crawled
    hosts without link evidence carry pr=0 via the full-outer join.
    Oracle-backed: full-outer + integer scoring over the pagerank CTE and
    the pages table (_web_oracle_sqls); the composition is additionally
    pinned by tests/test_weblinks.py against a pandas replication."""
    from ..functions.weblinks import crawl_frontier
    from .kg import pages_dataset

    pdir = _synthetic_pages_dir(sf_dir)
    out = crawl_frontier(pages_dataset(pdir, with_ts=True), n_iters=3)
    return out.sort(["priority", "host"], descending=[True, False])


def _web_oracle_sqls(pdir: str) -> dict:
    """DuckDB oracles for the web family, over the PLANTED gold tables the
    fixture generator writes alongside the pages (sources/pages.py:
    ``gold_links.parquet`` = exactly the <aside> links rendered into the
    html, ``gold_text.parquet`` = one row per crawled url,
    ``robots.parquet`` = the per-host robots bodies). The engine side still
    parses the html itself — only the PARSE stays pinned by the independent
    html.parser parity test (tests/test_weblinks.py); every aggregation
    layer above it (host pairs, anchor top-k, the integer power iteration,
    the frontier outer-join scoring, the anti-join audit, the RFC 9309
    longest-match tally) is externally hash-checked here.

    Host of ``https://host/path`` is ``split_part(url, '/', 3)`` (generator
    urls are already lowercase); the robots oracle parses the fixture's
    body SHAPE (one Disallow prefix + one longer Allow carve-out, or the
    empty-Disallow allow-all form) with regexp_extract — general RFC
    semantics stay pinned by tests/test_weblinks.py."""
    scale = 10**12
    n_iters = 3
    gl = f"read_parquet('{pdir}/gold_links.parquet')"
    # shared link-graph CTE prefix: distinct cross-host pairs → symmetrized
    # edge list → degrees → the unrolled integer power iteration of
    # functions/graph.pagerank (the _pagerank_sql technique, host-keyed)
    pr_parts = [f"""
        e AS (SELECT DISTINCT split_part(src_url, '/', 3) AS u,
                              split_part(dst_url, '/', 3) AS v
              FROM {gl}
              WHERE split_part(src_url, '/', 3) <> split_part(dst_url, '/', 3)),
        s AS (SELECT u AS src, v AS dst FROM e
              UNION ALL SELECT v AS src, u AS dst FROM e),
        d AS (SELECT src AS node, COUNT(*) AS outdeg FROM s GROUP BY src),
        nn AS (SELECT COUNT(*) AS n FROM d),
        p0 AS (SELECT d.node, d.outdeg,
                      CAST({scale} // nn.n AS BIGINT) AS pr
               FROM d CROSS JOIN nn)"""]
    for i in range(1, n_iters + 1):
        pr_parts.append(f""",
        p{i} AS (SELECT d.node, d.outdeg,
                        CAST((15 * ({scale} // nn.n)) // 100
                             + (85 * c{i}.contrib) // 100 AS BIGINT) AS pr
                 FROM d CROSS JOIN nn
                 JOIN (SELECT s2.dst AS node, SUM(p.pr // p.outdeg) AS contrib
                       FROM p{i - 1} p JOIN s s2 ON s2.src = p.node
                       GROUP BY s2.dst) c{i} ON c{i}.node = d.node)""")
    pr_cte = "".join(pr_parts)

    return {
        "host_link_graph": f"""
            SELECT src_host, dst_host, COUNT(*) AS n_links FROM (
                SELECT split_part(src_url, '/', 3) AS src_host,
                       split_part(dst_url, '/', 3) AS dst_host
                FROM {gl})
            WHERE src_host <> dst_host
            GROUP BY 1, 2
        """,
        "anchor_texts": f"""
            SELECT dst_host, anchor, n FROM (
                SELECT dst_host, anchor, COUNT(*) AS n FROM (
                    SELECT split_part(src_url, '/', 3) AS src_host,
                           split_part(dst_url, '/', 3) AS dst_host, anchor
                    FROM {gl})
                WHERE src_host <> dst_host AND anchor <> ''
                GROUP BY 1, 2)
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY dst_host ORDER BY n DESC, anchor) <= 3
        """,
        "host_pagerank": f"""
            WITH {pr_cte}
            SELECT node AS host, pr FROM p{n_iters}
        """,
        "dangling_links": f"""
            WITH cl AS (
                SELECT dst_host, dst_url FROM (
                    SELECT split_part(src_url, '/', 3) AS src_host,
                           split_part(dst_url, '/', 3) AS dst_host, dst_url
                    FROM {gl})
                WHERE src_host <> dst_host),
            u AS (SELECT url FROM read_parquet('{pdir}/gold_text.parquet'))
            SELECT cl.dst_host, COUNT(*) AS n_links,
                   CAST(SUM(CASE WHEN u.url IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dangling
            FROM cl LEFT JOIN u ON cl.dst_url = u.url
            GROUP BY cl.dst_host
        """,
        "robots_filter": f"""
            WITH r AS (
                SELECT host,
                       regexp_extract(body, 'Disallow: (/article-[0-9]+)', 1)
                           AS dis,
                       regexp_extract(body, 'Allow: (/article-[0-9]+)', 1)
                           AS alw
                FROM read_parquet('{pdir}/robots.parquet')),
            cl AS (
                SELECT dst_host, '/' || split_part(dst_url, '/', 4) AS path
                FROM (
                    SELECT split_part(src_url, '/', 3) AS src_host,
                           split_part(dst_url, '/', 3) AS dst_host, dst_url
                    FROM {gl})
                WHERE src_host <> dst_host)
            SELECT cl.dst_host, COUNT(*) AS n_links,
                   CAST(SUM(CASE WHEN r.dis IS NOT NULL AND r.dis <> ''
                                      AND starts_with(cl.path, r.dis)
                                      AND NOT starts_with(cl.path, r.alw)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
            FROM cl LEFT JOIN r ON cl.dst_host = r.host
            GROUP BY cl.dst_host
        """,
        "crawl_frontier": f"""
            WITH {pr_cte},
            prt AS (SELECT node AS host, pr FROM p{n_iters}),
            crawled AS (
                SELECT split_part(url, '/', 3) AS host,
                       COUNT(*) AS n_pages,
                       MAX(epoch_us(warc_ts)) AS latest_ts
                FROM read_parquet('{pdir}/pages-*.parquet') GROUP BY 1),
            now_t AS (SELECT MAX(latest_ts) AS now_us FROM crawled)
            SELECT COALESCE(prt.host, crawled.host) AS host,
                   CAST(COALESCE(crawled.n_pages, 0) AS BIGINT) AS n_pages,
                   CAST(COALESCE(crawled.latest_ts, 0) AS BIGINT) AS latest_ts,
                   CAST(COALESCE(prt.pr, 0) AS BIGINT) AS pr,
                   CAST(COALESCE(prt.pr, 0)
                        * ((now_t.now_us - COALESCE(crawled.latest_ts, 0))
                           // 86400000000) AS BIGINT) AS priority
            FROM prt FULL OUTER JOIN crawled ON prt.host = crawled.host
            CROSS JOIN now_t
        """,
    }


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


def q_events_sliding(sf_dir: str):
    """Hopping (sliding) event-time window: size 2 h, hop 1 h — each event in
    exactly 2 windows (stages/windows.explode_hopping_windows), partials
    pre-aggregated per batch so the shuffle carries k× aggregates."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.windows import explode_hopping_windows

    ds = _rp(sf_dir, "events", ["ts", "event_type", "value"])
    exploded = explode_hopping_windows(ds, "ts", size_s=7200, hop_s=3600)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "window_id": pc.cast(t.column("window_id"), pa.int64()).to_numpy(),
                "event_type": t.column("event_type").to_pylist(),
                "value_cents": _cents(np.asarray(t.column("value"))),
            }
        )
        g = df.groupby(["window_id", "event_type"], as_index=False).agg(
            n_events=("value_cents", "size"), value_cents=("value_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        exploded.map_batches(partial, batch_format="pyarrow"),
        ["window_id", "event_type"],
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
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


def q_running_total(sf_dir: str):
    """Cumulative window function: per-user running sum of value ordered by
    (ts, event_id). Coarse hash buckets (user % P), exact per-user cumsum in
    pandas inside — same skew discipline as q_top_event_per_user."""
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        out = pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "value_cents": pa.array(_cents(np.asarray(t.column("value"))), pa.int64()),
            }
        )
        return out.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        g["running_cents"] = g.groupby("user_id", sort=False)["value_cents"].cumsum()
        return g[["event_id", "running_cents"]].astype("int64")

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_cumsum, batch_format="pandas")
    )


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


def q_purchase_clicks_window(sf_dir: str):
    """Banded interval join (stages/windows.interval_join): EVERY click within
    24 h after a same-user purchase — the all-matches counterpart of the as-of
    join in q_click_after_purchase."""
    from ..stages.windows import interval_join

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    joined = interval_join(
        clicks, purchases, on="user_id", ts_col="ts", window_s=86400
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"click_id": pd.Series([], dtype="int64"),
                                 "purchase_id": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"click_id": df["event_id"].astype("int64"),
             "purchase_id": df["event_id_r"].astype("int64")}
        )

    return joined.map_batches(finish, batch_format="pandas")


def q_bigram_freq(sf_dir: str):
    """A4 n-gram extension: corpus bigram counts with MIN_FREQ threshold,
    per-batch dict partials before the shuffle (same plan as word_freq)."""
    ds = _rp(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            toks = _ALNUM.findall((s or "").lower())
            for i in range(len(toks) - 1):
                bg = toks[i] + " " + toks[i + 1]
                counts[bg] = counts.get(bg, 0) + 1
        return pa.table(
            {"bigram": pa.array(list(counts), pa.string()),
             "n": pa.array(list(counts.values()), pa.int64())}
        )

    agg = _gagg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "bigram", Sum("n", alias_name="n"),
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 5)), batch_format="pyarrow"
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


def _nonempty_or_empty_table(ds, schema: "pa.Schema"):
    """``Dataset.to_pandas`` of an all-empty Dataset loses column names (empty
    blocks are skipped by ``iter_batches``), which breaks the harness's schema
    compare whenever a query's result is legitimately empty at some sf. Guard:
    a distributed ``count()`` (an aggregate — nothing row-sized reaches the
    driver) picks between the lazy Dataset and a typed empty Table."""
    return schema.empty_table() if ds.count() == 0 else ds


def q_nations_overlap(sf_dir: str):
    """INTERSECT set op: nation keys present on BOTH fact sides — fully
    distributed (see _set_op; no exact key set ever leaves the cluster)."""
    return _nonempty_or_empty_table(
        _set_op(sf_dir, "both"), pa.schema([("k", pa.int64())]))


def q_customer_only_nations(sf_dir: str):
    """EXCEPT set op on the same distributed presence-flag plan."""
    return _nonempty_or_empty_table(
        _set_op(sf_dir, "left_only"), pa.schema([("k", pa.int64())]))


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


def q_event_gaps(sf_dir: str):
    """Per-group lag(): mean inter-event gap per user — coarse hash-bucket
    groupby (never one Ray group per user), exact per-user sorted diff inside;
    sums in integer microseconds so the aggregate is order-free exact."""
    ds = _rp(sf_dir, "events", ["user_id", "ts"])
    from ..stages.canonicalize import _compact_blocks

    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        # exact integer microseconds (pandas 2.x preserves Arrow's us unit;
        # normalize explicitly rather than assuming ns)
        g["__us"] = g["ts"].astype("datetime64[us]").astype("int64")
        out = (
            g.assign(__gap=g.groupby("user_id", sort=False)["__us"].diff())
            .groupby("user_id", as_index=False, sort=False)
            .agg(n_gaps=("__gap", "count"), sum_gap_us=("__gap", "sum"))
        )
        out["n_gaps"] = out["n_gaps"].astype("int64")
        out["sum_gap_us"] = out["sum_gap_us"].fillna(0).astype("int64")
        return out[["user_id", "n_gaps", "sum_gap_us"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_gaps, batch_format="pandas")
    )


SEQ_CAPACITY = 2048


def q_seq_packing(sf_dir: str):
    """LLM sequence packing: concatenate documents in doc_id order and cut
    fixed-capacity training sequences — every doc gets (seq_id, seq_offset)
    from a GLOBAL exclusive prefix sum of token counts, computed with the
    range-partitioned two-pass scan (functions/rank.keyed_prefix_sum): no
    global sort, one narrow histogram pass + one row shuffle."""
    from ..functions.rank import keyed_prefix_sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = [len(_ALNUM.findall((s or "").lower())) for s in t.column("text").to_pylist()]
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_tokens": pa.array(n, pa.int64())}
        )

    scanned = keyed_prefix_sum(
        ds.map_batches(toks, batch_format="pyarrow"), "doc_id", "n_tokens",
        out="cum0",
    )

    def finish(t: pa.Table) -> pa.Table:
        cum0 = np.asarray(t.column("cum0"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "seq_id": pa.array(cum0 // SEQ_CAPACITY, pa.int64()),
                "seq_offset": pa.array(cum0 % SEQ_CAPACITY, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def q_term_doc_freq(sf_dir: str):
    """Document frequency (the tf-idf denominator): since a document is one
    row, per-doc token DEDUP is row-local (free) — partial df counts per
    batch, one narrow groupby(token) shuffle, MIN_DF filter keeps the result
    vocabulary-sized."""
    ds = _rp(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            for tok in set(_ALNUM.findall((s or "").lower())):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {"token": pa.array(list(counts), pa.string()),
             "df": pa.array(list(counts.values()), pa.int64())}
        )

    agg = _gagg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "token", Sum("df", alias_name="df"),
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("df"), 5)), batch_format="pyarrow"
    )


_MIX_RATES = {"en": "2", "de": "8"}  # md5-hex thresholds: en ≈ 1/8, de ≈ 1/2
_MIX_DEFAULT = "4"                   # other langs ≈ 1/4


def q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling — the data-MIXING primitive: each
    language keeps a different hash-Bernoulli fraction (downsample the
    dominant source, upweight the rest), reproducible at any parallelism
    because membership is a pure function of the row key, never RNG order."""
    import hashlib as _hl

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def pick(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        langs = t.column("lang").to_pylist()
        mask = [
            _hl.md5(str(i).encode()).hexdigest() < _MIX_RATES.get(l, _MIX_DEFAULT)
            for i, l in zip(ids, langs)
        ]
        out = t.filter(pa.array(mask, pa.bool_()))
        return pa.table(
            {"doc_id": pc.cast(out.column("doc_id"), pa.int64()),
             "lang": out.column("lang")}
        )

    return ds.map_batches(pick, batch_format="pyarrow")


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


def q_curation_pipeline(sf_dir: str):
    """The curation FLAGSHIP end-to-end (pipelines/curation.run_curation):
    quality gate → exact dedup (keep-min-id) → near-dup keep-LONGEST →
    exact-substring span removal, over the documents table. Every stage's
    plan is the one its standalone query uses; the SQL oracle composes the
    four stage oracles (quality rule, md5 window dedup, full banded-LSH +
    recursive-CC + ROW_NUMBER argmax, windowed-MAX span coverage) into one
    statement, so the WHOLE pipeline decision + rewrite is hash-checked.
    Output: (doc_id, n_tokens, n_removed, kept_text) for surviving docs."""
    from .curation import run_curation

    res = run_curation(
        _rp(sf_dir, "documents", ["doc_id", "text"]),
        min_tokens=5, max_punct_ratio=0.5, min_stopword_ratio=0.0,
        lsh_threshold=0.8, shingle="word3", span_n=_DUPNG_N,
    )
    return res["curated"]


def q_cumulative_distinct_users(sf_dir: str):
    """Running COUNT(DISTINCT) over time — the incremental-metrics shape
    ('total unique users to date' per day) that a naive per-day distinct
    recomputes quadratically. Exact linear plan: reduce each user to their
    FIRST day (per-batch min partials → one bucketed Min aggregate — the
    only fact-scale work), count firsts per day (narrow combiner), then a
    prefix sum over the TIMELINE-sized day table (bounded by calendar days,
    not data — safe to finish on the driver at any corpus size). Days are
    exact integer epoch days so the SQL hash comparison is exact."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        days = t.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"user_id": pc.cast(t.column("user_id"), pa.int64()).to_numpy(),
                           "day": days})
        g = df.groupby("user_id", as_index=False)["day"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    first_day = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], Min("day", alias_name="day"),
    )

    def day_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "day" not in t.column_names:
            return pa.table({"day": pa.array([], pa.int64()),
                             "n_new": pa.array([], pa.int64())})
        df = pd.DataFrame({"day": pc.cast(t.column("day"), pa.int64()).to_numpy()})
        g = df.groupby("day", as_index=False).size().rename(columns={"size": "n_new"})
        return pa.Table.from_pandas(g, preserve_index=False)

    per_day = grouped_aggregate(
        first_day.map_batches(day_counts, batch_format="pyarrow"),
        ["day"], Sum("n_new", alias_name="n_new"),
    )
    rows = sorted(per_day.take_all(), key=lambda r: r["day"])  # timeline-sized
    days = np.array([r["day"] for r in rows], dtype=np.int64)
    n_new = np.array([r["n_new"] for r in rows], dtype=np.int64)
    return pa.table({"day": pa.array(days, pa.int64()),
                     "n_new": pa.array(n_new, pa.int64()),
                     "cum_users": pa.array(np.cumsum(n_new), pa.int64())})


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


def q_fuzzy_part_names(sf_dir: str):
    """Fuzzy self-match: distinct part-name pairs within edit distance 1 via
    SymSpell deletion-neighborhood blocking (functions/dedup.fuzzy_name_pairs)."""
    from ..functions.dedup import fuzzy_name_pairs

    return fuzzy_name_pairs(_rp(sf_dir, "part", ["p_name"]), "p_name")


_TFIDF_MIN_DF = 5
_TFIDF_TOP = 3


def _min_count_filter(count_col: str, min_n: int, key_col: str):
    """Arrow batch filter ``count_col >= min_n``, robust to the zero-column
    empty blocks groupby().aggregate() can emit."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or count_col not in t.column_names:
            return pa.table({key_col: pa.array([], pa.string()),
                             count_col: pa.array([], pa.int64())})
        return t.filter(pc.greater_equal(t.column(count_col), min_n))

    return fn


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-``_TFIDF_TOP`` salient terms by tf·idf with the
    reciprocal-df idf (score = tf/df): the ranking every keyword-extraction /
    training-data-curation pass needs. Scale shape: the df table is
    VOCABULARY-sized after the MIN_DF filter, so it is aggregated once
    (partial df per batch → one narrow groupby) and broadcast via ray.put;
    per-doc tf and the top-k are then row-local — no second shuffle.

    Float discipline: the score is the single IEEE division tf/df computed
    identically here and in the SQL oracle (both exactly-rounded doubles), so
    ordering ties agree bit-for-bit; the OUTPUT carries only integers."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            for tok in set(_ALNUM.findall((s or "").lower())):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {"token": pa.array(list(counts), pa.string()),
             "df": pa.array(list(counts.values()), pa.int64())}
        )

    # MIN_DF filter runs DISTRIBUTED, right after the aggregate — only the
    # filtered (vocabulary-sized, not raw-token-sized) table reaches the
    # driver; collecting the unfiltered vocab first would materialize every
    # hapax of a 100-TB corpus driver-side
    df_kept = _gagg(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        "token", Sum("df", alias_name="df"),
    ).map_batches(_min_count_filter("df", _TFIDF_MIN_DF, "token"),
                  batch_format="pyarrow")
    df_map = {
        r["token"]: int(r["df"])
        for b in df_kept.iter_batches(batch_size=65536, batch_format="pyarrow")
        for r in b.to_pylist()
    }
    dref = ray.put(df_map)

    def score(t: pa.Table) -> pa.Table:
        dm = ray.get(dref)
        o_id, o_term, o_tf, o_df, o_rank = [], [], [], [], []
        for did, s in zip(
            pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
            t.column("text").to_pylist(),
        ):
            tf: dict[str, int] = {}
            for tok in _ALNUM.findall((s or "").lower()):
                if tok in dm:
                    tf[tok] = tf.get(tok, 0) + 1
            best = sorted(tf.items(), key=lambda kv: (-(kv[1] / dm[kv[0]]), kv[0]))
            for rank, (term, n) in enumerate(best[:_TFIDF_TOP], 1):
                o_id.append(did)
                o_term.append(term)
                o_tf.append(n)
                o_df.append(dm[term])
                o_rank.append(rank)
        return pa.table(
            {"doc_id": pa.array(o_id, pa.int64()),
             "term": pa.array(o_term, pa.string()),
             "tf": pa.array(o_tf, pa.int64()),
             "df": pa.array(o_df, pa.int64()),
             "rank": pa.array(o_rank, pa.int64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q_normalized_dedup(sf_dir: str):
    """C4-style exact dedup AFTER text normalization (lowercase + whitespace
    collapse + trim): the first dedup pass of every web-text pipeline. The
    normalization is row-local; downstream is the same 32-char-hash groupby
    as exact_dedup — full text never crosses the shuffle."""
    from ..functions.dedup import exact_dedup_groups

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        texts = [
            re.sub(r"\s+", " ", (s or "").lower()).strip()
            for s in t.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )

    return exact_dedup_groups(ds.map_batches(norm, batch_format="pyarrow"),
                              "text", "doc_id")


_PMI_MIN_N = 5
_PMI_TOP = 50


def q_pmi_bigrams(sf_dir: str):
    """Top-``_PMI_TOP`` collocations: bigrams with count ≥ ``_PMI_MIN_N``
    ranked by PMI. With corpus-size terms constant across candidates, the PMI
    order equals n_xy / (n_x·n_y), computed as the identical double expression
    on both sides; output columns are integers only (counts + rank).

    Scale shape: bigram and unigram counts are partial-aggregated per batch
    before their narrow groupbys; the unigram table (vocabulary-sized) is
    broadcast to score bigram batches map-side; the global top-k is a
    per-batch partial top-k → tiny driver merge, never a full sort."""
    ds = _rp(sf_dir, "documents", ["text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            for tok in _ALNUM.findall((s or "").lower()):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {"token": pa.array(list(counts), pa.string()),
             "n": pa.array(list(counts.values()), pa.int64())}
        )

    # Unigrams with n < _PMI_MIN_N are filtered DISTRIBUTED before the
    # collect: every occurrence of a bigram (x, y) contains one of x and one
    # of y, so n_x ≥ n_xy and n_y ≥ n_xy — a bigram passing n_xy ≥ MIN_N can
    # only reference unigrams that survive the same threshold. The broadcast
    # table is therefore the FILTERED vocabulary, never the raw hapax tail.
    uni_kept = _gagg(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        "token", Sum("n", alias_name="n"),
    ).map_batches(_min_count_filter("n", _PMI_MIN_N, "token"),
                  batch_format="pyarrow")
    uni = {
        r["token"]: int(r["n"])
        for b in uni_kept.iter_batches(batch_size=65536, batch_format="pyarrow")
        for r in b.to_pylist()
    }
    uref = ray.put(uni)

    def bi_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            toks = _ALNUM.findall((s or "").lower())
            for i in range(len(toks) - 1):
                bg = toks[i] + " " + toks[i + 1]
                counts[bg] = counts.get(bg, 0) + 1
        return pa.table(
            {"bigram": pa.array(list(counts), pa.string()),
             "n_xy": pa.array(list(counts.values()), pa.int64())}
        )

    agg = _gagg(
        ds.map_batches(bi_partial, batch_format="pyarrow"),
        "bigram", Sum("n_xy", alias_name="n_xy"),
    )

    def topk_partial(t: pa.Table) -> pa.Table:
        um = ray.get(uref)
        rows = []
        for bg, nxy in zip(t.column("bigram").to_pylist(),
                           t.column("n_xy").to_pylist()):
            if nxy < _PMI_MIN_N:
                continue
            x, y = bg.split(" ", 1)
            nx, ny = um[x], um[y]
            rows.append((float(nxy) / (float(nx) * float(ny)), bg, nxy, nx, ny))
        rows.sort(key=lambda r: (-r[0], r[1]))
        rows = rows[:_PMI_TOP]
        return pa.table(
            {"score": pa.array([r[0] for r in rows], pa.float64()),
             "bigram": pa.array([r[1] for r in rows], pa.string()),
             "n_xy": pa.array([r[2] for r in rows], pa.int64()),
             "n_x": pa.array([r[3] for r in rows], pa.int64()),
             "n_y": pa.array([r[4] for r in rows], pa.int64())}
        )

    cand = agg.map_batches(topk_partial, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["score"], r["bigram"]))
    cand = cand[:_PMI_TOP]
    return pa.table(
        {"bigram": pa.array([r["bigram"] for r in cand], pa.string()),
         "n_xy": pa.array([r["n_xy"] for r in cand], pa.int64()),
         "n_x": pa.array([r["n_x"] for r in cand], pa.int64()),
         "n_y": pa.array([r["n_y"] for r in cand], pa.int64()),
         "rank": pa.array(range(1, len(cand) + 1), pa.int64())}
    )


def q_length_buckets(sf_dir: str):
    """Sequence-length bucketing for training-batch packing: per (lang,
    power-of-two token-count bucket) document counts. Bucket = bit_length−1
    (pure integer on both sides — no log2 float rounding hazard); empty docs
    land in bucket −1. Row-local bucketing + partial counts → narrow groupby."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        buckets = [
            len(_ALNUM.findall((s or "").lower())).bit_length() - 1
            for s in t.column("text").to_pylist()
        ]
        df = pd.DataFrame({"lang": t.column("lang").to_pylist(),
                           "bucket": np.asarray(buckets, dtype=np.int64)})
        g = df.groupby(["lang", "bucket"], as_index=False).size().rename(
            columns={"size": "n_docs"}
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "bucket"],
        Sum("n_docs", alias_name="n_docs"),
    )


def q_hll_users(sf_dir: str):
    """HyperLogLog register table for COUNT(DISTINCT user_id) — the mergeable
    sketch that replaces an exact distinct's full key shuffle with 256 rows
    per stage at any cardinality (functions/sketches.py). The md5-derived
    registers are deterministic, so the TABLE is hash-checked against SQL;
    only the final fold (hll_estimate) is approximate."""
    from ..functions.sketches import hll_registers

    return hll_registers(_rp(sf_dir, "events", ["user_id"]), "user_id")


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


def q_cms_users(sf_dir: str):
    """Count-Min sketch counters for per-user event frequencies
    (functions/sketches.py): depth×width exact-int64 counters merging by
    SUM — heavy-hitter estimation whose shuffle is 4×256 cells at any key
    cardinality. Deterministic md5 column hashing makes the counter table
    itself hash-checkable against SQL."""
    from ..functions.sketches import cms_counters

    return cms_counters(_rp(sf_dir, "events", ["user_id"]), "user_id")


_DECON_N = 8          # n-gram order for decontamination
_DECON_BENCH_IDS = 20  # docs with doc_id < this form the "benchmark" set


def q_decontamination(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing ≥ 1 word-8-gram
    with a (deterministic, corpus-derived) eval set — the pass every
    training-data pipeline runs before a model ever sees the data. Output:
    (doc_id, n_overlap) with n_overlap = distinct shared 8-grams, only for
    contaminated docs.

    Scale shape: the eval side is tiny by definition — its distinct n-gram
    set is aggregated once and broadcast via ray.put; the corpus pass is
    row-local set intersection, no shuffle at all. (For a benchmark too big
    to broadcast, swap in the Bloom prefilter from functions/bloom.py.)"""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def ngrams(s: str) -> set:
        toks = _ALNUM.findall((s or "").lower())
        return {" ".join(toks[i:i + _DECON_N])
                for i in range(len(toks) - _DECON_N + 1)}

    bench_tbls = (
        ds.map_batches(
            lambda t: t.filter(
                pc.less(pc.cast(t.column("doc_id"), pa.int64()), _DECON_BENCH_IDS)
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table({"ng": pa.array(
                sorted(set().union(*[ngrams(s) for s in t.column("text").to_pylist()])
                       if t.num_rows else set()),
                pa.string())}),
            batch_format="pyarrow",
        )
        .take_all()
    )
    bench = {r["ng"] for r in bench_tbls}
    bref = ray.put(bench)

    def flag(t: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        o_id, o_n = [], []
        for did, s in zip(ids, t.column("text").to_pylist()):
            if did < _DECON_BENCH_IDS:
                continue
            n = len(ngrams(s) & bs)
            if n:
                o_id.append(did)
                o_n.append(n)
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "n_overlap": pa.array(o_n, pa.int64())})

    return ds.map_batches(flag, batch_format="pyarrow")


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition features, exact integers per doc: token count,
    distinct-token count, and the count of the most frequent bigram — the
    inputs to 'fraction of tokens in top bigram' repetition filters. Pure
    row-local map, no shuffle."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        o_id, o_nt, o_nd, o_tb = [], [], [], []
        for did, s in zip(
            pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
            t.column("text").to_pylist(),
        ):
            toks = _ALNUM.findall((s or "").lower())
            bi: dict[str, int] = {}
            for i in range(len(toks) - 1):
                bg = toks[i] + " " + toks[i + 1]
                bi[bg] = bi.get(bg, 0) + 1
            o_id.append(did)
            o_nt.append(len(toks))
            o_nd.append(len(set(toks)))
            o_tb.append(max(bi.values()) if bi else 0)
        return pa.table(
            {"doc_id": pa.array(o_id, pa.int64()),
             "n_tokens": pa.array(o_nt, pa.int64()),
             "n_distinct": pa.array(o_nd, pa.int64()),
             "top_bigram_n": pa.array(o_tb, pa.int64())}
        )

    return ds.map_batches(stats, batch_format="pyarrow")


_DUPNG_N = 8  # n-gram order for the duplicated-span fraction


def q_dup_ngram_fraction(sf_dir: str):
    """RefinedWeb/Gopher-style duplicated-n-gram fraction: for every doc, how
    many of its DISTINCT word-8-grams also occur in ≥ 1 OTHER document —
    the standard 'fraction of duplicated n-grams' quality filter applied
    before LLM training.

    Scale shape (one text pass, two narrow shuffles, no joins): each batch
    emits (h, doc) rows — h the md5-top-8-byte hash of the 8-gram, 16 B/row,
    text never shuffled; rows hash-partition on h (__part = h mod P) so one
    ``map_groups`` sees ALL holders of each h and emits per-doc partials
    (n_ngrams-in-part, n-shared-in-part); a final groupby(doc) Sum folds the
    partials. Driver never sees anything gram-sized. Output: (doc_id,
    n_ngrams, n_shared, shared_ppm) for docs with ≥ 1 8-gram, where
    shared_ppm = n_shared·10⁶ // n_ngrams exactly (SQL-hashable integers).
    """
    from ..functions.textfns import md5_hash64
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    P = _compact_blocks()

    def grams(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        hcache: dict[str, int] = {}
        o_h, o_d = [], []
        for did, s in zip(ids, t.column("text").to_pylist()):
            toks = _ALNUM.findall((s or "").lower())
            ngs = {" ".join(toks[i:i + _DUPNG_N])
                   for i in range(len(toks) - _DUPNG_N + 1)}
            o_h.extend(
                hcache[g] if g in hcache else hcache.setdefault(g, md5_hash64(g))
                for g in ngs
            )
            o_d.extend([did] * len(ngs))
        h = np.asarray(o_h, dtype=np.uint64).astype(np.int64)
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "doc": pa.array(o_d, pa.int64()),
             "__part": pa.array(h % P, pa.int64())}
        )

    def part_stats(group: pd.DataFrame) -> pd.DataFrame:
        holders = group.groupby("h")["doc"].transform("size")
        tot = group.groupby("doc", as_index=False).size().rename(
            columns={"size": "n_ngrams"})
        sh = group[holders >= 2].groupby("doc", as_index=False).size().rename(
            columns={"size": "n_shared"})
        out = tot.merge(sh, on="doc", how="left")
        out["n_shared"] = out["n_shared"].fillna(0).astype("int64")
        return out

    agg = _gagg(
        ds.map_batches(grams, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_stats, batch_format="pandas"),
        "doc",
        Sum("n_ngrams", alias_name="n_ngrams"),
        Sum("n_shared", alias_name="n_shared"),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("doc_id", "n_ngrams", "n_shared", "shared_ppm")})
        ng = pc.cast(t.column("n_ngrams"), pa.int64()).to_numpy()
        ns = pc.cast(t.column("n_shared"), pa.int64()).to_numpy()
        return pa.table(
            {"doc_id": pc.cast(t.column("doc"), pa.int64()),
             "n_ngrams": pa.array(ng, pa.int64()),
             "n_shared": pa.array(ns, pa.int64()),
             "shared_ppm": pa.array(ns * 1_000_000 // ng, pa.int64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_dedup_ngram_spans(sf_dir: str):
    """RefinedWeb-style exact-substring SPAN REMOVAL (the rewrite, not just
    the score) — plan in functions/dedup.span_dedup_rewrite: shared grams
    found h-partitioned (16 B rows, text never shuffled there), then a
    side-tagged union on doc co-locates text with its shared-gram set for a
    row-local rewrite — no joins. Output: (doc_id, n_tokens, n_removed,
    kept_text) for docs with ≥ 1 token. The SQL oracle replicates the plan
    (same md5-top-8-byte gram identity — any truncation collision collides
    identically — windowed-MAX coverage, string_agg kept text)."""
    from ..functions.dedup import span_dedup_rewrite

    return span_dedup_rewrite(
        _rp(sf_dir, "documents", ["doc_id", "text"]), "doc_id", "text",
        n=_DUPNG_N,
    )


def q_neardup_keep(sf_dir: str):
    """End-to-end near-dup DEDUP DECISION — the operator a curation pipeline
    actually ships: MinHash-LSH candidate pairs (same plan/params as
    ``minhash_neardup``) resolved to per-doc keep/drop via the distributed
    connected components of the canonicalization stage; every doc maps to its
    component representative (min doc_id), unpaired docs map to themselves.
    Output: (doc_id, keep_id) for EVERY document — keep row ⟺ doc_id ==
    keep_id. The SQL oracle composes the full banded-LSH plan replication
    with a recursive min-label reachability fixpoint (the graph_components
    oracle shape), so the whole dedup decision is hash-checked."""
    from ..functions.dedup import lsh_near_dup_pairs, near_dup_keep_ids

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    pairs = lsh_near_dup_pairs(ds, "text", "doc_id",
                               shingle="word3", threshold=0.8)
    return near_dup_keep_ids(pairs, ds.select_columns(["doc_id"]), "doc_id")


def q_neardup_keep_best(sf_dir: str):
    """Near-dup keep decision with a QUALITY-WEIGHTED representative — what
    production curation actually keeps: within each near-dup component the
    doc with the MOST tokens survives (tie → min doc_id), not the min-id
    doc (CCNet/RefinedWeb keep-the-longest-version convention). Plan in
    functions/dedup.near_dup_keep_best_ids (packed-int64 argmax per
    component + hash-join winner back). SQL oracle = the full LSH +
    recursive-CC replication + a ROW_NUMBER() argmax."""
    from ..functions.dedup import lsh_near_dup_pairs, near_dup_keep_best_ids

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    pairs = lsh_near_dup_pairs(ds, "text", "doc_id",
                               shingle="word3", threshold=0.8)
    return near_dup_keep_best_ids(pairs, ds, "doc_id", "text")


# --------------------------------------------------------------------------
# Graph-analytics family (functions/graph.py) over the part co-purchase
# graph: edges (u, v, n) = parts appearing together in n orders. The KG-side
# operators a knowledge-graph pipeline runs after materializing its edges.
# --------------------------------------------------------------------------

def _graph_edges(sf_dir: str, min_n: int = 1):
    from ..functions.graph import co_order_edges

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return co_order_edges(li, min_n=min_n)


def _co_edges_sql(min_n: int) -> str:
    """SQL for the co-purchase edge table (u < v, n = co-occurring orders) —
    DISTINCT per order first so a part repeated within one order counts once,
    matching co_order_edges' drop_duplicates."""
    return f"""
        SELECT u, v, COUNT(*) AS n FROM (
            SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        GROUP BY u, v HAVING COUNT(*) >= {int(min_n)}
    """


def _pagerank_sql(n_iters: int = 3) -> str:
    """Unrolled integer power iteration replicating functions/graph.pagerank
    op for op: pr0 = SCALE//N; pr_{{k+1}} = (15*(SCALE//N))//100 +
    (85*Σ pr_k(u)//outdeg(u))//100. SUM promotes to HUGEINT in DuckDB, so
    each iteration CASTs back to BIGINT (values stay ≤ SCALE ≪ 2^63)."""
    scale = 10**12
    parts = [f"""
        WITH e AS ({_co_edges_sql(2)}),
        s AS (SELECT u AS src, v AS dst FROM e
              UNION ALL SELECT v AS src, u AS dst FROM e),
        d AS (SELECT src AS node, COUNT(*) AS outdeg FROM s GROUP BY src),
        nn AS (SELECT COUNT(*) AS n FROM d),
        p0 AS (SELECT d.node, d.outdeg,
                      CAST({scale} // nn.n AS BIGINT) AS pr
               FROM d CROSS JOIN nn)"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
        p{i} AS (SELECT d.node, d.outdeg,
                        CAST((15 * ({scale} // nn.n)) // 100
                             + (85 * c{i}.contrib) // 100 AS BIGINT) AS pr
                 FROM d CROSS JOIN nn
                 JOIN (SELECT s2.dst AS node, SUM(p.pr // p.outdeg) AS contrib
                       FROM p{i - 1} p JOIN s s2 ON s2.src = p.node
                       GROUP BY s2.dst) c{i} ON c{i}.node = d.node)""")
    parts.append(f"\n        SELECT node, pr FROM p{n_iters}")
    return "".join(parts)


def _ppr_sql(n_iters: int = 3) -> str:
    """Unrolled integer PERSONALIZED power iteration (seed = min node):
    pr0(v) = SCALE·[v=s]; pr_{{k+1}}(v) = (15·SCALE)//100·[v=s] +
    (85·Σ pr_k(u)//outdeg(u))//100 — functions/graph.pagerank with
    personalize_seed, op for op."""
    scale = 10**12
    parts = [f"""
        WITH e AS ({_co_edges_sql(2)}),
        s AS (SELECT u AS src, v AS dst FROM e
              UNION ALL SELECT v AS src, u AS dst FROM e),
        d AS (SELECT src AS node, COUNT(*) AS outdeg FROM s GROUP BY src),
        sd AS (SELECT MIN(node) AS s FROM d),
        p0 AS (SELECT d.node, d.outdeg,
                      CAST(CASE WHEN d.node = sd.s THEN {scale}
                           ELSE 0 END AS BIGINT) AS pr
               FROM d CROSS JOIN sd)"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
        p{i} AS (SELECT d.node, d.outdeg,
                        CAST(CASE WHEN d.node = sd.s
                                  THEN (15 * {scale}) // 100 ELSE 0 END
                             + (85 * c{i}.contrib) // 100 AS BIGINT) AS pr
                 FROM d CROSS JOIN sd
                 JOIN (SELECT s2.dst AS node,
                              SUM(p.pr // p.outdeg) AS contrib
                       FROM p{i - 1} p JOIN s s2 ON s2.src = p.node
                       GROUP BY s2.dst) c{i} ON c{i}.node = d.node)""")
    parts.append(f"\n        SELECT node, pr FROM p{n_iters}")
    return "".join(parts)


def q_graph_ppr(sf_dir: str):
    """PERSONALIZED PageRank from the min node — the KG "entities related
    to X" relevance walk (recommendation / context expansion around one
    entity), vs q_graph_pagerank's global importance. Same integer power
    iteration, same one-join-one-groupby round traffic
    (functions/graph.pagerank with personalize_seed): all initial and
    teleport mass concentrates at the seed, so scores decay with walk
    distance from it. Bit-exact in int64 ⇒ unrolled-CTE SQL replication.
    Output: (node, pr) in parts-per-10¹²."""
    from ..functions.graph import degree_table, pagerank

    edges = _graph_edges(sf_dir, 2).materialize()
    deg = degree_table(edges)
    s = deg.min("node") if deg.count() else None
    if s is None:
        return pa.table({"node": pa.array([], pa.int64()),
                         "pr": pa.array([], pa.int64())})
    return pagerank(edges, n_iters=3, personalize_seed=int(s))


def q_graph_degree(sf_dir: str):
    """Degree histogram (degree, n_nodes) of the co-purchase graph — the
    first skew diagnostic run on any KG edge table. Degrees are
    partial-aggregated per batch, then the histogram is a second narrow
    groupby over the (already node-sized) degree table."""
    from ..functions.graph import degree_table
    from ..stages.canonicalize import grouped_aggregate

    deg = degree_table(_graph_edges(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("degree"), pa.int64()).to_numpy()
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"degree": pa.array(uniq, pa.int64()),
             "n_nodes": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    return grouped_aggregate(
        deg.map_batches(partial, batch_format="pyarrow"),
        ["degree"],
        Sum("n_nodes", alias_name="n_nodes"),
    )


def q_graph_triangles(sf_dir: str):
    """Global node/edge/wedge/triangle counts — one exact-integer row.
    Degree-ordered orientation bounds wedge work at O(E^1.5) (see
    functions/graph.py); edge-set membership tests broadcast the sorted
    uint64 key array up to a 2M-edge threshold and switch to a
    hash-partitioned match above it; the degree attach has the same
    broadcast-vs-hash-join switch on node count."""
    from ..functions.graph import triangle_count

    return triangle_count(_graph_edges(sf_dir).materialize())


def q_graph_components(sf_dir: str):
    """Connected components of the min_n=3 co-purchase graph → (node, comp)
    with comp = min node id in the component — the same distributed
    min-label-propagation/pointer-doubling machinery that canonicalizes
    entities (stages/canonicalize.py), here against a recursive-CTE SQL
    oracle. min_n=3 keeps the graph sparse (threshold co-occurrence noise),
    exactly how a production KG prunes its mention-co-occurrence edges."""
    from ..functions.graph import degree_table
    from ..stages.canonicalize import connected_components

    edges = _graph_edges(sf_dir, min_n=3).materialize()
    pairs = edges.map_batches(
        lambda t: pa.table(
            {"a": pc.cast(t.column("u"), pa.int64()),
             "b": pc.cast(t.column("v"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    nodes = degree_table(edges).map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("node"), pa.int64())}),
        batch_format="pyarrow",
    )
    return connected_components(pairs, nodes)


def q_graph_pagerank(sf_dir: str):
    """3-iteration PageRank over the min_n=2 co-purchase graph → (node, pr)
    with pr in exact parts-per-1e12 integers (functions/graph.py): floor
    division makes every op order-independent, so the distributed result is
    bit-identical to the unrolled-CTE SQL oracle — a float power iteration
    could never be hash-compared."""
    from ..functions.graph import pagerank

    return pagerank(_graph_edges(sf_dir, min_n=2).materialize(), n_iters=3)


def q_graph_khop(sf_dir: str):
    """Nodes within ≤ 3 hops of the min node of the min_n=2 co-purchase
    graph, with exact min-hop distances — bounded-round distributed BFS
    (k hash_join + Min rounds, functions/graph.khop_distances), the KG
    neighborhood query. Replicated by 3 unrolled SQL CTEs."""
    from ..functions.graph import khop_distances

    return khop_distances(_graph_edges(sf_dir, min_n=2).materialize(), k=3)


def q_domain_dup_rate(sf_dir: str):
    """Per-domain (source) exact-duplicate rate — the web-crawl health
    metric: for every source, how many of its docs are byte-identical to an
    earlier doc anywhere in the corpus (keeper = global min doc_id per md5).
    Plan: one narrow (md5, source, doc_id) shuffle co-located by COARSE
    hash-buckets (every doc with the same md5 lands in one bucket, groups
    stay cluster-sized); keeper resolution and per-source partial counts
    happen inside the bucket, then ONE tiny per-source groupby. No join, no
    text after the first map."""
    import hashlib

    P = 64
    ds = _rp(sf_dir, "documents", ["doc_id", "text", "source"])

    def hashed(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        hs = [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in texts]
        hb = np.array([int(h[:8], 16) for h in hs], np.int64)
        return pa.table(
            {"h": pa.array(hs, pa.string()),
             "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "source": t.column("source"),
             "__part": pa.array(hb % P, pa.int64())}
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        keeper = g.groupby("h")["doc_id"].transform("min")
        g = g.assign(is_dup=(g["doc_id"] != keeper).astype("int64"))
        out = g.groupby("source", as_index=False).agg(
            n_docs=("doc_id", "size"), n_dups=("is_dup", "sum"))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return (
        ds.map_batches(hashed, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_dups", alias_name="n_dups"))
    )


def q_oov_rate(sf_dir: str):
    """Per-doc out-of-vocabulary rate (integer ppm) against the corpus's own
    φ-frequent vocabulary (cnt·41 > N, the scale-free heavy-hitter
    threshold) — the CCNet-style lexical quality score. Pass 1 aggregates
    word counts and the token total (tagged marker row on the same narrow
    groupby), filters the vocabulary DISTRIBUTED (before any driver
    collect), broadcasts the bounded result; pass 2 scores each doc
    row-locally."""
    import ray as _ray

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    _TOTAL = "\x00__total__"

    def wcounts(t: pa.Table) -> pa.Table:
        local: dict[str, int] = {}
        n = 0
        for s in t.column("text").to_pylist():
            ws = _ALNUM.findall((s or "").lower())
            n += len(ws)
            for w in ws:
                local[w] = local.get(w, 0) + 1
        keys = sorted(local)
        return pa.table(
            {"w": pa.array(keys + [_TOTAL], pa.string()),
             "cnt": pa.array([local[k] for k in keys] + [n], pa.int64())}
        )

    counted = _gagg(
        ds.map_batches(wcounts, batch_format="pyarrow"),
        "w", Sum("cnt", alias_name="cnt"),
    ).materialize()
    total = 0
    for b in counted.iter_batches(batch_size=65536, batch_format="pyarrow"):
        m = pc.equal(b.column("w"), _TOTAL)
        if pc.any(m).as_py():
            total = int(b.filter(m).column("cnt")[0].as_py())
            break

    def vocab_filter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(t.column("w"), _TOTAL),
            pc.greater(pc.multiply(pc.cast(t.column("cnt"), pa.int64()),
                                   pa.scalar(41, pa.int64())),
                       pa.scalar(total, pa.int64())),
        )
        return pa.table({"w": t.filter(keep).column("w")})

    vocab: set[str] = set()
    for b in counted.map_batches(vocab_filter, batch_format="pyarrow") \
                    .iter_batches(batch_size=65536, batch_format="pyarrow"):
        vocab.update(b.column("w").to_pylist())
    vref = _ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        o_id, o_n, o_ppm = [], [], []
        for i, s in zip(ids, t.column("text").to_pylist()):
            ws = _ALNUM.findall((s or "").lower())
            n = len(ws)
            oov = sum(1 for w in ws if w not in vs)
            o_id.append(i)
            o_n.append(n)
            o_ppm.append((oov * 1_000_000) // n if n else 0)
        return pa.table(
            {"doc_id": pa.array(o_id, pa.int64()),
             "n_tokens": pa.array(o_n, pa.int64()),
             "oov_ppm": pa.array(o_ppm, pa.int64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q_link_predict(sf_dir: str):
    """Link prediction on the co-purchase graph: non-adjacent node pairs
    sharing ≥ 2 common neighbors (functions/graph.common_neighbor_pairs) —
    bucketed wedge enumeration + side-tagged adjacency exclusion, the KG
    missing-edge / entity-merge candidate generator."""
    from ..functions.graph import common_neighbor_pairs

    return common_neighbor_pairs(
        _graph_edges(sf_dir, min_n=2).materialize(), min_common=2
    )


def q_kcore(sf_dir: str):
    """3 peel rounds toward the 2-core of the co-purchase graph →
    (node, degree) of the surviving subgraph (functions/graph.kcore_peel).
    Replicated by 3 unrolled SQL CTE rounds."""
    from ..functions.graph import kcore_peel

    return kcore_peel(_graph_edges(sf_dir, min_n=2).materialize(), k=2, rounds=3)


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


def q_snapshot_delta(sf_dir: str):
    """Incremental snapshot diff — the resumable-pipeline primitive that
    classifies every key as added / removed / changed between two table
    versions (derived deterministically from ``orders``: 'old' drops keys
    ≡3 mod 10, 'new' drops keys ≡7 and bumps the price of keys ≡5). Plan:
    ONE read, each row emits its side-tagged (key, side, rowhash) rows, one
    narrow int-only groupby classifies — no join, unchanged keys are
    filtered before any driver materialization. rowhash is the exact
    integer cents*4+status_code, so SQL computes it bit-identically."""
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def sides(t: pa.Table) -> pa.Table:
        k = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        st = np.asarray(t.column("o_orderstatus").to_pylist())
        sc = np.where(st == "F", 0, np.where(st == "O", 1, 2)).astype(np.int64)
        h = cents * 4 + sc
        h_new = (cents + np.where(k % 10 == 5, 100, 0)) * 4 + sc
        old_m = k % 10 != 3
        new_m = k % 10 != 7
        return pa.table(
            {"o_orderkey": pa.array(
                np.concatenate([k[old_m], k[new_m]]), pa.int64()),
             "side": pa.array(
                np.concatenate([np.full(old_m.sum(), 1, np.int64),
                                np.full(new_m.sum(), 2, np.int64)]), pa.int64()),
             "h": pa.array(np.concatenate([h[old_m], h_new[new_m]]), pa.int64())}
        )

    agg = _gagg(
        ds.map_batches(sides, batch_format="pyarrow"),
        "o_orderkey",
        Count(alias_name="n"), Sum("side", alias_name="s"),
        Min("h", alias_name="hmin"), Max("h", alias_name="hmax"),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.int64()).to_numpy()
        s = pc.cast(t.column("s"), pa.int64()).to_numpy()
        hmin = pc.cast(t.column("hmin"), pa.int64()).to_numpy()
        hmax = pc.cast(t.column("hmax"), pa.int64()).to_numpy()
        status = np.where(
            n == 1,
            np.where(s == 2, "added", "removed"),
            np.where(hmin != hmax, "changed", ""),
        )
        keep = status != ""
        return pa.table(
            {"o_orderkey": pa.array(
                pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()[keep],
                pa.int64()),
             "status": pa.array(status[keep], pa.string())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir: str):
    """PIVOT: one row per user, one count column per event type — conditional
    partial sums map-side, single groupby(user_id) of already-narrow rows."""
    ds = _rp(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": t.column("user_id").to_pylist(),
             "event_type": t.column("event_type").to_pylist()}
        )
        for et in _EVENT_TYPES:
            df[f"n_{et}"] = (df["event_type"] == et).astype("int64")
        g = df.drop(columns=["event_type"]).groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return _gagg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        *[Sum(f"n_{et}", alias_name=f"n_{et}") for et in _EVENT_TYPES],
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


def q_decayed_clicks(sf_dir: str):
    """Freshness-decayed engagement score (ranking/curation primitive):
    per-user Σ value_cents >> age_days over click events, age anchored at the
    corpus max timestamp — exponential half-life decay in EXACT fixed-point
    (right shift == floor division by 2^age for the non-negative cents, so
    SQL replicates it bit for bit with `cents // (1 << age)`). Single pass,
    mergeable int64 partial sums per user; the anchor is one tiny Max
    aggregate. Shift capped at 62 to stay in int64 range."""
    from ..stages.canonicalize import grouped_aggregate

    _US_DAY = 86_400_000_000
    ds = _rp(sf_dir, "events", ["user_id", "event_type", "ts", "value"])
    anchor = int(
        ds.select_columns(["ts"])
        .map_batches(lambda t: pa.table({"us": pc.cast(t.column("ts"), pa.int64())}),
                     batch_format="pyarrow")
        .aggregate(Max("us"))["max(us)"]
    )  # anchor in integer µs — same unit as the per-row cast below

    def partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("event_type"), "click")
        t = t.filter(m)
        cents = _cents(np.asarray(t.column("value")))
        ts_us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        age = np.minimum((anchor - ts_us) // _US_DAY, 62).astype(np.int64)
        df = pd.DataFrame({"user_id": pc.cast(t.column("user_id"), pa.int64()).to_numpy(),
                           "n_clicks": np.ones(len(age), np.int64),
                           "decayed_cents": cents >> age})
        g = df.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        Sum("n_clicks", alias_name="n_clicks"),
        Sum("decayed_cents", alias_name="decayed_cents"),
    )


def q_word_commonness(sf_dir: str):
    """Unigram-LM document scoring — the cheap deterministic stand-in for a
    model-based quality filter: each doc scores the mean corpus frequency of
    its tokens (rare-token docs score low). The corpus vocabulary is computed
    AND consumed in one plan via a hash-partitioned fact-to-dimension join on
    token — the vocabulary is never broadcast or collected (contrast
    tfidf_top_terms, which may broadcast its MIN_DF-filtered vocab; here
    every token contributes, so the join is the only scale-correct shape).
    Integer-exact: s = Σ_occurrences cnt(token) ≤ corpus_tokens² per doc-term
    — at 10¹⁴ corpus tokens × 10³-token docs ≈ 10¹⁷ < 2⁶³."""
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def doc_tokens(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        o_id, o_tok, o_n = [], [], []
        for did, txt in zip(ids, t.column("text").to_pylist()):
            local: dict[str, int] = {}
            for w in _ALNUM.findall((txt or "").lower()):
                local[w] = local.get(w, 0) + 1
            o_id.extend([int(did)] * len(local))
            o_tok.extend(local.keys())
            o_n.extend(local.values())
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "token": pa.array(o_tok, pa.string()),
                         "n": pa.array(o_n, pa.int64())})

    # (doc, token, n) facts reused by BOTH the vocab aggregate and the join —
    # materialize once so tokenization runs one corpus pass, not two
    toks = ds.map_batches(doc_tokens, batch_format="pyarrow").materialize()
    vocab = _gagg(
        toks.map_batches(
            lambda t: t.select(["token", "n"]), batch_format="pyarrow"),
        "token", Sum("n", alias_name="cnt"),
    )
    joined = hash_join(toks, vocab, on=("token",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64"),
                                 "n_toks": pd.Series([], dtype="int64")})
        df = df.assign(s=df["n"].astype("int64") * df["cnt"].astype("int64"),
                       n_toks=df["n"].astype("int64"))
        return df.groupby("doc_id", as_index=False)[["s", "n_toks"]].sum()

    agg = _gagg(
        joined.map_batches(partial, batch_format="pandas"),
        "doc_id", Sum("s", alias_name="s"), Sum("n_toks", alias_name="n_toks"),
    )

    def fin(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("s"), pa.int64()).to_numpy()
        n = pc.cast(t.column("n_toks"), pa.int64()).to_numpy()
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                         "s": pa.array(s, pa.int64()),
                         "n_toks": pa.array(n, pa.int64()),
                         "commonness": pa.array(s // n, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


_WS_K = 20


def q_weighted_sample(sf_dir: str, *, k: int = _WS_K):
    """Deterministic WEIGHTED global top-k — the data-mixing primitive for
    unequal per-doc weights (integer Efraimidis–Spirakis analog): priority =
    md5_62(doc_id) // w with w = char length + 1, keep the k smallest, so
    selection probability grows with document weight yet the sample is
    bit-reproducible at any parallelism (no RNG state). Per-batch partial
    top-k ships ≤ k rows per block; the final merge sees ≤ k·n_blocks rows
    however large the corpus is."""
    from ..functions.textfns import md5_hash64

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        w = np.array([len(s or "") + 1 for s in t.column("text").to_pylist()],
                     dtype=np.int64)
        h = np.fromiter((md5_hash64(str(i)) >> 2 for i in ids),
                        dtype=np.int64, count=len(ids))  # 62-bit → int64 ≥ 0
        pr = h // w
        df = pd.DataFrame({"doc_id": ids, "w": w, "priority": pr, "g": 0})
        df = df.sort_values(["priority", "doc_id"]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["priority", "doc_id"]).head(k)
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["doc_id", "w", "priority", "rk"]], preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


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


def q_event_type_transitions(sf_dir: str):
    """Markov transition counts over per-user event sequences: consecutive
    (prev_type → next_type) pairs under the (ts, event_id) total order,
    counted globally. Coarse hash buckets (user % P) keep groups
    partition-sized regardless of per-user skew; each bucket emits its pair
    counts PRE-AGGREGATED (≤ |types|² rows per bucket), so the final exchange
    is type-vocabulary-sized however large the event log is — the sequence
    n-gram primitive behind behavior models and session LMs."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id", sort=False)["event_type"].shift()
        df = pd.DataFrame({"prev_type": prev, "next_type": g["event_type"]}).dropna()
        if df.empty:
            return pd.DataFrame({"prev_type": pd.Series([], dtype="string"),
                                 "next_type": pd.Series([], dtype="string"),
                                 "n": pd.Series([], dtype="int64")})
        out = (df.groupby(["prev_type", "next_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    pairs = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_pairs, batch_format="pandas")
    )
    return grouped_aggregate(pairs, ["prev_type", "next_type"],
                             Sum("n", alias_name="n"))


_TOP_TERMS_K = 5


def q_top_terms_per_lang(sf_dir: str, *, k: int = _TOP_TERMS_K):
    """Per-group top-K over an EXPLODED text aggregate: the k most frequent
    tokens per language (ties → token ASC, a total order). Two-level plan:
    per-batch (lang, token) count partials → bucketed grouped_aggregate (the
    high-cardinality pair key never meets Ray's per-group reduce) → per-batch
    LOSSLESS top-K combiner (rows are final counts after the aggregate, so
    any global top-K row is a batch top-K row) → per-lang exact re-rank on
    ≤ k·blocks rows. The corpus-sized exchange is the count aggregate only."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for lg, s in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
            for w in _ALNUM.findall((s or "").lower()):
                key = (lg, w)
                counts[key] = counts.get(key, 0) + 1
        if counts:
            ls, ws = zip(*counts.keys())
        else:
            ls, ws = (), ()
        return pa.table(
            {"lang": pa.array(list(ls), pa.string()),
             "token": pa.array(list(ws), pa.string()),
             "n": pa.array(list(counts.values()), pa.int64())}
        )

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "token"], Sum("n", alias_name="n"),
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df[["lang", "token", "n"]]
        df = df.sort_values(["n", "token"], ascending=[False, True])
        return df.groupby("lang", sort=False).head(k)[["lang", "token", "n"]]

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "token"], ascending=[False, True]).head(k).copy()
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["n"] = g["n"].astype("int64")
        return g[["lang", "token", "n", "rk"]]

    return (
        agg.map_batches(combine, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q_source_vocab_jaccard(sf_dir: str):
    """Corpus-comparison: vocabulary Jaccard similarity between every pair of
    sources — the source-overlap diagnostic run before mixing corpora.

    Plan: distinct (token, source) pairs (per-batch set + bucketed aggregate)
    → per-token source BITMASK (each pair contributes exactly once, so a Sum
    of 1<<src_idx IS the OR) → per-batch O(|S|²) pair-intersection partials
    via vectorized popcount-style bit tests → a ≤ |S|²-row final aggregate.
    Nothing vocabulary-sized ever reaches the driver and no stage is
    quadratic in tokens. Partitioning assumption: |sources| ≤ 62 (bitmask in
    one int64) — raise, don't alias, beyond it; a multi-word mask or a
    (token, src_a, src_b) self-join covers wider source sets.
    Output: (source_a, source_b, inter_n, union_n, jaccard_ppm) with
    jaccard_ppm = ⌊inter · 10⁶ / union⌋, integer-exact for hash comparison."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "documents", ["source", "text"])
    sources = sorted(ds.unique("source"))
    if len(sources) > 62:
        raise ValueError("source bitmask needs ≤ 62 sources — widen the encoding")
    idx = {s: i for i, s in enumerate(sources)}
    S = len(sources)

    def pair_rows(t: pa.Table) -> pa.Table:
        seen: set[tuple] = set()
        for src, s in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
            b = idx[src]
            for w in set(_ALNUM.findall((s or "").lower())):
                seen.add((w, b))
        if seen:
            ws, bs = zip(*seen)
        else:
            ws, bs = (), ()
        return pa.table(
            {"token": pa.array(list(ws), pa.string()),
             "src": pa.array(list(bs), pa.int64()),
             "one": pa.array([1] * len(ws), pa.int64())}
        )

    dpairs = grouped_aggregate(
        ds.map_batches(pair_rows, batch_format="pyarrow"),
        ["token", "src"], Sum("one", alias_name="c"),
    )

    def to_mask(t: pa.Table) -> pa.Table:
        bit = np.left_shift(
            np.int64(1), pc.cast(t.column("src"), pa.int64()).to_numpy())
        return pa.table({"token": t.column("token"),
                         "mask": pa.array(bit, pa.int64())})

    masks = _gagg(dpairs.map_batches(to_mask, batch_format="pyarrow"),
                  "token", Sum("mask", alias_name="mask"))

    def pair_partials(t: pa.Table) -> pa.Table:
        m = pc.cast(t.column("mask"), pa.int64()).to_numpy()
        ii, jj, nn = [], [], []
        bits = [(m >> np.int64(i)) & np.int64(1) for i in range(S)]
        for i in range(S):
            ii.append(i); jj.append(i); nn.append(int(bits[i].sum()))
            for j in range(i + 1, S):
                c = int(np.sum(bits[i] & bits[j]))
                if c:
                    ii.append(i); jj.append(j); nn.append(c)
        return pa.table({"i": pa.array(ii, pa.int64()),
                         "j": pa.array(jj, pa.int64()),
                         "n": pa.array(nn, pa.int64())})

    agg = grouped_aggregate(
        masks.map_batches(pair_partials, batch_format="pyarrow"),
        ["i", "j"], Sum("n", alias_name="n"),
    ).take_all()  # ≤ |S|² rows — source-pair-, not corpus-, sized
    cnt = {(r["i"], r["j"]): r["n"] for r in agg}

    rows = []
    for i in range(S):
        for j in range(i + 1, S):
            inter = cnt.get((i, j), 0)
            union = cnt.get((i, i), 0) + cnt.get((j, j), 0) - inter
            rows.append((sources[i], sources[j], inter, union,
                         inter * 1_000_000 // union if union else 0))
    sa, sb, it, un, jp = zip(*rows) if rows else ((), (), (), (), ())
    return pa.table(
        {"source_a": pa.array(list(sa), pa.string()),
         "source_b": pa.array(list(sb), pa.string()),
         "inter_n": pa.array(list(it), pa.int64()),
         "union_n": pa.array(list(un), pa.int64()),
         "jaccard_ppm": pa.array(list(jp), pa.int64())}
    )


def q_sliding_distinct_users(sf_dir: str):
    """Hopping-window COUNT DISTINCT — streaming unique-reach per 2 h window
    hopping hourly. Composes the constant-factor window explode (each event
    in exactly size/hop windows) with the two-level distinct plan: per-batch
    (window, user) dedup → bucketed pair-key aggregate makes pairs globally
    distinct → per-batch per-window counts → window-sized final aggregate.
    No window ever materializes its user set; the only corpus-sized exchange
    carries (window_id, user_id) int pairs."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.windows import explode_hopping_windows

    ds = _rp(sf_dir, "events", ["ts", "user_id"])
    exploded = explode_hopping_windows(ds, "ts", size_s=7200, hop_s=3600)

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"window_id": pc.cast(t.column("window_id"), pa.int64()).to_numpy(),
             "user_id": pc.cast(t.column("user_id"), pa.int64()).to_numpy()}
        ).drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    dpairs = grouped_aggregate(
        exploded.map_batches(pair_partial, batch_format="pyarrow"),
        ["window_id", "user_id"], Sum("one", alias_name="c"),
    )

    def count_partial(t: pa.Table) -> pa.Table:
        w = pc.cast(t.column("window_id"), pa.int64()).to_numpy()
        uniq, cnt = np.unique(w, return_counts=True)
        return pa.table({"window_id": pa.array(uniq, pa.int64()),
                         "n_users": pa.array(cnt.astype(np.int64), pa.int64())})

    return _gagg(dpairs.map_batches(count_partial, batch_format="pyarrow"),
                 "window_id", Sum("n_users", alias_name="n_users"))


def q_user_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by their FIRST active day;
    n_users active again day_delta days later. The product-analytics
    staple that needs a first-occurrence reduce JOINED back to the activity
    stream. Plan: distinct (user, day) pairs (per-batch dedup + bucketed
    aggregate) → per-user Min(day) cohort table (user-, not event-, sized)
    → partitioned hash join pairs×cohorts on user → (cohort_day, delta)
    counted with per-batch partials. Every exchange is integer-keyed and
    either activity-pair- or user-sized; nothing touches the driver."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "events", ["ts", "user_id"])
    DAY_US = 86_400 * 1_000_000

    def day_pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": pc.cast(t.column("user_id"), pa.int64()).to_numpy(),
             "day": pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY_US}
        ).drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    ud = grouped_aggregate(
        ds.map_batches(day_pairs, batch_format="pyarrow"),
        ["user_id", "day"], Sum("one", alias_name="c"),
    ).map_batches(lambda t: t.select(["user_id", "day"]), batch_format="pyarrow")

    first = _gagg(ud, "user_id", Min("day", alias_name="day0"))
    joined = hash_join(ud, first, on=("user_id",))

    def delta_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"cohort_day": pd.Series([], dtype="int64"),
                                 "day_delta": pd.Series([], dtype="int64"),
                                 "n_users": pd.Series([], dtype="int64")})
        out = pd.DataFrame(
            {"cohort_day": df["day0"].astype("int64"),
             "day_delta": (df["day"] - df["day0"]).astype("int64")}
        ).groupby(["cohort_day", "day_delta"], as_index=False).size()
        return out.rename(columns={"size": "n_users"}).astype("int64")

    return grouped_aggregate(
        joined.map_batches(delta_partial, batch_format="pandas"),
        ["cohort_day", "day_delta"], Sum("n_users", alias_name="n_users"),
    )


def _floor_log2(n: np.ndarray) -> np.ndarray:
    """Vectorized floor(log2(n)) for int n ≥ 1 — pure integer doubling
    (no log2 float-rounding hazard near power-of-two boundaries)."""
    v = n.astype(np.uint64)
    b = np.zeros(len(v), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        b[m] += s
        v[m] >>= np.uint64(s)
    return b


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


def q_component_size_hist(sf_dir: str):
    """Connected-component SIZE histogram (power-of-two buckets) — the
    canonicalization skew probe: a fat top bucket means one giant entity
    cluster is about to dominate its canonicalize/map_groups partition
    (stopword-adjacent mentions, head-domain URLs), the case the bucket-cap
    chains exist for. Composes the distributed CC with a comp-sized count
    aggregate and the same integer floor-log2 bucketing as key_skew_stats;
    the result is ≤ 64 rows at any graph size."""
    from ..stages.canonicalize import grouped_aggregate

    comps = q_graph_components(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("comp"), pa.int64()).to_numpy()
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({"comp": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    sizes = _gagg(comps.map_batches(partial, batch_format="pyarrow"),
                  "comp", Sum("n", alias_name="n"))

    def bucketize(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.int64()).to_numpy()
        df = pd.DataFrame({"bucket": _floor_log2(n), "n": n})
        g = df.groupby("bucket", as_index=False).agg(
            n_comps=("n", "size"), n_nodes=("n", "sum"))
        g = g.astype({"n_comps": "int64", "n_nodes": "int64"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        sizes.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], Sum("n_comps", alias_name="n_comps"),
        Sum("n_nodes", alias_name="n_nodes"),
    )


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


_CHUNK_K = 64


def q_doc_chunks(sf_dir: str, *, k: int = _CHUNK_K):
    """Fixed-size token chunking — the retrieval-indexing split complementary
    to seq_packing's concatenation: each document becomes ⌈n_tokens/k⌉ rows
    of (doc_id, chunk_id, n_tokens, chunk_text). Purely row-local flat-map
    (no shuffle at all); empty documents emit no chunks. The embarrassingly
    parallel shape every RAG/embedding-index build starts from."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids, chunks, ntoks, texts = [], [], [], []
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_numpy(),
                          t.column("text").to_pylist()):
            toks = _ALNUM.findall((s or "").lower())
            for c in range(0, len(toks), k):
                piece = toks[c:c + k]
                ids.append(int(did))
                chunks.append(c // k)
                ntoks.append(len(piece))
                texts.append(" ".join(piece))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "chunk_id": pa.array(chunks, pa.int64()),
             "n_tokens": pa.array(ntoks, pa.int64()),
             "chunk_text": pa.array(texts, pa.string())}
        )

    return ds.map_batches(partial, batch_format="pyarrow")


_MB_MAX_BLOCK = 256


def q_meta_blocking(sf_dir: str, *, max_block: int = _MB_MAX_BLOCK):
    """Entity-resolution META-BLOCKING (the SparkER/blocking-graph idea,
    EDBT 2019, from public literature): token blocking over part names, drop
    stop-blocks (size < 2: no pairs; size > max_block: stopword-like tokens
    whose pair explosion buys no precision), then weight each candidate pair
    by its number of COMMON BLOCKS and keep pairs with weight ≥ 2 — the
    cheapest meta-blocking pruning rule, removing pairs that co-occur only
    by one shared token.

    Plan: distinct (token, id) via bucketed aggregate → block sizes at
    vocabulary cardinality, size-filtered DISTRIBUTED (no driver set) →
    partitioned hash join back onto the token rows → per-token pair
    enumeration inside coarse hash buckets (every block lives wholly in one
    bucket; ≤ max_block² pairs per block by construction) → pair-key
    aggregate sums the common-block weight. Shuffles carry (token, id) ints
    and (id, id, w) ints only."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate
    from ..stages.joins import hash_join

    ds = _rp(sf_dir, "part", ["p_partkey", "p_name"])

    def tok_rows(t: pa.Table) -> pa.Table:
        seen: set[tuple] = set()
        for pid, s in zip(pc.cast(t.column("p_partkey"), pa.int64()).to_numpy(),
                          t.column("p_name").to_pylist()):
            for w in set(_ALNUM.findall((s or "").lower())):
                seen.add((w, int(pid)))
        if seen:
            ws, ids = zip(*seen)
        else:
            ws, ids = (), ()
        return pa.table({"t": pa.array(list(ws), pa.string()),
                         "id": pa.array(list(ids), pa.int64()),
                         "one": pa.array([1] * len(ws), pa.int64())})

    tok = grouped_aggregate(
        ds.map_batches(tok_rows, batch_format="pyarrow"),
        ["t", "id"], Sum("one", alias_name="c"),
    ).map_batches(lambda t: t.select(["t", "id"]), batch_format="pyarrow")

    sizes = _gagg(
        tok.map_batches(
            lambda t: pa.table({"t": t.column("t"),
                                "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}),
            batch_format="pyarrow"),
        "t", Sum("n", alias_name="n"),
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t.column("n"), 2),
                    pc.less_equal(t.column("n"), max_block))
        ).select(["t"]),
        batch_format="pyarrow",
    )

    blocked = hash_join(tok, sizes, on=("t",))
    P = _compact_blocks()

    from ..functions.hashing import stable_hash64

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t": pd.Series([], dtype="string"),
                                 "id": pd.Series([], dtype="int64"),
                                 "__part": pd.Series([], dtype="int64")})
        # stable hash: builtin hash() is per-process salted and would split a
        # block across partitions, silently dropping its cross-part pairs
        h = df["t"].map(lambda s: stable_hash64(s) & 0x7FFFFFFF)
        return df.assign(__part=(h % P).astype("int64"))[["t", "id", "__part"]]

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("t", sort=False):
            ids = np.sort(grp["id"].to_numpy(dtype=np.int64))
            if len(ids) < 2:
                continue
            i, j = np.triu_indices(len(ids), k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"id_a": np.concatenate(out_a),
                           "id_b": np.concatenate(out_b)})
        out = df.groupby(["id_a", "id_b"], as_index=False).size().rename(
            columns={"size": "w"})
        return out.astype("int64")

    pairs = (
        blocked.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(block_pairs, batch_format="pandas")
    )
    agg = grouped_aggregate(pairs, ["id_a", "id_b"], Sum("w", alias_name="w"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("w"), 2)),
        batch_format="pyarrow",
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


def q_golden_records(sf_dir: str):
    """ER SURVIVORSHIP / golden-record construction: one merged record per
    exact-content duplicate cluster, each field resolved by its own rule —
    id = Min (stable representative), n_chars = Max (richest capture),
    lang/source = Min (deterministic tie-break) — the record-merge step
    that follows any dedup decision. ONE keyed aggregate over the 32-char
    content hash carrying five narrow survivor columns; text itself never
    shuffles (extends exact_dedup_groups' keep-min-id to multi-column
    rules, functions/dedup.py)."""
    from ..functions.dedup import add_md5
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "documents",
             ["doc_id", "text", "lang", "source", "n_chars"])
    hashed = add_md5(ds, "text").select_columns(
        ["h", "doc_id", "lang", "source", "n_chars"])
    agg = grouped_aggregate(
        hashed, ["h"],
        Min("doc_id", alias_name="rep_id"), Count(alias_name="n_dups"),
        Max("n_chars", alias_name="max_chars"),
        Min("lang", alias_name="lang"), Min("source", alias_name="source"))
    return agg.map_batches(
        lambda t: pa.table(
            {"h": t.column("h"),
             "rep_id": pc.cast(t.column("rep_id"), pa.int64()),
             "n_dups": pc.cast(t.column("n_dups"), pa.int64()),
             "max_chars": pc.cast(t.column("max_chars"), pa.int64()),
             "lang": t.column("lang"), "source": t.column("source")}),
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


def q_events_trailing7(sf_dir: str):
    """TRAILING 7-day window per day: each calendar day's event count and
    value with the 7-day running totals ending that day — the dashboard
    smoothing query (calendar-RANGE window, distinct from the hopping
    windows in events_sliding: the frame is day-based, gaps included).
    The corpus reduces to a timeline-sized daily aggregate; the trailing
    sums then come from prefix sums + searchsorted on the sorted day axis
    (exact integers, day-6 lower bound) — no self-join, no window
    explode."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t.column("ts").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        df = pd.DataFrame({"day": day,
                           "n": np.ones(len(day), np.int64),
                           "v": _cents(np.asarray(t.column("value")))})
        g = df.groupby("day", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], Sum("n", alias_name="n"), Sum("v", alias_name="v")
    ).to_pandas().sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(dtype=np.int64)
    cn = np.concatenate(([0], np.cumsum(daily["n"].to_numpy(np.int64))))
    cv = np.concatenate(([0], np.cumsum(daily["v"].to_numpy(np.int64))))
    lo = np.searchsorted(days, days - 6, side="left")
    hi = np.arange(1, len(days) + 1)
    return pa.table(
        {"day": pa.array(days, pa.int64()),
         "n": pa.array(daily["n"].astype("int64")),
         "value_cents": pa.array(daily["v"].astype("int64")),
         "n_7d": pa.array(cn[hi] - cn[lo], pa.int64()),
         "value_cents_7d": pa.array(cv[hi] - cv[lo], pa.int64())})


def q_balanced_sample(sf_dir: str):
    """BALANCED class downsampling: every event type keeps exactly
    min-class-count rows, selected deterministically by md5(event_id) —
    the class-equalization step before training on skewed labels (no RNG:
    the hash IS the sampling order, so the result is parallelism- and
    rerun-stable). Per-batch lossless top-k combiner (each batch keeps its
    k hash-smallest rows per type, k = min class count from a 5-row
    aggregate), then the per-type exact re-rank runs on ≤ k·blocks rows —
    the fact table never shuffles whole."""
    import hashlib as _hl

    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_id", "event_type"])
    counts = grouped_aggregate(
        ds.map_batches(
            lambda t: pa.table(
                {"event_type": t.column("event_type"),
                 "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["event_type"], Sum("one", alias_name="n")).take_all()
    k = min(int(r["n"]) for r in counts)

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("event_id"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {"event_id": ids,
             "event_type": t.column("event_type").to_pylist(),
             "h": [_hl.md5(str(i).encode()).hexdigest() for i in ids]})
        df = df.sort_values(["event_type", "h", "event_id"])
        return pa.Table.from_pandas(
            df.groupby("event_type", sort=False).head(k),
            preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"]).head(k)
        return pd.DataFrame({"event_id": g["event_id"].astype("int64"),
                             "event_type": g["event_type"]})

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(final_topk, batch_format="pandas")
    )


def q_props_novelty(sf_dir: str):
    """Payload-vocabulary NOVELTY per day — of the distinct tokens seen in
    event props on day d, how many had never appeared before d? The schema
    / content-drift detector a streaming ingest watches (a novelty spike
    means a producer changed payloads). Incremental first-occurrence
    reduce: per-batch distinct (day, token) partials → (token → Min day)
    at vocabulary cardinality → per-day new-token counts; per-day distinct
    totals ride the same (day, token) aggregate. Nothing row-scale leaves
    the aggregates."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["ts", "props"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t.column("ts").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        seen: set[tuple[int, str]] = set()
        for d, s in zip(day, t.column("props").to_pylist()):
            for tok in _ALNUM.findall((s or "").lower()):
                seen.add((int(d), tok))
        return pa.table(
            {"day": pa.array([d for d, _ in seen], pa.int64()),
             "token": pa.array([w for _, w in seen], pa.string())})

    pairs = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "token"], Count(alias_name="_n"))

    totals = grouped_aggregate(
        pairs.map_batches(
            lambda t: pa.table({"day": t.column("day"),
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["day"], Sum("one", alias_name="n_tokens")).to_pandas()
    first = grouped_aggregate(pairs, ["token"], Min("day", alias_name="d0"))
    news = grouped_aggregate(
        first.map_batches(
            lambda t: pa.table({"day": pc.cast(t.column("d0"), pa.int64()),
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["day"], Sum("one", alias_name="n_new")).to_pandas()

    out = totals.merge(news, on="day", how="left").sort_values("day")
    return pa.table(
        {"day": pa.array(out["day"].astype("int64")),
         "n_tokens": pa.array(out["n_tokens"].astype("int64")),
         "n_new": pa.array(out["n_new"].fillna(0).astype("int64"))})


def q_abandoned_views(sf_dir: str):
    """TEMPORAL ANTI-JOIN: views with NO same-user purchase within 1 h
    after — the abandonment/churn signal, the NOT-EXISTS dual of the
    banded interval join. Matches come from the existing banded join
    (purchases ⋈ views with 0 ≤ p.ts − v.ts ≤ 3600, O(input) shuffle);
    the exclusion is then the exact side-tagged anti pattern (view rows
    tag 0 ∪ matched ids tag 1 → one keyed Max aggregate, keep tag 0) —
    no Bloom (FPs would drop survivors) and no broadcast of the matched
    set."""
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.windows import interval_join

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    views = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "view"))
        .select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow")
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase"))
        .select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow")

    matched = interval_join(purchases, views, on="user_id",
                            ts_col="ts", window_s=3600)

    def tag_matched(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("event_id", "user_id", "s",
                                           "tag")})
        return pd.DataFrame(
            {"event_id": df["event_id_r"].astype("int64"),
             "user_id": np.zeros(len(df), np.int64),
             "s": np.zeros(len(df), np.int64),
             "tag": np.ones(len(df), np.int64)})

    def tag_views(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": pc.cast(t.column("event_id"), pa.int64()),
             "user_id": pc.cast(t.column("user_id"), pa.int64()),
             "s": pa.array(t.column("ts").cast(pa.int64()).to_numpy()
                           // 1_000_000, pa.int64()),
             "tag": pa.array(np.zeros(t.num_rows, np.int64))})

    union = matched.map_batches(tag_matched, batch_format="pandas").union(
        views.map_batches(tag_views, batch_format="pyarrow"))
    agg = grouped_aggregate(
        union, ["event_id"],
        Max("tag", alias_name="tag"), Max("user_id", alias_name="user_id"),
        Max("s", alias_name="s"))
    def keep_unmatched(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t.column("tag"), 0))
        return pa.table({"event_id": pc.cast(f.column("event_id"), pa.int64()),
                         "user_id": pc.cast(f.column("user_id"), pa.int64()),
                         "s": pc.cast(f.column("s"), pa.int64())})

    return agg.map_batches(keep_unmatched, batch_format="pyarrow")


_PATH_TOP_K = 10
_PATH_GAP_US = 1_800_000_000  # 30-min session gap, µs-exact


def q_top_session_paths(sf_dir: str):
    """PATH ANALYSIS: the 10 most common session journeys — each session's
    event-type sequence joined with '>' (sessions split on 30-min gaps,
    µs-exact), counted across the corpus; ties → lexicographically first
    path. The funnel-discovery complement of event_type_transitions
    (whole-path counts, not Markov pairs). Coarse user buckets co-locate
    each user's events, one vectorized sort + gap-cumsum builds session
    ids, per-bucket path counts pre-aggregate before the path-keyed fold,
    and the final top-k runs on a per-batch partial-top-k reduction —
    paths never sort globally."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    P = _compact_blocks()

    def narrow(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return pa.table(
            {"user_id": pa.array(uid, pa.int64()),
             "event_id": pc.cast(t.column("event_id"), pa.int64()),
             "us": pa.array(t.column("ts").cast(pa.int64()).to_numpy(),
                            pa.int64()),
             "event_type": t.column("event_type"),
             "__part": pa.array(uid % P, pa.int64())})

    def bucket_paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"])
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        prev = np.empty_like(us)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = us[:-1]
        new_user = np.empty(len(uid), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        sid = np.cumsum(new_user | (us - prev > _PATH_GAP_US))
        paths = (pd.DataFrame({"sid": sid,
                               "t": g["event_type"].to_numpy()})
                 .groupby("sid", sort=False)["t"]
                 .agg(">".join))
        out = (paths.to_frame("path").groupby("path", as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    counts = grouped_aggregate(
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_paths, batch_format="pandas"),
        ["path"], Sum("n", alias_name="n"))

    def partial_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"path": t.column("path").to_pylist(),
                           "n": pc.cast(t.column("n"), pa.int64())
                           .to_numpy()})
        df = df.sort_values(["n", "path"],
                            ascending=[False, True]).head(_PATH_TOP_K)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = counts.map_batches(partial_topk, batch_format="pyarrow") \
        .take_all()
    top = sorted(cand, key=lambda r: (-int(r["n"]), r["path"]))[:_PATH_TOP_K]
    return pa.table({"path": pa.array([r["path"] for r in top], pa.string()),
                     "n": pa.array([int(r["n"]) for r in top], pa.int64())})


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


def q_events_anomalies(sf_dir: str):
    """Timeline ANOMALY DETECTION: days whose event count deviates from
    the corpus daily median by more than 3× the daily MAD — the
    robust-statistics alert rule (median/MAD immune to the anomalies
    themselves, unlike mean/stddev). The corpus reduces to the
    timeline-sized daily count aggregate; median, MAD and the 3-MAD gate
    all read from that one small table with exact integer arithmetic
    (|count − med| > 3·MAD compares integers — no float threshold).
    Emits the anomalous days with their deviation."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t.column("ts").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], Sum("n", alias_name="n")).to_pandas().sort_values("n")
    cnt = daily["n"].to_numpy(dtype=np.int64)
    m = len(cnt)
    med = int(cnt[(m - 1) // 2]) if m % 2 else int(cnt[m // 2 - 1])
    dev = np.sort(np.abs(cnt - med))
    mad = int(dev[(m - 1) // 2]) if m % 2 else int(dev[m // 2 - 1])
    out = daily[np.abs(daily["n"] - med) > 3 * mad].sort_values("day")
    return pa.table(
        {"day": pa.array(out["day"].astype("int64")),
         "n": pa.array(out["n"].astype("int64")),
         "deviation": pa.array((out["n"] - med).astype("int64"))})


_INV_DF_CAP = 32


def q_inverted_index(sf_dir: str):
    """INVERTED-INDEX build over the corpus — the retrieval-index
    materialization: per term, EXACT document frequency plus the posting-
    list HEAD (first 32 docs by doc id, each at its first-occurrence token
    position). Stage 1 is row-local: each doc emits each DISTINCT term
    once, so (term, doc) rows are globally unique and df is a plain sum of
    per-batch partial counts. The per-batch COMBINER is lossless the same
    way top3_events_per_user's is: any doc in the global head-32 of a term
    is in its batch's head-32, so each batch ships ≤ 32 posting rows per
    term plus ONE count row — the shuffle is O(vocab·32·blocks), NOT
    O(index size), and a stopword's corpus-sized posting set never travels
    or materializes. Rows hash-partition on md5(term) so one
    ``map_groups`` bucket finalizes each term. Output: (token, df,
    postings) with postings 'doc:pos,…' sorted by doc id."""
    from ..functions.textfns import md5_hash64
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    P = _compact_blocks()

    def postings(t: pa.Table) -> pa.Table:
        heads: dict[str, list] = {}
        cnts: dict[str, int] = {}
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                          t.column("text").to_pylist()):
            first: dict[str, int] = {}
            for i, w in enumerate(_ALNUM.findall((s or "").lower())):
                if w not in first:
                    first[w] = i
            for w, pos in first.items():
                cnts[w] = cnts.get(w, 0) + 1
                h = heads.setdefault(w, [])
                h.append((did, pos))
        o_t, o_d, o_p, o_c = [], [], [], []
        for w, h in heads.items():
            # docs arrive in arbitrary id order within the batch: keep the
            # 32 smallest doc ids (the batch-local head) + one count row
            h.sort()
            for did, pos in h[:_INV_DF_CAP]:
                o_t.append(w); o_d.append(did); o_p.append(pos); o_c.append(0)
            o_t.append(w); o_d.append(-1); o_p.append(0); o_c.append(cnts[w])
        part = np.fromiter((md5_hash64(w) % P for w in o_t),
                           dtype=np.int64, count=len(o_t))
        return pa.table(
            {"token": pa.array(o_t, pa.string()),
             "doc": pa.array(o_d, pa.int64()),
             "pos": pa.array(o_p, pa.int64()),
             "cnt": pa.array(o_c, pa.int64()),
             "__part": pa.array(part, pa.int64())}
        )

    def part_index(g: pd.DataFrame) -> pd.DataFrame:
        dfs = g.groupby("token", as_index=False)["cnt"].sum().rename(
            columns={"cnt": "df"})
        posts = g[g["doc"] >= 0].sort_values(["token", "doc"])
        posts = posts.groupby("token").head(_INV_DF_CAP)
        pairs = posts["doc"].astype(str) + ":" + posts["pos"].astype(str)
        agg = posts.assign(__pp=pairs).groupby("token", as_index=False).agg(
            postings=("__pp", ",".join))
        out = dfs.merge(agg, on="token", how="left")
        out["df"] = out["df"].astype("int64")
        out["postings"] = out["postings"].fillna("")
        return out[["token", "df", "postings"]]

    return (
        ds.map_batches(postings, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_index, batch_format="pandas")
    )


_FH_DIMS = 64


def q_feature_hashing(sf_dir: str):
    """HASHING-TRICK featurization (Weinberger et al.): every document maps
    to a fixed 64-dim signed sparse count vector with dim = md5(term) % 64
    and sign = bit 6 of the hash — the signed trick that makes collision
    noise zero-mean. Needs NO vocabulary pass and no state, so the stage is
    entirely ROW-LOCAL with zero shuffle: the property that makes it the
    default featurizer when the vocabulary itself would be a 100-TB-scale
    distributed object. Zero-sum cells (sign cancellation) are dropped to
    keep the output sparse. Output: (doc_id, dim, val)."""
    from ..functions.textfns import md5_hash64

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def featurize(t: pa.Table) -> pa.Table:
        hcache: dict[str, tuple[int, int]] = {}
        o_id, o_dim, o_val = [], [], []
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                          t.column("text").to_pylist()):
            cnt: dict[str, int] = {}
            for w in _ALNUM.findall((s or "").lower()):
                cnt[w] = cnt.get(w, 0) + 1
            cell: dict[int, int] = {}
            for w, c in cnt.items():
                if w in hcache:
                    d, sgn = hcache[w]
                else:
                    h = md5_hash64(w)
                    d, sgn = int(h % _FH_DIMS), (1 if (h // _FH_DIMS) % 2 else -1)
                    hcache[w] = (d, sgn)
                cell[d] = cell.get(d, 0) + sgn * c
            for d in sorted(cell):
                if cell[d]:
                    o_id.append(did); o_dim.append(d); o_val.append(cell[d])
        return pa.table(
            {"doc_id": pa.array(o_id, pa.int64()),
             "dim": pa.array(o_dim, pa.int64()),
             "val": pa.array(o_val, pa.int64())}
        )

    return ds.map_batches(featurize, batch_format="pyarrow")


_NEG_K = 2


def q_negative_edges(sf_dir: str):
    """NEGATIVE SAMPLING for link-prediction training: K=2 deterministic
    non-edges per node of the co-purchase graph — the contrastive examples
    a graph-embedding trainer needs alongside `link_predict`'s positives.
    Candidate partners come from a hash-to-rank map (md5(u:i) mod n →
    the node at that rank), so sampling is uniform over the ACTUAL node
    set without any driver-side node list: ranks come from the
    range-partitioned global_rank (no global sort), candidates meet their
    partner via ONE node-sized hash join, unordered pairs dedup through a
    per-batch combiner, and known edges are removed by an exact
    partitioned LEFT-join anti pass (a Bloom prefilter would silently drop
    legitimate negatives on false positives — same caveat as
    customers_without_urgent_orders). Output: (u, v) non-edges, u < v."""
    from ..functions.graph import degree_table
    from ..functions.rank import global_rank
    from ..functions.textfns import md5_hash64
    from ..stages.canonicalize import pre_aggregated_count
    from ..stages.joins import hash_join

    edges = _graph_edges(sf_dir, 2).materialize()
    nodes = degree_table(edges).select_columns(["node"]).materialize()
    n = nodes.count()
    ranked = global_rank(nodes, "node", "node", descending=False, out="rk")

    def cands(t: pa.Table) -> pa.Table:
        o_u, o_rk = [], []
        for u in pc.cast(t.column("node"), pa.int64()).to_pylist():
            for i in range(_NEG_K):
                o_u.append(u)
                o_rk.append(md5_hash64(f"{u}:{i}") % n + 1)
        return pa.table({"u0": pa.array(o_u, pa.int64()),
                         "rk": pa.array(o_rk, pa.int64())})

    rk_nodes = ranked.map_batches(
        lambda t: pa.table({"rk": pc.cast(t.column("rk"), pa.int64()),
                            "v0": pc.cast(t.column("node"), pa.int64())}),
        batch_format="pyarrow",
    )
    pairs = hash_join(nodes.map_batches(cands, batch_format="pyarrow"),
                      rk_nodes, on=("rk",))

    def norm(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("u0"), pa.int64()).to_numpy()
        b = pc.cast(t.column("v0"), pa.int64()).to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": pa.array(np.minimum(a, b), pa.int64()),
                         "v": pa.array(np.maximum(a, b), pa.int64())})

    uniq = pre_aggregated_count(
        pairs.map_batches(norm, batch_format="pyarrow"), ["u", "v"], "m")
    ekeys = edges.map_batches(
        lambda t: pa.table({"u": pc.cast(t.column("u"), pa.int64()),
                            "v": pc.cast(t.column("v"), pa.int64()),
                            "e": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow",
    )
    joined = hash_join(uniq, ekeys, on=("u", "v"), how="left")

    def anti(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "e" not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        keep = t.filter(pc.is_null(t.column("e"), nan_is_null=True))
        return pa.table({"u": pc.cast(keep.column("u"), pa.int64()),
                         "v": pc.cast(keep.column("v"), pa.int64())})

    return joined.map_batches(anti, batch_format="pyarrow")


def q_image_phash_neardup(sf_dir: str):
    """Multimodal image NEAR-DUP (stages/multimodal.py phash_neardup_pairs):
    perceptual-hash banding over decoded payloads — the LSH plan applied to
    pixels instead of shingles. Each doc's 16-char text prefix stands in as
    the binary payload (FakeCodec decode is deterministic per byte string),
    modelling the same stock asset embedded on many pages: prefix
    collisions land at Hamming 0 and make the run non-vacuous;
    planted-pixel unit tests (PatternCodec) pin Hamming-1 recall and the
    skew cap. Rows-only vs SQL (decode not SQL-expressible). Output:
    (id_a, id_b, hamming)."""
    from ..stages.multimodal import phash_neardup_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {"id": pc.cast(t.column("doc_id"), pa.int64()),
             "payload": pa.array([(s or "")[:16].encode("utf-8") for s in texts],
                                 pa.binary())}
        )

    return phash_neardup_pairs(ds.map_batches(to_payload, batch_format="pyarrow"))


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


def q_user_pareto(sf_dir: str):
    """PARETO / LORENZ concentration point: how few of the heaviest users
    produce ≥ 80 % of all events. User totals pre-aggregate per batch; the
    heaviest-first cumulative is the range-partitioned exclusive prefix sum
    over a PACKED descending key ((2³¹ − cnt) ≪ 32 | user — ascending key
    order IS count-descending, user-ascending total order, no global
    sort); a user is in the 80 % head iff its exclusive prefix is below
    the threshold, compared in integers (10·prefix < 8·total). Output:
    (n_users, n_events, n_users_80, users_share_ppm)."""
    from ..functions.rank import keyed_prefix_sum
    from ..stages.canonicalize import grouped_aggregate, pre_aggregated_count

    ds = _rp(sf_dir, "events", ["user_id"])
    ucnt = pre_aggregated_count(ds, ["user_id"], "cnt").materialize()
    tot_tbl = grouped_aggregate(
        ucnt.map_batches(
            lambda t: pa.table(
                {"__g": pa.array(np.zeros(t.num_rows, np.int64)),
                 "cnt": pc.cast(t.column("cnt"), pa.int64()),
                 "u": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["__g"], Sum("cnt", alias_name="tot"), Sum("u", alias_name="nu"),
    ).take_all()
    tot, nu = int(tot_tbl[0]["tot"]), int(tot_tbl[0]["nu"])

    def packed(t: pa.Table) -> pa.Table:
        cnt = pc.cast(t.column("cnt"), pa.int64()).to_numpy()
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return pa.table(
            {"dk": pa.array((((1 << 31) - cnt) << 32) | uid, pa.int64()),
             "cnt": pa.array(cnt, pa.int64())})

    cum = keyed_prefix_sum(ucnt.map_batches(packed, batch_format="pyarrow"),
                           "dk", "cnt", out="ps")

    def head_count(t: pa.Table) -> pa.Table:
        ps = pc.cast(t.column("ps"), pa.int64()).to_numpy()
        return pa.table(
            {"__g": pa.array([0], pa.int64()),
             "n80": pa.array([int((10 * ps < 8 * tot).sum())], pa.int64())})

    n80 = sum(int(r["n80"]) for r in grouped_aggregate(
        cum.map_batches(head_count, batch_format="pyarrow"),
        ["__g"], Sum("n80", alias_name="n80")).take_all())
    return pa.table(
        {"n_users": pa.array([nu], pa.int64()),
         "n_events": pa.array([tot], pa.int64()),
         "n_users_80": pa.array([n80], pa.int64()),
         "users_share_ppm": pa.array([1_000_000 * n80 // nu], pa.int64())})


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


def q_user_streaks(sf_dir: str):
    """Gaps-and-islands: per user, distinct active days and the LONGEST run
    of consecutive days — the retention/engagement-streak primitive. Plan:
    per-batch distinct (user, epoch-day) partials (16 B/row — the fact
    table's timestamps never shuffle twice), coarse user-hash buckets
    co-locate each user's days, and inside the bucket the classic
    day − row-position grouping runs vectorized (sort + cumcount, no
    Python loop over users); each bucket emits finished user rows, so the
    output needs no further exchange. Islands are detected on the DISTINCT
    day set — duplicate same-day events must not break or inflate runs."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id", "ts"])
    P = _compact_blocks()

    def day_partials(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        day = (t.column("ts").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        if uid.size and (uid.max() >= 1 << 31 or uid.min() < 0
                         or day.max() >= 1 << 31 or day.min() < 0):
            raise ValueError("user_streaks: user_id/day must fit 31 bits")
        key = np.unique((uid << np.int64(32)) | day)
        u = key >> np.int64(32)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "day": pa.array(key & ((1 << 32) - 1), pa.int64()),
                         "__part": pa.array(u % P, pa.int64())})

    def bucket_streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = (g[["user_id", "day"]].drop_duplicates()
             .sort_values(["user_id", "day"]))
        pos = g.groupby("user_id", sort=False).cumcount()
        g = g.assign(grp=g["day"].to_numpy() - pos.to_numpy())
        runs = (g.groupby(["user_id", "grp"], as_index=False)
                .size().rename(columns={"size": "len"}))
        out = runs.groupby("user_id", as_index=False).agg(
            n_days=("len", "sum"), max_streak=("len", "max"))
        return out.astype({"user_id": "int64", "n_days": "int64",
                           "max_streak": "int64"})

    return (
        ds.map_batches(day_partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_streaks, batch_format="pandas")
    )


def q_profile_events(sf_dir: str):
    """Table PROFILER: per column, (n_rows, n_null, n_distinct) — the
    data-quality report every ingest job runs first. Exact distinct counts
    at any scale via the melt trick: each column's values canonicalize to
    an injective string key (ints/µs-timestamps verbatim, the 2-decimal
    float as cents — injective on this data; a general profiler would use
    a 128-bit value hash), batch-level dedup shrinks the exchange, ONE
    (col, key) distinct aggregate serves every column together, and the
    final count-per-column is column-cardinality. Null/row tallies ride a
    separate 2·|cols|-row partial-sum aggregate — nothing row-sized ever
    reaches the driver."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", None)

    def canon(t: pa.Table) -> dict[str, np.ndarray]:
        return {
            "event_id": pc.cast(t.column("event_id"), pa.int64())
            .to_numpy().astype("U"),
            "ts": t.column("ts").cast(pa.int64()).to_numpy().astype("U"),
            "user_id": pc.cast(t.column("user_id"), pa.int64())
            .to_numpy().astype("U"),
            "event_type": np.asarray(t.column("event_type").to_pylist(),
                                     dtype=object),
            "value": _cents(np.asarray(t.column("value"))).astype("U"),
            "props": np.asarray(t.column("props").to_pylist(), dtype=object),
        }

    def melt_keys(t: pa.Table) -> pa.Table:
        cols, keys = [], []
        for name, vals in canon(t).items():
            u = np.unique(vals[vals != np.array(None)])
            cols.append(np.full(len(u), name, dtype=object))
            keys.append(u.astype(object))
        return pa.table({"col": pa.array(np.concatenate(cols), pa.string()),
                         "key": pa.array(np.concatenate(keys), pa.string())})

    def tallies(t: pa.Table) -> pa.Table:
        names = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        return pa.table(
            {"col": pa.array(names, pa.string()),
             "n_rows": pa.array([t.num_rows] * len(names), pa.int64()),
             "n_null": pa.array([t.column(n).null_count for n in names],
                                pa.int64())})

    distinct = grouped_aggregate(
        ds.map_batches(melt_keys, batch_format="pyarrow"),
        ["col", "key"], Count(alias_name="_n"))
    n_distinct = grouped_aggregate(
        distinct.map_batches(
            lambda t: pa.table({"col": t.column("col"),
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["col"], Sum("one", alias_name="n_distinct")).to_pandas()
    tally = grouped_aggregate(
        ds.map_batches(tallies, batch_format="pyarrow"),
        ["col"], Sum("n_rows", alias_name="n_rows"),
        Sum("n_null", alias_name="n_null")).to_pandas()

    out = tally.merge(n_distinct, on="col").sort_values("col")
    return pa.table(
        {"col": pa.array(out["col"], pa.string()),
         "n_rows": pa.array(out["n_rows"].astype("int64")),
         "n_null": pa.array(out["n_null"].astype("int64")),
         "n_distinct": pa.array(out["n_distinct"].astype("int64"))})


_VOWEL_RUNS = re.compile(r"[aeiouy]+")
_SENT_ENDS = re.compile(r"[.!?]+")


def q_readability(sf_dir: str):
    """Flesch-style readability per document in integer milli-points —
    the classic curation quality gate alongside `quality`'s ratio checks.
    All three inputs are integer counts from compiled regexes (words =
    alnum runs, sentences = terminal-punctuation runs clamped ≥ 1,
    syllables ≈ vowel runs), and the score composes with integer floor
    divisions only: 206835 − 1015·W//S − 84600·Y//W — no float, so the
    value is engine-exact. Pure row-local map, ZERO shuffle."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        words, sents, sylls, scores = [], [], [], []
        for txt in t.column("text").to_pylist():
            low = (txt or "").lower()
            w = len(_ALNUM.findall(low))
            s = max(len(_SENT_ENDS.findall(low)), 1)
            y = len(_VOWEL_RUNS.findall(low))
            wc = max(w, 1)
            words.append(w)
            sents.append(s)
            sylls.append(y)
            scores.append(206_835 - (1_015 * w) // s - (84_600 * y) // wc)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_words": pa.array(words, pa.int64()),
             "n_sents": pa.array(sents, pa.int64()),
             "n_sylls": pa.array(sylls, pa.int64()),
             "flesch_milli": pa.array(scores, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def q_events_calendar(sf_dir: str):
    """Calendar-dimension histogram: event counts and value sums by
    (day-of-week, hour-of-day) — the seasonality heatmap. Day-of-week is
    computed engine-neutrally as (epoch_day + 4) % 7 (0 = Sunday; no
    reliance on either engine's locale-dependent DOW function), hour as
    (epoch_s // 3600) % 24 — both from the same integer µs timestamps.
    Per-batch partials → one ≤ 168-row aggregate at any scale."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        dow = ((us // 86_400_000_000 + 4) % 7).astype(np.int64)
        hour = ((us // 3_600_000_000) % 24).astype(np.int64)
        df = pd.DataFrame({"dow": dow, "hour": hour,
                           "n": np.ones(len(us), np.int64),
                           "value_cents": _cents(np.asarray(t.column("value")))})
        g = df.groupby(["dow", "hour"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dow", "hour"],
        Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))


_ACTIVE_WINDOW_S = 300


def q_user_active_seconds(sf_dir: str):
    """INTERVAL UNION per user: each event opens a 300 s activity window
    [ts, ts+300); the metric is the total length of the union of those
    intervals and the number of disjoint islands — billing/engagement time
    that double-counts nothing however bursty the events. Plan: narrow
    (user, epoch-s) rows, coarse user-hash buckets, and a vectorized sweep
    inside the bucket: sort by start, island starts where start > running
    max of previous ends (cummax shifted by one), then per-island
    max(end) − min(start) sums per user. Finished user rows leave the
    bucket — one narrow shuffle total."""
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "events", ["user_id", "ts"])
    P = _compact_blocks()
    W = _ACTIVE_WINDOW_S

    def narrow(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        s = (t.column("ts").cast(pa.int64()).to_numpy()
             // 1_000_000).astype(np.int64)
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "s": pa.array(s, pa.int64()),
                         "__part": pa.array(uid % P, pa.int64())})

    def bucket_union(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "s"])
        uid = g["user_id"].to_numpy()
        start = g["s"].to_numpy()
        end = start + W
        # fixed window ⇒ end is monotone within each (sorted) user, so the
        # running max of previous ends is simply the previous row's end —
        # and it must NOT accumulate across user boundaries
        prev_end = np.empty_like(end)
        prev_end[0] = np.iinfo(np.int64).min
        prev_end[1:] = end[:-1]
        new_user = np.empty(len(uid), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        island = np.cumsum(new_user | (start > prev_end))
        df = pd.DataFrame({"user_id": uid, "island": island,
                           "start": start, "end": end})
        isl = df.groupby(["user_id", "island"], as_index=False).agg(
            lo=("start", "min"), hi=("end", "max"))
        isl["len"] = isl["hi"] - isl["lo"]
        out = isl.groupby("user_id", as_index=False).agg(
            active_s=("len", "sum"), n_islands=("len", "size"))
        return out.astype({"user_id": "int64", "active_s": "int64",
                           "n_islands": "int64"})

    return (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(bucket_union, batch_format="pandas")
    )


def q_embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION statistics of the embedding vector column — the
    whitening / feature-normalization precompute (mean and second moment
    per dim) every ANN index build runs first. The list<float> column is
    unnested BATCH-LOCALLY into a (dim, Σq, Σq², n) partial per batch
    (matrix reshape, no per-row Python), so the exchange is dim-sized
    however many vectors stream through; values quantize with kmeans'
    exact grid (floor((x+1)·10⁶) — functions/kmeans.py) so the sums are
    integer-exact and engine-comparable. mean_q = Σq // n."""
    from ..functions.kmeans import KM_OFFSET, KM_SCALE
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "sqq": pa.array([], pa.int64())})
        q = np.floor((mat + KM_OFFSET) * KM_SCALE).astype(np.int64)
        return pa.table(
            {"dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
             "n": pa.array(np.full(q.shape[1], q.shape[0], np.int64)),
             "sq": pa.array(q.sum(axis=0), pa.int64()),
             "sqq": pa.array((q * q).sum(axis=0), pa.int64())})

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"], Sum("n", alias_name="n"), Sum("sq", alias_name="sq"),
        Sum("sqq", alias_name="sqq"))
    return agg.map_batches(
        lambda t: pa.table(
            {"dim": pc.cast(t.column("dim"), pa.int64()),
             "n": pc.cast(t.column("n"), pa.int64()),
             "sum_q": pc.cast(t.column("sq"), pa.int64()),
             "sum_qq": pc.cast(t.column("sqq"), pa.int64()),
             "mean_q": pa.array(
                 pc.cast(t.column("sq"), pa.int64()).to_numpy()
                 // pc.cast(t.column("n"), pa.int64()).to_numpy(),
                 pa.int64())}),
        batch_format="pyarrow")


def q_graph_sssp(sf_dir: str):
    """Weighted shortest-path distances (≤ 3 relaxations, bounded
    Bellman–Ford) from the minimal node over the co-purchase graph with
    inverse-strength integer edge costs (10⁶ // n) — the KG relatedness
    metric unit-hop khop can't express: two strong links beat one weak
    one (functions/graph.sssp_distances). Oracle = 3 unrolled min-plus
    SQL rounds."""
    from ..functions.graph import sssp_distances

    return sssp_distances(_graph_edges(sf_dir, min_n=2).materialize(), k=3)


def _sssp_sql(n_iters: int = 3) -> str:
    """Unrolled bounded Bellman–Ford replicating functions/graph.
    sssp_distances: d₀ = {seed: 0}; dₖ₊₁(v) = min over incoming (incl. the
    0-cost self-loop) of dₖ(u) + w(u,v), w = 10⁶ // n."""
    parts = [f"""ed AS (SELECT u, v, n FROM ({_co_edges_sql(2)})),
    nodes AS (SELECT DISTINCT u AS node FROM ed
              UNION SELECT DISTINCT v FROM ed),
    e AS (SELECT u AS src, v AS dst, 1000000 // n AS w FROM ed
          UNION ALL SELECT v, u, 1000000 // n FROM ed
          UNION ALL SELECT node, node, 0 FROM nodes),
    d0 AS (SELECT MIN(u) AS node, 0 AS d FROM ed)"""]
    for r in range(1, n_iters + 1):
        parts.append(f"""d{r} AS (
        SELECT e.dst AS node, MIN(p.d + e.w) AS d
        FROM e JOIN d{r - 1} p ON p.node = e.src GROUP BY 1)""")
    return ("WITH " + ",\n    ".join(parts)
            + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(d AS BIGINT) AS dist
    FROM d{n_iters}""")


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


_SNM_WINDOW = 4


def q_sorted_neighborhood(sf_dir: str):
    """SORTED NEIGHBORHOOD METHOD pair generation (Hernández–Stolfo) —
    the sort-based ER blocking alternative to LSH/meta-blocking: rows are
    ranked by a sort key and every pair within a sliding window of w = 4
    becomes a match candidate. Distributed WITHOUT a global sort: the sort
    key packs each part name's first 8 bytes big-endian into an int64
    (SQL-replicable), range-partitioned global_rank assigns positions, and
    each row lands in OVERLAPPING TILES rank//w and rank//w + 1 — any pair
    closer than w shares a tile (⌊ra/w⌋ and ⌊rb/w⌋ differ by ≤ 1), so
    within-tile vectorized pairing finds every candidate with 2×
    replication and O(w·rows) pair work; a distinct aggregate drops the
    tile-overlap duplicates. Emits (id_a, id_b) with id_a the lower-ranked
    row's key."""
    from ..functions.rank import global_rank
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "part", ["p_partkey", "p_name"])
    w = _SNM_WINDOW

    def keyed(t: pa.Table) -> pa.Table:
        keys = []
        for s in t.column("p_name").to_pylist():
            b = (s or "").encode("utf-8")[:8].ljust(8, b"\x01")
            keys.append(int.from_bytes(b, "big") >> 1)  # keep in int64
        return pa.table({"p_partkey": pc.cast(t.column("p_partkey"),
                                              pa.int64()),
                         "sk": pa.array(keys, pa.int64())})

    ranked = global_rank(ds.map_batches(keyed, batch_format="pyarrow"),
                         "sk", "p_partkey", descending=False, n_buckets=32)

    def tiles(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"tile": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64"),
                                 "p_partkey": pd.Series([], dtype="int64")})
        r = df["rank"].to_numpy(dtype=np.int64)
        pk = df["p_partkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"tile": np.concatenate([r // w, r // w + 1]),
             "rank": np.concatenate([r, r]),
             "p_partkey": np.concatenate([pk, pk])}).astype("int64")

    def tile_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="tile", suffixes=("_a", "_b"))
        m = m[(m["rank_a"] < m["rank_b"])
              & (m["rank_b"] - m["rank_a"] < w)]
        if m.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": m["p_partkey_a"].astype("int64"),
                             "id_b": m["p_partkey_b"].astype("int64")})

    pairs = (
        ranked.map_batches(tiles, batch_format="pandas")
        .groupby("tile")
        .map_groups(tile_pairs, batch_format="pandas")
    )
    dd = grouped_aggregate(pairs, ["id_a", "id_b"], Count(alias_name="_n"))
    return dd.map_batches(
        lambda t: pa.table({"id_a": pc.cast(t.column("id_a"), pa.int64()),
                            "id_b": pc.cast(t.column("id_b"), pa.int64())}),
        batch_format="pyarrow")


def _snm_sql(w: int = _SNM_WINDOW) -> str:
    """DuckDB replication of q_sorted_neighborhood: identical big-endian
    8-byte packed sort key (>> 1 keeps it in int64; ASCII names, chr(1)
    pad), row_number over (key, partkey), self-join on rank distance < w."""
    expr = "CAST(0 AS HUGEINT)"
    for i in range(1, 9):
        expr = (f"({expr} * 256 + ord(substr(rpad(p_name, 8, chr(1)), "
                f"{i}, 1)))")
    return f"""
        WITH k AS (SELECT p_partkey,
                          CAST({expr} // 2 AS BIGINT) AS sk FROM part),
        r AS (SELECT p_partkey, sk,
                     row_number() OVER (ORDER BY sk, p_partkey) AS rk
              FROM k)
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < {w}
    """


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


_DEBOUNCE_S = 60


def q_events_debounced(sf_dir: str):
    """DEBOUNCE / throttle dedup: an event is kept iff the previous event
    of the same (user, type) is more than 60 s older — the stream-hygiene
    filter that collapses double-clicks and retry storms before counting
    anything. Per-batch narrow projection, coarse user-hash buckets, one
    vectorized (user, type, ts, id)-ordered lag inside the bucket; emits
    kept event ids + per-type kept counts are left to consumers. Ties
    (identical ts) order by event_id, so exactly one of an identical
    burst survives per window."""
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    P = _compact_blocks()

    def narrow(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return pa.table(
            {"event_id": pc.cast(t.column("event_id"), pa.int64()),
             "user_id": pa.array(uid, pa.int64()),
             "event_type": t.column("event_type"),
             "s": pa.array(t.column("ts").cast(pa.int64()).to_numpy()
                           // 1_000_000, pa.int64()),
             "__part": pa.array(uid % P, pa.int64())})

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "s", "event_id"])
        prev = (g.groupby(["user_id", "event_type"], sort=False)["s"]
                .shift())
        keep = prev.isna() | (g["s"] - prev > _DEBOUNCE_S)
        out = g.loc[keep, ["event_id", "user_id", "event_type", "s"]]
        return out.astype({"event_id": "int64", "user_id": "int64",
                           "s": "int64"})

    return (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(debounce, batch_format="pandas")
    )


def q_user_time_weighted_value(sf_dir: str):
    """TIME-WEIGHTED average value per user — each event's value holds
    until the next event, so the mean is Σ(value·Δt) / ΣΔt (the financial
    TWAP / metrics-gauge integral), not the naive row mean that a bursty
    sampler biases. Exact integers end to end: per-user ordered lead
    inside coarse buckets → Σ cents·Δs and ΣΔs partial per user (the last
    event has no successor and is excluded on both sides), final
    twav_cents = Σ(v·Δt) // ΣΔt. One narrow shuffle; finished user rows
    leave the bucket."""
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    P = _compact_blocks()

    def narrow(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return pa.table(
            {"user_id": pa.array(uid, pa.int64()),
             "event_id": pc.cast(t.column("event_id"), pa.int64()),
             "s": pa.array(t.column("ts").cast(pa.int64()).to_numpy()
                           // 1_000_000, pa.int64()),
             "v": pa.array(_cents(np.asarray(t.column("value"))), pa.int64()),
             "__part": pa.array(uid % P, pa.int64())})

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "s", "event_id"])
        nxt = g.groupby("user_id", sort=False)["s"].shift(-1)
        dt = (nxt - g["s"]).fillna(0).astype("int64")
        w = g["v"].to_numpy() * dt.to_numpy()
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                           "wsum": w, "tsum": dt.to_numpy()})
        out = df.groupby("user_id", as_index=False).sum()
        out = out[out["tsum"] > 0]
        out["twav_cents"] = out["wsum"] // out["tsum"]
        return out[["user_id", "wsum", "tsum", "twav_cents"]].astype("int64")

    return (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(twa, batch_format="pandas")
    )


def q_graph_assortativity(sf_dir: str):
    """DEGREE ASSORTATIVITY of the co-purchase graph — do hubs link to
    hubs (r > 0) or to leaves (r < 0)? The KG topology diagnostic read
    before choosing hub-salting strategy. Exact rational arithmetic with
    NO sqrt: over the symmetrized edge list the src- and dst-degree
    distributions are identical, so Pearson's denominator √(dx·dy) = dx
    and r = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²) exactly — emitted as
    assort_ppm = trunc(10⁶·num/den) plus the raw big-int moments.
    Distributed shape: degree table attached to both endpoints via two
    partitioned hash joins (never broadcast), five int64 Sum partials per
    batch, big-int finish on one row."""
    from ..functions.graph import degree_table
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    edges = _graph_edges(sf_dir, min_n=2).materialize()
    deg = degree_table(edges)

    def sym(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("u"), pa.int64()).to_numpy()
        v = pc.cast(t.column("v"), pa.int64()).to_numpy()
        return pa.table(
            {"src": pa.array(np.concatenate([u, v]), pa.int64()),
             "dst": pa.array(np.concatenate([v, u]), pa.int64())})

    s = edges.map_batches(sym, batch_format="pyarrow")
    du = deg.map_batches(
        lambda t: pa.table({"src": pc.cast(t.column("node"), pa.int64()),
                            "du": pc.cast(t.column("degree"), pa.int64())}),
        batch_format="pyarrow")
    dv = deg.map_batches(
        lambda t: pa.table({"dst": pc.cast(t.column("node"), pa.int64()),
                            "dv": pc.cast(t.column("degree"), pa.int64())}),
        batch_format="pyarrow")
    both = hash_join(hash_join(s, du, on=("src",)), dv, on=("dst",))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"g": pd.Series([], dtype="int64"),
                                 **{c: pd.Series([], dtype="int64")
                                    for c in ("n", "sx", "sy", "sxy", "sxx")}})
        x = df["du"].to_numpy(dtype=np.int64)
        y = df["dv"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"g": [0], "n": [len(x)], "sx": [int(x.sum())],
                             "sy": [int(y.sum())], "sxy": [int((x * y).sum())],
                             "sxx": [int((x * x).sum())]})

    agg = grouped_aggregate(
        both.map_batches(moments, batch_format="pandas"), ["g"],
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx")).to_pandas()
    n, sx, sy, sxy, sxx = (int(agg["n"][0]), int(agg["sx"][0]),
                           int(agg["sy"][0]), int(agg["sxy"][0]),
                           int(agg["sxx"][0]))
    num = 1_000_000 * (n * sxy - sx * sy)
    den = n * sxx - sx * sx
    ppm = -((-num) // den) if (num < 0) != (den < 0) else abs(num) // abs(den)
    return pa.table({"n_directed_edges": pa.array([n], pa.int64()),
                     "assort_num": pa.array([n * sxy - sx * sy]),
                     "assort_den": pa.array([den], pa.int64()),
                     "assort_ppm": pa.array([ppm], pa.int64())})


def q_graph_lpa(sf_dir: str):
    """Synchronous label-propagation communities on the co-purchase graph
    (3 rounds, deterministic max-count-then-min-label update) →
    (node, lab) — the entity-cluster refiner that splits CC chains whose
    junction nodes hear a different majority (functions/graph.
    label_propagation). Replicated by 3 unrolled SQL rounds of
    count + row_number argmax."""
    from ..functions.graph import label_propagation

    return label_propagation(_graph_edges(sf_dir, min_n=2).materialize(),
                             n_iters=3)


def _lpa_sql(n_iters: int = 3) -> str:
    """Unrolled synchronous LPA replicating functions/graph.
    label_propagation: labₖ₊₁(x) = argmax_ℓ neighbor-label count, ties →
    min ℓ (ORDER BY c DESC, lab)."""
    parts = [f"""ed AS (SELECT u, v FROM ({_co_edges_sql(2)})),
    e AS (SELECT u AS src, v AS dst FROM ed
          UNION ALL SELECT v AS src, u AS dst FROM ed),
    l0 AS (SELECT node, node AS lab FROM
             (SELECT DISTINCT u AS node FROM ed
              UNION SELECT DISTINCT v FROM ed))"""]
    for r in range(1, n_iters + 1):
        parts.append(f"""c{r} AS (
        SELECT e.dst AS node, l.lab, COUNT(*) AS c
        FROM e JOIN l{r - 1} l ON l.node = e.src GROUP BY 1, 2),
    l{r} AS (SELECT node, lab FROM (
          SELECT node, lab, row_number() OVER
            (PARTITION BY node ORDER BY c DESC, lab) AS rn FROM c{r})
        WHERE rn = 1)""")
    return ("WITH " + ",\n    ".join(parts)
            + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS lab
    FROM l{n_iters}""")


# --------------------------------------------------------------------------

def _ts_us(s: str) -> int:
    """Epoch µs of an ISO date — deterministic, engine-neutral (the SQL side
    compares against TIMESTAMP literals; both resolve to the same instant)."""
    return int(np.datetime64(s, "us").astype(np.int64))


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


def q_graph_clustering(sf_dir: str):
    """Per-node LOCAL clustering coefficient over the min_n=2 co-purchase
    graph: cc = triangles(v) / C(deg(v), 2), reported as exact trunc-division
    ppm (no float ratio — hash-exact in both engines). Per-node triangle
    counts come from functions/graph.local_triangle_table — the per-vertex
    refinement of the oriented wedge-match plan, where each matched wedge
    credits its apex locally and its two endpoints decoded from the matched
    uint64 pair key, folded by a per-bucket np.unique combiner so the
    exchange is one row per (bucket, node), never per triangle. The degree
    side LEFT-joins the (sparse) triangle table to zero-fill
    triangle-free nodes; wedges(v) = deg·(deg−1)/2 is row-local."""
    from ..functions.graph import degree_table, local_triangle_table
    from ..stages.joins import hash_join

    edges = _graph_edges(sf_dir, min_n=2).materialize()
    schema = pa.schema([("node", pa.int64()), ("degree", pa.int64()),
                        ("n_tri", pa.int64()), ("cc_ppm", pa.int64())])
    if edges.count() == 0:
        return schema.empty_table()
    degs = degree_table(edges)
    tri = local_triangle_table(edges)
    joined = (hash_join(degs, tri, on=("node",), how="left")
              if tri.count() else degs.map_batches(
                  lambda t: t.append_column(
                      "tri", pa.array(np.zeros(t.num_rows, np.int64))),
                  batch_format="pyarrow"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "degree": pd.Series([], dtype="int64"),
                                 "n_tri": pd.Series([], dtype="int64"),
                                 "cc_ppm": pd.Series([], dtype="int64")})
        deg = df["degree"].to_numpy(dtype=np.int64)
        tri_n = (df["tri"].fillna(0).to_numpy(dtype=np.float64)
                 .astype(np.int64) if "tri" in df.columns
                 else np.zeros(len(deg), np.int64))
        wedges = deg * (deg - 1) // 2
        cc = np.where(wedges > 0, tri_n * 1_000_000 // np.maximum(wedges, 1), 0)
        return pd.DataFrame({"node": df["node"].to_numpy(dtype=np.int64),
                             "degree": deg, "n_tri": tri_n, "cc_ppm": cc})

    return joined.map_batches(finish, batch_format="pandas")


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


_WALK_STEPS = 3
_WALK_P = 1_000_000_007
_WALK_A, _WALK_B, _WALK_C = 73_856_093, 19_349_663, 83_492_791


def _walk_hash(start: np.ndarray, cur: np.ndarray, step: int) -> np.ndarray:
    """Deterministic next-hop selector — multiply/add/mod only, so the SQL
    oracle replicates it bit-for-bit (no xor/rotate, which SQL dialects
    disagree on). int64-safe for 32-bit node ids: max term ≈ 2³²·8.3e7 ≪
    2⁶³."""
    return (start * _WALK_A + cur * _WALK_B + step * _WALK_C) % _WALK_P


def q_graph_walks(sf_dir: str, *, degree_broadcast_threshold: int = 5_000_000):
    """Deterministic random walks (node2vec-style corpus generation for KG /
    graph embeddings): from EVERY node of the min_n=2 co-purchase graph,
    a 3-step walk whose next hop is neighbors-sorted-ascending[h % deg]
    with h the replicable hash above — seeded by (start, cur, step), so
    walks diverge per walker and per step yet are independent of
    parallelism. Plan: the symmetric adjacency gets a per-node neighbor
    rank ONCE (map_groups by node — one task per node, bounded by max
    degree; a 10⁶-neighbor supernode is one task, the known cost of rank
    assignment); each step is then ONE partitioned hash join at WALKER
    cardinality — the hop index is computed row-locally from the degree map
    (broadcast once up to ``degree_broadcast_threshold`` nodes, the same
    gate as triangle_count's degree attach; a per-step hash_join against
    the degree table above it) and probes the adjacency on the packed
    (cur≪32)|rank key — never a per-neighbor fan-out. Output: the full
    trajectory table (start, step, node), steps 0..3."""
    from ..stages.canonicalize import data_partitions, grouped_aggregate
    from ..stages.joins import hash_join

    edges = _graph_edges(sf_dir, min_n=2).materialize()
    schema = pa.schema([("start", pa.int64()), ("step", pa.int64()),
                        ("node", pa.int64())])
    if edges.count() == 0:
        return schema.empty_table()
    # iterative plan ⇒ size the 2 joins/step from the DATA (the walk state
    # is node-sized): cluster-sized partitioning pays ~50ms/task × 6 joins
    # on kilobyte exchanges (the graph_sssp/k-core lesson)
    NP = data_partitions(edges.size_bytes())

    sym = edges.map_batches(
        lambda t: pa.table(
            {"node": pa.concat_arrays([
                pc.cast(t.column("u"), pa.int64()).combine_chunks(),
                pc.cast(t.column("v"), pa.int64()).combine_chunks()]),
             "nbr": pa.concat_arrays([
                pc.cast(t.column("v"), pa.int64()).combine_chunks(),
                pc.cast(t.column("u"), pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("nbr", kind="mergesort").reset_index(drop=True)
        g["r"] = np.arange(len(g), dtype=np.int64)
        return g

    adj = sym.groupby("node").map_groups(
        rank_group, batch_format="pandas").map_batches(
        lambda df: pd.DataFrame(
            {"ak": df["node"].to_numpy(np.int64) * (1 << 32)
                   + df["r"].to_numpy(np.int64),
             "nbr": df["nbr"].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    degs = grouped_aggregate(
        sym.map_batches(
            lambda t: pa.table(
                {"cur": t.column("node"),
                 "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}),
            batch_format="pyarrow"),
        ["cur"], Sum("one", alias_name="deg")).materialize()

    small = degs.count() <= degree_broadcast_threshold
    dref = (ray.put({int(r["cur"]): int(r["deg"]) for r in degs.take_all()})
            if small else None)
    # adjacency gate mirrors triangle_count's 2M-edge broadcast switch: the
    # ranked adjacency ships ONCE as two aligned int64 arrays (16 B/edge)
    # and each hop is a row-local searchsorted — 3 executions total; above
    # the gate every hop is a partitioned hash join on the packed key
    small_adj = small and edges.count() * 2 <= 2_000_000
    if small_adj:
        chunks = list(adj.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"))
        ak = np.concatenate([c.column("ak").to_numpy() for c in chunks])
        nb = np.concatenate([c.column("nbr").to_numpy() for c in chunks])
        order = np.argsort(ak)
        aref = ray.put((ak[order], nb[order]))

    state = degs.map_batches(
        lambda t: pa.table({"start": pc.cast(t.column("cur"), pa.int64()),
                            "cur": pc.cast(t.column("cur"), pa.int64())}),
        batch_format="pyarrow")
    traj = [state.map_batches(
        lambda t: pa.table({"start": t.column("start"),
                            "step": pa.array(np.zeros(t.num_rows, np.int64),
                                             pa.int64()),
                            "node": t.column("cur")}),
        batch_format="pyarrow")]

    for step in range(1, _WALK_STEPS + 1):
        def pick_key(t: pa.Table, _s=step) -> pa.Table:
            start = pc.cast(t.column("start"), pa.int64()).to_numpy()
            cur = pc.cast(t.column("cur"), pa.int64()).to_numpy()
            if "deg" in t.column_names:
                deg = pc.cast(t.column("deg"), pa.int64()).to_numpy()
            else:
                dm = ray.get(dref)
                deg = np.fromiter((dm[x] for x in cur), np.int64, len(cur))
            idx = _walk_hash(start, cur, _s) % deg
            return pa.table({"start": pa.array(start, pa.int64()),
                             "ak": pa.array(cur * (1 << 32) + idx, pa.int64())})

        with_deg = (state if small
                    else hash_join(state, degs, on=("cur",),
                                   num_partitions=NP))
        keyed = with_deg.map_batches(pick_key, batch_format="pyarrow")
        if small_adj:
            def hop_local(t: pa.Table) -> pa.Table:
                ks, nbs = ray.get(aref)
                q = pc.cast(t.column("ak"), pa.int64()).to_numpy()
                pos = np.searchsorted(ks, q)  # every key exists by invariant
                return pa.table(
                    {"start": pc.cast(t.column("start"), pa.int64()),
                     "cur": pa.array(nbs[pos], pa.int64())})

            state = keyed.map_batches(hop_local,
                                      batch_format="pyarrow").materialize()
        else:
            hopped = hash_join(keyed, adj, on=("ak",), num_partitions=NP)
            state = hopped.map_batches(
                lambda t: pa.table(
                    {"start": pc.cast(t.column("start"), pa.int64()),
                     "cur": pc.cast(t.column("nbr"), pa.int64())}),
                batch_format="pyarrow").materialize()
        traj.append(state.map_batches(
            lambda t, _s=step: pa.table(
                {"start": t.column("start"),
                 "step": pa.array(np.full(t.num_rows, _s, np.int64), pa.int64()),
                 "node": t.column("cur")}),
            batch_format="pyarrow"))

    out = traj[0]
    for t in traj[1:]:
        out = out.union(t)
    return out


_MIX_TARGET = 50


def q_temperature_mix(sf_dir: str):
    """Temperature-weighted data mixing (α = 1/2): per-source sampling quotas
    ∝ √n_s — the standard move to up-weight small sources in a training mix —
    with EXACT integer square roots (math.isqrt in the engine; the SQL oracle
    corrects FLOOR(SQRT(·)) by ±1 against the integer squares, so the two
    agree even where float sqrt rounds across a perfect-square boundary).
    Quotas are q_s = TARGET·w_s // Σw (trunc division, no float shares);
    selection inside each source is the deterministic smallest-md5(doc_id)
    rank — per-batch partial top-max(q) caps the shuffle at quota rows per
    (batch, source), so selection never ships a source's full slice. The
    source-count table (take_all) is mix-config-sized, not corpus-sized."""
    import hashlib
    import math

    counts = _gagg(
        _rp(sf_dir, "documents", ["source"]).map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({"source": t.column("source").to_pylist()})
                .groupby("source", as_index=False).size()
                .rename(columns={"size": "n"}), preserve_index=False),
            batch_format="pyarrow"),
        "source", Sum("n", alias_name="n")).take_all()
    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])
    if not counts:
        return schema.empty_table()
    w = {r["source"]: math.isqrt(int(r["n"])) for r in counts}
    tw = sum(w.values()) or 1
    quota = {s: _MIX_TARGET * ws // tw for s, ws in w.items()}
    qref = ray.put(quota)
    qmax = max(quota.values())

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        df = pd.DataFrame(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()).to_numpy(),
             "source": t.column("source").to_pylist()})
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest()
                   for i in df["doc_id"]]
        df = (df.sort_values(["source", "h", "doc_id"])
              .groupby("source", as_index=False).head(max(qmax, 1)))
        df = df[df["source"].map(q).fillna(0) > 0]
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        q = int(ray.get(qref).get(g["source"].iloc[0], 0))
        g = g.sort_values(["h", "doc_id"]).head(q)
        return g[["doc_id", "source"]].astype({"doc_id": "int64"})

    kept = (_rp(sf_dir, "documents", ["doc_id", "source"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("source").map_groups(final, batch_format="pandas"))
    return _nonempty_or_empty_table(kept, schema)


_MKNN_K = 3
_MKNN_SCALE = 10_000


def q_mutual_knn(sf_dir: str, *, broadcast_limit: int = 100_000):
    """Reciprocal nearest neighbors — the high-precision near-dup / ER
    primitive (a pair survives only if EACH is in the other's top-k):
    mutual top-3 by inner product over integer-scaled embeddings
    (floor(v·10⁴) — dots stay < 2⁶³ AND < 2⁵³, so numpy int64 matmul and
    DuckDB's float-accumulated list_dot_product are both exact, making an
    approximate-looking op hash-checkable). Plan: the scaled matrix
    broadcasts once below ``broadcast_limit`` vectors and every batch
    computes its own top-k with one integer matmul (ties: higher dot, then
    smaller id — replicated as ROW_NUMBER ORDER BY dot DESC, dst); directed
    edges pack into unordered pair keys and the mutual filter is a pair
    groupby with count = 2. Mutual-kNN is inherently quadratic — above the
    limit the corpus must be blocked first (the knn_ivf / embedding_neardup
    path), so the gate raises rather than silently shuffling n² rows."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("dot", pa.int64())])
    n = ds.count()
    if n == 0:
        return schema.empty_table()
    if n > broadcast_limit:
        raise ValueError(
            f"mutual_knn is quadratic: {n} vectors > broadcast_limit="
            f"{broadcast_limit}; block first (knn_ivf / embedding_neardup)")

    ids_chunks, mat_chunks = [], []
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids_chunks.append(pc.cast(b.column("vec_id"), pa.int64()).to_numpy())
        emb = np.stack([np.asarray(x, dtype=np.float64)
                        for x in b.column("embedding").to_pylist()])
        mat_chunks.append(np.floor(emb * _MKNN_SCALE).astype(np.int64))
    ids = np.concatenate(ids_chunks)
    mat = np.concatenate(mat_chunks)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    mref = ray.put((ids, mat))

    def topk(t: pa.Table) -> pa.Table:
        all_ids, m = ray.get(mref)
        bids = pc.cast(t.column("vec_id"), pa.int64()).to_numpy()
        bemb = np.stack([np.asarray(x, dtype=np.float64)
                         for x in t.column("embedding").to_pylist()])
        bm = np.floor(bemb * _MKNN_SCALE).astype(np.int64)
        scores = bm @ m.T  # exact: |dot| ≤ 64·(2·10⁵)² ≪ 2⁶³
        self_pos = np.searchsorted(all_ids, bids)
        # min+1, NOT min: the top-k sort negates scores, and -INT64_MIN
        # overflows back to INT64_MIN, which would rank self FIRST
        scores[np.arange(len(bids)), self_pos] = np.iinfo(np.int64).min + 1
        # top-k by (dot DESC, id ASC): lexsort on (-scores, ids)
        srcs, dsts, dots = [], [], []
        for i in range(len(bids)):
            ordr = np.lexsort((all_ids, -scores[i]))[:_MKNN_K]
            srcs.append(np.full(_MKNN_K, bids[i], np.int64))
            dsts.append(all_ids[ordr])
            dots.append(scores[i][ordr])
        return pa.table({"src": pa.array(np.concatenate(srcs), pa.int64()),
                         "dst": pa.array(np.concatenate(dsts), pa.int64()),
                         "dot": pa.array(np.concatenate(dots), pa.int64())})

    directed = ds.map_batches(topk, batch_format="pyarrow")

    def pack(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("src"), pa.int64()).to_numpy()
        d = pc.cast(t.column("dst"), pa.int64()).to_numpy()
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"pk": pa.array(lo * (1 << 32) + hi, pa.int64()),
                         "one": pa.array(np.ones(len(s), np.int64), pa.int64()),
                         "dot": t.column("dot")})

    pairs = _gagg(directed.map_batches(pack, batch_format="pyarrow"),
                  "pk", Sum("one", alias_name="cnt"),
                  Max("dot", alias_name="dot"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.cast(t.column("cnt"), pa.int64()), 2))
        pk = pc.cast(t.column("pk"), pa.int64()).to_numpy()
        return pa.table({"a": pa.array(pk >> 32, pa.int64()),
                         "b": pa.array(pk & 0xFFFFFFFF, pa.int64()),
                         "dot": pc.cast(t.column("dot"), pa.int64())})

    return _nonempty_or_empty_table(
        pairs.map_batches(finish, batch_format="pyarrow"), schema)


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


def q_events_cusum(sf_dir: str):
    """CUSUM change-point detection on the daily event count — the
    sequential drift detector (S_t = max(0, S_{t-1} + x_t − μ̂), μ̂ = the
    trunc-mean daily count, all integer-exact). Counting is fully
    distributed (per-batch day partials → day-sized aggregate); the
    recurrence itself is inherently sequential, so it walks the DAY table
    on the driver — timeline-sized (≤ tens of thousands of rows for
    decades of data), bounded by the calendar and not by corpus size, the
    same contract as value_median's histogram walk. Output: every day with
    its count and CUSUM statistic."""
    from ..stages.canonicalize import grouped_aggregate

    daily = grouped_aggregate(
        _rp(sf_dir, "events", ["ts"]).map_batches(
            lambda t: (lambda d: pa.Table.from_pandas(
                pd.DataFrame({"day": d}).groupby("day", as_index=False)
                .size().rename(columns={"size": "n"}), preserve_index=False))(
                pc.cast(t.column("ts"), pa.int64()).to_numpy()
                // 86_400_000_000),
            batch_format="pyarrow"),
        ["day"], Sum("n", alias_name="n")).take_all()
    schema = pa.schema([("day", pa.int64()), ("n", pa.int64()),
                        ("cusum", pa.int64())])
    if not daily:
        return schema.empty_table()
    rows = sorted((int(r["day"]), int(r["n"])) for r in daily)
    mu = sum(n for _, n in rows) // len(rows)
    out_day, out_n, out_s = [], [], []
    s = 0
    for day, n in rows:
        s = max(0, s + n - mu)
        out_day.append(day), out_n.append(n), out_s.append(s)
    return pa.table({"day": pa.array(out_day, pa.int64()),
                     "n": pa.array(out_n, pa.int64()),
                     "cusum": pa.array(out_s, pa.int64())})


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


def q_bpe_pair_counts(sf_dir: str):
    """BPE tokenizer training, round 1 — the top-20 adjacent character
    pairs (with the ``</w>`` end-of-word marker) weighted by corpus word
    frequency. The corpus collapses ONCE to the word vocabulary (Heaps'-law
    small), pairs partial-count per batch of the vocabulary, and the global
    pair table is character-alphabet² rows — trivially collectable at any
    corpus size. Ties break (count desc, left asc, right asc)."""
    from ..functions.bpe import _split_word, pair_counts, word_vocab

    vocab = word_vocab(_rp(sf_dir, "documents", ["text"]), "text",
                       _ALNUM).map_batches(
        lambda t: pa.table(
            {"symbols": pa.array([_split_word(w) for w in
                                  t.column("word").to_pylist()],
                                 pa.list_(pa.string())),
             "n": pc.cast(t.column("n"), pa.int64())}),
        batch_format="pyarrow")
    rows = pair_counts(vocab).take_all()
    rows.sort(key=lambda r: (-r["pair_count"], r["left"], r["right"]))
    top = rows[:20]
    return pa.table(
        {"left": pa.array([r["left"] for r in top], pa.string()),
         "right": pa.array([r["right"] for r in top], pa.string()),
         "pair_count": pa.array([int(r["pair_count"]) for r in top],
                                pa.int64())})


def q_bpe_merges(sf_dir: str):
    """Eight full BPE merge rounds over the corpus vocabulary — the
    iterative trainer (functions/bpe.train_bpe): per round a vocabulary-
    dataset pair count, a one-row global argmax, and a broadcast merge
    applied map-side. Not ANSI-SQL-expressible (each round's symbol
    sequences depend on the previous argmax); parity is pinned by
    tests/test_round3_ops.py against an independent single-process BPE
    reference, and determinism by the harness rerun."""
    from ..functions.bpe import train_bpe

    return train_bpe(_rp(sf_dir, "documents", ["text"]), "text", _ALNUM, 8)


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


def _pii_contact_text(t: pa.Table) -> pa.Table:
    """(c_custkey, text) with deterministic PII-bearing contact strings.

    The testdata tables carry no real PII (documents.text is digit-free), so
    the PII family exercises its regex kernels on text CONSTRUCTED from
    customer keys — integer-exact arithmetic shared verbatim with the SQL
    oracle, with the PII shape varying by c_custkey % 3 (email+phone / IPv4 /
    none) so redaction is non-uniform."""
    ks = pc.cast(t.column("c_custkey"), pa.int64()).to_pylist()
    names = t.column("c_name").to_pylist()
    segs = t.column("c_mktsegment").to_pylist()
    texts = []
    for k, nm, sg in zip(ks, names, segs):
        m = k % 3
        if m == 0:
            texts.append(
                f"reach {nm} at cust{k}@example.com or "
                f"555-{(k * 7) % 1000:03d}-{(k * 13) % 10000:04d}")
        elif m == 1:
            texts.append(
                f"{nm} logged in from 10.{k % 256}.{(k // 256) % 256}."
                f"{k % 250} while browsing {sg}")
        else:
            texts.append(f"no contact on file for {nm} in {sg}")
    return pa.table({"c_custkey": pa.array(ks, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def q_pii_redact(sf_dir: str):
    """PII scrubbing — the pre-training curation stage (ROOTS / Dolma
    position: after dedup, before tokenization) the reference's
    already-anonymized CoNLL corpus never needed. Emails, NANP phone
    numbers and IPv4 addresses are replaced with typed placeholders and
    counted per row by functions/pii.py's vectorized RE2 kernels
    (pyarrow.compute.replace_substring_regex / count_substring_regex — one
    C++ pass per pattern over the whole column, zero Python per row). Pure
    row-local map, NO shuffle, NO state: at 100 TB it pipelines inside
    whatever pass already reads the text. DuckDB's regexp functions are the
    same RE2 engine, so the oracle replicates the kernel exactly.
    Output: (c_custkey, redacted, n_email, n_phone, n_ipv4)."""
    from ..functions.pii import pii_counts, redact

    ds = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def fn(t: pa.Table) -> pa.Table:
        built = _pii_contact_text(t)
        text = built.column("text")
        cols = {"c_custkey": built.column("c_custkey"),
                "redacted": redact(text)}
        cols.update(pii_counts(text))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def q_pii_stats(sf_dir: str):
    """Corpus-level PII audit over the same constructed contact text: per
    PII type, how many rows contain it and how many total occurrences — the
    go/no-go report a curation run publishes before releasing a corpus.
    Counts partial-aggregate per batch (3 rows out per batch regardless of
    batch size), then a 3-group groupby finishes — shuffle traffic is
    O(batches), not O(rows). Output: (pii_type, n_docs, n_hits)."""
    from ..functions.pii import pii_counts

    ds = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        text = _pii_contact_text(t).column("text")
        counts = pii_counts(text)
        types, docs, hits = [], [], []
        for tag in ("email", "phone", "ipv4"):
            c = counts[f"n_{tag}"].to_numpy(zero_copy_only=False)
            types.append(tag)
            docs.append(int((c > 0).sum()))
            hits.append(int(c.sum()))
        return pa.table({"pii_type": pa.array(types, pa.string()),
                         "n_docs": pa.array(docs, pa.int64()),
                         "n_hits": pa.array(hits, pa.int64())})

    return _gagg(ds.map_batches(partial, batch_format="pyarrow"),
                 "pii_type",
                 Sum("n_docs", alias_name="n_docs"),
                 Sum("n_hits", alias_name="n_hits"))


_QC_BUCKETS = 2001  # weights in [-1000, +1000]


def q_quality_classifier(sf_dir: str):
    """Linear (fastText-style) quality-classifier INFERENCE: mean-pooled
    hashed-bag-of-words score with a sign threshold — the GPT-3/CCNet-shaped
    'does this look like reference text' filter, with the learned weight
    table replaced by a deterministic hash-derived one (md5(token) % 2001 −
    1000) so the oracle can replicate inference bit-for-bit. The shape is
    the real one: per-token weight lookup needs NO vocabulary object (the
    hash IS the embedding index — same trick as feature_hashing), pooling
    is a per-row integer sum, and the stage is row-local with zero shuffle.
    Zero-token docs are dropped (no tokens → no score), matching the SQL
    GROUP BY. Output: (doc_id, n_tokens, score_sum, keep)."""
    from ..functions.textfns import md5_hash64

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        wcache: dict[str, int] = {}
        o_id, o_n, o_s, o_k = [], [], [], []
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                          t.column("text").to_pylist()):
            toks = _ALNUM.findall((s or "").lower())
            if not toks:
                continue
            tot = 0
            for w in toks:
                wt = wcache.get(w)
                if wt is None:
                    wt = int(md5_hash64(w) % _QC_BUCKETS) - 1000
                    wcache[w] = wt
                tot += wt
            o_id.append(did); o_n.append(len(toks)); o_s.append(tot)
            o_k.append(1 if tot >= 0 else 0)
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "n_tokens": pa.array(o_n, pa.int64()),
                         "score_sum": pa.array(o_s, pa.int64()),
                         "keep": pa.array(o_k, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def q_record_highs(sf_dir: str):
    """ALL-TIME-HIGH detector — events whose value strictly exceeds every
    earlier value in (ts, event_id) stream order; the monitoring / trading
    'new record' trigger and the simplest true streaming scan (each row
    depends on the unbounded prefix). Runs on functions/rank.py's
    keyed_prefix_max: sampled ts-bucket edges, ONE tree-reduced per-bucket
    max pass, driver-side exclusive scan over the tiny B-vector, ONE
    shuffle by bucket with a local sorted cummax inside — no global sort,
    and ~log n expected survivors regardless of scale. Output:
    (event_id, value_cents)."""
    from ..functions.rank import keyed_prefix_max

    ds = _rp(sf_dir, "events", ["event_id", "ts", "value"])

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": pc.cast(t.column("event_id"), pa.int64()),
             "us": pc.cast(t.column("ts"), pa.int64()),
             "value_cents": pa.array(_cents(np.asarray(t.column("value"))),
                                     pa.int64())})

    pm = keyed_prefix_max(
        ds.map_batches(narrow, batch_format="pyarrow"),
        "us", "event_id", "value_cents", out="prev_max")

    def keep(t: pa.Table) -> pa.Table:
        m = pc.greater(t.column("value_cents"), t.column("prev_max"))
        f = t.filter(m)
        return pa.table({"event_id": f.column("event_id"),
                         "value_cents": f.column("value_cents")})

    return pm.map_batches(keep, batch_format="pyarrow")


_LM_MIN_N = 5


def q_lm_score(sf_dir: str, *, broadcast_limit: int = 5_000_000):
    """Bigram language-model doc scoring (the KenLM-shaped perplexity
    filter of CCNet, integer-exact): train conditional bigram counts over
    the corpus, keep bigrams with n ≥ 5 as the model, score every doc by
    Σ over its adjacent token pairs of p(w2|w1) in ppm (n(w1,w2)·10⁶ //
    prefix(w1), floor division — NO floats anywhere, so the oracle matches
    bit-for-bit). Two-pass shape: bigram partial-dicts per batch → ONE
    vocabulary-sized groupby; prefix denominators aggregate from the
    bigram table itself (Σ_w2 n(w1,w2), UNfiltered — the true conditional
    denominator). Up to ``broadcast_limit`` surviving bigrams the model is
    collected and broadcast once via ray.put and scoring is row-local; a
    web-scale filtered model is NOT broadcastable, so above the limit docs
    explode to (doc_id, bigram) rows that meet the model in a partitioned
    LEFT hash_join (one corpus-sized shuffle, model never leaves the
    cluster) and fold back per doc — both plans equality-tested at
    threshold 0. Docs with < 2 tokens have no bigrams and are dropped.
    Output: (doc_id, n_bigrams, n_hits, score_ppm)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def bg_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            toks = _ALNUM.findall((s or "").lower())
            for i in range(len(toks) - 1):
                bgk = toks[i] + " " + toks[i + 1]
                counts[bgk] = counts.get(bgk, 0) + 1
        return pa.table({"bigram": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    bg = _gagg(ds.map_batches(bg_partial, batch_format="pyarrow"),
               "bigram", Sum("n", alias_name="n")).materialize()

    def split_first(t: pa.Table) -> pa.Table:
        w1 = [b.split(" ", 1)[0] for b in t.column("bigram").to_pylist()]
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "n": t.column("n")})

    pre = _gagg(bg.map_batches(split_first, batch_format="pyarrow"),
                "w1", Sum("n", alias_name="d"))

    model = bg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), _LM_MIN_N)),
        batch_format="pyarrow").materialize()  # filtered-model-sized

    if model.count() <= broadcast_limit:
        num = {r["bigram"]: int(r["n"]) for r in model.take_all()}
        w1s = {b.split(" ", 1)[0] for b in num}

        def pre_filter(t: pa.Table) -> pa.Table:
            m = pa.array([w in w1s for w in t.column("w1").to_pylist()])
            return t.filter(m)

        den = {r["w1"]: int(r["d"])
               for r in pre.map_batches(pre_filter,
                                        batch_format="pyarrow").take_all()}
        model_ref = ray.put((num, den))

        def score(t: pa.Table) -> pa.Table:
            num_m, den_m = ray.get(model_ref)
            o_id, o_nb, o_nh, o_sc = [], [], [], []
            for did, s in zip(
                    pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                    t.column("text").to_pylist()):
                toks = _ALNUM.findall((s or "").lower())
                if len(toks) < 2:
                    continue
                nb, nh, sc = len(toks) - 1, 0, 0
                for i in range(nb):
                    c = num_m.get(toks[i] + " " + toks[i + 1])
                    if c is not None:
                        nh += 1
                        sc += c * 1_000_000 // den_m[toks[i]]
                o_id.append(did); o_nb.append(nb)
                o_nh.append(nh); o_sc.append(sc)
            return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                             "n_bigrams": pa.array(o_nb, pa.int64()),
                             "n_hits": pa.array(o_nh, pa.int64()),
                             "score_ppm": pa.array(o_sc, pa.int64())})

        return ds.map_batches(score, batch_format="pyarrow")

    # model too large to broadcast: meet it in a partitioned join instead
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    # attach prefix denominators to the model ONCE (model-sized join)
    model_wd = hash_join(
        model.map_batches(
            lambda t: pa.table(
                {"bigram": t.column("bigram"),
                 "n": pc.cast(t.column("n"), pa.int64()),
                 "w1": pa.array([b.split(" ", 1)[0]
                                 for b in t.column("bigram").to_pylist()],
                                pa.string())}),
            batch_format="pyarrow"),
        pre, on=("w1",)).map_batches(
            lambda df: pd.DataFrame(
                {"bigram": df["bigram"],
                 "ppm": (df["n"].astype("int64") * 1_000_000
                         // df["d"].astype("int64"))}),
            batch_format="pandas")

    def explode(t: pa.Table) -> pa.Table:
        o_id, o_bg = [], []
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                          t.column("text").to_pylist()):
            toks = _ALNUM.findall((s or "").lower())
            for i in range(len(toks) - 1):
                o_id.append(did)
                o_bg.append(toks[i] + " " + toks[i + 1])
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "bigram": pa.array(o_bg, pa.string())})

    joined = hash_join(ds.map_batches(explode, batch_format="pyarrow"),
                       model_wd, on=("bigram",), how="left")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_bigrams": pd.Series([], dtype="int64"),
                                 "n_hits": pd.Series([], dtype="int64"),
                                 "score_ppm": pd.Series([], dtype="int64")})
        hit = df["ppm"].notna()
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "n_bigrams": np.ones(len(df), np.int64),
             "n_hits": hit.astype("int64"),
             "score_ppm": df["ppm"].fillna(0).astype("int64")})

    return grouped_aggregate(
        joined.map_batches(fold, batch_format="pandas"),
        ["doc_id"],
        Sum("n_bigrams", alias_name="n_bigrams"),
        Sum("n_hits", alias_name="n_hits"),
        Sum("score_ppm", alias_name="score_ppm"))


_BM25_TERMS = ("table", "spark", "window")
_BM25_K = 10


def q_bm25_search(sf_dir: str):
    """BM25 top-k retrieval for a fixed query — the lexical-search engine
    op that completes the inverted_index / phrase_search family — in an
    INTEGER-EXACT rational form (k1 = 6/5, b = 3/4 cross-multiplied away;
    idf_ppm = 10⁶(2N−2df+1) // (2df+1), the Robertson idf with the log
    dropped — rank-order-equivalent for the monotone part and bit-equal in
    SQL, where ln() would be float-rounding roulette). Physical plan: ONE
    tree-reduced stats pass (N, total corpus length, df per query term —
    a K+2-column scalar aggregate, no shuffle), broadcast scalars, then
    row-local scoring in Python big ints (the idf·tf product overflows
    int64 by design; the SQL side runs HUGEINT) and a LOSSLESS per-batch
    top-k partial → single-block final merge. At 100 TB the only traffic
    is K rows per batch. Output: top-10 (doc_id, score_ppm)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    terms = _BM25_TERMS

    def stats(t: pa.Table) -> pa.Table:
        n, totlen = 0, 0
        df = [0] * len(terms)
        for s in t.column("text").to_pylist():
            toks = _ALNUM.findall((s or "").lower())
            n += 1
            totlen += len(toks)
            for i, q in enumerate(terms):
                if q in toks:
                    df[i] += 1
        cols = {"n": pa.array([n], pa.int64()),
                "totlen": pa.array([totlen], pa.int64())}
        for i, q in enumerate(terms):
            cols[f"df_{i}"] = pa.array([df[i]], pa.int64())
        return pa.table(cols)

    agg = ds.map_batches(stats, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("totlen", alias_name="totlen"),
        *[Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))])
    if not agg or agg.get("n") is None or not int(agg["n"]):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score_ppm": pa.array([], pa.int64())})
    N, totlen = int(agg["n"]), int(agg["totlen"])
    idf = [1_000_000 * (2 * N - 2 * int(agg[f"df_{i}"]) + 1)
           // (2 * int(agg[f"df_{i}"]) + 1) if int(agg[f"df_{i}"]) else 0
           for i in range(len(terms))]

    def score(t: pa.Table) -> pa.Table:
        o_id, o_sc = [], []
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                          t.column("text").to_pylist()):
            toks = _ALNUM.findall((s or "").lower())
            dl = len(toks)
            sc = 0
            for i, q in enumerate(terms):
                tf = toks.count(q)
                if tf:
                    # Python ints: idf * 22·tf·totlen exceeds int64
                    sc += (idf[i] * (22 * tf * totlen)
                           // (10 * tf * totlen + 3 * totlen + 9 * dl * N))
            if sc:
                o_id.append(did); o_sc.append(sc)
        df = pd.DataFrame({"doc_id": pd.array(o_id, dtype="int64"),
                           "score_ppm": pd.array(o_sc, dtype="int64")})
        return df.sort_values(["score_ppm", "doc_id"],
                              ascending=[False, True]).head(_BM25_K)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score_ppm", "doc_id"],
                              ascending=[False, True]).head(_BM25_K)

    return (ds.map_batches(score, batch_format="pyarrow")
            .repartition(1).map_batches(topk, batch_format="pandas"))


def q_curriculum_pack(sf_dir: str):
    """CURRICULUM-ordered sequence packing: concatenate documents
    shortest-first (the classic length curriculum) and cut fixed-capacity
    training sequences — q_seq_packing's plan with the scan order changed
    from doc_id to the COMPUTED (n_tokens, doc_id) key, exercising
    keyed_prefix_sum's duplicate-key + tiebreak path (many docs share a
    length; the bucket stays a pure function of the key, ties order by
    doc_id inside). Still no global sort: one narrow histogram pass + one
    row shuffle. Output: (doc_id, n_tokens, seq_id, seq_offset)."""
    from ..functions.rank import keyed_prefix_sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = [len(_ALNUM.findall((s or "").lower()))
             for s in t.column("text").to_pylist()]
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_tokens": pa.array(n, pa.int64())})

    scanned = keyed_prefix_sum(
        ds.map_batches(toks, batch_format="pyarrow"),
        "n_tokens", "n_tokens", tiebreak_col="doc_id", out="cum0")

    def finish(t: pa.Table) -> pa.Table:
        cum0 = np.asarray(t.column("cum0"), dtype=np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_tokens": t.column("n_tokens"),
             "seq_id": pa.array(cum0 // SEQ_CAPACITY, pa.int64()),
             "seq_offset": pa.array(cum0 % SEQ_CAPACITY, pa.int64())})

    return scanned.map_batches(finish, batch_format="pyarrow")


def q_graph_harmonic(sf_dir: str):
    """SAMPLED harmonic centrality (Boldi–Vigna's centrality made
    affordable): H(v) ≈ Σ over S pilot sources of 1/d(s,v), d ≤ 3 — the
    node-importance measure that, unlike PageRank, is distance- not
    flow-based. Exact BFS from all S sources SIMULTANEOUSLY via
    functions/graph.multi_source_khop (label key widened to (node, seed):
    S frontiers share the same k hash_join+Min rounds — S× label rows,
    never S× rounds). Contributions are integer ppm (10⁶ // hops), summed
    per node with a vocabulary-sized groupby; seeds are the 4 smallest
    node ids (deterministic, SQL-replicable), self-distances excluded.
    Output: (node, n_sources, harmonic_ppm)."""
    from ..functions.graph import multi_source_khop
    from ..stages.canonicalize import grouped_aggregate

    labels = multi_source_khop(_graph_edges(sf_dir, 2).materialize(),
                               k=3, n_seeds=4)

    def contrib(t: pa.Table) -> pa.Table:
        h = pc.cast(t.column("hops"), pa.int64()).to_numpy()
        keep = h > 0
        return pa.table(
            {"node": pc.cast(t.column("node"), pa.int64()).to_numpy()[keep],
             "one": pa.array(np.ones(int(keep.sum()), np.int64), pa.int64()),
             "ppm": pa.array(1_000_000 // h[keep], pa.int64())})

    return grouped_aggregate(
        labels.map_batches(contrib, batch_format="pyarrow"),
        ["node"], Sum("one", alias_name="n_sources"),
        Sum("ppm", alias_name="harmonic_ppm"))


def q_knn_srp(sf_dir: str):
    """LSH-bucketed ANN (SRP / Charikar simhash for cosine) — the scale
    path alternative to q_knn_ivf: a ROW-LOCAL sign-code filter (12
    deterministic Rademacher hyperplanes, probe = Hamming ≤ 1 → ~0.32% of
    buckets) prunes the corpus before the brute-force scorer ever sees it;
    no shuffle, no index build, and at 100 TB the codes persist as a
    column so the filter prunes at the read (zonemap-style data-skipping).
    Approximate by construction → rows-only for the driver; determinism
    and exact recovery of PLANTED strong neighbors (cosine ≥ 0.99) are
    pinned in pytest — the sf embeddings' own top-10 sit at cosine ~0.3
    (expected Hamming ~5/12), correctly OUTSIDE a 1-bit probe, so this op
    filters weak matches by design. Output: (vec_id, rank) of the query's
    bucket-probed top-10."""
    from ..functions.similarity import knn_srp

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_srp(ds, np.ones((1, EMBED_DIM)), k=10)
    return out.map_batches(
        lambda t: pa.table(
            {"vec_id": t.column("vec_id"),
             "rank": pc.cast(t.column("rank"), pa.int64())}),
        batch_format="pyarrow")


_DSIR_BUCKETS = 4096


def q_dsir_importance(sf_dir: str):
    """DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): score
    every document by how much its hashed-unigram profile resembles the
    TARGET slice (here lang='en') relative to the RAW corpus — the
    data-selection scorer that needs no trained classifier, only two
    counting passes. DSIR proper uses log(p_t/p_r); log is not
    bit-reproducible across engines, so the weight is the same smoothed
    frequency ratio in integer ppm: w(h) = 10⁶·(n_tgt(h)+1) //
    (n_raw(h)+1) — per-bucket monotone in the classic weight.

    Plan: ONE corpus pass builds BOTH tallies (per-batch partial
    (h, n_raw, n_tgt) dicts → a ≤ 4096-row Sum aggregate — bounded
    sketch-sized state at any corpus size, the HLL discipline), the weight
    table broadcasts once via ``ray.put`` (16 KB — never a shuffle side),
    and scoring is a second row-local pass; text never enters an exchange.
    Zero-token docs drop (no tokens → no score), matching the SQL GROUP BY.
    Output: (doc_id, n_tokens, importance_sum). Reference analog: the
    aggregate-then-broadcast entity-pool pattern (src/augmentation.py:59-69)
    with the pool shrunk to a fixed-width hash table."""
    from ..functions.textfns import md5_hash64
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _hash_tokens(s: str, cache: dict) -> list:
        out = []
        for w in _ALNUM.findall((s or "").lower()):
            h = cache.get(w)
            if h is None:
                h = int(md5_hash64(w) % _DSIR_BUCKETS)
                cache[w] = h
            out.append(h)
        return out

    def tally(t: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        raw = np.zeros(_DSIR_BUCKETS, np.int64)
        tgt = np.zeros(_DSIR_BUCKETS, np.int64)
        for s, lang in zip(t.column("text").to_pylist(),
                           t.column("lang").to_pylist()):
            hs = _hash_tokens(s, cache)
            is_tgt = lang == "en"
            for h in hs:
                raw[h] += 1
                if is_tgt:
                    tgt[h] += 1
        nz = np.nonzero(raw)[0]
        return pa.table({"h": pa.array(nz, pa.int64()),
                         "n_raw": pa.array(raw[nz], pa.int64()),
                         "n_tgt": pa.array(tgt[nz], pa.int64())})

    counts = grouped_aggregate(
        ds.map_batches(tally, batch_format="pyarrow"), ["h"],
        Sum("n_raw", alias_name="n_raw"), Sum("n_tgt", alias_name="n_tgt"),
    )
    w = np.full(_DSIR_BUCKETS, 1_000_000, np.int64)  # unseen: (0+1)//(0+1)
    for b in counts.iter_batches(batch_size=8192, batch_format="pyarrow"):
        hs = pc.cast(b.column("h"), pa.int64()).to_numpy()
        nr = pc.cast(b.column("n_raw"), pa.int64()).to_numpy()
        nt = pc.cast(b.column("n_tgt"), pa.int64()).to_numpy()
        w[hs] = (nt + 1) * 1_000_000 // (nr + 1)
    wref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wt = ray.get(wref)
        cache: dict[str, int] = {}
        o_id, o_n, o_s = [], [], []
        for did, s in zip(pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                          t.column("text").to_pylist()):
            hs = _hash_tokens(s, cache)
            if not hs:
                continue
            o_id.append(did)
            o_n.append(len(hs))
            o_s.append(int(wt[hs].sum()))
        return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                         "n_tokens": pa.array(o_n, pa.int64()),
                         "importance_sum": pa.array(o_s, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def q_graph_neighbor_degree(sf_dir: str):
    """Mean NEIGHBOR degree per node in exact ppm — the friendship-paradox
    statistic and the simplest 1-hop GNN message-passing round (aggregate a
    neighbor attribute along edges). Plan: node-sized degree table (per-batch
    partials → one Sum), degrees attached to the directed edge list by ONE
    partitioned hash join on the neighbor endpoint (never a broadcast — the
    degree table is node-vocabulary-sized, the triangle_count lesson), then
    a per-source Sum fold back to node cardinality; mean = 10⁶·Σdeg(nbr) //
    deg(node) by truncated integer division. Exchange is O(edges) narrow
    rows + two node-sized aggregates; nothing node-sized on the driver.
    Output: (node, degree, nbr_degree_sum, mean_nbr_deg_ppm)."""
    from ..functions.graph import degree_table
    from ..stages.canonicalize import grouped_aggregate
    from ..stages.joins import hash_join

    edges = _graph_edges(sf_dir).materialize()
    deg = degree_table(edges).materialize()

    def directed(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("u"), pa.int64()).to_numpy()
        v = pc.cast(t.column("v"), pa.int64()).to_numpy()
        return pa.table({"node": pa.array(np.concatenate([u, v]), pa.int64()),
                         "nbr": pa.array(np.concatenate([v, u]), pa.int64())})

    adj = edges.map_batches(directed, batch_format="pyarrow")
    nbr_deg = hash_join(
        adj,
        deg.map_batches(
            lambda t: pa.table({"nbr": t.column("node"),
                                "nbr_degree": t.column("degree")}),
            batch_format="pyarrow"),
        on=("nbr",))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "node": pc.cast(t.column("node"), pa.int64()).to_numpy(),
            "nbr_degree_sum": pc.cast(t.column("nbr_degree"), pa.int64()).to_numpy(),
        })
        g = df.groupby("node", as_index=False).agg(
            nbr_degree_sum=("nbr_degree_sum", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = grouped_aggregate(
        nbr_deg.map_batches(partial, batch_format="pyarrow"), ["node"],
        Sum("nbr_degree_sum", alias_name="nbr_degree_sum"),
    )
    out = hash_join(sums, deg, on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("degree"), pa.int64()).to_numpy()
        s = pc.cast(t.column("nbr_degree_sum"), pa.int64()).to_numpy()
        return pa.table({
            "node": pc.cast(t.column("node"), pa.int64()),
            "degree": pa.array(d, pa.int64()),
            "nbr_degree_sum": pa.array(s, pa.int64()),
            "mean_nbr_deg_ppm": pa.array(s * 1_000_000 // d, pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_coverage_select(sf_dir: str, *, k: int = 3):
    """Greedy MAX-COVERAGE document selection (the facility-location /
    submodular data-selection step: pick k documents that together cover the
    most distinct vocabulary — the classic 1−1/e greedy). Each of the k
    rounds is ONE row-local corpus pass: every doc counts its tokens not yet
    in the covered set (broadcast via ``ray.put`` — bounded by k × tokens
    per doc, never corpus-sized), a per-batch lossless argmax combiner packs
    (count ≪ 33) ∣ (2³³−1−doc_id) so ties break to the SMALLEST id, and the
    global winner is a one-row Max fold; only the winner's own token set is
    fetched back (one filtered take, doc-sized). Docs contributing zero new
    tokens drop from the argmax (mirrors the SQL GROUP BY over the filtered
    token table); selection stops early when nothing new remains.
    Output: (round, doc_id, new_tokens). Reference analog: the grid-search
    argmax loop (BiLSTM notebook cell 7) turned into a distributed
    coverage-gain argmax per round."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"]).materialize()
    _TIE = (1 << 33) - 1

    covered: frozenset = frozenset()
    selected: list[tuple[int, int, int]] = []
    chosen: set[int] = set()
    for rnd in range(1, k + 1):
        cref = ray.put(covered)
        sel = frozenset(chosen)

        def gain(t: pa.Table, _c=cref, _s=sel) -> pa.Table:
            cov = ray.get(_c)
            best = -1
            for did, s in zip(
                    pc.cast(t.column("doc_id"), pa.int64()).to_pylist(),
                    t.column("text").to_pylist()):
                if did in _s:
                    continue
                new = len(frozenset(_ALNUM.findall((s or "").lower())) - cov)
                if new > 0:
                    packed = (new << 33) | (_TIE - did)
                    if packed > best:
                        best = packed
            if best < 0:
                return pa.table({"packed": pa.array([], pa.int64())})
            return pa.table({"packed": pa.array([best], pa.int64())})

        top = ds.map_batches(gain, batch_format="pyarrow").max("packed")
        if top is None:
            break
        new_cnt, win_id = int(top) >> 33, _TIE - (int(top) & _TIE)
        wtext = ds.filter(
            lambda r, _w=win_id: int(r["doc_id"]) == _w).take(1)[0]["text"]
        covered = covered | frozenset(_ALNUM.findall((wtext or "").lower()))
        chosen.add(win_id)
        selected.append((rnd, win_id, new_cnt))

    return pa.table({
        "round": pa.array([r for r, _, _ in selected], pa.int64()),
        "doc_id": pa.array([d for _, d, _ in selected], pa.int64()),
        "new_tokens": pa.array([n for _, _, n in selected], pa.int64()),
    })


def q_peak_concurrency(sf_dir: str):
    """PEAK CONCURRENCY — the classic sweep-line: maximum number of user
    sessions active at any instant (capacity planning / load-test sizing).
    Sessions are the 1h-gap intervals of ``user_sessions`` (exact per-user
    inside coarse hash buckets); each interval becomes (+1 at start, −1 at
    end+1µs — half-open, so µs-adjacent sessions never overlap), deltas
    PRE-AGGREGATE per distinct timestamp (making the scan key unique — and
    evaluating concurrency only at timestamps, where it is well-defined),
    then ONE range-partitioned ``keyed_prefix_sum`` turns the timeline into
    running concurrency with no global sort; the finish is a two-scalar
    fold over the (≤ 2·sessions)-row timeline. Output: one row
    (n_sessions, peak_concurrency)."""
    from ..functions.rank import keyed_prefix_sum
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "events", ["user_id", "ts"])
    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(uid % P, pa.int64()))

    def part_intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        gap = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds() > 3600
        sid = gap.groupby(g["user_id"], sort=False).cumsum()
        us = g["ts"].astype("int64")
        iv = (
            pd.DataFrame({"user_id": g["user_id"], "sid": sid, "us": us})
            .groupby(["user_id", "sid"], as_index=False, sort=False)
            .agg(s=("us", "min"), e=("us", "max"))
        )
        t = np.concatenate([iv["s"].to_numpy(), iv["e"].to_numpy() + 1])
        delta = np.concatenate([np.ones(len(iv), np.int64),
                                np.full(len(iv), -1, np.int64)])
        out = pd.DataFrame({"t": t, "delta": delta,
                            "n_start": (delta > 0).astype("int64")})
        return out.groupby("t", as_index=False).agg(
            delta=("delta", "sum"), n_start=("n_start", "sum"))

    deltas = grouped_aggregate(
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_intervals, batch_format="pandas"),
        ["t"],
        Sum("delta", alias_name="delta"),
        Sum("n_start", alias_name="n_start"),
    ).materialize()  # timeline-sized (≤ 2·sessions rows); the prefix-sum
    # primitive consumes it three times (edge sample, histogram, shuffle)
    run = keyed_prefix_sum(deltas, "t", "delta", out="prefix")

    def conc(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("prefix"), pa.int64()).to_numpy()
        d = pc.cast(t.column("delta"), pa.int64()).to_numpy()
        return pa.table({
            "conc": pa.array(p + d, pa.int64()),
            "n_start": pc.cast(t.column("n_start"), pa.int64()),
        })

    res = run.map_batches(conc, batch_format="pyarrow").aggregate(
        Max("conc"), Sum("n_start"))
    return pa.table({
        "n_sessions": pa.array([int(res["sum(n_start)"])], pa.int64()),
        "peak_concurrency": pa.array([int(res["max(conc)"])], pa.int64()),
    })


def q_daily_ohlc(sf_dir: str):
    """Daily OHLC bars per event type — the canonical time-series
    downsample (open = value at the earliest (ts, event_id), close = at the
    latest, high/low = extremes, all in exact cents). The per-batch combiner
    is LOSSLESS: each batch reduces a (type, day) group to ONE candidate row
    carrying (open_ts, open_id, open_cents, close_ts, close_id, close_cents,
    hi, lo, n), so the exchange is O(groups × blocks) narrow rows and the
    per-group finish folds ≤ blocks candidates inside a coarse-bucketed
    map_groups — the value stream never shuffles. Ties at equal ts break by
    event_id on both ends, so the bars are deterministic at any parallelism.
    Output: (event_type, day, open_cents, high_cents, low_cents,
    close_cents, n_events)."""
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "events", ["event_type", "ts", "event_id", "value"])
    P = _compact_blocks()
    _DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pylist(),
            "day": us // _DAY_US,
            "ts": us,
            "event_id": pc.cast(t.column("event_id"), pa.int64()).to_numpy(),
            "cents": np.floor(
                pc.cast(t.column("value"), pa.float64()).to_numpy() * 100 + 0.5
            ).astype(np.int64),
        })
        df = df.sort_values(["event_type", "day", "ts", "event_id"],
                            kind="mergesort")
        g = df.groupby(["event_type", "day"], as_index=False, sort=False).agg(
            open_ts=("ts", "first"), open_id=("event_id", "first"),
            open_cents=("cents", "first"),
            close_ts=("ts", "last"), close_id=("event_id", "last"),
            close_cents=("cents", "last"),
            hi=("cents", "max"), lo=("cents", "min"), n=("cents", "size"),
        )
        g["__part"] = pd.util.hash_pandas_object(
            g["event_type"].astype(str) + ":" + g["day"].astype(str),
            index=False).to_numpy().astype(np.int64) % P
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "day"], kind="mergesort")
        out = []
        for (et, day), grp in g.groupby(["event_type", "day"], sort=False):
            o = grp.sort_values(["open_ts", "open_id"], kind="mergesort").iloc[0]
            c = grp.sort_values(["close_ts", "close_id"], kind="mergesort").iloc[-1]
            out.append((et, int(day), int(o["open_cents"]),
                        int(grp["hi"].max()), int(grp["lo"].min()),
                        int(c["close_cents"]), int(grp["n"].sum())))
        return pd.DataFrame(out, columns=[
            "event_type", "day", "open_cents", "high_cents", "low_cents",
            "close_cents", "n_events"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(finish, batch_format="pandas")
    )


def q_late_events(sf_dir: str):
    """WATERMARK late-data accounting — the streaming-ingestion health
    metric: an event is LATE when its event time sits more than 1h behind
    the watermark, i.e. the maximum event time among all rows that ARRIVED
    before it (arrival order = event_id, the ingestion sequence). The
    watermark is a true streaming scan (each row depends on the unbounded
    arrival prefix) and runs on ``keyed_prefix_max`` — sampled bucket edges,
    one tree-reduced per-bucket max, one bucket shuffle with a local sorted
    cummax; no global sort. Lateness is then a row-local flag folded into a
    type-sized count aggregate. Output: (event_type, n_events, n_late)."""
    from ..functions.rank import keyed_prefix_max
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "events", ["event_id", "ts", "event_type"])
    _LATE_US = 3_600_000_000
    _I64_MIN = np.iinfo(np.int64).min

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "us": pc.cast(t.column("ts"), pa.int64()),
            "event_type": t.column("event_type"),
        })

    wm = keyed_prefix_max(
        ds.map_batches(narrow, batch_format="pyarrow"),
        "event_id", "us", "us", out="wm")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["wm"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        late = (w != _I64_MIN) & (us < w - _LATE_US)
        g = pd.DataFrame({"event_type": df["event_type"],
                          "n_events": 1,
                          "n_late": late.astype(np.int64)})
        return g.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), n_late=("n_late", "sum"))

    return grouped_aggregate(
        wm.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        Sum("n_events", alias_name="n_events"),
        Sum("n_late", alias_name="n_late"),
    )


def q_daily_locf(sf_dir: str):
    """Daily LOCF gap-fill (last observation carried forward) — the
    time-series resample that turns sparse per-day closes into a DENSE
    calendar grid per type, missing days inheriting the previous day's
    value (sensor/price panels, feature-store snapshots). Per-batch
    combiner reduces each (type, day) to one close candidate (argmax by
    (ts, event_id), the daily_ohlc close rule); candidates coarse-bucket by
    TYPE so each type's whole timeline lands in one group (timeline-sized,
    the value_median driver contract), where the dense ``arange(min_day,
    max_day)`` grid + vectorized searchsorted fill happen row-locally —
    the event stream itself never reshuffles. Output: (event_type, day,
    value_cents, filled). The sf tables have no empty days, so the fill
    path is pinned by a gap fixture."""
    from ..stages.canonicalize import _compact_blocks

    ds = _rp(sf_dir, "events", ["event_type", "ts", "event_id", "value"])
    P = _compact_blocks()
    _DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pylist(),
            "day": us // _DAY_US,
            "ts": us,
            "event_id": pc.cast(t.column("event_id"), pa.int64()).to_numpy(),
            "cents": np.floor(
                pc.cast(t.column("value"), pa.float64()).to_numpy() * 100 + 0.5
            ).astype(np.int64),
        }).sort_values(["event_type", "day", "ts", "event_id"],
                       kind="mergesort")
        g = df.groupby(["event_type", "day"], as_index=False, sort=False).agg(
            ts=("ts", "last"), event_id=("event_id", "last"),
            cents=("cents", "last"))
        g["__part"] = pd.util.hash_pandas_object(
            g["event_type"].astype(str), index=False
        ).to_numpy().astype(np.int64) % P
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            daily = (grp.sort_values(["day", "ts", "event_id"],
                                     kind="mergesort")
                     .groupby("day", as_index=False, sort=True)
                     .agg(cents=("cents", "last")))
            days = daily["day"].to_numpy(np.int64)
            cents = daily["cents"].to_numpy(np.int64)
            full = np.arange(days[0], days[-1] + 1, dtype=np.int64)
            idx = np.searchsorted(days, full, side="right") - 1
            have = np.isin(full, days)
            out.append(pd.DataFrame({
                "event_type": et, "day": full, "value_cents": cents[idx],
                "filled": (~have).astype(np.int64)}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "day": pd.Series([], dtype="int64"),
            "value_cents": pd.Series([], dtype="int64"),
            "filled": pd.Series([], dtype="int64")})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(finish, batch_format="pandas")
    )


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


def q_event_type_comovement(sf_dir: str):
    """Pairwise CO-MOVEMENT of the per-type daily count series — the exact
    integer covariance numerator n·Σxy − Σx·Σy over the shared day axis
    (do event types rise and fall together? the cross-series dependence
    probe behind correlation heatmaps). Key insight: zero days contribute
    nothing to Σx or Σxy, so the SPARSE (day, type, n) aggregate suffices —
    no dense pivot; n_days is one scalar. Plan: bounded daily aggregate →
    per-type sums (type-sized) + per-day pair products pre-aggregated
    inside day-complete coarse buckets (exchange ≤ pairs × buckets) → a
    pair-keyed Sum; pairs that never co-occur are zero-filled from the
    type-sized table so cov_num = −Σx·Σy is still emitted. Output:
    (type_a, type_b, n_days, cov_num)."""
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    ds = _rp(sf_dir, "events", ["ts", "event_type"])
    P = _compact_blocks()
    _DAY_US = 86_400_000_000

    def day_type(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({"day": us // _DAY_US,
                           "event_type": t.column("event_type").to_pylist()})
        return df.groupby(["day", "event_type"], as_index=False).size().rename(
            columns={"size": "n"})

    daily = grouped_aggregate(
        ds.map_batches(day_type, batch_format="pyarrow"),
        ["day", "event_type"], Sum("n", alias_name="n"),
    ).materialize()  # bounded: days × type vocabulary

    # type-sized Σx and the scalar day count (both driver-safe)
    sx: dict[str, int] = {}
    days: set[int] = set()
    for b in daily.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for d, et, n in zip(b.column("day").to_pylist(),
                            b.column("event_type").to_pylist(),
                            b.column("n").to_pylist()):
            sx[et] = sx.get(et, 0) + int(n)
            days.add(int(d))
    n_days = len(days)

    def add_bucket(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("day"), pa.int64()).to_numpy()
        return t.append_column("__part", pa.array(d % P, pa.int64()))

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[tuple, int] = {}
        for _, grp in g.groupby("day", sort=False):
            ets = grp["event_type"].to_numpy()
            ns = grp["n"].to_numpy(np.int64)
            order = np.argsort(ets, kind="mergesort")
            ets, ns = ets[order], ns[order]
            for i in range(len(ets)):
                for j in range(i + 1, len(ets)):
                    k = (ets[i], ets[j])
                    out[k] = out.get(k, 0) + int(ns[i]) * int(ns[j])
        if not out:
            return pd.DataFrame({"type_a": pd.Series([], dtype="object"),
                                 "type_b": pd.Series([], dtype="object"),
                                 "sxy": pd.Series([], dtype="int64")})
        ks = list(out)
        return pd.DataFrame({"type_a": [a for a, _ in ks],
                             "type_b": [b for _, b in ks],
                             "sxy": [out[k] for k in ks]})

    sxy_ds = grouped_aggregate(
        daily.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pair_partials, batch_format="pandas"),
        ["type_a", "type_b"], Sum("sxy", alias_name="sxy"),
    )
    sxy: dict[tuple, int] = {}
    for b in sxy_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for a, c, s in zip(b.column("type_a").to_pylist(),
                           b.column("type_b").to_pylist(),
                           b.column("sxy").to_pylist()):
            sxy[(a, c)] = int(s)

    types = sorted(sx)
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, c = types[i], types[j]
            s = sxy.get((a, c), 0)
            rows.append((a, c, n_days, n_days * s - sx[a] * sx[c]))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows]),
        "type_b": pa.array([r[1] for r in rows]),
        "n_days": pa.array([r[2] for r in rows], pa.int64()),
        "cov_num": pa.array([r[3] for r in rows], pa.int64()),
    })


def q_merge_upsert(sf_dir: str):
    """CDC MERGE INTO / upsert-apply — the lakehouse change-data-capture
    primitive: a base table + a changelog of keyed UPDATE/DELETE rows →
    the post-merge table, winner per key = highest version, DELETE
    tombstones dropped. The changelog is synthesized deterministically from
    the base (keys ≡ 0 mod 11 → DELETE; else ≡ 0 mod 7 → UPDATE adding
    100 cents), so both engines derive identical change streams with no
    external data. Plan: side-tagged union (version travels with the row),
    per-batch LOSSLESS combiner packs (version ≪ 33 ∣ is_del ≪ 32 ∣ cents)
    — cents < 2³² at any TPC-H scale — so each key ships ≤ 1 row per batch
    per side into ONE keyed Max aggregate; decode + tombstone filter are
    row-local. No join, no sort; the merge is a single bucketed exchange at
    key cardinality (the snapshot_delta sibling — apply instead of diff).
    Output: (o_orderkey, cents, version)."""
    from ..stages.canonicalize import grouped_aggregate

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def tagged(t: pa.Table) -> pa.Table:
        k = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()
        cents = np.floor(
            pc.cast(t.column("o_totalprice"), pa.float64()).to_numpy()
            * 100 + 0.5).astype(np.int64)
        # base rows: version 0, live
        packed_base = cents
        keys, packed = [k], [packed_base]
        is_del = k % 11 == 0
        is_upd = ~is_del & (k % 7 == 0)
        # changelog rows: version 1
        if is_del.any():
            keys.append(k[is_del])
            packed.append(np.full(int(is_del.sum()),
                                  (1 << 33) | (1 << 32), np.int64))
        if is_upd.any():
            keys.append(k[is_upd])
            packed.append((1 << 33) + cents[is_upd] + 100)
        df = pd.DataFrame({"o_orderkey": np.concatenate(keys),
                           "packed": np.concatenate(packed)})
        g = df.groupby("o_orderkey", as_index=False).agg(packed=("packed", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = grouped_aggregate(
        ds.map_batches(tagged, batch_format="pyarrow"),
        ["o_orderkey"], Max("packed", alias_name="packed"),
    )

    def finish(t: pa.Table) -> pa.Table:
        p = pc.cast(t.column("packed"), pa.int64()).to_numpy()
        k = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()
        live = (p >> 32) & 1
        keep = live == 0
        return pa.table({
            "o_orderkey": pa.array(k[keep], pa.int64()),
            "cents": pa.array(p[keep] & ((1 << 32) - 1), pa.int64()),
            "version": pa.array(p[keep] >> 33, pa.int64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def queries() -> dict:
    """One entry per implemented operator (SURVEY.md §2 / §2.11).

    ORDERING CONTRACT: the external correctness harness verifies the FIRST 50
    dict entries against ``oracle_sql()`` (rows + schema + value hash).
    Rounds 1–2 (CORRECTNESS_r01/r02.json) attested 57 distinct oracle-backed
    entries; this round's window holds ALL 39 oracle-backed operators never
    driver-checked before (including this round's dup_ngram_fraction /
    neardup_keep / scd_segment_orders) plus flagship representatives kept
    from round 2 — one per physical-plan family (agg scan, hash-join chain,
    global rank, interval join) — so across the rounds EVERY oracle-backed
    entry has a driver row.
    Entries after position 50 remain fully hash-checked by
    tests/test_queries_oracle.py, which runs EVERY entry that has an
    ``oracle_sql()`` string, window or not. The late-round-3 additions
    (positions ~89+: co-occurrence/lift/3-itemsets, LPA/SSSP/assortativity,
    mode/MAD/trend/Gini/min-max, NTILE/skyline/Spearman, streaks/interval
    union/debounce/TWA/trailing-window/paths, profiler/integrity/golden
    records/SNM/balanced sample/novelty/temporal anti-join) were all
    additionally driver-mimic-checked at sf0.01 (tools/check_window_sf001)
    and are next-round window candidates. The continuation-session tail
    (pii_redact / pii_stats / quality_classifier, record_highs, lm_score,
    bm25_search, curriculum_pack, graph_harmonic) was likewise
    driver-mimic-checked at sf0.001 AND sf0.01 (tools/check_window_sf001).
    """
    return {
        # -- flagship representatives re-attested from round 2 ---------------
        "pricing_summary": q_pricing_summary,
        "revenue_by_region": q_revenue_by_region,
        "order_rank": q_order_rank,
        "purchase_clicks_window": q_purchase_clicks_window,
        # -- round-3 additions, never driver-checked -------------------------
        "dup_ngram_fraction": q_dup_ngram_fraction,
        "neardup_keep": q_neardup_keep,
        "scd_segment_orders": q_scd_segment_orders,
        # -- relational / aggregate shapes, never driver-checked -------------
        "nation_presence_outer": q_nation_presence_outer,
        "snapshot_delta": q_snapshot_delta,
        "value_hist_quantiles": q_value_hist_quantiles,
        "table_checksum": q_table_checksum,
        "price_qty_cov": q_price_qty_cov,
        "price_deciles": q_price_deciles,
        "decayed_clicks": q_decayed_clicks,
        # -- window / stream shapes ----------------------------------------
        "user_funnel": q_user_funnel,
        # -- rank / sample / packing ----------------------------------------
        "stratified_sample": q_stratified_sample,
        "per_source_sample": q_per_source_sample,
        "weighted_sample": q_weighted_sample,
        # -- dedup / similarity families ------------------------------------
        "paragraph_dedup": q_paragraph_dedup,
        "normalized_dedup": q_normalized_dedup,
        "minhash_neardup": q_minhash_neardup,
        "ngram_jaccard_neardup": q_ngram_jaccard_neardup,
        "simhash": q_simhash,
        "setsim_neardup": q_setsim_neardup,
        "domain_dup_rate": q_domain_dup_rate,
        "knn_ivf_full": q_knn_ivf_full,
        "kmeans_fixed": q_kmeans_fixed,
        # -- text curation ---------------------------------------------------
        "heavy_hitters": q_heavy_hitters,
        "langid": q_langid,
        "quality": q_quality,
        "phrase_search": q_phrase_search,
        "subword_counts": q_subword_counts,
        "tfidf_top_terms": q_tfidf_top_terms,
        "pmi_bigrams": q_pmi_bigrams,
        "decontamination": q_decontamination,
        "fingerprint": q_fingerprint,
        "repetition_stats": q_repetition_stats,
        "length_buckets": q_length_buckets,
        "oov_rate": q_oov_rate,
        "word_commonness": q_word_commonness,
        # -- sketches / graph --------------------------------------------------
        "hll_users": q_hll_users,
        "hll_per_type": q_hll_per_type,
        "cms_users": q_cms_users,
        "graph_degree": q_graph_degree,
        "graph_triangles": q_graph_triangles,
        "graph_components": q_graph_components,
        "graph_pagerank": q_graph_pagerank,
        "graph_khop": q_graph_khop,
        "link_predict": q_link_predict,
        "kcore": q_kcore,
        # ---- position 51+: round-2-attested entries (green rows in
        # CORRECTNESS_r02.json) and the plan/rows-only entries; all
        # oracle-backed ones remain hash-checked by
        # tests/test_queries_oracle.py ------------------------------------------
        "customer_by_nation": q_customer_by_nation,
        "revenue_by_brand": q_revenue_by_brand,
        "shipping_priority": q_shipping_priority,
        "customer_order_counts": q_customer_order_counts,
        "bloom_semi_orders": q_bloom_semi_orders,
        "nations_without_suppliers": q_nations_without_suppliers,
        "orders_rollup": q_orders_rollup,
        "distinct_users_per_type": q_distinct_users_per_type,
        "value_median": q_value_median,
        "events_hourly": q_events_hourly,
        "user_sessions": q_user_sessions,
        "click_after_purchase": q_click_after_purchase,
        "fuzzy_part_names": q_fuzzy_part_names,
        "customers_with_orders": q_customers_with_orders,
        "top_event_per_user": q_top_event_per_user,
        "events_pivot": q_events_pivot,
        "word_freq": q_word_freq,
        "compression_ratio": q_compression_ratio,
        "nations_overlap": q_nations_overlap,
        "orders_above_avg": q_orders_above_avg,
        "events_sliding": q_events_sliding,
        "running_total": q_running_total,
        "top_orders": q_top_orders,
        "seq_packing": q_seq_packing,
        "exact_dedup": q_exact_dedup,
        "knn_cosine": q_knn_cosine,
        # round-3 late additions (oracle-backed; pytest-checked this round,
        # window candidates for the next)
        "orders_cube": q_orders_cube,
        "event_type_transitions": q_event_type_transitions,
        "top_terms_per_lang": q_top_terms_per_lang,
        "source_vocab_jaccard": q_source_vocab_jaccard,
        "sliding_distinct_users": q_sliding_distinct_users,
        "user_retention": q_user_retention,
        "key_skew_stats": q_key_skew_stats,
        "component_size_hist": q_component_size_hist,
        "nations_except_all": q_nations_except_all,
        "hll_join_card": q_hll_join_card,
        "doc_chunks": q_doc_chunks,
        "meta_blocking": q_meta_blocking,
        "value_outliers": q_value_outliers,
        "part_cooccurrence": q_part_cooccurrence,
        "user_type_gini": q_user_type_gini,
        "value_trend": q_value_trend,
        "order_deciles": q_order_deciles,
        "graph_lpa": q_graph_lpa,
        "value_mode": q_value_mode,
        "value_mad": q_value_mad,
        "lineitem_unpivot": q_lineitem_unpivot,
        "value_minmax": q_value_minmax,
        "user_streaks": q_user_streaks,
        "profile_events": q_profile_events,
        "readability": q_readability,
        "events_calendar": q_events_calendar,
        "user_active_seconds": q_user_active_seconds,
        "embedding_dim_stats": q_embedding_dim_stats,
        "graph_sssp": q_graph_sssp,
        "revenue_mom": q_revenue_mom,
        "nation_priority_grid": q_nation_priority_grid,
        "integrity_audit": q_integrity_audit,
        "sorted_neighborhood": q_sorted_neighborhood,
        "order_skyline": q_order_skyline,
        "events_debounced": q_events_debounced,
        "user_time_weighted_value": q_user_time_weighted_value,
        "part_triples": q_part_triples,
        "golden_records": q_golden_records,
        "graph_assortativity": q_graph_assortativity,
        "part_lift": q_part_lift,
        "events_trailing7": q_events_trailing7,
        "balanced_sample": q_balanced_sample,
        "props_novelty": q_props_novelty,
        "abandoned_views": q_abandoned_views,
        "top_session_paths": q_top_session_paths,
        "spend_rank_corr": q_spend_rank_corr,
        "value_trimmed_mean": q_value_trimmed_mean,
        "spend_kendall_tau": q_spend_kendall_tau,
        "nation_share_of_region": q_nation_share_of_region,
        "priority_month_chi2": q_priority_month_chi2,
        "orders_zorder": q_orders_zorder,
        "events_anomalies": q_events_anomalies,
        "inverted_index": q_inverted_index,
        "feature_hashing": q_feature_hashing,
        "negative_edges": q_negative_edges,
        "image_phash_neardup": q_image_phash_neardup,
        "order_cume_dist": q_order_cume_dist,
        "value_mannwhitney_u": q_value_mannwhitney_u,
        "user_pareto": q_user_pareto,
        "orders_zonemap": q_orders_zonemap,
        "dedup_ngram_spans": q_dedup_ngram_spans,
        "neardup_keep_best": q_neardup_keep_best,
        "customer_p90_spend": q_customer_p90_spend,
        "customers_without_urgent_orders": q_customers_without_urgent_orders,
        "customers_all_priorities": q_customers_all_priorities,
        "cumulative_distinct_users": q_cumulative_distinct_users,
        "curation_pipeline": q_curation_pipeline,
        "top3_events_per_user": q_top3_events_per_user,
        "user_event_seq": q_user_event_seq,
        "doc_sample_hash": q_doc_sample_hash,
        "user_event_stats": q_user_event_stats,
        "fold_counts": q_fold_counts,
        "props_stats": q_props_stats,
        "orders_by_month": q_orders_by_month,
        "distinct_langs": q_distinct_langs,
        "lang_stats": q_lang_stats,
        "union_nationkeys": q_union_nationkeys,
        "token_stats": q_token_stats,
        "label_hist": q_label_hist,
        "sample_events": q_sample_events,
        "fold_stats": q_fold_stats,
        "best_fold": q_best_fold,
        "part_type_prefix": q_part_type_prefix,
        "orders_priority_share": q_orders_priority_share,
        "ship_days": q_ship_days,
        "customer_only_nations": q_customer_only_nations,
        "event_gaps": q_event_gaps,
        "term_doc_freq": q_term_doc_freq,
        "value_p90": q_value_p90,
        "bigram_freq": q_bigram_freq,
        "knn_ivf": q_knn_ivf,
        "embedding_neardup": q_embedding_neardup,
        "image_features": q_image_features,
        "video_frames": q_video_frames,
        "audio_chunks": q_audio_chunks,
        "cluster_homogeneity": q_cluster_homogeneity,
        "mention_confusion": q_mention_confusion,
        "kg_edges": q_kg_edges,
        "host_link_graph": q_host_link_graph,
        "anchor_texts": q_anchor_texts,
        "host_pagerank": q_host_pagerank,
        # ---- late-round-3 additions (oracle-backed; next-round window
        # candidates — appended so the attested first-50 window is stable) ----
        "late_order_priority": q_late_order_priority,
        "top_return_customers": q_top_return_customers,
        "part_revenue_share": q_part_revenue_share,
        "supplier_diversity": q_supplier_diversity,
        "churned_high_value": q_churned_high_value,
        "orders_benford": q_orders_benford,
        "nations_intersect_all": q_nations_intersect_all,
        "waiting_suppliers": q_waiting_suppliers,
        "nation_pair_volume": q_nation_pair_volume,
        "top_supplier": q_top_supplier,
        "big_orders": q_big_orders,
        "brand_bracket_revenue": q_brand_bracket_revenue,
        "graph_clustering": q_graph_clustering,
        "segment_spend_skewed": q_segment_spend_skewed,
        "weighted_median": q_weighted_median,
        "graph_walks": q_graph_walks,
        "temperature_mix": q_temperature_mix,
        "mutual_knn": q_mutual_knn,
        "discount_revenue": q_discount_revenue,
        "brand_market_share": q_brand_market_share,
        "cheapest_supplier": q_cheapest_supplier,
        "events_cusum": q_events_cusum,
        "kmv_users": q_kmv_users,
        "rfm_segments": q_rfm_segments,
        "nation_profit": q_nation_profit,
        "returnflag_priority": q_returnflag_priority,
        "promo_revenue": q_promo_revenue,
        "excess_suppliers": q_excess_suppliers,
        "small_qty_revenue": q_small_qty_revenue,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_merges": q_bpe_merges,
        "hdr_quantiles": q_hdr_quantiles,
        "bucketed_join_revenue": q_bucketed_join_revenue,
        "spend_gini": q_spend_gini,
        "pii_redact": q_pii_redact,
        "pii_stats": q_pii_stats,
        "quality_classifier": q_quality_classifier,
        "record_highs": q_record_highs,
        "lm_score": q_lm_score,
        "bm25_search": q_bm25_search,
        "curriculum_pack": q_curriculum_pack,
        "graph_harmonic": q_graph_harmonic,
        "graph_ppr": q_graph_ppr,
        "knn_srp": q_knn_srp,
        "hdr_quantiles_by_type": q_hdr_quantiles_by_type,
        "order_count_distribution": q_order_count_distribution,
        "dsir_importance": q_dsir_importance,
        "graph_neighbor_degree": q_graph_neighbor_degree,
        "coverage_select": q_coverage_select,
        "peak_concurrency": q_peak_concurrency,
        "daily_ohlc": q_daily_ohlc,
        "late_events": q_late_events,
        "daily_locf": q_daily_locf,
        "price_qty_hist2d": q_price_qty_hist2d,
        "event_type_comovement": q_event_type_comovement,
        "merge_upsert": q_merge_upsert,
        "url_canonical_dedup": q_url_canonical_dedup,
        "crawl_frontier": q_crawl_frontier,
        "redirect_resolve": q_redirect_resolve,
        "rendezvous_shards": q_rendezvous_shards,
        "dangling_links": q_dangling_links,
        "robots_filter": q_robots_filter,
    }


_ONES = "[" + ", ".join(["1.0"] * EMBED_DIM) + "]"

_W64 = 1 << 64          # uint64 wraparound modulus
_B59 = 1 << 59          # bucket mask (band_buckets _BUCKET_BITS)
_FNV_P = 1099511628211
_FNV_O = 14695981039346656037


def _lsh_oracle_sql(shingle_expr: str, threshold: float,
                    n_bands: int = 16, num_perm: int = 64,
                    bucket_cap: int = 64, source: str = "documents") -> str:
    """DuckDB replication of functions/dedup.py lsh_near_dup_pairs, bit for
    bit: md5-top-8-byte shingle hash, uint64 linear permutations mod the
    Mersenne prime (minhash_signature_sql), FNV band polynomial → injective
    bucket ids (band_buckets), bucket_cap with the sorted-chain skew fallback,
    exact-Jaccard verify in integer ppm. Assumes no document has an empty
    shingle set (testdata min doc length asserted in tests — same assumption
    as the fingerprint oracle)."""
    from ..functions.textfns import _MH_A, _MH_B

    rows = num_perm // n_bands
    perm_rows = ",\n                ".join(
        f"({p}, {int(_MH_A[p])}, {int(_MH_B[p])})" for p in range(num_perm)
    )
    band_cols = ",\n                   ".join(
        f"MAX(CASE WHEN p % {rows} = {i} THEN v END) AS v{i}" for i in range(rows)
    )
    poly = f"{_FNV_O}::HUGEINT"
    for i in range(rows):
        poly = f"(({poly}) * {_FNV_P} + v{i}) % {_W64}"
    return f"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
            FROM {source}
        ),
        shing AS (
            SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id, unnest({shingle_expr}) AS sh FROM toks)
        ),
        hashes AS (
            SELECT doc_id, ('0x' || substr(md5(sh), 1, 16))::UBIGINT AS h
            FROM shing
        ),
        perms(p, a, b) AS (VALUES
                {perm_rows}),
        sig AS (
            SELECT doc_id, p,
                   MIN(CAST(((CAST(a AS HUGEINT) * h + b) % {_W64})
                            % 2305843009213693951 AS BIGINT)) AS v
            FROM hashes CROSS JOIN perms GROUP BY doc_id, p
        ),
        bandvals AS (
            SELECT doc_id, p // {rows} AS bj,
                   {band_cols}
            FROM sig GROUP BY doc_id, p // {rows}
        ),
        buckets AS (
            SELECT doc_id,
                   CAST(bj AS BIGINT) * {_B59}
                     + CAST(({poly}) % {_B59} AS BIGINT) AS bucket
            FROM bandvals
        ),
        sized AS (
            SELECT bucket, doc_id,
                   COUNT(*) OVER (PARTITION BY bucket) AS n,
                   ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
            FROM buckets
        ),
        cand AS (
            SELECT DISTINCT id_a, id_b FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sized a JOIN sized b
                  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
                WHERE a.n <= {bucket_cap}
                UNION ALL
                SELECT a.doc_id, b.doc_id
                FROM sized a JOIN sized b
                  ON a.bucket = b.bucket AND b.rn = a.rn + 1
                WHERE a.n > {bucket_cap})
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS ns FROM shing GROUP BY doc_id),
        inter AS (
            SELECT c.id_a, c.id_b, COUNT(*) AS ni
            FROM cand c
            JOIN shing sa ON sa.doc_id = c.id_a
            JOIN shing sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
            GROUP BY c.id_a, c.id_b
        )
        SELECT i.id_a, i.id_b,
               CAST((ni * 1000000) // (za.ns + zb.ns - ni) AS BIGINT)
                   AS jaccard_ppm
        FROM inter i
        JOIN sizes za ON za.doc_id = i.id_a
        JOIN sizes zb ON zb.doc_id = i.id_b
        WHERE CAST(ni AS DOUBLE) / (za.ns + zb.ns - ni) >= {threshold}
    """


def _wordpiece_oracle_sql() -> str:
    """DuckDB replication of greedy longest-match WordPiece token COUNTS
    (functions/wordpiece.py): the longest-match table is computed with a
    bounded substring × vocab HASH join (piece lengths ≤ max vocab piece
    length, so candidates are words × positions × ~13 — no nested-loop
    matching), then a recursive CTE follows each word's greedy chain;
    all-or-nothing [UNK] (chain stalls or length > 64 → 1 piece)."""
    from ..functions.wordpiece import _DEFAULT_VOCAB

    pieces, maxlen = [], 0
    with open(_DEFAULT_VOCAB, encoding="utf-8") as fh:
        for line in fh:
            p = line.rstrip("\n")
            pieces.append(p.replace("'", "''"))
            maxlen = max(maxlen, len(p))
    vocab_rows = ", ".join(f"('{p}')" for p in pieces)
    len_rows = ", ".join(f"({l})" for l in range(1, maxlen + 1))
    return f"""
        WITH RECURSIVE vocab(piece) AS (VALUES {vocab_rows}),
        lens(l) AS (VALUES {len_rows}),
        doc_words AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS word
            FROM documents
        ),
        words AS (SELECT DISTINCT word FROM doc_words),
        states AS (
            SELECT word, unnest(range(0, length(word))) AS pos
            FROM words WHERE length(word) <= 64
        ),
        cand AS (
            SELECT st.word, st.pos, lens.l,
                   CASE WHEN st.pos = 0 THEN substr(st.word, 1, lens.l)
                        ELSE '##' || substr(st.word, st.pos + 1, lens.l)
                   END AS key
            FROM states st CROSS JOIN lens
            WHERE st.pos + lens.l <= length(st.word)
        ),
        best AS (
            SELECT c.word, c.pos, MAX(c.l) AS adv
            FROM cand c JOIN vocab v ON v.piece = c.key
            GROUP BY c.word, c.pos
        ),
        seg AS (
            SELECT word, 0 AS pos, 0 AS n FROM words WHERE length(word) <= 64
            UNION ALL
            SELECT s.word, s.pos + b.adv, s.n + 1
            FROM seg s JOIN best b ON b.word = s.word AND b.pos = s.pos
            WHERE s.pos < length(s.word)
        ),
        wordn AS (
            SELECT w.word,
                   CASE WHEN length(w.word) > 64 THEN 1
                        WHEN f.endpos = length(w.word) THEN f.n
                        ELSE 1 END AS n_pieces
            FROM words w LEFT JOIN (
                SELECT word, MAX(pos) AS endpos, arg_max(n, pos) AS n
                FROM seg GROUP BY word
            ) f ON f.word = w.word
        )
        SELECT d.doc_id, CAST(COALESCE(agg.s, 0) AS BIGINT) AS n_subwords
        FROM documents d LEFT JOIN (
            SELECT dw.doc_id, SUM(wn.n_pieces) AS s
            FROM doc_words dw JOIN wordn wn ON wn.word = dw.word
            GROUP BY dw.doc_id
        ) agg ON agg.doc_id = d.doc_id
    """


_WORD3_SHINGLES = """CASE
                    WHEN len(ws) >= 3 THEN list_transform(
                        range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
                    WHEN len(ws) >= 1 THEN [array_to_string(ws, ' ')]
                    ELSE CAST([] AS VARCHAR[]) END"""


def _kmeans_oracle_sql(k: int = 8, n_iters: int = 3) -> str:
    """DuckDB replication of functions/kmeans.py kmeans_fixed: quantize with
    the identical IEEE double ops, seed from the k lowest vec_ids, unroll
    ``n_iters`` (assign → update) rounds as CTEs (graph_pagerank's trick),
    final assignment against the settled centroids. Ties broken by lowest
    cluster index on both sides; ``//`` operands are strictly positive by
    construction so truncation == floor."""
    from ..functions.kmeans import KM_OFFSET, KM_SCALE

    parts = [f"""q AS (
      SELECT vec_id, dim,
             CAST(floor((CAST(v AS DOUBLE) + {KM_OFFSET}) * {KM_SCALE}) AS BIGINT) AS x
      FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                   unnest(embedding) AS v FROM embeddings)),
    seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cj
              FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
    c0 AS (SELECT s.cj, q.dim, q.x AS c FROM seeds s JOIN q USING (vec_id))"""]
    for r in range(1, n_iters + 1):
        parts.append(f"""d{r} AS (
        SELECT q.vec_id, c.cj, SUM((q.x - c.c) * (q.x - c.c)) AS d
        FROM q JOIN c{r - 1} c USING (dim) GROUP BY q.vec_id, c.cj),
    a{r} AS (SELECT vec_id, cj FROM (
          SELECT vec_id, cj,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cj) AS rn
          FROM d{r}) WHERE rn = 1),
    n{r} AS (SELECT a.cj, q.dim, CAST(SUM(q.x) // COUNT(*) AS BIGINT) AS c
        FROM a{r} a JOIN q USING (vec_id) GROUP BY a.cj, q.dim),
    c{r} AS (SELECT p.cj, p.dim, COALESCE(n.c, p.c) AS c
        FROM c{r - 1} p LEFT JOIN n{r} n ON n.cj = p.cj AND n.dim = p.dim)""")
    parts.append(f"""df AS (
        SELECT q.vec_id, c.cj, SUM((q.x - c.c) * (q.x - c.c)) AS d
        FROM q JOIN c{n_iters} c USING (dim) GROUP BY q.vec_id, c.cj)""")
    return "WITH " + ",\n    ".join(parts) + """
    SELECT vec_id, cj AS cluster FROM (
      SELECT vec_id, cj,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cj) AS rn
      FROM df) WHERE rn = 1"""


def _zorder_oracle_sql() -> str:
    """Morton interleave unrolled to 32 integer terms — bit i of zx lands at
    position 2i, bit i of zy at 2i+1, exactly mirroring q_orders_zorder's
    shift loop."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((zx // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((zy // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    interleave = " + ".join(terms)
    return f"""
        WITH b AS (SELECT o_orderkey,
               LEAST(GREATEST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                              // 4096, 0), 65535) AS zx,
               LEAST(GREATEST(CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT)
                              - 9131, 0), 65535) AS zy
               FROM orders)
        SELECT o_orderkey, zx, zy,
               CAST({interleave} AS BIGINT) AS zvalue
        FROM b
    """


_PII_TEXT_SQL = """
            SELECT c_custkey,
                   CASE c_custkey % 3
                     WHEN 0 THEN 'reach ' || c_name || ' at cust'
                          || c_custkey || '@example.com or 555-'
                          || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR),
                                  3, '0')
                          || '-'
                          || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR),
                                  4, '0')
                     WHEN 1 THEN c_name || ' logged in from 10.'
                          || (c_custkey % 256) || '.'
                          || ((c_custkey // 256) % 256) || '.'
                          || (c_custkey % 250)
                          || ' while browsing ' || c_mktsegment
                     ELSE 'no contact on file for ' || c_name || ' in '
                          || c_mktsegment
                   END AS text
            FROM customer
"""


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    """ANSI-SQL oracle per oracle-backed queries() entry.

    ``sf_dir`` parameterizes ONLY the web-family oracles, whose gold tables
    live in the sf-keyed synthetic-pages cache (everything else reads the
    driver's pre-registered views). The default matches the driver's sf0.01
    correctness run — the driver calls ``oracle_sql()`` with no arguments;
    tests/tools comparing at another sf pass their own sf_dir so the Ray
    side and the oracle read the SAME fixture. Building the dict ensures
    the fixture (pages + gold tables + robots cache) exists — generation is
    deterministic and sentinel-cached."""
    from ..functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE
    from ..sources.pages import write_robots

    pdir = _synthetic_pages_dir(sf_dir)
    if not os.path.exists(os.path.join(pdir, "robots.parquet")):
        write_robots(pdir, seed=42)
    web = _web_oracle_sqls(pdir)

    return {
        **web,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   COUNT(*) AS n_items
            FROM lineitem GROUP BY 1, 2
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "customer_by_nation": """
            SELECT n_name, COUNT(*) AS n_customers,
                   CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "events_hourly": """
            SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS window_id, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "user_event_stats": """
            SELECT user_id, event_type, COUNT(*) AS n,
                   MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS max_value_cents
            FROM events GROUP BY 1, 2
        """,
        "fold_counts": """
            SELECT doc_id % 5 AS fold, COUNT(*) AS n_docs FROM documents GROUP BY 1
        """,
        "doc_sample_hash": """
            SELECT doc_id FROM documents WHERE md5(CAST(doc_id AS VARCHAR)) < '2'
        """,
        "top_event_per_user": """
            SELECT user_id, event_id FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id
            ) = 1
        """,
        "props_stats": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), 0)) AS BIGINT)
                       AS sum_k
            FROM events GROUP BY event_type
        """,
        "orders_by_month": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM orders GROUP BY 1
        """,
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "lang_stats": """
            SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "word_freq": """
            SELECT w AS token, COUNT(*) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
                  FROM documents)
            GROUP BY w HAVING COUNT(*) >= 5
        """,
        "exact_dedup": """
            SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "union_nationkeys": """
            SELECT DISTINCT k FROM (
                SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
                UNION ALL
                SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier)
        """,
        "token_stats": """
            SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len,
                   CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "label_hist": """
            SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n FROM embeddings GROUP BY 1
        """,
        "sample_events": """
            SELECT event_id, event_type FROM events WHERE event_id % 20 = 0
        """,
        "nations_without_suppliers": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
            WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
        """,
        "click_after_purchase": """
            SELECT c.event_id AS click_id, p.event_id AS purchase_id
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
            ASOF JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "fold_stats": """
            SELECT fold, n AS n_docs,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_chars,
                   CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var_chars
            FROM (SELECT doc_id % 5 AS fold, COUNT(*) AS n,
                         CAST(SUM(n_chars) AS BIGINT) AS s,
                         CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
                  FROM documents GROUP BY 1)
        """,
        "best_fold": """
            SELECT fold, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_chars
            FROM (SELECT doc_id % 5 AS fold, COUNT(*) AS n,
                         CAST(SUM(n_chars) AS BIGINT) AS s
                  FROM documents GROUP BY 1)
            ORDER BY mean_chars DESC, fold LIMIT 1
        """,
        "part_type_prefix": """
            SELECT upper(split_part(p_type, ' ', 1)) AS type_prefix,
                   COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS sum_size
            FROM part GROUP BY 1
        """,
        "orders_priority_share": """
            SELECT o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_big
            FROM orders GROUP BY 1
        """,
        "ship_days": """
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(CAST(date_diff('day', TIMESTAMP '1995-01-01',
                                           l_shipdate) AS BIGINT)) AS BIGINT) AS sum_days
            FROM lineitem GROUP BY 1
        """,
        "customer_order_counts": """
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                   CAST(COUNT(o_custkey) AS BIGINT) AS n_orders
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "customers_with_orders": """
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "bloom_semi_orders": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
            GROUP BY 1
        """,
        "user_sessions": """
            SELECT user_id, COUNT(*) AS n_events,
                   CAST(1 + SUM(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sessions
            FROM (SELECT user_id, epoch(ts) - lag(epoch(ts))
                           OVER (PARTITION BY user_id ORDER BY ts) AS gap_s
                  FROM events)
            GROUP BY user_id
        """,
        "order_rank": """
            SELECT o_orderkey, CAST(rn AS BIGINT) AS rank FROM (
                SELECT o_orderkey, ROW_NUMBER() OVER (
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
        """,
        "events_sliding": """
            SELECT window_id, event_type, COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM (
                SELECT unnest([h, h - 1]) AS window_id, event_type, value
                FROM (SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
                             event_type, value
                      FROM events)
            ) GROUP BY 1, 2
        """,
        "value_median": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(median(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                       AS median_cents
            FROM events GROUP BY 1
        """,
        "orders_rollup": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                   COALESCE(month, 'ALL') AS month,
                   COUNT(*) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS total_cents
            FROM (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
                         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                  FROM orders)
            GROUP BY GROUPING SETS ((o_orderpriority, month), (o_orderpriority), ())
        """,
        "running_total": """
            SELECT event_id,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
            FROM events
        """,
        "revenue_by_region": """
            SELECT r_name, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "purchase_clicks_window": """
            SELECT c.event_id AS click_id, p.event_id AS purchase_id
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
            JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
             AND epoch_us(c.ts) - epoch_us(p.ts) <= 86400000000
        """,
        "bigram_freq": """
            SELECT bg AS bigram, COUNT(*) AS n FROM (
                SELECT unnest(list_transform(range(1, len(ws)),
                                             i -> ws[i] || ' ' || ws[i + 1])) AS bg
                FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                      FROM documents)
            ) GROUP BY bg HAVING COUNT(*) >= 5
        """,
        # score = tf/df is ONE exactly-rounded IEEE division on both sides,
        # so the ordering (score DESC, term ASC) agrees bit-for-bit
        "tfidf_top_terms": f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                FROM documents),
            df AS (
                SELECT token, COUNT(*) AS df
                FROM (SELECT DISTINCT doc_id, token FROM tok)
                GROUP BY token HAVING COUNT(*) >= {_TFIDF_MIN_DF}),
            tf AS (
                SELECT doc_id, token, COUNT(*) AS tf FROM tok
                GROUP BY doc_id, token)
            SELECT doc_id, token AS term, tf, df, rank FROM (
                SELECT t.doc_id, t.token, t.tf, d.df,
                       ROW_NUMBER() OVER (
                           PARTITION BY t.doc_id
                           ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.token
                       ) AS rank
                FROM tf t JOIN df d USING (token)
            ) WHERE rank <= {_TFIDF_TOP}
        """,
        "normalized_dedup": r"""
            SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
                   MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        # PMI ordering with corpus-size terms constant reduces to
        # n_xy/(n_x*n_y); the double expression is written identically on
        # both sides (one multiply, one divide) so ties agree exactly
        "pmi_bigrams": f"""
            WITH toks AS (
                SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents),
            uni AS (
                SELECT w AS token, COUNT(*) AS n
                FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
            bi AS (
                SELECT bg AS bigram, COUNT(*) AS n_xy FROM (
                    SELECT unnest(list_transform(range(1, len(ws)),
                                                 i -> ws[i] || ' ' || ws[i + 1])) AS bg
                    FROM toks)
                GROUP BY bg HAVING COUNT(*) >= {_PMI_MIN_N})
            SELECT bigram, n_xy, n_x, n_y, rank FROM (
                SELECT b.bigram, b.n_xy, ux.n AS n_x, uy.n AS n_y,
                       ROW_NUMBER() OVER (
                           ORDER BY CAST(b.n_xy AS DOUBLE)
                                    / (CAST(ux.n AS DOUBLE) * CAST(uy.n AS DOUBLE))
                                    DESC,
                                    b.bigram
                       ) AS rank
                FROM bi b
                JOIN uni ux ON ux.token = string_split(b.bigram, ' ')[1]
                JOIN uni uy ON uy.token = string_split(b.bigram, ' ')[2]
            ) WHERE rank <= {_PMI_TOP}
        """,
        # bucket = bit_length(n_tokens) - 1, pure-integer via bin();
        # empty docs pinned to bucket -1 on both sides
        "length_buckets": """
            SELECT lang,
                   CASE WHEN n_tokens = 0 THEN -1
                        ELSE CAST(length(bin(n_tokens)) - 1 AS BIGINT)
                   END AS bucket,
                   COUNT(*) AS n_docs
            FROM (SELECT lang,
                         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
                  FROM documents)
            GROUP BY 1, 2
        """,
        # HLL registers: bucket = top 8 md5 bits, rho = 57 - bit_length of
        # the 56-bit remainder (bin() is minimal-width, so length(bin(x)) ==
        # bit_length(x) for x > 0; the rem = 0 case pins rho = 57)
        "hll_users": f"""
            WITH h AS (
                SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
                FROM events),
            r AS (
                SELECT CAST(h >> 56 AS BIGINT) AS bucket,
                       CAST(h & CAST({(1 << 56) - 1} AS UBIGINT) AS BIGINT) AS rem
                FROM h)
            SELECT bucket,
                   MAX(57 - CASE WHEN rem = 0 THEN 0
                                 ELSE length(bin(rem)) END) AS rho
            FROM r GROUP BY bucket
        """,
        # HLL merge law: the union sketch is the per-bucket MAX of the two
        # sides' registers — same md5/bucket/rho convention as hll_users
        "hll_join_card": f"""
            WITH ha AS (
                SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 16))::UBIGINT AS h
                FROM orders),
            ra AS (
                SELECT CAST(h >> 56 AS BIGINT) AS bucket,
                       MAX(57 - CASE WHEN (h & CAST({(1 << 56) - 1} AS UBIGINT)) = 0 THEN 0
                                     ELSE length(bin(CAST(h & CAST({(1 << 56) - 1} AS UBIGINT) AS BIGINT)))
                                END) AS rho
                FROM ha GROUP BY 1),
            hb AS (
                SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 16))::UBIGINT AS h
                FROM customer),
            rb AS (
                SELECT CAST(h >> 56 AS BIGINT) AS bucket,
                       MAX(57 - CASE WHEN (h & CAST({(1 << 56) - 1} AS UBIGINT)) = 0 THEN 0
                                     ELSE length(bin(CAST(h & CAST({(1 << 56) - 1} AS UBIGINT) AS BIGINT)))
                                END) AS rho
                FROM hb GROUP BY 1)
            SELECT 'a' AS side, bucket, rho FROM ra
            UNION ALL SELECT 'b' AS side, bucket, rho FROM rb
            UNION ALL
            SELECT 'u' AS side, bucket, MAX(rho) AS rho
            FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 2
        """,
        # grouped HLL: same md5/bucket/rho convention as hll_users, keyed by
        # event_type — COUNT(DISTINCT)-per-group as a 256-row-per-group sketch
        "hll_per_type": f"""
            WITH h AS (
                SELECT event_type,
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
                FROM events),
            r AS (
                SELECT event_type, CAST(h >> 56 AS BIGINT) AS bucket,
                       CAST(h & CAST({(1 << 56) - 1} AS UBIGINT) AS BIGINT) AS rem
                FROM h)
            SELECT event_type, bucket,
                   MAX(57 - CASE WHEN rem = 0 THEN 0
                                 ELSE length(bin(rem)) END) AS rho
            FROM r GROUP BY event_type, bucket
        """,
        # exact product-moment covariance: HUGEINT combine of int64 partial
        # sums; // truncates toward zero in DuckDB — the engine mirrors that
        "price_qty_cov": """
            WITH m AS (
                SELECT l_returnflag,
                       CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                       CAST(floor(l_extendedprice) AS BIGINT) AS y
                FROM lineitem)
            SELECT l_returnflag,
                   COUNT(*) AS n_rows,
                   CAST(CAST(COUNT(*) AS HUGEINT) * SUM(x * y)
                        - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
                   CAST((CAST(COUNT(*) AS HUGEINT) * SUM(x * y)
                         - SUM(x) * SUM(y))
                        // (CAST(COUNT(*) AS HUGEINT) * COUNT(*)) AS BIGINT)
                       AS cov_avg
            FROM m GROUP BY l_returnflag
        """,
        # equi-depth decile boundaries at ranks floor(n*d/10) under the
        # total order (cents, orderkey)
        "price_deciles": """
            WITH c AS (
                SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                       o_orderkey
                FROM orders),
            r AS (
                SELECT cents,
                       ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn
                FROM c),
            n AS (SELECT COUNT(*) AS cnt FROM orders)
            SELECT ds.d AS decile, r.cents AS boundary_cents
            FROM (SELECT UNNEST(range(1, 10)) AS d) ds
            CROSS JOIN n
            JOIN r ON r.rn = (n.cnt * ds.d) // 10
        """,
        # fixed-point exponential decay: cents >> age == cents // 2^age for
        # cents >= 0 (events.value > 0 in the testdata generator)
        "decayed_clicks": """
            WITH a AS (SELECT MAX(epoch_us(ts)) AS ts0 FROM events),
            c AS (
                SELECT user_id,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                       LEAST((a.ts0 - epoch_us(ts)) // 86400000000, 62) AS age
                FROM events CROSS JOIN a
                WHERE event_type = 'click')
            SELECT user_id, COUNT(*) AS n_clicks,
                   CAST(SUM(cents // (1::BIGINT << CAST(age AS INTEGER)))
                        AS BIGINT) AS decayed_cents
            FROM c GROUP BY user_id
        """,
        "nation_presence_outer": """
            WITH c AS (
                SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_cust
                FROM customer WHERE c_custkey <= 50 GROUP BY 1),
            s AS (
                SELECT CAST(s_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_supp
                FROM supplier WHERE s_suppkey <= 50 GROUP BY 1)
            SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                   COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
            FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        """,
        # CMS counters: column j hash = md5('j:' || value) — only observed
        # cells emitted, matching the engine's nonzero filter
        "cms_users": """
            WITH rows_j AS (
                SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                           || CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
                FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j))
            SELECT CAST(j AS BIGINT) AS j, CAST(h % 256 AS BIGINT) AS col,
                   COUNT(*) AS n
            FROM rows_j GROUP BY 1, 2
        """,
        # eval set = docs with doc_id < 20; 8-grams unrolled as || chains
        "decontamination": f"""
            WITH tok AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents),
            ng AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws) - {_DECON_N - 2}),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                                || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5]
                                || ' ' || ws[i+6] || ' ' || ws[i+7])) AS g
                FROM tok),
            bench AS (SELECT DISTINCT g FROM ng WHERE doc_id < {_DECON_BENCH_IDS})
            SELECT doc_id, COUNT(DISTINCT g) AS n_overlap
            FROM ng JOIN bench USING (g)
            WHERE doc_id >= {_DECON_BENCH_IDS}
            GROUP BY doc_id
        """,
        "repetition_stats": """
            WITH tok AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents),
            bi AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                                             i -> ws[i] || ' ' || ws[i+1])) AS bg
                FROM tok),
            top AS (
                SELECT doc_id, MAX(c) AS top_bigram_n
                FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg)
                GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(len(t.ws) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(t.ws)) AS BIGINT) AS n_distinct,
                   CAST(COALESCE(top.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
            FROM tok t LEFT JOIN top USING (doc_id)
        """,
        # duplicated-8-gram fraction: same md5-top-8-byte gram hash as the
        # engine (collisions, were any to occur, would affect both sides
        # identically); only integer counts reach the output
        "dup_ngram_fraction": f"""
            WITH tok AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents),
            grams AS (
                SELECT DISTINCT doc_id,
                       ('0x' || substr(md5(g), 1, 16))::UBIGINT AS h
                FROM (SELECT doc_id,
                             unnest(list_transform(
                                 range(1, len(ws) - {_DUPNG_N - 2}),
                                 i -> array_to_string(ws[i:i+{_DUPNG_N - 1}], ' ')))
                                 AS g
                      FROM tok)),
            cnts AS (SELECT h, COUNT(*) AS nd FROM grams GROUP BY h),
            per AS (
                SELECT g.doc_id, COUNT(*) AS n_ngrams,
                       SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS n_shared
                FROM grams g JOIN cnts c ON c.h = g.h
                GROUP BY g.doc_id)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_ngrams AS BIGINT) AS n_ngrams,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(n_shared * 1000000 // n_ngrams AS BIGINT) AS shared_ppm
            FROM per
        """,
        # exact-substring span removal: same md5-top-8-byte gram identity as
        # dup_ngram_fraction; coverage = windowed MAX over flagged gram
        # starts; kept text re-joined with string_agg
        "dedup_ngram_spans": f"""
            WITH tok AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p,
                       unnest(ws) AS tk
                FROM tok),
            starts AS (
                SELECT doc_id,
                       unnest(range(1, len(ws) - {_DUPNG_N - 2})) AS p,
                       unnest(list_transform(
                           range(1, len(ws) - {_DUPNG_N - 2}),
                           i -> ('0x' || substr(md5(array_to_string(
                                    ws[i:i+{_DUPNG_N - 1}], ' ')), 1, 16))::UBIGINT))
                           AS h
                FROM tok),
            cnt AS (
                SELECT h FROM (SELECT DISTINCT doc_id, h FROM starts)
                GROUP BY h HAVING COUNT(*) >= 2),
            flag AS (
                SELECT s.doc_id, s.p, 1 AS f
                FROM starts s JOIN cnt c ON c.h = s.h),
            cov AS (
                SELECT t.doc_id, t.p, t.tk,
                       MAX(COALESCE(f.f, 0)) OVER (
                           PARTITION BY t.doc_id ORDER BY t.p
                           ROWS BETWEEN {_DUPNG_N - 1} PRECEDING AND CURRENT ROW)
                           AS covered
                FROM pos t LEFT JOIN flag f ON f.doc_id = t.doc_id AND f.p = t.p)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(covered) AS BIGINT) AS n_removed,
                   COALESCE(string_agg(CASE WHEN covered = 0 THEN tk END,
                                       ' ' ORDER BY p), '') AS kept_text
            FROM cov GROUP BY doc_id
        """,
        # full dedup decision: the banded-LSH pair plan replication composed
        # with the min-label reachability fixpoint (graph_components shape) —
        # keep row <=> doc_id == keep_id
        "neardup_keep": f"""
            WITH RECURSIVE pairs AS ({_lsh_oracle_sql(_WORD3_SHINGLES, 0.8)}),
            docs AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
            s AS (SELECT CAST(id_a AS BIGINT) AS src, CAST(id_b AS BIGINT) AS dst
                  FROM pairs
                  UNION
                  SELECT CAST(id_b AS BIGINT), CAST(id_a AS BIGINT) FROM pairs),
            reach(node, lbl) AS (
                SELECT DISTINCT src, src FROM s
                UNION
                SELECT s2.dst, r.lbl FROM reach r JOIN s s2 ON s2.src = r.node
            ),
            comp AS (SELECT node, MIN(lbl) AS rep FROM reach GROUP BY node)
            SELECT d.id AS doc_id, CAST(COALESCE(c.rep, d.id) AS BIGINT) AS keep_id
            FROM docs d LEFT JOIN comp c ON c.node = d.id
        """,
        # quality-weighted representative: same LSH + recursive-CC labels,
        # keeper = ROW_NUMBER() argmax on (ntok DESC, doc_id) per component
        "neardup_keep_best": f"""
            WITH RECURSIVE pairs AS ({_lsh_oracle_sql(_WORD3_SHINGLES, 0.8)}),
            docs AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
            s AS (SELECT CAST(id_a AS BIGINT) AS src, CAST(id_b AS BIGINT) AS dst
                  FROM pairs
                  UNION
                  SELECT CAST(id_b AS BIGINT), CAST(id_a AS BIGINT) FROM pairs),
            reach(node, lbl) AS (
                SELECT DISTINCT src, src FROM s
                UNION
                SELECT s2.dst, r.lbl FROM reach r JOIN s s2 ON s2.src = r.node
            ),
            comp AS (SELECT node, MIN(lbl) AS rep FROM reach GROUP BY node),
            lab AS (
                SELECT d.id AS doc_id, CAST(COALESCE(c.rep, d.id) AS BIGINT) AS comp
                FROM docs d LEFT JOIN comp c ON c.node = d.id),
            tokn AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS ntok
                FROM documents),
            best AS (
                SELECT comp, doc_id AS keep_id FROM (
                    SELECT l.comp, l.doc_id,
                           ROW_NUMBER() OVER (PARTITION BY l.comp
                                              ORDER BY t.ntok DESC, l.doc_id) AS rn
                    FROM lab l JOIN tokn t ON t.doc_id = l.doc_id)
                WHERE rn = 1)
            SELECT l.doc_id, CAST(b.keep_id AS BIGINT) AS keep_id
            FROM lab l JOIN best b ON b.comp = l.comp
        """,
        # SCD-2 as-of join: latest dimension version with eff_day <= order day
        # (merge_asof backward is inclusive, matching <=); day boundaries are
        # exact because order timestamps are midnight-aligned
        "scd_segment_orders": f"""
            WITH dim AS (
                SELECT CAST(c_custkey AS BIGINT) AS k, CAST(0 AS BIGINT) AS eff_day,
                       c_mktsegment AS seg FROM customer
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT),
                       {_SCD_DAY0} + CAST(c_custkey AS BIGINT) % 1500,
                       'UPGRADED-' || c_mktsegment FROM customer),
            o AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS k,
                         datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS d
                  FROM orders),
            ranked AS (
                SELECT o.o_orderkey, dim.seg,
                       ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                                          ORDER BY dim.eff_day DESC) AS rn
                FROM o JOIN dim ON dim.k = o.k AND dim.eff_day <= o.d)
            SELECT seg AS segment, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM ranked WHERE rn = 1 GROUP BY seg
        """,
        # graph family: co-purchase edges (u, v, n) = parts sharing n orders.
        # All outputs are exact integers; the PageRank oracle replicates the
        # engine's scaled-integer arithmetic op for op (floor division), so
        # even the iterative query hash-matches bit-for-bit.
        "graph_degree": f"""
            WITH e AS ({_co_edges_sql(1)}),
            d AS (SELECT node, COUNT(*) AS degree FROM
                  (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
                  GROUP BY node)
            SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY degree
        """,
        # wedge count follows the engine's degree-ordered orientation
        # (Σ C(outdeg, 2)); the triangle 3-join is orientation-independent
        "graph_triangles": f"""
            WITH e AS ({_co_edges_sql(1)}),
            d AS (SELECT node, COUNT(*) AS degree FROM
                  (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
                  GROUP BY node),
            o AS (SELECT CASE WHEN du.degree < dv.degree
                               OR (du.degree = dv.degree AND e.u < e.v)
                              THEN e.u ELSE e.v END AS src
                  FROM e JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v)
            SELECT (SELECT COUNT(*) FROM d) AS n_nodes,
                   (SELECT COUNT(*) FROM e) AS n_edges,
                   (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT)
                    FROM (SELECT COUNT(*) AS c FROM o GROUP BY src)) AS n_wedges,
                   (SELECT COUNT(*) FROM e e1
                    JOIN e e2 ON e2.u = e1.v
                    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
        """,
        # min-label reachability fixpoint == the engine's min-label
        # propagation/union-find (comp = min node id in the component)
        "graph_components": f"""
            WITH RECURSIVE e AS ({_co_edges_sql(3)}),
            s AS (SELECT u AS src, v AS dst FROM e
                  UNION ALL SELECT v AS src, u AS dst FROM e),
            reach(node, lbl) AS (
                SELECT DISTINCT src, src FROM s
                UNION
                SELECT s2.dst, r.lbl FROM reach r JOIN s s2 ON s2.src = r.node
            )
            SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node
        """,
        "component_size_hist": f"""
            WITH RECURSIVE e AS ({_co_edges_sql(3)}),
            s AS (SELECT u AS src, v AS dst FROM e
                  UNION ALL SELECT v AS src, u AS dst FROM e),
            reach(node, lbl) AS (
                SELECT DISTINCT src, src FROM s
                UNION
                SELECT s2.dst, r.lbl FROM reach r JOIN s s2 ON s2.src = r.node
            ),
            comp AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node),
            cs AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n
                   FROM comp GROUP BY 1)
            SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_comps,
                   CAST(SUM(n) AS BIGINT) AS n_nodes
            FROM cs GROUP BY 1
        """,
        "graph_pagerank": _pagerank_sql(),
        "graph_ppr": _ppr_sql(),
        # 3 unrolled BFS relaxation rounds from the min node — each CTE is
        # labels ∪ (neighbors, hops+1) reduced by MIN, exactly the
        # hash_join + grouped-Min rounds of functions/graph.khop_distances
        "graph_khop": f"""
            WITH e AS ({_co_edges_sql(2)}),
            sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
            seed AS (SELECT MIN(u) AS s FROM sym),
            d0 AS (SELECT s AS node, 0 AS hops FROM seed),
            d1 AS (SELECT node, MIN(hops) AS hops FROM (
                     SELECT node, hops FROM d0
                     UNION ALL SELECT sym.v, 1 FROM sym JOIN d0 ON sym.u = d0.node)
                   GROUP BY node),
            d2 AS (SELECT node, MIN(hops) AS hops FROM (
                     SELECT node, hops FROM d1
                     UNION ALL SELECT sym.v, d1.hops + 1
                     FROM sym JOIN d1 ON sym.u = d1.node) GROUP BY node),
            d3 AS (SELECT node, MIN(hops) AS hops FROM (
                     SELECT node, hops FROM d2
                     UNION ALL SELECT sym.v, d2.hops + 1
                     FROM sym JOIN d2 ON sym.u = d2.node) GROUP BY node)
            SELECT CAST(node AS BIGINT) AS node, CAST(hops AS BIGINT) AS hops
            FROM d3
        """,
        # wedge join through shared centers, adjacency excluded — the plain
        # relational statement of common_neighbor_pairs' bucketed plan
        "link_predict": f"""
            WITH e AS ({_co_edges_sql(2)}),
            sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
            w AS (
                SELECT s1.v AS id_a, s2.v AS id_b,
                       CAST(COUNT(*) AS BIGINT) AS common_neighbors
                FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, common_neighbors FROM w
            WHERE common_neighbors >= 2
              AND NOT EXISTS (SELECT 1 FROM e
                              WHERE e.u = w.id_a AND e.v = w.id_b)
        """,
        # 3 unrolled peel rounds: degree → keep(deg>=2) → edge semi-join,
        # exactly kcore_peel's degree_table + two hash_join rounds
        "kcore": f"""
            WITH e0 AS (SELECT u, v FROM ({_co_edges_sql(2)})),
            d1 AS (SELECT node, COUNT(*) AS deg FROM
                     (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
                   GROUP BY node),
            e1 AS (SELECT u, v FROM e0
                   WHERE u IN (SELECT node FROM d1 WHERE deg >= 2)
                     AND v IN (SELECT node FROM d1 WHERE deg >= 2)),
            d2 AS (SELECT node, COUNT(*) AS deg FROM
                     (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
                   GROUP BY node),
            e2 AS (SELECT u, v FROM e1
                   WHERE u IN (SELECT node FROM d2 WHERE deg >= 2)
                     AND v IN (SELECT node FROM d2 WHERE deg >= 2)),
            d3 AS (SELECT node, COUNT(*) AS deg FROM
                     (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
                   GROUP BY node),
            e3 AS (SELECT u, v FROM e2
                   WHERE u IN (SELECT node FROM d3 WHERE deg >= 2)
                     AND v IN (SELECT node FROM d3 WHERE deg >= 2))
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
            GROUP BY node
        """,
        # keeper = global min doc_id per md5; per-source dup attribution —
        # the Ray plan resolves keepers inside coarse md5-hash buckets
        "domain_dup_rate": """
            WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
            k AS (SELECT h, MIN(doc_id) AS keeper FROM h GROUP BY h)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN h.doc_id != k.keeper
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
            FROM h JOIN k USING (h) GROUP BY source
        """,
        # vocabulary = phi-frequent words (cnt*41 > N); per-doc OOV ppm via
        # explode + LEFT JOIN (docs with zero tokens keep oov_ppm = 0)
        "word_commonness": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
                FROM documents
            ),
            vocab AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w)
            SELECT t.doc_id,
                   CAST(SUM(v.cnt) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(v.cnt) // COUNT(*) AS BIGINT) AS commonness
            FROM toks t JOIN vocab v ON v.w = t.w
            GROUP BY t.doc_id
        """,
        "weighted_sample": f"""
            SELECT doc_id, w, priority,
                   CAST(row_number() OVER (ORDER BY priority, doc_id)
                        AS BIGINT) AS rk
            FROM (
                SELECT doc_id,
                       CAST(length(text) + 1 AS BIGINT) AS w,
                       CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                                 ::UBIGINT >> 2) AS BIGINT)
                           // (length(text) + 1) AS priority
                FROM documents)
            ORDER BY priority, doc_id LIMIT {_WS_K}
        """,
        "oov_rate": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents
            ),
            w AS (SELECT unnest(ws) AS w FROM toks),
            tot AS (SELECT COUNT(*) AS n FROM w),
            v AS (SELECT c.w FROM
                    (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w) c, tot
                  WHERE c.cnt * 41 > tot.n),
            t AS (SELECT doc_id, unnest(ws) AS w FROM toks),
            oovc AS (
                SELECT t.doc_id, COUNT(*) AS n,
                       SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS oov
                FROM t LEFT JOIN v ON t.w = v.w GROUP BY t.doc_id
            )
            SELECT toks.doc_id,
                   CAST(COALESCE(oovc.n, 0) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN COALESCE(oovc.n, 0) = 0 THEN 0
                             ELSE (oovc.oov * 1000000) // oovc.n
                        END AS BIGINT) AS oov_ppm
            FROM toks LEFT JOIN oovc ON toks.doc_id = oovc.doc_id
        """,
        # heavy_hitters_exact's verified output is batch-independent, so the
        # oracle is the plain global threshold — no plan replication
        "heavy_hitters": """
            WITH w AS (
                SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS word
                FROM documents
            ),
            tot AS (SELECT COUNT(*) AS n FROM w),
            c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM w GROUP BY word)
            SELECT word, cnt FROM c, tot WHERE cnt * 41 > tot.n
        """,
        # the two snapshots derive deterministically from orders; the exact
        # integer rowhash (cents*4 + status_code) makes 'changed' replicable
        "snapshot_delta": """
            WITH base AS (
                SELECT o_orderkey AS k,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                       CASE o_orderstatus WHEN 'F' THEN 0
                                          WHEN 'O' THEN 1 ELSE 2 END AS sc
                FROM orders
            ),
            oldv AS (SELECT k, c * 4 + sc AS h FROM base WHERE k % 10 != 3),
            newv AS (SELECT k,
                            (c + CASE WHEN k % 10 = 5 THEN 100 ELSE 0 END)
                                * 4 + sc AS h
                     FROM base WHERE k % 10 != 7)
            SELECT CAST(COALESCE(o.k, n.k) AS BIGINT) AS o_orderkey,
                   CASE WHEN o.k IS NULL THEN 'added'
                        WHEN n.k IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM oldv o FULL OUTER JOIN newv n ON o.k = n.k
            WHERE o.k IS NULL OR n.k IS NULL OR o.h <> n.h
        """,
        # the stopword-profile language heuristic is an argmax over four
        # occurrence counts — ties prefer the earlier profile (en,de,fr,es),
        # all-zero → 'und', exactly the lang_id() loop semantics
        "langid": """
            SELECT doc_id, CASE
                WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS detected_lang
            FROM (
                SELECT doc_id,
                       len(list_filter(ws, x -> list_contains(
                           ['the','and','of','to','is','was','in','for','that','with'], x))) AS s_en,
                       len(list_filter(ws, x -> list_contains(
                           ['der','die','das','und','ist','von','mit','für','nicht','ein'], x))) AS s_de,
                       len(list_filter(ws, x -> list_contains(
                           ['le','la','les','et','est','des','dans','pour','une','que'], x))) AS s_fr,
                       len(list_filter(ws, x -> list_contains(
                           ['el','la','los','y','es','de','en','por','una','que'], x))) AS s_es
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-zäöüßéèêàçñ]+') AS ws
                      FROM documents)
            )
        """,
        # quality features are plain arithmetic over regex token lists —
        # expressible in SQL with identical IEEE double expressions
        "quality": """
            SELECT doc_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / n_tokens
                        ELSE 0.0 END AS mean_token_len,
                   CASE WHEN n_chars > 0 THEN CAST(n_chars - n_alpha AS DOUBLE) / n_chars
                        ELSE 0.0 END AS punct_ratio,
                   CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens
                        ELSE 0.0 END AS stopword_ratio,
                   (n_tokens >= 20
                    AND (CASE WHEN n_chars > 0
                         THEN CAST(n_chars - n_alpha AS DOUBLE) / n_chars
                         ELSE 0.0 END) <= 0.5
                    AND (CASE WHEN n_tokens > 0
                         THEN CAST(n_stop AS DOUBLE) / n_tokens
                         ELSE 0.0 END) >= 0.01) AS keep
            FROM (
                SELECT doc_id,
                       length(text) AS n_chars,
                       len(toks) AS n_tokens,
                       COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                           AS n_alpha,
                       len(list_filter(toks, x -> list_contains(
                           ['the','and','of','to','is','was','in','for','that',
                            'with','a','an','it','on','at','by'], lower(x))))
                           AS n_stop
                FROM (SELECT doc_id, text,
                             regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
                      FROM documents)
            )
        """,
        "revenue_by_brand": """
            SELECT p_brand, COUNT(*) AS n_items,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "shipping_priority": """
            SELECT o_orderkey,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey
            ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
        """,
        "nations_overlap": """
            SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer
            INTERSECT
            SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS k FROM supplier
        """,
        "customer_only_nations": """
            SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer
            EXCEPT
            SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS k FROM supplier
        """,
        "distinct_users_per_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        # price > 1.5·avg as exact integers: 2·cents·n > 3·sum
        "orders_above_avg": """
            SELECT o.o_orderpriority, COUNT(*) AS n_above
            FROM (SELECT o_custkey, o_orderpriority,
                         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                  FROM orders) o
            JOIN (SELECT o_custkey, SUM(cents) AS s, COUNT(*) AS c
                  FROM (SELECT o_custkey,
                               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                        FROM orders)
                  GROUP BY o_custkey) a
              ON o.o_custkey = a.o_custkey
            WHERE 2 * o.cents * a.c > 3 * a.s
            GROUP BY o.o_orderpriority
        """,
        # COUNT/COALESCE (not WHERE gap IS NOT NULL + GROUP BY) so
        # single-event users still appear with n_gaps = 0
        "event_gaps": """
            SELECT user_id, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
                   CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS sum_gap_us
            FROM (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
                  FROM events)
            GROUP BY user_id
        """,
        # banded MinHash-LSH replicated plan-for-plan in SQL (including the
        # bucket_cap chain fallback, which is why a naive all-pairs Jaccard
        # oracle would NOT match: the capped plan is connectivity-preserving,
        # not pair-complete, by design)
        "minhash_neardup": _lsh_oracle_sql(_WORD3_SHINGLES, 0.8),
        "ngram_jaccard_neardup": _lsh_oracle_sql("ws", 0.9),
        # EXACT set-similarity join: prefix-filter blocking is provably
        # lossless (the order-smallest common shingle lies in both docs'
        # prefixes whenever J >= t), so the oracle needs NO plan
        # replication — it is the plain all-pairs exact Jaccard join with
        # the identical integer threshold (ni*5 >= union*3) and ppm output
        "setsim_neardup": f"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id, sh FROM (
                    SELECT doc_id, unnest({_WORD3_SHINGLES}) AS sh FROM toks)
            ),
            sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.id_a, i.id_b,
                   CAST((ni * 1000000) // (za.n + zb.n - ni) AS BIGINT)
                       AS jaccard_ppm
            FROM inter i
            JOIN sz za ON za.doc_id = i.id_a
            JOIN sz zb ON zb.doc_id = i.id_b
            WHERE ni * 5 >= (za.n + zb.n - ni) * 3
        """,
        # paragraph(10-token chunk)-granular exact dedup: keeper = min
        # (doc_id, idx) per distinct chunk content; group by the chunk TEXT
        # (the Ray plan groups its md5 — identical up to md5 collisions)
        "paragraph_dedup": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            chunks AS (
                SELECT doc_id, i AS idx,
                       array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS chunk
                FROM toks, unnest(range(0, (len(ws)+9)//10)) AS t(i)
            ),
            keep AS (SELECT chunk, MIN(doc_id*1000000+idx) AS k
                     FROM chunks GROUP BY chunk)
            SELECT c.doc_id, COUNT(*) AS n_chunks,
                   CAST(SUM(CASE WHEN k.k = c.doc_id*1000000+c.idx
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM chunks c JOIN keep k ON k.chunk = c.chunk
            GROUP BY c.doc_id
        """,
        # greedy WordPiece replicated with a hash-joined longest-match table
        # + recursive chain-following CTE
        "subword_counts": _wordpiece_oracle_sql(),
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) <
                  CASE lang WHEN 'en' THEN '2' WHEN 'de' THEN '8' ELSE '4' END
        """,
        # p90 = smallest value whose cumulative count reaches 0.9·n,
        # exact integer comparison (10·cum ≥ 9·n)
        "value_p90": """
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   CAST(MIN(value_cents) AS BIGINT) AS p90_cents
            FROM (
                SELECT event_type, value_cents,
                       SUM(cnt) OVER (PARTITION BY event_type
                                      ORDER BY value_cents) AS cum,
                       SUM(cnt) OVER (PARTITION BY event_type) AS n
                FROM (SELECT event_type,
                             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
                             COUNT(*) AS cnt
                      FROM events GROUP BY 1, 2)
            )
            WHERE cum * 10 >= n * 9
            GROUP BY event_type
        """,
        # exact anti join (Bloom can't prune antis — false positives would
        # drop survivors): distinct fact keys + partitioned left join
        "customers_without_urgent_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        # the curation flagship, all four stages composed into ONE statement:
        # quality rule -> md5 window dedup -> banded-LSH + recursive-CC +
        # ROW_NUMBER argmax keeper -> windowed-MAX span coverage rewrite
        "curation_pipeline": f"""
            WITH RECURSIVE
            q0 AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
                           length(text) AS n_chars,
                           COALESCE(list_sum(list_transform(
                               regexp_extract_all(text, '[A-Za-z0-9]+'),
                               x -> length(x))), 0) AS n_alpha
                    FROM documents)
                WHERE n_tokens >= 5
                  AND (CASE WHEN n_chars > 0
                       THEN CAST(n_chars - n_alpha AS DOUBLE) / n_chars
                       ELSE 0.0 END) <= 0.5
            ),
            surv1 AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           MIN(doc_id) OVER (PARTITION BY md5(text)) AS k
                    FROM q0)
                WHERE doc_id = k
            ),
            pairs AS ({_lsh_oracle_sql(_WORD3_SHINGLES, 0.8, source="surv1")}),
            docs AS (SELECT CAST(doc_id AS BIGINT) AS id FROM surv1),
            s AS (SELECT CAST(id_a AS BIGINT) AS src, CAST(id_b AS BIGINT) AS dst
                  FROM pairs
                  UNION
                  SELECT CAST(id_b AS BIGINT), CAST(id_a AS BIGINT) FROM pairs),
            reach(node, lbl) AS (
                SELECT DISTINCT src, src FROM s
                UNION
                SELECT s2.dst, r.lbl FROM reach r JOIN s s2 ON s2.src = r.node
            ),
            comp AS (SELECT node, MIN(lbl) AS rep FROM reach GROUP BY node),
            lab AS (
                SELECT d.id AS doc_id, CAST(COALESCE(c.rep, d.id) AS BIGINT) AS comp
                FROM docs d LEFT JOIN comp c ON c.node = d.id),
            tokn AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS ntok
                FROM surv1),
            best AS (
                SELECT comp, doc_id AS keep_id FROM (
                    SELECT l.comp, l.doc_id,
                           ROW_NUMBER() OVER (PARTITION BY l.comp
                                              ORDER BY t.ntok DESC, l.doc_id) AS rn
                    FROM lab l JOIN tokn t ON t.doc_id = l.doc_id)
                WHERE rn = 1),
            surv2 AS (
                SELECT s1.doc_id, s1.text
                FROM surv1 s1
                JOIN lab l ON l.doc_id = s1.doc_id
                JOIN best b ON b.comp = l.comp AND b.keep_id = s1.doc_id
            ),
            tok AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM surv2),
            pos AS (
                SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p,
                       unnest(ws) AS tk
                FROM tok),
            starts AS (
                SELECT doc_id,
                       unnest(range(1, len(ws) - {_DUPNG_N - 2})) AS p,
                       unnest(list_transform(
                           range(1, len(ws) - {_DUPNG_N - 2}),
                           i -> ('0x' || substr(md5(array_to_string(
                                    ws[i:i+{_DUPNG_N - 1}], ' ')), 1, 16))::UBIGINT))
                           AS h
                FROM tok),
            cnt AS (
                SELECT h FROM (SELECT DISTINCT doc_id, h FROM starts)
                GROUP BY h HAVING COUNT(*) >= 2),
            flag AS (
                SELECT st.doc_id, st.p, 1 AS f
                FROM starts st JOIN cnt c ON c.h = st.h),
            cov AS (
                SELECT t.doc_id, t.p, t.tk,
                       MAX(COALESCE(f.f, 0)) OVER (
                           PARTITION BY t.doc_id ORDER BY t.p
                           ROWS BETWEEN {_DUPNG_N - 1} PRECEDING AND CURRENT ROW)
                           AS covered
                FROM pos t LEFT JOIN flag f ON f.doc_id = t.doc_id AND f.p = t.p)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(covered) AS BIGINT) AS n_removed,
                   COALESCE(string_agg(CASE WHEN covered = 0 THEN tk END,
                                       ' ' ORDER BY p), '') AS kept_text
            FROM cov GROUP BY doc_id
        """,
        # ordered per-group aggregation: string_agg with a total ORDER BY
        "user_event_seq": """
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        """,
        # per-group top-K with a lossless per-batch combiner
        "top3_events_per_user": f"""
            SELECT user_id, rk, event_id, value_cents FROM (
                SELECT user_id, event_id,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY value DESC, event_id) AS rk
                FROM events) WHERE rk <= {_TOPK_PER_GROUP}
        """,
        # running COUNT(DISTINCT): first-day per user, counts, prefix sum
        "cumulative_distinct_users": """
            WITH f AS (SELECT user_id,
                              MIN(CAST(ts AS DATE) - DATE '1970-01-01') AS day
                       FROM events GROUP BY 1),
            d AS (SELECT day, COUNT(*) AS n_new FROM f GROUP BY 1)
            SELECT CAST(day AS BIGINT) AS day,
                   CAST(n_new AS BIGINT) AS n_new,
                   CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
            FROM d
        """,
        # relational division: distinct pairs -> per-key counts == divisor
        "customers_all_priorities": """
            SELECT c.c_custkey, c.c_name
            FROM customer c
            JOIN (SELECT o_custkey
                  FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
                  GROUP BY o_custkey
                  HAVING COUNT(*) = (SELECT COUNT(DISTINCT o_orderpriority)
                                     FROM orders)) q
              ON q.o_custkey = c.c_custkey
        """,
        # per-group exact p90: same integer cum rule as value_p90, PARTITIONed
        # by the group key (the Ray side finishes distributed, never driver)
        "customer_p90_spend": """
            SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
                   CAST(MAX(n) AS BIGINT) AS n_orders,
                   CAST(MIN(cents) AS BIGINT) AS p90_cents
            FROM (
                SELECT o_custkey, cents,
                       SUM(cnt) OVER (PARTITION BY o_custkey
                                      ORDER BY cents) AS cum,
                       SUM(cnt) OVER (PARTITION BY o_custkey) AS n
                FROM (SELECT o_custkey,
                             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                             COUNT(*) AS cnt
                      FROM orders GROUP BY 1, 2)
            )
            WHERE cum * 10 >= n * 9
            GROUP BY o_custkey
        """,
        # SymSpell deletion-neighborhood blocking replicated plan-for-plan
        # (bucket_cap=256 chain fallback included), exact levenshtein verify
        "fuzzy_part_names": """
            WITH names AS (SELECT DISTINCT p_name AS name FROM part),
            del_keys AS (
                SELECT name, substr(name, 1, i - 1) || substr(name, i + 1) AS key
                FROM (SELECT name, unnest(range(1, length(name) + 1)) AS i
                      FROM names)
            ),
            kd AS (
                SELECT DISTINCT key, name FROM (
                    SELECT name, name AS key FROM names
                    UNION ALL
                    SELECT name, key FROM del_keys)
            ),
            sized AS (
                SELECT key, name,
                       COUNT(*) OVER (PARTITION BY key) AS n,
                       ROW_NUMBER() OVER (PARTITION BY key ORDER BY name) AS rn
                FROM kd
            ),
            cand AS (
                SELECT DISTINCT name_a, name_b FROM (
                    SELECT a.name AS name_a, b.name AS name_b
                    FROM sized a JOIN sized b
                      ON a.key = b.key AND a.name < b.name
                    WHERE a.n <= 256
                    UNION ALL
                    SELECT a.name, b.name
                    FROM sized a JOIN sized b
                      ON a.key = b.key AND b.rn = a.rn + 1
                    WHERE a.n > 256)
            )
            SELECT name_a, name_b,
                   CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
            FROM cand WHERE levenshtein(name_a, name_b) <= 1
        """,
        "term_doc_freq": """
            SELECT token, COUNT(*) AS df FROM (
                SELECT DISTINCT doc_id, token FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                    FROM documents)
            ) GROUP BY token HAVING COUNT(*) >= 5
        """,
        "seq_packing": f"""
            SELECT doc_id, n_tokens,
                   CAST(cum0 // {SEQ_CAPACITY} AS BIGINT) AS seq_id,
                   CAST(cum0 % {SEQ_CAPACITY} AS BIGINT) AS seq_offset
            FROM (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS cum0
                FROM (SELECT doc_id,
                             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                                  AS BIGINT) AS n_tokens
                      FROM documents)
            )
        """,
        "knn_cosine": f"""
            SELECT vec_id, CAST(rank AS BIGINT) AS rank FROM (
                SELECT vec_id,
                       ROW_NUMBER() OVER (
                           ORDER BY list_cosine_similarity(embedding, {_ONES}) DESC, vec_id
                       ) AS rank
                FROM embeddings) WHERE rank <= 10
        """,
        # winnowing fingerprint replicated in SQL: per-window polynomial hash
        # (base 257 mod 2^61-1, window 16 — list_reduce in HUGEINT so the
        # per-step product never overflows), keep hashes ≡ 0 mod 8, XOR them
        # (bit_xor), mask to int63. Docs with no kept window hash to 0 (the
        # LEFT JOIN). The Python <16-byte fallback (blake2) is NOT modeled —
        # testdata min doc length is 47 chars, asserted in tests.
        "fingerprint": """
            SELECT d.doc_id, COALESCE(f.fp, 0) AS fingerprint
            FROM documents d LEFT JOIN (
                SELECT doc_id,
                       bit_xor(h) & 9223372036854775807 AS fp
                FROM (
                    SELECT doc_id,
                           CAST(list_reduce(
                               list_transform(range(i, i + 16),
                                   j -> CAST(ascii(substr(text, j, 1)) AS HUGEINT)),
                               (a, b) -> (a * 257 + b) % 2305843009213693951)
                            AS BIGINT) AS h
                    FROM (SELECT doc_id, text,
                                 unnest(range(1, length(text) - 14)) AS i
                          FROM documents)
                ) WHERE h % 8 = 0
                GROUP BY doc_id
            ) f ON d.doc_id = f.doc_id
        """,
        # full-probe IVF == exact: same oracle as the brute-force scan
        "knn_ivf_full": f"""
            SELECT vec_id, CAST(rank AS BIGINT) AS rank FROM (
                SELECT vec_id,
                       ROW_NUMBER() OVER (
                           ORDER BY list_cosine_similarity(embedding, {_ONES}) DESC, vec_id
                       ) AS rank
                FROM embeddings) WHERE rank <= 10
        """,
        # full 64-bit SimHash replicated in SQL: per-token md5-top-8-byte
        # hash (the Python side uses the same), per-bit majority vote over
        # the token multiset, bit 63 masked off (int63 for Arrow int64);
        # docs with no whitespace tokens hash to 0
        "simhash": r"""
            SELECT d.doc_id,
                   COALESCE(s.simhash, 0) AS simhash
            FROM documents d LEFT JOIN (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN cnt > 0
                                     THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                            AS BIGINT) AS simhash
                FROM (
                    SELECT doc_id, b,
                           SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
                    FROM (
                        SELECT doc_id,
                               ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
                        FROM (
                            SELECT doc_id,
                                   unnest(list_filter(
                                       string_split_regex(lower(text), '\s+'),
                                       x -> x <> '')) AS tok
                            FROM documents)
                    ) CROSS JOIN (SELECT unnest(range(0, 63)) AS b)
                    GROUP BY doc_id, b
                ) GROUP BY doc_id
            ) s ON d.doc_id = s.doc_id
        """,
        "kmeans_fixed": _kmeans_oracle_sql(k=8, n_iters=3),
        "user_funnel": """
            WITH f AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'view'
                                THEN epoch_us(ts) END) AS tv,
                       MIN(CASE WHEN event_type = 'click'
                                THEN epoch_us(ts) END) AS tc,
                       MIN(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS tp
                FROM events GROUP BY user_id)
            SELECT CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view,
                   CAST(SUM(CASE WHEN tv < tc THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view_click,
                   CAST(SUM(CASE WHEN tv < tc AND tc < tp THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view_click_purchase
            FROM f
        """,
        "table_checksum": f"""
            SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(h % {_CKSUM_P1}) % {_CKSUM_P1} AS BIGINT) AS ck_a,
                   CAST(SUM(h % {_CKSUM_P2}) % {_CKSUM_P2} AS BIGINT) AS ck_b
            FROM (SELECT l_returnflag,
                         ('0x' || substr(md5(
                             CAST(l_orderkey AS VARCHAR) || '|'
                             || CAST(l_linenumber AS VARCHAR) || '|'
                             || CAST(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
                                     AS VARCHAR)), 1, 16))::UBIGINT AS h
                  FROM lineitem)
            GROUP BY l_returnflag
        """,
        "per_source_sample": """
            SELECT source, doc_id, CAST(rn AS BIGINT) AS rk FROM (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                FROM documents) WHERE rn <= 5
        """,
        "phrase_search": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                          FROM documents),
            pos AS (SELECT doc_id, generate_subscripts(ws, 1) AS p,
                           unnest(ws) AS w FROM toks)
            SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
            FROM pos t0
            JOIN pos t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
            JOIN pos t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2
            WHERE t0.w = 'stream' AND t1.w = 'table' AND t2.w = 'hash'
            GROUP BY t0.doc_id
        """,
        "orders_cube": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                   COALESCE(o_orderstatus, 'ALL') AS status,
                   COUNT(*) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS total_cents
            FROM (SELECT o_orderpriority, o_orderstatus,
                         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                  FROM orders)
            GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        "event_type_transitions": """
            SELECT prev_type, event_type AS next_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT event_type,
                         lag(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                         ) AS prev_type
                  FROM events)
            WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "top_terms_per_lang": f"""
            WITH tok AS (SELECT lang,
                                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                         FROM documents),
            cnt AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
                    FROM tok GROUP BY 1, 2)
            SELECT lang, token, n, CAST(rk AS BIGINT) AS rk
            FROM (SELECT lang, token, n,
                         ROW_NUMBER() OVER (
                             PARTITION BY lang ORDER BY n DESC, token
                         ) AS rk
                  FROM cnt)
            WHERE rk <= {_TOP_TERMS_K}
        """,
        "source_vocab_jaccard": """
            WITH pairs AS (
                SELECT DISTINCT source,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                FROM documents),
            counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                       FROM pairs GROUP BY source),
            inter AS (SELECT a.source AS sa, b.source AS sb,
                             CAST(COUNT(*) AS BIGINT) AS i
                      FROM pairs a
                      JOIN pairs b ON a.token = b.token AND a.source < b.source
                      GROUP BY 1, 2)
            SELECT ca.source AS source_a, cb.source AS source_b,
                   CAST(COALESCE(i.i, 0) AS BIGINT) AS inter_n,
                   CAST(ca.n + cb.n - COALESCE(i.i, 0) AS BIGINT) AS union_n,
                   CAST(COALESCE(i.i, 0) * 1000000
                        // (ca.n + cb.n - COALESCE(i.i, 0)) AS BIGINT) AS jaccard_ppm
            FROM counts ca
            JOIN counts cb ON ca.source < cb.source
            LEFT JOIN inter i ON i.sa = ca.source AND i.sb = cb.source
        """,
        "sliding_distinct_users": """
            SELECT window_id, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM (SELECT unnest([h, h - 1]) AS window_id, user_id
                  FROM (SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
                               user_id
                        FROM events))
            GROUP BY 1
        """,
        "part_cooccurrence": f"""
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= {_COOC_MIN_ORDERS}
        """,
        "graph_lpa": _lpa_sql(3),
        "graph_sssp": _sssp_sql(3),
        "graph_assortativity": f"""
            WITH ed AS (SELECT u, v FROM ({_co_edges_sql(2)})),
            deg AS (SELECT node, COUNT(*) AS d FROM
                      (SELECT u AS node FROM ed UNION ALL SELECT v FROM ed)
                    GROUP BY 1),
            e AS (SELECT u AS src, v AS dst FROM ed
                  UNION ALL SELECT v, u FROM ed),
            j AS (SELECT du.d AS x, dv.d AS y
                  FROM e JOIN deg du ON du.node = e.src
                         JOIN deg dv ON dv.node = e.dst),
            m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                         SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM j)
            SELECT CAST(n AS BIGINT) AS n_directed_edges,
                   CAST(n * sxy - sx * sy AS BIGINT) AS assort_num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS assort_den,
                   CAST((1000000 * (n * sxy - sx * sy))
                        // (n * sxx - sx * sx) AS BIGINT) AS assort_ppm
            FROM m
        """,
        "sorted_neighborhood": _snm_sql(),
        "nation_share_of_region": """
            WITH f AS (SELECT c_nationkey,
                              CAST(FLOOR(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS cents
                       FROM orders JOIN customer ON o_custkey = c_custkey),
            nrev AS (SELECT n_nationkey, n_name, n_regionkey,
                            SUM(cents) AS cents
                     FROM f JOIN nation ON n_nationkey = f.c_nationkey
                     GROUP BY 1, 2, 3),
            rrev AS (SELECT n_regionkey, SUM(cents) AS rc
                     FROM nrev GROUP BY 1)
            SELECT n_name, r_name,
                   CAST(nrev.cents AS BIGINT) AS revenue_cents,
                   CAST((1000000 * nrev.cents) // rrev.rc AS BIGINT)
                       AS share_ppm
            FROM nrev JOIN rrev USING (n_regionkey)
                      JOIN region ON r_regionkey = n_regionkey
        """,
        "priority_month_chi2": """
            WITH cells AS (SELECT o_orderpriority AS p,
                                  strftime(o_orderdate, '%Y-%m') AS m,
                                  COUNT(*) AS n
                           FROM orders GROUP BY 1, 2),
            tot AS (SELECT SUM(n) AS nn FROM cells),
            rm AS (SELECT p, SUM(n) AS r FROM cells GROUP BY 1),
            cm AS (SELECT m, SUM(n) AS c FROM cells GROUP BY 1)
            SELECT CAST(tot.nn AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM((1000000 * (cells.n * tot.nn - rm.r * cm.c)
                                     * (cells.n * tot.nn - rm.r * cm.c))
                            // (rm.r * cm.c * tot.nn)) AS BIGINT) AS chi2_ppm
            FROM cells JOIN rm USING (p) JOIN cm USING (m) CROSS JOIN tot
            GROUP BY tot.nn
        """,
        "spend_kendall_tau": """
            WITH pc AS (SELECT o_custkey AS c, COUNT(*) AS n,
                               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                        AS BIGINT)) AS v
                        FROM orders GROUP BY 1),
            r AS (SELECT c,
                         row_number() OVER (ORDER BY n, c) AS rn,
                         row_number() OVER (ORDER BY v, c) AS rv
                  FROM pc),
            d AS (SELECT COUNT(*) AS inv
                  FROM r a JOIN r b ON a.rn < b.rn AND a.rv > b.rv),
            t AS (SELECT COUNT(*) AS n FROM r)
            SELECT CAST(t.n AS BIGINT) AS n,
                   CAST(d.inv AS BIGINT) AS n_discordant,
                   CAST(1000000 - (4000000 * d.inv) // (t.n * (t.n - 1))
                        AS BIGINT) AS tau_ppm
            FROM d, t
        """,
        "orders_zorder": _zorder_oracle_sql(),
        "orders_zonemap": """
            SELECT o_orderkey // 1000 AS tile,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS min_cents,
                   CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS max_cents,
                   CAST(MIN(CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT))
                        AS BIGINT) AS min_day,
                   CAST(MAX(CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT))
                        AS BIGINT) AS max_day
            FROM orders GROUP BY 1
        """,
        "value_mannwhitney_u": """
            WITH b AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('purchase', 'view')),
            h AS (SELECT c,
                         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                              AS BIGINT) AS n1,
                         CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                              AS BIGINT) AS n2
                  FROM b GROUP BY c),
            w AS (SELECT n1, n2,
                         COALESCE(SUM(n2) OVER (ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n2_less
                  FROM h)
            SELECT CAST(SUM(n1) AS BIGINT) AS n1,
                   CAST(SUM(n2) AS BIGINT) AS n2,
                   CAST(SUM(n1 * (2 * n2_less + n2)) AS BIGINT) AS u2
            FROM w
        """,
        "user_pareto": """
            WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
                         CAST(COUNT(*) AS BIGINT) AS nu FROM u),
            r AS (SELECT cnt,
                         SUM(cnt) OVER (ORDER BY cnt DESC, user_id) - cnt
                             AS ps
                  FROM u)
            SELECT t.nu AS n_users, t.tot AS n_events,
                   CAST(COUNT(*) FILTER (WHERE 10 * r.ps < 8 * t.tot)
                        AS BIGINT) AS n_users_80,
                   CAST(1000000 * COUNT(*) FILTER (WHERE 10 * r.ps
                                                         < 8 * t.tot)
                        // t.nu AS BIGINT) AS users_share_ppm
            FROM r CROSS JOIN t GROUP BY t.nu, t.tot
        """,
        "order_cume_dist": """
            SELECT o_orderkey, o_orderpriority, cents,
                   CAST(1000000 * cle // n AS BIGINT) AS cume_ppm
            FROM (SELECT o_orderkey, o_orderpriority, c AS cents,
                         COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY c
                                        RANGE BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cle,
                         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
                  FROM (SELECT o_orderkey, o_orderpriority,
                               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                                   AS c
                        FROM orders))
        """,
        "feature_hashing": f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
              FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
                  FROM tok),
            c AS (SELECT doc_id, CAST(h % {_FH_DIMS} AS BIGINT) AS dim,
                         CAST((h // {_FH_DIMS}) % 2 AS BIGINT) * 2 - 1 AS sgn
                  FROM h)
            SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS val
            FROM c GROUP BY 1, 2 HAVING SUM(sgn) <> 0
        """,
        "negative_edges": f"""
            WITH e AS ({_co_edges_sql(2)}),
            nd AS (SELECT DISTINCT node FROM
                     (SELECT u AS node FROM e
                      UNION ALL SELECT v AS node FROM e)),
            r AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS rr
                  FROM nd),
            t AS (SELECT CAST(COUNT(*) AS UBIGINT) AS n FROM nd),
            c AS (SELECT nd.node AS u0,
                         CAST(('0x' || substr(md5(nd.node || ':' || i.i),
                                              1, 16))::UBIGINT % t.n
                              AS BIGINT) AS rr
                  FROM nd
                  CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1) i
                  CROSS JOIN t),
            p AS (SELECT DISTINCT LEAST(u0, r.node) AS u,
                                  GREATEST(u0, r.node) AS v
                  FROM c JOIN r USING (rr) WHERE u0 <> r.node)
            SELECT p.u, p.v
            FROM p LEFT JOIN e ON e.u = p.u AND e.v = p.v
            WHERE e.u IS NULL
        """,
        "inverted_index": f"""
            WITH tok AS (
              SELECT doc_id, unnest(l) AS w,
                     generate_subscripts(l, 1) - 1 AS pos
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[a-z0-9]+') AS l
                    FROM documents)),
            f AS (SELECT w, doc_id, MIN(pos) AS pos FROM tok GROUP BY 1, 2),
            r AS (SELECT w, doc_id, pos,
                         row_number() OVER (PARTITION BY w ORDER BY doc_id)
                             AS rn
                  FROM f)
            SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS df,
                   COALESCE(string_agg(
                       CASE WHEN rn <= {_INV_DF_CAP}
                            THEN doc_id || ':' || pos END,
                       ',' ORDER BY doc_id), '') AS postings
            FROM r GROUP BY w
        """,
        "events_anomalies": """
            WITH d AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            m AS (SELECT n AS med FROM
                    (SELECT n, row_number() OVER (ORDER BY n) AS rn FROM d)
                  WHERE rn = (SELECT (COUNT(*) + 1) // 2 FROM d)),
            a AS (SELECT ABS(d.n - m.med) AS dev FROM d, m),
            md AS (SELECT dev AS mad FROM
                     (SELECT dev, row_number() OVER (ORDER BY dev) AS rn FROM a)
                   WHERE rn = (SELECT (COUNT(*) + 1) // 2 FROM a))
            SELECT d.day, d.n, CAST(d.n - m.med AS BIGINT) AS deviation
            FROM d, m, md WHERE ABS(d.n - m.med) > 3 * md.mad
        """,
        "value_trimmed_mean": """
            WITH b AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                              CAST(COUNT(*) AS BIGINT) AS k
                       FROM events GROUP BY 1, 2),
            cm AS (SELECT event_type, c, k,
                          SUM(k) OVER (PARTITION BY event_type
                                       ORDER BY c) AS cum,
                          SUM(k) OVER (PARTITION BY event_type
                                       ORDER BY c) - k AS prev,
                          SUM(k) OVER (PARTITION BY event_type) AS n
                   FROM b),
            inc AS (SELECT event_type, c, n,
                           GREATEST(0, LEAST(cum, n - n // 20)
                                       - GREATEST(prev, n // 20)) AS i
                    FROM cm)
            SELECT event_type,
                   CAST(MAX(n) - 2 * (MAX(n) // 20) AS BIGINT) AS trimmed_n,
                   CAST(SUM(c * i) // (MAX(n) - 2 * (MAX(n) // 20))
                        AS BIGINT) AS tmean_cents
            FROM inc GROUP BY event_type
        """,
        "spend_rank_corr": """
            WITH pc AS (SELECT o_custkey AS c, COUNT(*) AS n,
                               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                        AS BIGINT)) AS v
                        FROM orders GROUP BY 1),
            r AS (SELECT c,
                         row_number() OVER (ORDER BY n, c) AS rn,
                         row_number() OVER (ORDER BY v, c) AS rv
                  FROM pc),
            a AS (SELECT COUNT(*) AS n,
                         SUM((rn - rv) * (rn - rv)) AS sd2 FROM r)
            SELECT CAST(n AS BIGINT) AS n, CAST(sd2 AS BIGINT) AS sum_d2,
                   CAST(1000000 - (6000000 * sd2) // (n * (n * n - 1))
                        AS BIGINT) AS rho_ppm
            FROM a
        """,
        "top_session_paths": f"""
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                              event_type FROM events),
            l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id) AS pus
                  FROM e),
            s AS (SELECT *, SUM(CASE WHEN pus IS NULL
                                       OR us - pus > {_PATH_GAP_US}
                                     THEN 1 ELSE 0 END)
                              OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
                  FROM l),
            p AS (SELECT user_id, sid,
                         string_agg(event_type, '>'
                                    ORDER BY us, event_id) AS path
                  FROM s GROUP BY 1, 2),
            c AS (SELECT path, COUNT(*) AS n FROM p GROUP BY 1)
            SELECT path, CAST(n AS BIGINT) AS n
            FROM c ORDER BY n DESC, path LIMIT {_PATH_TOP_K}
        """,
        "abandoned_views": """
            WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS us
                       FROM events WHERE event_type = 'view'),
            p AS (SELECT user_id, epoch_us(ts) AS us
                  FROM events WHERE event_type = 'purchase')
            SELECT v.event_id, v.user_id,
                   CAST(v.us // 1000000 AS BIGINT) AS s
            FROM v
            WHERE NOT EXISTS (
                SELECT 1 FROM p
                WHERE p.user_id = v.user_id
                  AND p.us >= v.us AND p.us <= v.us + 3600000000)
        """,
        "props_novelty": """
            WITH dt AS (
              SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
                     unnest(regexp_extract_all(lower(props),
                                               '[a-z0-9]+')) AS token
              FROM events),
            tot AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_tokens
                    FROM dt GROUP BY 1),
            f AS (SELECT token, MIN(day) AS d0 FROM dt GROUP BY 1),
            nw AS (SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new
                   FROM f GROUP BY 1)
            SELECT tot.day, tot.n_tokens,
                   CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new
            FROM tot LEFT JOIN nw USING (day)
        """,
        "balanced_sample": """
            WITH c AS (SELECT event_type, COUNT(*) AS n
                       FROM events GROUP BY 1),
            k AS (SELECT MIN(n) AS k FROM c),
            r AS (SELECT event_id, event_type,
                         row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY md5(CAST(event_id AS VARCHAR)),
                                    event_id) AS rn
                  FROM events)
            SELECT event_id, event_type FROM r, k WHERE rn <= k.k
        """,
        "part_lift": f"""
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                          COUNT(*) AS n_ab
                   FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                                      AND a.l_partkey < b.l_partkey
                   GROUP BY 1, 2 HAVING COUNT(*) >= {_COOC_MIN_ORDERS}),
            it AS (SELECT l_partkey AS pk, COUNT(*) AS ni FROM op GROUP BY 1),
            nn AS (SELECT COUNT(*) AS n FROM orders)
            SELECT pr.part_a, pr.part_b, CAST(pr.n_ab AS BIGINT) AS n_ab,
                   CAST((1000000 * pr.n_ab * nn.n) // (ia.ni * ib.ni)
                        AS BIGINT) AS lift_ppm
            FROM pr JOIN it ia ON ia.pk = pr.part_a
                    JOIN it ib ON ib.pk = pr.part_b
                    CROSS JOIN nn
        """,
        "events_trailing7": """
            WITH d AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CAST(FLOOR(value * 100 + 0.5)
                                            AS BIGINT)) AS BIGINT) AS v
                       FROM events GROUP BY 1)
            SELECT day, n, v AS value_cents,
                   CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
                   CAST(SUM(v) OVER w AS BIGINT) AS value_cents_7d
            FROM d
            WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING
                         AND CURRENT ROW)
        """,
        "golden_records": """
            SELECT md5(text) AS h,
                   CAST(MIN(doc_id) AS BIGINT) AS rep_id,
                   CAST(COUNT(*) AS BIGINT) AS n_dups,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars,
                   MIN(lang) AS lang, MIN(source) AS source
            FROM documents GROUP BY 1
        """,
        "part_triples": f"""
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   c.l_partkey AS part_c,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM op a
            JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
            JOIN op c ON a.l_orderkey = c.l_orderkey
                     AND b.l_partkey < c.l_partkey
            GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_COOC_MIN_ORDERS}
        """,
        "events_debounced": f"""
            WITH e AS (SELECT event_id, user_id, event_type,
                              CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
                       FROM events),
            l AS (SELECT *, LAG(s) OVER (PARTITION BY user_id, event_type
                                         ORDER BY s, event_id) AS ps
                  FROM e)
            SELECT event_id, user_id, event_type, s
            FROM l WHERE ps IS NULL OR s - ps > {_DEBOUNCE_S}
        """,
        "user_time_weighted_value": """
            WITH e AS (SELECT user_id, event_id,
                              CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
                       FROM events),
            l AS (SELECT user_id, v,
                         LEAD(s) OVER (PARTITION BY user_id
                                       ORDER BY s, event_id) - s AS dt
                  FROM e),
            a AS (SELECT user_id, SUM(v * dt) AS wsum, SUM(dt) AS tsum
                  FROM l WHERE dt IS NOT NULL
                  GROUP BY 1 HAVING SUM(dt) > 0)
            SELECT user_id, CAST(wsum AS BIGINT) AS wsum,
                   CAST(tsum AS BIGINT) AS tsum,
                   CAST(wsum // tsum AS BIGINT) AS twav_cents
            FROM a
        """,
        "order_skyline": """
            WITH o AS (SELECT o_orderkey,
                              CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                                  AS price_cents,
                              CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT)
                                  AS day
                       FROM orders)
            SELECT a.o_orderkey, a.price_cents, a.day FROM o a
            WHERE NOT EXISTS (
                SELECT 1 FROM o b
                WHERE b.price_cents >= a.price_cents AND b.day >= a.day
                  AND (b.price_cents > a.price_cents OR b.day > a.day))
        """,
        "integrity_audit": """
            WITH lk AS (SELECT l_orderkey AS k, COUNT(*) AS nl
                        FROM lineitem GROUP BY 1),
            ok AS (SELECT o_orderkey AS k FROM orders)
            SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_orders,
                   CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_lines,
                   CAST(COALESCE((SELECT SUM(nl) FROM lk
                                  LEFT JOIN ok ON ok.k = lk.k
                                  WHERE ok.k IS NULL), 0) AS BIGINT)
                       AS n_orphan_lines,
                   CAST((SELECT COUNT(*) FROM ok
                         LEFT JOIN lk ON lk.k = ok.k
                         WHERE lk.k IS NULL) AS BIGINT) AS n_childless_orders
        """,
        "nation_priority_grid": """
            WITH prios AS (SELECT DISTINCT o_orderpriority AS priority
                           FROM orders),
            grid AS (SELECT n_nationkey, n_name, priority
                     FROM nation CROSS JOIN prios),
            c AS (SELECT c_nationkey AS n_nationkey,
                         o_orderpriority AS priority, COUNT(*) AS n
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY 1, 2)
            SELECT g.n_name, g.priority,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
            FROM grid g LEFT JOIN c USING (n_nationkey, priority)
        """,
        "revenue_mom": """
            WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                              SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                       AS BIGINT)) AS rev
                       FROM orders GROUP BY 1),
            l AS (SELECT month, rev,
                         LAG(rev) OVER (ORDER BY month) AS prev FROM m)
            SELECT month, CAST(rev AS BIGINT) AS revenue_cents,
                   CAST((10000 * (rev - prev)) // prev AS BIGINT) AS delta_bps
            FROM l WHERE prev IS NOT NULL
        """,
        "embedding_dim_stats": """
            WITH q AS (
              SELECT dim,
                     CAST(floor((CAST(v AS DOUBLE) + 1.0) * 1000000)
                          AS BIGINT) AS x
              FROM (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                           unnest(embedding) AS v FROM embeddings))
            SELECT CAST(dim AS BIGINT) AS dim,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_q,
                   CAST(SUM(x * x) AS BIGINT) AS sum_qq,
                   CAST(SUM(x) // COUNT(*) AS BIGINT) AS mean_q
            FROM q GROUP BY dim
        """,
        "user_active_seconds": f"""
            WITH iv AS (SELECT user_id,
                               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
                        FROM events),
            o AS (SELECT user_id, s, s + {_ACTIVE_WINDOW_S} AS e,
                         LAG(s + {_ACTIVE_WINDOW_S}) OVER
                           (PARTITION BY user_id ORDER BY s) AS pe
                  FROM iv),
            g AS (SELECT user_id, s, e,
                         SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY s
                                 ROWS UNBOUNDED PRECEDING) AS isl
                  FROM o),
            i AS (SELECT user_id, isl, MAX(e) - MIN(s) AS len
                  FROM g GROUP BY 1, 2)
            SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_s,
                   CAST(COUNT(*) AS BIGINT) AS n_islands
            FROM i GROUP BY 1
        """,
        "readability": """
            WITH c AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
                     GREATEST(len(regexp_extract_all(lower(text),
                                                     '[.!?]+')), 1) AS s,
                     len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
              FROM documents)
            SELECT doc_id, CAST(w AS BIGINT) AS n_words,
                   CAST(s AS BIGINT) AS n_sents,
                   CAST(y AS BIGINT) AS n_sylls,
                   CAST(206835 - (1015 * w) // s
                               - (84600 * y) // GREATEST(w, 1)
                        AS BIGINT) AS flesch_milli
            FROM c
        """,
        "events_calendar": """
            SELECT CAST((FLOOR(epoch(ts) / 86400) + 4) % 7 AS BIGINT) AS dow,
                   CAST(FLOOR(epoch(ts) / 3600) % 24 AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "profile_events": """
            SELECT 'event_id' AS col, COUNT(*) AS n_rows,
                   CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
            FROM events
            UNION ALL
            SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
                   COUNT(DISTINCT ts) FROM events
            UNION ALL
            SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
                   COUNT(DISTINCT user_id) FROM events
            UNION ALL
            SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
                   COUNT(DISTINCT event_type) FROM events
            UNION ALL
            SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
                   COUNT(DISTINCT CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            FROM events
            UNION ALL
            SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
                   COUNT(DISTINCT props) FROM events
        """,
        "user_streaks": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
                       FROM events),
            g AS (SELECT user_id, day,
                         day - row_number() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS grp
                  FROM d),
            s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
            SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
                   CAST(MAX(len) AS BIGINT) AS max_streak
            FROM s GROUP BY user_id
        """,
        "value_minmax": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
                       FROM events),
            mm AS (SELECT event_type, MIN(c) AS lo,
                          GREATEST(MAX(c) - MIN(c), 1) AS span
                   FROM c GROUP BY 1)
            SELECT c.event_id, c.event_type,
                   CAST((1000000 * (c.c - mm.lo)) // mm.span AS BIGINT)
                       AS scaled_ppm
            FROM c JOIN mm USING (event_type)
        """,
        "lineitem_unpivot": """
            SELECT l_orderkey, l_linenumber, measure,
                   CAST(FLOOR(v * 100 + 0.5) AS BIGINT) AS value_cents
            FROM (
              SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                     l_quantity AS v FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                     l_extendedprice FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        """,
        "value_mode": """
            WITH b AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                              CAST(COUNT(*) AS BIGINT) AS k
                       FROM events GROUP BY 1, 2)
            SELECT event_type, mode_cents, n_mode FROM (
              SELECT event_type, c AS mode_cents, k AS n_mode,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY k DESC, c) AS rn
              FROM b) WHERE rn = 1
        """,
        "value_mad": """
            WITH b AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                              CAST(COUNT(*) AS BIGINT) AS k
                       FROM events GROUP BY 1, 2),
            cm AS (SELECT event_type, c, k,
                          SUM(k) OVER (PARTITION BY event_type ORDER BY c) AS cum,
                          SUM(k) OVER (PARTITION BY event_type) AS n
                   FROM b),
            m AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                         CAST(MIN(CASE WHEN 2 * cum >= n THEN c END) AS BIGINT) AS med
                  FROM cm GROUP BY 1),
            d AS (SELECT b.event_type, ABS(b.c - m.med) AS dv, b.k, m.n, m.med
                  FROM b JOIN m USING (event_type)),
            dc AS (SELECT event_type, dv, k, n, med,
                          SUM(k) OVER (PARTITION BY event_type ORDER BY dv) AS cum
                   FROM d)
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   CAST(MAX(med) AS BIGINT) AS median_cents,
                   CAST(MIN(CASE WHEN 2 * cum >= n THEN dv END) AS BIGINT) AS mad_cents
            FROM dc GROUP BY event_type
        """,
        "order_deciles": f"""
            SELECT o_orderkey,
                   CAST(NTILE({_NTILE_K}) OVER
                        (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
            FROM orders
        """,
        "value_trend": """
            WITH p AS (SELECT event_type,
                              CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS x,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
                       FROM events)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST((1000000 * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)))
                        // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                        AS BIGINT) AS slope_ucpd
            FROM p GROUP BY 1
        """,
        "user_type_gini": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id,
                   CAST(SUM(n) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST((1000000 * (SUM(n) * SUM(n) - SUM(n * n)))
                        // (SUM(n) * SUM(n)) AS BIGINT) AS gini_ppm
            FROM c GROUP BY 1
        """,
        "value_outliers": """
            WITH b AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                              CAST(COUNT(*) AS BIGINT) AS k
                       FROM events GROUP BY 1, 2),
            cm AS (SELECT event_type, c, k,
                          SUM(k) OVER (PARTITION BY event_type ORDER BY c) AS cum,
                          SUM(k) OVER (PARTITION BY event_type) AS n
                   FROM b),
            q AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                         CAST(MIN(CASE WHEN 4 * cum >= n THEN c END) AS BIGINT) AS q1,
                         CAST(MIN(CASE WHEN 4 * cum >= 3 * n THEN c END) AS BIGINT) AS q3
                  FROM cm GROUP BY event_type)
            SELECT q.event_type, q.n,
                   q.q1 AS q1_cents, q.q3 AS q3_cents,
                   CAST(COALESCE(SUM(CASE WHEN 2 * b.c < 2 * q.q1 - 3 * (q.q3 - q.q1)
                                            OR 2 * b.c > 2 * q.q3 + 3 * (q.q3 - q.q1)
                                          THEN b.k END), 0) AS BIGINT) AS n_outliers
            FROM q JOIN b ON b.event_type = q.event_type
            GROUP BY 1, 2, 3, 4
        """,
        "meta_blocking": f"""
            WITH tok AS (
                SELECT DISTINCT p_partkey AS id,
                       unnest(regexp_extract_all(lower(p_name), '[a-z0-9]+')) AS t
                FROM part),
            ok AS (SELECT t FROM tok GROUP BY t
                   HAVING COUNT(*) BETWEEN 2 AND {_MB_MAX_BLOCK}),
            pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS w
                      FROM tok a
                      JOIN ok ON ok.t = a.t
                      JOIN tok b ON b.t = a.t AND a.id < b.id
                      GROUP BY 1, 2)
            SELECT id_a, id_b, CAST(w AS BIGINT) AS w
            FROM pairs WHERE w >= 2
        """,
        "doc_chunks": f"""
            WITH arr AS (SELECT doc_id,
                                regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                         FROM documents),
            tok AS (SELECT doc_id,
                           generate_subscripts(ws, 1) - 1 AS i,
                           unnest(ws) AS w
                    FROM arr)
            SELECT doc_id, CAST(i // {_CHUNK_K} AS BIGINT) AS chunk_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   string_agg(w, ' ' ORDER BY i) AS chunk_text
            FROM tok GROUP BY 1, 2
        """,
        "nations_except_all": """
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT c_nationkey AS k FROM customer
                  EXCEPT ALL
                  SELECT s_nationkey AS k FROM supplier)
            GROUP BY 1
        """,
        "key_skew_stats": """
            WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1)
            SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(n) AS BIGINT) AS n_rows
            FROM c GROUP BY 1
        """,
        "user_retention": """
            WITH ud AS (SELECT DISTINCT user_id,
                               CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
                        FROM events),
            fd AS (SELECT user_id, MIN(day) AS day0 FROM ud GROUP BY 1)
            SELECT fd.day0 AS cohort_day,
                   ud.day - fd.day0 AS day_delta,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ud JOIN fd ON ud.user_id = fd.user_id
            GROUP BY 1, 2
        """,
        "value_hist_quantiles": f"""
            WITH b AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                                  // {_HQ_BIN_CENTS} AS bin,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            c AS (SELECT event_type, bin, n,
                         SUM(n) OVER (PARTITION BY event_type
                                      ORDER BY bin) AS cum,
                         SUM(n) OVER (PARTITION BY event_type) AS tot
                  FROM b)
            SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n,
                   CAST(MIN(CASE WHEN cum * 100 >= 50 * tot THEN bin END)
                        * {_HQ_BIN_CENTS} AS BIGINT) AS p50_lo_cents,
                   CAST(MIN(CASE WHEN cum * 100 >= 90 * tot THEN bin END)
                        * {_HQ_BIN_CENTS} AS BIGINT) AS p90_lo_cents,
                   CAST(MIN(CASE WHEN cum * 100 >= 99 * tot THEN bin END)
                        * {_HQ_BIN_CENTS} AS BIGINT) AS p99_lo_cents
            FROM c GROUP BY event_type
        """,
        "late_order_priority": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
              AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_returnflag = 'R')
            GROUP BY 1
        """,
        "top_return_customers": """
            WITH r AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                           * 100 + 0.5) AS BIGINT)) AS BIGINT)
                           AS revenue_cents
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1996-07-01'
                GROUP BY 1
                ORDER BY revenue_cents DESC, o_custkey LIMIT 20)
            SELECT c_custkey, c_name, n_name, revenue_cents
            FROM r JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
        """,
        "part_revenue_share": """
            WITH p AS (SELECT l_partkey AS p_partkey,
                              CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                            AS BIGINT)) AS BIGINT) AS rev_cents
                       FROM lineitem GROUP BY 1),
                 t AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM p)
            SELECT p_partkey, rev_cents,
                   CAST(rev_cents * 1000000 // t.total AS BIGINT) AS share_ppm
            FROM p, t WHERE rev_cents * 10000 > t.total
        """,
        "supplier_diversity": """
            SELECT p_brand, p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1, 2
        """,
        "churned_high_value": """
            WITH c AS (SELECT c_custkey, c_nationkey,
                              CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
                       FROM customer),
                 s AS (SELECT CAST(SUM(bal) AS BIGINT) AS tot,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM c WHERE bal > 0),
                 recent AS (SELECT DISTINCT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2000-08-01')
            SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(bal) AS BIGINT) AS total_bal_cents
            FROM c, s
            WHERE c.bal * s.n > s.tot
              AND c_custkey NOT IN (SELECT o_custkey FROM recent)
            GROUP BY 1
        """,
        "orders_benford": """
            WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100
                                + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                           AS digit
                       FROM orders),
                 c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
                       FROM d GROUP BY 1)
            SELECT digit, n_orders,
                   CAST(n_orders * 1000000
                        // (SELECT SUM(n_orders) FROM c) AS BIGINT) AS share_ppm
            FROM c
        """,
        "nations_intersect_all": """
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT c_nationkey AS k FROM customer
                  INTERSECT ALL
                  SELECT s_nationkey AS k FROM supplier)
            GROUP BY 1
        """,
        "waiting_suppliers": """
            WITH pair AS (SELECT l_orderkey, l_suppkey,
                                 MAX(l_shipdate) AS ship
                          FROM lineitem GROUP BY 1, 2),
                 j AS (SELECT l_orderkey, l_suppkey,
                              CASE WHEN ship > o_orderdate + INTERVAL 90 DAY
                                   THEN 1 ELSE 0 END AS late
                       FROM pair JOIN orders ON l_orderkey = o_orderkey),
                 per AS (SELECT l_orderkey, COUNT(*) AS n_supp,
                                SUM(late) AS n_late,
                                MAX(CASE WHEN late = 1 THEN l_suppkey END)
                                    AS sole
                         FROM j GROUP BY 1)
            SELECT sole AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM per WHERE n_supp >= 2 AND n_late = 1
            GROUP BY 1
        """,
        "nation_pair_volume": """
            SELECT c_nationkey AS cust_nation, s_nationkey AS supp_nation,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                       * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS rev_cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
        """,
        "top_supplier": """
            WITH r AS (SELECT l_suppkey,
                              CAST(SUM(CAST(FLOOR(l_extendedprice
                                                  * (1 - l_discount) * 100
                                                  + 0.5) AS BIGINT))
                                   AS BIGINT) AS revenue_cents
                       FROM lineitem
                       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l_shipdate <  TIMESTAMP '1996-04-01'
                       GROUP BY 1)
            SELECT l_suppkey, revenue_cents
            FROM r WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM r)
        """,
        "big_orders": """
            WITH q AS (SELECT l_orderkey,
                              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                                  AS total_qty
                       FROM lineitem GROUP BY 1
                       HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
            SELECT o_orderkey, o_custkey, total_qty,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS price_cents
            FROM q JOIN orders ON l_orderkey = o_orderkey
        """,
        "brand_bracket_revenue": """
            SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice
                                                * (1 - l_discount) * 100
                                                + 0.5) AS BIGINT)), 0)
                        AS BIGINT) AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 15)
               OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 25)
               OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 35)
        """,
        # per-node triangles: the e1/e2/e3 triple join emits each triangle
        # {a<b<c} once; crediting all three corners matches the engine's
        # apex+decoded-endpoint credits exactly
        "graph_clustering": f"""
            WITH e AS ({_co_edges_sql(2)}),
            d AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
                  (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
                  GROUP BY node),
            tris AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                     FROM e e1
                     JOIN e e2 ON e2.u = e1.v
                     JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
            pt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM
                   (SELECT a AS node FROM tris
                    UNION ALL SELECT b FROM tris
                    UNION ALL SELECT c FROM tris) GROUP BY node)
            SELECT d.node, d.degree,
                   CAST(COALESCE(pt.tri, 0) AS BIGINT) AS n_tri,
                   CAST(CASE WHEN d.degree >= 2
                             THEN COALESCE(pt.tri, 0) * 1000000
                                  // (d.degree * (d.degree - 1) // 2)
                             ELSE 0 END AS BIGINT) AS cc_ppm
            FROM d LEFT JOIN pt ON pt.node = d.node
        """,
        "segment_spend_skewed": """
            SELECT c_mktsegment, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY 1, 2
        """,
        "weighted_median": """
            WITH h AS (SELECT l_returnflag,
                              CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS v,
                              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                                  AS w
                       FROM lineitem GROUP BY 1, 2),
                 c AS (SELECT l_returnflag, v,
                              SUM(w) OVER (PARTITION BY l_returnflag
                                           ORDER BY v) AS cum,
                              SUM(w) OVER (PARTITION BY l_returnflag) AS tot
                       FROM h)
            SELECT l_returnflag,
                   CAST(MIN(CASE WHEN 2 * cum >= tot THEN v END) AS BIGINT)
                       AS wmedian_cents
            FROM c GROUP BY 1
        """,
        # deterministic walks: ROW_NUMBER()-1 over neighbors ASC replicates
        # the engine's per-node rank; the hop hash is mul/add/mod only
        "graph_walks": f"""
            WITH e AS ({_co_edges_sql(2)}),
            s AS (SELECT u AS node, v AS nbr FROM e
                  UNION ALL SELECT v, u FROM e),
            adj AS (SELECT node, nbr,
                           ROW_NUMBER() OVER (PARTITION BY node
                                              ORDER BY nbr) - 1 AS r,
                           COUNT(*) OVER (PARTITION BY node) AS deg
                    FROM s),
            w0 AS (SELECT DISTINCT node AS start, node AS cur FROM s),
            w1 AS (SELECT w0.start, a.nbr AS cur
                   FROM w0 JOIN adj a ON a.node = w0.cur
                   AND a.r = (w0.start * {_WALK_A} + w0.cur * {_WALK_B}
                              + 1 * {_WALK_C}) % {_WALK_P} % a.deg),
            w2 AS (SELECT w1.start, a.nbr AS cur
                   FROM w1 JOIN adj a ON a.node = w1.cur
                   AND a.r = (w1.start * {_WALK_A} + w1.cur * {_WALK_B}
                              + 2 * {_WALK_C}) % {_WALK_P} % a.deg),
            w3 AS (SELECT w2.start, a.nbr AS cur
                   FROM w2 JOIN adj a ON a.node = w2.cur
                   AND a.r = (w2.start * {_WALK_A} + w2.cur * {_WALK_B}
                              + 3 * {_WALK_C}) % {_WALK_P} % a.deg)
            SELECT start, CAST(0 AS BIGINT) AS step, cur AS node FROM w0
            UNION ALL SELECT start, 1, cur FROM w1
            UNION ALL SELECT start, 2, cur FROM w2
            UNION ALL SELECT start, 3, cur FROM w3
        """,
        # exact isqrt: FLOOR(SQRT(·)) corrected ±1 against integer squares,
        # immune to float rounding at perfect-square boundaries
        "temperature_mix": f"""
            WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1),
            s0 AS (SELECT source, n,
                          CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS s
                   FROM n),
            w AS (SELECT source,
                         s - CASE WHEN s * s > n THEN 1 ELSE 0 END
                           + CASE WHEN (s - CASE WHEN s * s > n THEN 1
                                                 ELSE 0 END + 1)
                                       * (s - CASE WHEN s * s > n THEN 1
                                               ELSE 0 END + 1) <= n
                                  THEN 1 ELSE 0 END AS w
                  FROM s0),
            q AS (SELECT source, w * {_MIX_TARGET}
                             // (SELECT SUM(w) FROM w) AS q FROM w),
            r AS (SELECT doc_id, source,
                         ROW_NUMBER() OVER (PARTITION BY source
                                            ORDER BY md5(CAST(doc_id
                                                              AS VARCHAR)),
                                                     doc_id) AS rn
                  FROM documents)
            SELECT r.doc_id, r.source
            FROM r JOIN q ON r.source = q.source WHERE rn <= q.q
        """,
        # integer-scaled dots: products ≤ 64·(2e5)² < 2^53, so DuckDB's
        # float-accumulating list_dot_product is exact here. x must be cast
        # to DOUBLE first — the lambda otherwise multiplies FLOAT32·INT in
        # FLOAT32, which rounds across floor boundaries (0.0283f·10⁴ → 283.0)
        "mutual_knn": f"""
            WITH s AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> CAST(FLOOR(CAST(x AS DOUBLE)
                                                  * {_MKNN_SCALE})
                                            AS BIGINT)) AS e
                       FROM embeddings),
            d AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                         CAST(list_dot_product(a.e, b.e) AS BIGINT) AS dot
                  FROM s a JOIN s b ON a.vec_id <> b.vec_id),
            r AS (SELECT src, dst, dot,
                         ROW_NUMBER() OVER (PARTITION BY src
                                            ORDER BY dot DESC, dst) AS rn
                  FROM d),
            k AS (SELECT src, dst, dot FROM r WHERE rn <= {_MKNN_K})
            SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                   CAST(MAX(dot) AS BIGINT) AS dot
            FROM k GROUP BY 1, 2 HAVING COUNT(*) = 2
        """,
        "discount_revenue": """
            SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * l_discount
                                                * 100 + 0.5) AS BIGINT)), 0)
                        AS BIGINT) AS revenue_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "brand_market_share": """
            WITH m AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
                              CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                            AS BIGINT)) AS BIGINT)
                                  AS total_cents,
                              CAST(SUM(CASE WHEN p_brand = 'Brand#11'
                                            THEN CAST(FLOOR(l_extendedprice
                                                            * 100 + 0.5)
                                                      AS BIGINT)
                                            ELSE 0 END) AS BIGINT)
                                  AS brand_cents
                       FROM lineitem JOIN part ON l_partkey = p_partkey
                       GROUP BY 1)
            SELECT month, brand_cents,
                   CAST(brand_cents * 1000000
                        // GREATEST(total_cents, 1) AS BIGINT) AS share_ppm
            FROM m
        """,
        # independent formulation (window rank, not the engine's packed
        # argmin) — a stronger oracle than replicating the packing
        "cheapest_supplier": """
            WITH r AS (SELECT l_partkey AS p_partkey,
                              l_suppkey AS s_suppkey,
                              CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS price,
                              ROW_NUMBER() OVER (
                                  PARTITION BY l_partkey
                                  ORDER BY CAST(FLOOR(l_extendedprice * 100
                                                      + 0.5) AS BIGINT),
                                           l_suppkey) AS rn
                       FROM lineitem)
            SELECT p_partkey, r.s_suppkey, s_name, price AS min_price_cents
            FROM r JOIN supplier ON r.s_suppkey = supplier.s_suppkey
            WHERE rn = 1
        """,
        "events_cusum": """
            WITH RECURSIVE
            d AS (SELECT datediff('day', TIMESTAMP '1970-01-01', ts) AS day,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM events GROUP BY 1),
            r AS (SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS rn
                  FROM d),
            mu AS (SELECT SUM(n) // COUNT(*) AS mu FROM d),
            c(rn, day, n, s) AS (
                SELECT rn, day, n, GREATEST(0, n - (SELECT mu FROM mu))
                FROM r WHERE rn = 1
                UNION ALL
                SELECT r.rn, r.day, r.n,
                       GREATEST(0, c.s + r.n - (SELECT mu FROM mu))
                FROM c JOIN r ON r.rn = c.rn + 1)
            SELECT CAST(day AS BIGINT) AS day, n, CAST(s AS BIGINT) AS cusum
            FROM c
        """,
        # (k−1)·2⁶³ needs HUGEINT; the 63-bit hash is the same first-16-hex
        # md5 as the HLL oracle, shifted right one bit
        "kmv_users": f"""
            WITH h AS (SELECT DISTINCT event_type,
                              CAST(('0x' || substr(md5(CAST(user_id
                                                            AS VARCHAR)),
                                                   1, 16))::UBIGINT >> 1
                                   AS BIGINT) AS h
                       FROM events),
            r AS (SELECT event_type, h,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY h) AS rn
                  FROM h),
            k AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS n_hashes,
                         CAST(MAX(h) AS BIGINT) AS kth_hash
                  FROM r WHERE rn <= {_KMV_K} GROUP BY 1)
            SELECT event_type, n_hashes, kth_hash,
                   CASE WHEN n_hashes >= {_KMV_K}
                        THEN CAST(({_KMV_K - 1}
                                   * CAST(9223372036854775808 AS HUGEINT))
                                  // kth_hash AS BIGINT)
                        ELSE n_hashes END AS est_distinct
            FROM k
        """,
        "rfm_segments": """
            WITH p AS (SELECT user_id,
                              MAX(datediff('day', TIMESTAMP '1970-01-01', ts))
                                  AS last_day,
                              CAST(COUNT(*) AS BIGINT) AS freq,
                              CAST(SUM(CAST(FLOOR(value * 100 + 0.5)
                                            AS BIGINT)) AS BIGINT) AS cents
                       FROM events WHERE event_type = 'purchase' GROUP BY 1),
            r AS (SELECT user_id,
                         ROW_NUMBER() OVER (ORDER BY last_day, user_id) AS rr,
                         ROW_NUMBER() OVER (ORDER BY freq, user_id) AS rf,
                         ROW_NUMBER() OVER (ORDER BY cents, user_id) AS rm
                  FROM p),
            n AS (SELECT COUNT(*) AS n FROM p)
            SELECT user_id,
                   1 + (rr - 1) * 5 // n.n AS r,
                   1 + (rf - 1) * 5 // n.n AS f,
                   1 + (rm - 1) * 5 // n.n AS m,
                   100 * (1 + (rr - 1) * 5 // n.n)
                   + 10 * (1 + (rf - 1) * 5 // n.n)
                   + (1 + (rm - 1) * 5 // n.n) AS rfm
            FROM r, n
        """,
        "nation_profit": """
            SELECT CAST(s.s_nationkey AS BIGINT) AS supp_nation,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                       * 100 + 0.5) AS BIGINT)
                            - CAST(l.l_quantity AS BIGINT)
                              * (CAST(FLOOR(p.p_retailprice * 100 + 0.5)
                                      AS BIGINT) // 2)) AS BIGINT)
                       AS profit_cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE p.p_name LIKE '%red%'
            GROUP BY 1, 2
        """,
        "returnflag_priority": """
            SELECT l.l_returnflag,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT',
                                                            '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT',
                                                            '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "promo_revenue": """
            WITH s AS (
              SELECT
                CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(FLOOR(l.l_extendedprice
                                              * (1 - l.l_discount) * 100
                                              + 0.5) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS promo_cents,
                CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                    * 100 + 0.5) AS BIGINT)) AS BIGINT)
                    AS total_cents
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
                AND l.l_shipdate < TIMESTAMP '1996-04-01')
            SELECT promo_cents, total_cents,
                   promo_cents * 1000000 // GREATEST(total_cents, 1)
                       AS promo_ppm
            FROM s
        """,
        "excess_suppliers": f"""
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
                   q.total_qty
            FROM (SELECT l.l_suppkey,
                         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                             AS total_qty
                  FROM lineitem l
                  JOIN part p ON p.p_partkey = l.l_partkey
                  WHERE p.p_name LIKE '%widget%'
                    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l.l_shipdate < TIMESTAMP '1997-01-01'
                  GROUP BY 1
                  HAVING SUM(CAST(l.l_quantity AS BIGINT))
                         > {_EXCESS_QTY_MIN}) q
            JOIN supplier s ON s.s_suppkey = q.l_suppkey
        """,
        "small_qty_revenue": """
            WITH a AS (SELECT l_partkey,
                              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                                  AS qty_sum,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                                          AS BIGINT)), 0) AS BIGINT)
                       AS revenue_cents
            FROM lineitem l JOIN a ON a.l_partkey = l.l_partkey
            WHERE 2 * CAST(l.l_quantity AS BIGINT) * a.n < a.qty_sum
        """,
        "bpe_pair_counts": """
            WITH w AS (
              SELECT word, CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT unnest(regexp_extract_all(lower(text),
                                                     '[a-z0-9]+')) AS word
                    FROM documents)
              GROUP BY 1),
            pos AS (SELECT word, n,
                           unnest(range(1, LENGTH(word) + 1)) AS i
                    FROM w),
            pairs AS (SELECT substr(word, i, 1) AS "left",
                             CASE WHEN i < LENGTH(word)
                                  THEN substr(word, i + 1, 1)
                                  ELSE '</w>' END AS "right",
                             n
                      FROM pos)
            SELECT "left", "right",
                   CAST(SUM(n) AS BIGINT) AS pair_count
            FROM pairs GROUP BY 1, 2
            ORDER BY pair_count DESC, "left", "right" LIMIT 20
        """,
        "hdr_quantiles": """
            WITH v AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL),
            b AS (SELECT CASE WHEN c < 32 THEN c
                              ELSE (16 + ((c >> (LENGTH(BIN(c)) - 5)) & 15))
                                   << (LENGTH(BIN(c)) - 5) END AS bucket
                  FROM v),
            g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
                  FROM b GROUP BY 1),
            c1 AS (SELECT bucket, SUM(n) OVER (ORDER BY bucket) AS cum
                   FROM g),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g),
            q AS (SELECT * FROM (VALUES (50), (90), (99)) AS qq(q_pct))
            SELECT CAST(q.q_pct AS BIGINT) AS q_pct,
                   CAST(MIN(c1.bucket) AS BIGINT) AS est_cents,
                   t.tot AS n_rows
            FROM q, t, c1
            WHERE 100 * c1.cum >= q.q_pct * t.tot
            GROUP BY 1, 3
        """,
        "hdr_quantiles_by_type": """
            WITH v AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL),
            b AS (SELECT event_type,
                         CASE WHEN c < 32 THEN c
                              ELSE (16 + ((c >> (LENGTH(BIN(c)) - 5)) & 15))
                                   << (LENGTH(BIN(c)) - 5) END AS bucket
                  FROM v),
            g AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
                  FROM b GROUP BY 1, 2),
            c1 AS (SELECT event_type, bucket,
                          SUM(n) OVER (PARTITION BY event_type
                                       ORDER BY bucket) AS cum
                   FROM g),
            t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
                  FROM g GROUP BY 1),
            q AS (SELECT * FROM (VALUES (50), (90), (99)) AS qq(q_pct))
            SELECT c1.event_type,
                   CAST(q.q_pct AS BIGINT) AS q_pct,
                   CAST(MIN(c1.bucket) AS BIGINT) AS est_cents,
                   t.tot AS n_rows
            FROM q, t, c1
            WHERE c1.event_type = t.event_type
              AND 100 * c1.cum >= q.q_pct * t.tot
            GROUP BY 1, 2, 4
        """,
        "order_count_distribution": """
            WITH per_cust AS (
                SELECT c.c_custkey,
                       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY c.c_custkey)
            SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM per_cust GROUP BY 1
        """,
        "dsir_importance": f"""
            WITH tok AS (
              SELECT doc_id, lang,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS w
              FROM documents),
            hs AS (SELECT doc_id, lang,
                          CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT
                               % {_DSIR_BUCKETS} AS BIGINT) AS h
                   FROM tok),
            cnt AS (SELECT h,
                           CAST(COUNT(*) AS BIGINT) AS n_raw,
                           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                                AS BIGINT) AS n_tgt
                    FROM hs GROUP BY 1),
            wt AS (SELECT h,
                          CAST((n_tgt + 1) * 1000000 // (n_raw + 1)
                               AS BIGINT) AS w_ppm
                   FROM cnt)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(w_ppm) AS BIGINT) AS importance_sum
            FROM hs JOIN wt USING (h) GROUP BY 1
        """,
        "graph_neighbor_degree": f"""
            WITH e AS ({_co_edges_sql(1)}),
            s AS (SELECT u AS node, v AS nbr FROM e
                  UNION ALL SELECT v AS node, u AS nbr FROM e),
            d AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
                  FROM s GROUP BY node)
            SELECT s.node, d2.degree,
                   CAST(SUM(dn.degree) AS BIGINT) AS nbr_degree_sum,
                   CAST(SUM(dn.degree) * 1000000 // d2.degree AS BIGINT)
                       AS mean_nbr_deg_ppm
            FROM s
            JOIN d dn ON dn.node = s.nbr
            JOIN d d2 ON d2.node = s.node
            GROUP BY s.node, d2.degree
        """,
        "coverage_select": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS w
              FROM documents),
            d AS (SELECT DISTINCT doc_id, w FROM tok),
            c1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                   FROM d GROUP BY 1),
            w1 AS (SELECT doc_id, n FROM c1 ORDER BY n DESC, doc_id LIMIT 1),
            cov1 AS (SELECT DISTINCT w FROM d
                     WHERE doc_id IN (SELECT doc_id FROM w1)),
            c2 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM d
                   WHERE w NOT IN (SELECT w FROM cov1)
                     AND doc_id NOT IN (SELECT doc_id FROM w1)
                   GROUP BY 1),
            w2 AS (SELECT doc_id, n FROM c2 ORDER BY n DESC, doc_id LIMIT 1),
            cov2 AS (SELECT w FROM cov1
                     UNION SELECT w FROM d
                     WHERE doc_id IN (SELECT doc_id FROM w2)),
            c3 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM d
                   WHERE w NOT IN (SELECT w FROM cov2)
                     AND doc_id NOT IN (SELECT doc_id FROM w1
                                        UNION ALL SELECT doc_id FROM w2)
                   GROUP BY 1),
            w3 AS (SELECT doc_id, n FROM c3 ORDER BY n DESC, doc_id LIMIT 1)
            SELECT CAST(1 AS BIGINT) AS round, doc_id, n AS new_tokens FROM w1
            UNION ALL SELECT CAST(2 AS BIGINT), doc_id, n FROM w2
            UNION ALL SELECT CAST(3 AS BIGINT), doc_id, n FROM w3
        """,
        "peak_concurrency": """
            WITH mk AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                              PARTITION BY user_id ORDER BY ts)
                            > 3600000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events),
            sess AS (SELECT user_id, ts,
                            SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
                     FROM mk),
            iv AS (SELECT user_id, sid,
                          MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
                   FROM sess GROUP BY 1, 2),
            d AS (SELECT s AS t, 1 AS delta FROM iv
                  UNION ALL SELECT e + 1, -1 FROM iv),
            agg AS (SELECT t, SUM(delta) AS delta FROM d GROUP BY t),
            run AS (SELECT SUM(delta) OVER (ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS conc
                    FROM agg)
            SELECT CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_sessions,
                   CAST(MAX(conc) AS BIGINT) AS peak_concurrency
            FROM run
        """,
        "daily_ohlc": """
            WITH base AS (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     epoch_us(ts) AS us, event_id,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events),
            r AS (SELECT *,
                    ROW_NUMBER() OVER (PARTITION BY event_type, day
                        ORDER BY us, event_id) AS rno,
                    ROW_NUMBER() OVER (PARTITION BY event_type, day
                        ORDER BY us DESC, event_id DESC) AS rnc
                  FROM base)
            SELECT event_type, day,
                   CAST(MAX(CASE WHEN rno = 1 THEN cents END) AS BIGINT)
                       AS open_cents,
                   CAST(MAX(cents) AS BIGINT) AS high_cents,
                   CAST(MIN(cents) AS BIGINT) AS low_cents,
                   CAST(MAX(CASE WHEN rnc = 1 THEN cents END) AS BIGINT)
                       AS close_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM r GROUP BY 1, 2
        """,
        "late_events": """
            WITH o AS (
              SELECT event_type, epoch_us(ts) AS us,
                     MAX(epoch_us(ts)) OVER (ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS wm
              FROM events)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN wm IS NOT NULL
                                  AND us < wm - 3600000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM o GROUP BY 1
        """,
        "daily_locf": """
            WITH base AS (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     epoch_us(ts) AS us, event_id,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day
                      ORDER BY us DESC, event_id DESC) AS rn
                  FROM base),
            daily AS (SELECT event_type, day, cents FROM r WHERE rn = 1),
            span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
                     FROM daily GROUP BY 1),
            grid AS (SELECT event_type,
                            unnest(generate_series(d0, d1)) AS day
                     FROM span),
            j AS (SELECT g.event_type, g.day, d.cents
                  FROM grid g LEFT JOIN daily d
                    ON d.event_type = g.event_type AND d.day = g.day)
            SELECT event_type, day,
                   CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
                        PARTITION BY event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS value_cents,
                   CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
                       AS filled
            FROM j
        """,
        "price_qty_hist2d": """
            SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) // 1000
                       AS price_bucket,
                   CAST(l_quantity AS BIGINT) AS qty,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        "event_type_comovement": """
            WITH daily AS (
              SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            nd AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n
                   FROM daily),
            sx AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS s
                   FROM daily GROUP BY 1),
            pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
                      FROM sx a JOIN sx b ON a.event_type < b.event_type),
            sxy AS (SELECT a.event_type AS ta, b.event_type AS tb,
                           CAST(SUM(a.n * b.n) AS BIGINT) AS s
                    FROM daily a JOIN daily b
                      ON a.day = b.day AND a.event_type < b.event_type
                    GROUP BY 1, 2)
            SELECT p.ta AS type_a, p.tb AS type_b,
                   (SELECT n FROM nd) AS n_days,
                   CAST((SELECT n FROM nd) * COALESCE(sxy.s, 0) - x.s * y.s
                        AS BIGINT) AS cov_num
            FROM pairs p
            LEFT JOIN sxy ON sxy.ta = p.ta AND sxy.tb = p.tb
            JOIN sx x ON x.event_type = p.ta
            JOIN sx y ON y.event_type = p.tb
        """,
        "rendezvous_shards": """
            WITH sh AS (SELECT range AS shard FROM range(9)),
            h AS (SELECT doc_id, shard,
                         md5(CAST(doc_id AS VARCHAR) || ':'
                             || CAST(shard AS VARCHAR)) AS hv
                  FROM documents, sh),
            o AS (SELECT doc_id, shard AS old_shard FROM h WHERE shard < 8
                  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY hv DESC, shard) = 1),
            n AS (SELECT doc_id, shard AS new_shard FROM h
                  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY hv DESC, shard) = 1)
            SELECT old_shard, new_shard, COUNT(*) AS n_docs
            FROM o JOIN n USING (doc_id)
            GROUP BY 1, 2
        """,
        "redirect_resolve": """
            -- closed form for the chain d -> d/2 (even) -> ... -> odd:
            -- the terminal strips all factors of two (lowest-set-bit trick)
            SELECT doc_id,
                   CASE WHEN doc_id = 0 THEN 0
                        ELSE doc_id // (doc_id & -doc_id) END AS target_id,
                   CASE WHEN doc_id = 0 THEN 0
                        ELSE bit_count((doc_id & -doc_id) - 1) END AS n_hops
            FROM documents
        """,
        "url_canonical_dedup": """
            WITH u AS (
              SELECT doc_id, doc_id // 3 AS a, (doc_id // 3) % 7 AS s,
                     doc_id % 3 AS v
              FROM documents),
            raw AS (
              SELECT doc_id,
                CASE v
                  WHEN 0 THEN 'https://www.s' || s || '.example.org/a/' || a
                  WHEN 1 THEN 'HTTPS://WWW.S' || s || '.EXAMPLE.ORG/a/' || a || '/'
                  ELSE 'https://www.s' || s || '.example.org/a/' || a
                       || '?utm_source=feed&ref=tw#frag'
                END AS url
              FROM u),
            rest AS (
              SELECT doc_id,
                     lower(regexp_extract(url, '^[^/]+//[^/?#]+')) AS auth,
                     regexp_replace(
                         substr(url, length(regexp_extract(url, '^[^/]+//[^/?#]+')) + 1),
                         '[?#].*$', '') AS p
              FROM raw),
            canon AS (
              -- mirrors canonical_url exactly: ALL trailing slashes
              -- stripped on non-root paths, all-slash paths collapse to '/'
              SELECT doc_id,
                     auth || CASE WHEN length(p) > 1 AND p LIKE '%/'
                                  THEN COALESCE(NULLIF(
                                           regexp_replace(p, '/+$', ''), ''), '/')
                                  ELSE p END AS canonical_url
              FROM rest)
            SELECT canonical_url, COUNT(*) AS n_variants,
                   MIN(doc_id) AS keep_doc_id
            FROM canon GROUP BY 1
        """,
        "merge_upsert": """
            WITH base AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k,
                     CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders),
            u AS (
              SELECT k, cents, 0 AS version, 0 AS is_del FROM base
              UNION ALL
              SELECT k,
                     CASE WHEN k % 11 = 0 THEN 0 ELSE cents + 100 END,
                     1,
                     CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END
              FROM base WHERE k % 11 = 0 OR k % 7 = 0),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                      ORDER BY version DESC) AS rn
                  FROM u)
            SELECT k AS o_orderkey, CAST(cents AS BIGINT) AS cents,
                   CAST(version AS BIGINT) AS version
            FROM r WHERE rn = 1 AND is_del = 0
        """,
        "bucketed_join_revenue": """
            SELECT o.o_orderpriority,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice
                                       * (1 - l.l_discount) * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "spend_gini": """
            WITH s AS (SELECT o_custkey,
                              CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                            AS BIGINT)) AS BIGINT) AS cents
                       FROM orders GROUP BY 1),
            r AS (SELECT cents,
                         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
                         (SELECT COUNT(*) FROM s) AS n,
                         (SELECT SUM(cents) FROM s) AS tot
                  FROM s)
            SELECT CAST(MAX(n) AS BIGINT) AS n_users,
                   CAST(MAX(tot) AS BIGINT) AS total_cents,
                   CAST(SUM((2 * i - n - 1) * cents) * 1000000
                        // (MAX(n) * MAX(tot)) AS BIGINT) AS gini_ppm
            FROM r
        """,
        "pii_redact": f"""
            WITH t AS ({_PII_TEXT_SQL})
            SELECT c_custkey,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{EMAIL_RE}', '[EMAIL]', 'g'),
                       '{PHONE_RE}', '[PHONE]', 'g'),
                       '{IPV4_RE}', '[IP]', 'g') AS redacted,
                   CAST(len(regexp_extract_all(text, '{EMAIL_RE}'))
                        AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text, '{PHONE_RE}'))
                        AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text, '{IPV4_RE}'))
                        AS BIGINT) AS n_ipv4
            FROM t
        """,
        "pii_stats": f"""
            WITH t AS ({_PII_TEXT_SQL}),
            c AS (SELECT
                    len(regexp_extract_all(text, '{EMAIL_RE}')) AS e,
                    len(regexp_extract_all(text, '{PHONE_RE}')) AS p,
                    len(regexp_extract_all(text, '{IPV4_RE}')) AS i
                  FROM t)
            SELECT 'email' AS pii_type,
                   CAST(COUNT(*) FILTER (e > 0) AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(e), 0) AS BIGINT) AS n_hits FROM c
            UNION ALL
            SELECT 'phone',
                   CAST(COUNT(*) FILTER (p > 0) AS BIGINT),
                   CAST(COALESCE(SUM(p), 0) AS BIGINT) FROM c
            UNION ALL
            SELECT 'ipv4',
                   CAST(COUNT(*) FILTER (i > 0) AS BIGINT),
                   CAST(COALESCE(SUM(i), 0) AS BIGINT) FROM c
        """,
        "quality_classifier": f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS w
              FROM documents),
            wt AS (SELECT doc_id,
                          CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT
                               % {_QC_BUCKETS} AS BIGINT) - 1000 AS wt
                   FROM tok)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(wt) AS BIGINT) AS score_sum,
                   CAST(CASE WHEN SUM(wt) >= 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS keep
            FROM wt GROUP BY 1
        """,
        "record_highs": """
            WITH o AS (
              SELECT event_id,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
                     MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS mx
              FROM events)
            SELECT event_id, value_cents
            FROM o WHERE mx IS NULL OR value_cents > mx
        """,
        "lm_score": f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS l
              FROM documents),
            t2 AS (SELECT doc_id, unnest(l) AS w,
                          generate_subscripts(l, 1) AS pos
                   FROM tok),
            bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
                   FROM t2 a JOIN t2 b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            cnt AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
            pre AS (SELECT w1, SUM(n) AS d FROM cnt GROUP BY 1),
            model AS (SELECT c.w1, c.w2, c.n, p.d
                      FROM cnt c JOIN pre p USING (w1)
                      WHERE c.n >= {_LM_MIN_N})
            SELECT g.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(COUNT(m.w1) AS BIGINT) AS n_hits,
                   CAST(COALESCE(SUM(m.n * 1000000 // m.d), 0)
                        AS BIGINT) AS score_ppm
            FROM bg g LEFT JOIN model m
              ON g.w1 = m.w1 AND g.w2 = m.w2
            GROUP BY 1
        """,
        "bm25_search": f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS w
              FROM documents),
            dl AS (SELECT d.doc_id,
                          COALESCE(t.c, 0) AS dl
                   FROM (SELECT DISTINCT doc_id FROM documents) d
                   LEFT JOIN (SELECT doc_id, COUNT(*) AS c
                              FROM tok GROUP BY 1) t USING (doc_id)),
            tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                           CAST(COALESCE(SUM(dl), 0) AS HUGEINT) AS totlen
                    FROM dl),
            q AS (SELECT * FROM (VALUES {", ".join(
                f"('{w}')" for w in _BM25_TERMS)}) t(w)),
            tf AS (SELECT doc_id, w, CAST(COUNT(*) AS HUGEINT) AS tf
                   FROM tok WHERE w IN (SELECT w FROM q) GROUP BY 1, 2),
            df AS (SELECT w, CAST(COUNT(*) AS HUGEINT) AS df
                   FROM tf GROUP BY 1),
            sc AS (SELECT tf.doc_id,
                          SUM((1000000 * (2 * t.n - 2 * df.df + 1)
                               // (2 * df.df + 1))
                              * (22 * tf.tf * t.totlen)
                              // (10 * tf.tf * t.totlen + 3 * t.totlen
                                  + 9 * dl.dl * t.n)) AS score
                   FROM tf
                   JOIN df USING (w)
                   JOIN dl ON dl.doc_id = tf.doc_id
                   CROSS JOIN tot t
                   GROUP BY 1)
            SELECT doc_id, CAST(score AS BIGINT) AS score_ppm
            FROM sc
            ORDER BY score DESC, doc_id
            LIMIT {_BM25_K}
        """,
        "curriculum_pack": f"""
            SELECT doc_id, n_tokens,
                   CAST(cum0 // {SEQ_CAPACITY} AS BIGINT) AS seq_id,
                   CAST(cum0 % {SEQ_CAPACITY} AS BIGINT) AS seq_offset
            FROM (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY n_tokens, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS cum0
                FROM (SELECT doc_id,
                             CAST(len(regexp_extract_all(lower(text),
                                                         '[a-z0-9]+'))
                                  AS BIGINT) AS n_tokens
                      FROM documents)
            )
        """,
        "graph_harmonic": f"""
            WITH e AS ({_co_edges_sql(2)}),
            sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
            nd AS (SELECT DISTINCT u AS node FROM sym),
            seed AS (SELECT node AS s FROM nd ORDER BY node LIMIT 4),
            d0 AS (SELECT s AS node, s AS sid, 0 AS hops FROM seed),
            d1 AS (SELECT node, sid, MIN(hops) AS hops FROM (
                     SELECT node, sid, hops FROM d0
                     UNION ALL SELECT sym.v, d0.sid, d0.hops + 1
                     FROM sym JOIN d0 ON sym.u = d0.node)
                   GROUP BY 1, 2),
            d2 AS (SELECT node, sid, MIN(hops) AS hops FROM (
                     SELECT node, sid, hops FROM d1
                     UNION ALL SELECT sym.v, d1.sid, d1.hops + 1
                     FROM sym JOIN d1 ON sym.u = d1.node)
                   GROUP BY 1, 2),
            d3 AS (SELECT node, sid, MIN(hops) AS hops FROM (
                     SELECT node, sid, hops FROM d2
                     UNION ALL SELECT sym.v, d2.sid, d2.hops + 1
                     FROM sym JOIN d2 ON sym.u = d2.node)
                   GROUP BY 1, 2)
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(COUNT(*) AS BIGINT) AS n_sources,
                   CAST(SUM(1000000 // hops) AS BIGINT) AS harmonic_ppm
            FROM d3 WHERE hops > 0 GROUP BY 1
        """,
    }
