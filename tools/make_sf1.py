"""Deterministic sf1 fixture: 10× upsample of /root/testdata/sf0.1 (round-5
directive #7 — the sf1 soak catches accidentally-quadratic verify/bucket
paths the small fixtures hide).

Fact tables are tiled FACTOR times with key shifts that preserve referential
integrity (lineitem.l_orderkey follows orders.o_orderkey, o_custkey follows
customer.c_custkey; dimension tables region/nation/part/supplier are shared,
so part/supp FKs stay valid). events gets 10× distinct users with the
original per-user patterns; documents/embeddings tile with shifted ids and
IDENTICAL payloads — every text then has 10 exact copies, which doubles as a
mild dedup stress (grouped keys of ≥10, bucket caps engaged). All SQL is
ORDER BY-pinned so the layout is reproducible run-to-run.

Usage: python tools/make_sf1.py [dst_dir]   (default /tmp/graft_sf1;
the 'sf1' in the dir name is what bench.py / _synthetic_pages_dir parse).
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
FACTOR = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    sentinel = os.path.join(DST, "_DONE")
    if os.path.exists(sentinel):
        print(f"{DST} already built")
        return
    con = duckdb.connect()

    def rp(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def stride(t, c):
        return int(con.execute(
            f"SELECT max({c}) + 1 FROM {rp(t)}").fetchone()[0])

    def copy(sql, t):
        con.execute(
            f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)

    for t in ("region", "nation", "part", "supplier"):
        copy(f"SELECT * FROM {rp(t)}", t)

    cs = stride("customer", "c_custkey")
    copy(f"""SELECT c_custkey + i * {cs} AS c_custkey, c_name, c_nationkey,
                    c_acctbal, c_mktsegment
             FROM {rp('customer')} CROSS JOIN range({FACTOR}) t(i)
             ORDER BY c_custkey""", "customer")

    oks = stride("orders", "o_orderkey")
    copy(f"""SELECT o_orderkey + i * {oks} AS o_orderkey,
                    o_custkey + i * {cs} AS o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
             FROM {rp('orders')} CROSS JOIN range({FACTOR}) t(i)
             ORDER BY o_orderkey""", "orders")

    copy(f"""SELECT l_orderkey + i * {oks} AS l_orderkey, l_partkey,
                    l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
             FROM {rp('lineitem')} CROSS JOIN range({FACTOR}) t(i)
             ORDER BY l_orderkey, l_linenumber""", "lineitem")

    es = stride("events", "event_id")
    us = stride("events", "user_id")
    copy(f"""SELECT event_id + i * {es} AS event_id, ts,
                    user_id + i * {us} AS user_id, event_type, value, props
             FROM {rp('events')} CROSS JOIN range({FACTOR}) t(i)
             ORDER BY event_id""", "events")

    ds = stride("documents", "doc_id")
    copy(f"""SELECT doc_id + i * {ds} AS doc_id, text, lang, source, n_chars
             FROM {rp('documents')} CROSS JOIN range({FACTOR}) t(i)
             ORDER BY doc_id""", "documents")

    vs = stride("embeddings", "vec_id")
    copy(f"""SELECT vec_id + i * {vs} AS vec_id, embedding, label
             FROM {rp('embeddings')} CROSS JOIN range({FACTOR}) t(i)
             ORDER BY vec_id""", "embeddings")

    open(sentinel, "w").write("ok")
    print("built", DST)


if __name__ == "__main__":
    main()
