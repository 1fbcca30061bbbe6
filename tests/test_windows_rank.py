"""Edge cases for the round-2 window/rank operators beyond the oracle parity
tests (tests/test_queries_oracle.py covers the happy path vs DuckDB)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_global_rank_all_equal_keys():
    # degenerate histogram: min == max → single bucket, rank = tiebreak order
    from ner_extractor_ray.functions.rank import global_rank

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([7.0] * 10), "id": pa.array(list(range(10)), pa.int64())})
    )
    out = global_rank(ds, "k", "id", descending=True, n_buckets=8).to_pandas()
    got = dict(zip(out["id"], out["rank"]))
    assert got == {i: i + 1 for i in range(10)}


def test_global_rank_matches_pandas_on_random_values():
    from ner_extractor_ray.functions.rank import global_rank

    rng = np.random.RandomState(7)
    vals = np.round(rng.uniform(0, 100, size=500), 2)
    ids = np.arange(500, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals), "id": pa.array(ids)}))
    out = global_rank(ds, "k", "id", descending=True, n_buckets=16).to_pandas()
    expect = (
        pd.DataFrame({"k": vals, "id": ids})
        .sort_values(["k", "id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    expect["rank"] = np.arange(1, 501)
    got = out.set_index("id")["rank"].to_dict()
    want = expect.set_index("id")["rank"].to_dict()
    assert got == want


def test_hopping_windows_k3():
    from ner_extractor_ray.stages.windows import explode_hopping_windows

    ts = pa.array([pd.Timestamp("2024-01-01 05:30:00")]).cast(pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({"ts": ts, "x": pa.array([1], pa.int64())}))
    out = explode_hopping_windows(ds, "ts", size_s=3 * 3600, hop_s=3600).to_pandas()
    h = pd.Timestamp("2024-01-01 05:00:00").value // 10**9 // 3600
    assert sorted(out["window_id"]) == [h - 2, h - 1, h]


def test_interval_join_boundary_and_empty_side():
    from ner_extractor_ray.stages.windows import interval_join

    base = pd.Timestamp("2024-01-01 00:00:00").value // 10**3  # us
    win = 3600
    # right row at t0; left rows at dt = -1s, 0, win, win+1s
    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([5, 5, 5, 5], pa.int64()),
                "ts": pa.array(
                    [base - 1_000_000, base, base + win * 1_000_000,
                     base + (win + 1) * 1_000_000],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([100], pa.int64()),
                "user_id": pa.array([5], pa.int64()),
                "ts": pa.array([base], pa.timestamp("us")),
            }
        )
    )
    out = interval_join(
        left, right, on="user_id", ts_col="ts", window_s=win
    ).to_pandas()
    assert sorted(out["event_id"].astype(int)) == [2, 3]  # inclusive both ends
    assert set(out["event_id_r"].astype(int)) == {100}

    empty = ray.data.from_arrow(
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("ts", pa.timestamp("us"))]
        ).empty_table()
    )
    out2 = interval_join(
        left, empty, on="user_id", ts_col="ts", window_s=win
    ).to_pandas()
    assert len(out2) == 0


def test_keyed_prefix_sum_matches_numpy():
    """Exclusive prefix sum over sparse, shuffled, boundary-straddling keys
    must equal the single-process cumsum in key order — bucket balance must
    not affect exactness."""
    import numpy as np
    import ray.data

    from ner_extractor_ray.functions.rank import keyed_prefix_sum

    rng = np.random.RandomState(3)
    keys = rng.choice(10_000_000, size=500, replace=False).astype("int64")
    vals = rng.randint(0, 300, size=500).astype("int64")
    rows = [{"k": int(k), "v": int(v)} for k, v in zip(keys, vals)]
    rng.shuffle(rows)  # arrival order != key order
    ds = ray.data.from_items(rows).repartition(7)

    out = keyed_prefix_sum(ds, "k", "v", n_buckets=8, out="ps").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    order = np.argsort(keys, kind="stable")
    expect = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
    assert (out["ps"].to_numpy() == expect).all()
    assert (out["k"].to_numpy() == keys[order]).all()


def test_keyed_prefix_sum_single_value_domain():
    """Degenerate domain (all keys distinct but lo==hi impossible; here
    2 rows) — edges empty path."""
    import ray.data

    from ner_extractor_ray.functions.rank import keyed_prefix_sum

    ds = ray.data.from_items([{"k": 5, "v": 7}, {"k": 9, "v": 3}])
    out = {r["k"]: r["ps"] for r in
           keyed_prefix_sum(ds, "k", "v", out="ps").take_all()}
    assert out == {5: 0, 9: 7}


def test_order_deciles_uneven_ntile_semantics(tmp_path):
    """NTILE semantics when k does not divide n: the sf tables have
    n ≡ 0 (mod 10), which would let the ⌊(rank−1)·k/n⌋ approximation pass
    vacuously — so check the piecewise tile map against DuckDB's NTILE on
    an n=17 slice (first 7 tiles of 2 rows, last 3 of 1)."""
    import duckdb
    import pyarrow.parquet as pq

    from ner_extractor_ray.pipelines.queries import oracle_sql, queries

    src = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    sliced = src.sort_by([("o_orderkey", "ascending")]).slice(0, 17)
    pq.write_table(sliced, tmp_path / "orders.parquet")

    rdf = queries()["order_deciles"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    sdf = con.execute(oracle_sql()["order_deciles"]).fetchdf()
    assert len(rdf) == 17
    got = dict(zip(rdf["o_orderkey"], rdf["decile"]))
    want = dict(zip(sdf["o_orderkey"], sdf["decile"]))
    assert got == want
    sizes = rdf["decile"].value_counts()
    assert sorted(sizes.tolist(), reverse=True) == [2] * 7 + [1] * 3
