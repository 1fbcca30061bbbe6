"""Hand-computable fixtures for the late-round-3 operators: the sf tables
hash-match them against DuckDB, but these pin the interesting paths with
values small enough to verify by hand (memory: add a synthetic fixture when
the sf data might not exercise a path)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ner_extractor_ray.pipelines.queries import (
    q_events_anomalies,
    q_inverted_index,
    q_orders_zorder,
    q_user_pareto,
    q_value_mannwhitney_u,
)


def test_mannwhitney_hand_computed(tmp_path):
    # purchase values [1, 2, 2], view [2, 3]:
    # U = 0 + 0.5 + 0.5 = 1.0 → u2 = 2
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "purchase", "purchase",
                                "view", "view", "click"]),
        "value": pa.array([1.0, 2.0, 2.0, 2.0, 3.0, 99.0]),
    }), tmp_path / "events.parquet")
    out = q_value_mannwhitney_u(str(tmp_path)).to_pandas()
    assert out.iloc[0]["n1"] == 3 and out.iloc[0]["n2"] == 2
    assert out.iloc[0]["u2"] == 2  # click row ignored


def test_pareto_hand_computed(tmp_path):
    # user 1 → 8 events, users 2, 3 → 1 each: the head is exactly user 1
    # (its exclusive prefix 0 < 8; user 2 sits AT the 80% point — strict <
    # excludes it, mirroring "smallest prefix reaching ≥ 80%")
    pq.write_table(pa.table({
        "user_id": pa.array([1] * 8 + [2, 3], pa.int64()),
    }), tmp_path / "events.parquet")
    out = q_user_pareto(str(tmp_path)).to_pandas()
    row = out.iloc[0]
    assert (row["n_users"], row["n_events"], row["n_users_80"]) == (3, 10, 1)
    assert row["users_share_ppm"] == 333333


def test_zorder_known_bits(tmp_path):
    # cents 4096 → zx=1, 1995-01-02 → zy=1 → interleave 0b11 = 3;
    # cents 8192 → zx=2, 1995-01-01 → zy=0 → bit 1 of zx lands at pos 2 → 4
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([40.96, 81.92]),
        "o_orderdate": pa.array(
            [pd.Timestamp("1995-01-02"), pd.Timestamp("1995-01-01")],
            pa.timestamp("us")),
    }), tmp_path / "orders.parquet")
    out = q_orders_zorder(str(tmp_path)).to_pandas().set_index("o_orderkey")
    assert (out.loc[1, "zx"], out.loc[1, "zy"], out.loc[1, "zvalue"]) == (1, 1, 3)
    assert (out.loc[2, "zx"], out.loc[2, "zy"], out.loc[2, "zvalue"]) == (2, 0, 4)


def test_inverted_index_head_cap(tmp_path):
    # 'zzz' in 40 docs (df > 32): postings keep only the 32 smallest doc
    # ids; 'yy' in 2 docs keeps both — exercises the lossless combiner and
    # the head cap
    docs = [(i, "zzz") for i in range(1, 41)] + [(41, "yy"), (42, "yy")]
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    }), tmp_path / "documents.parquet")
    out = q_inverted_index(str(tmp_path)).to_pandas().set_index("token")
    assert out.loc["zzz", "df"] == 40
    assert out.loc["zzz", "postings"] == ",".join(f"{i}:0" for i in range(1, 33))
    assert out.loc["yy", "df"] == 2
    assert out.loc["yy", "postings"] == "41:0,42:0"


def test_anomalies_planted_spike(tmp_path):
    # 30 quiet days (10 events) + one 100-event spike: median 10, MAD 0 →
    # only the spike day exceeds the 3-MAD gate, deviation +90
    ts = []
    for d in range(30):
        ts += [pd.Timestamp("2020-01-01") + pd.Timedelta(days=d)] * 10
    ts += [pd.Timestamp("2020-02-15")] * 100
    pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}),
                   tmp_path / "events.parquet")
    out = q_events_anomalies(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n"] == 100 and out.iloc[0]["deviation"] == 90
