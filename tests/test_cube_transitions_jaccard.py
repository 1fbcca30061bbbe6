"""Edge cases for the round-3 tail operators: CUBE lattice completeness,
transition counts under per-user skew, top-terms tie ordering, and the
source-bitmask guard on the vocabulary-Jaccard matrix."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_extractor_ray.pipelines.queries import (
    q_event_type_transitions,
    q_orders_cube,
    q_source_vocab_jaccard,
    q_top_terms_per_lang,
)


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def test_orders_cube_all_grouping_sets(tmp_path):
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
            "o_orderstatus": pa.array(["O", "F", "O"], pa.string()),
            "o_totalprice": pa.array([10.00, 20.00, 30.00], pa.float64()),
            "o_orderdate": pa.array([dt.datetime(2024, 1, 1)] * 3, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"], pa.string()),
        }
    )
    d = _write(tmp_path, "orders", t)
    rows = {(r["priority"], r["status"]): (r["n_orders"], r["total_cents"])
            for r in q_orders_cube(d).to_pylist()}
    # finest grain
    assert rows[("1-URGENT", "O")] == (1, 1000)
    assert rows[("1-URGENT", "F")] == (1, 2000)
    assert rows[("2-HIGH", "O")] == (1, 3000)
    # the three rolled-up lattice levels
    assert rows[("1-URGENT", "ALL")] == (2, 3000)
    assert rows[("ALL", "O")] == (2, 4000)
    assert rows[("ALL", "ALL")] == (3, 6000)
    assert len(rows) == 3 + 2 + 2 + 1  # fine + by-priority + by-status + total


def test_event_type_transitions_hot_user_order(tmp_path):
    """One user owns almost every event (hot key); pair counts must follow
    the (ts, event_id) total order within the user, including the ts tie."""
    n = 500
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i) for i in range(n)]
    # hot user: view,click,view,click,... ; ts tie on the last two events
    ts[-1] = ts[-2]
    types = ["view", "click"] * (n // 2)
    t = pa.table(
        {
            "event_id": pa.array(list(range(n)) + [n, n + 1], pa.int64()),
            "ts": pa.array(ts + [dt.datetime(2024, 2, 1)] * 2, pa.timestamp("us")),
            "user_id": pa.array([7] * n + [8, 8], pa.int64()),
            "event_type": pa.array(types + ["purchase", "view"], pa.string()),
            "value": pa.array([1.0] * (n + 2), pa.float64()),
            "props": pa.array(["{}"] * (n + 2), pa.string()),
        }
    )
    d = _write(tmp_path, "events", t)
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in q_event_type_transitions(d).take_all()}
    # hot user: view→click 250 times, click→view 249 times (tie resolved by
    # event_id, so the final pair stays view→click); user 8 adds purchase→view
    assert got[("view", "click")] == n // 2
    assert got[("click", "view")] == n // 2 - 1
    assert got[("purchase", "view")] == 1
    assert sum(got.values()) == (n - 1) + 1


def test_top_terms_per_lang_tie_order(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["beta alpha beta alpha zeta", "solo"], pa.string()),
            "lang": pa.array(["en", "fr"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([26, 4], pa.int64()),
        }
    )
    d = _write(tmp_path, "documents", t)
    rows = sorted(q_top_terms_per_lang(d).take_all(),
                  key=lambda r: (r["lang"], r["rk"]))
    en = [(r["token"], r["n"], r["rk"]) for r in rows if r["lang"] == "en"]
    assert en == [("alpha", 2, 1), ("beta", 2, 2), ("zeta", 1, 3)]  # tie → token ASC
    fr = [(r["token"], r["n"], r["rk"]) for r in rows if r["lang"] == "fr"]
    assert fr == [("solo", 1, 1)]


def test_source_vocab_jaccard_exact_and_guard(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma", "beta gamma delta", "omega"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["a", "b", "c"], pa.string()),
            "n_chars": pa.array([16, 16, 5], pa.int64()),
        }
    )
    d = _write(tmp_path, "documents", t)
    rows = {(r["source_a"], r["source_b"]): r for r in q_source_vocab_jaccard(d).to_pylist()}
    ab = rows[("a", "b")]
    assert (ab["inter_n"], ab["union_n"]) == (2, 4)        # {beta,gamma} / {α β γ δ}
    assert ab["jaccard_ppm"] == 2 * 1_000_000 // 4
    ac = rows[("a", "c")]
    assert (ac["inter_n"], ac["union_n"], ac["jaccard_ppm"]) == (0, 4, 0)
    assert len(rows) == 3  # every pair present even at zero intersection

    wide = pa.table(
        {
            "doc_id": pa.array(list(range(63)), pa.int64()),
            "text": pa.array(["tok"] * 63, pa.string()),
            "lang": pa.array(["en"] * 63, pa.string()),
            "source": pa.array([f"s{i:02d}" for i in range(63)], pa.string()),
            "n_chars": pa.array([3] * 63, pa.int64()),
        }
    )
    d2 = tmp_path / "wide"
    d2.mkdir()
    pq.write_table(wide, str(d2 / "documents.parquet"))
    with pytest.raises(ValueError, match="62 sources"):
        q_source_vocab_jaccard(str(d2))


def test_key_skew_stats_hot_key(tmp_path):
    """Planted hot key: 100 events for user 1, one each for users 2..5 —
    histogram shows the hot bucket and exact row totals."""
    import datetime as dt

    from ner_extractor_ray.pipelines.queries import q_key_skew_stats

    n_hot = 100
    users = [1] * n_hot + [2, 3, 4, 5]
    t = pa.table(
        {
            "event_id": pa.array(range(len(users)), pa.int64()),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * len(users), pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * len(users), pa.string()),
            "value": pa.array([1.0] * len(users), pa.float64()),
            "props": pa.array(["{}"] * len(users), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    rows = {r["bucket"]: (r["n_keys"], r["n_rows"])
            for r in q_key_skew_stats(str(tmp_path)).take_all()}
    assert rows[0] == (4, 4)        # four singleton users: floor(log2(1)) = 0
    assert rows[6] == (1, n_hot)    # hot user: floor(log2(100)) = 6
    assert len(rows) == 2
