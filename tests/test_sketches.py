"""HyperLogLog sketch tests: estimate accuracy, merge associativity, and
determinism across batch sizes (functions/sketches.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from ner_extractor_ray.functions.sketches import (
    HLL_M,
    hll_estimate,
    hll_registers,
)


def _ds(values, override_num_blocks=4):
    return ray.data.from_arrow(
        pa.table({"k": pa.array(values, pa.int64())})
    ).repartition(override_num_blocks)


def test_hll_estimate_within_standard_error():
    n = 20_000
    est = hll_estimate(hll_registers(_ds(list(range(n))), "k").to_pandas())
    # 1.04/sqrt(256) ≈ 6.5% standard error; 3 sigma ≈ 20%
    assert abs(est - n) / n < 0.20


def test_hll_duplicates_do_not_inflate():
    vals = [i % 500 for i in range(10_000)]
    est = hll_estimate(hll_registers(_ds(vals), "k").to_pandas())
    assert abs(est - 500) / 500 < 0.25


def test_hll_merge_is_union():
    # registers(A ∪ B) == max-merge(registers(A), registers(B))
    a = hll_registers(_ds(list(range(0, 5000))), "k").to_pandas()
    b = hll_registers(_ds(list(range(2500, 8000))), "k").to_pandas()
    u = hll_registers(_ds(list(range(0, 8000))), "k").to_pandas()

    def to_regs(df):
        regs = np.zeros(HLL_M, np.int64)
        regs[df["bucket"].to_numpy()] = df["rho"].to_numpy()
        return regs

    assert (np.maximum(to_regs(a), to_regs(b)) == to_regs(u)).all()


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters():
    from ner_extractor_ray.functions.sketches import cms_counters, cms_estimate

    # skewed stream: key 0 appears 5000 times, keys 1..500 once each
    vals = [0] * 5000 + list(range(1, 501))
    counters = cms_counters(_ds(vals), "k").to_pandas()
    true = {0: 5000, 1: 1, 7: 1}
    for k, t in true.items():
        est = cms_estimate(counters, k)
        assert est >= t
        assert est <= t + int(np.e / 256 * len(vals)) + 1  # εN bound
    # total mass per row is exact
    assert (counters.groupby("j")["n"].sum() == len(vals)).all()


def test_cms_partition_invariance():
    from ner_extractor_ray.functions.sketches import cms_counters

    vals = [i % 97 for i in range(4000)]
    one = cms_counters(_ds(vals, 1), "k").to_pandas()
    many = cms_counters(_ds(vals, 16), "k").to_pandas()
    key = ["j", "col"]
    assert one.sort_values(key).reset_index(drop=True).equals(
        many.sort_values(key).reset_index(drop=True)
    )


def test_hll_partition_invariance():
    one = hll_registers(_ds(list(range(3000)), 1), "k").to_pandas()
    many = hll_registers(_ds(list(range(3000)), 16), "k").to_pandas()
    assert one.sort_values("bucket").reset_index(drop=True).equals(
        many.sort_values("bucket").reset_index(drop=True)
    )


def test_heavy_hitters_exact_planted_skew():
    """Zipf-ish planted counts with a TINY capacity: candidates must include
    every true φ-heavy hitter regardless of batch boundaries, and the
    verified output must equal brute force exactly."""
    import ray.data

    from ner_extractor_ray.functions.sketches import heavy_hitters_exact

    # 3 heavy values among 50 light ones; N = 300+200+100 + 50*4 = 800
    items = (["hot"] * 300 + ["warm"] * 200 + ["mild"] * 100
             + [f"light{i}" for i in range(50)] * 4)
    # deterministic interleave so heavies are spread across blocks
    items = [items[i] for i in range(0, len(items), 7)] + \
            [items[i] for i in range(len(items)) if i % 7 != 0]
    ds = ray.data.from_items([{"w": w} for w in items]).repartition(8)
    C = 4  # phi = 1/5: threshold cnt*5 > 800 -> cnt >= 161 -> hot, warm
    got = {r["word"]: r["cnt"]
           for r in heavy_hitters_exact(ds, "w", capacity=C).take_all()}
    assert got == {"hot": 300, "warm": 200}


def test_heavy_hitters_threshold_boundary():
    """cnt*(C+1) must be strictly greater than N: a value at exactly N/(C+1)
    is NOT a heavy hitter."""
    import ray.data

    from ner_extractor_ray.functions.sketches import heavy_hitters_exact

    # N=50, C=4 -> threshold cnt*5 > 50 -> cnt > 10; plant one at exactly 10
    items = ["edge"] * 10 + ["big"] * 20 + [f"x{i}" for i in range(20)]
    ds = ray.data.from_items([{"w": w} for w in items]).repartition(4)
    got = {r["word"] for r in heavy_hitters_exact(ds, "w", capacity=4).take_all()}
    assert got == {"big"}


def test_hdr_bucket_error_bound_and_monotonicity():
    from ner_extractor_ray.functions.sketches import hdr_bucket

    v = np.concatenate([np.arange(0, 2048),
                        np.array([2**k + d for k in range(11, 52)
                                  for d in (0, 1, 2**(k - 1), 2**k - 1)])])
    b = hdr_bucket(v)
    assert (b <= v).all()                       # representative = lower bound
    small = v < 32
    assert (b[small] == v[small]).all()         # exact below 32
    big = ~small
    # bucket width is 2^(bitlen-5) == low >> 4 rounded: err < low/16
    assert ((v[big] - b[big]) * 16 < b[big]).all()
    order = np.argsort(v, kind="stable")
    assert (np.diff(b[order]) >= 0).all()       # monotone mapping


def test_hdr_quantiles_batch_invariant_and_planted():
    from ner_extractor_ray.functions.sketches import hdr_quantiles

    cents = np.arange(1, 10_001, dtype=np.int64)  # uniform 1..10000
    tbl = pa.table({"cents": pa.array(cents, pa.int64())})
    outs = []
    for parts in (1, 7, 32):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(hdr_quantiles(ds, "cents").to_pandas())
    # Sum-mergeable bucket counts -> identical sketch at any partitioning
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    got = dict(zip(outs[0]["q_pct"], outs[0]["est_cents"]))
    for q in (50, 90, 99):
        true = q * 100  # exact quantile of 1..10000
        assert got[q] <= true and (true - got[q]) * 16 < max(got[q], 1)


def test_hdr_grouped_matches_exact_per_group(tmp_path):
    # exact values < 32 buckets: the grouped sketch must equal true
    # per-group percentiles computed by hand (rank rule 100·cum >= q·n).
    import pyarrow.parquet as pq

    from ner_extractor_ray.pipelines.queries import q_hdr_quantiles_by_type

    pq.write_table(pa.table({
        "event_type": pa.array(["a"] * 10 + ["b"] * 4),
        "value": pa.array([0.01 * v for v in range(1, 11)]
                          + [0.05, 0.10, 0.15, 0.20]),
    }), tmp_path / "events.parquet")
    out = (q_hdr_quantiles_by_type(str(tmp_path)).to_pandas()
           .set_index(["event_type", "q_pct"]))
    # group a: cents 1..10 exact → p50=5, p90=9, p99=10
    assert out.loc[("a", 50), "est_cents"] == 5
    assert out.loc[("a", 90), "est_cents"] == 9
    assert out.loc[("a", 99), "est_cents"] == 10
    assert out.loc[("a", 50), "n_rows"] == 10
    # group b: cents 5,10,15,20 → p50=10 (cum 2/4), p90=20, p99=20
    assert out.loc[("b", 50), "est_cents"] == 10
    assert out.loc[("b", 90), "est_cents"] == 20
