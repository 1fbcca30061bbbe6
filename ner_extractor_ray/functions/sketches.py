"""Mergeable sketches for approximate aggregates at 100 TB scale.

HyperLogLog (Flajolet et al. 2007): per-batch partial register tables merged
with an associative/commutative MAX — the canonical "pre-aggregate inside
map_batches, then one narrow groupby" shape. The register table itself is
deterministic (md5-based hash, no seeds), so it is exactly replicable in SQL
(`('0x' || substr(md5(v), 1, 16))::UBIGINT`, the same convention as the
simhash oracle) and hash-comparable — only the final estimate is approximate.

At scale: distinct-counting 10^12 keys exactly needs a full shuffle of every
key; the HLL register table is 256 rows per stage regardless of cardinality
and merges in one tiny groupby. The estimate's standard error is
1.04/sqrt(m) ≈ 6.5% at m=256.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Sum

HLL_BUCKET_BITS = 8
HLL_M = 1 << HLL_BUCKET_BITS          # 256 registers
_REM_BITS = 64 - HLL_BUCKET_BITS      # 56-bit remainder per hash


def _hash64(values) -> np.ndarray:
    """First 16 md5 hex chars of str(v) → uint64 (== the SQL convention)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
    return out


def hll_registers(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    """(bucket, rho) register table for the column's distinct values.

    bucket = top 8 hash bits; rho = leading-zero count of the 56-bit
    remainder + 1 == 57 - bit_length(remainder) (the 0-remainder case folds
    into the same formula). Only observed buckets are emitted, max-merged
    across batches — partial registers per batch, ONE 256-row groupby."""
    from ..stages.canonicalize import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = _hash64(t.column(col).to_pylist())
        bucket = (h >> np.uint64(_REM_BITS)).astype(np.int64)
        rem = h & np.uint64((1 << _REM_BITS) - 1)
        # 57 - bit_length(rem): vectorized bit_length via float log2 is
        # unsafe at 56 bits; use the exact integer path
        rho = np.fromiter(
            (57 - int(r).bit_length() for r in rem), np.int64, len(rem)
        )
        regs = np.zeros(HLL_M, np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.nonzero(regs)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64), pa.int64()),
                         "rho": pa.array(regs[nz], pa.int64())})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"],
        Max("rho", alias_name="rho"),
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_hash(values, row: int) -> np.ndarray:
    """uint64 md5 hash of 'row:value' → column index (== SQL convention
    ('0x' || substr(md5(j || ':' || v), 1, 16))::UBIGINT % width)."""
    out = np.empty(len(values), dtype=np.int64)
    pre = f"{row}:".encode()
    for i, v in enumerate(values):
        h = int(hashlib.md5(pre + str(v).encode()).hexdigest()[:16], 16)
        out[i] = h % CMS_WIDTH
    return out


def cms_counters(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    """Count-Min sketch counter table (j, col, n) — depth×width exact-int64
    counters that merge by SUM: frequency estimation whose state is
    depth·width rows at ANY key cardinality (Cormode & Muthukrishnan 2005).
    Per-batch partial counter matrices → one narrow groupby; only observed
    (j, col) cells are emitted (zero cells are absent on both the engine and
    the SQL side, keeping the tables hash-comparable)."""
    from ..stages.canonicalize import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"j": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vals = t.column(col).to_pylist()
        js, cols, ns = [], [], []
        for j in range(CMS_DEPTH):
            mat = np.zeros(CMS_WIDTH, np.int64)
            np.add.at(mat, _cms_hash(vals, j), 1)
            nz = np.nonzero(mat)[0]
            js.append(np.full(len(nz), j, np.int64))
            cols.append(nz.astype(np.int64))
            ns.append(mat[nz])
        return pa.table({"j": pa.array(np.concatenate(js), pa.int64()),
                         "col": pa.array(np.concatenate(cols), pa.int64()),
                         "n": pa.array(np.concatenate(ns), pa.int64())})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["j", "col"],
        Sum("n", alias_name="n"),
    )


def cms_estimate(counters: "pd.DataFrame | pa.Table", value) -> int:
    """Point frequency estimate: min over rows of the value's counter.
    Never underestimates; overestimates by ≤ εN w.h.p. (ε = e/width)."""
    if isinstance(counters, pa.Table):
        counters = counters.to_pandas()
    est = None
    for j in range(CMS_DEPTH):
        c = int(_cms_hash([value], j)[0])
        m = counters.loc[(counters["j"] == j) & (counters["col"] == c), "n"]
        v = int(m.iloc[0]) if len(m) else 0
        est = v if est is None else min(est, v)
    return int(est or 0)


def hll_estimate(registers: "pd.DataFrame | pa.Table") -> float:
    """Driver-side fold of a (bucket, rho) register table → cardinality
    estimate with the standard small-range (linear counting) correction."""
    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    regs = np.zeros(HLL_M, np.float64)
    regs[registers["bucket"].to_numpy()] = registers["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    raw = alpha * HLL_M * HLL_M / np.sum(np.exp2(-regs))
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * HLL_M and zeros:
        return HLL_M * float(np.log(HLL_M / zeros))
    return float(raw)


def heavy_hitters_exact(
    items_ds: "ray.data.Dataset",
    col: str,
    *,
    capacity: int = 40,
) -> "ray.data.Dataset":
    """EXACT φ-heavy hitters (φ = 1/(capacity+1)): every value whose global
    count satisfies ``cnt · (capacity+1) > N`` with its exact count — the
    Misra–Gries / SpaceSaving two-phase shape that avoids a full
    vocabulary-wide shuffle at 100 TB.

    Phase 1 (candidates): each batch counts locally and emits only its TOP
    ``capacity`` values (count desc, value asc tiebreak). Misra–Gries
    guarantee by pigeonhole: if globally cnt > N/(capacity+1) then some
    batch has local cnt > n_batch/(capacity+1), and at most ``capacity``
    values can exceed that bound in one batch, so every global heavy hitter
    appears in SOME batch's top-``capacity`` — a superset with NO false
    negatives, ≤ capacity × num_batches rows total, independent of
    vocabulary size. The candidate set is collected (bounded) and broadcast.

    Phase 2 (exact verify): one more pass counts ONLY candidate values
    (row-local membership filter, then a candidate-sized groupby) and the
    batch-level item total rides the same union as a tagged marker row —
    the final filter is exact integer ``cnt·(capacity+1) > N``. The output
    is therefore independent of batch boundaries (phase-1 candidates may
    vary with partitioning; the verified output cannot), and the SQL oracle
    is the plain ``HAVING cnt*(C+1) > N`` — no plan replication.
    """
    import ray as _ray

    C = int(capacity)

    def top_c(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.string())})
        df = pd.DataFrame({"v": t.column(col).to_pylist()})
        g = df.groupby("v", as_index=False).size()
        g = g.sort_values(["size", "v"], ascending=[False, True]).head(C)
        return pa.table({"v": pa.array(g["v"].astype(str), pa.string())})

    cand_rows = (
        items_ds.map_batches(top_c, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Max("v", alias_name="_m"))  # distinct-by-groupby
    )
    # distinct candidate values, bounded by capacity x num_batches
    cands = set()
    for b in cand_rows.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cands.update(b.column("v").to_pylist())
    cref = _ray.put(cands)

    _TOTAL = "\x00__total__"

    def count_cands(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        vals = [str(v) for v in t.column(col).to_pylist()]
        n = len(vals)
        local: dict[str, int] = {}
        for v in vals:
            if v in cs:
                local[v] = local.get(v, 0) + 1
        keys = sorted(local)
        return pa.table(
            {"v": pa.array(keys + [_TOTAL], pa.string()),
             "cnt": pa.array([local[k] for k in keys] + [n], pa.int64())}
        )

    counted = (
        items_ds.map_batches(count_cands, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    total = 0
    for b in counted.iter_batches(batch_size=65536, batch_format="pyarrow"):
        mask = pc.equal(b.column("v"), _TOTAL)
        if pc.any(mask).as_py():
            total = int(b.filter(mask).column("cnt")[0].as_py())
            break

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(t.column("v"), _TOTAL),
            pc.greater(pc.multiply(pc.cast(t.column("cnt"), pa.int64()),
                                   pa.scalar(C + 1, pa.int64())),
                       pa.scalar(total, pa.int64())),
        )
        out = t.filter(keep)
        return pa.table({"word": out.column("v"),
                         "cnt": pc.cast(out.column("cnt"), pa.int64())})

    return counted.map_batches(finish, batch_format="pyarrow")


def hdr_bucket(c: np.ndarray) -> np.ndarray:
    """HDR-histogram bucket representative of non-negative int64 values:
    values < 32 are exact; above, the bucket keeps the leading bit plus the
    next 4 mantissa bits — ``(16 + top4) << (bitlen - 5)`` — so the
    representative is the bucket's LOWER bound and the relative error is
    ≤ 1/16 at any magnitude. Pure integer arithmetic (bitlength via
    ``np.frexp``, exact for values < 2^53), so the mapping is bit-identical
    in any engine — the SQL oracle replicates it with BIN()/shifts. Bucket
    counts are Sum-mergeable: the sketch is a ≤ ~1000-row aggregate at any
    cardinality, the same 100-TB contract as the HLL/CMS/KMV family."""
    c = np.asarray(c, dtype=np.int64)
    out = c.copy()
    big = c >= 32
    if big.any():
        v = c[big]
        _, e = np.frexp(v.astype(np.float64))  # e == bitlength, exact < 2^53
        sh = (e.astype(np.int64) - 5)
        out[big] = (16 + ((v >> sh) & 15)) << sh
    return out


def hdr_quantiles(ds: "ray.data.Dataset", col_cents: str,
                  q_pcts=(50, 90, 99)) -> "pa.Table":
    """Mergeable quantile estimates off the HDR bucket aggregate: per-batch
    bucket counting, ONE bucket-keyed groupby (≤ ~1000 rows), then the
    integer rank rule ``100·cum ≥ q·n`` walked on the driver-side
    bucket table. Returns (q_pct, est_cents, n_rows)."""
    from ..stages.canonicalize import grouped_aggregate
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column(col_cents), pa.int64()).to_numpy(zero_copy_only=False)
        b, n = np.unique(hdr_bucket(c), return_counts=True)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    rows = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                             ["bucket"], Sum("n", alias_name="n")).take_all()
    rows.sort(key=lambda r: r["bucket"])
    tot = sum(int(r["n"]) for r in rows)
    qs, ests = [], []
    for q in q_pcts:
        cum = 0
        est = rows[-1]["bucket"] if rows else 0
        for r in rows:
            cum += int(r["n"])
            if 100 * cum >= q * tot:
                est = int(r["bucket"])
                break
        qs.append(int(q))
        ests.append(est)
    return pa.table({"q_pct": pa.array(qs, pa.int64()),
                     "est_cents": pa.array(ests, pa.int64()),
                     "n_rows": pa.array([tot] * len(qs), pa.int64())})


def hdr_quantiles_grouped(
    ds: "ray.data.Dataset", key_col: str, col_cents: str,
    q_pcts=(50, 90, 99),
) -> "pa.Table":
    """Per-group HDR quantiles — the sketch × groupby composition: per-batch
    (key, bucket) counting, ONE groupby on the composite key (group_count ×
    ≤ ~1000 rows — still sketch-sized, never row-sized), then the integer
    rank walk per key on the driver. The per-group sketches are the SAME
    Sum-mergeable bucket counts as :func:`hdr_quantiles`, so a 100-TB run
    can persist them and re-derive any percentile later without a rescan.
    Returns (key, q_pct, est_cents, n_rows)."""
    from ray.data.aggregate import Sum

    from ..stages.canonicalize import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        c = pc.cast(t.column(col_cents), pa.int64()).to_numpy(
            zero_copy_only=False)
        b = hdr_bucket(c)
        cnt: dict[tuple, int] = {}
        for k, bb in zip(keys, b):
            kk = (k, int(bb))
            cnt[kk] = cnt.get(kk, 0) + 1
        return pa.table(
            {key_col: pa.array([k for k, _ in cnt], pa.string()),
             "bucket": pa.array([b2 for _, b2 in cnt], pa.int64()),
             "n": pa.array(list(cnt.values()), pa.int64())})

    rows = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                             [key_col, "bucket"],
                             Sum("n", alias_name="n")).take_all()
    per: dict[str, list] = {}
    for r in rows:
        per.setdefault(r[key_col], []).append((int(r["bucket"]), int(r["n"])))
    o_k, o_q, o_e, o_n = [], [], [], []
    for k in sorted(per):
        buckets = sorted(per[k])
        tot = sum(n for _, n in buckets)
        for q in q_pcts:
            cum, est = 0, buckets[-1][0]
            for b, n in buckets:
                cum += n
                if 100 * cum >= q * tot:
                    est = b
                    break
            o_k.append(k); o_q.append(int(q)); o_e.append(est); o_n.append(tot)
    return pa.table({key_col: pa.array(o_k, pa.string()),
                     "q_pct": pa.array(o_q, pa.int64()),
                     "est_cents": pa.array(o_e, pa.int64()),
                     "n_rows": pa.array(o_n, pa.int64())})
