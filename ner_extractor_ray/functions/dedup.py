"""Deduplication operators over document tables (training-data pipeline ops).

All are Dataset→Dataset transforms built from map_batches + groupby with the
same skew discipline as the KG stages: per-batch partial aggregation before
any shuffle, bucket caps with connectivity-preserving chains. Exact-dedup
mirrors the reference's duplicate-sentence multiset matching by serialized key
(scripts/generate_kfold_splits.py:122-131 → SURVEY.md D2), generalized to
content hashes; near-dup families (MinHash-LSH, SimHash, n-gram Jaccard) are
the web-scale additions.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from .textfns import (
    band_buckets_batch,
    char_shingles,
    jaccard,
    minhash_signatures_sql_batch,
    simhash64,
    word_ngrams,
)

SHINGLERS = {
    "char3": char_shingles,
    "word3": lambda s: word_ngrams(s, 3),
    "word1": lambda s: word_ngrams(s, 1),
}


def add_md5(ds: "ray.data.Dataset", col: str, out: str = "h") -> "ray.data.Dataset":
    """Content hash column (md5 hex — intentionally matches SQL md5())."""

    def fn(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        hs = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
        return t.append_column(out, pa.array(hs, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup_groups(
    ds: "ray.data.Dataset", text_col: str, id_col: str
) -> "ray.data.Dataset":
    """hash-partitioned exact dedup: one row per distinct content with the
    kept (min) id and the duplicate count. groupby on the 32-char hash, never
    on the full text, so shuffle rows stay narrow."""
    from ..stages.canonicalize import grouped_aggregate

    hashed = add_md5(ds, text_col).select_columns(["h", id_col])
    # group count == distinct-content count (corpus-scale) → bucketed plan
    return grouped_aggregate(
        hashed, ["h"],
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"),
    )


def with_simhash(
    ds: "ray.data.Dataset", text_col: str, id_col: str, out: str = "simhash"
) -> "ray.data.Dataset":
    """64-bit SimHash per document (sign-masked to int63 for Arrow int64)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        hs = [
            simhash64([w.lower() for w in (txt or "").split()]) & 0x7FFFFFFFFFFFFFFF
            for txt in texts
        ]
        return pa.table(
            {id_col: t.column(id_col), out: pa.array(hs, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _pair_texts_joined(
    cands: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    id_col: str,
    text_col: str,
) -> "ray.data.Dataset":
    """At-scale text attach for a candidate-pair table: (id_a, id_b) →
    (id_a, id_b, text_a, text_b) via a Bloom semi-join prefilter (no false
    negatives — only candidate docs' texts leave the corpus scan) and two
    partitioned hash joins. Shared by the LSH and exact set-similarity
    verifiers; never materializes any text on the driver."""
    import ray as _ray

    from .bloom import build_bloom, semi_join_prefilter
    from ..stages.joins import hash_join

    cand_ids = cands.map_batches(
        lambda t: pa.table(
            {"cid": pa.concat_arrays(
                [pc.cast(t.column("id_a"), pa.int64()).combine_chunks(),
                 pc.cast(t.column("id_b"), pa.int64()).combine_chunks()])}
        ),
        batch_format="pyarrow",
    )
    bloom_ref = _ray.put(build_bloom(cand_ids, "cid"))
    docs_f = semi_join_prefilter(
        docs.select_columns([id_col, text_col]), id_col, bloom_ref
    )
    ta = docs_f.map_batches(
        lambda t: pa.table({"id_a": pc.cast(t.column(id_col), pa.int64()),
                            "text_a": t.column(text_col)}),
        batch_format="pyarrow",
    )
    tb = docs_f.map_batches(
        lambda t: pa.table({"id_b": pc.cast(t.column(id_col), pa.int64()),
                            "text_b": t.column(text_col)}),
        batch_format="pyarrow",
    )
    return hash_join(hash_join(cands, ta, on=("id_a",)), tb, on=("id_b",))


def lsh_near_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    shingle: str = "word3",
    threshold: float = 0.8,
    n_bands: int = 16,
    num_perm: int = 64,
    bucket_cap: int = 64,
    broadcast_limit: int = 100_000,
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate candidate pairs, Jaccard-verified.

    shingle→minhash→band→bucket-groupby→verify, the canonical near-dup plan
    (same machinery as entity canonicalization, stages/canonicalize.py).
    Oversized buckets emit a sorted chain (O(n), connectivity-preserving)
    instead of O(n²) pairs — the explicit skew cap.
    Output: (id_a, id_b, jaccard, jaccard_ppm) with id_a < id_b, deduped
    across bands; ``jaccard_ppm = (|∩| * 10^6) // |∪|`` is exact integer
    arithmetic so the DuckDB oracle can hash-match it (no float rounding).
    ``id_col`` must be integer ids < 2^32 (the pair-dedup shuffle packs a
    pair into one uint64 key; _encode_pair raises on wider ids — pre-map
    wider id spaces first).
    The whole plan — md5 base hash, uint64 permutations, FNV band polynomial,
    bucket cap with chain fallback, exact-Jaccard verify — is replicated in
    ANSI SQL by ``oracle_sql()['minhash_neardup' / 'ngram_jaccard_neardup']``.
    """
    shingler = SHINGLERS[shingle]

    # Phase 1 — band explode ships (bucket, doc) ONLY: 16 bytes per band row.
    # Replicating the document text into every band row amplifies the shuffle
    # by n_bands × corpus text bytes — the one true scale-killer at 100 TB —
    # so texts are re-joined for candidate pairs only (phase 3).
    def bands(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        texts = t.column(text_col).to_pylist()
        # batched md5-minhash: each distinct shingle hashed once per batch,
        # signatures + band buckets fully vectorized (same values as the
        # per-doc minhash_signature_sql/band_buckets — pinned by unit test)
        sigs = minhash_signatures_sql_batch(
            [shingler(txt or "") for txt in texts], num_perm
        )
        buckets = band_buckets_batch(sigs, n_bands)
        return pa.table(
            {
                "bucket": pa.array(buckets.reshape(-1), pa.int64()),
                "doc": pa.array(np.repeat(ids, n_bands), pa.int64()),
            }
        )

    # Phase 2 — in-bucket candidate generation (ids only; no verification yet)
    def part_cands(group: pd.DataFrame) -> pd.DataFrame:
        # many buckets per Ray group (bucket % P) — see canonicalize.py note
        # on map_groups per-group overhead
        a, b = [], []
        for _, g in group.groupby("bucket", sort=False):
            ids = sorted(set(g["doc"]))
            n = len(ids)
            if n < 2:
                continue
            pairs = (
                [(i, j) for i in range(n) for j in range(i + 1, n)]
                if n <= bucket_cap
                else [(i, i + 1) for i in range(n - 1)]  # sorted-chain skew cap
            )
            for i, j in pairs:
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"), "id_b": pd.Series(b, dtype="int64")}
        )

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        from ..stages.canonicalize import _compact_blocks

        part = _pc.cast(t.column("bucket"), pa.int64()).to_numpy() % _compact_blocks()
        return t.append_column("__part", pa.array(part, pa.int64()))

    cands_raw = (
        ds.select_columns([id_col, text_col])
        .map_batches(bands, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_cands, batch_format="pandas")
    )

    # dedup candidates discovered in multiple bands BEFORE fetching any text.
    # Pairs pack into ONE uint64 key (ids < 2^32 — _encode_pair contract),
    # so the dedup shuffle is a single-int-column groupby: no synthetic
    # string keys (measured 8 s → ~2 s on 274k pairs at sf0.1).
    def pack(t: pa.Table) -> pa.Table:
        import numpy as np

        from .graph import _encode_pair

        a = pc.cast(t.column("id_a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("id_b"), pa.int64()).to_numpy()
        return pa.table({"k": pa.array(_encode_pair(a, b), pa.uint64())})

    def unpack(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        k = t.column("k").to_numpy()
        return pa.table(
            {"id_a": pa.array((k >> np.uint64(32)).astype(np.int64), pa.int64()),
             "id_b": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64),
                              pa.int64())}
        )

    from ..stages.canonicalize import grouped_aggregate as _ga

    cands = (
        _ga(cands_raw.map_batches(pack, batch_format="pyarrow"),
            ["k"], Count(alias_name="_nb"))
        .map_batches(unpack, batch_format="pyarrow")
        .materialize()
    )
    n_cands = cands.count()
    if n_cands == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64()),
                      "jaccard_ppm": pa.array([], pa.int64())})
        )

    # Phase 3 — texts for CANDIDATE docs only. Two physical plans, chosen by
    # candidate volume (the S7b broadcast-vs-hash-join switch):
    #   small: broadcast the candidate id set, collect candidate docs' texts
    #          once (bounded by the candidate count, not the corpus), verify
    #          map-side against the broadcast text map — 3 cheap executions;
    #   large: bloom semi-join prefilter (no false negatives) + partitioned
    #          hash joins pair×text — never materializes texts on the driver.
    # Either way the text traffic is proportional to the DUP SET, not
    # n_bands × corpus.
    import ray as _ray

    docs = ds.select_columns([id_col, text_col])

    # The broadcast-vs-join gate is about DISTINCT DOC memory, not pair
    # count: a dense candidate graph (word-1 shingles on a small vocabulary)
    # can have 10× more pairs than docs, and the broadcast text map is
    # bounded by the doc count. If pairs exceed the limit, re-gate on the
    # distinct-doc count before falling back to the heavy two-join plan.
    use_broadcast = n_cands <= broadcast_limit
    if not use_broadcast:
        cand_ids = cands.map_batches(
            lambda t: pa.table(
                {"cid": pc.unique(pa.concat_arrays(
                    [pc.cast(t.column("id_a"), pa.int64()).combine_chunks(),
                     pc.cast(t.column("id_b"), pa.int64()).combine_chunks()]))}
            ),
            batch_format="pyarrow",
        )
        n_cand_docs = _ga(cand_ids, ["cid"], Count(alias_name="_n")).count()
        use_broadcast = n_cand_docs <= broadcast_limit

    def _verify_row(ia, ib, txa, txb, a, b, jc, ppm, memo):
        # memoize per-doc shingle sets across the batch's pairs: a doc in k
        # candidate pairs is shingled once, not k times (word-1 shingles on a
        # small vocabulary produce dense candidate graphs where re-shingling
        # dominated the verify stage)
        sa = memo.get(ia)
        if sa is None:
            sa = memo[ia] = set(shingler(txa or ""))
        sb = memo.get(ib)
        if sb is None:
            sb = memo[ib] = set(shingler(txb or ""))
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        jv = jaccard(sa, sb)
        if jv >= threshold:
            a.append(int(ia))
            b.append(int(ib))
            jc.append(round(jv, 6))
            ppm.append((inter * 1_000_000) // union if union else 1_000_000)

    def _pairs_df(a, b, jc, ppm) -> pd.DataFrame:
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"), "id_b": pd.Series(b, dtype="int64"),
             "jaccard": pd.Series(jc, dtype="float64"),
             "jaccard_ppm": pd.Series(ppm, dtype="int64")}
        )

    if use_broadcast:
        from ..stages.canonicalize import rows_batched

        cid_set = set()
        for r in rows_batched(cands):
            cid_set.add(int(r["id_a"]))
            cid_set.add(int(r["id_b"]))
        idref = _ray.put(cid_set)

        def pick_texts(t: pa.Table) -> pa.Table:
            ids_in = ray.get(idref) if isinstance(idref, _ray.ObjectRef) else idref
            mask = [int(v) in ids_in for v in t.column(id_col).to_pylist()]
            out = t.filter(pa.array(mask, pa.bool_()))
            return pa.table({"cid": pc.cast(out.column(id_col), pa.int64()),
                             "txt": out.column(text_col)})

        text_map = {
            int(r["cid"]): r["txt"]
            for r in rows_batched(
                docs.map_batches(pick_texts, batch_format="pyarrow"))
        }
        tref = _ray.put(text_map)

        def verify_bc(df: pd.DataFrame) -> pd.DataFrame:
            tm = ray.get(tref) if isinstance(tref, _ray.ObjectRef) else tref
            a, b, jc, ppm = [], [], [], []
            memo: dict = {}
            for ia, ib in zip(df["id_a"], df["id_b"]):
                _verify_row(ia, ib, tm.get(int(ia)), tm.get(int(ib)),
                            a, b, jc, ppm, memo)
            return _pairs_df(a, b, jc, ppm)

        return cands.map_batches(verify_bc, batch_format="pandas")

    joined = _pair_texts_joined(cands, docs, id_col, text_col)

    # Phase 4 — exact Jaccard verification on the candidate pairs (identical
    # semantics to the in-bucket verify of the text-shuffling plan)
    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "text_a" not in df.columns:
            return _pairs_df([], [], [], [])
        a, b, jc, ppm = [], [], [], []
        memo: dict = {}
        for ia, ib, txa, txb in zip(df["id_a"], df["id_b"], df["text_a"], df["text_b"]):
            _verify_row(ia, ib, txa, txb, a, b, jc, ppm, memo)
        return _pairs_df(a, b, jc, ppm)

    return joined.map_batches(verify, batch_format="pandas")


def setsim_join_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    threshold_num: int = 3,
    threshold_den: int = 5,
    shingle: str = "word3",
    broadcast_limit: int = 100_000,
) -> "ray.data.Dataset":
    """EXACT set-similarity self-join: all distinct id pairs whose shingle
    sets have Jaccard ≥ threshold_num/threshold_den — the deterministic
    complement to the probabilistic MinHash-LSH family (no band misses).

    Blocking is prefix filtering (Chaudhuri et al. ICDE'06; PPJoin, Xiao et
    al. WWW'08): under ANY global total order of shingles, sort each doc's
    distinct shingles and emit the first ``p = n − ⌈t·n⌉ + 1`` as block
    keys; for any pair with J ≥ t, the order-smallest COMMON shingle
    provably lies inside BOTH prefixes, so block co-occurrence is a lossless
    candidate generator and the SQL oracle can be the plain all-pairs exact
    Jaccard join — no plan replication needed. The total order used is
    md5(shingle): computable row-locally with ZERO global state (a
    df-ascending order would shrink candidate counts by putting RARE
    shingles in prefixes, at the cost of broadcasting a vocabulary-sized
    ordering table — the documented at-scale tuning knob). No bucket cap:
    the lossless contract forbids dropping pairs; prefix buckets stay small
    when shingles are discriminative (word-3 grams), which is also the
    regime where this operator is the right choice over LSH.

    The verify threshold is the exact rational ``ni·den ≥ union·num`` —
    integer arithmetic end to end, bit-identical to the SQL oracle. Output:
    (id_a, id_b, jaccard_ppm), id_a < id_b, ids must be < 2^32 (pair-key
    packing, as lsh_near_dup_pairs). Docs with EMPTY shingle sets are
    excluded (Jaccard undefined), matching SQL's empty unnest.

    Verify text fetch is size-gated like lsh_near_dup_pairs: candidate-doc
    ids ≤ ``broadcast_limit`` → broadcast id set + map-side text map; above
    it → Bloom semi-join prefilter + two partitioned hash joins
    (:func:`_pair_texts_joined`) so no text ever reaches the driver. Both
    plans produce identical output (tested with broadcast_limit=0).
    """
    import ray as _ray

    from .textfns import md5_hash64
    from .graph import _encode_pair

    shingler = SHINGLERS[shingle]

    def prefixes(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        hcache: dict[str, int] = {}
        o_b, o_id = [], []
        for i, txt in zip(ids, texts):
            sh = set(shingler(txt or ""))
            n = len(sh)
            if n == 0:
                continue
            p = n - ((threshold_num * n + threshold_den - 1) // threshold_den) + 1
            keys = sorted(
                hcache[s] if s in hcache else hcache.setdefault(s, md5_hash64(s))
                for s in sh
            )[:p]
            o_b.extend(keys)
            o_id.extend([int(i)] * p)
        return pa.table(
            {"bucket": pa.array(np.asarray(o_b, dtype=np.uint64)
                                .astype(np.int64), pa.int64()),
             "doc": pa.array(o_id, pa.int64())}
        )

    from ..stages.canonicalize import _compact_blocks

    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        part = t.column("bucket").to_numpy() % P
        return t.append_column("__part", pa.array(part, pa.int64()))

    def part_cands(group: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for _, g in group.groupby("bucket", sort=False):
            ids = sorted(set(g["doc"]))
            n = len(ids)
            for i in range(n):
                for j in range(i + 1, n):
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"), "id_b": pd.Series(b, dtype="int64")}
        )

    def pack(t: pa.Table) -> pa.Table:
        import numpy as np

        a = pc.cast(t.column("id_a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("id_b"), pa.int64()).to_numpy()
        return pa.table({"k": pa.array(_encode_pair(a, b), pa.uint64())})

    def unpack(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        k = t.column("k").to_numpy()
        return pa.table(
            {"id_a": pa.array((k >> np.uint64(32)).astype(np.int64), pa.int64()),
             "id_b": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64())}
        )

    cands = (
        ds.select_columns([id_col, text_col])
        .map_batches(prefixes, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_cands, batch_format="pandas")
        .map_batches(pack, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="_nb"))
        .map_batches(unpack, batch_format="pyarrow")
        .materialize()
    )

    def _empty_out() -> pa.Table:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard_ppm": pa.array([], pa.int64())})

    if cands.count() == 0:
        import ray.data as _rd

        return _rd.from_arrow(_empty_out())

    def _verify_pair(ia, ib, txa, txb, memo, a, b, ppm):
        sa = memo.get(ia)
        if sa is None:
            sa = memo[ia] = set(shingler(txa or ""))
        sb = memo.get(ib)
        if sb is None:
            sb = memo[ib] = set(shingler(txb or ""))
        ni = len(sa & sb)
        union = len(sa) + len(sb) - ni
        if union and ni * threshold_den >= union * threshold_num:
            a.append(int(ia))
            b.append(int(ib))
            ppm.append((ni * 1_000_000) // union)

    def _ppm_df(a, b, ppm) -> pd.DataFrame:
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"),
             "id_b": pd.Series(b, dtype="int64"),
             "jaccard_ppm": pd.Series(ppm, dtype="int64")}
        )

    cid_set = set()
    for b in cands.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cid_set.update(b.column("id_a").to_pylist())
        cid_set.update(b.column("id_b").to_pylist())
        if len(cid_set) > broadcast_limit:
            break
    if len(cid_set) > broadcast_limit:
        # at-scale verify: the same Bloom-prefilter + two partitioned
        # hash-join text attach as lsh_near_dup_pairs — texts ride the
        # partitioned path, nothing corpus-sized touches the driver
        joined = _pair_texts_joined(cands, ds, id_col, text_col)

        def verify_joined(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "text_a" not in df.columns:
                return _ppm_df([], [], [])
            memo: dict = {}
            a, b, ppm = [], [], []
            for ia, ib, txa, txb in zip(df["id_a"], df["id_b"],
                                        df["text_a"], df["text_b"]):
                _verify_pair(ia, ib, txa, txb, memo, a, b, ppm)
            return _ppm_df(a, b, ppm)

        return joined.map_batches(verify_joined, batch_format="pandas")
    idref = _ray.put(cid_set)

    def pick_texts(t: pa.Table) -> pa.Table:
        ids_in = ray.get(idref)
        mask = [int(v) in ids_in for v in t.column(id_col).to_pylist()]
        out = t.filter(pa.array(mask, pa.bool_()))
        return pa.table({"cid": pc.cast(out.column(id_col), pa.int64()),
                         "txt": out.column(text_col)})

    text_map = {
        int(r["cid"]): r["txt"]
        for b in ds.select_columns([id_col, text_col])
        .map_batches(pick_texts, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
        for r in b.to_pylist()
    }
    tref = _ray.put(text_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        tm = ray.get(tref)
        memo: dict = {}
        a, b, ppm = [], [], []
        for ia, ib in zip(df["id_a"], df["id_b"]):
            _verify_pair(ia, ib, tm.get(int(ia)), tm.get(int(ib)),
                         memo, a, b, ppm)
        return _ppm_df(a, b, ppm)

    return cands.map_batches(verify, batch_format="pandas")


def levenshtein(a: str, b: str) -> int:
    """Classic unit-cost Wagner–Fischer — matches SQL ``levenshtein()``."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_name_pairs(
    ds: "ray.data.Dataset",
    col: str,
    *,
    max_dist: int = 1,
    bucket_cap: int = 256,
) -> "ray.data.Dataset":
    """DISTINCT value pairs within Levenshtein distance ``max_dist`` (= 1):
    SymSpell-style deletion-neighborhood blocking — each name emits itself plus
    every single-deletion variant as block keys; any two strings at distance
    ≤ 1 share at least one key, so the BLOCKING is exhaustive (no false
    negatives). Blocks larger than ``bucket_cap`` degrade to a sorted
    connectivity-preserving chain (the same skew cap as the LSH family), so
    on skewed data the output is connectivity-complete rather than
    pair-complete — the SQL oracle replicates the cap, so parity holds
    either way. Pairs are deduped across keys before the exact edit-distance
    verify. Shuffle volume = O(rows × name length) narrow key rows, never
    O(pairs). Replicated in SQL by ``oracle_sql()['fuzzy_part_names']``.

    Typo-tolerant entity/alias matching at corpus scale — the fuzzy analog of
    the reference's exact alias lookup (src/augmentation.py:92-95).
    """
    from ..stages.canonicalize import _compact_blocks, grouped_aggregate

    distinct = grouped_aggregate(
        ds.map_batches(
            lambda t: pa.table({"name": pc.unique(t.column(col))}),
            batch_format="pyarrow",
        ),
        ["name"],
        Count(alias_name="_n"),
    ).select_columns(["name"])

    def explode_keys(t: pa.Table) -> pa.Table:
        names, keys = [], []
        for s in t.column("name").to_pylist():
            s = s or ""
            names.append(s)
            keys.append(s)
            for i in range(len(s)):
                names.append(s)
                keys.append(s[:i] + s[i + 1:])
        return pa.table({"key": pa.array(keys, pa.string()),
                         "name": pa.array(names, pa.string())})

    P = _compact_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        import zlib

        part = [zlib.crc32(k.encode()) % P for k in t.column("key").to_pylist()]
        return t.append_column("__part", pa.array(part, pa.int64()))

    def part_cands(g: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for _, grp in g.groupby("key", sort=False):
            names = sorted(set(grp["name"]))
            n = len(names)
            if n < 2:
                continue
            prs = (
                [(i, j) for i in range(n) for j in range(i + 1, n)]
                if n <= bucket_cap
                else [(i, i + 1) for i in range(n - 1)]
            )
            for i, j in prs:
                a.append(names[i])
                b.append(names[j])
        return pd.DataFrame({"name_a": pd.Series(a, dtype="object"),
                             "name_b": pd.Series(b, dtype="object")})

    cands = grouped_aggregate(
        distinct.map_batches(explode_keys, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_cands, batch_format="pandas"),
        ["name_a", "name_b"],
        Count(alias_name="_nk"),
    )

    def verify(t: pa.Table) -> pa.Table:
        na, nb, dd = [], [], []
        for x, y in zip(t.column("name_a").to_pylist(), t.column("name_b").to_pylist()):
            d = levenshtein(x, y)
            if d <= max_dist:
                na.append(x)
                nb.append(y)
                dd.append(d)
        return pa.table({"name_a": pa.array(na, pa.string()),
                         "name_b": pa.array(nb, pa.string()),
                         "dist": pa.array(dd, pa.int64())})

    return cands.map_batches(verify, batch_format="pyarrow")


def near_dup_keep_ids(pairs_ds: "ray.data.Dataset", all_ids_ds: "ray.data.Dataset",
                      id_col: str) -> "ray.data.Dataset":
    """Resolve near-dup pairs to keep/drop decisions via connected components:
    every doc maps to its component representative (min id); keep = (doc ==
    representative). Reuses the distributed CC of the canonicalization stage."""
    from ..stages.canonicalize import connected_components

    def pad(v):  # zero-pad ids so lexicographic min == numeric min
        return f"{v:020d}"

    def pair_str(t: pa.Table) -> pa.Table:
        a = [pad(v) for v in t.column("id_a").to_pylist()]
        b = [pad(v) for v in t.column("id_b").to_pylist()]
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    nodes = all_ids_ds.map_batches(
        lambda t: pa.table({"node": pa.array([pad(v) for v in t.column(id_col).to_pylist()])}),
        batch_format="pyarrow",
    )
    labels = connected_components(pairs_ds.map_batches(pair_str, batch_format="pyarrow"), nodes)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64())})
        n = [int(v) for v in t.column("node").to_pylist()]
        c = [int(v) for v in t.column("comp").to_pylist()]
        return pa.table({id_col: pa.array(n, pa.int64()), "keep_id": pa.array(c, pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow")


_ALNUM_RE = None  # lazy: shared [a-z0-9]+ tokenization of the curation family


def _alnum():
    global _ALNUM_RE
    if _ALNUM_RE is None:
        import re

        _ALNUM_RE = re.compile(r"[a-z0-9]+")
    return _ALNUM_RE


def near_dup_keep_best_ids(
    pairs_ds: "ray.data.Dataset",
    docs_ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
) -> "ray.data.Dataset":
    """Near-dup keep decision with a QUALITY-WEIGHTED representative: within
    each pair-graph component the doc with the MOST tokens survives (tie →
    min id) — the CCNet/RefinedWeb keep-the-longest-version convention.
    One packed-int64 argmax per component ((ntok << 32) | (2³²−1 − id), so
    Max ⇒ max ntok then min id) plus a partitioned hash join of the winner
    back onto the members. Output: (id_col, keep_id) for EVERY doc."""
    import numpy as np

    from ..stages.joins import hash_join

    labels = near_dup_keep_ids(
        pairs_ds, docs_ds.select_columns([id_col]), id_col
    ).map_batches(
        lambda t: pa.table({id_col: t.column(id_col), "comp": t.column("keep_id")}),
        batch_format="pyarrow",
    ).materialize()  # consumed by the members join AND the winners join

    def tokn(t: pa.Table) -> pa.Table:
        rx = _alnum()
        n = [len(rx.findall((s or "").lower())) for s in t.column(text_col).to_pylist()]
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         "ntok": pa.array(n, pa.int64())})

    members = hash_join(labels, docs_ds.map_batches(tokn, batch_format="pyarrow"),
                        on=(id_col,))
    _MAXD = (1 << 32) - 1

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({"comp": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64())})
        d = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(t.column("ntok"), pa.int64()).to_numpy(zero_copy_only=False)
        if len(d) and (int(d.max()) > _MAXD or int(n.max()) >= (1 << 31)):
            raise ValueError("id/ntok exceed the packed-key range")
        key = (n << np.int64(32)) | (np.int64(_MAXD) - d)
        return pa.table({"comp": pc.cast(t.column("comp"), pa.int64()),
                         "key": pa.array(key, pa.int64())})

    from ..stages.canonicalize import grouped_aggregate
    from ray.data.aggregate import Max

    best = grouped_aggregate(members.map_batches(pack, batch_format="pyarrow"),
                             ["comp"], Max("key", alias_name="key"))

    def unpack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "comp" not in t.column_names:
            return pa.table({"comp": pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64())})
        k = pc.cast(t.column("key"), pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.int64(_MAXD) - (k & np.int64(_MAXD))
        return pa.table({"comp": pc.cast(t.column("comp"), pa.int64()),
                         "keep_id": pa.array(keep, pa.int64())})

    winners = best.map_batches(unpack, batch_format="pyarrow")
    out = hash_join(labels, winners, on=("comp",))
    return out.map_batches(
        lambda t: pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                            "keep_id": pc.cast(t.column("keep_id"), pa.int64())}),
        batch_format="pyarrow",
    )


def span_dedup_rewrite(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """RefinedWeb-style exact-substring SPAN REMOVAL (the rewrite): every
    token covered by a word-``n``-gram that also occurs in ≥ 1 OTHER doc is
    dropped; docs re-emit with only kept tokens.

    Scale shape — two narrow shuffles, ONE text shuffle, no joins: distinct
    gram md5-hashes ship as 16 B (h, doc) rows hash-partitioned on h (one
    task sees all holders of a gram; traffic ∝ duplicated content for the
    shared re-emit), then a side-tagged union on doc co-locates text with
    its shared-gram set for a row-local rewrite. Output: (id_col, n_tokens,
    n_removed, kept_text) for docs with ≥ 1 token."""
    import numpy as np  # captured by the worker-side closures below

    from ..stages.canonicalize import _compact_blocks
    from .textfns import md5_hash64

    P = int(num_parts or _compact_blocks())

    def grams(t: pa.Table) -> pa.Table:
        rx = _alnum()
        ids = pc.cast(t.column(id_col), pa.int64()).to_pylist()
        hcache: dict[str, int] = {}
        o_h, o_d = [], []
        for did, s in zip(ids, t.column(text_col).to_pylist()):
            toks = rx.findall((s or "").lower())
            ngs = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
            o_h.extend(
                hcache[g] if g in hcache else hcache.setdefault(g, md5_hash64(g))
                for g in ngs
            )
            o_d.extend([did] * len(ngs))
        h = np.asarray(o_h, dtype=np.uint64).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "doc": pa.array(o_d, pa.int64()),
                         "__part": pa.array(h % P, pa.int64())})

    def shared_rows(group: pd.DataFrame) -> pa.Table:
        holders = group.groupby("h")["doc"].transform("size")  # distinct rows
        out = group.loc[holders >= 2, ["doc", "h"]]
        k = len(out)
        return pa.table(
            {"doc": pa.array(out["doc"].to_numpy(dtype=np.int64), pa.int64()),
             "kind": pa.array(["h"] * k, pa.string()),
             "text": pa.array([None] * k, pa.string()),
             "h": pa.array(out["h"].to_numpy(dtype=np.int64), pa.int64())}
        )

    shared = (
        ds.map_batches(grams, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(shared_rows, batch_format="pandas")
    )

    def text_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc": pc.cast(t.column(id_col), pa.int64()),
             "kind": pa.array(["t"] * t.num_rows, pa.string()),
             "text": pc.cast(t.column(text_col), pa.string()),
             "h": pa.array(np.zeros(t.num_rows, np.int64), pa.int64())}
        )

    def add_db(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc" not in t.column_names:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.string()),
                             "text": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64()),
                             "__db": pa.array([], pa.int64())})
        d = pc.cast(t.column("doc"), pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column("__db", pa.array(d % P, pa.int64()))

    tagged = (
        ds.map_batches(text_rows, batch_format="pyarrow")
        .union(shared)
        .map_batches(add_db, batch_format="pyarrow")
    )

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        rx = _alnum()
        hcache: dict[str, int] = {}
        o_doc, o_nt, o_nr, o_txt = [], [], [], []
        for doc, sub in g.groupby("doc", sort=False):
            texts = sub.loc[sub["kind"] == "t", "text"]
            if texts.empty:
                continue
            toks = rx.findall((texts.iloc[0] or "").lower())
            nt = len(toks)
            if nt == 0:
                continue
            shared_h = set(sub.loc[sub["kind"] == "h", "h"].astype("int64"))
            covered = np.zeros(nt, dtype=bool)
            if shared_h and nt >= n:
                for i in range(nt - n + 1):
                    gstr = " ".join(toks[i:i + n])
                    hv = hcache.get(gstr)
                    if hv is None:
                        hv = hcache.setdefault(
                            gstr, int(np.uint64(md5_hash64(gstr)).astype(np.int64)))
                    if hv in shared_h:
                        covered[i:i + n] = True
            kept = [t_ for t_, c in zip(toks, covered) if not c]
            o_doc.append(doc)
            o_nt.append(nt)
            o_nr.append(int(covered.sum()))
            o_txt.append(" ".join(kept))
        return pd.DataFrame({id_col: pd.Series(o_doc, dtype="int64"),
                             "n_tokens": pd.Series(o_nt, dtype="int64"),
                             "n_removed": pd.Series(o_nr, dtype="int64"),
                             "kept_text": pd.Series(o_txt, dtype=object)})

    return tagged.groupby("__db").map_groups(rewrite, batch_format="pandas")
