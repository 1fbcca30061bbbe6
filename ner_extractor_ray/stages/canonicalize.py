"""S8 — canonicalization: MinHash-LSH blocking → candidate pairs → distributed
connected components → canonical entity ids.

The genuinely wide/iterative stage (SURVEY.md §7.1 S8, §7.3). Pipeline:

  mentions(+node) ──pre-aggregated count──▶ distinct nodes (node, type, norm_key, n_mentions)
      ▶ minhash over char-3-shingles of norm_key → explode (band_id, band_hash, node)
      ▶ groupby(band) buckets → verified candidate pairs (same type, Jaccard ≥ τ)
      ▶ iterative min-label propagation (groupby-min rounds) → components
      ▶ entity_id = blake2(min node of component); canonical_name = min norm_key

Skew handling (explicit, per the north rule):
  * counts are PARTIALLY AGGREGATED inside map_batches before the groupby, so a
    hot alias ("university", head domains) contributes ≤ 1 row per input batch
    to the shuffle instead of one row per mention;
  * oversized LSH buckets (> ``bucket_cap``) emit a SORTED CHAIN of pairs
    (a1-a2, a2-a3, …) instead of all O(n²) pairs — connectivity-preserving and
    linear in bucket size, the salting cap of SURVEY.md §7.1.

Determinism: representatives are lexicographic minima, hashes are blake2 —
identical output at any parallelism. Reference analog of the clustering step:
KMeans canonicalization of embeddings (scripts/visualize_embeddings.py:217-247)
re-expressed as LSH blocking + components (SURVEY.md A9).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.hashing import stable_id
from ..functions.textfns import band_keys, char_shingles, jaccard, minhash_signature
from .joins import hash_join

NUM_PERM = 64
N_BANDS = 16


def pre_aggregated_count(
    ds: "ray.data.Dataset", keys: list[str], count_col: str = "n_mentions"
) -> "ray.data.Dataset":
    """groupby(keys).count() with a per-batch combiner (partial aggregation)
    so hot keys never ship one shuffle row per input row (SURVEY.md §2.5 A2)."""

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(keys, as_index=False).size().rename(columns={"size": count_col})
        # Arrow out: sort-shuffling pandas object-dtype blocks is ~7× slower
        # than Arrow string blocks (16.4s vs 2.3s on the bench profile)
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    # compact the (small) partials: shuffle/aggregate cost scales with block
    # COUNT, and per-batch partials are many tiny blocks (13s → 1s observed)
    return grouped_aggregate(
        partials.repartition(_compact_blocks()),
        keys,
        Sum(count_col, alias_name=count_col),
    )


def rows_batched(ds: "ray.data.Dataset", columns: list[str] | None = None) -> list:
    """``take_all()`` replacement for driver-gated collections: take_all
    walks pandas-backed blocks (every groupby/aggregate operator emits them)
    ROW-BY-ROW at ~230 µs a row — measured 21 s for a 90k-row participant
    table — while batched Arrow ``to_pylist`` is ~2 µs/row. Same list-of-row-
    dicts result."""
    if columns is not None:
        ds = ds.select_columns(columns)
    return [r
            for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
            for r in b.to_pylist()]


def _compact_blocks() -> int:
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(8, min(64, cpus))


def data_partitions(size_bytes: int, *, target_bytes: int = 64 << 20, lo: int = 2) -> int:
    """Partition count sized to the DATA, not the cluster: ceil(bytes/64MB),
    floored at ``lo``. For the iterative ops (CC, PageRank, k-core, BFS) the
    per-round cost is dominated by TASK COUNT once state tables are small —
    a 3k-row label table exchanged over 32 cluster-sized partitions costs
    ~50ms/task × hundreds of tasks per round while moving kilobytes. Sizing
    from the materialized ``size_bytes()`` gives 2 partitions there and grows
    unbounded with the data (100 TB ⇒ ~1.6M partitions ≫ any cluster cap),
    so the same code path is right at both extremes."""
    need = -(-max(0, int(size_bytes)) // target_bytes)  # ceil div
    return max(lo, need)


_VEC_OPS = {}  # type -> pandas groupby op for the bucketed fast path


def _vec_ops():
    if not _VEC_OPS:
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        _VEC_OPS.update({Sum: "sum", Min: "min", Max: "max",
                         Mean: "mean", Count: "count"})
    return _VEC_OPS


def grouped_aggregate(
    ds: "ray.data.Dataset", keys: list[str], *aggs,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """groupby(keys).aggregate(*aggs), cardinality-robust.

    Ray's native sort-based aggregate pays ~140 µs of per-GROUP Python reduce
    overhead — invisible on a 25-nation groupby, fatal on a high-cardinality
    one (1.2M distinct pair keys = 170 s measured vs ~4 s for the same
    shuffle volume through 32 coarse groups). Standard Sum/Min/Max/Mean/Count
    aggregates therefore take a bucketed plan: hash the key columns to
    ``num_buckets`` coarse buckets (default ``_compact_blocks()``), ONE
    sort-shuffle on the small int bucket id, then a fully VECTORIZED pandas
    groupby inside each bucket. Cost is O(rows) + O(distinct · vectorized),
    independent of group count, and the shuffle payload is identical to the
    native plan's. Exactness: Sum/Min/Max/Count are order-independent and
    every key lands in exactly one bucket, so results are bit-equal to the
    native path (Mean on floats is the usual last-ulp caveat — callers that
    hash-compare use integer sums).

    Scale contract: one bucket (≈ distinct_keys / num_buckets PARTIAL rows —
    callers pre-aggregate per batch, so this is vocabulary-, not corpus-,
    sized) materializes as a single pandas frame per task; size
    ``num_buckets`` so that fits a worker heap, exactly like
    materialize.py's n_partitions.

    Exotic aggregates (quantiles, custom AggregateFnV2) fall back to the
    native engine via one synthetic length-prefixed key column (multi-column
    string groupby is ~10× slower than single-column — bench profile)."""
    ops = []
    for a in aggs:
        op = _vec_ops().get(type(a))
        if op is None or getattr(a, "name", None) is None:
            return _native_grouped_aggregate(ds, keys, *aggs)
        col = a._target_col_name
        if op == "count":
            # Count() counts rows; Count(col, ignore_nulls=True) non-nulls
            if col is None or not a._ignore_nulls:
                op, col = "size", keys[0]
        elif not a._ignore_nulls:
            return _native_grouped_aggregate(ds, keys, *aggs)
        ops.append((a.name, col, op))

    P = int(num_buckets or _compact_blocks())

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # hash_pandas_object gives None and NaN in OBJECT columns the same
        # hash (verified), and dtypes are schema-consistent across blocks,
        # so every logical key tuple lands in exactly one bucket — including
        # null components. Empty batches keep the full column set so block
        # schemas stay uniform.
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy(deep=False)
        df["__b"] = (h % P).astype("int64")
        return df

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, dropna=False, sort=False)
        pieces = {}
        for name, col, op in ops:
            pieces[name] = gb.size() if op == "size" else gb[col].agg(op)
        res = pd.DataFrame(pieces).reset_index()
        # the groupby index materializes missing object keys as float NaN
        # (and can re-infer an all-null key column as float64); pin object
        # key columns back to object-with-None so null groups round-trip
        # and block schemas stay stable
        for k in keys:
            if g[k].dtype == object:
                col = res[k].astype(object)
                res[k] = col.where(pd.notna(col), None)
        # ARROW out (round-5): pandas-backed result blocks cost ~7× more in
        # every downstream sort-shuffle and ~100× in any row-wise collect
        # (the take_all pathology, rows_batched docstring) — emitting Arrow
        # here fixes the whole aggregate family at the source; values and
        # dtypes are unchanged (object-with-None keys → string-with-null)
        # strip the pandas schema metadata: Ray's schema-dedup hashes block
        # schemas and a metadata dict makes that fail (log noise only)
        return pa.Table.from_pandas(
            res[keys + [name for name, _, _ in ops]],
            preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(agg_bucket, batch_format="pandas")
    )


def _native_grouped_aggregate(
    ds: "ray.data.Dataset", keys: list[str], *aggs
) -> "ray.data.Dataset":
    """Ray-native groupby for non-vectorizable aggregates, multi-key via ONE
    synthetic key column.

    Key encoding: every component is length-prefixed (``<len>:<value>``), so
    components containing the separator can never collide across groups, and
    NULL components get an explicit ``N:`` marker distinct from any string
    value (plain ``binary_join_element_wise`` default null handling would
    emit a NULL joined key, collapsing all any-null-key rows into one
    group)."""
    if len(keys) == 1:
        return ds.groupby(keys[0]).aggregate(*aggs)

    import pyarrow.compute as pc

    def add_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not set(keys) <= set(t.column_names):
            return t
        cols = []
        for k in keys:
            c = pc.cast(t.column(k), pa.string())
            lp = pc.binary_join_element_wise(
                pc.cast(pc.binary_length(c), pa.string()), c, ":"
            )  # "<len>:<value>" — length prefix kills separator ambiguity
            cols.append(pc.fill_null(lp, "N:"))
        gk = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(*cols, "\x00")
        return t.append_column("__gk", gk)

    carried = [Min(k, alias_name=k) for k in keys]
    out = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("__gk")
        .aggregate(*carried, *aggs)
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__gk"]) if "__gk" in t.column_names else t,
        batch_format="pyarrow",
    )


def distinct_nodes(mentions_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """mentions (with node/norm_key/type) → distinct node table with counts."""
    return pre_aggregated_count(
        mentions_ds.select_columns(["node", "type", "norm_key"]),
        ["node", "type", "norm_key"],
    )


_BUCKET_MIX = 0x9E3779B97F4A7C15  # golden-ratio mixer: (band_id, band_hash) → one int64


def _bucket_key(band_id: int, band_hash: int) -> int:
    """Single-int bucket id (multi-key groupby is ~10× slower; a collision
    merely merges two buckets, and every pair is Jaccard-verified anyway)."""
    return ((band_hash ^ (band_id * _BUCKET_MIX)) & 0x7FFFFFFFFFFFFFFF)


def _band_rows(batch: pa.Table) -> pa.Table:
    nodes = batch.column("node").to_pylist()
    keys = batch.column("norm_key").to_pylist()
    types = batch.column("type").to_pylist()
    o_bucket, o_node, o_key, o_type = [], [], [], []
    for node, key, typ in zip(nodes, keys, types):
        sig = minhash_signature(char_shingles(key), NUM_PERM)
        for b, h in enumerate(band_keys(sig, N_BANDS)):
            o_bucket.append(_bucket_key(b, h))
            o_node.append(node)
            o_key.append(key)
            o_type.append(typ)
    return pa.table(
        {
            "bucket": pa.array(o_bucket, pa.int64()),
            "node": pa.array(o_node, pa.string()),
            "norm_key": pa.array(o_key, pa.string()),
            "type": pa.array(o_type, pa.string()),
        }
    )


def candidate_pairs(
    nodes_ds: "ray.data.Dataset",
    *,
    threshold: float = 0.6,
    bucket_cap: int = 64,
) -> "ray.data.Dataset":
    """LSH blocking + in-bucket verification → pair rows (a, b), a < b."""
    bands = nodes_ds.map_batches(_band_rows, batch_format="pyarrow")

    def part_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one Ray group = MANY LSH buckets (bucket % P co-location): Ray's
        # map_groups costs ~80μs per group, so grouping by the raw bucket id
        # (≈1 group per node-band) dominated wall time; pandas groupby inside
        # a coarse group iterates tiny buckets at C speed
        out_a, out_b = [], []
        for _, g in group.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("node").sort_values("node")
            n = len(g)
            if n < 2:
                continue
            nodes = g["node"].tolist()
            keys = g["norm_key"].tolist()
            types = g["type"].tolist()
            sh = [set(char_shingles(k)) for k in keys]
            if n <= bucket_cap:
                idx_pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
            else:
                # salting cap: sorted chain keeps clusters connected at O(n)
                idx_pairs = [(i, i + 1) for i in range(n - 1)]
            for i, j in idx_pairs:
                if types[i] != types[j]:
                    continue
                if jaccard(sh[i], sh[j]) >= threshold:
                    out_a.append(nodes[i])
                    out_b.append(nodes[j])
        return pd.DataFrame({"a": out_a, "b": out_b}, dtype="object")

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        part = _pc.cast(t.column("bucket"), pa.int64()).to_numpy() % _compact_blocks()
        return t.append_column("__part", pa.array(part, pa.int64()))

    pairs = (
        bands.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_pairs, batch_format="pandas")
    )
    # dedup pairs discovered in multiple bands
    return pre_aggregated_count(pairs, ["a", "b"], count_col="_nb").select_columns(["a", "b"])


def _rename_project(t: pa.Table, cols: list[tuple[str, str]]) -> pa.Table:
    """Project+rename that is safe on the zero-column empty blocks Ray's
    groupby/sort operators emit — always returns the target schema, so a
    downstream join never sees a schema-less block (pyarrow acero raises
    "No match for FieldRef" otherwise). ``cols`` = [(src, dst), ...]."""
    if t.num_rows == 0 or not {s for s, _ in cols} <= set(t.column_names):
        return pa.table({dst: pa.array([], pa.string()) for _, dst in cols})
    return pa.table({dst: t.column(src) for src, dst in cols})


def _driver_union_find(pairs_ds: "ray.data.Dataset", nodes_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Small-graph plan: collect (small) pairs + nodes, union-find on the
    driver with lexicographic-min representatives — byte-identical labels to
    the distributed plan at a fraction of the fixed cost."""
    import ray.data as _rd

    from .joins import _as_pa_type, _schema_autocache

    nodes_ds, sch = _schema_autocache(nodes_ds)  # probe would run the agg twice
    ntype = _as_pa_type(sch.types[sch.names.index("node")])
    # iter_batches + to_pylist, NEVER take_all here: take_all walks pandas-
    # backed blocks (the groupby operators emit them) row-by-row at ~230 µs
    # a row — measured 21 s for a 90k-row participant table vs ~0 s batched
    nodes: list = []
    for b in nodes_ds.select_columns(["node"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        nodes.extend(b.column("node").to_pylist())
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for pb in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(pb.column("a").to_pylist(),
                        pb.column("b").to_pylist()):
            if a not in parent or b not in parent:
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    return _rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, ntype),
                "comp": pa.array([find(n) for n in nodes], ntype),
            }
        )
    )


def connected_components(
    pairs_ds: "ray.data.Dataset",
    nodes_ds: "ray.data.Dataset",
    *,
    max_rounds: int = 64,
    num_partitions: int | None = None,
    driver_threshold: int = 200_000,
) -> "ray.data.Dataset":
    """Distributed min-label propagation with pointer doubling → (node, comp).

    Each round: (1) edge relax — comp(dst) = min over {comp(src) | (src,dst) ∈
    E ∪ self-loops}; (2) pointer jump — comp(x) = comp(comp(x)) (every label is
    itself a node, so the lookup is total). The jump doubles the effective
    propagation distance per round, so convergence is O(log diameter) — the
    bucket-cap fallback deliberately emits sorted CHAINS for hot LSH buckets
    (paths 64+ hops long), which plain relaxation would need O(diameter)
    rounds to collapse. Labels decrease monotonically, so the checksum-based
    fixpoint test terminates; ``max_rounds`` (default 64 ≈ components of
    diameter 2**64) is a safety valve that RAISES rather than silently
    returning non-converged labels. Labels are materialized per round (they
    are the small distinct-surface table, not the corpus) so the lazy lineage
    doesn't re-execute (SURVEY.md §7.3 "connected components on Ray Data").
    """
    nodes_only = nodes_ds.select_columns(["node"])
    identity = nodes_only.map_batches(
        lambda t: _rename_project(t, [("node", "node"), ("node", "comp")]),
        batch_format="pyarrow",
    )
    # No candidate pairs (all surfaces already distinct after alias resolution):
    # every node is its own component — skip the iterative joins entirely. Also
    # avoids schema-less empty blocks poisoning the union/join below.
    if pairs_ds.count() == 0:
        return identity.materialize()
    # Small graphs: every distributed round costs several fixed Dataset
    # executions (joins, shuffles, checksum passes) regardless of data size —
    # below the threshold the driver union-find is strictly faster and
    # produces identical labels (same min-representative rule).
    if driver_threshold and nodes_only.count() <= driver_threshold:
        return _driver_union_find(pairs_ds, nodes_ds)

    # ---- participants-only iteration (round-5) ---------------------------
    # Labels move only along PAIR edges: a node in no pair has just its
    # self-loop, keeps its own label at the fixpoint, and never influences a
    # participant — so the iterative rounds need only the pair-PARTICIPANT
    # vocabulary (usually a small fraction of the node table; 400k-doc
    # near-dup keep: 23s flat → ~3s, because 368k singleton docs stopped
    # riding every round's join). Everyone else attaches back as identity
    # through ONE left join. The driver gate re-checks against the
    # PARTICIPANT count: a corpus-sized node table with a vocabulary-sized
    # pair graph union-finds on the driver instead of paying log-diameter
    # distributed rounds over the full corpus.
    ends = pairs_ds.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("a").combine_chunks(),
            t.column("b").combine_chunks()])}),
        batch_format="pyarrow",
    )
    participants = pre_aggregated_count(
        ends, ["node"], "_c").select_columns(["node"]).materialize()
    if driver_threshold and participants.count() <= driver_threshold:
        part_labels = _driver_union_find(pairs_ds, participants)
    else:
        part_labels = _distributed_cc(
            pairs_ds, participants, max_rounds=max_rounds,
            num_partitions=num_partitions)
    plab = part_labels.map_batches(
        lambda t: _rename_project(t, [("node", "node"), ("comp", "pcomp_")]),
        batch_format="pyarrow",
    )
    joined = hash_join(identity, plab, on=("node",), how="left")

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "node" not in t.column_names:
            return pa.table({})  # schema-less empty block: pass through
        if "pcomp_" not in t.column_names:
            # left-join block with no participant match: pure identity slice
            return pa.table({"node": t.column("node"),
                             "comp": t.column("comp")})
        ntype = t.column("comp").type  # node type is caller-defined
        return pa.table({
            "node": t.column("node"),
            "comp": pc.coalesce(pc.cast(t.column("pcomp_"), ntype),
                                t.column("comp")),
        })

    return joined.map_batches(attach, batch_format="pyarrow").materialize()


def _distributed_cc(
    pairs_ds: "ray.data.Dataset",
    nodes_only: "ray.data.Dataset",
    *,
    max_rounds: int,
    num_partitions: int | None,
) -> "ray.data.Dataset":
    """The min-label-propagation + pointer-jump rounds of
    :func:`connected_components`, over an already-projected (node) table."""
    identity = nodes_only.map_batches(
        lambda t: _rename_project(t, [("node", "node"), ("node", "comp")]),
        batch_format="pyarrow",
    )
    fwd = pairs_ds.map_batches(
        lambda t: _rename_project(t, [("a", "src"), ("b", "dst")]),
        batch_format="pyarrow",
    )
    rev = pairs_ds.map_batches(
        lambda t: _rename_project(t, [("b", "src"), ("a", "dst")]),
        batch_format="pyarrow",
    )
    self_loops = nodes_only.map_batches(
        lambda t: _rename_project(t, [("node", "src"), ("node", "dst")]),
        batch_format="pyarrow",
    )
    edges = fwd.union(rev).union(self_loops).materialize()
    if num_partitions is None:
        # DATA-sized: edges is the per-round join input, so its block count
        # bounds every round's task count — compact the 3-way union once
        num_partitions = data_partitions(edges.size_bytes() or 0)
    edges = edges.repartition(num_partitions).materialize()

    labels = identity.materialize()

    def checksum(lab: "ray.data.Dataset") -> int:
        import zlib

        def part(df: pd.DataFrame) -> pd.DataFrame:
            if "node" not in df.columns:
                return pd.DataFrame({"s": [0]})
            s = sum(zlib.crc32(f"{n}\x00{c}".encode()) for n, c in zip(df["node"], df["comp"]))
            return pd.DataFrame({"s": [s]})

        row = lab.map_batches(part, batch_format="pandas").sum("s")
        return int(row or 0)

    prev = checksum(labels)
    for _ in range(max_rounds):
        lab_src = labels.map_batches(
            lambda t: _rename_project(t, [("node", "src"), ("comp", "comp")]),
            batch_format="pyarrow",
        )
        joined = hash_join(edges, lab_src, on=("src",), num_partitions=num_partitions)
        # materialize: the relax result feeds the convergence check AND both
        # sides of the jump join — an unmaterialized lineage would re-execute
        # this shuffle up to 4× per round
        # repartition BEFORE materializing: each union/groupby/join pass emits
        # ≈ (sum of input block counts) blocks, so without a cap the label
        # table's block count doubles per round — task count (not data!) grows
        # exponentially and round r costs 2^r. Pinning to num_partitions keeps
        # every round the same constant number of tasks.
        relaxed = (
            grouped_aggregate(joined, ["dst"], Min("comp", alias_name="comp"),
                              num_buckets=num_partitions)
            .map_batches(
                lambda t: _rename_project(t, [("dst", "node"), ("comp", "comp")]),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
            .materialize()
        )
        cur = checksum(relaxed)
        if cur == prev:
            # Labels decrease monotonically per node, so equal successive
            # relax outputs squeeze the jump state in between: the state is a
            # relax fixpoint ⇒ labels constant along every edge ⇒ converged.
            # (One checksum per round; a post-jump checksum would be a whole
            # extra pass for no earlier detection.)
            return relaxed
        # pointer jump: comp(x) ← comp(comp(x)). comp values are node ids (min
        # over node-id labels), so joining labels against themselves is total.
        prev = cur
        jump_left = relaxed.map_batches(
            lambda t: _rename_project(t, [("node", "node"), ("comp", "jk")]),
            batch_format="pyarrow",
        )
        jump_right = relaxed.map_batches(
            lambda t: _rename_project(t, [("node", "jk"), ("comp", "comp")]),
            batch_format="pyarrow",
        )
        labels = (
            hash_join(jump_left, jump_right, on=("jk",), num_partitions=num_partitions)
            .map_batches(
                lambda t: _rename_project(t, [("node", "node"), ("comp", "comp")]),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
            .materialize()
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "component diameter exceeds 2**rounds; raise max_rounds"
    )


def canonicalize_nodes(
    nodes_distinct: "ray.data.Dataset",
    *,
    threshold: float = 0.6,
    bucket_cap: int = 64,
    driver_threshold: int = 200_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """distinct nodes → entity assignments, choosing the physical plan by size.

    The distinct-surface vocabulary is usually orders of magnitude smaller
    than the corpus. Below ``driver_threshold`` rows the LSH-pairing +
    union-find runs on the driver (identical pair-generation code path:
    same bands, same bucket cap/chaining, same Jaccard verify — so both
    plans produce byte-identical assignments); above it, the distributed
    candidate_pairs → connected_components → entity_assignments plan runs.
    """
    n = nodes_distinct.count()
    if n > driver_threshold:
        pairs = candidate_pairs(nodes_distinct, threshold=threshold, bucket_cap=bucket_cap)
        labels = connected_components(
            pairs, nodes_distinct, num_partitions=num_partitions,
            driver_threshold=driver_threshold,
        )
        return entity_assignments(labels, nodes_distinct, num_partitions=num_partitions)

    rows = rows_batched(nodes_distinct)  # pandas-block take_all is ~230µs/row
    rows_by_node = {r["node"]: r for r in rows}
    # same bucketing as _band_rows + bucket_pairs
    buckets: dict[tuple, list[str]] = {}
    for r in rows:
        sig = minhash_signature(char_shingles(r["norm_key"]), NUM_PERM)
        for b, h in enumerate(band_keys(sig, N_BANDS)):
            buckets.setdefault(_bucket_key(b, h), []).append(r["node"])
    parent = {r["node"]: r["node"] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo

    for bucket_nodes in buckets.values():
        g = sorted(set(bucket_nodes))
        if len(g) < 2:
            continue
        sh = {nd: set(char_shingles(rows_by_node[nd]["norm_key"])) for nd in g}
        idx_pairs = (
            [(i, j) for i in range(len(g)) for j in range(i + 1, len(g))]
            if len(g) <= bucket_cap
            else [(i, i + 1) for i in range(len(g) - 1)]
        )
        for i, j in idx_pairs:
            a, b = g[i], g[j]
            if rows_by_node[a]["type"] != rows_by_node[b]["type"]:
                continue
            if jaccard(sh[a], sh[b]) >= threshold:
                union(a, b)

    comp_members: dict[str, list[str]] = {}
    for nd in parent:
        comp_members.setdefault(find(nd), []).append(nd)
    out = {"node": [], "entity_id": [], "canonical_name": [], "type": [], "n_mentions": []}
    for rep, members in comp_members.items():
        rep_min = min(members)
        eid = stable_id(f"ent:{rep_min}")
        canonical = min(rows_by_node[m]["norm_key"] for m in members)
        for m in members:
            out["node"].append(m)
            out["entity_id"].append(eid)
            out["canonical_name"].append(canonical)
            out["type"].append(rows_by_node[m]["type"])
            out["n_mentions"].append(rows_by_node[m]["n_mentions"])
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "node": pa.array(out["node"], pa.string()),
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "canonical_name": pa.array(out["canonical_name"], pa.string()),
                "type": pa.array(out["type"], pa.string()),
                "n_mentions": pa.array(out["n_mentions"], pa.int64()),
            }
        )
    )


def entity_assignments(
    labels_ds: "ray.data.Dataset", nodes_ds: "ray.data.Dataset", num_partitions: int | None = None
) -> "ray.data.Dataset":
    """(node, comp) × node metadata → (node, entity_id, canonical_name, type).

    entity_id is a stable hash of the component representative (min node id),
    canonical_name the lexicographically-min norm_key in the component.
    """
    lab_nodes = hash_join(labels_ds, nodes_ds, on=("node",), num_partitions=num_partitions)
    canon = (
        grouped_aggregate(lab_nodes, ["comp"],
                          Min("norm_key", alias_name="canonical_name"),
                          num_buckets=num_partitions)
        .map_batches(
            lambda t: _rename_project(t, [("comp", "comp"), ("canonical_name", "canonical_name")]),
            batch_format="pyarrow",
        )
    )
    with_canon = hash_join(lab_nodes, canon, on=("comp",), num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        comps = t.column("comp").to_pylist()
        ids = [stable_id(f"ent:{c}") for c in comps]
        return t.append_column("entity_id", pa.array(ids, pa.string()))

    return with_canon.map_batches(finish, batch_format="pyarrow").select_columns(
        ["node", "entity_id", "canonical_name", "type", "n_mentions"]
    )
