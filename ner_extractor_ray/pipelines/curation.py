"""The curation flagship: raw documents → filtered, deduplicated,
span-rewritten training corpus — the end-to-end LLM-training-data pipeline
the beyond-reference operator families (SURVEY.md §2.11) compose into:

    quality gate (C4/Gopher rule filter, row-local)
      → exact dedup (md5 content hash, keep-min-id)           functions/dedup.py
      → near-dup dedup (MinHash-LSH pairs → CC → keep the
        LONGEST version per component)                        functions/dedup.py
      → exact-substring span removal (cross-doc-shared
        8-grams dropped from the surviving text)              functions/dedup.py
      → partitioned curated-corpus write with manifests       stages/materialize.py

Scale discipline: every stage's DECISION table is an ID-ONLY dataset
(8 B/row) attached back by partitioned hash semi-joins; the survivor text
tables are materialized once per stage boundary (each is consumed by
several downstream branches — without the boundary the lazy lineage
re-executes the whole upstream once per consumer; the object store spills
what exceeds memory, and the survivor set only shrinks stage over stage).
Stage counts come from the id tables. With ``out_dir`` the curated output
is a resumable partitioned Parquet table like the KG tables (completed
partitions skipped on rerun).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.joins import hash_join
from ..stages.materialize import write_partitioned
from ..state.manifest import table_complete


def _ids_only(ds: "ray.data.Dataset", id_col: str) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: pa.table({id_col: pc.cast(t.column(id_col), pa.int64())})
        if t.num_rows else pa.table({id_col: pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )


def run_curation(
    docs: "ray.data.Dataset",
    out_dir: str | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 16,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    lsh_threshold: float = 0.8,
    shingle: str = "word3",
    span_n: int = 8,
    resume: bool = True,
    redact_pii: bool = False,
) -> dict:
    """Run the curation pipeline; returns stage stats + the curated Dataset.

    ``docs`` must carry ``id_col`` (int64-castable, < 2³²) and ``text_col``.
    Output rows: (id_col, n_tokens, n_removed, kept_text). With ``out_dir``
    the curated table is written partitioned (``part=crc(id) % n``) with
    per-partition manifests; a completed table short-circuits the rerun.
    With ``redact_pii`` the surviving text is PII-scrubbed in place
    (functions/pii.py vectorized RE2 kernels) at the ROOTS/Dolma pipeline
    position — after dedup, before the corpus ships; row-local, so it
    fuses into the span-rewrite pass with zero extra traffic.
    """
    from ..functions.dedup import (
        exact_dedup_groups,
        lsh_near_dup_pairs,
        near_dup_keep_best_ids,
        span_dedup_rewrite,
    )
    from ..stages.textops import quality_batch

    curated_dir = os.path.join(out_dir, "curated") if out_dir else None
    if curated_dir and table_complete(curated_dir) and resume:
        curated = ray.data.read_parquet(curated_dir)
        return {"curated": curated, "stats": {"resumed": True}}

    stats: dict[str, int] = {"n_input": docs.count()}

    # ---- S1 quality gate (row-local; C4/Gopher rule filter) --------------
    # The gate is a pure per-row predicate, so it applies as a row-local
    # FILTER carrying (id, text) straight through — no id-table join: a join
    # here would ship the whole corpus through a shuffle to apply a
    # predicate each row can answer locally (fixed round 4; the dedup
    # stages below DO need joins because their keep-decisions are global).
    def keep_rows(t: pa.Table) -> pa.Table:
        q = quality_batch(t, text_col=text_col, id_col=id_col,
                          min_tokens=min_tokens,
                          max_punct_ratio=max_punct_ratio,
                          min_stopword_ratio=min_stopword_ratio)
        kept = t.filter(q.column("keep"))
        return pa.table({id_col: pc.cast(kept.column(id_col), pa.int64()),
                         text_col: pc.cast(kept.column(text_col), pa.string())})

    # each survivor table is consumed by SEVERAL downstream branches (dedup
    # hash pass + the join; LSH pairs + token counts + the join; gram pass +
    # text pass) — materialize at the stage boundary or the whole upstream
    # lineage re-executes once per consumer (measured 247 s -> ~30 s at
    # sf0.1). At 100 TB this is the documented object-store working set: the
    # survivor table only shrinks stage over stage, and with out_dir the
    # curated result is the durable artifact.
    s1 = docs.select_columns([id_col, text_col]).map_batches(
        keep_rows, batch_format="pyarrow").materialize()
    stats["n_quality"] = s1.count()

    # ---- S2 exact dedup (md5 content hash, keeper = min id) --------------
    e_keep = _ids_only(
        exact_dedup_groups(s1, text_col, id_col).map_batches(
            lambda t: pa.table({id_col: t.column("keep_id")})
            if t.num_rows else pa.table({id_col: pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        id_col,
    ).materialize()
    stats["n_exact"] = e_keep.count()
    s2 = hash_join(s1, e_keep, on=(id_col,)).materialize()

    # ---- S3 near-dup keep-best (LSH pairs → CC → longest-version keeper) -
    pairs = lsh_near_dup_pairs(s2, text_col, id_col,
                               shingle=shingle, threshold=lsh_threshold)
    kb = near_dup_keep_best_ids(pairs, s2, id_col, text_col)
    w_ids = _ids_only(
        kb.map_batches(
            lambda t: t.filter(pc.equal(t.column(id_col), t.column("keep_id")))
            if t.num_rows else t,
            batch_format="pyarrow",
        ),
        id_col,
    ).materialize()
    stats["n_neardup"] = w_ids.count()
    s3 = hash_join(s2, w_ids, on=(id_col,)).materialize()

    # ---- S3.5 optional PII scrub of the SURVIVING RAW text (row-local) ---
    # must run before the span rewrite: the rewrite's word tokenizer strips
    # the punctuation the PII patterns anchor on (a@b.com → "a b com"), so
    # scrubbing after it would miss everything. After dedup, before
    # tokenization — the ROOTS/Dolma position. Placeholders surface as
    # EMAIL / PHONE / IP tokens in kept_text; the raw values never reach it.
    rewrite_src = s3
    if redact_pii:
        from ..functions.pii import redact

        def _scrub(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index(text_col)
            return t.set_column(i, text_col, redact(t.column(text_col)))

        rewrite_src = s3.map_batches(_scrub, batch_format="pyarrow")

    # ---- S4 exact-substring span removal over the survivors --------------
    curated = span_dedup_rewrite(rewrite_src, id_col, text_col, n=span_n)

    # ---- dedup STATE for incremental updates (pipelines/curation_update):
    # per kept doc, the ORIGINAL-text content hash (exact-dup anti key) and
    # the exploded LSH band rows (near-dup candidate key) — 24 B + 16×16 B
    # per doc, written alongside the curated table so a later batch can
    # dedup against this corpus without re-reading its text.
    if curated_dir:
        from ..functions.dedup import SHINGLERS
        from ..functions.hashing import stable_hash64
        from ..functions.textfns import band_buckets_batch, minhash_signatures_sql_batch

        shingler = SHINGLERS[shingle]
        _M63 = (1 << 63) - 1

        def state_rows(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
            texts = t.column(text_col).to_pylist()
            h = [stable_hash64(s or "") & _M63 for s in texts]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "h": pa.array(h, pa.int64())})

        def band_rows(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
            texts = t.column(text_col).to_pylist()
            sigs = minhash_signatures_sql_batch(
                [shingler(s or "") for s in texts], 64)
            buckets = band_buckets_batch(sigs, 16)
            return pa.table({
                "doc": pa.array(np.repeat(ids, 16), pa.int64()),
                "bucket": pa.array(buckets.reshape(-1), pa.int64())})

        write_partitioned(
            s3.map_batches(state_rows, batch_format="pyarrow"),
            os.path.join(out_dir, "state"), id_col,
            n_partitions=n_partitions, sort_key=id_col, resume=resume,
            lineage={"stage": "state", **stats},
        )
        write_partitioned(
            s3.map_batches(band_rows, batch_format="pyarrow"),
            os.path.join(out_dir, "bands"), "doc",
            n_partitions=n_partitions, sort_key=["doc", "bucket"], resume=resume,
            lineage={"stage": "bands", **stats},
        )

    # ---- S5 materialize ---------------------------------------------------
    if curated_dir:
        write_partitioned(
            curated, curated_dir, id_col, n_partitions=n_partitions,
            sort_key=id_col, resume=resume,
            lineage={"stage": "curated", "params": {
                "min_tokens": min_tokens, "lsh_threshold": lsh_threshold,
                "shingle": shingle, "span_n": span_n,
                "n_partitions": n_partitions}, **stats},
        )
        curated = ray.data.read_parquet(curated_dir)
    else:
        curated = curated.materialize()
    stats["n_curated"] = curated.count()
    return {"curated": curated, "stats": stats,
            "survivor_ids": w_ids, "keep_best": kb}
