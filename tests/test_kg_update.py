"""Incremental KG update (pipelines/kg_update.py): frozen entity ids, exact
count merge, full coverage vs a one-shot batch run, and idempotency.

Fixture: 200 deterministic pages in 16 shards; the previous snapshot is built
from the FIRST shard only (12-13 pages — small enough that the later shards
introduce genuinely new surfaces, exercising both the adopt path and the
fresh-cluster path), the update ingests the remaining 15 shards."""

import glob
import os

import pytest
import ray.data

from ner_extractor_ray.pipelines.kg import PAGE_COLUMNS, run_kg
from ner_extractor_ray.pipelines.kg_update import update_kg
from ner_extractor_ray.sources.pages import write_pages


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("kgu")
    write_pages(str(base / "pages"), 200, n_files=16)
    files = sorted(glob.glob(str(base / "pages" / "pages-*.parquet")))
    a_files, b_files = files[:1], files[1:]
    rd = lambda fs: ray.data.read_parquet(fs, columns=PAGE_COLUMNS)
    full = run_kg(rd(files), out_dir=str(base / "full"), n_partitions=8)
    prev = run_kg(rd(a_files), out_dir=str(base / "prev"), n_partitions=8)
    upd = update_kg(str(base / "prev"), rd(b_files), str(base / "upd"),
                    n_partitions=8)
    return {"base": base, "b_files": b_files, "full": full, "prev": prev,
            "upd": upd}


def test_frozen_ids_and_new_surfaces(snapshots):
    pa_ = snapshots["prev"]["assignments"].to_pandas()
    ua = snapshots["upd"]["assignments"].to_pandas()
    um = dict(zip(ua.node, ua.entity_id))
    # every previous (node -> id) row is immutable in the merged snapshot
    for n, e in zip(pa_.node, pa_.entity_id):
        assert um[n] == e
    # the update genuinely added surfaces (fixture guards both code paths)
    assert len(ua) > len(pa_)


def test_coverage_matches_batch_run(snapshots):
    fa = snapshots["full"]["assignments"].to_pandas()
    ua = snapshots["upd"]["assignments"].to_pandas()
    assert set(fa.node) == set(ua.node)


def test_exact_count_merge_and_edge_sets(snapshots):
    """Σ n_occurrences is conserved, and — on this fixture, where no new page
    bridges two previous clusters — the merged edge set keyed by cluster
    MEMBER SETS is identical to the one-shot batch run's."""
    fe = snapshots["full"]["edges"].to_pandas()
    ue = snapshots["upd"]["edges"].to_pandas()
    assert fe.n_occurrences.sum() == ue.n_occurrences.sum()

    def keyset(edges, assign):
        mem = assign.groupby("entity_id")["node"].apply(
            lambda s: tuple(sorted(s))).to_dict()
        return {(mem[r.subj_id], r.pred, mem[r.obj_id], r.n_occurrences)
                for r in edges.itertuples()}

    fa = snapshots["full"]["assignments"].to_pandas()
    ua = snapshots["upd"]["assignments"].to_pandas()
    assert keyset(fe, fa) == keyset(ue, ua)


def test_update_is_idempotent(snapshots):
    base, b_files = snapshots["base"], snapshots["b_files"]
    rd = ray.data.read_parquet(b_files, columns=PAGE_COLUMNS)
    upd2 = update_kg(str(base / "prev"), rd, str(base / "upd2"), n_partitions=8)
    for tbl in ("assignments", "edges"):
        a = snapshots["upd"][tbl].to_pandas()
        b = upd2[tbl].to_pandas()
        a = a[sorted(a.columns)].sort_values(sorted(a.columns)).reset_index(drop=True)
        b = b[sorted(b.columns)].sort_values(sorted(b.columns)).reset_index(drop=True)
        assert a.equals(b)


def test_snapshots_are_immutable(snapshots):
    base = snapshots["base"]
    with pytest.raises(ValueError, match="immutable"):
        update_kg(str(base / "prev"),
                  ray.data.read_parquet(snapshots["b_files"],
                                        columns=PAGE_COLUMNS),
                  str(base / "prev"))
