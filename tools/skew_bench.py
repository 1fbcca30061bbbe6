"""At-scale skew stress wall-times (round-5 directive #1 companion to
tests/test_skew_stress.py): a 200k-doc corpus whose single NEAR-dup cluster
holds 40% of all documents (members pairwise distinct, so exact dedup cannot
collapse it — the LSH chain + giant connected component + keep-best argmax
carry the full 80k-member load), and a 400k-page crawl where ONE host
receives >50% of all links.

Usage: python tools/skew_bench.py [n_docs] [n_pages] [num_cpus]
Prints one JSON line; measured numbers are recorded in BASELINE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
NUM_CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else int(
    os.environ.get("RAY_GRAFT_CPUS", "32"))
GIANT_FRAC = 0.4
BASE = " ".join(f"w{i}" for i in range(100))


def write_skew_docs(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "documents.parquet")
    if os.path.exists(out):
        return
    n_giant = int(N_DOCS * GIANT_FRAC)
    writer = None
    for lo in range(0, N_DOCS, 50_000):
        hi = min(lo + 50_000, N_DOCS)
        ids = list(range(lo, hi))
        texts = []
        for i in ids:
            if i < n_giant:
                # near-dup, not exact: one per-member tail word keeps every
                # member distinct (defeats exact dedup) at J ≈ 0.96
                texts.append(BASE + f" v{i}")
            else:
                texts.append(" ".join(f"u{i}w{j}" for j in range(40)))
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s0"] * len(ids), pa.string()),
        })
        if writer is None:
            writer = pq.ParquetWriter(out, tbl.schema)
        writer.write_table(tbl)
    writer.close()


def write_hot_pages(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return
    n_files = 32
    per = N_PAGES // n_files
    for f in range(n_files):
        urls, htmls = [], []
        for k in range(per):
            i = f * per + k
            src_host = f"h{i % 97}.example.com"
            urls.append(f"https://{src_host}/p{i}")
            links = []
            for j in range(10):
                if i % 2 == 0:
                    dst = f"https://hot.example.com/x{j}"
                else:
                    dst = f"https://h{(i * 7 + j) % 97}.example.com/q{j}"
                links.append(f'<a href="{dst}">l{j}</a>')
            htmls.append(
                f"<html><body>{''.join(links)}</body></html>".encode())
        pq.write_table(
            pa.table({"url": pa.array(urls, pa.string()),
                      "html": pa.array(htmls, pa.binary())}),
            os.path.join(path, f"pages-{f:05d}.parquet"))
    open(done, "w").write("ok")


def main() -> None:
    docs_dir = f"/tmp/skew_docs_{N_DOCS}"
    pages_dir = f"/tmp/skew_pages_{N_PAGES}"
    write_skew_docs(docs_dir)
    write_hot_pages(pages_dir)

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = NUM_CPUS * 2
    ctx.read_op_min_num_blocks = NUM_CPUS * 2

    from ner_extractor_ray.functions.dedup import (
        lsh_near_dup_pairs,
        near_dup_keep_best_ids,
    )
    from ner_extractor_ray.functions.weblinks import host_link_graph
    from ner_extractor_ray.pipelines.curation import run_curation

    n_giant = int(N_DOCS * GIANT_FRAC)
    timings: dict = {}

    ds = ray.data.read_parquet(
        os.path.join(docs_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    ds.count()  # warm page cache

    t0 = time.perf_counter()
    pairs = lsh_near_dup_pairs(ds, "text", "doc_id",
                               shingle="word3", threshold=0.8).materialize()
    n_pairs = pairs.count()
    keep = near_dup_keep_best_ids(pairs, ds, "doc_id", "text").materialize()
    # correctness probes: every giant member adopts ONE winner; winner count
    kp = keep.filter(lambda r: r["doc_id"] < n_giant)
    winners = kp.unique("keep_id")
    assert len(winners) == 1, winners[:5]
    assert keep.count() == N_DOCS
    timings["neardup_keep_best_sec"] = round(time.perf_counter() - t0, 2)
    timings["n_pairs"] = n_pairs
    # pair traffic bound: all-pairs on the giant cluster would be
    # n_giant*(n_giant-1)/2 (~3.2e9 at 80k); the chain plan stays O(n×bands)
    assert n_pairs < n_giant * 64, n_pairs

    import shutil
    out_dir = "/tmp/skew_curation_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_curation(ds, out_dir=out_dir, n_partitions=64)
    n_curated = res["curated"].count()
    timings["curation_sec"] = round(time.perf_counter() - t0, 2)
    timings["n_curated"] = n_curated
    assert n_curated == (N_DOCS - n_giant) + 1, n_curated

    pages = ray.data.read_parquet(pages_dir)
    pages.count()
    t0 = time.perf_counter()
    g = host_link_graph(pages).materialize()
    hot = g.filter(lambda r: r["dst_host"] == "hot.example.com")
    n_hot = sum(r["n_links"] for r in hot.take_all())
    total = sum(r["n_links"] for r in g.take_all())
    timings["host_link_graph_sec"] = round(time.perf_counter() - t0, 2)
    timings["hot_share"] = round(n_hot / total, 3)
    assert n_hot / total > 0.5

    print(json.dumps({
        "metric": "skew stress wall-times (40% giant cluster / >50% hot host)",
        "n_docs": N_DOCS, "n_giant": n_giant, "n_pages": N_PAGES,
        "num_cpus": NUM_CPUS, **timings,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
