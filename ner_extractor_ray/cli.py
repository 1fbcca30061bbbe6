"""CLI entry points — the ``ray job submit`` surface.

    python -m ner_extractor_ray.cli kg --pages DIR --out DIR [--config cfg.yaml]
    python -m ner_extractor_ray.cli gen --out DIR --n-pages 50000
    python -m ner_extractor_ray.cli query NAME --sf-dir DIR [--out DIR]
    python -m ner_extractor_ray.cli query --list
    python -m ner_extractor_ray.cli curate --docs DIR --out DIR
    python -m ner_extractor_ray.cli linkgraph --pages DIR --out DIR [--update-from DIR]

Replaces the reference's env-var orchestrator→worker channel
(NER_FOLD_* env injection, scripts/train_distilbert_crf.py:274-301;
subprocess fan-out scripts/run_kfold.py:60-64) with explicit arguments — on a
cluster the same module runs via ``ray job submit -- python -m
ner_extractor_ray.cli kg ...`` and connects to the cluster Ray instance.
Owns its Ray session (init guarded; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    return ray


def cmd_kg(args) -> int:
    ray = _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .config import PipelineConfig
    from .pipelines.kg import pages_dataset, run_kg

    cfg = PipelineConfig.load(args.config)
    # fail fast on config keys the kg command cannot honor (the reference's
    # reserved-toggle discipline, src/modeling.py:70-79): silently ignoring a
    # knob the user set is worse than refusing to run
    if cfg.augment_rate:
        raise NotImplementedError(
            "augment_rate applies to the training-data pipeline (stages/augment), "
            "not the kg command; set it to 0 for kg runs"
        )
    if cfg.label_all_tokens:
        raise NotImplementedError(
            "label_all_tokens affects training-label alignment (stages/tokenize); "
            "the kg taggers use first-subword alignment only"
        )
    scorer = None
    scorer_kwargs: dict = {}
    include_subwords = False
    use_actors = cfg.use_actors
    if cfg.tagger == "hf":
        from .stages.tagger import HFTagger

        if HFTagger is None:
            raise RuntimeError("tagger='hf' requires torch+transformers installed")
        scorer = HFTagger
        scorer_kwargs = {
            "checkpoint_path": cfg.hf_checkpoint,
            "max_length": cfg.max_seq_length,
        }
        include_subwords = True
        use_actors = True  # heavy weights: actor pool, loaded once per actor
    fmt = getattr(args, "format", "parquet")
    if fmt == "parquet":
        pages = pages_dataset(args.pages, with_ts=args.dedup_recrawls)
    else:
        cols = ["url", "html", "text", "lang"] + (
            ["warc_ts"] if args.dedup_recrawls else [])
        if fmt == "jsonl":
            from .sources.pages import pages_dataset_jsonl

            pages = pages_dataset_jsonl(args.pages, columns=cols)
        else:
            from .sources.warc import pages_dataset_warc

            pages = pages_dataset_warc(args.pages, columns=cols)
    res = run_kg(
        pages,
        out_dir=args.out,
        dedup_recrawls=args.dedup_recrawls,
        batch_size=cfg.batch_size,
        n_partitions=cfg.n_partitions,
        broadcast_limit=cfg.broadcast_limit,
        resume=cfg.resume,
        use_actors=use_actors,
        tagger_concurrency=cfg.tagger_concurrency,
        lang_filter=cfg.lang_filter,
        scorer=scorer,
        scorer_kwargs=scorer_kwargs,
        include_subwords=include_subwords,
        lsh_threshold=cfg.lsh_threshold,
        lsh_bucket_cap=cfg.lsh_bucket_cap,
        canon_driver_threshold=cfg.canon_driver_threshold,
    )
    summary = {
        "nodes": res["nodes"].count(),
        "edges": res["edges"].count(),
        "out_dir": args.out,
        "config": cfg.to_dict(),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Run the curation flagship over a documents parquet dir."""
    ray = _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from .pipelines.curation import run_curation

    docs = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    res = run_curation(
        docs, out_dir=args.out, id_col=args.id_col, text_col=args.text_col,
        n_partitions=args.n_partitions, min_tokens=args.min_tokens,
        lsh_threshold=args.lsh_threshold, redact_pii=args.redact_pii,
    )
    print(json.dumps({"stats": res["stats"], "out_dir": args.out}))
    ray.shutdown()
    return 0


def cmd_curate_update(args) -> int:
    """Merge a new document batch into an existing curated-corpus snapshot."""
    ray = _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from .pipelines.curation_update import update_curation

    res = update_curation(
        args.prev,
        rd.read_parquet(args.new_docs, columns=[args.id_col, args.text_col]),
        rd.read_parquet(args.prev_docs, columns=[args.id_col, args.text_col]),
        args.out,
        id_col=args.id_col, text_col=args.text_col,
        n_partitions=args.n_partitions,
    )
    print(json.dumps({"stats": res["stats"], "out_dir": args.out}))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run one catalogue query (pipelines/queries.py) over a table dir."""
    from .pipelines.queries import oracle_sql, queries

    qmap = queries()
    if args.list or not args.name:
        has = set(oracle_sql())
        for n in sorted(qmap):
            print(f"{n}\t{'oracle' if n in has else 'rows-only'}")
        return 0
    if args.name not in qmap:
        print(f"unknown query {args.name!r}; see --list", file=sys.stderr)
        return 2

    import ray as _ray_mod

    owns_session = not _ray_mod.is_initialized()
    ray = _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    res = qmap[args.name](args.sf_dir)
    if isinstance(res, rd.Dataset):
        res = res.materialize()  # query results are small by construction
        n_rows = res.count()
        if args.out:
            res.write_parquet(args.out)
    else:
        tbl = pa.Table.from_pandas(res) if isinstance(res, pd.DataFrame) else res
        n_rows = tbl.num_rows
        if args.out:
            import pyarrow.parquet as pq

            os.makedirs(args.out, exist_ok=True)
            pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
    print(json.dumps({"name": args.name, "rows": n_rows, "out": args.out}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_kg_update(args) -> int:
    import ray as _ray_mod

    owns_session = not _ray_mod.is_initialized()
    ray = _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .pipelines.kg import pages_dataset
    from .pipelines.kg_update import update_kg

    res = update_kg(args.prev, pages_dataset(args.pages), args.out,
                    n_partitions=args.n_partitions)
    print(json.dumps({
        "prev": args.prev, "out": args.out,
        "nodes": res["nodes"].count(), "edges": res["edges"].count(),
    }))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Re-bucket a finished part= table to a new partition count."""
    _ensure_ray()
    from .stages.materialize import compact_table

    res = compact_table(args.table, args.out, args.part_key,
                        n_partitions=args.n_partitions,
                        sort_key=args.sort_key)
    print(json.dumps({"out": args.out, "n_partitions": args.n_partitions,
                      **{k: v for k, v in res.items()
                         if isinstance(v, (int, str))}}))
    return 0


def cmd_gen(args) -> int:
    from .sources.pages import write_pages

    write_pages(args.out, args.n_pages, seed=args.seed, n_files=args.n_files)
    print(json.dumps({"out": args.out, "n_pages": args.n_pages, "seed": args.seed}))
    return 0


def _pages_any_format(path: str, fmt: str):
    """Open a pages corpus in any of the three source formats (url/html
    columns only — the link family never reads text/lang)."""
    cols = ["url", "html"]
    if fmt == "jsonl":
        from .sources.pages import pages_dataset_jsonl

        return pages_dataset_jsonl(path, columns=cols)
    if fmt == "warc":
        from .sources.warc import pages_dataset_warc

        return pages_dataset_warc(path, columns=cols)
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(path, "pages-*.parquet"))) or path
    return ray.data.read_parquet(files, columns=cols)


def cmd_linkgraph(args) -> int:
    """Build — or incrementally extend — the materialized host link graph."""
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .functions.weblinks import update_link_graph, write_link_graph

    pages = _pages_any_format(args.pages, getattr(args, "format", "parquet"))
    if args.update_from:
        man = update_link_graph(
            args.update_from, pages, args.out, n_partitions=args.n_partitions
        )
    else:
        man = write_link_graph(pages, args.out, n_partitions=args.n_partitions)
    print(json.dumps({"out": args.out, "rows": man.get("total_rows"),
                      "partitions": len(man.get("partitions", {}))}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ner_extractor_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="run the KG-construction pipeline")
    kg.add_argument("--pages", required=True)
    kg.add_argument("--out", required=True)
    kg.add_argument("--config", default=None)
    kg.add_argument("--format", choices=["parquet", "jsonl", "warc"],
                    default="parquet",
                    help="pages input format (sources/: parquet shards, "
                         "JSONL shards, or WARC crawl archives)")
    kg.add_argument("--dedup-recrawls", action="store_true",
                    help="keep only each url's latest warc_ts capture "
                         "before extraction (Common-Crawl recrawl dedup)")
    kg.set_defaults(fn=cmd_kg)

    ku = sub.add_parser(
        "kg-update",
        help="merge newly crawled pages into an existing KG snapshot "
             "(frozen entity ids; writes a NEW immutable snapshot dir)")
    ku.add_argument("--prev", required=True, help="previous snapshot dir")
    ku.add_argument("--pages", required=True, help="NEW pages parquet dir")
    ku.add_argument("--out", required=True, help="new snapshot dir (!= prev)")
    ku.add_argument("--n-partitions", type=int, default=16)
    ku.set_defaults(fn=cmd_kg_update)

    q = sub.add_parser("query", help="run a catalogue query (pipelines/queries.py)")
    q.add_argument("name", nargs="?", default=None)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None)
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=cmd_query)

    cu = sub.add_parser(
        "curate",
        help="run the curation flagship: quality gate -> exact dedup -> "
             "near-dup keep-longest -> span dedup -> curated corpus")
    cu.add_argument("--docs", required=True, help="documents parquet dir/file")
    cu.add_argument("--out", required=True)
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--n-partitions", type=int, default=16)
    cu.add_argument("--min-tokens", type=int, default=5)
    cu.add_argument("--lsh-threshold", type=float, default=0.8)
    cu.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/phones/IPv4 from the surviving text "
                         "(after dedup, before tokenization)")
    cu.set_defaults(fn=cmd_curate)

    cuu = sub.add_parser(
        "curate-update",
        help="merge a NEW doc batch into an existing curated snapshot "
             "(frozen corpus wins; writes a new immutable snapshot dir)")
    cuu.add_argument("--prev", required=True, help="previous snapshot dir")
    cuu.add_argument("--new-docs", required=True)
    cuu.add_argument("--prev-docs", required=True,
                     help="previous batches' source docs (candidate text fetch)")
    cuu.add_argument("--out", required=True)
    cuu.add_argument("--id-col", default="doc_id")
    cuu.add_argument("--text-col", default="text")
    cuu.add_argument("--n-partitions", type=int, default=16)
    cuu.set_defaults(fn=cmd_curate_update)

    cp = sub.add_parser(
        "compact",
        help="re-bucket a finished part= table to a new partition count "
             "(same manifests/resume semantics; refuses torn tables)")
    cp.add_argument("--table", required=True, help="finished table dir")
    cp.add_argument("--out", required=True, help="new table dir")
    cp.add_argument("--part-key", required=True,
                    help="column whose crc bucket names the new partition")
    cp.add_argument("--n-partitions", type=int, required=True)
    cp.add_argument("--sort-key", default=None,
                    help="optional within-partition sort column")
    cp.set_defaults(fn=cmd_compact)

    lg = sub.add_parser(
        "linkgraph",
        help="materialize the host link graph from a pages corpus "
             "(resumable manifests); --update-from merges a delta crawl "
             "into an existing graph without re-parsing old pages")
    lg.add_argument("--pages", required=True)
    lg.add_argument("--out", required=True)
    lg.add_argument("--format", choices=["parquet", "jsonl", "warc"],
                    default="parquet")
    lg.add_argument("--update-from", default=None,
                    help="existing graph dir (write_link_graph layout) to "
                         "merge the delta into; output goes to --out")
    lg.add_argument("--n-partitions", type=int, default=16)
    lg.set_defaults(fn=cmd_linkgraph)

    gen = sub.add_parser("gen", help="generate the synthetic pages corpus")
    gen.add_argument("--out", required=True)
    gen.add_argument("--n-pages", type=int, default=2000)
    gen.add_argument("--seed", type=int, default=42)
    gen.add_argument("--n-files", type=int, default=8)
    gen.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
