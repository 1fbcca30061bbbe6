"""JSONL source format: identical corpus and identical KG results vs the
Parquet path (format-agnostic downstream stages)."""

import pyarrow.compute as pc


def test_jsonl_roundtrip_matches_parquet(tmp_path):
    from ner_extractor_ray.pipelines.kg import pages_dataset
    from ner_extractor_ray.sources.pages import write_pages, write_pages_jsonl, pages_dataset_jsonl

    pdir = str(tmp_path / "pq")
    jdir = str(tmp_path / "jl")
    write_pages(pdir, 60, seed=7, n_files=3, write_gold=False)
    write_pages_jsonl(jdir, 60, seed=7, n_files=3)

    a = pages_dataset(pdir).to_pandas().sort_values("url").reset_index(drop=True)
    b = pages_dataset_jsonl(jdir).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a["url"].tolist() == b["url"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]
    assert a["lang"].tolist() == b["lang"].tolist()


def test_jsonl_kg_run_matches_parquet(tmp_path):
    from ner_extractor_ray.pipelines.kg import pages_dataset, run_kg
    from ner_extractor_ray.sources.pages import write_pages, write_pages_jsonl, pages_dataset_jsonl

    pdir = str(tmp_path / "pq")
    jdir = str(tmp_path / "jl")
    write_pages(pdir, 80, seed=11, n_files=2, write_gold=False)
    write_pages_jsonl(jdir, 80, seed=11, n_files=2)

    ea = run_kg(pages_dataset(pdir), out_dir=None, n_partitions=4)["edges"].to_pandas()
    eb = run_kg(pages_dataset_jsonl(jdir), out_dir=None, n_partitions=4)["edges"].to_pandas()
    key = ["subj_id", "pred", "obj_id"]
    assert (
        ea.sort_values(key).reset_index(drop=True)[key + ["n_occurrences"]]
        .equals(eb.sort_values(key).reset_index(drop=True)[key + ["n_occurrences"]])
    )
