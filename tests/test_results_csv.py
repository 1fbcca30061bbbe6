"""S9 — results CSV appender/reader/summarizer (run_kfold.py:83-111,
summarize_kfold.py:42-70 parity). Pure file IO, no Ray."""

from ner_extractor_ray.state.results import (
    aggregate,
    append_result,
    completed_folds,
    load_results,
)


def test_append_header_once_and_roundtrip(tmp_path):
    p = str(tmp_path / "results.csv")
    for i, f1 in enumerate([0.91, 0.92, 0.93]):
        append_result(p, {"run_name": "cv", "fold_index": i, "metric": "f1", "value": f1})
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "run_name,fold_index,metric,value"  # header exactly once
    assert len(lines) == 4
    rows = load_results(p)
    assert [r["fold_index"] for r in rows] == ["0", "1", "2"]


def test_prefix_filter_and_aggregate(tmp_path):
    p = str(tmp_path / "r.csv")
    append_result(p, {"run_name": "cv_a", "fold_index": 0, "metric": "f1", "value": 0.9})
    append_result(p, {"run_name": "cv_a", "fold_index": 1, "metric": "f1", "value": 0.8})
    append_result(p, {"run_name": "other", "fold_index": 0, "metric": "f1", "value": 0.1})
    rows = load_results(p, run_prefix="cv_")
    assert len(rows) == 2
    agg = aggregate(rows)
    assert agg["count"] == 2
    assert abs(agg["mean"] - 0.85) < 1e-12
    assert abs(agg["std"] - 0.05) < 1e-12


def test_completed_folds_resume_set(tmp_path):
    p = str(tmp_path / "r.csv")
    assert completed_folds(p, "cv") == set()
    append_result(p, {"run_name": "cv", "fold_index": 0, "metric": "f1", "value": 0.9})
    append_result(p, {"run_name": "cv", "fold_index": 3, "metric": "f1", "value": 0.9})
    assert completed_folds(p, "cv") == {0, 3}  # rerun skips these folds
    assert completed_folds(p, "other") == set()


def test_aggregate_empty():
    assert aggregate([]) == {"count": 0, "mean": None, "std": None}
