"""Augmentation (T7 aggregate→broadcast→map) and deterministic splits (O2/O3)."""

import ray.data

from ner_extractor_ray.functions.bio import extract_entities, fix_bio
from ner_extractor_ray.stages.augment import augment, build_entity_pool
from ner_extractor_ray.stages.splits import kfold_assign, stratified_split


def _tagged_ds():
    rows = [
        {"url": f"u{i}", "sent_id": 0,
         "tokens": ["Bill", "Gates", "founded", "Microsoft", "."],
         "tags": ["B-PER", "I-PER", "O", "B-ORG", "O"]}
        for i in range(20)
    ] + [
        {"url": f"u{i}", "sent_id": 1,
         "tokens": ["Ada", "Lovelace", "visited", "London", "."],
         "tags": ["B-PER", "I-PER", "O", "B-LOC", "O"]}
        for i in range(20)
    ]
    return ray.data.from_items(rows)


def test_entity_pool():
    pool = build_entity_pool(_tagged_ds())
    assert pool["PER"] == ["Ada Lovelace", "Bill Gates"]
    assert pool["ORG"] == ["Microsoft"]
    assert pool["LOC"] == ["London"]


def test_augment_deterministic_and_valid():
    out1 = sorted(
        (r["url"], r["sent_id"], tuple(r["tokens"]), r["augmented"], r["loss_weight"])
        for r in augment(_tagged_ds(), rate=0.9).take_all()
    )
    out2 = sorted(
        (r["url"], r["sent_id"], tuple(r["tokens"]), r["augmented"], r["loss_weight"])
        for r in augment(_tagged_ds(), rate=0.9).take_all()
    )
    assert out1 == out2  # hash-derived, not RNG-order-derived
    aug_rows = [r for r in augment(_tagged_ds(), rate=0.9).take_all() if r["augmented"]]
    assert aug_rows, "rate=0.9 must generate augmented rows"
    for r in aug_rows:
        assert r["loss_weight"] == 0.5
        # tags remain BIO-valid and aligned with tokens
        assert len(r["tags"]) == len(r["tokens"])
        assert fix_bio(list(r["tags"])) == list(r["tags"])
        assert extract_entities(list(r["tags"]))


def test_stratified_split_proportions():
    rows = [{"k": f"r{i}", "lab": "A" if i % 2 else "B"} for i in range(2000)]
    out = stratified_split(
        ray.data.from_items(rows), "k", "lab", test_frac=0.2
    ).take_all()
    for lab in ("A", "B"):
        sub = [r for r in out if r["lab"] == lab]
        frac = sum(1 for r in sub if r["split"] == "test") / len(sub)
        assert 0.15 < frac < 0.25


def test_kfold_groups_by_doc():
    rows = [{"doc": f"d{i % 7}", "x": i} for i in range(70)]
    out = kfold_assign(ray.data.from_items(rows), "doc", k=5).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc"], set()).add(r["fold"])
    assert all(len(folds) == 1 for folds in by_doc.values())
