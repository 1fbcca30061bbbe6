"""align_predictions (M9), distributed P/R, confusion top-k (A8), homogeneity
(A9), and the multimodal stage plumbing."""

import numpy as np
import pyarrow as pa
import ray.data

from ner_extractor_ray import ID_TO_LABEL, LABEL_TO_ID
from ner_extractor_ray.functions.metrics import (
    align_predictions,
    clustering_homogeneity,
    confusion_topk,
    span_prf,
    span_prf_distributed,
)
from ner_extractor_ray.stages.multimodal import (
    FakeCodec,
    frame_samples,
    image_features,
)


def test_align_predictions_drops_ignored():
    gold = [LABEL_TO_ID["B-PER"], -100, LABEL_TO_ID["O"], -100]
    pred = [LABEL_TO_ID["B-PER"], LABEL_TO_ID["I-PER"], LABEL_TO_ID["O"], LABEL_TO_ID["O"]]
    p, g = align_predictions(pred, gold, ID_TO_LABEL)
    assert g == ["B-PER", "O"] and p == ["B-PER", "O"]


def test_span_prf_distributed_matches_local():
    pred = [{"u": "a", "s": 0, "t": "PER"}, {"u": "a", "s": 1, "t": "ORG"},
            {"u": "b", "s": 0, "t": "LOC"}]
    gold = [{"u": "a", "s": 0, "t": "PER"}, {"u": "b", "s": 0, "t": "ORG"}]
    keys = ["u", "s", "t"]
    local = span_prf(pa.Table.from_pylist(pred), pa.Table.from_pylist(gold), keys)
    dist = span_prf_distributed(
        ray.data.from_items(pred), ray.data.from_items(gold), keys
    )
    assert (local.tp, local.n_pred, local.n_gold) == (dist.tp, dist.n_pred, dist.n_gold)
    assert local.tp == 1


def test_confusion_topk():
    pred = [{"u": "a", "s": i, "lab": "ORG" if i % 3 else "LOC"} for i in range(9)]
    gold = [{"u": "a", "s": i, "lab": "ORG"} for i in range(9)]
    out = confusion_topk(
        ray.data.from_items(pred), ray.data.from_items(gold), ["u", "s"], "lab", k=5
    ).take_all()
    pairs = {(r["gold_label"], r["pred_label"]): r["n"] for r in out}
    assert pairs[("ORG", "ORG")] == 6 and pairs[("ORG", "LOC")] == 3


def test_homogeneity_bounds():
    perfect = ray.data.from_items(
        [{"c": i % 3, "lab": i % 3} for i in range(90)]
    )
    assert clustering_homogeneity(perfect, "c", "lab") == 1.0
    mixed = ray.data.from_items([{"c": 0, "lab": i % 3} for i in range(90)])
    assert clustering_homogeneity(mixed, "c", "lab") < 0.01


def test_homogeneity_gini_ppm_bounds():
    """Round-5 integer variant: pure clusters → exactly 10⁶ ppm; a single
    mixed cluster → 0 (the cluster partition adds no information); one-label
    degenerate input → 10⁶ by definition."""
    from ner_extractor_ray.functions.metrics import (
        clustering_homogeneity_gini_ppm,
    )

    perfect = ray.data.from_items(
        [{"c": i % 3, "lab": i % 3} for i in range(90)]
    )
    assert clustering_homogeneity_gini_ppm(perfect, "c", "lab") == 1_000_000
    mixed = ray.data.from_items([{"c": 0, "lab": i % 3} for i in range(90)])
    assert clustering_homogeneity_gini_ppm(mixed, "c", "lab") == 0
    one_label = ray.data.from_items([{"c": i % 5, "lab": 7} for i in range(40)])
    assert clustering_homogeneity_gini_ppm(one_label, "c", "lab") == 1_000_000


def _payload_ds(n=10):
    return ray.data.from_items(
        [{"id": i, "payload": f"binary-image-{i}".encode() * 50} for i in range(n)]
    )


def test_image_features_schema_and_determinism():
    out1 = sorted(image_features(_payload_ds()).take_all(), key=lambda r: r["id"])
    out2 = sorted(image_features(_payload_ds()).take_all(), key=lambda r: r["id"])
    assert out1 == out2
    r = out1[0]
    assert set(r) == {"id", "height", "width", "mean_r", "mean_g", "mean_b", "phash"}
    assert r["height"] == 32 and 0 <= r["mean_r"] <= 255
    # payload column dropped from output
    assert "payload" not in r


def test_image_features_actor_plan_matches():
    a = sorted(image_features(_payload_ds()).take_all(), key=lambda r: r["id"])
    b = sorted(
        image_features(_payload_ds(), use_actors=True, concurrency=(1, 2)).take_all(),
        key=lambda r: r["id"],
    )
    assert a == b


def test_frame_samples_flatmap_shape():
    out = frame_samples(_payload_ds(4), n_frames=3).take_all()
    assert len(out) == 12
    assert {len(r["feature"]) for r in out} == {3}
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["frame_id"])
    assert all(sorted(v) == [0, 1, 2] for v in by_id.values())


def test_fake_codec_deterministic():
    c = FakeCodec()
    assert np.array_equal(c.decode_image(b"x"), c.decode_image(b"x"))
    assert not np.array_equal(c.decode_image(b"x"), c.decode_image(b"y"))


def test_audio_chunks_flatmap_shape_and_determinism():
    from ner_extractor_ray.stages.multimodal import audio_chunks

    out1 = sorted(
        audio_chunks(_payload_ds(4), chunk_samples=512).take_all(),
        key=lambda r: (r["id"], r["chunk_id"]),
    )
    out2 = sorted(
        audio_chunks(_payload_ds(4), chunk_samples=512).take_all(),
        key=lambda r: (r["id"], r["chunk_id"]),
    )
    assert out1 == out2
    r = out1[0]
    assert set(r) == {"id", "chunk_id", "n_samples", "energy", "zero_crossings"}
    assert "payload" not in r
    # chunk ids are contiguous per id and full chunks carry chunk_samples rows
    by_id = {}
    for r in out1:
        by_id.setdefault(r["id"], []).append(r)
    for rows in by_id.values():
        assert [x["chunk_id"] for x in rows] == list(range(len(rows)))
        assert all(x["n_samples"] == 512 for x in rows[:-1])
        assert all(x["energy"] > 0 for x in rows)


def test_audio_chunks_actor_plan_matches():
    from ner_extractor_ray.stages.multimodal import audio_chunks

    a = sorted(audio_chunks(_payload_ds(6)).take_all(),
               key=lambda r: (r["id"], r["chunk_id"]))
    b = sorted(
        audio_chunks(_payload_ds(6), use_actors=True, concurrency=(1, 2)).take_all(),
        key=lambda r: (r["id"], r["chunk_id"]),
    )
    assert a == b


def test_phash_neardup_finds_planted_pairs():
    from ner_extractor_ray.stages.multimodal import PatternCodec, phash_neardup_pairs

    base = bytes([0xFF] * 4 + [0x00] * 4)   # top half set: 32 bright cells
    dup = bytes(base)
    near1 = bytes([0xFE]) + base[1:]        # flip cell (0,0): Hamming 1
    far = base[:7] + bytes([0xFF])          # flip row 7: Hamming 7 (bit 63 masked)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array([base, dup, near1, far], pa.binary()),
    }))
    out = phash_neardup_pairs(ds, codec=PatternCodec()).take_all()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(1, 2)] == 0          # exact dup
    assert pairs[(1, 3)] == 1          # one flipped cell
    assert pairs[(2, 3)] == 1
    assert (1, 4) not in pairs and (2, 4) not in pairs  # Hamming 7 rejected


def test_phash_neardup_bucket_cap_chain():
    from ner_extractor_ray.stages.multimodal import PatternCodec, phash_neardup_pairs

    base = bytes([0xFF] * 4 + [0x00] * 4)
    # five exact copies: full pairing would be C(5,2)=10; cap=2 forces the
    # sorted-chain fallback (4 consecutive pairs), connectivity preserved
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "payload": pa.array([base] * 5, pa.binary()),
    }))
    out = phash_neardup_pairs(ds, codec=PatternCodec(), bucket_cap=2).take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(1, 2), (2, 3), (3, 4), (4, 5)}
