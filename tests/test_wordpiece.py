"""WordPiece tokenizer: greedy longest-match semantics, alignment contract
(src/data_module.py:98-110 analog), deterministic training, packaged vocab.
No Ray needed — pure functions."""

import pyarrow as pa

from ner_extractor_ray.functions.wordpiece import (
    SPECIALS,
    UNK,
    default_vocab,
    load_vocab,
    train_wordpiece_vocab,
    wordpiece_tokenize,
)


def test_greedy_longest_match():
    vocab = {p: i for i, p in enumerate(SPECIALS + ["un", "##able", "##a", "##b", "##l",
                                                    "##e", "u", "##n", "a", "b", "l", "e"])}
    # greedy: "un" + "##able" beats char-by-char decomposition
    assert wordpiece_tokenize("unable", vocab) == ["un", "##able"]
    # first position must use a NON-## piece
    assert wordpiece_tokenize("able", vocab) == ["a", "##b", "##l", "##e"]


def test_unk_is_all_or_nothing():
    vocab = {p: i for i, p in enumerate(SPECIALS + ["a", "##b"])}
    assert wordpiece_tokenize("abz", vocab) == [UNK]  # 'z' unreachable → whole word UNK
    assert wordpiece_tokenize("", vocab) == [UNK]


def test_round_trip_reassembly():
    """pieces re-concatenate to the original word (## stripped) — the
    structural property the first-subword alignment depends on."""
    vocab = default_vocab()
    for w in ["Microsoft", "internationalization", "Cambridge", "quarterly",
              "I.B.M.", "x1y2z3"]:
        pieces = wordpiece_tokenize(w, vocab)
        assert pieces != [UNK]
        rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert rebuilt == w
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])


def test_ascii_never_unk():
    vocab = default_vocab()
    assert wordpiece_tokenize("zzqxj", vocab) != [UNK]  # char alphabet backstop
    assert wordpiece_tokenize("报告", vocab) == [UNK]   # out-of-alphabet


def test_training_deterministic_and_loadable(tmp_path):
    counts = {"hello": 5, "help": 3, "hold": 2, "world": 4, "word": 4}
    v1 = train_wordpiece_vocab(counts, n_merges=20)
    v2 = train_wordpiece_vocab(dict(reversed(list(counts.items()))), n_merges=20)
    assert v1 == v2  # insertion order of the input dict must not matter
    p = tmp_path / "v.txt"
    p.write_text("\n".join(v1) + "\n")
    loaded = load_vocab(str(p))
    assert loaded["[UNK]"] == 0 and len(loaded) == len(v1)


def test_packaged_vocab_reproducible():
    """resources/wordpiece_vocab.txt must equal what the build tool emits —
    guards against hand-edits drifting from the deterministic recipe."""
    import importlib

    tool = importlib.import_module("tools.build_wordpiece_vocab")
    rebuilt = train_wordpiece_vocab(tool.corpus_words(), n_merges=1200)
    on_disk = [line.rstrip("\n") for line in open(
        "ner_extractor_ray/resources/wordpiece_vocab.txt", encoding="utf-8")]
    assert rebuilt == on_disk


def test_alignment_with_real_vocab():
    """tokenize_batch + WordPiece: first subword of word i carries word_id i,
    continuations carry −1; input_ids are vocab line indexes."""
    from ner_extractor_ray.stages.tokenize import tokenize_batch

    vocab = default_vocab()
    batch = pa.table({"tokens": [["Officials", "internationalization"]]})
    out = tokenize_batch(batch)
    ids = out["input_ids"][0].as_py()
    wids = out["word_ids"][0].as_py()
    p0 = wordpiece_tokenize("Officials", vocab)
    p1 = wordpiece_tokenize("internationalization", vocab)
    assert len(ids) == len(p0) + len(p1)
    assert ids == [vocab[p] for p in p0 + p1]
    expect_wids = [0] + [-1] * (len(p0) - 1) + [1] + [-1] * (len(p1) - 1)
    assert wids == expect_wids
