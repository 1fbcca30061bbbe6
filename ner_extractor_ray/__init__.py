"""ner_extractor_ray — a Ray-Data-native knowledge-graph construction engine.

Brand-new engine with the data-processing semantics of the reference
(acd19ml/ner-extractor: CoNLL NER with tokenize → token-classify → BIO decode →
entity spans → strict entity-level P/R/F1), lifted to web scale over Parquet
tables of Common-Crawl-style pages and expressed Ray-Data-first:

    ray.data.read_parquet(pages)
      → map_batches(extract)        html → text (deterministic, byte-identical)
      → map_batches(sentseg)        text → sentence rows (flat-map shaped)
      → map_batches(tokenize)       tokens → subword ids + first-subword alignment
      → map_batches(Tagger, ...)    emissions → Viterbi BIO tags (actor pool)
      → map_batches(decode)         tags → mentions table
      → map_batches(relations)      adjacent-mention patterns → triples
      → linking + canonicalization  MinHash-LSH blocking + connected components
      → materialize                 sorted nodes/edges Parquet + lineage manifests

No code is copied from the reference; reference files are cited in docstrings as
``file:line`` for semantic parity only.
"""

__version__ = "0.1.0"

LABELS = [
    "O",
    "B-PER", "I-PER",
    "B-ORG", "I-ORG",
    "B-LOC", "I-LOC",
    "B-MISC", "I-MISC",
]
# Sorted-distinct determinism mirrors the reference's label vocabulary
# (DistilBERT-CRF/src/data_module.py:30-40): ids are positions in a fixed list.
LABEL_TO_ID = {lab: i for i, lab in enumerate(LABELS)}
ID_TO_LABEL = {i: lab for i, lab in enumerate(LABELS)}
IGNORE_LABEL_ID = -100  # non-first-subword / special positions (src/data_module.py:98-110)
