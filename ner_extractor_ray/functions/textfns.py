"""Deterministic text primitives: HTML extraction, sentence split, word and
subword tokenization, language-ID, quality scoring, fingerprinting.

All functions are pure per-row functions of their inputs — no cross-row state,
locale, or time dependence — the contract that makes byte-identical extraction
under any parallelism possible (SURVEY.md §7.3).
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np

from .hashing import stable_hash64

# ---------------------------------------------------------------- extraction

_BLOCK_STRIP_RE = re.compile(
    r"<(script|style|nav|header|footer)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE
)
_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html_bytes: bytes) -> str:
    """HTML → text: drop script/style/nav/header/footer blocks, keep the text
    of each <p> paragraph (tags stripped, entities unescaped, whitespace
    normalized), one paragraph per line.

    The deterministic analog of the reference's file→records parse step
    (DistilBERT-CRF/src/datasets.py:47-72); per-row invariant: byte-identical
    output per url vs the single-process oracle.
    """
    if html_bytes is None:
        return ""
    doc = html_bytes.decode("utf-8", errors="replace")
    doc = _BLOCK_STRIP_RE.sub(" ", doc)
    paras = []
    for m in _P_RE.finditer(doc):
        txt = _TAG_RE.sub(" ", m.group(1))
        txt = _htmllib.unescape(txt)
        txt = " ".join(txt.split())
        if txt:
            paras.append(txt)
    return "\n".join(paras)


# ------------------------------------------------------------- sentence split

# Boundary after a STANDALONE [.!?] token (preceded by whitespace) — attached
# periods ("I.B.M.") never split. Newline is always a boundary.
_SENT_SPLIT_RE = re.compile(r"(?<=\s[.!?])\s+")
# Word tokens: alphanumeric runs (with internal ' or .) or single punct chars.
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:[.'][A-Za-z0-9]+)*\.?|[^\sA-Za-z0-9]")


def split_sentences(text: str) -> list[str]:
    """Rule-based splitter: newline is always a boundary; within a line split
    after [.!?]+whitespace. Deterministic; mirrors the reference's pre-
    sentencized corpus assumption (src/datasets.py:58-67, blank-line delim)."""
    out = []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        for sent in _SENT_SPLIT_RE.split(line):
            sent = sent.strip()
            if sent:
                out.append(sent)
    return out


def tokenize_words(sentence: str) -> list[str]:
    """CoNLL-style word tokens; trailing sentence period split off."""
    toks = _TOKEN_RE.findall(sentence)
    out = []
    for t in toks:
        if len(t) > 1 and t.endswith(".") and t.count(".") == 1:
            out.append(t[:-1])
            out.append(".")
        else:
            out.append(t)
    return out


# --------------------------------------------------------- subword tokenizer

_MAX_PIECE = 4


def subword_tokenize(word: str) -> list[str]:
    """Deterministic WordPiece-shaped tokenizer: fixed-width pieces, ``##``
    continuation prefix. A stand-in for the HF fast tokenizer (no transformers
    in this sandbox) that preserves the structural property the alignment
    transform depends on: one word → 1..k subwords, first piece distinguished
    (src/data_module.py:83-119)."""
    if len(word) <= _MAX_PIECE:
        return [word]
    pieces = [word[:_MAX_PIECE]]
    for i in range(_MAX_PIECE, len(word), _MAX_PIECE):
        pieces.append("##" + word[i : i + _MAX_PIECE])
    return pieces


def subword_id(piece: str) -> int:
    """Stable vocab-free subword id (hash-vocab), int32-positive. crc32 (C
    speed): per-subword blake2 calls were ~15% of fused-pass UDF time."""
    import zlib

    return zlib.crc32(piece.encode("utf-8")) & 0x7FFFFFFF


# ------------------------------------------------------------- language ID

_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is", "was", "in", "for", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "des", "dans", "pour", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "de", "en", "por", "una", "que"],
}
_WORD_RE = re.compile(r"[a-zA-ZäöüßéèêàçñÄÖÜ]+")


def lang_id(text: str) -> str:
    """Stopword-profile language heuristic; "und" for unknown/CJK-ish text."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    wset = {}
    for w in words:
        wset[w] = wset.get(w, 0) + 1
    best, best_score = "und", 0
    for lang, profile in _LANG_PROFILES.items():
        score = sum(wset.get(w, 0) for w in profile)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "und"


# --------------------------------------------------------------- quality

_STOPWORDS = frozenset(_LANG_PROFILES["en"] + ["a", "an", "it", "on", "at", "by"])
_ALNUM_RE = re.compile(r"[A-Za-z0-9]+")


def quality_features(text: str) -> dict:
    """Length / punctuation / stopword-ratio features for quality filtering."""
    toks = _ALNUM_RE.findall(text)
    n_tok = len(toks)
    n_char = len(text)
    n_alpha = sum(len(t) for t in toks)
    n_stop = sum(1 for t in toks if t.lower() in _STOPWORDS)
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "mean_token_len": (n_alpha / n_tok) if n_tok else 0.0,
        "punct_ratio": ((n_char - n_alpha) / n_char) if n_char else 0.0,
        "stopword_ratio": (n_stop / n_tok) if n_tok else 0.0,
    }


# ------------------------------------------------------------ fingerprinting

def rolling_fingerprint(text: str, window: int = 16, keep_mod: int = 8) -> int:
    """Winnowing-style document fingerprint: polynomial rolling hash over byte
    windows, XOR of the hashes that are ≡0 mod ``keep_mod`` (position-robust).
    Returns a single uint63 fingerprint."""
    data = text.encode("utf-8")
    if len(data) < window:
        return stable_hash64(data) >> 1
    B, M = 257, (1 << 61) - 1
    h = 0
    pow_w = pow(B, window - 1, M)
    fp = 0
    for i, b in enumerate(data):
        h = (h * B + b) % M
        if i >= window:
            h = (h - data[i - window] * pow_w * B) % M
        if i >= window - 1 and h % keep_mod == 0:
            fp ^= h
    return fp


# --------------------------------------------------------- minhash / simhash

def char_shingles(s: str, k: int = 3) -> list[str]:
    s = " ".join(s.split()).lower()
    if len(s) < k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def word_ngrams(s: str, n: int = 3) -> list[str]:
    toks = [t.lower() for t in _ALNUM_RE.findall(s)]
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(12345)  # fixed seed: parameters are constants
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_MH_A, _MH_B = _minhash_params(64)


def minhash_signature(shingles: list[str], num_perm: int = 64) -> np.ndarray:
    """(num_perm,) uint64 MinHash signature over string shingles.

    Base shingle hash is crc32 (C speed): per-document costs are dominated by
    hashing ~1k shingles, and python-side blake2 calls made this stage ~5×
    slower. The 32→61-bit lift happens in the universal-hash family below;
    crc collisions only merge two shingles (negligible Jaccard noise)."""
    import zlib

    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array(
        sorted({zlib.crc32(s.encode("utf-8")) for s in shingles}), dtype=np.uint64
    )
    a, b = _MH_A[:num_perm], _MH_B[:num_perm]
    # (n_shingles, num_perm) universal hashing mod Mersenne prime
    prod = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return prod.min(axis=0)


def band_keys(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """LSH band keys: hash each band of the signature to one bucket key."""
    rows = len(sig) // n_bands
    out = []
    for b in range(n_bands):
        band = sig[b * rows : (b + 1) * rows]
        out.append(stable_hash64(band.tobytes()) & 0x7FFFFFFFFFFFFFFF)
    return out


# SQL-replicable MinHash variant (used by the dedup query family so a DuckDB
# oracle can recompute the exact banded-LSH plan; the KG canonicalization path
# keeps the faster crc32 scheme above and is plan-parity-tested instead).
# Base shingle hash = top 8 bytes of md5 (DuckDB:
# ``('0x' || substr(md5(s), 1, 16))::UBIGINT``); permutations and band keys
# use only uint64 wraparound + Mersenne mod, both exactly expressible in
# HUGEINT arithmetic.
_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)
_BUCKET_BITS = 59  # bucket = band_idx << 59 | (poly & (2^59-1)) — injective int64


def md5_hash64(s: str) -> int:
    import hashlib as _hl

    return int.from_bytes(_hl.md5(s.encode("utf-8")).digest()[:8], "big")


def minhash_signature_sql(shingles: list[str], num_perm: int = 64) -> np.ndarray:
    """(num_perm,) uint64 MinHash signature with an md5 base hash.

    v_p = ((md5_64(s) * a_p + b_p) mod 2^64) mod (2^61 - 1), min over distinct
    shingles; empty shingle set → all-max sentinel (same as the crc variant).
    """
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array(sorted({md5_hash64(s) for s in set(shingles)}), dtype=np.uint64)
    a, b = _MH_A[:num_perm], _MH_B[:num_perm]
    with np.errstate(over="ignore"):
        prod = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return prod.min(axis=0)


def minhash_signatures_sql_batch(
    shingle_lists: list[list[str]], num_perm: int = 64
) -> np.ndarray:
    """(n_docs, num_perm) uint64 md5-MinHash signatures — the BATCHED form of
    :func:`minhash_signature_sql`, identical values row for row.

    The driver-bench profile showed one ``hashlib.md5`` call per (doc,
    distinct shingle) dominating the LSH stage, so the batch form (a) hashes
    each distinct shingle ONCE per batch — near-duplicate corpora share most
    shingles across docs — and (b) computes the universal-hash family as ONE
    (U, num_perm) matrix, taking per-doc minima with ``np.minimum.reduceat``
    over gathered rows instead of a per-doc outer product."""
    n_docs = len(shingle_lists)
    a, b = _MH_A[:num_perm], _MH_B[:num_perm]
    sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    uniq: dict[str, int] = {}
    idx_lists: list[np.ndarray] = []
    for sh in shingle_lists:
        ids = [uniq.setdefault(s, len(uniq)) for s in set(sh)]
        idx_lists.append(np.asarray(ids, dtype=np.int64))
    if not uniq:
        return sigs
    base = np.fromiter((md5_hash64(s) for s in uniq), dtype=np.uint64, count=len(uniq))
    with np.errstate(over="ignore"):
        hmat = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    lens = np.array([len(ix) for ix in idx_lists], dtype=np.int64)
    nz = lens > 0
    if nz.any():
        cat = np.concatenate([ix for ix in idx_lists if len(ix)])
        offs = np.zeros(int(nz.sum()), dtype=np.int64)
        offs[1:] = np.cumsum(lens[nz])[:-1]
        sigs[nz] = np.minimum.reduceat(hmat[cat], offs, axis=0)
    return sigs


def band_buckets_batch(sigs: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """(n_docs, n_bands) int64 bucket ids — vectorized :func:`band_buckets`
    across a whole signature matrix (identical values row for row)."""
    n_docs, num_perm = sigs.shape
    rows = num_perm // n_bands
    mask = np.uint64((1 << _BUCKET_BITS) - 1)
    out = np.empty((n_docs, n_bands), dtype=np.int64)
    with np.errstate(over="ignore"):
        for bnd in range(n_bands):
            acc = np.full(n_docs, _FNV_OFFSET, dtype=np.uint64)
            for r in range(rows):
                acc = acc * _FNV_PRIME + sigs[:, bnd * rows + r]
            tagged = (np.uint64(bnd << _BUCKET_BITS)) | (acc & mask)
            out[:, bnd] = tagged.astype(np.int64)  # < 2^63: 16 bands × 59 bits
    return out


def band_buckets(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """Injective int64 LSH bucket ids: per band, FNV-style polynomial over the
    band's signature values (uint64 wraparound), masked to 59 bits and tagged
    with the band index in the top bits. SQL-replicable bit for bit."""
    rows = len(sig) // n_bands
    mask = np.uint64((1 << _BUCKET_BITS) - 1)
    out = []
    with np.errstate(over="ignore"):
        for b in range(n_bands):
            acc = _FNV_OFFSET
            for v in sig[b * rows : (b + 1) * rows]:
                acc = acc * _FNV_PRIME + np.uint64(v)
            out.append((b << _BUCKET_BITS) | int(acc & mask))
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (token-multiplicity weighted).

    Token hash = top 8 bytes of md5 — md5 (not blake2) deliberately, so an
    ANSI-SQL oracle can replicate the full simhash bit-for-bit (DuckDB:
    ``('0x' || substr(md5(t), 1, 16))::UBIGINT``). Hashing is done once per
    UNIQUE token and the bit-vote accumulation is vectorized across tokens."""
    if not tokens:
        return 0
    import hashlib as _hl
    from collections import Counter

    c = Counter(tokens)
    hs = np.array(
        [int(_hl.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in c],
        dtype=np.uint64,
    )
    w = np.fromiter(c.values(), dtype=np.int64, count=len(c))
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (w[:, None] * (2 * bits - 1)).sum(axis=0)
    out_bits = (acc > 0).astype(np.uint64)
    return int((out_bits << shifts).sum())


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0
