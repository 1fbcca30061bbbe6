"""Stable, seed-free hashing used everywhere determinism is required.

The reference derives determinism from global RNG seeds and iteration order
(DistilBERT-CRF/src/utils.py:19-27, src/data_module.py:179-184). A distributed
engine cannot rely on call order, so every "random" or identity-assigning choice
here is a pure function of stable row keys. Python's builtin ``hash`` is salted
per process and MUST NOT be used.
"""

from __future__ import annotations

import hashlib

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def stable_hash64(s: str | bytes) -> int:
    """64-bit stable hash of a string (blake2b). Same value in every process."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def stable_id(s: str | bytes, prefix: str = "") -> str:
    """Hex entity/doc id, stable across processes and parallelism levels."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return prefix + hashlib.blake2b(s, digest_size=8).hexdigest()


def fnv1a64_array(strings: np.ndarray) -> np.ndarray:
    """Vectorized-ish FNV-1a over an object array of strings → uint64 array.

    Used for bucket/partition keys inside map_batches where per-row blake2
    would dominate. Pure function of bytes — identical at any parallelism.
    """
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        h = _FNV_OFFSET
        for b in s.encode("utf-8") if isinstance(s, str) else s:
            h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def crc_bucket(values, n_buckets: int) -> np.ndarray:
    """Fast stable bucket assignment → int32 in [0, n_buckets). Non-string
    keys (int ids) hash via their decimal string so the bucket is a pure
    function of the VALUE, identical in every process and at any width."""
    import zlib

    def enc(v):
        if isinstance(v, str):
            return v.encode("utf-8")
        if isinstance(v, bytes):
            return v
        return str(v).encode("utf-8")

    return np.fromiter(
        (zlib.crc32(enc(v)) % n_buckets for v in values),
        dtype=np.int32,
        count=len(values),
    )
