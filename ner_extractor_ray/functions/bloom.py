"""Bloom filter for distributed semi-join prefiltering (SURVEY.md §2.4 note:
"Semi / anti join: broadcast the key set (or a Bloom filter of it)").

Built distributively — each batch contributes a partial bitmap, OR-merged on
the driver (bitmaps are mergeable like sketches) — then broadcast once via
``ray.put``. Guarantees NO false negatives: a semi-join prefilter keeps every
true match and lets ≤ fpr false positives through to the exact verify stage;
for EXACT anti-joins use the exact broadcast key set when it fits (the bloom
side would wrongly drop false-positive non-members).
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_hash64


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 5):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, key: str) -> list[int]:
        h1 = stable_hash64(f"b1:{key}")
        h2 = stable_hash64(f"b2:{key}") | 1
        return [((h1 + i * h2) % self.n_bits) for i in range(self.n_hashes)]

    def add(self, key) -> None:
        for p in self._positions(str(key)):
            self.bits[p >> 3] |= 1 << (p & 7)

    def __contains__(self, key) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(str(key)))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        self.bits |= other.bits
        return self


def build_bloom(ds, key_col: str, *, n_bits: int = 1 << 20, n_hashes: int = 5) -> BloomFilter:
    """Distributed build: per-batch partial filters, OR-merged on the driver."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, n_hashes)
        for k in t.column(key_col).to_pylist():
            bf.add(k)
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    merged = BloomFilter(n_bits, n_hashes)
    for row in ds.select_columns([key_col]).map_batches(partial, batch_format="pyarrow").take_all():
        part = BloomFilter(n_bits, n_hashes)
        part.bits = np.frombuffer(row["bits"], dtype=np.uint8).copy()
        merged.merge(part)
    return merged


def semi_join_prefilter(ds, key_col: str, bloom_ref):
    """Keep rows whose key is (probably) in the broadcast bloom — the shuffle-
    free prefilter before an exact verify; never drops a true match."""
    import pyarrow as pa
    import ray

    def fn(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        mask = [k in bf for k in t.column(key_col).to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")
