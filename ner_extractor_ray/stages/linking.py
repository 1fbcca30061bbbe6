"""S7 — entity linking: surface normalization + alias-table candidate resolution.

Two-phase pattern per SURVEY.md §7.1: (a) candidate generation by normalized
alias key; (b) resolution through a broadcast alias table (``ray.put`` once,
read in every actor — never re-shipped per batch, never shuffled). Reference
analog: the entity-pool aggregate-then-broadcast pattern
(DistilBERT-CRF/src/augmentation.py:59-69, 92-95) and the GloVe lookup
(BiLSTM-CRF/5489Project_trainv2.ipynb cell 5).

Adds to the mentions table:
  ``norm_key``  — alias-resolved normalized surface
  ``node``      — "{type}:{norm_key}", the canonicalization graph node id
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.gazetteer import alias_canonical_map, normalize_surface


class Linker:
    """Actor-pool callable (state = alias map, fetched once per actor)."""

    def __init__(self, alias_ref=None):
        if alias_ref is None:
            self.alias = alias_canonical_map()
        elif isinstance(alias_ref, ray.ObjectRef):
            self.alias = ray.get(alias_ref)
        else:
            self.alias = alias_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("surface").to_pylist()
        types = batch.column("type").to_pylist()
        alias = self.alias
        keys, nodes = [], []
        for s, t in zip(surfaces, types):
            n = normalize_surface(s)
            n = alias.get(n, n)
            keys.append(n)
            nodes.append(f"{t}:{n}")
        return batch.append_column("norm_key", pa.array(keys, pa.string())).append_column(
            "node", pa.array(nodes, pa.string())
        )
