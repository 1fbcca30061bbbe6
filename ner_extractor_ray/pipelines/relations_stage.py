"""Relation extraction entry over the tagged-sentences checkpoint."""

from __future__ import annotations

import ray.data

from ..stages.relations import relations_batch


def relations_from_tagged(tagged: "ray.data.Dataset") -> "ray.data.Dataset":
    return tagged.map_batches(relations_batch, batch_format="pyarrow")
