"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ray.init()/ray.shutdown(). ``entry()`` runs the flagship
KG-construction pipeline at sf0.001 scale; ``queries()``/``oracle_sql()`` are
the operator catalogue (ner_extractor_ray/pipelines/queries.py) the driver
cross-checks against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic Common-Crawl-style pages
    (BASELINE.json input_hint schema, sized for sf0.001) → knowledge-graph
    edges table. Driver checks rows >= 0 and stable schema."""
    from ner_extractor_ray.pipelines.queries import q_kg_edges

    return q_kg_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ner_extractor_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from ner_extractor_ray.pipelines.queries import oracle_sql as _o

    return _o()
