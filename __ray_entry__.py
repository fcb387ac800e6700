"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG build on /root/testdata/sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data operator family) with DuckDB oracles
where the semantics are SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline: deterministic pages corpus sized from sf0.001's
    documents table → full KG build (extract → NER → link → canonicalize →
    delta log) → returns the materialized delta-log Dataset."""
    from rdf_diff_store_ray._bootstrap import ensure_importable
    from rdf_diff_store_ray.pipelines.queries import kg_build_for

    ensure_importable()
    res = kg_build_for("/root/testdata/sf0.001")
    return res.delta_dataset()


def queries() -> dict[str, Callable[[str], Any]]:
    from rdf_diff_store_ray._bootstrap import ensure_importable
    from rdf_diff_store_ray.pipelines.queries import registry

    ensure_importable()
    return registry()


def oracle_sql() -> dict[str, str]:
    from rdf_diff_store_ray.pipelines.queries import oracles

    return oracles()
