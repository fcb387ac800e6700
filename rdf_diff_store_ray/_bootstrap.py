"""Worker-importability safety net.

Ray serializes stage callables by module reference; workers must be able to
import this package. When the driver runs from the repo root (the normal
case) workers inherit that cwd and imports succeed. As a safety net for
drivers launched elsewhere, :func:`ensure_importable` additionally

1. exports the repo root on ``PYTHONPATH`` (picked up by any worker
   processes spawned after this point), and
2. registers every already-imported ``rdf_diff_store_ray`` module with
   cloudpickle's pickle-by-value, so stage classes ship with their code and
   need no import on the worker at all.

Idempotent and cheap; called at the top of each pipeline entry point.
"""

from __future__ import annotations

import os
import sys

_done = False


def ensure_importable() -> None:
    global _done
    if _done:
        return
    _done = True
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    try:
        from ray import cloudpickle

        for name, mod in list(sys.modules.items()):
            if name.startswith("rdf_diff_store_ray") and mod is not None:
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass
