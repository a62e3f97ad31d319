"""Small shared helpers."""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def run_concurrently(*thunks: Callable):
    """Run independent Spark actions in parallel driver threads and return
    their results in argument order.

    Local-mode job submission costs ~0.2 s of driver scheduling per job
    regardless of data size (BENCH/BASELINE.md §1); overlapping
    independent count/collect DAGs hides that floor. Spark's scheduler is
    thread-safe for concurrent actions on one session.
    """
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def aslist(v):
    """None/NaN → []; ndarray/list → list (Arrow hands nested arrays as
    numpy objects whose truthiness is ambiguous). Shared by every
    mapInPandas kernel that walks nested ring arrays — keep ONE
    definition (this was copy-pasted in four modules)."""
    if v is None:
        return []
    try:
        import math

        if isinstance(v, float) and math.isnan(v):
            return []
    except Exception:
        pass
    return list(v)
