"""Persist-lifecycle registry: scoped persists with an explicit release.

Several operators persist a loop-invariant or multiply-read intermediate
(LSH band buckets, shingle explodes, pagerank edge lists) whose lifetime
must extend past the operator call — the returned DataFrame is lazy and
re-reads the intermediate when the caller finally acts on it. A bare
``df.persist()`` therefore can never be paired with an in-function
``unpersist()``, and before round 6 those persists simply accumulated for
the life of the session (the round-5 bench measured 1.7-2x diffuse
inflation from exactly this: 198 queries x 2 runs of leaked cached
partitions, plus ``CacheManager`` already-cached warnings).

The fix is a process-wide registry: operators persist through
``scoped_persist`` and any natural boundary — a bench iteration, an API
request, the end of a pipeline stage — calls ``release_scoped()``.
Releasing early is always CORRECT (the lazy plan silently recomputes the
intermediate); holding forever is the only wrong lifecycle. This is the
same contract as Spark's own ``spark.catalog.clearCache()`` but scoped to
the engine's persists, so a host application's unrelated cached tables
survive a release.

At 100 TB the same discipline matters more, not less: a long-lived
session running many pipeline stages otherwise accumulates executor
storage until evictions thrash the shuffle working set.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Per-thread registries: a boundary release in one request thread must not
# unpersist another concurrent pipeline's in-flight frames (which would
# silently force recomputation mid-query). Each thread gets its own list;
# ``_ALL`` tracks every live list so session teardown can sweep everything.
_LOCAL = threading.local()
_ALL_LOCK = threading.Lock()
_ALL: dict[int, list[DataFrame]] = {}


def _registry() -> list[DataFrame]:
    reg = getattr(_LOCAL, "scoped", None)
    if reg is None:
        reg = []
        _LOCAL.scoped = reg
        with _ALL_LOCK:
            _ALL[threading.get_ident()] = reg
    return reg


def _drain(reg: list[DataFrame]) -> int:
    n = 0
    while reg:
        df = reg.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session or torn-down JVM must not break cleanup
            pass
    return n


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for this thread's next
    ``release_scoped()``."""
    out = df.persist(level)
    _registry().append(out)
    return out


def release_scoped() -> int:
    """Unpersist every DataFrame registered by the CURRENT thread; returns
    how many were freed.

    Safe to call at any time: plans that still reference a released
    intermediate recompute it from lineage on their next action. Frames
    persisted by other threads (concurrent pipelines) are untouched — use
    :func:`release_all_scoped` at full-session boundaries.
    """
    return _drain(_registry())


def release_all_scoped() -> int:
    """Unpersist every registered DataFrame across ALL threads.

    For single-owner boundaries — session shutdown, a bench harness that
    knows no pipeline is in flight.
    """
    with _ALL_LOCK:
        regs = list(_ALL.values())
    return sum(_drain(reg) for reg in regs)


@contextmanager
def persist_scope() -> Iterator[None]:
    """Release any persists this thread registers inside the ``with``
    block on exit.

    For drivers that want per-stage hygiene without tracking individual
    frames::

        with persist_scope():
            result = semantic_dedup(...).collect()
    """
    reg = _registry()
    mark = len(reg)
    try:
        yield
    finally:
        while len(reg) > mark:
            df = reg.pop()
            try:
                df.unpersist()
            except Exception:
                pass
