"""Shared temp-file hygiene for the shard sinks (TFRecord / WebDataset).

Both sinks write each shard through a task-local temp file
(``shard-NNNNN.<ext>.tmp-<host>-<pid>-<uuid>``) followed by an atomic
``os.replace``. The unique suffix prevents cross-node interleaving, but
it also means a crashed process or a losing speculative attempt that
never reaches its ``finally`` leaves its temp file on the shared mount
forever — nothing ever reuses the name. The writers therefore:

1. unlink their own temp on ANY failure (try/except in the sink), and
2. call :func:`sweep_stale_tmps` before writing, which removes temps
   from PRIOR crashed processes — files old enough (default 1 h) that no
   live attempt can still be writing them.

The sweep is one ``scandir`` of the output directory per shard task —
shard dirs hold ~n_shards files, so this is noise next to the shard
write itself.
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = ["sweep_stale_tmps"]

STALE_TMP_AGE_S = 3600.0


def sweep_stale_tmps(out_dir: str, max_age_s: float = STALE_TMP_AGE_S) -> int:
    """Unlink ``*.tmp-*`` files in ``out_dir`` whose mtime is older than
    ``max_age_s`` seconds; returns how many were removed. Races between
    concurrent sweepers (or a sweeper and the file's owner finishing its
    atomic replace) are benign: every unlink failure is suppressed."""
    removed = 0
    try:
        entries = list(os.scandir(out_dir))
    except OSError:
        return 0
    cutoff = time.time() - max_age_s
    for entry in entries:
        if ".tmp-" not in entry.name:
            continue
        with contextlib.suppress(OSError):
            if entry.is_file(follow_symlinks=False) and entry.stat().st_mtime < cutoff:
                os.unlink(entry.path)
                removed += 1
    return removed
