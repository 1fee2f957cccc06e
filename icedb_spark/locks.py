"""Pluggable exclusive-lock providers for multi-node maintenance.

The reference engine REQUIRES an external exclusive lock around merge /
tombstone_cleanup when more than one node may run them
(/root/reference/ARCHITECTURE.md:115-117, README.md:600-616) but leaves
acquiring it entirely to the caller. ``IceTable(lock_provider=...)``
turns that documented contract into an enforceable one: a provider is
any callable ``op_name -> context manager``; the table holds the
returned context for the whole maintenance operation (reentrantly, so
``optimize -> merge_all -> merge`` acquires once).

``file_lock_provider`` below covers shared-POSIX-filesystem deployments
(NFS caveat: flock over NFS needs a lock-supporting mount). For object
stores, plug a DynamoDB conditional-put lease, a ZooKeeper/etcd lock, or
a Postgres advisory lock — anything exposing ``__enter__``/``__exit__``
with exclusive semantics has the right shape.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Callable, ContextManager


def file_lock_provider(
    lock_path: str, timeout_s: float = 600.0
) -> Callable[[str], ContextManager]:
    """An exclusive-lock provider backed by ``fcntl.flock`` on one shared
    file — correct across PROCESSES on the same host or a shared
    filesystem with working flock. Blocks until acquired (kernel-fair),
    raising ``TimeoutError`` after ``timeout_s`` so a dead peer holding
    an advisory lock cannot hang maintenance forever (flock dies with
    its holder's fd, so the timeout only fires under real contention).
    """
    import fcntl

    @contextmanager
    def acquire(op: str):
        d = os.path.dirname(lock_path)
        if d:
            os.makedirs(d, exist_ok=True)
        f = open(lock_path, "a+")
        try:
            _flock_with_timeout(f, fcntl, timeout_s, op)
            yield
        finally:
            try:
                fcntl.flock(f, fcntl.LOCK_UN)
            finally:
                f.close()

    return acquire


def _flock_with_timeout(f, fcntl, timeout_s: float, op: str) -> None:
    import time

    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return
        except OSError:
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"could not acquire maintenance lock for {op!r} "
                    f"within {timeout_s}s (held by another process?)"
                )
            time.sleep(0.05)
