"""Local-filesystem maintenance primitives for on-disk index tables.

The index compactors (``streaming.incremental_dedup.compact_dedup_index``,
``operators.similarity.compact_ivf_index``) rebuild a directory-backed
table by staging the consolidated copy to a sibling path and swapping it
into place. The swap itself is two ``os.rename`` calls — NOT atomic as a
pair — so these helpers carry the recovery protocol that makes a crash
at any point survivable:

    stage  = <live>_compact...   (complete before any rename happens)
    step 1 rename(live, <live>_old)
    step 2 rename(stage, live)
    step 3 rmtree(<live>_old)

Crash windows and their recovery (``recover_staged_swap`` runs them at
the NEXT maintenance entry):

- before step 1: live intact; a stale stage dir may exist → drop it
  (it is about to be rebuilt).
- between 1 and 2: no live dir, but the COMPLETE stage and the old
  copy both exist → finish the swap (rename stage→live), drop old.
- between 2 and 3: live intact, ``_old`` leftover → drop ``_old``.

Contract (single-writer, local FS): these renames are same-filesystem
``os.rename`` — maintenance must run from ONE process at a time, on a
path where rename is atomic (local disk; not S3/object stores, where
compaction belongs to a table format's commit protocol instead). Probes
racing a swap on a shared POSIX filesystem can observe a missing
directory for the instant between the two renames.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Iterable, Iterator

#: A lister maps a root path/URI to ``(relative_path, size_bytes)``
#: pairs for every file under it, with POSIX separators in the
#: relative path regardless of backend. Injectable so the compaction
#: trigger policy (and anything else that needs a footprint census)
#: can run against object stores or test fakes without code changes.
Lister = Callable[[str], Iterable[tuple[str, int]]]


def local_lister(root: str) -> Iterator[tuple[str, int]]:
    """``os.walk``-backed lister for plain local paths (and
    ``file://`` URIs). Missing roots yield nothing — an empty index
    is a valid pre-first-write state, not an error."""
    if root.startswith("file://"):
        root = root[len("file://") :]
    root = root.rstrip("/")
    if not os.path.isdir(root):
        return
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            full = os.path.join(dirpath, name)
            try:
                size = os.path.getsize(full)
            except OSError:
                continue  # racing a swap/delete; census stays best-effort
            rel = os.path.relpath(full, root)
            yield rel.replace(os.sep, "/"), size


def hadoop_lister(root: str) -> Iterator[tuple[str, int]]:
    """Hadoop ``FileSystem``-backed lister via the active session's
    JVM gateway — the path that exists on ``s3a://`` / ``hdfs://`` /
    ``abfs://`` where ``os.walk`` does not. One recursive
    ``listFiles`` call, which on S3A is a single paged LIST (no
    per-directory round trips) — the same cost class as the
    multi-slice read scan the policy check piggybacks on."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "hadoop_lister needs an active SparkSession for the JVM gateway"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return
    prefix = fs.makeQualified(jpath).toString().rstrip("/") + "/"
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath().toString()
        rel = p[len(prefix) :] if p.startswith(prefix) else p
        yield rel, int(status.getLen())


def iter_files(root: str, lister: Lister | None = None) -> Iterator[tuple[str, int]]:
    """Yield ``(relative_posix_path, size_bytes)`` for every file under
    ``root``, choosing the backend by scheme: an explicit ``lister``
    wins, non-file URIs go through the Hadoop FileSystem gateway, and
    bare paths / ``file://`` use ``os.walk``."""
    if lister is None:
        scheme_split = root.split("://", 1)
        remote = len(scheme_split) == 2 and scheme_split[0] != "file"
        lister = hadoop_lister if remote else local_lister
    yield from lister(root)


def recover_staged_swap(live: str, stage: str) -> None:
    """Repair the aftermath of a crash during a prior staged swap of
    ``stage`` into ``live`` (see module docstring for the windows).
    Idempotent; call on entry to any maintenance op that will re-stage."""
    old = live + "_old"
    if not os.path.exists(live):
        if os.path.exists(stage):
            # crashed between the two renames: the stage dir was
            # complete before step 1 ran, so it IS the new live table
            os.rename(stage, live)
        elif os.path.exists(old):
            # stage lost but the pre-swap copy survives: restore it
            os.rename(old, live)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(stage):
        # stale stage from a crash before the swap — about to re-stage
        shutil.rmtree(stage, ignore_errors=True)


def staged_swap(live: str, stage: str) -> None:
    """Swap a COMPLETE ``stage`` directory into ``live``'s place.
    A crash before the first rename leaves the live table intact; a
    crash at any later point is repaired by ``recover_staged_swap`` on
    the next maintenance entry. Single-writer, local-FS only (module
    docstring)."""
    old = live + "_old"
    os.rename(live, old)
    os.rename(stage, live)
    shutil.rmtree(old, ignore_errors=True)
