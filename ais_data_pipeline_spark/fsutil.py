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
