"""Snapshot-versioned parquet tables: Iceberg-style time travel
re-expressed minimally on plain parquet + JSON manifests (no new
dependencies).

Layout::

    table/
      data/snap-00001/part-*.parquet      immutable per-commit file sets
      _manifests/v00001.json              {"version", "parent",
                                           "operation", "schema",
                                           "files": [...]}
      _manifests/_current                 text: latest version number

Every commit writes NEW data files only, then publishes a manifest
listing the complete file set of that version (parent's files + new
for append; just new for overwrite) — so any historical version reads
as one ``spark.read.parquet(*files)`` with zero data copying, and
"rollback" is just reading an older manifest.

All manifest/pointer IO goes through the injectable ``fsutil.FsIO``
seam (r16: the last sink whose metadata IO was raw-``os`` local-only)
— the same bundle the dedup/IVF indexes and the ``upsert_parquet`` /
``compact_parquet`` table sinks commit through — so snapshot tables
maintain on ``s3a://``-class stores exactly like local disk. The
commit point is the MANIFEST (data files first, manifest second,
pointer last); the ``_current`` pointer is a cache of the max
committed version, and — following ``fsutil.publish_generation``'s
``STAGE_COMPLETE`` convention — a pointer that exists but is corrupt
(empty / non-integer: the footprint of a crash mid-write on a
truncate-then-write store) is RECOVERED as the max version whose
manifest exists, never silently read as "no table". Local pointer/
manifest writes stay write-to-temp + atomic replace; on object
stores each is a single PUT.

Scale notes: the manifest lists files, not rows — at 100 TB a version
is O(file-count) metadata, and a time-travel read plans exactly like a
normal parquet read (partition pruning, pushdown all apply since the
file list feeds the normal DSv2 scan). Single-writer commit semantics
(like the reference's batch jobs); multi-writer optimistic locking is
a catalog service concern, out of scope by design.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ais_data_pipeline_spark.fsutil import FsIO, _join, io_for

_MANIFEST_RE = re.compile(r"^v(\d{5,})\.json$")


def _manifest_dir(table_path: str) -> str:
    return _join(table_path, "_manifests")


def _manifest_path(table_path: str, version: int) -> str:
    return _join(_manifest_dir(table_path), f"v{version:05d}.json")


def _manifest_versions(table_path: str, io: FsIO) -> list[int]:
    """Sorted versions whose manifest exists, per one LIST of the
    manifest dir (single paged LIST on S3A — no per-version GETs)."""
    out = []
    for rel, _size in io.lister(_manifest_dir(table_path)):
        m = _MANIFEST_RE.match(rel)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(table_path: str, io: FsIO | None = None) -> int:
    """Latest committed version; 0 if the table doesn't exist yet.
    A pointer that exists but is empty/non-integer (crash mid-write on
    a truncate-then-write store) recovers as the max version whose
    manifest exists — the manifest is the commit record; the pointer
    only caches it (the ``fsutil.STAGE_COMPLETE`` recovery convention,
    ported here in r16)."""
    io = io or io_for(table_path)
    txt = io.read_text(_join(_manifest_dir(table_path), "_current"))
    if txt is None:
        return 0
    try:
        return int(txt.strip())
    except ValueError:
        versions = _manifest_versions(table_path, io)
        return versions[-1] if versions else 0


def _load_manifest(table_path: str, version: int, io: FsIO) -> dict | None:
    txt = io.read_text(_manifest_path(table_path, version))
    return None if txt is None else json.loads(txt)


def write_snapshot(
    df: DataFrame, table_path: str, mode: str = "append", io: FsIO | None = None
) -> int:
    """Commit ``df`` as a new table version. ``mode='append'`` adds to
    the parent version's file set; ``'overwrite'`` replaces it. Data
    files land under an immutable per-version directory FIRST; the
    manifest publishes second (the commit point), the current-pointer
    cache last — so a crashed job leaves no visible half-version, and
    a crash between manifest and pointer re-resolves on the next read
    or retry (single-writer, like every sink here)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    io = io or io_for(table_path)
    parent = current_version(table_path, io)
    version = parent + 1
    data_dir = _join(table_path, "data", f"snap-{version:05d}")
    # leftover from a commit that crashed between the data write and
    # the manifest publish: no manifest references it (the manifest IS
    # the commit point), so it is garbage — without this cleanup every
    # retry failed PATH_ALREADY_EXISTS and the table was wedged
    # permanently (round-11 review); io.remove is a no-op when absent
    io.remove(data_dir)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        _join(data_dir, rel)
        for rel, _size in io.lister(data_dir)
        if "/" not in rel and rel.endswith(".parquet")
    )
    files = new_files
    if mode == "append" and parent > 0:
        pm = _load_manifest(table_path, parent, io)
        if pm is None:
            raise FileNotFoundError(_manifest_path(table_path, parent))
        files = pm["files"] + new_files
    manifest = {
        "version": version,
        "parent": parent,
        "operation": mode,
        "schema": df.schema.json(),
        "files": files,
    }
    io.write_text(_manifest_path(table_path, version), json.dumps(manifest, indent=1))
    io.write_text(_join(_manifest_dir(table_path), "_current"), str(version))
    return version


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    io: FsIO | None = None,
) -> DataFrame:
    """Time-travel read: the table as of ``version`` (latest if None).
    Plans as a plain parquet scan over the manifest's file list —
    pushdown/pruning apply normally. An empty version still carries
    its schema (stored in the manifest)."""
    io = io or io_for(table_path)
    v = version if version is not None else current_version(table_path, io)
    if v < 1:
        raise ValueError(f"no snapshots at {table_path}")
    m = _load_manifest(table_path, v, io)
    if m is None:
        # expired or never-committed version — same error class the
        # pre-r16 raw file read raised (callers pin it)
        raise FileNotFoundError(_manifest_path(table_path, v))
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*m["files"])


def snapshot_history(table_path: str, io: FsIO | None = None) -> list[dict]:
    """(version, parent, operation, n_files) per committed version
    whose manifest still exists (expired versions are skipped, not a
    crash — round-11 review: any expire_snapshots previously made this
    raise FileNotFoundError on the dropped manifests), oldest first.
    Committed means <= ``current_version``: an orphan manifest above
    the pointer (crash between manifest and pointer writes) is
    excluded so history and current_version never disagree."""
    io = io or io_for(table_path)
    # Cap at the COMMITTED pointer (r16 ADVICE): a crash between the
    # manifest write and the pointer write leaves an orphan manifest
    # the documented retry path will overwrite with different
    # contents; enumerating the manifest dir alone reported it as
    # committed history while current_version still returned the
    # parent — the two functions disagreed during that window.
    committed = current_version(table_path, io)
    out = []
    for v in _manifest_versions(table_path, io):
        if v > committed:
            continue  # uncommitted orphan from a crashed publish
        m = _load_manifest(table_path, v, io)
        if m is None:
            continue  # racing an expire; history stays best-effort
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
            }
        )
    return out


def expire_snapshots(
    table_path: str, keep_last: int = 1, io: FsIO | None = None
) -> list[int]:
    """Drop all but the newest ``keep_last`` versions: delete their
    manifests, then garbage-collect data files no surviving manifest
    references. Returns the expired version numbers. Idempotent over
    LIVE manifests only — versions a previous expire already dropped
    are skipped, not re-removed (round-12 hardening sweep). A snap
    directory left with no live parquet files is removed whole
    (Spark sidecars like _SUCCESS go with it)."""
    io = io or io_for(table_path)
    alive = _manifest_versions(table_path, io)
    expired = alive[:-keep_last] if keep_last > 0 else []
    if not expired:
        return []
    keep = [v for v in alive if v not in expired]
    live: set[str] = set()
    for v in keep:
        m = _load_manifest(table_path, v, io)
        if m is not None:
            live.update(m["files"])
    for v in expired:
        io.remove(_manifest_path(table_path, v))
    data_root = _join(table_path, "data")
    by_snap: dict[str, list[str]] = {}
    for rel, _size in io.lister(data_root):
        head = rel.split("/", 1)[0]
        by_snap.setdefault(head, []).append(rel)
    for snap, rels in sorted(by_snap.items()):
        full = [(_join(data_root, rel), rel) for rel in rels]
        live_here = [p for p, rel in full if rel.endswith(".parquet") and p in live]
        if not live_here:
            # nothing referenced survives — drop the whole version dir
            io.remove(_join(data_root, snap))
            continue
        for p, rel in full:
            if rel.endswith(".parquet") and p not in live:
                io.remove(p)
    return expired
