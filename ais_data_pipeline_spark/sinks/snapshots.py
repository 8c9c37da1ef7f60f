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
"rollback" is just reading an older manifest. Manifests and the
current-pointer publish via write-to-temp + atomic rename.

Scale notes: the manifest lists files, not rows — at 100 TB a version
is O(file-count) metadata, and a time-travel read plans exactly like a
normal parquet read (partition pruning, pushdown all apply since the
file list feeds the normal DSv2 scan). Single-writer commit semantics
(like the reference's batch jobs); multi-writer optimistic locking is
a catalog service concern, out of scope by design.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "_manifests")


def current_version(table_path: str) -> int:
    """Latest committed version; 0 if the table doesn't exist yet."""
    ptr = os.path.join(_manifest_dir(table_path), "_current")
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def _load_manifest(table_path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_path), f"v{version:05d}.json")) as f:
        return json.load(f)


def _atomic_write(path: str, content: str) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        f.write(content)
    os.replace(tmp, path)


def write_snapshot(df: DataFrame, table_path: str, mode: str = "append") -> int:
    """Commit ``df`` as a new table version. ``mode='append'`` adds to
    the parent version's file set; ``'overwrite'`` replaces it. Data
    files land under an immutable per-version directory FIRST; the
    manifest (and current-pointer) publish only after the write
    succeeds, so a crashed job leaves no visible half-version."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent = current_version(table_path)
    version = parent + 1
    data_dir = os.path.join(table_path, "data", f"snap-{version:05d}")
    if os.path.isdir(data_dir):
        # leftover from a commit that crashed between the data write
        # and the manifest publish: no manifest references it (the
        # manifest IS the commit point), so it is garbage — without
        # this cleanup every retry failed PATH_ALREADY_EXISTS and the
        # table was wedged permanently (round-11 review)
        import shutil

        shutil.rmtree(data_dir)
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    files = new_files
    if mode == "append" and parent > 0:
        files = _load_manifest(table_path, parent)["files"] + new_files
    os.makedirs(_manifest_dir(table_path), exist_ok=True)
    manifest = {
        "version": version,
        "parent": parent,
        "operation": mode,
        "schema": df.schema.json(),
        "files": files,
    }
    _atomic_write(
        os.path.join(_manifest_dir(table_path), f"v{version:05d}.json"),
        json.dumps(manifest, indent=1),
    )
    _atomic_write(os.path.join(_manifest_dir(table_path), "_current"), str(version))
    return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table as of ``version`` (latest if None).
    Plans as a plain parquet scan over the manifest's file list —
    pushdown/pruning apply normally. An empty version still carries
    its schema (stored in the manifest)."""
    v = version if version is not None else current_version(table_path)
    if v < 1:
        raise ValueError(f"no snapshots at {table_path}")
    m = _load_manifest(table_path, v)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*m["files"])


def snapshot_history(table_path: str) -> list[dict]:
    """(version, parent, operation, n_files) per committed version
    whose manifest still exists (expired versions are skipped, not a
    crash — round-11 review: any expire_snapshots previously made this
    raise FileNotFoundError on the dropped manifests), oldest first."""
    out = []
    for v in range(1, current_version(table_path) + 1):
        if not os.path.exists(
            os.path.join(_manifest_dir(table_path), f"v{v:05d}.json")
        ):
            continue
        m = _load_manifest(table_path, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
            }
        )
    return out


def expire_snapshots(table_path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` versions: delete their
    manifests, then garbage-collect data files no surviving manifest
    references. Returns the expired version numbers. Idempotent over
    LIVE manifests only — versions a previous expire already dropped
    are skipped, not re-removed (round-12 hardening sweep: a second
    expire with a smaller keep_last crashed FileNotFoundError on the
    manifests the first one deleted — the same dropped-manifest class
    the r11 history fix covered)."""
    cur = current_version(table_path)
    alive = [
        v
        for v in range(1, cur + 1)
        if os.path.exists(os.path.join(_manifest_dir(table_path), f"v{v:05d}.json"))
    ]
    expired = alive[:-keep_last] if keep_last > 0 else []
    if not expired:
        return []
    keep = [v for v in alive if v not in expired]
    live: set[str] = set()
    for v in keep:
        live.update(_load_manifest(table_path, v)["files"])
    for v in expired:
        os.remove(os.path.join(_manifest_dir(table_path), f"v{v:05d}.json"))
    data_root = os.path.join(table_path, "data")
    for snap in sorted(os.listdir(data_root)):
        d = os.path.join(data_root, snap)
        for f in list(os.listdir(d)):
            p = os.path.join(d, f)
            if f.endswith(".parquet") and p not in live:
                os.remove(p)
        remaining = os.listdir(d)
        if not any(f.endswith(".parquet") for f in remaining):
            # only Spark sidecars (_SUCCESS, .crc) left — drop the dir
            for f in remaining:
                os.remove(os.path.join(d, f))
            os.rmdir(d)
    return expired
