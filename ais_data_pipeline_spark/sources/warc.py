"""WARC / WET source (Common Crawl's container format) — pure stdlib.

A WARC file is a sequence of records, each framed as::

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Record-ID: <urn:uuid:...>\\r\\n
    WARC-Date: 2024-01-01T00:00:00Z\\r\\n
    WARC-Target-URI: http://...\\r\\n        (absent on warcinfo)
    Content-Type: text/plain\\r\\n
    Content-Length: NNN\\r\\n
    \\r\\n
    <NNN payload bytes>\\r\\n\\r\\n

``.warc.gz`` files gzip EACH record as its own member (ISO 28500
annex; what Common Crawl ships) — Python's ``gzip.GzipFile`` reads
concatenated members transparently, and the ``Content-Length`` header
frames every payload, so one sequential pass recovers every record
with bounded memory. WET files are ordinary WARCs whose records are
``conversion`` (extracted text) — the same parser covers both.

Scale design (100 TB of Common Crawl): ``.warc.gz`` is NOT splittable
at arbitrary offsets (gzip members + framed records), so the unit of
parallelism is the FILE — exactly how production CC jobs shard (one
~1 GiB warc.gz per task). ``read_warc`` distributes one file per
task via a tiny path relation and STREAMS records out of each file in
Arrow batches: whole files are never materialized, payload rows cap
at ``payload_max_bytes``, and the per-task memory bound is
(batch_rows × max payload). For object-store paths use
``read_warc_binaryfile`` — Spark's binaryFile source reaches any
Hadoop filesystem (s3a/abfs/hdfs) from executors, at the documented
cost of one whole file in memory per task (CC-sized files fit
executor memory; the streaming reader is for when they don't and the
store is mounted).

Reference parity: the reference pipeline ingests CSV/JSON over HTTP
(notebooks/0_preprocessing.ipynb); WARC extends the same ingest tier
to the canonical web-corpus container for the LLM-pipeline operators
(r15 verdict item 8).
"""

from __future__ import annotations

import gzip
import io as _io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

#: Arrow-batch granularity of the streaming reader: rows per yielded
#: pandas frame. Bounds per-task memory at batch_rows × payload cap.
_BATCH_ROWS = 256

WARC_SCHEMA = (
    "warc_file string, record_index long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content_length long, payload binary"
)


def _strip_file_uri(path: str) -> str:
    return path[len("file://") :] if path.startswith("file://") else path


def iter_warc_records(
    stream, warc_file: str = "", payload_max_bytes: int | None = None
) -> Iterator[dict]:
    """Parse one WARC stream (raw or multi-member gzip) into record
    dicts matching ``WARC_SCHEMA``. Loud ``ValueError`` on a bad
    version line, unparseable Content-Length, a truncated payload, OR
    a corrupt/truncated gzip member — gzip's native error classes
    (``BadGzipFile``, ``EOFError``, ``zlib.error``) are normalized to
    the documented ``ValueError`` so the fuzz contract (every corrupt
    input lands in ValueError/NotImplementedError) holds here like on
    every other parser. ``payload_max_bytes`` truncates the RETAINED
    payload while still consuming the full record (content_length
    keeps the declared size, so truncation is detectable
    downstream)."""
    head = stream.peek(2)[:2] if hasattr(stream, "peek") else b""
    if not head:
        # non-peekable stream (e.g. BytesIO): sniff via read+seek
        pos = stream.tell()
        head = stream.read(2)
        stream.seek(pos)
    if head == b"\x1f\x8b":
        stream = _gzip_valueerror_stream(gzip.GzipFile(fileobj=stream), warc_file)
    idx = 0
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue  # inter-record separator blank lines
        version = line.strip().decode("ascii", "replace")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"{warc_file}: bad WARC version line {version!r}")
        headers: dict[str, str] = {}
        last_key = None
        while True:
            hl = stream.readline()
            if not hl:
                raise ValueError(f"{warc_file}: truncated WARC header block")
            if hl in (b"\r\n", b"\n"):
                break
            if hl[:1] in (b" ", b"\t") and last_key:
                # RFC-822 folding: continuation extends the prior value
                headers[last_key] += " " + hl.strip().decode("utf-8", "replace")
                continue
            k, sep, v = hl.decode("utf-8", "replace").partition(":")
            if not sep:
                raise ValueError(f"{warc_file}: malformed WARC header {hl!r}")
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"{warc_file}: missing/invalid Content-Length in record {idx}"
            ) from None
        if length < 0:
            raise ValueError(f"{warc_file}: negative Content-Length")
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError(
                f"{warc_file}: truncated payload in record {idx} "
                f"({len(payload)}/{length} bytes)"
            )
        if payload_max_bytes is not None and len(payload) > payload_max_bytes:
            payload = payload[:payload_max_bytes]
        yield {
            "warc_file": warc_file,
            "record_index": idx,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": bytearray(payload),
        }
        idx += 1


class _gzip_valueerror_stream:
    """Thin read/readline adapter that converts gzip's corrupt-stream
    error classes (BadGzipFile/EOFError/zlib.error — OSError-family,
    NOT ValueError) into the documented ``ValueError`` class."""

    def __init__(self, gz, warc_file: str):
        self._gz = gz
        self._name = warc_file

    def _call(self, fn, *args):
        import zlib

        try:
            return fn(*args)
        except (gzip.BadGzipFile, EOFError, zlib.error) as exc:
            raise ValueError(
                f"{self._name}: corrupt gzip member ({exc})"
            ) from None

    def read(self, n: int = -1) -> bytes:
        return self._call(self._gz.read, n)

    def readline(self) -> bytes:
        return self._call(self._gz.readline)


def _records_to_batches(records: Iterable[dict]):
    import pandas as pd

    buf: list[dict] = []
    for rec in records:
        buf.append(rec)
        if len(buf) >= _BATCH_ROWS:
            yield pd.DataFrame(buf)
            buf = []
    if buf:
        yield pd.DataFrame(buf)


def read_warc(
    spark: SparkSession,
    paths: list[str] | str,
    payload_max_bytes: int | None = None,
) -> DataFrame:
    """Streaming WARC reader over LOCAL / ``file://`` paths: one task
    per file (the natural CC shard), records streamed out in Arrow
    batches — a file is never whole in memory. ``paths`` is a list or
    one glob string (expanded driver-side — a path list is O(files)
    metadata, the same cost class as Spark's own file listing). For
    s3a://-class paths use ``read_warc_binaryfile`` (executors cannot
    stream arbitrary Hadoop schemes from Python; the DSv2 binaryFile
    source can)."""
    import glob as _glob

    from ais_data_pipeline_spark.localrel import local_df

    if isinstance(paths, str):
        paths = sorted(_glob.glob(_strip_file_uri(paths)))
    if not paths:
        raise ValueError("read_warc: no paths")
    for p in paths:
        scheme = p.split("://", 1)
        if len(scheme) == 2 and scheme[0] != "file":
            raise NotImplementedError(
                f"read_warc streams local/file:// paths only (got {p!r}); "
                "use read_warc_binaryfile for Hadoop-filesystem schemes"
            )

    def parse(batches):
        for pdf in batches:
            for path in pdf["path"]:
                with open(_strip_file_uri(path), "rb") as f:
                    yield from _records_to_batches(
                        iter_warc_records(f, path, payload_max_bytes)
                    )

    rel = local_df(spark, [(p,) for p in sorted(paths)], "path string")
    # round-robin so each file lands in its own task
    return rel.repartition(len(paths)).mapInPandas(parse, WARC_SCHEMA)


def read_warc_binaryfile(
    spark: SparkSession,
    path_glob: str,
    payload_max_bytes: int | None = None,
) -> DataFrame:
    """WARC reader over Spark's ``binaryFile`` source — works on any
    Hadoop-reachable scheme (s3a/abfs/hdfs) because the FILE read
    happens JVM-side; the Python side parses the fetched bytes. One
    whole file per row, so size executors for the largest shard
    (Common Crawl's ~1 GiB warc.gz is fine at standard executor
    sizes)."""

    def parse(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield from _records_to_batches(
                    iter_warc_records(
                        _io.BytesIO(bytes(content)), path, payload_max_bytes
                    )
                )

    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def encode_warc_records(records: list[dict], gzip_members: bool = True) -> bytes:
    """Fixture twin of ``iter_warc_records`` (the encode_tiff
    convention: every parser ships its encoder so tests can't share a
    transcription bug through a single table). Each record dict:
    ``warc_type``, ``record_id``, ``warc_date``, ``content_type``,
    ``payload`` (bytes), optional ``target_uri``. With
    ``gzip_members`` each record compresses as its OWN gzip member
    (mtime pinned to 0 so fixture bytes are deterministic), the
    ``.warc.gz`` convention that keeps per-record random access
    possible for index-based readers."""
    out = bytearray()
    for rec in records:
        payload = bytes(rec["payload"])
        lines = [b"WARC/1.0\r\n"]
        hdrs = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rec["record_id"]),
            ("WARC-Date", rec["warc_date"]),
        ]
        if rec.get("target_uri"):
            hdrs.append(("WARC-Target-URI", rec["target_uri"]))
        hdrs += [
            ("Content-Type", rec["content_type"]),
            ("Content-Length", str(len(payload))),
        ]
        for k, v in hdrs:
            lines.append(f"{k}: {v}\r\n".encode())
        lines.append(b"\r\n")
        block = b"".join(lines) + payload + b"\r\n\r\n"
        out += gzip.compress(block, mtime=0) if gzip_members else block
    return bytes(out)


# -- Member-level random access (the CDX pattern) ----------------------------
#
# Common Crawl's companion CDX indexes record (file, member_offset,
# member_length) per record precisely BECAUSE each record is its own
# gzip member: a reader can fetch one record with a byte-range GET and
# decompress just that member. The pair below re-expresses that:
# build_warc_member_index walks a warc.gz once and emits the offsets,
# read_warc_member decompresses a single member slice. Offsets are
# self-validating (the index test re-reads every member independently
# and compares against the sequential parse) rather than oracle-
# checked — the byte positions depend on the encoder's zlib, so no
# closed form exists across environments.

#: chunk size of the member-boundary walk: bounded-memory streaming
#: split (a member never has to fit in one chunk).
_MEMBER_CHUNK = 1 << 20

WARC_MEMBER_SCHEMA = (
    "warc_file string, record_index long, member_offset long, "
    "member_length long, warc_type string, record_id string, "
    "target_uri string"
)


def iter_gzip_members(stream) -> Iterator[tuple[int, int, bytes]]:
    """(byte_offset, byte_length, decompressed_bytes) per gzip member
    of a concatenated-member stream, via chunked ``zlib.decompressobj``
    feeding — bounded memory in the COMPRESSED dimension (one member's
    decompressed bytes are materialized at a time; warc.gz members are
    single records, so that bound is the record size). Raises the
    documented ``ValueError`` on corrupt members."""
    import zlib

    pos = 0  # absolute offset of the current member's first byte
    buf = b""  # unconsumed compressed bytes, starting at `pos`
    eof = False
    while True:
        if not buf and not eof:
            buf = stream.read(_MEMBER_CHUNK)
            eof = not buf
        if not buf:
            return
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)  # gzip framing
        out = bytearray()
        fed = 0  # bytes of `buf`+later chunks fed into this member
        try:
            while True:
                chunk = buf if fed == 0 else stream.read(_MEMBER_CHUNK)
                if not chunk:
                    eof = True
                    if not d.eof:
                        raise ValueError("truncated gzip member")
                    break
                out += d.decompress(chunk)
                fed += len(chunk)
                if d.eof:
                    break
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member at {pos} ({exc})") from None
        consumed = fed - len(d.unused_data)
        yield pos, consumed, bytes(out)
        pos += consumed
        buf = d.unused_data


def build_warc_member_index(
    spark: SparkSession, paths: list[str] | str
) -> DataFrame:
    """CDX-style member index over local / ``file://`` warc.gz shards:
    one row per record with its gzip-member byte range — what a
    byte-range-GET reader (or a downstream join planning selective
    re-fetches) needs. Same one-task-per-file shape as ``read_warc``;
    only headers are parsed, payloads are skipped member-local."""
    import glob as _glob

    from ais_data_pipeline_spark.localrel import local_df

    if isinstance(paths, str):
        paths = sorted(_glob.glob(_strip_file_uri(paths)))
    if not paths:
        raise ValueError("build_warc_member_index: no paths")
    for p in paths:
        scheme = p.split("://", 1)
        if len(scheme) == 2 and scheme[0] != "file":
            raise NotImplementedError(
                "build_warc_member_index streams local/file:// paths only"
            )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for path in pdf["path"]:
                rows: list[dict] = []
                with open(_strip_file_uri(path), "rb") as f:
                    head = f.read(2)
                    f.seek(0)
                    if head != b"\x1f\x8b":
                        raise ValueError(
                            f"{path}: member indexing needs per-record "
                            "gzip members (.warc.gz); plain WARCs have "
                            "no member boundaries to index"
                        )
                    for idx, (off, length, raw) in enumerate(
                        iter_gzip_members(f)
                    ):
                        (rec,) = list(
                            iter_warc_records(_io.BytesIO(raw), path)
                        )
                        rows.append(
                            {
                                "warc_file": path,
                                "record_index": idx,
                                "member_offset": off,
                                "member_length": length,
                                "warc_type": rec["warc_type"],
                                "record_id": rec["record_id"],
                                "target_uri": rec["target_uri"],
                            }
                        )
                        if len(rows) >= _BATCH_ROWS:
                            yield pd.DataFrame(rows)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows)

    rel = local_df(spark, [(p,) for p in sorted(paths)], "path string")
    return rel.repartition(len(paths)).mapInPandas(parse, WARC_MEMBER_SCHEMA)


def read_warc_member(
    data: bytes, payload_max_bytes: int | None = None
) -> dict:
    """Decode ONE record from its gzip-member byte slice (what a
    byte-range GET of ``[member_offset, member_offset+member_length)``
    returns). The random-access counterpart of ``iter_warc_records``."""
    recs = list(iter_warc_records(_io.BytesIO(bytes(data)), "<member>",
                                  payload_max_bytes))
    if len(recs) != 1:
        raise ValueError(
            f"expected exactly one record in the member slice, got {len(recs)}"
        )
    return recs[0]
