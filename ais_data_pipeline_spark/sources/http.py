"""HTTP → landing-zone ingest (reference S3 + K1/K2 reshaped for Spark).

The reference Lambda streams remote CSVs chunk-by-chunk into S3 multipart
uploads under a date-partitioned prefix, with a concurrency semaphore,
zero-byte and abort edge cases, and per-op counters (reference
dubai-dataset/lambdas/data-ingestion/lambda_handler.py:90-264,266-291).

Spark-first reshaping (SURVEY §3.1): the engine distributes the URL list
as a one-column DataFrame and fetches inside ``foreachPartition`` — the
cluster's task slots replace the asyncio semaphore, the filesystem
committer replaces hand-rolled multipart (S3A does multipart
automatically at scale), and chunked copying keeps per-task memory
bounded at ``chunk_bytes`` regardless of file size (the reference's
20 MiB-peak claim, BASELINE.md ingestion table). Results come back
through accumulators, not collect().

No third-party HTTP client: stdlib ``urllib`` streams the body. For
testability the fetcher also accepts ``file://`` URLs.
"""

from __future__ import annotations

import datetime as _dt
import os
import urllib.request

from pyspark.sql import SparkSession

from ais_data_pipeline_spark.observability import log
from ais_data_pipeline_spark.sources.routing import dated_key, suffix_from_url

DEFAULT_CHUNK_BYTES = 1024 * 1024  # reference HTTP_CHUNK_KB=1024

#: a temp younger than this is assumed to have a LIVE writer (a
#: concurrent duplicate-key fetch in the same ingest_urls call) and is
#: left alone by the pre-attempt stale sweep; orphans age past it
STALE_TEMP_SECONDS = 15 * 60


def _fetch_one(
    url: str,
    dest_root: str,
    prefix: str,
    date_str: str,
    chunk_bytes: int,
    max_attempts: int = 3,
    progress_every_bytes: int = 64 * 1024 * 1024,
) -> dict:
    """Stream one URL to ``{dest_root}/{prefix}/Y/M/D/{name}`` in bounded
    memory. Mirrors reference edge cases: zero-byte body → empty object
    written; mid-stream error → partial file removed (abort path,
    reference lambda_handler.py:217-225,251-258); ``file_progress``
    events against Content-Length (M3, lambda_handler.py:211-214).
    Transient failures retry whole-file with linear backoff — each
    attempt restarts the temp file, so no torn output survives."""
    import time as _time

    import uuid as _uuid

    name = suffix_from_url(url)
    key = dated_key(prefix, name, date_str)
    dest = os.path.join(dest_root, key)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    # unique per fetch: two URLs routing to the SAME key (duplicate
    # list entries, or distinct URLs sharing a substring-map match)
    # previously shared one ".inprogress" path — concurrent tasks
    # interleaved writes into it and the surviving os.replace could
    # publish torn bytes (round-11 review). With a unique tmp, the
    # last atomic rename wins with intact content.
    tmp = dest + f".inprogress.{_uuid.uuid4().hex}"
    # Sweep stale temps for THIS key before the first attempt: the
    # exception path below removes our own temp, but a task killed
    # outright (executor loss, OOM) never reaches it, and the
    # uniquely-named torn file would otherwise sit in the landing-zone
    # data directory forever where prefix-glob readers pick it up
    # (round-12 review). Only temps COLDER than a staleness cutoff are
    # removed: a temp mtime'd within the window belongs to a live
    # concurrent fetch of a duplicate-key URL in this ingest_urls
    # call — deleting those out from under their writers made each
    # victim's os.replace fail once per peer sweep, burning its
    # max_attempts on spurious failures (round-12 review). A genuinely
    # orphaned temp (task killed outright) stops being written and
    # ages past the cutoff, so the NEXT ingest of the same key still
    # collects it.
    import glob as _glob
    import time as _time2

    cutoff = _time2.time() - STALE_TEMP_SECONDS
    for stale in _glob.glob(dest + ".inprogress.*"):
        try:
            if os.path.getmtime(stale) < cutoff:
                os.remove(stale)
        except OSError:
            pass  # already gone, or being renamed away right now
    n_bytes = 0
    last_error: str | None = None
    for attempt in range(1, max_attempts + 1):
        n_bytes = 0
        try:
            with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
                total = int(resp.headers.get("Content-Length") or 0)
                next_mark = progress_every_bytes
                while True:
                    chunk = resp.read(chunk_bytes)
                    if not chunk:
                        break
                    out.write(chunk)
                    n_bytes += len(chunk)
                    if n_bytes >= next_mark:
                        log(
                            "file_progress",
                            url=url,
                            bytes=n_bytes,
                            pct=round(100 * n_bytes / total, 1) if total else None,
                        )
                        next_mark += progress_every_bytes
            os.replace(tmp, dest)  # zero-byte body still produces the (empty) object
            return {"url": url, "key": key, "bytes": n_bytes, "ok": True, "error": None}
        except Exception as exc:  # abort: leave no partial output behind
            if os.path.exists(tmp):
                os.remove(tmp)
            last_error = str(exc)
            if attempt < max_attempts:
                log("fetch_retry", url=url, attempt=attempt, error=last_error, level="warn")
                _time.sleep(attempt)
    return {"url": url, "key": key, "bytes": n_bytes, "ok": False, "error": last_error}


def ingest_urls(
    spark: SparkSession,
    urls: list[str],
    dest_root: str,
    prefix: str = "raw",
    concurrency: int | None = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    date_str: str | None = None,
) -> dict:
    """Fetch ``urls`` into the landing zone in parallel; returns the
    reference-shaped summary ``{files_ok, files_failed, total_bytes,
    results}`` (reference lambda_handler.py:341-366).

    ``concurrency`` maps to the number of Spark partitions (task slots),
    replacing the reference's asyncio semaphore (CONCURRENCY env,
    reference lambda_handler.py:269). At large N this runs cluster-wide;
    for a handful of URLs it is a cheap single-stage job.
    """
    date_str = date_str or _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%d")
    n_slices = max(1, min(concurrency or len(urls), len(urls)))
    log("ingestion_plan", n_files=len(urls), prefix=prefix, concurrency=n_slices)

    sc = spark.sparkContext
    results = (
        sc.parallelize(urls, n_slices)
        .map(lambda u: _fetch_one(u, dest_root, prefix, date_str, chunk_bytes))
        .collect()  # N URL descriptors, not data — driver-safe
    )
    ok = [r for r in results if r["ok"]]
    failed = [r for r in results if not r["ok"]]
    summary = {
        "files_ok": len(ok),
        "files_failed": len(failed),
        "total_bytes": sum(r["bytes"] for r in ok),
        "results": results,
    }
    log("ingestion_summary", **{k: v for k, v in summary.items() if k != "results"})
    return summary
