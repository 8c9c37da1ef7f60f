"""URL → canonical filename routing (reference S5).

The reference maps dataset URLs to canonical table filenames via a
substring map with a basename fallback (reference dubai-dataset/lambdas/
data-ingestion/lambda_handler.py:72-88). Same contract here: first
matching substring key wins; unknown URLs fall back to the URL basename;
an empty basename becomes ``data.csv``.
"""

from __future__ import annotations

from urllib.parse import urlparse

#: Substring → canonical filename (reference lambda_handler.py:72-79).
SUFFIX_MAP: dict[str, str] = {
    "rent_contracts": "rent_contracts.csv",
    "transactions": "transactions.csv",
    "projects": "projects.csv",
    "units": "units.csv",
    "developers": "developers.csv",
    "buildings": "buildings.csv",
}


def suffix_from_url(url: str, suffix_map: dict[str, str] | None = None) -> str:
    """Canonical output filename for a source URL. Matching is
    case-insensitive: the reference lowercases the URL before the
    substring scan (lambda_handler.py:82), so ``...RENT_CONTRACTS...``
    routes identically to its lowercase form."""
    mapping = SUFFIX_MAP if suffix_map is None else suffix_map
    lowered = url.lower()
    for key, suffix in mapping.items():
        if key in lowered:
            return suffix
    basename = urlparse(url).path.rsplit("/", 1)[-1]
    return basename or "data.csv"


def suffix_col(url_col, suffix_map: dict[str, str] | None = None):
    """Distributed form of ``suffix_from_url``: the same first-match
    substring routing as a single codegen'd when-chain, for routing a
    DataFrame of URLs without a Python UDF. Fallback = path basename
    (query string stripped), empty → ``data.csv``."""
    from pyspark.sql import functions as F

    mapping = SUFFIX_MAP if suffix_map is None else suffix_map
    lowered = F.lower(url_col)
    basename = F.regexp_extract(F.split(url_col, r"[?#]").getItem(0), r"([^/]*)$", 1)
    expr = F.when(basename == "", F.lit("data.csv")).otherwise(basename)
    for key, suffix in reversed(list(mapping.items())):
        expr = F.when(lowered.contains(key.lower()), F.lit(suffix)).otherwise(expr)
    return expr


def dated_key(prefix: str, filename: str, date_str: str) -> str:
    """Partitioned object key ``{prefix}/{YYYY}/{MM}/{DD}/{filename}``
    (reference lambda_handler.py:273,281); ``date_str`` is ``YYYY-MM-DD``
    (UTC ingest date)."""
    y, m, d = date_str.split("-")
    return f"{prefix}/{y}/{m}/{d}/{filename}"
