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
    """Canonical output filename for a source URL."""
    mapping = SUFFIX_MAP if suffix_map is None else suffix_map
    for key, suffix in mapping.items():
        if key in url:
            return suffix
    basename = urlparse(url).path.rsplit("/", 1)[-1]
    return basename or "data.csv"


def dated_key(prefix: str, filename: str, date_str: str) -> str:
    """Partitioned object key ``{prefix}/{YYYY}/{MM}/{DD}/{filename}``
    (reference lambda_handler.py:273,281); ``date_str`` is ``YYYY-MM-DD``
    (UTC ingest date)."""
    y, m, d = date_str.split("-")
    return f"{prefix}/{y}/{m}/{d}/{filename}"
