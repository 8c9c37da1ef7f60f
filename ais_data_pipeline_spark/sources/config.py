"""Config-document source (reference S4).

The reference job reads ``config/parameters.json`` from S3 on startup to
get ``file_urls``/``bucket_name``/``s3_path_prefix`` (reference
dubai-dataset/lambdas/data-ingestion/lambda_handler.py:311-323 and
dubai-dataset/config/parameters.json:1-10). The engine keeps the same
contract as a plain driver-side JSON read — a config document is not a
distributed dataset.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class IngestParameters:
    file_urls: list[str] = field(default_factory=list)
    bucket_name: str | None = None
    s3_path_prefix: str = "raw"
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "IngestParameters":
        known = {"file_urls", "bucket_name", "s3_path_prefix"}
        return cls(
            file_urls=list(d.get("file_urls", [])),
            bucket_name=d.get("bucket_name"),
            s3_path_prefix=d.get("s3_path_prefix", "raw"),
            extra={k: v for k, v in d.items() if k not in known},
        )


def load_parameters(path: str) -> IngestParameters:
    """Load job parameters from a local/NFS path (the S3 GET of the
    reference becomes a filesystem read; semantics identical)."""
    with open(path) as f:
        return IngestParameters.from_dict(json.load(f))
