"""Path utilities (op A7) + local scratch dirs for sink tests.

[R] dataengineeringutils/s3.py `s3_path_to_bucket_key` /
`bucket_key_to_s3_path` (reconstructed — SURVEY.md §0). Spark reads S3
through the Hadoop s3a connector, so the engine normalizes `s3://` to
`s3a://` when building read/write paths.
"""

from __future__ import annotations

import os

_S3_PREFIXES = ("s3://", "s3a://", "s3n://")


def s3_path_to_bucket_key(path: str) -> tuple[str, str]:
    """Split an s3 path into (bucket, key)."""
    for p in _S3_PREFIXES:
        if path.startswith(p):
            rest = path[len(p) :]
            bucket, _, key = rest.partition("/")
            return bucket, key
    raise ValueError(f"not an s3 path: {path}")


def bucket_key_to_s3_path(bucket: str, key: str, scheme: str = "s3a") -> str:
    return f"{scheme}://{bucket}/{key.lstrip('/')}"


def is_s3_path(path: str) -> bool:
    return path.startswith(_S3_PREFIXES)


def normalize_read_path(path: str) -> str:
    """`s3://` -> `s3a://` (Hadoop connector scheme); local paths pass through."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://") :]
    return path


_SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def scratch_dir(name: str) -> str:
    """Repo-local scratch directory for sink round-trip operators/tests."""
    d = os.path.join(_SCRATCH_ROOT, name)
    os.makedirs(d, exist_ok=True)
    return d
