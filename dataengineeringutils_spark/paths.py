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


# Injection point for offline testing of the AWS seam: longest-prefix
# rewrites applied AFTER the s3->s3a normalization, so a test can map
# "s3a://some-bucket" -> "file:///tmp/fake-bucket" and drive
# read_table/write_table/folder ops through s3a-SHAPED paths end to end
# against local storage (tests/test_fake_s3_seam.py). Production never
# registers rewrites — the dict stays empty and this is a no-op.
_PATH_REWRITES: dict[str, str] = {}


def register_path_rewrite(prefix: str, target: str) -> None:
    """Map every path starting with ``prefix`` (post-normalization, so
    use the ``s3a://`` form) onto ``target``. Test-only seam."""
    _PATH_REWRITES[prefix] = target


def clear_path_rewrites() -> None:
    _PATH_REWRITES.clear()


def normalize_read_path(path: str) -> str:
    """`s3://` -> `s3a://` (Hadoop connector scheme); local paths pass
    through; registered test rewrites apply last (longest prefix wins)."""
    if path.startswith("s3://"):
        path = "s3a://" + path[len("s3://") :]
    for prefix in sorted(_PATH_REWRITES, key=len, reverse=True):
        if path.startswith(prefix):
            return _PATH_REWRITES[prefix] + path[len(prefix) :]
    return path


_SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

# RAM-backed root for EPHEMERAL artifacts (streaming checkpoints of
# memory-sink demo jobs): WAL/offset commits are fsync-bound, so a tmpfs
# shaves a fixed ~0.3 s per streaming run. Durable pipelines checkpoint
# to durable storage — only in-memory-sink queries (themselves
# non-durable by definition) may use this root. On a cluster, set
# SPARK_GRAFT_CHECKPOINT_ROOT to a durable, executor-visible location
# (s3a://... or HDFS); it takes precedence over tmpfs.
_RAM_ROOT = (
    os.environ.get("SPARK_GRAFT_CHECKPOINT_ROOT")
    or (
        os.path.join("/dev/shm", "deu_spark_scratch")
        if os.path.isdir("/dev/shm")
        else _SCRATCH_ROOT
    )
)

_swept: set[str] = set()


def _sweep_dead_scratch(root: str) -> None:
    """Best-effort removal of scratch dirs left by exited processes
    (runs once per process per root; a live PID's dir is never
    touched)."""
    _swept.add(root)
    import shutil

    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return
    for e in entries:
        if not e.startswith("pid-"):
            continue
        try:
            pid = int(e[4:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0 = existence probe
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, e), ignore_errors=True)
        except PermissionError:
            pass  # pid exists under another uid — leave it


def _pid_dir(root: str, name: str) -> str:
    if root not in _swept:
        _sweep_dead_scratch(root)
    d = os.path.join(root, f"pid-{os.getpid()}", name)
    os.makedirs(d, exist_ok=True)
    return d


def scratch_dir(name: str) -> str:
    """Repo-local scratch directory for sink round-trip operators/tests.

    Keyed by PID so concurrent processes (pytest alongside
    tools/verify_local.py, or two drivers) never write the same sink
    paths — the round-2 flake was exactly this collision."""
    return _pid_dir(_SCRATCH_ROOT, name)


def ram_scratch_dir(name: str) -> str:
    """PID-keyed scratch on tmpfs (falls back to ``scratch_dir``'s root
    when /dev/shm is absent OR unwritable). For ephemeral streaming
    checkpoints only — see the ``_RAM_ROOT`` note.

    The fallback probes by actually creating the pid dir: ``/dev/shm``
    existing is not enough on a shared host where another uid owns
    ``deu_spark_scratch`` (mode 0700) — makedirs then raises
    PermissionError and every streaming op would fail hard (ADVICE r4).
    """
    global _RAM_ROOT
    if "://" in _RAM_ROOT:
        # remote URI (SPARK_GRAFT_CHECKPOINT_ROOT on a cluster): Spark's
        # checkpoint manager creates it through the Hadoop FS connector —
        # no local makedirs, no PID sweep (lifecycle is the operator's)
        return f"{_RAM_ROOT.rstrip('/')}/pid-{os.getpid()}/{name}"
    if _RAM_ROOT != _SCRATCH_ROOT:
        try:
            return _pid_dir(_RAM_ROOT, name)
        except OSError:
            _RAM_ROOT = _SCRATCH_ROOT  # remember: tmpfs is unusable here
    return _pid_dir(_SCRATCH_ROOT, name)


def process_suffix() -> str:
    """Per-process suffix for managed-table names (same isolation rule
    as ``scratch_dir``, for objects that live in the session catalog /
    warehouse directory rather than at a path)."""
    return f"p{os.getpid()}"
