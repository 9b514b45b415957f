"""Unit tests for path utilities (op A7)."""

import pytest

from dataengineeringutils_spark.paths import (
    bucket_key_to_s3_path,
    is_s3_path,
    normalize_read_path,
    s3_path_to_bucket_key,
)


def test_s3_path_to_bucket_key():
    assert s3_path_to_bucket_key("s3://bucket/a/b.parquet") == ("bucket", "a/b.parquet")
    assert s3_path_to_bucket_key("s3a://bucket/k") == ("bucket", "k")
    assert s3_path_to_bucket_key("s3://bucket") == ("bucket", "")


def test_s3_path_to_bucket_key_rejects_non_s3():
    with pytest.raises(ValueError):
        s3_path_to_bucket_key("/local/path")


def test_bucket_key_roundtrip():
    b, k = s3_path_to_bucket_key("s3://bkt/some/key.csv")
    assert bucket_key_to_s3_path(b, k) == "s3a://bkt/some/key.csv"
    assert bucket_key_to_s3_path(b, k, scheme="s3") == "s3://bkt/some/key.csv"


def test_normalize_read_path():
    assert normalize_read_path("s3://b/k") == "s3a://b/k"
    assert normalize_read_path("/tmp/x") == "/tmp/x"
    assert is_s3_path("s3a://b/k") and not is_s3_path("/tmp/x")


def test_ram_scratch_dir_is_pid_keyed_and_usable(tmp_path, monkeypatch):
    """ram_scratch_dir must be PID-keyed like scratch_dir and fall back
    to the repo scratch root when /dev/shm is absent (the _RAM_ROOT
    constant is resolved at import; this pins the invariants both
    roots share)."""
    import os

    from dataengineeringutils_spark import paths

    d = paths.ram_scratch_dir("unit_test_ck")
    assert f"pid-{os.getpid()}" in d
    assert os.path.isdir(d)
    # writable (streaming checkpoints create nested dirs + files)
    p = os.path.join(d, "offsets")
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "0"), "w") as f:
        f.write("x")
    assert open(os.path.join(p, "0")).read() == "x"
    # the fallback expression: absent /dev/shm resolves to the repo root
    fallback = (
        os.path.join("/dev/shm", "deu_spark_scratch")
        if os.path.isdir("/dev/shm")
        else paths._SCRATCH_ROOT
    )
    assert paths._RAM_ROOT == fallback
