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
