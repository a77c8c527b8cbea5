"""S3 fss-spec parsing (reference lib/explorer/fss.ex:30-140) — the
option-surface parse and Hadoop-conf translation, testable without an
object store."""

import pytest

from explorer_spark.sources import fss


def test_parse_s3_explicit_config():
    key, cfg = fss.parse_s3(
        "s3://my-bucket/data/file.parquet",
        {"access_key_id": "AK", "secret_access_key": "SK", "region": "us-west-2"},
    )
    assert key == "data/file.parquet"
    assert cfg.bucket == "my-bucket"
    assert cfg.region == "us-west-2"


def test_parse_s3_env_fallback(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "envAK")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "envSK")
    monkeypatch.delenv("AWS_REGION", raising=False)
    monkeypatch.setenv("AWS_DEFAULT_REGION", "eu-central-1")
    monkeypatch.setenv("AWS_SESSION_TOKEN", "tok")
    key, cfg = fss.parse_s3("s3://b/k")
    assert (cfg.access_key_id, cfg.secret_access_key, cfg.region, cfg.token) == (
        "envAK",
        "envSK",
        "eu-central-1",
        "tok",
    )


def test_parse_s3_partial_config_env_merge(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "envAK")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "envSK")
    key, cfg = fss.parse_s3("s3://b/k", {"region": "ap-south-1"})
    assert cfg.access_key_id == "envAK" and cfg.region == "ap-south-1"


def test_parse_s3_missing_credentials(monkeypatch):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    with pytest.raises(ValueError, match="access_key_id"):
        fss.parse_s3("s3://b/k")


def test_parse_s3_missing_region(monkeypatch):
    monkeypatch.delenv("AWS_REGION", raising=False)
    monkeypatch.delenv("AWS_DEFAULT_REGION", raising=False)
    with pytest.raises(ValueError, match="region"):
        fss.parse_s3("s3://b/k", {"access_key_id": "a", "secret_access_key": "s"})


def test_parse_s3_endpoint_without_region():
    key, cfg = fss.parse_s3(
        "s3://b/k",
        {"access_key_id": "a", "secret_access_key": "s", "endpoint": "http://minio:9000"},
    )
    assert cfg.endpoint == "http://minio:9000"


def test_parse_s3_bad_url():
    with pytest.raises(ValueError, match="expected s3"):
        fss.parse_s3("http://example.com/x", {"access_key_id": "a", "secret_access_key": "s"})


def test_parse_s3_unknown_key():
    with pytest.raises(ValueError, match="unknown S3 config key"):
        fss.parse_s3("s3://b/k", {"access_key": "a"})


def test_resolve_path_configures_hadoop(spark):
    out = fss.resolve_path(
        "s3://buck/pre/fix.parquet",
        spark,
        {"access_key_id": "AK1", "secret_access_key": "SK1", "region": "us-east-2",
         "endpoint": "http://minio:9000", "token": "T"},
        require_connector=False,  # conf wiring is testable without the s3a jar
    )
    assert out == "s3a://buck/pre/fix.parquet"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AK1"
    assert hconf.get("fs.s3a.endpoint.region") == "us-east-2"
    assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert hconf.get("fs.s3a.session.token") == "T"


def test_resolve_path_passthrough(spark):
    assert fss.resolve_path("/tmp/x.parquet", spark) == "/tmp/x.parquet"
    assert fss.resolve_path("s3a://already/conf", spark) == "s3a://already/conf"
