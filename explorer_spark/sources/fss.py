"""Filesystem-spec parsing for object-store URLs (reference
lib/explorer/fss.ex:30-140).

The reference parses ``s3://bucket/key`` plus a config (explicit map or
AWS_* env vars) into an S3 spec. Here the same spec is translated onto
Spark's Hadoop-S3A layer: credentials/region/endpoint become
``fs.s3a.*`` settings on the session's Hadoop configuration and the path
is rewritten to ``s3a://bucket/key``, so every reader (parquet, csv,
ndjson) scans object stores through Spark's native distributed input
paths — no driver-side download.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from urllib.parse import urlparse


@dataclass
class S3Config:
    """reference fss.ex S3Config struct."""

    access_key_id: str | None = None
    secret_access_key: str | None = None
    region: str | None = None
    endpoint: str | None = None
    bucket: str | None = None
    token: str | None = None


def _config_from_env() -> S3Config:
    return S3Config(
        access_key_id=os.environ.get("AWS_ACCESS_KEY_ID"),
        secret_access_key=os.environ.get("AWS_SECRET_ACCESS_KEY"),
        region=os.environ.get("AWS_REGION", os.environ.get("AWS_DEFAULT_REGION")),
        token=os.environ.get("AWS_SESSION_TOKEN"),
    )


def parse_s3(url: str, config: dict | S3Config | None = None) -> tuple[str, S3Config]:
    """Parse ``s3://bucket/key`` into (key, S3Config); config keys fall
    back to the AWS_* env vars exactly like fss.ex:106-140."""
    uri = urlparse(url)
    if uri.scheme != "s3" or not uri.netloc or not uri.path.startswith("/"):
        raise ValueError(f"expected s3://<bucket>/<key> URL, got: {url}")
    bucket = uri.netloc
    key = uri.path[1:]
    if config is None:
        cfg = _config_from_env()
    elif isinstance(cfg := config, S3Config):
        pass
    elif isinstance(config, dict):
        cfg = _config_from_env()
        for k, v in config.items():
            if not hasattr(cfg, k):
                raise ValueError(f"unknown S3 config key: {k!r}")
            setattr(cfg, k, v)
    else:
        raise ValueError(f"expect S3 configuration to be a dict, got {type(config).__name__}")
    for field, env in (
        ("access_key_id", "AWS_ACCESS_KEY_ID"),
        ("secret_access_key", "AWS_SECRET_ACCESS_KEY"),
    ):
        if not getattr(cfg, field):
            raise ValueError(f"missing {field} for S3 (set the key or the {env} env var)")
    if not cfg.region and not cfg.endpoint:
        raise ValueError("missing region for S3 (set the key or the AWS_REGION env var)")
    cfg.bucket = bucket
    return key, cfg


def s3a_available(spark) -> bool:
    """True iff the filesystem class that will serve ``s3a://`` paths is
    loadable. When the Hadoop conf overrides ``fs.s3a.impl`` (custom
    connectors — EMRFS-style shims, test mocks), THAT class is probed;
    otherwise the stock Hadoop-S3A connector. The PySpark distribution
    does not BUNDLE hadoop-aws — on clusters it ships via
    ``spark.jars.packages org.apache.hadoop:hadoop-aws:<hadoop version>``
    (plus the matching aws-sdk bundle); this probe exists so a missing
    jar fails with an actionable message instead of a deep
    ClassNotFoundException. Resolution goes through the Hadoop conf's
    classloader so jars added at runtime (``ADD JAR`` + a conf pointed at
    the session jar classloader) are honored."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    cls = hconf.get("fs.s3a.impl") or "org.apache.hadoop.fs.s3a.S3AFileSystem"
    try:
        hconf.getClassByName(cls)
        return True
    except Exception:
        return False


def apply_s3_config(spark, cfg: S3Config) -> None:
    """Install the spec onto the session's Hadoop conf (fs.s3a.*) —
    pure conf mapping, no classpath requirement (tested directly)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.access.key", cfg.access_key_id)
    hconf.set("fs.s3a.secret.key", cfg.secret_access_key)
    if cfg.token:
        hconf.set("fs.s3a.session.token", cfg.token)
        hconf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
        )
    if cfg.region:
        hconf.set("fs.s3a.endpoint.region", cfg.region)
    if cfg.endpoint:
        hconf.set("fs.s3a.endpoint", cfg.endpoint)
        hconf.set("fs.s3a.path.style.access", "true")


def resolve_path(
    path: str, spark, config: dict | S3Config | None = None, require_connector: bool = True
) -> str:
    """``s3://...`` -> configure the session and return the s3a path;
    any other scheme (local, s3a, hdfs, file) passes through untouched.
    Fails up front with an actionable message when the S3A connector jar
    is missing (``require_connector=False`` skips the probe — conf-only
    wiring, e.g. when the jar loads later via spark.jars.packages)."""
    if not path.startswith("s3://"):
        return path
    if require_connector and not s3a_available(spark):
        raise RuntimeError(
            "s3:// paths need the Hadoop-S3A connector on the JVM classpath; "
            "add spark.jars.packages=org.apache.hadoop:hadoop-aws:<hadoop-version> "
            "(not bundled with pip pyspark, and absent from this container)"
        )
    key, cfg = parse_s3(path, config)
    apply_s3_config(spark, cfg)
    return f"s3a://{cfg.bucket}/{key}"
