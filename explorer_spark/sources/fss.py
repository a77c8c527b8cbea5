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


# ---------------------------------------------------------------------------
# HTTP(S) entries (reference fss.ex:143-260 parse_http/download;
# data_frame.ex:905-911 normalises http(s):// entries through it, and the
# backend downloads to a hashed tmp path before handing the LOCAL file to
# the reader — polars_backend/shared.ex:289-297, data_frame.ex:51-66)
# ---------------------------------------------------------------------------


def parse_http(url: str, config=None) -> tuple[str, dict]:
    """Validate an http(s):// entry + optional config into (url,
    {"headers": [(k, v), ...]}) with the reference's header-shape error
    (fss.ex:164-213)."""
    headers = []
    if config is not None:
        if isinstance(config, dict):
            headers = config.get("headers", [])
        else:
            headers = config  # bare header list, the keyword-list form
        ok = isinstance(headers, (list, tuple)) and all(
            isinstance(h, (tuple, list))
            and len(h) == 2
            and isinstance(h[0], str)
            and isinstance(h[1], str)
            for h in headers
        )
        if not ok:
            raise ValueError(
                "headers must be a list of {key, value} tuples where both "
                f"are strings, got: {headers!r}"
            )
    return url, {"headers": [tuple(h) for h in headers]}


def download_http(url: str, config=None, dest: str | None = None) -> str:
    """Fetch an http(s):// entry to a local temp file and return its
    path — the reference's single-node HTTP read semantics (FSS.download
    fss.ex:248-259: 404 -> "resource not found (404)", other non-2xx ->
    "got HTTP status: N"; tmp naming shared.ex:289-297). The downloaded
    file then feeds the ordinary distributed reader; HTTP is a
    driver-side ingest path by design (object stores go through s3a for
    the distributed scan)."""
    import hashlib
    import secrets
    import shutil
    import tempfile
    import urllib.error
    import urllib.request

    import atexit

    url, cfg = parse_http(url, config)
    if dest is None:
        base = os.path.join(tempfile.gettempdir(), "explorer-spark-datasets")
        os.makedirs(base, exist_ok=True)
        h = hashlib.sha256(url.encode()).hexdigest()[:24]
        # rand suffix = re-download per read (the reference's semantics,
        # shared.ex:289-297 — no staleness); the temp file is reclaimed
        # at interpreter exit so repeated reads don't leak disk
        dest = os.path.join(base, f"http-file-{h}-{secrets.token_hex(6)}")
        atexit.register(_remove_quiet, dest)
    if dest.endswith("/"):
        raise ValueError(f"expected a regular file path, got: {dest!r}")
    # duplicate header keys merge with ", " (RFC 7230 §3.2.2) — urllib's
    # header store is a dict and would silently drop all but the last
    hdrs: dict[str, str] = {}
    for k_, v_ in cfg["headers"]:
        hdrs[k_] = f"{hdrs[k_]}, {v_}" if k_ in hdrs else v_
    req = urllib.request.Request(url, headers=hdrs)
    try:
        with urllib.request.urlopen(req) as resp, open(dest, "wb") as f:
            shutil.copyfileobj(resp, f)
    except urllib.error.HTTPError as e:
        if e.code == 404:
            raise ValueError("resource not found (404)") from None
        raise ValueError(f"got HTTP status: {e.code}") from None
    return dest


def _remove_quiet(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass
