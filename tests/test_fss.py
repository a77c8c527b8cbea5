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


# ---------------------------------------------------------------------------
# localstack-less END-TO-END contract: a mock Hadoop FileSystem
# (tests/support/mocks3.jar, source in tests/support/java) serves
# s3a://bucket/... from local disk, so the full library path —
# s3:// URL -> fss parse -> fs.s3a.* conf install -> scheme rewrite ->
# Spark's distributed scan — executes for real without an object store.
# ---------------------------------------------------------------------------

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOCK_JAR = os.path.join(REPO, "tests", "support", "mocks3.jar")


@pytest.fixture
def mock_s3(spark, tmp_path):
    """Install the mock s3a filesystem for one test, restore after."""
    spark.sql(f"ADD JAR {MOCK_JAR}")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    # resolve FS classes through the session jar classloader (ADD JAR)
    hconf.setClassLoader(spark._jsparkSession.sharedState().jarClassLoader())
    hconf.set("fs.s3a.impl", "exsparktest.MockS3FileSystem")
    hconf.set("fs.s3a.impl.disable.cache", "true")
    try:
        yield hconf
    finally:
        hconf.unset("fs.s3a.impl")
        hconf.unset("fs.s3a.impl.disable.cache")


def test_s3_read_parquet_end_to_end(spark, mock_s3, tmp_path):
    from explorer_spark.sources import read_parquet

    local = tmp_path / "bucket" / "data.parquet"
    spark.range(25).selectExpr("id", "id * 2 AS v").write.parquet(str(local))
    url = f"s3://test-bucket{local}"  # authority = bucket, path = local dir
    df = read_parquet(
        url,
        spark=spark,
        config={"access_key_id": "AK", "secret_access_key": "SK", "region": "us-east-1"},
    )
    assert df.n_rows() == 25
    assert sum(df.to_columns()["v"]) == sum(2 * i for i in range(25))
    # the fss spec landed on the Hadoop conf (what a real cluster needs)
    assert mock_s3.get("fs.s3a.access.key") == "AK"
    assert mock_s3.get("fs.s3a.endpoint.region") == "us-east-1"


def test_s3_read_csv_end_to_end(spark, mock_s3, tmp_path):
    from explorer_spark.sources import read_csv

    local = tmp_path / "bucket" / "t.csv"
    local.parent.mkdir(parents=True, exist_ok=True)
    local.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(
        f"s3://csv-bucket{local}",
        spark=spark,
        config={"access_key_id": "AK", "secret_access_key": "SK", "region": "eu-west-1"},
    )
    assert df.to_columns() == {"a": [1, 2], "b": ["x", "y"]}


def test_s3_guard_still_raises_without_connector(spark, tmp_path):
    # with NO fs.s3a.impl override and no hadoop-aws jar, the eager guard
    # must fire with the actionable message
    from explorer_spark.sources import fss

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.impl") is None
    with pytest.raises(RuntimeError, match="hadoop-aws"):
        fss.resolve_path(
            "s3://b/k.parquet", spark,
            {"access_key_id": "a", "secret_access_key": "s", "region": "r"},
        )


# ---------------------------------------------------------------------------
# HTTP(S) entries (reference fss.ex:143-260; data_frame.ex:905-911)
# ---------------------------------------------------------------------------


@pytest.fixture()
def http_server(tmp_path):
    """Local http.server over tmp_path; records request headers."""
    import http.server
    import threading

    seen_headers = []

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

        def do_GET(self):
            seen_headers.append(dict(self.headers))
            super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", seen_headers
    finally:
        srv.shutdown()


def test_parse_http_headers_validation():
    url, cfg = fss.parse_http("http://example.com/x.csv")
    assert cfg == {"headers": []}
    _, cfg = fss.parse_http(
        "https://example.com/x.csv", {"headers": [("authorization", "Bearer t")]}
    )
    assert cfg["headers"] == [("authorization", "Bearer t")]
    with pytest.raises(ValueError, match="headers must be a list"):
        fss.parse_http("http://example.com", {"headers": [("k", 1)]})
    with pytest.raises(ValueError, match="headers must be a list"):
        fss.parse_http("http://example.com", {"headers": "k: v"})


def test_http_read_csv_end_to_end(spark, http_server, tmp_path):
    from explorer_spark.sources import read_csv

    base, _ = http_server
    (tmp_path / "t.csv").write_text("a,b\n1,x\n2,y\n")
    df = read_csv(f"{base}/t.csv", spark=spark)
    assert df.to_columns() == {"a": [1, 2], "b": ["x", "y"]}


def test_http_read_parquet_end_to_end(spark, http_server, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from explorer_spark.sources import read_parquet

    base, _ = http_server
    pq.write_table(pa.table({"id": [1, 2, 3], "v": [2.0, 4.0, 6.0]}), tmp_path / "t.parquet")
    df = read_parquet(f"{base}/t.parquet", spark=spark)
    assert df.n_rows() == 3
    assert df.to_columns()["v"] == [2.0, 4.0, 6.0]


def test_http_headers_are_sent(spark, http_server, tmp_path):
    from explorer_spark.sources import read_csv

    base, seen = http_server
    (tmp_path / "h.csv").write_text("a\n1\n")
    read_csv(
        f"{base}/h.csv",
        spark=spark,
        config={"headers": [("X-Test-Token", "tok123")]},
    )
    assert any(h.get("X-Test-Token") == "tok123" for h in seen)


def test_http_404_raises_reference_error(http_server):
    base, _ = http_server
    with pytest.raises(ValueError, match=r"resource not found \(404\)"):
        fss.download_http(f"{base}/missing.csv")


def test_http_write_destination_rejected(spark, tmp_path):
    import explorer_spark as ex
    from explorer_spark.sources import write_csv

    df = ex.new({"a": [1]})
    with pytest.raises(ValueError, match="read-only"):
        write_csv(df, "http://127.0.0.1:1/out.csv")


def test_http_read_ipc_end_to_end(spark, http_server, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from explorer_spark.sources import read_ipc, read_ipc_stream

    base, _ = http_server
    table = pa.table({"a": [1, 2], "b": ["x", "y"]})
    with pa.OSFile(str(tmp_path / "t.arrow"), "wb") as sink, ipc.new_file(
        sink, table.schema
    ) as w:
        w.write_table(table)
    with pa.OSFile(str(tmp_path / "t.arrows"), "wb") as sink, ipc.new_stream(
        sink, table.schema
    ) as w:
        w.write_table(table)
    assert read_ipc(f"{base}/t.arrow", spark=spark).to_columns() == {"a": [1, 2], "b": ["x", "y"]}
    assert read_ipc_stream(f"{base}/t.arrows", spark=spark).to_columns() == {
        "a": [1, 2], "b": ["x", "y"],
    }
