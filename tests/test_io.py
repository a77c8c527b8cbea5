"""IO round-trips per format (reference test strategy: csv/parquet/ipc/
ipc_stream/ndjson suites, SURVEY §5)."""

import pytest

import explorer_spark as ex
from explorer_spark import sources


@pytest.fixture(scope="module")
def df(spark):
    return ex.from_columns(
        {
            "i": [1, 2, 3],
            "x": [1.5, None, -2.25],
            "s": ["a", "b,c", "naïve"],
            "b": [True, False, None],
        },
        spark=spark,
    )


def _cols(d):
    return d.sort_by("i").to_columns()


def test_parquet_roundtrip(df, tmp_path):
    p = str(tmp_path / "t.parquet")
    sources.write_parquet(df, p, compression="zstd")
    back = sources.read_parquet(p)
    assert _cols(back) == _cols(df)
    assert back.dtypes == df.dtypes


def test_parquet_compression_surface(df, tmp_path):
    """Reference parquet_test.exs:286-323: codec grid + (codec, level)
    pairs. JVM writer: snappy/gzip/zstd/lz4_raw (+zstd level knob);
    dump_parquet honors gzip/brotli/zstd levels exactly (pyarrow)."""
    for i, codec in enumerate(["snappy", "gzip", ("zstd", 3), "lz4raw"]):
        p = str(tmp_path / f"c{i}.parquet")
        sources.write_parquet(df, p, compression=codec)
        assert _cols(sources.read_parquet(p)) == _cols(df)
    for codec in ["gzip", ("gzip", 5), ("brotli", 5), ("zstd", 2), "lz4raw", "uncompressed"]:
        blob = sources.dump_parquet(df, compression=codec)
        assert _cols(sources.load_parquet(blob)) == _cols(df)


def test_parquet_column_projection(df, tmp_path):
    p = str(tmp_path / "t2.parquet")
    sources.write_parquet(df, p)
    back = sources.read_parquet(p, columns=["i", "s"])
    assert back.names == ["i", "s"]


def test_csv_roundtrip(df, tmp_path):
    p = str(tmp_path / "t_csv")
    sources.write_csv(df, p)
    back = sources.read_csv(p)
    got = _cols(back)
    assert got["i"] == [1, 2, 3]
    assert got["s"] == ["a", "b,c", "naïve"]  # quoted comma survives
    assert got["x"] == [1.5, None, -2.25]


def test_csv_options(spark, tmp_path):
    p = str(tmp_path / "semi.csv")
    with open(p, "w") as fh:
        fh.write("a;b\n1;x\n2;NULL\n3;z\n")
    back = sources.read_csv(p, delimiter=";", nil_values=["NULL"])
    got = _cols(back.rename({"a": "i"}))
    assert got["b"] == ["x", None, "z"]
    limited = sources.read_csv(p, delimiter=";", max_rows=2)
    assert limited.n_rows() == 2


def test_csv_explicit_dtypes(spark, tmp_path):
    p = str(tmp_path / "typed.csv")
    with open(p, "w") as fh:
        fh.write("a,b\n1,2.5\n")
    back = sources.read_csv(p, dtypes={"a": ("s", 32), "b": ("f", 64)})
    assert back.dtypes == {"a": ("s", 32), "b": ("f", 64)}


def test_ndjson_roundtrip(df, tmp_path):
    p = str(tmp_path / "t_json")
    sources.write_ndjson(df, p)
    back = sources.read_ndjson(p)
    got = _cols(back.select(["i", "s"]))
    assert got["s"] == ["a", "b,c", "naïve"]


def test_ipc_file_roundtrip(df, tmp_path):
    p = str(tmp_path / "t.arrow")
    sources.write_ipc(df, p)
    back = sources.read_ipc(p)
    assert _cols(back)["s"] == ["a", "b,c", "naïve"]


def test_ipc_stream_roundtrip(df, tmp_path):
    p = str(tmp_path / "t.arrows")
    sources.write_ipc_stream(df, p)
    back = sources.read_ipc_stream(p)
    assert _cols(back)["x"] == [1.5, None, -2.25]
    # the file reader also detects stream format (reference fallback)
    back2 = sources.read_ipc(p)
    assert back2.n_rows() == 3


def test_dump_load_csv(df):
    text = sources.dump_csv(df)
    assert text.splitlines()[0] == "i,x,s,b"
    back = sources.load_csv(text)
    assert back.n_rows() == 3


def test_dump_load_ndjson(df):
    text = sources.dump_ndjson(df)
    back = sources.load_ndjson(text)
    assert back.n_rows() == 3


def test_nested_parquet_roundtrip(spark, tmp_path):
    sdf = spark.createDataFrame(
        [(1, [1, 2], ("x", 9)), (2, [], ("y", 8))],
        "id long, xs array<long>, st struct<a: string, b: long>",
    )
    from explorer_spark.frame import ORDER_COL, DataFrame
    from pyspark.sql import functions as F

    d = DataFrame(sdf.withColumn(ORDER_COL, F.monotonically_increasing_id()), has_order=True)
    p = str(tmp_path / "nested.parquet")
    sources.write_parquet(d, p)
    back = sources.read_parquet(p)
    assert back.dtypes["xs"] == ("list", ("s", 64))
    assert back.dtypes["st"][0] == "struct"
    got = back.sort_by("id").to_rows()
    assert got[0]["st"] == {"a": "x", "b": 9}


# ---------------------------------------------------------------------------
# round-2 options: quote styles, skip_rows, multi nil_values
# ---------------------------------------------------------------------------


def _read_lines(dirpath):
    import glob

    out = []
    for part in sorted(glob.glob(str(dirpath) + "/part-*")):
        with open(part) as fh:
            out.extend(line.rstrip("\n") for line in fh if line.strip())
    return out


@pytest.fixture(scope="module")
def qdf(spark):
    return ex.from_columns(
        {"i": [1, 2], "s": ['plain', 'has "q" and ,comma'], "x": [1.5, -2.0]},
        spark=spark,
    )


def test_csv_quote_necessary(qdf, tmp_path):
    p = str(tmp_path / "nec")
    sources.write_csv(qdf, p, quote_style="necessary")
    lines = _read_lines(p)
    assert any('"' in ln for ln in lines[1:])  # comma field got quoted
    assert any('plain' in ln and '"plain"' not in ln for ln in lines)


def test_csv_quote_always_roundtrip(qdf, tmp_path):
    p = str(tmp_path / "alw")
    sources.write_csv(qdf, p, quote_style="always")
    lines = _read_lines(p)
    assert all(ln.startswith('"') for ln in lines)
    back = sources.read_csv(p, dtypes={"i": ("s", 64), "s": "string", "x": ("f", 64)})
    assert back.sort_by("i").to_columns()["s"] == qdf.sort_by("i").to_columns()["s"]


def test_csv_quote_never(spark, tmp_path):
    d = ex.from_columns({"i": [1], "s": ["no quotes here"]}, spark=spark)
    p = str(tmp_path / "nev")
    sources.write_csv(d, p, quote_style="never")
    lines = _read_lines(p)
    assert all('"' not in ln for ln in lines)


def test_csv_quote_non_numeric_roundtrip(qdf, tmp_path):
    p = str(tmp_path / "nonnum")
    sources.write_csv(qdf, p, quote_style="non_numeric")
    data = [ln for ln in _read_lines(p) if not ln.startswith("i,")]
    # strings quoted, numerics bare
    assert all(ln.split(",")[0].isdigit() for ln in data)
    assert all(',"' in ln for ln in data)
    back = sources.read_csv(p, dtypes={"i": ("s", 64), "s": "string", "x": ("f", 64)})
    assert back.sort_by("i").to_columns() == qdf.sort_by("i").to_columns()


def test_csv_quote_style_invalid(qdf, tmp_path):
    with pytest.raises(ValueError):
        sources.write_csv(qdf, str(tmp_path / "zz"), quote_style="sometimes")


def test_csv_skip_rows(spark, tmp_path):
    p = tmp_path / "skip.csv"
    p.write_text("garbage line 1\ngarbage line 2\na,b\n1,x\n2,y\n")
    back = sources.read_csv(str(p), skip_rows=2, spark=spark)
    assert back.names == ["a", "b"]
    assert back.sort_by("a").to_columns()["b"] == ["x", "y"]


def test_csv_multi_nil_values(spark, tmp_path):
    p = tmp_path / "nils.csv"
    p.write_text("a,b\nNA,x\nn/a,NA\n1,z\n")
    back = sources.read_csv(
        str(p), nil_values=["NA", "n/a"], dtypes={"a": "string", "b": "string"}, spark=spark
    )
    cols = back.to_columns()
    assert cols["a"] == [None, None, "1"]
    assert cols["b"] == ["x", None, "z"]


def test_read_ipc_distributed_multi_file(spark, tmp_path):
    """Many-file IPC datasets decode executor-side (binaryFile +
    mapInArrow), matching the driver-side reader row-for-row."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from explorer_spark.sources import read_ipc_distributed

    for i in range(3):
        t = pa.table({"a": [i * 10 + j for j in range(4)], "s": [f"r{i}{j}" for j in range(4)]})
        with pa.OSFile(str(tmp_path / f"part{i}.arrow"), "wb") as sink, ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
    got = read_ipc_distributed(str(tmp_path / "part*.arrow"), spark=spark)
    rows = sorted((r["a"], r["s"]) for r in got.to_rows())
    assert rows == sorted((i * 10 + j, f"r{i}{j}") for i in range(3) for j in range(4))
    pruned = read_ipc_distributed(str(tmp_path / "part*.arrow"), columns=["a"], spark=spark)
    assert pruned.names == ["a"] and len(pruned.to_rows()) == 12
    # rows keep the SORTED-FILE order contract (fidx * 2^40 + row pos);
    # order would scramble if the executor path-mapping ever misassigned
    ordered = [r["a"] for r in got.to_rows()]
    assert ordered == [i * 10 + j for i in range(3) for j in range(4)]


def test_read_ipc_distributed_symlinked_path(spark, tmp_path):
    """Symlinked/alternate path forms must map back to the right file
    index (basename fallback) instead of silently collapsing to 0."""
    import os

    import pyarrow as pa
    import pyarrow.ipc as ipc

    from explorer_spark.sources import read_ipc_distributed

    real = tmp_path / "real"
    real.mkdir()
    for i in range(2):
        t = pa.table({"a": [i * 10 + j for j in range(3)]})
        with pa.OSFile(str(real / f"f{i}.arrow"), "wb") as sink, ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
    link = tmp_path / "link"
    os.symlink(real, link)
    got = read_ipc_distributed(str(link / "f*.arrow"), spark=spark)
    assert [r["a"] for r in got.to_rows()] == [0, 1, 2, 10, 11, 12]


def test_dump_load_binary_family(spark):
    """In-memory parquet/IPC dumps round-trip (reference dump_*/load_*)."""
    import explorer_spark as ex
    from explorer_spark import sources as src

    df = ex.from_columns({"a": [1, 2, 3], "s": ["x", "y", "z"]}, spark=spark)
    assert src.load_parquet(src.dump_parquet(df), spark=spark).to_rows() == df.to_rows()
    assert src.load_ipc(src.dump_ipc(df), spark=spark).to_rows() == df.to_rows()
    assert src.load_ipc(src.dump_ipc_stream(df), spark=spark).to_rows() == df.to_rows()
    assert len(src.dump_ipc_schema(df)) > 0
    assert len(src.dump_ipc_record_batch(df)) > 0
    assert df.estimated_size() > 0
    popped, rest = df.pop("a")
    assert popped.name == "a" and rest.names == ["s"]  # pop yields a Series


def test_from_query_sqlite_conn(spark, tmp_path):
    """from_query over a DB-API connection with ? placeholders
    (reference from_query/4, SQLite style)."""
    import sqlite3

    db = tmp_path / "t.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (id INTEGER, name TEXT, score REAL)")
    conn.executemany("INSERT INTO t VALUES (?, ?, ?)", [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)])
    conn.commit()
    got = ex.from_query(conn, "SELECT id, name FROM t WHERE score > ? ORDER BY id", [2.0], spark=spark)
    assert got.names == ["id", "name"]
    assert got.to_rows() == [{"id": 2, "name": "b"}, {"id": 3, "name": "c"}]
    conn.close()


def test_from_query_duckdb_arrow(spark):
    """duckdb connections take the Arrow fast path (fetch_arrow_table)."""
    import duckdb

    conn = duckdb.connect()
    got = ex.from_query(conn, "SELECT i AS id, i * 2 AS dbl FROM range(5) r(i) WHERE i >= ?", [2], spark=spark)
    assert sorted((r["id"], r["dbl"]) for r in got.to_rows()) == [(2, 4), (3, 6), (4, 8)]
    conn.close()


def test_from_query_url(spark, tmp_path):
    """sqlite:// URL form opens (and closes) a driver-side connection."""
    import sqlite3

    db = tmp_path / "u.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE kv (k TEXT, v INTEGER)")
    conn.executemany("INSERT INTO kv VALUES (?, ?)", [("x", 1), ("y", 2)])
    conn.commit()
    conn.close()
    got = ex.from_query(f"sqlite:///{db}", "SELECT k, v FROM kv ORDER BY k", spark=spark)
    assert got.to_rows() == [{"k": "x", "v": 1}, {"k": "y", "v": 2}]


def test_nullable_long_roundtrip_stays_long(spark):
    """dump/load round trips must not launder nullable int64 through
    pandas float64 (precision loss past 2^53; dtype flip s64 -> f64)."""
    import explorer_spark as ex
    from explorer_spark.sources import (
        dump_ipc,
        dump_parquet,
        load_ipc,
        load_parquet,
        read_ipc,
        write_ipc,
    )

    big = 9007199254740993  # 2^53 + 1: not representable as float64
    from explorer_spark.sources import from_rows

    # NB from_columns would already launder this at construction
    # (pd.DataFrame of ints+None is float64); from_rows infers LongType
    df = from_rows([{"v": 1}, {"v": None}, {"v": big}], spark=spark)
    for dump, load in ((dump_parquet, load_parquet), (dump_ipc, load_ipc)):
        back = load(dump(df), spark=spark)
        assert back.dtypes["v"] == ("s", 64), (dump.__name__, back.dtypes)
        assert back.to_columns()["v"] == [1, None, big]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/x.arrow"
        write_ipc(df, p)
        back = read_ipc(p, spark=spark)
        assert back.dtypes["v"] == ("s", 64)
        assert back.to_columns()["v"] == [1, None, big]


def test_read_ipc_distributed_order_follows_sorted_files(spark, tmp_path):
    """Row order must follow SORTED FILE order even when a later file is
    much larger (binaryFile packs partitions by size descending)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from explorer_spark.sources import read_ipc_distributed

    # a.arrow tiny, b.arrow much larger -> size-ordered partitions would
    # put b first without the per-file order column
    t_a = pa.table({"x": pa.array([1, 2], type=pa.int64())})
    t_b = pa.table({"x": pa.array(list(range(100, 5100)), type=pa.int64())})
    for name, t in (("a.arrow", t_a), ("b.arrow", t_b)):
        with pa.OSFile(str(tmp_path / name), "wb") as sink, ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
    got = read_ipc_distributed(str(tmp_path / "*.arrow"), spark=spark)
    head = got.head(3).to_columns()["x"]
    assert head == [1, 2, 100], head
    assert got.n_rows() == 5002


def test_from_query_adbc_shaped_connection(spark):
    """ADBC dbapi connections (adbc_driver_manager.dbapi.connect) have no
    connection-level execute: from_query must take the strict-DB-API
    branch (cursor() -> execute) and then the Arrow branch
    (fetch_arrow_table) — the reference's ADBC Arrow-stream ingestion
    shape (polars_backend/data_frame.ex:23-32). The driver package is
    not installable in this container, so this pins the contract with an
    ADBC-shaped fake returning a real Arrow table."""
    import pyarrow as pa

    from explorer_spark.sources import from_query

    class FakeAdbcCursor:
        def execute(self, operation, parameters=None):
            assert operation == "SELECT 1"
            assert parameters in (None, [], ())

        def fetch_arrow_table(self):
            return pa.table({"a": pa.array([1, 2, None], type=pa.int64()),
                             "b": pa.array(["x", "y", "z"])})

    class FakeAdbcConnection:
        # no .execute attribute, exactly like adbc dbapi connections
        def cursor(self):
            return FakeAdbcCursor()

    df = from_query(FakeAdbcConnection(), "SELECT 1", spark=spark)
    assert df.dtypes == {"a": ("s", 64), "b": "string"}
    assert df.to_columns() == {"a": [1, 2, None], "b": ["x", "y", "z"]}


def test_from_query_jdbc_e2e_duckdb(spark):
    """END-TO-END jdbc: path (reference from_query's scale route,
    previously untestable — VERDICT r6 #10): Spark's distributed JDBC
    reader against the public org.duckdb:duckdb_jdbc driver, found in
    the local artifact cache and attached with ADD JAR (DriverRegistry
    resolves added-jar classes via the context classloader — same
    mechanism as the mock-S3 FileSystem test). The query reads parquet
    THROUGH DuckDB so no DuckDB storage-format coupling exists, and the
    partitionColumn path proves each executor task opens its own
    connection (3 JDBC partitions)."""
    import glob
    import os

    import pytest as _pytest

    from explorer_spark.sources import from_query

    jars = sorted(
        glob.glob(os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"), recursive=True)
    ) or sorted(glob.glob(os.path.expanduser("~/.m2/**/duckdb_jdbc*.jar"), recursive=True))
    if not jars:
        _pytest.skip("no JDBC driver jar available offline")
    spark.sql(f"ADD JAR '{jars[0]}'")
    q = "SELECT r_regionkey, r_name FROM read_parquet('/root/testdata/sf0.001/region.parquet')"
    want = [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST")]

    df = from_query("jdbc:duckdb:", q, driver="org.duckdb.DuckDBDriver")
    assert sorted((r["r_regionkey"], r["r_name"]) for r in df.to_rows()) == want

    df2 = from_query(
        "jdbc:duckdb:",
        q,
        driver="org.duckdb.DuckDBDriver",
        partitionColumn="r_regionkey",
        lowerBound="0",
        upperBound="4",
        numPartitions="3",
    )
    assert sorted((r["r_regionkey"], r["r_name"]) for r in df2.to_rows()) == want
    assert df2.lazy_sdf().rdd.getNumPartitions() == 3


def test_csv_reference_option_corners(spark, tmp_path):
    """Round-8 sweep of reference data_frame/csv_test.exs options:
    quote_delimiter (custom char + nil = quoting disabled),
    skip_rows_after_header (alone and combined with skip_rows),
    temporal inference OPT-IN via parse_dates (strings by default),
    and integer entries in ``columns`` selecting by position."""
    import datetime as dtm

    import explorer_spark as ex

    def w(s, n):
        p = tmp_path / n
        p.write_text(s)
        return str(p)

    p = w("city,lat\n'Elgin, Scotland, the UK',57.6\n", "q.csv")
    assert ex.read_csv(p, quote_delimiter="'", spark=spark).to_columns()["city"] == [
        "Elgin, Scotland, the UK"
    ]
    p = w('c;n\nElgin, UK;"Little Ireland"\nStoke, UK;nil\n', "nq.csv")
    cols = ex.read_csv(
        p, quote_delimiter=None, delimiter=";", nil_values=["nil"], spark=spark
    ).to_columns()
    assert cols["n"] == ['"Little Ireland"', None]

    p = w("a,b\nc,d\ne,f\ng,h\n", "sk.csv")
    assert ex.read_csv(p, skip_rows_after_header=1, spark=spark).to_columns() == {
        "a": ["e", "g"],
        "b": ["f", "h"],
    }
    assert ex.read_csv(p, skip_rows=1, skip_rows_after_header=1, spark=spark).to_columns() == {
        "c": ["g"],
        "d": ["h"],
    }

    p = w("column\n2022-12-01\n", "d.csv")
    assert ex.read_csv(p, spark=spark).dtypes["column"] == "string"
    assert ex.read_csv(p, parse_dates=True, spark=spark).dtypes["column"] == "date"
    assert ex.read_csv(p, dtypes={"column": "date"}, spark=spark).to_columns()["column"] == [
        dtm.date(2022, 12, 1)
    ]
    p = w("column\n2022-10-01T11:34:10.123456\n", "ts.csv")
    assert ex.read_csv(p, spark=spark).dtypes["column"] == "string"
    assert ex.read_csv(p, parse_dates=True, spark=spark).dtypes["column"] == (
        "naive_datetime",
        "us",
    )

    p = w("a,b,c\n1,2,3\n", "cols.csv")
    assert ex.read_csv(p, columns=[0, 2], spark=spark).names == ["a", "c"]


def test_parquet_columns_by_position(spark, tmp_path):
    """Integer entries in read_parquet's columns select by position
    (reference parquet_test.exs 'columns - integer 0 indexed')."""
    import explorer_spark as ex

    p = str(tmp_path / "t.parquet")
    ex.write_parquet(ex.from_columns({"a": [1], "b": [2], "c": [3]}, spark=spark), p)
    assert ex.read_parquet(p, columns=[0, 2], spark=spark).names == ["a", "c"]
    assert ex.read_parquet(p, columns=["b"], spark=spark).names == ["b"]
