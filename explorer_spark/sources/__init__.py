"""Scans and sinks (reference: SURVEY.md §2.1).

Parquet/CSV/NDJSON map straight onto Spark's native readers/writers (with
predicate pushdown, column pruning, and partition pruning from Catalyst for
free). Arrow IPC has no native Spark source — single driver-sized files go
through PyArrow + ``createDataFrame`` (``read_ipc``); many-file datasets
decode executor-side via binaryFile + ``mapInArrow``
(``read_ipc_distributed``), written via ``toPandas``→PyArrow.

Every scan assigns the hidden row-order column at the edge (a
``monotonically_increasing_id``, which is monotone in file/row-group
order) so the frame has Explorer's ordered-row semantics from birth.
"""

from __future__ import annotations

import io as _io
import os

from pyspark.sql import SparkSession, functions as F

from ..frame import ORDER_COL, DataFrame
from ..session import get_spark

__all__ = [
    "read_parquet",
    "read_csv",
    "read_ndjson",
    "read_ipc",
    "read_ipc_distributed",
    "write_parquet",
    "write_csv",
    "write_ndjson",
    "write_ipc",
    "from_pandas",
    "from_rows",
    "from_columns",
    "from_query",
    "load_table",
]


def _fss_resolve(path: str, spark, config, for_write: bool = False) -> str:
    """s3:// URLs parse through the fss spec (reference fss.ex:30-140)
    and come back as configured s3a:// paths; http(s):// entries
    download driver-side to a temp file that feeds the local reader
    (reference FSS.download, data_frame.ex:905-911 — read-only);
    everything else passes through."""
    if isinstance(path, str):
        if path.startswith("s3://"):
            from . import fss

            return fss.resolve_path(path, spark, config)
        if path.startswith(("http://", "https://")):
            from . import fss

            if for_write:
                raise ValueError(
                    "cannot write to an http(s):// destination; the "
                    "reference's HTTP entries are read-only"
                )
            return fss.download_http(path, config)
    return path


def _arrow_ingest(spark, table) -> "DataFrame":
    """Arrow table -> frame WITHOUT a pandas round-trip: to_pandas()
    turns nullable int64 into float64 (null -> NaN) and silently rounds
    integers past 2^53 — createDataFrame accepts pa.Table directly in
    Spark 4. pandas stays as the fallback for types the Arrow ingest
    path rejects."""
    try:
        sdf = spark.createDataFrame(table)
    except Exception:
        sdf = spark.createDataFrame(table.to_pandas())
    return _attach_order(sdf)


def _attach_order(sdf) -> DataFrame:
    # a fresh mono-id IS the physical layout, so the frame starts
    # aligned (same contract as DataFrame._ordered) — order-dependent
    # kernels (explode, row_index) skip their re-alignment shuffle on
    # freshly-scanned frames
    return DataFrame(
        sdf.withColumn(ORDER_COL, F.monotonically_increasing_id()),
        has_order=True,
        aligned=True,
    )


def read_parquet(
    path: str,
    columns=None,
    max_rows: int | None = None,
    spark: SparkSession | None = None,
    config=None,
) -> DataFrame:
    """Parquet scan (reference from_parquet/2 options: ``columns``
    projection, ``max_rows`` prefix limit; ``rechunk`` is a Polars
    memory-layout knob with no Spark analogue)."""
    spark = spark or get_spark()
    path = _fss_resolve(path, spark, config)
    nanos_cols = _nanos_timestamp_cols(path) if "://" not in path else []
    if nanos_cols:
        # defensively enable on the CALLER's session too (the driver hands
        # us its own SparkSession): without it, TIMESTAMP(NANOS) parquet
        # throws PARQUET_TYPE_ILLEGAL at scan time
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sdf = spark.read.parquet(path)
    for name in nanos_cols:
        if name in sdf.columns:
            # stored as int64 nanos; truncate to µs like the reference's
            # ns handling (SURVEY §1.2). Integer `div`, NOT `/`: epoch-ns
            # exceeds 2^53 and double division rounds the µs digits.
            # timestampadd on an NTZ epoch keeps the conversion free of
            # the session timezone (the driver's session may not be UTC).
            sdf = sdf.withColumn(
                name,
                F.expr(f"timestampadd(MICROSECOND, `{name}` div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
            )
    if columns:
        # integer entries select by POSITION (reference parquet_test.exs
        # 'columns - integer 0 indexed')
        names = sdf.columns
        sdf = sdf.select(*[names[c] if isinstance(c, int) else c for c in columns])
    if max_rows is not None:
        # prefix limit (Catalyst CollectLimit/GlobalLimit — pushed to the
        # scan, no full read)
        sdf = sdf.limit(int(max_rows))
    return _attach_order(sdf)


_NANOS_CACHE: dict[str, list[str]] = {}


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names with parquet TIMESTAMP(NANOS) logical type (cached —
    the footer probe costs ~10ms per query otherwise)."""
    if path in _NANOS_CACHE:
        return _NANOS_CACHE[path]
    import pyarrow.dataset as ds
    import pyarrow as pa

    try:
        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return []
    out = []
    for field in schema:
        if isinstance(field.type, pa.TimestampType) and field.type.unit == "ns":
            out.append(field.name)
    _NANOS_CACHE[path] = out
    return out


_NO_QUOTE = "\u0000"  # Spark: a NUL quote char effectively disables quoting


def read_csv(
    path: str,
    delimiter: str = ",",
    header: bool = True,
    nil_values: list[str] | None = None,
    skip_rows: int = 0,
    skip_rows_after_header: int = 0,
    max_rows: int | None = None,
    columns=None,
    dtypes: dict | None = None,
    infer_schema_length: int | None = 1000,
    parse_dates: bool = False,
    encoding: str = "utf-8",
    quote_char: str = '"',
    quote_delimiter=...,
    eol_delimiter: str | None = None,
    spark: SparkSession | None = None,
    config=None,
) -> DataFrame:
    """CSV scan with the reference's option surface
    (reference data_frame.ex:607-868). ``quote_delimiter`` is the
    reference's name for the quote char; ``None`` disables quoting
    entirely (quotes read as literal text, csv_test.exs 'no quote
    char'). Date/datetime INFERENCE is opt-in via ``parse_dates``
    (csv_test.exs 'do not parse datetime (default)'); explicit
    ``dtypes`` always parse."""
    spark = spark or get_spark()
    path = _fss_resolve(path, spark, config)
    if quote_delimiter is not ...:
        quote_char = _NO_QUOTE if quote_delimiter is None else quote_delimiter
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("quote", quote_char)
        # standard-CSV doubled quotes ("") like the reference's parser,
        # not Spark's backslash default
        .option("escape", quote_char)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if nil_values:
        # Spark's CSV reader takes ONE nullValue; extra values are nulled
        # column-wise after the scan (see below)
        reader = reader.option("nullValue", nil_values[0])
    if eol_delimiter:
        reader = reader.option("lineSep", eol_delimiter)
    if dtypes:
        from .. import dtypes as dt
        from pyspark.sql import types as T

        fields = [T.StructField(name, dt.to_spark(d)) for name, d in dtypes.items()]
        reader = reader.schema(T.StructType(fields))
    elif infer_schema_length:
        reader = reader.option("inferSchema", "true").option("samplingRatio", 1.0)
        if not parse_dates:
            # the reference infers date/datetime only with parse_dates
            # (strings otherwise); Spark's CSV inference would parse
            # them by default — turn both off with preferDate=false and
            # never-matching timestamp patterns
            reader = (
                reader.option("preferDate", "false")
                .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss'__never__'")
                .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss'__never__'")
            )
    if parse_dates:
        reader = reader.option("inferSchema", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
    if skip_rows or skip_rows_after_header:
        # reference skip_rows drops the first N physical lines BEFORE the
        # header (data_frame.ex:607-868). Spark's CSV reader has no such
        # option; zipWithIndex preserves file line order, and the reader
        # accepts an RDD of lines. textFile decodes UTF-8 and splits \n
        # ONLY — combining skip_rows with another encoding/eol would
        # silently produce mojibake, so refuse loudly.
        if (encoding or "utf-8").lower().replace("-", "") not in ("utf8", "utf_8") or eol_delimiter:
            raise ValueError(
                "skip_rows currently supports only UTF-8 input with \n line "
                "endings (Spark's textFile constraint)"
            )
        # skip_rows drops the first N physical lines; with a header the
        # NEXT line is the header, then skip_rows_after_header more data
        # lines drop (reference test 'skip_rows with skip_rows_after_
        # header'). Without a header both windows merge.
        lo = skip_rows + (1 if header else 0)
        hi = lo + skip_rows_after_header
        keep = lambda i: i >= skip_rows and not (lo <= i < hi)  # noqa: E731
        lines = (
            spark.sparkContext.textFile(path)
            .zipWithIndex()
            .filter(lambda t: keep(t[1]))
            .map(lambda t: t[0])
        )
        sdf = reader.csv(lines)
    else:
        sdf = reader.csv(path)
    if not dtypes and (infer_schema_length or parse_dates):
        # the reference infers CSV integers as s64 (polars i64 default);
        # Spark's inference picks the narrowest int type — widen so a
        # from_csv frame's dtype surface matches the reference's
        from pyspark.sql import types as T

        narrow = {
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType))
        }
        if narrow:
            sdf = sdf.withColumns({n: F.col(n).cast("long") for n in narrow})
    if nil_values and len(nil_values) > 1:
        from pyspark.sql import types as T

        extra = list(nil_values)
        sdf = sdf.withColumns(
            {
                f.name: F.when(F.col(f.name).isin(extra), None).otherwise(F.col(f.name))
                for f in sdf.schema.fields
                if isinstance(f.dataType, T.StringType)
            }
        )
    if columns:
        # integer entries are POSITIONS (reference 'columns - integer')
        names = sdf.columns
        sdf = sdf.select(*[names[c] if isinstance(c, int) else c for c in columns])
    df = _attach_order(sdf)
    if max_rows is not None:
        df = df.head(max_rows)
    return df


def read_ndjson(
    path: str, infer_schema_length: int | None = None, spark: SparkSession | None = None, config=None
) -> DataFrame:
    """Newline-delimited JSON — Spark's default JSON framing
    (reference data_frame.ex:1572-1740)."""
    spark = spark or get_spark()
    path = _fss_resolve(path, spark, config)
    if infer_schema_length:
        # bound inference cost: infer from the first n lines only, then
        # scan the full file with the pinned schema (the option was
        # silently ignored before)
        head = spark.read.text(path).limit(int(infer_schema_length))
        schema = spark.read.json(head.rdd.map(lambda r: r.value)).schema
        return _attach_order(spark.read.schema(schema).json(path))
    return _attach_order(spark.read.json(path))


def read_ipc_distributed(
    path: str, columns=None, spark: SparkSession | None = None
) -> DataFrame:
    """Distributed Arrow IPC read: no native Spark IPC source exists, so
    files load as binary blobs (``binaryFile`` source — parallel across
    files, never through the driver) and each executor decodes its files
    with PyArrow inside ``mapInArrow`` — zero-copy from IPC buffers to
    Spark's Arrow batches. Column pruning happens at decode. The output
    schema comes from one driver-side footer probe of the first file.

    Use for IPC datasets laid out as many files (the scale path);
    :func:`read_ipc` stays for single driver-sized files."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.ipc as ipc

    spark = spark or get_spark()
    matches = sorted(_glob.glob(path)) if any(ch in path for ch in "*?[") else [path]
    if not matches:
        raise FileNotFoundError(path)
    # schema probe accepts BOTH formats, like the executor decode below
    try:
        with pa.memory_map(matches[0]) as src:
            schema = ipc.open_file(src).schema
    except pa.lib.ArrowInvalid:
        with open(matches[0], "rb") as fh:
            schema = ipc.open_stream(fh).schema
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    cols = list(columns) if columns else None

    # binaryFile packs partitions by SIZE DESCENDING, so partition order
    # (and a monotonically_increasing_id) would follow file size, not the
    # sorted file order the row contract promises. The order column is
    # instead derived per row: (sorted-file index, row-within-file).
    def _norm(p_):
        return p_[5:] if p_.startswith("file:") else p_

    path_idx = {os.path.abspath(m): i for i, m in enumerate(matches)}
    # basename fallback (only where unambiguous) absorbs scheme/symlink
    # normalization differences between glob and the binaryFile source
    _base_counts: dict = {}
    for m in matches:
        _base_counts[os.path.basename(m)] = _base_counts.get(os.path.basename(m), 0) + 1
    for i, m in enumerate(matches):
        b = os.path.basename(m)
        if _base_counts[b] == 1:
            path_idx.setdefault(b, i)

    def _lookup_fidx(raw_path: str) -> int:
        """Map a binaryFile row's path back to its sorted-file index.
        FAILS LOUDLY on a miss: a silent default of 0 would collapse
        several files onto one ORDER_COL keyspace and scramble the
        promised sorted-file row order."""
        from urllib.parse import unquote, urlparse

        p = _norm(raw_path)
        for cand in (
            p,
            os.path.abspath(p),
            unquote(p),
            os.path.abspath(unquote(p)),
            os.path.abspath(unquote(urlparse(raw_path).path)),
            os.path.basename(unquote(p)),
        ):
            got = path_idx.get(cand)
            if got is not None:
                return got
        raise ValueError(
            f"read_ipc_distributed: cannot map binaryFile path {raw_path!r} "
            f"back to an input file index ({len(matches)} input files); "
            "refusing to guess — row order would silently scramble"
        )
    out_arrow_schema = schema.append(pa.field("__fidx__", pa.int64())).append(
        pa.field("__rpos__", pa.int64())
    )

    def decode(batches):
        import io

        import numpy as np

        for batch in batches:  # binaryFile rows: (path, ..., content)
            tbl = pa.Table.from_batches([batch])
            for row in range(tbl.num_rows):
                blob = tbl.column("content")[row].as_py()
                fidx = _lookup_fidx(tbl.column("path")[row].as_py())
                try:
                    sub = ipc.open_file(io.BytesIO(blob)).read_all()
                except pa.lib.ArrowInvalid:
                    sub = ipc.open_stream(io.BytesIO(blob)).read_all()
                if cols:
                    sub = sub.select(cols)
                pos = 0
                for b in sub.to_batches():
                    n = b.num_rows
                    arrs = list(b.columns) + [
                        pa.array(np.full(n, fidx, dtype="int64")),
                        pa.array(np.arange(pos, pos + n, dtype="int64")),
                    ]
                    pos += n
                    yield pa.RecordBatch.from_arrays(arrs, schema=out_arrow_schema)

    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import from_arrow_schema

    spark_schema = from_arrow_schema(schema)
    out_schema = T.StructType(
        list(spark_schema.fields)
        + [T.StructField("__fidx__", T.LongType()), T.StructField("__rpos__", T.LongType())]
    )
    blobs = spark.read.format("binaryFile").load(matches)
    sdf = blobs.mapInArrow(decode, out_schema)
    order = (F.col("__fidx__") * F.lit(1 << 40) + F.col("__rpos__")).alias(ORDER_COL)
    sdf = sdf.select(*spark_schema.names, order)
    return DataFrame(sdf, has_order=True)


def read_ipc(
    path: str, columns=None, max_rows: int | None = None, spark: SparkSession | None = None,
    config=None,
) -> DataFrame:
    """Arrow IPC file/stream via PyArrow (no native Spark source).
    Options mirror reference from_ipc/2: ``columns`` projection and
    ``max_rows`` prefix limit. http(s):// entries download driver-side
    like the reference's :http IPC route (polars_backend/
    data_frame.ex:394)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    spark = spark or get_spark()
    path = _fss_resolve(path, spark, config)
    try:
        with pa.memory_map(path) as source:
            table = ipc.open_file(source).read_all()
    except pa.lib.ArrowInvalid:
        with open(path, "rb") as f:
            table = ipc.open_stream(f).read_all()
    if columns:
        table = table.select(columns)
    if max_rows is not None:
        table = table.slice(0, int(max_rows))
    return _arrow_ingest(spark, table)


def write_parquet(
    df: DataFrame,
    path: str,
    compression="snappy",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    config=None,
) -> str:
    """Parquet sink. ``partition_by`` hive-partitions the layout by the
    given columns — the 100 TB knob: readers then get partition PRUNING
    (directory-level skip, visible as PartitionFilters in the scan plan)
    for free on any filter over those columns.

    ``compression`` accepts the reference's codec-or-(codec, level)
    forms. The zstd level maps to parquet-mr's
    ``parquet.compression.codec.zstd.level``; gzip/brotli levels have no
    JVM-writer knob and are ignored here (dump_parquet honors them)."""
    path = _fss_resolve(path, df.lazy_sdf().sparkSession, config, for_write=True)
    codec, level = _parquet_compression(compression)
    w = df.lazy_sdf().write.mode(mode)
    if level is not None and codec == "zstd":
        w = w.option("parquet.compression.codec.zstd.level", str(level))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path, compression=codec)
    return path


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "overwrite",
    quote_style: str = "necessary",
    config=None,
) -> str:
    """CSV sink with the reference's quote styles (data_frame.ex:684-747):
    ``necessary`` (default), ``always``, ``non_numeric``, ``never``.
    ``non_numeric`` pre-renders quoted strings engine-side (Spark has no
    such writer mode); its header row is written unquoted, unlike the
    reference's csv crate."""
    from pyspark.sql import types as T

    sdf = df.lazy_sdf()
    path = _fss_resolve(path, sdf.sparkSession, config, for_write=True)
    if quote_style == "necessary":
        sdf.write.mode(mode).option("header", header).option("sep", delimiter).option(
            "escape", '"'
        ).csv(path)
    elif quote_style == "always":
        sdf.write.mode(mode).option("header", header).option("sep", delimiter).option(
            "escape", '"'
        ).option("quoteAll", True).csv(path)
    elif quote_style in ("never", "non_numeric"):
        # Spark's writer can't express these (its "disabled quote" mode
        # still wraps separator-containing fields in \x00), so render each
        # row ourselves and use the text sink. Headers go into every part
        # file — the same convention as Spark's own CSV writer.
        fields = []
        for fld in sdf.schema.fields:
            c = F.col(fld.name).cast("string")
            if quote_style == "non_numeric" and not isinstance(fld.dataType, T.NumericType):
                c = F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))
            fields.append(F.coalesce(c, F.lit("")))
        lines = sdf.select(F.concat_ws(delimiter, *fields).alias("value"))
        if header:
            hdr = delimiter.join(f.name for f in sdf.schema.fields)

            def _inject(batches):
                import pandas as pd

                yield pd.DataFrame({"value": [hdr]})
                for b in batches:
                    yield b

            lines = lines.mapInPandas(_inject, "value string")
        lines.write.mode(mode).text(path)
    else:
        raise ValueError(f"unknown quote_style: {quote_style!r}")
    return path


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite", config=None) -> str:
    sdf = df.lazy_sdf()
    path = _fss_resolve(path, sdf.sparkSession, config, for_write=True)
    sdf.write.mode(mode).json(path)
    return path


def write_ipc(df: DataFrame, path: str) -> str:
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = _to_arrow(df)
    with pa.OSFile(path, "wb") as sink, ipc.new_file(sink, table.schema) as writer:
        writer.write_table(table)
    return path


def from_pandas(pdf, spark: SparkSession | None = None) -> DataFrame:
    spark = spark or get_spark()
    return _attach_order(spark.createDataFrame(pdf))


def from_rows(rows: list[dict], spark: SparkSession | None = None) -> DataFrame:
    spark = spark or get_spark()
    if not rows:
        from pyspark.sql import types as T

        return _attach_order(spark.createDataFrame([], T.StructType([])))
    return _attach_order(spark.createDataFrame(rows))


def from_columns(columns: dict, spark: SparkSession | None = None) -> DataFrame:
    """Column dict -> frame. Flat columns ingest through Arrow so the
    reference's value semantics survive: [1, None] stays int64+null (a
    pandas round-trip launders it to float64) and float NaN stays a
    VALUE distinct from null (pandas turns NaN into null). Nested
    columns and mixed-type columns Arrow rejects fall back to pandas
    (nested Arrow ingest also hits the segfault noted in from_list)."""
    import pandas as pd

    spark = spark or get_spark()
    # materialize one-shot iterables ONCE up front: the Arrow attempt
    # below may drain a generator and then fall back to pandas, which
    # would silently see the exhausted iterator
    columns = {k: (v if isinstance(v, list) else list(v)) for k, v in columns.items()}
    if not columns:
        # 0x0 frame (reference DataFrame.new([]) — put/3 then grows it)
        from pyspark.sql import types as T

        return _attach_order(spark.createDataFrame([], T.StructType([])))
    _validate_column_kinds(columns)
    try:
        import pyarrow as pa

        arrays = {}
        for name, vals in columns.items():
            arr = pa.array(vals)
            if pa.types.is_nested(arr.type):
                raise ValueError("nested: pandas path")
            arrays[name] = arr
        return _arrow_ingest(spark, pa.table(arrays))
    except Exception:
        pass
    return from_pandas(pd.DataFrame(columns), spark=spark)


def _validate_column_kinds(columns: dict) -> None:
    """Reject value-kind mixes the reference's from_list inference
    rejects (data_frame.ex:1888: [1, "wrong"] raises) — the pandas
    fallback below would otherwise silently coerce to object/strings.
    int/float mixing promotes like the reference; bools are NOT ints."""
    import datetime as _dtm

    def kind(v):
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "numeric"
        if isinstance(v, float):
            return "numeric"
        if isinstance(v, str):
            return "string"
        if isinstance(v, _dtm.datetime):
            return "datetime"
        if isinstance(v, _dtm.date):
            return "date"
        if isinstance(v, _dtm.time):
            return "time"
        if isinstance(v, _dtm.timedelta):
            return "duration"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        return None  # nested / exotic — let the ingest paths decide

    for name, vals in columns.items():
        first = None
        for v in vals:
            if v is None:
                continue
            k = kind(v)
            if k is None:
                break
            if first is None:
                first = k
            elif k != first:
                raise ValueError(
                    f'cannot create series "{name}": the value {v!r} does not '
                    f"match the inferred kind {first}"
                )


def _dbapi_schema(pdf):
    """Spark schema for a DB-API result frame: first non-null value per
    column decides the type; columns with no values fall back to string."""
    import datetime

    from pyspark.sql import types as T

    py_to_spark = [
        (bool, T.BooleanType()),
        (int, T.LongType()),
        (float, T.DoubleType()),
        (bytes, T.BinaryType()),
        (datetime.datetime, T.TimestampType()),
        (datetime.date, T.DateType()),
    ]
    fields = []
    for name in pdf.columns:
        dtype = T.StringType()
        for v in pdf[name]:
            if v is None or v != v:
                continue
            for py, st in py_to_spark:
                if isinstance(v, py):
                    dtype = st
                    break
            break
        fields.append(T.StructField(str(name), dtype))
    return T.StructType(fields)


def from_query(
    conn,
    query: str,
    params: list | None = None,
    spark: SparkSession | None = None,
    **jdbc_options,
) -> DataFrame:
    """SQL against an external database (reference from_query/4,
    lib/explorer/data_frame.ex:489-502; backend/data_frame.ex:43-47 —
    ADBC connection -> Arrow stream -> DataFrame).

    ``conn`` is one of:

    - a **DB-API 2.0 connection** (``sqlite3``, ``duckdb``, ``psycopg``,
      ...): the parameterized query runs through the connection with the
      driver's own placeholder style (``?`` for SQLite, ``$1`` for
      Postgres — exactly the reference's contract), results arrive as an
      Arrow table when the driver exposes one (duckdb) or via the DB-API
      cursor otherwise, then land in a Spark DataFrame driver-side. This
      is the ADBC shape: an external-DB read is bounded by the DB's
      egress, not by Spark — fine for dimension/metadata pulls.
    - a ``sqlite:///path`` or ``duckdb:///path`` **URL**: a driver-side
      connection is opened (and closed) for the call.
    - a ``jdbc:...`` **URL**: routes to Spark's distributed JDBC reader;
      pass ``partitionColumn``/``lowerBound``/``upperBound``/
      ``numPartitions`` via ``jdbc_options`` to parallelize the read
      across executors — the scale path for big external tables (needs
      the driver jar on the classpath).
    """
    spark = spark or get_spark()
    if params is not None and not isinstance(params, (list, tuple)):
        # catches e.g. a SparkSession passed positionally where the old
        # signature had `spark` third — fail loudly, not inside the driver
        raise TypeError(f"params must be a list/tuple of bind values, got {type(params).__name__}")
    if isinstance(conn, str) and conn.startswith("jdbc:"):
        if params:
            raise ValueError(
                "the jdbc: path does not support bind params — interpolate "
                "them into the query or use a DB-API connection"
            )
        reader = spark.read.format("jdbc").option("url", conn)
        if "partitionColumn" in jdbc_options:
            # Spark rejects 'query' + partitionColumn together: the
            # parallel path needs the query wrapped as a dbtable subquery
            reader = reader.option("dbtable", f"({query}) __fq_sub")
        else:
            reader = reader.option("query", query)
        for k, v in jdbc_options.items():
            reader = reader.option(k, v)
        return _attach_order(reader.load())
    if jdbc_options:
        raise ValueError("jdbc_options only apply to jdbc: URLs")

    close_after = False
    if isinstance(conn, str):
        # scheme:///abs/path keeps the leading slash; scheme:// -> :memory:
        if conn.startswith("sqlite://"):
            import sqlite3

            conn = sqlite3.connect(conn[len("sqlite://") :] or ":memory:")
        elif conn.startswith("duckdb://"):
            import duckdb

            conn = duckdb.connect(conn[len("duckdb://") :] or ":memory:")
        else:
            raise ValueError(f"unsupported DB url {conn!r} (sqlite://, duckdb://, jdbc:)")
        close_after = True
    try:
        if hasattr(conn, "execute"):  # sqlite3/duckdb shortcut
            cur = conn.execute(query, params or [])
        else:  # strict DB-API 2.0 (psycopg2, MySQLdb): cursor first
            cur = conn.cursor()
            cur.execute(query, params or [])
        if hasattr(cur, "fetch_arrow_table"):  # duckdb / ADBC-style cursors
            table = cur.fetch_arrow_table()
            return _arrow_ingest(spark, table)
        else:  # generic DB-API: names from cursor.description
            names = [d[0] for d in cur.description]
            rows = cur.fetchall()
            import pandas as pd

            pdf = pd.DataFrame(rows, columns=names)
            try:
                sdf = spark.createDataFrame(pdf)
            except (ValueError, TypeError):
                # empty result set or all-null columns: DB-API gives no
                # type info (unlike Arrow-capable drivers), so infer each
                # column from its first non-null value, string otherwise
                sdf = spark.createDataFrame(pdf, schema=_dbapi_schema(pdf))
        return _attach_order(sdf)
    finally:
        if close_after:
            conn.close()


def read_ipc_stream(
    path: str, columns=None, spark: SparkSession | None = None, config=None
) -> DataFrame:
    """Arrow IPC streaming format (reference from_ipc_stream); http(s)://
    entries download driver-side (polars_backend/data_frame.ex:483)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    spark = spark or get_spark()
    path = _fss_resolve(path, spark, config)
    with open(path, "rb") as fh:
        table = ipc.open_stream(fh).read_all()
    if columns:
        table = table.select(columns)
    return _arrow_ingest(spark, table)


def write_ipc_stream(df: DataFrame, path: str) -> str:
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = _to_arrow(df)
    with pa.OSFile(path, "wb") as sink, ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return path


def dump_csv(df: DataFrame, header: bool = True, delimiter: str = ",") -> str:
    """CSV as an in-memory string (reference dump_csv)."""
    return df.to_pandas().to_csv(index=False, header=header, sep=delimiter)


def dump_ndjson(df: DataFrame) -> str:
    return df.to_pandas().to_json(orient="records", lines=True)


_TMP_LOADS: list[str] = []


def _tmp_load_file(contents: str, suffix: str) -> str:
    """Spill an in-memory payload for a lazy Spark scan. The file must
    outlive the (lazy) plan, so deletion is deferred to interpreter exit
    rather than skipped entirely (the old delete=False leaked one file
    per call for the machine's lifetime)."""
    import atexit
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=suffix, delete=False) as fh:
        fh.write(contents)
        path = fh.name
    if not _TMP_LOADS:
        def _cleanup():
            for p_ in _TMP_LOADS:
                try:
                    os.unlink(p_)
                except OSError:
                    pass
        atexit.register(_cleanup)
    _TMP_LOADS.append(path)
    return path


def load_csv(contents: str, spark: SparkSession | None = None, **opts) -> DataFrame:
    """Parse CSV from an in-memory string (reference load_csv)."""
    return read_csv(_tmp_load_file(contents, ".csv"), spark=spark, **opts)


def load_ndjson(contents: str, spark: SparkSession | None = None) -> DataFrame:
    return read_ndjson(_tmp_load_file(contents, ".ndjson"), spark=spark)


# -- in-memory binary dumps/loads (reference dump_*/load_* family) ----------


def _to_arrow(df: DataFrame):
    import pyarrow as pa
    from pyspark.sql import types as T

    sdf = df.to_sdf()  # frame order enforced, ORDER_COL dropped

    def _nested(dt):
        if isinstance(dt, T.ArrayType):
            return isinstance(dt.elementType, (T.ArrayType, T.StructType, T.MapType))
        if isinstance(dt, T.StructType):
            return any(_nested(f.dataType) or isinstance(f.dataType, (T.ArrayType, T.MapType)) for f in dt.fields)
        return False

    if not any(_nested(f.dataType) for f in sdf.schema.fields):
        # direct Arrow collection: pandas would widen nullable int64 to
        # float64 and round integers past 2^53. Depth>=2 nested columns
        # keep the pandas path (the Arrow hand-off segfaults this
        # pyarrow/pyspark pairing on them — see to_columns).
        try:
            return sdf.toArrow()
        except Exception:
            pass
    return pa.Table.from_pandas(df.to_pandas(), preserve_index=False)


def _parquet_compression(compression) -> tuple[str, int | None]:
    """Normalize the reference's compression forms — ``"zstd"`` or a
    ``("zstd", 3)`` codec+level pair (to_parquet/dump_parquet options,
    reference parquet_test.exs:286-323)."""
    level = None
    if isinstance(compression, (tuple, list)):
        compression, level = compression
        level = int(level)
    codec = str(compression).lower()
    if codec in ("lz4raw", "lz4_raw"):
        codec = "lz4_raw"
    return codec, level


def dump_parquet(df: DataFrame, compression="snappy") -> bytes:
    """Parquet as in-memory bytes (reference dump_parquet). Accepts the
    full reference codec surface incl. levels — gzip/brotli/zstd levels
    apply exactly (pyarrow writer)."""
    import pyarrow.parquet as pq

    codec, level = _parquet_compression(compression)
    if codec == "lz4_raw":
        codec = "lz4"  # pyarrow's parquet LZ4 IS the raw-block codec
    elif codec == "uncompressed":
        codec = "none"
    buf = _io.BytesIO()
    pq.write_table(_to_arrow(df), buf, compression=codec, compression_level=level)
    return buf.getvalue()


def load_parquet(data: bytes, spark: SparkSession | None = None) -> DataFrame:
    import pyarrow.parquet as pq

    spark = spark or get_spark()
    return _arrow_ingest(spark, pq.read_table(_io.BytesIO(data)))


def dump_ipc(df: DataFrame) -> bytes:
    """Arrow IPC file format as bytes (reference dump_ipc)."""
    import pyarrow.ipc as ipc

    t = _to_arrow(df)
    buf = _io.BytesIO()
    with ipc.new_file(buf, t.schema) as w:
        w.write_table(t)
    return buf.getvalue()


def dump_ipc_stream(df: DataFrame) -> bytes:
    import pyarrow.ipc as ipc

    t = _to_arrow(df)
    buf = _io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    return buf.getvalue()


def dump_ipc_schema(df: DataFrame) -> bytes:
    """Serialized Arrow schema only (reference dump_ipc_schema)."""
    return _to_arrow(df).schema.serialize().to_pybytes()


def dump_ipc_record_batch(df: DataFrame) -> bytes:
    """The frame as one serialized Arrow record batch
    (reference dump_ipc_record_batch)."""
    t = _to_arrow(df).combine_chunks()
    batches = t.to_batches()
    return batches[0].serialize().to_pybytes() if batches else b""


def load_ipc(data: bytes, spark: SparkSession | None = None) -> DataFrame:
    import pyarrow as pa
    import pyarrow.ipc as ipc

    spark = spark or get_spark()
    try:
        t = ipc.open_file(_io.BytesIO(data)).read_all()
    except pa.lib.ArrowInvalid:
        t = ipc.open_stream(_io.BytesIO(data)).read_all()
    return _arrow_ingest(spark, t)


load_ipc_stream = load_ipc


# reference-style aliases (from_* readers / to_* writers)
from_csv = read_csv
from_parquet = read_parquet
from_ndjson = read_ndjson
from_ipc = read_ipc
from_ipc_stream = read_ipc_stream
to_csv = write_csv
to_parquet = write_parquet
to_ndjson = write_ndjson
to_ipc = write_ipc
to_ipc_stream = write_ipc_stream


_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(sf_dir: str, name: str, spark: SparkSession | None = None) -> DataFrame:
    """Convenience: one of the driver's testdata tables. The (immutable)
    scan DataFrame is cached per session so repeated queries skip file
    listing and schema probing."""
    spark = spark or get_spark()
    key = (id(spark), sf_dir, name)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = read_parquet(os.path.join(sf_dir, f"{name}.parquet"), spark=spark)
    return _TABLE_CACHE[key]
