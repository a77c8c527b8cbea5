"""Dtype system: mapping table, promotion/merge rules (SURVEY §1.2), and
the logical-over-physical emulations (u64, time, duration)."""

import pytest
from pyspark.sql import types as T

from explorer_spark import dtypes as dt


def test_atom_mappings():
    assert dt.to_spark("boolean") == T.BooleanType()
    assert dt.to_spark("string") == T.StringType()
    assert dt.to_spark("binary") == T.BinaryType()
    assert dt.to_spark("category") == T.StringType()
    assert dt.to_spark("date") == T.DateType()
    assert dt.to_spark("time") == T.LongType()  # nanos since midnight


def test_int_widths():
    assert dt.to_spark(("s", 8)) == T.ByteType()
    assert dt.to_spark(("s", 16)) == T.ShortType()
    assert dt.to_spark(("s", 32)) == T.IntegerType()
    assert dt.to_spark(("s", 64)) == T.LongType()
    # unsigned promote to next wider signed; u64 -> decimal(20,0)
    assert dt.to_spark(("u", 8)) == T.ShortType()
    assert dt.to_spark(("u", 32)) == T.LongType()
    assert dt.to_spark(("u", 64)) == T.DecimalType(20, 0)


def test_temporal_mappings():
    assert dt.to_spark(("naive_datetime", "us")) == T.TimestampNTZType()
    assert dt.to_spark(("naive_datetime", "ns")) == T.TimestampNTZType()  # ns truncates
    assert dt.to_spark(("datetime", "us", "Etc/UTC")) == T.TimestampType()
    assert dt.to_spark(("duration", "us")) == T.LongType()
    assert dt.to_spark(("decimal", 38, 10)) == T.DecimalType(38, 10)


def test_nested_mappings_roundtrip():
    nested = ("struct", [("a", ("list", ("f", 32))), ("b", "string")])
    st = dt.to_spark(nested)
    assert dt.from_spark(st) == nested


def test_aliases():
    assert dt.normalize("integer") == ("s", 64)
    assert dt.normalize("float") == ("f", 64)
    assert dt.normalize("duration") == ("duration", "us")


def test_numeric_promotion():
    # same family -> wider
    assert dt.merge_numeric(("s", 32), ("s", 64)) == ("s", 64)
    # unsigned+signed -> signed at 2x width, capped 64
    assert dt.merge_numeric(("u", 32), ("s", 32)) == ("s", 64)
    assert dt.merge_numeric(("u", 8), ("s", 8)) == ("s", 16)
    # int + float -> the float dtype
    assert dt.merge_numeric(("s", 64), ("f", 32)) == ("f", 32)
    assert dt.merge_numeric(("f", 32), ("f", 64)) == ("f", 64)


def test_merge_dtype_for_concat():
    assert dt.merge_dtype("null", "string") == "string"
    assert dt.merge_dtype(("s", 64), ("f", 64)) == ("f", 64)
    assert dt.merge_dtype(("list", ("s", 32)), ("list", ("s", 64))) == ("list", ("s", 64))
    assert dt.merge_dtype("category", "string") == "string"
    with pytest.raises(ValueError):
        dt.merge_dtype("string", ("s", 64))


def test_u64_values_roundtrip(spark):
    """u64 emulation: values above 2^63 survive via decimal(20,0)."""
    import explorer_spark as ex
    from explorer_spark import Series

    big = [2**63 + 5, 2**64 - 1, 0]
    s = Series.from_list([str(v) for v in big], name="u", dtype="string", spark=spark).cast(("u", 64))
    assert s.dtype == ("decimal", 20, 0)
    from decimal import Decimal

    assert s.to_list() == [Decimal(v) for v in big]
    assert s.max() == Decimal(2**64 - 1)


def test_duration_from_subtraction(spark):
    """datetime - datetime -> duration (DayTimeInterval read back)."""
    import datetime

    import explorer_spark as ex
    from explorer_spark import col

    d = ex.from_columns(
        {
            "a": [datetime.datetime(2024, 1, 2, 0, 0, 1)],
            "b": [datetime.datetime(2024, 1, 1, 0, 0, 0)],
        },
        spark=spark,
    )
    out = d.mutate(dur=col("a") - col("b"))
    assert out.dtypes["dur"] == ("duration", "us")
    val = out.to_rows()[0]["dur"]
    assert val == datetime.timedelta(days=1, seconds=1)


def test_time_as_nanos(spark):
    """time emulation: nanos-since-midnight in a LongType column."""
    import explorer_spark as ex
    from explorer_spark import Series

    nanos = [0, 12 * 3600 * 10**9 + 345, 86399 * 10**9]
    s = Series.from_list(nanos, name="t", dtype="time", spark=spark)
    assert s.dtype == ("s", 64)  # physical; logical 'time' tracked by caller
    assert s.to_list() == nanos


def test_duration_total_precisions(spark):
    """duration -> integer counts in us/ms/s/ns, truncation toward zero
    (reference duration_test.exs cast semantics)."""
    import datetime

    import explorer_spark as ex
    from explorer_spark import col
    from explorer_spark import functions as fns

    d = ex.from_columns(
        {
            "a": [
                datetime.datetime(2024, 1, 2, 0, 0, 1, 500),
                datetime.datetime(2024, 1, 1),
            ],
            "b": [
                datetime.datetime(2024, 1, 1),
                datetime.datetime(2024, 1, 2, 0, 0, 1, 500),
            ],
        },
        spark=spark,
    )
    out = d.mutate(
        us=fns.duration_total(col("a") - col("b"), "us"),
        ms=fns.duration_total(col("a") - col("b"), "ms"),
        s=fns.duration_total(col("a") - col("b"), "s"),
        ns=fns.duration_total(col("a") - col("b"), "ns"),
    ).to_columns()
    day_us = 86_400_000_000 + 1_000_000 + 500
    assert out["us"] == [day_us, -day_us]
    assert out["ms"] == [day_us // 1000, -(day_us // 1000)]
    assert out["s"] == [86401, -86401]
    assert out["ns"] == [day_us * 1000, -day_us * 1000]


def test_u64_parquet_roundtrip(spark, tmp_path):
    """u64-as-decimal(20,0) survives a parquet write/read cycle."""
    from decimal import Decimal

    import explorer_spark as ex
    from explorer_spark import Series, sources

    big = [2**63 + 5, 2**64 - 1, 0]
    s = Series.from_list([str(v) for v in big], name="u", dtype="string", spark=spark).cast(("u", 64))
    p = str(tmp_path / "u64.parquet")
    sources.write_parquet(s.to_frame(), p)
    back = sources.read_parquet(p)
    assert back.dtypes["u"] == ("decimal", 20, 0)
    assert sorted(back.to_columns()["u"]) == sorted(Decimal(v) for v in big)


def test_time_parquet_roundtrip(spark, tmp_path):
    """time-as-nanos longs survive parquet and keep sub-µs digits."""
    import explorer_spark as ex
    from explorer_spark import Series, sources

    nanos = [0, 12 * 3600 * 10**9 + 345, 86399 * 10**9 + 999_999_999]
    s = Series.from_list(nanos, name="t", dtype="time", spark=spark)
    p = str(tmp_path / "time.parquet")
    sources.write_parquet(s.to_frame(), p)
    back = sources.read_parquet(p)
    assert sorted(back.to_columns()["t"]) == sorted(nanos)


def test_duration_vs_oracle_truncation(duck):
    """Engine ms truncation matches integer-division semantics, not
    DuckDB's boundary-crossing date_diff."""
    got = duck.execute(
        "SELECT date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00.0009', "
        "TIMESTAMP '2024-01-01 00:00:00.0021') // 1000"
    ).fetchone()[0]
    assert got == 1  # 1200us -> 1ms truncated


def test_series_cast_duration_to_int_is_unit_count(spark):
    """Series.cast(duration -> s64) yields the count in the duration's
    precision unit (µs), reference shared.ex:12-22 — not interval
    seconds."""
    import datetime

    import explorer_spark as ex
    from explorer_spark import Series, col

    d = ex.from_columns(
        {"a": [datetime.datetime(2024, 1, 1, 0, 0, 1, 250)], "b": [datetime.datetime(2024, 1, 1)]},
        spark=spark,
    )
    dur = d.mutate(dur=col("a") - col("b")).select(["dur"])
    s = Series(dur, "dur")
    assert s.dtype == ("duration", "us")
    assert s.cast(("s", 64)).to_list() == [1_000_250]
