"""Edge-semantics tests for the scalar library (SURVEY §2.9 'hard parts':
remainder sign, quotient, clip, rounding, temporal parts, json, lists,
structs, split_into, named captures)."""

import math

import pytest

import explorer_spark as ex
from explorer_spark import col, f, lit


def test_remainder_and_quotient(spark):
    d = ex.from_columns({"a": [7, -7, 7, -7], "b": [3, 3, -3, -3]}, spark=spark)
    out = d.mutate(r=col("a") % col("b"), q=f.quotient(col("a"), col("b"))).to_columns()
    # Spark % follows sign-of-dividend (same as Rust/Polars)
    assert out["r"] == [1, -1, 1, -1]
    # quotient = floor division
    assert out["q"] == [2, -3, -3, 2]


def test_clip_round_log_exp(spark):
    d = ex.from_columns({"x": [-5.0, 0.5, 9.0]}, spark=spark)
    out = d.mutate(
        c=f.clip(col("x"), 0.0, 1.0),
        r=f.round(col("x"), 0),
        ln=f.log_natural(col("x")),
        l2=f.log(col("x"), 2),
        e=f.exp(lit(0.0)),
        sq=f.sqrt(f.abs(col("x"))),
    ).to_columns()
    assert out["c"] == [0.0, 0.5, 1.0]
    assert out["ln"][0] is None or math.isnan(out["ln"][0])  # log of negative
    assert out["l2"][2] == pytest.approx(math.log2(9.0))
    assert out["e"] == [1.0, 1.0, 1.0]


def test_trig(spark):
    d = ex.from_columns({"x": [0.0, math.pi / 2]}, spark=spark)
    out = d.mutate(
        s=f.sin(col("x")), c=f.cos(col("x")), deg=f.degrees(col("x")), rad=f.radians(f.degrees(col("x")))
    ).to_columns()
    assert out["s"] == pytest.approx([0.0, 1.0])
    assert out["deg"] == pytest.approx([0.0, 90.0])
    assert out["rad"] == pytest.approx([0.0, math.pi / 2])


def test_is_finite_nan(spark):
    # NB: NaN must be synthesized in-engine — pandas ingestion reads
    # float('nan') as SQL NULL (nil), matching Explorer's nil-vs-NaN split
    d = ex.from_columns({"i": [0, 1, 2, 3]}, spark=spark).mutate(
        x=f.select(col("i") == lit(0), lit(1.0), f.select(col("i") == lit(1), lit(float("nan")), f.select(col("i") == lit(2), lit(float("inf")), lit(float("-inf")))))
    )
    out = d.mutate(
        fin=f.is_finite(col("x")), nan=f.is_nan(col("x")), inf=f.is_infinite(col("x"))
    ).sort_by("i").to_columns()
    assert out["nan"] == [False, True, False, False]
    assert out["inf"] == [False, False, True, True]
    assert out["fin"] == [True, False, False, False]


def test_string_edges(spark):
    d = ex.from_columns({"s": ["  pad  ", "héllo", "", "a,b,c"]}, spark=spark)
    out = d.mutate(
        t=f.strip(col("s")),
        lt=f.lstrip(col("s")),
        ln=f.string_length(col("s")),
        up=f.upcase(col("s")),
        sub=f.substring(col("s"), 1, 3),
        neg=f.substring(col("s"), -3),
    ).to_columns()
    assert out["t"][0] == "pad"
    assert out["ln"] == [7, 5, 0, 5]  # unicode length, not bytes
    assert out["sub"][3] == ",b,"
    assert out["neg"][3] == "b,c"


def test_split_into_and_captures(spark):
    d = ex.from_columns({"s": ["2024-01-15", "1999-12-31"]}, spark=spark)
    out = d.mutate(parts=f.split_into(col("s"), "-", ["y", "m", "d"])).unnest(["parts"]).to_columns()
    assert out["y"] == ["2024", "1999"]
    assert out["d"] == ["15", "31"]
    cap = d.mutate(g=f.re_named_captures(col("s"), r"(\d+)-(\d+)-(\d+)", ["yy", "mm", "dd"]))
    g = cap.unnest(["g"]).to_columns()
    assert g["mm"] == ["01", "12"]


def test_json_decode(spark):
    d = ex.from_columns({"j": ['{"a": 1, "b": "x"}', '{"a": 2, "b": "y"}']}, spark=spark)
    out = d.mutate(o=f.json_decode(col("j"), ("struct", [("a", ("s", 64)), ("b", "string")])))
    flat = out.unnest(["o"]).to_columns()
    assert flat["a"] == [1, 2]
    assert flat["b"] == ["x", "y"]
    path = d.mutate(v=f.json_path_match(col("j"), "$.b")).to_columns()
    assert path["v"] == ["x", "y"]


def test_split_literal_not_regex(spark):
    d = ex.from_columns({"s": ["a.b.c", "x|y", "1+2+3"]}, spark=spark)
    out = d.mutate(
        parts=f.list_lengths(f.split(col("s"), ".")),
        pipe=f.list_lengths(f.split(col("s"), "|")),
        plus=f.count_matches(col("s"), "+"),
    ).to_columns()
    assert out["parts"] == [3, 1, 1]  # '.' is literal, not any-char
    assert out["pipe"] == [1, 2, 1]  # '|' is literal, not alternation
    assert out["plus"] == [0, 0, 2]


def test_re_scan(spark):
    d = ex.from_columns({"s": ["a1b22c333"]}, spark=spark)
    out = d.mutate(nums=f.re_scan(col("s"), r"\d+")).to_columns()
    assert list(out["nums"][0]) == ["1", "22", "333"]


def test_list_ops(spark):
    d = ex.from_rows([{"xs": ["a", "b"]}, {"xs": []}], spark=spark)
    out = d.mutate(
        j=f.join(col("xs"), "-"), n=f.list_lengths(col("xs")), m=f.member(col("xs"), "a")
    ).to_columns()
    assert out["j"] == ["a-b", ""]
    assert out["n"] == [2, 0]
    assert out["m"] == [True, False]


def test_struct_field(spark):
    d = ex.from_rows([{"st": {"a": 1, "b": "x"}}], spark=spark)
    out = d.mutate(v=f.field(col("st"), "b")).to_columns()
    assert out["v"] == ["x"]


def test_temporal_parts_and_strftime(spark):
    import datetime

    d = ex.from_columns({"t": [datetime.datetime(2024, 2, 29, 13, 45, 31)]}, spark=spark)
    out = d.mutate(
        y=f.year(col("t")),
        mo=f.month(col("t")),
        dom=f.day_of_month(col("t")),
        dow=f.day_of_week(col("t")),
        doy=f.day_of_year(col("t")),
        q=f.quarter_of_year(col("t")),
        h=f.hour(col("t")),
        mi=f.minute(col("t")),
        s=f.second(col("t")),
        leap=f.is_leap_year(col("t")),
        fmt=f.strftime(col("t"), "%Y/%m/%d %H:%M"),
    ).to_columns()
    assert out["y"] == [2024] and out["mo"] == [2] and out["dom"] == [29]
    assert out["dow"] == [4]  # Thursday, Monday=1
    assert out["doy"] == [60]
    assert out["leap"] == [True]
    assert out["fmt"] == ["2024/02/29 13:45"]


def test_strptime(spark):
    d = ex.from_columns({"s": ["2024/01/15 08:30"]}, spark=spark)
    out = d.mutate(t=f.strptime(col("s"), "%Y/%m/%d %H:%M")).to_columns()
    assert str(out["t"][0]) == "2024-01-15 08:30:00"


def test_coalesce_select_between(spark):
    d = ex.from_columns({"a": [None, 2], "b": [10, 20]}, spark=spark)
    out = d.mutate(
        c=f.coalesce(col("a"), col("b")),
        w=f.select(col("b") > lit(15), lit("big"), lit("small")),
        btw=f.between(col("b"), 5, 15),
    ).to_columns()
    assert out["c"] == [10, 2]
    assert out["w"] == ["small", "big"]
    assert out["btw"] == [True, False]


def test_cumulative_reverse(spark):
    d = ex.from_columns({"x": [1, 2, 3]}, spark=spark)
    out = d.mutate(r=f.cumulative_sum(col("x"), reverse=True)).to_columns()
    assert out["r"] == [6, 5, 3]


def test_all_equal(spark):
    d = ex.from_columns({"a": [1, None, 3], "b": [1, None, 3], "c": [1, 2, 3]}, spark=spark)
    out = d.summarise(ab=f.all_equal(col("a"), col("b")), ac=f.all_equal(col("a"), col("c"))).to_columns()
    assert out == {"ab": [True], "ac": [False]}


def test_cast_widths(spark):
    d = ex.from_columns({"x": [200, -5]}, spark=spark)
    out = d.mutate(b=f.cast(col("x"), ("s", 8)), s=f.cast(col("x"), "string"), fl=f.cast(col("x"), ("f", 32)))
    assert out.dtypes["b"] == ("s", 8)
    assert out.dtypes["s"] == "string"
    assert out.dtypes["fl"] == ("f", 32)


def test_days_of_month(spark):
    import datetime

    from explorer_spark import Series, f

    s = Series.from_list(
        [datetime.date(2024, 2, 1), datetime.date(2023, 2, 5), datetime.date(2024, 4, 30)],
        dtype="date",
        spark=spark,
    )
    assert s.map(f.days_of_month).to_list() == [29, 28, 30]


def test_pow_dtype_rules(spark):
    """Reference pow dtype rules (series_test.exs:2611-2700): int^int
    stays integer ({:s,64} after unsigned promotion), float width is
    preserved (f32 with no f64 operand stays f32), any f64 operand
    widens to f64."""
    from explorer_spark.expr import col
    from explorer_spark.series import Series

    import explorer_spark as ex

    a = Series.from_list([1, 2, 3], dtype=("s", 32), name="a")
    r = a**3
    assert r.dtype == ("s", 64) and r.to_list() == [1, 8, 27]
    f32 = Series.from_list([1.0, 2.0, 3.0], dtype=("f", 32), name="f")
    r2 = f32**2
    assert r2.dtype == ("f", 32) and r2.to_list() == [1.0, 4.0, 9.0]
    r3 = a**2.0
    assert r3.dtype == ("f", 64)
    d = ex.from_columns({"x": [2, 3], "y": [3, 2]})
    m = d.mutate(p=col("x") ** col("y"))
    assert dict(m.dtypes)["p"] == ("s", 64)
    assert m.to_columns()["p"] == [8, 9]


def test_rank_reference_grid(spark):
    """Reference rank/2 parity (series.ex:2063-2072 + series_test.exs
    rank grids): default method is :average (floats), nils stay NIL
    without consuming ranks, NaN ranks greatest among non-null values,
    ordinal breaks ties in row order."""
    from explorer_spark.series import Series

    nan = float("nan")
    s = Series.from_list([3.5, 3.0, 3.2, 3.1, 3.6, 3.9, 3.4, 3.4, 2.9, 3.1], spark=spark)
    assert s.rank("ordinal").to_list() == [8, 2, 5, 3, 9, 10, 6, 7, 1, 4]
    assert s.rank("min").to_list() == [8, 2, 5, 3, 9, 10, 6, 6, 1, 3]
    assert s.rank("max").to_list() == [8, 2, 5, 4, 9, 10, 7, 7, 1, 4]
    assert s.rank("dense").to_list() == [6, 2, 4, 3, 7, 8, 5, 5, 1, 3]
    assert s.rank().to_list() == [8.0, 2.0, 5.0, 3.5, 9.0, 10.0, 6.5, 6.5, 1.0, 3.5]

    s2 = Series.from_list([-3.1, 1.2, 2.3, None, -2.4, -12.6, nan, 3.9], spark=spark)
    assert s2.rank().to_list() == [2.0, 4.0, 5.0, None, 3.0, 1.0, 7.0, 6.0]
    for m in ("ordinal", "min", "max", "dense"):
        got = s2.rank(m).to_list()
        assert got[3] is None, (m, got)
        assert got[6] == max(v for v in got if v is not None), (m, got)
    rr = s2.rank("random", seed=3).to_list()
    assert rr[3] is None and sorted(v for v in rr if v is not None) == [1, 2, 3, 4, 5, 6, 7]

    # grouped mutate shares the semantics (window path)
    import explorer_spark as ex
    from explorer_spark import functions as f
    from explorer_spark.expr import col

    d = ex.from_columns({"g": ["a", "a", "a", "b"], "x": [2.0, None, 1.0, 5.0]}, spark=spark)
    assert d.group_by("g").mutate(r=f.rank(col("x"))).ungroup().to_columns()["r"] == [
        2.0, None, 1.0, 1.0,
    ]


def test_reflected_operators_and_decimal_ingest(spark):
    """Round-7 reference-sampling finds: scalar-on-the-left arithmetic
    (Series.pow(2, s) etc. — series_test.exs pow grids) and numeric
    ingestion into {:decimal, p, s} (floats/ints land as scaled
    Decimals, series_test.exs 'with floats as decimals')."""
    import math
    from decimal import Decimal

    from explorer_spark.series import Series

    nan, inf = float("nan"), float("inf")
    s1 = Series.from_list([1.0, -2.5, nan, inf, -inf], spark=spark)
    r = (2 ** s1).to_list()
    assert r[0] == 2.0 and abs(r[1] - 0.1767766952966369) < 1e-15
    assert math.isnan(r[2]) and r[3] == inf and r[4] == 0.0
    r2 = ((-2) ** Series.from_list([1.0, 2.5], spark=spark)).to_list()
    assert r2[0] == -2.0 and math.isnan(r2[1])
    assert (10 - Series.from_list([1, 2], spark=spark)).to_list() == [9, 8]
    assert (1 / Series.from_list([2.0, 4.0], spark=spark)).to_list() == [0.5, 0.25]
    assert (7 % Series.from_list([3, 4], spark=spark)).to_list() == [1, 3]

    s = Series.from_list([0.0, 0.42, None, 5.12467], dtype=("decimal", 38, 5), spark=spark)
    assert s.to_list() == [Decimal("0.00000"), Decimal("0.42000"), None, Decimal("5.12467")]
    assert s.dtype == ("decimal", 38, 5)
    # INTEGERS are UNSCALED coefficients: int * 10^-scale (round-8 fix,
    # series_test.exs 'with integers as decimals passing scale')
    assert Series.from_list([0, 4237, None, 550], dtype=("decimal", 38, 2), spark=spark).to_list() == [
        Decimal("0.00"),
        Decimal("42.37"),
        None,
        Decimal("5.50"),
    ]
    # lower-scale floats truncate to the dtype's scale
    lo = Series.from_list([0.42, 5.12467], dtype=("decimal", 38, 2), spark=spark)
    assert lo.to_list() == [Decimal("0.42"), Decimal("5.12")]
    # explicit :null dtype discards values (series_test.exs 'with non
    # nils and dtype :null')
    n = Series.from_list([1, 2, 3], dtype="null", spark=spark)
    assert n.to_list() == [None, None, None] and n.dtype == "null"


def test_struct_reference_semantics(spark):
    """Round-8 sweep of reference series/struct_test.exs:

    - a nil struct ROW ingests as a struct of null fields ('allow
      nils') — from_list write-side conversion; function-produced null
      structs still read as nil (re_named_captures on nil);
    - struct casts apply the temporal COUNT rules per field ('structs
      with integers to structs with naive datetimes') — Spark refuses
      struct<bigint> -> struct<timestamp>, expr._elem_cast rebuilds
      field-wise (null outer structs stay null);
    - from_list rejects dicts whose field set or field kinds diverge
      from the first value ('errors when structs have mismatched
      types') — Spark's sampling inference would otherwise coerce to
      map<string,string> or union the fields silently."""
    import datetime as dtm

    import pytest as _pytest

    from explorer_spark.series import Series

    s = Series.from_list([None, {"a": 1, "b": 2}, None], spark=spark)
    assert s.dtype == ("struct", [("a", ("s", 64)), ("b", ("s", 64))])
    assert s.to_list() == [
        {"a": None, "b": None},
        {"a": 1, "b": 2},
        {"a": None, "b": None},
    ]

    c = Series.from_list(
        [{"a": 1}, {"a": 1_649_883_642_000_000}, None], spark=spark
    ).cast(("struct", [("a", ("naive_datetime", "us"))]))
    assert c.dtype == ("struct", [("a", ("naive_datetime", "us"))])
    assert c.to_list() == [
        {"a": dtm.datetime(1970, 1, 1, 0, 0, 0, 1)},
        {"a": dtm.datetime(2022, 4, 13, 21, 0, 42)},
        {"a": None},
    ]
    # nested struct cast (int -> float) and field reorder
    n = Series.from_list([{"a": {"b": 1}}], spark=spark).cast(
        ("struct", [("a", ("struct", [("b", ("f", 64))]))])
    )
    assert n.to_list() == [{"a": {"b": 1.0}}]
    r = Series.from_list(
        [{"a": "a", "b": "b"}], dtype=("struct", [("a", "string"), ("b", "string")]), spark=spark
    ).cast(("struct", [("b", "string"), ("a", "string")]))
    assert r.dtype == ("struct", [("b", "string"), ("a", "string")])

    with _pytest.raises(ValueError, match="does not match"):
        Series.from_list([{"a": 1}, {"a": "a"}], spark=spark)
    with _pytest.raises(ValueError, match="does not match"):
        Series.from_list([{"a": 1}, {"b": 1}], spark=spark)
    with _pytest.raises(ValueError, match="does not match"):
        Series.from_list([[{"a": 1}], [{"a": "a"}]], spark=spark)
    # int/float mixing promotes (not an error)
    m = Series.from_list([{"a": 1, "b": 2.4}, {"a": 1.5, "b": 2}], spark=spark)
    assert m.to_list() == [{"a": 1.0, "b": 2.4}, {"a": 1.5, "b": 2.0}]


def test_date_plus_duration_stays_date(spark):
    """date ± duration stays :date with sub-day truncation (reference
    duration_test.exs:172-239 — Spark's native date + interval would
    promote to timestamp); date - date stays duration."""
    import datetime as dtm

    from explorer_spark.functions import col
    from explorer_spark.series import Series

    d = Series.from_list([dtm.date(2024, 8, 20)], name="d", spark=spark)
    hour = Series.from_list(
        [dtm.timedelta(hours=1)], name="x", dtype=("duration", "us"), spark=spark
    )
    day = Series.from_list(
        [dtm.timedelta(hours=24)], name="x", dtype=("duration", "us"), spark=spark
    )
    assert (d + hour).dtype == "date" and (d + hour).to_list() == [dtm.date(2024, 8, 20)]
    assert (d + day).to_list() == [dtm.date(2024, 8, 21)]
    assert (hour + d).dtype == "date"
    assert (d - hour).to_list() == [dtm.date(2024, 8, 19)]
    assert (d + dtm.timedelta(hours=25)).to_list() == [dtm.date(2024, 8, 21)]
    # expression level too
    fr = d.to_frame().rename({d.name: "d"})
    out = fr.mutate(e=col("d") + dtm.timedelta(hours=1))
    assert out.dtypes["e"] == "date"
    # date - date stays a duration
    a = Series.from_list([dtm.date(2024, 1, 3)], name="a", spark=spark)
    b = Series.from_list([dtm.date(2024, 1, 1)], name="b", spark=spark)
    assert (a - b).dtype == ("duration", "us")


def test_count_matches_null_guard(spark):
    """count_matches on a nil input is nil, not -2 (size(split(NULL)) is
    -1 in Spark — round-8 sweep find); the literal/regex split matches
    the reference (count_matches is literal, re_count_matches regex)."""
    from explorer_spark import functions as fn
    from explorer_spark.series import Series

    c = Series.from_list(["abc", "bcd", "def", None], spark=spark)
    assert c.map(lambda x: fn.count_matches(x, "(b|d)")).to_list() == [0, 0, 0, None]
    assert c.map(lambda x: fn.re_count_matches(x, "(b|d)")).to_list() == [1, 2, 1, None]


def test_round8_late_sweep_finds(spark):
    """Round-8 late sweep (series_test.exs samples): decimal inference
    is {:decimal, 38, max scale} with mixed floats at face value and
    mixed ints as coefficients; sum counts booleans; format renders
    inf/-inf and nil-as-empty-string; categorise validates string
    inputs against the categories."""
    import math
    from decimal import Decimal

    from explorer_spark.series import Series

    s = Series.from_list([Decimal("0"), Decimal("0.42"), None, Decimal("5.12467")], spark=spark)
    assert s.dtype == ("decimal", 38, 5)
    assert s.to_list() == [Decimal("0.00000"), Decimal("0.42000"), None, Decimal("5.12467")]
    mixed_f = Series.from_list([Decimal("0.42"), Decimal("5.12467"), 42.59], spark=spark)
    assert mixed_f.to_list()[-1] == Decimal("42.59000")
    mixed_i = Series.from_list([Decimal("0.42"), Decimal("5.12467"), 42], spark=spark)
    assert mixed_i.to_list()[-1] == Decimal("0.00042")

    assert Series.from_list([True, False, True], spark=spark).sum() == 2

    s1 = Series.from_list(["a", "b"], spark=spark)
    s3 = Series.from_list([1.5, float("inf")], spark=spark)
    s4 = Series.from_list(["i", None], spark=spark)
    assert Series.format([s1, "/", s3, "-", s4]).to_list() == ["a/1.5-i", "b/inf-"]

    cats = Series.from_list(["a", "b", "c"], dtype="category", spark=spark)
    sv = Series.from_list(["c", "b", "a", "x", "c"], spark=spark)
    got = sv.categorise(cats)
    assert got.to_list() == ["c", "b", "a", None, "c"] and got.dtype == "category"
    idx = Series.from_list([0, 2, 1, None, 9], spark=spark)
    assert idx.categorise(["a", "b", "c"]).to_list() == ["a", "c", "b", None, None]


def test_json_decode_primitive_targets(spark):
    """json_decode to PRIMITIVE dtypes (reference data_frame_test.exs
    'decodes primitives, lists, structs'): Spark's from_json only takes
    container schemas, so primitives parse through a one-field object
    wrap — quoted strings dequote, invalid JSON still raises, nil stays
    nil."""
    from explorer_spark.sources import from_rows

    df = from_rows([{"fl": "1.0", "l": "[1]", "s": '"a"'}], spark=spark)
    out = df.mutate(
        fl=f.json_decode(col("fl"), ("f", 64)),
        l=f.json_decode(col("l"), ("list", ("s", 64))),
        s=f.json_decode(col("s"), "string"),
    )
    assert out.dtypes["fl"] == ("f", 64)
    assert out.dtypes["l"] == ("list", ("s", 64))
    assert out.dtypes["s"] == "string"
    assert out.to_columns() == {"fl": [1.0], "l": [[1]], "s": ["a"]}
