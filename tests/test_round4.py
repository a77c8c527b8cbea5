"""Round-4 behavior changes: exact replacement sampling (ungrouped +
grouped), Access-contract fetch bounds, put/mask length validation,
summarise list-collection of ordered ops, element-wise Series __eq__."""

import pytest

from explorer_spark import functions as f
from explorer_spark.expr import col
from explorer_spark.sources import from_columns


def _frame(spark, **cols):
    return from_columns(cols, spark=spark)


# ---------------------------------------------------------------------------
# sample(replace=True): exact row counts
# ---------------------------------------------------------------------------


def test_sample_replace_exact_n(spark):
    df = _frame(spark, x=[10, 20, 30])
    got = df.sample(2, replace=True, seed=1)
    rows = got.to_columns()["x"]
    assert len(rows) == 2
    assert set(rows) <= {10, 20, 30}


def test_sample_replace_oversample(spark):
    # more rows than the frame has: the reference allows this with
    # replace: true and returns EXACTLY n (the old Poisson-based path
    # could silently return fewer)
    df = _frame(spark, x=[1, 2, 3])
    for seed in (0, 1, 2, 7, 42):
        rows = df.sample(30, replace=True, seed=seed).to_columns()["x"]
        assert len(rows) == 30, f"seed {seed} returned {len(rows)} rows"
        assert set(rows) <= {1, 2, 3}


def test_sample_replace_seed_deterministic(spark):
    df = _frame(spark, x=list(range(50)))
    a = df.sample(20, replace=True, seed=5).to_columns()["x"]
    b = df.sample(20, replace=True, seed=5).to_columns()["x"]
    assert a == b
    c = df.sample(20, replace=True, seed=6).to_columns()["x"]
    assert a != c  # overwhelmingly likely for 20 draws over 50 rows


def test_sample_replace_frac(spark):
    df = _frame(spark, x=list(range(10)))
    rows = df.sample(1.5, replace=True, seed=3).to_columns()["x"]
    assert len(rows) == 15


def test_grouped_sample_replace_exact_per_group(spark):
    df = _frame(spark, g=["a"] * 3 + ["b"] * 5 + ["c"] * 1, x=list(range(9)))
    got = df.group_by("g").sample(4, replace=True, seed=2)
    cols = got.ungroup().to_columns()
    by_g = {}
    for g, x in zip(cols["g"], cols["x"]):
        by_g.setdefault(g, []).append(x)
    # exactly n per group even when the group is smaller than n
    assert {g: len(v) for g, v in by_g.items()} == {"a": 4, "b": 4, "c": 4}
    assert set(by_g["a"]) <= {0, 1, 2}
    assert set(by_g["b"]) <= {3, 4, 5, 6, 7}
    assert by_g["c"] == [8, 8, 8, 8]


def test_grouped_sample_replace_frac(spark):
    df = _frame(spark, g=["a"] * 4 + ["b"] * 8, x=list(range(12)))
    got = df.group_by("g").sample(0.5, replace=True, seed=9)
    cols = got.ungroup().to_columns()
    from collections import Counter

    assert Counter(cols["g"]) == {"a": 2, "b": 4}


# ---------------------------------------------------------------------------
# fetch: Access contract (absent key -> None, never IndexError)
# ---------------------------------------------------------------------------


def test_fetch_list_out_of_range_returns_none(spark):
    df = _frame(spark, a=[1], b=[2])
    assert df.fetch([0, 5]) is None
    assert df.fetch([-3]) is None
    assert df.fetch([0, 1]).names == ["a", "b"]
    assert df.fetch([-1]).names == ["b"]
    with pytest.raises(KeyError):
        df[[0, 5]]


# ---------------------------------------------------------------------------
# put / mask: length mismatch raises (reference raises, never pads/drops)
# ---------------------------------------------------------------------------


def test_put_series_length_mismatch_raises(spark):
    from explorer_spark.series import Series

    df = _frame(spark, x=[1, 2, 3])
    short = Series.from_list([10, 20], name="v", spark=spark)
    with pytest.raises(Exception, match="length"):
        df.put("y", short).to_columns()
    long = Series.from_list([1, 2, 3, 4], name="v", spark=spark)
    with pytest.raises(Exception, match="length"):
        df.put("y", long).to_columns()
    ok = Series.from_list([7, 8, 9], name="v", spark=spark)
    assert df.put("y", ok).to_columns()["y"] == [7, 8, 9]


def test_mask_series_length_mismatch_raises(spark):
    from explorer_spark.series import Series

    df = _frame(spark, x=[1, 2, 3])
    short = Series.from_list([True, False], name="m", spark=spark)
    with pytest.raises(Exception, match="length"):
        df.mask(short).to_columns()
    ok = Series.from_list([True, False, True], name="m", spark=spark)
    assert df.mask(ok).to_columns()["x"] == [1, 3]


# ---------------------------------------------------------------------------
# summarise: ordered ops inside the implicit-list path
# ---------------------------------------------------------------------------


def test_summarise_collects_ordered_op_as_list(spark):
    df = _frame(spark, g=["a", "a", "b", "b"], x=[1, 2, 3, 4])
    out = df.group_by("g").summarise(cs=f.cumulative_sum(col("x")))
    got = {r["g"]: r["cs"] for r in out.to_rows()}
    assert got == {"a": [1, 3], "b": [3, 7]}


def test_summarise_ungrouped_ordered_list(spark):
    df = _frame(spark, x=[1, 2, 3])
    out = df.summarise(cs=f.cumulative_sum(col("x")))
    assert out.to_rows()[0]["cs"] == [1, 3, 6]


# ---------------------------------------------------------------------------
# Series __eq__ / __ne__ element-wise
# ---------------------------------------------------------------------------


def test_series_eq_elementwise(spark):
    from explorer_spark.series import Series

    s1 = Series.from_list([1, 2, 3], name="a", spark=spark)
    s2 = Series.from_list([1, 5, 3], name="b", spark=spark)
    assert (s1 == s2).to_list() == [True, False, True]
    assert (s1 != s2).to_list() == [False, True, False]
    assert (s1 == 2).to_list() == [False, True, False]


def test_series_bool_raises(spark):
    from explorer_spark.series import Series

    s = Series.from_list([True], name="a", spark=spark)
    with pytest.raises(ValueError, match="ambiguous"):
        bool(s)


# ---------------------------------------------------------------------------
# from_query JDBC leg (Derby embedded — bundled with Spark) + S3A guard
# ---------------------------------------------------------------------------


def test_from_query_jdbc_derby_e2e(spark):
    """The distributed-JDBC branch of from_query executes end-to-end
    against Derby's in-memory embedded DB (derby*.jar ships with Spark,
    so the driver class is always on this classpath)."""
    from explorer_spark.sources import from_query

    url = "jdbc:derby:memory:fqtest;create=true"
    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    seed = spark.createDataFrame([(1, "ok"), (2, "go")], "id int, name string")
    seed.write.format("jdbc").option("url", url).option("dbtable", "T").option(
        "driver", drv
    ).mode("overwrite").save()

    # Spark's JDBC writer quotes identifiers, so Derby's columns are
    # case-sensitive lowercase — quote them in the pushed-down query
    got = from_query(url, 'SELECT "id", "name" FROM T WHERE "id" > 0', spark=spark, driver=drv)
    rows = sorted((r["id"], r["name"]) for r in got.to_rows())
    assert rows == [(1, "ok"), (2, "go")]


def test_s3_guard_actionable_without_s3a_jar(spark):
    """resolve_path on s3:// must fail with an actionable message when
    hadoop-aws is absent (this container), not a ClassNotFoundException
    buried in a scan."""
    from explorer_spark.sources.fss import resolve_path, s3a_available

    cfg = {"access_key_id": "k", "secret_access_key": "s", "region": "us-east-1"}
    if s3a_available(spark):
        assert resolve_path("s3://b/key.parquet", spark, cfg) == "s3a://b/key.parquet"
    else:
        with pytest.raises(RuntimeError, match="hadoop-aws"):
            resolve_path("s3://b/key.parquet", spark, cfg)


# ---------------------------------------------------------------------------
# C4-style line cleaning
# ---------------------------------------------------------------------------


def test_clean_lines_order_and_filters(spark):
    from explorer_spark.operators.text import clean_lines

    rows = [
        (1, "first line keeps this.\nno punct line here\nshort.\nlast line also kept!"),
        (2, "nothing survives here"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean_lines(sdf, min_words=3).collect()}
    assert got[1].n_lines_kept == 2
    # original line order preserved
    assert got[1].clean_text == "first line keeps this.\nlast line also kept!"
    assert got[2].n_lines_kept == 0 and got[2].clean_text == ""


def test_sample_replace_draws_roughly_uniform(spark):
    """The md5-prefix draw stream behaves like a uniform RNG: 3000 draws
    over 10 rows hit every row, each within generous binomial bounds."""
    from collections import Counter

    df = _frame(spark, x=list(range(10)))
    rows = df.sample(3000, replace=True, seed=11).to_columns()["x"]
    c = Counter(rows)
    assert len(c) == 10
    assert all(200 <= v <= 400 for v in c.values()), c


def test_put_list_length_mismatch_raises(spark):
    df = _frame(spark, x=[1, 2, 3])
    with pytest.raises(Exception, match="length"):
        df.put("y", [10, 20]).to_columns()
    with pytest.raises(Exception, match="length"):
        df.put("y", [10, 20, 30, 40]).to_columns()
    assert df.put("y", [10, 20, 30]).to_columns()["y"] == [10, 20, 30]


def test_put_mask_mismatch_raises_eagerly(spark):
    """Length mismatch raises at CALL time (before any action), so no
    downstream projection/pruning can hide it — a raise_error woven into
    the value column could be pruned away with the column."""
    from explorer_spark.series import Series

    df = _frame(spark, x=[1, 2, 3])
    long = Series.from_list([1, 2, 3, 4], name="v", spark=spark)
    with pytest.raises(ValueError, match="length"):
        df.put("y", long)  # no action needed
    with pytest.raises(ValueError, match="length"):
        df.put("y", [1, 2])
    mask4 = Series.from_list([True, False, True, False], name="m", spark=spark)
    with pytest.raises(ValueError, match="length"):
        df.mask(mask4)
    # and the select-away-the-column case can't silently pad rows
    ok = Series.from_list([7, 8, 9], name="v", spark=spark)
    assert df.put("y", ok).select(["x"]).to_columns()["x"] == [1, 2, 3]


def test_grouped_sample_replace_null_group_key(spark):
    """NULL is a group too: the multiplicity join uses eqNullSafe, so
    null-keyed groups sample like any other."""
    df = _frame(spark, g=[None, None, None, "a", "a"], x=[1, 2, 3, 4, 5])
    got = df.group_by("g").sample(3, replace=True, seed=6)
    cols = got.ungroup().to_columns()
    from collections import Counter

    counts = Counter(cols["g"])
    assert counts[None] == 3 and counts["a"] == 3
    by_g = {}
    for g, x in zip(cols["g"], cols["x"]):
        by_g.setdefault(g, []).append(x)
    assert set(by_g[None]) <= {1, 2, 3}
    assert set(by_g["a"]) <= {4, 5}


def test_grouped_sample_replace_frac_floor_zero(spark):
    """A group whose floor(frac*len) is 0 contributes no rows (and no
    crash from an empty draw sequence)."""
    df = _frame(spark, g=["a", "b", "b", "b", "b"], x=[1, 2, 3, 4, 5])
    got = df.group_by("g").sample(0.5, replace=True, seed=2)
    cols = got.ungroup().to_columns()
    from collections import Counter

    assert Counter(cols["g"]) == {"b": 2}  # floor(0.5*1)=0 for group a


def test_integer_division_by_zero_is_null(spark):
    """Reference (and DuckDB oracle) semantics: integer % / quotient by
    zero is NULL, not an error — requires ANSI off, which Spark 4 no
    longer defaults to (the session must set it explicitly)."""
    df = _frame(spark, a=[7, 3], b=[2, 0])
    out = df.mutate(q=f.quotient(col("a"), col("b")), r=f.remainder(col("a"), col("b"))).to_columns()
    assert out["q"] == [3, None]
    assert out["r"] == [1, None]


# ---------------------------------------------------------------------------
# expr-layer review fixes
# ---------------------------------------------------------------------------


def test_n_distinct_in_grouped_mutate(spark):
    df = _frame(spark, g=["a", "a", "b"], x=[1, 1, 2])
    out = df.group_by("g").mutate(k=f.n_distinct(col("x"))).ungroup().to_columns()
    assert out["k"] == [1, 1, 1]


def test_skew_bias_false_sample_correction(spark):
    from explorer_spark.series import Series

    xs = [1.0, 2.0, 3.0, 4.0, 10.0]
    s = Series.from_list(xs, dtype=("f", 64), name="v", spark=spark)
    # exact: g1 = m3/m2^1.5 = 36/10^1.5 = 1.1384200; sample correction
    # *sqrt(n(n-1))/(n-2) = sqrt(20)/3 -> 1.6970663
    assert s.skew(bias=False) == pytest.approx(1.6970663, rel=1e-3)
    assert s.skew(bias=True) == pytest.approx(1.1384200, rel=1e-3)


def test_select_nil_predicate_yields_nil(spark):
    df = _frame(spark, p=[True, None, False], x=[1, 2, 3])
    out = df.mutate(y=f.select(col("p"), col("x"), col("x") * 10)).to_columns()
    assert out["y"] == [1, None, 30]


def test_argminmax_contiguous_and_grouped(spark):
    df = _frame(spark, g=["a", "a", "a", "b", "b"], x=[5, 1, 5, 7, 2])
    # ungrouped: global position; repartition so mono ids WOULD be sparse
    whole = df.summarise(i=f.argmin(col("x")), j=f.argmax(col("x"))).to_rows()[0]
    assert (whole["i"], whole["j"]) == (1, 3)
    by_g = {
        r["g"]: (r["i"], r["j"])
        for r in df.group_by("g").summarise(i=f.argmin(col("x")), j=f.argmax(col("x"))).to_rows()
    }
    # within-group positions, first occurrence on ties
    assert by_g == {"a": (1, 0), "b": (1, 0)}


def test_strip_chars_with_class_metachars(spark):
    from explorer_spark.series import Series

    # lstrip("a-c") strips the LITERAL chars {a, -, c} — never the
    # range a..c, never negation for '^'
    s = Series.from_list(["bad", "^xx", "a-c"], dtype="string", name="v", spark=spark)
    assert s.map(lambda c: f.lstrip(c, "a-c")).to_list() == ["bad", "^xx", ""]
    s2 = Series.from_list(["cab", "-a-b"], dtype="string", name="v", spark=spark)
    assert s2.map(lambda c: f.lstrip(c, "a-c")).to_list() == ["b", "b"]


def test_reflected_pow_mod(spark):
    df = _frame(spark, x=[2, 3])
    out = df.mutate(p=2 ** col("x"), m=7 % col("x")).to_columns()
    assert out["p"] == [4.0, 8.0]
    assert out["m"] == [1, 1]
