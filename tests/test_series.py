"""Series API tests, doctest-style exact expectations."""

import pytest

import explorer_spark as ex
from explorer_spark import Series


@pytest.fixture(scope="module")
def s(spark):
    return Series.from_list([3, 1, None, 4, 1, 5], name="x", dtype=("s", 64), spark=spark)


def test_roundtrip(s):
    assert s.to_list() == [3, 1, None, 4, 1, 5]
    assert s.dtype == ("s", 64)
    assert len(s) == 6


def test_aggregates(s):
    assert s.sum() == 14
    assert s.min() == 1
    assert s.max() == 5
    assert s.mean() == pytest.approx(2.8)
    assert s.count() == 5
    assert s.nil_count() == 1
    assert s.n_distinct() == 4  # null not counted
    assert s.first() == 3
    assert s.last() == 5
    assert s.at(3) == 4


def test_argminmax(s):
    assert s.argmin() == 1  # first occurrence of 1
    assert s.argmax() == 5


def test_sort_reverse_distinct(s):
    assert s.sort().to_list() == [1, 1, 3, 4, 5, None]
    assert s.sort(descending=True).to_list() == [5, 4, 3, 1, 1, None]
    assert s.reverse().to_list() == [5, 1, 4, None, 1, 3]
    assert s.distinct().sort().to_list() == [1, 3, 4, 5, None]


def test_argsort(s):
    assert s.argsort() == [1, 4, 0, 3, 5, 2]


def test_map_filter(s):
    assert s.map(lambda c: c * 2).to_list() == [6, 2, None, 8, 2, 10]
    assert s.filter(lambda c: c > 2).to_list() == [3, 4, 5]


def test_shift_fill(s):
    assert s.shift(1).to_list() == [None, 3, 1, None, 4, 1]
    assert s.fill_missing("forward").to_list() == [3, 1, 1, 4, 1, 5]
    assert s.fill_missing(0).to_list() == [3, 1, 0, 4, 1, 5]


def test_transform_udf(s):
    out = s.transform(lambda v: v * 10, dtype=("s", 64))
    assert out.to_list() == [30, 10, None, 40, 10, 50]


def test_categories(spark):
    c = Series.from_list(["b", "a", "b", "c"], name="c", spark=spark)
    assert c.categories() == ["b", "a", "c"]
    codes = Series.from_list([0, 1, None, 2], name="k", dtype=("s", 64), spark=spark)
    assert codes.categorise(["x", "y", "z"]).to_list() == ["x", "y", None, "z"]


def test_index_of(s):
    assert s.index_of(4) == 3
    assert s.index_of(99) is None


def test_rank(spark):
    r = Series.from_list([10.0, 30.0, 20.0, 30.0], name="v", spark=spark)
    assert r.rank("ordinal").to_list() == [1, 2, 4, 3] or r.rank("ordinal").to_list() == [1, 3, 2, 4]
    assert r.rank("dense").to_list() == [1, 3, 2, 3]
    assert r.rank("min").to_list() == [1, 3, 2, 3]
    assert r.rank("average").to_list() == [1.0, 3.5, 2.0, 3.5]


def test_series_parity_additions(spark):
    """mask / shuffle / collect / binary+numpy bridges / iteration /
    ewm_mean (reference series.ex parity surface)."""
    from explorer_spark.series import Series

    s = Series.from_list([10, 20, 30, 40], dtype=("s", 64), spark=spark)
    assert s.mask([True, False, True, False]).to_list() == [10, 30]
    assert sorted(s.shuffle(seed=3).to_list()) == [10, 20, 30, 40]
    assert s.collect().to_list() == [10, 20, 30, 40]
    assert list(s) == [10, 20, 30, 40]
    buf = s.to_binary()
    assert Series.from_binary(buf, ("s", 64), spark=spark).to_list() == [10, 20, 30, 40]
    assert s.to_numpy().tolist() == [10, 20, 30, 40]
    import pandas as pd

    x = Series.from_list([1.0, 2.0, 3.0, 4.0], dtype=("f", 64), spark=spark)
    got = x.ewm_mean(alpha=0.5).to_list()
    want = pd.Series([1.0, 2.0, 3.0, 4.0]).ewm(alpha=0.5, adjust=True).mean().tolist()
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))


def test_temporal_nanosecond_and_to_time(spark):
    import datetime

    from explorer_spark.series import Series
    from explorer_spark import functions as f

    ts = [datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)]
    s = Series.from_list(ts, dtype=("naive_datetime", "us"), spark=spark)
    assert s.map(f.nanosecond).to_list() == [123456000]
    ns_midnight = ((12 * 3600 + 30 * 60 + 45) * 1_000_000 + 123456) * 1000
    assert s.map(f.to_time).to_list() == [ns_midnight]


def test_series_access_fetch_pop(spark):
    from explorer_spark.series import Series

    s = Series.from_list([10, 20, 30, 40], spark=spark)
    assert s.fetch(1) == 20 and s.fetch(-1) == 40 and s.fetch(9) is None
    assert s[2] == 30
    assert s[[0, 2]].to_list() == [10, 30]
    assert s[range(1, 3)].to_list() == [20, 30]
    import pytest as _pt

    with _pt.raises(IndexError):
        s[99]
    v, rest = s.pop(1)
    assert v == 20 and rest.to_list() == [10, 30, 40]
    sl, rest = s.pop([0, -1])
    assert sl.to_list() == [10, 40] and rest.to_list() == [20, 30]


def test_series_not_and_callback_aliases(spark):
    from explorer_spark.series import Series
    from explorer_spark import functions as f

    b = Series.from_list([True, False, None], spark=spark)
    assert b.not_().to_list() == [False, True, None]
    assert (~b).to_list() == [False, True, None]
    s = Series.from_list([1, 2, 3, 4], spark=spark)
    assert s.filter_with(lambda c: c > 2).to_list() == [3, 4]
    assert s.map_with(lambda c: c * 10).to_list() == [10, 20, 30, 40]
    assert s.sort_with(lambda c: f.remainder(c, 2), direction="desc").to_list()[:2] == [1, 3]


def test_series_iotype(spark):
    from explorer_spark.series import Series

    assert Series.from_list([1.5], spark=spark).iotype() == ("f", 64)
    assert Series.from_list([1], spark=spark).iotype() == ("s", 64)
    assert Series.from_list([True], spark=spark).iotype() == ("u", 8)


def test_series_getitem_null_element(spark):
    from explorer_spark.series import Series

    s = Series.from_list([1, None, 3], spark=spark)
    assert s[1] is None  # in-bounds null element, NOT IndexError
    import pytest as _pt

    with _pt.raises(IndexError):
        s[3]
    assert s[-3] == 1
    # caller-order + duplicate take through the Access path
    t = Series.from_list([10, 20, 30], spark=spark)
    assert t[[2, 0, 2]].to_list() == [30, 10, 30]
