"""Property-based tests (reference: StreamData generator over the dtype
space, test/support/generator.ex; invariants on inference and round-trips
— 'issues usually stem from empty lists and nils')."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import explorer_spark as ex
from explorer_spark import Series, col, f

_SETTINGS = dict(
    max_examples=12,  # each example spins Spark jobs — keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ints = st.lists(st.one_of(st.integers(min_value=-(2**31), max_value=2**31), st.none()), min_size=1, max_size=20)
floats = st.lists(
    st.one_of(st.floats(allow_nan=False, allow_infinity=False, width=32), st.none()), min_size=1, max_size=20
)
strings = st.lists(st.one_of(st.text(max_size=12), st.none()), min_size=1, max_size=15)


@given(xs=ints)
@settings(**_SETTINGS)
def test_int_roundtrip_and_sum(spark, xs):
    s = Series.from_list(xs, dtype=("s", 64), name="v", spark=spark)
    assert s.to_list() == xs
    present = [x for x in xs if x is not None]
    assert s.sum() == (sum(present) if present else None)
    assert s.nil_count() == xs.count(None)


@given(xs=floats)
@settings(**_SETTINGS)
def test_float_sort_is_ordered_nulls_last(spark, xs):
    s = Series.from_list(xs, dtype=("f", 64), name="v", spark=spark)
    out = s.sort().to_list()
    vals = [x for x in out if x is not None]
    assert vals == sorted(vals)
    n_null = len([x for x in out if x is None])
    assert out[len(out) - n_null :] == [None] * n_null


@given(xs=strings)
@settings(**_SETTINGS)
def test_string_distinct_subset(spark, xs):
    s = Series.from_list(xs, dtype="string", name="v", spark=spark)
    d = s.unordered_distinct().to_list()
    assert set(x for x in d if x is not None) == set(x for x in xs if x is not None)
    assert len(d) == len(set(xs))


@given(xs=ints)
@settings(**_SETTINGS)
def test_shift_inverse(spark, xs):
    s = Series.from_list(xs, dtype=("s", 64), name="v", spark=spark)
    shifted = s.shift(1).to_list()
    assert shifted == [None] + xs[:-1]


@given(xs=floats)
@settings(**_SETTINGS)
def test_fill_forward_no_new_nulls_after_first(spark, xs):
    s = Series.from_list(xs, dtype=("f", 64), name="v", spark=spark)
    out = s.fill_missing("forward").to_list()
    seen_value = False
    for orig, filled in zip(xs, out):
        if orig is not None:
            seen_value = True
            assert filled == orig
        elif seen_value:
            assert filled is not None


@given(xs=ints)
@settings(**_SETTINGS)
def test_concat_rows_length(spark, xs):
    a = ex.from_columns({"v": xs}, spark=spark)
    b = ex.from_columns({"v": xs}, spark=spark)
    assert a.concat_rows(b).n_rows() == 2 * len(xs)
