"""Replay of 151 mechanically-extracted reference doctests
(lib/explorer/series.ex iex> blocks of the single-op shapes:
from_list -> op(series, literal/series args) -> series-or-scalar
result). The snapshot lives in tests/support/reference_doctests.json;
regenerating it requires the reference tree (see NOTES_r10 for the
extractor). This caught the cumulative-nil, clip-null, in/2-nil and
quantile-of-time divergences when run against the live tree."""

import datetime as dtm
import json
import math
import os

import pytest

from explorer_spark import Series

CASES = json.load(
    open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "support", "reference_doctests.json"))
)


def _decode(v, spark):
    if isinstance(v, dict):
        if "__date__" in v:
            return dtm.date(*v["__date__"])
        if "__ndt__" in v:
            return dtm.datetime(*v["__ndt__"])
        if "__time__" in v:
            h, m, s, us = v["__time__"]
            return dtm.time(h, m, s, us)
        if "__series__" in v:
            return Series.from_list(
                [_decode(x, spark) for x in v["__series__"]], name="arg", spark=spark
            )
    return v


def _eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float) and (math.isnan(a) or math.isnan(b)):
        return math.isnan(a) and math.isnan(b)
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if (
        isinstance(a, (int, float))
        and isinstance(b, (int, float))
        and not isinstance(a, bool)
        and not isinstance(b, bool)
    ):
        return abs(a - b) < 1e-9 or (b != 0 and abs(a / b - 1) < 1e-9)
    return a == b


OP_MAP = {"in": "isin"}


def test_reference_series_doctests(spark):
    fails = []
    for c in CASES["series"]:
        s = Series.from_list([_decode(v, spark) for v in c["input"]], name="x", spark=spark)
        fn = getattr(s, OP_MAP.get(c["op"], c["op"]))
        got = fn(*[_decode(a, spark) for a in c["args"]])
        got = got.to_list() if isinstance(got, Series) else got
        want = [_decode(v, spark) for v in c["expected"]]
        if len(got) != len(want) or not all(_eq(a, b) for a, b in zip(got, want)):
            fails.append((c["line"], c["op"], got, want))
    assert not fails, fails


def test_reference_scalar_doctests(spark):
    fails = []
    for c in CASES["scalar"]:
        s = Series.from_list([_decode(v, spark) for v in c["input"]], name="x", spark=spark)
        fn = getattr(s, OP_MAP.get(c["op"], c["op"]))
        got = fn(*[_decode(a, spark) for a in c["args"]])
        if isinstance(got, Series):
            got = got.to_list()
        want = _decode(c["expected"], spark)
        if not _eq(got, want):
            fails.append((c["line"], c["op"], got, want))
    assert not fails, fails
