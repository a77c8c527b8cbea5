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


_DTYPE_TOK = {
    ":integer": ("s", 64), ":float": ("f", 64), ":boolean": "boolean",
    ":string": "string", ":binary": "binary", ":date": "date", ":time": "time",
    ":category": "category", ":s8": ("s", 8), ":s16": ("s", 16), ":s32": ("s", 32),
    ":u8": ("u", 8), ":u16": ("u", 16), ":u32": ("u", 32), ":u64": ("u", 64),
    ":f32": ("f", 32), ":f64": ("f", 64),
    "{:f, 32}": ("f", 32), "{:s, 8}": ("s", 8), "{:s, 16}": ("s", 16), "{:s, 32}": ("s", 32),
    "{:duration, :millisecond}": ("duration", "ms"),
    "{:naive_datetime, :millisecond}": ("naive_datetime", "ms"),
}


def _decode2(v, spark):
    if isinstance(v, dict):
        if "__atom__" in v:
            return v["__atom__"]
        if "__series__" in v and isinstance(v["__series__"], dict):
            b = v["__series__"]
            return Series.from_list(
                [_decode2(x, spark) for x in b["vals"]],
                name="arg",
                dtype=_DTYPE_TOK.get(b["dtype"]) if b["dtype"] else None,
                spark=spark,
            )
    return _decode(v, spark)


_SKIP = object()  # untranslated dtype token — distinct from a None result


def _run_kw_case(c, spark):
    inp = c["input"]
    dty = _DTYPE_TOK.get(inp["dtype"]) if inp["dtype"] else None
    if inp["dtype"] and dty is None:
        return _SKIP
    s = Series.from_list([_decode2(v, spark) for v in inp["vals"]], name="x", dtype=dty, spark=spark)
    kwargs = {k: _decode2(v, spark) for k, v in c["kwargs"].items()}
    args = [_decode2(a, spark) for a in c["args"]]
    op = c["op"]
    if op in ("sort", "argsort") and "direction" in kwargs:
        kwargs["descending"] = kwargs.pop("direction") == "desc"
    if op == "rank" and "method" in kwargs:
        args = [kwargs.pop("method")] + args
    if "nils" in kwargs:
        kwargs["nils_last"] = kwargs.pop("nils") == "last"
    if op == "cast":
        tok = c["args"][0]
        key = ":" + tok["__atom__"] if isinstance(tok, dict) and "__atom__" in tok else tok
        t = _DTYPE_TOK.get(key)
        if t is None:
            return _SKIP
        args = [t]
    got = getattr(s, op)(*args, **kwargs)
    return got.to_list() if isinstance(got, Series) else got


def test_reference_doctests_with_options(spark):
    """Wave-2 corpus: doctests with dtype'd inputs, atom args and
    keyword options (sort direction, rank method, fill strategies,
    casts). rank(:random) is excluded — seeded RNG values are
    engine-specific by design."""
    fails = []
    for c in CASES["series_kw"]:
        got = _run_kw_case(c, spark)
        if got is _SKIP:
            continue
        want = [_decode2(v, spark) for v in c["expected"]]
        if len(got) != len(want) or not all(_eq(a, b) for a, b in zip(got, want)):
            fails.append((c["line"], c["op"], got, want))
    for c in CASES["scalar_kw"]:
        got = _run_kw_case(c, spark)
        if got is _SKIP:
            continue
        want = _decode2(c["expected_scalar"], spark)
        if isinstance(got, list) or not _eq(got, want):
            fails.append((c["line"], c["op"], got, want))
    assert not fails, fails


def _decode_df_arg(v, spark):
    if isinstance(v, dict):
        if "__atom__" in v:
            return v["__atom__"]
        if "__kwlist__" in v:
            return {k: _decode_df_arg(x, spark) for k, x in v["__kwlist__"].items()}
    if isinstance(v, list):
        return [_decode_df_arg(x, spark) for x in v]
    return _decode(v, spark)


def test_reference_dataframe_doctests(spark):
    """DataFrame doctests of the plain-verb shape (select/discard/
    drop_nil/dummies/mask/rename/slice/transpose/nil_count/
    correlation/covariance) replayed against the rendered output
    blocks — this corpus surfaced the dummies only-flag-columns /
    first-appearance-order and mask-accepts-list divergences."""
    import explorer_spark as ex

    fails = []
    for c in CASES["dataframe"]:
        df = ex.from_columns(c["cols"], spark=spark)
        out = getattr(df, c["verb"])(*[_decode_df_arg(a, spark) for a in c["args"]])
        got = out.to_columns() if hasattr(out, "to_columns") else out
        want_names = [o[0] for o in c["out"]]
        want = {o[0]: [_decode(v, spark) for v in o[2]] for o in c["out"]}
        if list(got.keys()) != want_names:
            fails.append((c["line"], c["verb"], list(got.keys()), want_names))
            continue
        for k in want_names:
            a, b = got[k], want[k]
            if len(a) != len(b) or not all(_eq(x, y) for x, y in zip(a, b)):
                fails.append((c["line"], c["verb"], got, want))
                break
    assert not fails, fails
