"""The Series function vocabulary as free functions returning ``Expr``.

One function per LazySeries op (reference lazy_series.ex:23-174); names
follow the reference (``Explorer.Series.sum`` → ``f.sum``). Each simply
builds an IR node — lowering lives in ``expr.py``.
"""

from __future__ import annotations

from .expr import Expr, _wrap, col, lit  # noqa: F401


def _mk(op):
    def fn(*args):
        return Expr(op, *[_wrap(a) if i == 0 else a for i, a in enumerate(args)])

    fn.__name__ = op
    return fn


def _mk_all_expr(op):
    def fn(*args):
        return Expr(op, *[_wrap(a) for a in args])

    fn.__name__ = op
    return fn


# aggregations -------------------------------------------------------------
sum = _mk("sum")
min = _mk("min")
max = _mk("max")
mean = _mk("mean")
median = _mk("median")
mode = _mk("mode")
count = _mk("count")
size = _mk("size")
nil_count = _mk("nil_count")
first = _mk("first")
last = _mk("last")
n_distinct = _mk("n_distinct")
product = _mk("product")
variance = _mk("variance")
standard_deviation = _mk("standard_deviation")
quantile = _mk("quantile")
skew = _mk("skew")
argmin = _mk("argmin")
argmax = _mk("argmax")
all = _mk("all")
any = _mk("any")


def correlation(a, b, method: str = "pearson"):
    return Expr("correlation", _wrap(a), _wrap(b), method)


def covariance(a, b, ddof: int = 1):
    return Expr("covariance", _wrap(a), _wrap(b), ddof)


# arithmetic / math --------------------------------------------------------
add = _mk_all_expr("add")
subtract = _mk_all_expr("subtract")
multiply = _mk_all_expr("multiply")
divide = _mk_all_expr("divide")
quotient = _mk_all_expr("quotient")
remainder = _mk_all_expr("remainder")
pow = _mk_all_expr("pow")
log = _mk("log")
log_natural = _mk("log_natural")
exp = _mk("exp")
abs = _mk("abs")
sqrt = _mk("sqrt")
clip = _mk("clip")
sin = _mk("sin")
cos = _mk("cos")
tan = _mk("tan")
asin = _mk("asin")
acos = _mk("acos")
atan = _mk("atan")
degrees = _mk("degrees")
radians = _mk("radians")
round = _mk("round")
floor = _mk("floor")
ceil = _mk("ceil")

# comparison / predicates ----------------------------------------------------
equal = _mk_all_expr("equal")
not_equal = _mk_all_expr("not_equal")
greater = _mk_all_expr("greater")
greater_equal = _mk_all_expr("greater_equal")
less = _mk_all_expr("less")
less_equal = _mk_all_expr("less_equal")
binary_and = _mk_all_expr("binary_and")
binary_or = _mk_all_expr("binary_or")
unary_not = _mk("unary_not")
is_nil = _mk("is_nil")
is_not_nil = _mk("is_not_nil")
is_nan = _mk("is_nan")
is_finite = _mk("is_finite")
is_infinite = _mk("is_infinite")


def isin(a, values):
    return Expr("binary_in", _wrap(a), list(values))


def between(a, lo, hi):
    return Expr("between", _wrap(a), _wrap(lo), _wrap(hi))


def all_equal(a, b):
    """True when the two series are element-wise equal (nil == nil),
    reference Series.all_equal."""
    return Expr("all_equal", _wrap(a), _wrap(b))


# conditional / null handling ------------------------------------------------
def select(predicate, on_true, on_false):
    """reference: if/cond in the query DSL (query.ex:692-722)."""
    return Expr("select", _wrap(predicate), _wrap(on_true), _wrap(on_false))


when = select


def coalesce(*xs):
    return Expr("coalesce", *[_wrap(x) for x in xs])


def fill_missing(a, strategy_or_value):
    """:forward/:backward/:min/:max/:mean or a literal value
    (reference series.ex:5594-5628)."""
    if strategy_or_value == "forward":
        return Expr("fill_missing_forward", _wrap(a))
    if strategy_or_value == "backward":
        return Expr("fill_missing_backward", _wrap(a))
    if strategy_or_value in ("min", "max", "mean"):
        return coalesce(_wrap(a), Expr(strategy_or_value, _wrap(a)))
    if strategy_or_value == "nan":
        return coalesce(_wrap(a), lit(float("nan")))
    return Expr("fill_missing_with_value", _wrap(a), _wrap(strategy_or_value))


# order-dependent ------------------------------------------------------------
def shift(a, offset: int, default=None):
    return Expr("shift", _wrap(a), offset, default)


def row_index(_series=None):
    """0-based row index (reference row_index/1 takes a series argument
    purely to anchor the row count — accepted and ignored here; the
    frame's hidden order column is the position source either way)."""
    return Expr("row_index")


def rank(a, method: str = "average", descending: bool = False, seed: int | None = None):
    return Expr("rank", _wrap(a), method, descending, seed)


def cumulative_sum(a, reverse: bool = False):
    return Expr("cumulative_sum", _wrap(a), reverse)


def cumulative_min(a, reverse: bool = False):
    return Expr("cumulative_min", _wrap(a), reverse)


def cumulative_max(a, reverse: bool = False):
    return Expr("cumulative_max", _wrap(a), reverse)


def cumulative_product(a, reverse: bool = False):
    return Expr("cumulative_product", _wrap(a), reverse)


def cumulative_count(a, reverse: bool = False):
    return Expr("cumulative_count", _wrap(a), reverse)


def peaks(a, mode: str = "max"):
    return Expr("peaks", _wrap(a), mode)


# rolling windows (reference series.ex:5123-5342) ---------------------------
def _mk_window(op):
    def fn(a, window_size: int, weights=None, min_periods=None, center: bool = False):
        return Expr(op, _wrap(a), window_size, weights, min_periods, center)

    fn.__name__ = op
    return fn


window_sum = _mk_window("window_sum")
window_mean = _mk_window("window_mean")
window_median = _mk_window("window_median")
window_min = _mk_window("window_min")
window_max = _mk_window("window_max")
window_standard_deviation = _mk_window("window_standard_deviation")


# strings ----------------------------------------------------------------
def contains(a, pattern: str):
    return Expr("contains", _wrap(a), pattern)


def re_contains(a, pattern: str):
    return Expr("re_contains", _wrap(a), pattern)


upcase = _mk("upcase")
downcase = _mk("downcase")


def strip(a, chars: str | None = None):
    return Expr("strip", _wrap(a), chars)


def lstrip(a, chars: str | None = None):
    return Expr("lstrip", _wrap(a), chars)


def rstrip(a, chars: str | None = None):
    return Expr("rstrip", _wrap(a), chars)


def substring(a, offset: int, length: int | None = None):
    return Expr("substring", _wrap(a), offset, length)


def split(a, sep: str):
    return Expr("split", _wrap(a), sep)


def replace(a, pattern: str, replacement: str):
    return Expr("replace", _wrap(a), pattern, replacement)


def re_replace(a, pattern: str, replacement: str):
    return Expr("re_replace", _wrap(a), pattern, replacement)


def count_matches(a, pattern: str):
    return Expr("count_matches", _wrap(a), pattern)


def re_count_matches(a, pattern: str):
    return Expr("re_count_matches", _wrap(a), pattern)


def re_scan(a, pattern: str):
    return Expr("re_scan", _wrap(a), pattern)


string_length = _mk("string_length")
# reference lengths/1 is the LIST-series op (series.ex:6832); the string
# form stays available as string_length
lengths = _mk("list_lengths")


def concat(*xs):
    return Expr("concat", *[_wrap(x) for x in xs])


def format(xs):
    # nil literal parts are DROPPED (reference format/1:
    # format(["a", nil, "b"]) == ["ab"]); nil VALUES inside a series
    # still null the row, matching polars concat_str
    return Expr("format", [_wrap(x) for x in xs if x is not None])


# temporal ----------------------------------------------------------------
year = _mk("year")
month = _mk("month")
day_of_month = _mk("day_of_month")
day_of_week = _mk("day_of_week")
day_of_year = _mk("day_of_year")
week_of_year = _mk("week_of_year")
iso_year = _mk("iso_year")
quarter_of_year = _mk("quarter_of_year")
hour = _mk("hour")
minute = _mk("minute")
second = _mk("second")
is_leap_year = _mk("is_leap_year")
to_date = _mk("to_date")
nanosecond = _mk("nanosecond")
days_of_month = _mk("days_of_month")
to_time = _mk("to_time")


def duration_total(a, precision: str = "us"):
    """Duration (datetime - datetime) -> integer count of units, truncated
    toward zero — the reference's duration-to-integer cast (durations ARE
    unit counts there, shared.ex:12-22). precision: us/ms/s/ns (+ long
    names)."""
    return Expr("duration_total", _wrap(a), precision)


def strftime(a, fmt: str):
    return Expr("strftime", _wrap(a), fmt)


def strptime(a, fmt: str):
    return Expr("strptime", _wrap(a), fmt)


# lists / structs / json ---------------------------------------------------
def join(a, sep: str):
    return Expr("list_join", _wrap(a), sep)


list_lengths = _mk("list_lengths")


def member(a, value):
    return Expr("list_member", _wrap(a), value)


def field(a, name: str):
    return Expr("field", _wrap(a), name)


def json_path_match(a, path: str):
    return Expr("json_path_match", _wrap(a), path)


def json_decode(a, dtype):
    return Expr("json_decode", _wrap(a), dtype)


def split_into(a, sep: str, fields: list[str]):
    """Split into a struct with named fields (reference expressions.rs:1186)."""
    return Expr("split_into", _wrap(a), sep, list(fields))


def _capture_group_names(pattern: str) -> list[str]:
    """Capture-group names from a regex: named groups keep their name,
    unnamed ones get their 1-based index as a string (the reference's
    rendering, series.ex re_named_captures doctest)."""
    import re as _re

    names, idx, i = [], 0, 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "[":
            i += 1
            while i < len(pattern) and pattern[i] != "]":
                i += 2 if pattern[i] == "\\" else 1
            i += 1
            continue
        if ch == "(":
            if pattern[i : i + 2] == "(?":
                m = _re.match(r"\(\?P?<([A-Za-z_][A-Za-z0-9_]*)>", pattern[i:])
                if m:
                    idx += 1
                    names.append(m.group(1))
                # (?: / lookarounds: not capturing
            else:
                idx += 1
                names.append(str(idx))
        i += 1
    return names


def re_named_captures(a, pattern: str, names: list[str] | None = None):
    """Regex named-capture groups -> struct (reference expressions.rs:1230).
    ``names`` lists the capture groups in order."""
    if names is None:
        names = _capture_group_names(pattern)
    return Expr("re_named_captures", _wrap(a), pattern, list(names))


def cast(a, dtype):
    return Expr("cast", _wrap(a), dtype)
