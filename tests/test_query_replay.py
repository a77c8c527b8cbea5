"""Explorer.Query semantics beyond the doctest corpus — mirrored from
the reference's test/explorer/query_test.exs, replayed through the same
restricted-Elixir evaluator the doctest corpus uses (statements parsed
by tools/extract_doctests_v2.parse_expr_src).

The Python-API user expresses these as plain loops/selects; what these
pin is the QUERY-MACRO semantics (cond fallthrough to nil, pins inside
clauses, multi-generator cross products, <>/and/or/not with scalars)
against the engine's select/concat/boolean kernels.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "support"))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tools"))

import doctest_eval as de  # noqa: E402
from extract_doctests_v2 import parse_expr_src  # noqa: E402


def _run(spark, *stmts):
    ev = de.Ev(spark)
    case = {"stmts": [parse_expr_src(s) for s in stmts], "file": "x", "line": 0}
    return ev.run(case)


def test_cond_without_catchall_yields_nil(spark):  # query_test.exs:30
    out = _run(
        spark,
        'df = Explorer.DataFrame.new(names: ["Alice", "Bob", "John"], grade: [10, 4, 6])',
        'Explorer.DataFrame.mutate(df, simple_result: cond do grade > 9 -> "Exceptional" grade > 5 -> "Passed" end)',
    )
    assert out.to_columns()["simple_result"] == ["Exceptional", None, "Passed"]


def test_cond_catchall_with_cast(spark):  # query_test.exs:40
    out = _run(
        spark,
        "df = Explorer.DataFrame.new(grade: [10, 4, 6])",
        'Explorer.DataFrame.mutate(df, result: cond do grade > 9 -> "Exceptional" grade > 5 -> "Passed" true -> cast(grade, :string) end)',
    )
    assert out.to_columns()["result"] == ["Exceptional", "4", "Passed"]


def test_cond_pins_in_clauses(spark):  # query_test.exs:52
    out = _run(
        spark,
        "df = Explorer.DataFrame.new(grade: [10, 4, 6])",
        "column = :grade",
        'passed = "Passed"',
        "last = true",
        'Explorer.DataFrame.mutate(df, result: cond do col(^column) > 9 -> "Exceptional" col(^column) > 5 -> ^passed ^last -> "Fallback" end)',
    )
    assert out.to_columns()["result"] == ["Exceptional", "Fallback", "Passed"]


def test_if_unless_macros(spark):  # query_test.exs:71
    out = _run(
        spark,
        "df = Explorer.DataFrame.new(grade: [10, 4, 6])",
        'Explorer.DataFrame.mutate(df, a: if(grade > 5, do: "pass", else: "fail"), b: unless(grade > 5, do: "fail", else: "pass"))',
    )
    cols = out.to_columns()
    assert cols["a"] == ["pass", "fail", "pass"]
    assert cols["b"] == ["pass", "fail", "pass"]


def test_multi_generator_cross_product(spark):  # query_test.exs:215
    out = _run(
        spark,
        "df = Explorer.DataFrame.new(a: [1, 2, 3], b: [10.0, 20.0, 30.0])",
        'Explorer.DataFrame.mutate(df, for col_a <- across(["a", "b"]), col_b <- across(["b", "a"]) do {"#{col_a.name}_#{col_b.name}", col_a - 2 * col_b} end)',
    )
    cols = out.to_columns()
    assert cols["a_b"] == [-19.0, -38.0, -57.0]
    assert cols["a_a"] == [-1, -2, -3]
    assert cols["b_b"] == [-10.0, -20.0, -30.0]
    assert cols["b_a"] == [8.0, 16.0, 24.0]


def test_string_concat_in_query(spark):  # query_test.exs:235
    out = _run(
        spark,
        'df = Explorer.DataFrame.new(names: ["Alice", "Bob"])',
        'Explorer.DataFrame.mutate(df, greeting: "Hello, " <> names <> "!")',
    )
    assert out.to_columns()["greeting"] == ["Hello, Alice!", "Hello, Bob!"]


def test_boolean_scalars_in_query(spark):  # query_test.exs:253-311
    out = _run(
        spark,
        "df = Explorer.DataFrame.new(a: [true, false, true], n: [1, 2, 3])",
        "Explorer.DataFrame.mutate(df, both: a and n > 1, either: a or n > 2, neg: not a)",
    )
    cols = out.to_columns()
    assert cols["both"] == [False, False, True]
    assert cols["either"] == [True, False, True]
    assert cols["neg"] == [False, True, False]
