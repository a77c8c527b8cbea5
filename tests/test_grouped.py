"""Grouped-op suite: every verb × grouped frame (mirrors the reference's
test/explorer/data_frame/grouped_test.exs)."""

import pytest

import explorer_spark as ex
from explorer_spark import col, f, lit


@pytest.fixture(scope="module")
def df(spark):
    return ex.from_columns(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "x": [3, 1, 2, 10, 20, 100],
            "y": [1.0, None, 3.0, 4.0, 5.0, 6.0],
        },
        spark=spark,
    )


def test_grouped_summarise_multi(df):
    out = (
        df.group_by("g")
        .summarise(n=f.size(col("x")), sx=f.sum(col("x")), my=f.mean(col("y")), ny=f.nil_count(col("y")))
        .sort_by("g")
        .to_columns()
    )
    assert out["n"] == [3, 2, 1]
    assert out["sx"] == [6, 30, 100]
    assert out["ny"] == [1, 0, 0]


def test_grouped_mutate_agg_broadcast(df):
    out = df.group_by("g").mutate(r=col("x") - f.mean(col("x"))).ungroup().sort_by("g", "x").to_columns()
    assert out["r"] == [-1.0, 0.0, 1.0, -5.0, 5.0, 0.0]


def test_grouped_filter_agg(df):
    out = df.group_by("g").filter(col("x") > f.mean(col("x"))).ungroup().sort_by("x").to_columns()
    assert out["x"] == [3, 20]


def test_grouped_head_tail_slice(df):
    assert sorted(df.group_by("g").head(1).to_columns()["x"]) == [3, 10, 100]
    assert sorted(df.group_by("g").tail(1).to_columns()["x"]) == [2, 20, 100]
    assert sorted(df.group_by("g").slice(1, 1).to_columns()["x"]) == [1, 20]


def test_grouped_sort_within(df):
    out = df.group_by("g").sort_by("x").to_columns()
    assert out["x"] == [1, 2, 3, 10, 20, 100]
    assert out["g"] == ["a", "a", "a", "b", "b", "c"]
    desc = df.group_by("g").sort_by("x", descending=True).to_columns()
    assert desc["x"] == [3, 2, 1, 20, 10, 100]


def test_grouped_sort_preserves_group_positions(spark):
    """Reference lazy_test.exs:780 (polars window-sort guide grid):
    grouped sort is a within-group permutation that leaves each group's
    original row POSITIONS fixed — groups are not re-blocked."""
    d = ex.from_columns(
        {
            "name": ["Slowpoke", "Slowbro", "SlowbroMega", "Exeggcute", "Exeggutor", "Starmie", "Jynx"],
            "type1": ["Water", " Water", "Water", "Grass", "Grass", "Water", "Ice"],
            "speed": [15, 30, 30, 40, 55, 115, 95],
        },
        spark=spark,
    )
    out = d.group_by("type1").sort_by("speed", descending=True)
    rows = [(r["name"], r["speed"]) for r in out.to_rows()]
    assert rows == [
        ("Starmie", 115),
        ("Slowbro", 30),
        ("SlowbroMega", 30),
        ("Exeggutor", 55),
        ("Exeggcute", 40),
        ("Slowpoke", 15),
        ("Jynx", 95),
    ]


def test_sort_by_window_expression_key(spark):
    """Reference lazy_test.exs:768: sort_with by a window function key."""
    d = ex.from_columns({"a": [1, 2, 4, 3, 6, 5], "b": ["a", "b", "d", "c", "f", "e"]}, spark=spark)
    out = d.sort_with(lambda df: [("desc", f.window_mean(col("a"), 2))])
    cols = out.to_columns()
    assert cols["a"] == [5, 6, 3, 4, 2, 1]
    assert cols["b"] == ["e", "f", "c", "d", "b", "a"]


def test_grouped_shift_cumsum(df):
    out = (
        df.group_by("g")
        .mutate(prev=f.shift(col("x"), 1), run=f.cumulative_sum(col("x")))
        .ungroup()
        .to_columns()
    )
    assert out["prev"] == [None, 3, 1, None, 10, None]
    assert out["run"] == [3, 4, 6, 10, 30, 100]


def test_grouped_rank(df):
    out = df.group_by("g").mutate(r=f.rank(col("x"))).ungroup().to_columns()
    assert out["r"] == [3, 1, 2, 1, 2, 1]


def test_group_after_join_kept(spark):
    left = ex.from_columns({"k": [1, 2], "v": [10, 20]}, spark=spark).group_by("k")
    right = ex.from_columns({"k": [1, 2], "w": [5, 6]}, spark=spark)
    joined = left.join(right, on="k")
    assert joined.groups == ["k"]  # left side's groups survive


def test_ungroup_partial(df):
    g2 = df.group_by("g", "x")
    assert g2.groups == ["g", "x"]
    assert g2.ungroup("x").groups == ["g"]
    assert g2.ungroup().groups == []


def test_grouped_summarise_stable_first_appearance_order(spark):
    d = ex.from_columns({"g": ["z", "a", "z", "m"], "x": [1, 2, 3, 4]}, spark=spark)
    out = d.group_by("g").summarise(s=f.sum(col("x")))
    # rows exist for each group; order is engine-defined, values exact
    got = dict(zip(out.to_columns()["g"], out.to_columns()["s"]))
    assert got == {"z": 4, "a": 2, "m": 4}


def test_grouped_distinct(df):
    out = df.group_by("g").distinct(["g"]).sort_by("g").to_columns()
    assert out["g"] == ["a", "b", "c"]


def test_grouped_mode_returns_tied_list(spark):
    """mode() returns ALL tied modes as a sorted LIST (reference
    series.ex:2640-2680; grouped_test.exs 'using mode' asserts the
    {:list, inner} summarise dtype). Implemented via the per-(group,
    value) count kernel (frame._rewrite_modes) — never F.mode's
    arbitrary single pick, never a whole-group buffer."""
    from explorer_spark import functions as f
    from explorer_spark.functions import col
    from explorer_spark.sources import from_columns

    df = from_columns(
        {"g": ["a", "a", "b", "b", "b"], "v": [0.2, 0.2, 1.3, 1.3, 2.0]}, spark=spark
    ).group_by("g")
    out = df.summarise(m=f.mode(col("v")))
    assert out.dtypes["m"] == ("list", ("f", 64))
    assert out.to_columns()["m"] == [[0.2], [1.3]]
    # ungrouped tie -> multi-element list; nulls don't count
    un = from_columns({"v": [1.0, 2.0, 2.0, 3.0, 3.0]}, spark=spark)
    assert un.summarise(m=f.mode(col("v"))).to_columns()["m"] == [[2.0, 3.0]]
    nl = from_columns({"v": [1, 2, 2, None]}, spark=spark)
    assert nl.summarise(m=f.mode(col("v"))).to_columns()["m"] == [[2]]
    # mutate broadcasts the list per group
    assert df.mutate(m=f.mode(col("v"))).to_columns()["m"] == [
        [0.2], [0.2], [1.3], [1.3], [1.3]
    ]


def test_grouped_sample_population_and_stable_flag(spark):
    """Reference grouped_test.exs: oversampling a group without
    replacement raises (polars' population error); changing the stable
    flag after the first group_by raises."""
    import pytest as _pytest

    from explorer_spark.sources import from_columns

    df = from_columns(
        {"g": ["a"] * 5 + ["b"] * 5, "v": list(range(10))}, spark=spark
    ).group_by("g")
    with _pytest.raises(ValueError, match="larger sample"):
        df.sample(8, seed=100)
    with _pytest.raises(ValueError, match="larger sample"):
        df.sample(1.2, seed=100)
    assert df.sample(8, seed=100, replace=True).n_rows() == 16
    assert df.sample(1.2, seed=100, replace=True).n_rows() == 12

    base = from_columns({"a": [1], "b": [2]}, spark=spark)
    with _pytest.raises(ValueError, match="stable"):
        base.group_by("a", stable=True).group_by("b", stable=False)
    base.group_by("a", stable=True).group_by("b", stable=True)  # same flag ok


def test_window_over_aggregation_raises(spark):
    """A window function over an aggregate inside summarise raises
    (reference grouped_test.exs:466 — the agg collapses the rows the
    window would scan); an aggregate OVER a window stays legal."""
    import pytest as _pytest

    from explorer_spark import functions as f
    from explorer_spark.functions import col
    from explorer_spark.sources import from_columns

    df = from_columns({"g": ["a", "b"], "v": [1.0, 2.0]}, spark=spark).group_by("g")
    with _pytest.raises(ValueError, match="aggregation operation inside"):
        df.summarise(x=f.window_mean(f.max(col("v")), 2))
    ok = from_columns({"g": ["a", "a", "a"], "v": [1.0, 3.0, 5.0]}, spark=spark).group_by("g")
    assert ok.summarise(mx=f.max(f.window_mean(col("v"), 2))).to_columns()["mx"] == [4.0]
