"""Rolling/EWM/cut operators vs pandas reference semantics."""

import pandas as pd
import pytest

import explorer_spark as ex
from explorer_spark import col, f


@pytest.fixture(scope="module")
def df(spark):
    return ex.from_columns(
        {"x": [1.0, 2.0, None, 4.0, 5.0, 6.0], "g": ["a", "a", "a", "b", "b", "b"]},
        spark=spark,
    )


def test_window_sum_mean(df):
    out = df.mutate(
        rsum=f.window_sum(col("x"), 3),
        rmean=f.window_mean(col("x"), 3),
        rmin=f.window_min(col("x"), 2),
        rmax=f.window_max(col("x"), 2),
    ).to_columns()
    # nulls are skipped inside the window (SQL agg semantics)
    assert out["rsum"] == [1.0, 3.0, 3.0, 6.0, 9.0, 15.0]
    assert out["rmin"] == [1.0, 1.0, 2.0, 4.0, 4.0, 5.0]
    assert out["rmax"] == [1.0, 2.0, 2.0, 4.0, 5.0, 6.0]


def test_window_min_periods(df):
    out = df.mutate(r=f.window_sum(col("x"), 3, min_periods=3)).to_columns()
    assert out["r"][0] is None  # min_periods counts non-null values
    assert out["r"][1] is None
    assert out["r"][4] is None  # window (None, 4, 5) has 2 non-null
    assert out["r"][5] == 15.0  # window (4, 5, 6)


def test_window_center(df):
    out = df.mutate(r=f.window_sum(col("x"), 3, center=True)).to_columns()
    # window is (i-1, i, i+1)
    assert out["r"] == [3.0, 3.0, 6.0, 9.0, 15.0, 11.0]


def test_window_weighted():
    d = ex.from_columns({"x": [1.0, 2.0, 3.0, 4.0]})
    out = d.mutate(r=f.window_sum(col("x"), 2, weights=[1.0, 2.0])).to_columns()
    # weights[0] -> oldest: r[i] = 1*x[i-1] + 2*x[i]
    assert out["r"] == [2.0, 5.0, 8.0, 11.0]
    wm = d.mutate(r=f.window_mean(col("x"), 2, weights=[1.0, 3.0])).to_columns()
    # partial first window normalizes by the weights actually present
    assert wm["r"] == [1.0, (1 + 6) / 4, (2 + 9) / 4, (3 + 12) / 4]


def test_window_median():
    d = ex.from_columns({"x": [float(i) for i in range(1, 11)]})
    out = d.mutate(r=f.window_median(col("x"), 4)).to_columns()
    # reference doctest series.ex:5182 — mean-of-middles for even counts
    assert out["r"] == [1.0, 1.5, 2.0, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5]


def test_window_median_center_nulls(df):
    out = df.mutate(r=f.window_median(col("x"), 3, center=True)).to_columns()
    # windows: [1,2],[1,2,nil],[2,nil,4],[nil,4,5],[4,5,6],[5,6]
    assert out["r"] == [1.5, 1.5, 3.0, 4.5, 5.0, 5.5]


def test_window_min_max_weighted():
    d = ex.from_columns({"x": [float(i) for i in range(1, 11)]})
    out = d.mutate(
        mn=f.window_min(col("x"), 2, weights=[1.0, 2.0]),
        mx=f.window_max(col("x"), 2, weights=[1.0, 2.0]),
    ).to_columns()
    # reference doctests series.ex:5229 / 5262 (elementwise scale, then min/max)
    assert out["mn"] == [2.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    assert out["mx"] == [2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 14.0, 16.0, 18.0, 20.0]


def test_window_std_weighted():
    d = ex.from_columns({"x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    out = d.mutate(r=f.window_standard_deviation(col("x"), 2, weights=[0.25, 0.75])).to_columns()
    # reference doctest series.ex:5296 — biased weighted variance
    want = [0.0] + [0.4330127018922193] * 5
    assert out["r"] == pytest.approx(want)


def test_window_median_weighted():
    d = ex.from_columns({"x": [1.0, 2.0, 3.0, 4.0]})
    out = d.mutate(r=f.window_median(col("x"), 2, weights=[1.0, 1.0])).to_columns()
    # equal weights degenerate to cumulative-weight interpolation:
    # full window [a, b] with equal weights -> target at midpoint of b's span
    # after a's full span -> interpolates between a and b
    assert out["r"][0] == 1.0  # single-value window
    for i, (a, b) in enumerate(zip([1.0, 2.0, 3.0], [2.0, 3.0, 4.0]), start=1):
        lo_, hi_ = sorted((a, b))
        assert lo_ <= out["r"][i] <= hi_


def test_window_sum_weighted_center():
    d = ex.from_columns({"x": [1.0, 2.0, 3.0, 4.0]})
    out = d.mutate(r=f.window_sum(col("x"), 3, weights=[1.0, 2.0, 3.0], center=True)).to_columns()
    # centered window (i-1, i, i+1), weights oldest-first
    assert out["r"] == [
        2.0 * 1 + 3.0 * 2,  # [_, 1, 2]
        1.0 * 1 + 2.0 * 2 + 3.0 * 3,
        1.0 * 2 + 2.0 * 3 + 3.0 * 4,
        1.0 * 3 + 2.0 * 4,  # [3, 4, _]
    ]


def test_grouped_rolling(df):
    out = df.group_by("g").mutate(r=f.window_sum(col("x"), 2)).ungroup().to_columns()
    assert out["r"] == [1.0, 3.0, 2.0, 4.0, 9.0, 11.0]


def test_ewm_mean_matches_pandas(spark):
    xs = [1.0, 3.0, 2.0, 8.0, 5.0]
    d = ex.from_columns({"x": xs}, spark=spark)
    out = d.ewm(m=("mean", "x", 0.3, True)).to_columns()
    want = pd.Series(xs).ewm(alpha=0.3, adjust=True).mean().tolist()
    assert out["m"] == pytest.approx(want)


def test_ewm_grouped(spark):
    d = ex.from_columns({"x": [1.0, 2.0, 3.0, 4.0], "g": ["a", "a", "b", "b"]}, spark=spark)
    out = d.group_by("g").ewm(m=("mean", "x", 0.5, True))
    cols = out.ungroup().sort_by("x").to_columns()
    wa = pd.Series([1.0, 2.0]).ewm(alpha=0.5, adjust=True).mean().tolist()
    wb = pd.Series([3.0, 4.0]).ewm(alpha=0.5, adjust=True).mean().tolist()
    assert cols["m"] == pytest.approx(wa + wb)


def test_ewm_grouped_null_group_key(spark):
    # a null group key is a real group, not dropped (pandas dropna=False)
    d = ex.from_columns(
        {"x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], "g": ["a", "a", None, None, "b", "b"]},
        spark=spark,
    )
    out = d.group_by("g").ewm(m=("mean", "x", 0.5, True))
    cols = out.ungroup().sort_by("x").to_columns()
    want = []
    for lo, hi in [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]:
        want += pd.Series([lo, hi]).ewm(alpha=0.5, adjust=True).mean().tolist()
    assert cols["m"] == pytest.approx(want)
    assert all(v is not None for v in cols["m"])


def test_cut():
    d = ex.from_columns({"v": [1.0, 5.0, 15.0, None]})
    out = d.cut("v", [3.0, 10.0], labels=["lo", "mid", "hi"]).to_columns()
    assert out["category"] == ["lo", "mid", "hi", None]
    assert out["break_point"] == [3.0, 10.0, float("inf"), None]


def test_qcut():
    d = ex.from_columns({"v": [float(i) for i in range(1, 11)]})
    out = d.qcut("v", [0.5], labels=["low", "high"]).to_columns()
    assert out["category"] == ["low"] * 5 + ["high"] * 5


def test_ewm_extreme_alpha_no_overflow(spark):
    """alpha > 0.98 (and var/std past ~0.86, via the c^2 channel) drives
    _geo_scan's 1/c powers toward float64 overflow — the chunk bound must
    keep (1/c)^(chunk-1) finite (review r4: the old bound produced
    NaN/inf for most rows at alpha=0.99)."""
    import random

    rng = random.Random(3)
    xs = [rng.uniform(-10, 10) for _ in range(500)]
    d = ex.from_columns({"x": xs}, spark=spark)
    out = d.ewm(
        m=("mean", "x", 0.99, True),
        v=("variance", "x", 0.9, True),
    ).to_columns()
    wm = pd.Series(xs).ewm(alpha=0.99, adjust=True).mean().tolist()
    wv = pd.Series(xs).ewm(alpha=0.9, adjust=True).var().tolist()
    assert out["m"] == pytest.approx(wm)
    assert out["v"][1:] == pytest.approx(wv[1:])  # first var is NaN both sides
    assert all(v is not None for v in out["m"])
