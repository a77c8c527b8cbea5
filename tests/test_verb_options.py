"""Round-2 verb options: grouped sample, mutate keep:, pivot_wider agg/
deterministic first, asof nearest tie-break."""

import pandas as pd
import pytest

import explorer_spark as ex
from explorer_spark import functions as fns
from explorer_spark.expr import col, lit
from explorer_spark.sources import from_pandas


@pytest.fixture(scope="module")
def grouped(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 4 + ["c"] * 2,
            "x": list(range(12)),
        }
    )
    return from_pandas(pdf, spark=spark)


def test_grouped_sample_n_per_group(grouped):
    out = grouped.group_by("g").sample(2, seed=5).to_pandas()
    counts = out.groupby("g").size().to_dict()
    assert counts == {"a": 2, "b": 2, "c": 2}
    # sampled rows belong to their group
    assert all(r.x // 2 in {0, 1, 2} if r.g == "a" else True for r in out.itertuples())
    # n larger than ANY group raises without replacement (reference
    # grouped_test.exs 'sample more than the size ... without
    # replacement' — polars' population error; round-8 parity fix: the
    # old clamp-to-group-size behavior was a divergence)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="larger sample"):
        grouped.group_by("g").sample(3, seed=5)


def test_grouped_sample_deterministic(grouped):
    a = grouped.group_by("g").sample(2, seed=9).to_pandas().sort_values(["g", "x"]).values.tolist()
    b = grouped.group_by("g").sample(2, seed=9).to_pandas().sort_values(["g", "x"]).values.tolist()
    assert a == b


def test_grouped_sample_frac_floor(grouped):
    out = grouped.group_by("g").sample(0.5, seed=1).to_pandas()
    assert out.groupby("g").size().to_dict() == {"a": 3, "b": 2, "c": 1}


def test_grouped_sample_replace_exact(grouped):
    # round 4: grouped replace=True is implemented (exact n per group,
    # deterministic hash draws — see test_round4 for the full contract)
    out = grouped.group_by("g").sample(3, replace=True, seed=4).to_pandas()
    assert out.groupby("g").size().to_dict() == {"a": 3, "b": 3, "c": 3}


def test_mutate_keep_none_grouped(grouped):
    out = grouped.group_by("g").mutate_with(keep="none", avg=fns.mean(col("x")))
    assert out.names == ["g", "avg"]
    assert len(out.to_rows()) == 12
    vals = {(r["g"], r["avg"]) for r in out.to_rows()}
    assert vals == {("a", 2.5), ("b", 7.5), ("c", 10.5)}


def test_mutate_keep_none_ungrouped(grouped):
    out = grouped.mutate_with(keep="none", y=col("x") * lit(2))
    assert out.names == ["y"]


def test_mutate_keep_invalid(grouped):
    with pytest.raises(ValueError):
        grouped.mutate_with(keep="bogus", y=col("x"))


def test_pivot_wider_first_is_frame_order(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 1, 2],
            "k": ["x", "x", "y", "x"],
            "v": [10, 20, 30, 40],
        }
    )
    df = from_pandas(pdf, spark=spark)
    out = df.pivot_wider("k", "v", id_columns=["id"], values=["x", "y"]).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    # duplicate (1, x) takes the FIRST value in frame order
    assert out.loc[0, "x"] == 10 and out.loc[0, "y"] == 30
    assert out.loc[1, "x"] == 40 and pd.isna(out.loc[1, "y"])


def test_pivot_wider_agg_param(spark):
    pdf = pd.DataFrame({"id": [1, 1, 2], "k": ["x", "x", "x"], "v": [10.0, 20.0, 5.0]})
    df = from_pandas(pdf, spark=spark)
    out = df.pivot_wider("k", "v", id_columns=["id"], values=["x"], agg="mean").to_pandas()
    assert dict(zip(out["id"], out["x"])) == {1: 15.0, 2: 5.0}


def test_asof_nearest_tie_prefers_earlier(spark):
    left = from_pandas(pd.DataFrame({"t": [10.0]}), spark=spark)
    right = from_pandas(pd.DataFrame({"t": [8.0, 12.0], "tag": ["lo", "hi"]}), spark=spark)
    out = left.join_asof(right, on="t", strategy="nearest").to_pandas()
    assert out.loc[0, "tag"] == "lo"


# ---------------------------------------------------------------------------
# keyless merge-asof kernel (operators/asof.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_frames(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    lt = np.sort(rng.uniform(0, 1000, 400)).round(3)
    rt = np.sort(rng.uniform(-50, 1050, 120)).round(3)
    left = from_pandas(pd.DataFrame({"t": lt, "lid": range(len(lt))}), spark=spark)
    right = from_pandas(pd.DataFrame({"t": rt, "rv": [f"r{i}" for i in range(len(rt))]}), spark=spark)
    return left, right, pd.DataFrame({"t": lt}), pd.DataFrame({"t": rt, "rv": [f"r{i}" for i in range(len(rt))]})


@pytest.mark.parametrize("strategy", ["backward", "forward", "nearest"])
def test_merge_asof_matches_pandas(asof_frames, strategy):
    left, right, lp, rp = asof_frames
    got = (
        left.join_asof(right, on="t", strategy=strategy)
        .sort_by("lid")
        .to_pandas()[["t", "rv"]]
        .reset_index(drop=True)
    )
    direction = {"backward": "backward", "forward": "forward", "nearest": "nearest"}[strategy]
    want = pd.merge_asof(lp, rp, on="t", direction=direction)
    assert got["rv"].tolist() == want["rv"].tolist()


def test_merge_asof_repartitioned_input(asof_frames, spark):
    """The kernel must survive arbitrary input partitioning (the range
    shuffle re-establishes locality)."""
    left, right, lp, rp = asof_frames
    left8 = left._replace(left._sdf.repartition(8), aligned=False)
    right8 = right._replace(right._sdf.repartition(5), aligned=False)
    got = (
        left8.join_asof(right8, on="t", strategy="backward")
        .sort_by("lid")
        .to_pandas()["rv"]
        .tolist()
    )
    want = pd.merge_asof(lp, rp, on="t", direction="backward")["rv"].tolist()
    assert got == want


def test_merge_asof_no_quadratic_join(asof_frames):
    left, right, *_ = asof_frames
    plan = (
        left.join_asof(right, on="t", strategy="backward")
        .lazy_sdf()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the quadratic pre-image of the old path: a nested-loop range join
    # over the full frames (tiny boundary-summary BNLJs are fine)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


class TestJoinReferenceGrid:
    """Reference join/3 doctest grid
    (reference test/explorer/data_frame_test.exs:2375-2600)."""

    def test_no_overlapping_columns_raises(self, spark):
        left = ex.from_columns({"a": [1, 2, 3]})
        right = ex.from_columns({"b": [1, 2, 3]})
        with pytest.raises(ValueError, match="could not find any overlapping columns"):
            left.join(right)
        # but cross join is fine
        j = left.join(right, how="cross")
        assert j.names == ["a", "b"]
        assert j.n_rows() == 9

    def test_custom_on_pairs(self, spark):
        left = ex.from_columns({"a": [1, 2, 3], "b": ["a", "b", "c"]})
        right = ex.from_columns({"d": [1, 2, 2], "c": ["d", "e", "f"]})
        df = left.join(right, on=[("a", "d")])
        assert df.names == ["a", "b", "c"]
        cols = df.sort_by("c").to_columns()
        assert cols == {"a": [1, 2, 2], "b": ["a", "b", "b"], "c": ["d", "e", "f"]}

    def test_repeated_column_right_side(self, spark):
        left = ex.from_columns({"a": [1, 2, 3], "b": ["a", "b", "c"]})
        right = ex.from_columns({"d": [1, 2, 2], "c": ["d", "e", "f"], "a": [5, 6, 7]})
        df = left.join(right, on=[("a", "d")])
        assert df.names == ["a", "b", "c", "a_right"]
        df1 = left.join(right, on=[("a", "d")], how="left")
        assert df1.names == ["a", "b", "c", "a_right"]
        c1 = df1.to_columns()
        assert c1["a"] == [1, 2, 2, 3] and c1["c"] == ["d", "e", "f", None]
        assert c1["a_right"] == [5, 6, 7, None]
        df2 = left.join(right, on=[("a", "d")], how="outer")
        assert df2.names == ["a", "b", "d", "c", "a_right"]
        c2 = df2.sort_by("a").to_columns()
        assert c2["d"] == [1, 2, 2, None]
        df3 = left.join(right, how="cross")
        assert df3.names == ["a", "b", "d", "c", "a_right"]
        assert df3.n_rows() == 9
        df4 = left.join(right, on=[("a", "d")], how="right")
        assert df4.names == ["d", "c", "a", "b"]
        c4 = df4.sort_by("c").to_columns()
        assert c4 == {
            "d": [1, 2, 2],
            "c": ["d", "e", "f"],
            "a": [5, 6, 7],
            "b": ["a", "b", "b"],
        }

    def test_repeated_column_left_side(self, spark):
        left = ex.from_columns({"a": [1, 2, 3], "b": ["a", "b", "c"], "d": [5, 6, 7]})
        right = ex.from_columns({"d": [1, 2, 2], "c": ["d", "e", "f"]})
        df = left.join(right, on=[("a", "d")])
        assert df.names == ["a", "b", "d", "c"]
        cols = df.sort_by("c").to_columns()
        assert cols["d"] == [5, 6, 6]
        df2 = left.join(right, on=[("a", "d")], how="outer")
        assert df2.names == ["a", "b", "d", "d_right", "c"]
        df4 = left.join(right, on=[("a", "d")], how="right")
        assert df4.names == ["d", "c", "b", "d_left"]
        c4 = df4.sort_by("c").to_columns()
        assert c4 == {
            "d": [1, 2, 2],
            "c": ["d", "e", "f"],
            "b": ["a", "b", "b"],
            "d_left": [5, 6, 6],
        }

    def test_invalid_strategy(self, spark):
        left = ex.from_columns({"a": [1, 2, 3]})
        with pytest.raises(ValueError, match="join type is not valid"):
            left.join(left, how="inner_join")

    def test_on_by_index(self, spark):
        left = ex.from_columns({"a": [1, 2, 3], "b": ["a", "b", "c"]})
        right = ex.from_columns({"a": [1, 2, 2], "c": ["d", "e", "f"]})
        for on in (0, [0]):
            df = left.join(right, on=on)
            assert df.sort_by("c").to_columns() == {
                "a": [1, 2, 2],
                "b": ["a", "b", "b"],
                "c": ["d", "e", "f"],
            }
        bad = ex.from_columns({"c": ["d", "e", "f"], "a": [1, 2, 2]})
        with pytest.raises(ValueError, match="not the same for both dataframes"):
            left.join(bad, on=[0])

    def test_nulls_equal(self, spark):
        left = ex.from_columns({"a": [1, None], "b": ["x", "y"]})
        right = ex.from_columns({"a": [1, None], "c": ["p", "q"]})
        df = left.join(right)
        assert df.n_rows() == 1
        assert df.to_columns() == {"a": [1], "b": ["x"], "c": ["p"]}
        left2 = ex.from_columns({"a": [1, 2, None], "b": ["a", "b", "c"]})
        right2 = ex.from_columns({"a": [1, None, 4], "c": ["d", "e", "f"]})
        df2 = left2.join(right2, nulls_equal=True)
        assert df2.n_rows() == 2
        assert df2.sort_by("b").to_columns() == {
            "a": [1, None],
            "b": ["a", "c"],
            "c": ["d", "e"],
        }


class TestPivotWiderReferenceGrid:
    """Reference pivot_wider/4 edge grid
    (reference test/explorer/data_frame_test.exs:3425-3560)."""

    def test_single_id(self, spark):
        df = ex.from_columns({"id": [1, 1], "variable": ["a", "b"], "value": [1, 2]})
        out = df.pivot_wider("variable", "value", values=["a", "b"])
        assert out.to_columns() == {"id": [1], "a": [1], "b": [2]}

    def test_implicit_values_warns_but_works(self, spark):
        # without values= the implicit distinct-collect discovery path
        # still produces the same frame, and the scale warning fires
        import pytest as _pytest

        df = ex.from_columns({"id": [1, 1], "variable": ["a", "b"], "value": [1, 2]})
        with _pytest.warns(UserWarning, match="distinct-collect"):
            out = df.pivot_wider("variable", "value")
        assert out.to_columns() == {"id": [1], "a": [1], "b": [2]}

    def test_nil_variable_becomes_nil_column(self, spark):
        df = ex.from_columns({"id": [1, 1, 1], "variable": ["a", "b", None], "value": [1, 2, 3]})
        # None in values= renders as the "nil" column, same as discovery
        out = df.pivot_wider("variable", "value", values=["a", "b", None])
        assert out.to_columns() == {"id": [1], "a": [1], "b": [2], "nil": [3]}

    def test_names_prefix(self, spark):
        df = ex.from_columns({"id": [1, 1], "variable": ["1", "2"], "value": [1.0, 2.0]})
        out = df.pivot_wider(
            "variable", "value", id_columns=["id"], names_prefix="column_", values=["1", "2"]
        )
        assert out.names == ["id", "column_1", "column_2"]
        assert out.to_columns() == {"id": [1], "column_1": [1.0], "column_2": [2.0]}

    def test_id_collision_dedup(self, spark):
        df = ex.from_columns(
            {"id": [1, 1], "variable": ["a", "b"], "value": [1, 2], "b": [4, 5]}
        )
        out = df.pivot_wider("variable", "value", values=["a", "b"])
        assert sorted(out.names) == sorted(["id", "b", "a", "b_1"])
        cols = out.sort_by("b").to_columns()
        assert cols["b"] == [4, 5] and sorted(x for x in cols["b_1"] if x is not None) == [2]
        # with a prefix there's no collision
        out2 = df.pivot_wider("variable", "value", names_prefix="col_", values=["a", "b"])
        assert sorted(out2.names) == sorted(["id", "b", "col_a", "col_b"])

    def test_multiple_ids_and_values_list(self, spark):
        df = ex.from_columns(
            {"id": [1, 1], "variable": ["a", "b"], "value": [1, 2], "other_id": [4, 5]}
        )
        out = df.pivot_wider("variable", "value", values=["a", "b"])
        assert sorted(out.names) == sorted(["id", "other_id", "a", "b"])
        # pre-declared values avoid the distinct job and pin column order
        out2 = df.pivot_wider("variable", "value", id_columns=["id"], values=["a", "b"])
        assert out2.names == ["id", "a", "b"]


def test_with_verbs_accept_callbacks(spark):
    """The reference's *_with verbs take a FUNCTION of the lazy frame
    (data_frame.ex filter_with/mutate_with/summarise_with): the engine
    accepts a callback whose accessor yields lazy column expressions,
    and validates the result like the reference
    (data_frame_test.exs:316-352)."""
    import pytest

    from explorer_spark import f
    from explorer_spark.sources import from_columns

    df = from_columns({"a": [1, 2, 3], "b": [9, 8, 7]}, spark=spark)
    assert df.filter_with(lambda ldf: ldf["a"] > 1).to_columns()["a"] == [2, 3]
    assert df.mutate_with(lambda ldf: {"c": ldf["a"] + ldf["b"]}).to_columns()["c"] == [10, 10, 10]
    assert df.mutate_with(lambda ldf: [("c", ldf["a"] * 2)]).to_columns()["c"] == [2, 4, 6]
    got = df.group_by("b").summarise_with(lambda ldf: {"s": f.sum(ldf["a"])})
    assert sorted(got.to_columns()["s"]) == [1, 2, 3]
    # positional access + unknown-name error
    assert df.filter_with(lambda ldf: ldf[0] > 2).to_columns()["a"] == [3]
    with pytest.raises(KeyError, match="could not find column"):
        df.filter_with(lambda ldf: ldf["zz"] > 1)
    # reference error shapes
    with pytest.raises(ValueError, match=r"boolean LazySeries.*\{:s, 64\}"):
        df.filter_with(lambda ldf: ldf["a"] ** 3)
    with pytest.raises(ValueError, match="boolean LazySeries"):
        df.filter_with(lambda ldf: f.sum(ldf["a"]))
    with pytest.raises(ValueError, match="instead it contains"):
        df.filter_with(lambda ldf: "foo")


def test_struct_field_missing_error(spark):
    """field/2 on a missing struct field raises the reference's message
    naming the available fields (data_frame_test.exs:707), eagerly at
    expression build — not Spark's lazy FIELD_NOT_FOUND."""
    import pytest

    from explorer_spark import f
    from explorer_spark.expr import col
    from explorer_spark.series import Series

    df = Series.from_list([{"n": 1}, {"n": 2}], name="a", spark=spark).to_frame()
    with pytest.raises(ValueError, match=r'field "m" not found in fields'):
        df.mutate(m=f.field(col("a"), "m"))
    assert df.mutate(m=f.field(col("a"), "n")).to_columns()["m"] == [1, 2]
