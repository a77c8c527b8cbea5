"""Round-5 behavior changes: argmin/argmax exact positions in the MUTATE
and FILTER paths (grouped window + ungrouped distributed), IPC
distributed-read path-mapping strictness, sampling draw width."""

import pytest

from explorer_spark import functions as f
from explorer_spark.expr import col
from explorer_spark.sources import from_columns


def _frame(spark, **cols):
    return from_columns(cols, spark=spark)


# ---------------------------------------------------------------------------
# argmin/argmax in mutate/filter (reference: grouped argmin broadcasts the
# WITHIN-GROUP position; ungrouped mutate broadcasts the global position)
# ---------------------------------------------------------------------------


def test_argminmax_ungrouped_mutate_positions(spark):
    # pre-fix: lowered to min_by(lit(0), v) -> always 0
    df = _frame(spark, v=[5, 2, 9, 1, 3])
    out = df.mutate(am=f.argmin(col("v")), ax=f.argmax(col("v"))).to_columns()
    assert out["am"] == [3, 3, 3, 3, 3]
    assert out["ax"] == [2, 2, 2, 2, 2]


def test_argminmax_ungrouped_mutate_sparse_partitions(spark):
    # multi-partition frame: monotonically_increasing_id is sparse across
    # partitions (partition 1 starts at 8589934592) — positions must still
    # be contiguous 0-based
    df = _frame(spark, v=list(range(100, 0, -1)))
    df = df._replace(df._sdf.repartition(8), has_order=df._has_order)
    out = df.mutate(am=f.argmin(col("v")), ax=f.argmax(col("v"))).to_columns()
    assert set(out["am"]) == {99}
    assert set(out["ax"]) == {0}


def test_argminmax_grouped_mutate_within_group_positions(spark):
    # pre-fix: grouped mutate returned the sparse global ORDER_COL id
    df = _frame(spark, g=["a", "a", "b", "b", "b"], v=[5, 2, 9, 1, 3])
    out = df.group_by("g").mutate(am=f.argmin(col("v")), ax=f.argmax(col("v"))).to_rows()
    by_g = {(r["g"], r["v"]): (r["am"], r["ax"]) for r in out}
    assert by_g[("a", 5)] == (1, 0)
    assert by_g[("b", 9)] == (1, 0)
    # ties take the FIRST occurrence
    df2 = _frame(spark, g=["a"] * 4, v=[3, 1, 1, 3])
    out2 = df2.group_by("g").mutate(am=f.argmin(col("v")), ax=f.argmax(col("v"))).to_rows()
    assert out2[0]["am"] == 1 and out2[0]["ax"] == 0


def test_argmin_grouped_filter_keeps_min_row(spark):
    df = _frame(spark, g=["a", "a", "b", "b", "b"], v=[5, 2, 9, 1, 3])
    out = df.group_by("g").filter(f.row_index() == f.argmin(col("v"))).ungroup()
    rows = sorted(out.to_rows(), key=lambda r: r["g"])
    assert [(r["g"], r["v"]) for r in rows] == [("a", 2), ("b", 1)]


def test_argminmax_mutate_null_values_excluded(spark):
    df = _frame(spark, v=[None, 4, None, 1, 7])
    out = df.mutate(am=f.argmin(col("v")), ax=f.argmax(col("v"))).to_columns()
    assert set(out["am"]) == {3}
    assert set(out["ax"]) == {4}


# ---------------------------------------------------------------------------
# brute_force_topk fallback: query-side plan executes once (checkpoint pin)
# ---------------------------------------------------------------------------


def test_brute_force_topk_fallback_single_execution(spark):
    from explorer_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 7)], "vec_id int, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0]), (102, [1.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    out = brute_force_topk(corpus, queries, k=2, max_collect_queries=1)
    # fallback path reads the localCheckpoint scan (LogicalRDD /
    # ExistingRDD), not a second execution of the query-side plan
    explained = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" in explained or "LogicalRDD" in explained, explained
    rows = out.collect()
    assert len(rows) == 6  # 3 queries x k=2
    # top-1 neighbor of [0,1] by cosine is the smallest-x corpus vector
    top101 = max((r for r in rows if r["query_id"] == 101), key=lambda r: r["cosine"])
    assert top101["neighbor_id"] == 1


# ---------------------------------------------------------------------------
# PIL-gated compressed-image decode (optional dependency)
# ---------------------------------------------------------------------------


def test_decode_image_pil_gate():
    from explorer_spark.operators.multimodal import decode_image

    try:
        from PIL import Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    if not has_pil:
        # without Pillow, compressed magic raises the clear no-codec error
        with pytest.raises(ValueError, match="Pillow"):
            decode_image(b"\xff\xd8\xff\xe0 not a real jpeg")
    else:
        import io

        img = Image.new("RGB", (3, 2), (10, 20, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        arr = decode_image(buf.getvalue())
        assert arr.shape == (2, 3, 3)
        assert (arr[0, 0] == [10, 20, 30]).all()


# ---------------------------------------------------------------------------
# cube / rollup passthrough (Spark-native, additive over the reference)
# ---------------------------------------------------------------------------


def test_cube_grouping_sets(spark):
    df = _frame(spark, a=["x", "x", "y"], b=[1, 2, 1], v=[10, 20, 30])
    out = df.cube("a", "b").summarise(s=f.sum(col("v"))).to_rows()
    got = {(r["a"], r["b"]): r["s"] for r in out}
    assert got[(None, None)] == 60  # grand total
    assert got[("x", None)] == 30 and got[("y", None)] == 30
    assert got[(None, 1)] == 40 and got[(None, 2)] == 20
    assert got[("x", 1)] == 10
    assert len(out) == 3 + 2 + 2 + 1  # cells + a-levels + b-levels + grand


def test_rollup_prefix_sets(spark):
    df = _frame(spark, a=["x", "x", "y"], b=[1, 2, 1], v=[10, 20, 30])
    out = df.rollup("a", "b").summarise(s=f.sum(col("v"))).to_rows()
    got = {(r["a"], r["b"]): r["s"] for r in out}
    assert got[(None, None)] == 60
    assert got[("x", None)] == 30
    assert (None, 1) not in got  # rollup has no b-only level
    assert len(out) == 3 + 2 + 1


def test_cube_mode_returns_ties_list(spark):
    """Grouping-sets parity for the list-mode kernel (round-9 verdict
    #5): cube+mode returns the reference's sorted LIST of tied modes
    (series.ex:2640) at every grouping level, not Spark's scalar
    F.mode."""
    df = _frame(
        spark,
        a=["x", "x", "x", "y", "y", "y"],
        v=[1, 1, 2, 3, 3, 2],
    )
    out = df.cube("a").summarise(m=f.mode(col("v"))).to_rows()
    got = {r["a"]: r["m"] for r in out}
    assert got["x"] == [1] and got["y"] == [3]
    # grand total: 1,1,2,3,3,2 -> ties [1, 2, 3] sorted
    assert got[None] == [1, 2, 3]


def test_rollup_quantile_nearest_kernel(spark):
    """rollup+quantile rides the NEAREST dtype-keeping kernel per
    grouping set (not a sorted collect): integer input stays integer."""
    df = _frame(spark, a=["x", "x", "x", "y"], v=[1, 2, 10, 7])
    out = df.rollup("a").summarise(q=f.quantile(col("v"), 0.5)).to_rows()
    got = {r["a"]: r["q"] for r in out}
    assert got["x"] == 2 and got["y"] == 7
    # grand total over [1, 2, 10, 7]: NEAREST 0.5 -> 2 elements below,
    # polars nearest picks index round(0.5*(4-1)) = 2 -> value 7
    assert got[None] == 7 and all(isinstance(v, int) for v in got.values())


def test_group_by_mode_consumed_only_by_summarise(spark):
    df = _frame(spark, a=["x", "y"], v=[1, 2])
    g = df.cube("a")
    # a grouped mutate on a cube frame behaves as a PLAIN grouped mutate
    # (mode travels with the group metadata but only summarise consumes it)
    m = g.mutate(s=f.sum(col("v")))
    assert sorted(m.to_columns()["s"]) == [1, 2]
    assert m._group_mode == "cube"  # still set: a later summarise cubes
    # ungroup drops the mode with the groups
    assert g.ungroup()._group_mode == "groups"
    # regrouping without mode resets to plain groups
    assert g.ungroup().group_by("a")._group_mode == "groups"


def test_decode_image_ppm_still_codec_free():
    import numpy as np

    from explorer_spark.operators.multimodal import decode_image

    raw = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    arr = decode_image(raw)
    assert arr.shape == (1, 2, 3)
    assert (arr[0, 0] == np.array([255, 0, 0])).all()


# ---------------------------------------------------------------------------
# reference parity edges found in the round-5 sweep
# ---------------------------------------------------------------------------


def test_from_list_empty_is_null_dtype(spark):
    # reference series.ex: from_list([]) -> empty series of :null dtype
    from explorer_spark.series import Series

    s = Series.from_list([], spark=spark)
    assert s.dtype == "null"
    assert s.to_list() == [] and s.size() == 0


def test_to_iovec_chunks_concatenate(spark):
    from explorer_spark.series import Series

    s = Series.from_list([10, 20, 30], dtype=("s", 64), spark=spark)
    iov = s.to_iovec()
    assert isinstance(iov, list)
    assert b"".join(iov) == s.to_binary()


def test_from_list_numeric_inference_preserves_nil_vs_nan(spark):
    """Reference inference rules (series_test.exs 'with integers'/'mixing
    integers and nan'): int+nil stays s64; NaN is a VALUE, distinct from
    nil; any float promotes to f64."""
    import math

    from explorer_spark.series import Series

    s = Series.from_list([1, None, 3], spark=spark)
    assert s.dtype == ("s", 64)
    assert s.to_list() == [1, None, 3]

    s2 = Series.from_list([1, float("nan")], spark=spark)
    assert s2.dtype == ("f", 64)
    vals = s2.to_list()
    assert vals[0] == 1.0 and isinstance(vals[1], float) and math.isnan(vals[1])

    s3 = Series.from_list([1.5, None, float("nan")], spark=spark)
    got = s3.to_list()
    assert got[0] == 1.5 and got[1] is None and math.isnan(got[2])


def test_from_list_time_values(spark):
    import datetime

    from explorer_spark.series import Series

    s = Series.from_list([datetime.time(1, 2, 3), None], dtype="time", spark=spark)
    # logical :time over ns-since-midnight longs — round-trips as times
    assert s.dtype == "time"
    assert s.to_list() == [datetime.time(1, 2, 3), None]
    assert s.cast(("s", 64)).to_list() == [(1 * 3600 + 2 * 60 + 3) * 10**9, None]
    inferred = Series.from_list([datetime.time(0, 0, 1)], spark=spark)
    assert inferred.dtype == "time"
    assert inferred.to_list() == [datetime.time(0, 0, 1)]


def test_grouped_projection_keeps_group_columns(spark):
    """reference grouped_test.exs:736-755: selecting only other columns
    (or discarding a group) does not remove group columns."""
    df = _frame(spark, a=["a", "b", "c"], b=[1, 2, 3])
    g = df.group_by("b")
    sel = g.select(["a"])
    assert sel.names == ["a", "b"] and sel.groups == ["b"]
    disc = g.discard(["b"])
    assert disc.names == ["a", "b"] and disc.groups == ["b"]


def test_group_by_unknown_column_raises(spark):
    df = _frame(spark, a=["a"], b=[1])
    with pytest.raises(KeyError, match="could not find column name"):
        df.group_by("something_else")


def test_ungroup_non_group_raises(spark):
    df = _frame(spark, a=["a"], b=[1]).group_by("b")
    with pytest.raises(KeyError, match="current groups"):
        df.ungroup("a")
    assert df.ungroup("b").groups == []


def test_summarise_aggregate_over_window_function(spark):
    """reference grouped_test.exs:442-464: an aggregation may wrap a
    window function — max(window_mean(v, 2)) per group."""
    df = _frame(spark, g=["a", "a", "a", "b", "b"], v=[1.0, 2.0, 3.0, 10.0, 20.0])
    out = df.group_by("g").summarise(
        n=f.size(col("v")), m=f.max(f.window_mean(col("v"), 2))
    ).to_rows()
    assert sorted((r["g"], r["n"], r["m"]) for r in out) == [("a", 3, 2.5), ("b", 2, 15.0)]
    # ungrouped form routes through the distributed kernels
    whole = df.summarise(m=f.max(f.cumulative_sum(col("v")))).to_rows()
    assert whole == [{"m": 36.0}]


def test_from_columns_nan_is_value_nil_is_null(spark):
    """reference grouped_test.exs:797-833: NaN is a VALUE (counted),
    nil is null; int+nil columns stay s64."""
    import math

    df = _frame(spark, b=[1, None, 3], c=[1.0, float("nan"), 3.0], group=[1, 1, 2])
    assert df.dtypes["b"] == ("s", 64)
    res = {
        r["group"]: r
        for r in df.group_by("group").summarise(
            b_count=f.count(col("b")), b_nil=f.nil_count(col("b")),
            c_count=f.count(col("c")), c_nil=f.nil_count(col("c")),
        ).to_rows()
    }
    assert (res[1]["b_count"], res[1]["b_nil"]) == (1, 1)
    assert (res[1]["c_count"], res[1]["c_nil"]) == (2, 0)  # NaN counted
    vals = df.to_columns()["c"]
    assert math.isnan(vals[1])


def test_cast_integer_to_temporal(spark):
    """reference series_test.exs:4353-4394: int->date = days since
    epoch; int->naive_datetime = target-precision units since epoch;
    int->time = ns since midnight (identity on the long rendering)."""
    import datetime

    from explorer_spark.series import Series

    s = Series.from_list([1, 2, 3], spark=spark)
    assert s.cast("date").to_list() == [
        datetime.date(1970, 1, 2), datetime.date(1970, 1, 3), datetime.date(1970, 1, 4)
    ]
    assert s.cast(("naive_datetime", "us")).to_list() == [
        datetime.datetime(1970, 1, 1, 0, 0, 0, i) for i in (1, 2, 3)
    ]
    big = Series.from_list([1_649_883_642 * 1_000_000], spark=spark)
    assert big.cast(("naive_datetime", "us")).to_list() == [
        datetime.datetime(2022, 4, 13, 21, 0, 42)
    ]
    ms = Series.from_list([1500], spark=spark).cast(("naive_datetime", "ms"))
    assert ms.to_list() == [datetime.datetime(1970, 1, 1, 0, 0, 1, 500000)]
    ns = Series.from_list([1_500_000], spark=spark).cast(("naive_datetime", "ns"))
    assert ns.to_list() == [datetime.datetime(1970, 1, 1, 0, 0, 0, 1500)]


def test_duration_interval_backed(spark):
    """Durations materialize as real DayTimeIntervals: temporal
    arithmetic, precision casts, count extraction, and timedelta
    ingestion all work (reference duration_test.exs)."""
    import datetime

    from explorer_spark.series import Series

    d = Series.from_list([1_000_000, 2_500_000, None], dtype=("duration", "us"), spark=spark)
    assert d.dtype == ("duration", "us")
    assert d.to_list() == [
        datetime.timedelta(seconds=1), datetime.timedelta(seconds=2, microseconds=500000), None
    ]
    # duration -> integer = count in the duration's precision
    assert d.cast(("s", 64)).to_list() == [1_000_000, 2_500_000, None]
    # precision re-cast keeps the physical time
    assert d.cast(("duration", "ms")).to_list()[0] == datetime.timedelta(seconds=1)
    # int -> duration cast
    s = Series.from_list([3_600_000_000], spark=spark).cast(("duration", "us"))
    assert s.to_list() == [datetime.timedelta(hours=1)]
    # timedelta values ingest directly
    td = Series.from_list([datetime.timedelta(days=1, seconds=3)], dtype=("duration", "us"), spark=spark)
    assert td.to_list() == [datetime.timedelta(days=1, seconds=3)]


def test_series_format_and_lengths(spark):
    """reference Series.format/1 (series/literal interleaving, nil
    literals dropped) and lengths/1 (LIST lengths, series.ex:6832)."""
    from explorer_spark.series import Series

    a = Series.from_list(["a", "b"], spark=spark)
    c = Series.from_list(["c", "d"], spark=spark)
    assert Series.format([a, c]).to_list() == ["ac", "bd"]
    assert Series.format([a, " / ", c]).to_list() == ["a / c", "b / d"]
    assert Series.format(["c", a]).to_list() == ["ca", "cb"]
    assert Series.format(["a", None, "b"]).to_list() == ["ab"]

    lists = Series.from_list([[1], [1, 2, 3], [1, 2]], spark=spark)
    assert lists.map(lambda x: f.lengths(x)).to_list() == [1, 3, 2]


def test_series_concat_call_forms(spark):
    from explorer_spark.series import Series

    a = Series.from_list([1, 2], spark=spark)
    b = Series.from_list([3, 4], spark=spark)
    assert Series.concat([a, b]).to_list() == [1, 2, 3, 4]
    assert Series.concat(a, b).to_list() == [1, 2, 3, 4]
    assert a.concat(b).to_list() == [1, 2, 3, 4]


def test_slice_index_out_of_bounds_raises(spark):
    # reference: 'requested row index (2000) out of bounds (-5:5)'
    df = _frame(spark, a=[1, 2, 3, 4, 5])
    with pytest.raises(IndexError, match="out of bounds"):
        df.slice([1, 2000])
    with pytest.raises(IndexError, match="out of bounds"):
        df.slice([-6])
    assert df.slice([-5, 4]).to_columns()["a"] == [1, 5]


def test_quantile_nearest_strategy(spark):
    """reference quantile default = polars NEAREST (series.rs:1355):
    element at floor(q*(n-1)+0.5); integers stay integers; NaN (sorts
    greatest) is returned verbatim for high q."""
    import math

    from explorer_spark.series import Series

    s = Series.from_list([1, 2, None, 3], spark=spark)
    assert s.quantile(0.2) == 1
    sf_ = Series.from_list(
        [-3.1, 1.2, 2.3, None, -2.4, -12.6, float("nan"), 3.9], spark=spark
    )
    assert sf_.quantile(0.2) == -3.1
    assert math.isnan(sf_.quantile(0.92))
    # describe uses the same strategy (reference data_frame_test.exs:4035)
    df = _frame(spark, b=[1, 2, 3])
    rows = df.describe().to_columns()
    assert rows["b"] == [3.0, 0.0, 2.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0]


# ---------------------------------------------------------------------------
# round-5 self-review fixes
# ---------------------------------------------------------------------------


def test_quantile_in_grouped_mutate_and_filter(spark):
    # quantile is a compound self-windowed aggregate: grouped mutate and
    # filter must not double-wrap it in .over()
    df = _frame(spark, g=["a", "a", "b"], v=[1, 2, 10])
    out = df.group_by("g").mutate(q=f.quantile(col("v"), 0.5)).to_rows()
    assert {(r["g"], r["q"]) for r in out} == {("a", 2), ("b", 10)}
    kept = df.group_by("g").filter(col("v") >= f.quantile(col("v"), 0.5)).ungroup().to_rows()
    assert sorted((r["g"], r["v"]) for r in kept) == [("a", 2), ("b", 10)]


def test_pull_from_grouped_frame_is_plain_series(spark):
    # reference pull/2 returns a PLAIN series: aggregates cover ALL rows
    df = _frame(spark, g=["a", "a", "b"], v=[1, 2, 10])
    s = df.group_by("g").pull("v")
    assert s.sum() == 13
    assert s.to_frame().names == ["v"]


def test_duration_precision_cast_converts_counts(spark):
    from explorer_spark.series import Series

    d = Series.from_list([1_000_000], dtype=("duration", "us"), spark=spark)
    dm = d.cast(("duration", "ms"))
    assert dm.dtype == ("duration", "ms")
    assert dm.cast(("s", 64)).to_list() == [1000]
    # sub-unit detail truncates toward zero
    d2 = Series.from_list([1_500_999], dtype=("duration", "us"), spark=spark)
    assert d2.cast(("duration", "ms")).cast(("s", 64)).to_list() == [1500]
    # from_list with a non-us precision stamps the dtype too
    ms = Series.from_list([1500], dtype=("duration", "ms"), spark=spark)
    assert ms.dtype == ("duration", "ms")
    assert ms.cast(("s", 64)).to_list() == [1500]


def test_format_nil_value_renders_empty(spark):
    # round-8 correction: a nil VALUE renders as the empty string, the
    # row survives (reference series_test.exs 'with series that have nil
    # value': "c / g -  / o"); the old null-the-row pin was an assumption
    from explorer_spark.series import Series

    two = Series.from_list(["x", "y"], spark=spark)
    one_nil = Series.from_list([None], dtype="string", spark=spark)
    assert Series.format([two, one_nil]).to_list() == ["x", "y"]


def test_from_columns_iterator_with_pandas_fallback(spark):
    # a one-shot iterable must survive the Arrow attempt falling back
    out = from_columns({"a": iter([1, 2]), "b": [[1], [2]]}, spark=spark)
    assert out.to_columns() == {"a": [1, 2], "b": [[1], [2]]}


def test_frame_sample_real_y4m_decode(spark):
    """Y4M (uncompressed YUV4MPEG2) video decodes for REAL: fps-driven
    sampling, raw plane payloads per sampled frame."""
    w, h, fps, n_frames = 4, 2, 10, 25
    frame_len = w * h * 3 // 2  # C420
    header = b"YUV4MPEG2 W4 H2 F10:1 Ip A1:1 C420jpeg\n"
    body = b"".join(
        b"FRAME\n" + bytes([i % 256]) * frame_len for i in range(n_frames)
    )
    video = header + body

    from explorer_spark.operators.multimodal import frame_sample, parse_y4m

    got_fps, gw, gh, frames = parse_y4m(video)
    assert (got_fps, gw, gh, len(frames)) == (10.0, 4, 2, 25)
    assert frames[3] == bytes([3]) * frame_len

    sdf = spark.createDataFrame([(7, bytearray(video))], "media_id long, payload binary")
    # 10 fps, sample every 1000 ms -> every 10th frame: indices 0, 10, 20
    rows = sorted(frame_sample(sdf, every_ms=1000).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 10, 20]
    assert bytes(rows[1].frame_payload) == bytes([10]) * frame_len
    # corrupt stream raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="FRAME marker"):
        parse_y4m(header + b"JUNK")


def test_frame_sample_ffmpeg_gated_mp4(spark, tmp_path):
    """Compressed-container decode through the gated ffmpeg CLI (round-9
    verdict #8, mirroring the PIL image gate): a tiny generated mp4
    decodes to real rgb24 frames via frame_sample. Skips cleanly when
    ffmpeg/ffprobe are absent (this container), runs for real wherever a
    deployment installs them."""
    from explorer_spark.operators.multimodal import (
        ffmpeg_available,
        ffmpeg_decode_frames,
        frame_sample,
    )

    if not ffmpeg_available():
        pytest.skip("ffmpeg/ffprobe not on PATH — gated decode inactive")
    import subprocess

    mp4 = tmp_path / "tiny.mp4"
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "testsrc=duration=3:size=16x16:rate=10",
            "-pix_fmt", "yuv420p", str(mp4),
        ],
        check=True,
        timeout=120,
    )
    raw = mp4.read_bytes()
    decoded = ffmpeg_decode_frames(raw, every_ms=1000)
    assert decoded is not None
    fps, w, h, frames = decoded
    assert (w, h) == (16, 16) and len(frames) == 3
    assert all(len(f) == 16 * 16 * 3 for f in frames)
    sdf = spark.createDataFrame([(9, bytearray(raw))], "media_id long, payload binary")
    rows = frame_sample(sdf, every_ms=1000).collect()
    assert len(rows) == 3
    assert all(len(bytes(r.frame_payload)) == 16 * 16 * 3 for r in rows)


def test_parse_y4m_truncation_and_header_only():
    from explorer_spark.operators.multimodal import parse_y4m

    header = b"YUV4MPEG2 W4 H2 F10:1 C420\n"
    with pytest.raises(ValueError, match="truncated"):
        parse_y4m(header + b"FRAME\n" + b"x" * 5)  # frame_len is 12
    # header-only stream is valid: zero frames
    fps, w, h, frames = parse_y4m(header)
    assert (fps, w, h, frames) == (10.0, 4, 2, [])


def test_from_list_duration_long_form_unit(spark):
    import datetime

    from explorer_spark.series import Series

    # long-form precision names scale identically to the short forms
    td = Series.from_list(
        [datetime.timedelta(seconds=1, microseconds=500)], dtype=("duration", "millisecond"), spark=spark
    )
    assert td.dtype == ("duration", "ms")
    assert td.cast(("s", 64)).to_list() == [1000]  # ms count, sub-ms truncated


def test_read_parquet_and_ipc_max_rows(spark, tmp_path):
    from explorer_spark.sources import read_ipc, read_parquet, write_ipc, write_parquet

    df = _frame(spark, a=list(range(20)))
    p = str(tmp_path / "t.parquet")
    write_parquet(df, p)
    got = read_parquet(p, max_rows=5, spark=spark)
    assert got.n_rows() == 5
    got2 = read_parquet(p, columns=["a"], max_rows=3, spark=spark)
    assert got2.names == ["a"] and got2.n_rows() == 3

    ip = str(tmp_path / "t.arrow")
    write_ipc(df, ip)
    assert read_ipc(ip, max_rows=7, spark=spark).n_rows() == 7


def test_pivot_wider_multi_values_naming(spark):
    """reference pivot_wider with a values_from LIST prefixes new columns
    with the VALUE column name: '{value_col}_{name}' (data_frame.ex
    multi-values doctest)."""
    df = _frame(
        spark,
        product_id=[1, 1, 2, 2],
        property=["width_cm", "height_cm"] * 2,
        property_value=[42, 40, 35, 20],
        another_value=[43, 41, 36, 21],
    )
    out = df.pivot_wider(
        "property", ["property_value", "another_value"], values=["width_cm", "height_cm"]
    )
    assert sorted(out.names) == [
        "another_value_height_cm", "another_value_width_cm",
        "product_id", "property_value_height_cm", "property_value_width_cm",
    ]
    rows = {r["product_id"]: r for r in out.to_rows()}
    assert rows[1]["property_value_width_cm"] == 42
    assert rows[2]["another_value_height_cm"] == 21


def test_pivot_wider_group_metadata(spark):
    # reference: groups that are ID columns stay groups; the pivoted
    # column's group is discarded
    df = _frame(spark, weekday=["Mon", "Tue"] * 2, team=["A", "B", "A", "B"], hour=[10, 9, 15, 14])
    out = df.group_by("team").pivot_wider("weekday", "hour", values=["Mon", "Tue"])
    assert out.groups == ["team"]
    out2 = df.group_by("weekday").pivot_wider("weekday", "hour", values=["Mon", "Tue"])
    assert out2.groups == []


def test_series_cut_reference_options(spark):
    """reference cut/3 (series_test.exs:6169-6208): minimal float labels
    ('(-inf, -1]'), default output values+category, include_breaks adds
    break_point, label kwargs rename columns."""
    from explorer_spark.series import Series

    s = Series.from_list([x / 10 for x in range(-30, 31, 5)], spark=spark)
    out = s.cut([-1, 1])
    assert out.names == ["values", "category"]
    freq = {}
    for c in out.to_columns()["category"]:
        freq[c] = freq.get(c, 0) + 1
    assert freq == {"(-inf, -1]": 5, "(-1, 1]": 4, "(1, inf]": 4}

    s3 = Series.from_list([1, 2, 3], spark=spark)
    with pytest.raises(ValueError, match="labels"):
        s3.cut([2], labels=["x"])
    d = s3.cut([2], include_breaks=True, labels=["x", "y"],
               break_point_label="bp", category_label="cat")
    assert d.names == ["values", "bp", "cat"]

    sf_ = Series.from_list([1.0, 2.0, 3.0], spark=spark)
    d2 = sf_.cut([1.5, 2.5], include_breaks=True)
    assert d2.to_columns() == {
        "values": [1.0, 2.0, 3.0],
        "break_point": [1.5, 2.5, float("inf")],
        "category": ["(-inf, 1.5]", "(1.5, 2.5]", "(2.5, inf]"],
    }


def test_qcut_reference_semantics(spark):
    """reference qcut/3 (series_test.exs:6212-6240): linear quantile
    breaks, duplicate breaks raise unless allow_duplicates collapses
    them."""
    from explorer_spark.series import Series

    s = Series.from_list(list(range(-5, 4)), spark=spark)
    freq = {}
    for c in s.qcut([0.0, 0.25, 0.75]).to_columns()["category"]:
        freq[c] = freq.get(c, 0) + 1
    assert freq == {"(-inf, -5]": 1, "(-5, -3]": 2, "(-3, 1]": 4, "(1, inf]": 2}

    dup = Series.from_list([0.0, 0.0, 0.0, 3.0, 4.0, 5.0], spark=spark)
    with pytest.raises(ValueError, match="allow_duplicates"):
        dup.qcut([0.1, 0.25, 0.75])
    freq2 = {}
    for c in dup.qcut([0.1, 0.25, 0.75], allow_duplicates=True).to_columns()["category"]:
        freq2[c] = freq2.get(c, 0) + 1
    assert freq2 == {"(-inf, 0]": 3, "(0, 3.75]": 1, "(3.75, inf]": 2}


def test_strftime_chrono_compat_tokens(spark):
    """reference 'ensure compatibility with chrono's format'
    (series_test.exs:6154-6165): %D %F %X %% %t %n %-m %-d %.3f
    round-trip through strptime AND strftime."""
    import datetime

    from explorer_spark.series import Series

    cases = [
        (datetime.datetime(2001, 7, 8), "07/08/01", "%D"),
        (datetime.datetime(2000, 11, 3), "11/03/00 % \t \n", "%D %% %t %n"),
        (datetime.datetime(1987, 6, 5, 0, 35, 0, 26000), "1987-06-05 00:35:00.026", "%F %X%.3f"),
        (datetime.datetime(1999, 3, 1), "1999/3/1", "%Y/%-m/%-d"),
    ]
    for dt_, s_, fmt in cases:
        parsed = Series.from_list([s_], spark=spark).map(lambda c, m=fmt: f.strptime(c, m)).to_list()
        assert parsed == [dt_], (fmt, parsed)
        rendered = Series.from_list([dt_], spark=spark).map(lambda c, m=fmt: f.strftime(c, m)).to_list()
        assert rendered == [s_], (fmt, rendered)


def test_re_named_captures_derives_names(spark):
    """reference re_named_captures/2 takes only the pattern: named
    groups keep their name, unnamed groups get the 1-based index."""
    from explorer_spark.series import Series

    s = Series.from_list(["alice@service.com", "bob@example.com"], spark=spark)
    got = s.map(lambda c: f.re_named_captures(c, r"(?<account>[^@]+)@(?<host>.*)")).to_list()
    assert got == [
        {"account": "alice", "host": "service.com"},
        {"account": "bob", "host": "example.com"},
    ]
    s2 = Series.from_list(["abc", "bcd"], spark=spark)
    assert s2.map(lambda c: f.re_named_captures(c, r"(b|d)")).to_list() == [
        {"1": "b"}, {"1": "b"}
    ]


@pytest.mark.filterwarnings("ignore:toPandas attempted Arrow optimization")
def test_json_decode_invalid_raises(spark):
    # reference json_decode raises on undecodable JSON (FAILFAST)
    from explorer_spark.series import Series

    bad = Series.from_list(["not json"], spark=spark)
    with pytest.raises(Exception, match="FAILFAST|Malformed|JSON"):
        bad.map(lambda c: f.json_decode(c, ("struct", [("a", ("s", 64))]))).to_list()
    # nil input stays nil, never an error (function-PRODUCED null
    # structs read as nil — only from_list INGESTION converts nil rows
    # to structs of nil fields, the polars split the reference shows:
    # struct_test.exs 'allow nils' vs re_named_captures on nil,
    # data_frame_test.exs:2201-2236)
    n = Series.from_list([None], dtype="string", spark=spark)
    assert n.map(lambda c: f.json_decode(c, ("struct", [("a", ("s", 64))]))).to_list() == [None]
