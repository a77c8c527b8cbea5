"""Binning: ``cut`` (explicit breaks) and ``qcut`` (quantile breaks).

Reference: Series.cut/qcut return a frame with ``values`` /
``break_point`` / ``category`` columns (native s_cut/s_qcut,
native/explorer/src/series.rs:205-288). Intervals are right-closed by
default (``(lo, hi]``), ``left_close: true`` flips to ``[lo, hi)``.

Spark rendering: a when-chain over the breaks (JVM-side, codegen). qcut
computes the break values first with exact ``percentile`` (one tiny agg
job), then reuses the same chain — the breaks are scalars, so the
bucketing itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def cut_columns(
    c: Column,
    breaks: list[float],
    labels: list[str] | None = None,
    left_close: bool = False,
) -> tuple[Column, Column]:
    """Return (break_point, category) columns for explicit breaks."""
    pts = [float(b) for b in breaks]

    def _fmt(x: float) -> str:
        # Rust f64 Display (what polars renders into the labels) prints
        # -1.0 as "-1": drop the trailing .0 for integral breaks
        if x != x or x in (float("inf"), float("-inf")):
            return str(x)
        return str(int(x)) if x.is_integer() else str(x)

    if labels is None:
        bounds = [float("-inf"), *pts, float("inf")]
        labels = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if left_close:
                labels.append(f"[{_fmt(lo)}, {_fmt(hi)})")
            else:
                labels.append(f"({_fmt(lo)}, {_fmt(hi)}]")
    if len(labels) != len(pts) + 1:
        raise ValueError(f"need {len(pts) + 1} labels, got {len(labels)}")

    brk = None
    cat = None
    for i, b in enumerate(pts):
        cond = (c < F.lit(b)) if left_close else (c <= F.lit(b))
        brk = F.when(cond, F.lit(b)) if brk is None else brk.when(cond, F.lit(b))
        cat = F.when(cond, F.lit(labels[i])) if cat is None else cat.when(cond, F.lit(labels[i]))
    brk = brk.otherwise(F.lit(float("inf"))) if brk is not None else F.lit(float("inf"))
    cat = cat.otherwise(F.lit(labels[-1])) if cat is not None else F.lit(labels[-1])
    return (F.when(c.isNotNull(), brk), F.when(c.isNotNull(), cat))


def cut(frame, column: str, breaks: list[float], labels=None, left_close: bool = False):
    """Frame with ``values / break_point / category`` (reference shape)."""
    from ..frame import DataFrame

    sdf = frame.lazy_sdf()
    brk, cat = cut_columns(F.col(column), breaks, labels, left_close)
    out = sdf.select(
        F.col(column).alias("values"),
        brk.alias("break_point"),
        cat.alias("category"),
    )
    # the bin column is a :category series in the reference
    # (series.ex:4927 cut doctest renders `category category [...]`)
    out = out.withMetadata("category", {"cat": True})
    return DataFrame(out, has_order=False)


def qcut(
    frame,
    column: str,
    quantiles: list[float],
    labels=None,
    left_close: bool = False,
    allow_duplicates: bool = False,
):
    """Quantile binning: exact LINEAR percentiles (polars qcut breaks)
    -> cut chain. Duplicate break values raise unless
    ``allow_duplicates``, which collapses them (reference qcut/3)."""
    sdf = frame.lazy_sdf()
    # ONE array-form percentile: separate per-quantile aggregates each
    # build (and sort) their own full value buffer — 3 quantiles = 3x the
    # work for bit-identical results (r12; measured 2.4x faster at sf0.1)
    row = sdf.agg(
        F.percentile(
            F.col(column), F.array(*[F.lit(float(q)) for q in quantiles])
        ).alias("__qs__")
    ).collect()[0]
    breaks = list(row["__qs__"])
    if len(set(breaks)) != len(breaks):
        if not allow_duplicates:
            raise ValueError(
                "quantile breakpoints are not unique while `allow_duplicates` is false"
            )
        breaks = sorted(set(breaks))
    return cut(frame, column, breaks, labels, left_close)
