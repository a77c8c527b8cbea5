"""Rolling windows and exponentially-weighted moving stats.

Reference: ``window_sum/mean/median/min/max/standard_deviation(window_size,
weights, min_periods, center)`` (lib/explorer/series.ex:5123-5342) and
``ewm_mean/standard_deviation/variance(alpha, adjust, ...)``
(series.ex:5344-5528).

Spark rendering:

- Unweighted rolling -> built-in aggregate over
  ``Window.orderBy(order).rowsBetween(-(n-1), 0)`` (center shifts the
  frame) with a count-based ``min_periods`` null-out. Fully JVM-side,
  whole-stage-codegen, scales per group.
- Weighted rolling -> closed-form sum of ``lag(col, k) * w[k]`` terms —
  still JVM-side; cost is O(window_size) expressions.
- EWM -> inherently sequential; rendered as a grouped ``applyInPandas``
  using pandas' ewm (Arrow-batched). At scale this parallelizes per
  group; an ungrouped series runs in a single task (documented, same as
  any global sequential scan).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..expr import Expr, LowerCtx, _c, _ordered_window

_ROLL_FNS = {
    "window_sum": F.sum,
    "window_mean": F.avg,
    "window_median": F.median,
    "window_min": F.min,
    "window_max": F.max,
    "window_standard_deviation": F.stddev_samp,
}


def _frame_bounds(window_size: int, center: bool) -> tuple[int, int]:
    if center:
        lo = -(window_size // 2)
        hi = window_size - 1 - (window_size // 2)
        return lo, hi
    return -(window_size - 1), 0


def _lower_rolling(op):
    def low(ctx: LowerCtx, a, window_size: int, weights=None, min_periods: int | None = None, center: bool = False):
        if weights is not None:
            return _lower_weighted(ctx, a, op, window_size, list(weights), min_periods, center)
        lo, hi = _frame_bounds(window_size, center)
        w = _ordered_window(ctx).rowsBetween(lo, hi)
        c = _c(a, ctx)
        out = _ROLL_FNS[op](c).over(w)
        # Explorer defaults min_periods: 1 (series.ex window_* docs)
        mp = 1 if min_periods is None else min_periods
        if mp > 1:
            cnt = F.count(c).over(w)
            out = F.when(cnt >= mp, out)
        return out

    return low


def _lower_weighted(ctx, a, op, n, weights, min_periods, center):
    if op not in ("window_sum", "window_mean"):
        raise NotImplementedError(f"weights not supported for {op}")
    if center:
        raise NotImplementedError("weighted + center not supported yet")
    w = _ordered_window(ctx)
    c = _c(a, ctx)
    # weights[0] applies to the OLDEST element of the window
    terms = []
    wsum_terms = []
    for k in range(n):
        lagged = F.lag(c, n - 1 - k).over(w)
        weight = F.lit(float(weights[k]))
        terms.append(F.when(lagged.isNotNull(), lagged * weight).otherwise(F.lit(0.0)))
        wsum_terms.append(F.when(lagged.isNotNull(), weight).otherwise(F.lit(0.0)))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    if op == "window_sum":
        out = total
    else:
        wsum = wsum_terms[0]
        for t in wsum_terms[1:]:
            wsum = wsum + t
        out = total / F.nullif(wsum, F.lit(0.0))
    mp = 1 if min_periods is None else min_periods
    cnt = F.count(c).over(w.rowsBetween(-(n - 1), 0))
    return F.when(cnt >= mp, out)


def register() -> None:
    """Install rolling ops into the expression op table."""
    from .. import expr as E

    for op in _ROLL_FNS:
        E._LOWER[op] = _lower_rolling(op)
    E.ORDERED_OPS |= set(_ROLL_FNS)


# --------------------------------------------------------------------------
# EWM via grouped applyInPandas (frame-level verb, see frame.ewm_*)
# --------------------------------------------------------------------------


def ewm_columns(frame, specs: dict[str, tuple], order_cols=None):
    """Add EWM columns to a frame.

    specs: out_name -> (kind, src_col, alpha, adjust[, ignore_nils]) with
    kind in {"mean", "variance", "standard_deviation"}.  ignore_nils
    defaults to True (reference lib/explorer/series.ex:5325-5345: nulls
    are skipped entirely); False decays weights by absolute position
    (pandas ignore_na=False).
    """
    import pandas as pd

    from ..frame import ORDER_COL, DataFrame

    specs = {o: (t + (True,) if len(t) == 4 else t) for o, t in specs.items()}
    base = frame._ordered()
    sdf = base._sdf
    schema_fields = sdf.schema.fields
    from pyspark.sql import types as T

    # an out name may REPLACE its source column (pandas assigns by name)
    out_schema = T.StructType(
        [f for f in schema_fields if f.name not in specs]
        + [T.StructField(n, T.DoubleType()) for n in specs]
    )
    groups = list(frame.groups)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ORDER_COL)
        for out_name, (kind, src, alpha, adjust, ign) in specs.items():
            ew = pdf[src].ewm(alpha=alpha, adjust=adjust, ignore_na=ign, min_periods=1)
            if kind == "mean":
                pdf[out_name] = ew.mean()
            elif kind == "variance":
                pdf[out_name] = ew.var(bias=False)
            else:
                pdf[out_name] = ew.std(bias=False)
        return pdf

    if groups:
        out = sdf.groupBy(*groups).applyInPandas(apply_fn, out_schema)
        return DataFrame(out, groups=groups, has_order=True)
    # ungrouped: bucket-parallel prefix composition — one uniform hash
    # exchange, never a single whole-frame task (operators/ordered.py)
    try:
        from .ordered import ewm_global

        idxed = frame._with_row_index("__eidx__")
        out = ewm_global(idxed._sdf, "__eidx__", specs).drop("__eidx__")
        return DataFrame(out, groups=[], has_order=True)
    except NotImplementedError:
        # ignore_nils=False + adjust=False over a null-bearing column:
        # the recursion renormalizes per observation (nonlinear across
        # buckets) — honest single-task fallback for this corner
        out = sdf.withColumn("__g__", F.lit(1)).groupBy("__g__").applyInPandas(
            lambda pdf: apply_fn(pdf.drop(columns="__g__")), out_schema
        )
        return DataFrame(out, groups=groups, has_order=True)
