"""Distributed kernels for *global* (ungrouped) order-dependent ops.

The reference computes cumulative/rank/shift/fill on a single node
(lib/explorer/series.ex:2000-2330, 3104-3342 — Polars does one sorted
pass).  A naive Spark rendering is ``Window.partitionBy()`` — every row
moves to ONE task, which is fatal at scale.  These kernels render the
same semantics with bounded parallel stages:

1. **Global index** (`with_global_index`): range-repartition on the
   sort key, then derive each row's contiguous position from a fresh
   ``monotonically_increasing_id`` (assigned after the in-partition
   sort, so ids are per-partition contiguous) plus an exclusive prefix
   sum of per-partition counts (a broadcast table of #partitions rows).
   One range shuffle; **no window over the data at all**.
2. **Index buckets** (`idx div B`): sequential logic (cumulative, fill,
   lag/lead frames) runs in per-bucket windows — a hash exchange on the
   bucket id, uniform by construction, skew-proof.
3. **Cross-bucket combination**: unbounded ops (cumulative, fill) join a
   tiny per-bucket summary with prefix aggregates; bounded ops (shift,
   peaks, rolling) duplicate the <= k boundary rows into the neighbour
   bucket and drop them after (`with_boundary_context`).
4. **Rank**: global position ordered by value, then a per-value
   min/max-position aggregate joined back — ties need no colocation.

The only single-partition work anywhere is over summary tables whose
size is #partitions or #buckets (= ceil(n / 2^18): ~4M rows at a
trillion input rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Rows per index bucket. Big enough that the per-bucket summary table is
# tiny even at 10^12 rows; small enough that sf0.1 still fans out.
# Tests shrink it to force multi-bucket paths on small data.
BUCKET_SIZE = 1 << 18

BUCKET = "__bkt__"
CTX = "__ctx__"


def _meta_pass(table: SDF, key: str, fn, extra_fields) -> SDF:
    """One pandas pass over a BOUNDED summary table (#partitions or
    ceil(n / BUCKET_SIZE) rows): sort by ``key``, apply ``fn`` to append
    prefix columns.  Runs as a single applyInPandas task — intentional
    and scale-safe because the table is bounded; unlike an unpartitioned
    window it emits no WindowExec scale warning and adds exactly ONE tiny
    stage to the plan (the triangular-join alternative added two
    broadcast joins per prefix and the per-stage overhead dominated)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(list(table.schema.fields) + extra_fields)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key).reset_index(drop=True)
        return fn(pdf)

    single = table.withColumn("__mg__", F.lit(0))
    return single.groupBy("__mg__").applyInPandas(lambda p: run(p.drop(columns="__mg__")), schema)


def with_global_index(
    sdf: SDF,
    keys: list[Column],
    name: str,
    aligned: bool = False,
    total_col: str | None = None,
) -> SDF:
    """Attach a contiguous 0-based position ordered by ``keys``.

    ``aligned=True`` promises the physical partition layout already
    matches ``keys`` (ascending partition id == ascending key) and skips
    the range shuffle.  ``total_col`` additionally attaches the total
    row count to every row (from the same broadcast, no extra job).
    """
    s = sdf if aligned else sdf.repartitionByRange(*keys)
    s = s.sortWithinPartitions(*keys)
    # fresh id AFTER the sort: per-partition contiguous, iteration order
    s = s.withColumn("__mono__", F.monotonically_increasing_id())
    s = s.withColumn("__pid__", F.spark_partition_id())
    # the frame feeds BOTH the stats branch and the final join; without a
    # pin Spark re-executes the whole upstream (nondeterministic ids block
    # exchange reuse) — and re-execution compounds exponentially when
    # kernels chain (3 ranks in one mutate ran 25x slower than one)
    s = s.persist()
    stats = s.groupBy("__pid__").agg(
        F.count(F.lit(1)).alias("__cnt__"), F.min("__mono__").alias("__mn__")
    )
    # prefix sums over the #partitions-row summary — one bounded pandas
    # pass, NOT a window (and not one broadcast join per prefix column)
    from pyspark.sql import types as T

    def _offsets(pdf):
        pdf["__off__"] = pdf["__cnt__"].cumsum().shift(1, fill_value=0)
        if total_col is not None:
            pdf[total_col] = pdf["__cnt__"].sum()
        return pdf

    extra = [T.StructField("__off__", T.LongType())]
    if total_col is not None:
        extra.append(T.StructField(total_col, T.LongType()))
    offs = _meta_pass(stats, "__pid__", _offsets, extra).drop("__cnt__")
    s = s.join(F.broadcast(offs), "__pid__", "left")
    s = s.withColumn(name, (F.col("__off__") + (F.col("__mono__") - F.col("__mn__"))).cast("long"))
    return s.drop("__pid__", "__mono__", "__mn__", "__off__")


# ---------------------------------------------------------------------------
# unbounded ops: cumulative aggregates & fill
# ---------------------------------------------------------------------------

_CUM_AGG = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "product": F.product,
    "count": F.count,
}


def _ns_add(a: Column, b: Column) -> Column:
    return F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
        F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
    )


def _ns_mul(a: Column, b: Column) -> Column:
    return F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
        F.coalesce(a, F.lit(1.0)) * F.coalesce(b, F.lit(1.0))
    )


_CUM_COMBINE = {
    "sum": _ns_add,
    "min": F.least,
    "max": F.greatest,
    "product": _ns_mul,
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
}


def cumulative(sdf: SDF, idx_col: str, value_col: str, out_col: str, kind: str, reverse: bool = False) -> SDF:
    """Global cumulative sum/min/max/product/count over index order."""
    aggfn = _CUM_AGG[kind]
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(BUCKET_SIZE))).persist()
    order = F.col(idx_col).desc() if reverse else F.col(idx_col).asc()
    w = W.partitionBy(BUCKET).orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    local = aggfn(F.col(value_col)).over(w)
    per = s.groupBy(BUCKET).agg(aggfn(F.col(value_col)).alias("__tot__"))
    # exclusive prefix over the bounded per-bucket summary (pandas pass)
    from pyspark.sql import types as T

    _prefix = {"sum": "cumsum", "count": "cumsum", "min": "cummin", "max": "cummax", "product": "cumprod"}[kind]

    def _pre(pdf):
        if reverse:
            pdf = pdf.iloc[::-1].reset_index(drop=True)
        acc = getattr(pdf["__tot__"], _prefix)().shift(1)
        pdf["__pre__"] = acc
        if reverse:
            pdf = pdf.iloc[::-1].reset_index(drop=True)
        return pdf

    pre = _meta_pass(per, BUCKET, _pre, [T.StructField("__pre__", per.schema["__tot__"].dataType)]).drop(
        "__tot__"
    )
    s = s.withColumn("__loc__", local).join(F.broadcast(pre), BUCKET, "left")
    s = s.withColumn(out_col, _CUM_COMBINE[kind](F.col("__loc__"), F.col("__pre__")))
    return s.drop(BUCKET, "__loc__", "__pre__")


def fill_missing(sdf: SDF, idx_col: str, value_col: str, out_col: str, backward: bool = False) -> SDF:
    """Global forward/backward non-null carry over index order."""
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(BUCKET_SIZE))).persist()
    order = F.col(idx_col).desc() if backward else F.col(idx_col).asc()
    w = W.partitionBy(BUCKET).orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    local = F.last(F.col(value_col), ignorenulls=True).over(w)
    # per-bucket carry value: the bucket's latest (earliest, if backward)
    # non-null value; null-key rows are ignored by max_by/min_by
    pickfn = F.min_by if backward else F.max_by
    per = s.groupBy(BUCKET).agg(
        pickfn(F.col(value_col), F.when(F.col(value_col).isNotNull(), F.col(idx_col))).alias("__lv__")
    )
    # bounded pandas pass: carry = nearest preceding (following, if
    # backward) bucket's non-null value
    from pyspark.sql import types as T

    def _carry(pdf):
        if backward:
            pdf = pdf.iloc[::-1].reset_index(drop=True)
        pdf["__pv__"] = pdf["__lv__"].ffill().shift(1)
        if backward:
            pdf = pdf.iloc[::-1].reset_index(drop=True)
        return pdf

    pre = _meta_pass(per, BUCKET, _carry, [T.StructField("__pv__", per.schema["__lv__"].dataType)]).drop(
        "__lv__"
    )
    s = s.withColumn("__loc__", local).join(F.broadcast(pre), BUCKET, "left")
    s = s.withColumn(out_col, F.coalesce(F.col("__loc__"), F.col("__pv__")))
    return s.drop(BUCKET, "__loc__", "__pv__")


# ---------------------------------------------------------------------------
# bounded ops: shift / peaks / rolling windows via boundary duplication
# ---------------------------------------------------------------------------


def with_boundary_context(sdf: SDF, idx_col: str, need_before: int, need_after: int) -> SDF:
    """Bucket rows by index and duplicate the <= k rows adjacent to each
    bucket boundary into the neighbouring bucket (flagged ``__ctx__``),
    so any window frame spanning [-need_before, +need_after] rows is
    exact inside a single bucket.  Callers compute their windows with
    ``Window.partitionBy(BUCKET).orderBy(idx)`` and then call
    ``strip_boundary_context``."""
    b = BUCKET_SIZE
    while need_before >= b or need_after >= b:
        b *= 2
    sdf = sdf.persist()  # referenced by the base and each boundary copy
    bkt = F.floor(F.col(idx_col) / F.lit(b))
    pos = F.col(idx_col) % F.lit(b)
    base = sdf.withColumn(BUCKET, bkt).withColumn(CTX, F.lit(False))
    parts = [base]
    if need_before > 0:
        parts.append(
            sdf.filter(pos >= F.lit(b - need_before))
            .withColumn(BUCKET, bkt + 1)
            .withColumn(CTX, F.lit(True))
        )
    if need_after > 0:
        parts.append(
            sdf.filter(pos < F.lit(need_after)).withColumn(BUCKET, bkt - 1).withColumn(CTX, F.lit(True))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def strip_boundary_context(sdf: SDF) -> SDF:
    return sdf.filter(~F.col(CTX)).drop(BUCKET, CTX)


# ---------------------------------------------------------------------------
# rank
# ---------------------------------------------------------------------------


def global_rank(
    sdf: SDF,
    order_col: str | None,
    value_col: str,
    out_col: str,
    method: str = "ordinal",
    descending: bool = False,
    seed: int | None = None,
) -> SDF:
    """Global rank of ``value_col`` (reference series.ex rank/1-3;
    methods ordinal/min/max/dense/average/random).

    ordinal/random need per-row positions and go through the full-frame
    global index. min/max/average/dense need only per-VALUE statistics:
    the frame never range-shuffles — one map-combined groupBy builds the
    distinct-value count table, the (much smaller) table gets a global
    index + count prefix, and ranks join back on the value. Ties need no
    colocation; the join is an ordinary equi-join (broadcast when the
    value table is small)."""
    c = F.col(value_col)
    key = c.desc() if descending else c.asc()
    if method == "random":
        s = sdf.withColumn("__rnd__", F.rand(seed))
        s = with_global_index(s, [key, F.col("__rnd__").asc()], name="__rk__")
        return s.withColumn(out_col, (F.col("__rk__") + 1).cast("int")).drop("__rk__", "__rnd__")
    if method == "ordinal":
        tie = [F.col(order_col).asc()] if order_col is not None else []
        s = with_global_index(sdf, [key] + tie, name="__rk__")
        return s.withColumn(out_col, (F.col("__rk__") + 1).cast("int")).drop("__rk__")
    if method not in ("min", "max", "average", "dense"):
        raise NotImplementedError(f"rank method {method!r}")
    vals = sdf.groupBy(value_col).agg(F.count(F.lit(1)).alias("__c__"))
    # dense position = index among distinct values in value order;
    # min rank = 1 + count of rows in earlier value groups (inclusive
    # cumsum of the counts minus the own count)
    vi = with_global_index(vals, [key], name="__dr__")
    vi = cumulative(vi, "__dr__", "__c__", "__cum__", "sum")
    if method == "min":
        rv = (F.col("__cum__") - F.col("__c__") + 1).cast("int")
    elif method == "max":
        rv = F.col("__cum__").cast("int")
    elif method == "average":
        rv = (2 * F.col("__cum__") - F.col("__c__") + 1).cast("double") / 2.0
    else:  # dense
        rv = (F.col("__dr__") + 1).cast("int")
    vals = vi.select(F.col(value_col).alias("__v2__"), rv.alias("__rv__"))
    joined = sdf.join(vals, c.eqNullSafe(F.col("__v2__")), "left")
    return joined.withColumn(out_col, F.col("__rv__")).drop("__v2__", "__rv__")


# ---------------------------------------------------------------------------
# global EWM: bucket-parallel prefix composition
# ---------------------------------------------------------------------------
#
# EWM accumulators are first-order linear recurrences y_t = c*y_{t-1} + w_t
# (c = 1-alpha for num/den, (1-alpha)^2 for the squared-weight terms), so
# they compose across index buckets: a bucket's contribution to any later
# row is its end-state scaled by c^distance.  Stages:
#   1. per-bucket pandas kernel -> per-row LOCAL accumulators + end states
#      (uniform hash exchange on the bucket id);
#   2. bucket end states (ceil(n/B) rows, bounded) combine sequentially in
#      one tiny task -> per-bucket incoming carries;
#   3. broadcast-join carries back; per-row result is local + c^(i+1)*carry
#      (c^distance underflows to 0 gracefully -- no overflow anywhere).
# pandas semantics are matched exactly (adjust True/False, ignore_na=False
# absolute positions, NaN==missing, bias=False variance).


def _geo_scan(x, c):
    """y_t = c*y_{t-1} + x_t as a chunked closed form (vectorized; chunk
    sized so c^-chunk cannot overflow)."""
    import math as _math

    import numpy as np

    n = len(x)
    out = np.empty(n, dtype="float64")
    if c <= 0.0:  # alpha == 1: y_t = x_t
        return x.astype("float64")
    chunk = 128 if c >= 0.02 else max(1, int(600.0 / -_math.log10(c)))
    powc = c ** np.arange(1, chunk + 1, dtype="float64")
    invc = (1.0 / c) ** np.arange(chunk, dtype="float64")
    carry = 0.0
    for s in range(0, n, chunk):
        xa = x[s : s + chunk]
        k = len(xa)
        local = np.cumsum(xa * invc[:k]) * (powc[:k] / c)
        y = local + powc[:k] * carry
        out[s : s + k] = y
        carry = y[-1]
    return out


def ewm_global(sdf: SDF, idx_col: str, specs: dict) -> SDF:
    """Distributed ungrouped EWM over global index order.

    specs: out_name -> (kind, src_col, alpha, adjust), kind in
    {mean, variance, standard_deviation} — pandas-equivalent results
    (adjust True/False, ignore_na=False, bias=False variance) without
    ever funnelling the frame through one task.  Variance/std with
    adjust=False falls back to NotImplementedError (use the grouped
    path); mean supports both adjust modes.
    """
    import pandas as pd
    from pyspark.sql import types as T

    for out_name, (kind, _s, _a, adjust) in specs.items():
        if kind != "mean" and not adjust:
            raise NotImplementedError("distributed ewm variance/std requires adjust=True")

    srcs = sorted({src for (_k, src, _a, _adj) in specs.values()})
    alphas = sorted({a for (_k, _s, a, _adj) in specs.values()})
    needs_sq = any(k != "mean" for (k, _s, _a, _adj) in specs.values())

    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(BUCKET_SIZE)))

    # accumulator channels per (src, alpha): num/den at ratio c=(1-a), and
    # ssq/dn2 at ratio c^2 when variance/std is requested
    all_chans = []
    for src in srcs:
        for a in alphas:
            all_chans += [("num", src, a, 1), ("den", src, a, 1)]
            if needs_sq:
                # ssq = sum w*x^2 shares the weight ratio c; only the
                # squared-weight sum dn2 = sum w^2 decays at c^2
                all_chans += [("ssq", src, a, 1), ("dn2", src, a, 2)]

    def cname(kind, src, a):
        return f"__{kind}_{src}_{str(a).replace('.', '_')}__"

    fields = list(sdf.schema.fields) + [T.StructField(BUCKET, T.LongType())]
    local_schema = T.StructType(
        fields + [T.StructField(cname(k, s_, a), T.DoubleType()) for (k, s_, a, _p) in all_chans]
    )

    def local_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        for (kind, src, a, power) in all_chans:
            c = (1.0 - a) ** power
            x = pdf[src].to_numpy(dtype="float64", na_value=np.nan)
            valid = ~np.isnan(x)
            if kind == "num":
                w = np.where(valid, x, 0.0)
            elif kind == "ssq":
                w = np.where(valid, x * x, 0.0)
            else:  # den / dn2
                w = valid.astype("float64")
            pdf[cname(kind, src, a)] = _geo_scan(w, c)
        return pdf

    local = s.groupBy(BUCKET).applyInPandas(local_pass, local_schema).persist()

    # bucket end states -> incoming carries (ceil(n/B) rows, one tiny task)
    end_aggs = [F.max(F.col(idx_col)).alias("__last__")] + [
        F.max_by(F.col(cname(k, s_, a)), F.col(idx_col)).alias(cname(k, s_, a))
        for (k, s_, a, _p) in all_chans
    ]
    ends = local.groupBy(BUCKET).agg(*end_aggs)
    ends = ends.withColumn("__len__", F.col("__last__") % F.lit(BUCKET_SIZE) + 1).drop("__last__")

    carry_fields = [T.StructField(BUCKET, T.LongType())] + [
        T.StructField("__carry_" + cname(k, s_, a), T.DoubleType()) for (k, s_, a, _p) in all_chans
    ]

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(BUCKET).reset_index(drop=True)
        out = {BUCKET: pdf[BUCKET]}
        for (kind, src, a, power) in all_chans:
            c = (1.0 - a) ** power
            carries, running = [], 0.0
            for end_val, blen in zip(pdf[cname(kind, src, a)], pdf["__len__"]):
                carries.append(running)  # carry INTO this bucket
                running = end_val + (c ** int(blen)) * running
            out["__carry_" + cname(kind, src, a)] = carries
        return pd.DataFrame(out)

    # single group over the BOUNDED bucket-summary table (ceil(n/B) rows)
    carries = (
        ends.withColumn("__meta_g__", F.lit(0))
        .groupBy("__meta_g__")
        .applyInPandas(lambda p: combine(p.drop(columns="__meta_g__")), T.StructType(carry_fields))
    )

    j = local.join(F.broadcast(carries), BUCKET, "left")
    pos1 = (F.col(idx_col) % F.lit(BUCKET_SIZE) + 1).cast("double")  # i+1

    def total(kind, src, a, power):
        c = float((1.0 - a) ** power)
        carry = F.coalesce(F.col("__carry_" + cname(kind, src, a)), F.lit(0.0))
        return F.col(cname(kind, src, a)) + F.pow(F.lit(c), pos1) * carry

    # first-valid scalars, needed once per adjust=False source
    fv_cols = []
    for out_name, (kind, src, a, adjust) in specs.items():
        if adjust:
            continue
        x0, j0 = f"__x0_{out_name}__", f"__j0_{out_name}__"
        first = sdf.where(
            F.col(src).isNotNull() & ~F.isnan(F.col(src).cast("double"))
        ).agg(
            F.min_by(F.col(src), F.col(idx_col)).alias(x0),
            F.min(F.col(idx_col)).alias(j0),
        )
        j = j.crossJoin(F.broadcast(first))
        fv_cols += [x0, j0]

    out_cols = {}
    for out_name, (kind, src, a, adjust) in specs.items():
        num, den = total("num", src, a, 1), total("den", src, a, 1)
        if not adjust:
            # adjust=False gives the FIRST valid value weight 1 instead of
            # alpha: num' = a*num + (1-a)*x0*c^(t-j0), same for den
            x0, j0 = F.col(f"__x0_{out_name}__"), F.col(f"__j0_{out_name}__")
            dist = (F.col(idx_col) - j0).cast("double")
            cw = F.when(j0.isNotNull() & (F.col(idx_col) >= j0), F.pow(F.lit(1.0 - a), dist)).otherwise(
                F.lit(0.0)
            )
            num = a * num + (1.0 - a) * cw * x0.cast("double")
            den = a * den + (1.0 - a) * cw
        mean = num / den
        if kind == "mean":
            expr = mean
        else:
            ssq, dn2 = total("ssq", src, a, 1), total("dn2", src, a, 2)
            var_b = ssq / den - mean * mean
            corr = (den * den) / (den * den - dn2)
            expr = F.when(den * den > dn2, F.greatest(var_b * corr, F.lit(0.0))).otherwise(F.lit(None))
            if kind == "standard_deviation":
                expr = F.sqrt(expr)
        out_cols[out_name] = F.when(den > 0, expr).otherwise(F.lit(None))

    j = j.withColumns(out_cols)
    drop = [cname(k, s_, a) for (k, s_, a, _p) in all_chans]
    drop += ["__carry_" + cname(k, s_, a) for (k, s_, a, _p) in all_chans]
    drop += [BUCKET] + fv_cols
    return j.drop(*drop)
