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
    stats = s.groupBy("__pid__").agg(
        F.count(F.lit(1)).alias("__cnt__"), F.min("__mono__").alias("__mn__")
    )
    # prefix sums over #partitions rows — bounded, broadcastable. The
    # constant partition key marks the single-partition window as
    # intentional (and keeps WindowExec from logging a scale warning).
    wpre = W.partitionBy(F.lit(0)).orderBy("__pid__").rowsBetween(W.unboundedPreceding, -1)
    offs = stats.withColumn("__off__", F.coalesce(F.sum("__cnt__").over(wpre), F.lit(0)))
    if total_col is not None:
        wtot = W.partitionBy(F.lit(0)).orderBy("__pid__").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        offs = offs.withColumn(total_col, F.sum("__cnt__").over(wtot))
    offs = offs.drop("__cnt__")
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
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(BUCKET_SIZE)))
    order = F.col(idx_col).desc() if reverse else F.col(idx_col).asc()
    w = W.partitionBy(BUCKET).orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    local = aggfn(F.col(value_col)).over(w)
    per = s.groupBy(BUCKET).agg(aggfn(F.col(value_col)).alias("__tot__"))
    prefix_fn = F.sum if kind in ("sum", "count") else aggfn
    border = F.col(BUCKET).desc() if reverse else F.col(BUCKET).asc()
    # per-bucket summary table: ceil(n / BUCKET_SIZE) rows, bounded
    wpre = W.partitionBy(F.lit(0)).orderBy(border).rowsBetween(W.unboundedPreceding, -1)
    pre = per.withColumn("__pre__", prefix_fn(F.col("__tot__")).over(wpre)).drop("__tot__")
    s = s.withColumn("__loc__", local).join(F.broadcast(pre), BUCKET, "left")
    s = s.withColumn(out_col, _CUM_COMBINE[kind](F.col("__loc__"), F.col("__pre__")))
    return s.drop(BUCKET, "__loc__", "__pre__")


def fill_missing(sdf: SDF, idx_col: str, value_col: str, out_col: str, backward: bool = False) -> SDF:
    """Global forward/backward non-null carry over index order."""
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(BUCKET_SIZE)))
    order = F.col(idx_col).desc() if backward else F.col(idx_col).asc()
    w = W.partitionBy(BUCKET).orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    local = F.last(F.col(value_col), ignorenulls=True).over(w)
    # per-bucket carry value: the bucket's latest (earliest, if backward)
    # non-null value; null-key rows are ignored by max_by/min_by
    pickfn = F.min_by if backward else F.max_by
    per = s.groupBy(BUCKET).agg(
        pickfn(F.col(value_col), F.when(F.col(value_col).isNotNull(), F.col(idx_col))).alias("__lv__")
    )
    border = F.col(BUCKET).desc() if backward else F.col(BUCKET).asc()
    # per-bucket summary table — bounded, see cumulative()
    wpre = W.partitionBy(F.lit(0)).orderBy(border).rowsBetween(W.unboundedPreceding, -1)
    pre = per.withColumn("__pv__", F.last("__lv__", ignorenulls=True).over(wpre)).drop("__lv__")
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

    ordinal/random come straight from the global position; min/max/
    average/dense come from a per-value min/max-position aggregate
    joined back on the value — ties never need to be colocated, so the
    range partitioning may split them freely."""
    c = F.col(value_col)
    key = c.desc() if descending else c.asc()
    if method == "random":
        s = sdf.withColumn("__rnd__", F.rand(seed))
        s = with_global_index(s, [key, F.col("__rnd__").asc()], name="__rk__")
        return s.withColumn(out_col, (F.col("__rk__") + 1).cast("int")).drop("__rk__", "__rnd__")
    tie = [F.col(order_col).asc()] if order_col is not None else []
    s = with_global_index(sdf, [key] + tie, name="__rk__")
    if method == "ordinal":
        return s.withColumn(out_col, (F.col("__rk__") + 1).cast("int")).drop("__rk__")
    vals = s.groupBy(value_col).agg(F.min("__rk__").alias("__vmin__"), F.max("__rk__").alias("__vmax__"))
    if method == "min":
        vals = vals.withColumn("__rv__", (F.col("__vmin__") + 1).cast("int"))
    elif method == "max":
        vals = vals.withColumn("__rv__", (F.col("__vmax__") + 1).cast("int"))
    elif method == "average":
        vals = vals.withColumn("__rv__", (F.col("__vmin__") + F.col("__vmax__")).cast("double") / 2.0 + 1.0)
    elif method == "dense":
        # distinct values ordered by first position == value order
        vals = with_global_index(vals, [F.col("__vmin__").asc()], name="__dr__")
        vals = vals.withColumn("__rv__", (F.col("__dr__") + 1).cast("int")).drop("__dr__")
    else:
        raise NotImplementedError(f"rank method {method!r}")
    vals = vals.select(F.col(value_col).alias("__v2__"), "__rv__")
    joined = s.join(vals, c.eqNullSafe(F.col("__v2__")), "left")
    return joined.withColumn(out_col, F.col("__rv__")).drop("__v2__", "__rv__", "__rk__")
