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
   sum of per-partition counts.  The per-partition summary (#partitions
   rows) is collected to the DRIVER and re-emitted as a literal
   broadcast lookup — exactly the strategy of Spark's own
   ``RDD.zipWithIndex`` (core/rdd/ZippedWithIndexRDD.scala runs a
   count-per-partition job first).  The literal table keeps the plan
   tree shallow: the broadcast side is a LocalRelation, not a derived
   subplan, so chained kernels stay linear in plan size.
2. **Index buckets** (`idx div B`): sequential logic (cumulative, fill,
   lag/lead frames) runs in per-bucket windows — a hash exchange on the
   bucket id, uniform by construction, skew-proof.
3. **Cross-bucket combination**: unbounded ops (cumulative, fill)
   collect the tiny per-bucket summary (ceil(n / B) rows) and join the
   driver-computed prefix back as a literal broadcast; bounded ops
   (shift, peaks, rolling) duplicate the <= k boundary rows into the
   neighbour bucket and drop them after (`with_boundary_context`).
4. **Rank**: per-VALUE statistics (count, count-prefix, dense position)
   computed on the distinct-value table with the same kernel, then an
   equi-join back on the value — ties need no colocation, and every
   method (min/max/average/dense) derives from one pass
   (`rank_columns`).

The only sequential work anywhere is a driver loop over summary rows
whose count is #partitions or ceil(n / 2^18) — the same bound Spark
itself accepts for ``zipWithIndex``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Rows per index bucket. Big enough that the per-bucket summary table is
# tiny even at 10^12 rows; small enough that sf0.1 still fans out.
# Tests shrink it to force multi-bucket paths on small data.
BUCKET_SIZE = 1 << 18

BUCKET = "__bkt__"
CTX = "__ctx__"


def bucket_size_for(n: int | None) -> int:
    """Adaptive index-bucket width for the driver-summary kernels.

    ``max(BUCKET_SIZE, ceil(n / (32 * parallelism)))``: the per-bucket
    summary the driver collects stays O(cores) at ANY row count (a fixed
    2^18 width would collect ~4M summary rows at 10^12 rows — bounded,
    but needlessly large). Callers that don't know ``n`` pass None and
    keep the fixed floor; tests that shrink ``BUCKET_SIZE`` still win
    because small ``n`` keeps the adaptive term below the floor."""
    if not n or n <= 0:
        return BUCKET_SIZE
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    par = spark.sparkContext.defaultParallelism if spark is not None else 32
    return max(BUCKET_SIZE, -(-n // (32 * max(par, 1))))


def _lookup_df(spark, rows: list[tuple], fields: list[T.StructField]) -> SDF:
    """A driver-built lookup table for broadcast joins, sliced by ROWS
    (createDataFrame's default parallelizes into $cores slices, so every
    stage reading a few-thousand-row lookup schedules $cores near-empty
    tasks)."""
    nsl = max(1, -(-len(rows) // (1 << 18)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, nsl), T.StructType(fields)
    )


# Above this many summary entries the constant-array projection gives way
# to a broadcast join (a plan-constant array of ~64k longs is fine; tens
# of millions would bloat the plan).
ARRAY_LOOKUP_MAX = 1 << 16

# Value-statistic ranks need an ordered prefix over the DISTINCT-value
# table. When the FRAME row count (an upper bound on distinct values,
# and metadata-fast to get for parquet-backed frames) is below this, the
# table is "summary-sized": one hash-partitioned window (+ broadcast
# join-back) beats the full range-shuffle/checkpoint/stats-job kernel by
# ~3x in fixed cost; above it the distributed kernel takes over.
# 2^17, not higher: the small path puts a column's WHOLE distinct table
# in ONE window task, and the frame-row gate can't see uniqueness — a
# near-unique 600k-value column under a 2^21 gate ran a 583k-row
# single-task window and LOST to the distributed kernel ~2x (measured
# sf0.1 spearman: small 3.6s vs big 2.0s cold). At 2^17 the worst-case
# single task is ~0.1-0.3s, and genuinely small frames keep the cheap path.
SMALL_VALS_MAX = 1 << 17

# Broadcast budget for rank join-back tables (value + rank + row
# overhead): force the broadcast hint only when the MEASURED estimate
# fits — comfortably under the session's 64 MB autoBroadcastJoinThreshold
# and orders of magnitude under the 8 GB broadcast hard cap. Row counts
# alone can't gate this (2M distinct wide strings != 2M distinct longs).
BC_BYTES_MAX = 48 * 1024 * 1024


def _rank_small_ok(n_distinct: int, est_bytes: int | None, approx: bool = False) -> bool:
    """May this value table take the single-window small path? Beyond the
    unconditional SMALL_VALS_MAX, allow it up to the BROADCAST bound
    (2^21 rows AND estimated bytes under BC_BYTES_MAX): a rank table the
    pipeline is prepared to hand every executor as a broadcast is by the
    same argument small enough for one window task — which replaces the
    range-sample + shuffle + checkpoint + stats-job kernel (3 driver
    barriers) with zero extra jobs. ``approx`` shaves 10% off the row
    bound to absorb approx_count_distinct's error; a mis-route in either
    direction is still CORRECT, only differently priced."""
    if n_distinct <= SMALL_VALS_MAX:
        return True
    bound = int(0.9 * (1 << 21)) if approx else (1 << 21)
    return n_distinct <= bound and est_bytes is not None and est_bytes <= BC_BYTES_MAX

# Below this many rows a global row index comes from one single-partition
# sort (deterministic — the sort keys are total orders) instead of the
# range-shuffle + checkpoint + stats-job kernel: ~3 fewer jobs and no
# plan-to-RDD checkpoint compile, which dominate small/mid frames.
SMALL_INDEX_MAX = 1 << 17


def _array_lookup(key: Column, values: list, dtype: T.DataType) -> Column:
    """``values[key]`` as a constant-array projection — the scalable
    replacement for joining a tiny driver-built lookup table: no extra
    DataFrame, no broadcast exchange, pure codegen.  ``key`` must be a
    dense 0-based id (partition or bucket number)."""
    arr = F.array(*[F.lit(v).cast(dtype) for v in values])
    return F.get(arr, key.cast("int"))


def _dense(rows: dict, n: int, default=None) -> list:
    """Spread a {id: value} dict over the dense id range [0, n)."""
    return [rows.get(i, default) for i in range(n)]


def _prefix_scan(vals: list, kind: str, reverse: bool = False) -> list:
    """Exclusive null-skipping prefix of per-bucket totals (driver side;
    the list is bounded by the bucket count)."""
    import operator

    op = {
        "sum": operator.add,
        "count": operator.add,
        "product": operator.mul,
        "min": min,
        "max": max,
    }[kind]
    src = list(reversed(vals)) if reverse else vals
    out, running = [], None
    for v in src:
        out.append(running)
        if v is not None:
            running = v if running is None else op(running, v)
    return list(reversed(out)) if reverse else out


def with_global_index(
    sdf: SDF,
    keys: list[Column],
    name: str,
    aligned: bool = False,
    total_col: str | None = None,
    stats_out: dict | None = None,
    n_hint: int | None = None,
    skip_probe: bool = False,
) -> SDF:
    """Attach a contiguous 0-based position ordered by ``keys``.

    ``aligned=True`` promises the physical partition layout already
    matches ``keys`` (ascending partition id == ascending key) and skips
    the range shuffle.  ``total_col`` additionally attaches the total
    row count to every row (a literal — known from the same stats job).
    """
    # small frames: one deterministic single-partition sort, no range
    # sampling pass, no checkpoint, no stats job. The keys passed here
    # are always total orders (ORDER_COL participates), so the ids are
    # reproducible across re-executions without pinning. count() is
    # metadata-fast on parquet-backed frames; the threshold bounds the
    # single task like every driver-summary gate in this module.
    # probe with a limit, not a full count: above the threshold a bare
    # count() would fully execute an arbitrary upstream plan just to
    # discard the number (only bare parquet scans count from metadata);
    # the limit short-circuits. At or under the threshold the probe IS
    # the exact count.
    # ``n_hint``: exact row count already known (kernel stats upstream) —
    # reuse it. ``skip_probe``: the plan contains a global sort (limit
    # cannot short-circuit it), so probing would execute the sort just to
    # count; go straight to the big path, whose stats job yields n anyway.
    if n_hint is not None:
        n = n_hint
    elif skip_probe:
        n = SMALL_INDEX_MAX + 1  # unknown: assume large
    else:
        n = sdf.limit(SMALL_INDEX_MAX + 1).count()
    if stats_out is not None and n <= SMALL_INDEX_MAX:
        stats_out["n"] = n
    if n <= SMALL_INDEX_MAX:
        # repartition (not coalesce): coalesce(1) would collapse the whole
        # upstream stage into one task; an exchange of <=SMALL_INDEX_MAX
        # rows keeps upstream parallelism and the sort restores order
        s = sdf.repartition(1).sortWithinPartitions(*keys)
        s = s.withColumn(name, F.monotonically_increasing_id())
        if total_col is not None:
            s = s.withColumn(total_col, F.lit(n).cast("long"))
        return s
    # aligned=True promises rows are already physically ordered by keys
    # (e.g. right after a global sort) — the local re-sort would be a no-op
    # Spark can't prove away, so skip it entirely
    s = sdf if aligned else sdf.repartitionByRange(*keys).sortWithinPartitions(*keys)
    # fresh id AFTER the sort: per-partition contiguous, iteration order
    s = s.withColumn("__mono__", F.monotonically_increasing_id())
    s = s.withColumn("__pid__", F.spark_partition_id())
    # pin before the stats job: the ids are nondeterministic, so the
    # offsets collected below are only valid against THIS materialization.
    # localCheckpoint (not persist): ~2x cheaper to build than the columnar
    # cache, auto-freed by the ContextCleaner once unreferenced (persist
    # entries pile up in the CacheManager and slow every later plan
    # analysis), and on partition loss it fails loudly instead of silently
    # recomputing different ids.
    s = s.localCheckpoint(eager=False)
    stats = s.groupBy("__pid__").agg(
        F.count(F.lit(1)).alias("__cnt__"), F.min("__mono__").alias("__mn__")
    ).collect()
    stats.sort(key=lambda r: r["__pid__"])
    offs, mns, off = {}, {}, 0
    for r in stats:
        offs[r["__pid__"]] = off
        mns[r["__pid__"]] = r["__mn__"]
        off += r["__cnt__"]
    nparts = (max(offs) + 1) if offs else 0
    pid = F.col("__pid__")
    if nparts <= ARRAY_LOOKUP_MAX:
        base = _array_lookup(pid, _dense(offs, nparts, 0), T.LongType()) - _array_lookup(
            pid, _dense(mns, nparts, 0), T.LongType()
        )
        s = s.withColumn(name, (base + F.col("__mono__")).cast("long"))
    else:
        lookup = _lookup_df(
            sdf.sparkSession,
            [(p, offs[p], mns[p]) for p in offs],
            [
                T.StructField("__pid__", T.IntegerType()),
                T.StructField("__off__", T.LongType()),
                T.StructField("__mn__", T.LongType()),
            ],
        )
        s = s.join(F.broadcast(lookup), "__pid__", "left")
        s = s.withColumn(name, (F.col("__off__") + (F.col("__mono__") - F.col("__mn__"))).cast("long"))
        s = s.drop("__off__", "__mn__")
    if total_col is not None:
        s = s.withColumn(total_col, F.lit(off).cast("long"))
    if stats_out is not None:
        stats_out["n"] = off
    return s.drop("__pid__", "__mono__")


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


def cumulative(
    sdf: SDF,
    idx_col: str,
    value_col: str,
    out_col: str,
    kind: str,
    reverse: bool = False,
    n_hint: int | None = None,
) -> SDF:
    """Global cumulative sum/min/max/product/count over index order.

    Local per-bucket window + a driver-computed exclusive prefix of the
    per-bucket totals (bounded: ceil(n / bucket width) rows, and the
    width adapts to ``n_hint`` so the summary stays O(cores)) joined
    back as a literal broadcast."""
    aggfn = _CUM_AGG[kind]
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(bucket_size_for(n_hint))))
    # pin before the driver summary: the frame is consumed twice (the
    # per-bucket collect below + the returned plan), and without the pin
    # an arbitrary upstream chain re-executes per consumption — chained
    # kernels would multiply upstream cost (review r4)
    s = s.localCheckpoint(eager=False)
    order = F.col(idx_col).desc() if reverse else F.col(idx_col).asc()
    w = W.partitionBy(BUCKET).orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    local = aggfn(F.col(value_col)).over(w)
    per = s.groupBy(BUCKET).agg(aggfn(F.col(value_col)).alias("__tot__"))
    tot_type = per.schema["__tot__"].dataType
    rows = per.collect()
    rows.sort(key=lambda r: r[BUCKET])
    pre = _prefix_scan([r["__tot__"] for r in rows], kind, reverse=reverse)
    by_bkt = {r[BUCKET]: p for r, p in zip(rows, pre)}
    nb = (max(by_bkt) + 1) if by_bkt else 0
    s = s.withColumn("__loc__", local)
    if nb <= ARRAY_LOOKUP_MAX:
        s = s.withColumn("__pre__", _array_lookup(F.col(BUCKET), _dense(by_bkt, nb), tot_type))
    else:
        lookup = _lookup_df(
            sdf.sparkSession,
            list(by_bkt.items()),
            [T.StructField(BUCKET, T.LongType()), T.StructField("__pre__", tot_type)],
        )
        s = s.join(F.broadcast(lookup), BUCKET, "left")
    combined = _CUM_COMBINE[kind](F.col("__loc__"), F.col("__pre__"))
    if kind == "product":
        # Spark's PRODUCT always emits double; integer series keep their
        # dtype (series.ex cumulative_product doctest: s64)
        vt = s.schema[value_col].dataType
        if isinstance(vt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            combined = combined.cast(vt)
    if kind != "count":
        # nil positions STAY nil; accumulation skips them (series.ex
        # cumulative_* doctests: [1, 2, nil, 4] -> [1, 3, nil, 7])
        combined = F.when(F.col(value_col).isNotNull(), combined)
    s = s.withColumn(out_col, combined)
    return s.drop(BUCKET, "__loc__", "__pre__")


def fill_missing(
    sdf: SDF,
    idx_col: str,
    value_col: str,
    out_col: str,
    backward: bool = False,
    n_hint: int | None = None,
) -> SDF:
    """Global forward/backward non-null carry over index order."""
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(bucket_size_for(n_hint))))
    s = s.localCheckpoint(eager=False)  # consumed twice — see cumulative()
    order = F.col(idx_col).desc() if backward else F.col(idx_col).asc()
    w = W.partitionBy(BUCKET).orderBy(order).rowsBetween(W.unboundedPreceding, 0)
    local = F.last(F.col(value_col), ignorenulls=True).over(w)
    # per-bucket carry value: the bucket's latest (earliest, if backward)
    # non-null value; null-key rows are ignored by max_by/min_by
    pickfn = F.min_by if backward else F.max_by
    per = s.groupBy(BUCKET).agg(
        pickfn(F.col(value_col), F.when(F.col(value_col).isNotNull(), F.col(idx_col))).alias("__lv__")
    )
    lv_type = per.schema["__lv__"].dataType
    rows = per.collect()
    rows.sort(key=lambda r: r[BUCKET], reverse=backward)
    carries, running = [], None
    for r in rows:
        carries.append(running)
        if r["__lv__"] is not None:
            running = r["__lv__"]
    by_bkt = {r[BUCKET]: c for r, c in zip(rows, carries)}
    nb = (max(by_bkt) + 1) if by_bkt else 0
    s = s.withColumn("__loc__", local)
    if nb <= ARRAY_LOOKUP_MAX:
        s = s.withColumn("__pv__", _array_lookup(F.col(BUCKET), _dense(by_bkt, nb), lv_type))
    else:
        lookup = _lookup_df(
            sdf.sparkSession,
            list(by_bkt.items()),
            [T.StructField(BUCKET, T.LongType()), T.StructField("__pv__", lv_type)],
        )
        s = s.join(F.broadcast(lookup), BUCKET, "left")
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


def rank_columns(
    sdf: SDF,
    order_col: str | None,
    value_col: str,
    methods: dict[str, str],
    descending: bool = False,
    seed: int | None = None,
    n_hint: int | None = None,
) -> SDF:
    """Attach one or more global-rank columns of ``value_col`` in a
    single pass per family (reference series.ex rank/1-3; methods
    ordinal/min/max/dense/average/random).

    ordinal/random need per-row positions and go through the full-frame
    global index. min/max/average/dense need only per-VALUE statistics:
    the frame never range-shuffles — one map-combined groupBy builds the
    distinct-value table, ONE kernel over it yields count, count-prefix
    and dense position together (local pid-window cumsum + driver-side
    per-partition offsets), and every requested method derives from
    those three columns before a single equi-join back on the value.
    Ties need no colocation."""
    out = sdf
    c = F.col(value_col)
    # nulls order LAST so non-null rows take ranks 1..n_valid, then the
    # mask nils them out — reference rank/2 keeps nils as nil without
    # consuming ranks (series_test.exs rank-with-nan grid)
    key = c.desc_nulls_last() if descending else c.asc_nulls_last()
    val_specs: dict[str, str] = {}
    for out_col, method in methods.items():
        if method == "random":
            s = out.withColumn("__rnd__", F.rand(seed))
            s = with_global_index(s, [key, F.col("__rnd__").asc()], name="__rk__")
            out = s.withColumn(
                out_col, F.when(c.isNotNull(), (F.col("__rk__") + 1).cast("long"))
            ).drop("__rk__", "__rnd__")
        elif method == "ordinal":
            tie = [F.col(order_col).asc()] if order_col is not None else []
            s = with_global_index(out, [key] + tie, name="__rk__")
            out = s.withColumn(
                out_col, F.when(c.isNotNull(), (F.col("__rk__") + 1).cast("long"))
            ).drop("__rk__")
        elif method in ("min", "max", "average", "dense"):
            val_specs[out_col] = method
        else:
            raise NotImplementedError(f"rank method {method!r}")
    if not val_specs:
        return out

    # nulls excluded from the value table: the left join below then
    # reports nil rank for null rows, and non-null prefixes are unshifted
    vals = (
        sdf.select(value_col)
        .filter(c.isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    # r12: route small/big on the DISTINCT count, not the frame row
    # count. The old limit-probe couldn't see uniqueness, so a heavy-ties
    # column (50 distinct values in a 600k-row frame) paid the full
    # range-shuffle/checkpoint/stats kernel. One cheap map-combined
    # APPROX probe (approx_count_distinct + byte sums — routing only,
    # never results) replaces the limit-probe job; the 10% margin under
    # the broadcast bound absorbs the estimator's error, and a
    # mis-route in either direction stays correct (a slightly-too-big
    # single window task, or a range kernel over a smallish table).
    # The join-back broadcast is gated on ESTIMATED BYTES, not row count
    # alone (a 2M-distinct wide-string column must not force a multi-GB
    # broadcast).
    nv = n_hint
    small_ok = None
    est_bytes = None
    if nv is None or nv > SMALL_VALS_MAX:
        vt = sdf.schema[value_col].dataType
        var_width = not isinstance(
            vt,
            (T.NumericType, T.DateType, T.TimestampType, T.TimestampNTZType, T.BooleanType),
        )
        aggs = [F.approx_count_distinct(value_col).alias("__nd__")]
        if var_width:
            # per-ROW byte sum: an upper bound on the distinct-value
            # bytes, so it can only under-broadcast (safe direction)
            aggs.append(
                F.sum(F.octet_length(F.col(value_col).cast("binary"))).alias("__b__")
            )
        stat = sdf.select(value_col).agg(*aggs).collect()[0]
        nd_est = stat["__nd__"] or 0
        est_bytes = ((stat["__b__"] or 0) if var_width else 8 * nd_est) + 16 * nd_est
        small_ok = _rank_small_ok(nd_est, est_bytes, approx=True)
        if not small_ok:
            # big path: pin the value table — the range exchange SAMPLES
            # its child and then shuffles it, which would execute the
            # scan+aggregate twice unpinned
            vals = vals.localCheckpoint(eager=False)
    if (nv is not None and nv <= SMALL_VALS_MAX) or small_ok:
        # summary-sized value table: a deliberate one-partition window
        # (bounded by nv, like every driver summary here) — no range
        # sampling pass, no checkpoint, no stats job. The partition key
        # is a NON-FOLDABLE constant zero (hash&0; a plain literal or
        # __c__*0 is optimized away, leaving an unpartitioned WindowExec
        # and its single-partition warning).
        vals = vals.withColumn("__sum0__", F.xxhash64(F.col("__c__")).bitwiseAND(F.lit(0)))
        w_ord = W.partitionBy("__sum0__").orderBy(key)
        v2 = vals.withColumn(
            "__lc__", F.sum("__c__").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        ).withColumn("__dp__", F.row_number().over(w_ord) - 1)
        cum = F.col("__lc__")  # inclusive row-count prefix
        dense_pos = F.col("__dp__")
    else:
        v = vals.repartitionByRange(key).sortWithinPartitions(key)
        v = v.withColumn("__mono__", F.monotonically_increasing_id())
        v = v.withColumn("__vpid__", F.spark_partition_id())
        v = v.localCheckpoint(eager=False)  # nondeterministic ids: pin before the stats job
        stats = v.groupBy("__vpid__").agg(
            F.count(F.lit(1)).alias("__n__"),
            F.min("__mono__").alias("__mn__"),
            F.sum("__c__").alias("__t__"),
        ).collect()
        stats.sort(key=lambda r: r["__vpid__"])
        doffs, vmns, coffs = {}, {}, {}
        doff, coff = 0, 0
        for r in stats:
            doffs[r["__vpid__"]] = doff
            vmns[r["__vpid__"]] = r["__mn__"]
            coffs[r["__vpid__"]] = coff
            doff += r["__n__"]
            coff += r["__t__"]
        nparts = (max(doffs) + 1) if doffs else 0
        vpid = F.col("__vpid__")
        w = W.partitionBy("__vpid__").orderBy("__mono__").rowsBetween(W.unboundedPreceding, 0)
        v2 = v.withColumn("__lc__", F.sum("__c__").over(w))
        if nparts <= ARRAY_LOOKUP_MAX:
            v2 = v2.withColumns(
                {
                    "__doff__": _array_lookup(vpid, _dense(doffs, nparts, 0), T.LongType()),
                    "__vmn__": _array_lookup(vpid, _dense(vmns, nparts, 0), T.LongType()),
                    "__coff__": _array_lookup(vpid, _dense(coffs, nparts, 0), T.LongType()),
                }
            )
        else:
            lookup = _lookup_df(
                sdf.sparkSession,
                [(p, doffs[p], vmns[p], coffs[p]) for p in doffs],
                [
                    T.StructField("__vpid__", T.IntegerType()),
                    T.StructField("__doff__", T.LongType()),
                    T.StructField("__vmn__", T.LongType()),
                    T.StructField("__coff__", T.LongType()),
                ],
            )
            v2 = v2.join(F.broadcast(lookup), "__vpid__", "left")
        cum = F.col("__coff__") + F.col("__lc__")  # inclusive row-count prefix
        dense_pos = F.col("__doff__") + (F.col("__mono__") - F.col("__vmn__"))
    sel = [F.col(value_col).alias("__v2__")]
    tmp_names = {}
    for i, (out_col, method) in enumerate(val_specs.items()):
        if method == "min":
            e = (cum - F.col("__c__") + 1).cast("long")
        elif method == "max":
            e = cum.cast("long")
        elif method == "average":
            e = (2 * cum - F.col("__c__") + 1).cast("double") / 2.0
        else:  # dense
            e = (dense_pos + 1).cast("long")
        tmp_names[out_col] = f"__rv{i}__"
        sel.append(e.alias(tmp_names[out_col]))
    rv = v2.select(*sel)
    if (nv is not None and nv <= SMALL_VALS_MAX) or (
        est_bytes is not None and est_bytes <= BC_BYTES_MAX
    ):
        # known-small: either the caller-known frame row count (an upper
        # bound on the rank table, <= 2^17 rows) or the measured value
        # table BYTES under the broadcast budget — broadcast the rank
        # table instead of shuffling the frame by value. Byte-gated (r12,
        # ADVICE): a row-count-only gate would force a multi-GB broadcast
        # for ~2M distinct wide strings.
        rv = F.broadcast(rv)
    # temp output names + withColumn so out_col may REPLACE value_col
    # itself (the spearman path ranks a column in place)
    joined = out.join(rv, c.eqNullSafe(F.col("__v2__")), "left")
    joined = joined.withColumns({o: F.col(t) for o, t in tmp_names.items()})
    return joined.drop("__v2__", *tmp_names.values())


def global_rank(
    sdf: SDF,
    order_col: str | None,
    value_col: str,
    out_col: str,
    method: str = "ordinal",
    descending: bool = False,
    seed: int | None = None,
    n_hint: int | None = None,
) -> SDF:
    """Single-column convenience wrapper over :func:`rank_columns`."""
    return rank_columns(sdf, order_col, value_col, {out_col: method}, descending, seed, n_hint=n_hint)


def rank_columns_multi(
    sdf: SDF,
    value_cols: dict[str, str],
    method: str = "average",
    descending: bool = False,
    n_hint: int | None = None,
) -> SDF:
    """Global value-statistic ranks for SEVERAL (double-castable) columns
    in ONE kernel pass: the (col_id, value) melt range-shuffles once, one
    checkpoint, one stats job with per-column prefix resets on the driver,
    one pid-window — instead of a full kernel per column. Each column then
    equi-joins its rank back (that part is inherently per-column).

    ``value_cols``: src_col -> out_col (out may replace src — the spearman
    path ranks in place). All sources must share ONE Spark type (the melt
    array is uniform; callers cast first if they accept the loss). Null
    values rank as NIL without consuming ranks (reference rank/2 — the
    left join back reports nil), matching :func:`rank_columns`.
    Used by frame._pairwise spearman and fused rank mutates: N rank
    kernels collapse to 1.
    """
    assert method in ("min", "max", "average", "dense")
    cols = list(value_cols)
    nc = len(cols)
    dts = {sdf.schema[c].dataType.simpleString() for c in cols}
    assert len(dts) == 1, f"rank_columns_multi requires one shared dtype, got {dts}"
    key = F.col("__v__").desc() if descending else F.col("__v__").asc()
    melted = sdf.select(F.posexplode(F.array(*[F.col(c) for c in cols])).alias("__cid__", "__v__"))
    vals = (
        melted.filter(F.col("__v__").isNotNull())
        .groupBy("__cid__", "__v__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    # caller-known exact count (see rank_columns): a summary-sized FRAME
    # bounds every column's value table
    nv = n_hint
    if nv is not None and nv <= SMALL_VALS_MAX:
        # summary-sized value table: one window hash-partitioned by column
        # id replaces range shuffle + checkpoint + stats job (see
        # SMALL_VALS_MAX); join-backs below broadcast the rank table
        w_ord = W.partitionBy("__cid__").orderBy(key)
        v2 = vals.withColumn(
            "__lc__", F.sum("__c__").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        ).withColumn("__dp__", F.row_number().over(w_ord) - 1)
        cum = F.col("__lc__")
        dense_pos = F.col("__dp__")
        return _rank_multi_emit(sdf, v2, cum, dense_pos, cols, value_cols, method, True)
    # r12: route EACH column on its approximate distinct count (the old
    # limit-probe saw only the frame row count, so a 50-distinct
    # heavy-ties column fused with a near-unique one paid the full range
    # kernel too). ONE cheap map-combined approx probe over the frame
    # (routing only, never results — see _rank_small_ok's margin)
    # replaces the probe job; summary-sized columns take the windowless
    # small path, big columns the range kernel — and the join-back
    # broadcast is byte-gated per column (ADVICE: row count alone must
    # not force wide-string broadcasts).
    dt0 = sdf.schema[cols[0]].dataType
    var_width = not isinstance(
        dt0,
        (T.NumericType, T.DateType, T.TimestampType, T.TimestampNTZType, T.BooleanType),
    )
    paggs = [F.approx_count_distinct(c).alias(f"__nd{i}__") for i, c in enumerate(cols)]
    if var_width:
        # per-ROW byte sums: upper bounds on distinct-value bytes — can
        # only under-broadcast (the safe direction)
        paggs += [
            F.sum(F.octet_length(F.col(c).cast("binary"))).alias(f"__b{i}__")
            for i, c in enumerate(cols)
        ]
    stat = sdf.select(*cols).agg(*paggs).collect()[0]
    nd = {i: (stat[f"__nd{i}__"] or 0) for i in range(nc)}
    ebytes = {
        i: ((stat[f"__b{i}__"] or 0) if var_width else 8 * nd[i]) + 16 * nd[i]
        for i in range(nc)
    }
    small_cids = [
        i for i in range(nc) if _rank_small_ok(nd[i], ebytes[i], approx=True)
    ]
    big_cids = [i for i in range(nc) if i not in small_cids]
    bc = {i: ebytes.get(i, 0) <= BC_BYTES_MAX for i in range(nc)}
    # pin the melted table when it has >1 consumer (each small cid's
    # join-back is its own plan branch; the big kernel's range exchange
    # additionally samples its child before shuffling it)
    if len(small_cids) + (2 if big_cids else 0) > 1:
        vals = vals.localCheckpoint(eager=False)
    sources: dict[int, SDF] = {}
    if small_cids:
        sv = vals.filter(F.col("__cid__").isin([int(i) for i in small_cids]))
        w_ord = W.partitionBy("__cid__").orderBy(key)
        v2s = sv.withColumn(
            "__lc__", F.sum("__c__").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        ).withColumn("__dp__", F.row_number().over(w_ord) - 1)
        rvs = v2s.select(
            "__cid__",
            F.col("__v__").alias("__vv__"),
            _rank_from_prefix(method, F.col("__lc__"), F.col("__c__"), F.col("__dp__")).alias("__rk__"),
        )
        for i in small_cids:
            sources[i] = rvs
    if big_cids:
        rvb = _rank_multi_big(
            vals.filter(F.col("__cid__").isin([int(i) for i in big_cids])),
            sdf.sparkSession,
            key,
            nc,
            method,
        )
        for i in big_cids:
            sources[i] = rvb
    out = sdf
    for i, c in enumerate(cols):
        rvi = sources[i].filter(F.col("__cid__") == i).select(
            "__vv__", F.col("__rk__").alias(f"__rko{i}__")
        )
        if bc.get(i, True):
            rvi = F.broadcast(rvi)
        out = out.join(rvi, F.col(c).eqNullSafe(F.col("__vv__")), "left").drop("__vv__")
    out = out.withColumns({value_cols[c]: F.col(f"__rko{i}__") for i, c in enumerate(cols)})
    return out.drop(*[f"__rko{i}__" for i in range(len(cols))])


def _rank_from_prefix(method: str, cum, c_col, dense_pos):
    """Rank expression from (inclusive row-count prefix, tie count,
    dense position) — shared by every value-statistic rank face."""
    if method == "min":
        return (cum - c_col + 1).cast("long")
    if method == "max":
        return cum.cast("long")
    if method == "average":
        return (2 * cum - c_col + 1).cast("double") / 2.0
    return (dense_pos + 1).cast("long")  # dense


def _rank_multi_big(bv: SDF, spark, key, nc: int, method: str) -> SDF:
    """The range-shuffle + checkpoint + stats-job kernel of
    rank_columns_multi, over the (pinned, pre-filtered) big-column slice
    of the melted value table. Returns (__cid__, __vv__, __rk__)."""
    v = bv.repartitionByRange(F.col("__cid__").asc(), key).sortWithinPartitions(
        F.col("__cid__").asc(), key
    )
    v = v.withColumn("__mono__", F.monotonically_increasing_id())
    v = v.withColumn("__vpid__", F.spark_partition_id())
    v = v.localCheckpoint(eager=False)  # pin nondeterministic ids
    stats = v.groupBy("__vpid__", "__cid__").agg(
        F.count(F.lit(1)).alias("__n__"),
        F.min("__mono__").alias("__mn__"),
        F.sum("__c__").alias("__t__"),
    ).collect()
    # accumulate prefixes per column over partitions in range order
    stats.sort(key=lambda r: (r["__cid__"], r["__vpid__"]))
    doffs, vmns, coffs = {}, {}, {}
    run_d: dict = {}
    run_c: dict = {}
    nparts = 0
    for r in stats:
        cid, pid = r["__cid__"], r["__vpid__"]
        slot = pid * nc + cid
        doffs[slot] = run_d.get(cid, 0)
        coffs[slot] = run_c.get(cid, 0)
        vmns[slot] = r["__mn__"]
        run_d[cid] = doffs[slot] + r["__n__"]
        run_c[cid] = coffs[slot] + r["__t__"]
        nparts = max(nparts, pid + 1)
    nslots = nparts * nc
    slot = F.col("__vpid__") * nc + F.col("__cid__")
    w = W.partitionBy("__vpid__", "__cid__").orderBy("__mono__").rowsBetween(W.unboundedPreceding, 0)
    v2 = v.withColumn("__lc__", F.sum("__c__").over(w))
    if nslots <= ARRAY_LOOKUP_MAX:
        v2 = v2.withColumns(
            {
                "__doff__": _array_lookup(slot, _dense(doffs, nslots, 0), T.LongType()),
                "__vmn__": _array_lookup(slot, _dense(vmns, nslots, 0), T.LongType()),
                "__coff__": _array_lookup(slot, _dense(coffs, nslots, 0), T.LongType()),
            }
        )
    else:
        lookup = _lookup_df(
            spark,
            [(s, doffs[s], vmns[s], coffs[s]) for s in doffs],
            [
                T.StructField("__slot__", T.LongType()),
                T.StructField("__doff__", T.LongType()),
                T.StructField("__vmn__", T.LongType()),
                T.StructField("__coff__", T.LongType()),
            ],
        )
        v2 = v2.withColumn("__slot__", slot).join(F.broadcast(lookup), "__slot__", "left").drop("__slot__")
    cum = F.col("__coff__") + F.col("__lc__")
    dense_pos = F.col("__doff__") + (F.col("__mono__") - F.col("__vmn__"))
    return v2.select(
        "__cid__",
        F.col("__v__").alias("__vv__"),
        _rank_from_prefix(method, cum, F.col("__c__"), dense_pos).alias("__rk__"),
    )


def _rank_multi_emit(sdf, v2, cum, dense_pos, cols, value_cols, method, broadcast_rv, bc_cids=None):
    """Shared tail of rank_columns_multi: derive the rank from the prefix
    columns and equi-join each column's slice back onto the frame.
    ``bc_cids``: column ids whose rank slice is known summary-sized
    (exact distinct count from the stats job) — broadcast those even
    when the kernel ran the big path."""
    if method == "min":
        rk = (cum - F.col("__c__") + 1).cast("long")
    elif method == "max":
        rk = cum.cast("long")
    elif method == "average":
        rk = (2 * cum - F.col("__c__") + 1).cast("double") / 2.0
    else:  # dense
        rk = (dense_pos + 1).cast("long")
    rv = v2.select("__cid__", F.col("__v__").alias("__vv__"), rk.alias("__rk__"))
    if broadcast_rv and len(cols) > 1:
        # small path has no upstream checkpoint: pin the (bounded) rank
        # table once so the per-column slices don't each recompute the
        # melt + agg + window chain
        rv = rv.localCheckpoint(eager=False)
    out = sdf
    for i, c in enumerate(cols):
        rvi = rv.filter(F.col("__cid__") == i).select("__vv__", F.col("__rk__").alias(f"__rko{i}__"))
        if broadcast_rv or (bc_cids is not None and i in bc_cids):
            rvi = F.broadcast(rvi)
        out = out.join(rvi, F.col(c).eqNullSafe(F.col("__vv__")), "left").drop("__vv__")
    out = out.withColumns({value_cols[c]: F.col(f"__rko{i}__") for i, c in enumerate(cols)})
    return out.drop(*[f"__rko{i}__" for i in range(len(cols))])


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
#   2. bucket end states (ceil(n/B) rows, bounded) combine sequentially on
#      the DRIVER -> per-bucket incoming carries, re-emitted as a literal
#      broadcast lookup;
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
    # invc = (1/c)^(chunk-1) must stay finite: exponent bound 300 < 308
    chunk = 128 if c >= 0.02 else max(1, int(300.0 / -_math.log10(c)))
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


def ewm_global(
    sdf: SDF,
    idx_col: str,
    specs: dict,
    n_hint: int | None = None,
    group_cols: list[str] | None = None,
) -> SDF:
    """Distributed ungrouped EWM over global index order.

    ``group_cols``: per-GROUP variant (the giant-group path of grouped
    ewm, rolling.ewm_columns): ``idx_col`` must then be a contiguous
    0-based index WITHIN each group (each group occupying its own 0..n_g
    range), local scans key on (group, bucket), and the driver carry
    combine resets its running state at each group boundary. The caller
    guarantees the subset routed here holds only groups LARGER than the
    giant-group gate, so the (group, bucket) carry rows stay bounded by
    n/bucket_width + n/gate. The ignore_nils=False + adjust=False corner
    routes through ewm_gapped's grouped face (same keying and reset
    discipline).

    specs: out_name -> (kind, src_col, alpha, adjust[, ignore_nils]),
    kind in {mean, variance, standard_deviation}.  ``ignore_nils=True``
    (the reference default, lib/explorer/series.ex:5325) skips nulls
    entirely: the recursion runs over the compacted valid subsequence
    (valid-rank positions), which keeps every adjust/variance combination
    an exact linear accumulation.  ``ignore_nils=False`` matches pandas
    ``ignore_na=False`` (weights decay by absolute position); its
    adjust=False variant renormalizes after each valid value, which is
    not a plain linear accumulation when the column has internal nulls —
    ALL kinds in that corner (mean, variance, standard_deviation) route
    to :func:`ewm_gapped`, the four-channel per-row affine-in-state
    composition, which is pandas-exact and fully distributed — no
    single-task fallback remains anywhere.

    adjust=False reweights the accumulated adjust=True channels in
    closed form: the first valid value keeps weight c^d instead of
    a*c^d, so num' = a*num + (1-a)*cw*x0, ssq' = a*ssq + (1-a)*cw*x0^2,
    den' = a*den + (1-a)*cw, dn2' = a^2*dn2 + (1-a^2)*cw^2 with
    cw = c^(distance from the first valid value).
    """
    import pandas as pd

    gcols = list(group_cols or [])
    specs = {o: (t + (True,) if len(t) == 4 else t) for o, t in specs.items()}

    # ignore_nils=False + adjust=False renormalizes per observation —
    # not the absolute-position-decay channels below. ALL such specs
    # (mean/var/std, nulls or not) route through the affine-channel
    # gapped kernel, which is pandas-exact and fully distributed.
    gapped = {
        o: (k, src, a) for o, (k, src, a, adj, ign) in specs.items() if not ign and not adj
    }
    specs = {o: t for o, t in specs.items() if o not in gapped}
    if gapped:
        sdf = ewm_gapped(sdf, idx_col, gapped, n_hint=n_hint, group_cols=gcols or None)
        if not specs:
            return sdf

    # accumulator channels for EXACTLY the requested (src, alpha,
    # ignore_nils) tuples — a src_keys x alphas cross product would build
    # (and scan, shuffle, checkpoint, and agg) channels no spec asked
    # for; ssq/dn2 only where that tuple has a variance/std request
    from collections import defaultdict

    sq_need: dict = defaultdict(bool)
    for (k, src, a, _adj, ign) in specs.values():
        sq_need[(src, a, ign)] |= k != "mean"

    bw = bucket_size_for(n_hint)
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(bw)))

    # num/den at ratio c=(1-a); ssq shares ratio c, the squared-weight
    # sum dn2 decays at c^2
    all_chans = []
    for (src, a, ign) in sorted(sq_need):
        all_chans += [("num", src, a, ign, 1), ("den", src, a, ign, 1)]
        if sq_need[(src, a, ign)]:
            all_chans += [("ssq", src, a, ign, 1), ("dn2", src, a, ign, 2)]

    def cname(kind, src, a, ign):
        return f"__{kind}_{src}_{str(a).replace('.', '_')}_{int(ign)}__"

    def kname(src):
        return f"__k_{src}__"

    # per-src valid-rank columns, needed by every ignore_nils=True channel
    k_srcs = sorted({src for (src, _a, ign) in sq_need if ign})

    fields = list(sdf.schema.fields) + [T.StructField(BUCKET, T.LongType())]
    local_schema = T.StructType(
        fields
        + [T.StructField(kname(src), T.LongType()) for src in k_srcs]
        + [T.StructField(cname(k, s_, a, i), T.DoubleType()) for (k, s_, a, i, _p) in all_chans]
    )

    def local_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        xs = {}
        for src in sorted({src for (_k, src, _a, _i, _p) in all_chans}):
            x = pdf[src].to_numpy(dtype="float64", na_value=np.nan)
            xs[src] = (x, ~np.isnan(x))
        for src in k_srcs:
            pdf[kname(src)] = np.cumsum(xs[src][1]).astype("int64")
        for (kind, src, a, ign, power) in all_chans:
            c = (1.0 - a) ** power
            x, valid = xs[src]
            if ign:
                xv = x[valid]
                if kind == "num":
                    w = xv
                elif kind == "ssq":
                    w = xv * xv
                else:
                    w = np.ones(len(xv))
                scan = np.concatenate([[0.0], _geo_scan(w, c)])
                pdf[cname(kind, src, a, ign)] = scan[np.cumsum(valid)]
            else:
                if kind == "num":
                    w = np.where(valid, x, 0.0)
                elif kind == "ssq":
                    w = np.where(valid, x * x, 0.0)
                else:
                    w = valid.astype("float64")
                pdf[cname(kind, src, a, ign)] = _geo_scan(w, c)
        return pdf

    keycols = gcols + [BUCKET]
    local = s.groupBy(*keycols).applyInPandas(local_pass, local_schema).localCheckpoint(eager=False)

    # bucket end states -> incoming carries, combined on the driver
    # (ceil(n/B) rows, bounded — same bound as the zipWithIndex stats
    # job; grouped: + one row per group boundary, bounded by n/gate)
    end_aggs = [F.max(F.col(idx_col)).alias("__last__")] + [
        F.max_by(F.col(cname(k, s_, a, i)), F.col(idx_col)).alias(cname(k, s_, a, i))
        for (k, s_, a, i, _p) in all_chans
    ] + [F.max(F.col(kname(src))).alias(kname(src)) for src in k_srcs]
    ends = local.groupBy(*keycols).agg(*end_aggs)
    ends = ends.withColumn("__len__", F.col("__last__") % F.lit(bw) + 1).drop("__last__")
    end_rows = ends.collect()

    def _gkey(r):
        # null group keys are real groups; sort them deterministically
        return tuple((r[g] is None, r[g]) for g in gcols)

    end_rows.sort(key=lambda r: (_gkey(r), r[BUCKET]))
    carry_by_chan: dict = {cname(k, s_, a, i): {} for (k, s_, a, i, _p) in all_chans}
    voff_by_src: dict = {src: {} for src in k_srcs}  # valid-rank offsets
    running = {cname(k, s_, a, i): 0.0 for (k, s_, a, i, _p) in all_chans}
    vrun = {src: 0 for src in k_srcs}
    prev_g: object = None
    for r in end_rows:
        cur_g = tuple(r[g] for g in gcols)
        if gcols and cur_g != prev_g:
            # carry state never crosses a group boundary
            running = {nm: 0.0 for nm in running}
            vrun = {src: 0 for src in k_srcs}
            prev_g = cur_g
        rkey = cur_g + (r[BUCKET],) if gcols else r[BUCKET]
        for (kind, src, a, ign, power) in all_chans:
            c = (1.0 - a) ** power
            nm = cname(kind, src, a, ign)
            steps = int(r[kname(src)]) if ign else int(r["__len__"])
            carry_by_chan[nm][rkey] = running[nm]
            running[nm] = r[nm] + (c ** steps) * running[nm]
        for src in k_srcs:
            voff_by_src[src][rkey] = vrun[src]
            vrun[src] += int(r[kname(src)])
    nb = (max(end_rows, key=lambda r: r[BUCKET])[BUCKET] + 1) if end_rows else 0
    extra = {("__carry_" + nm): (vals, T.DoubleType(), 0.0) for nm, vals in carry_by_chan.items()}
    extra.update(
        {f"__voff_{src}__": (vals, T.LongType(), 0) for src, vals in voff_by_src.items()}
    )
    if not gcols and nb <= ARRAY_LOOKUP_MAX:
        j = local.withColumns(
            {
                nm: _array_lookup(F.col(BUCKET), _dense(vals, nb, dflt), dt)
                for nm, (vals, dt, dflt) in extra.items()
            }
        )
    else:
        names = sorted(extra)
        schema_by_name = {f.name: f.dataType for f in sdf.schema.fields}
        gtmp = [f"__cg{i}__" for i in range(len(gcols))]
        carry_fields = (
            [T.StructField(t, schema_by_name[g]) for t, g in zip(gtmp, gcols)]
            + [T.StructField("__cb__", T.LongType())]
            + [T.StructField(nm, extra[nm][1]) for nm in names]
        )
        seen_keys = sorted(
            {(_gkey(r), r[BUCKET]) for r in end_rows},
        )
        carry_rows = []
        for gk, b in seen_keys:
            gvals = tuple(v for (_isnull, v) in gk)
            k = gvals + (b,) if gcols else b
            carry_rows.append(
                tuple(gvals) + (b,) + tuple(extra[nm][0].get(k, extra[nm][2]) for nm in names)
            )
        lut = F.broadcast(_lookup_df(sdf.sparkSession, carry_rows, carry_fields))
        cond = F.col(BUCKET) == F.col("__cb__")
        for t, g in zip(gtmp, gcols):
            # eqNullSafe: a null group key is a real group
            cond = cond & F.col(g).eqNullSafe(F.col(t))
        j = local.join(lut, cond, "left").drop("__cb__", *gtmp)
    abs_pos = (F.col(idx_col) % F.lit(bw) + 1).cast("double")  # i+1

    def total(kind, src, a, ign, power):
        c = float((1.0 - a) ** power)
        carry = F.coalesce(F.col("__carry_" + cname(kind, src, a, ign)), F.lit(0.0))
        pos = F.col(kname(src)).cast("double") if ign else abs_pos
        return F.col(cname(kind, src, a, ign)) + F.pow(F.lit(c), pos) * carry

    # first-valid scalars, needed once per adjust=False source — per
    # GROUP when grouped (each group restarts its recursion)
    fv_cols = []
    for out_name, (kind, src, a, adjust, ign) in specs.items():
        if adjust:
            continue
        x0, j0 = f"__x0_{out_name}__", f"__j0_{out_name}__"
        valid_rows = sdf.where(
            F.col(src).isNotNull() & ~F.isnan(F.col(src).cast("double"))
        )
        aggs = [
            F.min_by(F.col(src), F.col(idx_col)).alias(x0),
            F.min(F.col(idx_col)).alias(j0),
        ]
        if gcols:
            gtmp2 = [f"__fg{i}_{out_name}__" for i in range(len(gcols))]
            first = valid_rows.groupBy(
                *[F.col(g).alias(t) for t, g in zip(gtmp2, gcols)]
            ).agg(*aggs)
            cond = F.lit(True)
            for t, g in zip(gtmp2, gcols):
                cond = cond & F.col(g).eqNullSafe(F.col(t))
            j = j.join(F.broadcast(first), cond, "left").drop(*gtmp2)
        else:
            j = j.crossJoin(F.broadcast(valid_rows.agg(*aggs)))
        fv_cols += [x0, j0]

    out_cols = {}
    for out_name, (kind, src, a, adjust, ign) in specs.items():
        num, den = total("num", src, a, ign, 1), total("den", src, a, ign, 1)
        cw = None
        if not adjust:
            # adjust=False gives the FIRST valid value weight 1 instead of
            # alpha: num' = a*num + (1-a)*x0*c^d, same for den/ssq/dn2
            x0, j0 = F.col(f"__x0_{out_name}__"), F.col(f"__j0_{out_name}__")
            if ign:
                # distance counted in VALID observations: global valid rank-1
                gvr = F.col(f"__voff_{src}__") + F.col(kname(src))
                dist = (gvr - 1).cast("double")
                cw = F.when(gvr >= 1, F.pow(F.lit(1.0 - a), dist)).otherwise(F.lit(0.0))
            else:
                dist = (F.col(idx_col) - j0).cast("double")
                cw = F.when(
                    j0.isNotNull() & (F.col(idx_col) >= j0), F.pow(F.lit(1.0 - a), dist)
                ).otherwise(F.lit(0.0))
            num = a * num + (1.0 - a) * cw * x0.cast("double")
            den = a * den + (1.0 - a) * cw
        mean = num / den
        if kind == "mean":
            expr = mean
        else:
            ssq, dn2 = total("ssq", src, a, ign, 1), total("dn2", src, a, ign, 2)
            if not adjust:
                x0d = F.col(f"__x0_{out_name}__").cast("double")
                ssq = a * ssq + (1.0 - a) * cw * x0d * x0d
                dn2 = (a * a) * dn2 + (1.0 - a * a) * cw * cw
            var_b = ssq / den - mean * mean
            corr = (den * den) / (den * den - dn2)
            # one effective observation -> 0.0, not nil (reference
            # ewm_variance doctest series.ex:5449 starts at 0.0; pandas'
            # ddof NaN is the divergent one)
            expr = F.when(den * den > dn2, F.greatest(var_b * corr, F.lit(0.0))).otherwise(F.lit(0.0))
            if kind == "standard_deviation":
                expr = F.sqrt(expr)
        out_cols[out_name] = F.when(den > 0, expr).otherwise(F.lit(None))

    j = j.withColumns(out_cols)
    drop = [cname(k, s_, a, i) for (k, s_, a, i, _p) in all_chans]
    drop += ["__carry_" + cname(k, s_, a, i) for (k, s_, a, i, _p) in all_chans]
    drop += [kname(src) for src in k_srcs] + [f"__voff_{src}__" for src in k_srcs]
    drop += [BUCKET] + fv_cols
    return j.drop(*drop)


# ---------------------------------------------------------------------------
# gapped EWM: adjust=False, ignore_nils=False over null-bearing data
# ---------------------------------------------------------------------------
#
# pandas' recursion in this corner is NOT the absolute-position-decay
# closed form (the old_wt reset after gaps breaks ratio cancellation).
# But unrolling it per VALID observation shows the state is four scalar
# channels, each AFFINE per step with data-independent multipliers:
# after a gap of g positions, with s = c^g/(c^g + a), w = a/(c^g + a),
#
#   SW'   = s*SW    + w          (sum of weights)
#   SWX'  = s*SWX   + w*x        (weighted sum)
#   SWX2' = s*SWX2  + w*x^2      (weighted sum of squares)
#   SW2'  = s^2*SW2 + w^2        (sum of squared weights)
#
# and mean = SWX/SW, var(bias=False) = max(SWX2/SW - mean^2, 0) *
# SW^2/(SW^2 - SW2) — verified numerically equal to pandas
# ewm(adjust=False, ignore_na=False) mean AND var on gapped data.
# Affine composes across index buckets: the local pass extracts per-row
# (A, B) coefficients (A = running product of s; B = zero-seeded run)
# plus the fresh-start channel values U for buckets before any prior
# valid observation; bucket end states compose sequentially on the
# driver, and the per-row channels are A*carry + B (A^2 for SW2).
# c^g underflows to exactly 0.0 for huge gaps in both engines — s=0,
# w=1 is then an exact state reset, same as pandas.

_EWM_CH = ("sw", "swx", "swx2", "sw2")


def ewm_gapped(
    sdf: SDF,
    idx_col: str,
    specs: dict,
    n_hint: int | None = None,
    group_cols: list[str] | None = None,
) -> SDF:
    """Distributed pandas-exact EWM for adjust=False, ignore_na=False
    (with or without nulls). specs: out_name -> (kind, src_col, alpha),
    kind in {mean, variance, standard_deviation}.

    ``group_cols``: per-GROUP variant (the giant-group path, mirroring
    ewm_global's grouped face): ``idx_col`` must be a contiguous 0-based
    index WITHIN each group; the prev-valid pre-pass, the local scans,
    and the driver carry combine all key on (group, bucket) and reset at
    group boundaries. Callers route only gate-exceeding groups here, so
    the driver-side (group, bucket) state stays bounded."""
    import pandas as pd

    gcols = list(group_cols or [])
    s = sdf.withColumn(BUCKET, F.floor(F.col(idx_col) / F.lit(bucket_size_for(n_hint))))
    fams = sorted({(src, alpha) for (_k, src, alpha) in specs.values()})
    srcs = sorted({src for (src, _a) in fams})
    keycols = gcols + [BUCKET]

    def _gkey(r):
        return tuple((r[g] is None, r[g]) for g in gcols)

    def _ckey(r):
        # composite carry key: group values + bucket (bucket alone when
        # ungrouped, preserving the dense-array fast path)
        return (tuple(r[g] for g in gcols) + (r[BUCKET],)) if gcols else r[BUCKET]

    # pre-pass: per-(group,)bucket last valid idx per src -> prev-valid
    # carry idx, reset at group boundaries
    pre = s.groupBy(*keycols).agg(
        *[
            F.max(
                F.when(F.col(src).isNotNull() & ~F.isnan(F.col(src).cast("double")), F.col(idx_col))
            ).alias(f"__lv_{src}__")
            for src in srcs
        ]
    ).collect()
    pre.sort(key=lambda r: (_gkey(r), r[BUCKET]))
    nb = (max(r[BUCKET] for r in pre) + 1) if pre else 0
    prev_valid: dict = {src: {} for src in srcs}  # carry-key -> idx of last valid BEFORE it (or -1)
    run_lv: dict = {src: -1 for src in srcs}
    prev_g: object = None
    for r in pre:
        cur_g = tuple(r[g] for g in gcols)
        if gcols and cur_g != prev_g:
            run_lv = {src: -1 for src in srcs}
            prev_g = cur_g
        for src in srcs:
            prev_valid[src][_ckey(r)] = run_lv[src]
            if r[f"__lv_{src}__"] is not None:
                run_lv[src] = int(r[f"__lv_{src}__"])

    def fname(src, alpha):
        return f"{src}_{str(alpha).replace('.', '_')}"


    out_fields = list(sdf.schema.fields) + [T.StructField(BUCKET, T.LongType())]
    for (src, alpha) in fams:
        fn = fname(src, alpha)
        out_fields.append(T.StructField(f"__A_{fn}__", T.DoubleType()))
        for ch in _EWM_CH:
            out_fields += [
                T.StructField(f"__B{ch}_{fn}__", T.DoubleType()),
                T.StructField(f"__U{ch}_{fn}__", T.DoubleType()),
            ]
    schema = T.StructType(out_fields)
    if gcols:
        pv = {src: dict(prev_valid[src]) for src in srcs}
    else:
        pv = {src: [prev_valid[src].get(b, -1) for b in range(nb)] for src in srcs}

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        b = int(pdf[BUCKET].iloc[0])
        if gcols:
            # composite carry key; normalize pandas NaN null keys to None
            # so they hash like the driver-side Row values
            gvals = tuple(
                None if pd.isna(pdf[g].iloc[0]) else pdf[g].iloc[0] for g in gcols
            )
            ck = gvals + (b,)
        idxs_all = pdf[idx_col].to_numpy(dtype="int64")
        n = len(pdf)
        for (src, alpha) in fams:
            fn = fname(src, alpha)
            a = float(alpha)
            c = 1.0 - a
            x = pdf[src].to_numpy(dtype="float64", na_value=np.nan)
            valid = ~np.isnan(x)
            vpos = np.nonzero(valid)[0]
            A_rows = np.ones(n)
            B_rows = {ch: np.zeros(n) for ch in _EWM_CH}
            U_rows = {ch: np.full(n, np.nan) for ch in _EWM_CH}
            if gcols:
                lv = pv[src].get(ck, -1)
            else:
                lv = pv[src][b] if b < len(pv[src]) else -1
            # carried run: state affine in the incoming channels
            if lv >= 0:
                A = 1.0
                Bsw = Bswx = Bswx2 = Bsw2 = 0.0
                prev = lv
                k = 0
                for j in vpos:
                    i = int(idxs_all[j])
                    xv = float(x[j])
                    cg = c ** (i - prev)
                    s_ = cg / (cg + a)
                    w = a / (cg + a)
                    A *= s_
                    Bsw = s_ * Bsw + w
                    Bswx = s_ * Bswx + w * xv
                    Bswx2 = s_ * Bswx2 + w * xv * xv
                    Bsw2 = s_ * s_ * Bsw2 + w * w
                    # fill from this valid row to the next one (state holds)
                    end = vpos[k + 1] if k + 1 < len(vpos) else n
                    A_rows[j:end] = A
                    B_rows["sw"][j:end] = Bsw
                    B_rows["swx"][j:end] = Bswx
                    B_rows["swx2"][j:end] = Bswx2
                    B_rows["sw2"][j:end] = Bsw2
                    prev = i
                    k += 1
            else:
                # fresh start: channels seeded by the first valid row
                SW = SWX = SWX2 = SW2 = float("nan")
                prev = None
                k = 0
                for j in vpos:
                    i = int(idxs_all[j])
                    xv = float(x[j])
                    if prev is None:
                        SW, SWX, SWX2, SW2 = 1.0, xv, xv * xv, 1.0
                    else:
                        cg = c ** (i - prev)
                        s_ = cg / (cg + a)
                        w = a / (cg + a)
                        SW = s_ * SW + w
                        SWX = s_ * SWX + w * xv
                        SWX2 = s_ * SWX2 + w * xv * xv
                        SW2 = s_ * s_ * SW2 + w * w
                    end = vpos[k + 1] if k + 1 < len(vpos) else n
                    U_rows["sw"][j:end] = SW
                    U_rows["swx"][j:end] = SWX
                    U_rows["swx2"][j:end] = SWX2
                    U_rows["sw2"][j:end] = SW2
                    prev = i
                    k += 1
            pdf[f"__A_{fn}__"] = A_rows
            for ch in _EWM_CH:
                pdf[f"__B{ch}_{fn}__"] = B_rows[ch]
                pdf[f"__U{ch}_{fn}__"] = U_rows[ch]
        return pdf

    local_df = s.groupBy(*keycols).applyInPandas(local, schema).localCheckpoint(eager=False)

    end_cols = []
    for (src, alpha) in fams:
        fn = fname(src, alpha)
        for ch in ["A"] + [f"B{c_}" for c_ in _EWM_CH] + [f"U{c_}" for c_ in _EWM_CH]:
            end_cols.append(
                F.max_by(F.col(f"__{ch}_{fn}__"), F.col(idx_col)).alias(f"__{ch}_{fn}__")
            )
    ends = local_df.groupBy(*keycols).agg(*end_cols).collect()
    ends.sort(key=lambda r: (_gkey(r), r[BUCKET]))
    carries: dict = {fam: {ch: {} for ch in _EWM_CH} for fam in fams}
    state: dict = {fam: None for fam in fams}
    prev_g2: object = None
    for r in ends:
        cur_g = tuple(r[g] for g in gcols)
        if gcols and cur_g != prev_g2:
            # carried EWM state never crosses a group boundary
            state = {fam: None for fam in fams}
            prev_g2 = cur_g
        for fam in fams:
            fn = fname(*fam)
            for ch in _EWM_CH:
                carries[fam][ch][_ckey(r)] = None if state[fam] is None else state[fam][ch]
            if state[fam] is None:
                u = r[f"__Usw_{fn}__"]
                if u is not None and u == u:  # bucket contains the first valid
                    state[fam] = {ch: float(r[f"__U{ch}_{fn}__"]) for ch in _EWM_CH}
            else:
                A = float(r[f"__A_{fn}__"])
                new = {}
                for ch in _EWM_CH:
                    mult = A * A if ch == "sw2" else A
                    new[ch] = mult * state[fam][ch] + float(r[f"__B{ch}_{fn}__"])
                state[fam] = new
    j = local_df
    if gcols:
        # composite (group, bucket) carry keys: one broadcast-joined
        # literal table with null-safe group matching (a null group key
        # is a real group)
        from functools import reduce as _reduce

        names = [(fam, ch) for fam in fams for ch in _EWM_CH]
        schema_by_name = {f.name: f.dataType for f in sdf.schema.fields}
        gtmp = [f"__gg{i}__" for i in range(len(gcols))]
        carry_fields = (
            [T.StructField(t, schema_by_name[g]) for t, g in zip(gtmp, gcols)]
            + [T.StructField("__gb__", T.LongType())]
            + [T.StructField(f"__C{ch}_{fname(*fam)}__", T.DoubleType()) for fam, ch in names]
        )
        all_keys = sorted(
            {k for fam in fams for d in carries[fam].values() for k in d},
            key=lambda k: tuple((v is None, v) for v in k[:-1]) + (k[-1],),
        )
        carry_rows = [
            tuple(list(k[:-1]) + [k[-1]] + [carries[fam][ch].get(k) for fam, ch in names])
            for k in all_keys
        ]
        cond = F.col(BUCKET) == F.col("__gb__")
        for t, g in zip(gtmp, gcols):
            cond = cond & F.col(g).eqNullSafe(F.col(t))
        j = j.join(
            F.broadcast(_lookup_df(sdf.sparkSession, carry_rows, carry_fields)),
            cond,
            "left",
        ).drop("__gb__", *gtmp)

        def carry_col(fam, ch):
            return F.col(f"__C{ch}_{fname(*fam)}__")
    elif nb <= ARRAY_LOOKUP_MAX:
        def carry_col(fam, ch):
            return _array_lookup(
                F.col(BUCKET), _dense(carries[fam][ch], nb), T.DoubleType()
            )
    else:
        # too many buckets to embed as plan-constant arrays (mirrors the
        # sibling kernels): one broadcast-joined literal carry table; a
        # bucket absent from the table (or a null cell) reads as null,
        # which falls through to the U channel exactly like the dense path
        names = [(fam, ch) for fam in fams for ch in _EWM_CH]
        carry_fields = [T.StructField(BUCKET, T.LongType())] + [
            T.StructField(f"__C{ch}_{fname(*fam)}__", T.DoubleType()) for fam, ch in names
        ]
        bkts = sorted({b for fam in fams for d in carries[fam].values() for b in d})
        carry_rows = [
            tuple([b] + [carries[fam][ch].get(b) for fam, ch in names]) for b in bkts
        ]
        j = j.join(
            F.broadcast(_lookup_df(sdf.sparkSession, carry_rows, carry_fields)),
            BUCKET,
            "left",
        )

        def carry_col(fam, ch):
            return F.col(f"__C{ch}_{fname(*fam)}__")

    chan_exprs: dict = {}
    for fam in fams:
        fn = fname(*fam)
        A = F.col(f"__A_{fn}__")
        ce = {}
        for ch in _EWM_CH:
            carry = carry_col(fam, ch)
            mult = A * A if ch == "sw2" else A
            ce[ch] = F.when(
                carry.isNotNull(), mult * carry + F.col(f"__B{ch}_{fn}__")
            ).otherwise(F.col(f"__U{ch}_{fn}__"))
        chan_exprs[fam] = ce
    out_cols = {}
    for out, (kind, src, alpha) in specs.items():
        ce = chan_exprs[(src, alpha)]
        mean = ce["swx"] / ce["sw"]
        if kind == "mean":
            out_cols[out] = mean
        else:
            var_b = F.greatest(ce["swx2"] / ce["sw"] - mean * mean, F.lit(0.0))
            denom = ce["sw"] * ce["sw"] - ce["sw2"]
            # single-observation windows are 0.0 (reference), not nil;
            # zero observations stay nil
            var = F.when(denom > 0, var_b * ce["sw"] * ce["sw"] / denom).otherwise(
                F.when(ce["sw"] > 0, F.lit(0.0))
            )
            out_cols[out] = F.sqrt(var) if kind == "standard_deviation" else var
    j = j.withColumns(out_cols)
    drop = [BUCKET]
    for (src, alpha) in fams:
        fn = fname(src, alpha)
        drop.append(f"__A_{fn}__")
        for ch in _EWM_CH:
            drop += [f"__B{ch}_{fn}__", f"__U{ch}_{fn}__", f"__C{ch}_{fn}__"]
    return j.drop(*drop)


# ---------------------------------------------------------------------------
# whole-frame NEAREST quantile / nth-element (distributed)
# ---------------------------------------------------------------------------


def _cum_value_counts(sdf: SDF, value_col: str):
    """Distinct-value inclusive row-count prefix over a whole column,
    WITHOUT a whole-column collect:

    1. one map-combined distinct-value count aggregation (memory bounded
       by distinct values per task, never rows),
    2. an inclusive row-count prefix over the distinct table — a bounded
       single-partition window when the table is summary-sized, else the
       range-partition + driver per-partition-offset pattern of
       ``rank_columns``.

    Returns ``(v2, n)``: a frame with ``__v__`` (distinct non-null
    value), ``__c__`` (its row count) and ``__cum__`` (rows with value
    <= it), plus the total non-null row count (``(None, 0)`` when
    empty). NaN groups to one distinct value and sorts greatest (Spark
    ordering), exactly like a sorted-array rendering."""
    c = F.col(value_col)
    vals = (
        sdf.select(c.alias("__v__"))
        .filter(c.isNotNull())
        .groupBy("__v__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    key = F.col("__v__").asc()
    # distinct table reused by the stats probe AND the prefix pass:
    # pin it so the upstream plan runs once
    vals = vals.localCheckpoint(eager=False)
    stat = vals.agg(
        F.count(F.lit(1)).alias("__nv__"), F.sum("__c__").alias("__n__")
    ).collect()[0]
    nv, n = stat["__nv__"], stat["__n__"]
    if not n:
        return None, 0
    if nv <= SMALL_VALS_MAX:
        # summary-sized distinct table: one bounded single-partition
        # window (same deliberate choice as rank_columns — the partition
        # key is a non-foldable constant zero so WindowExec stays keyed)
        v = vals.withColumn("__sum0__", F.xxhash64(F.col("__c__")).bitwiseAND(F.lit(0)))
        w = W.partitionBy("__sum0__").orderBy(key).rowsBetween(W.unboundedPreceding, 0)
        v2 = v.withColumn("__cum__", F.sum("__c__").over(w))
    else:
        v = vals.repartitionByRange(key).sortWithinPartitions(key)
        v = v.withColumn("__vpid__", F.spark_partition_id())
        v = v.localCheckpoint(eager=False)  # nondeterministic pid: pin
        stats = v.groupBy("__vpid__").agg(F.sum("__c__").alias("__t__")).collect()
        stats.sort(key=lambda r: r["__vpid__"])
        coffs, coff = {}, 0
        for r in stats:
            coffs[r["__vpid__"]] = coff
            coff += r["__t__"]
        nparts = (max(coffs) + 1) if coffs else 0
        w = W.partitionBy("__vpid__").orderBy(key).rowsBetween(W.unboundedPreceding, 0)
        loc = F.sum("__c__").over(w)
        if nparts <= ARRAY_LOOKUP_MAX:
            off = _array_lookup(F.col("__vpid__"), _dense(coffs, nparts, 0), T.LongType())
        else:
            lookup = _lookup_df(
                sdf.sparkSession,
                [(p, coffs[p]) for p in coffs],
                [
                    T.StructField("__vpid__", T.IntegerType()),
                    T.StructField("__coff__", T.LongType()),
                ],
            )
            v = v.join(F.broadcast(lookup), "__vpid__", "left")
            off = F.col("__coff__")
        v2 = v.withColumn("__cum__", (off + loc).cast("long"))
    return v2, n


def nearest_quantiles(sdf: SDF, value_col: str, qs: list) -> list:
    """Whole-frame NEAREST quantiles — the ELEMENT at sorted position
    ``floor(q*(n-1)+0.5)`` (reference quantile/2 default; native
    parse_quantile_interpol_options Nearest, series.rs:1355).

    Orderable primitive columns (ints, floats, date, timestamps) go
    through :func:`quantile_select` — multi-rank probe-count selection:
    NO shuffle at all, just a handful of whole-column conditional-count
    scans (value grids generated in IEEE-bit space for floats, so the
    bracket provably shrinks 16x per round) and one bounded bracket
    collect. Everything else (decimal, string, ...) falls back to the
    distinct-value rank prefix (``_cum_value_counts`` — one groupBy
    shuffle bounded by distinct values) + one min-filter aggregation.
    Returns python scalars, None per q for an empty/all-null column."""
    import math as _math

    dt_ = sdf.schema[value_col].dataType
    if isinstance(
        dt_,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DateType,
            T.TimestampType,
            T.TimestampNTZType,
        ),
    ):
        return quantile_select(sdf, value_col, qs)
    v2, n = _cum_value_counts(sdf, value_col)
    if not n:
        return [None for _ in qs]
    targets = [min(max(int(_math.floor(q * (n - 1) + 0.5)) + 1, 1), n) for q in qs]
    row = v2.agg(
        *[
            F.min(F.when(F.col("__cum__") >= F.lit(t), F.col("__v__"))).alias(f"__q{i}__")
            for i, t in enumerate(targets)
        ]
    ).collect()[0]
    return [row[f"__q{i}__"] for i in range(len(qs))]


def quantile_select(sdf: SDF, value_col: str, qs: list) -> list:
    """NEAREST quantiles by multi-rank probe-count selection — the
    zero-shuffle quantile: every round is ONE whole-column aggregation
    of batched conditional counts (``sum(when(lo < c <= t))`` for a
    value grid inside each unresolved rank's bracket), the driver sees
    only counts, and the final brackets (each ≤ ``SELECT_BRACKET_MAX``
    rows by construction) are collected and resolved exactly in python.

    Grid thresholds for float columns are generated in monotone
    IEEE-754 bit space (numpy int64 view), so the bracket's BIT span —
    not its numeric span — shrinks 16x per round: ≤ 16 rounds
    worst-case for any value distribution; integer/date/timestamp
    columns grid in their own integer space with the same bound. This
    beats the distinct-value rank kernel whenever the column is
    high-cardinality: no groupBy of the distinct values (at 100 TB that
    groupBy is itself a full shuffle of up to every row), no range
    repartition, no checkpoint — only scans of the (pinned or pushed)
    source.

    NaN sorts greatest (Spark/polars ordering): counts use plain
    comparisons (false for NaN), NaN rows are counted once in the first
    aggregation, and a target rank above the non-NaN count resolves to
    NaN directly."""
    import math as _math

    import numpy as np

    dt_ = sdf.schema[value_col].dataType
    is_float = isinstance(dt_, (T.FloatType, T.DoubleType))
    is_ts = isinstance(dt_, (T.TimestampType, T.TimestampNTZType))
    c0 = F.col(value_col)
    # probe comparisons run on a monotone LONG/DOUBLE view of the column
    if is_float:
        view = c0.cast("double")
    elif is_ts:
        view = F.unix_micros(c0.cast(T.TimestampType()))
    elif isinstance(dt_, T.DateType):
        view = F.datediff(c0, F.lit("1970-01-01").cast("date"))
    else:
        view = c0.cast("long")
    # the probe rounds re-scan this projection: pin the ONE skinny
    # column so an arbitrary upstream plan (joins, UDFs) executes once —
    # for a bare parquet scan the checkpoint is the same single-column
    # read it replaces
    sdf = sdf.select(view.alias("__qv__")).localCheckpoint(eager=False)
    c = F.col("__qv__")

    def to_bits(v: float) -> int:
        # monotone IEEE-754 map: doubles ordered as doubles == keys
        # ordered as python ints. Positives keep their bit pattern;
        # negatives reflect (bigger magnitude -> smaller key), with
        # -0.0 landing at key -1, just below +0.0's key 0.
        b = int(np.float64(v).view(np.int64))
        return b if b >= 0 else -(1 << 63) - b - 1

    def from_bits(k: int) -> float:
        b = k if k >= 0 else -(1 << 63) - k - 1
        return float(np.int64(b).view(np.float64))

    stats = sdf.agg(
        F.count(c).alias("__n__"),
        (
            F.min(F.when(~F.isnan(c), c)) if is_float else F.min(c)
        ).alias("__mn__"),
        (
            F.max(F.when(~F.isnan(c), c)) if is_float else F.max(c)
        ).alias("__mx__"),
        (F.sum(F.when(F.isnan(c), 1).otherwise(0)) if is_float else F.lit(0)).alias("__nan__"),
    ).collect()[0]
    n, mn, mx, n_nan = stats["__n__"], stats["__mn__"], stats["__mx__"], stats["__nan__"] or 0
    if not n:
        return [None for _ in qs]
    n_valid = n - n_nan
    targets = [min(max(int(_math.floor(q * (n - 1) + 0.5)) + 1, 1), n) for q in qs]

    # bracket per distinct target rank over the non-NaN values:
    # (lo exclusive or None, lo_rank, hi inclusive, hi_rank)
    results: dict[int, object] = {}
    brackets: dict[int, list] = {}
    for t in set(targets):
        if t > n_valid:
            results[t] = float("nan")  # ranked into the NaN tail
        elif mn == mx:
            results[t] = mn
        else:
            brackets[t] = [None, 0, mx, n_valid]

    def grid(lo, hi) -> list:
        # ≤ SELECT_PROBE_WAYS strictly-increasing thresholds in (lo, hi)
        k = SELECT_PROBE_WAYS
        if is_float:
            blo = to_bits(lo if lo is not None else mn) - (1 if lo is None else 0)
            bhi = to_bits(hi)
            ts = {blo + (bhi - blo) * j // (k + 1) for j in range(1, k + 1)}
            return sorted(from_bits(b) for b in ts if blo < b < bhi)
        ilo = (lo if lo is not None else mn - 1)
        ts = {ilo + (hi - ilo) * j // (k + 1) for j in range(1, k + 1)}
        return sorted(v for v in ts if ilo < v < hi)

    while True:
        live = {t: b for t, b in brackets.items() if t not in results}
        probes: list = []  # (t, threshold)
        for t, (lo, lo_r, hi, hi_r) in live.items():
            if hi_r - lo_r <= SELECT_BRACKET_MAX:
                continue
            g = grid(lo, hi)
            if not g:
                # value span exhausted: every bracketed row equals hi
                results[t] = hi
                continue
            probes.extend((t, th) for th in g)
        if not probes:
            break
        row = sdf.agg(
            *[
                F.sum(
                    F.when(
                        (c <= F.lit(th)) if live[t][0] is None else ((c > F.lit(live[t][0])) & (c <= F.lit(th))),
                        1,
                    ).otherwise(0)
                ).alias(f"__p{i}__")
                for i, (t, th) in enumerate(probes)
            ]
        ).collect()[0]
        counts: dict[int, list] = {}
        for i, (t, th) in enumerate(probes):
            counts.setdefault(t, []).append((th, live[t][1] + (row[f"__p{i}__"] or 0)))
        for t, pairs in counts.items():
            lo, lo_r, hi, hi_r = live[t]
            for th, r in sorted(pairs):
                if r < t:
                    lo, lo_r = th, r
                else:
                    hi, hi_r = th, r
                    break
            brackets[t] = [lo, lo_r, hi, hi_r]

    pending = {t: b for t, b in brackets.items() if t not in results}
    if pending:
        conds = [
            (c <= F.lit(hi)) if lo is None else ((c > F.lit(lo)) & (c <= F.lit(hi)))
            for (lo, _lr, hi, _hr) in pending.values()
        ]
        union = conds[0]
        for cd in conds[1:]:
            union = union | cd
        # Arrow transfer + numpy sort: the bracket is bounded (each ≤
        # SELECT_BRACKET_MAX) but row-based collect of ~10^5 values paid
        # more than the probe rounds it concluded
        vals = np.sort(sdf.filter(union).select(c.alias("__v__")).toPandas()["__v__"].to_numpy())
        for t, (lo, lo_r, hi, hi_r) in pending.items():
            i0 = 0 if lo is None else int(np.searchsorted(vals, lo, side="right"))
            results[t] = vals[i0 + (t - lo_r - 1)].item()

    def back(v):
        if v is None:
            return None
        if is_float and _math.isnan(v):
            return float("nan")
        if is_ts:
            import datetime as _dtm

            tz = _dtm.timezone.utc if isinstance(dt_, T.TimestampType) else None
            return _dtm.datetime(1970, 1, 1, tzinfo=tz) + _dtm.timedelta(microseconds=int(v))
        if isinstance(dt_, T.DateType):
            import datetime as _dtm

            return _dtm.date(1970, 1, 1) + _dtm.timedelta(days=int(v))
        if is_float:
            return float(v)
        return int(v)

    return [back(results[t]) for t in targets]


SELECT_BRACKET_MAX = 1 << 17  # final-bracket collect bound (longs, ~1 MB)
SELECT_PROBE_WAYS = 15  # conditional counts batched per probe round


def uniform_select(sdf: SDF, value_col: str, n: int, total: int, domain_hi: int) -> tuple:
    """Exact nth-smallest of a non-null LONG column ~uniform on
    ``[0, domain_hi)`` (hash draws) — ZERO shuffles: each round is ONE
    whole-column conditional-count aggregation (codegen ``sum(when(u <=
    t_j))`` for a value-grid of thresholds inside the current bracket),
    so only counts reach the driver; the final bracket (≤
    ``SELECT_BRACKET_MAX`` rows by construction) is collected and
    resolved exactly in python — the same bounded-driver-summary gate
    every kernel here uses.

    Returns ``(value, below, at)``: the value at 1-based rank ``n``,
    rows strictly smaller, rows equal. Rounds shrink the value span
    ~16x each — 2 scans at 5M rows, ~6 at 10^12 — and for adversarially
    non-uniform data the integer value span still shrinks 16x per round,
    bounding rounds by log16(domain_hi) = 15.
    """
    c = F.col(value_col)
    lo_v, lo_rank = -1, 0  # invariant: count(u <= lo_v) == lo_rank < n
    hi_v, hi_rank = domain_hi - 1, total  # count(u <= hi_v) == hi_rank >= n
    while hi_rank - lo_rank > SELECT_BRACKET_MAX:
        if hi_v - lo_v <= 1:
            # every bracketed row holds the single value hi_v
            return hi_v, lo_rank, hi_rank - lo_rank
        k = min(SELECT_PROBE_WAYS, hi_v - lo_v - 1)
        ts = sorted({lo_v + (hi_v - lo_v) * j // (k + 1) for j in range(1, k + 1)} - {lo_v})
        row = sdf.agg(
            *[
                F.sum(F.when((c > lo_v) & (c <= F.lit(t)), 1).otherwise(0)).alias(f"__t{i}__")
                for i, t in enumerate(ts)
            ]
        ).collect()[0]
        ranks = [lo_rank + (row[f"__t{i}__"] or 0) for i in range(len(ts))]
        nlo_v, nlo_rank, nhi_v, nhi_rank = lo_v, lo_rank, hi_v, hi_rank
        for t, r in zip(ts, ranks):
            if r < n:
                nlo_v, nlo_rank = t, r
            else:
                nhi_v, nhi_rank = t, r
                break
        lo_v, lo_rank, hi_v, hi_rank = nlo_v, nlo_rank, nhi_v, nhi_rank
    import bisect

    need = n - lo_rank
    vals = sorted(
        r[0] for r in sdf.filter((c > lo_v) & (c <= hi_v)).select(c).collect()
    )
    t = vals[need - 1]
    i0 = bisect.bisect_left(vals, t)
    return t, lo_rank + i0, bisect.bisect_right(vals, t) - i0


def grouped_nearest_quantiles(
    sdf: SDF, groups: list, value_col: str, qs: list, out_names: list
) -> SDF:
    """Per-group NEAREST quantiles with the executor buffer bounded by
    per-group DISTINCT values, never the group's rows:

    1. one map-combined ``groupBy(groups + value)`` count collapses
       duplicates (partial aggregation bounds task memory),
    2. a per-group value-ordered running count assigns each distinct
       value its rank interval ``[cum - cnt, cum)`` — WindowExec SORTS
       (spillable), it does not buffer the group as an array,
    3. ONE min-filter aggregation per group picks the element whose
       interval contains ``k = floor(q*(n-1)+0.5)`` for every requested
       q simultaneously.

    This replaces the ``array_sort(collect_list)`` rendering for grouped
    quantiles (frame._rewrite_grouped_quantiles): a sorted collect is
    bounded by group size and OOMs its executor on one giant/skewed
    group at scale. Nulls are excluded (quantile ignores nils); NaN
    groups to one distinct value and orders greatest (Spark = polars =
    reference sort semantics); an all-null group vanishes here and the
    caller's left join reports nil. Returns one row per group:
    ``groups + out_names`` (out_names[i] = quantile qs[i] of value_col).
    """
    CNT, CUM, N = "__gqc__", "__gqcum__", "__gqn__"
    v = F.col(value_col)
    cnt = (
        sdf.select(*groups, value_col)
        .filter(v.isNotNull())
        .groupBy(*groups, value_col)
        .agg(F.count(F.lit(1)).alias(CNT))
    )
    wv = W.partitionBy(*groups).orderBy(v.asc()).rowsBetween(W.unboundedPreceding, 0)
    wg = W.partitionBy(*groups)
    sel = cnt.select(
        *groups,
        v,
        F.col(CNT),
        F.sum(CNT).over(wv).alias(CUM),
        F.sum(CNT).over(wg).alias(N),
    )
    aggs = []
    for q, out in zip(qs, out_names):
        k = F.floor(F.lit(float(q)) * (F.col(N) - F.lit(1)).cast("double") + F.lit(0.5)).cast(
            "long"
        )
        hit = F.when((F.col(CUM) - F.col(CNT) <= k) & (k < F.col(CUM)), v)
        aggs.append(F.min(hit).alias(out))
    return sel.groupBy(*groups).agg(*aggs)
