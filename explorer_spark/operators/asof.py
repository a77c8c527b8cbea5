"""Distributed as-of join WITHOUT `by` keys (reference
data_frame.ex:5566-5690; Polars AsOfOptions lazyframe.rs:371-427).

The naive Spark rendering of a keyless as-of join is a broadcast range
join — O(left × right) pairs before the top-1 window. This kernel is the
distributed merge-join design instead (what pandas merge_asof does on one
core, range-partitioned):

1. union left and right rows tagged by side, range-repartition on the
   key, sort within partitions — left rows are now co-located with the
   right rows that precede/follow them;
2. per-partition boundary summaries (#partitions rows, bounded): the last
   right row of each partition, forward-carried across partitions with a
   triangular self-join (and symmetrically the first right row, backward-
   carried, for strategies that look ahead);
3. one pandas pass per partition: searchsorted of left keys into the
   partition's right keys, falling back to the carried boundary row.

Wall-clock cost is one range shuffle — no quadratic stage anywhere.
Equidistant `nearest` ties resolve toward the EARLIER right key, matching
the `by`-keyed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F


def _is_missing(carry) -> bool:
    import numpy as np

    return carry is None or (isinstance(carry, float) and np.isnan(carry))


def merge_asof(
    lsdf: SDF,
    rsdf: SDF,
    on: str,
    key_expr,
    strategy: str = "backward",
    tolerance: float | None = None,
) -> SDF:
    """Join ``rsdf``'s columns onto ``lsdf`` by nearest key.

    ``key_expr(col) -> Column`` maps the `on` column to a double sort key
    (timestamps go through µs — exact in a double). ``rsdf`` must carry
    its key as ``__rkey__`` and its payload columns already renamed to
    their output names.
    """
    import pandas as pd
    from pyspark.sql import types as T

    assert strategy in ("backward", "forward", "nearest")
    rcols = [c for c in rsdf.columns if c != "__rkey__"]

    left = lsdf.withColumn("__k__", key_expr(F.col(on))).withColumn("__side__", F.lit(0))
    right = rsdf.withColumn("__k__", key_expr(F.col("__rkey__"))).withColumn("__side__", F.lit(1))
    right = right.drop("__rkey__")
    u = left.unionByName(right, allowMissingColumns=True)

    u = u.repartitionByRange(F.col("__k__").asc()).sortWithinPartitions(F.col("__k__").asc())
    u = u.withColumn("__pid__", F.spark_partition_id())
    # consumed by the boundary summaries AND the final pass — pin it so
    # the range shuffle runs once (nondeterministic pid blocks reuse);
    # localCheckpoint over persist: cheaper, auto-freed, fails loudly
    u = u.localCheckpoint(eager=False)

    # per-partition boundary rows of the RIGHT side (bounded table)
    rrows = u.filter(F.col("__side__") == 1)
    rstruct = F.struct(F.col("__k__").alias("k"), *[F.col(c).alias(c) for c in rcols])
    ends = rrows.groupBy("__pid__").agg(
        F.max_by(rstruct, F.col("__k__")).alias("__last__"),
        F.min_by(rstruct, F.col("__k__")).alias("__first__"),
    )
    pids = u.select("__pid__").distinct()
    b = ends.select(
        F.col("__pid__").alias("__p2__"), F.col("__last__").alias("__l2__"), F.col("__first__").alias("__f2__")
    )
    # carry INTO each partition: latest right row of any earlier partition
    # and earliest right row of any later one (triangular self-join over
    # the bounded summary — same pattern as operators/ordered.py)
    carry_back = (
        pids.join(F.broadcast(b), F.col("__p2__") < F.col("__pid__"), "left")
        .groupBy("__pid__")
        .agg(F.max_by(F.col("__l2__"), F.col("__p2__")).alias("__cb__"))
    )
    carry_fwd = (
        pids.join(F.broadcast(b), F.col("__p2__") > F.col("__pid__"), "left")
        .groupBy("__pid__")
        .agg(F.min_by(F.col("__f2__"), F.col("__p2__")).alias("__cf__"))
    )
    u = u.join(F.broadcast(carry_back), "__pid__", "left").join(F.broadcast(carry_fwd), "__pid__", "left")

    # right-side outputs MUST be nullable: an asof left join misses when
    # no right key lies on the required side (a non-nullable source —
    # e.g. spark.range ids — would make the Arrow reader throw
    # 'Value at index is null' on the first unmatched row)
    out_schema = T.StructType(
        list(lsdf.schema.fields)
        + [T.StructField(c, rsdf.schema[c].dataType, True) for c in rcols]
    )
    lnames = [f.name for f in lsdf.schema.fields]
    strat = strategy
    tol = float(tolerance) if tolerance is not None else None

    def kernel(batches):
        import numpy as np

        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["__k__", "__side__"], kind="stable").reset_index(drop=True)
        is_r = pdf["__side__"].to_numpy() == 1
        lrows = pdf.loc[~is_r]
        if len(lrows) == 0:
            return
        rrows_p = pdf.loc[is_r]
        rkeys = rrows_p["__k__"].to_numpy(dtype="float64")
        lkeys = lrows["__k__"].to_numpy(dtype="float64")
        cb = lrows["__cb__"].iloc[0]
        cf = lrows["__cf__"].iloc[0]
        nb = len(rkeys)

        bidx = np.searchsorted(rkeys, lkeys, side="right") - 1  # last rkey <= lkey
        fidx = np.searchsorted(rkeys, lkeys, side="left")  # first rkey >= lkey
        b_in = bidx >= 0
        f_in = fidx < nb

        def take(col_name, idx, in_part, carry):
            vals = rrows_p[col_name].to_numpy(dtype=object)
            safe = np.clip(idx, 0, max(nb - 1, 0))
            picked = vals[safe] if nb else np.full(len(idx), None, dtype=object)
            fallback = None if _is_missing(carry) else carry[col_name]
            out = np.where(in_part, picked, fallback)
            return out

        def keyat(idx, in_part, carry):
            safe = np.clip(idx, 0, max(nb - 1, 0))
            picked = rkeys[safe] if nb else np.zeros(len(idx))
            fallback = np.nan if _is_missing(carry) else carry["k"]
            return np.where(in_part, picked, fallback)

        res = lrows[lnames].copy()
        if strat == "backward":
            dist = np.abs(lkeys - keyat(bidx, b_in, cb))
            for c in rcols:
                res[c] = take(c, bidx, b_in, cb)
        elif strat == "forward":
            dist = np.abs(keyat(fidx, f_in, cf) - lkeys)
            for c in rcols:
                res[c] = take(c, fidx, f_in, cf)
        else:
            bk = keyat(bidx, b_in, cb)
            fk = keyat(fidx, f_in, cf)
            db = np.abs(lkeys - bk)
            df_ = np.abs(fk - lkeys)
            # tie -> earlier right key (backward), matching the by-path
            use_b = np.where(np.isnan(df_), True, np.where(np.isnan(db), False, db <= df_))
            dist = np.where(use_b, db, df_)
            for c in rcols:
                vb = take(c, bidx, b_in, cb)
                vf = take(c, fidx, f_in, cf)
                res[c] = np.where(use_b, vb, vf)
        if tol is not None:
            # pandas merge_asof tolerance: a match farther than `tol` in
            # key units is no match at all
            too_far = ~(dist <= tol)  # NaN distance -> no match (already None)
            if too_far.any():
                for c in rcols:
                    vals = res[c].to_numpy(dtype=object) if hasattr(res[c], "to_numpy") else res[c]
                    res[c] = np.where(too_far, None, vals)
        yield res

    return u.mapInPandas(kernel, out_schema)
