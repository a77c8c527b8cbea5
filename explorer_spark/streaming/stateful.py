"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful streaming at all (SURVEY §2.11); this is
the additive scale path: arbitrary per-key state maintained across
micro-batches with watermark-driven timeout — the building block for
running aggregates, dedup-across-batches, and session state that
built-in windowed aggs can't express.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def _running_totals_fn(
    key: Tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]})


def running_totals(events: SDF) -> SDF:
    """Per-user running event count + value total, maintained as explicit
    group state across micro-batches (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_batch(events: SDF) -> SDF:
    """Batch twin of ``running_totals``: the FINAL state per user after
    the whole stream has been consumed is exactly one hash aggregation
    (count + sum, rounded like the state function). The streaming and
    batch forms are asserted equal in tests/test_scale.py; this is the
    oracle-checkable face of the stateful operator."""
    import pyspark.sql.functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def run_stateful_once(spark, parquet_path: str, query_name: str = "stateful_out") -> SDF:
    """Drive events through the stateful operator via readStream ->
    memory sink, synchronously (test/verification path). Runs in a
    cloned session with small shuffle-partition count — see
    streaming.run_stream_once for the state-store-per-partition math."""
    from . import stream_session

    spark = stream_session(spark, input_path=parquet_path)
    schema = spark.read.parquet(parquet_path).schema
    src = spark.readStream.schema(schema).parquet(parquet_path)
    out = running_totals(src)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
