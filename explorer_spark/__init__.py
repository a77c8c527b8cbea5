"""explorer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of elixir-explorer/explorer.

Three layers, mirroring the reference's proven split (SURVEY.md §7):

1. ``expr`` — the expression IR (reference "LazySeries",
   lib/explorer/backend/lazy_series.ex) lowered to pyspark Columns.
2. ``frame`` — the DataFrame wrapper with all table verbs (reference
   lib/explorer/data_frame.ex) plus groups-as-metadata semantics.
3. Catalyst — the optimizer/engine; we never build a physical layer.

Quick start::

    import explorer_spark as ex
    df = ex.read_parquet("/root/testdata/sf0.01/lineitem.parquet")
    out = (df.filter(ex.col("l_shipdate") <= ex.lit("1998-09-02"))
             .group_by("l_returnflag", "l_linestatus")
             .summarise(sum_qty=ex.f.sum(ex.col("l_quantity"))))
"""

from . import functions as f
from .dtypes import from_spark, merge_dtype, normalize, to_spark
from .expr import Expr, col, lit, raw
from .frame import DataFrame
from .series import Series
from .session import get_spark
from .sources import (
    from_columns,
    from_pandas,
    from_query,
    from_rows,
    load_table,
    read_csv,
    read_ipc,
    read_ipc_distributed,
    read_ndjson,
    read_parquet,
    write_csv,
    write_ipc,
    write_ndjson,
    write_parquet,
)

from .operators import rolling as _rolling

_rolling.register()


def new(data, spark=None) -> DataFrame:
    """Build a frame from tabular data (reference DataFrame.new/2):
    a dict of columns, a list of row dicts, or a pandas frame."""
    import pandas as pd

    if isinstance(data, dict):
        return from_columns(data, spark=spark)
    if isinstance(data, pd.DataFrame):
        return from_pandas(data, spark=spark)
    return from_rows(data, spark=spark)

__version__ = "0.1.0"

__all__ = [
    "DataFrame",
    "Expr",
    "col",
    "lit",
    "raw",
    "f",
    "get_spark",
    "read_parquet",
    "read_csv",
    "read_ndjson",
    "read_ipc",
    "read_ipc_distributed",
    "write_parquet",
    "write_csv",
    "write_ndjson",
    "write_ipc",
    "from_pandas",
    "from_rows",
    "from_columns",
    "from_query",
    "new",
    "load_table",
    "to_spark",
    "from_spark",
    "normalize",
    "merge_dtype",
]
