"""Differential tests mirroring the driver's correctness gate: run each
registered query on Spark AND its oracle SQL on DuckDB (sf0.01), then
compare row counts and values order-insensitively (columns sorted by name,
rows sorted, floats compared with tolerance)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR_ORACLE


def _normalize(df):
    """pandas frame -> sorted list-of-tuples with normalized values."""
    import pandas as pd

    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return str(pd.Timestamp(v))
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _q_names():
    from explorer_spark.queries import ORACLES, QUERIES

    return [n for n in QUERIES if n in ORACLES]


@pytest.mark.parametrize("name", _q_names())
def test_query_matches_oracle(name, spark, duck):
    from explorer_spark.queries import ORACLES, QUERIES

    got_sdf = QUERIES[name](spark, SF_DIR_ORACLE)
    got = got_sdf.toPandas()
    want = duck.execute(ORACLES[name]).df()

    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(c.lower() for c in got.columns) == sorted(c.lower() for c in want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    want.columns = [c for c in want.columns]
    g, w = _normalize(got), _normalize(want)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if not _row_eq(a, b)]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def _row_eq(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None and y is None:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True
