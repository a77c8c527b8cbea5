"""The DataFrame wrapper: Explorer's table verbs on a Spark DataFrame.

The reference keeps a struct of ``{data, groups, names, dtypes}``
(lib/explorer/data_frame.ex:206-207) where ``group_by`` only attaches
metadata and every later verb consults it (data_frame.ex:70-73). This
wrapper does the same: it holds the underlying ``pyspark.sql.DataFrame``,
the group columns, and a hidden row-order column that renders Explorer's
*ordered frame* semantics (head/slice/shift/stable sort/keep-first
distinct) on Spark's unordered engine.

Scale notes (the design target is a 1000-executor cluster on ~100 TB):

- The hidden order column is a ``monotonically_increasing_id`` assigned at
  scan — a narrow LongType that is only *consumed* by order-dependent ops;
  plain scan→filter→agg pipelines never shuffle or sort on it and Catalyst
  prunes it away.
- Contiguous row indices (``slice`` by position, ``row_index``) are built
  with the per-partition-offset pattern (partition counts → prefix sums →
  broadcast join) instead of a global single-partition window.
- Joins go through Catalyst/AQE strategy choice; ``join_asof`` compiles to
  a range join + per-row top-1 window.
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import DataFrame as SDF
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import dtypes as dt
from .expr import AGG_OPS, Expr, LowerCtx, col, lit

ORDER_COL = "__row_order__"

# sample(n, replace=False) gate: at or below this, rand + TakeOrdered (the
# one collecting task holds only n rows — the same bound any top-k
# accepts); above it, the distributed draw-threshold kernel picks the n
# smallest hash draws with a plain filter (VERDICT r5 #3)
SAMPLE_TAKEORDERED_MAX = 1 << 17

# dummies() gate: one-hot is small-cardinality by nature (every distinct
# value becomes a COLUMN); above this the distinct-collect is unbounded
# driver traffic and the when-chain a codegen blowup — raise explicitly
# via the max_categories parameter if a wider frame is really intended
DUMMIES_MAX_CATEGORIES = 4096


def _tensor_type_for(d):
    """Expected tensor (numpy) kind for a column dtype — the reference's
    put/4 dtype-vs-tensor-type validation (data_frame.ex:3281)."""
    d = dt.normalize(d)
    if d == "boolean":
        return ("u", 8)
    if d == "time" or (isinstance(d, tuple) and d[0] in ("naive_datetime", "datetime", "duration")):
        return ("s", 64)
    if d == "category":
        return ("s", 64)
    if d == "date":
        return ("s", 32)
    if isinstance(d, tuple) and d[0] in ("s", "u", "f"):
        return d
    return None  # string/binary/nested: no fixed tensor shape


def _resolve_seed(seed) -> int:
    """A concrete int seed (fresh entropy when None) so hash-draw
    sampling is reproducible within one call."""
    if seed is None:
        import random

        return random.randrange(2**31)
    return int(seed)


def _known_count(frame: "DataFrame") -> int:
    """Exact row count of a frame that just went through the row-index
    kernel — free from its stats job; a real count() only as fallback."""
    n = getattr(frame, "_row_count_hint", None)
    return int(n) if n is not None else frame._sdf.count()


def _hash_draw(parts: list[Column]) -> Column:
    """Deterministic uniform draw in [0, 2^60): the first 15 hex chars of
    md5('|'-joined parts) as an integer. Engine-portable (any SQL engine
    reproduces it), so seeded sampling is oracle-checkable, and a pure
    column expression, so draw streams never touch the driver.

    Draws are consumed MOD a frame/group length, which is exactly uniform
    only when the length divides the draw range; 60 bits of range makes
    the residual bias ≤ total/2^60 — immaterial at any realistic frame
    size (an 8-hex draw's total/2^32 bias was measurable for frames past
    ~1M rows)."""
    return F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast("long")


class LazyFrame:
    """The lazy-frame handle passed to *_with callbacks (reference
    filter_with/mutate_with/summarise_with/sort_with take a function of
    the LAZY frame, data_frame.ex:2780+): subscripting by name or
    position yields a lazy column expression, never data."""

    def __init__(self, df: "DataFrame"):
        self._df = df

    @property
    def names(self) -> list[str]:
        return self._df.names

    @property
    def dtypes(self) -> dict:
        return self._df.dtypes

    def __getitem__(self, key):
        if isinstance(key, int) and not isinstance(key, bool):
            return col(self._df.names[key])
        if key not in self._df.names:
            raise KeyError(
                f"could not find column name {key!r}; available: {self._df.names}"
            )
        return col(key)


class DataFrame:
    """Immutable wrapper; every verb returns a new DataFrame."""

    def __init__(
        self,
        sdf: SDF,
        groups: list[str] | None = None,
        has_order: bool | None = None,
        aligned: bool = False,
        group_mode: str = "groups",
        group_stable: bool = False,
    ):
        self._sdf = sdf
        self.groups = list(groups or [])
        # "groups" (plain GROUP BY) | "cube" | "rollup" — Spark-native
        # multi-dimensional aggregation passthrough (additive over the
        # reference, like the streaming surface). Only summarise consumes
        # cube/rollup; every other grouped verb treats the frame as
        # plainly grouped.
        self._group_mode = group_mode if groups else "groups"
        # group_by's :stable flag (reference default false — groups may
        # be reordered for performance); rides through _replace so
        # intermediate verbs don't silently drop an explicit stable=True
        self._group_stable = group_stable if groups else False
        self._has_order = ORDER_COL in sdf.columns if has_order is None else has_order
        # True iff the physical layout still matches ORDER_COL: ascending
        # partition id == ascending order, rows in order within partitions.
        # Shuffling verbs (joins, grouped windows) clear it; order-dependent
        # kernels re-align with one range shuffle when it's False.
        self._aligned = aligned and self._has_order

    # ------------------------------------------------------------------
    # basics
    # ------------------------------------------------------------------
    @property
    def names(self) -> list[str]:
        return [c for c in self._sdf.columns if c != ORDER_COL]

    @property
    def dtypes(self) -> dict:
        out = {}
        for fld in self._sdf.schema.fields:
            if fld.name == ORDER_COL:
                continue
            d = dt.from_spark(fld.dataType)
            # duration precision rides as column metadata (intervals are
            # physically µs; Series.cast duration->duration stamps the
            # logical precision, series.py)
            if isinstance(d, tuple) and d[0] == "duration" and fld.metadata.get("dur_p"):
                d = ("duration", fld.metadata["dur_p"])
            # logical datetime precision (ms/ns over physical µs) and the
            # time zone of {:datetime, p, tz} ride the same way
            # (Series._cast_datetime_meta stamps them)
            if isinstance(d, tuple) and d[0] == "naive_datetime" and fld.metadata.get("dt_p"):
                d = ("naive_datetime", fld.metadata["dt_p"])
            if isinstance(d, tuple) and d[0] == "datetime" and (
                fld.metadata.get("dt_p") or fld.metadata.get("tz")
            ):
                d = ("datetime", fld.metadata.get("dt_p", d[1]), fld.metadata.get("tz", d[2]))
            # category is physically a string column; cast/from_list/
            # categorise stamp the marker (Series._stamp_col_meta) so
            # dtype introspection and replace/2's code-decode branch see
            # the logical dtype
            if d == "string" and fld.metadata.get("cat"):
                d = "category"
            # time-of-day is an ns-since-midnight long with the "tm"
            # marker (reference :time dtype; from_list/cast stamp it)
            if d == ("s", 64) and fld.metadata.get("tm"):
                d = "time"
            # unsigned ints are physically the next wider signed type;
            # the "uw" marker carries the logical width (from_list/cast
            # stamp it; count-shaped ops set uw=32 via expr._node_meta)
            if (
                isinstance(d, tuple)
                and d[0] in ("s", "decimal")
                and fld.metadata.get("uw")
            ):
                d = ("u", fld.metadata["uw"])
            # list columns carry their element's logical dtype on the
            # SAME column metadata (one nesting level)
            if isinstance(d, tuple) and d[0] == "list":
                if d[1] == ("s", 64) and fld.metadata.get("tm"):
                    d = ("list", "time")
                elif (
                    isinstance(d[1], tuple)
                    and d[1][0] == "duration"
                    and fld.metadata.get("dur_p")
                ):
                    d = ("list", ("duration", fld.metadata["dur_p"]))
            out[fld.name] = d
        return out

    def n_rows(self) -> int:
        return self._sdf.count()

    def n_columns(self) -> int:
        return len(self.names)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows(), self.n_columns())

    def _replace(self, sdf: SDF, groups=None, has_order=None, aligned: bool = False) -> "DataFrame":
        return DataFrame(
            sdf,
            self.groups if groups is None else groups,
            self._has_order if has_order is None else has_order,
            aligned=aligned,
            group_mode=self._group_mode if groups is None else "groups",
            # stability survives any verb that KEEPS a grouping (rename
            # remaps group names, filters/mutates pass groups through);
            # an empty groups list zeroes it in the constructor anyway
            group_stable=self._group_stable,
        )

    def _ordered(self) -> "DataFrame":
        """Ensure the hidden row-order column exists."""
        if self._has_order:
            return self
        # a fresh monotonically_increasing_id IS the physical layout order
        return self._replace(
            self._sdf.withColumn(ORDER_COL, F.monotonically_increasing_id()), has_order=True, aligned=True
        )

    def _ctx(self, summarise: bool = False, ordered: bool = False) -> LowerCtx:
        return LowerCtx(
            groups=list(self.groups),
            order=ORDER_COL if (self._has_order or ordered) else None,
            summarise=summarise,
            sdf=self._sdf,
        )

    def to_sdf(self) -> SDF:
        """The underlying Spark DataFrame, hidden columns dropped."""
        if self._has_order:
            return self._sdf.sort(ORDER_COL).drop(ORDER_COL)
        return self._sdf

    def lazy_sdf(self) -> SDF:
        """Underlying Spark DataFrame without forcing an output sort."""
        return self._sdf.drop(ORDER_COL) if self._has_order else self._sdf

    def lazy(self) -> "DataFrame":
        """No-op: every frame here is already a lazy Spark plan
        (reference lazy/1, data_frame.ex:1757 — converting an
        already-lazy frame is also a no-op there)."""
        return self

    def collect(self) -> "DataFrame":
        """Materialize (reference: eager collect). Spark: an EAGER
        localCheckpoint, not ``.cache()`` — persisted plans pile up in
        the CacheManager, which rescans every cached plan on each later
        analysis (measured ~4x slowdown by the tail of a long session);
        checkpoints are plain pinned partitions the ContextCleaner frees
        once unreferenced, the same idiom every kernel here uses."""
        return self._replace(self._sdf.localCheckpoint(eager=True))

    def to_pandas(self):
        return self.to_sdf().toPandas()

    def to_rows(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.to_sdf().collect()]

    def to_rows_stream(self):
        """Lazily stream rows to the driver in partition-sized chunks
        (reference to_rows_stream, data_frame.ex:2125-2143)."""
        for r in self.to_sdf().toLocalIterator():
            yield r.asDict(recursive=True)

    def to_columns(self) -> dict[str, list]:
        if self._has_deep_nesting():
            # Arrow toPandas() segfaults sporadically on list-of-list
            # columns in this pyspark/pyarrow pairing (shape-dependent,
            # reproduced under hypothesis) — collect via the JVM row
            # serializer instead; deep-nested frames are driver-sized in
            # practice
            rows = self.to_rows()
            names = self.names
            return {c: [r[c] for r in rows] for c in names}
        # Flat frames: collect through Arrow, not pandas. Arrow keeps
        # nullable int64 EXACT (pandas widens to float64 — 2^53+1 silently
        # rounds) and distinguishes NULL from NaN natively (the reference
        # treats NaN as a VALUE distinct from nil).
        try:
            tbl = self.to_sdf().toArrow()
            return self._attach_zones({c: tbl.column(c).to_pylist() for c in self.names})
        except Exception:
            pass  # fall through to the masked-pandas path
        # Float columns: NaN is a VALUE distinct from SQL NULL in the
        # reference (fill_missing(:nan) fills nil with NaN) but pandas
        # float64 renders both as NaN — collect an explicit null mask so
        # only true NULLs become None and NaN survives.
        float_cols = [
            f.name
            for f in self._sdf.schema.fields
            if isinstance(f.dataType, (T.FloatType, T.DoubleType)) and f.name != ORDER_COL
        ]
        sdf = self.to_sdf()
        mask_names = {c: f"__isnull_{i}__" for i, c in enumerate(float_cols)}
        if float_cols:
            sdf = sdf.withColumns({m: F.isnull(F.col(c)) for c, m in mask_names.items()})
        pdf = sdf.toPandas()
        integral = {
            f.name
            for f in self._sdf.schema.fields
            if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
        }
        out = {}
        for c in self.names:
            s = pdf[c]
            if c in mask_names:
                nulls = pdf[mask_names[c]].tolist()
                out[c] = [None if isnull else v for v, isnull in zip(s.tolist(), nulls)]
            else:
                # represent SQL NULL as None (pandas renders it NaN/NaT)
                vals = s.astype(object).where(s.notna(), None).tolist()
                if c in integral:
                    # pandas coerces nullable int columns to float64 —
                    # restore Python ints so to_list round-trips exactly
                    vals = [None if v is None else int(v) for v in vals]
                out[c] = vals
        return self._attach_zones(out)

    def _attach_zones(self, out: dict) -> dict:
        """Logical-dtype rendering on collect: tz-stamped datetime
        columns render in THEIR zone (reference {:datetime, p, tz}
        round-trip, series/datetime_test.exs:107) and "tm"-marked
        ns-long columns render as datetime.time values (reference :time
        round-trip) — applied on every collect path."""
        import datetime as _dtm

        def _ns_to_time(v):
            if v is None:
                return None
            us = v // 1_000  # Python time has µs resolution; sub-µs truncates
            s, us_rem = divmod(us, 1_000_000)
            h, rem = divmod(s, 3600)
            m, sec = divmod(rem, 60)
            # out-of-range ns (a corrupt or overflowed :time long) raises
            # here rather than silently wrapping past midnight
            return _dtm.time(h, m, sec, us_rem)

        for fld in self._sdf.schema.fields:
            if fld.name not in out:
                continue
            tz = fld.metadata.get("tz")
            if tz and isinstance(fld.dataType, T.TimestampType):
                from zoneinfo import ZoneInfo

                z = ZoneInfo(tz)
                out[fld.name] = [
                    v.astimezone(z) if v is not None else None for v in out[fld.name]
                ]
            if fld.metadata.get("tm"):
                if isinstance(fld.dataType, T.LongType):
                    out[fld.name] = [_ns_to_time(v) for v in out[fld.name]]
                elif isinstance(fld.dataType, T.ArrayType) and isinstance(
                    fld.dataType.elementType, T.LongType
                ):
                    out[fld.name] = [
                        None if row is None else [_ns_to_time(v) for v in row]
                        for row in out[fld.name]
                    ]
        return out

    def _has_deep_nesting(self) -> bool:
        def depth(t) -> int:
            if isinstance(t, T.ArrayType):
                return 1 + depth(t.elementType)
            if isinstance(t, T.StructType):
                return max((depth(f.dataType) for f in t.fields), default=0)
            return 0

        return any(depth(f.dataType) >= 2 for f in self._sdf.schema.fields)

    def to_series(self, name: str) -> list:
        return [r[0] for r in self.to_sdf().select(name).collect()]

    def to_numpy(self):
        """Numeric columns as a 2-D numpy array (the reference's
        TensorFrame/Nx bridge rendered through Arrow, SURVEY §1.1)."""
        pdf = self.to_pandas()
        numeric = pdf.select_dtypes("number")
        return numeric.to_numpy()

    def to_table_string(
        self, limit: int | str | None = 5, limit_dots: str = "split", **render_opts
    ) -> str:
        """The reference's boxed ASCII table (to_table_string/2,
        data_frame.ex:6492-6594): titled, centered name/<dtype> headers,
        '=' header separator, per-row separators for composite columns,
        and a '…' dots row past ``limit`` (:split puts half above, half
        below; ``limit="infinity"`` or None renders every row)."""
        from .render import to_table_string

        if limit is None:
            limit = "infinity"
        return to_table_string(self, limit=limit, limit_dots=limit_dots, **render_opts)

    def print(self, limit: int | str | None = 5, limit_dots: str = "split", **render_opts):
        """Print the rendered table (reference print/2,
        data_frame.ex:6385)."""
        import builtins

        builtins.print(self.to_table_string(limit, limit_dots, **render_opts))

    def __repr__(self):
        """The reference's inspect shape (data_frame.ex:6962; the
        backend banner prints OUR engine name): ``#Explorer.DataFrame<``
        with shape, groups, and 5-value truncated column previews."""
        from .render import frame_repr

        try:
            return frame_repr(self)
        except Exception as e:  # a repr must never raise mid-debug
            return f"#Explorer.DataFrame<unrenderable: {type(e).__name__}>"

    def explain(self, mode: str = "formatted"):
        self._sdf.explain(mode)

    # ------------------------------------------------------------------
    # column selection helpers (reference data_frame.ex:218-240 selectors)
    # ------------------------------------------------------------------
    def _resolve(self, selector) -> list[str]:
        names = self.names
        if selector is None:
            return names
        if callable(selector) and not isinstance(selector, (str, re.Pattern)):
            dts = self.dtypes
            try:
                return [n for n in names if selector(n)]
            except TypeError:
                return [n for n in names if selector(n, dts[n])]
        if isinstance(selector, re.Pattern):
            return [n for n in names if selector.search(n)]
        if isinstance(selector, str):
            if selector in names:
                return [selector]
            rx = re.compile(selector)
            return [n for n in names if rx.search(n)]
        if isinstance(selector, range):
            bad = [i for i in selector if i >= len(names) or i < -len(names)]
            if bad:
                raise ValueError(
                    f"range {selector.start}..{selector.stop - 1} is out of bounds "
                    f"for a dataframe with {len(names)} column(s)"
                )
            return [names[i] for i in selector]
        if isinstance(selector, int):
            return [names[selector]]
        out = []
        for s in selector:
            if isinstance(s, int):
                out.append(names[s])
            elif s in names:
                out.append(s)
            else:
                raise KeyError(f"column {s!r} not found; available: {names}")
        return out

    # ------------------------------------------------------------------
    # projections / row selection
    # ------------------------------------------------------------------
    def select(self, selector) -> "DataFrame":
        cols = self._resolve(selector)
        # group columns always survive a projection (reference
        # grouped_test.exs:736-755 — selecting only other columns, or
        # discarding a group, 'does not have effect' on the group cols)
        cols = cols + [g for g in self.groups if g not in cols]
        keep = cols + ([ORDER_COL] if self._has_order else [])
        return self._replace(self._sdf.select(*keep), aligned=self._aligned)

    def discard(self, selector) -> "DataFrame":
        drop = set(self._resolve(selector))
        return self.select([n for n in self.names if n not in drop])

    def rename(self, mapping) -> "DataFrame":
        if isinstance(mapping, Mapping):
            pairs = dict(mapping)
        else:  # full list of new names, positional
            pairs = dict(zip(self.names, list(mapping)))
        sdf = self._sdf.withColumnsRenamed(pairs)
        groups = [pairs.get(g, g) for g in self.groups]
        return self._replace(sdf, groups=groups, aligned=self._aligned)

    def rename_with(self, fun: Callable[[str], str], selector=None) -> "DataFrame":
        cols = self._resolve(selector)
        return self.rename({c: fun(c) for c in cols})

    def relocate(self, selector, before=None, after=None) -> "DataFrame":
        moving = self._resolve(selector)
        # integer anchors are POSITIONS in the original frame
        # (reference relocate doctests use before: 0)
        names = self.names
        if isinstance(before, int):
            before = names[before]
        if isinstance(after, int):
            after = names[after]
        # split at the anchor's position in the ORIGINAL order, then
        # remove the moving block from both halves — an anchor that is
        # itself moving keeps the block at its original position
        # (reference relocate; the old rest.index would misplace it)
        if before is not None:
            cut = names.index(before)
        elif after is not None:
            cut = names.index(after) + 1
        else:
            cut = 0
        left = [n for n in names[:cut] if n not in moving]
        right = [n for n in names[cut:] if n not in moving]
        return self.select(left + moving + right)

    def pull(self, name) -> "Series":
        """One column as a Series (reference pull/2 returns a PLAIN
        %Series{} — group metadata does not travel: a pulled series
        aggregates over ALL rows, never per group)."""
        from .series import Series

        names = self.names
        if isinstance(name, int):
            name = names[name]
        return Series(self.ungroup().select([name]), name)

    def fetch(self, key):
        """Access-style fetch (reference fetch/2, Access impl): a column
        name or 0-based index -> SERIES; a list/range of either -> frame
        of those columns; None when absent (``df[key]`` raises instead)."""
        names = self.names
        if isinstance(key, int):
            return self.pull(key) if -len(names) <= key < len(names) else None
        if isinstance(key, str):
            return self.pull(key) if key in names else None
        if isinstance(key, slice):
            # python analogue of the reference's Range access: a COLUMN
            # slice (data_frame.ex Access, df[0..1] selects columns)
            key = list(range(*key.indices(len(names))))
        if isinstance(key, re.Pattern):
            # df[~r/regex/] selects the matching columns (Access impl)
            return self.select([n for n in names if key.search(n)])
        if isinstance(key, range):
            key = list(key)
        if isinstance(key, (list, tuple)):
            cols = []
            for k in key:
                if isinstance(k, int):
                    if not -len(names) <= k < len(names):
                        return None  # absent key -> None, like the scalar branch
                    cols.append(names[k])
                else:
                    cols.append(k)
            if any(c not in names for c in cols):
                return None
            return self.select(cols)
        return None

    def __getitem__(self, key):
        got = self.fetch(key)
        if got is None:
            raise KeyError(key)
        return got

    def __contains__(self, name) -> bool:
        return name in self.names

    def pop(self, name: str):
        """Split one column off the frame (the reference's Access.pop):
        returns (popped Series, remainder frame)."""
        return self.pull(name), self.discard([name])

    def estimated_size(self) -> int:
        """Catalyst's in-memory size estimate in bytes (reference
        estimated_size — a heuristic there too)."""
        return int(self._sdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())

    def put(self, name: str, values, dtype=None) -> "DataFrame":
        """Insert/replace a column from a python list, a Series, or a
        numpy array (positional align; reference put/3 + the tensor
        put/4). Series stay distributed — a row-index equi-join, never a
        driver collect.

        Numpy arrays follow the reference's TENSOR rules
        (data_frame.ex:3236-3303): replacing an existing column
        REINTERPRETS the raw values at the column's dtype (s64 µs counts
        land in a naive_datetime column; s64 codes decode through a
        category column) and the tensor's type must match that dtype's
        expected tensor type unless ``dtype`` overrides it
        (``dtype="infer"`` takes the tensor's own type). A 0-d tensor
        broadcasts to the frame length."""
        from .series import Series as _Series

        try:
            import numpy as _np

            is_tensor = isinstance(values, _np.ndarray) or isinstance(values, _np.generic)
        except ImportError:
            is_tensor = False
        if is_tensor:
            import numpy as _np

            a = _np.asarray(values)
            if a.ndim == 0:
                n = _known_count(self._with_row_index("__pos__")) if self.names else 1
                a = _np.full((n,), a.item(), dtype=a.dtype)
            own = _Series._NP_TO_DTYPE.get(str(a.dtype))
            if dtype == "infer":
                target = None
            elif dtype is not None:
                target = dtype
            elif name in self.names:
                target = self.dtypes[name]
                exp = _tensor_type_for(target)
                if exp is not None and own is not None and exp != own:
                    raise ValueError(
                        f"dtype {target!r} expects a tensor of type {exp!r} "
                        f"but got type {own!r}"
                    )
            else:
                target = None
            if (
                target is not None
                and dt.normalize(target) == "category"
                and own is not None
                and own[0] in ("s", "u")
            ):
                # integer codes decode through the EXISTING categories
                sv = _Series.from_tensor(a, name=str(name), spark=self._sdf.sparkSession)
                sv = sv.categorise(self.pull(name).categories())
            else:
                sv = _Series.from_tensor(
                    a, dtype=target, name=str(name), spark=self._sdf.sparkSession
                )
            return self.put(name, sv)
        if dtype is not None:
            raise ValueError("put: dtype option applies to tensor (numpy) values")
        if not self.names:
            # put on an empty 0-column frame CREATES the frame sized by
            # the values (reference data_frame.ex:3303 new([]) |> put)
            if isinstance(values, _Series):
                s = values
            else:
                s = _Series.from_list(
                    list(values), name=str(name), spark=self._sdf.sparkSession
                )
            out = s.to_frame()
            if out.names != [str(name)]:
                out = out.rename({out.names[0]: str(name)})
            return out
        if isinstance(values, _Series):
            idx_df = self._with_row_index("__pos__")
            sv_frame = values._frame._with_row_index("__pos__")
            # EAGER length validation (reference put/3 raises on size
            # mismatch): the row-index kernel's stats job already knows
            # each side's exact count, so this is free — and deterministic,
            # unlike weaving raise_error into a column Catalyst may prune.
            n_l = _known_count(idx_df)
            n_r = _known_count(sv_frame)
            if n_l != n_r:
                raise ValueError(
                    f"put: length of the series ({n_r}) must match the number "
                    f"of rows in the frame ({n_l}) (column {name!r})"
                )
            sv = sv_frame._sdf.select("__pos__", F.col(values.name).alias(name))
            left = idx_df._sdf.drop(name) if name in self.names else idx_df._sdf
            return idx_df._replace(left.join(sv, "__pos__", "left").drop("__pos__"))
        idx_df = self._with_row_index("__pos__")
        n_l = _known_count(idx_df)
        if n_l != len(values):
            raise ValueError(
                f"put: length of the list ({len(values)}) must match the number "
                f"of rows in the frame ({n_l}) (column {name!r})"
            )
        spark = self._sdf.sparkSession
        vals = spark.createDataFrame([(i, v) for i, v in enumerate(values)], ["__pos__", name])
        left = idx_df._sdf.drop(name) if name in self.names else idx_df._sdf
        joined = left.join(F.broadcast(vals), "__pos__", "left")
        return idx_df._replace(joined.drop("__pos__"), aligned=True)

    # ------------------------------------------------------------------
    # filter / mutate / summarise
    # ------------------------------------------------------------------
    def _lazy_accessor(self) -> "LazyFrame":
        return LazyFrame(self)

    def _expand_with_callback(self, fn) -> list:
        """Run a *_with callback against the lazy accessor (reference
        filter_with/mutate_with/summarise_with take a FUNCTION of the
        lazy frame, data_frame.ex:2780+): returns the callback result as
        a list, validating every element is a lazy expression."""
        res = fn(self._lazy_accessor())
        items = res if isinstance(res, (list, tuple)) else [res]
        for p in items:
            # (name, expr) pairs are mutate_with-shaped, never a boolean
            # predicate — the only caller is filter_with, so reject them
            # here with the reference's message rather than letting them
            # crash deep in the filter machinery
            if not isinstance(p, Expr):
                raise ValueError(
                    "expecting the function to return a single or a list "
                    f"of boolean LazySeries, but instead it contains:\n{p!r}"
                )
        return list(items)

    def _callback_pairs(self, fn) -> dict:
        """mutate_with/summarise_with callback result -> named exprs: a
        dict, or a list of (name, expr) pairs (the reference's keyword
        list)."""
        res = fn(self._lazy_accessor())
        if isinstance(res, Mapping):
            return dict(res)
        items = res if isinstance(res, (list, tuple)) else [res]
        out = {}
        for p in items:
            if not (isinstance(p, tuple) and len(p) == 2 and isinstance(p[0], str)):
                raise ValueError(
                    "expecting the function to return a dict or a list of "
                    f"(name, lazy expression) pairs, but instead it contains:\n{p!r}"
                )
            out[p[0]] = p[1]
        return out

    def _require_boolean_predicate(self, p: Expr) -> None:
        """Reference filter_with: a non-boolean result raises naming the
        offending dtype (data_frame_test.exs:316-343). Best-effort: the
        probe lowers the expression against this frame's plain context;
        shapes that need the grouped machinery skip the early check and
        fail (or work) downstream."""
        try:
            c = p.lower(self._ctx())
            dtp = self._sdf.select(c.alias("__p__")).schema["__p__"].dataType
        except Exception:
            return
        if not isinstance(dtp, T.BooleanType):
            got = dt.from_spark(dtp)
            rend = (
                "{:" + got[0] + ", " + str(got[1]) + "}"
                if isinstance(got, tuple) and len(got) == 2
                else f":{got}"
            )
            raise ValueError(
                "expecting the function to return a boolean LazySeries, "
                f"but instead it returned a LazySeries of type {rend}"
            )

    def filter_with(self, *predicates) -> "DataFrame":
        """Row filter; aggregations in the predicate broadcast per group
        (reference polars_backend/lazy_frame.ex:437-448). Accepts either
        expression predicates or ONE callback over the lazy frame
        (reference filter_with/2: ``df.filter_with(lambda ldf:
        ldf["a"] > 2)``)."""
        if len(predicates) == 1 and callable(predicates[0]) and not isinstance(predicates[0], Expr):
            predicates = tuple(self._expand_with_callback(predicates[0]))
            for p in predicates:
                self._require_boolean_predicate(p)
        if (
            self.groups
            and self._group_mode == "groups"
            and any(
                isinstance(p, Expr) and _tree_has(p, "quantile") for p in predicates
            )
        ):
            # grouped filter quantile: distinct-value kernel (see
            # _rewrite_grouped_quantiles), joined value used in the WHERE
            pre, new_preds, tmps = self._rewrite_grouped_quantiles(
                dict(enumerate(predicates)), agg_wrap=False
            )
            if pre is not self:
                res = pre.filter_with(*new_preds.values())
                return res._replace(res._sdf.drop(*tmps))
        if self._group_mode == "groups" and any(
            isinstance(p, Expr) and _tree_has(p, "mode") for p in predicates
        ):
            # mode in a predicate broadcasts the tied-mode LIST (same
            # list semantics as mutate — see _rewrite_modes)
            pre, new_preds, tmps = self._rewrite_modes(
                dict(enumerate(predicates)), agg_wrap=False
            )
            if pre is not self:
                res = pre.filter_with(*new_preds.values())
                return res._replace(res._sdf.drop(*tmps))
        needs_order = any(_tree_has(p, *ORDERED_EXPR_OPS) for p in predicates)
        has_agg = any(isinstance(p, Expr) and p.references_agg() for p in predicates)
        if not self.groups and (needs_order or has_agg):
            # ungrouped ordered/agg predicates: distributed kernels, not a
            # single-partition global window
            mat, rewritten = self._materialize_distributed(list(predicates))
            out = mat._sdf
            for i, p in enumerate(rewritten):
                tmp = f"__pred_{i}__"
                out = out.withColumn(tmp, p.lower(LowerCtx(sdf=mat._sdf))).filter(F.col(tmp)).drop(tmp)
            keep = self.names + ([ORDER_COL] if mat._has_order else [])
            return mat._replace(out.select(*keep))
        # grouped argmin/argmax in a predicate: within-group positions need
        # a contiguous per-group index (see _mutate_all's needs_pos note)
        needs_pos = any(
            isinstance(p, Expr) and _tree_has(p, "argmin", "argmax") for p in predicates
        )
        base = self._ordered() if (needs_order or needs_pos) else self
        ctx = base._ctx()
        if needs_pos:
            w = W.partitionBy(*self.groups).orderBy(F.col(ORDER_COL).asc())
            base = base._replace(
                base._sdf.withColumn("__pos_idx__", (F.row_number().over(w) - 1).cast("long"))
            )
            ctx.order = "__pos_idx__"
        out = base._sdf
        for i, p in enumerate(predicates):
            c = p.lower(ctx)
            if p.references_agg() or _tree_has(p, *ORDERED_EXPR_OPS):
                # window functions are not allowed in WHERE: materialize the
                # predicate as a column first (Catalyst prunes it afterwards)
                tmp = f"__pred_{i}__"
                out = out.withColumn(tmp, c).filter(F.col(tmp)).drop(tmp)
            else:
                out = out.filter(c)
        if needs_pos:
            out = out.drop("__pos_idx__")
        return base._replace(out, aligned=base._aligned and not (needs_order or has_agg or needs_pos))

    filter = filter_with

    def mask(self, bool_col) -> "DataFrame":
        """Row filter by a boolean Column, Expr, or a standalone boolean
        SERIES (reference mask/2 — positional alignment via a row-index
        equi-join, the distributed form)."""
        from .series import Series as _Series

        if isinstance(bool_col, (list, tuple)):
            # reference mask/2 accepts a plain list (data_frame.ex:2540)
            bool_col = _Series.from_list(
                list(bool_col), name="__mask__", spark=self._sdf.sparkSession
            )
        if isinstance(bool_col, _Series):
            idxed = self._with_row_index("__mi__")
            pf = bool_col._frame._with_row_index("__mi__")
            # EAGER length validation (reference mask raises on size
            # mismatch) via the row-index kernels' known counts — see put()
            n_l = _known_count(idxed)
            n_r = _known_count(pf)
            if n_l != n_r:
                raise ValueError(
                    f"mask: length of the mask series ({n_r}) must match "
                    f"the number of rows in the frame ({n_l})"
                )
            pred = pf._sdf.select(
                F.col("__mi__"), F.col(bool_col.name).cast("boolean").alias("__mv__")
            )
            keep = pred.filter(F.col("__mv__")).drop("__mv__")
            out = idxed._sdf.join(keep, "__mi__", "inner").drop("__mi__")
            return idxed._replace(out)
        if isinstance(bool_col, Expr):
            bool_col = bool_col.lower(self._ctx())
        return self._replace(self._sdf.filter(bool_col), aligned=self._aligned)

    def mutate_with(self, *fn, keep: str = "all", **exprs) -> "DataFrame":
        """Add/replace columns. Grouped frame: aggregations lower to
        window functions over the groups (reference lazy_frame.ex:503-521).
        Accepts ONE positional callback over the lazy frame (reference
        mutate_with/2: the callback returns a dict or a list of
        (name, expr) pairs).
        Ungrouped frame: aggregations broadcast as a one-row cross join and
        order-dependent ops run through the distributed kernels of
        operators/ordered.py — never a whole-frame single-partition window.

        ``keep="none"`` returns only the group columns plus the newly
        created ones (reference data_frame.ex:2915-2930); a column named
        ``keep`` must be assigned via ``mutate_with(**{"keep": ...})``-free
        call styles (rename first)."""
        if keep not in ("all", "none"):
            raise ValueError(f"keep must be 'all' or 'none', got {keep!r}")
        if fn:
            if len(fn) > 1 or not callable(fn[0]):
                raise TypeError("mutate_with takes one callback or keyword expressions")
            exprs = {**self._callback_pairs(fn[0]), **exprs}
        from .series import Series as _Series

        def _dict_to_struct(d: dict) -> Expr:
            kv: list = []
            for k, val in d.items():
                if isinstance(val, dict):
                    val = _dict_to_struct(val)
                elif not isinstance(val, Expr):
                    val = lit(val)
                kv += [str(k), val]
            return Expr("make_struct", *kv)

        exprs = dict(exprs)
        for n, v in exprs.items():
            # reference mutate rejects lists outright (query_to_series!):
            # positional data goes through put/3
            if isinstance(v, (list, tuple, range)):
                raise ValueError(
                    "expecting an expression or scalar value, but instead got a list. "
                    "If you want to create a new column from a list, use put/3"
                )
            # map form builds a struct column (reference 'mutate with map')
            if isinstance(v, dict):
                exprs[n] = _dict_to_struct(v)
        series_vals = {n: v for n, v in exprs.items() if isinstance(v, _Series)}
        plain = {n: v for n, v in exprs.items() if n not in series_vals}
        out = self._mutate_all(plain) if plain else self
        for n, s in series_vals.items():
            put_out = out.put(n, s)
            out = put_out._replace(put_out._sdf, groups=self.groups, has_order=put_out._has_order)
        if keep == "none":
            cols = list(dict.fromkeys(self.groups + list(exprs.keys())))
            return out.select(cols)
        return out

    @staticmethod
    def _mutate_cast_meta(exprs: dict) -> dict:
        """Column metadata a top-level ``mutate(x=cast(col, dtype))``
        must stamp — the expression-level twin of Series.cast's
        metadata stamps, now that the cast LOWERING itself applies the
        matching value semantics (expr._cast): ``tz`` for
        {:datetime, p, tz} (instant unchanged, zone label; validated
        eagerly), ``dt_p`` for ms/ns logical datetime precision (ms
        truncation is real in the lowering; ns is logical-only, the
        same trade Series.cast makes), ``dur_p`` for non-µs duration
        units."""
        from .series import _check_tz

        stamps = {}
        for name, e in exprs.items():
            if not (isinstance(e, Expr) and e.op == "cast"):
                continue
            d = dt.normalize(e.args[1])
            if not isinstance(d, tuple):
                continue
            meta = {}
            if d[0] in ("naive_datetime", "datetime"):
                unit = d[1] if len(d) > 1 else "us"
                unit = {"millisecond": "ms", "microsecond": "us", "nanosecond": "ns"}.get(unit, unit)
                if unit in ("ms", "ns"):
                    meta["dt_p"] = unit
            if d[0] == "datetime" and len(d) > 2 and d[2] not in ("Etc/UTC", "UTC"):
                _check_tz(d[2])
                meta["tz"] = d[2]
            if d[0] == "duration":
                unit = d[1] if len(d) > 1 else "us"
                unit = {"millisecond": "ms", "microsecond": "us", "nanosecond": "ns"}.get(unit, unit)
                if unit != "us":
                    meta["dur_p"] = unit
            if meta:
                stamps[name] = meta
        return stamps

    def _mutate_meta_stamps(self, exprs: dict) -> dict:
        """Stamps for mutate outputs: top-level casts (eagerly
        validated, ``_mutate_cast_meta``) plus the Expr-tree metadata
        inference (``expr._node_meta``) for COMPUTED temporal children —
        ``mutate(t2 = col(ts) + dur)`` keeps the zone/precision of
        ``ts``, so a chained ``col("t2").hour()`` (or a datetime->int
        cast) still reads the logical dtype, exactly as the reference's
        LazySeries carries dtype per node (lazy_series.ex:216-236)."""
        from .expr import _node_meta

        stamps = self._mutate_cast_meta(exprs)
        ctx = LowerCtx(sdf=self._sdf)
        for name, e in exprs.items():
            if name in stamps or not isinstance(e, Expr):
                continue
            m = _node_meta(e, ctx)
            if m:
                stamps[name] = m
        return stamps

    def _mutate_all(self, exprs: dict) -> "DataFrame":
        if (
            self.groups
            and self._group_mode == "groups"
            and any(
                isinstance(e, Expr) and _tree_has(e, "quantile") for e in exprs.values()
            )
        ):
            # grouped mutate quantile: same distinct-value kernel as the
            # summarise path — the joined per-group value replaces the
            # node directly (already broadcast to every group row)
            pre, new_exprs, tmps = self._rewrite_grouped_quantiles(exprs, agg_wrap=False)
            if pre is not self:
                res = pre._mutate_all(new_exprs)
                return res._replace(res._sdf.drop(*tmps))
        if self._group_mode == "groups" and any(
            isinstance(e, Expr) and _tree_has(e, "mode") for e in exprs.values()
        ):
            # mutate mode broadcasts the tied-mode LIST per group (per
            # frame for an ungrouped mutate) — reference list semantics
            pre, new_exprs, tmps = self._rewrite_modes(exprs, agg_wrap=False)
            if pre is not self:
                res = pre._mutate_all(new_exprs)
                return res._replace(res._sdf.drop(*tmps))
        needs_order = any(_tree_has(e, *ORDERED_EXPR_OPS) for e in exprs.values())
        has_agg = any(isinstance(e, Expr) and e.references_agg() for e in exprs.values())
        meta_stamps = self._mutate_meta_stamps(exprs)
        if not self.groups and (needs_order or has_agg):
            mat, rewritten = self._materialize_distributed(list(exprs.values()))
            cols = {
                name: (e.lower(LowerCtx(sdf=mat._sdf)) if isinstance(e, Expr) else lit(e).lower(LowerCtx(sdf=mat._sdf)))
                for name, e in zip(exprs.keys(), rewritten)
            }
            out = mat._sdf.withColumns(cols)
            keep = list(dict.fromkeys(self.names + list(exprs.keys())))
            keep += [ORDER_COL] if mat._has_order else []
            out = out.select(*keep)
            for n, m in meta_stamps.items():
                out = out.withMetadata(n, m)
            return mat._replace(out)
        # argmin/argmax RETURN row positions — in a grouped mutate that is
        # the WITHIN-GROUP position (reference grouped argmin), so a
        # contiguous per-group index must replace the sparse ORDER_COL id
        # as the position source (same materialization as summarise_with)
        needs_pos = any(
            isinstance(e, Expr) and _tree_has(e, "argmin", "argmax") for e in exprs.values()
        )
        base = self._ordered() if (needs_order or needs_pos) else self
        ctx = base._ctx()
        if needs_pos:
            w = W.partitionBy(*self.groups).orderBy(F.col(ORDER_COL).asc())
            base = base._replace(
                base._sdf.withColumn("__pos_idx__", (F.row_number().over(w) - 1).cast("long"))
            )
            ctx.order = "__pos_idx__"
        cols = {name: (e.lower(ctx) if isinstance(e, Expr) else lit(e).lower(ctx)) for name, e in exprs.items()}
        out = base._sdf.withColumns(cols)
        if needs_pos:
            out = out.drop("__pos_idx__")
        for n, m in meta_stamps.items():
            out = out.withMetadata(n, m)
        return base._replace(out, aligned=base._aligned and not (needs_order or has_agg or needs_pos))

    # -- distributed rendering of ungrouped ordered/agg expressions --------
    _IDX = "__gidx__"

    def _materialize_distributed(self, exprs: list) -> tuple["DataFrame", list]:
        """Rewrite every order-dependent or aggregate node in ``exprs``
        into a precomputed column on the frame (distributed kernels of
        operators/ordered.py or broadcast one-row aggregates); returns the
        augmented frame plus the rewritten trees (now plain row-wise)."""
        from .operators import ordered as ordk
        from .operators.rolling import _ROLL_FNS, _frame_bounds

        # value-statistic ranks (min/max/average/dense/random) never read
        # the row index — skip the whole index kernel when nothing else
        # does (e.g. a spearman mutate ranks two columns and aggregates)
        def _needs_idx(e) -> bool:
            if not isinstance(e, Expr):
                return False
            if e.op in ORDERED_EXPR_OPS and not (
                e.op == "rank"
                and (len(e.args) < 2 or e.args[1] in ("min", "max", "average", "dense", "random"))
            ):
                return True
            return any(_needs_idx(a) for a in e.args)

        # argmin/argmax RETURN row positions: they need the contiguous
        # 0-based index (the sparse ORDER_COL id would leak through as the
        # "position", e.g. 8589934592 for partition 1's first row)
        needs_idx = any(_needs_idx(e) for e in exprs) or any(
            isinstance(e, Expr) and _tree_has(e, "argmin", "argmax") for e in exprs
        )
        base = self._with_row_index(self._IDX) if needs_idx else self._ordered()
        n_hint = getattr(base, "_row_count_hint", None)
        state = {"sdf": base._sdf, "n": 0}
        plain = LowerCtx(sdf=base._sdf)

        def tmp() -> str:
            state["n"] += 1
            return f"__m{state['n']}__"

        # fuse value-statistic ranks: all min/max/average/dense ranks over
        # the same plain column share ONE distinct-value kernel and ONE
        # join back (operators/ordered.py rank_columns) instead of a
        # kernel chain per expression
        rank_fused: dict = {}
        quantile_qs: dict = {}
        def _prescan(e):
            if not isinstance(e, Expr):
                return
            if e.op == "rank" and isinstance(e.args[0], Expr) and e.args[0].op == "column":
                method = e.args[1] if len(e.args) > 1 else "average"
                descending = bool(e.args[2]) if len(e.args) > 2 else False
                if method in ("min", "max", "average", "dense"):
                    rank_fused.setdefault((e.args[0].args[0], descending), {}).setdefault(method, None)
            if e.op == "quantile":
                quantile_qs.setdefault(repr(e.args[0]), set()).add(float(e.args[1]))
            for a in e.args:
                _prescan(a)

        for e in exprs:
            _prescan(e)
        # fusion order: multi-method ranks over ONE column share a kernel
        # (rank_columns); single-method ranks over SEVERAL same-typed
        # columns share one melted kernel (rank_columns_multi) — e.g. a
        # spearman mutate ranking two columns runs ONE kernel total
        multi_groups: dict = {}
        for (vname, desc), meths in rank_fused.items():
            if len(meths) == 1:
                (m,) = meths
                dtype = state["sdf"].schema[vname].dataType.simpleString()
                multi_groups.setdefault((desc, m, dtype), []).append(vname)
            else:
                specs = {}
                for m in meths:
                    name = tmp()
                    meths[m] = name
                    specs[name] = m
                state["sdf"] = ordk.rank_columns(state["sdf"], None, vname, specs, desc, n_hint=n_hint)
        for (desc, m, _dtype), vnames in multi_groups.items():
            if len(vnames) == 1:
                name = tmp()
                rank_fused[(vnames[0], desc)][m] = name
                state["sdf"] = ordk.global_rank(state["sdf"], None, vnames[0], name, m, desc, n_hint=n_hint)
            else:
                spec = {}
                for vname in vnames:
                    name = tmp()
                    rank_fused[(vname, desc)][m] = name
                    spec[vname] = name
                state["sdf"] = ordk.rank_columns_multi(state["sdf"], spec, method=m, descending=desc, n_hint=n_hint)

        def as_col(e) -> str:
            """Materialize a pure (already rewritten) expr as a column name."""
            if isinstance(e, Expr) and e.op == "column":
                return e.args[0]
            name = tmp()
            state["sdf"] = state["sdf"].withColumn(name, e.lower(plain) if isinstance(e, Expr) else lit(e).lower(plain))
            return name

        def bounded(node: Expr, value: str, before: int, after: int, params: tuple) -> str:
            """shift/peaks/rolling: exact inside index buckets with
            duplicated boundary rows; reuses the op's window lowering."""
            from .expr import _LOWER

            u = ordk.with_boundary_context(state["sdf"], self._IDX, before, after)
            ctx2 = LowerCtx(groups=[ordk.BUCKET], order=self._IDX, sdf=u)
            c = _LOWER[node.op](ctx2, col(value), *params)
            name = tmp()
            state["sdf"] = ordk.strip_boundary_context(u.withColumn(name, c))
            return name

        def mat_ordered(node: Expr) -> str:
            op = node.op
            if op == "row_index":
                name = tmp()
                state["sdf"] = state["sdf"].withColumn(name, F.col(self._IDX).cast("int"))
                return name
            value = as_col(node.args[0])
            rest = node.args[1:]
            name = tmp()
            if op.startswith("cumulative_"):
                kind = op.removeprefix("cumulative_")
                reverse = bool(rest[0]) if rest else False
                state["sdf"] = ordk.cumulative(
                    state["sdf"], self._IDX, value, name, kind, reverse, n_hint=n_hint
                )
            elif op in ("fill_missing_forward", "fill_missing_backward"):
                state["sdf"] = ordk.fill_missing(
                    state["sdf"], self._IDX, value, name, backward=op.endswith("backward"), n_hint=n_hint
                )
            elif op == "rank":
                method = rest[0] if len(rest) > 0 else "average"
                descending = bool(rest[1]) if len(rest) > 1 else False
                seed = rest[2] if len(rest) > 2 else None
                fused = rank_fused.get((value, descending), {}).get(method)
                if fused is not None:
                    return fused
                state["sdf"] = ordk.global_rank(state["sdf"], self._IDX, value, name, method, descending, seed)
            elif op == "shift":
                offset = rest[0]
                return bounded(node, value, max(offset, 0), max(-offset, 0), tuple(rest))
            elif op == "peaks":
                return bounded(node, value, 1, 1, tuple(rest))
            elif op in _ROLL_FNS:
                window_size = rest[0]
                weights = rest[1] if len(rest) > 1 else None
                center = rest[3] if len(rest) > 3 else False
                if weights is not None:
                    before, after = window_size - 1, 0
                else:
                    lo, hi = _frame_bounds(window_size, center)
                    before, after = -lo, hi
                return bounded(node, value, before, after, tuple(rest))
            else:
                raise NotImplementedError(f"distributed kernel for {op!r}")
            return name

        # -- fused one-row aggregates --------------------------------------
        # All aggregate nodes at the same nesting level batch into ONE
        # .agg(...) job + ONE broadcast crossJoin (a mutate with k
        # aggregates used to run k jobs). Registration is lazy: mat_agg
        # queues the lowered aggregate under a placeholder column name;
        # the queue flushes in a single job either when an ordered kernel
        # needs to consume an aggregate result (agg-in-ordered nesting)
        # or once at the end of the rewrite. Structurally identical
        # aggregate trees share one slot.
        pending_aggs: dict[str, Column] = {}
        agg_cache: dict[str, str] = {}

        def flush_aggs() -> None:
            if not pending_aggs:
                return
            one = state["sdf"].agg(*[c.alias(n) for n, c in pending_aggs.items()])
            state["sdf"] = state["sdf"].crossJoin(F.broadcast(one))
            pending_aggs.clear()

        def _refs_pending(e) -> bool:
            if not isinstance(e, Expr):
                return False
            if e.op == "column" and e.args[0] in pending_aggs:
                return True
            return any(_refs_pending(a) for a in e.args)

        def mat_agg(node: Expr) -> str:
            key = repr(node)
            hit = agg_cache.get(key)
            if hit is not None:
                return hit
            if _refs_pending(node):
                # agg-of-agg: the inner batch must exist as real columns
                # before this aggregate can read them
                flush_aggs()
            name = tmp()
            aggc = node.lower(
                LowerCtx(order=self._IDX if needs_idx else None, summarise=True, sdf=state["sdf"])
            )
            pending_aggs[name] = aggc
            agg_cache[key] = name
            return name

        # whole-frame NEAREST quantiles: the distributed nth-element
        # kernel, one call per distinct source expression (all its qs in
        # a single pass); results re-enter the tree as typed literals so
        # the fused one-row aggregate batch never sorts a collected column
        quantile_cache: dict[str, dict] = {}

        def mat_quantile(orig: Expr, ne: Expr):
            from .operators import ordered as ordk

            akey = repr(orig.args[0])
            vals = quantile_cache.get(akey)
            if vals is None:
                if _refs_pending(ne.args[0]):
                    flush_aggs()
                vname = as_col(ne.args[0])
                qs = sorted(quantile_qs.get(akey) or {float(orig.args[1])})
                got = ordk.nearest_quantiles(state["sdf"], vname, qs)
                dtype = state["sdf"].schema[vname].dataType
                vals = quantile_cache[akey] = {q: (v, dtype) for q, v in zip(qs, got)}
            v, dtype = vals[float(orig.args[1])]
            return Expr("typed_literal", v, dtype)

        def rewrite(e):
            if not isinstance(e, Expr):
                return e
            new_args = [rewrite(a) if isinstance(a, Expr) else a for a in e.args]
            ne = Expr(e.op, *new_args)
            if e.op == "quantile":
                return mat_quantile(e, ne)
            if e.op in ORDERED_EXPR_OPS:
                # the kernel's input may reference a queued aggregate
                # placeholder — materialize the batch first
                flush_aggs()
                # no pin needed between kernels: each kernel persists its
                # own nondeterministic core and joins results back via
                # literal broadcast lookups, so chains stay linear
                return col(mat_ordered(ne))
            if e.op in AGG_OPS:
                return col(mat_agg(ne))
            return ne

        rewritten = [rewrite(e) for e in exprs]
        flush_aggs()
        return base._replace(state["sdf"], aligned=False), rewritten

    mutate = mutate_with

    def _rewrite_ungrouped_quantiles(self, exprs: dict) -> dict:
        """Whole-frame NEAREST quantile aggregates route through the
        distributed nth-element kernel (operators/ordered.py
        nearest_quantiles: distinct-value counts + bounded prefix + one
        min-filter agg) instead of ``array_sort(collect_list(col))`` —
        the sorted-collect rendering is bounded by GROUP size and stays
        for grouped frames only; ungrouped it would put the entire
        column in one aggregation buffer. Every q over the same source
        expression shares one kernel; results substitute as typed
        literals so an s64 column's quantile stays s64."""
        from .operators import ordered as ordk

        plain = LowerCtx(sdf=self._sdf)
        gather: dict[str, set] = {}

        def scan(e):
            if not isinstance(e, Expr):
                return
            if e.op == "quantile":
                gather.setdefault(repr(e.args[0]), set()).add(float(e.args[1]))
            for a in e.args:
                scan(a)

        for e in exprs.values():
            scan(e)
        cache: dict[str, dict] = {}

        def compute(arg, akey: str) -> dict:
            hit = cache.get(akey)
            if hit is not None:
                return hit
            if isinstance(arg, Expr) and arg.op == "column":
                sdf, vname = self._sdf, arg.args[0]
            else:
                vname = "__qval__"
                sdf = self._sdf.withColumn(
                    vname, arg.lower(plain) if isinstance(arg, Expr) else F.lit(arg)
                )
            qs = sorted(gather[akey])
            got = ordk.nearest_quantiles(sdf, vname, qs)
            dtype = sdf.schema[vname].dataType
            cache[akey] = {q: (v, dtype) for q, v in zip(qs, got)}
            return cache[akey]

        def rw(e):
            if not isinstance(e, Expr):
                return e
            if e.op == "quantile":
                vals = compute(e.args[0], repr(e.args[0]))
                v, dtype = vals[float(e.args[1])]
                return Expr("typed_literal", v, dtype)
            return Expr(e.op, *[rw(a) for a in e.args])

        return {n: rw(e) for n, e in exprs.items()}

    def _summarise_modes_postjoin(self, exprs: dict):
        """r12 (guide §2.3 "keep heavy payloads out of the exchange";
        VERDICT r11 #5): when every mode() in a grouped summarise is a
        TOP-LEVEL output column, aggregate the frame WITHOUT the mode
        columns and join each tied-mode list onto the AGGREGATED result
        (one row per group) — the old rewrite joined the list onto the
        full frame before aggregation, so every frame row carried the
        array through the groupBy exchange and one broadcast join ran
        over the whole frame per mode column. Tied-mode semantics,
        null handling (all-null group -> nil list via the left join) and
        sorted-list output are identical to _rewrite_modes, which
        remains the path for nested/derived mode expressions. Returns
        None when not applicable."""
        from functools import reduce as _reduce

        def _rewritable(arg) -> bool:
            return not (
                isinstance(arg, Expr)
                and (arg.references_agg() or _tree_has(arg, *ORDERED_EXPR_OPS))
            )

        top = {
            n: e
            for n, e in exprs.items()
            if isinstance(e, Expr) and e.op == "mode" and _rewritable(e.args[0])
        }
        if not top or not self.groups:
            return None
        rest = {n: e for n, e in exprs.items() if n not in top}
        if any(isinstance(e, Expr) and _tree_has(e, "mode") for e in rest.values()):
            return None  # derived/nested mode: the general rewrite handles it
        filler = not rest
        if filler:
            # agg() needs at least one aggregate; a constant max keeps the
            # group row set (and the stable-order column) intact
            rest = {"__mode_filler__": Expr("max", lit(1))}
        base = self.summarise_with(**rest)
        out = base._sdf
        plain = LowerCtx(sdf=self._sdf)
        tmp_of: dict[str, str] = {}
        for i, (name, e) in enumerate(top.items()):
            arg = e.args[0]
            if isinstance(arg, Expr) and arg.op == "column":
                vname, src = arg.args[0], self._sdf
            else:
                vname = f"__pmv{i}__"
                src = self._sdf.withColumn(
                    vname, arg.lower(plain) if isinstance(arg, Expr) else F.lit(arg)
                )
            tmp = f"__pm{i}__"
            tmp_of[name] = tmp
            cnt = (
                src.filter(F.col(vname).isNotNull())
                .groupBy(*self.groups, vname)
                .agg(F.count(F.lit(1)).alias("__c__"))
            )
            mx = cnt.groupBy(
                *[F.col(g).alias(f"__jgm_{g}__") for g in self.groups]
            ).agg(F.max("__c__").alias("__mx__"))
            mcond = _reduce(
                lambda a, b: a & b,
                [cnt[g].eqNullSafe(mx[f"__jgm_{g}__"]) for g in self.groups],
            )
            tied = cnt.join(mx, mcond).filter(F.col("__c__") == F.col("__mx__"))
            modes = tied.groupBy(*self.groups).agg(
                F.sort_array(F.collect_list(vname)).alias(tmp)
            )
            right = modes
            for g in self.groups:
                right = right.withColumnRenamed(g, f"__jm_{g}__")
            cond = _reduce(
                lambda a, b: a & b,
                [out[g].eqNullSafe(right[f"__jm_{g}__"]) for g in self.groups],
            )
            out = out.join(right, cond, "left").drop(
                *[f"__jm_{g}__" for g in self.groups]
            )
        sel = list(self.groups) + [
            (F.col(tmp_of[n]).alias(n) if n in tmp_of else F.col(n)) for n in exprs
        ]
        if base._has_order:
            sel.append(F.col(ORDER_COL))
        out = out.select(*sel)
        return DataFrame(out, groups=[], has_order=base._has_order)

    def _rewrite_modes(self, exprs: dict, agg_wrap: bool):
        """mode() returns ALL tied modes as a SORTED LIST (reference
        series.ex:2640-2680 — multi-value on ties; summarise dtype is
        {:list, inner}, grouped_test.exs 'using mode'). Spark's F.mode
        is single-valued, so mode nodes rewrite through a per-(group,
        value) count kernel: map-side-combined value counts, a max-count
        join (broadcast for the ungrouped case), tied values collected
        sorted — executor memory bounded by the tied-mode count, never
        the whole group. The list re-enters the tree as a per-group
        constant (max-of-array in summarise — Spark arrays are
        orderable; the joined column in mutate/filter). cube/rollup
        summarise keeps Spark's scalar F.mode (grouping sets don't join
        back on one key set — same caveat as grouped quantiles)."""
        from functools import reduce as _reduce

        gather: dict[str, object] = {}

        def _rewritable(arg) -> bool:
            return not (
                isinstance(arg, Expr)
                and (arg.references_agg() or _tree_has(arg, *ORDERED_EXPR_OPS))
            )

        def scan(e):
            if not isinstance(e, Expr):
                return
            if e.op == "mode" and _rewritable(e.args[0]):
                gather.setdefault(repr(e.args[0]), e.args[0])
            for a in e.args:
                scan(a)

        for e in exprs.values():
            scan(e)
        if not gather:
            return self, exprs, []

        plain = LowerCtx(sdf=self._sdf)
        out = self._sdf
        names_map: dict[str, str] = {}
        tmps: list[str] = []
        for i, (key, arg) in enumerate(gather.items()):
            if isinstance(arg, Expr) and arg.op == "column":
                vname, src = arg.args[0], self._sdf
            else:
                vname = f"__gmv{i}__"
                src = self._sdf.withColumn(
                    vname, arg.lower(plain) if isinstance(arg, Expr) else F.lit(arg)
                )
            tmp = f"__gm{i}__"
            cnt = (
                src.filter(F.col(vname).isNotNull())
                .groupBy(*self.groups, vname)
                .agg(F.count(F.lit(1)).alias("__c__"))
            )
            if self.groups:
                mx = cnt.groupBy(
                    *[F.col(g).alias(f"__jgm_{g}__") for g in self.groups]
                ).agg(F.max("__c__").alias("__mx__"))
                mcond = _reduce(
                    lambda a, b: a & b,
                    [cnt[g].eqNullSafe(mx[f"__jgm_{g}__"]) for g in self.groups],
                )
                tied = cnt.join(mx, mcond).filter(F.col("__c__") == F.col("__mx__"))
                modes = tied.groupBy(*self.groups).agg(
                    F.sort_array(F.collect_list(vname)).alias(tmp)
                )
                right = modes
                for g in self.groups:
                    right = right.withColumnRenamed(g, f"__jm_{g}__")
                cond = _reduce(
                    lambda a, b: a & b,
                    [out[g].eqNullSafe(right[f"__jm_{g}__"]) for g in self.groups],
                )
                out = out.join(right, cond, "left").drop(
                    *[f"__jm_{g}__" for g in self.groups]
                )
            else:
                mx = cnt.agg(F.max("__c__").alias("__mx__"))
                modes = cnt.join(F.broadcast(mx), F.col("__c__") == F.col("__mx__")).agg(
                    F.sort_array(F.collect_list(vname)).alias(tmp)
                )
                out = out.crossJoin(F.broadcast(modes))
            names_map[key] = tmp
            tmps.append(tmp)

        def rw(e):
            if not isinstance(e, Expr):
                return e
            if e.op == "mode":
                hit = names_map.get(repr(e.args[0]))
                if hit is not None:
                    return Expr("max", col(hit)) if agg_wrap else col(hit)
            return Expr(e.op, *[rw(a) for a in e.args])

        return self._replace(out), {n: rw(e) for n, e in exprs.items()}, tmps

    def _rewrite_grouped_quantiles(self, exprs: dict, agg_wrap: bool):
        """Grouped NEAREST quantiles route through the per-group
        distinct-value counts kernel (operators/ordered.py
        grouped_nearest_quantiles) instead of
        ``array_sort(collect_list)``: the sorted collect buffers the
        WHOLE group as an in-executor array, which OOMs on one
        giant/skewed group at scale; the kernel's memory is bounded by
        per-group distinct values and its sort spills. Results join
        back on the group keys (null-safe — a null group key is a
        group) and re-enter the tree as per-group constants:
        ``max(col)`` in summarise (a real aggregate over a
        group-constant column), the plain column in mutate/filter
        (already broadcast by the join). Only plain row-wise source
        args rewrite; quantile-of-aggregate keeps the sorted collect.
        Returns ``(pre_frame, new_exprs, tmp_names)`` —
        ``pre_frame is self`` when nothing rewrote."""
        from functools import reduce as _reduce

        from .operators import ordered as ordk

        gather: dict[str, set] = {}
        arg_of: dict[str, object] = {}

        def _rewritable(arg) -> bool:
            return not (
                isinstance(arg, Expr)
                and (arg.references_agg() or _tree_has(arg, *ORDERED_EXPR_OPS))
            )

        def scan(e):
            if not isinstance(e, Expr):
                return
            if e.op == "quantile" and _rewritable(e.args[0]):
                key = repr(e.args[0])
                gather.setdefault(key, set()).add(float(e.args[1]))
                arg_of[key] = e.args[0]
            for a in e.args:
                scan(a)

        for e in exprs.values():
            scan(e)
        if not gather:
            return self, exprs, []

        plain = LowerCtx(sdf=self._sdf)
        out = self._sdf
        names_map: dict[tuple, str] = {}
        tmps: list[str] = []
        for i, (key, qs) in enumerate(gather.items()):
            arg = arg_of[key]
            if isinstance(arg, Expr) and arg.op == "column":
                vname, src = arg.args[0], self._sdf
            else:
                vname = f"__gqv{i}__"
                src = self._sdf.withColumn(
                    vname, arg.lower(plain) if isinstance(arg, Expr) else F.lit(arg)
                )
            qlist = sorted(qs)
            outs = [f"__gq{i}_{j}__" for j in range(len(qlist))]
            qtab = ordk.grouped_nearest_quantiles(src, self.groups, vname, qlist, outs)
            right = qtab
            for g in self.groups:
                right = right.withColumnRenamed(g, f"__jgq_{g}__")
            cond = _reduce(
                lambda a, b: a & b,
                [out[g].eqNullSafe(right[f"__jgq_{g}__"]) for g in self.groups],
            )
            out = out.join(right, cond, "left").drop(
                *[f"__jgq_{g}__" for g in self.groups]
            )
            for q, tmp in zip(qlist, outs):
                names_map[(key, q)] = tmp
            tmps.extend(outs)

        def rw(e):
            if not isinstance(e, Expr):
                return e
            if e.op == "quantile":
                hit = names_map.get((repr(e.args[0]), float(e.args[1])))
                if hit is not None:
                    return Expr("max", col(hit)) if agg_wrap else col(hit)
            return Expr(e.op, *[rw(a) for a in e.args])

        return self._replace(out), {n: rw(e) for n, e in exprs.items()}, tmps

    def summarise_with(self, *fn, **exprs) -> "DataFrame":
        """Per-group aggregation; group cols prepended to output
        (reference data_frame.ex:6128-6290). A non-aggregate expression
        implicitly collects the group's values into a LIST in frame
        order (reference 'allows returning the group as a list',
        data_frame_test.exs:4352-4368); plain Python values become
        literal columns (`summarise(c: nil)`). Accepts ONE positional
        callback over the lazy frame (reference summarise_with/2)."""
        if fn:
            if len(fn) > 1 or not callable(fn[0]):
                raise TypeError("summarise_with takes one callback or keyword expressions")
            exprs = {**self._callback_pairs(fn[0]), **exprs}

        def _implicit_list(e) -> bool:
            return isinstance(e, Expr) and not e.references_agg() and _tree_has_column(e)

        has_ordered = [
            n for n, e in exprs.items()
            if isinstance(e, Expr) and _tree_has(e, *ORDERED_EXPR_OPS)
        ]
        if has_ordered:
            # Ordered/window ops can't lower inside an aggregate (Spark
            # rejects a window function in agg; same for collect_list):
            # extract every MAXIMAL ordered subtree, materialize as
            # columns first — grouped mutate runs them through windows /
            # the distributed kernels — then aggregate the materialized
            # values. Covers both the implicit list-collect of an ordered
            # expr (reference data_frame_test.exs:4352-4368) and an
            # aggregate over a window function, e.g.
            # max(window_mean(v, 2)) (reference grouped_test.exs:442-464).
            ordered_sub: dict[str, tuple[str, Expr]] = {}

            def _extract(e):
                if not isinstance(e, Expr):
                    return e
                if e.op in ORDERED_EXPR_OPS:
                    if e.references_agg():
                        # reference grouped_test.exs:466: a window over an
                        # aggregate is ill-defined in summarise (the agg
                        # collapses the rows the window would scan)
                        raise ValueError(
                            "it's not possible to have an aggregation "
                            f"operation inside :{e.op}, which is a window "
                            "function"
                        )
                    key = repr(e)
                    if key not in ordered_sub:
                        ordered_sub[key] = (f"__so{len(ordered_sub)}__", e)
                    return col(ordered_sub[key][0])
                return Expr(e.op, *[_extract(a) for a in e.args])

            new_exprs = {
                n: (_extract(e) if n in has_ordered else e) for n, e in exprs.items()
            }
            pre = self.mutate_with(**{name: sub for name, sub in ordered_sub.values()})
            return pre.summarise_with(**new_exprs)

        if self._group_mode in ("cube", "rollup") and any(
            isinstance(e, Expr) and _tree_has(e, "mode", "quantile") for e in exprs.values()
        ):
            # grouping-sets parity for the list-mode and NEAREST-quantile
            # kernels (round-9 verdict #5): Spark's cube/rollup can't host
            # the rewrites (they join back on ONE key set), so decompose
            # into the explicit grouping sets and union plain grouped
            # summarises — each subset rides the verified kernels, and the
            # union IS the cube/rollup row set (a subset aggregation with
            # the absent keys null matches Spark's own encoding)
            if self._group_mode == "rollup":
                sets = [self.groups[:i] for i in range(len(self.groups), -1, -1)]
            else:
                sets = [
                    [g for i, g in enumerate(self.groups) if not (mask >> i) & 1]
                    for mask in range(1 << len(self.groups))
                ]
            schema_by = {f.name: f.dataType for f in self._sdf.schema.fields}
            pieces = []
            flat = self.ungroup()
            for S in sets:
                sub = flat.group_by(*S) if S else flat
                out = sub.summarise_with(**exprs)
                sdf = out.lazy_sdf()
                for g in self.groups:
                    if g not in S:
                        sdf = sdf.withColumn(g, F.lit(None).cast(schema_by[g]))
                sdf = sdf.select(*self.groups, *[c for c in exprs])
                pieces.append(sdf)
            u = pieces[0]
            for p in pieces[1:]:
                u = u.unionByName(p)
            return DataFrame(u, groups=[], has_order=False)

        # metadata stamps come from the ORIGINAL expressions — the
        # quantile kernel rewrite below substitutes typed_literals, which
        # would lose e.g. quantile-of-:time keeping the time dtype
        meta_source = dict(exprs)
        if not self.groups and any(
            isinstance(e, Expr) and _tree_has(e, "quantile") for e in exprs.values()
        ):
            # whole-frame quantile: distributed nth-element kernel, never
            # a whole-column collect_list in one aggregation buffer
            exprs = self._rewrite_ungrouped_quantiles(exprs)

        if (
            self.groups
            and self._group_mode == "groups"
            and any(
                isinstance(e, Expr) and _tree_has(e, "quantile") for e in exprs.values()
            )
        ):
            # grouped quantile: per-group distinct-value counts kernel,
            # never a whole-group collect_list (giant-group OOM at scale);
            # cube/rollup keep the sorted collect (grouping sets don't
            # join back on one key set)
            pre, new_exprs, _tmps = self._rewrite_grouped_quantiles(exprs, agg_wrap=True)
            if pre is not self:
                return pre.summarise_with(**new_exprs)

        if self._group_mode == "groups" and any(
            isinstance(e, Expr) and _tree_has(e, "mode") for e in exprs.values()
        ):
            # mode -> sorted LIST of tied modes (reference); cube/rollup
            # keep Spark's scalar F.mode (see _rewrite_modes). r12: plain
            # top-level mode outputs take the post-aggregation join path
            # (_summarise_modes_postjoin) — tied-mode arrays never ride
            # the frame or the aggregation exchange.
            res = self._summarise_modes_postjoin(exprs)
            if res is not None:
                return res
            pre, new_exprs, _tmps = self._rewrite_modes(exprs, agg_wrap=True)
            if pre is not self:
                return pre.summarise_with(**new_exprs)

        # stable grouped summarise emits groups in FIRST-APPEARANCE order
        # (reference data_frame.ex:6094/6107 fossil/iris doctests pin it).
        # min(order) per group is a map-side-combined agg and itself a
        # valid global order column — no extra sort or shuffle here; the
        # sort happens only at materialization like every ordered frame.
        stable_groups = bool(
            self.groups
            and self._group_mode == "groups"
            and self._group_stable
        )
        needs_order = stable_groups or any(_implicit_list(e) for e in exprs.values())
        # argmin/argmax (and order-exact first/last) return/consume row
        # POSITIONS: the hidden order column is a sparse monotonic id, so
        # materialize a contiguous index — per group when grouped (the
        # reference's grouped argmin is the within-group position)
        needs_pos = any(
            isinstance(e, Expr) and _tree_has(e, "argmin", "argmax") for e in exprs.values()
        )
        base = self._ordered() if (needs_order or needs_pos) else self
        ctx = base._ctx(summarise=True)
        if needs_pos:
            if self.groups:
                w = W.partitionBy(*self.groups).orderBy(F.col(ORDER_COL).asc())
                base = base._replace(
                    base._sdf.withColumn("__pos_idx__", (F.row_number().over(w) - 1).cast("long"))
                )
            else:
                base = base._with_row_index("__pos_idx__")
            ctx.order = "__pos_idx__"
        aggs = []
        for name, e in exprs.items():
            if not isinstance(e, Expr):
                aggs.append(lit(e).lower(ctx).alias(name))
            elif _implicit_list(e):
                pair = F.struct(F.col(ORDER_COL).alias("o"), e.lower(ctx).alias("v"))
                aggs.append(
                    F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"]).alias(name)
                )
            else:
                aggs.append(e.lower(ctx).alias(name))
        if stable_groups:
            aggs.append(F.min(ORDER_COL).alias(ORDER_COL))
        if self.groups:
            if self._group_mode == "cube":
                grouped = base._sdf.cube(*self.groups)
            elif self._group_mode == "rollup":
                grouped = base._sdf.rollup(*self.groups)
            else:
                grouped = base._sdf.groupBy(*self.groups)
            out = grouped.agg(*aggs)
        else:
            out = base._sdf.agg(*aggs)
        # min/max/first/last over a tz/precision-stamped column keep the
        # dtype (the reference keeps the series dtype through value-
        # preserving aggregates) — same Expr-tree inference as mutate
        for n, m in base._mutate_meta_stamps(
            {n: e for n, e in meta_source.items() if isinstance(e, Expr)}
        ).items():
            if n in out.columns:
                out = out.withMetadata(n, m)
        # not aligned: the hash aggregation shuffled; ORDER_COL carries
        # the first-appearance order, the physical layout doesn't
        return DataFrame(out, groups=[], has_order=stable_groups)

    summarise = summarise_with

    def group_by(self, *selectors, stable: bool | None = None, mode: str = "groups") -> "DataFrame":
        """Group metadata for subsequent verbs. ``stable`` defaults to
        False like the reference (data_frame.ex:5881 — "by default groups
        may be reordered for performance"): an unstable grouped summarise
        skips the first-appearance min(ORDER_COL) agg AND the
        materialization sort; pass ``stable=True`` for the reference's
        :stable first-appearance group order. ``mode`` extends the
        reference surface with Spark-native multi-dimensional
        aggregation: "cube" / "rollup" make the NEXT summarise aggregate
        over all cube/rollup grouping sets (null = the rolled-up level,
        Spark semantics); every other grouped verb ignores the mode and
        treats the frame as plainly grouped."""
        if mode not in ("groups", "cube", "rollup"):
            raise ValueError(f"mode must be 'groups', 'cube' or 'rollup', got {mode!r}")
        # reference stable resolution (data_frame.ex:5973): unspecified
        # inherits the existing flag (false on a fresh frame); an
        # explicit flag that CHANGES an existing grouping raises
        if self.groups:
            if stable is not None and stable != self._group_stable:
                # reference grouped_test.exs 'groups with different
                # stable flag raise error'
                raise ValueError(
                    "`stable` flag can't be changed after the first `group_by`; "
                    "ungroup first to regroup with a different flag"
                )
            stable = self._group_stable
        elif stable is None:
            stable = False
        cols = []
        for s in selectors:
            got = self._resolve(s)
            # a plain string that is neither a column nor a matching
            # regex must raise (reference group_by/2 'could not find
            # column name'), never silently group by nothing
            if isinstance(s, str) and not got:
                raise KeyError(f"could not find column name {s!r}; available: {self.names}")
            cols.extend(got)
        out = self._replace(self._sdf, groups=list(dict.fromkeys(self.groups + cols)))
        out._group_mode = mode
        out._group_stable = stable
        # r12: grouping is METADATA-ONLY (same plan, same rows, same
        # order) — carry the order/cost hints through, or the grouped
        # sort's expensive-upstream pin and probe-skip (r11 #3) never
        # fire on the sort_by().group_by().sort_by() shape and each index
        # kernel re-executes the upstream global sort just to probe it
        self._copy_order_hints(out)
        return out

    def cube(self, *selectors) -> "DataFrame":
        """Spark-native CUBE: summarise aggregates over every subset of
        the group columns (additive over the reference, like streaming)."""
        return self.group_by(*selectors, mode="cube")

    def rollup(self, *selectors) -> "DataFrame":
        """Spark-native ROLLUP: summarise aggregates over each prefix of
        the group columns."""
        return self.group_by(*selectors, mode="rollup")

    def _copy_order_hints(self, out: "DataFrame") -> None:
        """Carry order/cost metadata onto a frame built from the SAME
        plan with the SAME row order (group_by/ungroup): physical
        alignment, the expensive-order probe guard, the exact row count,
        and order-column density are plan properties, not grouping
        properties."""
        out._aligned = self._aligned
        for attr in ("_expensive_order", "_row_count_hint", "_order_dense"):
            if getattr(self, attr, None) is not None:
                setattr(out, attr, getattr(self, attr))

    def ungroup(self, *selectors) -> "DataFrame":
        if not selectors:
            out = self._replace(self._sdf, groups=[])
            self._copy_order_hints(out)
            return out
        drop = set()
        for s in selectors:
            drop |= set(self._resolve(s))
        # resolved names must be CURRENT groups (reference ungroup/2
        # raises 'could not find <col> in current groups'); note ranges
        # index df.names, not df.groups — same as the reference
        missing = [c for c in drop if c not in self.groups]
        if missing:
            raise KeyError(
                f"could not find {missing} in current groups ({self.groups})"
            )
        out = self._replace(self._sdf, groups=[g for g in self.groups if g not in drop])
        self._copy_order_hints(out)
        return out

    # ------------------------------------------------------------------
    # sorting / distinct / sampling
    # ------------------------------------------------------------------
    def sort_by(self, *keys, descending=False, nils_last: bool = True, stable: bool = False) -> "DataFrame":
        """Multi-key sort; expression keys allowed; grouped frame sorts
        within groups (reference data_frame.ex:3468-3682).

        The sort itself is Spark's distributed range-partitioned sort; the
        resulting order is then captured into the hidden order column so
        later order-dependent verbs see it.
        """
        if isinstance(descending, bool):
            descending = [descending] * len(keys)
        base = self._ordered() if (stable or self.groups) else self
        ctx = base._ctx()
        sdf = base._sdf
        exprs: list[Column] = []
        tmp_keys: list[str] = []
        for i, (k, desc) in enumerate(zip(keys, descending)):
            if isinstance(k, Expr):
                # materialize computed keys: Spark refuses window/agg
                # expressions directly inside a Sort operator, and the
                # reference sorts by window keys (lazy_test.exs:768)
                name = f"__sk_{i}__"
                sdf = sdf.withColumn(name, k.lower(ctx))
                tmp_keys.append(name)
                c = F.col(name)
            else:
                c = F.col(k)
            if desc:
                exprs.append(c.desc_nulls_last() if nils_last else c.desc_nulls_first())
            else:
                exprs.append(c.asc_nulls_last() if nils_last else c.asc_nulls_first())
        if self.groups:
            # grouped sort = a within-group PERMUTATION that keeps each
            # group's original row positions (reference lazy_test.exs:780
            # — polars window-sort; groups need not be contiguous).
            # Rendered scale-first: two global-index range sorts over
            # (groups, original order) and (groups, keys). Group sizes are
            # identical in both, so each group occupies the SAME dense
            # index range; the equi-join on that index hands the i-th
            # original position to the i-th key-sorted row. No per-group
            # window, so a giant group never single-partitions.
            from .operators.ordered import with_global_index

            gcols = [F.col(g).asc_nulls_first() for g in self.groups]
            # forward the upstream probe hints: a limit-probe over a plan
            # already containing a global sort would execute it just to
            # count (the ungrouped branch sets _expensive_order for the
            # same reason)
            skip = getattr(base, "_expensive_order", False)
            hint = getattr(self, "_row_count_hint", None)
            dense_in = getattr(self, "_order_dense", False)
            # r11 optimization: BOTH index kernels below consume this
            # frame (and each checkpoints its own range-sorted copy), so
            # an expensive upstream — one already containing a global
            # sort (_expensive_order) — would execute twice; pin it once.
            # A cheap upstream (fresh aligned scan) stays unpinned:
            # re-scanning twice beats materializing the whole frame.
            # r12: when the upstream is ALIGNED by ORDER_COL (the direct
            # output of an ungrouped sort), the pin doubles as a DENSE
            # re-index: with_global_index(aligned=True) skips the range
            # shuffle, and its one stats job (which the pin's
            # materialization pays for anyway) rewrites ORDER_COL to the
            # contiguous 0..n-1 position. The grouped permutation below
            # hands those values around unchanged, so the output's
            # ORDER_COL stays dense — an immediately following
            # row_index() materializes it directly instead of running a
            # third range-shuffle/checkpoint/stats kernel, and both
            # kernels get the exact row count as their bucket hint.
            if skip:
                from .operators.ordered import SMALL_INDEX_MAX as _SIM

                if base._aligned and not dense_in and (hint is None or hint > _SIM):
                    from .operators.ordered import with_global_index as _wgi

                    st: dict = {}
                    sdf = _wgi(
                        sdf,
                        [F.col(ORDER_COL).asc()],
                        name="__dord__",
                        aligned=True,
                        stats_out=st,
                        n_hint=hint,
                        skip_probe=True,
                    )
                    sdf = sdf.drop(ORDER_COL).withColumnRenamed("__dord__", ORDER_COL)
                    hint = st.get("n", hint)
                    dense_in = True
                else:
                    sdf = sdf.localCheckpoint(eager=False)
            # the position kernel needs only (groups, ORDER_COL): project
            # before its range shuffle + checkpoint so the payload
            # columns don't ride through them (guide §2.3)
            pos_src = sdf.select(*dict.fromkeys(list(self.groups) + [ORDER_COL]))
            pos = with_global_index(
                pos_src, gcols + [F.col(ORDER_COL).asc()], name="__r1__",
                n_hint=hint, skip_probe=skip,
            )
            pos = pos.select(F.col("__r1__"), F.col(ORDER_COL).alias("__new_ord__"))
            rows = with_global_index(
                sdf, gcols + exprs + [F.col(ORDER_COL).asc()], name="__r2__",
                n_hint=hint, skip_probe=skip,
            ).drop(ORDER_COL, *tmp_keys)
            out = (
                rows.join(pos, rows["__r2__"] == pos["__r1__"], "inner")
                .drop("__r1__", "__r2__")
                .withColumnRenamed("__new_ord__", ORDER_COL)
            )
            res = base._replace(out, has_order=True, aligned=False)
            # the result's plan embeds two range sorts + a join: later
            # index kernels must not limit-probe it
            res._expensive_order = True
            res._row_count_hint = hint
            # the permutation hands ORDER_COL values around unchanged, so
            # density survives it (see the dense re-index above)
            res._order_dense = dense_in
            return res
        if stable and base._has_order:
            exprs.append(F.col(ORDER_COL).asc())
        out = sdf.orderBy(*exprs).drop(ORDER_COL, *tmp_keys)
        out = out.withColumn(ORDER_COL, F.monotonically_increasing_id())
        res = base._replace(out, has_order=True, aligned=True)
        # the plan now contains a global sort: a small/large limit-probe on
        # it would execute the sort just to count — downstream index
        # kernels skip the probe and take n from their own stats job
        res._expensive_order = True
        res._row_count_hint = getattr(self, "_row_count_hint", None)
        # r11 optimization: an IMMEDIATELY following head(n) can fold the
        # sort+limit into one TakeOrderedAndProject instead of a full
        # global sort followed by a second sort+limit. _replace builds a
        # fresh object, so the attribute dies at the next verb — the
        # pushdown can never fire on a frame the sort no longer describes.
        # (Tie order at the cut differs only for non-total sort keys,
        # where the reference leaves row order unspecified anyway.)
        res._take_ordered = (sdf, list(exprs), list(tmp_keys))
        return res

    sort = sort_by
    arrange = sort_by

    def sort_with(self, fn, nils_last: bool = True, stable: bool = False) -> "DataFrame":
        """Callback sort (reference sort_with/arrange_with,
        data_frame.ex:3472-3572): the callback receives the LAZY frame
        (``ldf["a"]`` yields a column expression) and returns a key, a
        list of keys, or ("asc"|"desc", key) pairs; keys are column
        names or expressions."""
        spec = fn(self._lazy_accessor())
        if not isinstance(spec, list):
            spec = [spec]
        keys, desc = [], []
        for item in spec:
            if isinstance(item, tuple) and len(item) == 2 and item[0] in ("asc", "desc"):
                keys.append(item[1])
                desc.append(item[0] == "desc")
            else:
                keys.append(item)
                desc.append(False)
        return self.sort_by(*keys, descending=desc, nils_last=nils_last, stable=stable)

    arrange_with = sort_with

    def to_lazy(self) -> "DataFrame":
        """No-op: every frame here is already a lazy Catalyst plan
        (reference to_lazy/lazy)."""
        return self

    lazy = to_lazy

    def distinct(self, selector=None, keep_all: bool = False) -> "DataFrame":
        """De-dup on subset, keeping the FIRST occurrence
        (reference lazyframe.rs:220-232 UniqueKeepStrategy::First).
        On a grouped frame the group columns prepend to the subset
        (reference data_frame.ex:3672 'groups will be added')."""
        subset = self._resolve(selector) if selector is not None else self.names
        if self.groups and selector is not None:
            subset = list(dict.fromkeys(self.groups + subset))
        if not keep_all and set(subset) == set(self.names) and not self._has_order:
            return self._replace(self._sdf.dropDuplicates(), has_order=False)
        base = self._ordered()
        w = W.partitionBy(*subset).orderBy(F.col(ORDER_COL).asc())
        out = base._sdf.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1).drop("__rn__")
        if not keep_all:
            out = out.select(*subset, ORDER_COL)
        return base._replace(out)

    def unordered_distinct(self, selector=None) -> "DataFrame":
        subset = self._resolve(selector) if selector is not None else self.names
        return DataFrame(self._sdf.select(*subset).dropDuplicates(), groups=self.groups, has_order=False)

    def n_distinct(self, selector=None) -> int:
        subset = self._resolve(selector) if selector is not None else self.names
        return self._sdf.select(*subset).dropDuplicates().count()

    def drop_nil(self, selector=None) -> "DataFrame":
        subset = self._resolve(selector) if selector is not None else self.names
        return self._replace(self._sdf.dropna(subset=subset))

    def sample(self, n_or_frac, replace: bool = False, seed: int | None = None, shuffle: bool = False) -> "DataFrame":
        """n or fraction sampling with seed (reference data_frame.ex:4475-4540).
        Grouped frame samples per group (polars_backend/data_frame.ex:779-796):
        n rows (or floor(frac*len)) from each group, one hash shuffle on the
        group keys."""
        if self.groups and replace:
            return self._sample_replace_grouped(n_or_frac, seed, shuffle)
        if self.groups:
            # without replacement a request larger than ANY group raises
            # (reference grouped_test.exs 'sample more than the size from
            # each group without replacement' — polars' population error);
            # one map-side-combined count probe
            if isinstance(n_or_frac, float) and n_or_frac > 1.0:
                raise ValueError(
                    "cannot take a larger sample than the total population "
                    "of a group unless `replace` is true"
                )
            if not isinstance(n_or_frac, float):
                mn_row = (
                    self._sdf.groupBy(*self.groups)
                    .agg(F.count(F.lit(1)).alias("__c__"))
                    .agg(F.min("__c__").alias("__m__"))
                    .first()
                )
                if mn_row and mn_row["__m__"] is not None and n_or_frac > mn_row["__m__"]:
                    raise ValueError(
                        "cannot take a larger sample than the total population "
                        f"of a group ({mn_row['__m__']}) unless `replace` is true"
                    )
            base = self._ordered()
            w = W.partitionBy(*self.groups).orderBy(F.rand(seed))
            sdf = base._sdf.withColumn("__rn__", F.row_number().over(w))
            if isinstance(n_or_frac, float):
                wc = W.partitionBy(*self.groups)
                sdf = sdf.withColumn("__gn__", F.count(F.lit(1)).over(wc))
                out = sdf.filter(F.col("__rn__") <= F.floor(F.col("__gn__") * n_or_frac)).drop("__rn__", "__gn__")
            else:
                out = sdf.filter(F.col("__rn__") <= n_or_frac).drop("__rn__")
            if not shuffle:
                out = out.orderBy(F.col(ORDER_COL).asc())
            else:
                out = out.orderBy(F.rand(seed))
            out = out.drop(ORDER_COL).withColumn(ORDER_COL, F.monotonically_increasing_id())
            return DataFrame(out, groups=self.groups, has_order=True, aligned=True, group_stable=self._group_stable)
        if not replace:
            # reference semantics (series_test.exs:3822-3895): fractions
            # take EXACTLY floor(frac*n) rows; over-sampling requires
            # replace=true; shuffle=False keeps the FRAME order of the
            # picked rows (shuffle=True leaves them in pick order)
            total = self._sdf.count()
            if isinstance(n_or_frac, float):
                if n_or_frac > 1.0:
                    raise ValueError(
                        "in order to sample more elements than are in the frame "
                        f"({total}), sampling `replace` must be true"
                    )
                n = int(n_or_frac * total)
            else:
                n = n_or_frac
                if n > total:
                    raise ValueError(
                        f"in order to sample more elements than are in the frame ({total}), "
                        "sampling `replace` must be true"
                    )
            if n <= SAMPLE_TAKEORDERED_MAX:
                # small n: rand + TakeOrdered — the single collecting task
                # holds only n rows (same bound every top-k accepts)
                base = self._ordered()
                picked = (
                    base._sdf.withColumn("__r__", F.rand(seed)).orderBy("__r__").limit(n).drop("__r__")
                )
                if not shuffle:
                    picked = picked.orderBy(F.col(ORDER_COL).asc())
                out = picked.drop(ORDER_COL)
            else:
                # large n (frac-scale): fully distributed (VERDICT r5 #3).
                # Every row gets a deterministic 60-bit draw
                # u = hash(seed, pos) and the n smallest u win — the exact
                # nth-smallest u comes from the probe-count selection
                # kernel (operators/ordered.py uniform_select: batched
                # conditional-count scans, zero shuffles, counts-only to
                # the driver), so the selection is a plain codegen filter:
                # no TakeOrdered funneling the whole sample through ONE
                # task and no shuffle anywhere. The index kernel pins its
                # output, so recomputing u per probe round is hash work
                # over a pinned base, not a rescan.
                from .operators.ordered import uniform_select

                seed = _resolve_seed(seed)
                idxed = self._with_row_index("__pos__")
                # the kernel's stats job knows the exact pinned row count:
                # derive frac-sizes from THAT materialization, not the
                # earlier probe count (a nondeterministic upstream could
                # disagree between the two evaluations)
                total = _known_count(idxed)
                if isinstance(n_or_frac, float):
                    n = int(n_or_frac * total)
                sdf_u = idxed._sdf.withColumn(
                    "__u__", _hash_draw([F.lit(str(seed)), F.col("__pos__").cast("string")])
                )
                t, below, at = uniform_select(sdf_u, "__u__", n, total, 1 << 60)
                if below + at == n:
                    picked = sdf_u.filter(F.col("__u__") <= F.lit(t))
                else:
                    # md5 collision AT the threshold (≈ n²/2^61 odds):
                    # keep everything strictly below plus the
                    # smallest-position ties — the limit scans only the
                    # collided rows, never the sample
                    ties = (
                        sdf_u.filter(F.col("__u__") == F.lit(t))
                        .orderBy(F.col("__pos__").asc())
                        .limit(n - below)
                    )
                    picked = sdf_u.filter(F.col("__u__") < F.lit(t)).unionByName(ties)
                picked = picked.orderBy(F.col("__u__" if shuffle else "__pos__").asc())
                out = picked.drop("__u__", "__pos__", ORDER_COL)
        else:
            # EXACT n-with-replacement (reference sample_n semantics —
            # always exactly n rows, unlike Spark's Poisson .sample which
            # is probabilistic): draw positions DETERMINISTICALLY as
            # hash(seed, i) % total for i in 0..n-1 (md5 prefix — a
            # uniform seeded stream any engine reproduces), aggregate to
            # (pos, multiplicity), broadcast-join on the row index,
            # sequence-explode. Fully distributed: no driver-side draw
            # state, so sample size is unbounded by driver memory.
            total = self._sdf.count()
            want = n_or_frac if isinstance(n_or_frac, int) else int(n_or_frac * total)
            if total == 0 and want > 0:
                raise ValueError("cannot sample with replace=true from an empty frame")
            seed = _resolve_seed(seed)
            idxed = self._with_row_index("__pos__")
            spark = idxed._sdf.sparkSession
            draws = spark.range(want).select(
                (_hash_draw([F.lit(str(seed)), F.col("id").cast("string")]) % total).alias("__pos__")
            )
            mult = draws.groupBy("__pos__").agg(F.count(F.lit(1)).alias("__mult__"))
            # no broadcast HINT: the multiplicity table is O(min(n, total))
            # rows — AQE broadcasts it when small and shuffle-joins when a
            # frac-scale sample makes it huge (forcing broadcast would cap
            # sample size at the driver/broadcast limits)
            picked = idxed._sdf.join(mult, "__pos__", "inner")
            out = (
                picked.withColumn("__dup__", F.explode(F.sequence(F.lit(1), F.col("__mult__"))))
                .drop("__mult__", "__dup__", "__pos__")
            )
            if shuffle:
                out = out.withColumn("__r__", F.rand(seed)).orderBy("__r__").drop("__r__")
            else:
                out = out.orderBy(F.col(ORDER_COL).asc())
            out = out.drop(ORDER_COL)
        out = out.withColumn(ORDER_COL, F.monotonically_increasing_id())
        return DataFrame(out, groups=self.groups, has_order=True, aligned=True, group_stable=self._group_stable)

    def _sample_replace_grouped(self, n_or_frac, seed, shuffle) -> "DataFrame":
        """Grouped sample WITH replacement (reference data_frame.ex:4475-4540
        supports replace: true on grouped frames): per-group sizes come
        from one aggregate, each group's draw i is the deterministic
        hash(seed, group, i) % group_len (md5 prefix), and the picks
        resolve via a broadcast (group, pos-in-group, multiplicity) join
        against a per-group row_number. Exactly n (or
        floor(frac*group_len)) rows per group, always — and the whole
        pipeline is distributed: draws never touch the driver."""
        base = self._ordered()
        gcols = list(self.groups)
        seed = _resolve_seed(seed)
        sizes = base._sdf.groupBy(*gcols).agg(F.count(F.lit(1)).alias("__gn__"))
        if isinstance(n_or_frac, int):
            want = F.lit(n_or_frac)
        else:
            want = F.floor(F.col("__gn__") * F.lit(n_or_frac)).cast("int")
        idx_arr = F.when(want > 0, F.sequence(F.lit(0), want - 1)).otherwise(
            F.array().cast("array<int>")
        )
        draws = sizes.select(*gcols, "__gn__", F.explode(idx_arr).alias("__i__"))
        h = _hash_draw(
            [F.lit(str(seed))]
            + [F.col(g).cast("string") for g in gcols]
            + [F.col("__i__").cast("string")]
        )
        mult = (
            draws.select(*gcols, (h % F.col("__gn__")).alias("__gp2__"))
            .groupBy(*gcols, "__gp2__")
            .agg(F.count(F.lit(1)).alias("__mult__"))
        )
        mult = mult.select(
            *[F.col(g).alias(f"__mg{i}__") for i, g in enumerate(gcols)], "__gp2__", "__mult__"
        )
        w = W.partitionBy(*gcols).orderBy(F.col(ORDER_COL).asc())
        sdf = base._sdf.withColumn("__gp__", F.row_number().over(w) - 1)
        cond = F.col("__gp__") == F.col("__gp2__")
        for i, g in enumerate(gcols):
            cond = cond & sdf[g].eqNullSafe(F.col(f"__mg{i}__"))  # null group keys are groups too
        # no broadcast hint — AQE decides (see the ungrouped branch)
        out = sdf.join(mult, cond, "inner").drop(
            "__gp__", "__gp2__", *[f"__mg{i}__" for i in range(len(gcols))]
        )
        out = out.withColumn("__dup__", F.explode(F.sequence(F.lit(1), F.col("__mult__")))).drop(
            "__mult__", "__dup__"
        )
        if shuffle:
            out = out.orderBy(F.rand(seed))
        else:
            out = out.orderBy(F.col(ORDER_COL).asc())
        out = out.drop(ORDER_COL).withColumn(ORDER_COL, F.monotonically_increasing_id())
        return DataFrame(out, groups=self.groups, has_order=True, aligned=True, group_stable=self._group_stable)

    def shuffle(self, seed: int | None = None) -> "DataFrame":
        out = self.lazy_sdf().withColumn("__r__", F.rand(seed)).orderBy("__r__").drop("__r__")
        return DataFrame(out.withColumn(ORDER_COL, F.monotonically_increasing_id()), self.groups, True, aligned=True, group_stable=self._group_stable)

    # ------------------------------------------------------------------
    # positional row selection (ordered semantics)
    # ------------------------------------------------------------------
    def _with_row_index(self, name: str = "__idx__", total_col: str | None = None) -> "DataFrame":
        """Contiguous 0-based row index in ORDER_COL order, built by the
        scalable per-partition-offset pattern (operators/ordered.py).
        When the physical layout no longer matches ORDER_COL (after a
        join or any other shuffle) the kernel re-aligns with one range
        shuffle first — partition ids never silently disagree with the
        row order. ``total_col`` attaches the total row count for free."""
        from .operators.ordered import with_global_index

        base = self._ordered()
        if getattr(self, "_order_dense", False):
            # ORDER_COL is already the contiguous 0-based index (set
            # one-shot by pivot_longer): materialize it directly — no
            # range shuffle, no checkpoint, no stats job. Alignment is
            # whatever it was; the index is a VALUE, not a layout.
            hint = getattr(self, "_row_count_hint", None)
            sdf = base._sdf.withColumn(name, F.col(ORDER_COL).cast("long"))
            if total_col is not None:
                n_total = hint if hint is not None else base._sdf.count()
                sdf = sdf.withColumn(total_col, F.lit(int(n_total)).cast("long"))
            out = base._replace(sdf, aligned=base._aligned)
            out._row_count_hint = hint
            out._order_dense = True
            return out
        stats: dict = {}
        sdf = with_global_index(
            base._sdf,
            [F.col(ORDER_COL).asc()],
            name=name,
            aligned=base._aligned,
            total_col=total_col,
            stats_out=stats,
            n_hint=getattr(self, "_row_count_hint", None),
            skip_probe=getattr(self, "_expensive_order", False),
        )
        out = base._replace(sdf, aligned=True)
        # exact row count, known for free from the index stats job — the
        # bucketed kernels use it to size their buckets adaptively
        out._row_count_hint = stats.get("n")
        return out

    def head(self, n: int = 5) -> "DataFrame":
        if self.groups:
            return self._group_head(n, tail=False)
        to = getattr(self, "_take_ordered", None)
        if to is not None:
            # set by an immediately preceding ungrouped sort_by: fold
            # sort+limit into one TakeOrderedAndProject (top-k heap, no
            # full global sort). limit(n) yields one partition, so the
            # fresh mono id is 0..n-1 in sorted order.
            src, exprs, tmp_keys = to
            out = (
                src.orderBy(*exprs)
                .limit(n)
                .drop(ORDER_COL, *tmp_keys)
                .withColumn(ORDER_COL, F.monotonically_increasing_id())
            )
            return self._replace(out, has_order=True, aligned=True)
        base = self._ordered()
        return base._replace(base._sdf.orderBy(F.col(ORDER_COL).asc()).limit(n))

    def tail(self, n: int = 5) -> "DataFrame":
        if self.groups:
            return self._group_head(n, tail=True)
        base = self._ordered()
        out = base._sdf.orderBy(F.col(ORDER_COL).desc()).limit(n).orderBy(F.col(ORDER_COL).asc())
        return base._replace(out)

    def _group_head(self, n: int, tail: bool) -> "DataFrame":
        base = self._ordered()
        key = F.col(ORDER_COL).desc() if tail else F.col(ORDER_COL).asc()
        w = W.partitionBy(*self.groups).orderBy(key)
        out = base._sdf.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") <= n).drop("__rn__")
        return base._replace(out)

    def slice(self, offset_or_indices, length: int | None = None) -> "DataFrame":
        """Positional row selection (reference data_frame.ex:4238-4372);
        grouped frame slices within each group."""
        if isinstance(offset_or_indices, int) and length is not None:
            offset = offset_or_indices
            if self.groups:
                base = self._ordered()
                w = W.partitionBy(*self.groups).orderBy(F.col(ORDER_COL).asc())
                sdf = base._sdf.withColumn("__rn__", F.row_number().over(w) - 1)
                if offset >= 0:
                    cond = (F.col("__rn__") >= offset) & (F.col("__rn__") < offset + length)
                else:
                    cnt = F.count(F.lit(1)).over(W.partitionBy(*self.groups))
                    sdf = sdf.withColumn("__cnt__", cnt)
                    cond = (F.col("__rn__") >= F.col("__cnt__") + offset) & (
                        F.col("__rn__") < F.col("__cnt__") + offset + length
                    )
                return base._replace(sdf.filter(cond).drop("__rn__", "__cnt__"))
            # native offset+limit (Catalyst CollectLimit) when the slice end
            # is close to the frame edge — no index kernel, no checkpoint.
            # Large interior offsets still go through the distributed index:
            # GlobalLimit funnels offset+length rows into one task.
            NATIVE_SLICE_MAX = 1 << 20
            if 0 <= offset and offset + length <= NATIVE_SLICE_MAX:
                base = self._ordered()
                out = base._sdf.orderBy(F.col(ORDER_COL).asc()).offset(offset).limit(length)
                return base._replace(out)
            if offset < 0 and -offset <= NATIVE_SLICE_MAX:
                # rows [total+offset, total+offset+length): reverse order,
                # take [max(0,-offset-length), -offset) there, restore order
                base = self._ordered()
                rev_off = max(0, -offset - length)
                take = min(length, -offset)
                out = (
                    base._sdf.orderBy(F.col(ORDER_COL).desc())
                    .offset(rev_off)
                    .limit(take)
                    .orderBy(F.col(ORDER_COL).asc())
                )
                return base._replace(out)
            if offset < 0:
                # resolve the offset against the total inside one plan (the
                # total rides along from the index kernel's broadcast table)
                idxed = self._with_row_index("__idx__", total_col="__tot__")
                start = F.col("__tot__") + offset
                out = idxed._sdf.filter((F.col("__idx__") >= start) & (F.col("__idx__") < start + length))
                return idxed._replace(out.drop("__idx__", "__tot__"), aligned=True)
            idxed = self._with_row_index("__idx__")
            out = idxed._sdf.filter((F.col("__idx__") >= offset) & (F.col("__idx__") < offset + length))
            return idxed._replace(out.drop("__idx__"), aligned=True)
        indices = list(offset_or_indices) if not isinstance(offset_or_indices, range) else list(offset_or_indices)
        nonneg = [i for i in indices if i >= 0]
        negs = [i for i in indices if i < 0]  # resolved against the total/group size
        if self.groups:
            # grouped: keep rows at the given per-group positions, in
            # frame order (each group contributes each position once)
            base = self._ordered()
            w = W.partitionBy(*self.groups).orderBy(F.col(ORDER_COL).asc())
            sdf = base._sdf.withColumn("__rn__", F.row_number().over(w) - 1)
            cond = F.col("__rn__").isin(nonneg) if nonneg else F.lit(False)
            if negs:
                cnt = F.count(F.lit(1)).over(W.partitionBy(*self.groups))
                sdf = sdf.withColumn("__cnt__", cnt)
                cond = cond | (F.col("__rn__") - F.col("__cnt__")).isin(negs)
            return base._replace(sdf.filter(cond).drop("__rn__", "__cnt__"))
        # ungrouped take: output follows the CALLER's index order and
        # keeps duplicates (reference/Polars take semantics) — a literal
        # (position, index) table joined on the row index, row order
        # rewritten from the selection position
        idxed = self._with_row_index("__idx__", total_col="__tot__" if negs else None)
        # EAGER bounds check (reference raises 'requested row index (i)
        # out of bounds (-n:n)'); the count is free from the index kernel
        n_total = _known_count(idxed)
        bad = [i for i in indices if i >= n_total or i < -n_total]
        if bad:
            raise IndexError(
                f"requested row index ({bad[0]}) out of bounds (-{n_total}:{n_total})"
            )
        spark = idxed._sdf.sparkSession
        sel = spark.createDataFrame(
            [(p, int(i)) for p, i in enumerate(indices)], "__pos__ long, __sel__ long"
        )
        tgt = F.col("__sel__") if not negs else F.when(
            F.col("__sel__") >= 0, F.col("__sel__")
        ).otherwise(F.col("__sel__") + F.col("__tot__"))
        out = idxed._sdf.join(F.broadcast(sel), F.col("__idx__") == tgt)
        out = out.withColumn(ORDER_COL, F.col("__pos__")).drop(
            "__idx__", "__tot__", "__pos__", "__sel__"
        )
        return idxed._replace(out, aligned=False)

    def at_every(self, n: int) -> "DataFrame":
        idxed = self._with_row_index("__idx__")
        return idxed._replace(idxed._sdf.filter(F.col("__idx__") % n == 0).drop("__idx__"), aligned=True)

    # ------------------------------------------------------------------
    # joins & combinators (reference data_frame.ex:5137-5869)
    # ------------------------------------------------------------------
    def join(
        self,
        other: "DataFrame",
        on=None,
        how: str = "inner",
        suffix: str = "_right",
        nulls_equal: bool = False,
        broadcast: bool = False,
    ) -> "DataFrame":
        """Equi-join with the reference's column rules: default ``on`` =
        overlapping names; colliding non-key right columns get ``suffix``;
        ``outer`` keeps both key columns (right one suffixed); ``right``
        orders right columns first (reference data_frame.ex:5333-5563,
        lazy_frame.ex:580-618).

        Physical strategy (broadcast/shuffled-hash/sort-merge) is left to
        Catalyst + AQE; pass ``broadcast=True`` to hint a small right side.
        """
        if how not in ("inner", "left", "right", "outer", "cross"):
            raise ValueError(
                f"join type is not valid: {how!r}. "
                "Valid options are: inner, left, right, outer, cross"
            )
        if how == "cross":
            on_pairs = []
        else:
            if on is None:
                shared = [c for c in self.names if c in set(other.names)]
                if not shared:
                    raise ValueError("could not find any overlapping columns")
                on_pairs = [(c, c) for c in shared]
            elif isinstance(on, str):
                on_pairs = [(on, on)]
            elif isinstance(on, int):
                on_pairs = [self._on_pair_from_index(other, on)]
            elif isinstance(on, Mapping):
                on_pairs = list(on.items())
            else:
                on_pairs = [
                    self._on_pair_from_index(other, p)
                    if isinstance(p, int)
                    else ((p, p) if isinstance(p, str) else tuple(p))
                    for p in on
                ]
        if how == "right":
            # flipped left join (reference out_df_for_join(:right, …):
            # right frame's columns lead with its row order, left key
            # columns drop, colliding left columns get "_left")
            return other.join(
                self,
                on=[(rk, lk) for lk, rk in on_pairs],
                how="left",
                suffix="_left" if suffix == "_right" else suffix,
                nulls_equal=nulls_equal,
            )
        # Order rule: when the LEFT frame carries a row order, ties among
        # a left row's several matches follow the RIGHT frame's order
        # (reference/Polars maintain-order joins; data_frame_test.exs:2424).
        # The re-sort below only happens for frames that already own an
        # ORDER_COL — parquet-scan pipelines never carry one, so the big
        # query path pays no extra exchange.
        keep_order = self._has_order
        left_s = self._sdf if keep_order else self.lazy_sdf()
        if keep_order:
            right_s = other._ordered()._sdf.withColumnRenamed(ORDER_COL, "__rord__")
        else:
            right_s = other.lazy_sdf()
        lkeys = [p[0] for p in on_pairs]
        rkeys = [p[1] for p in on_pairs]
        # rename right columns: keys -> temp, collisions -> suffix
        rmap = {}
        left_names = set(self.names)
        for c in other.names:
            if c in rkeys:
                rmap[c] = f"__rk_{rkeys.index(c)}__"
            elif c in left_names:
                rmap[c] = f"{c}{suffix}"
        right_renamed = right_s
        for old, new in rmap.items():
            right_renamed = right_renamed.withColumnRenamed(old, new)
        if broadcast:
            right_renamed = F.broadcast(right_renamed)
        if how == "cross":
            out = left_s.crossJoin(right_renamed)
            if keep_order:
                out = self._rederive_join_order(out)
                return DataFrame(out, groups=self.groups, has_order=True, aligned=True, group_stable=self._group_stable)
            return DataFrame(out, groups=self.groups, has_order=False, group_stable=self._group_stable)
        eq = (lambda a, b: a.eqNullSafe(b)) if nulls_equal else (lambda a, b: a == b)
        cond = None
        for i, lk in enumerate(lkeys):
            c = eq(left_s[lk], right_renamed[f"__rk_{i}__"])
            cond = c if cond is None else (cond & c)
        joined = left_s.join(right_renamed, cond, "full" if how == "outer" else how)
        if how == "outer":
            # keep both key columns: left name + suffixed right name
            for i, (lk, rk) in enumerate(on_pairs):
                new_name = f"{rk}{suffix}" if rk in left_names else rk
                joined = joined.withColumnRenamed(f"__rk_{i}__", new_name)
            out = joined
            groups = self.groups
        else:
            out = joined.drop(*[f"__rk_{i}__" for i in range(len(on_pairs))])
            groups = self.groups
        if keep_order:
            return DataFrame(
                self._rederive_join_order(out, full=(how == "outer")),
                groups=groups,
                has_order=True,
                aligned=True,
                group_stable=self._group_stable,
            )
        return DataFrame(out, groups=groups, has_order=ORDER_COL in out.columns, group_stable=self._group_stable)

    @staticmethod
    def _rederive_join_order(out: SDF, full: bool = False) -> SDF:
        """Fresh total order for an ordered join result: left order major,
        right order minor (null = unmatched side, kept adjacent). Same
        fresh-mono-id-after-sort idiom as sort_by. A FULL join orders
        matched rows first (left order), then right-only rows (right
        order), then left-only rows (reference outer doctest
        data_frame.ex:5197: a = [1, 2, nil, 3])."""
        if full:
            cat = (
                F.when(F.col(ORDER_COL).isNotNull() & F.col("__rord__").isNotNull(), F.lit(0))
                .when(F.col(ORDER_COL).isNull(), F.lit(1))
                .otherwise(F.lit(2))
            )
            out = out.orderBy(
                cat.asc(),
                F.col(ORDER_COL).asc_nulls_first(),
                F.col("__rord__").asc_nulls_first(),
            ).drop(ORDER_COL, "__rord__")
        else:
            out = out.orderBy(
                F.col(ORDER_COL).asc_nulls_last(), F.col("__rord__").asc_nulls_first()
            ).drop(ORDER_COL, "__rord__")
        return out.withColumn(ORDER_COL, F.monotonically_increasing_id())

    def _on_pair_from_index(self, other: "DataFrame", i: int) -> tuple:
        """``on: <index>`` resolves positionally in BOTH frames and the
        names must agree (reference join/3 'no matching column indexes')."""
        lk, rk = self.names[i], other.names[i]
        if lk != rk:
            raise ValueError("the column given to option `:on` is not the same for both dataframes")
        return (lk, rk)

    def join_asof(
        self,
        other: "DataFrame",
        on: str | None = None,
        by: list[str] | None = None,
        strategy: str = "backward",
        suffix: str = "_right",
        tolerance=None,
    ) -> "DataFrame":
        """Nearest-key join (reference data_frame.ex:5566-5690; Polars
        AsOfOptions lazyframe.rs:371-427 — tolerance is a TODO there;
        here it follows pandas merge_asof: matches farther than
        ``tolerance`` are dropped to null. ``tolerance`` is a number in
        key units (µs for timestamps, days for dates) or a
        datetime.timedelta for temporal keys).

        Spark has no native as-of join; with ``by`` keys this compiles to
        an equi-join on the keys + range filter + per-left-row top-1
        window (shuffle bounded by key cardinality). Without ``by`` it
        runs the distributed merge-asof kernel (operators/asof.py): one
        range shuffle co-locating both sides by key, bounded boundary
        carries, one pandas pass per partition — never a quadratic range
        join.
        """
        assert strategy in ("backward", "forward", "nearest")
        by = list(by or [])
        if on is None:
            # default `on` = the single overlapping column (reference
            # join_asof/3, lazy_test.exs:1472-1490)
            overlap = [c for c in self.names if c in set(other.names)]
            if not overlap:
                raise ValueError(
                    "could not find any overlapping columns for join_asof"
                )
            if len(overlap) > 1:
                raise ValueError(
                    "multiple columns for option `:on` is not supported for join_asof"
                )
            on = overlap[0]
        tolerance = self._asof_tolerance(tolerance, self.dtypes.get(on))
        if not by:
            return self._asof_merge(other, on, strategy, suffix, tolerance)
        # merge-sorted rendering: union both sides tagged, ONE hash
        # exchange on the by-keys, and carry the nearest right row to each
        # left row with last(ignorenulls) over a (key, side) sort — shuffle
        # size O(|L|+|R|), no per-key pair blowup, no per-left-row window
        # (the former equi-join + top-1 design materialized |L_k|x|R_k|
        # pairs per key; fatal for keys with many right rows at scale).
        left = self._ordered()
        lsdf = left._sdf
        rsdf = other.lazy_sdf()
        # suffix right collisions; right by-keys take the LEFT names so the
        # union aligns them; the right on-key becomes payload __rk__
        rmap = {}
        left_names = set(self.names)
        for c in [c for c in rsdf.columns]:
            if c == on:
                rmap[c] = "__rk__"
            elif c in by:
                continue
            elif c in left_names or c == ORDER_COL:
                rmap[c] = f"{c}{suffix}"
        for old, new in rmap.items():
            rsdf = rsdf.withColumnRenamed(old, new)
        rpay_cols = [c for c in rsdf.columns if c not in by]  # incl. __rk__
        lu = lsdf.withColumn("__k__", F.col(on)).withColumn("__side__", F.lit(0))
        ru = rsdf.withColumn("__k__", F.col("__rk__")).withColumn("__side__", F.lit(1))
        u = lu.unionByName(ru, allowMissingColumns=True)
        rstruct = F.when(
            (F.col("__side__") == 1) & F.col("__k__").isNotNull(),
            F.struct(*[F.col(c).alias(c) for c in rpay_cols]),
        )
        # at an equal key the right row sorts before the left row (side
        # desc), so backward/forward are inclusive; duplicate right keys
        # resolve to the LAST right occurrence (right order ascending)
        rord = F.col(f"{ORDER_COL}{suffix}") if f"{ORDER_COL}{suffix}" in rsdf.columns else F.lit(0)
        picks = {}
        if strategy in ("backward", "nearest"):
            wb = (
                W.partitionBy(*by)
                .orderBy(F.col("__k__").asc(), F.col("__side__").desc(), rord.asc_nulls_last())
                .rowsBetween(W.unboundedPreceding, 0)
            )
            picks["b"] = F.last(rstruct, ignorenulls=True).over(wb)
        if strategy in ("forward", "nearest"):
            wf = (
                W.partitionBy(*by)
                .orderBy(F.col("__k__").desc(), F.col("__side__").desc(), rord.asc_nulls_last())
                .rowsBetween(W.unboundedPreceding, 0)
            )
            picks["f"] = F.last(rstruct, ignorenulls=True).over(wf)
        u = u.withColumns({f"__pick_{k}__": v for k, v in picks.items()})
        out = u.filter(F.col("__side__") == 0)
        lnum = self._asof_numeric(F.col(on), self.dtypes.get(on))
        if strategy == "nearest":
            bnum = self._asof_numeric(F.col("__pick_b__.__rk__"), other.dtypes.get(on))
            fnum = self._asof_numeric(F.col("__pick_f__.__rk__"), other.dtypes.get(on))
            db, df_ = F.abs(lnum - bnum), F.abs(fnum - lnum)
            # equidistant ties resolve toward the EARLIER right key
            use_b = F.when(F.col("__pick_f__").isNull(), F.lit(True)).otherwise(
                F.col("__pick_b__").isNotNull() & (db <= df_)
            )
            pick = F.when(use_b, F.col("__pick_b__")).otherwise(F.col("__pick_f__"))
        else:
            pick = F.col("__pick_b__" if strategy == "backward" else "__pick_f__")
        pick = F.when(F.col(on).isNotNull(), pick)
        if tolerance is not None:
            pnum = self._asof_numeric(pick["__rk__"], other.dtypes.get(on))
            pick = F.when(F.abs(lnum - pnum) <= F.lit(float(tolerance)), pick)
        payload = [c for c in rpay_cols if c not in ("__rk__", f"{ORDER_COL}{suffix}")]
        out = out.withColumns({c: pick[c] for c in payload})
        out = out.drop("__k__", "__side__", "__rk__", f"{ORDER_COL}{suffix}", *[f"__pick_{k}__" for k in picks])
        return DataFrame(out, groups=self.groups, has_order=True, group_stable=self._group_stable)

    def _asof_merge(
        self, other: "DataFrame", on: str, strategy: str, suffix: str, tolerance: float | None = None
    ) -> "DataFrame":
        """Keyless as-of via the range-partitioned merge kernel."""
        from .operators.asof import merge_asof

        left = self._ordered()
        rsdf = other.lazy_sdf()
        left_names = set(self.names)
        for c in list(rsdf.columns):
            if c == on:
                rsdf = rsdf.withColumnRenamed(c, "__rkey__")
            elif c in left_names:
                rsdf = rsdf.withColumnRenamed(c, f"{c}{suffix}")
        ldt = self.dtypes.get(on)

        def key_expr(c):
            return self._asof_numeric(c, ldt)

        out = merge_asof(left._sdf, rsdf, on, key_expr, strategy, tolerance)
        return DataFrame(out, groups=self.groups, has_order=True, group_stable=self._group_stable)

    @staticmethod
    def _asof_tolerance(tolerance, dtype):
        """Normalize a join_asof tolerance to key units: µs for
        timestamps, days for dates, as-is for numerics; accepts a
        datetime.timedelta for temporal keys."""
        import datetime as _dt

        if tolerance is None:
            return None
        if isinstance(tolerance, _dt.timedelta):
            if dtype == "date":
                return tolerance.total_seconds() / 86400.0
            return tolerance.total_seconds() * 1e6
        return float(tolerance)

    @staticmethod
    def _asof_numeric(c: Column, dtype) -> Column:
        """A numeric (double) sort key for asof distance — timestamps go
        through µs since NTZ/LTZ can't cast to double directly."""
        if isinstance(dtype, tuple) and dtype[0] in ("naive_datetime", "datetime"):
            return F.unix_micros(c.cast("timestamp_ltz")).cast("double")
        if dtype == "date":
            return F.unix_date(c).cast("double")
        return c.cast("double")

    def concat_rows(self, *others) -> "DataFrame":
        """Vertical union by name with dtype merging
        (reference data_frame.ex:5762-5869). Accepts frames variadically
        or one list of frames (``df.concat_rows([df2, df3])``)."""
        if len(others) == 1 and isinstance(others[0], (list, tuple)):
            others = tuple(others[0])
        frames = [self, *others]
        names0 = set(self.names)
        for i, fr in enumerate(frames[1:], start=1):
            ni = set(fr.names)
            if ni != names0:
                # reference concat_rows/2 'with incompatible columns'
                # (data_frame_test.exs:2982): name the deltas instead of
                # letting the union fail with a resolver error
                only0 = sorted(names0 - ni)
                onlyi = sorted(ni - names0)
                raise ValueError(
                    "dataframes must have the same columns\n\n"
                    f"* dataframe 0 has these columns not present in dataframe {i}:\n\n"
                    f"    {only0}\n\n"
                    f"* dataframe {i} has these columns not present in dataframe 0:\n\n"
                    f"    {onlyi}\n"
                )
        merged: dict[str, object] = {}
        for i, fr in enumerate(frames):
            for name, d in fr.dtypes.items():
                if name not in merged:
                    merged[name] = d
                    continue
                try:
                    merged[name] = dt.merge_dtype(merged[name], d)
                except ValueError:
                    # reference 'with incompatible column dtypes'
                    # (data_frame_test.exs:3000): name the column and
                    # the two CONFLICTING dtypes — the left side is the
                    # dtype merged over frames 0..i-1, not necessarily
                    # frame 0's original
                    raise ValueError(
                        "column dtypes must be compatible for all dataframes\n\n"
                        f"* dataframes 0..{i - 1}, column {name!r} merge to dtype:\n\n"
                        f"    {merged[name]}\n\n"
                        f"* dataframe {i}, column {name!r} has dtype:\n\n"
                        f"    {d}\n\n"
                        "these types are incompatible"
                    ) from None
        casted = []
        for fr in frames:
            # pin each input's own row order BEFORE the union: the
            # fresh-mono-id reassign below reads the physical layout, so
            # a shuffled (non-aligned) input must be re-sorted by its own
            # ORDER_COL first or the concat scrambles its rows
            if fr._has_order and not fr._aligned:
                sdf = fr._sdf.orderBy(F.col(ORDER_COL).asc()).drop(ORDER_COL)
            else:
                sdf = fr.lazy_sdf()
            for name, d in fr.dtypes.items():
                if d != merged[name]:
                    sdf = sdf.withColumn(name, F.col(name).cast(dt.to_spark(merged[name])))
            casted.append(sdf)
        out = casted[0]
        for sdf in casted[1:]:
            out = out.unionByName(sdf, allowMissingColumns=False)
        return DataFrame(out.withColumn(ORDER_COL, F.monotonically_increasing_id()), self.groups, True, aligned=True, group_stable=self._group_stable)

    def concat_columns(self, *others) -> "DataFrame":
        """Horizontal concat, positional alignment via row index;
        conflicting names get a numeric suffix (reference
        data_frame.ex:5693-5720; accepts a list of frames too)."""
        if len(others) == 1 and isinstance(others[0], (list, tuple)):
            others = tuple(others[0])
        out = self._with_row_index("__cc__")._sdf.drop(ORDER_COL)
        for i, other in enumerate(others):
            osdf = other._with_row_index("__cc__")._sdf.drop(ORDER_COL)
            taken = set(out.columns)
            for c in osdf.columns:
                if c != "__cc__" and c in taken:
                    osdf = osdf.withColumnRenamed(c, f"{c}_{i + 1}")
            # FULL join: the result is as long as the LONGEST frame;
            # shorter frames pad with nils (reference lazy_test.exs:1668,
            # polars horizontal concat). USING-join coalesces the index.
            out = out.join(osdf, "__cc__", "full")
        out = out.withColumn(ORDER_COL, F.col("__cc__")).drop("__cc__")
        return DataFrame(out, self.groups, has_order=True, group_stable=self._group_stable)

    # ------------------------------------------------------------------
    # reshape (reference SURVEY.md §2.8)
    # ------------------------------------------------------------------
    def pivot_wider(
        self,
        names_from: str,
        values_from,
        id_columns=None,
        names_prefix: str = "",
        values=None,
        agg: str = "first",
    ) -> "DataFrame":
        """Spread rows into columns; duplicate cells take the FIRST value
        in frame order (reference data_frame.ex:5102-5188, dataframe.rs:463
        PivotAgg::First), rendered as ``min_by(value, row_order)`` so the
        result is deterministic across partitions. ``agg`` accepts any
        Spark aggregate name (mean/sum/min/max/count/...) as an extension.

        Passing ``values`` (the expected distinct names) avoids the extra
        distinct-collect job Spark otherwise runs — at scale always pass it.
        """
        vals = values_from if isinstance(values_from, (list, tuple)) else [values_from]
        ids = self._resolve(id_columns) if id_columns is not None else [
            c for c in self.names if c != names_from and c not in vals
        ]
        # float columns are DISCARDED from the id selection, and an
        # empty selection raises (reference data_frame_test.exs:3606-
        # 3656 — floats make unreliable identity keys)
        dts = self.dtypes
        ids = [c for c in ids if not (isinstance(dts.get(c), tuple) and dts[c][0] == "f")]
        if not ids:
            raise ValueError(
                "id_columns must select at least one existing column, but "
                f"{id_columns!r} selects none. Note that float columns are "
                "discarded from the selection."
            )
        base = self._ordered()
        if agg == "first":
            aggfn = lambda v: F.min_by(F.col(v), F.col(ORDER_COL))  # noqa: E731
        else:
            aggfn = lambda v: getattr(F, agg)(F.col(v))  # noqa: E731
        # nil pivot keys become a "nil" column (reference
        # data_frame_test.exs:3478 — Spark's pivot would otherwise drop
        # them); string cast matches Spark's own column-name rendering
        key = F.coalesce(F.col(names_from).cast("string"), F.lit("nil"))
        s = base._sdf.withColumn("__pvk__", key)
        gb = s.groupBy(*ids)
        str_values = [("nil" if v is None else str(v)) for v in values] if values else None
        if str_values is None:
            # surfaced (not just docstringed): the implicit pivot runs a
            # whole-table distinct-collect job first — at 100 TB that is
            # a full extra scan the caller can skip by naming the columns
            import warnings

            warnings.warn(
                "pivot_wider without values= runs an extra distinct-collect "
                "job over the whole frame to discover the pivot columns; "
                "pass values=[...] at scale",
                stacklevel=2,
            )
            # discover in FIRST-APPEARANCE order (reference pivot_wider
            # doctests data_frame.ex:4959 — Monday before Tuesday, not
            # alphabetical; Spark's implicit pivot would sort)
            got = (
                s.groupBy("__pvk__")
                .agg(F.min(ORDER_COL).alias("__o__"))
                .orderBy("__o__")
                .select("__pvk__")
                .collect()
            )
            str_values = [r[0] for r in got]
        piv = gb.pivot("__pvk__", str_values)
        if len(vals) == 1:
            out = piv.agg(aggfn(vals[0]))
        else:
            out = piv.agg(*[aggfn(v).alias(v) for v in vals])
        # positional rename (toDF): a pivot column that collides with an
        # id column produces DUPLICATE names in the Spark result, which
        # name-based rename can't address — reference dedupes with a
        # numeric suffix ("b" id + "b" variable -> "b_1")
        new_names, taken = [], set()
        val_order: list[tuple] = []  # (value-col idx, key idx) per non-id col
        for i, c in enumerate(out.columns):
            if i < len(ids):
                new_names.append(c)
                taken.add(c)
                continue
            v_idx, k_idx = 0, i - len(ids)
            if len(vals) > 1:
                # Spark names multi-agg pivot columns "{key}_{value_col}";
                # the reference prefixes with the VALUE column instead:
                # "{value_col}_{key}" (data_frame.ex:5025-5048). Longest
                # suffix match disambiguates value cols that end with
                # another's name.
                v = max(
                    (v for v in vals if c.endswith(f"_{v}")), key=len, default=None
                )
                if v is not None:
                    k = c[: -len(v) - 1]
                    c = f"{v}_{k}"
                    v_idx = vals.index(v)
                    k_idx = str_values.index(k) if k in str_values else k_idx
            name = f"{names_prefix}{c}"
            if name in taken:
                j = 1
                while f"{name}_{j}" in taken:
                    j += 1
                name = f"{name}_{j}"
            taken.add(name)
            new_names.append(name)
            val_order.append((v_idx, k_idx, name))
        out = out.toDF(*new_names)
        if len(vals) > 1:
            # reference column order is VALUE-COL-MAJOR (all
            # property_value_* then all another_value_*,
            # data_frame.ex:5029); Spark pivots key-major
            ordered = new_names[: len(ids)] + [n for _, _, n in sorted(val_order)]
            out = out.select(*ordered)
        # output ROWS keep the ids' first-appearance order (reference
        # pivot_wider doctests render product_id [1, 2]); min(order) per
        # id group is the same trick as stable summarise — the join is
        # on the (small) pivoted output
        orddf = s.groupBy(*ids).agg(F.min(ORDER_COL).alias(ORDER_COL))
        # eqNullSafe: a NULL id value is a real pivoted row; a plain
        # equi-join would leave its ORDER_COL null (sorting it wrongly
        # to the front)
        cond = None
        right = orddf
        for c in ids:
            right = right.withColumnRenamed(c, f"__oid_{c}__")
            e = F.col(c).eqNullSafe(F.col(f"__oid_{c}__"))
            cond = e if cond is None else (cond & e)
        out = out.join(right, cond, "left").drop(*[f"__oid_{c}__" for c in ids])
        # groups that are ID columns survive; pivoted/value groups are
        # discarded (reference pivot_wider grouped doctests)
        return DataFrame(out, groups=[g for g in self.groups if g in ids], has_order=True)

    def pivot_longer(
        self,
        columns_to_pivot,
        names_to: str = "variable",
        values_to: str = "value",
        discard=None,
        select=None,
    ) -> "DataFrame":
        """Melt columns into rows; pivoted columns are cast to their merged
        dtype (reference data_frame.ex:4819-5099). ``select``/``discard``
        narrow the KEPT (id) columns; discard wins on overlap
        (lazy_test.exs:1203-1220)."""
        cols = self._resolve(columns_to_pivot)
        if select is not None:
            keep = [c for c in self._resolve(select) if c not in cols]
        else:
            keep = [c for c in self.names if c not in cols]
        if discard is not None:
            drop = set(self._resolve(discard))
            keep = [c for c in keep if c not in drop]
        merged = None
        for c in cols:
            d = self.dtypes[c]
            merged = d if merged is None else dt.merge_dtype(merged, d)
        spark_t = dt.to_spark(merged).simpleString()
        # VARIABLE-MAJOR output order (reference data_frame.ex:4734 —
        # polars melt stacks column by column, all solid_fuel rows before
        # all liquid_fuel rows), derived WITHOUT a sort: a dense row index
        # o plus the stacked variable index vi give order = vi*n + o
        pairs = ", ".join(f"{i}, '{c}', cast(`{c}` as {spark_t})" for i, c in enumerate(cols))
        stack = F.expr(
            f"stack({len(cols)}, {pairs}) as (`__vi__`, `{names_to}`, `{values_to}`)"
        )
        base = self._ordered()._with_row_index("__plo__")
        n = _known_count(base)
        out = base._sdf.drop(ORDER_COL).select(*keep, stack, F.col("__plo__"))
        out = out.withColumn(
            ORDER_COL, F.col("__vi__") * F.lit(n) + F.col("__plo__")
        ).drop("__vi__", "__plo__")
        res = DataFrame(out, groups=self.groups, has_order=True, group_stable=self._group_stable)
        # r11 optimization: ORDER_COL = vi*n + dense-row-index covers
        # 0..k*n-1 exactly once, so it IS the contiguous row index — an
        # immediately following row_index needs no re-sort/stats kernel.
        # One-shot flag: _replace builds fresh objects, so any later verb
        # (filter/join/...) that would break density also drops the flag.
        res._order_dense = True
        res._row_count_hint = n * len(cols)
        return res

    def explode(self, selector) -> "DataFrame":
        """Unnest list columns; multiple columns are zipped
        (reference data_frame.ex:6292-6338). Row order is PRESERVED
        (Polars explode is order-preserving, lazyframe.rs:163-167): when
        the physical layout still matches ORDER_COL the within-partition
        explode keeps it for free; otherwise the result is re-ordered by
        (parent order, element position) before the fresh-mono-id
        reassign — the same idiom as _rederive_join_order."""
        cols = self._resolve(selector)
        base = self._ordered()
        sdf = base._sdf
        if base._aligned:
            # fast path: layout == order, explode preserves both the
            # within-partition row order and the partition numbering
            if len(cols) == 1:
                out = sdf.withColumn(cols[0], F.explode_outer(F.col(cols[0])))
            else:
                zipped = F.arrays_zip(*[F.col(c) for c in cols])
                out = sdf.withColumn("__z__", F.explode_outer(zipped))
                for c in cols:
                    out = out.withColumn(c, F.col("__z__").getField(c))
                out = out.drop("__z__")
            out = out.drop(ORDER_COL).withColumn(ORDER_COL, F.monotonically_increasing_id())
            return DataFrame(out, groups=self.groups, has_order=True, aligned=True, group_stable=self._group_stable)
        # shuffled layout: posexplode carries the element position so the
        # logical order can be rederived independent of the layout
        gen_src = F.col(cols[0]) if len(cols) == 1 else F.arrays_zip(*[F.col(c) for c in cols])
        exprs = []
        placed = False
        for c in sdf.columns:
            if c == cols[0]:
                exprs.append(F.posexplode_outer(gen_src).alias("__pos__", "__z__"))
                placed = True
            elif len(cols) > 1 and c in cols:
                continue
            else:
                exprs.append(F.col(c))
        assert placed
        out = sdf.select(*exprs)
        if len(cols) == 1:
            out = out.withColumnRenamed("__z__", cols[0])
        else:
            # re-insert the zipped columns at the first exploded column's slot
            sel = []
            for c in sdf.columns:
                if c == cols[0]:
                    sel.extend(F.col("__z__").getField(k).alias(k) for k in cols)
                elif c in cols or c == ORDER_COL:
                    continue
                else:
                    sel.append(F.col(c))
            out = out.select(*sel, F.col("__pos__"), F.col(ORDER_COL))
        out = (
            out.orderBy(F.col(ORDER_COL).asc(), F.col("__pos__").asc_nulls_first())
            .drop(ORDER_COL, "__pos__")
            .withColumn(ORDER_COL, F.monotonically_increasing_id())
        )
        # restore the caller-visible column order (single-col path keeps it)
        want = [c for c in sdf.columns if c != ORDER_COL] + [ORDER_COL]
        out = out.select(*want)
        return DataFrame(out, groups=self.groups, has_order=True, aligned=True, group_stable=self._group_stable)

    def unnest(self, selector) -> "DataFrame":
        """Struct fields to top-level columns (reference data_frame.ex:6341-6382)."""
        cols = self._resolve(selector)
        sdf = self._sdf
        order = [c for c in sdf.columns]
        exprs = []
        for c in order:
            if c in cols:
                for fld in sdf.schema[c].dataType.fieldNames():
                    exprs.append(F.col(c).getField(fld).alias(fld))
            else:
                exprs.append(F.col(c))
        return self._replace(sdf.select(*exprs))

    def dummies(self, selector, max_categories: int = DUMMIES_MAX_CATEGORIES) -> "DataFrame":
        """One-hot encode (reference data_frame.ex:4095-4134). Collects the
        distinct values to build the when-chain — small-cardinality by
        the operator's nature (each distinct value becomes a COLUMN), so
        the collect is explicitly gated: a high-cardinality column would
        otherwise mean an unbounded driver collect plus a codegen blowup
        of thousands of when-branches. Raise the ``max_categories``
        escape hatch deliberately if you really want a wider frame."""
        cols = self._resolve(selector)
        base = self._ordered()
        sdf = base._sdf
        new_cols = []
        for c in cols:
            # Exclude nulls BEFORE the limit: a null row otherwise eats one
            # of the max_categories+1 probe slots, so a column with
            # max_categories+1 real values plus nulls would pass the gate
            # and silently encode an arbitrary subset. Categories order by
            # FIRST APPEARANCE, not value (reference dummies doctest
            # data_frame.ex:4068: col_y_b before col_y_a).
            got = (
                sdf.where(F.col(c).isNotNull())
                .groupBy(c)
                .agg(F.min(ORDER_COL).alias("__o__"))
                .orderBy("__o__")
                .limit(max_categories + 1)
                .collect()
            )
            values = [r[0] for r in got]
            if len(values) > max_categories:
                raise ValueError(
                    f"dummies: column {c!r} has more than {max_categories} distinct "
                    f"values; one-hot encoding it would create that many columns. "
                    f"Pass max_categories= to raise the gate, or bucket the column "
                    f"first (cut/qcut/categorise)."
                )
            for v in values:
                # u8 flags in the reference; smallint is our u8 physical
                new_cols.append(
                    F.when(F.col(c) == v, 1).otherwise(0).cast("smallint").alias(f"{c}_{v}")
                )
        # the result is ONLY the dummy columns (reference doctest
        # data_frame.ex:4057: Polars[4 x 3] — non-selected columns drop)
        # groups are removed (reference: "In case the dataframe is using
        # groups, all groups will be removed") — the group columns are
        # gone from the output anyway
        out = sdf.select(*new_cols, F.col(ORDER_COL))
        # flag columns are :u8 in the reference (data_frame.ex:4056)
        for fld in out.columns:
            if fld != ORDER_COL:
                out = out.withMetadata(fld, {"uw": 8})
        return DataFrame(out, groups=[], has_order=True, aligned=base._aligned)

    def transpose(self, header: bool | str = False, columns: list[str] | None = None) -> "DataFrame":
        """Flip rows/columns — one output row per input column, all values
        cast to string (reference data_frame.ex:4627-4700: default column
        names ``column_N``; ``header`` adds a name column, ``True`` names it
        "column"; ``columns`` must match the row count). Inherently
        driver-side, small frames only (the reference warns the same)."""
        import math

        pdf = self.to_pandas()
        n = len(pdf)
        if columns is not None:
            if len(columns) != n:
                raise ValueError(
                    f"invalid columns option, length of column names "
                    f"({len(columns)}) must match the row count ({n})"
                )
            names = [str(c) for c in columns]
        else:
            names = [f"column_{i}" for i in range(n)]
        header_name = "column" if header is True else (str(header) if header else None)

        def to_s(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        data = {}
        if header_name is not None:
            data[header_name] = [str(c) for c in pdf.columns]
        for j, cname in enumerate(names):
            row = pdf.iloc[j]
            data[cname] = [to_s(row[c]) for c in pdf.columns]
        spark = self._sdf.sparkSession
        schema = T.StructType([T.StructField(c, T.StringType()) for c in data])
        out = spark.createDataFrame(list(zip(*data.values())) or [], schema=schema)
        return DataFrame(
            out.withColumn(ORDER_COL, F.monotonically_increasing_id()), has_order=True, aligned=True
        )

    # ------------------------------------------------------------------
    # stats / summaries
    # ------------------------------------------------------------------
    def nil_count(self) -> "DataFrame":
        aggs = [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in self.names]
        out = self._sdf.agg(*aggs)
        for c in self.names:
            # counts are :u32 in the reference (data_frame.ex:6749)
            out = out.withMetadata(c, {"uw": 32})
        return DataFrame(out, has_order=False)

    def frequencies(self, selector) -> "DataFrame":
        cols = self._resolve(selector)
        out = self.lazy_sdf().groupBy(*cols).agg(F.count(F.lit(1)).alias("counts")).orderBy(F.col("counts").desc())
        # counts are :u32 in the reference (series.ex:4889)
        out = out.withMetadata("counts", {"uw": 32})
        return DataFrame(out, has_order=False)

    def describe(self, percentiles: Sequence[float] = (0.25, 0.5, 0.75)) -> "DataFrame":
        """count/nil_count/mean/std/min/percentiles/max per column,
        matching the reference's shape AND dtype rules
        (data_frame.ex:6678-6744; test grid data_frame_test.exs:4035-4160):
        numeric columns render as f64; every other dtype renders as a
        STRING column whose count/nil_count stringify, with min/max
        additionally formatted for naive_datetime (µs precision) and
        duration (compact "366d"-style) — dates/times/strings/lists show
        counts only, as the reference does."""
        import datetime as _dt

        sdf = self.lazy_sdf()
        types = {f.name: f.dataType for f in sdf.schema.fields}
        num = {c: isinstance(t, T.NumericType) for c, t in types.items()}
        fmt_minmax = {
            c: isinstance(t, (T.TimestampNTZType, T.TimestampType, T.DayTimeIntervalType))
            for c, t in types.items()
        }
        rows = ["count", "nil_count", "mean", "std", "min"] + [f"{int(p * 100)}%" for p in percentiles] + ["max"]
        aggs = []
        for c in self.names:
            aggs.append(F.count(F.col(c)).alias(f"{c}__count"))
            aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nil_count"))
            if num[c]:
                aggs.append(F.avg(F.col(c)).alias(f"{c}__mean"))
                aggs.append(F.stddev_samp(F.col(c)).alias(f"{c}__std"))
                aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
                aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
            elif fmt_minmax[c]:
                aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
                aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
        stats = sdf.agg(*aggs).collect()[0].asDict()
        if percentiles:
            # reference describe percentiles use the quantile default =
            # polars NEAREST (element at sorted position
            # floor(p*(n-1)+0.5)), not linear interpolation — rendered by
            # the distributed nth-element kernel (distinct-value counts +
            # bounded prefix), never a whole-column collect
            from .operators.ordered import nearest_quantiles

            for c in self.names:
                if num[c]:
                    got = nearest_quantiles(sdf, c, list(percentiles))
                    for p, v in zip(percentiles, got):
                        stats[f"{c}__p{p}"] = None if v is None else float(v)
        spark = sdf.sparkSession

        def _fmt(v):
            if v is None:
                return None
            if isinstance(v, _dt.timedelta):
                # Polars-style compact duration: days then remaining time
                parts = []
                days, secs, us = v.days, v.seconds, v.microseconds
                if days:
                    parts.append(f"{days}d")
                h, rem = divmod(secs, 3600)
                m, s = divmod(rem, 60)
                if h:
                    parts.append(f"{h}h")
                if m:
                    parts.append(f"{m}m")
                if s:
                    parts.append(f"{s}s")
                if us:
                    parts.append(f"{us}us")
                return " ".join(parts) if parts else "0s"
            if isinstance(v, _dt.datetime):
                return f"{v:%Y-%m-%d %H:%M:%S}.{v.microsecond:06d}"
            return str(v)

        data = []
        for rname in rows:
            row = {"describe": rname}
            for c in self.names:
                if rname == "count":
                    n = stats[f"{c}__count"]
                    row[c] = float(n) if num[c] else str(n)
                elif rname == "nil_count":
                    n = stats[f"{c}__nil_count"]
                    row[c] = float(n) if num[c] else str(n)
                elif num[c]:
                    if rname == "mean":
                        row[c] = stats[f"{c}__mean"]
                    elif rname == "std":
                        row[c] = stats[f"{c}__std"]
                    elif rname in ("min", "max"):
                        row[c] = stats[f"{c}__{rname}"]
                    else:
                        p = percentiles[rows.index(rname) - 5]
                        row[c] = stats[f"{c}__p{p}"]
                elif fmt_minmax[c] and rname in ("min", "max"):
                    row[c] = _fmt(stats[f"{c}__{rname}"])
                else:
                    row[c] = None
            data.append(row)
        schema = T.StructType(
            [T.StructField("describe", T.StringType())]
            + [T.StructField(c, T.DoubleType() if num[c] else T.StringType()) for c in self.names]
        )
        return DataFrame(spark.createDataFrame(data, schema), has_order=False)

    def correlation(self, selector=None, ddof: int = 1, method: str = "pearson") -> "DataFrame":
        return self._pairwise(selector, "corr", method=method)

    def covariance(self, selector=None, ddof: int = 1) -> "DataFrame":
        return self._pairwise(selector, "cov", ddof=ddof)

    def _pairwise(self, selector, kind: str, ddof: int = 1, method: str = "pearson") -> "DataFrame":
        sdf = self.lazy_sdf()
        numeric = [f.name for f in sdf.schema.fields if isinstance(f.dataType, T.NumericType)]
        cols = [c for c in (self._resolve(selector) if selector else numeric) if c in numeric]
        if method == "spearman":
            # tie-corrected average ranks (what Polars/pandas compute), via
            # ONE multi-column distributed rank kernel — no single-partition
            # window, and no per-column kernel chain (ranks run on the
            # double-cast values, same as pandas/polars float matrices)
            from .operators.ordered import rank_columns_multi

            sdf = sdf.withColumns({c: F.col(c).cast("double") for c in cols})
            sdf = rank_columns_multi(sdf, {c: c for c in cols}, method="average")
        aggs = []
        for a in cols:
            for b in cols:
                ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
                if kind == "corr":
                    aggs.append(F.corr(ca, cb).alias(f"{a}||{b}"))
                else:
                    aggs.append((F.covar_samp(ca, cb) if ddof == 1 else F.covar_pop(ca, cb)).alias(f"{a}||{b}"))
        stats = sdf.agg(*aggs).collect()[0].asDict()
        spark = sdf.sparkSession
        data = [
            dict({"names": a}, **{b: stats[f"{a}||{b}"] for b in cols})
            for a in cols
        ]
        schema = T.StructType(
            [T.StructField("names", T.StringType())] + [T.StructField(c, T.DoubleType()) for c in cols]
        )
        return DataFrame(spark.createDataFrame(data, schema), has_order=False)

    # ------------------------------------------------------------------
    # row UDF (reference data_frame.ex:4613-4626 — there it materializes
    # rows through the BEAM; here it stays distributed via mapInPandas)
    # ------------------------------------------------------------------
    def transform(self, fn: Callable[[dict], dict], schema: Mapping | str) -> "DataFrame":
        """Apply a row->dict function; returned keys become new columns
        appended to the frame. ``schema`` maps new column names to dtypes
        (or is a Spark DDL string for the FULL output schema)."""
        base = self._ordered()
        in_schema = base._sdf.schema
        if isinstance(schema, str):
            out_schema = schema
            new_fields = None
        else:
            new_fields = [(n, dt.to_spark(d)) for n, d in schema.items()]
            out_schema = T.StructType(list(in_schema.fields) + [T.StructField(n, t) for n, t in new_fields])

        def op(batches):
            for pdf in batches:
                rows = pdf.to_dict("records")
                for r in rows:
                    r.update(fn({k: v for k, v in r.items() if k != ORDER_COL}))
                import pandas as pd

                yield pd.DataFrame(rows)

        out = base._sdf.mapInPandas(op, out_schema)
        return DataFrame(out, groups=self.groups, has_order=ORDER_COL in out.columns, aligned=base._aligned, group_stable=self._group_stable)

    # ------------------------------------------------------------------
    # EWM / binning (composite operators)
    # ------------------------------------------------------------------
    def ewm(self, **specs) -> "DataFrame":
        """Add EWM columns; each spec is (kind, column, alpha, adjust),
        e.g. ``ewm(m=("mean", "x", 0.5, True))`` (reference
        series.ex:5344-5528)."""
        from .operators.rolling import ewm_columns

        return ewm_columns(self, specs)

    def ewm_mean(self, column: str, alpha: float = 0.5, adjust: bool = True, out: str | None = None) -> "DataFrame":
        return self.ewm(**{out or f"{column}_ewm_mean": ("mean", column, alpha, adjust)})

    def cut(self, column: str, breaks: list, labels=None, left_close: bool = False) -> "DataFrame":
        from .operators.cut import cut as _cut

        return _cut(self, column, breaks, labels, left_close)

    def qcut(
        self,
        column: str,
        quantiles: list,
        labels=None,
        left_close: bool = False,
        allow_duplicates: bool = False,
    ) -> "DataFrame":
        from .operators.cut import qcut as _qcut

        return _qcut(self, column, quantiles, labels, left_close, allow_duplicates)

    # ------------------------------------------------------------------
    # SQL pass-through (reference data_frame.ex:6924-6930)
    # ------------------------------------------------------------------
    def sql(self, query: str, table_name: str = "df") -> "DataFrame":
        self.lazy_sdf().createOrReplaceTempView(table_name)
        return DataFrame(self._sdf.sparkSession.sql(query), has_order=False)


def _tree_has(e, *ops) -> bool:
    if not isinstance(e, Expr):
        return False
    if e.op in ops:
        return True
    return any(_tree_has(a, *ops) for a in e.args if isinstance(a, Expr))


def _tree_has_column(e) -> bool:
    return _tree_has(e, "column")


# the live set from expr (rolling.register extends it with window_* ops)
from .expr import ORDERED_OPS as ORDERED_EXPR_OPS  # noqa: E402
