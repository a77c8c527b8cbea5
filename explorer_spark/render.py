"""Human-facing rendering: the reference's two display surfaces.

1. ``to_table_string/2`` + ``print/2`` — an ASCII table (reference
   data_frame.ex:6385-6640, rendered there by the public TableRex
   library): boxed title ``Explorer DataFrame: [rows: N, columns: M]``,
   centered ``name`` / ``<dtype>`` header cells, left-aligned values,
   ``=`` header separator, per-row separators when a composite
   (list/struct) column is present, nil -> ``nil``, multi-line
   struct/list cells, and a ``…`` dots row when the frame outgrows
   ``limit`` (default 5; ``limit_dots`` :split puts half the rows above
   and half below the dots).

2. ``__repr__`` — the inspect protocol shape (reference
   data_frame.ex:6962-6977, backend/data_frame.ex:285-360 and
   backend/series.ex:360-400): ``#Explorer.DataFrame<`` /
   ``#Explorer.Series<`` with ``Spark[N x M]`` (the reference prints its
   backend name, e.g. ``Polars[...]``), a ``Groups: [...]`` line when
   grouped, and per-column ``name dtype [v1, ..., v5, ...]`` previews
   truncated at 5 values (backend/data_frame.ex @default_limit).

Everything here is driver-side formatting over a bounded slice — the
only full-scan cost is the row COUNT in the title/banner, the same
count the reference's eager frames carry in their struct.
"""

from __future__ import annotations

import datetime as _dt
import math

__all__ = ["to_table_string", "frame_repr", "series_repr", "dtype_to_string"]

_UNIT_RENDER = {"ms": "ms", "us": "μs", "ns": "ns"}


def dtype_to_string(d) -> str:
    """Reference Shared.dtype_to_string tokens (s64, f64, list[s64],
    struct[2], datetime[μs, Zone], decimal[38, 2], ...)."""
    if isinstance(d, str):
        return d
    if isinstance(d, tuple):
        k = d[0]
        if k in ("s", "u", "f"):
            return f"{k}{d[1]}"
        if k == "list":
            return f"list[{dtype_to_string(d[1])}]"
        if k == "struct":
            return f"struct[{len(d[1])}]"
        if k == "duration":
            return f"duration[{_UNIT_RENDER.get(d[1], d[1])}]"
        if k == "naive_datetime":
            return f"naive_datetime[{_UNIT_RENDER.get(d[1], d[1])}]"
        if k == "datetime":
            if len(d) > 2 and d[2]:
                return f"datetime[{_UNIT_RENDER.get(d[1], d[1])}, {d[2]}]"
            return f"datetime[{_UNIT_RENDER.get(d[1], d[1])}]"
        if k == "decimal":
            return f"decimal[{d[1]}, {d[2]}]"
        if k == "time":
            return "time"
    return str(d)


# ---------------------------------------------------------------------------
# value -> text (Kernel.to_string semantics for table cells,
# Inspect/to_doc semantics for __repr__)
# ---------------------------------------------------------------------------

_DUR_UNITS_NS = [
    ("d", 86_400_000_000_000),
    ("h", 3_600_000_000_000),
    ("m", 60_000_000_000),
    ("s", 1_000_000_000),
    ("ms", 1_000_000),
    ("us", 1_000),
    ("ns", 1),
]
_PRECISION_NS = {"ms": 1_000_000, "us": 1_000, "ns": 1}


def format_duration(value: int, precision: str = "us") -> str:
    """Explorer.Duration.to_string (duration.ex:28-60): '1d 2h 3m'."""
    ns = value * _PRECISION_NS.get(precision, 1_000)
    neg = ns < 0
    ns = abs(ns)
    parts = []
    for unit, per in _DUR_UNITS_NS:
        if ns >= per:
            parts.append(f"{ns // per}{unit}")
            ns %= per
    out = " ".join(parts) or "0"
    return f"-{out}" if neg else out


def _float_str(v: float) -> str:
    if v != v:
        return "nan"
    if v == float("inf"):
        return "infinity"
    if v == float("-inf"):
        return "neg_infinity"
    s = repr(v)
    # Elixir floats always carry a decimal point ("3.0e10", "1.0e-5")
    if "e" in s or "E" in s:
        mant, _, exp = s.partition("e")
        if "." not in mant:
            mant += ".0"
        return f"{mant}e{int(exp)}"
    return s


def _temporal_str(v) -> str:
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.time):
        return v.strftime("%H:%M:%S.%f")
    if isinstance(v, _dt.timedelta):
        return format_duration(round(v.total_seconds() * 1e6), "us")
    return str(v)


def _elem_dtype(dtype):
    return dtype[1] if isinstance(dtype, tuple) and dtype[0] == "list" else None


def _to_string(v, dtype=None) -> str:
    """Kernel.to_string for scalar cell values."""
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _float_str(v)
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time, _dt.timedelta)):
        return _temporal_str(v)
    if isinstance(v, int) and isinstance(dtype, tuple) and dtype and dtype[0] == "duration":
        return format_duration(v, dtype[1])
    if isinstance(v, (bytes, bytearray)):
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError:
            return "<<" + ", ".join(str(b) for b in bytes(v)) + ">>"
    return str(v)


def _multiline(contents: list[str], depth: int, left: str, right: str) -> str:
    """TableRex cell layout for composite values (data_frame.ex
    multiline/4): one line per element once there is more than one."""
    indent = " " * max(depth - 1, 0)
    if len(contents) > 1 or any("\n" in c for c in contents):
        body = ("\n " + indent).join(contents)
        return f"{left}\n {indent}{body}\n{indent}{right}"
    return f"{left}{''.join(contents)}{right}"


def cell_text(v, dtype=None, depth: int = 1) -> str:
    """format_column/2: the table-cell rendering of one value."""
    if v is None:
        return "nil"
    if isinstance(v, (list, tuple)):
        ed = _elem_dtype(dtype)
        contents = [cell_text(x, ed, depth + 1) for x in v]
        return _multiline(contents, depth, "[", "]")
    if isinstance(v, dict):
        fields = dict(dtype[1]) if isinstance(dtype, tuple) and dtype[0] == "struct" else {}
        items = sorted(v.items(), key=lambda kv: kv[0])
        contents = [f"{k}: {cell_text(x, fields.get(k), depth + 1)}" for k, x in items]
        return _multiline(contents, depth, "{", "}")
    return _to_string(v, dtype)


def inspect_value(v, dtype=None, limit: int = 5) -> str:
    """Shared.to_doc semantics for the __repr__ previews: strings are
    QUOTED, nan/inf render NaN/Inf/-Inf, containers truncate at limit."""
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Inf"
        if v == float("-inf"):
            return "-Inf"
        return _float_str(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (bytes, bytearray)):
        try:
            return '"' + bytes(v).decode("utf-8") + '"'
        except UnicodeDecodeError:
            return "<<" + ", ".join(str(b) for b in bytes(v)) + ">>"
    if isinstance(v, (list, tuple)):
        ed = _elem_dtype(dtype)
        items = [inspect_value(x, ed, limit) for x in list(v)[:limit]]
        if len(v) > limit:
            items.append("...")
        return "[" + ", ".join(items) + "]"
    if isinstance(v, dict):
        fields = dict(dtype[1]) if isinstance(dtype, tuple) and dtype[0] == "struct" else {}
        items = [
            f'"{k}" => {inspect_value(x, fields.get(k), limit)}' for k, x in v.items()
        ]
        return "%{" + ", ".join(items) + "}"
    return _to_string(v, dtype)


# ---------------------------------------------------------------------------
# the TableRex text layout
# ---------------------------------------------------------------------------


def _render_table(
    title: str,
    headers: list[str],
    dtype_row: list[str],
    rows: list[list[str]],
    horizontal_style: str = "header",
    header_separator_symbol: str = "=",
) -> str:
    ncols = len(headers)

    def lines(cell: str) -> list[str]:
        return cell.split("\n")

    widths = []
    for i in range(ncols):
        cells = [headers[i], dtype_row[i]] + [r[i] for r in rows]
        w = max((len(ln) for c in cells for ln in lines(c)), default=0)
        widths.append(w + 2)
    interior = sum(widths) + ncols - 1
    # TableRex widens every column evenly until the boxed title fits
    need = len(title) + 2
    if need > interior:
        add = math.ceil((need - interior) / ncols)
        widths = [w + add for w in widths]
        interior = sum(widths) + ncols - 1

    def centered(s: str, w: int) -> str:
        pad = w - len(s)
        left = pad // 2
        return " " * left + s + " " * (pad - left)

    def col_border(sym: str = "-") -> str:
        return "+" + "+".join(sym * w for w in widths) + "+"

    def header_line(cells: list[str]) -> str:
        return "|" + "|".join(centered(c, w) for c, w in zip(cells, widths)) + "|"

    def value_lines(row: list[str]) -> list[str]:
        split = [lines(c) for c in row]
        height = max(len(s) for s in split)
        out = []
        for li in range(height):
            parts = []
            for ci in range(ncols):
                txt = split[ci][li] if li < len(split[ci]) else ""
                parts.append(" " + txt + " " * (widths[ci] - 1 - len(txt)))
            out.append("|" + "|".join(parts) + "|")
        return out

    out: list[str] = []
    out.append("+" + "-" * interior + "+")
    out.append("|" + centered(title, interior) + "|")
    out.append(col_border())
    out.append(header_line(headers))
    out.append(header_line(dtype_row))
    out.append(col_border(header_separator_symbol))
    for ri, row in enumerate(rows):
        out.extend(value_lines(row))
        if horizontal_style == "all" and ri < len(rows) - 1:
            out.append(col_border())
    out.append(col_border())
    return "\n".join(out) + "\n"


def to_table_string(df, limit: int | str = 5, limit_dots: str = "split", **render_opts) -> str:
    """Reference DataFrame.to_table_string/2 (data_frame.ex:6492-6594)."""
    if limit != "infinity" and (not isinstance(limit, int) or limit < 0):
        raise ValueError(
            f"expected `:limit` to be a non-negative integer or `:infinity`, got: {limit!r}"
        )
    if limit_dots not in ("split", "bottom"):
        raise ValueError(
            f"expected `:limit_dots` to be `:split` or `:bottom`, got: {limit_dots!r}"
        )
    headers = df.names
    dtypes = df.dtypes
    if not headers:
        # reference empty_table_string/0: a single borderless row
        t = "Explorer DataFrame: [rows: 0, columns: 0]"
        bar = "+" + "-" * (len(t) + 2) + "+"
        return f"{bar}\n| {t} |\n{bar}\n"
    # render the FRAME's first/last rows regardless of grouping —
    # head/slice are per-group verbs in this codebase (reference tables
    # ignore groups too)
    df = df.ungroup() if df.groups else df
    n = df.n_rows()
    dots_row = None
    if limit == "infinity":
        value_frames = [df.to_rows()]
    else:
        top = df.head(limit + 1).to_rows()
        if len(top) <= limit:
            value_frames = [top]
        elif limit_dots == "split" and limit >= 2:
            bottom_limit = limit // 2
            top_limit = limit - bottom_limit
            bottom = df.slice(n - bottom_limit, bottom_limit).to_rows()
            dots_row = ["…"] * len(headers)
            value_frames = [top[:top_limit], "dots", bottom]
        else:
            dots_row = ["…"] * len(headers)
            value_frames = [top[:limit], "dots"]
    rows_cells: list[list[str]] = []
    for vf in value_frames:
        if vf == "dots":
            rows_cells.append(dots_row)
            continue
        for r in vf:
            rows_cells.append([cell_text(r[h], dtypes[h]) for h in headers])
    composite = any(
        isinstance(d, tuple) and d[0] in ("list", "struct") for d in dtypes.values()
    )
    horizontal_style = render_opts.pop(
        "horizontal_style", "all" if composite else "header"
    )
    header_sep = render_opts.pop("header_separator_symbol", "=")
    return _render_table(
        f"Explorer DataFrame: [rows: {n}, columns: {len(headers)}]",
        headers,
        [f"<{dtype_to_string(dtypes[h])}>" for h in headers],
        rows_cells,
        horizontal_style=horizontal_style,
        header_separator_symbol=header_sep,
    )


# ---------------------------------------------------------------------------
# inspect protocol (__repr__)
# ---------------------------------------------------------------------------

_REPR_LIMIT = 5  # backend/data_frame.ex @default_limit


def _preview(series_values: list, total: int, dtype) -> str:
    items = [inspect_value(v, dtype, _REPR_LIMIT) for v in series_values[:_REPR_LIMIT]]
    if total > _REPR_LIMIT:
        items.append("...")
    return "[" + ", ".join(items) + "]"


def frame_repr(df) -> str:
    names = df.names
    groups = list(df.groups)
    # the preview shows the frame's first rows (head is per-group on a
    # grouped frame); the Groups line still reports the grouping
    flat = df.ungroup() if groups else df
    n = flat.n_rows()
    head = flat.head(_REPR_LIMIT + 1).to_columns() if names else {}
    lines = [f"#Explorer.DataFrame<", f"  Spark[{n} x {len(names)}]"]
    if groups:
        gs = ", ".join(f'"{g}"' for g in groups)
        lines.append(f"  Groups: [{gs}]")
    dtypes = df.dtypes
    for name in names:
        vals = head.get(name, [])
        lines.append(
            f"  {name} {dtype_to_string(dtypes[name])} {_preview(vals, n, dtypes[name])}"
        )
    lines.append(">")
    return "\n".join(lines)


def series_repr(s) -> str:
    vals = s.head(_REPR_LIMIT + 1).to_list()
    n = s.size()
    d = s.dtype
    return (
        "#Explorer.Series<\n"
        f"  Spark[{n}]\n"
        f"  {dtype_to_string(d)} {_preview(vals, n, d)}\n"
        ">"
    )
