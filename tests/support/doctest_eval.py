"""Evaluator for the v2 reference-doctest corpus
(tests/support/reference_doctests_v2.json, built by
tools/extract_doctests_v2.py).

Each case is a list of [var, ast] statements plus an expected rendering.
The evaluator interprets the restricted Elixir AST against explorer_spark:
`Explorer.DataFrame.*` / `Explorer.Series.*` calls dispatch to our
DataFrame/Series, macro verbs (filter/mutate/summarise/sort_by and the
Series `_` forms) evaluate their arguments in a QUERY context where bare
identifiers become `col(name)` and bare calls become `f.*` functions —
the same lowering the reference's Explorer.Query macro performs
(reference lib/explorer/query.ex).
"""

from __future__ import annotations

import datetime as dtm
import math
import re

import explorer_spark as ex
from explorer_spark import Series, col, f, lit
from explorer_spark.expr import Expr


class Unsupported(Exception):
    """Raised when a case needs a feature the evaluator doesn't model."""


# --------------------------------------------------------------------------
# dtype translation: Elixir dtype term -> our dtype; ours -> rendered token
# --------------------------------------------------------------------------

_ATOM_DTYPES = {
    "integer": ("s", 64), "float": ("f", 64), "boolean": "boolean",
    "string": "string", "binary": "binary", "date": "date", "time": "time",
    "category": "category", "null": "null",
    "s8": ("s", 8), "s16": ("s", 16), "s32": ("s", 32), "s64": ("s", 64),
    "u8": ("u", 8), "u16": ("u", 16), "u32": ("u", 32), "u64": ("u", 64),
    "f32": ("f", 32), "f64": ("f", 64),
}

_UNIT = {"millisecond": "ms", "microsecond": "us", "nanosecond": "ns"}


def dtype_from_ast(node):
    """Translate an Elixir dtype literal AST (atom / tuple) to our dtype."""
    if isinstance(node, dict) and "atom" in node:
        a = node["atom"]
        if a in _ATOM_DTYPES:
            return _ATOM_DTYPES[a]
        raise Unsupported(f"dtype atom {a}")
    if isinstance(node, dict) and "tuple" in node:
        items = node["tuple"]
        head = items[0].get("atom") if isinstance(items[0], dict) else None
        if head in ("s", "u", "f") and len(items) == 2:
            return (head, items[1]["int"])
        if head == "list":
            return ("list", dtype_from_ast(items[1]))
        if head in ("duration", "naive_datetime", "datetime", "time"):
            unit = _UNIT.get(items[1].get("atom"), items[1].get("atom"))
            if head == "datetime" and len(items) > 2:
                return ("datetime", unit, items[2].get("str") or items[2].get("atom"))
            return (head, unit)
        if head == "decimal":
            return ("decimal", items[1].get("int"), items[2].get("int"))
        if head == "struct":
            kw = items[1]
            pairs = kw.get("kw") or []
            return ("struct", [(k, dtype_from_ast(v)) for k, v in pairs])
    raise Unsupported(f"dtype term {node}")


def render_dtype(d) -> str:
    """Our dtype -> the reference's rendered token (polars display)."""
    if isinstance(d, str):
        return {"category": "category"}.get(d, d)
    if isinstance(d, tuple):
        k = d[0]
        if k in ("s", "u", "f"):
            return f"{k}{d[1]}"
        if k == "list":
            return f"list[{render_dtype(d[1])}]"
        if k == "struct":
            return f"struct[{len(d[1])}]"
        if k == "duration":
            return f"duration[{_URENDER.get(d[1], d[1])}]"
        if k == "naive_datetime":
            return f"datetime[{_URENDER.get(d[1], d[1])}]"
        if k == "datetime":
            if len(d) > 2 and d[2]:
                return f"datetime[{_URENDER.get(d[1], d[1])}, {d[2]}]"
            return f"datetime[{_URENDER.get(d[1], d[1])}]"
        if k == "decimal":
            return f"decimal[{d[1]}, {d[2]}]"
        if k == "time":
            return "time"
    return str(d)


_URENDER = {"ms": "ms", "us": "μs", "ns": "ns"}


# --------------------------------------------------------------------------
# literal decoding (AST -> python values)
# --------------------------------------------------------------------------

def _sigil_value(kind, body):
    if kind == "D":
        return dtm.date.fromisoformat(body)
    if kind == "N" or kind == "U":
        b = body.replace("Z", "")
        v = dtm.datetime.fromisoformat(b)
        return v
    if kind == "T":
        return dtm.time.fromisoformat(body)
    if kind == "S":
        return body
    if kind == "s":
        # lowercase sigil processes escapes (~s({"a":1}\n...))
        return body.replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\")
    if kind == "r":
        return re.compile(body)
    if kind == "w":
        return body.split()
    raise Unsupported(f"sigil ~{kind}")


_SPECIAL_ATOMS = {
    "nan": float("nan"), "infinity": float("inf"), "neg_infinity": float("-inf"),
}


class Atom(str):
    """An Elixir atom decoded as a string subtype — lets adapters tell
    :atom apart from "string" where it matters (rename targets etc.)."""


class _PrefixList(list):
    """Expected value whose rendering was truncated mid-list: values_eq
    compares only the visible prefix."""


class ColMeta:
    """The loop variable of an across/1 for-comprehension (reference
    query.ex module doc): carries .name / .dtype for the meta-level
    filters; inside the query body it stands for col(name)."""

    def __init__(self, name, dtype):
        self.name = name
        self.dtype = dtype


def decode_literal(node, ev=None, env=None, q=None):
    """Decode a pure-literal AST node; defers to ev.eval for sub-exprs."""
    if not isinstance(node, dict):
        raise Unsupported(f"literal {node!r}")
    if "int" in node:
        return node["int"]
    if "float" in node:
        return node["float"]
    if "str" in node:
        return node["str"]
    if "bool" in node:
        return node["bool"]
    if "nil" in node:
        return None
    if "atom" in node:
        a = node["atom"]
        if a in _SPECIAL_ATOMS:
            return _SPECIAL_ATOMS[a]
        return Atom(a)
    if "sigil" in node:
        return _sigil_value(*node["sigil"])
    if "list" in node:
        return [ev.eval(x, env, q) for x in node["list"]]
    if "tuple" in node:
        return tuple(ev.eval(x, env, q) for x in node["tuple"])
    if "kw" in node:
        return {k: ev.eval(v, env, q) for k, v in node["kw"]}
    if "map" in node:
        return {ev.eval(k, env, q): ev.eval(v, env, q) for k, v in node["map"]}
    if "range" in node:
        a = ev.eval(node["range"][0], env, q)
        b = ev.eval(node["range"][1], env, q)
        step = ev.eval(node["range"][2], env, q) if node["range"][2] else 1
        return ERange(a, b, step)
    if "bits" in node:
        return _pack_bits(node["bits"])
    if "duration_struct" in node:
        # %Explorer.Duration{value:, precision:} -> timedelta
        fields = {k: ev.eval(v, env, q) for k, v in node["duration_struct"].items()}
        scale = {"millisecond": 1000, "microsecond": 1, "nanosecond": 1e-3}[
            str(fields["precision"])
        ]
        return dtm.timedelta(microseconds=fields["value"] * scale)
    raise Unsupported(f"literal node {list(node)[:1]}")


def _pack_bits(segs) -> bytes:
    """Elixir bitstring segments [[value, kind, size], ...] -> bytes
    (native = little-endian, matching the reference's -native specs)."""
    import struct

    out = b""
    for v, kind, size in segs:
        if kind == "f":
            out += struct.pack("<f" if size == 32 else "<d", float(v))
        else:
            out += int(v).to_bytes(size // 8, "little", signed=(kind == "s"))
    return out


class ERange:
    """Elixir a..b//s range (both ends inclusive)."""

    def __init__(self, a, b, step=1):
        self.a, self.b, self.step = a, b, step

    def to_list(self):
        return list(range(self.a, self.b + (1 if self.step > 0 else -1), self.step))

    def __iter__(self):
        return iter(self.to_list())

    def __len__(self):
        return len(self.to_list())


# --------------------------------------------------------------------------
# the evaluator
# --------------------------------------------------------------------------

_CAPTURES = {
    "String.upcase": str.upper,
    "String.downcase": str.lower,
    "String.capitalize": str.capitalize,
    "String.trim": str.strip,
    "String.length": len,
    "String.reverse": lambda s: s[::-1],
    "abs": abs,
}

# DataFrame verbs whose arguments are Explorer.Query macro expressions
_DF_MACRO_VERBS = {"filter", "mutate", "summarise", "summarize", "sort_by"}
# Series macro forms use `_` for the series itself
_S_MACRO_VERBS = {"filter", "map", "sort_by"}


class QueryFrame:
    """Stand-in for the reference's lazy frame inside *_with callbacks:
    subscripting yields column Exprs (reference ldf["a"])."""

    def __init__(self, df):
        self._df = df

    def __getitem__(self, name):
        return col(name)


def compile_pure_fn(node):
    """Compile a fn/capture AST into a PURE python callable (literals,
    arithmetic, String.* only — no env, no spark refs) so it can ship to
    executors through transform's pandas_udf without pickling the
    evaluator."""
    if "capture" in node:
        name, _ar = node["capture"]
        if name in _CAPTURES:
            return _CAPTURES[name]
        raise Unsupported(f"pure capture {name}")
    spec = node["fn"]
    params, body = spec["params"], spec["body"]
    # self-contained evaluator: transform ships this closure to Spark
    # executors, so it must not reference module globals (this test
    # module is not importable on workers)
    string_fns = dict(Ev._STRING_FNS)

    def run(*args):
        def ev(node, env):
            if "var" in node:
                if node["var"] in env:
                    return env[node["var"]]
                raise RuntimeError(f"pure fn free var {node['var']}")
            if "op" in node:
                op, l, r = node["op"]
                a, b = ev(l, env), ev(r, env)
                ops = {
                    "+": lambda: a + b, "-": lambda: a - b, "*": lambda: a * b,
                    "/": lambda: a / b, "<>": lambda: str(a) + str(b),
                    "==": lambda: a == b, "!=": lambda: a != b,
                    ">": lambda: a > b, "<": lambda: a < b,
                    ">=": lambda: a >= b, "<=": lambda: a <= b,
                }
                return ops[op]()
            if "unop" in node:
                op, x = node["unop"]
                v = ev(x, env)
                return -v if op == "-" else (not v)
            if "call" in node:
                spec2 = node["call"]
                vals = [
                    ev(a, env)
                    for a in spec2["args"]
                    if not (isinstance(a, dict) and "kw" in a)
                ]
                if spec2.get("mod") == "String" and spec2["fn"] in string_fns:
                    return string_fns[spec2["fn"]](*vals)
                raise RuntimeError(f"pure call {spec2.get('mod')}.{spec2['fn']}")
            for k in ("int", "float", "str", "bool"):
                if k in node:
                    return node[k]
            if "nil" in node:
                return None
            raise RuntimeError(f"pure node {list(node)[:1]}")

        env = dict(zip(params, args))
        out = None
        for var, stmt in body:
            out = ev(stmt, env)
            if var:
                env[var] = out
        return out

    return run


def _pure_eval(node, env):
    if "var" in node:
        if node["var"] in env:
            return env[node["var"]]
        raise Unsupported(f"pure fn free var {node['var']}")
    if "op" in node:
        op, l, r = node["op"]
        a, b = _pure_eval(l, env), _pure_eval(r, env)
        ops = {
            "+": lambda: a + b, "-": lambda: a - b, "*": lambda: a * b,
            "/": lambda: a / b, "<>": lambda: str(a) + str(b),
            "==": lambda: a == b, "!=": lambda: a != b,
            ">": lambda: a > b, "<": lambda: a < b,
            ">=": lambda: a >= b, "<=": lambda: a <= b,
        }
        if op in ops:
            return ops[op]()
        raise Unsupported(f"pure op {op}")
    if "unop" in node:
        op, x = node["unop"]
        v = _pure_eval(x, env)
        return -v if op == "-" else (not v)
    if "call" in node:
        spec = node["call"]
        vals = [_pure_eval(a, env) for a in spec["args"] if not (isinstance(a, dict) and "kw" in a)]
        if spec.get("mod") == "String":
            target = Ev._STRING_FNS.get(spec["fn"])
            if target is None:
                raise Unsupported(f"pure String.{spec['fn']}")
            return target(*vals)
        raise Unsupported(f"pure call {spec.get('mod')}.{spec['fn']}")
    if "int" in node:
        return node["int"]
    if "float" in node:
        return node["float"]
    if "str" in node:
        return node["str"]
    if "bool" in node:
        return node["bool"]
    if "nil" in node:
        return None
    raise Unsupported(f"pure node {list(node)[:1]}")


class Ev:
    def __init__(self, spark):
        self.spark = spark

    # ---- public: run one case, return the final value -------------------
    def run(self, case):
        env = {}
        out = None
        for var, node in case["stmts"]:
            out = self.eval(node, env, None)
            if var:
                env[var] = out
        return out

    # ---- expression evaluation ------------------------------------------
    def eval(self, node, env, q):
        """q: None = value context; "frame" / ("series", Expr) = query ctx."""
        if isinstance(node, dict):
            if "var" in node:
                name = node["var"]
                if name in env:
                    v = env[name]
                    if isinstance(v, ColMeta) and q == "frame":
                        # the comprehension variable IS the column inside
                        # the query body (query.ex __across__)
                        return col(v.name)
                    return v
                if q == "frame":
                    return col(name)
                if isinstance(q, tuple) and q[0] == "series" and name == "_":
                    return q[1]
                if name == "_":
                    raise Unsupported("series _ outside query")
                raise Unsupported(f"unbound var {name}")
            if "call" in node:
                return self.call(node["call"], env, q)
            if "op" in node:
                return self.binop(node["op"], env, q)
            if "unop" in node:
                op, x = node["unop"]
                v = self.eval(x, env, q)
                if op == "-":
                    if isinstance(v, (Expr, Series)):
                        return 0 - v if isinstance(v, Expr) else v.multiply(-1)
                    return -v
                if op == "not":
                    if isinstance(v, Expr):
                        return ~v
                    if isinstance(v, Series):
                        return v.not_()
                    return not v
            if "access" in node:
                base = self.eval(node["access"][0], env, q)
                key = self.eval(node["access"][1], env, q)
                if isinstance(base, QueryFrame):
                    return base[key]
                if isinstance(base, ex.DataFrame):
                    # df["a"] pulls; df[[..]] / df[0..2] / df[~r/../]
                    # select (reference Access impl, data_frame.ex:154+)
                    if isinstance(key, (str, Atom)) or (
                        isinstance(key, int) and not isinstance(key, bool)
                    ):
                        return base.pull(str(key) if isinstance(key, Atom) else key)
                    if isinstance(key, ERange):
                        key = range(key.a, key.b + 1, key.step)
                    return base.select(_selector(key))
                if isinstance(base, dict):
                    return base.get(str(key))
                if isinstance(base, Series):
                    return base.at(key)
                raise Unsupported(f"access on {type(base).__name__}")
            if "fn" in node:
                return self.make_fn(node["fn"], env)
            if "capture" in node:
                name, _ar = node["capture"]
                if name in _CAPTURES:
                    return _CAPTURES[name]
                if name.startswith("Explorer.Series."):
                    fnname = name.split(".")[-1]
                    return lambda *a: self.series_call(fnname, list(a), env)
                raise Unsupported(f"capture {name}")
            if "pin" in node:
                # ^expr — evaluated eagerly OUTSIDE the query context
                return self.eval(node["pin"], env, None)
            if "interp" in node:
                # "#{expr}text" — meta-level string building (e.g. the
                # dynamic mutation names in across comprehensions)
                out = []
                for p in node["interp"]:
                    if isinstance(p, dict) and "str" in p:
                        out.append(p["str"])
                    else:
                        v = self.eval(p, env, None)
                        if isinstance(v, ColMeta):
                            v = v.name
                        out.append(str(v))
                return "".join(out)
            if "cond" in node:
                # query conditionals (query.ex __cond__): first true
                # clause top-down; fold bottom-up into select chains
                acc = None
                for c, v in reversed(node["cond"]):
                    cv = self.eval(c, env, q)
                    vv = self.eval(v, env, q)
                    if not isinstance(vv, Expr):
                        vv = lit(vv)
                    if cv is True:
                        acc = vv
                    else:
                        acc = f.select(cv, vv, acc if acc is not None else lit(None))
                return acc
            if "for_comp" in node:
                raise Unsupported("for-comprehension outside a verb argument")
            if "qualified" in node:
                # a.b on a bound variable (col.name / col.dtype in
                # comprehension filters)
                parts = node["qualified"].split(".")
                if parts[0] in env:
                    v = env[parts[0]]
                    for p in parts[1:]:
                        if isinstance(v, dict):
                            v = v.get(p)
                        else:
                            v = getattr(v, p)
                    return v
                raise Unsupported(f"qualified {node['qualified']}")
            if "kwpair" in node:
                raise Unsupported("stray kwpair")
            return decode_literal(node, self, env, q)
        raise Unsupported(f"node {node!r}")

    def binop(self, spec, env, q):
        op, l, r = spec
        a = self.eval(l, env, q)
        b = self.eval(r, env, q)
        if isinstance(a, Series) or isinstance(b, Series):
            sm = {
                "+": "add", "-": "subtract", "*": "multiply", "/": "divide",
                "==": "equal", "!=": "not_equal", ">": "greater",
                ">=": "greater_equal", "<": "less", "<=": "less_equal",
                "and": "binary_and", "or": "binary_or",
            }
            if op in sm:
                s, o = (a, b) if isinstance(a, Series) else (b, a)
                if s is a:
                    return getattr(a, sm[op])(b)
                # reflected: build via the other side
                if op in ("+", "*", "==", "!="):
                    return getattr(b, sm[op])(a)
                raise Unsupported(f"reflected series op {op}")
        if isinstance(a, Expr) or isinstance(b, Expr):
            pm = {
                "+": lambda x, y: x + y, "-": lambda x, y: x - y,
                "*": lambda x, y: x * y, "/": lambda x, y: x / y,
                "==": lambda x, y: x == y, "!=": lambda x, y: x != y,
                ">": lambda x, y: x > y, ">=": lambda x, y: x >= y,
                "<": lambda x, y: x < y, "<=": lambda x, y: x <= y,
                "and": lambda x, y: x & y, "or": lambda x, y: x | y,
                # string concatenation inside a query (query_test.exs:235)
                "<>": lambda x, y: f.concat(
                    x if isinstance(x, Expr) else lit(x),
                    y if isinstance(y, Expr) else lit(y),
                ),
            }
            if op in pm:
                return pm[op](a, b)
            raise Unsupported(f"expr op {op}")
        pm = {
            "+": lambda x, y: x + y, "-": lambda x, y: x - y,
            "*": lambda x, y: x * y, "/": lambda x, y: x / y,
            "==": lambda x, y: x == y, "!=": lambda x, y: x != y,
            ">": lambda x, y: x > y, ">=": lambda x, y: x >= y,
            "<": lambda x, y: x < y, "<=": lambda x, y: x <= y,
            "<>": lambda x, y: x + y, "and": lambda x, y: x and y,
            "or": lambda x, y: x or y, "++": lambda x, y: x + y,
        }
        if op in pm:
            return pm[op](a, b)
        raise Unsupported(f"op {op}")

    def make_fn(self, spec, env):
        params, body = spec["params"], spec["body"]
        ev = self

        def run(*args):
            if len(args) != len(params):
                # arity mismatch must surface as TypeError so callers'
                # 1-arg/2-arg probing (frame._resolve) can fall through
                raise TypeError(f"fn/{len(params)} called with {len(args)} args")
            child = dict(env)
            for p, a in zip(params, args):
                child[p] = a
            out = None
            for var, stmt in body:
                out = ev.eval(stmt, child, None)
                if var:
                    child[var] = out
            return out

        run.__doctest_params__ = params
        return run

    # ---- call dispatch ----------------------------------------------------
    def call(self, spec, env, q):
        mod, fn = spec.get("mod"), spec["fn"]
        args = spec["args"]
        if mod in ("Explorer.DataFrame", "DataFrame", "DF"):
            return self.df_call(fn, args, env)
        if mod in ("Explorer.Series", "Series", "S"):
            return self.series_call(fn, args, env, q)
        if mod in ("Explorer.Datasets", "Datasets"):
            from explorer_spark import datasets

            return getattr(datasets, fn)(spark=self.spark)
        if mod == "Enum":
            return self.enum_call(fn, args, env)
        if mod == "Nx":
            return self.nx_call(fn, args, env)
        if mod == "String":
            return self.string_call(fn, args, env, q)
        if mod is None:
            recv = spec.get("recv")
            if recv is not None:
                rv = self.eval(recv, env, q)
                # :math.pi() etc. (Erlang stdlib)
                if isinstance(rv, Atom) and rv == "math":
                    target = getattr(math, fn, None)
                    if target is None:
                        raise Unsupported(f":math.{fn}")
                    vals, _ = self.eval_args(args, env, q)
                    return target(*vals) if callable(target) else target
                raise Unsupported(f"recv call on {type(rv).__name__}")
            if fn in ("if", "unless"):
                # query.ex if/2, unless/2 — do:/else: keyword clauses.
                # Pinned (^if ...) runs eagerly on a plain boolean; in a
                # query it lowers to a select over the predicate.
                vals, kw = self.eval_args(args, env, q)
                cond = vals[0]
                do_v, else_v = kw.get("do"), kw.get("else")
                if fn == "unless":
                    do_v, else_v = else_v, do_v
                if isinstance(cond, Expr):
                    tv = do_v if isinstance(do_v, Expr) else lit(do_v)
                    fv = else_v if isinstance(else_v, Expr) else lit(else_v)
                    return f.select(cond, tv, fv)
                return do_v if cond else else_v
            if fn == "add_columns" and len(args) == 1:
                # the defn from tensor_frame.ex's module doc (:13-15):
                # tf[:a] + tf[:b] over the frame's tensor view
                import numpy as np

                frame = self.eval(args[0], env, None)
                cols = frame.to_columns()
                return np.array(cols["a"], dtype="int64") + np.array(
                    cols["b"], dtype="int64"
                )
            # bare call: query-context function
            if q is not None:
                return self.query_fn(fn, args, env, q)
            raise Unsupported(f"bare call {fn} outside query")
        raise Unsupported(f"module {mod}")

    _STRING_FNS = {
        "upcase": str.upper, "downcase": str.lower, "capitalize": str.capitalize,
        "trim": str.strip, "length": len, "reverse": lambda s: s[::-1],
        "starts_with?": str.startswith, "ends_with?": str.endswith,
        "contains?": lambda s, sub: sub in s,
        "replace": lambda s, a, b: s.replace(a, b),
        "slice": lambda s, a, n=None: s[a:] if n is None else s[a:a + n],
        "duplicate": lambda s, n: s * n,
        "split": lambda s, sep=None: s.split(sep),
        "pad_leading": lambda s, n, p=" ": s.rjust(n, p),
        "pad_trailing": lambda s, n, p=" ": s.ljust(n, p),
        "trim_leading": lambda s, c=None: s.lstrip(c),
        "trim_trailing": lambda s, c=None: s.rstrip(c),
        "first": lambda s: s[:1],
        "at": lambda s, i: s[i] if -len(s) <= i < len(s) else None,
    }

    def string_call(self, fn, args, env, q):
        target = self._STRING_FNS.get(fn)
        if target is None:
            raise Unsupported(f"String.{fn}")
        vals, _ = self.eval_args(args, env, q)
        return target(*vals)

    _NX_TYPES = {
        "s8": "int8", "s16": "int16", "s32": "int32", "s64": "int64",
        "u8": "uint8", "u16": "uint16", "u32": "uint32", "u64": "uint64",
        "f32": "float32", "f64": "float64",
    }

    def nx_call(self, fn, args, env):
        """Nx tensors stand in as numpy arrays (Series.from_tensor and
        the tensor put/4 accept them); Nx's default int type is s32."""
        import numpy as np

        if fn in ("concatenate", "stack"):
            # DataFrames auto-convert to tensors column by column
            # (tensor_frame.ex Nx integration doctests)
            vals, kw = self.eval_args(args, env, None)
            frame = vals[0]
            cols = frame.to_columns()
            dts = frame.dtypes

            def np_dtype(d):
                if isinstance(d, tuple) and d[0] in ("s", "u", "f"):
                    base = {"s": "int", "u": "uint", "f": "float"}[d[0]]
                    return f"{base}{d[1]}"
                return "int64"

            arrs = [np.array(cols[n], dtype=np_dtype(dts[n])) for n in frame.names]
            if fn == "concatenate":
                return np.concatenate(arrs)
            axis = kw.get("axis", 0)
            return np.stack(arrs, axis=int(axis))
        if fn != "tensor":
            raise Unsupported(f"Nx.{fn}")
        vals, kw = self.eval_args(args, env, None)
        data = vals[0]
        t = kw.get("type")
        if t is not None:
            np_t = self._NX_TYPES.get(str(t))
            if np_t is None:
                raise Unsupported(f"Nx type {t}")
            return np.array(data, dtype=np_t)
        # Nx defaults: s32 for ints, f32 for floats
        flat = data if isinstance(data, list) else [data]
        if any(isinstance(v, float) for v in flat):
            return np.array(data, dtype="float32")
        return np.array(data, dtype="int32")

    def enum_call(self, fn, args, env):
        if fn in ("map",):
            seq = self.eval(args[0], env, None)
            f_ = self.eval(args[1], env, None)
            return [f_(x) for x in seq]
        if fn in ("to_list",):
            return list(self.eval(args[0], env, None))
        if fn in ("count",):
            return len(list(self.eval(args[0], env, None)))
        raise Unsupported(f"Enum.{fn}")

    # ---- query-context bare functions (Explorer.Query auto-imports) -----
    def query_fn(self, fn, args, env, q):
        vals, kw = self.eval_args(args, env, q)
        if fn == "col":
            return col(vals[0])
        target = getattr(f, fn, None)
        if target is None and fn == "if_else":
            return f.when(vals[0], vals[1]).otherwise(vals[2])
        if target is None:
            # Expr fluent method?
            if vals and isinstance(vals[0], Expr) and hasattr(vals[0], fn):
                return getattr(vals[0], fn)(*vals[1:], **kw)
            raise Unsupported(f"query fn {fn}")
        return target(*vals, **kw)

    def eval_args(self, args, env, q):
        """Evaluate call args; a trailing {"kw": ...} becomes kwargs."""
        kw = {}
        vals = []
        for a in args:
            if isinstance(a, dict) and "kw" in a and a is args[-1]:
                for k, v in a["kw"]:
                    kw[k] = self.eval(v, env, q)
            else:
                vals.append(self.eval(a, env, q))
        return vals, kw

    # ---- Series dispatch --------------------------------------------------
    def series_call(self, fn, args, env, q=None):
        # macro forms: second arg is a query expression over `_`
        if fn in _S_MACRO_VERBS and len(args) >= 2 and not _is_fn(args[1]):
            s = self.eval(args[0], env, None)
            if not isinstance(s, Series):
                raise Unsupported("series macro on non-series")
            method = {"filter": "filter", "map": "map", "sort_by": "sort_with"}[fn]
            ev = self
            kw = self._series_sort_kwargs(args[2:], env) if fn == "sort_by" else {}

            def body(c):
                return ev.eval(args[1], env, ("series", c))

            return getattr(s, method)(body, **kw)
        if fn in ("filter_with", "map_with", "sort_with") and len(args) >= 2:
            s = self.eval(args[0], env, None)
            cb = self.eval(args[1], env, None)
            method = {"filter_with": "filter", "map_with": "map", "sort_with": "sort_with"}[fn]
            kw = self._series_sort_kwargs(args[2:], env) if fn == "sort_with" else {}
            return getattr(s, method)(lambda c: cb(c), **kw)
        if fn == "transform" and len(args) >= 2 and _is_fn(args[1]):
            # compile the callback as a PURE function (no env/spark refs)
            # — Series.transform ships it to executors via pandas_udf
            s = self.eval(args[0], env, None)
            return s.transform(compile_pure_fn(args[1]))
        if fn == "format":
            parts = self.eval(args[0], env, q)
            return Series.format(parts)
        if fn == "to_enum":
            # Elixir Enumerable protocol -> python iterator (Series
            # streams rows via __iter__ / to_rows_stream underneath)
            vals, _ = self.eval_args(args, env, None)
            return iter(vals[0])
        if fn == "from_binary":
            vals, _kw = self.eval_args(args, env, None)
            return Series.from_binary(vals[0], dtype_from_ast(args[1]), spark=self.spark)
        if fn == "from_tensor":
            vals, kw = self.eval_args(args, env, None)
            dtype = None
            if "dtype" in kw and isinstance(args[-1], dict) and "kw" in args[-1]:
                for k, v in args[-1]["kw"]:
                    if k == "dtype":
                        dtype = dtype_from_ast(v)
            return Series.from_tensor(vals[0], dtype=dtype, spark=self.spark)
        if fn == "replace":
            vals, kw = self.eval_args(args, env, None)
            import numpy as np

            if len(vals) == 2 and isinstance(vals[1], np.ndarray):
                # tensor contents-conversion form: list path keeps dtype
                return vals[0].replace([v.item() for v in vals[1]])
            recv = vals[0]
            if isinstance(recv, Expr):
                return f.replace(recv, *vals[1:])
            return recv.replace(*vals[1:])
        if fn == "from_list":
            vals, kw = self.eval_args(args, env, None)
            data = vals[0]
            if isinstance(data, ERange):
                data = data.to_list()
            dtype = None
            if "dtype" in kw:
                # kw was already evaluated; re-derive from the raw AST to
                # keep tuple dtype structure
                raw = args[-1]["kw"]
                for k, v in raw:
                    if k == "dtype":
                        dtype = dtype_from_ast(v)
            return Series.from_list(data, dtype=dtype, name="", spark=self.spark)
        if fn in ("window_sum", "window_mean", "window_median", "window_min", "window_max", "window_standard_deviation"):
            vals, kw = self.eval_args(args, env, q)
            if "min_periods" in kw and kw["min_periods"] is None:
                # reference: min_periods: nil means "the full window"
                kw["min_periods"] = vals[1]
            recv = vals[0]
            if isinstance(recv, Expr):
                return getattr(f, fn)(*vals, **kw)
            return getattr(recv, fn)(*vals[1:], **kw)
        vals, kw = self.eval_args(args, env, q)
        if fn == "cast" and len(vals) >= 2:
            raw = args[1]
            try:
                vals = [vals[0], dtype_from_ast(raw)]
            except Unsupported:
                raise
        name = _SERIES_RENAMES.get(fn, fn)
        recv = vals[0]
        rest = vals[1:]
        if isinstance(recv, Expr):
            # lazy context (inside *_with callbacks): route to f.*
            target = getattr(f, name, None)
            if target is None:
                raise Unsupported(f"f.{name}")
            return target(recv, *rest, **kw)
        if isinstance(recv, list):
            if fn in ("format", "concat", "coalesce") and recv and isinstance(recv[0], Series):
                # module-level list form: Series.format([s1, s2])
                first, others = recv[0], recv[1:]
                return getattr(first, name)(others) if fn != "coalesce" else first.coalesce(*others)
            if fn == "to_list":
                return recv  # to_columns gave a plain list already
            raise Unsupported(f"Series.{fn} on list")
        if not isinstance(recv, Series):
            if rest and isinstance(rest[0], Expr):
                # lazy context (inside sort_with captures): scalar-first
                # form over an Expr operand
                opmap = {
                    "add": "add", "multiply": "multiply", "subtract": "subtract",
                    "divide": "divide", "pow": "pow", "quotient": "quotient",
                    "remainder": "remainder",
                }
                if fn in opmap:
                    return Expr(opmap[fn], lit(recv), rest[0])
            # scalar-first reflected forms: Series.multiply(2, s),
            # Series.subtract(2, s) — build via the map DSL
            if rest and isinstance(rest[0], Series):
                s0 = rest[0]
                refl = {
                    "add": lambda c: c + recv, "multiply": lambda c: c * recv,
                    "subtract": lambda c: (lit(recv) - c), "divide": lambda c: (lit(recv) / c),
                    "pow": lambda c: Expr("pow", lit(recv), c),
                    "quotient": lambda c: Expr("quotient", lit(recv), c),
                    "remainder": lambda c: Expr("remainder", lit(recv), c),
                    "equal": lambda c: c == recv, "not_equal": lambda c: c != recv,
                    "greater": lambda c: lit(recv) > c, "less": lambda c: lit(recv) < c,
                }.get(fn)
                if refl is not None:
                    return s0.map(refl)
            raise Unsupported(f"Series.{fn} on {type(recv).__name__}")
        target = getattr(recv, name, None)
        if target is None:
            raise Unsupported(f"Series.{fn}")
        if not callable(target):
            if rest or kw:
                raise Unsupported(f"Series.{fn} args on attr")
            return target
        kw = {_S_OPT_RENAMES.get(k, k): v for k, v in kw.items()}
        if fn in ("sort", "argsort"):
            if "direction" in kw:
                kw["descending"] = str(kw.pop("direction")) == "desc"
            if "nils" in kw:
                kw["nils_last"] = str(kw.pop("nils")) == "last"
        if fn == "rank" and "method" in kw:
            rest = [str(kw.pop("method"))] + rest
        return target(*rest, **kw)

    def _series_sort_kwargs(self, argnodes, env):
        kw = {}
        for a in argnodes:
            if isinstance(a, dict) and "kw" in a:
                for k, v in a["kw"]:
                    val = self.eval(v, env, None)
                    if k == "direction":
                        kw["direction"] = str(val)
                    elif k == "nils":
                        kw["nils_last"] = str(val) == "last"
        return kw

    # ---- DataFrame dispatch ------------------------------------------------
    def df_call(self, fn, args, env):
        if fn in ("new",):
            # `new(a: [...], b: [...])` — the data IS the kwlist; a
            # trailing dtypes: entry is an option, not a column
            dtypes = None
            raw = args[-1] if args else None
            if isinstance(raw, dict) and "kw" in raw:
                pairs = [(k, v) for k, v in raw["kw"]]
                dts_pairs = [(k, v) for k, v in pairs if k == "dtypes"]
                if dts_pairs:
                    dspec = dts_pairs[0][1]
                    dtypes = {
                        k: dtype_from_ast(v) for k, v in dspec.get("kw", [])
                    }
                    raw = {"kw": [(k, v) for k, v in pairs if k != "dtypes"]}
                    args = args[:-1] + [raw]
            vals, kw = self.eval_args(args, env, None)
            data = vals[0] if vals else kw
            import numpy as np

            if isinstance(data, np.ndarray) and data.ndim == 2:
                # 2-D tensor: columns x1..xN of the tensor's dtype
                # (reference data_frame.ex:1823)
                df = None
                for i in range(data.shape[1]):
                    s = Series.from_tensor(data[:, i], name=f"x{i + 1}", spark=self.spark)
                    df = s.to_frame() if df is None else df.put(f"x{i + 1}", s)
                return df
            if isinstance(data, list):
                rows = [
                    {str(k): v for k, v in r.items()} if isinstance(r, dict) else r
                    for r in data
                ]
                return ex.from_rows(rows, spark=self.spark)
            if isinstance(data, dict):
                has_series = any(isinstance(v, Series) for v in data.values())
                if dtypes or has_series:
                    # build typed columns through Series.from_list (the
                    # ingestion rules) and assemble with put
                    df = None
                    for k, v in data.items():
                        k = str(k)
                        s = v if isinstance(v, Series) else Series.from_list(
                            list(v), dtype=(dtypes or {}).get(k), name=k, spark=self.spark
                        )
                        df = s.to_frame() if df is None else df.put(k, s)
                        if df.names[-1] != k:
                            df = df.rename({df.names[-1]: k})
                    return df
                cols = {}
                for k, v in data.items():
                    cols[str(k)] = v.to_list() if isinstance(v, ERange) else v
                return ex.from_columns(cols, spark=self.spark)
            raise Unsupported("DataFrame.new arg")
        if fn in _DF_MACRO_VERBS:
            df = self.eval(args[0], env, None)
            return self.df_macro(fn, df, args[1:], env)
        if fn in ("filter_with", "mutate_with", "summarise_with", "sort_with", "summarize_with"):
            df = self.eval(args[0], env, None)
            cb = self.eval(args[1], env, None)
            _, optkw = self.eval_args(args[2:], env, None)
            res = cb(QueryFrame(df))
            if fn == "filter_with":
                preds = res if isinstance(res, list) else [res]
                return df.filter(*preds)
            if fn in ("mutate_with", "summarise_with", "summarize_with"):
                if not isinstance(res, dict):
                    raise Unsupported(f"{fn} result {type(res).__name__}")
                method = "mutate" if fn == "mutate_with" else "summarise"
                mkw = {}
                if fn == "mutate_with" and "keep" in optkw:
                    mkw["keep"] = str(optkw["keep"])
                return getattr(df, method)(**mkw, **{str(k): v for k, v in res.items()})
            # sort_with: kwlist of direction: expr, or expr / list of exprs
            keys, desc = _sort_spec(res)
            skw = {}
            if "nils" in optkw:
                skw["nils_last"] = str(optkw["nils"]) == "last"
            return df.sort_by(*keys, descending=desc, **skw)
        if fn == "rename_with":
            vals, kw = self.eval_args(args, env, None)
            df = vals[0]
            rest = vals[1:]
            if len(rest) == 1:
                return df.rename_with(rest[0])
            return df.rename_with(rest[1], rest[0])
        if fn in ("concat_rows", "concat_columns"):
            vals, kw = self.eval_args(args, env, None)
            if len(vals) == 1 and isinstance(vals[0], list):
                first, others = vals[0][0], vals[0][1:]
            else:
                first, others = vals[0], vals[1:]
            return getattr(first, fn)(*others)
        vals, kw = self.eval_args(args, env, None)
        df = vals[0]
        rest = list(vals[1:])
        if not isinstance(df, ex.DataFrame) and not fn.startswith("load_"):
            raise Unsupported(f"DataFrame.{fn} on {type(df).__name__}")
        return self.df_plain(fn, df, rest, kw)

    def _across_names(self, gen, df, env):
        if not (isinstance(gen, dict) and "call" in gen and gen["call"]["fn"] == "across"):
            raise Unsupported("for-comprehension generator must be across/0,1")
        gargs = gen["call"]["args"]
        if not gargs:
            return df.names
        sel = self.eval(gargs[0], env, None)
        if isinstance(sel, ERange):
            return [df.names[i] for i in range(sel.a, sel.b + 1, sel.step)]
        if isinstance(sel, re.Pattern):
            return [n for n in df.names if sel.search(n)]
        if isinstance(sel, list):
            return [
                df.names[x] if isinstance(x, int) and not isinstance(x, bool) else str(x)
                for x in sel
            ]
        return [str(sel)]

    def expand_for_comp(self, node, df, env):
        """`for col <- across(sel)[, col2 <- across(sel2)][, FILTER] do
        BODY end` — expand driver-side into the list of per-column query
        expressions (query.ex module doc: across traverses COLUMN META,
        the body builds the lazy expressions; multiple generators form a
        cross product, query_test.exs:215)."""
        spec = node["for_comp"]
        gens = spec.get("gens") or [[spec["var"], spec["gen"]]]
        dtypes = df.dtypes
        envs = [dict(env)]
        for var, gen in gens:
            names = self._across_names(gen, df, env)
            envs = [
                {**e, var: ColMeta(n, dtypes[n])} for e in envs for n in names
            ]
        out = []
        for env2 in envs:
            if all(bool(self.eval(flt, env2, None)) for flt in spec["filters"]):
                out.append(self.eval(spec["body"], env2, "frame"))
        return out

    def df_macro(self, fn, df, argnodes, env):
        if fn == "sort_by":
            # args: direction-keyed kwlists ([desc: a]), bare exprs, and a
            # trailing options kwlist (nils:/stable:)
            keys, desc, opts = [], [], {}
            for a in argnodes:
                if isinstance(a, dict) and "kw" in a:
                    for k, v in a["kw"]:
                        if k in ("asc", "desc"):
                            keys.append(self.eval(v, env, "frame"))
                            desc.append(k == "desc")
                        elif k == "nils":
                            opts["nils_last"] = str(self.eval(v, env, None)) == "last"
                        elif k == "stable":
                            opts["stable"] = self.eval(v, env, None)
                        else:
                            raise Unsupported(f"sort_by option {k}")
                else:
                    got = self.eval(a, env, "frame")
                    for g in got if isinstance(got, list) else [got]:
                        keys.append(g)
                        desc.append(False)
            return df.sort_by(*keys, descending=desc, **opts)
        if fn == "filter":
            preds = []
            for a in argnodes:
                if isinstance(a, dict) and "for_comp" in a:
                    # filter comprehensions yield a list of conditions,
                    # joined with `and` (query.ex module doc)
                    preds.extend(self.expand_for_comp(a, df, env))
                    continue
                got = self.eval(a, env, "frame")
                preds.extend(got if isinstance(got, list) else [got])
            return df.filter(*preds)
        # mutate / summarise: kwlist (or map) of name: expr
        exprs = {}
        for a in argnodes:
            if isinstance(a, dict) and "kw" in a:
                for k, v in a["kw"]:
                    exprs[str(k)] = self.eval(v, env, "frame")
            elif isinstance(a, dict) and "map" in a:
                for k, v in a["map"]:
                    exprs[str(self.eval(k, env, None))] = self.eval(v, env, "frame")
            elif isinstance(a, dict) and "for_comp" in a:
                # mutation comprehensions yield {name, expr} tuples
                for pair in self.expand_for_comp(a, df, env):
                    if not (isinstance(pair, tuple) and len(pair) == 2):
                        raise Unsupported(f"{fn} comprehension body must be a 2-tuple")
                    exprs[str(pair[0])] = pair[1]
            else:
                raise Unsupported(f"{fn} non-kw arg")
        method = "summarise" if fn in ("summarise", "summarize") else fn
        return getattr(df, method)(**exprs)

    def df_plain(self, fn, df, rest, kw):
        kw = {str(k): v for k, v in kw.items()}
        if fn in ("head", "tail"):
            return getattr(df, fn)(*rest)
        if fn == "slice":
            if rest and isinstance(rest[0], ERange):
                return df.slice(rest[0].to_list())
            return df.slice(*rest)
        if fn == "sample":
            return df.sample(
                rest[0],
                replace=kw.get("replace", False),
                seed=kw.get("seed"),
                shuffle=kw.get("shuffle", False),
            )
        if fn == "join":
            jkw = {}
            if "how" in kw:
                jkw["how"] = str(kw["how"])
            if "on" in kw:
                on = kw["on"]
                if isinstance(on, dict):
                    on = [(str(k), str(v)) for k, v in on.items()]
                elif isinstance(on, (str, Atom)):
                    on = [str(on)]
                jkw["on"] = on
            if "nulls_equal" in kw:
                jkw["nulls_equal"] = kw["nulls_equal"]
            return df.join(rest[0], **jkw)
        if fn == "rename":
            m = rest[0] if rest else kw
            if isinstance(m, list):
                return df.rename(dict(zip(df.names, [str(x) for x in m])))
            return df.rename({str(k): str(v) for k, v in m.items()})
        if fn in ("select", "discard", "explode", "unnest", "dummies", "frequencies", "drop_nil", "distinct"):
            sel = rest[0] if rest else None
            sel = _selector(sel)
            if fn == "distinct":
                return df.distinct(sel, keep_all=kw.get("keep_all", False)) if sel is not None or kw else df.distinct()
            if sel is None and fn == "drop_nil":
                return df.drop_nil()
            return getattr(df, fn)(sel)
        if fn == "relocate":
            def _anchor(v):
                # int anchors are positions; atoms/strings are names
                if v is None or isinstance(v, bool):
                    return None
                return v if isinstance(v, int) else str(v)

            return df.relocate(
                _selector(rest[0]),
                before=_anchor(kw.get("before")),
                after=_anchor(kw.get("after")),
            )
        if fn == "put":
            name = str(rest[0])
            v = rest[1]
            pkw = {}
            if "dtype" in kw:
                dv = kw["dtype"]
                pkw["dtype"] = "infer" if str(dv) == "infer" else _dtype_value(dv)
            return df.put(name, v, **pkw)
        if fn == "pull":
            return df.pull(str(rest[0]) if not isinstance(rest[0], int) else rest[0])
        if fn in ("to_table_string", "print"):
            tkw = {}
            if "limit" in kw:
                lv = kw["limit"]
                tkw["limit"] = "infinity" if str(lv) == "infinity" else int(lv)
            if "limit_dots" in kw:
                tkw["limit_dots"] = str(kw["limit_dots"])
            if fn == "print":
                df.print(**tkw)
                return None
            return df.to_table_string(**tkw)
        if fn in ("group_by",):
            # the reference's :stable defaults to false (unspecified group
            # order), but the PRINTED doctest outputs reflect polars'
            # single-threaded small-data behavior, which is first-
            # appearance order — replaying them on a distributed engine
            # needs stable=True to reproduce the same deterministic order
            gkw = {"stable": True}
            if "stable" in kw:
                gkw["stable"] = kw["stable"]
            sel = rest[0] if len(rest) == 1 else rest
            if isinstance(sel, ERange):
                sel = [df.names[i] for i in range(sel.a, sel.b + 1, sel.step)]
            if isinstance(sel, list):
                return df.group_by(*[str(x) if isinstance(x, (str, Atom)) else df.names[x] for x in sel], **gkw)
            return df.group_by(str(sel), **gkw)
        if fn == "ungroup":
            if not rest:
                return df.ungroup()
            sel = rest[0] if isinstance(rest[0], list) else rest
            return df.ungroup(*[str(x) for x in sel])
        if fn == "groups":
            return df.groups
        if fn == "pivot_wider":
            pkw = {}
            if "id_columns" in kw:
                pkw["id_columns"] = _selector(kw["id_columns"])
            if "names_prefix" in kw:
                pkw["names_prefix"] = kw["names_prefix"]
            return df.pivot_wider(str(rest[0]), _strlist(rest[1]), **pkw)
        if fn == "pivot_longer":
            pkw = {}
            for k in ("names_to", "values_to"):
                if k in kw:
                    pkw[k] = str(kw[k])
            if "discard" in kw:
                pkw["discard"] = _selector(kw["discard"])
            if "select" in kw:
                pkw["select"] = _selector(kw["select"])
            return df.pivot_longer(_selector(rest[0]), **pkw)
        if fn == "transpose":
            tkw = {}
            if "header" in kw:
                h = kw["header"]
                tkw["header"] = str(h) if isinstance(h, (Atom, str)) else h
            if "columns" in kw:
                tkw["columns"] = _strlist(kw["columns"])
            return df.transpose(**tkw)
        if fn == "describe":
            if "percentiles" in kw:
                return df.describe(percentiles=kw["percentiles"])
            return df.describe()
        if fn in ("to_columns", "to_rows"):
            return getattr(df, fn)()
        if fn == "to_rows_stream":
            return df.to_rows_stream()
        if fn == "to_series":
            # reference to_series/2: a MAP of column name -> Series
            return {n: df.pull(n) for n in df.names}
        if fn in ("dump_csv", "dump_csv!", "dump_ndjson", "dump_ndjson!"):
            import explorer_spark.sources as _src

            dumper = getattr(_src, fn.rstrip("!"), None)
            if dumper is None:
                raise Unsupported(f"sources.{fn}")
            out = dumper(df, **{str(k): v for k, v in kw.items()})
            return out if fn.endswith("!") else (Atom("ok"), out)
        if fn in ("load_csv", "load_csv!", "load_ndjson", "load_ndjson!"):
            import explorer_spark.sources as _src

            loader = getattr(_src, fn.rstrip("!"), None)
            if loader is None:
                raise Unsupported(f"sources.{fn}")
            # df slot is actually the string payload for load_*
            return loader(df, **{str(k): v for k, v in kw.items()})
        if fn == "mask":
            return df.mask(rest[0])
        if fn in ("n_rows", "n_columns", "nil_count", "names", "dtypes", "shape", "transform", "estimated_size"):
            attr = getattr(df, fn)
            return attr(*rest) if callable(attr) else attr
        if fn == "concat_rows":
            return df.concat_rows(*rest)
        target = getattr(df, fn, None)
        if target is None:
            raise Unsupported(f"DataFrame.{fn}")
        # atoms that survive to here must become plain str: Atom is a
        # test-support class executors cannot unpickle, and kernels
        # (join_asof's merge-asof, among others) capture option values
        # in closures shipped to workers
        rest = [str(x) if isinstance(x, Atom) else x for x in rest]
        kw = {
            k: (str(v) if isinstance(v, Atom) else v)
            for k, v in kw.items()
        }
        if "by" in kw and isinstance(kw["by"], (str, Atom, list)):
            b = kw["by"]
            kw["by"] = [str(x) for x in b] if isinstance(b, list) else [str(b)]
        return target(*rest, **kw)


_SERIES_RENAMES = {
    "in": "isin", "not": "not_", "count_nil": "nil_count",
    "all?": "all", "any?": "any", "size": "size",
    "and": "binary_and", "or": "binary_or", "member?": "member",
}
_S_OPT_RENAMES = {}


def _is_fn(node):
    return isinstance(node, dict) and ("fn" in node or "capture" in node)


def _sort_spec(res):
    if isinstance(res, dict):
        keys, desc = [], []
        for k, v in res.items():
            keys.append(v)
            desc.append(str(k) == "desc")
        return keys, desc
    if isinstance(res, list):
        return res, False
    return [res], False


def _optstr(v):
    return None if v is None else str(v)


def _dtype_value(v):
    """Evaluated dtype VALUE (atoms/tuples already decoded) -> our dtype."""
    if isinstance(v, (Atom, str)):
        return _ATOM_DTYPES.get(str(v), str(v))
    if isinstance(v, tuple):
        head = str(v[0])
        if head in ("s", "u", "f"):
            return (head, int(v[1]))
        if head in ("naive_datetime", "datetime", "duration"):
            unit = _UNIT.get(str(v[1]), str(v[1]))
            if head == "datetime" and len(v) > 2:
                return (head, unit, str(v[2]))
            return (head, unit)
        if head == "list":
            return ("list", _dtype_value(v[1]))
        if head == "decimal":
            return ("decimal", int(v[1]), int(v[2]))
    return v


def _strlist(v):
    if isinstance(v, list):
        return [str(x) for x in v]
    return str(v)


def _selector(sel):
    if sel is None:
        return None
    if isinstance(sel, ERange):
        return sel.to_list()
    if isinstance(sel, list):
        return [str(x) if isinstance(x, Atom) else x for x in sel]
    if isinstance(sel, Atom):
        return str(sel)
    return sel


# --------------------------------------------------------------------------
# expected-value comparison
# --------------------------------------------------------------------------

def decode_expected(v):
    """Rendered-literal JSON -> python value."""
    if isinstance(v, dict):
        if "__sigil__" in v:
            return _sigil_value(*v["__sigil__"])
        if "__nan__" in v:
            return float("nan")
        if "__inf__" in v:
            return float("inf") * v["__inf__"]
        if "__atom__" in v:
            a = v["__atom__"]
            return _SPECIAL_ATOMS.get(a, Atom(a))
        if "__map__" in v:
            return {k: decode_expected(x) for k, x in v["__map__"]}
        if "__tuple__" in v:
            return tuple(decode_expected(x) for x in v["__tuple__"])
        if "__duration_str__" in v:
            return _parse_duration(v["__duration_str__"])
        if "__bits__" in v:
            return _pack_bits(v["__bits__"])
        if "__prefix_list__" in v:
            return _PrefixList(decode_expected(x) for x in v["__prefix_list__"])
    if isinstance(v, list):
        return [decode_expected(x) for x in v]
    return v


_DUR_UNITS = {
    "d": 86_400_000_000, "h": 3_600_000_000, "m": 60_000_000,
    "s": 1_000_000, "ms": 1_000, "us": 1, "µs": 1,
}


def _parse_duration(s):
    total_us = 0.0
    neg = s.strip().startswith("-")
    for num, unit in re.findall(r"(-?\d+(?:\.\d+)?)(d|h|ms|us|µs|ns|m|s)", s):
        if unit == "ns":
            total_us += float(num) / 1000.0
        else:
            total_us += float(num) * _DUR_UNITS[unit]
    if neg and total_us > 0:
        total_us = -abs(total_us)
    return dtm.timedelta(microseconds=total_us)


def values_eq(a, b):
    """a = got (python), b = expected (decoded)."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(b, float) and math.isnan(b):
        return isinstance(a, float) and math.isnan(a)
    if isinstance(a, float) and math.isnan(a):
        return False
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b or a == b and isinstance(a, bool) == isinstance(b, bool)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if math.isinf(b) or math.isinf(a):
            return a == b
        return abs(a - b) <= 1e-9 + 1e-6 * abs(b)
    if isinstance(a, dtm.datetime) or isinstance(b, dtm.datetime):
        if isinstance(a, dtm.datetime) and isinstance(b, dtm.datetime):
            if a.tzinfo is not None:
                a = a.replace(tzinfo=None)
            return a == b
        return False
    if isinstance(a, dtm.timedelta) and isinstance(b, dtm.timedelta):
        return abs((a - b).total_seconds()) < 1e-6
    if isinstance(b, _PrefixList):
        # the reference's inspect truncated a NESTED list ([7, ...]) —
        # compare the visible prefix only
        if not isinstance(a, (list, tuple)) or len(a) < len(b):
            return False
        return all(values_eq(x, y) for x, y in zip(a[: len(b)], b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(values_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, bytes) and isinstance(b, str):
        # the reference RENDERS utf8-decodable binaries as strings in a
        # :binary series display; the value is still a binary
        try:
            return a.decode("utf-8") == b
        except UnicodeDecodeError:
            return False
    if isinstance(a, dict) and isinstance(b, dict):
        ka = {str(k) for k in a}
        kb = {str(k) for k in b}
        if ka != kb:
            return False
        a2 = {str(k): v for k, v in a.items()}
        b2 = {str(k): v for k, v in b.items()}
        return all(values_eq(a2[k], b2[k]) for k in a2)
    return a == b or str(a) == str(b)


def _norm_tok(tok: str) -> str:
    """The reference's docs render a naive timestamp both as
    datetime[μs] (older blocks) and naive_datetime[μs] — normalize
    zoneless tokens so either spelling compares equal."""
    if tok.startswith("naive_datetime["):
        return "datetime[" + tok[len("naive_datetime["):]
    return tok


class Mismatch(Exception):
    pass


def check_case(got, expect, case):
    kind = expect["kind"]
    if kind == "frame":
        if not isinstance(got, ex.DataFrame):
            raise Mismatch(f"expected frame, got {type(got).__name__}")
        names = got.names
        want_names = [c["name"] for c in expect["cols"]]
        if names != want_names:
            raise Mismatch(f"columns {names} != {want_names}")
        if got.shape[0] != expect["shape"][0] or got.shape[1] != expect["shape"][1]:
            raise Mismatch(f"shape {got.shape} != {tuple(expect['shape'])}")
        if expect["groups"] and list(got.groups) != expect["groups"]:
            raise Mismatch(f"groups {got.groups} != {expect['groups']}")
        dts = got.dtypes
        colvals = got.to_columns()
        for c in expect["cols"]:
            tok = render_dtype(dts[c["name"]])
            if _norm_tok(tok) != _norm_tok(c["dtype"]):
                raise Mismatch(f"{c['name']} dtype {tok} != {c['dtype']}")
            want = [decode_expected(v) for v in c["vals"]]
            have = colvals[c["name"]]
            if c["trunc"]:
                have = have[: len(want)]
            if len(have) != len(want) or not all(values_eq(x, y) for x, y in zip(have, want)):
                raise Mismatch(f"{c['name']} values {have!r} != {want!r}")
        return
    if kind == "series":
        if not isinstance(got, Series):
            raise Mismatch(f"expected series, got {type(got).__name__}")
        d = got.dtype
        tok = render_dtype(d)
        if _norm_tok(tok) != _norm_tok(expect["dtype"]):
            raise Mismatch(f"dtype {tok} != {expect['dtype']}")
        vals = got.to_list()
        if len(vals) != expect["n"]:
            raise Mismatch(f"size {len(vals)} != {expect['n']}")
        want = [decode_expected(v) for v in expect["vals"]]
        have = vals[: len(want)] if expect["trunc"] else vals
        if len(have) != len(want) or not all(values_eq(x, y) for x, y in zip(have, want)):
            raise Mismatch(f"values {have!r} != {want!r}")
        return
    if kind == "scalar":
        want = decode_expected(expect["val"])
        have = got
        if isinstance(have, Series):
            raise Mismatch("expected scalar, got series")
        if hasattr(have, "__iter__") and not isinstance(have, (str, bytes, list, tuple, dict)):
            have = list(have)
        if not values_eq(have, want):
            raise Mismatch(f"scalar {have!r} != {want!r}")
        return
    if kind == "string":
        if not isinstance(got, str):
            raise Mismatch(f"expected string, got {type(got).__name__}")
        if got != expect["val"]:
            import difflib

            diff = "\n".join(
                difflib.unified_diff(
                    expect["val"].splitlines(), got.splitlines(), lineterm="", n=1
                )
            )
            raise Mismatch(f"string mismatch:\n{diff}")
        return
    if kind == "tensor":
        import numpy as np

        if not isinstance(got, np.ndarray):
            raise Mismatch(f"expected tensor, got {type(got).__name__}")
        base = {"s": "int", "u": "uint", "f": "float"}.get(expect["dtype"][0])
        want_np = f"{base}{expect['dtype'][1:]}"
        if str(got.dtype) != want_np:
            raise Mismatch(f"tensor dtype {got.dtype} != {want_np}")
        if list(got.shape) != expect["shape"]:
            raise Mismatch(f"tensor shape {got.shape} != {expect['shape']}")
        want_vals = np.array(
            [decode_expected(v) for v in expect["vals"]], dtype=want_np
        )
        if not np.array_equal(got, want_vals):
            raise Mismatch(f"tensor values {got!r} != {want_vals!r}")
        return
    if kind == "raise":
        raise AssertionError("raise kind handled by caller")
    raise Mismatch(f"unknown kind {kind}")
