"""Extract reference doctests (iex> blocks) into a replayable JSON corpus.

Generalizes the round-8 shape-specific extractor (NOTES_r10): every block
becomes {file, line, stmts: [[var|None, ast], ...], expect: {...}} where
ast is a JSON tree over a restricted Elixir expression subset and expect
is a parsed rendering (#Explorer.DataFrame< / #Explorer.Series< / scalar
literal / ** (Error)). Blocks whose statements or output fail to parse
are recorded in the skip report with a reason — the corpus is what
PARSES, the test layer decides what EVALUATES.

Usage: python tools/extract_doctests_v2.py  (writes
tests/support/reference_doctests_v2.json + prints a coverage report)

Reference provenance: lib/explorer/series.ex and lib/explorer/
data_frame.ex doctest blocks (PUBLIC reference content; values only).
"""

from __future__ import annotations

import json
import os
import re
import sys

REF = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "support", "reference_doctests_v2.json",
)

# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<sigil>~[A-Za-z]\[[^\]]*\]|~[A-Za-z]/[^/]*/|~[A-Za-z]\([^)]*\)|~[A-Za-z]"[^"]*")
  | (?P<atomq>:"(?:[^"\\]|\\.)*")
  | (?P<atom>:[A-Za-z_][A-Za-z0-9_]*[!?]?|:<>|:==|:!=|:>=|:<=|:>|:<|:\+|:-|:\*|:/)
  | (?P<float>\d[\d_]*\.\d[\d_]*(?:[eE][-+]?\d+)?|\d[\d_]*[eE][-+]?\d+)
  | (?P<int>0x[0-9a-fA-F_]+|\d[\d_]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<op>\|>|=>|<-|->|<>|==|!=|>=|<=|&&|\|\||\.\.|//|\+\+|--|[-+*/<>=!&%^|.])
  | (?P<punct>[()\[\]{},;])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*[!?]?)
    """,
    re.VERBOSE,
)


class ParseError(Exception):
    pass


def tokenize(src: str):
    toks = []
    i = 0
    while i < len(src):
        m = TOKEN_RE.match(src, i)
        if not m:
            raise ParseError(f"tokenize: {src[i:i+24]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    toks.append(("eof", ""))
    return toks


# --------------------------------------------------------------------------
# parser: Pratt over the token list, producing JSON AST
# --------------------------------------------------------------------------

BINOPS = {
    "or": 10, "||": 10,
    "and": 20, "&&": 20,
    "==": 30, "!=": 30, ">": 30, "<": 30, ">=": 30, "<=": 30, "in": 30,
    "..": 35,
    "<>": 40, "++": 40, "--": 40,
    "+": 50, "-": 50,
    "*": 60, "/": 60,
    # NOTE: "//" is NOT a binop — it only appears as a range step
    # (a..b//s), which expr() handles right after parsing "..".
}


class P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise ParseError(f"expected {val!r} got {t[1]!r}")
        return t

    # ---- entry: a full statement (maybe `var = expr`) ----
    def statement(self):
        var = None
        if (
            self.peek()[0] == "ident"
            and self.peek(1)[1] == "="
            and self.peek(2)[1] != "="
        ):
            var = self.next()[1]
            self.next()
        node = self.expr()
        if self.peek()[0] != "eof":
            raise ParseError(f"trailing tokens: {self.peek()[1]!r}")
        return [var, node]

    def expr(self, minp=0):
        left = self.unary()
        while True:
            t = self.peek()
            op = t[1]
            if op == "|>" and minp <= 1:
                # pipe: a |> f(args) — desugar to f(a, args)
                self.next()
                call = self.primary()
                if not (isinstance(call, dict) and "call" in call):
                    raise ParseError(f"pipe into non-call: {call}")
                call["call"]["args"].insert(0, left)
                left = self.postfix(call)
                continue
            if (t[0] in ("op", "ident")) and op in BINOPS and BINOPS[op] >= minp:
                if op == "in" and t[0] != "ident":
                    break
                self.next()
                right = self.expr(BINOPS[op] + 1)
                if op == "..":
                    step = None
                    if self.peek()[1] == "//":
                        self.next()
                        step = self.expr(66)
                    left = {"range": [left, right, step]}
                else:
                    left = {"op": [op, left, right]}
            else:
                break
        return left

    def unary(self):
        t = self.peek()
        if t[1] == "^":
            # query pin: evaluate the pinned expression OUTSIDE the query
            self.next()
            return {"pin": self.unary()}
        if t[1] == "-":
            self.next()
            return {"unop": ["-", self.unary()]}
        if t[1] == "not" and t[0] == "ident":
            self.next()
            return {"unop": ["not", self.unary()]}
        if t[1] == "!":
            self.next()
            return {"unop": ["not", self.unary()]}
        if t[1] == "&":
            # capture: &Mod.fun/arity, &fun/arity, or &(expr over &1/&2)
            # (&N was rewritten to __capN__ idents in the pre-pass)
            self.next()
            save = self.i
            parts = []
            while self.peek()[0] == "ident" or self.peek()[1] == ".":
                if self.peek()[1] == "(":
                    break
                parts.append(self.next()[1])
                if self.peek()[1] == "/" and self.peek(1)[0] == "int":
                    self.next()
                    ar = int(self.next()[1])
                    return {"capture": ["".join(parts), ar]}
            # not a name/arity capture: body expression with __capN__ vars
            self.i = save
            body = self.expr(36)  # bind tighter than comparison? no: full expr
            params = sorted(set(re.findall(r"__cap\d+__", json.dumps(body))))
            return {"fn": {"params": params or ["__cap1__"], "body": [[None, body]]}}
        return self.postfix(self.primary())

    def postfix(self, node):
        while True:
            t = self.peek()
            if t[1] == "[":
                self.next()
                key = self.expr()
                self.expect("]")
                node = {"access": [node, key]}
            elif t[1] == "." and self.peek(1)[0] == "ident" and self.peek(2)[1] == "(":
                # chained call on value: expr.fun(args) — rare; treat as call
                self.next()
                fn = self.next()[1]
                args = self.call_args()
                node = {"call": {"mod": None, "fn": fn, "recv": node, "args": args}}
            else:
                break
        return node

    def expr_primary_nocall_chain(self):
        # used for pipe RHS: must be a (possibly module-qualified) call
        return self.primary()

    def primary(self):
        kind, val = self.peek()
        if val == "(":
            self.next()
            e = self.expr()
            self.expect(")")
            return e
        if kind == "sigil":
            self.next()
            return {"sigil": [val[1], val[3:-1]]}
        if kind == "ident" and val.startswith("__cap") and val.endswith("__"):
            self.next()
            return {"var": val}
        if kind == "atomq":
            self.next()
            return {"atom": json.loads(val[1:])}
        if kind == "atom":
            self.next()
            return {"atom": val[1:].strip('"')}
        if kind == "float":
            self.next()
            return {"float": float(val.replace("_", ""))}
        if kind == "int":
            self.next()
            return {"int": int(val.replace("_", ""), 0)}
        if kind == "str":
            self.next()
            s = val[1:-1]
            if "#{" in s:
                # interpolation: split into literal/expr parts
                parts = []
                i = 0
                while i < len(s):
                    j = s.find("#{", i)
                    if j < 0:
                        parts.append({"str": _unescape(s[i:])})
                        break
                    if j > i:
                        parts.append({"str": _unescape(s[i:j])})
                    k = s.find("}", j)
                    if k < 0:
                        raise ParseError("unterminated interpolation")
                    parts.append(parse_expr_src(s[j + 2 : k])[1])
                    i = k + 1
                return {"interp": parts}
            return {"str": _unescape(s)}
        if val == "[":
            return self.list_lit()
        if val == "{":
            self.next()
            items = self.comma_items("}")
            return {"tuple": items}
        if val == "%":
            return self.map_lit()
        if val == "fn":
            return self.fn_lit()
        if val == "for" and kind == "ident":
            return self.for_comp()
        if val == "cond" and kind == "ident" and self.peek(1)[1] == "do":
            return self.cond_expr()
        if kind == "ident":
            # module path / call / bare var; keyword key handled by caller
            return self.name_or_call()
        raise ParseError(f"primary: {val!r}")

    def for_comp(self):
        """`for VAR <- GEN[, VAR2 <- GEN2]*[, FILTER]* do BODY end`
        (Explorer.Query across-comprehensions, reference query.ex module
        doc; multiple generators form a cross product,
        query_test.exs:215)."""
        self.expect("for")
        if self.peek()[0] != "ident":
            raise ParseError("for pattern")
        gens = []
        var = self.next()[1]
        self.expect("<-")
        gens.append([var, self.expr()])
        filters = []
        while self.peek()[1] == ",":
            self.next()
            if self.peek()[1] == "do":
                break
            if self.peek()[0] == "ident" and self.peek(1)[1] == "<-":
                v2 = self.next()[1]
                self.next()
                gens.append([v2, self.expr()])
                continue
            filters.append(self.expr())
        self.expect("do")
        body = self.expr()
        self.expect("end")
        return {"for_comp": {"gens": gens, "filters": filters, "body": body}}

    def cond_expr(self):
        """`cond do C1 -> V1 ... end` (query conditionals, query.ex
        __cond__)."""
        self.expect("cond")
        self.expect("do")
        clauses = []
        while self.peek()[1] != "end":
            c = self.expr()
            self.expect("->")
            v = self.expr()
            clauses.append([c, v])
            if self.peek()[0] == "eof":
                raise ParseError("cond: missing end")
        self.expect("end")
        if not clauses:
            raise ParseError("cond: no clauses")
        return {"cond": clauses}

    def name_or_call(self):
        parts = [self.next()[1]]
        while self.peek()[1] == "." and self.peek(1)[0] == "ident":
            # module path continues only while segments are Capitalized,
            # final segment may be a lowercase function
            self.next()
            parts.append(self.next()[1])
        if self.peek()[1] == "(":
            fn = parts[-1]
            mod = ".".join(parts[:-1]) or None
            args = self.call_args()
            return {"call": {"mod": mod, "fn": fn, "args": args}}
        if len(parts) == 1:
            name = parts[0]
            if name == "nil":
                return {"nil": True}
            if name in ("true", "false"):
                return {"bool": name == "true"}
            return {"var": name}
        # module attribute / struct-less qualified name without call
        return {"qualified": ".".join(parts)}

    def call_args(self):
        self.expect("(")
        args = self.comma_items(")")
        return self.fold_trailing_kw(args)

    def comma_items(self, closer):
        items = []
        if self.peek()[1] == closer:
            self.next()
            return items
        while True:
            items.append(self.item())
            t = self.next()
            if t[1] == closer:
                return items
            if t[1] != ",":
                raise ParseError(f"expected , or {closer} got {t[1]!r}")

    def item(self):
        # keyword pair? ident: expr  (ident not followed by '(' etc.)
        if (
            self.peek()[0] in ("ident", "str")
            and self.peek(1)[1] == ":"
            and self.peek(1)[0] == "op"
        ):
            raise ParseError("unreachable")
        # Elixir kw syntax is `key: value` — tokenized as atom? No: `a: 1`
        # tokenizes ident 'a' then op ':'? Our op list lacks ':', so detect
        # ident followed by ':'—but ':' isn't a token... atoms grabbed
        # ':1'? Handle via regex fallback below.
        m = self._kw_key()
        if m is not None:
            return {"kwpair": [m, self.expr()]}
        return self.expr()

    def _kw_key(self):
        # `key:` forms: the tokenizer has no bare ':' so `a: 1` tokenizes
        # as ident 'a', then атом? No — ': 1' doesn't match atom (space).
        # We pre-transform `a:` into a synthetic token in tokenize2.
        if self.peek()[0] == "kwkey":
            return self.next()[1]
        return None

    def list_lit(self):
        self.expect("[")
        items = self.comma_items("]")
        if items and all(isinstance(x, dict) and "kwpair" in x for x in items):
            return {"kw": [x["kwpair"] for x in items]}
        if any(isinstance(x, dict) and "kwpair" in x for x in items):
            # mixed list/kw (allowed at tail in Elixir) — fold tail
            items = self.fold_trailing_kw(items)
        return {"list": items}

    def fold_trailing_kw(self, items):
        kws = []
        while items and isinstance(items[-1], dict) and "kwpair" in items[-1]:
            kws.insert(0, items.pop()["kwpair"])
        if kws:
            items.append({"kw": kws})
        return items

    def map_lit(self):
        self.expect("%")
        if self.peek()[0] == "ident" and self.peek()[1][0].isupper():
            # struct literals: only %Explorer.Duration{value:, precision:}
            # is replayable (it maps onto a plain duration value)
            parts = [self.next()[1]]
            while self.peek()[1] == "." and self.peek(1)[0] == "ident":
                self.next()
                parts.append(self.next()[1])
            if ".".join(parts) == "Explorer.Duration" and self.peek()[1] == "{":
                self.expect("{")
                fields = {}
                while True:
                    k = self._kw_key()
                    if k is None:
                        raise ParseError("duration struct field")
                    fields[k] = self.expr()
                    t = self.next()
                    if t[1] == "}":
                        return {"duration_struct": fields}
                    if t[1] != ",":
                        raise ParseError("duration struct sep")
            raise ParseError("struct literal")
        self.expect("{")
        pairs = []
        if self.peek()[1] == "}":
            self.next()
            return {"map": pairs}
        while True:
            k = self._kw_key()
            if k is not None:
                key = {"str": k}
                v = self.expr()
            else:
                key = self.expr()
                self.expect("=>")
                v = self.expr()
            pairs.append([key, v])
            t = self.next()
            if t[1] == "}":
                return {"map": pairs}
            if t[1] != ",":
                raise ParseError("map sep")

    def fn_lit(self):
        self.expect("fn")
        params = []
        while self.peek()[0] == "ident" and self.peek()[1] != "->":
            params.append(self.next()[1])
            if self.peek()[1] == ",":
                self.next()
        self.expect("->")
        # body: a sequence of `var = expr` bindings then a final expr,
        # terminated by 'end' (newlines were collapsed by the line merge)
        body = []
        while True:
            var = None
            if (
                self.peek()[0] == "ident"
                and self.peek(1)[1] == "="
                and self.peek(2)[1] != "="
            ):
                var = self.next()[1]
                self.next()
            body.append([var, self.expr()])
            while self.peek()[1] == ";":
                self.next()
            if self.peek()[1] == "end":
                self.next()
                break
            if self.peek()[0] == "eof":
                raise ParseError("fn body: missing end")
        return {"fn": {"params": params, "body": body}}


def _unescape(s: str) -> str:
    return (
        s.replace(r"\"", '"').replace(r"\\", "\\").replace(r"\n", "\n")
        .replace(r"\t", "\t").replace(r"\e", "\x1b").replace(r"\0", "\0")
    )


def tokenize2(src: str):
    """tokenize + synthesize kwkey tokens for `ident:`/`"str":` followed
    by whitespace (Elixir keyword syntax)."""
    out = []
    toks = tokenize(src)
    i = 0
    while i < len(toks):
        k, v = toks[i]
        # `a:` appears as ident followed by atom-like? No: ':' alone never
        # tokenizes. So kw keys appear as e.g. ident 'a' + ??? Actually
        # 'a: 1' -> ident 'a' then ': 1' fails... We must catch at regex
        # level. Simplest: pre-pass on the source.
        out.append((k, v))
        i += 1
    return out


KWKEY_RE = re.compile(r'([A-Za-z_][A-Za-z0-9_]*[!?]?|"(?:[^"\\]|\\.)*"):(?=\s|$)')


CAPN_RE = re.compile(r"&(\d+)")
BITSTR_RE = re.compile(r"<<[^<>]*>>")


def parse_bitstring(body: str):
    """`<<seg, seg, ...>>` -> {"bits": [[value, kind, size], ...]}
    (kind s/u/f, native = little-endian; bare ints default u8)."""
    inner = body[2:-2].strip()
    segs = []
    if inner:
        for part in inner.split(","):
            part = part.strip()
            if "::" in part:
                val, spec = part.split("::", 1)
                toks = spec.strip().split("-")
                kind = {"signed": "s", "unsigned": "u", "float": "f"}.get(toks[0])
                size = int(toks[1]) if len(toks) > 1 and toks[1].isdigit() else 8
                if kind is None:
                    raise ParseError(f"bitstring spec {spec!r}")
            else:
                val, kind, size = part, "u", 8
            v = float(val) if kind == "f" else int(val.strip())
            segs.append([v, kind, size])
    return {"bits": segs}


def parse_expr_src(src: str):
    # pre-pass 0: bitstring literals -> marker tokens (their commas and
    # :: would confuse the tokenizer)
    bits: list = []

    def bsub(m):
        bits.append(m.group(0))
        return f"__bits{len(bits) - 1}__"

    src = BITSTR_RE.sub(bsub, src)
    # pre-pass 1: rewrite `&N` capture refs into synthetic idents
    src = CAPN_RE.sub(lambda m: f"__cap{m.group(1)}__", src)
    # pre-pass 2: rewrite `key:` into a parseable marker token `\x01key\x01`
    def sub(m):
        key = m.group(1)
        if key.startswith('"'):
            key = json.loads(key)
        return "\x01" + key + "\x01"

    marked = KWKEY_RE.sub(sub, src)
    toks = []
    for piece in re.split("(\x01[^\x01]*\x01)", marked):
        if not piece:
            continue
        if piece.startswith("\x01"):
            toks.append(("kwkey", piece[1:-1]))
        else:
            toks.extend(tokenize(piece)[:-1])
    toks.append(("eof", ""))
    stmt = P(toks).statement()
    if bits:
        # resolve bitstring marker idents back into {"bits": ...} nodes
        def walk(node):
            if isinstance(node, dict):
                if "var" in node:
                    m = re.match(r"^__bits(\d+)__$", node["var"])
                    if m:
                        return parse_bitstring(bits[int(m.group(1))])
                return {k: walk(v) for k, v in node.items()}
            if isinstance(node, list):
                return [walk(x) for x in node]
            return node

        stmt = walk(stmt)
    return stmt


# --------------------------------------------------------------------------
# output parsers
# --------------------------------------------------------------------------

VALS_SPLIT_RE = re.compile(
    r"""
    ~[A-Z]\[[^\]]*\]
  | "(?:[^"\\]|\\.)*"
  | \[[^\[\]]*\]
  | [^,\[\]]+
    """,
    re.VERBOSE,
)


def parse_rendered_values(body: str):
    """Parse the `[v1, v2, ...]` payload of a rendered column/series line
    into python literals. Returns (values, truncated)."""
    body = body.strip()
    # doc-heredoc escape layer: when EVERY quote in the payload is the
    # escaped \" form (json_path_match outputs), strip one layer so the
    # string scanner sees real delimiters
    if '"' in body and re.search(r'(?<!\\)"', body) is None:
        body = body.replace('\\"', '"')
    assert body.startswith("[") and body.endswith("]"), body
    inner = body[1:-1]
    vals, trunc = [], False
    depth = 0
    cur = ""
    items = []
    i = 0
    in_str = False
    while i < len(inner):
        ch = inner[i]
        if in_str:
            cur += ch
            if ch == "\\":
                cur += inner[i + 1]
                i += 2
                continue
            if ch == '"':
                in_str = False
            i += 1
            continue
        if ch == '"':
            in_str = True
            cur += ch
        elif inner.startswith("<<", i):
            depth += 1
            cur += "<<"
            i += 2
            continue
        elif inner.startswith(">>", i):
            depth -= 1
            cur += ">>"
            i += 2
            continue
        elif ch in "[{(":
            depth += 1
            cur += ch
        elif ch in "]})":
            depth -= 1
            cur += ch
        elif ch == "," and depth == 0:
            items.append(cur.strip())
            cur = ""
        else:
            cur += ch
        i += 1
    if cur.strip():
        items.append(cur.strip())
    for it in items:
        if it == "...":
            trunc = True
            continue
        vals.append(parse_rendered_literal(it))
    return vals, trunc


def parse_rendered_literal(s: str):
    s = s.strip()
    if s == "nil":
        return None
    if s == "true":
        return True
    if s == "false":
        return False
    if s == "NaN":
        return {"__nan__": True}
    if s == "Inf":
        return {"__inf__": 1}
    if s == "-Inf":
        return {"__inf__": -1}
    m = re.match(r'^"(.*)"$', s, re.S)
    if m:
        return _unescape(m.group(1))
    # doc-heredoc escape layer: a rendered string inside @doc """ shows
    # as \"...\" (series.ex json_path_match outputs)
    m = re.match(r'^\\"(.*)\\"$', s, re.S)
    if m:
        return _unescape(m.group(1))
    m = re.match(r"^~([A-Z])\[(.*)\]$", s)
    if m:
        return {"__sigil__": [m.group(1), m.group(2)]}
    m = re.match(r"^-?\d[\d_]*$", s)
    if m:
        return int(s.replace("_", ""))
    m = re.match(r"^-?\d[\d_]*\.\d+(?:[eE][-+]?\d+)?$|^-?\d[\d_]*[eE][-+]?\d+$", s)
    if m:
        return float(s.replace("_", ""))
    if s.startswith(":"):
        return {"__atom__": s[1:]}
    if s.startswith("[") and s.endswith("]"):
        vals, trunc = parse_rendered_values(s)
        if trunc:
            # a truncated NESTED list ([7, ...] inside a list[s64]
            # column) — compare as a prefix downstream
            return {"__prefix_list__": vals}
        return vals
    if s.startswith("%{") and s.endswith("}"):
        return parse_rendered_map(s)
    # date/datetime/time dtypes render their values BARE (no sigil)
    m = re.match(r"^(-?\d{4,6})-(\d\d)-(\d\d)$", s)
    if m:
        return {"__sigil__": ["D", s]}
    m = re.match(r"^(-?\d{4,6})-(\d\d)-(\d\d)[ T](\d\d:\d\d:\d\d(?:\.\d+)?)$", s)
    if m:
        return {"__sigil__": ["N", s.replace(" ", "T")]}
    m = re.match(r"^\d\d:\d\d:\d\d(\.\d+)?$", s)
    if m:
        return {"__sigil__": ["T", s]}
    # durations render like "1d 2h 3m" / "10s" / "-1500ms" / "1ms"
    if re.match(r"^-?\d+(\.\d+)?(d|h|m|s|ms|us|µs|ns)(\s+-?\d+(\.\d+)?(d|h|m|s|ms|us|µs|ns))*$", s):
        return {"__duration_str__": s}
    if s.startswith("<<") and s.endswith(">>"):
        return {"__bits__": parse_bitstring(s)["bits"]}
    m = re.match(r"^~s\((.*)\)$", s, re.S)
    if m:
        return m.group(1).replace("\\n", "\n").replace("\\t", "\t")
    # tuples: {:s, 64} (dtype/iotype doctests), {3, 2} (shape)
    if s.startswith("{") and s.endswith("}"):
        vals, trunc = parse_rendered_values("[" + s[1:-1] + "]")
        if trunc:
            raise ParseError("truncated tuple")
        return {"__tuple__": vals}
    raise ParseError(f"rendered literal: {s!r}")


def parse_rendered_map(s: str):
    inner = s[2:-1].strip()
    if not inner:
        return {"__map__": []}
    pairs = []
    # split top-level commas
    items, depth, cur, in_str = [], 0, "", False
    i = 0
    while i < len(inner):
        ch = inner[i]
        if in_str:
            cur += ch
            if ch == "\\":
                cur += inner[i + 1]
                i += 2
                continue
            if ch == '"':
                in_str = False
            i += 1
            continue
        if ch == '"':
            in_str = True
            cur += ch
        elif ch in "[{(":
            depth += 1
            cur += ch
        elif ch in "]})":
            depth -= 1
            cur += ch
        elif ch == "," and depth == 0:
            items.append(cur.strip())
            cur = ""
        else:
            cur += ch
        i += 1
    if cur.strip():
        items.append(cur.strip())
    for it in items:
        m = re.match(r'^(?:"((?:[^"\\]|\\.)*)"|([a-zA-Z_][\w]*))\s*(?:=>|:)\s*(.*)$', it, re.S)
        if not m:
            raise ParseError(f"map pair: {it!r}")
        key = _unescape(m.group(1)) if m.group(1) is not None else m.group(2)
        pairs.append([key, parse_rendered_literal(m.group(3))])
    return {"__map__": pairs}


COL_RE = re.compile(
    # the name may contain spaces (e.g. `unusual nums s64 [3]`) — match
    # it lazily up to the dtype token that precedes the value list
    r'^\s*("(?:[^"\\]|\\.)*"|\S(?:.*?\S)??)\s+(\S+(?:\[[^\]]*\])?)\s+(\[.*\])\s*$'
)


def parse_frame_block(lines):
    assert lines[0].strip().startswith("#Explorer.DataFrame<")
    m = re.match(r"^\s*(\w+)\[(\d+|\?) x (\d+)\]\s*$", lines[1])
    if not m:
        raise ParseError(f"frame shape: {lines[1]!r}")
    if m.group(2) == "?":
        raise ParseError("lazy frame output")
    shape = [int(m.group(2)), int(m.group(3))]
    idx = 2
    groups = []
    gm = re.match(r'^\s*Groups:\s*\[(.*)\]\s*$', lines[idx]) if idx < len(lines) else None
    if gm:
        groups = [json.loads(x.strip()) for x in gm.group(1).split(",") if x.strip()]
        idx += 1
    cols = []
    for ln in lines[idx:]:
        if ln.strip() == ">":
            break
        cm = COL_RE.match(ln)
        if not cm:
            raise ParseError(f"frame col: {ln!r}")
        name = cm.group(1)
        if name.startswith('"'):
            name = _unescape(name[1:-1])
        vals, trunc = parse_rendered_values(cm.group(3))
        cols.append({"name": name, "dtype": cm.group(2), "vals": vals, "trunc": trunc})
    return {"kind": "frame", "shape": shape, "groups": groups, "cols": cols}


def parse_series_block(lines):
    assert lines[0].strip().startswith("#Explorer.Series<")
    m = re.match(r"^\s*(\w+)\[(\d+|\?)\]\s*$", lines[1])
    if not m:
        raise ParseError(f"series shape: {lines[1]!r}")
    if m.group(2) == "?":
        raise ParseError("lazy series")
    n = int(m.group(2))
    # value line(s): dtype [ ... ] possibly wrapped across lines
    rest = " ".join(x.strip() for x in lines[2:] if x.strip() != ">")
    cm = re.match(r"^(\S+(?:\[[^\]]*\])?)\s+(\[.*\])$", rest, re.S)
    if not cm:
        raise ParseError(f"series body: {rest!r}")
    vals, trunc = parse_rendered_values(cm.group(2))
    return {"kind": "series", "n": n, "dtype": cm.group(1), "vals": vals, "trunc": trunc}


_HEREDOC_MARK = '\\"\\"\\"'


def parse_heredoc_block(outlines):
    """A heredoc string result (e.g. to_table_string/2's rendered table):
    the expected value is the raw text between the two escaped \"\"\"
    markers, newline-terminated like the heredoc itself."""
    assert outlines[0].strip() == _HEREDOC_MARK
    body = []
    for l in outlines[1:]:
        if l.strip() == _HEREDOC_MARK:
            return {"kind": "string", "val": "\n".join(body) + "\n"}
        body.append(l.replace('\\"', '"'))
    raise ParseError("unterminated heredoc output")


def parse_tensor_block(outlines):
    """`#Nx.Tensor<` output: dtype+shape line then a (possibly nested
    multi-line) value list."""
    m = re.match(r"^\s*([a-z]+\d+)((?:\[\d+\])+)\s*$", outlines[1])
    if not m:
        raise ParseError(f"tensor shape: {outlines[1]!r}")
    shape = [int(x) for x in re.findall(r"\[(\d+)\]", m.group(2))]
    rest = " ".join(x.strip() for x in outlines[2:] if x.strip() != ">")
    vals, trunc = parse_rendered_values(rest)
    if trunc:
        raise ParseError("truncated tensor")
    return {"kind": "tensor", "dtype": m.group(1), "shape": shape, "vals": vals}


def parse_output(outlines):
    if not outlines:
        raise ParseError("no output")
    h = outlines[0].strip()
    if h == _HEREDOC_MARK:
        return parse_heredoc_block(outlines)
    if h.startswith("#Nx.Tensor<"):
        return parse_tensor_block(outlines)
    if h.startswith("#Explorer.DataFrame<"):
        return parse_frame_block(outlines)
    if h.startswith("#Explorer.Series<"):
        return parse_series_block(outlines)
    if h.startswith("** ("):
        m = re.match(r"^\*\* \((\S+)\)\s*(.*)$", h)
        msg = m.group(2) + ("" if len(outlines) == 1 else " " + " ".join(
            x.strip() for x in outlines[1:]
        ))
        return {"kind": "raise", "error": m.group(1), "msg": msg}
    if h.startswith("#"):
        raise ParseError(f"struct output: {h!r}")
    joined = " ".join(x.strip() for x in outlines)
    return {"kind": "scalar", "val": parse_rendered_literal(joined)}


# --------------------------------------------------------------------------
# block scanning (same discipline as the survey tool)
# --------------------------------------------------------------------------

def scan_blocks(path):
    lines = open(path).read().splitlines()
    i = 0
    out = []
    prev_end = -10  # line index right after the previous block's output
    prev_stmts: list = []
    while i < len(lines):
        m = re.match(r"^(\s*)iex> ", lines[i])
        if not m:
            i += 1
            continue
        ind = m.group(1)
        start = i
        stmts = []
        while i < len(lines):
            l = lines[i]
            if l.startswith(ind + "iex> "):
                stmts.append(l[len(ind) + 5:])
                i += 1
            elif l.startswith(ind + "...> "):
                if stmts:
                    stmts[-1] += " " + l[len(ind) + 5:].strip()
                i += 1
            else:
                break
        outlines = []
        while i < len(lines):
            l = lines[i]
            if l.strip() == "" or not l.startswith(ind) or re.match(r"^\s*iex> ", l):
                break
            outlines.append(l[len(ind):])
            i += 1
        # ExUnit semantics: a prompt group starting IMMEDIATELY after the
        # previous group's output (no blank line) shares its bindings —
        # re-run the previous group's statements as a prefix
        if start == prev_end:
            stmts = prev_stmts + stmts
        out.append((start + 1, stmts, outlines))
        prev_end = i
        prev_stmts = stmts
    return out


def _incomplete(s: str):
    """Heuristic: the statement continues on the next iex> line.
    Returns falsy, " " (plain continuation) or "; " (fn-body statement
    boundary — preserves the newline separation Elixir had)."""
    depth = 0
    in_str = False
    i = 0
    fn_depth = 0
    toks_tail = s.rstrip()
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        i += 1
    # crude fn/end balance (fn ... end can close brackets opened before it)
    fn_opens = len(re.findall(r"\bfn\b", s))
    fn_closes = len(re.findall(r"\bend\b", s))
    fn_depth = fn_opens - fn_closes
    if in_str or re.search(
        r"(\|>|<>|->|,|\+|-|\*|/|==|!=|>=|<=|&&|\bor\b|\band\b)\s*$", toks_tail
    ):
        return " "
    if fn_depth > 0:
        # inside an open fn...end body a newline is a statement boundary
        # even though the enclosing CALL parens are still open
        return "; "
    if depth > 0:
        return " "
    return None


def main():
    corpus = []
    skipped = []
    for short, path in [
        ("series.ex", os.path.join(REF, "lib/explorer/series.ex")),
        ("data_frame.ex", os.path.join(REF, "lib/explorer/data_frame.ex")),
        ("query.ex", os.path.join(REF, "lib/explorer/query.ex")),
        ("tensor_frame.ex", os.path.join(REF, "lib/explorer/tensor_frame.ex")),
    ]:
        for line, stmts, outlines in scan_blocks(path):
            try:
                # merge statements split across iex> lines: a line with
                # unbalanced brackets (or ending in a binary op / 'fn x ->')
                # continues on the next iex> line
                merged = []
                for s in stmts:
                    s = s.strip()
                    s = re.sub(r"\s+#\s[^\"]*$", "", s)  # trailing comment
                    joiner = _incomplete(merged[-1]) if merged else None
                    if joiner:
                        merged[-1] += joiner + s
                    else:
                        merged.append(s)
                # heredoc escape layer: doc examples live inside \"\"\"
                # strings, so a raw \\ is one backslash at iex level
                merged = [m.replace("\\\\", "\\") for m in merged]
                outlines = [l.replace("\\\\", "\\") for l in outlines]
                parsed_stmts = []
                for s in merged:
                    if s.startswith("require ") or s.startswith("alias ") or s.startswith("import "):
                        continue
                    parsed_stmts.append(parse_expr_src(s))
                if not parsed_stmts:
                    raise ParseError("no statements")
                expect = parse_output(outlines)
                corpus.append(
                    {"file": short, "line": line, "stmts": parsed_stmts, "expect": expect}
                )
            except ParseError as e:
                skipped.append({"file": short, "line": line, "reason": str(e)[:120]})
            except Exception as e:  # noqa: BLE001 — record, keep extracting
                skipped.append({"file": short, "line": line, "reason": f"{type(e).__name__}: {e}"[:120]})
    with open(OUT, "w") as f:
        json.dump({"cases": corpus, "skipped": skipped}, f, indent=0)
    import collections

    print(f"extracted {len(corpus)} cases, skipped {len(skipped)}")
    by_file = collections.Counter(c["file"] for c in corpus)
    print("by file:", dict(by_file))
    by_kind = collections.Counter(c["expect"]["kind"] for c in corpus)
    print("by expect kind:", dict(by_kind))
    reasons = collections.Counter(s["reason"].split(":")[0] for s in skipped)
    print("skip reasons:", reasons.most_common(12))


if __name__ == "__main__":
    sys.exit(main())
