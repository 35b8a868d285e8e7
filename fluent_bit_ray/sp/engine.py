"""Stream-processor SQL subset: parse + execute over a tagged Dataset.

Grammar (reference src/stream_processor/README.md:1-30, parser
src/stream_processor/parser/sql.y):

    [CREATE STREAM name AS]
    SELECT keys|aggregates FROM STREAM:name | TAG:'pattern'
      [WHERE condition]
      [WINDOW TUMBLING (N SECOND|MINUTE|HOUR)
       | WINDOW HOPPING (N SECOND, ADVANCE BY M SECOND)]
      [GROUP BY keys]

Semantics mirrored (SURVEY §2.6):
- aggregates AVG/SUM/COUNT/MIN/MAX (flb_sp.c:388-490, aggregated path
  :1768-1830) → per-batch partials + Ray groupby (partial+final);
- condition tree with AND/OR/NOT, numeric coercion of string values
  (flb_sp.c:1112-1223, string→number :283);
- GROUP BY (flb_sp_groupby.c) → hash shuffle on (window, keys);
- tumbling window = event-time bucket floor(ts/size); hopping window
  assigns each row to ceil(size/advance) overlapping buckets
  (flb_sp_window.c:26-122). DEVIATION (documented): the reference
  windows by *arrival* time and flushes on processing-time timers; we
  use the event-time ``ts`` column — deterministic and batch-testable;
- functions RECORD_TAG() / RECORD_TIME() (flb_sp_func_record.c:78).

Key resolution on our record layout: fixed column → promoted ``p_<k>``
column → decoded ``fields`` JSON (slow path).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..record import FIELDS_COL, TAG_COL, fields_loads
from ..tags import match_mask

_UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
          "hour": 3600, "hours": 3600}

_SNAP_RE = re.compile(
    r"^\s*(?P<op>CREATE|FLUSH)\s+SNAPSHOT\s+(?P<name>\w+)\s+AS\s+"
    r"SELECT\s+\*\s+FROM\s+"
    r"(?:STREAM:(?P<from_stream>\w+)|TAG:'(?P<from_tag>[^']*)')"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_SQL_RE = re.compile(
    r"^\s*(?:CREATE\s+STREAM\s+(?P<stream>\w+)"
    r"(?:\s+WITH\s*\((?P<props>[^)]*)\))?\s+AS\s+)?"
    r"SELECT\s+(?P<select>.+?)\s+FROM\s+"
    r"(?:STREAM:(?P<from_stream>\w+)|TAG:'(?P<from_tag>[^']*)')"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+WINDOW\s+(?P<wtype>TUMBLING|HOPPING)\s*\("
    r"\s*(?P<wsize>\d+)\s+(?P<wunit>\w+)"
    r"(?:\s*,\s*ADVANCE\s+BY\s+(?P<wadv>\d+)\s+(?P<wadvunit>\w+))?\s*\))?"
    r"(?:\s+GROUP\s+BY\s+(?P<groupby>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_AGG_RE = re.compile(r"^(AVG|SUM|COUNT|MIN|MAX)\s*\(\s*(\*|[\w.]+)\s*\)"
                     r"(?:\s+AS\s+(\w+))?$", re.IGNORECASE)
_AGG_EXPR_RE = re.compile(r"^(AVG|SUM|COUNT|MIN|MAX)\s*\((.+)\)"
                          r"(?:\s+AS\s+(\w+))?$", re.IGNORECASE | re.DOTALL)
_EXPR_ITEM_RE = re.compile(r"^(?P<expr>.+?)(?:\s+AS\s+(?P<alias>\w+))?$",
                           re.IGNORECASE | re.DOTALL)
_FC_RE = re.compile(r"^(FORECAST|FORECAST_R)\s*\(\s*([\w.()]+)\s*,\s*([\w.]+)"
                    r"\s*,\s*([\d.]+)\s*(?:,\s*([\d.]+)\s*)?\)"
                    r"(?:\s+AS\s+(\w+))?$", re.IGNORECASE)
_KEY_RE = re.compile(r"^([\w.]+|RECORD_TAG\(\)|RECORD_TIME\(\)|NOW\(\)"
                     r"|UNIX_TIMESTAMP\(\))(?:\s+AS\s+(\w+))?$", re.IGNORECASE)


class SPQuery:
    def __init__(self):
        self.stream = None
        self.from_stream = None
        self.from_tag = None
        self.select: list[dict] = []
        self.where = None
        self.window = None  # (type, size_s, advance_s)
        self.group_by: list[str] = []
        self.limit: int | None = None
        # CREATE STREAM WITH(...) properties (sql.y:117,146-160;
        # consumed: tag → re-ingestion tag, routable → router opt-out,
        # flb_sp_stream.c:88-117)
        self.props: dict[str, str] = {}

    @property
    def stream_tag(self) -> str | None:
        """Tag the created stream's records re-ingest under: the tag
        property, else the stream name (the in_stream_processor
        instance alias becomes the default tag)."""
        if self.stream is None:
            return None
        return self.props.get("tag", self.stream)

    @property
    def routable(self) -> bool:
        return self.props.get("routable", "true").lower() != "false"

    @property
    def has_aggregates(self) -> bool:
        return any(s["kind"] == "agg" for s in self.select)


def sp_parse(sql: str) -> SPQuery:
    m = _SQL_RE.match(sql)
    if not m:
        raise ValueError(f"cannot parse SP query: {sql!r}")
    q = SPQuery()
    q.stream = m.group("stream")
    if m.group("props"):
        for pair in m.group("props").split(","):
            k, _, v = pair.partition("=")
            q.props[k.strip().lower()] = v.strip().strip("'\"")
    q.from_stream = m.group("from_stream")
    q.from_tag = m.group("from_tag")
    for part in _split_commas(m.group("select")):
        part = part.strip()
        if part == "*":
            q.select.append({"kind": "star"})
            continue
        am = _AGG_RE.match(part)
        if am:
            fn, key, alias = am.group(1).upper(), am.group(2), am.group(3)
            q.select.append({"kind": "agg", "fn": fn, "key": key,
                             "alias": alias or f"{fn}({key})"})
            continue
        am = _AGG_EXPR_RE.match(part)
        if am:
            # aggregate over an arithmetic expression, e.g.
            # SUM(code * 2 + turn_idx) — reference sql.y expression
            # grammar, eval flb_sp.c:1112-1223
            fn, inner, alias = am.group(1).upper(), am.group(2), am.group(3)
            tree = parse_expression(inner)
            q.select.append({"kind": "agg", "fn": fn, "key": inner.strip(),
                             "expr": tree,
                             "alias": alias or f"{fn}({inner.strip()})"})
            continue
        fm = _FC_RE.match(part)
        if fm:
            fn = fm.group(1).upper()
            q.select.append({
                "kind": "agg", "fn": fn,
                "key_x": fm.group(2), "key": fm.group(3),
                "horizon": float(fm.group(4)),
                "cap": float(fm.group(5)) if fm.group(5) else None,
                "alias": fm.group(6) or f"{fn}({fm.group(2)},{fm.group(3)})"})
            continue
        km = _KEY_RE.match(part)
        if km:
            q.select.append({"kind": "key", "key": km.group(1),
                             "alias": km.group(2) or km.group(1)})
            continue
        em = _EXPR_ITEM_RE.match(part)
        if em:
            try:
                tree = parse_expression(em.group("expr"))
            except ValueError:
                tree = None
            if tree is not None and _has_arith(tree):
                q.select.append({"kind": "expr", "expr": tree,
                                 "alias": em.group("alias")
                                 or em.group("expr").strip()})
                continue
        raise ValueError(f"cannot parse select item {part!r}")
    if m.group("where"):
        q.where = _parse_cond(m.group("where"))
    if m.group("wtype"):
        size = int(m.group("wsize")) * _UNITS[m.group("wunit").lower()]
        wtype = m.group("wtype").upper()
        adv = size
        if wtype == "HOPPING":
            if not m.group("wadv"):
                raise ValueError("HOPPING window requires ADVANCE BY")
            adv = int(m.group("wadv")) * _UNITS[m.group("wadvunit").lower()]
        q.window = (wtype, size, adv)
    if m.group("groupby"):
        q.group_by = [g.strip() for g in m.group("groupby").split(",")]
    if m.group("limit"):
        # LIMIT n (reference sql.y:435-439 flb_sp_cmd_limit_add).
        # Deterministic order contract (documented deviation from the
        # reference's arrival-order cap): the first n rows after
        # sorting by ALL output columns — ties are whole-row equal, so
        # the selected multiset is deterministic.
        q.limit = int(m.group("limit"))
    return q


def _split_commas(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


# ----------------------------------------------------------- conditions
_TOKEN = re.compile(
    r"\s*(\(|\)|AND\b|OR\b|NOT\b|IS\s+NOT\s+NULL|IS\s+NULL|"
    r"@RECORD\.CONTAINS\(\s*[\w.]+\s*\)|@RECORD\.TIME\(\s*\)|"
    r">=|<=|!=|<>|=|<|>|[+\-*/%]|'(?:[^'\\]|\\.)*'|[\w.]+)", re.IGNORECASE)

_CONTAINS_RE = re.compile(r"@RECORD\.CONTAINS\(\s*([\w.]+)\s*\)", re.I)

_CMP_OPS = (">=", "<=", "!=", "<>", "=", "<", ">")
_ARITH_OPS = ("+", "-", "*", "/", "%")


def _has_arith(tree) -> bool:
    return isinstance(tree, tuple) and (
        tree[0] == "arith" or any(_has_arith(t) for t in tree[1:]))


def _tokenize(s: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ValueError(f"bad condition near {s[pos:pos + 20]!r}")
        toks.append(m.group(1))
        pos = m.end()
    return toks


class _CondParser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def parse_or(self):
        left = self.parse_and()
        while self.peek() and self.peek().upper() == "OR":
            self.eat()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.peek() and self.peek().upper() == "AND":
            self.eat()
            left = ("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.peek() and self.peek().upper() == "NOT":
            self.eat()
            return ("not", self.parse_not())
        return self.parse_atom()

    def parse_atom(self):
        t = self.peek()
        if t == "(":
            # ambiguity: "(a > 1) AND ..." (parenthesized condition) vs
            # "(a + 1) > 2" (parenthesized arithmetic) — try the
            # condition parse, backtrack if what follows says otherwise
            save = self.i
            try:
                self.eat()
                node = self.parse_or()
                if self.eat() != ")":
                    raise ValueError("expected )")
                if self.peek() not in _CMP_OPS + _ARITH_OPS:
                    return node
            except ValueError:
                pass
            self.i = save
        left = self.parse_expr()
        nxt = self.peek()
        if left[0] == "contains" and (nxt is None
                                      or nxt not in _CMP_OPS):
            # bare record_func ≡ comparison against TRUE (sql.y:495-501)
            return left
        if left[0] == "key":
            if nxt and re.match(r"IS\s+NOT\s+NULL", nxt, re.I):
                self.eat()
                return ("notnull", left[1])
            if nxt and re.match(r"IS\s+NULL", nxt, re.I):
                self.eat()
                return ("isnull", left[1])
        op = self.eat()
        if op not in _CMP_OPS:
            raise ValueError(f"expected comparison operator, got {op!r}")
        if op == "<>":
            op = "!="
        right = self.parse_expr()
        # plain shapes keep the round-1 node types (string/bool literal
        # and key-vs-key semantics); arithmetic on either side compares
        # numerically (reference reduce_expression numeric coercion,
        # flb_sp.c:283,:892)
        if left[0] == "key" and right[0] == "lit":
            return ("cmp", op, left[1], right[1])
        if left[0] == "lit" and right[0] == "key":
            flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}
            return ("cmp", flip.get(op, op), right[1], left[1])
        if left[0] == "key" and right[0] == "key":
            return ("cmpkey", op, left[1], right[1])
        return ("cmpexpr", op, left, right)

    # -- arithmetic expressions (reference sql.y expression grammar) --
    def parse_expr(self):
        node = self.parse_term()
        while self.peek() in ("+", "-"):
            node = ("arith", self.eat(), node, self.parse_term())
        return node

    def parse_term(self):
        node = self.parse_factor()
        while self.peek() in ("*", "/", "%"):
            node = ("arith", self.eat(), node, self.parse_factor())
        return node

    def parse_factor(self):
        t = self.peek()
        if t == "(":
            self.eat()
            node = self.parse_expr()
            if self.eat() != ")":
                raise ValueError("expected )")
            return node
        if t == "-":
            self.eat()
            return ("arith", "neg", self.parse_factor(), None)
        tok = self.eat()
        if tok is None:
            raise ValueError("unexpected end of expression")
        m = _CONTAINS_RE.fullmatch(tok)
        if m:  # @RECORD.CONTAINS(key) — sql.y:537-539 record_func
            return ("contains", m.group(1))
        if tok.upper().replace(" ", "").startswith("@RECORD.TIME("):
            return ("rectime",)  # sql.y:543-544
        if tok.startswith("'"):
            return ("lit", tok[1:-1])
        if tok.upper() in ("TRUE", "FALSE"):
            return ("lit", tok.upper() == "TRUE")
        try:
            return ("lit", int(tok))
        except ValueError:
            pass
        try:
            return ("lit", float(tok))
        except ValueError:
            return ("key", tok)


def _parse_cond(s: str):
    return _CondParser(_tokenize(s)).parse()


def parse_expression(s: str):
    """Parse a standalone arithmetic expression (select-item use)."""
    p = _CondParser(_tokenize(s))
    node = p.parse_expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in expression: {p.toks[p.i:]}")
    return node


def _record_contains(b: pa.Table, key: str, cache=None) -> np.ndarray:
    """Per-row key presence in the record map (flb_sp_func_record.c
    contains): fixed/promoted columns count when non-null; fields-map
    keys by dict membership (dotted paths walk the nesting)."""
    def _present(col) -> np.ndarray:
        # pure-Arrow presence check (no pandas round-trip): null-aware,
        # and NaN counts as absent for float columns to match the
        # previous notna() semantics
        valid = pc.is_valid(col)
        if pa.types.is_floating(col.type):
            valid = pc.and_kleene(
                valid, pc.invert(pc.is_nan(pc.fill_null(col, 0.0))))
        return valid.combine_chunks().to_numpy(zero_copy_only=False)

    if key in b.column_names:
        return _present(b.column(key))
    if f"p_{key}" in b.column_names:
        return _present(b.column(f"p_{key}"))
    if FIELDS_COL in b.column_names:
        decoded = cache.get("decoded") if cache is not None else None
        if decoded is None:
            decoded = [fields_loads(v)
                       for v in b.column(FIELDS_COL).to_pylist()]
            if cache is not None:
                cache["decoded"] = decoded
        parts = key.split(".")

        def has(d) -> bool:
            for p in parts[:-1]:
                if isinstance(d, dict):
                    d = d.get(p)
                else:
                    return False
            return isinstance(d, dict) and parts[-1] in d

        return np.fromiter((has(d) for d in decoded), dtype=bool,
                           count=len(decoded))
    return np.zeros(b.num_rows, dtype=bool)


def _record_time(b: pa.Table) -> pd.Series:
    """@RECORD.TIME(): the record timestamp as epoch seconds (double),
    comparable with numeric literals."""
    ns = pc.cast(pc.cast(b.column("ts"), pa.timestamp("ns")), pa.int64())
    return pd.Series(
        ns.combine_chunks().to_numpy(zero_copy_only=False) / 1e9)


def _eval_expr(node, b: pa.Table, cache=None):
    """Evaluate an expression tree → pd.Series (float) or scalar.

    Record keys coerce to numeric (NaN on miss) per the reference's
    numeric coercion (flb_sp.c:283); arithmetic propagates NaN.
    """
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "contains":
        return pd.Series(_record_contains(b, node[1], cache)
                         .astype(np.float64))
    if kind == "rectime":
        return _record_time(b)
    if kind == "key":
        return pd.to_numeric(_resolve_key(b, node[1], cache),
                             errors="coerce")
    op = node[1]
    left = _eval_expr(node[2], b, cache)
    if op == "neg":
        return -left
    right = _eval_expr(node[3], b, cache)
    if not isinstance(left, pd.Series) and not isinstance(right, pd.Series):
        # scalar⊕scalar: numpy semantics (inf/nan, no ZeroDivisionError)
        left, right = np.float64(left), np.float64(right)
    with np.errstate(invalid="ignore", divide="ignore"):
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            return left / right
        return left % right


def _expr_series(node, b: pa.Table, cache=None) -> pd.Series:
    v = _eval_expr(node, b, cache)
    if not isinstance(v, pd.Series):
        v = pd.Series(np.full(b.num_rows, float(v)))
    return v


# ------------------------------------------------------------ execution
def _resolve_key(b: pa.Table, key: str, cache=None, now=None):
    """Column values for a record key (fixed → promoted → fields).

    ``cache`` is a PER-BATCH memo dict threaded through
    _eval_cond/_eval_expr and the execution kernels: the ``fields``
    JSON column is decoded at most ONCE per batch regardless of how
    many keys/conditions/aggregates touch it (previously every
    fields-key lookup re-decoded the whole column).

    NOW()/UNIX_TIMESTAMP() (reference flb_sp_func_time.c:96) take the
    injected deterministic ``now`` epoch-seconds value — the reference
    uses wall clock, which would break reproducibility here.
    """
    ku = key.upper()
    if ku == "NOW()":
        ts = pd.Timestamp(int(now or 0), unit="s")
        return pd.Series([ts.strftime("%Y-%m-%d %H:%M:%S")] * b.num_rows)
    if ku == "UNIX_TIMESTAMP()":
        return pd.Series([int(now or 0)] * b.num_rows)
    if key == "RECORD_TAG()":
        key = TAG_COL
    if key == "RECORD_TIME()":
        key = "ts"
    if key in b.column_names:
        return pd.Series(
            b.column(key).combine_chunks().to_numpy(zero_copy_only=False))
    if f"p_{key}" in b.column_names:
        return pd.Series(b.column(f"p_{key}").combine_chunks()
                         .to_numpy(zero_copy_only=False))
    if FIELDS_COL in b.column_names:
        decoded = cache.get("decoded") if cache is not None else None
        if decoded is None:
            decoded = [fields_loads(v)
                       for v in b.column(FIELDS_COL).to_pylist()]
            if cache is not None:
                cache["decoded"] = decoded
        if "." in key:  # subkey path a.b.c into the nested record map
            parts = key.split(".")

            def walk(d):
                for p in parts:
                    if isinstance(d, dict):
                        d = d.get(p)
                    else:
                        return None
                return d

            return pd.Series([walk(d) for d in decoded])
        return pd.Series([d.get(key) for d in decoded])
    return pd.Series([None] * b.num_rows)


def _coerce_pair(series: pd.Series, lit):
    """Numeric comparison coercion (flb_sp.c:283, :892)."""
    if isinstance(lit, (int, float)) and not isinstance(lit, bool):
        return pd.to_numeric(series, errors="coerce"), lit
    return series.astype(object).where(series.notna(), None).map(
        lambda v: v if isinstance(v, str) else
        (None if v is None else str(v))), lit


def _cmp_series(a: pd.Series, c, op: str):
    if op == "=":
        r = a == c
    elif op == "!=":
        r = a != c
    elif op == "<":
        r = a < c
    elif op == "<=":
        r = a <= c
    elif op == ">":
        r = a > c
    else:
        r = a >= c
    return r.fillna(False).to_numpy(dtype=bool)


def _eval_cond(node, b: pa.Table, cache=None) -> np.ndarray:
    kind = node[0]
    if kind == "and":
        return _eval_cond(node[1], b, cache) & _eval_cond(node[2], b, cache)
    if kind == "or":
        return _eval_cond(node[1], b, cache) | _eval_cond(node[2], b, cache)
    if kind == "not":
        return ~_eval_cond(node[1], b, cache)
    if kind == "contains":
        return _record_contains(b, node[1], cache)
    if kind == "isnull":
        return _resolve_key(b, node[1], cache).isna().to_numpy()
    if kind == "notnull":
        return _resolve_key(b, node[1], cache).notna().to_numpy()
    if kind == "cmpexpr":
        _, op, lt, rt = node
        sa = _expr_series(lt, b, cache)
        sb = _expr_series(rt, b, cache)
        with np.errstate(invalid="ignore"):
            r = _cmp_series(sa, sb, op)
        valid = (sa.notna() & sb.notna()).to_numpy()
        return r & valid
    if kind == "cmpkey":
        _, op, ka, kb = node
        sa = _resolve_key(b, ka, cache)
        sb = _resolve_key(b, kb, cache)
        # numeric comparison when both coerce; else string compare
        na = pd.to_numeric(sa, errors="coerce")
        nb = pd.to_numeric(sb, errors="coerce")
        both_num = na.notna() & nb.notna()
        with np.errstate(invalid="ignore"):
            num_r = _cmp_series(na, nb, op)
            str_r = _cmp_series(sa.astype(str), sb.astype(str), op)
        r = np.where(both_num.to_numpy(), num_r, str_r)
        valid = (sa.notna() & sb.notna()).to_numpy()
        return r & valid
    _, op, key, lit = node
    s = _resolve_key(b, key, cache)
    if isinstance(lit, bool):  # boolean literal: raw equality semantics
        r = (s == lit) if op == "=" else (s != lit)
        return r.fillna(False).to_numpy(dtype=bool)
    s, lit = _coerce_pair(s, lit)
    with np.errstate(invalid="ignore"):
        if op == "=":
            r = s == lit
        elif op == "!=":
            r = s != lit
        elif op == "<":
            r = s < lit
        elif op == "<=":
            r = s <= lit
        elif op == ">":
            r = s > lit
        else:
            r = s >= lit
    return r.fillna(False).to_numpy(dtype=bool)


def sp_snapshot(ds, sql: str, snapshots: dict,
                streams: dict | None = None, ts_col: str = "ts"):
    """SNAPSHOT create/flush (reference flb_sp_snapshot.c, grammar
    sql.y:123-141), batch-determinized:

    - ``CREATE SNAPSHOT name AS SELECT * FROM source [LIMIT n]``
      buffers the source rows (last n by event time when LIMIT given —
      the reference buffers a bounded window of recent records) into
      ``snapshots[name]``;
    - ``FLUSH SNAPSHOT name AS SELECT * FROM source [WHERE cond]``
      returns the buffered rows (WHERE-filtered) and clears the buffer.
    """
    m = _SNAP_RE.match(sql)
    if not m:
        raise ValueError(f"cannot parse snapshot query: {sql!r}")
    op = m.group("op").upper()
    name = m.group("name")
    if op == "CREATE":
        src = ds
        if m.group("from_stream"):
            src = (streams or {})[m.group("from_stream")]
        elif m.group("from_tag"):
            pat = m.group("from_tag")

            def tag_filter(b: pa.Table) -> pa.Table:
                if b.num_rows == 0 or TAG_COL not in b.column_names:
                    return b
                return b.filter(pa.array(match_mask(b.column(TAG_COL), pat)))

            src = src.map_batches(tag_filter, batch_format="pyarrow")
        if m.group("limit"):
            n = int(m.group("limit"))
            src = src.sort(ts_col, descending=True).limit(n)
        snapshots[name] = src.materialize()
        return snapshots[name]
    # FLUSH
    buf = snapshots.pop(name, None)
    if buf is None:
        raise ValueError(f"no snapshot named {name!r}")
    if m.group("where"):
        cond = _parse_cond(m.group("where"))

        def cond_filter(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            return b.filter(pa.array(_eval_cond(cond, b)))

        buf = buf.map_batches(cond_filter, batch_format="pyarrow")
    return buf


def sp_execute(ds, sql: str, streams: dict | None = None,
               ts_col: str = "ts", now: float | None = None):
    """Execute an SP query over a tagged Dataset.

    Returns a Dataset (non-aggregate) or a sorted pandas frame
    (aggregate). ``streams`` maps STREAM:name → Dataset for queries
    reading a previously created stream.
    """
    q = sp_parse(sql)
    if q.from_stream:
        if not streams or q.from_stream not in streams:
            raise ValueError(f"unknown stream {q.from_stream!r}")
        ds = streams[q.from_stream]

    needs_fields_decode = False  # resolved lazily inside _resolve_key

    def filter_fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        mask = np.ones(b.num_rows, dtype=bool)
        if q.from_tag and TAG_COL in b.column_names:
            mask &= match_mask(b.column(TAG_COL), q.from_tag)
        if q.where is not None:
            mask &= _eval_cond(q.where, b, {})
        return b.filter(pa.array(mask))

    ds = ds.map_batches(filter_fn, batch_format="pyarrow")

    if not q.has_aggregates:
        sel = [s for s in q.select]

        def project(b: pa.Table) -> pa.Table:
            if any(s["kind"] == "star" for s in sel):
                return b
            cols, names = [], []
            cache: dict = {}  # per-batch fields-decode memo
            for s in sel:
                if s["kind"] == "expr":
                    v = _expr_series(s["expr"], b, cache)
                else:
                    v = _resolve_key(b, s["key"], cache, now=now)
                cols.append(pa.array(v))
                names.append(s["alias"])
            return pa.table(dict(zip(names, cols)))

        out_ds = ds.map_batches(project, batch_format="pyarrow")
        if q.stream is not None:
            # re-ingestion tag (flb_sp_stream.c:88-103): WITH(tag=...)
            # or the stream name (instance-alias default)
            new_tag = q.stream_tag

            def retag(b: pa.Table) -> pa.Table:
                col = pa.array([new_tag] * b.num_rows, type=pa.string())
                if TAG_COL in b.column_names:
                    return b.set_column(
                        b.column_names.index(TAG_COL), TAG_COL, col)
                return b.append_column(TAG_COL, col)

            out_ds = out_ds.map_batches(retag, batch_format="pyarrow")
        if q.limit is not None:
            # deterministic order contract: global sort on every
            # output column, then the first n (see sp_parse)
            cols = out_ds.schema().names
            out_ds = out_ds.sort(cols).limit(q.limit)
        return out_ds

    # ---------------- aggregate path: partials then groupby
    aggs = [s for s in q.select if s["kind"] == "agg"]
    gkeys = list(q.group_by)
    window = q.window

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_partial(aggs, gkeys, window)
        data = {}
        cache: dict = {}  # per-batch fields-decode memo
        if window:
            ts = b.column(ts_col).cast(pa.timestamp("ns")).cast(pa.int64()) \
                .to_numpy() // 1_000_000_000
            wtype, size, adv = window
            if wtype == "TUMBLING":
                data["_w"] = (ts // size) * size
            else:  # hopping: explode to every window containing the row
                n_over = -(-size // adv)  # ceil
                reps = []
                base = (ts // adv) * adv
                for k in range(n_over):
                    start = base - k * adv
                    ok = ts < start + size
                    reps.append((start, ok))
                idx = np.concatenate([np.nonzero(ok)[0] for _, ok in reps])
                starts = np.concatenate([s[ok] for s, ok in reps])
                b = b.take(pa.array(idx))
                data["_w"] = starts
        for g in gkeys:
            data[g] = _resolve_key(b, g, cache).to_numpy(dtype=object)
        for i, a in enumerate(aggs):
            if a["fn"] in ("FORECAST", "FORECAST_R"):
                xk = a["key_x"]
                if xk.upper() == "RECORD_TIME()":
                    xs = pd.Series(
                        b.column(ts_col).cast(pa.timestamp("ns"))
                        .cast(pa.int64()).to_numpy() / 1e9)
                else:
                    xs = pd.to_numeric(_resolve_key(b, xk, cache),
                                       errors="coerce")
                ys = pd.to_numeric(_resolve_key(b, a["key"], cache),
                                   errors="coerce")
                ok = (xs.notna() & ys.notna()).to_numpy()
                x = np.where(ok, xs.to_numpy(dtype=float), 0.0)
                y = np.where(ok, ys.to_numpy(dtype=float), 0.0)
                data[f"_f{i}_sx"] = x
                data[f"_f{i}_sy"] = y
                data[f"_f{i}_sxy"] = x * y
                data[f"_f{i}_sx2"] = x * x
                data[f"_f{i}_n"] = ok.astype(float)
                data[f"_f{i}_mx"] = np.where(ok, x, -np.inf)
            elif a["fn"] == "COUNT":
                data[f"_v{i}"] = np.ones(b.num_rows)
                data[f"_n{i}"] = np.ones(b.num_rows)
            else:
                if "expr" in a:
                    vals = _expr_series(a["expr"], b, cache)
                else:
                    vals = pd.to_numeric(_resolve_key(b, a["key"], cache),
                                         errors="coerce")
                data[f"_v{i}"] = vals.to_numpy(dtype=float)
                data[f"_n{i}"] = vals.notna().to_numpy(dtype=float)
        df = pd.DataFrame(data)
        keys = (["_w"] if window else []) + gkeys
        if not keys:
            df["_k"] = 0
            keys = ["_k"]
        spec = {}
        for i, a in enumerate(aggs):
            fn = a["fn"]
            if fn in ("FORECAST", "FORECAST_R"):
                for suf in ("sx", "sy", "sxy", "sx2", "n"):
                    spec[f"_f{i}_{suf}"] = "sum"
                spec[f"_f{i}_mx"] = "max"
                continue
            if fn in ("COUNT", "SUM", "AVG"):
                spec[f"_v{i}"] = "sum"
            elif fn == "MIN":
                spec[f"_v{i}"] = "min"
            else:
                spec[f"_v{i}"] = "max"
            spec[f"_n{i}"] = "sum"
        g = df.groupby(keys, sort=False, dropna=False).agg(spec).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum
    keys = (["_w"] if window else []) + gkeys
    ray_aggs = []
    for i, a in enumerate(aggs):
        fn = a["fn"]
        if fn in ("FORECAST", "FORECAST_R"):
            for suf in ("sx", "sy", "sxy", "sx2", "n"):
                ray_aggs.append(Sum(f"_f{i}_{suf}", alias_name=f"_f{i}_{suf}"))
            ray_aggs.append(Max(f"_f{i}_mx", alias_name=f"_f{i}_mx"))
            continue
        if fn in ("COUNT", "SUM", "AVG"):
            ray_aggs.append(Sum(f"_v{i}", alias_name=f"_v{i}"))
        elif fn == "MIN":
            ray_aggs.append(Min(f"_v{i}", alias_name=f"_v{i}"))
        else:
            ray_aggs.append(Max(f"_v{i}", alias_name=f"_v{i}"))
        ray_aggs.append(Sum(f"_n{i}", alias_name=f"_n{i}"))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    if keys:
        agg = parts.groupby(keys).aggregate(*ray_aggs)
    else:
        agg = parts.groupby("_k").aggregate(*ray_aggs)
    out = agg.to_pandas()
    res = pd.DataFrame()
    if window:
        res["window_start"] = pd.to_datetime(out["_w"], unit="s")
    for g in gkeys:
        res[g] = out[g]
    for i, a in enumerate(aggs):
        fn = a["fn"]
        if fn in ("FORECAST", "FORECAST_R"):
            # simple linear regression from distributed sufficient stats
            # (reference sp_process_timeseries_data, flb_sp.c:1409)
            sx, sy = out[f"_f{i}_sx"], out[f"_f{i}_sy"]
            sxy, sx2 = out[f"_f{i}_sxy"], out[f"_f{i}_sx2"]
            cnt, mx = out[f"_f{i}_n"], out[f"_f{i}_mx"]
            with np.errstate(invalid="ignore", divide="ignore"):
                denom = cnt * sx2 - sx * sx
                slope = (cnt * sxy - sx * sy) / denom
                intercept = (sy - slope * sx) / cnt
                if fn == "FORECAST":
                    res[a["alias"]] = intercept + slope * (mx + a["horizon"])
                else:  # FORECAST_R: x at which y reaches the target value
                    x_at = (a["horizon"] - intercept) / slope
                    if a["cap"] is not None:
                        x_at = np.minimum(x_at, a["cap"])
                    res[a["alias"]] = x_at
        elif fn == "COUNT":
            res[a["alias"]] = out[f"_v{i}"].astype("int64")
        elif fn == "AVG":
            with np.errstate(invalid="ignore"):
                res[a["alias"]] = out[f"_v{i}"] / out[f"_n{i}"]
        else:
            res[a["alias"]] = out[f"_v{i}"]
    sort_cols = (["window_start"] if window else []) + gkeys
    if sort_cols:
        res = res.sort_values(sort_cols).reset_index(drop=True)
    if q.limit is not None:
        # groups are unique per (window, keys), so the sorted head is
        # deterministic; a global aggregate has one row anyway
        res = res.sort_values(list(res.columns)).head(q.limit) \
            .reset_index(drop=True)
    if q.stream is not None:
        res[TAG_COL] = q.stream_tag
    return res


def _empty_partial(aggs, gkeys, window) -> pa.Table:
    data = {}
    if window:
        data["_w"] = pa.array([], type=pa.int64())
    for g in gkeys:
        data[g] = pa.array([], type=pa.string())
    for i, a in enumerate(aggs):
        if a["fn"] in ("FORECAST", "FORECAST_R"):
            for suf in ("sx", "sy", "sxy", "sx2", "n", "mx"):
                data[f"_f{i}_{suf}"] = pa.array([], type=pa.float64())
        else:
            data[f"_v{i}"] = pa.array([], type=pa.float64())
            data[f"_n{i}"] = pa.array([], type=pa.float64())
    if not window and not gkeys:
        data["_k"] = pa.array([], type=pa.int64())
    return pa.table(data)
