"""/sql handler: a SQL front-end over Ray Datasets.

Reference: the SQL module parses SQL with Calcite and plans it onto
streaming expressions over one collection
(solr/modules/sql/src/java/org/apache/solr/handler/sql/SQLHandler.java:49,
CalciteSolrDriver). This front-end covers that scope — SELECT with
WHERE / GROUP BY aggregates / HAVING / ORDER BY / LIMIT — plus INNER and
LEFT [OUTER] JOIN with table aliases and qualified column references
(beyond the reference, whose /sql is single-collection; Calcite would
plan these natively). It compiles onto the building blocks the
streaming-expression DSL uses (ops/queryfilter specs, Ray groupby
aggregates, hash-partitioned Dataset.join, sort, limit).

Grammar (case-insensitive keywords):

    SELECT [DISTINCT] <*| item[, item...]>
      FROM <table | (SELECT ...)> [[AS] alias]
      [[INNER|LEFT|RIGHT|FULL [OUTER]] JOIN <table> [[AS] alias]
       ON a.x = b.y]...
      [WHERE <cond>] [GROUP BY <col|expr>[, ...]] [HAVING <cond>]
      [ORDER BY col [ASC|DESC][, ...]] [LIMIT n]
    stmt := select [UNION [ALL] | INTERSECT | EXCEPT select ...]
            (INTERSECT binds tighter, ANSI; ORDER BY/LIMIT after the
            last operand apply to the whole set result)

    With JOINs, columns may be qualified (alias.col); bare names resolve
    when unambiguous. Each JOIN is one hash-partitioned distributed
    Dataset.join; chained joins are separated by materialize barriers so
    aggregator pools never deadlock a small CPU budget. HAVING addresses
    OUTPUT column names OR aggregates directly (HAVING COUNT(*) > 5
    computes a hidden agg output, dropped after the filter); ORDER BY
    addresses OUTPUT column names.

    item  := expr [AS alias]        (alias REQUIRED unless expr is a bare
                                     column or a simple aggregate)
    expr  := full arithmetic over columns/literals with + - * / and unary
             minus, parentheses, CAST(expr AS BIGINT|INTEGER|DOUBLE|VARCHAR),
             scalar functions UPPER|LOWER|LENGTH|SUBSTR|SUBSTRING|TRIM|
             FLOOR|CEIL|ABS|COALESCE|NULLIF,
             CASE WHEN <cond> THEN expr [...] [ELSE expr] END (a NULL
             condition does not match; no ELSE -> typed nulls),
             window functions ROW_NUMBER|RANK|DENSE_RANK
             () OVER (PARTITION BY cols ORDER BY col [DESC][, ...]),
             navigation window functions LAG|LEAD(col[, k[, default]]),
             NTILE(n), FIRST_VALUE|LAST_VALUE(col) OVER (...) — ANSI
             default frame only (LAST_VALUE = last row of the current
             peer group), and
             window aggregates SUM|AVG|MIN|MAX|COUNT(col) OVER (...):
             explicit ROWS BETWEEN (UNBOUNDED | n) PRECEDING AND CURRENT
             ROW frames, the ANSI default frame (ORDER BY with no frame
             = RANGE UNBOUNDED PRECEDING, cumulative incl. the current
             row's peers), and whole-partition aggregates (no ORDER BY;
             MIN/MAX window results are float64 — CAST to restore
             integer typing),
             and aggregates COUNT(*) | COUNT(DISTINCT col) |
             COUNT|SUM|AVG|MIN|MAX(expr) as leaves
             (SUM(price * (1 - discount)), SUM(x)/COUNT(*), ... all work;
             `/` is ANSI float division, matching DuckDB)
    cond  := disjunctions/conjunctions of: col <op> literal,
             <scalar expr over columns> <op> literal (fns/arithmetic/CAST;
             aggregates rejected), col IN (...),
             col IN (SELECT single-col ...)  (uncorrelated; runs as its own
             distributed plan, distinct keys broadcast — semi-join shape),
             col [NOT] BETWEEN a AND b, col [NOT] LIKE 'pat' (general %/_
             patterns via arrow match_like; bare prefixes take the
             starts_with fast path), col IS [NOT] NULL, col NOT IN (...),
             NOT, parentheses

Everything unsupported raises ValueError up front — no silent wrong
answers. Because the accepted dialect is ANSI, the very same query string
doubles as its own DuckDB oracle (see __ray_entry__'s sql_* entries).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from solr_ray.ops.queryfilter import compile_filter, filter_query

_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<cmp><=|>=|<>|!=|=|<|>)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)
  | (?P<punct>[(),*+\-/])
""", re.VERBOSE)

_AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
_SCALAR_FNS = {"UPPER", "LOWER", "LENGTH", "SUBSTR", "SUBSTRING", "TRIM",
               "FLOOR", "CEIL", "ABS", "COALESCE", "NULLIF",
               "YEAR", "MONTH", "DAY"}
_WINDOW_FNS = {"ROW_NUMBER", "RANK", "DENSE_RANK"}
_NAV_FNS = {"LAG", "LEAD", "NTILE", "FIRST_VALUE", "LAST_VALUE"}
_CAST_TYPES = {"BIGINT": "int64", "INTEGER": "int32", "DOUBLE": "float64",
               "VARCHAR": "string"}
_KEYWORDS = {"SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER",
             "LIMIT", "AS", "AND", "OR", "NOT", "IN", "BETWEEN", "LIKE",
             "ASC", "DESC", "JOIN", "ON", "INNER", "LEFT", "RIGHT", "FULL",
             "OUTER", "DISTINCT", "OVER", "PARTITION", "ROWS", "PRECEDING",
             "UNBOUNDED", "CURRENT", "ROW", "CASE", "WHEN", "THEN", "ELSE",
             "END", "IS", "NULL", "EXISTS", "RANGE", "UNION", "INTERSECT",
             "EXCEPT", "ALL", "OFFSET"}


def _tokenize(sql: str):
    out, i = [], 0
    while i < len(sql):
        m = _TOKEN.match(sql, i)
        if not m:
            raise ValueError(f"bad SQL at {sql[i:i+25]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "name" and val.upper() in _KEYWORDS:
            out.append(("kw", val.upper()))
        elif kind == "str":
            out.append(("str", val[1:-1].replace("''", "'")))
        elif kind == "num":
            out.append(("num", float(val) if "." in val else int(val)))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0
        self._allow_aggs = False  # True while parsing HAVING

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def at_kw(self, *kws):
        k, v = self.peek()
        return k == "kw" and v in kws

    # ---- select items ----
    def select_list(self):
        if self.peek() == ("punct", "*"):
            self.eat()
            return [{"kind": "star"}]
        items = [self.select_item()]
        while self.peek() == ("punct", ","):
            self.eat()
            items.append(self.select_item())
        return items

    def select_item(self):
        node = self.expr()
        item = _normalize_item(node)
        if self.at_kw("AS"):
            self.eat()
            item["alias"] = self.eat("name")
        elif item["kind"] in ("expr", "win"):
            raise ValueError("expression/window select items require "
                             "AS <alias> (keeps Ray and oracle column "
                             "names identical)")
        return item

    # ---- expressions (select list): + - * / with unary minus,
    #      parentheses, CAST(expr AS t) and aggregates as leaves ----
    def expr(self):
        node = self.expr_term()
        while self.peek() in (("punct", "+"), ("punct", "-")):
            op = self.eat()
            node = {"kind": "bin", "op": op, "l": node, "r": self.expr_term()}
        return node

    def expr_term(self):
        node = self.expr_unary()
        while self.peek() in (("punct", "*"), ("punct", "/")):
            op = self.eat()
            node = {"kind": "bin", "op": op, "l": node,
                    "r": self.expr_unary()}
        return node

    def expr_unary(self):
        if self.peek() == ("punct", "-"):
            self.eat()
            return {"kind": "neg", "inner": self.expr_unary()}
        return self.expr_primary()

    def expr_primary(self):
        k, v = self.peek()
        if k == "kw" and v == "CASE":
            self.eat()
            branches = []
            while self.at_kw("WHEN"):
                self.eat()
                cond = self.cond()
                self.eat("kw", "THEN")
                branches.append((cond, self.expr()))
            if not branches:
                raise ValueError("CASE needs at least one WHEN branch")
            els = None
            if self.at_kw("ELSE"):
                self.eat()
                els = self.expr()
            self.eat("kw", "END")
            return {"kind": "case", "branches": branches, "else": els}
        if k in ("num", "str"):
            self.i += 1
            return {"kind": "lit", "value": v}
        if self.peek() == ("punct", "("):
            self.eat()
            node = self.expr()
            self.eat("punct", ")")
            return node
        if k != "name":
            raise ValueError(f"expected expression, got {v!r}")
        name = self.eat("name")
        up = name.upper()
        if up == "CAST" and self.peek() == ("punct", "("):
            self.eat()
            inner = self.expr()
            self.eat("kw", "AS")
            ty = self.eat("name").upper()
            if ty not in _CAST_TYPES:
                raise ValueError(f"unsupported CAST type {ty!r}")
            self.eat("punct", ")")
            return {"kind": "cast", "inner": inner, "type": ty}
        if up in _WINDOW_FNS and self.peek() == ("punct", "("):
            self.eat()
            self.eat("punct", ")")
            partition, worder, frame = self.over_clause()
            if frame is not None:
                raise ValueError(f"{up}() takes no frame clause")
            if not worder:
                raise ValueError(f"{up}() requires ORDER BY")
            return {"kind": "win", "fn": up, "partition": partition,
                    "order": worder}
        if up in _NAV_FNS and self.peek() == ("punct", "("):
            # navigation window functions: LAG/LEAD(col[, k[, default]]),
            # NTILE(n), FIRST_VALUE/LAST_VALUE(col). ANSI default frame
            # only (LAST_VALUE = last row of the current peer group).
            self.eat()
            node: dict = {"kind": "win", "fn": up}
            if up == "NTILE":
                n = self.eat("num")
                if not isinstance(n, int) or n < 1:
                    raise ValueError("NTILE(n) needs a positive integer")
                node["n"] = n
            else:
                node["col"] = self.eat("name")
                if up in ("LAG", "LEAD"):
                    node["offset"], node["default"] = 1, None
                    if self.peek() == ("punct", ","):
                        self.eat()
                        k = self.eat("num")
                        if not isinstance(k, int) or k < 0:
                            raise ValueError(
                                f"{up} offset must be a non-negative int")
                        node["offset"] = k
                        if self.peek() == ("punct", ","):
                            self.eat()
                            neg = False
                            if self.peek() == ("punct", "-"):
                                self.eat()
                                neg = True
                            kk, vv = self.peek()
                            if kk not in ("num", "str") or (
                                    neg and kk != "num"):
                                raise ValueError(
                                    f"{up} default must be a literal")
                            self.eat()
                            node["default"] = -vv if neg else vv
            self.eat("punct", ")")
            partition, worder, frame = self.over_clause()
            if frame is not None:
                raise ValueError(f"{up}() supports only the default frame")
            if not worder:
                raise ValueError(f"{up}() requires ORDER BY")
            node["partition"], node["order"] = partition, worder
            return node
        if up in _SCALAR_FNS and self.peek() == ("punct", "("):
            self.eat()
            args = [self.expr()]
            while self.peek() == ("punct", ","):
                self.eat()
                args.append(self.expr())
            self.eat("punct", ")")
            return {"kind": "fn", "fn": up, "args": args}
        if up in _AGGS and self.peek() == ("punct", "("):
            self.eat()
            distinct = False
            if self.at_kw("DISTINCT"):
                if up != "COUNT":
                    raise ValueError(
                        f"{name}(DISTINCT ...) not supported (COUNT only)")
                self.eat()
                distinct = True
            if self.peek() == ("punct", "*"):
                if up != "COUNT":
                    raise ValueError(f"{name}(*) not supported")
                if distinct:
                    raise ValueError("COUNT(DISTINCT *) is not SQL")
                self.eat()
                arg = "*"
            else:
                arg = self.expr()
            self.eat("punct", ")")
            node = {"kind": "agg", "fn": up, "arg": arg}
            if distinct:
                if arg == "*" or arg["kind"] != "col":
                    raise ValueError(
                        "COUNT(DISTINCT ...) needs a bare column")
                node["distinct"] = True
            if self.at_kw("OVER"):
                # frame aggregate: SUM(col) OVER (... ROWS BETWEEN ...)
                if distinct:
                    raise ValueError("DISTINCT window aggregates are not "
                                     "supported")
                if arg == "*" or arg["kind"] != "col":
                    raise ValueError("window aggregates need a bare column")
                partition, worder, frame = self.over_clause()
                if frame is None:
                    # ANSI defaults: with ORDER BY, RANGE BETWEEN
                    # UNBOUNDED PRECEDING AND CURRENT ROW (cumulative
                    # incl. the current row's PEERS); without, the whole
                    # partition
                    frame = "range_unbounded" if worder else \
                        "whole_partition"
                if isinstance(frame, tuple):
                    # RANGE n PRECEDING: value-based frame — prefix-sum
                    # arithmetic covers SUM/AVG/COUNT; sliding extrema
                    # over variable windows are out of scope
                    if up in ("MIN", "MAX"):
                        raise ValueError(
                            "MIN/MAX over RANGE n PRECEDING frames are "
                            "not supported (SUM/AVG/COUNT are)")
                    if len(worder) != 1 or worder[0][1]:
                        raise ValueError("RANGE frames require exactly "
                                         "one ascending ORDER BY column")
                if frame in ("range_unbounded", "whole_partition") \
                        and not worder and frame == "range_unbounded":
                    raise ValueError("RANGE frames require ORDER BY")
                return {"kind": "win", "fn": up, "col": arg["col"],
                        "partition": partition, "order": worder,
                        "frame": frame}
            return node
        return {"kind": "col", "col": name}

    def over_clause(self):
        """OVER (PARTITION BY cols ORDER BY col [DESC][, ...]
        [ROWS BETWEEN (UNBOUNDED | n) PRECEDING AND CURRENT ROW])
        -> (partition, order, frame) with frame None (absent),
        "unbounded", or the int n."""
        self.eat("kw", "OVER")
        self.eat("punct", "(")
        partition: list[str] = []
        if self.at_kw("PARTITION"):
            self.eat()
            self.eat("kw", "BY")
            partition = [self.eat("name")]
            while self.peek() == ("punct", ","):
                self.eat()
                partition.append(self.eat("name"))
        worder: list[tuple[str, bool]] = []
        if self.at_kw("ORDER"):
            self.eat()
            self.eat("kw", "BY")
            while True:
                c = self.eat("name")
                d = False
                if self.at_kw("ASC", "DESC"):
                    d = self.eat() == "DESC"
                worder.append((c, d))
                if self.peek() != ("punct", ","):
                    break
                self.eat()
        frame = None
        if self.at_kw("ROWS", "RANGE"):
            is_range = self.eat() == "RANGE"
            self.eat("kw", "BETWEEN")
            if self.at_kw("UNBOUNDED"):
                self.eat()
                frame = "range_unbounded" if is_range else "unbounded"
            else:
                n = self.eat("num")
                frame = ("range", float(n)) if is_range else int(n)
            self.eat("kw", "PRECEDING")
            self.eat("kw", "AND")
            self.eat("kw", "CURRENT")
            self.eat("kw", "ROW")
        self.eat("punct", ")")
        return partition, worder, frame

    # ---- conditions -> queryfilter spec ----
    def cond(self):
        left = self.cond_and()
        clauses = [left]
        while self.at_kw("OR"):
            self.eat()
            clauses.append(self.cond_and())
        return clauses[0] if len(clauses) == 1 else {
            "op": "or", "clauses": clauses}

    def cond_and(self):
        clauses = [self.cond_not()]
        while self.at_kw("AND"):
            self.eat()
            clauses.append(self.cond_not())
        return clauses[0] if len(clauses) == 1 else {
            "op": "and", "clauses": clauses}

    def cond_not(self):
        if self.at_kw("NOT"):
            self.eat()
            return {"op": "not", "clauses": [self.cond_not()]}
        if self.peek() == ("punct", "("):
            self.eat()
            c = self.cond()
            self.eat("punct", ")")
            return c
        return self.predicate()

    def literal(self):
        if self.peek() == ("punct", "-"):
            self.eat()
            k, v = self.peek()
            if k != "num":
                raise ValueError(f"expected number after unary -, got {v!r}")
            self.i += 1
            return -v
        k, v = self.peek()
        if k in ("num", "str"):
            self.i += 1
            return v
        raise ValueError(f"expected literal, got {v!r}")

    def predicate(self):
        if self.at_kw("EXISTS"):
            # [NOT] EXISTS (SELECT ...) — cond_not supplies the NOT wrap.
            # Correlation via qualified col = col conjuncts inside the
            # subquery WHERE (resolved to a semi-join terms spec later).
            self.eat()
            self.eat("punct", "(")
            sub = self.statement(stop_at_paren=True)
            self.eat("punct", ")")
            return {"op": "exists_subquery", "plan": sub}
        # LHS is a full scalar expression; a bare column keeps the legacy
        # spec shapes (term/range/terms have optimized filter kernels),
        # anything else (scalar fn, arithmetic, CAST) compiles to a
        # cmp_expr spec evaluated per batch. Aggregates are rejected.
        node = self.expr()
        is_col = node.get("kind") == "col"
        col = node["col"] if is_col else None
        if not is_col:
            aggs: list = []
            _walk_aggs(node, aggs)
            if aggs and not self._allow_aggs:
                raise ValueError("aggregates are not allowed in WHERE")
            k, v = self.peek()
            if k != "cmp":
                raise ValueError(
                    "expression predicates support only <cmp> literal "
                    f"(got {v!r})")
            self.eat()
            if (self.peek() == ("punct", "(")
                    and self.toks[self.i + 1] == ("kw", "SELECT")):
                # <agg/expr> <cmp> (SELECT ...) — e.g. HAVING SUM(x) >
                # (SELECT ...); the uncorrelated subquery folds to a
                # literal before execution
                self.eat()
                sub = self.statement(stop_at_paren=True)
                self.eat("punct", ")")
                return {"op": "cmp_expr_subquery", "node": node,
                        "cmp": v, "plan": sub}
            return {"op": "cmp_expr", "node": node, "cmp": v,
                    "value": self.literal()}
        if self.at_kw("IS"):
            # col IS [NOT] NULL
            self.eat()
            neg = False
            if self.at_kw("NOT"):
                self.eat()
                neg = True
            self.eat("kw", "NULL")
            exists = {"op": "exists", "field": col}
            return (exists if neg
                    else {"op": "not", "clauses": [exists]})
        if self.at_kw("NOT"):
            # col NOT IN (...) / NOT LIKE / NOT BETWEEN
            self.eat()
            if not self.at_kw("IN", "LIKE", "BETWEEN"):
                raise ValueError("expected IN/LIKE/BETWEEN after NOT")
            self.toks.insert(self.i, ("name", col))  # re-parse positively
            return {"op": "not", "clauses": [self.predicate()]}
        k, v = self.peek()
        if k == "cmp":
            self.eat()
            if (self.peek() == ("punct", "(")
                    and self.toks[self.i + 1] == ("kw", "SELECT")):
                # col <cmp> (SELECT ...) — scalar subquery, resolved to a
                # literal before execution (must yield exactly one value)
                self.eat()
                sub = self.statement(stop_at_paren=True)
                self.eat("punct", ")")
                return {"op": "cmp_scalar_subquery", "field": col,
                        "cmp": v, "plan": sub}
            if self.peek()[0] == "name":
                # col = col — only meaningful as an EXISTS correlation
                # conjunct; _execute_plan rejects any that survive
                other = self.eat("name")
                if v != "=":
                    raise ValueError(
                        "column-to-column predicates support only = "
                        "(EXISTS correlation)")
                return {"op": "col_eq", "left": col, "right": other}
            lit = self.literal()
            if v == "=":
                return {"op": "term", "field": col, "value": lit}
            if v in ("<>", "!="):
                return {"op": "not", "clauses": [
                    {"op": "term", "field": col, "value": lit}]}
            if v == "<":
                return {"op": "range", "field": col, "hi": lit,
                        "include_hi": False}
            if v == "<=":
                return {"op": "range", "field": col, "hi": lit,
                        "include_hi": True}
            if v == ">":
                return {"op": "range", "field": col, "lo": lit,
                        "include_lo": False}
            if v == ">=":
                return {"op": "range", "field": col, "lo": lit,
                        "include_lo": True}
        if self.at_kw("IN"):
            self.eat()
            self.eat("punct", "(")
            if self.at_kw("SELECT"):
                sub = self.statement(stop_at_paren=True)
                self.eat("punct", ")")
                return {"op": "in_subquery", "field": col, "plan": sub}
            vals = [self.literal()]
            while self.peek() == ("punct", ","):
                self.eat()
                vals.append(self.literal())
            self.eat("punct", ")")
            return {"op": "terms", "field": col, "values": vals}
        if self.at_kw("BETWEEN"):
            self.eat()
            lo = self.literal()
            self.eat("kw", "AND")
            hi = self.literal()
            return {"op": "range", "field": col, "lo": lo, "hi": hi,
                    "include_lo": True, "include_hi": True}
        if self.at_kw("LIKE"):
            self.eat()
            pat = self.literal()
            if not isinstance(pat, str):
                raise ValueError(f"LIKE needs a string pattern, got {pat!r}")
            if (pat.endswith("%") and "%" not in pat[:-1]
                    and "_" not in pat):
                # bare prefix: starts_with fast path
                return {"op": "prefix", "field": col, "value": pat[:-1]}
            return {"op": "like", "field": col, "pattern": pat}
        raise ValueError(f"unsupported predicate after {col!r}: {v!r}")

    # ---- full statement ----
    def statement(self, stop_at_paren: bool = False):
        plan = self.select_core()
        if self.at_kw("UNION", "INTERSECT", "EXCEPT"):
            # set operations: INTERSECT binds tighter (ANSI), ORDER BY /
            # LIMIT after the LAST operand apply to the whole result
            ops: list = [(None, plan)]
            while self.at_kw("UNION", "INTERSECT", "EXCEPT"):
                op = self.eat().lower()
                if op == "union" and self.at_kw("ALL"):
                    self.eat()
                    op = "union_all"
                ops.append((op, self.select_core()))
            for _, p in ops[:-1]:
                if p["order"] or p["limit"] is not None:
                    raise ValueError(
                        "ORDER BY/LIMIT inside a set-operation operand is "
                        "not supported (put them after the last operand)")
            last = ops[-1][1]
            order, limit, off = last["order"], last["limit"], last["offset"]
            last["order"], last["limit"], last["offset"] = [], None, 0
            plan = {"set": ops, "order": order, "limit": limit,
                    "offset": off, "items": ops[0][1]["items"],
                    "joins": [], "where": None, "group": None,
                    "having": None, "table": None, "alias": None,
                    "select_distinct": False}
        if stop_at_paren:
            if self.peek() != ("punct", ")"):
                raise ValueError(
                    f"unterminated subquery at {self.peek()[1]!r}")
        elif self.peek()[0] != "eof":
            raise ValueError(f"trailing SQL at {self.peek()[1]!r}")
        return plan

    def select_core(self):
        self.eat("kw", "SELECT")
        select_distinct = False
        if self.at_kw("DISTINCT"):
            self.eat()
            select_distinct = True
        items = self.select_list()
        self.eat("kw", "FROM")
        table, alias = self.table_ref()
        implicit = []
        while self.peek() == ("punct", ","):
            # FROM a, b, ... — implicit joins; WHERE equalities between
            # the tables become the join keys (rewritten at execution)
            self.eat()
            it, ia = self.table_ref()
            implicit.append({"table": it, "alias": ia})
        joins = []
        while self.at_kw("JOIN", "INNER", "LEFT", "RIGHT", "FULL"):
            how = "inner"
            if self.at_kw("INNER"):
                self.eat()
            elif self.at_kw("LEFT", "RIGHT", "FULL"):
                how = {"LEFT": "left_outer", "RIGHT": "right_outer",
                       "FULL": "full_outer"}[self.eat()]
                if self.at_kw("OUTER"):
                    self.eat()
            self.eat("kw", "JOIN")
            jt, ja = self.table_ref()
            self.eat("kw", "ON")
            lk = self.eat("name")
            self.eat("cmp", "=")
            rk = self.eat("name")
            joins.append({"table": jt, "alias": ja, "how": how,
                          "lk": lk, "rk": rk})
        where = group = having = None
        order: list[tuple[str, bool]] = []
        limit = None
        if self.at_kw("WHERE"):
            self.eat()
            where = self.cond()
        if self.at_kw("GROUP"):
            self.eat()
            self.eat("kw", "BY")
            def group_item():
                if self.peek()[0] == "num":
                    # GROUP BY <ordinal>: the n-th select item (its
                    # source column or expression node)
                    n = self.eat("num")
                    if not isinstance(n, int) or not (
                            1 <= n <= len(items)):
                        raise ValueError("GROUP BY ordinal out of range")
                    it = items[n - 1]
                    if it["kind"] == "col":
                        return it["col"]
                    if it["kind"] == "expr":
                        return it["node"]
                    raise ValueError("GROUP BY ordinal must reference a "
                                     "column or expression item")
                node = self.expr()
                return (node["col"] if node.get("kind") == "col"
                        else node)  # expression group key

            group = [group_item()]
            while self.peek() == ("punct", ","):
                self.eat()
                group.append(group_item())
        if self.at_kw("HAVING"):
            self.eat()
            self._allow_aggs = True
            having = self.cond()
            self._allow_aggs = False
        if self.at_kw("ORDER"):
            self.eat()
            self.eat("kw", "BY")
            while True:
                if self.peek()[0] == "num":
                    # ORDER BY <ordinal>: positional marker, resolved
                    # against the final output columns at execution
                    n = self.eat("num")
                    if not isinstance(n, int) or n < 1:
                        raise ValueError("ORDER BY ordinal must be a "
                                         "positive integer")
                    col = f"#{n}"
                else:
                    col = self.eat("name")
                desc = False
                if self.at_kw("ASC", "DESC"):
                    desc = self.eat() == "DESC"
                order.append((col, desc))
                if self.peek() != ("punct", ","):
                    break
                self.eat()
        offset = 0
        if self.at_kw("LIMIT"):
            self.eat()
            limit = int(self.eat("num"))
            if self.at_kw("OFFSET"):
                self.eat()
                offset = int(self.eat("num"))
        return {"items": items, "table": table, "alias": alias,
                "joins": joins, "implicit": implicit, "where": where,
                "group": group, "having": having, "order": order,
                "limit": limit, "offset": offset,
                "select_distinct": select_distinct}

    def table_ref(self):
        """table [AS] [alias], or a derived table (SELECT ...) [AS] alias
        — alias defaults to the table name (derived tables require one)."""
        if self.peek() == ("punct", "("):
            self.eat()
            sub = self.statement(stop_at_paren=True)
            self.eat("punct", ")")
            if self.at_kw("AS"):
                self.eat()
            if self.peek()[0] != "name":
                raise ValueError("derived tables require an alias")
            alias = self.eat("name")
            return {"subquery": sub}, alias
        table = self.eat("name")
        alias = table
        if self.at_kw("AS"):
            self.eat()
            alias = self.eat("name")
        elif self.peek()[0] == "name":
            alias = self.eat("name")
        return table, alias


def parse_sql(sql: str) -> dict:
    return _Parser(sql).statement()


def _normalize_item(node: dict) -> dict:
    """Expression tree -> select item. Bare columns and simple aggregates
    keep their legacy item shapes (and default output names); anything
    else is an `expr` item that must be aliased."""
    if node["kind"] == "col":
        return {"kind": "col", "col": node["col"]}
    if node["kind"] == "win":
        return dict(node)  # alias enforced by select_item
    if node["kind"] == "agg" and (
            node["arg"] == "*" or node["arg"]["kind"] == "col"):
        col = "*" if node["arg"] == "*" else node["arg"]["col"]
        item = {"kind": "agg", "fn": node["fn"], "col": col}
        if node.get("distinct"):
            item["distinct"] = True
        return item
    if node.get("distinct"):
        raise ValueError("COUNT(DISTINCT ...) cannot appear inside an "
                         "expression")
    return {"kind": "expr", "node": node}


def _walk_aggs(node, out: list) -> None:
    """Collect agg nodes of an expression tree in left-to-right order."""
    if not isinstance(node, dict):
        return
    if node["kind"] == "agg":
        out.append(node)
        return
    for key in ("l", "r", "inner"):
        if key in node:
            _walk_aggs(node[key], out)
    for a in node.get("args", ()):
        _walk_aggs(a, out)
    for _c, e in node.get("branches", ()):
        _walk_aggs(e, out)
    if node.get("else") is not None:
        _walk_aggs(node["else"], out)


def compile_expr(node: dict):
    """Expression tree -> fn(pa.Table) -> Array/scalar, pure pyarrow.compute
    kernels. `/` is ANSI float division (DuckDB semantics): both sides are
    cast to float64 first."""
    kind = node["kind"]
    if kind == "col":
        c = node["col"]
        return lambda t: t[c]
    if kind == "lit":
        v = pa.scalar(node["value"])
        return lambda t: v
    if kind == "neg":
        f = compile_expr(node["inner"])
        return lambda t: pc.negate(f(t))
    if kind == "cast":
        f = compile_expr(node["inner"])
        ty = _CAST_TYPES[node["type"]]
        return lambda t: pc.cast(f(t), ty)
    if kind == "bin":
        lf, rf = compile_expr(node["l"]), compile_expr(node["r"])
        if node["op"] == "/":
            return lambda t: pc.divide(pc.cast(lf(t), "float64"),
                                       pc.cast(rf(t), "float64"))
        fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}[node["op"]]
        return lambda t: fn(lf(t), rf(t))
    if kind == "fn":
        return _compile_scalar_fn(node)
    if kind == "case":
        # SQL CASE: first matching WHEN wins; a NULL condition does not
        # match (Kleene mask filled to false); no ELSE -> typed nulls.
        compiled = [(compile_filter(c), compile_expr(e))
                    for c, e in node["branches"]]
        else_f = compile_expr(node["else"]) if node["else"] else None

        def case(t: pa.Table, _br=tuple(compiled), _e=else_f):
            thens = [_as_column(ef(t), t.num_rows) for _cf, ef in _br]
            acc = (_as_column(_e(t), t.num_rows) if _e is not None
                   else pa.nulls(t.num_rows, thens[0].type))
            for (cf, _ef), tv in zip(reversed(_br), reversed(thens)):
                mask = pc.fill_null(cf(t), False)
                acc = pc.if_else(mask, tv, acc)
            return acc

        return case
    raise ValueError(f"cannot evaluate {kind!r} here")


def _compile_scalar_fn(node: dict):
    """ANSI scalar functions onto pyarrow.compute kernels, DuckDB-matching
    semantics: LENGTH returns BIGINT; SUBSTR is 1-based (start/len must be
    integer literals — Arrow slices take plain ints). ROUND is deliberately
    absent (half-even vs half-away divergence would silently break
    oracles); FLOOR/CEIL/ABS are exact."""
    fn = node["fn"]
    args = node["args"]
    n_want = {"UPPER": (1,), "LOWER": (1,), "LENGTH": (1,), "TRIM": (1,),
              "FLOOR": (1,), "CEIL": (1,), "ABS": (1,),
              "SUBSTR": (2, 3), "SUBSTRING": (2, 3),
              "NULLIF": (2,), "YEAR": (1,), "MONTH": (1,),
              "DAY": (1,)}.get(fn)
    if fn == "COALESCE":
        if len(args) < 2:
            raise ValueError("COALESCE takes >= 2 args")
        fs = [compile_expr(x) for x in args]

        def coalesce(t, _fs=tuple(fs)):
            return pc.coalesce(*[_as_column(f(t), t.num_rows)
                                 for f in _fs])

        return coalesce
    if len(args) not in n_want:
        raise ValueError(f"{fn} takes {n_want} args, got {len(args)}")
    a = compile_expr(args[0])
    if fn == "NULLIF":
        bf = compile_expr(args[1])

        def nullif(t, _a=a, _b=bf):
            va = _as_column(_a(t), t.num_rows)
            return pc.if_else(pc.equal(va, _b(t)),
                              pa.scalar(None, va.type), va)

        return nullif
    if fn == "UPPER":
        return lambda t: pc.utf8_upper(a(t))
    if fn == "LOWER":
        return lambda t: pc.utf8_lower(a(t))
    if fn == "TRIM":
        return lambda t: pc.utf8_trim_whitespace(a(t))
    if fn == "LENGTH":
        return lambda t: pc.cast(pc.utf8_length(a(t)), pa.int64())
    if fn == "FLOOR":
        return lambda t: pc.floor(pc.cast(a(t), pa.float64()))
    if fn == "CEIL":
        return lambda t: pc.ceil(pc.cast(a(t), pa.float64()))
    if fn == "ABS":
        return lambda t: pc.abs(a(t))
    if fn in ("YEAR", "MONTH", "DAY"):
        # temporal extraction (DuckDB YEAR/MONTH/DAY return BIGINT)
        k = {"YEAR": pc.year, "MONTH": pc.month, "DAY": pc.day}[fn]
        return lambda t, _k=k: pc.cast(_k(a(t)), pa.int64())
    # SUBSTR / SUBSTRING
    for arg in args[1:]:
        if arg.get("kind") != "lit" or not isinstance(arg["value"], int):
            raise ValueError(f"{fn} start/length must be integer literals")
    start = args[1]["value"]
    if start < 1:
        raise ValueError(f"{fn} start is 1-based (got {start})")
    stop = (start - 1 + args[2]["value"]) if len(args) == 3 else None
    return lambda t: pc.utf8_slice_codeunits(a(t), start - 1, stop)


def _as_column(val, num_rows: int) -> pa.Array:
    if isinstance(val, pa.Scalar):
        return pa.repeat(val, num_rows)
    if isinstance(val, pa.ChunkedArray):
        return val.combine_chunks()
    return val


def _subst_aggs(node: dict) -> dict:
    """Replace agg leaves with references to their aggregated result
    columns (set by the planner as node['_alias'])."""
    if node["kind"] == "agg":
        return {"kind": "col", "col": node["_alias"]}
    out = dict(node)
    for key in ("l", "r", "inner"):
        if key in node:
            out[key] = _subst_aggs(node[key])
    if "args" in node:
        out["args"] = [_subst_aggs(a) for a in node["args"]]
    if "branches" in node:
        out["branches"] = [(c, _subst_aggs(e))
                           for c, e in node["branches"]]
        if out.get("else") is not None:
            out["else"] = _subst_aggs(out["else"])
    return out


def _agg_alias(item: dict) -> str:
    if "alias" in item:
        return item["alias"]
    if item.get("distinct"):
        return f"count(DISTINCT {item['col']})"  # DuckDB's default name
    return f"{item['fn'].lower()}({item['col']})"


def _make_agg(item: dict, star_col: str | None = None):
    import ray.data.aggregate as agg

    name = _agg_alias(item)
    fn, col = item["fn"], item["col"]
    if fn == "COUNT":
        # ANSI: COUNT(*) counts rows, COUNT(col) counts NON-NULL values
        # (left-join-produced nulls excluded, matching DuckDB).
        # GLOBAL Dataset.aggregate(Count()) without a column returns 0 in
        # Ray 2.49 — the caller passes star_col (any input column) so
        # COUNT(*) counts rows WITH nulls over a real column instead.
        if col == "*":
            if star_col is not None:
                return agg.Count(star_col, ignore_nulls=False,
                                 alias_name=name)
            return agg.Count(alias_name=name)
        return agg.Count(col, ignore_nulls=True, alias_name=name)
    cls = {"SUM": agg.Sum, "AVG": agg.Mean,
           "MIN": agg.Min, "MAX": agg.Max}[fn]
    return cls(col, alias_name=name)


def _project(ds, keep: list, renames: dict):
    """Explicit map_batches projection. Ray's select_columns/rename_columns
    Project ops can be silently dropped by projection pushdown when they
    follow a Join + MapBatches chain (observed on dotted column names:
    the sort then sees the pre-projection schema), so the SQL planner
    projects with a plain batch function the optimizer can't rewrite."""
    def f(t: pa.Table, _k=tuple(keep), _r=dict(renames)) -> pa.Table:
        return pa.table({_r.get(c, c): t[c] for c in _k})

    return ds.map_batches(f, batch_format="pyarrow")


def _cast_int_sums(ds, fn_of_alias: dict):
    """ANSI/DuckDB SUM over an integer column widens (DuckDB: HUGEINT,
    which lands as float64 in a result frame); Ray's Sum keeps int64.
    Cast integer-typed SUM outputs to float64 so result schemas match the
    oracle. An explicit CAST(SUM(..) AS BIGINT) in the query still applies
    AFTERWARD (expression step), restoring int64 when the user asked."""
    sums = tuple(n for n, f in fn_of_alias.items() if f == "SUM")
    if not sums:
        return ds

    def f(t: pa.Table, _s=sums) -> pa.Table:
        for c in _s:
            if c in t.column_names and pa.types.is_integer(
                    t.schema.field(c).type):
                t = t.set_column(t.column_names.index(c), c,
                                 pc.cast(t[c], pa.float64()))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def _resolve_name(name: str, qualified: set, bare: dict) -> str:
    if name in qualified:
        return name
    if "." in name:
        raise ValueError(f"unknown column {name!r}")
    hits = bare.get(name, [])
    if len(hits) == 1:
        return hits[0]
    raise ValueError(
        f"{'ambiguous' if hits else 'unknown'} column {name!r}")


def _resolve_cond(spec, qualified, bare):
    if not isinstance(spec, dict):
        return spec
    out = dict(spec)
    if "field" in out:
        out["field"] = _resolve_name(out["field"], qualified, bare)
    if "key_field" in out:  # cmp_lookup's correlation key
        out["key_field"] = _resolve_name(out["key_field"], qualified, bare)
    if out.get("op") == "col_eq":
        out["left"] = _resolve_name(out["left"], qualified, bare)
        out["right"] = _resolve_name(out["right"], qualified, bare)
    if "node" in out:
        out["node"] = _resolve_expr(out["node"], qualified, bare)
    if "clauses" in out:
        out["clauses"] = [_resolve_cond(c, qualified, bare)
                          for c in out["clauses"]]
    return out


def _resolve_expr(node, qualified, bare):
    if not isinstance(node, dict):
        return node
    out = dict(node)
    if out.get("kind") == "col":
        out["col"] = _resolve_name(out["col"], qualified, bare)
    if isinstance(out.get("arg"), dict):
        out["arg"] = _resolve_expr(out["arg"], qualified, bare)
    for k in ("l", "r", "inner"):
        if k in out:
            out[k] = _resolve_expr(out[k], qualified, bare)
    if "args" in out:
        out["args"] = [_resolve_expr(a, qualified, bare)
                       for a in out["args"]]
    if "branches" in out:
        out["branches"] = [(_resolve_cond(c, qualified, bare),
                            _resolve_expr(e, qualified, bare))
                           for c, e in out["branches"]]
        if out.get("else") is not None:
            out["else"] = _resolve_expr(out["else"], qualified, bare)
    return out


def _plan_joins(plan, tables, num_partitions: int = 16):
    """FROM a JOIN b ON ... -> one hash-partitioned Dataset.join per
    JOIN clause (Ray's distributed shuffle join), all columns qualified
    as alias.col. Returns (ds, qualified-name set).

    Known upstream limitation: Ray 2.49's Dataset.join raises
    ArrowInvalid when one side is COMPLETELY empty (its hash shuffle
    drops zero-row blocks, so the Acero join never sees that side's
    schema). A guard would cost a full count() pass per join input, so
    an empty-side join surfaces Ray's error instead of silently
    guessing."""

    def load(tname, alias):
        if isinstance(tname, dict):  # derived table: run its plan
            ds = _execute_plan(tname["subquery"], tables)
        elif tname in tables:
            ds = tables[tname]
        else:
            raise ValueError(f"unknown table {tname!r}")
        names = ds.schema().names
        return (ds.rename_columns({c: f"{alias}.{c}" for c in names}),
                {f"{alias}.{c}" for c in names})

    ds, qualified = load(plan["table"], plan["alias"])
    for ji, j in enumerate(plan["joins"]):
        rds, rqual = load(j["table"], j["alias"])

        def side_bare(names):
            b: dict = {}
            for q in names:
                b.setdefault(q.split(".", 1)[1], []).append(q)
            return b

        lk, rk = j["lk"], j["rk"]
        try:
            lk_q = _resolve_name(lk, qualified, side_bare(qualified))
            rk_q = _resolve_name(rk, rqual, side_bare(rqual))
        except ValueError:
            # ON b.y = a.x order: swap sides
            lk_q = _resolve_name(rk, qualified, side_bare(qualified))
            rk_q = _resolve_name(lk, rqual, side_bare(rqual))
        # Ray's join consumes key columns asymmetrically (drops the right
        # key on inner/left_outer, the LEFT key on right_outer, coalesces
        # both into the left on full_outer) — join on throwaway copies on
        # BOTH sides so the real key columns always survive with ANSI
        # nulls for unmatched rows, then drop whichever copies remain.
        lcopy, rcopy = f"__lk{ji}", f"__jk{ji}"

        def add_lkey(t: pa.Table, _k=lk_q, _c=lcopy) -> pa.Table:
            return t.append_column(_c, t[_k])

        def add_rkey(t: pa.Table, _k=rk_q, _c=rcopy) -> pa.Table:
            return t.append_column(_c, t[_k])

        ds = ds.map_batches(add_lkey, batch_format="pyarrow")
        rds = rds.map_batches(add_rkey, batch_format="pyarrow")
        ds = ds.join(rds, join_type=j["how"],
                     num_partitions=num_partitions,
                     on=(lcopy,), right_on=(rcopy,))

        def drop_copies(t: pa.Table, _c=(lcopy, rcopy)) -> pa.Table:
            return t.drop_columns([c for c in _c if c in t.column_names])

        ds = ds.map_batches(drop_copies, batch_format="pyarrow")
        if ji < len(plan["joins"]) - 1:
            # barrier between chained joins: each join's aggregator-actor
            # pool releases before the next one spins up (two concurrent
            # pools can starve a small CPU budget); the intermediate
            # spills through the object store like any shuffle output.
            # repartition first: a join can emit empty ZERO-SCHEMA blocks
            # that break the next join's Acero key resolution
            ds = ds.repartition(num_partitions).materialize()
        qualified |= rqual
    return ds, qualified


def _attach_distinct_counts(ds, src, group, items):
    """COUNT(DISTINCT col): distinct (keys, col) combos via a groupby
    (combiner shuffle), then a per-key non-null count, joined back onto
    the aggregated frame (hash-partitioned join — group cardinality can
    be large). ANSI semantics: NULLs don't count."""
    import pyarrow.compute as _pc
    import ray.data
    import ray.data.aggregate as agg

    keys = list(group or [])
    for it in items:
        alias = _agg_alias(it)
        col = it["col"]
        dd = _project(src, keys + [col], {})
        dd = _project(_null_safe_group(
            dd, keys + [col], lambda d, ks: d.groupby(ks).count()),
            keys + [col], {})
        if keys:
            # null group keys: both the groupby (Ray sort-partition
            # crash) and the join (Acero null keys never match) need the
            # (filled value, was-null flag) encoding — join on BOTH
            s0 = ds.schema()
            tys = [s0.types[s0.names.index(k)] for k in keys]
            flags = [f"__nj{i}" for i in range(len(keys))]

            def enc(t: pa.Table, _k=tuple(keys), _f=tuple(flags),
                    _ty=tuple(tys)) -> pa.Table:
                cols = {n: t[n] for n in t.schema.names}
                for k, f, ty in zip(_k, _f, _ty):
                    v = t[k]
                    cols[f] = pc.is_null(v)
                    cols[k] = pc.fill_null(v, _fill_scalar(ty))
                return pa.table(cols)

            def dec(t: pa.Table, _k=tuple(keys), _f=tuple(flags),
                    _ty=tuple(tys)) -> pa.Table:
                cols = {n: t[n] for n in t.schema.names if n not in _f}
                for k, f, ty in zip(_k, _f, _ty):
                    cols[k] = pc.if_else(t[f], pa.scalar(None, ty), t[k])
                return pa.table(cols)

            dcnt = (dd.map_batches(enc, batch_format="pyarrow")
                    .groupby(keys + flags).aggregate(
                        agg.Count(col, ignore_nulls=True,
                                  alias_name=alias)))
            # repartition coalesces the aggregates' empty zero-schema
            # blocks, which otherwise break the join's key resolution
            ds = (ds.map_batches(enc, batch_format="pyarrow")
                  .repartition(4).join(
                      dcnt.repartition(4), join_type="inner",
                      num_partitions=8, on=tuple(keys + flags))
                  .map_batches(dec, batch_format="pyarrow"))
        else:
            def nn(t: pa.Table, _c=col) -> pa.Table:
                v = int(_pc.sum(_pc.cast(_pc.is_valid(t[_c]),
                                         pa.int64())).as_py() or 0)
                return pa.table({"c": pa.array([v], pa.int64())})

            total = int(dd.map_batches(nn, batch_format="pyarrow")
                        .sum("c") or 0)

            def put(t: pa.Table, _a=alias, _v=total) -> pa.Table:
                return t.append_column(
                    _a, pa.array([_v] * t.num_rows, pa.int64()))

            ds = ds.map_batches(put, batch_format="pyarrow")
    return ds


def _ord_f64(col) -> "np.ndarray":
    """float64 view of an ORDER BY column (timestamps -> epoch us)."""
    import numpy as np

    from solr_ray.ops.windows import _ts_int_us

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        return _ts_int_us(col).to_numpy(
            zero_copy_only=False).astype(np.float64)
    return col.to_numpy(zero_copy_only=False).astype(np.float64)


def _col_range(ds, col: str) -> tuple[float, float]:
    """Distributed min/max of one column (partial per block, driver fold)."""
    import numpy as np

    def mm(t: pa.Table) -> pa.Table:
        v = _ord_f64(t[col])
        v = v[~np.isnan(v)]
        return pa.table({"lo": pa.array([v.min() if v.size else np.inf]),
                         "hi": pa.array([v.max() if v.size else -np.inf])})

    p = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    return float(p["lo"].min()), float(p["hi"].max())


_WIN_SLICES = 4096  # order-axis slices for composite-key window shuffles
# below this, whole-partition buckets win: ONE shuffle serves every window
# item, vs the sliced path's per-item shuffle + fix-up fixed costs (which
# only pay off once a single partition outgrows a worker)
_SLICED_MIN_ROWS = 2_000_000


def _attach_window_columns(ds, win_items: list[dict]):
    """Window functions OVER (PARTITION BY p ORDER BY s [ROWS frame]).

    Scale shape (same composite-key design as ops/windows.py — a fixed
    bucket count alone caps nothing, since one hot PARTITION BY key lands
    in a single group):

    - Frame aggregates (SUM/AVG/MIN/MAX/COUNT ... ROWS BETWEEN f PRECEDING
      AND CURRENT ROW) with an ascending numeric/timestamp first ORDER BY
      column DELEGATE to ops.windows.sliding_window — composite
      (partition-hash bucket, order slice) shuffle + exact head/tail
      fix-up; remaining ORDER BY columns ride as tie keys.
    - Rank functions (ROW_NUMBER/RANK/DENSE_RANK) under the same
      sliceability condition shuffle by (partition bucket, order slice)
      and add per-(partition, slice) OFFSETS afterwards: equal order
      values always land in the same slice (slice = floor(v/width)), so a
      peer group never straddles slices and
        ROW_NUMBER/RANK = in-slice value + rows in earlier slices,
        DENSE_RANK     = in-slice value + distinct tuples in earlier
                         slices.
      The offset table is one row per (partition, slice) — O(keys x
      slices), independent of log size — merged under the repo-standard
      5M driver gate with a distributed per-partition fallback.
    - Anything else (DESC order, non-numeric order column, UNBOUNDED
      frames) falls back to whole-partition buckets, with the bucket
      count scaled to the input (~500k rows per group) instead of a
      fixed 64.

    ROW_NUMBER over duplicate order keys is nondeterministic in ANSI too;
    use a unique tie-break key."""
    import numpy as np
    import pandas as pd

    # one shuffle can serve every item sharing the same PARTITION BY
    part_key = tuple(win_items[0]["partition"])
    if any(tuple(it["partition"]) != part_key for it in win_items[1:]):
        raise ValueError("window functions in one SELECT must share the "
                         "same PARTITION BY")
    if not part_key:
        raise ValueError("window functions need PARTITION BY (a global "
                         "window is a driver bottleneck by construction)")

    order0 = win_items[0]["order"]
    if any(it["order"] != order0 for it in win_items[1:]):
        # mixed ORDER BYs: run each item through its own pass
        out = ds
        for it in win_items:
            out = _attach_window_columns(out, [it])
        return out

    ocols = [c for c, _ in order0]
    asc = [not d for _, d in order0]
    ds = ds.materialize()  # two+ consumers: count/range probe + shuffle
    sliceable = (bool(ocols) and all(asc)
                 and ds.count() >= _SLICED_MIN_ROWS)
    if sliceable:
        s0 = ds.schema()  # ray Schema wrapper: parallel names/types lists
        f0 = (s0.types[s0.names.index(ocols[0])]
              if ocols[0] in s0.names else None)
        sliceable = isinstance(f0, pa.DataType) and (
            pa.types.is_integer(f0) or pa.types.is_floating(f0)
            or pa.types.is_timestamp(f0))

    frame_items = [it for it in win_items if it["fn"] in _AGGS]
    nav_items = [it for it in win_items if it["fn"] in _NAV_FNS]
    rank_items = [it for it in win_items
                  if it["fn"] not in _AGGS and it["fn"] not in _NAV_FNS]

    if sliceable and all(isinstance(it["frame"], int)
                         for it in frame_items):
        lo, hi = _col_range(ds, ocols[0])
        if not (np.isfinite(lo) and np.isfinite(hi)):
            return _windows_bucketed(ds, win_items, part_key)  # empty/NaN
        out = ds
        if frame_items:
            out = _frame_aggs_sliced(out, frame_items, part_key, ocols,
                                     lo, hi)
        if rank_items:
            out = _ranks_sliced(out, rank_items, part_key, ocols, lo, hi)
        if nav_items:
            out = _nav_sliced(out, nav_items, part_key, ocols, lo, hi)
        return out
    return _windows_bucketed(ds, win_items, part_key)


def _slice_width_us(lo: float, hi: float) -> int:
    return max(1, int(np.ceil((hi - lo + 1) / _WIN_SLICES)))


def _frame_aggs_sliced(ds, items, part_key, ocols, lo, hi):
    """ROWS-frame aggregates via ops.windows.sliding_window (composite-key
    shuffle + head/tail fix-up), one pass per item."""
    import numpy as np

    from solr_ray.ops.windows import sliding_window

    width = _slice_width_us(lo, hi)
    out = ds
    for it in items:
        agg_name = {"SUM": "sum", "AVG": "mean", "MIN": "min",
                    "MAX": "max", "COUNT": "count"}[it["fn"]]
        rolled = sliding_window(
            out, key_col=list(part_key), ts_col=ocols[0],
            value_col=it["col"], n=int(it["frame"]) + 1, agg=agg_name,
            tie_col=ocols[1:] or None, slice_us=width)

        def finish(t: pa.Table, _it=it) -> pa.Table:
            v = t[f"rolling_{_it['col']}"]
            v = pc.cast(v, pa.int64() if _it["fn"] == "COUNT"
                        else pa.float64())
            names = [n for n in t.schema.names
                     if n != f"rolling_{_it['col']}"]
            cols = {n: t[n] for n in names}
            cols[_it["alias"]] = v
            return pa.table(cols)

        out = rolled.map_batches(finish, batch_format="pyarrow")
    return out


def _ranks_sliced(ds, items, part_key, ocols, lo, hi):
    """ROW_NUMBER/RANK/DENSE_RANK via (partition bucket, order slice)
    shuffle + per-(partition, slice) offsets. Equal order values share a
    slice by construction, so peer groups never straddle slices."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data
    from ray.data.aggregate import Count, Max as AMax

    from solr_ray.ops.windows import _hash_bucket

    width = float(_slice_width_us(lo, hi))
    num_buckets = 64
    need_dense = any(it["fn"] == "DENSE_RANK" for it in items)
    pk = list(part_key)

    def bucketize(t: pa.Table) -> pa.Table:
        t = _hash_bucket(t, pk, num_buckets, out_col="__wb")
        v = _ord_f64(t[ocols[0]])
        return t.append_column(
            "__ws", pa.array(np.floor((v - lo) / width).astype(np.int64)))

    def per_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([*pk, *ocols], kind="stable")
             .drop(columns=["__wb"]).copy())
        grp = g.groupby(pk, sort=False)
        rn = (grp.cumcount() + 1).to_numpy()
        first = rn == 1
        same_ord = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            eq = np.ones(len(g) - 1, dtype=bool)
            for c in ocols:
                v = g[c].to_numpy()
                eq &= v[1:] == v[:-1]
            same_ord[1:] = eq
        is_new = first | ~same_ord
        cum = np.cumsum(is_new)
        base = pd.Series(np.where(first, cum - 1, np.nan)
                         ).ffill().to_numpy()
        dense = (cum - base).astype(np.int64)
        for it in items:
            if it["fn"] == "ROW_NUMBER":
                g[it["alias"]] = rn
            elif it["fn"] == "RANK":
                g[it["alias"]] = pd.Series(
                    np.where(is_new, rn, np.nan)
                ).ffill().to_numpy().astype(np.int64)
            else:
                g[it["alias"]] = dense
        if need_dense:
            g["__dense"] = dense
        return g

    per = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby(["__wb", "__ws"])
           .map_groups(per_slice, batch_format="pandas")
           .materialize())  # two consumers: rows + offset summary

    aggs = [Count(alias_name="__n")]
    if need_dense:
        aggs.append(AMax("__dense", alias_name="__d"))
    summ_ds = per.groupby([*pk, "__ws"]).aggregate(*aggs).materialize()

    off_cols = [*pk, "__ws", "__roff"] + (["__doff"] if need_dense else [])

    def prefix(summ: pd.DataFrame) -> pd.DataFrame:
        # exclusive prefix sums per partition over ascending slices
        summ = summ.sort_values([*pk, "__ws"], kind="stable").copy()
        grp = summ.groupby(pk, sort=False)
        summ["__roff"] = grp["__n"].cumsum() - summ["__n"]
        if need_dense:
            summ["__doff"] = grp["__d"].cumsum() - summ["__d"]
        return summ[off_cols]

    keep = [n for n in per.schema().names
            if n not in ("__ws", "__dense")]

    def _apply(d: pd.DataFrame, offs: pd.DataFrame) -> pd.DataFrame:
        idx = pd.MultiIndex.from_frame(d[[*pk, "__ws"]])
        offs = offs.set_index([*pk, "__ws"])
        roff = offs["__roff"].reindex(idx).to_numpy()
        doff = offs["__doff"].reindex(idx).to_numpy() if need_dense else None
        for it in items:
            add = doff if it["fn"] == "DENSE_RANK" else roff
            d[it["alias"]] = (d[it["alias"]].to_numpy() + add
                              ).astype(np.int64)
        return d[keep]

    # offset table is one row per (partition, slice) — tiny relative to
    # the data; repo-standard 5M driver gate with a distributed fallback
    if summ_ds.count() <= 5_000_000:
        offs_pd = prefix(summ_ds.to_pandas())
        ref = ray.put(pa.Table.from_pandas(offs_pd, preserve_index=False))

        def apply_offsets(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(
                _apply(t.to_pandas(), ray.get(ref).to_pandas()),
                preserve_index=False)

        return per.map_batches(apply_offsets, batch_format="pyarrow")

    # distributed fallback: per-partition prefix sums (each group =
    # one partition's <= _WIN_SLICES summary rows), then a hash join
    from solr_ray.ops.windows import _hash_bucket

    offs_ds = (summ_ds.map_batches(
        lambda t: _hash_bucket(t, pk, 256, out_col="__ob"),
        batch_format="pyarrow")
        .groupby("__ob")
        .map_groups(lambda g: prefix(g.drop(columns=["__ob"])),
                    batch_format="pandas")).materialize()
    joined = per.join(offs_ds, "inner", num_partitions=_join_parts(),
                      on=(*pk, "__ws"))

    def apply_joined(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        for it in items:
            add = d["__doff"] if it["fn"] == "DENSE_RANK" else d["__roff"]
            d[it["alias"]] = (d[it["alias"]].to_numpy()
                              + add.to_numpy()).astype(np.int64)
        return pa.Table.from_pandas(d[keep], preserve_index=False)

    return joined.map_batches(apply_joined, batch_format="pyarrow")


def _join_parts() -> int:
    """Hash-join partition count: Ray spawns one aggregator actor per
    partition, so a count above the CPU budget can't schedule and the
    join hangs. Scale with the cluster, floor 4, cap 64."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(64, cpus))


def _nav_sliced(ds, items, part_key, ocols, lo, hi):
    """LAG/LEAD/NTILE/FIRST_VALUE/LAST_VALUE at scale: ONE scale-safe
    ROW_NUMBER pass (the sliced (partition bucket, order slice) rank
    machinery), then each item is a hash join keyed on
    (partition, rn +- k) or a per-partition/per-peer summary join — a
    whole partition never lands in one task. Materialize barriers
    between the chained joins (aggregator-pool deadlock otherwise).
    Bit-identical to the bucketed path (hypothesis battery)."""
    from ray.data.aggregate import Count, Max as AMax

    pk = list(part_key)
    rn_it = {"fn": "ROW_NUMBER", "alias": "__nrn",
             "partition": pk, "order": [(c, False) for c in ocols]}
    nparts = _join_parts()
    # the rank pass round-trips blocks through pandas: a slice whose
    # passenger column (e.g. an earlier nav alias) is ALL null comes
    # back null-typed, which Acero rejects as a join non-key field —
    # cast such blocks back to the input schema's type
    s_in = ds.schema()
    in_types = dict(zip(s_in.names, s_in.types))

    def _norm(t: pa.Table) -> pa.Table:
        cols, changed = {}, False
        for n in t.schema.names:
            v = t[n]
            ty = in_types.get(n)
            if ty is not None and pa.types.is_null(v.type) \
                    and not pa.types.is_null(ty):
                v, changed = pc.cast(v, ty), True
            cols[n] = v
        return pa.table(cols) if changed else t

    # every join input is repartitioned first: map/groupby outputs can
    # carry empty zero-schema blocks that break Acero's key resolution
    # ("No match or multiple matches for key field"), the same gotcha as
    # graph/dedup joins
    out = (_ranks_sliced(ds, [rn_it], part_key, ocols, lo, hi)
           .map_batches(_norm, batch_format="pyarrow")
           .repartition(nparts).materialize())
    jks = [f"__jk{j}" for j in range(len(pk))]

    def _vtype(d, col):
        s = d.schema()
        return s.types[s.names.index(col)]

    for i, it in enumerate(items):
        al, tmp = it["alias"], f"__nv{i}"
        if it["fn"] in ("LAG", "LEAD"):
            delta = it["offset"] if it["fn"] == "LAG" else -it["offset"]
            vty = _vtype(out, it["col"])

            def mk_side(t: pa.Table, _d=delta, _c=it["col"],
                        _t=tmp) -> pa.Table:
                cols = {k2: t[k] for k2, k in zip(jks, pk)}
                cols["__jrn"] = pc.add(t["__nrn"],
                                       pa.scalar(_d, pa.int64()))
                cols[_t] = t[_c]
                return pa.table(cols)

            side = out.map_batches(
                mk_side, batch_format="pyarrow").repartition(
                nparts).materialize()
            out = out.join(side, "left_outer", num_partitions=nparts,
                           on=(*pk, "__nrn"),
                           right_on=(*jks, "__jrn")).materialize()

            def fin(t: pa.Table, _t=tmp, _al=al, _ty=vty,
                    _dv=it.get("default")) -> pa.Table:
                v = t[_t]
                if pa.types.is_null(v.type):  # no row matched anywhere
                    v = pc.cast(v, _ty)
                if _dv is not None:
                    v = pc.fill_null(v, _dv)
                t = t.drop_columns([c for c in (_t, *jks, "__jrn")
                                    if c in t.schema.names])
                return t.append_column(_al, v)

            out = (out.map_batches(fin, batch_format="pyarrow")
                   .repartition(nparts).materialize())
        elif it["fn"] == "NTILE":
            cnt = (out.groupby(pk).aggregate(Count(alias_name="__cnt"))
                   .repartition(8).materialize())
            out = out.join(cnt, "inner", num_partitions=nparts,
                           on=tuple(pk)).materialize()

            def tile(t: pa.Table, _n=it["n"], _al=al) -> pa.Table:
                rn0 = np.asarray(t["__nrn"]) - 1
                c = np.asarray(t["__cnt"])
                q, r = c // _n, c % _n
                big = r * (q + 1)
                vals = (np.where(rn0 < big, rn0 // np.maximum(q + 1, 1),
                                 r + (rn0 - big) // np.maximum(q, 1))
                        + 1).astype(np.int64)
                return t.drop_columns(["__cnt"]).append_column(
                    _al, pa.array(vals))

            out = (out.map_batches(tile, batch_format="pyarrow")
                   .repartition(nparts).materialize())
        elif it["fn"] == "FIRST_VALUE":
            vty = _vtype(out, it["col"])

            def firsts(t: pa.Table, _c=it["col"], _t=tmp) -> pa.Table:
                t = t.filter(pc.equal(t["__nrn"],
                                      pa.scalar(1, pa.int64())))
                cols = {k2: t[k] for k2, k in zip(jks, pk)}
                cols[_t] = t[_c]
                return pa.table(cols)

            side = out.map_batches(
                firsts, batch_format="pyarrow").repartition(
                nparts).materialize()
            out = out.join(side, "left_outer", num_partitions=nparts,
                           on=tuple(pk), right_on=tuple(jks)).materialize()

            def fin1(t: pa.Table, _t=tmp, _al=al, _ty=vty) -> pa.Table:
                v = t[_t]
                if pa.types.is_null(v.type):
                    v = pc.cast(v, _ty)
                t = t.drop_columns([c for c in (_t, *jks)
                                    if c in t.schema.names])
                return t.append_column(_al, v)

            out = (out.map_batches(fin1, batch_format="pyarrow")
                   .repartition(nparts).materialize())
        else:  # LAST_VALUE: last row of the current peer group
            oks = [f"__ok{j}" for j in range(len(ocols))]
            vty = _vtype(out, it["col"])
            peers = (out.groupby([*pk, *ocols])
                     .aggregate(AMax("__nrn", alias_name="__prn"))
                     .repartition(nparts).materialize())
            vks = [f"__vk{j}" for j in range(len(pk))]

            def vals_side(t: pa.Table, _c=it["col"], _t=tmp) -> pa.Table:
                cols = {k2: t[k] for k2, k in zip(vks, pk)}
                cols["__vrn"] = t["__nrn"]
                cols[_t] = t[_c]
                return pa.table(cols)

            vside = out.map_batches(
                vals_side, batch_format="pyarrow").repartition(
                nparts).materialize()
            fetched = peers.join(vside, "inner", num_partitions=nparts,
                                 on=(*pk, "__prn"),
                                 right_on=(*vks, "__vrn")).materialize()

            # groupby/map_groups round-trips can drift timestamp units
            # (s vs us) — cast the projected keys back to the left
            # schema's exact types or Acero rejects the join
            s0 = out.schema()
            otypes = tuple(s0.types[s0.names.index(c)] for c in ocols)

            def proj_f(t: pa.Table, _t=tmp, _ty=otypes) -> pa.Table:
                cols = {k2: t[k] for k2, k in zip(jks, pk)}
                cols.update({k2: pc.cast(t[k], ty)
                             for k2, k, ty in zip(oks, ocols, _ty)})
                cols[_t] = t[_t]
                return pa.table(cols)

            fetched = fetched.map_batches(
                proj_f, batch_format="pyarrow").repartition(
                nparts).materialize()
            out = out.join(fetched, "left_outer", num_partitions=nparts,
                           on=(*pk, *ocols),
                           right_on=(*jks, *oks)).materialize()

            def fin2(t: pa.Table, _t=tmp, _al=al, _ty=vty) -> pa.Table:
                v = t[_t]
                if pa.types.is_null(v.type):
                    v = pc.cast(v, _ty)
                t = t.drop_columns([c for c in (_t, *jks, *oks)
                                    if c in t.schema.names])
                return t.append_column(_al, v)

            out = (out.map_batches(fin2, batch_format="pyarrow")
                   .repartition(nparts).materialize())

    def drop_rn(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in ("__nrn",)
                               if c in t.schema.names])

    return out.map_batches(drop_rn, batch_format="pyarrow")


def _windows_bucketed(ds, win_items, part_key):
    """Fallback: whole-partition hash buckets, bucket count scaled to the
    input (~500k rows per group) rather than a fixed 64."""
    import numpy as np
    import pandas as pd

    num_buckets = max(64, int(np.ceil(ds.count() / 500_000)))

    def bucketize(t: pa.Table) -> pa.Table:
        key = pd.util.hash_pandas_object(
            t.select(list(part_key)).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__wb", pa.array((key % num_buckets).astype(np.int64)))

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__wb"])
        out = g
        for it in win_items:
            ocols = [c for c, _ in it["order"]]
            asc = [not d for _, d in it["order"]]
            s = out.sort_values([*part_key, *ocols],
                                ascending=[True] * len(part_key) + asc,
                                kind="stable")
            grp = s.groupby(list(part_key), sort=False)
            if it["fn"] in _AGGS:
                f = it["frame"]
                agg_name = {"SUM": "sum", "AVG": "mean", "MIN": "min",
                            "MAX": "max", "COUNT": "count"}[it["fn"]]
                if isinstance(f, tuple):  # ("range", n): value-based frame
                    # [cur - n, cur] on the ORDER BY value, peers on both
                    # ends included (position-independent) — per-partition
                    # prefix sums + two searchsorted bounds
                    nrange = f[1]
                    ov = s[ocols[0]].to_numpy().astype(np.float64)
                    vv = s[it["col"]].to_numpy().astype(np.float64)
                    codes = grp.ngroup().to_numpy()
                    starts = np.flatnonzero(np.diff(codes, prepend=-1))
                    ends = np.append(starts[1:], len(s))
                    cumv = np.cumsum(vv)
                    out_v = np.empty(len(s))
                    for a, b in zip(starts, ends):
                        seg_ov = ov[a:b]
                        lo = np.searchsorted(seg_ov, seg_ov - nrange,
                                             side="left") + a
                        hi = np.searchsorted(seg_ov, seg_ov,
                                             side="right") + a
                        sums = cumv[hi - 1] - np.where(
                            lo > a, cumv[np.maximum(lo - 1, 0)],
                            cumv[a] - vv[a])
                        if it["fn"] == "SUM":
                            out_v[a:b] = sums
                        elif it["fn"] == "COUNT":
                            out_v[a:b] = hi - lo
                        else:  # AVG
                            out_v[a:b] = sums / (hi - lo)
                    vals = out_v
                elif f == "whole_partition":
                    # OVER (PARTITION BY p) with no ORDER BY: the whole
                    # partition is the frame
                    vals = grp[it["col"]].transform(agg_name)
                elif f == "range_unbounded":
                    # ANSI default frame: cumulative INCLUDING the
                    # current row's peers -> cumulative agg, then take
                    # each peer group's last value
                    c = grp[it["col"]]
                    if it["fn"] == "SUM":
                        cum = c.cumsum()
                    elif it["fn"] == "MIN":
                        cum = c.cummin()
                    elif it["fn"] == "MAX":
                        cum = c.cummax()
                    elif it["fn"] == "COUNT":
                        cum = c.cumcount() + 1
                    else:  # AVG
                        cum = c.cumsum() / (c.cumcount() + 1)
                    peers = s.groupby([*part_key, *ocols], sort=False)
                    s["__cum"] = cum
                    vals = peers["__cum"].transform("last")
                    s = s.drop(columns=["__cum"])
                else:
                    win = len(s) if f == "unbounded" else int(f) + 1
                    r = grp[it["col"]].rolling(max(win, 1), min_periods=1)
                    vals = getattr(r, agg_name)().reset_index(
                        level=list(range(len(part_key))), drop=True)
                vals = (pd.Series(vals).astype(np.int64)
                        if it["fn"] == "COUNT"
                        else pd.Series(vals).astype(np.float64)).to_numpy()
                s[it["alias"]] = vals
                out = s
                continue
            if it["fn"] in _NAV_FNS:
                if it["fn"] in ("LAG", "LEAD"):
                    k = it["offset"] if it["fn"] == "LAG" \
                        else -it["offset"]
                    vals = grp[it["col"]].shift(k)
                    if it.get("default") is not None:
                        vals = vals.fillna(it["default"])
                    if pd.api.types.is_integer_dtype(s[it["col"]]):
                        vals = vals.astype("Int64")  # null-safe int lag
                elif it["fn"] == "FIRST_VALUE":
                    vals = grp[it["col"]].transform("first")
                elif it["fn"] == "LAST_VALUE":
                    # ANSI default frame ends at the current row's PEERS
                    vals = s.groupby([*part_key, *ocols], sort=False)[
                        it["col"]].transform("last")
                else:  # NTILE: exact ANSI tile sizes (first r get q+1)
                    rn0 = grp.cumcount().to_numpy()
                    cnt = grp[it["order"][0][0]].transform(
                        "size").to_numpy()
                    n = it["n"]
                    q, r = cnt // n, cnt % n
                    big = r * (q + 1)
                    vals = (np.where(
                        rn0 < big, rn0 // np.maximum(q + 1, 1),
                        r + (rn0 - big) // np.maximum(q, 1)) + 1
                    ).astype(np.int64)
                s[it["alias"]] = vals
                out = s
                continue
            rn = (grp.cumcount() + 1).to_numpy()
            if it["fn"] == "ROW_NUMBER":
                vals = rn
            else:
                first = rn == 1
                same_ord = np.ones(len(s), dtype=bool)
                if len(s) > 1:
                    eq = np.ones(len(s) - 1, dtype=bool)
                    for c in ocols:
                        v = s[c].to_numpy()
                        eq &= v[1:] == v[:-1]
                    same_ord[1:] = eq
                is_new = first | ~same_ord
                if it["fn"] == "RANK":
                    vals = pd.Series(np.where(is_new, rn, np.nan)
                                     ).ffill().to_numpy().astype(np.int64)
                else:  # DENSE_RANK
                    cum = np.cumsum(is_new)
                    start = np.where(first, cum - 1, np.nan)
                    base = pd.Series(start).ffill().to_numpy()
                    vals = (cum - base).astype(np.int64)
            s[it["alias"]] = vals
            out = s
        return out

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__wb").map_groups(windows, batch_format="pandas"))


_SUBQUERY_MAX_KEYS = 2_000_000


def _resolve_in_subqueries(cond, tables, negated: bool = False):
    """col IN (SELECT ...) -> a terms (is_in) spec over the subquery's
    DISTINCT values: the subquery runs as its own distributed plan, its
    single output column is deduped by a grouped count (combiner shuffle,
    so only distinct keys ever leave the cluster), and the key set
    broadcasts into every filter task — the semi-join shape of
    ops/joins.py:58. Gated at _SUBQUERY_MAX_KEYS distinct keys (a clear
    error beats a silent driver OOM; a distributed semi-join via
    Dataset.join is the escape hatch for bigger key sets).

    NULL semantics: NULL keys are dropped — identical to ANSI for IN
    under WHERE (NULL never matches), but `NOT IN` over a null-producing
    subquery is ANSI-empty, so that case raises instead of silently
    diverging. No correlated subqueries (the inner plan sees only the
    base tables)."""
    if not isinstance(cond, dict):
        return cond
    if cond.get("op") == "in_subquery":
        sub = _execute_plan(cond["plan"], tables)
        sch = sub.schema(fetch_if_missing=True)
        if sch is None:  # empty result loses its schema in Ray
            return {"op": "terms", "field": cond["field"], "values": []}
        cols = sch.names
        if len(cols) != 1:
            raise ValueError("IN (SELECT ...) needs exactly one output "
                             f"column, got {cols}")
        key = cols[0]
        dd = _project(sub, [key], {}).groupby(key).count()
        vals, saw_null, total = [], False, 0
        for b in dd.iter_batches(batch_size=None, batch_format="pyarrow"):
            col = b[key]
            saw_null = saw_null or col.null_count > 0
            col = col.drop_null()
            total += len(col)
            if total > _SUBQUERY_MAX_KEYS:
                raise ValueError(
                    f"IN-subquery key set exceeds {_SUBQUERY_MAX_KEYS} "
                    "distinct values; rewrite as an explicit JOIN")
            vals.extend(col.to_pylist())
        if saw_null and negated:
            raise ValueError(
                "NOT IN over a subquery producing NULLs is ANSI-empty; "
                "filter the NULLs in the subquery")
        return {"op": "terms", "field": cond["field"], "values": vals}
    if cond.get("op") == "exists_subquery":
        return _resolve_exists(cond, tables, negated)
    if cond.get("op") == "cmp_scalar_subquery":
        return _resolve_scalar_subquery(cond, tables)
    if cond.get("op") == "cmp_expr_subquery":
        # expression/aggregate LHS vs an UNCORRELATED scalar subquery:
        # fold the subquery to a literal, keep the cmp_expr machinery
        if _split_correlation(cond["plan"])[0]:
            raise ValueError("correlated subqueries are not supported on "
                             "an expression/aggregate comparison side")
        sub = _execute_plan(cond["plan"], tables)
        cols = sub.schema().names if sub.schema() is not None else []
        if len(cols) != 1:
            raise ValueError("scalar subquery needs exactly one output "
                             f"column, got {cols}")
        rows = sub.limit(2).take_all()
        if len(rows) > 1:
            raise ValueError("scalar subquery returned more than one row")
        if not rows or rows[0][cols[0]] is None:
            return {"op": "const", "value": False}
        val = rows[0][cols[0]]
        if hasattr(val, "item"):
            val = val.item()
        return {"op": "cmp_expr", "node": cond["node"],
                "cmp": cond["cmp"], "value": val}
    out = dict(cond)
    if "clauses" in out:
        flip = negated != (out.get("op") == "not")
        out["clauses"] = [_resolve_in_subqueries(c, tables, flip)
                          for c in out["clauses"]]
    return out


def _inner_names(plan: dict) -> set:
    # derived tables have a dict "table" — only their alias names them
    names = set()
    if isinstance(plan.get("table"), str):
        names.add(plan["table"])
    if plan.get("alias"):
        names.add(plan["alias"])
    for j in plan.get("joins", ()):
        if isinstance(j["table"], str):
            names.add(j["table"])
        if j.get("alias"):
            names.add(j["alias"])
    for t in plan.get("implicit", ()):
        if isinstance(t["table"], str):
            names.add(t["table"])
        if t.get("alias"):
            names.add(t["alias"])
    return names


def _split_correlation(plan: dict):
    """Split a subquery plan's WHERE into correlation equalities
    ((outer_ref, inner_ref) pairs — qualified col = col conjuncts whose
    one side references a table OUTSIDE the subquery's FROM) and the
    residual inner-only conjuncts. Raises on outer references anywhere
    else (general correlation is out of scope)."""
    inner = _inner_names(plan)
    corr: list[tuple[str, str]] = []
    rest: list = []

    def walk(c):
        if not isinstance(c, dict):
            return
        if c.get("op") == "col_eq":
            sides = [c["left"], c["right"]]
            quals = [s.split(".", 1)[0] if "." in s else None for s in sides]
            outer_ix = [i for i, q in enumerate(quals)
                        if q is not None and q not in inner]
            if len(outer_ix) == 1:
                o = sides[outer_ix[0]]
                corr.append((o, sides[1 - outer_ix[0]]))
                return
            raise ValueError(
                "column = column inside a subquery must correlate exactly "
                f"one outer reference (qualified), got {c['left']} = "
                f"{c['right']}")
        if c.get("op") == "and":
            for s in c["clauses"]:
                walk(s)
            return
        # residual predicates stay in the subquery; they must not
        # reference the outer query
        for name in _names_in(c):
            q = name.split(".", 1)[0] if "." in name else None
            if q is not None and q not in inner:
                raise ValueError(
                    f"subquery references outer column {name!r} outside "
                    "a top-level equality correlation")
        rest.append(c)

    if plan.get("where") is not None:
        walk(plan["where"])
    return corr, rest


def _resolve_correlated_scalar(cond, plan, corr, rest, tables):
    """col <cmp> (SELECT AGG(x) ... WHERE inner.k = outer.k) -> cmp_lookup
    over a broadcast per-key aggregate table."""
    import ray

    if len(corr) > 1:
        raise ValueError("correlated scalar subqueries support exactly "
                         "one correlation equality")
    if plan.get("group") or plan.get("limit") is not None:
        raise ValueError("correlated scalar subqueries cannot have their "
                         "own GROUP BY or LIMIT")
    items = plan["items"]
    if len(items) != 1 or items[0].get("kind") != "agg":
        raise ValueError("a correlated scalar subquery must SELECT "
                         "exactly one aggregate")
    outer_ref, inner_ref = corr[0]
    outer_field = outer_ref.split(".", 1)[1] if "." in outer_ref \
        else outer_ref
    sub_plan = dict(plan)
    it = dict(items[0])
    it.setdefault("alias", "__v")
    sub_plan["items"] = [{"kind": "col", "col": inner_ref}, it]
    sub_plan["group"] = [inner_ref]
    sub_plan["where"] = (None if not rest
                         else rest[0] if len(rest) == 1
                         else {"op": "and", "clauses": rest})
    sub_plan["order"], sub_plan["limit"] = [], None
    agg = _execute_plan(sub_plan, tables)
    sch = agg.schema(fetch_if_missing=True)
    if sch is None:  # empty aggregate: every comparison is ANSI NULL
        return {"op": "const", "value": False}
    cols = sch.names
    key_col, val_col = cols[0], cols[1]
    keys_parts, vals_parts, total = [], [], 0
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += b.num_rows
        if total > _SUBQUERY_MAX_KEYS:
            raise ValueError(
                f"correlated-subquery key set exceeds {_SUBQUERY_MAX_KEYS}"
                " groups; rewrite as an explicit JOIN")
        keys_parts.append(b[key_col])
        vals_parts.append(b[val_col])
    if keys_parts:
        keys = pa.concat_arrays([c.combine_chunks() if isinstance(
            c, pa.ChunkedArray) else c for c in keys_parts])
        vals = pa.concat_arrays([c.combine_chunks() if isinstance(
            c, pa.ChunkedArray) else c for c in vals_parts])
    else:
        keys, vals = pa.array([], pa.int64()), pa.array([], pa.float64())
    ref = ray.put((keys, vals))
    return {"op": "cmp_lookup", "field": cond["field"],
            "key_field": outer_field, "cmp": cond["cmp"], "ref": ref}


def _resolve_exists(cond, tables, negated: bool):
    """[NOT] EXISTS (SELECT ... [WHERE inner.k = outer.k AND ...]).

    Correlated (exactly one qualified equality whose one side references a
    table OUTSIDE the subquery's FROM): ANSI-equivalent to
    `outer.k IN (SELECT inner.k FROM ... WHERE rest)`, so it rewrites to
    the in_subquery plan and reuses its distributed-distinct + broadcast
    semi-join machinery. Uncorrelated: the subquery's row existence is one
    limit(1) probe, folded to a constant predicate."""
    plan = cond["plan"]
    corr, rest = _split_correlation(plan)

    if not corr:
        # uncorrelated: row existence is one limit(1) probe; the
        # surrounding NOT (if any) inverts the const spec at compile time
        sub_plan = dict(plan)
        sub_plan["limit"] = 1
        n = _execute_plan(sub_plan, tables).count()
        return {"op": "const", "value": n > 0}
    if len(corr) > 1:
        raise ValueError("EXISTS supports exactly one correlation "
                         "equality; rewrite multi-key correlation as a "
                         "JOIN")
    outer_ref, inner_ref = corr[0]
    outer_field = outer_ref.split(".", 1)[1] if "." in outer_ref \
        else outer_ref
    sub_plan = dict(plan)
    sub_plan["items"] = [{"kind": "col", "col": inner_ref}]
    sub_plan["where"] = (None if not rest
                         else rest[0] if len(rest) == 1
                         else {"op": "and", "clauses": rest})
    sub_plan["order"], sub_plan["limit"] = [], None
    spec = {"op": "in_subquery", "field": outer_field, "plan": sub_plan}
    return _resolve_in_subqueries(spec, tables, negated)


def _resolve_scalar_subquery(cond, tables):
    """col <cmp> (SELECT one_value ...): the subquery must yield exactly
    one row and one column; its value folds into a plain term/range
    spec (0 rows = ANSI NULL comparison = matches nothing).

    CORRELATED form — col <cmp> (SELECT AGG(x) FROM t2 WHERE t2.k =
    outer.k [AND ...]): the subquery becomes one distributed GROUP BY
    over the correlation key, the (key -> value) result broadcasts via
    ray.put (gated at _SUBQUERY_MAX_KEYS), and the predicate compiles to
    a cmp_lookup spec (index_in + take per batch). Keys with no group =
    ANSI NULL comparison = filtered out."""
    plan = cond["plan"]
    corr, rest = _split_correlation(plan)
    if corr:
        return _resolve_correlated_scalar(cond, plan, corr, rest, tables)
    sub = _execute_plan(cond["plan"], tables)
    cols = sub.schema().names
    if len(cols) != 1:
        raise ValueError("scalar subquery needs exactly one output "
                         f"column, got {cols}")
    rows = sub.limit(2).take_all()
    if len(rows) > 1:
        raise ValueError("scalar subquery returned more than one row")
    if not rows or rows[0][cols[0]] is None:
        return {"op": "const", "value": False}
    val = rows[0][cols[0]]
    import datetime

    if hasattr(val, "item"):
        val = val.item()
    if isinstance(val, datetime.datetime):
        val = pa.scalar(val)
    f, v = cond["field"], cond["cmp"]
    if v == "=":
        return {"op": "term", "field": f, "value": val}
    if v in ("<>", "!="):
        return {"op": "not",
                "clauses": [{"op": "term", "field": f, "value": val}]}
    if v == "<":
        return {"op": "range", "field": f, "hi": val, "include_hi": False}
    if v == "<=":
        return {"op": "range", "field": f, "hi": val, "include_hi": True}
    if v == ">":
        return {"op": "range", "field": f, "lo": val, "include_lo": False}
    return {"op": "range", "field": f, "lo": val, "include_lo": True}


def execute_sql(sql: str, tables: dict) -> "ray.data.Dataset":
    """Run the SQL subset against a dict of table-name -> Dataset."""
    return _execute_plan(parse_sql(sql), tables)


def _names_in(node) -> list:
    """Column names referenced by an expression tree / cond spec."""
    out = []
    if isinstance(node, dict):
        if node.get("kind") == "col":
            out.append(node["col"])
        if "field" in node:
            out.append(node["field"])
        if node.get("op") == "col_eq":
            out.extend([node["left"], node["right"]])
        if node.get("op") == "cmp_lookup":
            out.append(node["key_field"])
        for k in ("l", "r", "inner", "node"):
            if k in node:
                out.extend(_names_in(node[k]))
        if isinstance(node.get("arg"), dict):
            out.extend(_names_in(node["arg"]))
        for a in node.get("args", ()):
            out.extend(_names_in(a))
        for c in node.get("clauses", ()):
            out.extend(_names_in(c))
        for c, e in node.get("branches", ()):
            out.extend(_names_in(c))
            out.extend(_names_in(e))
        if node.get("else") is not None:
            out.extend(_names_in(node["else"]))
    return out


def _has_qualified_refs(plan: dict) -> bool:
    names = []
    for g in plan.get("group") or []:
        if isinstance(g, str):
            names.append(g)
        else:
            names.extend(_names_in(g))
    for it in plan["items"]:
        if it["kind"] == "col":
            names.append(it["col"])
        elif it["kind"] == "agg":
            if it["col"] != "*":
                names.append(it["col"])
        elif it["kind"] == "expr":
            names.extend(_names_in(it["node"]))
        elif it["kind"] == "win":
            names.extend(it["partition"])
            names.extend(c for c, _ in it["order"])
            if "col" in it:
                names.append(it["col"])
    if plan["where"] is not None:
        names.extend(_names_in(plan["where"]))
    return any("." in n for n in names)


def _set_common_type(ts):
    t0 = ts[0]
    if all(t == t0 for t in ts):
        return t0
    if all(pa.types.is_integer(t) for t in ts):
        return pa.int64()
    if all(pa.types.is_integer(t) or pa.types.is_floating(t)
           for t in ts):
        return pa.float64()
    if all(pa.types.is_string(t) or pa.types.is_large_string(t)
           for t in ts):
        return pa.string()
    raise ValueError(f"set operation column types are incompatible: {ts}")


def _fill_scalar(ty):
    if pa.types.is_string(ty) or pa.types.is_large_string(ty):
        return pa.scalar("", ty)
    if pa.types.is_binary(ty) or pa.types.is_large_binary(ty):
        return pa.scalar(b"", ty)
    if pa.types.is_boolean(ty):
        return pa.scalar(False, ty)
    return pa.scalar(0, ty)  # numeric / timestamp / date


def _null_safe_sort(ds, order):
    """Ray's distributed sort boundary sampling crashes on null keys of
    object dtype (None < str comparisons) — data-dependent, like the
    groupby case. Sort by (is-null flag ASC, filled value) per key:
    identical order for non-null data, nulls LAST in both directions
    (DuckDB's default null ordering)."""
    s = ds.schema()
    if s is None or not s.names:
        return ds
    keys, descs, enc_keys = [], [], []
    for i, (c, d) in enumerate(order):
        ty = s.types[s.names.index(c)] if c in s.names else None
        try:
            fill = _fill_scalar(ty) if ty is not None else None
        except Exception:
            fill = None
        if fill is None:
            keys.append(c)
            descs.append(d)
            continue
        f, v = f"__sn{i}", f"__sv{i}"
        enc_keys.append((c, f, v, fill))
        keys.extend([f, v])
        descs.extend([False, d])
    if not enc_keys:
        return ds.sort(keys, descending=descs)

    def enc(t: pa.Table, _e=tuple(enc_keys)) -> pa.Table:
        for c, f, v, fill in _e:
            col = t[c]
            t = t.append_column(f, pc.is_null(col))
            t = t.append_column(v, pc.fill_null(col, fill))
        return t

    drop = [n for _, f, v, _fl in enc_keys for n in (f, v)]

    def strip(t: pa.Table, _d=tuple(drop)) -> pa.Table:
        return t.drop_columns([c for c in _d if c in t.schema.names])

    return (ds.map_batches(enc, batch_format="pyarrow")
            .sort(keys, descending=descs)
            .map_batches(strip, batch_format="pyarrow"))


def _null_safe_group(ds, names, agg_fn):
    """Ray's sort-based groupby partition search crashes on null keys
    (np.searchsorted over mixed None/float boundaries) — encode each key
    as (filled value, was-null flag), group on both, decode after.
    agg_fn(ds, keys) -> aggregated ds with the key columns intact."""
    s = ds.schema()
    if s is None or not s.names:
        return ds  # empty — nothing to group
    tys = [s.types[s.names.index(n)] for n in names]
    flags = [f"__nn{i}" for i in range(len(names))]

    def enc(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in t.schema.names}
        for n, f, ty in zip(names, flags, tys):
            v = t[n]
            cols[f] = pc.is_null(v)
            cols[n] = pc.fill_null(v, _fill_scalar(ty))
        return pa.table(cols)

    g = agg_fn(ds.map_batches(enc, batch_format="pyarrow"),
               [*names, *flags])

    def dec(t: pa.Table) -> pa.Table:
        cols = {}
        for n in t.schema.names:
            if n in flags:
                continue
            cols[n] = t[n]
        for n, f, ty in zip(names, flags, tys):
            cols[n] = pc.if_else(t[f], pa.scalar(None, ty), t[n])
        return pa.table(cols)

    return g.map_batches(dec, batch_format="pyarrow")


def _set_distinct(ds, names):
    # grouped count over distinct rows (combiner shuffle), count dropped
    g = _null_safe_group(ds, names, lambda d, ks: d.groupby(ks).count())
    return _project(g, names, {})


def _set_membership(a, b, names, want_right: bool):
    """INTERSECT / EXCEPT as ONE combiner groupby over a tagged union:
    each distinct row carries min/max side tags; INTERSECT keeps rows
    seen on both sides, EXCEPT keeps rows seen only on the left. No
    join, no broadcast — scale-safe for arbitrarily large operands."""
    from ray.data.aggregate import Max as AMax, Min as AMin

    def tag(side):
        def f(t: pa.Table, _s=side) -> pa.Table:
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, _s, np.int8)))
        return f

    u = (a.map_batches(tag(1), batch_format="pyarrow")
         .union(b.map_batches(tag(2), batch_format="pyarrow")))
    g = _null_safe_group(
        u, names,
        lambda d, ks: d.groupby(ks).aggregate(
            AMin("__side", alias_name="__mn"),
            AMax("__side", alias_name="__mx")))

    def keep(t: pa.Table, _w=want_right) -> pa.Table:
        on_left = pc.equal(t["__mn"], pa.scalar(1))
        on_right = pc.equal(t["__mx"], pa.scalar(2))
        m = pc.and_(on_left, on_right) if _w else \
            pc.and_(on_left, pc.invert(on_right))
        return t.filter(m).select(names)

    return g.map_batches(keep, batch_format="pyarrow")


def _execute_setops(plan: dict, tables: dict) -> "ray.data.Dataset":
    """UNION [ALL] / INTERSECT / EXCEPT over independently-executed
    operand plans. Output column names and common types come from the
    operands positionally (first operand's names, ANSI); INTERSECT binds
    tighter than UNION/EXCEPT, the rest folds left-to-right."""
    import ray.data

    dss = [_execute_plan(p, tables) for _, p in plan["set"]]
    # an empty operand loses its schema in Ray (schema() is None) —
    # substitute a typed empty table so the fold semantics stay exact
    schemas = [d.schema() for d in dss]
    live = [s for s in schemas if s is not None and s.names]
    if not live:
        return dss[0]  # every operand empty
    names0 = list(live[0].names)
    for s in live:
        if len(s.names) != len(names0):
            raise ValueError("set operation operands must have the same "
                             "column count")
    tgt = [_set_common_type([s.types[j] for s in live])
           for j in range(len(names0))]
    empty = pa.table({n: pa.array([], type=ty)
                      for n, ty in zip(names0, tgt)})
    for i, s in enumerate(schemas):
        if s is None or not s.names:
            dss[i] = ray.data.from_arrow(empty)
            schemas[i] = dss[i].schema()
    aligned = []
    for d, s in zip(dss, schemas):
        def align(t: pa.Table, _src=tuple(s.names), _ty=tuple(tgt),
                  _out=tuple(names0)) -> pa.Table:
            cols = {}
            for n_out, n_in, ty in zip(_out, _src, _ty):
                v = t[n_in]
                if v.type != ty:
                    v = pc.cast(v, ty)
                cols[n_out] = v
            return pa.table(cols)

        aligned.append(d.map_batches(align, batch_format="pyarrow"))
    # INTERSECT precedence pass, then left-to-right fold
    nodes, nops = [aligned[0]], []
    for (op, _), d in zip(plan["set"][1:], aligned[1:]):
        if op == "intersect":
            nodes[-1] = _set_membership(nodes[-1], d, names0,
                                        want_right=True)
        else:
            nops.append(op)
            nodes.append(d)
    out = nodes[0]
    for op, d in zip(nops, nodes[1:]):
        if op == "union_all":
            out = out.union(d)
        elif op == "union":
            out = _set_distinct(out.union(d), names0)
        else:  # except
            out = _set_membership(out, d, names0, want_right=False)
    if plan["order"]:
        out = _null_safe_sort(out, _resolve_ordinals(plan["order"],
                                                     names0))
    if plan["limit"] is not None:
        out = _apply_limit(out, plan["limit"], plan.get("offset", 0))
    return out


def _resolve_ordinals(order, names):
    """ORDER BY ordinals ('#n' markers) -> the n-th output column."""
    out = []
    for c, d in order:
        if isinstance(c, str) and c.startswith("#"):
            n = int(c[1:])
            if n > len(names):
                raise ValueError(f"ORDER BY {n} exceeds the select list")
            c = names[n - 1]
        out.append((c, d))
    return out


def _apply_limit(ds, limit: int, offset: int):
    """LIMIT [OFFSET]: the first offset+limit rows are small by
    construction, so the OFFSET head is sliced off on the driver."""
    if not offset:
        return ds.limit(limit)
    import ray
    import ray.data

    head = ds.limit(offset + limit)
    tbs = [t for t in ray.get(head.to_arrow_refs()) if t.num_rows]
    if not tbs:
        return head
    tb = pa.concat_tables(tbs, promote_options="permissive")
    return ray.data.from_arrow(tb.slice(offset))


def _flatten_ands(cond):
    if isinstance(cond, dict) and cond.get("op") == "and":
        out = []
        for c in cond["clauses"]:
            out.extend(_flatten_ands(c))
        return out
    return [cond] if cond is not None else []


def _rewrite_implicit_joins(plan: dict, tables: dict) -> dict:
    """FROM a, b[, ...] -> explicit INNER JOIN entries: the top-level
    AND'ed `x = y` column equalities in WHERE supply the join keys
    (greedy connectivity order, one equality consumed per table; extra
    equalities between already-joined tables stay as vectorized col_eq
    filters). Cartesian products (no connecting equality) are
    rejected with a clear error — at 100 TB they're never intended."""
    plan = dict(plan)

    def cols_of(tname):
        if isinstance(tname, dict):
            raise ValueError(
                "derived tables in a comma join need explicit JOIN ... ON")
        if tname not in tables:
            raise ValueError(f"unknown table {tname!r}")
        return set(tables[tname].schema().names)

    owner = {plan["alias"]: cols_of(plan["table"])}
    for j in plan["joins"]:
        owner[j["alias"]] = cols_of(j["table"])
    pending = {t["alias"]: t for t in plan["implicit"]}
    for a, t in pending.items():
        owner[a] = cols_of(t["table"])

    def alias_of(name: str) -> str:
        if "." in name:
            a = name.split(".", 1)[0]
            if a in owner:
                return a
            raise ValueError(f"unknown alias in {name!r}")
        hits = [a for a, cs in owner.items() if name in cs]
        if len(hits) != 1:
            raise ValueError(
                f"ambiguous or unknown column {name!r} in implicit join")
        return hits[0]

    conjuncts = _flatten_ands(plan["where"])
    eqs = []
    for i, c in enumerate(conjuncts):
        if isinstance(c, dict) and c.get("op") == "col_eq":
            eqs.append((i, c["left"], c["right"],
                        alias_of(c["left"]), alias_of(c["right"])))
    joined = {plan["alias"], *[j["alias"] for j in plan["joins"]]}
    new_joins = list(plan["joins"])
    used: set = set()
    while pending:
        progressed = False
        for i, left, right, la, ra in eqs:
            if i in used:
                continue
            if la in joined and ra in pending:
                t, a, lk, rk = pending.pop(ra), ra, left, right
            elif ra in joined and la in pending:
                t, a, lk, rk = pending.pop(la), la, right, left
            else:
                continue
            new_joins.append({"table": t["table"], "alias": a,
                              "how": "inner", "lk": lk, "rk": rk})
            used.add(i)
            joined.add(a)
            progressed = True
            break
        if not progressed:
            raise ValueError(
                "implicit comma join needs a connecting column equality "
                "in WHERE (cartesian products are not supported)")
    rest = [c for i, c in enumerate(conjuncts) if i not in used]
    plan["where"] = (None if not rest else rest[0] if len(rest) == 1
                     else {"op": "and", "clauses": rest})
    plan["joins"] = new_joins
    plan["implicit"] = []
    return plan


def _execute_plan(plan: dict, tables: dict) -> "ray.data.Dataset":
    if plan.get("set"):
        return _execute_setops(plan, tables)
    if plan.get("implicit"):
        plan = _rewrite_implicit_joins(plan, tables)
    if plan["where"] is not None:
        plan = dict(plan)
        plan["where"] = _resolve_in_subqueries(plan["where"], tables)
    if plan["having"] is not None:
        # HAVING filters the aggregated output through the same
        # filter_query compiler as WHERE, so IN (SELECT ...) resolves to
        # the identical broadcast-terms spec (the subquery only references
        # base tables).
        plan = dict(plan)
        plan["having"] = _resolve_in_subqueries(plan["having"], tables)
    if not plan["joins"] and _has_qualified_refs(plan):
        # single aliased table with alias-qualified refs (common with
        # derived tables): the join machinery already qualifies/resolves
        # names and works with zero JOIN clauses — reuse it
        plan = dict(plan)
        plan["joins"] = []
        plan["_force_qualified"] = True
    if plan["joins"] or plan.get("_force_qualified"):
        ds, qualified = _plan_joins(plan, tables)
        bare: dict = {}
        for q in qualified:
            bare.setdefault(q.split(".", 1)[1], []).append(q)
        # resolve every table-column reference to its qualified name;
        # HAVING and ORDER BY address OUTPUT columns and stay as typed
        if plan["where"] is not None:
            plan["where"] = _resolve_cond(plan["where"], qualified, bare)
        if plan["group"]:
            plan["group"] = [
                _resolve_name(g, qualified, bare) if isinstance(g, str)
                else _resolve_expr(g, qualified, bare)
                for g in plan["group"]]
        items = []
        for it in plan["items"]:
            it = dict(it)
            if it["kind"] == "col":
                it["col"] = _resolve_name(it["col"], qualified, bare)
                it.setdefault("alias", it["col"].split(".", 1)[1])
            elif it["kind"] == "agg":
                if it["col"] != "*":
                    it["col"] = _resolve_name(it["col"], qualified, bare)
            elif it["kind"] == "expr":
                it["node"] = _resolve_expr(it["node"], qualified, bare)
            elif it["kind"] == "win":
                it["partition"] = [_resolve_name(c, qualified, bare)
                                   for c in it["partition"]]
                it["order"] = [(_resolve_name(c, qualified, bare), d)
                               for c, d in it["order"]]
                if "col" in it:
                    it["col"] = _resolve_name(it["col"], qualified, bare)
            items.append(it)
        plan["items"] = items
        out_names = [it.get("alias") or (it["col"] if it["kind"] == "col"
                     else _agg_alias(it) if it["kind"] == "agg" else None)
                     for it in items if it["kind"] != "star"]
        if len(out_names) != len(set(out_names)):
            raise ValueError("duplicate output column names across joined "
                             "tables: add AS aliases")
    else:
        if isinstance(plan["table"], dict):  # derived table
            ds = _execute_plan(plan["table"]["subquery"], tables)
        elif plan["table"] in tables:
            ds = tables[plan["table"]]
        else:
            raise ValueError(f"unknown table {plan['table']!r}")
    if plan["where"] is not None:
        ds = filter_query(ds, plan["where"])

    # GROUP BY expressions: precompute each as a hidden column, rewrite
    # repr-identical SELECT expression items to reference it (ANSI: a
    # non-aggregate select expression must appear in GROUP BY)
    if plan["group"] and any(isinstance(g, dict) for g in plan["group"]):
        plan = dict(plan)
        pre_g, norm = {}, []
        plan["items"] = [dict(it) for it in plan["items"]]
        for gi, g in enumerate(plan["group"]):
            if not isinstance(g, dict):
                norm.append(g)
                continue
            name = f"__gx{gi}"
            pre_g[name] = compile_expr(g)
            norm.append(name)
            for it in plan["items"]:
                if it["kind"] == "expr" and repr(it["node"]) == repr(g):
                    alias = it["alias"]
                    it.clear()
                    it.update({"kind": "col", "col": name, "alias": alias})
        plan["group"] = norm

        def add_gx(t: pa.Table, _p=tuple(pre_g.items())) -> pa.Table:
            for nm, fn in _p:
                t = t.append_column(nm, _as_column(fn(t), t.num_rows))
            return t

        ds = ds.map_batches(add_gx, batch_format="pyarrow")

    src_ds = ds  # post-WHERE input (COUNT(DISTINCT) re-reads this)
    items = plan["items"]
    win_items = [it for it in items if it["kind"] == "win"]
    if win_items:
        if plan["group"] or any(it["kind"] == "agg" for it in items):
            raise ValueError("window functions cannot mix with GROUP BY "
                             "or aggregates")
        ds = _attach_window_columns(ds, win_items)
        # downstream, a computed window column behaves like a bare column
        items = [({"kind": "col", "col": it["alias"], "alias": it["alias"]}
                  if it["kind"] == "win" else it) for it in items]
    expr_items = [it for it in items if it["kind"] == "expr"]
    simple_aggs = [it for it in items
                   if it["kind"] == "agg" and not it.get("distinct")]
    distinct_aggs = [it for it in items
                     if it["kind"] == "agg" and it.get("distinct")]
    inner_aggs: list[dict] = []
    for it in expr_items:
        _walk_aggs(it["node"], inner_aggs)
    # HAVING may reference aggregates that are NOT in the SELECT list
    # (HAVING COUNT(*) > 5): compute them as hidden agg outputs, keep
    # them through the projection, and drop them after the filter
    having_aggs: list[dict] = []

    def _walk_cond_aggs(spec):
        if not isinstance(spec, dict):
            return
        if spec.get("op") == "cmp_expr":
            _walk_aggs(spec["node"], having_aggs)
        for c in spec.get("clauses", ()):
            _walk_cond_aggs(c)

    if plan["having"] is not None:
        _walk_cond_aggs(plan["having"])
        inner_aggs = inner_aggs + having_aggs
        if having_aggs and not (plan["group"] or simple_aggs
                                or distinct_aggs or expr_items):
            pass  # global-aggregate HAVING still routes the agg path
    if any(a.get("distinct") for a in inner_aggs):
        raise ValueError("COUNT(DISTINCT ...) cannot appear inside an "
                         "expression")

    if simple_aggs or inner_aggs or distinct_aggs or plan["group"]:
        # ---- aggregation path ----
        # 1. one Ray aggregate per DISTINCT inner agg (SUM(x)/SUM(x) runs
        #    SUM once); non-bare-column args become precomputed columns
        alias_of: dict[str, str] = {}
        fn_of_alias: dict[str, str] = {}
        pre: dict[str, object] = {}
        agg_specs: list[dict] = []
        for a in inner_aggs:
            key = repr((a["fn"], a["arg"]))
            if key not in alias_of:
                name = f"__agg{len(alias_of)}"
                alias_of[key] = name
                fn_of_alias[name] = a["fn"]
                if a["arg"] == "*" or a["arg"]["kind"] == "col":
                    col = "*" if a["arg"] == "*" else a["arg"]["col"]
                else:
                    col = f"__pre{len(pre)}"
                    pre[col] = compile_expr(a["arg"])
                agg_specs.append({"fn": a["fn"], "col": col, "alias": name})
            a["_alias"] = alias_of[key]
        for it in simple_aggs:
            fn_of_alias[_agg_alias(it)] = it["fn"]
            agg_specs.append(it)
        ray_aggs = [_make_agg(s) for s in agg_specs]

        if pre:
            def add_pre(t: pa.Table, _pre=pre) -> pa.Table:
                for name, fn in _pre.items():
                    t = t.append_column(name, _as_column(fn(t), t.num_rows))
                return t

            ds = ds.map_batches(add_pre, batch_format="pyarrow")

        if plan["group"]:
            cols = [it["col"] for it in items if it["kind"] == "col"]
            if set(cols) - set(plan["group"]):
                raise ValueError("non-grouped bare column in SELECT")
            if ray_aggs:
                # null-safe: Ray's sort-groupby partition search crashes
                # on null key columns (see _null_safe_group)
                ds = _cast_int_sums(
                    _null_safe_group(
                        ds, list(plan["group"]),
                        lambda d, ks: d.groupby(ks).aggregate(*ray_aggs)),
                    fn_of_alias)
            else:
                # distinct-count-only query: the main frame is the
                # distinct group keys
                ds = _set_distinct(_project(ds, plan["group"], {}),
                                   list(plan["group"]))
        else:
            if any(it["kind"] == "col" for it in items):
                raise ValueError("mixing aggregates and bare columns "
                                 "needs GROUP BY")
            if ray_aggs:
                # GLOBAL aggregate: rebuild COUNT(*) against a real input
                # column — Dataset.aggregate(Count()) without a column
                # returns 0 in Ray 2.49 (the grouped path is unaffected)
                schema = ds.schema()
                star = schema.names[0] if schema and schema.names else None
                if star is not None:
                    ray_aggs = [_make_agg(s, star_col=star)
                                for s in agg_specs]
                row = ds.aggregate(*ray_aggs)
                if row is None:
                    # empty/fully-filtered input: ANSI global aggregates
                    # still return ONE row — 0 for COUNT, NULL otherwise
                    row = {n: (0 if fn == "COUNT" else None)
                           for n, fn in fn_of_alias.items()}
                # same SUM(int) -> float64 widening as the grouped path
                for n, fn in fn_of_alias.items():
                    import numpy as _np
                    if fn == "SUM" and isinstance(
                            row.get(n), (int, _np.integer)):
                        row[n] = float(row[n])
                ds = _one_row(row, list(fn_of_alias))
            else:
                import ray.data

                ds = ray.data.from_arrow(
                    pa.table({"__one": pa.array([0], pa.int64())}))
        if distinct_aggs:
            ds = _attach_distinct_counts(
                ds, src_ds, plan["group"], distinct_aggs)

        # 2. expression items evaluate over the aggregated rows, with the
        #    agg leaves substituted by their result columns
        if expr_items:
            compiled = [(it["alias"], compile_expr(_subst_aggs(it["node"])))
                        for it in expr_items]

            def eval_exprs(t: pa.Table, _c=compiled) -> pa.Table:
                for name, fn in _c:
                    t = t.append_column(name, _as_column(fn(t), t.num_rows))
                return t

            ds = ds.map_batches(eval_exprs, batch_format="pyarrow")

        # 3. project in SELECT order: only the SELECTED group keys survive
        #    (an unselected GROUP BY key is dropped, as in SQL)
        keep = [it["col"] if it["kind"] == "col"
                else it["alias"] if it["kind"] == "expr"
                else _agg_alias(it) for it in items]
        hidden = [a["_alias"] for a in having_aggs
                  if a.get("_alias") and a["_alias"] not in keep]
        hidden = list(dict.fromkeys(hidden))
        renames = {it["col"]: it["alias"] for it in items
                   if it["kind"] == "col" and "alias" in it}
        ds = _project(ds, keep + hidden, renames)
    else:
        # ---- projection path (expressions evaluated per batch) ----
        if items and items[0]["kind"] != "star":
            if expr_items:
                compiled = [(it["alias"], compile_expr(it["node"]))
                            for it in expr_items]

                def project(t: pa.Table, _c=compiled) -> pa.Table:
                    for name, fn in _c:
                        t = t.append_column(
                            name, _as_column(fn(t), t.num_rows))
                    return t

                ds = ds.map_batches(project, batch_format="pyarrow")
            keep = [it["alias"] if it["kind"] == "expr" else it["col"]
                    for it in items]
            renames = {it["col"]: it["alias"] for it in items
                       if it["kind"] == "col" and "alias" in it}
            # ORDER BY on a non-selected column (ANSI allows it): sort
            # (+ limit) BEFORE the projection drops it, using source
            # names (inverse of the AS renames)
            final_names = [renames.get(c, c) for c in keep]
            if plan["order"] and plan["having"] is None \
                    and not plan.get("select_distinct") \
                    and any(not (isinstance(c, str) and c.startswith("#"))
                            and c not in final_names
                            for c, _ in plan["order"]):
                inv = {v: k for k, v in renames.items()}
                order = [(inv.get(c, c), d) for c, d in _resolve_ordinals(
                    plan["order"], final_names)]
                ds = _null_safe_sort(ds, order)
                if plan["limit"] is not None:
                    ds = _apply_limit(ds, plan["limit"],
                                      plan.get("offset", 0))
                plan = dict(plan)
                plan["order"], plan["limit"] = [], None
            ds = _project(ds, keep, renames)

    if plan.get("select_distinct"):
        # DISTINCT over the projected output: a grouped count (combiner
        # shuffle over distinct rows only) then drop the count — the same
        # shape the COUNT(DISTINCT) path uses.
        names = list(ds.schema().names)
        ds = _set_distinct(ds, names)  # null-safe grouped count
    if plan["having"] is not None:
        having = plan["having"]
        if having_aggs:
            def _subst_cond(spec):
                if not isinstance(spec, dict):
                    return spec
                out2 = dict(spec)
                if out2.get("op") == "cmp_expr":
                    out2["node"] = _subst_aggs(out2["node"])
                if "clauses" in out2:
                    out2["clauses"] = [_subst_cond(c)
                                       for c in out2["clauses"]]
                return out2

            having = _subst_cond(having)
        ds = filter_query(ds, having)
        if having_aggs:
            hid = [a["_alias"] for a in having_aggs if a.get("_alias")]
            keep_after = [c for c in ds.schema().names if c not in hid]
            ds = _project(ds, keep_after, {})
    if plan["order"]:
        order = plan["order"]
        if any(isinstance(c, str) and c.startswith("#")
               for c, _ in order):
            order = _resolve_ordinals(order, list(ds.schema().names))
        ds = _null_safe_sort(ds, order)
    if plan["limit"] is not None:
        ds = _apply_limit(ds, plan["limit"], plan.get("offset", 0))
    return ds


def _one_row(row: dict, names: list[str]):
    import ray.data

    return ray.data.from_arrow(pa.table(
        {n: [row[n]] for n in names}))
