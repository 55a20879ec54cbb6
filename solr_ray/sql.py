"""/sql handler: a SQL front-end over Ray Datasets.

Reference: the SQL module parses SQL with Calcite and plans it onto
streaming expressions over one collection
(solr/modules/sql/src/java/org/apache/solr/handler/sql/SQLHandler.java:49,
CalciteSolrDriver). This front-end mirrors that scope — single-table
SELECT with WHERE / GROUP BY aggregates / HAVING / ORDER BY / LIMIT — and
compiles onto the same building blocks the streaming-expression DSL uses
(ops/queryfilter specs, Ray groupby aggregates, sort, limit).

Grammar (case-insensitive keywords):

    SELECT <*| item[, item...]> FROM <table>
      [WHERE <cond>] [GROUP BY col[, col...]] [HAVING <cond>]
      [ORDER BY col [ASC|DESC][, ...]] [LIMIT n]

    item  := col [AS alias] | COUNT(*) | COUNT|SUM|AVG|MIN|MAX(col) [AS a]
           | CAST(item AS BIGINT|INTEGER|DOUBLE|VARCHAR) AS a
    cond  := disjunctions/conjunctions of: col <op> literal, col IN (...),
             col BETWEEN a AND b, col LIKE 'prefix%', NOT, parentheses

Everything unsupported raises ValueError up front — no silent wrong
answers. Because the accepted dialect is ANSI, the very same query string
doubles as its own DuckDB oracle (see __ray_entry__'s sql_* entries).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from solr_ray.ops.queryfilter import filter_query

_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<cmp><=|>=|<>|!=|=|<|>)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[(),*])
""", re.VERBOSE)

_AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
_CAST_TYPES = {"BIGINT": "int64", "INTEGER": "int32", "DOUBLE": "float64",
               "VARCHAR": "string"}
_KEYWORDS = {"SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER",
             "LIMIT", "AS", "AND", "OR", "NOT", "IN", "BETWEEN", "LIKE",
             "ASC", "DESC"}


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

    def select_item(self, allow_alias: bool = True):
        k, v = self.peek()
        if k != "name":
            raise ValueError(f"expected column or aggregate, got {v!r}")
        name = self.eat("name")
        if name.upper() == "CAST" and self.peek() == ("punct", "("):
            self.eat()
            inner = self.select_item(allow_alias=False)
            self.eat("kw", "AS")
            ty = self.eat("name").upper()
            if ty not in _CAST_TYPES:
                raise ValueError(f"unsupported CAST type {ty!r}")
            self.eat("punct", ")")
            item = {"kind": "cast", "inner": inner, "type": ty}
            if self.at_kw("AS"):
                self.eat()
                item["alias"] = self.eat("name")
            else:
                raise ValueError("CAST(...) requires AS <alias>")
            return item
        if name.upper() in _AGGS and self.peek() == ("punct", "("):
            self.eat()
            if self.peek() == ("punct", "*"):
                if name.upper() != "COUNT":
                    raise ValueError(f"{name}(*) not supported")
                self.eat()
                col = "*"
            else:
                col = self.eat("name")
            self.eat("punct", ")")
            item = {"kind": "agg", "fn": name.upper(), "col": col}
        else:
            item = {"kind": "col", "col": name}
        if allow_alias and self.at_kw("AS"):
            self.eat()
            item["alias"] = self.eat("name")
        return item

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
        k, v = self.peek()
        if k in ("num", "str"):
            self.i += 1
            return v
        raise ValueError(f"expected literal, got {v!r}")

    def predicate(self):
        col = self.eat("name")
        k, v = self.peek()
        if k == "cmp":
            self.eat()
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
            if not (isinstance(pat, str) and pat.endswith("%")
                    and "%" not in pat[:-1] and "_" not in pat):
                raise ValueError(
                    f"only prefix LIKE 'x%' is supported, got {pat!r}")
            return {"op": "prefix", "field": col, "value": pat[:-1]}
        raise ValueError(f"unsupported predicate after {col!r}: {v!r}")

    # ---- full statement ----
    def statement(self):
        self.eat("kw", "SELECT")
        items = self.select_list()
        self.eat("kw", "FROM")
        table = self.eat("name")
        where = group = having = None
        order: list[tuple[str, bool]] = []
        limit = None
        if self.at_kw("WHERE"):
            self.eat()
            where = self.cond()
        if self.at_kw("GROUP"):
            self.eat()
            self.eat("kw", "BY")
            group = [self.eat("name")]
            while self.peek() == ("punct", ","):
                self.eat()
                group.append(self.eat("name"))
        if self.at_kw("HAVING"):
            self.eat()
            having = self.cond()
        if self.at_kw("ORDER"):
            self.eat()
            self.eat("kw", "BY")
            while True:
                col = self.eat("name")
                desc = False
                if self.at_kw("ASC", "DESC"):
                    desc = self.eat() == "DESC"
                order.append((col, desc))
                if self.peek() != ("punct", ","):
                    break
                self.eat()
        if self.at_kw("LIMIT"):
            self.eat()
            limit = int(self.eat("num"))
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing SQL at {self.peek()[1]!r}")
        return {"items": items, "table": table, "where": where,
                "group": group, "having": having, "order": order,
                "limit": limit}


def parse_sql(sql: str) -> dict:
    return _Parser(sql).statement()


def _agg_alias(item: dict) -> str:
    if "alias" in item:
        return item["alias"]
    return f"{item['fn'].lower()}({item['col']})"


def _make_agg(item: dict):
    import ray.data.aggregate as agg

    name = _agg_alias(item)
    fn, col = item["fn"], item["col"]
    if fn == "COUNT":
        return agg.Count(alias_name=name) if col == "*" else agg.Count(
            col, alias_name=name)
    cls = {"SUM": agg.Sum, "AVG": agg.Mean,
           "MIN": agg.Min, "MAX": agg.Max}[fn]
    return cls(col, alias_name=name)


def execute_sql(sql: str, tables: dict) -> "ray.data.Dataset":
    """Run the SQL subset against a dict of table-name -> Dataset."""
    plan = parse_sql(sql)
    if plan["table"] not in tables:
        raise ValueError(f"unknown table {plan['table']!r}")
    ds = tables[plan["table"]]
    if plan["where"] is not None:
        ds = filter_query(ds, plan["where"])

    # unwrap CAST items: plan on the inner item under the cast's alias,
    # apply the cast right after projection/aggregation (so HAVING and
    # ORDER BY see the cast values, as in SQL)
    casts: dict[str, str] = {}
    items = []
    for it in plan["items"]:
        if it["kind"] == "cast":
            inner = dict(it["inner"])
            inner["alias"] = it["alias"]
            casts[it["alias"]] = _CAST_TYPES[it["type"]]
            items.append(inner)
        else:
            items.append(it)
    aggs = [it for it in items if it["kind"] == "agg"]
    if plan["group"]:
        cols = [it["col"] for it in items if it["kind"] == "col"]
        if set(cols) - set(plan["group"]):
            raise ValueError("non-grouped bare column in SELECT")
        ds = ds.groupby(plan["group"]).aggregate(
            *[_make_agg(it) for it in aggs])
        # project in SELECT order: only the SELECTED group keys survive
        # (an unselected GROUP BY key is dropped, as in SQL)
        keep = [it["col"] if it["kind"] == "col" else _agg_alias(it)
                for it in items]
        ds = ds.select_columns(keep)
        # bare-column aliases on group keys
        renames = {it["col"]: it["alias"] for it in items
                   if it["kind"] == "col" and "alias" in it}
        if renames:
            ds = ds.rename_columns(renames)
    elif aggs:
        if any(it["kind"] != "agg" for it in items):
            raise ValueError("mixing aggregates and bare columns "
                             "needs GROUP BY")
        row = ds.aggregate(*[_make_agg(it) for it in aggs])
        if row is None:
            # empty/fully-filtered input: ANSI global aggregates still
            # return ONE row — 0 for COUNT, NULL for SUM/AVG/MIN/MAX
            row = {_agg_alias(it): (0 if it["fn"] == "COUNT" else None)
                   for it in aggs}
        ds = _one_row(row, [_agg_alias(it) for it in aggs])
    else:
        if items and items[0]["kind"] != "star":
            keep = [it["col"] for it in items]
            ds = ds.select_columns(keep)
            renames = {it["col"]: it["alias"] for it in items
                       if "alias" in it}
            if renames:
                ds = ds.rename_columns(renames)

    if casts:
        def apply_casts(t: pa.Table) -> pa.Table:
            for col, ty in casts.items():
                i = t.schema.get_field_index(col)
                t = t.set_column(i, col, pc.cast(t[col], ty))
            return t

        ds = ds.map_batches(apply_casts, batch_format="pyarrow")

    if plan["having"] is not None:
        ds = filter_query(ds, plan["having"])
    if plan["order"]:
        keys = [c for c, _ in plan["order"]]
        desc = [d for _, d in plan["order"]]
        ds = ds.sort(keys, descending=desc)
    if plan["limit"] is not None:
        ds = ds.limit(plan["limit"])
    return ds


def _one_row(row: dict, names: list[str]):
    import ray.data

    return ray.data.from_arrow(pa.table(
        {n: [row[n]] for n in names}))
