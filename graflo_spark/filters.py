"""Filter-expression algebra.

Re-expresses the reference's cross-dialect ``FilterExpression`` tree
(graflo/filter/onto.py:123-596: leaves ``== != >= <= > < IN IS_NULL
IS_NOT_NULL``, composites ``AND OR NOT IF_THEN``, dict/list parse forms,
renderings to 6 dialects + a Python evaluator) as a single algebra with three
backends:

    - :meth:`FilterExpression.to_column`  -> Catalyst ``Column`` (the hot path;
      predicate pushdown / partition pruning come free from Catalyst)
    - :meth:`FilterExpression.to_sql`     -> ANSI SQL text (JDBC pushdown,
      DuckDB oracles)
    - :meth:`FilterExpression.evaluate`   -> pure-Python row predicate (the
      reference's "python flavor", used driver-side on small samples)

Parsing accepts the reference's shorthand forms::

    {"AND": [{"field": "o_totalprice", "op": ">", "value": 100.0}, ...]}
    ["==", "F", "o_orderstatus"]            # [op, value, field]
    {"field": "x", "op": "IN", "value": [1, 2]}
    {"IF_THEN": [a, b]}                     # implication: NOT a OR b
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

LOGICAL_OPS = ("AND", "OR", "NOT", "IF_THEN")
COMPARISON_OPS = ("==", "!=", ">=", "<=", ">", "<", "IN", "IS_NULL", "IS_NOT_NULL")

_SQL_CMP = {"==": "=", "!=": "<>", ">=": ">=", "<=": "<=", ">": ">", "<": "<"}


def _sql_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, (_dt.datetime, _dt.date)):
        return f"TIMESTAMP '{value}'"
    s = str(value).replace("'", "''")
    return f"'{s}'"


@dataclass(frozen=True)
class FilterExpression:
    """Leaf (``field``/``op``/``value``) or composite (``logic``/``items``)."""

    # leaf
    field: str | None = None
    op: str | None = None
    value: Any = None
    # composite
    logic: str | None = None
    items: tuple["FilterExpression", ...] = dc_field(default_factory=tuple)

    # ------------------------------------------------------------- parsing
    @classmethod
    def parse(cls, spec: Any) -> "FilterExpression":
        if isinstance(spec, FilterExpression):
            return spec
        if isinstance(spec, (list, tuple)):
            # reference list form: [op, value, field]
            if len(spec) == 3 and spec[0] in COMPARISON_OPS:
                return cls(field=spec[2], op=spec[0], value=spec[1])
            if len(spec) == 2 and spec[0] in ("IS_NULL", "IS_NOT_NULL"):
                return cls(field=spec[1], op=spec[0])
            raise ValueError(f"cannot parse filter list form: {spec!r}")
        if isinstance(spec, dict):
            logical = [k for k in spec if k in LOGICAL_OPS]
            if logical:
                if len(spec) != 1:
                    raise ValueError(f"composite filter must be single-key: {spec!r}")
                logic = logical[0]
                raw = spec[logic]
                items = tuple(cls.parse(i) for i in (raw if isinstance(raw, list) else [raw]))
                return cls._validated_composite(logic, items)
            if "op" in spec:
                op = spec["op"]
                if op not in COMPARISON_OPS:
                    raise ValueError(f"unknown comparison op: {op!r}")
                return cls(field=spec["field"], op=op, value=spec.get("value"))
            # dunder shorthand: {"field": {"__eq__": 3}} style
            if len(spec) == 1:
                fname, cond = next(iter(spec.items()))
                dunder = {
                    "__eq__": "==", "__ne__": "!=", "__ge__": ">=",
                    "__le__": "<=", "__gt__": ">", "__lt__": "<", "__in__": "IN",
                }
                if isinstance(cond, dict) and len(cond) == 1:
                    d, v = next(iter(cond.items()))
                    if d in dunder:
                        return cls(field=fname, op=dunder[d], value=v)
                return cls(field=fname, op="==", value=cond)
        raise ValueError(f"cannot parse filter spec: {spec!r}")

    @classmethod
    def _validated_composite(
        cls, logic: str, items: tuple["FilterExpression", ...]
    ) -> "FilterExpression":
        if logic == "NOT" and len(items) != 1:
            raise ValueError("NOT takes exactly one operand")
        if logic == "IF_THEN" and len(items) != 2:
            raise ValueError("IF_THEN takes exactly two operands")
        if logic in ("AND", "OR") and len(items) < 1:
            raise ValueError(f"{logic} needs at least one operand")
        return cls(logic=logic, items=items)

    # convenience constructors
    @classmethod
    def AND(cls, *items: Any) -> "FilterExpression":
        return cls._validated_composite("AND", tuple(cls.parse(i) for i in items))

    @classmethod
    def OR(cls, *items: Any) -> "FilterExpression":
        return cls._validated_composite("OR", tuple(cls.parse(i) for i in items))

    @classmethod
    def NOT(cls, item: Any) -> "FilterExpression":
        return cls._validated_composite("NOT", (cls.parse(item),))

    @classmethod
    def IF_THEN(cls, cond: Any, then: Any) -> "FilterExpression":
        return cls._validated_composite("IF_THEN", (cls.parse(cond), cls.parse(then)))

    @classmethod
    def leaf(cls, field: str, op: str, value: Any = None) -> "FilterExpression":
        if op not in COMPARISON_OPS:
            raise ValueError(f"unknown comparison op: {op!r}")
        return cls(field=field, op=op, value=value)

    @property
    def is_leaf(self) -> bool:
        return self.logic is None

    def to_dict(self) -> dict:
        """Serialize to the dict parse form (YAML manifest round-trip)."""
        if self.is_leaf:
            out: dict = {"field": self.field, "op": self.op}
            if self.op not in ("IS_NULL", "IS_NOT_NULL"):
                out["value"] = self.value
            return out
        return {self.logic: [i.to_dict() for i in self.items]}

    # ------------------------------------------------------------ backends
    def to_column(self, resolver: Any = None) -> Column:
        """Compile to a Catalyst Column expression (parenthesization is
        implicit in the expression tree — no precedence bookkeeping needed).

        ``resolver`` optionally maps a field name to a Column (used by the
        compiler to point filters at internal prefixed columns)."""
        if self.is_leaf:
            c = resolver(self.field) if resolver is not None else F.col(self.field)
            op = self.op
            if op == "==":
                return c == F.lit(self.value)
            if op == "!=":
                return c != F.lit(self.value)
            if op == ">=":
                return c >= F.lit(self.value)
            if op == "<=":
                return c <= F.lit(self.value)
            if op == ">":
                return c > F.lit(self.value)
            if op == "<":
                return c < F.lit(self.value)
            if op == "IN":
                return c.isin(list(self.value))
            if op == "IS_NULL":
                return c.isNull()
            if op == "IS_NOT_NULL":
                return c.isNotNull()
            raise ValueError(f"unknown op {op!r}")
        cols = [i.to_column(resolver) for i in self.items]
        if self.logic == "AND":
            out = cols[0]
            for c in cols[1:]:
                out = out & c
            return out
        if self.logic == "OR":
            out = cols[0]
            for c in cols[1:]:
                out = out | c
            return out
        if self.logic == "NOT":
            return ~cols[0]
        if self.logic == "IF_THEN":  # implication: a -> b  ==  NOT a OR b
            return (~cols[0]) | cols[1]
        raise ValueError(f"unknown logic {self.logic!r}")

    def to_sql(self, quote: str = '"') -> str:
        """Render ANSI SQL (DuckDB-compatible; also usable for JDBC pushdown)."""
        if self.is_leaf:
            f = f"{quote}{self.field}{quote}"
            op = self.op
            if op in _SQL_CMP:
                return f"{f} {_SQL_CMP[op]} {_sql_literal(self.value)}"
            if op == "IN":
                vals = ", ".join(_sql_literal(v) for v in self.value)
                return f"{f} IN ({vals})"
            if op == "IS_NULL":
                return f"{f} IS NULL"
            if op == "IS_NOT_NULL":
                return f"{f} IS NOT NULL"
            raise ValueError(f"unknown op {op!r}")
        parts = [i.to_sql(quote) for i in self.items]
        if self.logic == "AND":
            return "(" + " AND ".join(parts) + ")"
        if self.logic == "OR":
            return "(" + " OR ".join(parts) + ")"
        if self.logic == "NOT":
            return f"(NOT {parts[0]})"
        if self.logic == "IF_THEN":
            return f"((NOT {parts[0]}) OR {parts[1]})"
        raise ValueError(f"unknown logic {self.logic!r}")

    def evaluate(self, doc: dict) -> bool:
        """Pure-Python evaluation on one document (reference "python flavor")."""
        if self.is_leaf:
            v = doc.get(self.field)
            op = self.op
            if op == "IS_NULL":
                return v is None
            if op == "IS_NOT_NULL":
                return v is not None
            if v is None:
                return False  # SQL-ish: comparisons with NULL are not-true
            if op == "==":
                return v == self.value
            if op == "!=":
                return v != self.value
            if op == ">=":
                return v >= self.value
            if op == "<=":
                return v <= self.value
            if op == ">":
                return v > self.value
            if op == "<":
                return v < self.value
            if op == "IN":
                return v in self.value
            raise ValueError(f"unknown op {op!r}")
        if self.logic == "AND":
            return all(i.evaluate(doc) for i in self.items)
        if self.logic == "OR":
            return any(i.evaluate(doc) for i in self.items)
        if self.logic == "NOT":
            return not self.items[0].evaluate(doc)
        if self.logic == "IF_THEN":
            return (not self.items[0].evaluate(doc)) or self.items[1].evaluate(doc)
        raise ValueError(f"unknown logic {self.logic!r}")

    def referenced_fields(self) -> set[str]:
        if self.is_leaf:
            return {self.field}
        out: set[str] = set()
        for i in self.items:
            out |= i.referenced_fields()
        return out
