"""Property-based tests (hypothesis) for the pure driver-side algebra —
coverage the reference's own suite lacks (SURVEY §5 "not used").

Spark evaluation is too slow per-example for hypothesis, so the Column path
is checked once per generated batch via a single collect over all examples,
and the pure-Python surfaces (parse/to_dict round-trip, SQL rendering
stability, N-Triples escaping) run example-per-example.
"""

import json

from hypothesis import HealthCheck, example, given, settings, strategies as st

from graflo_spark import rdf_manifest
from graflo_spark.filters import FilterExpression

# values are type-aligned with their field (a:int, b:string, c:bool) — the
# algebra compares like with like; ANSI Spark would raise on invalid casts
FIELD_VALUES = {
    "a": st.integers(min_value=-100, max_value=100),
    "b": st.text(alphabet="xyz'", max_size=4),
    "c": st.booleans(),
}
FIELDS = list(FIELD_VALUES)
CMP_OPS = ["==", "!=", ">=", "<=", ">", "<"]


def _cmp_leaf(field):
    return st.tuples(st.sampled_from(CMP_OPS), FIELD_VALUES[field]).map(
        lambda t: FilterExpression.leaf(field, t[0], t[1])
    )


def _in_leaf(field):
    return st.lists(FIELD_VALUES[field], min_size=1, max_size=3).map(
        lambda vs: FilterExpression.leaf(field, "IN", vs)
    )


LEAVES = st.one_of(
    *[_cmp_leaf(f) for f in FIELDS],
    *[_in_leaf(f) for f in FIELDS],
    st.tuples(st.sampled_from(FIELDS), st.sampled_from(["IS_NULL", "IS_NOT_NULL"])).map(
        lambda t: FilterExpression.leaf(t[0], t[1])
    ),
)


def composites(children):
    return st.one_of(
        st.lists(children, min_size=1, max_size=3).map(
            lambda xs: FilterExpression.AND(*xs)
        ),
        st.lists(children, min_size=1, max_size=3).map(
            lambda xs: FilterExpression.OR(*xs)
        ),
        children.map(FilterExpression.NOT),
        st.tuples(children, children).map(
            lambda t: FilterExpression.IF_THEN(t[0], t[1])
        ),
    )


EXPRESSIONS = st.recursive(LEAVES, composites, max_leaves=8)


@given(EXPRESSIONS)
@settings(max_examples=200, deadline=None)
def test_filter_dict_roundtrip(expr):
    """parse(to_dict(e)) reproduces e exactly, at any nesting depth."""
    assert FilterExpression.parse(expr.to_dict()) == expr


@given(EXPRESSIONS)
@settings(max_examples=200, deadline=None)
def test_filter_sql_renders_and_is_stable(expr):
    """SQL rendering never raises, is deterministic, and quotes every
    field reference (precedence is explicit via parens)."""
    s1, s2 = expr.to_sql(), expr.to_sql()
    assert s1 == s2 and s1.strip()
    for f in ("a", "b", "c"):
        assert f'"{f}"' in s1 or f not in _fields_of(expr)


def _fields_of(e):
    if e.is_leaf:
        return {e.field}
    out = set()
    for i in e.items:
        out |= _fields_of(i)
    return out


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(EXPRESSIONS, min_size=1, max_size=4), st.randoms())
def test_filter_column_agrees_with_python_semantics(spark, exprs, rnd):
    """The Catalyst Column compilation agrees with a reference Python
    evaluator on random rows (three-valued logic: null-involved rows are
    excluded, matching SQL WHERE semantics on both sides)."""
    rows = [
        {
            "a": rnd.choice([None, -5, 0, 3, 100]),
            "b": rnd.choice([None, "x", "y", "xz'"]),
            "c": rnd.choice([None, True, False]),
        }
        for _ in range(20)
    ]
    df = spark.createDataFrame(rows, "a INT, b STRING, c BOOLEAN")
    for expr in exprs:
        got = {
            json.dumps(r.asDict(), sort_keys=True)
            for r in df.filter(expr.to_column()).collect()
        }
        want = {
            json.dumps(r, sort_keys=True)
            for r in rows
            if _py_eval(expr, r) is True
        }
        assert got == want, expr.to_sql()


def _py_eval(e, row):
    """Reference three-valued evaluator (reference filter/onto.py Python
    flavor)."""
    if e.is_leaf:
        v = row.get(e.field)
        if e.op == "IS_NULL":
            return v is None
        if e.op == "IS_NOT_NULL":
            return v is not None
        if v is None:
            return None
        if e.op == "IN":
            return any(type(v) is type(x) and v == x for x in e.value)
        if type(v) is not type(e.value) and not (
            isinstance(v, (int, float)) and isinstance(e.value, (int, float))
            and not isinstance(v, bool) and not isinstance(e.value, bool)
        ):
            return None  # SQL would cast; mixed types excluded by generator
        import operator

        ops = {"==": operator.eq, "!=": operator.ne, ">=": operator.ge,
               "<=": operator.le, ">": operator.gt, "<": operator.lt}
        return ops[e.op](v, e.value)
    vals = [_py_eval(i, row) for i in e.items]
    if e.logic == "AND":
        if any(v is False for v in vals):
            return False
        return None if any(v is None for v in vals) else True
    if e.logic == "OR":
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    if e.logic == "NOT":
        return None if vals[0] is None else not vals[0]
    if e.logic == "IF_THEN":  # ~a | b
        a, b = vals
        na = None if a is None else not a
        if na is True or b is True:
            return True
        return None if (na is None or b is None) else False
    raise AssertionError(e.logic)


@given(st.text(max_size=50))
@settings(max_examples=300, deadline=None)
@example("^^")  # r2 Hypothesis counterexample: bare rpartition('^^') ate it
@example("<a> <b>")  # IRI-looking text inside a literal
@example('"^^<x>"')  # datatype-marker-looking text inside a literal
@example('a"^^<http://www.w3.org/2001/XMLSchema#integer>')
def test_ntriples_literal_escape_roundtrip(s):
    line = rdf_manifest.to_ntriples([("s", "p", s)])
    (_, _, o), = rdf_manifest.from_ntriples(line)
    assert o == s


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.randoms(), st.sampled_from([5.0, 17.0, 50.0]),
       st.sampled_from(["backward", "forward"]))
def test_asof_chunked_property_equals_plain(spark, rnd, chunk_width,
                                            direction):
    """Property: for ANY random trade/quote set, direction, and chunk
    width, the skew-hardened chunked as-of equals the plain window —
    including NULL timestamps, duplicate right timestamps, keys on one
    side only, and tolerance."""
    from graflo_spark.ops.temporal import asof_join

    keys = ["k1", "k2", "k3"]
    left = spark.createDataFrame(
        [(rnd.choice(keys),
          None if rnd.random() < 0.08 else float(rnd.randint(0, 150)),
          i) for i in range(80)],
        "k string, ts double, i int")
    right = spark.createDataFrame(
        [(rnd.choice(keys + ["only_right"]),
          None if rnd.random() < 0.08 else float(rnd.randint(0, 150)),
          float(i)) for i in range(40)],
        "k string, ts double, px double")
    tol = rnd.choice([None, 20.0])
    plain = {r["i"]: (r["ref_ts"], r["ref_px"])
             for r in asof_join(left, right, "k", "ts", "ts",
                                direction=direction,
                                tolerance=tol).collect()}
    chunked = {r["i"]: (r["ref_ts"], r["ref_px"])
               for r in asof_join(left, right, "k", "ts", "ts",
                                  direction=direction, tolerance=tol,
                                  chunk_width=chunk_width).collect()}
    assert plain == chunked
