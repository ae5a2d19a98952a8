"""Property-based tests (SURVEY §5.2 item 4): random inputs → filter
grammar round-trip vs DuckDB WHERE; union column-alignment invariant.
Example counts kept small — each Spark action costs ~0.5s."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from configurable_etl_python_repo_spark.functions.expr import compile_filter

COLS = ["a", "b"]

frames = st.lists(
    st.tuples(st.integers(-5, 5), st.sampled_from(["x", "y", None])),
    min_size=1, max_size=20,
).map(lambda rows: pd.DataFrame(rows, columns=COLS))

comparisons = st.one_of(
    st.tuples(st.sampled_from(["=", "!=", ">=", "<=", ">", "<"]),
              st.integers(-5, 5)).map(lambda t: (f"a {t[0]} NUMBER({t[1]})",
                                                 f"a {t[0].replace('=', '=') if t[0] != '=' else '='} {t[1]}")),
    st.tuples(st.integers(-5, 0), st.integers(0, 5)).map(
        lambda t: (f"a BETWEEN(NUMBER({t[0]}), NUMBER({t[1]}))",
                   f"a BETWEEN {t[0]} AND {t[1]}")),
    st.sampled_from([("b = x", "b = 'x'"), ("b != y", "b != 'y'"),
                     ("b = NOT NULL", "b IS NOT NULL"),
                     ("b IN (x, y)", "b IN ('x', 'y')")]),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=frames, cmp=comparisons)
def test_filter_grammar_matches_duckdb(spark, pdf, cmp):
    """Our grammar predicate and the equivalent SQL WHERE keep exactly the
    same rows (both engines use SQL NULL comparison semantics)."""
    ours, sql = cmp
    key = lambda t: [(v is None, v) for v in t]  # noqa: E731 — None-safe sort
    sdf = spark.createDataFrame(pdf.astype({"a": "int64"}),
                                "a long, b string")
    got = sorted(map(tuple, sdf.filter(compile_filter(ours)).collect()), key=key)
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute(
        f"SELECT * FROM t WHERE {sql}").fetchall()), key=key)
    assert got == want, (ours, sql)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_cols=st.sets(st.sampled_from(["a", "b", "c"]), min_size=1).map(sorted),
    right_cols=st.sets(st.sampled_from(["b", "c", "d"]), min_size=1).map(sorted),
    n=st.integers(1, 5),
)
def test_bind_rows_alignment_invariant(spark, left_cols, right_cols, n):
    """BIND ROWS: row count adds up; columns are the union; a column absent
    from one side is NULL exactly for that side's rows."""
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    left = spark.range(n).selectExpr(*[f"id as {c}" for c in left_cols])
    right = spark.range(n * 2).selectExpr(*[f"id+100 as {c}" for c in right_cols])
    eng.bind("l", left)
    eng.bind("r", right)
    out = eng.run_op(OpSpec("BIND ROWS", "u", ["l", "r"], {}))
    assert set(out.columns) == set(left_cols) | set(right_cols)
    assert out.count() == n + n * 2
    only_left = set(left_cols) - set(right_cols)
    for c in only_left:
        assert out.filter(f"{c} IS NULL").count() == n * 2
