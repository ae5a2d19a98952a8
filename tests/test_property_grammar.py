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


# ---------------------------------------------------------------------------
# Round-4 curation ops: exact-integer-math properties
# ---------------------------------------------------------------------------

_mix_corpora = st.lists(
    st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c", "d"])),
    min_size=1, max_size=60, unique_by=lambda t: t[0],
)
_mix_weights = st.dictionaries(
    st.sampled_from(["a", "b", "c"]), st.integers(1, 5),
    min_size=1, max_size=3,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_mix_corpora, weights=_mix_weights)
def test_mixture_sample_equals_model_on_random_corpora(spark, rows, weights):
    """mixture_sample == the pure-Python integer-math model EXACTLY, for
    any corpus/weights: the whole point of the BIGINT formulation is that
    no float boundary can make an engine disagree."""
    from test_curation_ops import _mixture_model

    from configurable_etl_python_repo_spark.llm.sampling import mixture_sample

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["doc_id"] for r in mixture_sample(df, weights).collect()}
    assert got == _mixture_model(rows, weights)


_pack_docs = st.lists(
    st.tuples(
        st.integers(0, 100),
        st.sampled_from(["s1", "s2"]),
        st.lists(st.sampled_from(["aa", "b", "cc1"]), min_size=0,
                 max_size=8).map(" ".join),
    ),
    min_size=1, max_size=25, unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_pack_docs)
def test_pack_sequences_stream_invariant_on_random_docs(spark, docs):
    """For any corpus: per shard, in id order, each doc starts exactly
    where the previous doc's tokens ended (seq_id*L + seq_offset equals
    the running token total) — packing never drops or double-counts a
    token."""
    from configurable_etl_python_repo_spark.llm.text import pack_sequences

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = sorted(pack_sequences(df, seq_len=7).collect(),
                  key=lambda r: (r["source"], r["doc_id"]))
    stream = {}
    for r in rows:
        assert r["seq_id"] * 7 + r["seq_offset"] == stream.get(r["source"], 0)
        stream[r["source"]] = stream.get(r["source"], 0) + r["n_tokens"]
