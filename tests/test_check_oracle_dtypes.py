"""The local sweep comparator must be dtype-STRICT: the driver's
value-hash is type-sensitive, so an int64 Spark column against a float64
oracle column must FAIL locally even when every value is numerically
identical. Round 5 shipped exactly that blind spot: DuckDB types a
windowed SUM(BIGINT) as HUGEINT, fetchdf() renders it float64, the old
float branch's 1e-9 tolerance passed it, and the driver went red on t9.
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracle import _family, compare  # noqa: E402


def test_int_vs_float_dtype_mismatch_fails():
    spark_side = pd.DataFrame({"k": ["a", "b"], "seq_id": [0, 512]})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "seq_id": [0.0, 512.0]})
    problems = compare("t9_like", spark_side, oracle_side)
    assert problems and "dtype mismatch" in problems[0]


def test_hugeint_window_sum_is_caught():
    """Feed compare() a DELIBERATELY HUGEINT-typed oracle — the exact r5
    t9 shape — and require a red result against int64 Spark values."""
    con = duckdb.connect()
    odf = con.execute(
        """
        WITH t(doc_id, n) AS (VALUES (1, CAST(300 AS BIGINT)),
                                     (2, CAST(300 AS BIGINT)),
                                     (3, CAST(300 AS BIGINT)))
        SELECT doc_id,
               coalesce(SUM(n) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 CAST(0 AS BIGINT)) // 512 AS seq_id
        FROM t
        """
    ).fetchdf()
    # precondition: DuckDB really does render the HUGEINT sum as float
    assert _family(odf["seq_id"].dtype) == "float", odf.dtypes
    spark_side = pd.DataFrame({"doc_id": [1, 2, 3], "seq_id": [0, 0, 1]})
    problems = compare("hugeint", spark_side, odf)
    assert problems and "dtype mismatch" in problems[0]
    # and the BIGINT-cast oracle (the shipped fix) goes green
    fixed = con.execute(
        """
        WITH t(doc_id, n) AS (VALUES (1, CAST(300 AS BIGINT)),
                                     (2, CAST(300 AS BIGINT)),
                                     (3, CAST(300 AS BIGINT)))
        SELECT doc_id,
               CAST(coalesce(SUM(n) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 CAST(0 AS BIGINT)) // 512 AS BIGINT) AS seq_id
        FROM t
        """
    ).fetchdf()
    assert compare("hugeint_fixed", spark_side, fixed) == []


def test_empty_frames_still_flag_dtype_drift():
    """A zero-row result with schema drift must fail the local sweep —
    the driver's schema check is row-count-independent (ADVICE r6)."""
    a = pd.DataFrame({"x": pd.Series([], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([], dtype="float64")})
    problems = compare("empty_drift", a, b)
    assert problems and "dtype mismatch" in problems[0]
    # matching empty frames stay green
    c = pd.DataFrame({"x": pd.Series([], dtype="int64")})
    assert compare("empty_same", a, c) == []


def test_matching_float_sides_keep_tolerance():
    a = pd.DataFrame({"x": [1.0, 2.0]})
    b = pd.DataFrame({"x": [1.0 + 1e-12, 2.0]})
    assert compare("tol", a, b) == []


def test_bool_vs_int_mismatch_fails():
    a = pd.DataFrame({"kept": [True, False]})
    b = pd.DataFrame({"kept": [1, 0]})
    problems = compare("bool", a, b)
    assert problems and "dtype mismatch" in problems[0]


def test_families():
    assert _family("int64") == "int"
    assert _family("Int64") == "int"
    assert _family("uint32") == "int"
    assert _family("float64") == "float"
    assert _family("bool") == "bool"
    assert _family("datetime64[us]") == "datetime"
    assert _family("datetime64[ns]") == "datetime"
    assert _family("object") == "object"
