"""Expression-compiler unit tests: literals, grammar, datetime patterns."""

import datetime as dt

import pytest

from configurable_etl_python_repo_spark.functions.expr import (
    compile_filter,
    compile_literal,
    strftime_to_java,
)


def test_literals():
    assert compile_literal("DATE(2021-03-07)") == dt.date(2021, 3, 7)
    assert compile_literal("NUMBER(2)") == 2
    assert compile_literal("NUMBER(2.5)") == 2.5
    assert compile_literal("BOOLEAN(True)") is True
    assert compile_literal("BOOLEAN(FALSE)") is False
    assert compile_literal("C28554") == "C28554"
    assert compile_literal("1-URGENT") == "1-URGENT"


def test_bad_boolean():
    with pytest.raises(ValueError):
        compile_literal("BOOLEAN(maybe)")


def test_strftime_translation():
    assert strftime_to_java("%d-%m-%Y %H:%M") == "dd-MM-yyyy HH:mm"
    assert strftime_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    with pytest.raises(ValueError):
        strftime_to_java("%Q")


def test_filter_compiles(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # reference two-term forms
    assert li.filter(compile_filter("l_returnflag = A & l_linestatus = F")).count() > 0
    assert li.filter(compile_filter("l_quantity >= NUMBER(49) | l_quantity <= NUMBER(2)")).count() > 0
    # BETWEEN inclusive both ends
    n = li.filter(compile_filter("l_quantity BETWEEN(NUMBER(10), NUMBER(20))")).count()
    m = li.filter((li.l_quantity >= 10) & (li.l_quantity <= 20)).count()
    assert n == m
    # NOT NULL predicate
    assert li.filter(compile_filter("l_comment = NOT NULL")).count() if "l_comment" in li.columns else True
    assert li.filter(compile_filter("l_shipdate = NOT NULL")).count() == li.count()
    # superset comparators
    assert li.filter(compile_filter("l_quantity > NUMBER(49.5)")).count() < li.count()
    assert li.filter(compile_filter("l_returnflag != A")).count() > 0
    assert li.filter(compile_filter("l_returnflag IN (A, R)")).count() > 0


def test_filter_precedence(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = li.filter(
        compile_filter("l_quantity <= NUMBER(5) & l_returnflag = A | l_quantity >= NUMBER(45) & l_returnflag = R")
    ).count()
    want = li.filter(
        ((li.l_quantity <= 5) & (li.l_returnflag == "A"))
        | ((li.l_quantity >= 45) & (li.l_returnflag == "R"))
    ).count()
    assert got == want
