"""Merges-table BPE token counting: Column path == Arrow path ==
priority-queue Python model, validator guards, config-op dispatch."""

import re

import pytest

from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.bpe import (
    BPE_FIXTURE_MERGES,
    MAX_COLUMN_MERGES,
    bpe_count_sql,
    count_piece,
    token_count_bpe,
    token_count_bpe_arrow,
    validate_merges,
)
from configurable_etl_python_repo_spark.llm.text import BPE_ISH_PATTERN
from configurable_etl_python_repo_spark.plans import Engine, OpSpec

#: adversarial cases: overlap chains (aaaa), merges whose output is a
#: substring of later text (thethe), suffix traps (erer: the 'r␟e␟'
#: suffix-match bug the wrapped encoding exists to prevent), unicode,
#: punctuation/number pieces, empties
ADVERSARIAL = [
    (1, "There is another character in the测试 20 there there"),
    (2, ""),
    (3, None),
    (4, "aaaa tttthhhh ananan anand thethe"),
    (5, "the quick brown fox, 1999-2020!! it is resting & ingesting"),
    (6, "thereresthere ererer ononeone"),
    (7, "a"),
    (8, "   \t  "),
]


def _model_counts(texts):
    ranks = {p: i for i, p in enumerate(validate_merges(BPE_FIXTURE_MERGES))}
    pre = re.compile(BPE_ISH_PATTERN)
    out = {}
    for i, t in texts:
        out[i] = (
            None
            if t is None
            else sum(count_piece(p, ranks) for p in pre.findall(t))
        )
    return out


def test_bpe_column_equals_arrow_equals_model(spark):
    df = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    col = {r["doc_id"]: r["n_tokens"] for r in token_count_bpe(df).collect()}
    arr = {
        r["doc_id"]: r["n_tokens"] for r in token_count_bpe_arrow(df).collect()
    }
    assert col == arr == _model_counts(ADVERSARIAL)
    assert col[3] is None  # NULL in, NULL out on every path
    assert col[2] == 0 and col[8] == 0


def test_bpe_paths_agree_on_corpus(spark, sf_dir):
    """Column == Arrow over the real documents fixture (the Zipfian memo
    path gets exercised), and counts are >= the proxy's piece count
    (every piece yields at least one symbol)."""
    from configurable_etl_python_repo_spark.llm.text import token_count_bpe_ish

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    col = token_count_bpe(docs).withColumnRenamed("n_tokens", "c")
    arr = token_count_bpe_arrow(docs).withColumnRenamed("n_tokens", "a")
    prox = token_count_bpe_ish(docs).withColumnRenamed("n_tokens", "p")
    j = (
        col.select("doc_id", "c")
        .join(arr.select("doc_id", "a"), "doc_id")
        .join(prox.select("doc_id", "p"), "doc_id")
    )
    bad = j.where((F.col("c") != F.col("a")) | (F.col("c") < F.col("p")))
    assert bad.count() == 0


def test_validate_merges_rejects_malformed():
    with pytest.raises(ValueError, match="not produced by an earlier"):
        validate_merges([("wh", "ich")])
    with pytest.raises(ValueError, match="duplicates an earlier"):
        validate_merges([("a", "b"), ("a", "b")])
    with pytest.raises(ValueError, match="reserved"):
        validate_merges([("a", "\x1f")])
    with pytest.raises(ValueError, match="empty"):
        validate_merges([("", "x")])
    # well-formed passes and returns a list of tuples
    assert validate_merges((("a", "b"), ("ab", "c"))) == [
        ("a", "b"), ("ab", "c"),
    ]


def test_column_path_guard_and_sql_mirror():
    # a long well-formed chain a+b, ab+c, abc+d, ... to trip the guard
    chain = [("a", "b")]
    sym = "ab"
    for i in range(MAX_COLUMN_MERGES + 1):
        nxt = chr(97 + (i + 2) % 26)
        chain.append((sym, nxt))
        sym += nxt
    with pytest.raises(ValueError, match="MAX_COLUMN_MERGES"):
        token_count_bpe(None, merges=chain)
    # the SQL mirror embeds the control chars as chr() calls, never raw
    sql = bpe_count_sql("text")
    assert "chr(29)" in sql and "chr(31)" in sql and "chr(30)" in sql
    assert "\x1d" not in sql and "\x1f" not in sql


def test_bpe_as_config_ops(spark):
    eng = Engine(spark)
    df = spark.createDataFrame(
        [(1, "the theatre is there")], ["doc_id", "text"]
    )
    eng.bind("docs", df)
    out = eng.run_op(OpSpec("TOKEN COUNT BPE", "t", ["docs"], {}))
    (row,) = out.collect()
    arrow = eng.run_op(OpSpec(
        "TOKEN COUNT BPE ARROW", "ta", ["docs"],
        {"merges": [["t", "h"], ["th", "e"]]},
    ))
    (arow,) = arrow.collect()
    # with only t+h,th+e: 'the'->1, 'theatre'->the,a,t,r,e=5, 'is'->2,
    # 'there'->the,r,e=3
    assert arow["n_tokens"] == 11
    assert row["n_tokens"] <= arow["n_tokens"]  # fixture has more merges
