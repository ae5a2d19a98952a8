"""Lexical search: BM25 top-k document retrieval.

The retrieval dual of llm/similarity.py's embedding ANN: score documents
against a keyword query with Okapi BM25 (Robertson/Spärck Jones) and
return the top k. In a curation pipeline this is targeted corpus
inspection ("show me the docs about X"), decontamination triage, and
the lexical half of hybrid (BM25 + dense) retrieval.

100 TB shape: the query's terms are a tiny literal set, so the corpus
word stream is FILTERED to query-term postings before anything
aggregates — the classic inverted-index probe expressed declaratively
(Catalyst pushes the isin() into the scan stage; non-matching words
never reach a shuffle). Document frequencies and corpus stats are
<= |terms| + 1 rows, broadcast back onto the postings; the final top-k
is an orderBy(limit k) → TakeOrderedAndProject (per-partition heaps,
never a global sort).

Determinism (the repo-wide oracle discipline): idf lns rounded to 6dp
FIRST; each per-(doc, term) score rounded to 6dp; per-doc totals
summed as exact DECIMAL(38, 6) so float addition order cannot matter;
one final double cast. avgdl is a single division in a one-row frame.

Reference parity: the reference has no search surface
(/root/reference/Configurable_ETL_Python.py); this is part of the
LLM-curation extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _words


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for `query` by Okapi BM25.

    score(d) = sum over distinct query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * |d| / avgdl))
    with idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)) (the
    Lucene-style always-positive form), tf the term count in d, |d| the
    doc's word count, avgdl the corpus mean. Ties break on smaller id.

    Matching is on the lowercased whitespace words every analysis op
    here uses; duplicate query terms count once (BM25 is defined over
    the term set). Output: (id_col, score, rank), rank 1..k.
    """
    if not (1 <= k):
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted(set(query.lower().split()))
    if not terms:
        raise ValueError("query must contain at least one term")
    lt = F.lower(F.trim(F.col(text_col)))
    lens = df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(lt, F.lit(r"\S+")).cast("long").alias("dl"),
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).select(
        "n_docs",
        (F.col("total_dl").cast("double") / F.col("n_docs")).alias(
            "avgdl"
        ),
    )
    postings = df.select(
        F.col(id_col).alias("id"),
        F.explode(_words(F.col(text_col))).alias("w"),
    ).where(F.col("w").isin(terms))
    tf = postings.groupBy("id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df_t")
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col("df_t") + 0.5)
            / (F.col("df_t") + 0.5)
        ),
        6,
    )
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    term_score = F.round(
        idf * F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom, 6
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(F.broadcast(stats))
        .join(lens, "id")
        .select("id", term_score.cast("decimal(38,6)").alias("s6"))
        .groupBy("id")
        .agg(F.sum("s6").alias("s_sum"))
        .select("id", F.col("s_sum").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col("id").asc())
    )
    return scored.select(
        F.col("id").alias(id_col),
        "score",
        rank.cast("long").alias("rank"),
    )
