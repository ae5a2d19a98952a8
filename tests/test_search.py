"""BM25 top-k: hand-computed scores, ranking properties, plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.search import bm25_topk


def _bm25_ref(docs, query, k1=1.2, b=0.75):
    """Pure-Python replica with the operator's exact rounding rules."""
    words = {i: t.lower().split() for i, t in docs.items()}
    terms = sorted(set(query.lower().split()))
    n = len(docs)
    avgdl = sum(len(w) for w in words.values()) / n
    dfreq = {
        t: sum(1 for w in words.values() if t in w) for t in terms
    }
    out = {}
    for i, w in words.items():
        s = 0
        for t in terms:
            tf = w.count(t)
            if not tf or not dfreq[t]:
                continue
            idf = round(math.log(1.0 + (n - dfreq[t] + 0.5)
                                 / (dfreq[t] + 0.5)), 6)
            den = tf + k1 * (1.0 - b + b * len(w) / avgdl)
            s += round(idf * tf * (k1 + 1.0) / den, 6) * 1_000_000
        if s:
            out[i] = round(s) / 1_000_000
    return out


def test_bm25_hand_computed_scores_and_ranking(spark):
    docs = {
        1: "hash join hash join hash",      # tf-heavy, short
        2: "hash join is one of many join strategies used here today",
        3: "sort merge join",
        4: "nothing relevant at all",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.score, r.rank)
           for r in bm25_topk(df, "hash join", k=10).collect()}
    want = _bm25_ref(docs, "hash join")
    assert set(got) == set(want)           # doc 4 never scores
    for i, s in want.items():
        assert got[i][0] == pytest.approx(s, abs=2e-6), i
    # ranking: doc 1 (dense + short) > doc 2 > doc 3 (one term)
    assert [i for i, _ in sorted(
        got.items(), key=lambda kv: kv[1][1])] == [1, 2, 3]
    # k truncates, ranks stay 1..k
    top1 = bm25_topk(df, "hash join", k=1).collect()
    assert [(r.doc_id, r.rank) for r in top1] == [(1, 1)]
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(df, "hash", k=0)
    with pytest.raises(ValueError, match="query"):
        bm25_topk(df, "   ")


def test_bm25_duplicate_query_terms_count_once(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha")], ["doc_id", "text"]
    )
    once = bm25_topk(df, "alpha", k=5).collect()
    twice = bm25_topk(df, "alpha alpha ALPHA", k=5).collect()
    assert [(r.doc_id, r.score) for r in once] == [
        (r.doc_id, r.score) for r in twice
    ]


def test_bm25_plan_filters_before_shuffle(spark):
    """The inverted-index probe: the query-term isin() filter must sit
    below the first exchange, so non-matching words never shuffle."""
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    plan = bm25_topk(
        df, "needle", k=3
    )._jdf.queryExecution().executedPlan().toString()
    filter_pos = plan.find("needle")
    first_ex = plan.find("Exchange")
    assert filter_pos != -1 and first_ex != -1
    # deepest operators print LAST in the tree dump: the filter line
    # must appear below (after) the exchange it feeds
    assert filter_pos > first_ex
    # the tiny dfreq/stats sides broadcast, never shuffle-join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bm25_config_op(spark):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("docs", spark.createDataFrame(
        [(1, "find this phrase"), (2, "other text")],
        ["doc_id", "text"]))
    out = eng.run_op(OpSpec(
        "BM25 TOPK", "s", ["docs"], {"query": "phrase", "k": 1}))
    assert [r.doc_id for r in out.collect()] == [1]


# ---------------------------------------------------------------------------
# Persisted BM25 index
# ---------------------------------------------------------------------------

from configurable_etl_python_repo_spark.llm.search import (  # noqa: E402
    bm25_build_index,
    bm25_search_index,
)


def test_bm25_index_parity_with_one_shot(spark, sf_dir, tmp_path):
    """bm25_search_index == bm25_topk bit-for-bit on the same corpus
    (shared scoring tail + identical tf/df/stats), across several
    queries from ONE build — the repeated-retrieval shape."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    idx = str(tmp_path / "bm25")
    bm25_build_index(docs, idx)
    for query in ("slow hash join merge", "the", "xqzzy the"):
        want = [tuple(r) for r in bm25_topk(docs, query, k=7).collect()]
        got = [tuple(r) for r in
               bm25_search_index(spark, idx, query, k=7).collect()]
        assert got == want and got, query


def test_bm25_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The query's term buckets must reach BOTH stores' file listings
    as partition filters — un-probed vocabulary costs zero I/O, and no
    corpus-sized relation appears anywhere in the probe plan."""
    import re

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    idx = str(tmp_path / "bm25")
    bm25_build_index(docs, idx, term_buckets=16)
    import glob
    assert len(glob.glob(f"{idx}/postings/seg=*/tb=*")) > 1
    out = bm25_search_index(spark, idx, "needle", k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # postings AND df scans carry the tb partition filter. Committed-
    # segment selection is NOT a plan filter any more: read_committed
    # lists only the committed seg= dirs (basePath read, _store.py), so
    # orphans never reach the listing at all — behavioral pin in
    # tests/test_store.py::test_orphan_segment_invisible_to_reads.
    prunes = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert sum("tb" in p for p in prunes) >= 2, plan
    # the probe never scans the corpus text
    assert "documents.parquet" not in plan


def test_bm25_one_shot_has_no_corpus_length_join(spark):
    """dl rides the posting rows; the scored path must not join a
    corpus-sized doc-length relation. Corpus subtrees in the plan:
    stats aggregate + the filtered postings twice (tf and its dfreq
    consumer each embed the subtree) = exactly three — the removed
    lens equi-join was a FOURTH, shuffling every doc's length to serve
    a handful of matched docs."""
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    plan = bm25_topk(
        df, "needle", k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 3
    # and no shuffle join anywhere — every join side is broadcast
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bm25_index_config_ops(spark, tmp_path):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    idx = str(tmp_path / "bm25")
    eng = Engine(spark)
    eng.bind("docs", spark.createDataFrame(
        [(1, "find this phrase"), (2, "other text")],
        ["doc_id", "text"]))
    passthru = eng.run_op(OpSpec(
        "BM25 BUILD INDEX", "built", ["docs"],
        {"path": idx, "id_column": "doc_id", "text_column": "text"}))
    assert passthru.columns == ["doc_id", "text"]
    out = eng.run_op(OpSpec(
        "BM25 SEARCH INDEX", "hits", [],
        {"path": idx, "query": "phrase", "k": 1}))
    assert [r.doc_id for r in out.collect()] == [1]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="term_buckets"):
        bm25_build_index(eng.peek("docs")[0], str(tmp_path / "bad"),
                         term_buckets=0)


def test_bm25_empty_index_raises(spark, tmp_path):
    """An index built over an EMPTY corpus has n_docs = 0; avgdl would
    be NULL and every score NULL — the search must refuse loudly
    (round-8 ADVICE), mirroring the read_meta layout-guard style."""
    import pytest as _pytest

    idx = str(tmp_path / "bm25_empty")
    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(ValueError, match="corpus is empty"):
        bm25_build_index(empty, idx)
    # defense-in-depth: a tree whose _stats sums to 0 anyway (manual
    # surgery / foreign writer) is refused at search time too
    from configurable_etl_python_repo_spark.llm._store import read_manifest

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    bm25_build_index(docs, idx)
    seg = read_manifest(idx)[1]["segments"][0]
    spark.createDataFrame(
        [(0, 0)], "n_docs long, total_dl long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{idx}/_stats/seg={seg}"
    )
    with _pytest.raises(ValueError, match="0 documents"):
        bm25_search_index(spark, idx, "anything", k=3)


# ---------------------------------------------------------------------------
# Reciprocal rank fusion
# ---------------------------------------------------------------------------

from configurable_etl_python_repo_spark.llm.search import rrf_fuse  # noqa: E402


def test_rrf_fuse_hand_computed(spark):
    """RRF (k0=60): score = sum over lists of round(1/(60+rank), 6);
    docs missing from a list contribute nothing; ties break to the
    smaller id; k truncates."""
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (4, 3)], ["doc_id", "rank"])
    out = {r.doc_id: r for r in rrf_fuse([a, b], k=10).collect()}
    r = lambda x: round(1.0 / (60.0 + x), 6)  # noqa: E731
    assert out[1].rrf_score == pytest.approx(r(1) + r(2), abs=1e-12)
    assert out[3].rrf_score == pytest.approx(r(3) + r(1), abs=1e-12)
    assert out[2].rrf_score == pytest.approx(r(2), abs=1e-12)
    assert out[4].rrf_score == pytest.approx(r(3), abs=1e-12)
    # ordering: r(1)+r(2) > r(1)+r(3) > r(2) > r(3)
    assert out[1].rrf_score > out[3].rrf_score
    assert [d for d in sorted(out, key=lambda d: out[d].rank)] == [1, 3, 2, 4]
    # k truncation
    assert {r_.doc_id for r_ in rrf_fuse([a, b], k=2).collect()} == {1, 3}
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse([a], k0=0)


def test_rrf_fuse_config_op_and_single_list(spark):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("lex", spark.createDataFrame(
        [(1, 1), (2, 2)], ["doc_id", "rank"]))
    eng.bind("dense", spark.createDataFrame(
        [(2, 1), (1, 2)], ["doc_id", "rank"]))
    out = eng.run_op(OpSpec("RRF FUSE", "f", ["lex", "dense"], {"k": 5}))
    rows = {r.doc_id: r.rank for r in out.collect()}
    assert rows == {1: 1, 2: 2}  # equal sums -> smaller id wins
    # single-list fusion is a rank-preserving projection
    solo = eng.run_op(OpSpec("RRF FUSE", "s", ["lex"], {"k": 5}))
    assert [r.doc_id for r in solo.collect()] == [1, 2]


def test_bm25_extend_matches_full_rebuild(spark, sf_dir, tmp_path):
    """index(A) + extend(B) answers every query identically to
    index(A ∪ B): postings append, per-segment df rows and stats rows
    SUM at read time — the append-only segment design."""
    from configurable_etl_python_repo_spark.llm.search import (
        bm25_extend_index,
    )

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    part_a = docs.where(F.col("doc_id") % 3 != 2)
    part_b = docs.where(F.col("doc_id") % 3 == 2)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    bm25_build_index(part_a, inc, term_buckets=16)
    bm25_extend_index(part_b, inc)
    bm25_build_index(docs, full, term_buckets=16)
    for query in ("slow hash join merge", "the"):
        got = [tuple(r) for r in
               bm25_search_index(spark, inc, query, k=7).collect()]
        want = [tuple(r) for r in
                bm25_search_index(spark, full, query, k=7).collect()]
        assert got == want and got, query
    # and the extended index still equals the one-shot on the union
    want1 = [tuple(r) for r in bm25_topk(docs, "the", k=7).collect()]
    got1 = [tuple(r) for r in
            bm25_search_index(spark, inc, "the", k=7).collect()]
    assert got1 == want1


def test_bm25_layout_guard_and_extend_config_op(spark, tmp_path):
    """A pre-segment tree (no layout stamp) is refused by search AND
    extend; the extend config op appends under the stored layout."""
    import pytest
    from configurable_etl_python_repo_spark.llm.search import (
        bm25_extend_index,
    )
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    docs = spark.createDataFrame(
        [(1, "find this phrase"), (2, "other text")],
        ["doc_id", "text"])
    idx = str(tmp_path / "bm25")
    bm25_build_index(docs, idx)
    original_meta = spark.read.parquet(idx + "/_meta")
    original_rows = original_meta.collect()
    # forge an old-layout _meta (term_buckets only)
    spark.createDataFrame([(64,)], "term_buckets int").coalesce(
        1
    ).write.mode("overwrite").parquet(idx + "/_meta")
    with pytest.raises(ValueError, match="layout"):
        bm25_search_index(spark, idx, "phrase").collect()
    with pytest.raises(ValueError, match="layout"):
        bm25_extend_index(docs, idx)
    # a TORN tree (right layout, wrong meta generation vs the committed
    # manifest — a rebuild that crashed between _meta and its commit)
    # is refused too
    spark.createDataFrame(
        [(64, "bm25-seg-v3", "not-the-committed-generation")],
        "term_buckets int, layout string, meta_id string",
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/_meta")
    with pytest.raises(ValueError, match="torn"):
        bm25_search_index(spark, idx, "phrase").collect()
    # restore and extend through the config op
    spark.createDataFrame(
        original_rows, original_meta.schema
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/_meta")
    eng = Engine(spark)
    eng.bind("more", spark.createDataFrame(
        [(3, "phrase again")], ["doc_id", "text"]))
    out = eng.run_op(OpSpec(
        "BM25 EXTEND INDEX", "ext", ["more"], {"path": idx}))
    assert out.columns == ["doc_id", "text"]
    hits = bm25_search_index(spark, idx, "phrase", k=3).collect()
    assert {r.doc_id for r in hits} == {1, 3}
