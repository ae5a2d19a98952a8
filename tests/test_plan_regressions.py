"""Physical-plan regression guards.

The scale story lives in the PLAN, not just the answer: a filter that
stops reaching the parquet scan, a broadcast that silently becomes a
sort-merge join, or a window top-N that loses its WindowGroupLimit
pushdown all keep the oracle green while multiplying cost at 100 TB.
These tests pin the load-bearing plan properties of the headline queries
so a regression shows up in CI before it shows up in bench numbers.
"""

import re

import pytest

from configurable_etl_python_repo_spark.catalog import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_tpch_q3_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3_shaped")
    # filters reach all three parquet scans
    assert len(re.findall(r"PushedFilters: \[[^\]]", plan)) >= 3
    # both dimension joins broadcast; no sort-merge join anywhere
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # fused top-10 compiles to a heap, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_flagship_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_earliest_event")
    # keep-first dedup under sort compiles to WindowGroupLimit pushdown
    assert "WindowGroupLimit" in plan
    # scan filters pushed
    assert len(re.findall(r"PushedFilters: \[[^\]]", plan)) >= 2
    # no global Sort above the window (the pending sort must stay fused)
    assert "Exchange rangepartitioning" not in plan


def test_w2_window_topn_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "w2_sort_slice_topn")
    assert "WindowGroupLimit" in plan
    assert "Exchange rangepartitioning" not in plan


def test_spine_study_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j3_spine_study")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_projection_prunes_scan(spark, sf_dir):
    """p2: a two-column projection must reach the parquet ReadSchema."""
    plan = _plan(spark, sf_dir, "p2_p4_project_remove")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(read_cols) <= 4  # pruned, not the 16-column lineitem schema


def test_no_python_udfs_on_reference_surface(spark, sf_dir):
    """Every reference-surface operator stays inside JVM codegen — the
    only Python evaluation in the catalog belongs to the two deliberate
    Arrow paths (multimodal decode, SRP hash)."""
    for name in ["flagship_earliest_event", "tpch_q3_shaped",
                 "a1_groupby_summarise", "w2_sort_slice_topn",
                 "j1_left_join_two_keys", "e2_sessionize_gap30m",
                 "c8_decision_column", "d2_ngram_jaccard_pairs",
                 "t1_text_stats"]:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name  # row-at-a-time Python
        assert "ArrowEvalPython" not in plan, name


def test_arrow_only_where_declared(spark, sf_dir):
    """The two declared Python boundaries are Arrow-batched, never
    row-at-a-time."""
    for name in ["d6_embedding_cosine_srp", "m1_multimodal_features"]:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name


def test_text_ops_free_of_interpreted_lambda_hofs(spark, sf_dir):
    """text_stats/quality_filter (t1) and both STATELESS language-ID
    formulations compile to pure regexp/length expressions — no
    higher-order array functions, whose lambda bodies run interpreted
    (measured: the trigram-array + 7-lambda-filter shape cost 82s at
    sf0.1 vs 1.3s for the lookahead-regexp rewrite; filter/aggregate in
    t1 cost 0.42s vs 0.30s). A lambdafunction reappearing in these plans
    is the regression."""
    from configurable_etl_python_repo_spark.llm.text import (
        _language_id_ngram_stateless,
        _language_id_stateless,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plans = [
        _plan(spark, sf_dir, "t1_text_stats"),
        _language_id_stateless(docs, "text")
        ._jdf.queryExecution().executedPlan().toString(),
        _language_id_ngram_stateless(docs, "text")
        ._jdf.queryExecution().executedPlan().toString(),
    ]
    for plan in plans:
        assert "lambdafunction" not in plan.lower()


def test_pii_scrub_pure_regexp_scan_stage(spark, sf_dir):
    """t6 is regexp_count/regexp_replace only: no Python, no interpreted
    lambdas, no exchange of any kind — a pure scan-stage map."""
    plan = _plan(spark, sf_dir, "t6_pii_scrub")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "lambdafunction" not in plan.lower()
    assert "Exchange" not in plan


def test_domain_mixture_is_pure_scan_filter(spark, sf_dir):
    """x13's cutoffs are computed driver-side from the one bounded
    counting pass and folded into a literal CASE: the OUTPUT plan has no
    join and no exchange of any kind — a pure scan-stage filter whose
    input lineage appears exactly once (the cutoff-join formulation
    embedded the upstream subtree three extra times)."""
    plan = _plan(spark, sf_dir, "x13_domain_mixture")
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1


def test_span_dedup_keep_first_is_partial_aggregate(spark, sf_dir):
    """d8's corpus-wide keep-first must compile to min(struct) with a
    map-side partial (HashAggregate partial_min): a hot boilerplate span
    then ships one candidate per map partition. A row_number window over
    the span fingerprint reappearing here is the skew regression — every
    copy of the hot span would land on one reducer and sort."""
    plan = _plan(spark, sf_dir, "d8_span_dedup")
    assert "partial_min" in plan


def test_url_blocklist_pure_scan_stage(spark, sf_dir):
    """t11 is one codegen regexp + array_intersect against a literal: no
    Python, no interpreted lambdas, no exchange — scan-stage like t6."""
    plan = _plan(spark, sf_dir, "t11_url_blocklist")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "lambdafunction" not in plan.lower()
    assert "Exchange" not in plan


def test_substring_dedup_keep_first_is_partial_aggregate(spark, sf_dir):
    """d10's canonical-occurrence aggregate is min(struct) with map-side
    partial combine (the d8 skew shape); the dup flag comes from an
    equi-JOIN on the gram, never a window over the gram key (which would
    sort every copy of a hot boilerplate gram on one reducer)."""
    plan = _plan(spark, sf_dir, "d10_substring_dedup")
    assert "partial_min" in plan


def test_surprisal_total_is_broadcast_scalar(spark, sf_dir):
    """t10: the corpus word total rides a broadcast (the c6 scalar
    crossJoin shape) and the LM counts aggregate partially map-side; no
    Python evaluation anywhere."""
    plan = _plan(spark, sf_dir, "t10_unigram_surprisal")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan
    assert "partial_count" in plan


def test_bpe_pack_is_pure_column_no_python(spark, sf_dir):
    """t9: the nested-replace BPE count plus the packing window stay
    entirely JVM-side — the Arrow path exists for big vocabs but must
    not be on this plan."""
    plan = _plan(spark, sf_dir, "t9_bpe_pack_sequences")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


@pytest.mark.parametrize("name", ["d1_dedup_exact", "t3_fingerprint"])
def test_single_pass_text_ops(spark, sf_dir, name):
    """Text ops are scan → project/aggregate: at most one exchange, no
    joins."""
    plan = _plan(spark, sf_dir, name)
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_semantic_dedup_pairwise_is_equi_join_not_cartesian(spark, sf_dir):
    """d11's within-cluster pairwise must stay an equi-join on the
    cluster id (AQE-splittable): a CartesianProduct or
    BroadcastNestedLoopJoin appearing here is the all-pairs regression
    SemDeDup exists to avoid."""
    plan = _plan(spark, sf_dir, "d11_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gopher_line_rules_pure_scan_stage(spark, sf_dir):
    """t19 is regexp/length math only: no shuffle may appear (an
    Exchange here means some rule silently became an aggregation)."""
    plan = _plan(spark, sf_dir, "t19_gopher_line_rules")
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_dsir_selection_plan(spark, sf_dir):
    """x18's top-k must stay a TakeOrderedAndProject heap (a global Sort
    instead re-sorts the whole corpus), and the only nested-loop join
    allowed is the 1-row broadcast scalar cross joins (the ATTACH SUMEQ
    shape) — never a CartesianProduct."""
    plan = _plan(spark, sf_dir, "x18_dsir_selection")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_perplexity_partition_single_sort_per_stratum(spark, sf_dir):
    """t18's ntile runs on ONE hashpartitioning-by-lang exchange + sort;
    a rangepartitioning exchange would mean a global sort snuck in."""
    plan = _plan(spark, sf_dir, "t18_perplexity_partition")
    assert "ntile" in plan.lower()
    assert "Exchange rangepartitioning" not in plan
