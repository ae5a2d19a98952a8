"""Catalog-vs-DuckDB oracle spot checks at sf0.001 (the full sweep at
sf0.01 is scripts/check_oracle.py / the driver's t2 gate; this keeps a fast
regression inside pytest)."""

import duckdb
import pytest

from configurable_etl_python_repo_spark.catalog import ORACLES, QUERIES

SPOT = [
    "flagship_earliest_event",
    "p5_filter_grammar",
    "a1_groupby_summarise",
    "w2_sort_slice_topn",
    "w3_last_per_group",
    "u1_bind_rows",
    "d2_ngram_jaccard_pairs",
    "n1_ann_cosine_topk",
    "e2_sessionize_gap30m",
    # round-4 curation ops
    "t6_pii_scrub",
    "t7_repetition_stats",
    "d8_span_dedup",
    "d9_decontaminate",
    "x13_domain_mixture",
    "x14_pretraining_pipeline",
    "t8_pack_sequences",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SPOT)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from check_oracle import compare

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = oracle_con.execute(ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_driver_window_is_curated():
    """The correctness driver checks the FIRST 50 queries in dict order;
    the curated priority list must be exactly that prefix so every
    operator family keeps a driver row as new queries register."""
    from configurable_etl_python_repo_spark.catalog import DRIVER_PRIORITY

    assert len(DRIVER_PRIORITY) == 50
    assert list(QUERIES)[:50] == DRIVER_PRIORITY


def test_every_query_has_oracle_or_reason():
    # every catalog query carries a SQL oracle — the md5-derived hash
    # families (minhash, simhash, SRP planes) are all generated into SQL.
    # Exemptions are by-design non-SQL-reproducible (documented on the
    # query) and each carries a pytest correctness bound instead.
    ROWS_ONLY_BY_DESIGN = {
        # KMeans init depends on data partitioning; recall-bounded in
        # test_llm_ops.test_ivf_kmeans_recall
        "n4_ann_ivf_kmeans",
    }
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY_BY_DESIGN
    assert missing == set()
