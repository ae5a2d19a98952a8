"""Deterministic (content-hash) sampling for reproducible curation."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.sampling import (
    hash_sample,
    stratified_sample,
)


def test_hash_sample_partitioning_invariant(spark, sf_dir):
    """The keep/drop decision is a pure function of (key, seed): any
    repartitioning returns the identical sample — the property df.sample
    lacks and the one that makes a 100 TB curation run reproducible."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = {r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    shuffled = {
        r.doc_id
        for r in hash_sample(docs.repartition(7, "text"), 0.3)
        .select("doc_id").collect()
    }
    assert base == shuffled and 0 < len(base) < docs.count()


def test_hash_sample_fraction_and_nesting(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    k = hash_sample(docs, 0.5).count()
    assert abs(k / n - 0.5) < 0.15  # md5 is uniform enough at fixture size
    # a smaller fraction with the same seed is a SUBSET (nested samples)
    small = {r.doc_id for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(docs, 0.6).select("doc_id").collect()}
    assert small <= big
    # different seed → different (but same-law) sample
    other = {r.doc_id
             for r in hash_sample(docs, 0.6, seed="v2").select("doc_id").collect()}
    assert other != big


def test_stratified_sample_per_stratum(spark):
    rows = [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(400)]
    df = spark.createDataFrame(rows)
    out = stratified_sample(df, "lang", {"de": 1.0, "en": 0.0},
                            default_fraction=0.5)
    got = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in got}
    assert by_lang.get("de") == 200  # fraction 1.0 keeps everything
    assert "en" not in by_lang       # fraction 0.0 drops everything


def test_sampling_plan_is_scan_filter(spark, sf_dir):
    """Zero shuffles: sampling must stay inside the scan stage."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (stratified_sample(docs, "lang", {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sampling_engine_ops(spark):
    from configurable_etl_python_repo_spark.plans import Engine
    from configurable_etl_python_repo_spark.plans.spec import OpSpec

    df = spark.createDataFrame([Row(doc_id=i, lang="en") for i in range(50)])
    eng = Engine(spark)
    eng.bind("d", df)
    eng.run_op(OpSpec(op="SAMPLE HASH", target="s", inputs=["d"],
                      args={"fraction": 0.5, "key_column": "doc_id"}))
    n = eng.resolve("s").count()
    assert 0 < n < 50
    eng.run_op(OpSpec(op="SAMPLE STRATIFIED", target="t", inputs=["d"],
                      args={"strata_column": "lang",
                            "fractions": {"en": 1.0}}))
    assert eng.resolve("t").count() == 50
