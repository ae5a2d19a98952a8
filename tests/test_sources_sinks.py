"""Bronze store round-trip + boundary adapters + events reader."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.sinks.boundary import (
    to_boundary_strings,
    to_standardized_form,
)
from configurable_etl_python_repo_spark.sources.bronze import (
    read_bronze,
    write_bronze,
)
from configurable_etl_python_repo_spark.sources.files import read_events


def test_bronze_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    src = spark.createDataFrame(
        [
            Row(subject="S1", val="10"),
            Row(subject="S2", val="20"),
        ]
    )
    path = str(tmp_path / "bronze")
    write_bronze(src, path, study_code="ST1", view="DS", key_columns=["subject"])
    write_bronze(src.withColumn("val", F.lit("99")), path,
                 study_code="ST1", view="EX", key_columns=["subject"])

    back = read_bronze(spark, path, study_code="ST1", view="DS")
    assert {(r.subject, r.val) for r in back.collect()} == {("S1", "10"), ("S2", "20")}
    # fully-keyed read prunes by addressing the partition directory itself —
    # the scan location must be the (study_code, view) subdir, and the EX
    # view's columns must not leak into DS's schema
    files = back.inputFiles()
    assert files and all("study_code=ST1/view=DS" in f for f in files)
    assert "val" in back.columns

    # partial-key read: partition filter pruning + merged schema
    part = read_bronze(spark, path, study_code="ST1")
    plan2 = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(study_code" in plan2
    assert part.count() == 4


def test_bronze_nest_is_key_sorted(spark, tmp_path):
    src = spark.createDataFrame(
        [Row(subject="B", val="2"), Row(subject="A", val="1"), Row(subject="C", val="3")]
    )
    path = str(tmp_path / "bronze2")
    write_bronze(src, path, study_code="S", view="V", key_columns=["subject"])
    nested = spark.read.parquet(path)
    data = nested.collect()[0].data
    assert [d.subject for d in data] == ["A", "B", "C"]


def test_boundary_sentinel(spark):
    df = spark.createDataFrame([Row(a=1, b=None), Row(a=None, b="x")],
                               "a int, b string")
    out = to_boundary_strings(df)
    assert dict(out.dtypes) == {"a": "string", "b": "string"}
    rows = {tuple(r) for r in out.collect()}
    assert rows == {("1", "Null"), ("Null", "x")}


def test_standardized_form(spark):
    df = spark.createDataFrame(
        [Row(country="DE", site="1204", subject="E01", m1="v1", m2=None)],
        "country string, site string, subject string, m1 string, m2 string",
    )
    gold = to_standardized_form(df, "ST1", ["m1", "m2"])
    r = gold.collect()[0]
    assert r.subject_hierarchy == "DE#1204#E01"
    assert r.study_code == "ST1"
    assert r.Retention.m1 == "v1" and r.Retention.m2 == "Null"


def test_read_events_nanos(spark, sf_dir):
    ev = read_events(spark, f"{sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    assert ev.count() == 1000
    # microsecond truncation of the nano value, not float rounding
    first = ev.orderBy("event_id").first()
    assert first.ts.year >= 2024
