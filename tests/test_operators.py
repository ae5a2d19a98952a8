"""Operator semantics edge cases (SURVEY §5.2 item 3)."""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.plans import (
    AnalytePlan,
    Engine,
    OpSpec,
    ScanSpec,
    StudyPlan,
)


def test_least_greatest_null_skipping(spark):
    """pandas skipna semantics: NULL only when ALL inputs NULL (C4)."""
    df = spark.createDataFrame(
        [Row(a=1.0, b=2.0), Row(a=None, b=3.0), Row(a=None, b=None)]
    )
    eng = Engine(spark)
    eng.bind("t", df)
    eng.run_op(OpSpec("AGGREGATE COLUMN", "t", ["t"],
                      {"new_column": "lo", "op": "min", "columns": ["a", "b"]}))
    got = [r.lo for r in eng.resolve("t").collect()]
    assert got == [1.0, 3.0, None]


def test_union_missing_columns_null_filled(spark):
    eng = Engine(spark)
    eng.bind("x", spark.createDataFrame([Row(a=1, b="p")]))
    eng.bind("y", spark.createDataFrame([Row(a=2, c=9.5)]))
    out = eng.run_op(OpSpec("BIND ROWS", "u", ["x", "y"], {}))
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "p", None), (2, None, 9.5)}


def test_decision_unmatched_is_null(spark):
    eng = Engine(spark)
    eng.lookup_tables = {"m": [{"key": "A", "output": 10}]}
    eng.bind("t", spark.createDataFrame([Row(k="A"), Row(k="Z"), Row(k=None)]))
    out = eng.run_op(OpSpec("DECISION COLUMN", "o", ["t"],
                            {"lookup_column": "k", "new_column": "v", "table": "m"}))
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {("A", 10), ("Z", None), (None, None)}


def test_sumeq_on_empty_frame(spark):
    eng = Engine(spark)
    df = spark.createDataFrame([], "a int, b int")
    eng.bind("t", df)
    out = eng.run_op(OpSpec("ATTACH COLUMN", "o", ["t"],
                            {"operation": "SUMEQ", "new_column": "eq",
                             "columns": ["a", "b"]}))
    assert out.count() == 0  # no rows to broadcast onto — stays empty


def test_slice_deterministic_across_partitions(spark, sf_dir):
    def run(parts):
        eng = Engine(spark, )
        plan = AnalytePlan(
            name="out",
            scans=[ScanSpec("li", "parquet", f"{sf_dir}/lineitem.parquet")],
            ops=[
                OpSpec("SORT DATASET", "li", ["li"],
                       {"columns": ["l_extendedprice", "l_linenumber", "l_partkey"],
                        "order": "DESC"}),
                OpSpec("GROUPBY SLICE", "out", ["li"],
                       {"group_by": ["l_orderkey"], "n": 1}),
            ],
        )
        df = eng.run_analyte(plan).repartition(parts)
        return sorted(
            (r.l_orderkey, r.l_linenumber, r.l_extendedprice) for r in df.collect()
        )

    assert run(1) == run(7)


def test_sort_as_final_op_materializes(spark, sf_dir):
    eng = Engine(spark)
    plan = AnalytePlan(
        name="s",
        scans=[ScanSpec("n", "parquet", f"{sf_dir}/nation.parquet")],
        ops=[OpSpec("SORT DATASET", "s", ["n"],
                    {"columns": ["n_name"], "order": "DESC"})],
    )
    got = [r.n_name for r in eng.run_analyte(plan).collect()]
    assert got == sorted(got, reverse=True)


def test_rename_propagates_pending_sort(spark, sf_dir):
    eng = Engine(spark)
    plan = AnalytePlan(
        name="out",
        scans=[ScanSpec("li", "parquet", f"{sf_dir}/lineitem.parquet")],
        ops=[
            OpSpec("SORT DATASET", "li", ["li"],
                   {"columns": ["l_quantity", "l_linenumber", "l_extendedprice"]}),
            OpSpec("RENAME COLUMN", "li", ["li"], {"renames": {"l_quantity": "qty"}}),
            OpSpec("GROUPBY SLICE", "out", ["li"], {"group_by": ["l_orderkey"], "n": 1}),
        ],
    )
    out = eng.run_analyte(plan)
    # slice fused on the RENAMED sort column: per order, min qty row survives
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mins = {r.l_orderkey: r.m for r in li.groupBy("l_orderkey").agg(F.min("l_quantity").alias("m")).collect()}
    for r in out.collect():
        assert r.qty == mins[r.l_orderkey]


def test_study_toposort_out_of_order():
    """Manifest order is NOT trusted — dependencies are derived (unlike the
    reference, which requires sheet order to be the topo order)."""
    dep = AnalytePlan(name="child",
                      scans=[ScanSpec("child", "analyte", "parent")])
    parent = AnalytePlan(name="parent", scans=[])
    study = StudyPlan(study_code="S", analytes=[dep, parent])
    assert [a.name for a in study.toposort()] == ["parent", "child"]


def test_study_cycle_detection():
    a = AnalytePlan(name="a", scans=[ScanSpec("a_in", "analyte", "b")])
    b = AnalytePlan(name="b", scans=[ScanSpec("b_in", "analyte", "a")])
    with pytest.raises(ValueError, match="cycle"):
        StudyPlan(study_code="S", analytes=[a, b]).toposort()


def test_qualified_join_keeps_both_keys(spark):
    eng = Engine(spark)
    eng.bind("l", spark.createDataFrame([Row(x=1), Row(x=2)]))
    eng.bind("r", spark.createDataFrame([Row(y=2, tag="hit")]))
    out = eng.run_op(OpSpec("QUALIFIED JOIN", "j", ["l", "r"],
                            {"condition": "l.x = r.y", "how": "left"}))
    assert set(out.columns) == {"x", "y", "tag"}
    got = {(r.x, r.y, r.tag) for r in out.collect()}
    assert got == {(1, None, None), (2, 2, "hit")}


def test_csv_scan_source(spark, tmp_path):
    p = tmp_path / "src.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    eng = Engine(spark)
    df = eng.run_scan(ScanSpec("t", "csv", str(p), columns=["a"]))
    assert df.columns == ["a"] and df.count() == 2


def test_table_scan_source(spark, sf_dir):
    """S3: Data Source = table resolves through the session catalog (the
    reference's from-DB scan, disabled there; live here)."""
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView(
        "s3_region_view"
    )
    eng = Engine(spark)
    df = eng.run_scan(ScanSpec("r", "table", "s3_region_view",
                               columns=["r_regionkey", "r_name"]))
    assert df.count() == 5 and df.columns == ["r_regionkey", "r_name"]


def test_unknown_scan_source_raises(spark):
    eng = Engine(spark)
    with pytest.raises(ValueError, match="unknown scan source"):
        eng.run_scan(ScanSpec("t", "carrier-pigeon", "/nope"))


def test_decision_duplicate_key_last_wins(spark):
    """A duplicate decision-table key keeps the LAST row's output and never
    multiplies input rows (the reference's per-row .loc overwrite)."""
    eng = Engine(spark)
    eng.lookup_tables = {"m": [{"key": "A", "output": 1}, {"key": "A", "output": 9}]}
    eng.bind("t", spark.createDataFrame([Row(k="A"), Row(k="B")]))
    out = eng.run_op(OpSpec("DECISION COLUMN", "o", ["t"],
                            {"lookup_column": "k", "new_column": "v", "table": "m"}))
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [("A", 9), ("B", None)]  # cardinality preserved, last wins


def test_decision_null_key_never_matches(spark):
    """NULL lookup values never match a NULL-keyed table row (reference ==
    never matches NaN) — plain equality, not eqNullSafe."""
    eng = Engine(spark)
    eng.lookup_tables = {"m": [{"key": None, "output": 5}, {"key": "A", "output": 1}]}
    eng.bind("t", spark.createDataFrame([Row(k=None), Row(k="A")]))
    out = eng.run_op(OpSpec("DECISION COLUMN", "o", ["t"],
                            {"lookup_column": "k", "new_column": "v", "table": "m"}))
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(None, None), ("A", 1)}


def test_sumeq_fractional_sums_exact(spark):
    """SUMEQ compares exact decimal sums: 0.5+0.5 == 1.0+0.0 (a long cast
    would truncate to 0 vs 1)."""
    eng = Engine(spark)
    eng.bind("t", spark.createDataFrame([Row(a=0.5, b=1.0), Row(a=0.5, b=0.0)]))
    out = eng.run_op(OpSpec("ATTACH COLUMN", "o", ["t"],
                            {"operation": "SUMEQ", "new_column": "eq",
                             "columns": ["a", "b"]}))
    assert [r.eq for r in out.collect()] == [True, True]


def test_sumeq_boolean_counts_as_01(spark):
    eng = Engine(spark)
    eng.bind("t", spark.createDataFrame(
        [Row(a=True, b=1), Row(a=False, b=0), Row(a=True, b=1)]))
    out = eng.run_op(OpSpec("ATTACH COLUMN", "o", ["t"],
                            {"operation": "SUMEQ", "new_column": "eq",
                             "columns": ["a", "b"]}))
    assert all(r.eq for r in out.collect())


def test_salted_join_rejects_outer_variants(spark):
    from configurable_etl_python_repo_spark.operators.skew import salted_left_join

    l = spark.createDataFrame([Row(k=1, x="a")])
    r = spark.createDataFrame([Row(k=2, y="b")])
    with pytest.raises(ValueError, match="left.*inner"):
        salted_left_join(l, r, on=["k"], how="full")


def test_format_number_integer_optin(spark):
    """FORMAT COLUMN number: default double; `integer: true` yields the
    reference's int64 shape ('101' not '101.0' at the string boundary)."""
    eng = Engine(spark)
    eng.bind("t", spark.createDataFrame([Row(v="101"), Row(v="7"), Row(v="x")]))
    dbl = eng.run_op(OpSpec("FORMAT COLUMN", "d", ["t"],
                            {"column": "v", "type": "number"}))
    assert dict(dbl.dtypes)["v"] == "double"
    eng.bind("t2", spark.createDataFrame([Row(v="101"), Row(v="x")]))
    out = eng.run_op(OpSpec("FORMAT COLUMN", "i", ["t2"],
                            {"column": "v", "type": "number", "integer": True}))
    assert dict(out.dtypes)["v"] == "bigint"
    assert [r.v for r in out.collect()] == [101, None]  # unparseable → NULL


def test_study_spine_is_declared_first_analyte(spark):
    """The DECLARED first analyte seeds the spine even when toposort runs
    one of its dependencies earlier (reference: first manifest row)."""
    eng = Engine(spark)
    eng.bind("base", spark.createDataFrame(
        [Row(subject="s1", v=1), Row(subject="s2", v=2)]))
    # spine depends on helper → toposort order is [helper, spine, extra]
    helper = AnalytePlan(name="helper",
                         scans=[ScanSpec("helper", "analyte", "base")])
    spine = AnalytePlan(
        name="spine",
        scans=[ScanSpec("spine", "analyte", "helper")],
        ops=[OpSpec("SELECT COLUMNS", "spine", ["spine"],
                    {"columns": ["subject"]})],
    )
    extra = AnalytePlan(
        name="extra",
        scans=[ScanSpec("extra", "analyte", "base")],
        ops=[OpSpec("RENAME COLUMN", "extra", ["extra"],
                    {"renames": {"v": "extra_v"}})],
    )
    study = StudyPlan(study_code="S", analytes=[spine, extra, helper],
                      spine_key="subject")
    out = eng.run_study(study)
    # spine's single column leads; helper/extra joined on, not seeding
    assert out.columns[0] == "subject"
    got = {(r.subject, r.extra_v) for r in out.select("subject", "extra_v").collect()}
    assert got == {("s1", 1), ("s2", 2)}
    assert out.count() == 2


def test_groupby_last_skips_nulls(spark):
    """pandas GroupBy.last takes the last NON-NULL value in sort order."""
    df = spark.createDataFrame(
        [Row(k="g", ord=1, v="a"), Row(k="g", ord=2, v="b"), Row(k="g", ord=3, v=None)]
    )
    eng = Engine(spark)
    eng.bind("t", df)
    eng.run_op(OpSpec("SORT DATASET", "t", ["t"], {"columns": ["ord"]}))
    out = eng.run_op(OpSpec("GROUPBY SUMMARISE", "o", ["t"],
                            {"group_by": ["k"], "aggs": [("v", "last")]}))
    assert out.collect()[0].v == "b"
