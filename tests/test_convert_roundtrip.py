"""Excel → JSON conversion round-trip: the converted program must execute
to the identical result, and the parsed reference workbooks serve as golden
snapshots against parser regressions."""

import json

from configurable_etl_python_repo_spark.config.excel import (
    parse_workbook,
    view_dir_resolver,
)
from configurable_etl_python_repo_spark.config.program import analyte_from_dict
from configurable_etl_python_repo_spark.config.serialize import analyte_to_dict
from configurable_etl_python_repo_spark.plans import Engine, ProgramError

REF = "/root/reference"


def test_convert_roundtrip_executes_identically(spark, tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from clinical_fixtures import generate

    data_dir = str(tmp_path_factory.mktemp("clin_rt"))
    generate(data_dir)
    plan = parse_workbook(f"{REF}/dg_test_subject_death_configuration.xlsx",
                          "subject_death", view_dir_resolver(data_dir))
    # serialize → JSON text → parse back → run
    as_json = json.dumps(analyte_to_dict(plan), default=str)
    plan2 = analyte_from_dict(json.loads(as_json))
    r1 = sorted(map(tuple, Engine(spark).run_analyte(plan).collect()))
    r2 = sorted(map(tuple, Engine(spark).run_analyte(plan2).collect()))
    assert r1 == r2 and len(r1) > 0


def test_parse_golden_snapshot():
    """Structural snapshot of the parsed subject_death workbook — a parser
    regression (dropped op, misparsed condition) fails loudly here."""
    plan = parse_workbook(f"{REF}/dg_test_subject_death_configuration.xlsx",
                          "subject_death", view_dir_resolver("/x"))
    assert [s.name for s in plan.scans] == ["DS", "DEATH"]
    assert plan.scans[0].filter == "DSDECOD_STD = C28554"
    assert plan.scans[0].columns == ["Subject", "DSSTDAT"]
    assert plan.scans[0].distinct is True
    ops = [(o.op, o.target) for o in plan.ops]
    assert ops == [
        ("RENAME COLUMN", "DS"), ("RENAME COLUMN", "DS"),
        ("RENAME COLUMN", "DEATH"), ("RENAME COLUMN", "DEATH"),
        ("FORMAT COLUMN", "DS"), ("FORMAT COLUMN", "DEATH"),
        ("OUTER JOIN", "ds_death"), ("AGGREGATE COLUMN", "ds_death"),
        ("REMOVE COLUMN", "ds_death"), ("UNIQUE COLUMN", "ds_death"),
        ("REMOVE ROWS", "subject_death"), ("REMOVE ROWS", "subject_death"),
    ]
    agg = plan.ops[7].args
    assert agg == {"new_column": "subject_death", "op": "min",
                   "columns": ["DS_death_date", "DEATH_death_date"]}
    fmt = plan.ops[4].args
    assert fmt == {"column": "DS_death_date", "type": "datetime",
                   "format": "%d-%m-%Y %H:%M"}


def test_program_error_pinpoints_op(spark, sf_dir):
    from configurable_etl_python_repo_spark.plans import AnalytePlan, OpSpec, ScanSpec

    import pytest

    plan = AnalytePlan(
        name="broken",
        scans=[ScanSpec("o", "parquet", f"{sf_dir}/orders.parquet")],
        ops=[
            OpSpec("SELECT COLUMNS", "o", ["o"], {"columns": ["o_orderkey"]}),
            OpSpec("FILTER", "broken", ["o"], {"condition": "nope ~~ 1"}),
        ],
    )
    with pytest.raises(ProgramError, match=r"analyte 'broken', op #2 \(FILTER"):
        Engine(spark).run_analyte(plan)
