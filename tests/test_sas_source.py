"""SAS source (S5): distributed sas7bdat ingestion.

Fixtures are synthesized by tests/sas7bdat_fixture.py (no SAS install in
the container, pandas ships no sample files); pandas' own sas7bdat parser
is the consumer, so the fixture round-trips through an INDEPENDENT
implementation of the format, not our writer's mirror image.
"""

import datetime

import pandas as pd
import pytest

from sas7bdat_fixture import write_sas7bdat

from configurable_etl_python_repo_spark.sources.sas import (
    convert_sas_dir,
    read_sas,
)

COLS = [("subject", "str", 12), ("site", "str", 8),
        ("visit_dt", "date", 8), ("score", "num", 8)]
ROWS = [
    ("S001", "A01", 20000.0, 1.5),
    ("S002", "A01", 20001.0, None),
    ("S003", "B02", None, 3.25),
]


@pytest.fixture()
def sas_file(tmp_path):
    p = str(tmp_path / "visits.sas7bdat")
    write_sas7bdat(p, COLS, ROWS)
    return p


def test_fixture_parses_with_pandas(sas_file):
    df = pd.read_sas(sas_file, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == ["subject", "site", "visit_dt", "score"]
    assert df["visit_dt"].iloc[0] == pd.Timestamp("2014-10-04")
    assert pd.isna(df["score"].iloc[1])


def test_read_sas_single_file(spark, sas_file):
    out = read_sas(spark, sas_file)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string", "string", "timestamp", "double"
    ]
    rows = {r.subject: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["S001"].score == 1.5
    assert rows["S002"].score is None  # SAS NaN -> NULL
    assert rows["S003"].visit_dt is None
    assert rows["S001"].visit_dt == datetime.datetime(2014, 10, 4)
    assert rows["S003"].site == "B02"


def test_read_sas_directory_parallel_files(spark, tmp_path):
    d = tmp_path / "extracts"
    d.mkdir()
    for i, site in enumerate(["A01", "B02", "C03"]):
        write_sas7bdat(
            str(d / f"site_{site}.sas7bdat"), COLS,
            [(f"S{i}{j}", site, 20000.0 + j, float(j)) for j in range(4)],
        )
    out = read_sas(spark, str(d))
    assert out.count() == 12
    assert out.select("site").distinct().count() == 3
    # parallelism unit is the file: one input partition per extract
    assert out.rdd.getNumPartitions() >= 1


def test_sas_scan_source_in_engine(spark, sas_file):
    from configurable_etl_python_repo_spark.plans import Engine, ScanSpec

    eng = Engine(spark)
    df = eng.run_scan(ScanSpec("v", "sas", sas_file,
                               filter="site = A01",
                               columns=["subject", "site", "score"]))
    got = sorted((r.subject, r.score) for r in df.collect())
    assert got == [("S001", 1.5), ("S002", None)]


def test_convert_sas_dir_roundtrip(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    write_sas7bdat(str(d / "a.sas7bdat"), COLS, ROWS)
    dest = str(tmp_path / "out_parquet")
    convert_sas_dir(spark, str(d), dest)
    back = spark.read.parquet(dest)
    assert back.count() == 3
    assert {r.subject for r in back.collect()} == {"S001", "S002", "S003"}
