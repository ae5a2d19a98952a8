"""CLI + export serving layer."""

from pyspark.sql import Row

from configurable_etl_python_repo_spark.sinks.boundary import export_normalized
from configurable_etl_python_repo_spark.sources.bronze import write_bronze


def test_export_normalized_schema_evolution(spark, tmp_path):
    """Bronze views with DIFFERENT payload schemas export into one flat
    dataset via mergeSchema (reference: Glue schema_evolution=True)."""
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "serving")
    write_bronze(spark.createDataFrame([Row(Subject="S1", val="1")]),
                 bronze, study_code="ST", view="V1")
    write_bronze(spark.createDataFrame([Row(Subject="S2", other="x")]),
                 bronze, study_code="ST", view="V2")
    export_normalized(bronze, out, spark=spark)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert {"study_code", "view", "Subject", "val", "other"} <= set(got.columns)
    rows = {(r.Subject, r.val, r.other) for r in got.collect()}
    # boundary adapter applies the reference's all-string + 'Null' sentinel
    assert rows == {("S1", "1", "Null"), ("S2", "Null", "x")}


def test_write_csv_sink(spark, tmp_path):
    """K4: boundary string form, header, NULL sentinel; round-trips."""
    import csv as _csv
    import glob

    from configurable_etl_python_repo_spark.sinks.boundary import write_csv

    df = spark.createDataFrame(
        [Row(k=1, name="a", v=1.5), Row(k=2, name=None, v=None)]
    )
    out = str(tmp_path / "out_csv")
    write_csv(df, out, single_file=True)
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1  # single_file coalesced
    with open(files[0]) as f:
        rows = list(_csv.reader(f))
    assert rows[0] == ["k", "name", "v"]
    body = {tuple(r) for r in rows[1:]}
    assert body == {("1", "a", "1.5"), ("2", "Null", "Null")}
    # distributed (default) mode: still readable back with the same rows
    write_csv(df, out, single_file=False)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2 and back.columns == ["k", "name", "v"]


def test_cli_run_analyte_csv_out(spark, sf_dir, tmp_path):
    import json

    from configurable_etl_python_repo_spark.cli import main

    program = {
        "analyte": "n",
        "scans": [{"name": "n", "source": "parquet",
                   "path": f"{sf_dir}/nation.parquet",
                   "columns": ["n_nationkey", "n_name"]}],
        "ops": [],
    }
    prog_path = tmp_path / "prog.json"
    prog_path.write_text(json.dumps(program))
    out = str(tmp_path / "out_csv")
    rc = main(["run-analyte", "--program", str(prog_path), "--out", out,
               "--format", "csv"])
    assert rc == 0
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 25
    assert set(back.columns) == {"n_nationkey", "n_name"}


def test_cli_run_study_merge_out_idempotent(spark, tmp_path):
    """--merge-out upserts the study's rows into standing gold: re-running
    the same study twice leaves one copy (put_item overwrite semantics)."""
    from clinical_fixtures import generate

    from configurable_etl_python_repo_spark.cli import main

    data_dir = str(tmp_path / "clinical")
    (tmp_path / "clinical").mkdir()
    generate(data_dir)
    gold = str(tmp_path / "gold")
    argv = ["run-study", "--manifest",
            "/root/reference/study_configuration.xlsx",
            "--workbook-dir", "/root/reference",
            "--data-dir", data_dir, "--merge-out", gold]
    assert main(argv) == 0
    first = spark.read.parquet(gold)
    rows1 = {tuple(r) for r in first.collect()}
    assert len(rows1) > 0 and "study_code" in first.columns
    assert main(argv) == 0  # re-run: merge, not append
    again = spark.read.parquet(gold)
    assert {tuple(r) for r in again.collect()} == rows1


def test_cli_run_study_merge_out_tx(spark, tmp_path):
    """--merge-out --tx commits through the manifest log: same idempotent
    merge semantics, read back via the snapshot reader."""
    from clinical_fixtures import generate

    from configurable_etl_python_repo_spark.cli import main
    from configurable_etl_python_repo_spark.sinks.txlog import read_gold_tx

    data_dir = str(tmp_path / "clinical")
    (tmp_path / "clinical").mkdir()
    generate(data_dir)
    gold = str(tmp_path / "gold_tx")
    argv = ["run-study", "--manifest",
            "/root/reference/study_configuration.xlsx",
            "--workbook-dir", "/root/reference",
            "--data-dir", data_dir, "--merge-out", gold, "--tx"]
    assert main(argv) == 0
    rows1 = {tuple(r) for r in read_gold_tx(spark, gold).collect()}
    assert len(rows1) > 0
    assert main(argv) == 0  # re-run: merge (v2), not append
    assert {tuple(r) for r in read_gold_tx(spark, gold).collect()} == rows1


def test_cli_run_analyte_json(spark, sf_dir, tmp_path, capsys):
    import json

    from configurable_etl_python_repo_spark.cli import main

    program = {
        "analyte": "urgent",
        "scans": [{"name": "o", "source": "parquet",
                   "path": f"{sf_dir}/orders.parquet",
                   "filter": "o_orderpriority = 1-URGENT",
                   "columns": ["o_orderkey", "o_custkey"]}],
        "ops": [{"op": "RENAME COLUMN", "target": "urgent", "inputs": ["o"],
                 "args": {"renames": {"o_orderkey": "okey"}}}],
    }
    prog_path = tmp_path / "prog.json"
    prog_path.write_text(json.dumps(program))
    out = str(tmp_path / "out.parquet")
    rc = main(["run-analyte", "--program", str(prog_path), "--out", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.columns == ["okey", "o_custkey"]
    assert got.count() > 0


def test_cli_runs_curation_program_end_to_end(spark, sf_dir, tmp_path,
                                              capsys):
    """A user curates training data from the COMMAND LINE with zero
    Python: a JSON program chaining llm ops (URL blocklist -> quality
    classifier gate -> exact dedup keeper join -> BPE token counts)
    runs through `run-analyte` and writes parquet."""
    import json

    from configurable_etl_python_repo_spark.cli import main

    program = {
        "analyte": "curated",
        "scans": [{"name": "docs", "source": "parquet",
                   "path": f"{sf_dir}/documents.parquet",
                   "columns": ["doc_id", "source", "text"]}],
        "ops": [
            {"op": "URL BLOCKLIST", "target": "clean", "inputs": ["docs"],
             "args": {"blocked_domains": ["spam.example"], "mode": "drop"}},
            {"op": "CLASSIFIER SCORE", "target": "scored",
             "inputs": ["clean"], "args": {"threshold": 0.3}},
            {"op": "FILTER", "target": "kept", "inputs": ["scored"],
             "args": {"condition": "quality_keep = BOOLEAN(TRUE)"}},
            {"op": "TOKEN COUNT BPE", "target": "counted",
             "inputs": ["kept"], "args": {}},
            {"op": "SELECT COLUMNS", "target": "curated",
             "inputs": ["counted"],
             "args": {"columns": ["doc_id", "source", "quality_score",
                                  "n_tokens"]}},
        ],
    }
    prog_path = tmp_path / "curate.json"
    prog_path.write_text(json.dumps(program))
    out = str(tmp_path / "curated_out")

    rc = main(["run-analyte", "--program", str(prog_path), "--out", out])
    assert rc == 0
    back = spark.read.parquet(out)
    assert set(back.columns) == {"doc_id", "source", "quality_score",
                                 "n_tokens"}
    assert back.count() > 0
    assert back.where("n_tokens <= 0").count() == 0
