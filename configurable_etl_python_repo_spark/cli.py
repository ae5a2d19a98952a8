"""Command-line entry points — the operational equivalent of running the
reference's scripts (`Configurable_ETL_Python.py:614-618` etc.), minus the
hardwired AWS coupling.

    python -m configurable_etl_python_repo_spark run-study \
        --manifest study_configuration.xlsx --workbook-dir ./configs \
        --data-dir ./silver --out ./gold [--bronze ./bronze]

    python -m configurable_etl_python_repo_spark run-analyte \
        --program analyte.json --out ./out.parquet

    python -m configurable_etl_python_repo_spark export \
        --bronze ./bronze --out ./serving
"""

from __future__ import annotations

import argparse
import os

from .session import get_spark


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--format", choices=["parquet", "csv"], default="parquet",
                   help="--out format (csv applies boundary string form)")


def cmd_run_study(args) -> int:
    from .config.excel import bronze_resolver, parse_study, view_dir_resolver
    from .plans import Engine
    from .sinks.boundary import write_gold

    spark = get_spark("run_study", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    resolver = (bronze_resolver(args.bronze) if args.bronze
                else view_dir_resolver(args.data_dir))
    study = parse_study(
        args.manifest, resolver,
        workbook_path=lambda cfg: os.path.join(args.workbook_dir, cfg),
        spine_key=args.spine_key,
    )
    eng = Engine(spark)
    result = eng.run_study(study)
    if args.merge_out:
        # the reference's operational shape: each study run REFRESHES its
        # rows in the standing gold store (per-key put_item overwrite →
        # partition-scoped merge upsert; other studies' partitions are
        # untouched). --tx commits through the manifest-pointer log:
        # readers see the whole refresh or none of it.
        from pyspark.sql import functions as F

        keyed = result.withColumn("study_code", F.lit(study.study_code))
        if args.tx:
            from .sinks.txlog import tx_merge_upsert

            version = tx_merge_upsert(spark, args.merge_out, keyed,
                                      key_cols=["study_code", args.spine_key])
            print(f"merged study {study.study_code} -> {args.merge_out} "
                  f"v{version} ({result.count()} rows)")
        else:
            from .sinks.upsert import merge_upsert

            merge_upsert(spark, args.merge_out, keyed,
                         key_cols=["study_code", args.spine_key])
            print(f"merged study {study.study_code} -> {args.merge_out} "
                  f"({result.count()} rows)")
    elif args.out:
        _write_out(result, args.out, args.format)
        print(f"standardized output -> {args.out} ({result.count()} rows)")
    else:
        result.show(20, truncate=False)
    return 0


def _write_out(df, path: str, fmt: str) -> None:
    if fmt == "csv":
        from .sinks.boundary import write_csv

        write_csv(df, path)
    else:
        df.write.mode("overwrite").parquet(path)


def cmd_run_analyte(args) -> int:
    from .config.program import analyte_from_json
    from .plans import Engine

    spark = get_spark("run_analyte", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    plan = analyte_from_json(args.program)
    df = Engine(spark).run_analyte(plan)
    if args.out:
        _write_out(df, args.out, args.format)
        print(f"{plan.name} -> {args.out} ({df.count()} rows)")
    else:
        df.show(20, truncate=False)
    return 0


def cmd_export(args) -> int:
    """Serving-layer export: bronze → flat, schema-evolving parquet
    (reference: Athena_DynamoDB_Normalized.py:93-103)."""
    from .sinks.boundary import export_normalized

    spark = get_spark("export", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    export_normalized(args.bronze, args.out, spark=spark)
    print(f"exported {args.bronze} -> {args.out}")
    return 0


def cmd_convert(args) -> int:
    """Excel workbook/manifest → native JSON program (no Spark needed)."""
    import json

    from .config.excel import parse_study, parse_workbook, view_dir_resolver
    from .config.serialize import analyte_to_dict, study_to_dict

    resolver = view_dir_resolver(args.data_dir or "{data_dir}")
    if args.manifest:
        study = parse_study(
            args.manifest, resolver,
            workbook_path=lambda cfg: os.path.join(args.workbook_dir, cfg),
        )
        payload = study_to_dict(study)
    else:
        payload = analyte_to_dict(
            parse_workbook(args.workbook, args.analyte, resolver)
        )
    text = json.dumps(payload, indent=2, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out}")
    else:
        print(text)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="configurable_etl_python_repo_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("run-study", help="derive every analyte + spine join")
    p1.add_argument("--manifest", required=True)
    p1.add_argument("--workbook-dir", required=True)
    p1.add_argument("--data-dir", help="per-view parquet dir (silver)")
    p1.add_argument("--bronze", help="bronze store path (keyed reads)")
    p1.add_argument("--out")
    p1.add_argument("--merge-out",
                    help="upsert the study's rows into a standing gold "
                         "dataset (partition-scoped merge) instead of --out")
    p1.add_argument("--tx", action="store_true",
                    help="commit --merge-out through the transactional "
                         "manifest log (atomic, snapshot-isolated reads "
                         "via sinks.txlog.read_gold_tx)")
    p1.add_argument("--spine-key", default="subject")
    _add_common(p1)
    p1.set_defaults(fn=cmd_run_study)

    p2 = sub.add_parser("run-analyte", help="run one JSON analyte program")
    p2.add_argument("--program", required=True)
    p2.add_argument("--out")
    _add_common(p2)
    p2.set_defaults(fn=cmd_run_analyte)

    p3 = sub.add_parser("export", help="bronze -> flat serving parquet")
    p3.add_argument("--bronze", required=True)
    p3.add_argument("--out", required=True)
    _add_common(p3)
    p3.set_defaults(fn=cmd_export)

    p4 = sub.add_parser("convert", help="Excel workbook/manifest -> JSON program")
    p4.add_argument("--workbook", help="single analyte workbook")
    p4.add_argument("--analyte", help="analyte name for --workbook")
    p4.add_argument("--manifest", help="study manifest (converts every analyte)")
    p4.add_argument("--workbook-dir", default=".")
    p4.add_argument("--data-dir", help="silver dir baked into scan paths")
    p4.add_argument("--out")
    p4.set_defaults(fn=cmd_convert)

    args = ap.parse_args(argv)
    if args.cmd == "run-study" and not (args.data_dir or args.bronze):
        ap.error("run-study requires --data-dir or --bronze")
    if args.cmd == "convert" and not (args.manifest or (args.workbook and args.analyte)):
        ap.error("convert requires --manifest or (--workbook and --analyte)")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
