"""Plan → dict/JSON serialization: the migration path off Excel.

`parse_workbook` + `plan_to_dict` gives users a one-command converter from
the reference's workbook programs to the native JSON grammar
(`python -m configurable_etl_python_repo_spark convert ...`), after which
programs are diffable, reviewable, and machine-generated."""

from __future__ import annotations

from dataclasses import asdict

from ..plans.spec import AnalytePlan, StudyPlan


def scan_to_dict(s) -> dict:
    d = asdict(s)
    # drop empty optionals so the JSON stays readable
    return {k: v for k, v in d.items() if v not in (None, {}, [], False)}


def analyte_to_dict(plan: AnalytePlan) -> dict:
    out = {
        "analyte": plan.name,
        "scans": [scan_to_dict(s) for s in plan.scans],
        "ops": [
            {"op": o.op, "target": o.target, "inputs": o.inputs, "args": o.args}
            for o in plan.ops
        ],
    }
    if plan.lookup_tables:
        out["lookup_tables"] = plan.lookup_tables
    return out


def study_to_dict(study: StudyPlan) -> dict:
    return {
        "study_code": study.study_code,
        "spine_key": study.spine_key,
        "analytes": [analyte_to_dict(a) for a in study.analytes],
    }
