"""Excel workbook grammar → typed plans (reference compatibility).

Parses the reference's config-workbook format exactly as interpreted by
`/root/reference/Configurable_ETL_Python.py`:

  GET_DATA sheet      (:434-454) — Object Name, Data Source (NoSQL|Analyte),
                                   study_code, View, Column, Filter, Distinct
  DF_OPERATIONS sheet (:456-522) — Object Name (target), Type (op),
                                   Data Frames (inputs), Condition (args)
  other sheets                   — decision tables: first column = lookup
                                   key, `output` column = mapped value
                                   (:610-612, :380-398)

Every Condition mini-grammar is parsed ONCE here into structured OpSpec
args (the reference re-splits the strings inside each operator call).
Grammars observed per op, cited to the reference parser:

  RENAME COLUMN      "old = new"                             (:223-228)
  FORMAT COLUMN      "column = X,type = datetime#<fmt>"      (:230-248)
  AGGREGATE COLUMN   "new_column = X, operation = minimum,
                      operation_cols = A#B"                  (:266-284)
  REMOVE/UNIQUE/SELECT [DISTINCT] COLUMNS  comma list
  REMOVE ROWS        "col=NULL"                              (:359-369)
  FILTER             filter mini-grammar                     (:108-200)
  LEFT/OUTER JOIN    comma list of shared join columns       (:531-534)
  BIND ROWS          (inputs only)                           (:337-344)
  GROUPBY SUMMARISE  "group_by_cols=a,b | summary_col_ops=c#op[, d#op]"
                                                             (:346-357)
  GROUPBY SLICE      "group_by_cols=k, slice_num=N"          (:67-74)
  SORT DATASET       "sort_cols=a,b[, sort_order=DESC]"      (:76-91)
  DECISION COLUMN    "new_column=X, lookup_column=Y,
                      decision_table_name=T"                 (:380-398)
  ATTACH COLUMN      "column_name=X, source_col=Y, operation=OP
                      [, value=V, column_value=Z]"           (:409-432)
"""

from __future__ import annotations

from collections.abc import Callable

from ..plans.spec import AnalytePlan, OpSpec, ScanSpec, StudyPlan
from .xlsx import read_workbook, sheet_records

RESERVED_SHEETS = {"GET_DATA", "DF_OPERATIONS", "General"}

#: reference spells row-wise ops out (`operation = minimum`)
_AGG_COL_OPS = {"minimum": "min", "min": "min", "maximum": "max", "max": "max"}


def _csv(text: str) -> list[str]:
    return [t.strip() for t in str(text).split(",") if t and t.strip()]


def _kv(condition: str, pair_sep: str = ",") -> dict[str, str]:
    out = {}
    for part in str(condition).split(pair_sep):
        if "=" in part:
            k, v = part.split("=", 1)
            out[k.strip().lower()] = v.strip()
    return out


# --------------------------------------------------------------------------
# per-op Condition parsers → OpSpec args
# --------------------------------------------------------------------------


def _parse_condition(op: str, condition, inputs: list[str]) -> dict:
    op = op.upper()
    c = "" if condition is None else str(condition)
    if op == "RENAME COLUMN":
        old, new = c.split("=", 1)
        return {"renames": {old.strip(): new.strip()}}
    if op == "FORMAT COLUMN":
        kv = _kv(c)
        typ = kv["type"]
        if typ.lower().startswith("datetime"):
            _, fmt = typ.split("#", 1)
            return {"column": kv["column"], "type": "datetime", "format": fmt}
        return {"column": kv["column"], "type": typ}
    if op == "ADD COLUMN":
        kv = _kv(c)
        return {"column": kv.get("new_column") or kv.get("column"),
                "value": kv.get("value")}
    if op == "AGGREGATE COLUMN":
        kv = _kv(c)
        return {
            "new_column": kv["new_column"],
            "op": _AGG_COL_OPS[kv["operation"].lower()],
            "columns": [x.strip() for x in kv["operation_cols"].split("#")],
        }
    if op == "ATTACH COLUMN":
        kv = _kv(c)
        operation = kv["operation"].upper()
        args = {"operation": operation, "new_column": kv["column_name"]}
        if operation == "SUMEQ":
            args["columns"] = [x.strip() for x in kv["source_col"].split("|")]
        elif operation == "NULL":
            args.update(column=kv["source_col"], value=kv["value"],
                        else_column=kv["column_value"])
        else:  # NOTNULL
            args["column"] = kv["source_col"]
        return args
    if op == "DECISION COLUMN":
        kv = _kv(c)
        return {"new_column": kv["new_column"], "lookup_column": kv["lookup_column"],
                "table": kv["decision_table_name"]}
    if op in ("REMOVE COLUMN", "UNIQUE COLUMN", "SELECT COLUMNS", "SELECT DISTINCT"):
        return {"columns": _csv(c)}
    if op == "REMOVE ROWS":
        col, operand = c.split("=", 1)
        return {"column": col.strip(), "operand": operand.strip()}
    if op == "FILTER":
        return {"condition": c}
    if op in ("LEFT JOIN", "OUTER JOIN", "INNER JOIN", "RIGHT JOIN",
              "SEMI JOIN", "ANTI JOIN"):
        return {"on": _csv(c)}
    if op == "QUALIFIED JOIN":
        return {"condition": c}
    if op == "BIND ROWS":
        return {}
    if op == "GROUPBY SUMMARISE":
        kv = _kv(c, pair_sep="|")
        aggs = []
        for spec in kv["summary_col_ops"].split(","):
            col, agg = spec.strip().rsplit("#", 1)
            aggs.append((col.strip(), agg.strip()))
        return {"group_by": _csv(kv["group_by_cols"]), "aggs": aggs}
    if op == "GROUPBY SLICE":
        kv = _kv(c)
        return {"group_by": _csv(kv["group_by_cols"]), "n": int(float(kv["slice_num"]))}
    if op == "SORT DATASET":
        kv = _kv(c)
        return {"columns": _csv(kv["sort_cols"]),
                "order": kv.get("sort_order", "ASC").upper()}
    raise ValueError(f"unknown operation type {op!r}")  # reference :519


# --------------------------------------------------------------------------
# workbook / study parsing
# --------------------------------------------------------------------------

SourceResolver = Callable[[dict], ScanSpec]


def view_dir_resolver(data_dir: str) -> SourceResolver:
    """NoSQL scans → one parquet file per view under data_dir (the silver
    per-view layout)."""

    def resolve(rec: dict) -> ScanSpec:
        # bindings are named by View, not Object Name (reference binds
        # globals()[View] at :447 — the IXRS/IxRS case mismatch in
        # dg_test_country_site proves DF_OPERATIONS resolves View names)
        view = str(rec["View"]).strip()
        return ScanSpec(name=view, source="parquet",
                        path=f"{data_dir}/{view}.parquet")

    return resolve


def bronze_resolver(bronze_path: str) -> SourceResolver:
    """NoSQL scans → keyed bronze reads with (study_code, view) partition
    pruning — the moral equivalent of the reference's DynamoDB
    KeyConditionExpression (Configurable_ETL_Python.py:31-35)."""

    def resolve(rec: dict) -> ScanSpec:
        view = str(rec["View"]).strip()
        return ScanSpec(
            name=view, source="bronze", path=bronze_path,
            keys={"study_code": str(rec["study_code"]).strip(), "view": view},
        )

    return resolve


def parse_workbook(path: str, analyte: str, resolver: SourceResolver) -> AnalytePlan:
    wb = read_workbook(path)
    scans: list[ScanSpec] = []
    for rec in sheet_records(wb.get("GET_DATA", [])):
        source = str(rec.get("Data Source", "")).strip().lower()
        if source == "analyte":
            # S2: resolve from the registry; the row's Column/Filter specs
            # are documentation only and IGNORED (verified reference
            # behavior, SURVEY §2.1 S2)
            view = str(rec["View"]).strip()
            scans.append(ScanSpec(name=view, source="analyte", path=view))
            continue
        scan = resolver(rec)
        if rec.get("Filter"):
            scan.filter = str(rec["Filter"]).strip()
        if rec.get("Column"):
            scan.columns = _csv(rec["Column"])
        scan.distinct = str(rec.get("Distinct") or "").strip().upper() == "Y"
        scans.append(scan)

    ops: list[OpSpec] = []
    for rec in sheet_records(wb.get("DF_OPERATIONS", [])):
        op = str(rec["Type"]).strip().upper()
        inputs = _csv(rec["Data Frames"])
        ops.append(OpSpec(
            op=op,
            target=str(rec["Object Name"]).strip(),
            inputs=inputs,
            args=_parse_condition(op, rec.get("Condition"), inputs),
        ))

    lookups: dict[str, list[dict]] = {}
    for sheet, rows in wb.items():
        if sheet in RESERVED_SHEETS:
            continue
        recs = sheet_records(rows)
        if not recs:
            continue
        cols = list(recs[0].keys())
        key_col = next((c for c in cols if c != "output"), None)
        if key_col and "output" in cols:
            lookups[sheet] = [{"key": r[key_col], "output": r["output"]}
                              for r in recs]

    return AnalytePlan(name=analyte, scans=scans, ops=ops, lookup_tables=lookups)


def parse_study(
    manifest_path: str,
    resolver: SourceResolver,
    workbook_path: Callable[[str], str],
    spine_key: str = "subject",
) -> StudyPlan:
    """Study manifest (`General` sheet: study_code, Analyte, Config) → a
    StudyPlan; dependency order is derived by toposort, NOT trusted from
    sheet order (reference trusts sheet order, Configurable_ETL_Python:593).
    `workbook_path` maps the manifest's Config filename to a local path."""
    recs = sheet_records(read_workbook(manifest_path).get("General", []))
    if not recs:
        raise ValueError(f"no General sheet rows in {manifest_path}")
    study_code = str(recs[0]["study_code"]).strip()
    analytes = [
        parse_workbook(workbook_path(str(r["Config"]).strip()),
                       str(r["Analyte"]).strip(), resolver)
        for r in recs
    ]
    return StudyPlan(study_code=study_code, analytes=analytes,
                     spine_key=spine_key)
