"""Typed logical plan for config programs.

The reference's IR is literally the Excel rows, re-parsed inside every
operator call (`Configurable_ETL_Python.py:456-522`). Here a program parses
once into these dataclasses, gets validated/topo-sorted, then lowers to lazy
DataFrame lineage (plans/compiler.py). Conditions are compiled to Column
trees exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class SortSpec:
    """A pending sort: recorded by SORT DATASET, consumed (fused into a
    window) by the next order-sensitive operator. SURVEY.md §2.6.

    `materialize` distinguishes the two roles the metadata plays:
      True  — the user asked for this sort and no op consumed it yet; if
              the relation is read out, resolve() must emit a real orderBy.
      False — the sort was already FUSED into a window (slice/last/dedup);
              keep the metadata for possible further fusion, but a physical
              global sort of the output would be pure waste (measured: it
              made per-group top-N superlinear at 16× scale)."""

    columns: tuple[str, ...]
    ascending: bool = True
    materialize: bool = True

    def spark_cols(self):
        from pyspark.sql import functions as F

        return [
            F.col(c).asc_nulls_last() if self.ascending else F.col(c).desc_nulls_last()
            for c in self.columns
        ]

    def inverted(self) -> "SortSpec":
        return SortSpec(self.columns, not self.ascending, self.materialize)

    def fused(self) -> "SortSpec":
        return SortSpec(self.columns, self.ascending, materialize=False)


@dataclass
class ScanSpec:
    """GET_DATA row: load → filter → project(+distinct).

    Reference: `Configurable_ETL_Python.py:434-454` (order verified there —
    filter at :451 runs before projection at :452, so filters may reference
    columns that are then projected away)."""

    name: str  # binding name ("View" column)
    source: str  # parquet | parquet-stream | csv | json | analyte | bronze | table
    path: str | None = None
    filter: str | None = None
    columns: list[str] | None = None
    distinct: bool = False
    options: dict[str, str] = field(default_factory=dict)
    # bronze scans: partition-key equality (study_code, view) — becomes
    # partition pruning on the bronze table (reference: DynamoDB
    # KeyConditionExpression, Configurable_ETL_Python.py:31-35)
    keys: dict[str, str] = field(default_factory=dict)


@dataclass
class OpSpec:
    """One DF_OPERATIONS row: target := op(inputs, args)."""

    op: str  # canonical name, e.g. "LEFT JOIN"
    target: str  # output binding (may rebind an input name)
    inputs: list[str]  # input binding names
    args: dict[str, Any] = field(default_factory=dict)


@dataclass
class AnalytePlan:
    """One workbook: scans then ops; result = binding named `name`."""

    name: str
    scans: list[ScanSpec] = field(default_factory=list)
    ops: list[OpSpec] = field(default_factory=list)
    # decision tables embedded in the workbook: table name → rows
    lookup_tables: dict[str, list[dict[str, Any]]] = field(default_factory=dict)

    def dependencies(self) -> set[str]:
        """Analyte names this plan consumes (source == 'analyte')."""
        return {s.path or s.name for s in self.scans if s.source == "analyte"}


@dataclass
class StudyPlan:
    """The manifest: an ordered list of analytes forming a DAG; the first
    analyte seeds the spine, later ones left-join onto it on `spine_key`
    (reference: process_study, Configurable_ETL_Python.py:589-604)."""

    study_code: str
    analytes: list[AnalytePlan] = field(default_factory=list)
    spine_key: str = "subject"

    def toposort(self) -> list[AnalytePlan]:
        """Dependency-ordered analytes (the reference trusts sheet order;
        we build the DAG from Data Source=Analyte references). Rebinding
        inside one analyte is versioning, not a cycle."""
        by_name = {a.name: a for a in self.analytes}
        seen: dict[str, int] = {}  # 0=visiting, 1=done
        out: list[AnalytePlan] = []

        def visit(name: str) -> None:
            if name not in by_name or seen.get(name) == 1:
                return
            if seen.get(name) == 0:
                raise ValueError(f"analyte dependency cycle at {name!r}")
            seen[name] = 0
            for dep in sorted(by_name[name].dependencies()):
                visit(dep)
            seen[name] = 1
            out.append(by_name[name])

        for a in self.analytes:
            visit(a.name)
        return out
