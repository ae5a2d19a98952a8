"""Expression compiler: the reference's filter mini-grammar → Spark Column.

Reference grammar (parsed ad hoc, string-split per call, at
`/root/reference/Configurable_ETL_Python.py:59-200`):

    filter := cmp '&' cmp | cmp '|' cmp
            | col 'BETWEEN' '(' lit ',' lit ')'
            | col ('=' | '>=' | '<=') (lit | 'NOT NULL')
    lit    := 'DATE(yyyy-mm-dd)' | 'NUMBER(x)' | 'BOOLEAN(b)' | bare-string

We compile ONCE to a Column expression tree (the reference re-parses the
string inside every operator call) and let Catalyst push the predicate into
the parquet scan. Superset extensions, all backward compatible with the
reference's documented forms: n-ary conjunction/disjunction with standard
precedence ('&' binds tighter than '|'), the full comparator set
(=, !=, >, >=, <, <=), 'NOT NULL' / 'NULL' on any comparator's right side,
and IN(a,b,c) lists. The reference's flat two-term forms parse identically.

The reference's `DATE(...)` literal would actually NameError at runtime
(`datetime` never imported, Configurable_ETL_Python.py:1-12,95); we implement
the documented semantics instead of the crash.
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_filter", "compile_literal", "strftime_to_java", "compile_agg"]


# ---------------------------------------------------------------------------
# literals
# ---------------------------------------------------------------------------

_TYPED_LIT = re.compile(r"^\s*(DATE|NUMBER|BOOLEAN)\s*\(\s*(.*?)\s*\)\s*$", re.I)


def compile_literal(text: str):
    """Parse a typed literal → Python value (reference semantics,
    Configurable_ETL_Python.py:93-106); bare strings stay strings."""
    m = _TYPED_LIT.match(text)
    if not m:
        return text.strip()
    kind, val = m.group(1).upper(), m.group(2)
    if kind == "DATE":
        return _dt.date.fromisoformat(val)
    if kind == "NUMBER":
        f = float(val)
        return int(f) if f.is_integer() else f
    # BOOLEAN
    if val.strip().upper() in ("TRUE", "1", "T", "YES"):
        return True
    if val.strip().upper() in ("FALSE", "0", "F", "NO"):
        return False
    raise ValueError(f"bad BOOLEAN literal: {text!r}")


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

# Order matters: longest operators first so '>=' wins over '='.
_COMPARATORS = [">=", "<=", "!=", "=", ">", "<"]

_BETWEEN = re.compile(
    r"^\s*(?P<col>[^\s]+)\s+BETWEEN\s*\(\s*(?P<lo>[^,]+?)\s*,\s*(?P<hi>.+?)\s*\)\s*$",
    re.I,
)
_IN = re.compile(r"^\s*(?P<col>[^\s]+)\s+IN\s*\(\s*(?P<items>.*?)\s*\)\s*$", re.I)


def _compile_cmp(text: str) -> Column:
    m = _BETWEEN.match(text)
    if m:
        col = F.col(m.group("col"))
        lo = compile_literal(m.group("lo"))
        hi = compile_literal(m.group("hi"))
        # inclusive both ends (Configurable_ETL_Python.py:131-154 → '>= AND <=')
        return (col >= F.lit(lo)) & (col <= F.lit(hi))
    m = _IN.match(text)
    if m:
        col = F.col(m.group("col"))
        items = [compile_literal(x) for x in m.group("items").split(",")]
        return col.isin(items)
    for op in _COMPARATORS:
        if op in text:
            lhs, rhs = text.split(op, 1)
            col = F.col(lhs.strip())
            rhs = rhs.strip()
            if rhs.upper() == "NOT NULL":
                # (Configurable_ETL_Python.py:118-119,160-162)
                cond = col.isNotNull()
                return ~cond if op == "!=" else cond
            if rhs.upper() in ("NULL", "NULL1"):
                cond = col.isNull()
                return ~cond if op == "!=" else cond
            lit = F.lit(compile_literal(rhs))
            if op == "=":
                return col == lit
            if op == "!=":
                return col != lit
            if op == ">=":
                return col >= lit
            if op == "<=":
                return col <= lit
            if op == ">":
                return col > lit
            return col < lit
    raise ValueError(f"unparseable comparison: {text!r}")


def compile_filter(text: str) -> Column:
    """Compile a filter string to one Column predicate.

    Precedence: '&' over '|' (the reference only ever has two terms and one
    operator, Configurable_ETL_Python.py:110-116, so this is a strict
    superset)."""
    disjuncts = []
    for disj in text.split("|"):
        conj = None
        for term in disj.split("&"):
            c = _compile_cmp(term)
            conj = c if conj is None else (conj & c)
        disjuncts.append(conj)
    out = disjuncts[0]
    for d in disjuncts[1:]:
        out = out | d
    return out


# ---------------------------------------------------------------------------
# datetime patterns
# ---------------------------------------------------------------------------

_STRFTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%p": "a",
    "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a strftime pattern (the reference's FORMAT COLUMN grammar,
    e.g. '%d-%m-%Y %H:%M') to a Java DateTimeFormatter pattern for
    F.to_timestamp ('dd-MM-yyyy HH:mm')."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok not in _STRFTIME_TO_JAVA:
                raise ValueError(f"unsupported strftime directive {tok!r} in {fmt!r}")
            out.append(_STRFTIME_TO_JAVA[tok])
            i += 2
        else:
            # literal chars that are letters must be quoted in Java patterns
            if fmt[i].isalpha():
                out.append(f"'{fmt[i]}'")
            else:
                out.append(fmt[i])
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# aggregate-name mapping (pandas agg vocabulary → Spark functions)
# ---------------------------------------------------------------------------

_AGGS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "count": F.count,
    "nunique": F.countDistinct,
    "std": F.stddev,
    "var": F.variance,
    "median": F.median,
    "collect": F.collect_list,
}

#: order-sensitive aggregate names that require sort-fusion (SURVEY §2.6)
ORDER_SENSITIVE_AGGS = {"first", "last"}


def compile_agg(op: str, col: str) -> Column:
    """Map a pandas-style aggregate name (GROUPBY SUMMARISE grammar,
    Configurable_ETL_Python.py:346-357) to a Spark aggregate Column.
    'first'/'last' are handled by the plan compiler's order fusion, not here.
    """
    try:
        return _AGGS[op.lower()](col)
    except KeyError:
        raise ValueError(
            f"unknown aggregate {op!r}; supported: {sorted(_AGGS)} "
            f"+ order-sensitive {sorted(ORDER_SENSITIVE_AGGS)}"
        ) from None
