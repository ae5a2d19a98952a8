"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship analyte program on sf0.001 (smoke).
`queries()` — one entry per implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline extensions; each callable is (spark, sf_dir) -> DataFrame.
`oracle_sql()` — matching DuckDB SQL per query. Every query has one: the
md5-derived hash families (minhash, simhash, SRP planes, multimodal fakes)
are generated into SQL with their driver-side constants embedded.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from configurable_etl_python_repo_spark.catalog import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_earliest_event"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
