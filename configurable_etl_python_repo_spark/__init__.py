"""configurable_etl_python_repo_spark — a PySpark-native, configuration-driven
analytics/ETL engine.

Re-founds the operator vocabulary of the reference config-driven ETL
interpreter (`/root/reference/Configurable_ETL_Python.py`) on Spark:
programs (Excel workbooks / YAML / dicts) compile to a typed logical plan,
which lowers to lazy DataFrame lineage so Catalyst/AQE do all physical
planning. No Python UDFs on the reference-parity hot path.

Layout:
  session     — SparkSession factory tuned for local[N] and cluster use
  registry    — named-DataFrame registry (replaces the reference's globals())
  functions/  — expression compiler (filter mini-grammar → Column) + helpers
  plans/      — typed plan dataclasses + the op-compiler with order-fusion
  operators/  — one compiler per reference operator (SURVEY.md §2)
  sources/    — parquet/csv/bronze readers, lenient projection
  sinks/      — boundary adapters (null sentinel, all-string), gold/export
  config/     — Excel workbook & dict/YAML program parsers
  llm/        — large-scale training-data ops: dedup, similarity, text, multimodal
  streaming/  — Structured Streaming ingestion & windowed aggregation
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .registry import Registry  # noqa: F401
