"""Named-DataFrame registry.

The reference stores every working relation in the Python ``globals()`` dict
(`Configurable_ETL_Python.py:447,452,462`) and rebinds names freely. We keep
the rebinding semantics (a name is a mutable binding to an immutable
DataFrame) but in an explicit object, and mirror every binding as a Spark
temp view so the same relations are addressable from SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


_VIEW_SAFE = re.compile(r"[^A-Za-z0-9_]")


class Registry:
    """Mutable name → immutable DataFrame bindings, SQL-visible."""

    def __init__(self, spark: SparkSession, register_views: bool = True):
        self.spark = spark
        self._bindings: dict[str, DataFrame] = {}
        self._register_views = register_views

    def bind(self, name: str, df: DataFrame) -> None:
        self._bindings[name] = df
        if self._register_views:
            df.createOrReplaceTempView(_VIEW_SAFE.sub("_", name))

    def get(self, name: str) -> DataFrame:
        try:
            return self._bindings[name]
        except KeyError:
            raise KeyError(
                f"no relation named {name!r}; bound: {sorted(self._bindings)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._bindings

    def names(self) -> list[str]:
        return sorted(self._bindings)

    def unbind(self, name: str) -> None:
        self._bindings.pop(name, None)

    def cache(self, name: str) -> DataFrame:
        """Cache an analyte that has >1 downstream consumer."""
        df = self.get(name).cache()
        self._bindings[name] = df
        return df

    def unpersist(self, name: str) -> None:
        if name in self._bindings:
            self._bindings[name].unpersist()
