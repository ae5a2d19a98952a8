"""SAS (sas7bdat) source.

Reference parity: `/root/reference/Data_Ingestion_Python.py:26-28` ingests
clinical extracts with `pd.read_sas(format='sas7bdat')` — single-node,
whole-file. Here the same parser (pandas' built-in sas7bdat reader — no
extra library) runs DISTRIBUTED: `binaryFile` lists the files into tasks
and each file parses inside an Arrow-batched `mapInPandas`, chunked so a
multi-GB extract never materializes as one pandas frame.

Scale notes:
  - sas7bdat is not a splittable format (page directory + optional RLE/RDC
    compression), so the parallelism unit is the FILE — same as gzip'd
    CSV. A study dropping hundreds of per-site extracts parallelizes
    perfectly; one monolithic 100 GB file does not, and the right move
    there is converting to parquet once (`convert_sas_dir`) and never
    re-parsing.
  - schema comes from a driver-side header read of the first file (a few
    KB); every file in one load must share it (enforced per-batch).
"""

from __future__ import annotations

import io
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _sas_schema(first_file: str, encoding: str) -> T.StructType:
    """Schema from the file header + first row (pandas' reader resolves
    column names/types/date-formats during its metadata parse)."""
    rdr = pd.read_sas(first_file, format="sas7bdat", encoding=encoding,
                      iterator=True)
    try:
        head = rdr.read(1)
    finally:
        rdr.close()
    fields = []
    for name, dtype in head.dtypes.items():
        if str(dtype).startswith("datetime64"):
            spark_t: T.DataType = T.TimestampType()
        elif str(dtype) in ("float64", "float32"):
            spark_t = T.DoubleType()
        else:
            spark_t = T.StringType()
        fields.append(T.StructField(str(name), spark_t, True))
    return T.StructType(fields)


def read_sas(
    spark: SparkSession,
    path: str,
    encoding: str = "infer",
    chunk_rows: int = 65_536,
) -> DataFrame:
    """Read one sas7bdat file, a directory, or a glob as a DataFrame.

    One Spark task per file; each task streams the file in `chunk_rows`
    chunks through Arrow so peak memory is one chunk, not one file."""
    schema = _sas_schema(_first_sas_file(spark, path), encoding)
    names = schema.fieldNames()
    binaries = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.sas7bdat")
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw_path, content in zip(pdf["path"], pdf["content"]):
                rdr = pd.read_sas(
                    io.BytesIO(bytes(content)), format="sas7bdat",
                    encoding=encoding, chunksize=chunk_rows, iterator=True,
                )
                try:
                    while True:
                        chunk = rdr.read(chunk_rows)
                        if chunk.empty:
                            break
                        if list(chunk.columns) != names:
                            raise ValueError(
                                f"SAS schema mismatch in {raw_path}: "
                                f"{list(chunk.columns)} != {names}"
                            )
                        yield chunk
                finally:
                    rdr.close()

    return binaries.mapInPandas(parse, schema=schema)


def _first_sas_file(spark: SparkSession, path: str) -> str:
    """Resolve one concrete file for the driver-side schema read (local
    paths only need os; hadoop globs resolve through the JVM FS API)."""
    import os

    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".sas7bdat"):
                return os.path.join(path, f)
        raise FileNotFoundError(f"no .sas7bdat files under {path}")
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    for status in fs.globStatus(p) or []:
        f = status.getPath().toString()
        if f.endswith(".sas7bdat"):
            return f
    raise FileNotFoundError(f"no .sas7bdat files match {path}")


def convert_sas_dir(
    spark: SparkSession,
    src: str,
    dest: str,
    encoding: str = "infer",
    mode: str = "overwrite",
) -> None:
    """One-time SAS → parquet conversion (the recommended pattern: parse
    each extract exactly once, then every downstream scan gets columnar
    pruning + predicate pushdown that sas7bdat can never offer)."""
    read_sas(spark, src, encoding=encoding).write.mode(mode).parquet(dest)
