"""File source helpers.

`read_events` handles the driver fixture's nanosecond-precision parquet
timestamps: Spark's vectorized reader rejects TIMESTAMP(NANOS) columns, so
we flip the legacy nanos-as-long conf at runtime and rebuild a proper
microsecond timestamp with integer division (never float — int64 nanos
exceed double's 2^53 mantissa). A production deployment would simply write
micros; this keeps the engine correct on nanos inputs too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events(spark: SparkSession, path: str) -> DataFrame:
    # schema resolution itself rejects NANOS, so flip the conf up front;
    # harmless when the file already carries micro timestamps
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Parquet timestamp[us] with isAdjustedToUTC=false arrives as
        # TIMESTAMP_NTZ, which unix_micros() and withWatermark() reject.
        # The session timezone is pinned to UTC (session.py), so casting to
        # TIMESTAMP reinterprets the same wall-clock instant unambiguously.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
