"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed —
either `NotImplementedError` (strict) or a deterministic fake (testing) —
but the Spark-side plumbing is real and tested: schemas, Arrow batch shape,
partition sizing, and the mapInPandas UDF signatures are exactly what a
production decode would use. Swapping in a real codec touches only
`_decode_payload`.

Scale notes: binary payloads dominate partition size — repartition by a
size-aware key before decode (`target_rows_per_batch`), keep
`spark.sql.files.maxPartitionBytes` low for mixed text/binary tables, and
never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_md5", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image"
) -> DataFrame:
    """Typed metadata columns for an opaque binary payload — pure Column
    ops (no decode): byte length + md5 content address."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "n_bytes": F.length(p).cast("long"),
            "payload_md5": F.md5(p),
            "media_meta": F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit(None).cast("string").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        }
    )


def _decode_payload(payload: bytes, fake: bool) -> list[float]:
    """DECODE STUB. Real deployments replace this with PIL/libav/etc.

    fake=True → deterministic 8-dim feature vector derived from payload
    bytes (so tests exercise the full Arrow round-trip); fake=False →
    NotImplementedError, clearly marking the codec boundary."""
    if not fake:
        raise NotImplementedError(
            "media decode requires a codec library not present in this "
            "container; plug PIL/torchvision/libav in here"
        )
    # deterministic fake: byte-histogram-ish moments
    n = max(len(payload), 1)
    return [
        float(len(payload)),
        float(payload[0]) if payload else 0.0,
        float(payload[-1]) if payload else 0.0,
        float(sum(payload) % 997) / 997.0,
        float(min(payload)) if payload else 0.0,
        float(max(payload)) if payload else 0.0,
        float(sum(b % 2 for b in payload)) / n,
        float(n % 251) / 251.0,
    ]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow-batched).

    The two-column projection (id, payload) happens BEFORE the UDF so Spark
    prunes every other column out of the Arrow transfer; batches are kept
    small because payloads are large."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                import hashlib

                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].astype("int64"),
                        "n_bytes": chunk["payload"].map(len).astype("int64"),
                        "payload_md5": chunk["payload"].map(
                            lambda b: hashlib.md5(b).hexdigest()
                        ),
                        "features": chunk["payload"].map(
                            lambda b: _decode_payload(bytes(b), fake_decode)
                        ),
                    }
                )

    return src.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling STUB: real implementation would mapInPandas over
    (doc_id, payload) emitting one row per sampled frame. Kept as an explicit
    NotImplementedError so the API surface is visible."""
    raise NotImplementedError(
        "frame sampling requires a video codec; the mapInPandas plumbing "
        "mirrors extract_features with an exploded (doc_id, frame_idx, png) "
        "output schema"
    )
