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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), False),
        T.StructField("src_height", T.IntegerType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("resized_md5", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def _fake_dims(payload_md5: str) -> tuple[int, int]:
    """Deterministic fake image dimensions from the content hash (the
    codec-free stand-in for a real header parse) — md5-derived like the
    minhash family, so a SQL oracle reproduces them exactly."""
    w = 320 + int(payload_md5[:4], 16) % 1600
    h = 240 + int(payload_md5[4:8], 16) % 840
    return w, h


def _fake_duration_ms(payload_md5: str) -> int:
    return 1000 + int(payload_md5[8:13], 16) % 600_000


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_side: int = 512,
    fake_decode: bool = True,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Image resize plumbing over mapInPandas: downscale so the longer
    side is <= max_side, preserving aspect ratio with INTEGER math (both
    engines floor identically — no float rounding drift in the oracle).

    fake_decode=True derives source dims from the content hash and tags
    the 'resized' payload by hash (the real implementation replaces only
    the decode/encode calls: PIL.open → thumbnail → tobytes)."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                rows = []
                for doc_id, payload in zip(chunk["doc_id"], chunk["payload"]):
                    if not fake_decode:
                        raise NotImplementedError(
                            "image decode requires PIL/torchvision; plug in here"
                        )
                    md = hashlib.md5(bytes(payload)).hexdigest()
                    w, h = _fake_dims(md)
                    side = max(w, h)
                    if side > max_side:
                        ow, oh = (w * max_side) // side, (h * max_side) // side
                    else:
                        ow, oh = w, h
                    rows.append(
                        (int(doc_id), w, h, ow, oh,
                         hashlib.md5(f"{md}|{ow}x{oh}".encode()).hexdigest())
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
                )

    return src.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    max_frames: int = 32,
    fake_decode: bool = True,
    target_rows_per_batch: int = 64,
) -> DataFrame:
    """Video frame sampling over mapInPandas: one OUTPUT ROW PER SAMPLED
    FRAME (the exploding shape a real libav decode emits), frames every
    `every_ms` capped at max_frames per doc.

    fake_decode=True derives the duration from the content hash and tags
    each frame by (content, frame_idx); batches are small because real
    frame payloads multiply row width."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                rows = []
                for doc_id, payload in zip(chunk["doc_id"], chunk["payload"]):
                    if not fake_decode:
                        raise NotImplementedError(
                            "frame decode requires a video codec; plug libav in here"
                        )
                    md = hashlib.md5(bytes(payload)).hexdigest()
                    dur = _fake_duration_ms(md)
                    n = min(dur // every_ms + 1, max_frames)
                    for i in range(n):
                        rows.append(
                            (int(doc_id), i, i * every_ms,
                             hashlib.md5(f"{md}#{i}".encode()).hexdigest())
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in FRAME_SCHEMA.fields]
                )

    return src.mapInPandas(batches, schema=FRAME_SCHEMA)
