"""Batched key-value sink adapter (DynamoDB-compatible shape).

The reference writes its standardized output one blocking put_item per row
(`Configurable_ETL_Python.py:561-578`) and its consolidation store likewise
(`Data_Ingestion_Python.py:126-139`). The scale-correct pattern is
foreachPartition + a batch writer: each executor partition opens ONE client,
buffers `batch_size` items, and flushes — writes scale with executors, and
no rows ever collect to the driver.

`write_kv_batched` is storage-agnostic: it takes a writer factory
(per-partition, called on the executor) so the same code path serves
DynamoDB's batch_writer, an HTTP bulk endpoint, or the in-memory fake the
tests use. Idempotence is the store's key-overwrite semantics, matching the
reference's at-least-once posture.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


class BatchWriter:
    """Interface a writer factory must return. put() may buffer; flush()
    must make everything durable; close() flushes."""

    def put(self, item: dict) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def flush(self) -> None:  # pragma: no cover - interface
        pass

    def close(self) -> None:
        self.flush()


def write_kv_batched(
    df: DataFrame,
    writer_factory: Callable[[], BatchWriter],
    batch_size: int = 25,  # DynamoDB BatchWriteItem limit
) -> None:
    """Write every row as a dict item via per-partition batch writers.

    writer_factory runs ON THE EXECUTOR (must be picklable and create its
    own client — never close over a connection)."""

    def handle_partition(rows: Iterable) -> None:
        writer = writer_factory()
        n = 0
        try:
            for row in rows:
                writer.put(row.asDict(recursive=True))
                n += 1
                if n % batch_size == 0:
                    writer.flush()
        finally:
            writer.close()

    df.foreachPartition(handle_partition)


class DirectoryJsonWriter(BatchWriter):
    """Filesystem-backed batch writer used by tests and as the wiring
    example: each flush appends a JSON-lines file per partition-writer.
    Swap for boto3's table.batch_writer() in a real DynamoDB deployment."""

    def __init__(self, out_dir: str):
        import os
        import uuid

        os.makedirs(out_dir, exist_ok=True)
        self.path = f"{out_dir}/{uuid.uuid4().hex}.jsonl"
        self._buf: list[dict] = []

    def put(self, item: dict) -> None:
        self._buf.append(item)

    def flush(self) -> None:
        if not self._buf:
            return
        import json

        with open(self.path, "a") as f:
            for item in self._buf:
                f.write(json.dumps(item, default=str) + "\n")
        self._buf.clear()
