from .ingest import route_view, ingest_batch, start_file_ingest  # noqa: F401
from .windows import (  # noqa: F401
    tumbling_rollup,
    sliding_rollup,
    session_rollup,
    start_stream_rollup,
)
