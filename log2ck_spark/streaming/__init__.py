from log2ck_spark.streaming.job import (  # noqa: F401
    dedup_stream,
    run_ingest_stream,
    stop_all,
    windowed_stream,
)
from log2ck_spark.streaming.listener import OpsLogListener  # noqa: F401
