from log2ck_spark.streaming.job import (  # noqa: F401
    run_ingest_stream,
    windowed_stream,
    dedup_stream,
)
