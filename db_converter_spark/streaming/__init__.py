from db_converter_spark.streaming.incremental import (  # noqa: F401
    start_incremental_ingest,
    windowed_event_stats,
)
