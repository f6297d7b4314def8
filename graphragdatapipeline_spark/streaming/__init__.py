from graphragdatapipeline_spark.streaming.ops import (  # noqa: F401
    dedup_keep_first,
    read_events_stream,
    session_windows,
    sliding_window_counts,
    tumbling_window_agg,
    write_foreach_batch,
)
