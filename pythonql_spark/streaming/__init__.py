from pythonql_spark.streaming.windows import (
    dedup_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)
from pythonql_spark.streaming.stateful import (stateful_predicate_windows,
                                               stateful_sessionize)
from pythonql_spark.streaming.joins import interval_join
from pythonql_spark.streaming.sinks import run_to_completion, write_stream_files

__all__ = ["dedup_stream", "session_agg", "sliding_agg", "tumbling_agg",
           "with_watermark", "stateful_sessionize",
           "stateful_predicate_windows", "interval_join",
           "run_to_completion", "write_stream_files"]
from pythonql_spark.streaming.ingest import (bloom_dedup_ingest_stream,
                                             dedup_ingest_stream,
                                             drift_monitor_stream,
                                             int8_index_ingest_stream,
                                             pq_index_ingest_stream)
__all__ += ["bloom_dedup_ingest_stream", "dedup_ingest_stream",
            "drift_monitor_stream", "pq_index_ingest_stream",
            "int8_index_ingest_stream"]
