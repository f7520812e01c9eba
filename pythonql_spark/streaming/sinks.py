"""Streaming sinks — the operational end of the pipeline.

A 100 TB ingest never finishes; it checkpoints.  These helpers pin
the two things that make a streaming write restartable and
exactly-once: a checkpoint location (offsets + sink commit log) and
an explicit trigger.  With the file sink, a restarted query resumes
from the recorded offsets and never re-commits a batch it already
wrote — re-running after success appends nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_files(df: DataFrame, path: str, checkpoint: str, *,
                       fmt: str = "parquet",
                       partition_by: list[str] | None = None,
                       trigger: dict | None = None,
                       query_name: str | None = None) -> StreamingQuery:
    """Exactly-once file sink: append micro-batches as ``fmt`` files
    under ``path``, offsets + commit log under ``checkpoint`` (must be
    a durable path; losing it loses exactly-once).  ``trigger``
    defaults to ``{"availableNow": True}`` — drain what's available
    and stop — pass ``{"processingTime": "10 seconds"}`` for a
    continuous micro-batch cadence."""
    w = (df.writeStream.format(fmt)
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if query_name:
        w = w.queryName(query_name)
    return w.trigger(**(trigger or {"availableNow": True})).start()


def run_to_completion(query: StreamingQuery, timeout_s: int = 300) -> None:
    """Await an availableNow-style bounded drain and surface any
    streaming exception instead of a silent hang.  awaitTermination
    returns False on timeout with the query still running — stop it
    and raise rather than reporting a drain that never finished."""
    try:
        finished = query.awaitTermination(timeout_s)
    finally:
        if query.exception() is not None:
            raise query.exception()
    if not finished:
        # awaitTermination(timeout) returning False races with the
        # drain completing; re-check before declaring a hang
        if not query.isActive:
            return
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name or query.id} still running "
            f"after {timeout_s}s; stopped without completing the drain")
