"""Entity journeys: pack an event TABLE into one ordered
``array<struct>`` column per entity, so reference-style journey
queries (cust_journey_scenario_tests.py — `for cj in cust_journeys`,
nested `[select e for e in cj where …]`) run DISTRIBUTED over a
table instead of a driver-local list.

Scale shape: ONE shuffle (the per-entity collect_list); every journey
query after that — nested filters, month grids, next()-style
first-match — is per-row higher-order-function work inside the scan
of the packed table, zero further shuffles.  A journey is bounded by
its entity's event count, never the corpus, so the packed row stays
executor-sized at any corpus scale (the 100 TB contract: entities
with pathological event counts are a data-quality problem this
operator surfaces via ``max_events``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def to_journeys(df: DataFrame, entity_col: str, order_cols,
                *, journey_col: str = "cj",
                event_cols: list[str] | None = None,
                max_events: int | None = None) -> DataFrame:
    """(entity_col, journey_col array<struct>) — one row per entity,
    events sorted ascending by ``order_cols`` (which lead the struct,
    so ``sort_array``'s field-order comparison IS the event order).

    ``max_events`` (optional) fails fast if any entity exceeds it —
    at 100 TB an unbounded hot entity would brew an executor OOM
    thousands of tasks later; better to refuse with the id.  The
    guard is IN-PLAN (a conditional ``raise_error`` wrapping the
    packed column), so it costs zero extra jobs and zero extra
    passes: it fires during whatever job first materializes the
    journeys, naming the offending entity in the error.

    .. versionchanged:: round 10
       The guard moved in-plan: violations now surface LAZILY at
       materialization as an executor ``SparkRuntimeException``
       (Py4J-wrapped), not an eager driver-side ``ValueError`` at
       ``to_journeys()`` call time.  Callers that caught
       ``ValueError`` around the constructor must instead catch the
       Spark exception around the action that materializes the
       journeys (the message still names the offending entity)."""
    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)
    if event_cols is None:
        event_cols = [c for c in df.columns
                      if c != entity_col and c not in order_cols]
    packed = (df.groupBy(entity_col)
              .agg(F.sort_array(F.collect_list(
                  F.struct(*order_cols, *event_cols))).alias(journey_col)))
    if max_events is not None:
        msg = F.concat(
            F.lit(f"entity exceeds max_events={max_events}: "),
            F.col(entity_col).cast("string"), F.lit(" has "),
            F.size(F.col(journey_col)).cast("string"), F.lit(" events"))
        packed = packed.withColumn(
            journey_col,
            F.when(F.size(F.col(journey_col)) <= max_events,
                   F.col(journey_col))
            .otherwise(F.raise_error(msg)))
    return packed
