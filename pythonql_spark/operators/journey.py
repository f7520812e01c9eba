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
    thousands of tasks later; better to refuse here with the id."""
    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)
    if event_cols is None:
        event_cols = [c for c in df.columns
                      if c != entity_col and c not in order_cols]
    packed = (df.groupBy(entity_col)
              .agg(F.sort_array(F.collect_list(
                  F.struct(*order_cols, *event_cols))).alias(journey_col)))
    if max_events is not None:
        packed = packed.withColumn(
            "__n", F.size(F.col(journey_col)))
        bad = packed.filter(F.col("__n") > max_events) \
            .select(entity_col, "__n").head(3)
        if bad:
            raise ValueError(
                f"entities exceed max_events={max_events}: "
                + ", ".join(f"{r[0]}={r[1]}" for r in bad))
        packed = packed.drop("__n")
    return packed
