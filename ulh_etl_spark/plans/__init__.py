"""Plan-introspection layer: the engine's `.explain("formatted")`
feedback loop, programmatic — assert that filters reached the scan,
small dimensions broadcast, and shuffles number what the algorithm
requires (SURVEY §4: Catalyst provides the optimizations; this layer
proves they actually fired)."""

from ulh_etl_spark.plans.inspect import (  # noqa: F401
    PlanFacts,
    broadcast_join_count,
    exchange_count,
    formatted_plan,
    partition_filters,
    plan_facts,
    pushed_filters,
    scan_columns,
    wholestage_codegen_spans,
)
