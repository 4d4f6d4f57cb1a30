"""Plan inspection utilities — the engine's optimizer story is
'Catalyst does it'; these helpers let tests PROVE the plans stay
optimal (pushdown reached the scan, dims broadcast, no cartesian)."""

from engine.plans.inspect import (
    audited_checkpoint,
    captured_rdd_ids,
    checkpoint_concurrently,
    executed_exchange_ids,
    formatted_plan,
    has_broadcast_hash_join,
    has_cartesian_product,
    n_exchanges,
    n_executed_exchanges,
    pushed_filters,
    rdd_leaf_classes,
    record_iteration_plan,
)

__all__ = [
    "audited_checkpoint",
    "captured_rdd_ids",
    "checkpoint_concurrently",
    "executed_exchange_ids",
    "formatted_plan",
    "has_broadcast_hash_join",
    "has_cartesian_product",
    "n_exchanges",
    "n_executed_exchanges",
    "pushed_filters",
    "rdd_leaf_classes",
    "record_iteration_plan",
]
