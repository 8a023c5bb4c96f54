from .explain import (
    broadcast_join_count,
    checkpoint_audit,
    final_broadcast_join_count,
    exchange_count,
    keyed_exchange_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    simple_plan,
    sortmerge_join_count,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_join_count",
    "checkpoint_audit",
    "final_broadcast_join_count",
    "exchange_count",
    "keyed_exchange_count",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "simple_plan",
    "sortmerge_join_count",
    "wholestage_codegen_count",
]
