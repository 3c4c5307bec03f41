from .readers import load_table, load_all, register_views
from .writers import (
    write_bucketed,
    write_partitioned,
    write_repartitioned_sorted,
)

__all__ = [
    "load_table",
    "load_all",
    "register_views",
    "write_bucketed",
    "write_partitioned",
    "write_repartitioned_sorted",
]
