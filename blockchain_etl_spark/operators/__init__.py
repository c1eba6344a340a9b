from .ann_index import IVFIndex
from .asof import asof_join, asof_join_dense
from .latest_state import inventory, latest_rows
from .lsh_index import MinHashIndex

__all__ = [
    "latest_rows",
    "inventory",
    "asof_join",
    "asof_join_dense",
    "MinHashIndex",
    "IVFIndex",
]
