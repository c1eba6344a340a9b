from .latest_state import latest_rows, inventory
from .asof import asof_join, asof_join_dense

__all__ = ["latest_rows", "inventory", "asof_join", "asof_join_dense"]
