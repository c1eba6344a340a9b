from .numeric import dsum, dsum_expr, davg

__all__ = ["dsum", "dsum_expr", "davg"]
