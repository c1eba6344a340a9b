from .registry import QUERIES, Query, get_queries, get_oracle_sql

__all__ = ["QUERIES", "Query", "get_queries", "get_oracle_sql"]
