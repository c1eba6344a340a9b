"""blockchain_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of helium/blockchain-etl (reference at
/root/reference/, studied in SURVEY.md).

Not a port: the reference is an Erlang ingest service writing to Postgres; this
engine re-expresses every operator it implements (SURVEY.md §2) as idiomatic
PySpark DataFrame/SQL plans, plus the large-scale training-data operations
(dedup, similarity search, text analysis) a 100 TB pipeline needs.

Public surface:

    from blockchain_etl_spark import get_spark, queries, BlockIngest

    spark = get_spark()
    df = queries()["account_activity_flagship"](spark, "/data/sf0.1")

CLI: ``python -m blockchain_etl_spark --help`` (ingest / compact / snapshot /
backfill / query).
"""

from __future__ import annotations

__version__ = "0.1.0"


def get_spark(*args, **kwargs):
    from .session import get_spark as _get

    return _get(*args, **kwargs)


def queries():
    """name → builder(spark, sf_dir) for every registered query."""
    from .plans.registry import get_queries

    return get_queries()


def oracle_sql():
    """name → DuckDB-executable ANSI-SQL oracle for each query."""
    from .plans.registry import get_oracle_sql

    return get_oracle_sql()


_LAZY = {
    "BlockFilesDataSource": (
        "blockchain_etl_spark.sources.blockfiles",
        "BlockFilesDataSource",
    ),
    "BlockIngest": ("blockchain_etl_spark.streaming.ingest", "BlockIngest"),
    "CodebookState": ("blockchain_etl_spark.operators.kmeans", "CodebookState"),
    "DocIngest": ("blockchain_etl_spark.streaming.docs", "DocIngest"),
    "MinHashIndex": ("blockchain_etl_spark.operators.lsh_index", "MinHashIndex"),
    "IVFIndex": ("blockchain_etl_spark.operators.ann_index", "IVFIndex"),
    "ContinuousAggregate": ("blockchain_etl_spark.operators.rollup", "ContinuousAggregate"),
    "read_jsonl_documents": (
        "blockchain_etl_spark.sources.textcorpus",
        "read_jsonl_documents",
    ),
    "read_csv_documents": (
        "blockchain_etl_spark.sources.textcorpus",
        "read_csv_documents",
    ),
}


def __getattr__(name):
    # lazy so `import blockchain_etl_spark` stays instant (no Spark import)
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)


__all__ = [
    "get_spark",
    "queries",
    "oracle_sql",
    "BlockIngest",
    "DocIngest",
    "MinHashIndex",
    "IVFIndex",
    "ContinuousAggregate",
    "read_jsonl_documents",
    "read_csv_documents",
    "__version__",
]
