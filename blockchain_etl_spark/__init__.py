"""blockchain_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of helium/blockchain-etl (reference at
/root/reference/, studied in SURVEY.md).

Not a port: the reference is an Erlang ingest service writing to Postgres; this
engine re-expresses every operator it implements (SURVEY.md §2) as idiomatic
PySpark DataFrame/SQL plans, plus the large-scale training-data operations
(dedup, similarity search, text analysis) a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
