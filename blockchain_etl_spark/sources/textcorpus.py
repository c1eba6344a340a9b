"""Text-corpus ingestion sources: JSONL and CSV document readers with an
explicit schema registry and corrupt-record quarantine.

Training corpora arrive as JSONL far more often than parquet; the rules
here mirror the engine's parquet discipline (SURVEY §1.2 "never schema
inference"):

- ALWAYS an explicit schema — inference costs a full extra pass at 100 TB
  and makes the output schema data-dependent.
- PERMISSIVE mode with a quarantine column: a malformed line must neither
  kill the job (FAILFAST) nor silently vanish (DROPMALFORMED); it lands in
  a `_corrupt_record` column the caller splits off and persists for audit.
- Readers return the raw frame; `split_corrupt` separates clean rows from
  quarantined lines. The split is two filters over one cached scan.

Scale notes: JSONL is line-splittable, so Spark parallelizes a single huge
file by byte ranges; gzipped inputs are NOT splittable — at 100 TB insist
on uncompressed/zstd-seekable or many files. `text()`+`from_json` is
deliberately avoided: `spark.read.json` pushes schema enforcement into the
scan and keeps the corrupt-line capture native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

# the documents-table contract (TESTDATA.md), as the explicit ingest schema
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_jsonl_documents(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Read a JSONL corpus with explicit schema + corrupt-line capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """Read a CSV corpus with explicit schema + corrupt-line capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_lines). Cached once so the two filters share
    a single scan — also required by Spark, which refuses a query selecting
    ONLY the internal corrupt column from an uncached json/csv relation."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt
