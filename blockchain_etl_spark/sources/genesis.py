"""Genesis bootstrap — SURVEY §2 S8 (src/be_cli_genesis.erl:57-66): load the
genesis block from a JSON file into blocks/transactions frames so ingest can
start from height 1. P2 signature explode (src/be_db_block.erl:184-196)
lives here too since signatures arrive with block records.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .blockchain import SCHEMAS


def load_genesis(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Genesis JSON file → (blocks, transactions) DataFrames with the
    registry schemas. The file holds one block object with an inline
    transaction list (each txn's fields dict is re-serialized to the JSON
    payload column)."""
    with open(path) as f:
        g = json.load(f)
    block_row = {f.name: g.get(f.name) for f in SCHEMAS["blocks"].fields}
    blocks = spark.createDataFrame([Row(**block_row)], schema=SCHEMAS["blocks"])
    txns = spark.createDataFrame(
        [
            Row(
                block=g["height"],
                hash=t["hash"],
                time=g.get("time"),
                type=t["type"],
                fields=json.dumps(t.get("fields", {})),
            )
            for t in g.get("transactions", [])
        ],
        schema=SCHEMAS["transactions"],
    )
    return blocks, txns


def block_signatures(blocks: DataFrame) -> DataFrame:
    """P2: block → one row per (signer, signature)
    (src/be_db_block.erl:184-196). Input needs a
    `signatures array<struct<signer:string,signature:string>>` column."""
    return blocks.select(
        F.col("height").alias("block"),
        F.explode("signatures").alias("s"),
    ).select(
        "block",
        F.col("s.signer").alias("signer"),
        F.col("s.signature").alias("signature"),
    )
