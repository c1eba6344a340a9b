"""Skew-resilient join — salting for hot keys (SURVEY §4 scale notes).

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime; salting is the explicit fallback for the worst case — a handful of
keys owning a large fraction of the fact side (e.g. one reward account
receiving most payouts). The fact side gets a random-but-deterministic salt
in [0, n); the dimension side is replicated n× with every salt value; the
join key becomes (key, salt) so one hot key spreads over n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join fact ⋈ dim on ``key`` with an n-way salt.

    The salt is ``pmod(hash(key, partition_id, row-in-partition), n)`` —
    deterministic within a run, decorrelated from the join key, and O(1)
    per row regardless of fact width (hashing every column of a wide fact
    row would cost more than the skew it fixes). Rows of one hot key
    spread uniformly because the monotonic row id varies within the key.
    The dimension side is exploded n× (only acceptable for dimension
    tables ≪ fact; that is exactly the skew-join scenario). Result equals
    the plain join, row for row.

    Only fact-preserving modes are accepted: ``inner``, ``left``,
    ``left_semi``, ``left_anti``. Salting is NOT sound for ``right`` /
    ``full`` (each unmatched dim row would surface once per salt bucket,
    n× duplicated) or ``cross`` (the (key, salt) equi-condition makes it
    not a cross join at all); those modes raise rather than silently
    return wrong row counts.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving; salting "
            f"duplicates unmatched dim rows per salt bucket. Allowed: "
            f"inner/left/left_semi/left_anti."
        )
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(
            F.hash(col(key), F.monotonically_increasing_id()), F.lit(salt_buckets)
        ),
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")
