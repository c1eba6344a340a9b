"""Driver-side parquet writes for gate-scoped bounded frames.

Inside a maintained-plane driver gate (session.gate_shuffle) every state
frame is bounded by the fixed gate corpus (sources/testdata.py:
GATE_DOC_CAP) — a few thousand rows regardless of sf. Spark's parquet
writer is built for the opposite regime: a write job schedules output
tasks, runs the Hadoop commit protocol (_temporary staging + renames),
and pays a few hundred ms of fixed cost per commit even for a 1-row
table — and the five doc gates commit dozens of plane versions each.
Routing those bounded writes through ``DataFrame.toArrow()`` (one
collect-style job executing the same fold lineage) plus a single
pyarrow file write removes the committer round trip entirely, with a
byte-identical read path (``spark.read.parquet`` on the directory).

Same class of move as the bounded driver union-find
(operators/component_index.py): legitimate BECAUSE the gate corpus is
size-invariant by design. Production ingest never enters a gate scope
and keeps the distributed writer.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_parquet_driver(
    df: DataFrame, directory: str, success_marker: bool = False
) -> bool:
    """Overwrite ``directory`` with ``df``'s rows as ONE parquet file,
    collected through the Arrow path. Returns False (writing nothing)
    when the frame's schema doesn't round-trip through Arrow — the
    caller falls back to the distributed writer. Matches
    ``df.write.mode("overwrite").parquet(directory)`` semantics: the
    target directory is replaced atomically-enough for the merge
    targets' publish model (the version pointer flip is the real
    commit; an orphan directory above the pointer is already ignored
    by readers). ``success_marker``: also write the ``_SUCCESS`` file
    Spark's committer leaves — LAST, after the data file, preserving
    the chunk-commit protocol consumers like
    DocIngest._complete_chunks rely on (a crash mid-write leaves a
    marker-less dir = in-flight debris, exactly as with the
    distributed writer)."""
    import pyarrow.parquet as pq

    try:
        tbl = df.toArrow()
    except Exception:
        return False
    shutil.rmtree(directory, ignore_errors=True)
    os.makedirs(directory, exist_ok=True)
    pq.write_table(tbl, os.path.join(directory, "part-00000.parquet"))
    if success_marker:
        with open(os.path.join(directory, "_SUCCESS"), "w"):
            pass
    return True
