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
import sys

from pyspark.sql import DataFrame

# Hard bound on rows collected driver-side, enforcing the "bounded gate
# corpus" invariant structurally instead of by convention: the collect
# runs through a LIMIT of cap+1, so even a runaway fold lineage can
# never materialize more than cap+1 rows on the driver — same
# legitimacy class as the union-find collect cap
# (operators/component_index.py:_DRIVER_UF_CAP). Sized ~4 orders above
# the GATE_DOC_CAP=1200 doc-grain frames so shingle-grain planes
# (postings ~ docs x distinct shingles) and the 10x scaling probe stay
# on the fast path, while anything lake-proportional falls back to the
# distributed writer.
_DRIVER_ROWS_CAP = 5_000_000


def write_parquet_driver(
    df: DataFrame, directory: str, success_marker: bool = False
) -> bool:
    """Overwrite ``directory`` with ``df``'s rows as ONE parquet file,
    collected through the Arrow path. Returns False (writing nothing)
    when the frame's schema doesn't round-trip through Arrow OR the
    frame overflows ``_DRIVER_ROWS_CAP`` — the caller falls back to
    the distributed writer either way. Matches
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
    import pyarrow.lib
    import pyarrow.parquet as pq
    from pyspark.errors import PySparkTypeError

    try:
        # LIMIT cap+1 bounds the collect structurally (one execution —
        # the limit rides the same job); a frame that overflows it is
        # not a gate-bounded frame and takes the distributed writer.
        tbl = df.limit(_DRIVER_ROWS_CAP + 1).toArrow()
    except (PySparkTypeError, pyarrow.lib.ArrowException) as exc:
        # ONLY Arrow-conversion misses route to the fallback — an
        # execution failure in the fold lineage propagates (the
        # distributed writer would fail identically; retrying it
        # would just mask the real error with duplicated work).
        print(
            f"# arrowio: toArrow() miss ({type(exc).__name__}), "
            f"falling back to the distributed writer for {directory}",
            file=sys.stderr,
        )
        return False
    if tbl.num_rows > _DRIVER_ROWS_CAP:
        print(
            f"# arrowio: frame exceeds _DRIVER_ROWS_CAP="
            f"{_DRIVER_ROWS_CAP} rows, falling back to the distributed "
            f"writer for {directory}",
            file=sys.stderr,
        )
        return False
    shutil.rmtree(directory, ignore_errors=True)
    os.makedirs(directory, exist_ok=True)
    pq.write_table(tbl, os.path.join(directory, "part-00000.parquet"))
    if success_marker:
        with open(os.path.join(directory, "_SUCCESS"), "w"):
            pass
    return True


def collect_arrow_capped(df: DataFrame, cap: "int | None" = None):
    """``df`` → a ``pyarrow.Table``, or None when the frame is not
    driver-bounded: schema doesn't round-trip through Arrow, or the
    LIMIT-guarded collect overflows ``cap`` rows. One execution of the
    lineage either way (the limit rides the same job), so a caller that
    gets a table back has ALREADY paid the fold exactly once — the
    maintained-state operators use this to fuse their emptiness probe,
    bucket-list collect and segment write into a single job
    (operators/ivm.py, round 14)."""
    import pyarrow.lib
    from pyspark.errors import PySparkTypeError

    if cap is None:
        cap = _DRIVER_ROWS_CAP  # read at call time so tests can pin it
    try:
        tbl = df.limit(cap + 1).toArrow()
    except (PySparkTypeError, pyarrow.lib.ArrowException) as exc:
        print(
            f"# arrowio: toArrow() miss ({type(exc).__name__}), "
            f"caller falls back to the distributed path",
            file=sys.stderr,
        )
        return None
    if tbl.num_rows > cap:
        print(
            f"# arrowio: frame exceeds cap={cap} rows, "
            f"caller falls back to the distributed path",
            file=sys.stderr,
        )
        return None
    return tbl


def write_table_partitioned(tbl, directory: str, part_col: str) -> "list[int]":
    """Overwrite ``directory`` with ``tbl`` laid out exactly like
    ``df.write.partitionBy(part_col).parquet(directory)``: one
    ``part_col=<v>`` subdirectory per distinct integer value, one parquet
    file each, the partition column dropped from the files (readers
    re-derive it from the directory name, identical to Spark's writer).
    Returns the sorted distinct partition values. Bounded by construction:
    callers hand in a table that already passed collect_arrow_capped."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    shutil.rmtree(directory, ignore_errors=True)
    os.makedirs(directory, exist_ok=True)
    vals = sorted({int(v) for v in tbl.column(part_col).to_pylist()})
    for v in vals:
        sub = tbl.filter(pc.equal(tbl.column(part_col), v)).drop_columns([part_col])
        d = os.path.join(directory, f"{part_col}={v}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, "part-00000.parquet"))
    return vals
