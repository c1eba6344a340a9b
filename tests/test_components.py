"""propagate_min_labels: correctness bound on rounds — partial labels must
never be returned silently (they would split components and diverge from
the exact recursive-CTE oracles)."""

from __future__ import annotations

import pytest

from blockchain_etl_spark.operators.components import propagate_min_labels


def _chain(spark, n):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    return nodes, edges


def test_converges_on_chain(spark):
    nodes, edges = _chain(spark, 10)
    labels = propagate_min_labels(nodes, edges, max_rounds=30)
    assert {r["label"] for r in labels.collect()} == {0}


def test_raises_instead_of_returning_partial_labels(spark):
    # a 12-node chain needs ~log-diameter+1 rounds; 2 rounds cannot reach
    # the fixpoint CHECK (which needs one extra unchanged round) — the
    # operator must refuse rather than hand back split components.
    nodes, edges = _chain(spark, 12)
    with pytest.raises(RuntimeError, match="fixpoint"):
        propagate_min_labels(nodes, edges, max_rounds=2)
