"""Regime-matrix accuracy gates for every estimator family.

Why this suite exists (the r05 lesson): the portable estimators are
hash-verified against DuckDB oracles that MIRROR the same spec text, so a
regime-specific formula inversion (r05's inverted harmonic sum, which
exploded dense-regime HLL estimates by ~1e15x while the sparse
linear-counting branch hid it from small-sf tests) reproduces identically
on both engines and sails straight through the hash gate. These tests
compare each estimator against GROUND TRUTH on synthetic inputs pinned to
each operating regime — sparse/linear-counting, transition, dense — so an
inversion in any single branch fails loudly.

Everything here is deterministic (md5-derived hashing, fixed synthetic
corpora): a bound that passes once passes forever, and a formula change
that moves an estimate out of its regime band is a hard failure, not
flake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from blockchain_etl_spark.functions import hll


# ---------------------------------------------------------------- HLL ----
@pytest.mark.parametrize(
    "n,rel_bound,abs_bound",
    [
        (5, 0.0, 2),          # deep sparse: linear counting ≈ exact
        (100, 0.15, 3),       # sparse: LC with light bucket collisions
        (240, 0.15, 0),       # transition: just under m=256 full buckets
        (1000, 0.20, 0),      # dense: LogLog branch, rsd 6.5% (3σ)
        (50000, 0.20, 0),     # deep dense: 60-bit rho ceiling, no saturation
    ],
)
def test_portable_hll_accuracy_per_regime(spark, n, rel_bound, abs_bound):
    df = spark.range(n).select(F.lit("g").alias("g"), col("id"))
    p = hll.partial(df, ["g"], "id")
    s = p.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr(hll.SUM_PRESENT_SQL)).cast("decimal(38,0)").alias("sum_present"),
    )
    est = s.select(hll.estimate_expr("est")).first().est
    assert abs(est - n) <= max(abs_bound, rel_bound * n), (n, est)


def test_portable_hll_regime_branches_are_both_exercised(spark):
    """Sanity on the matrix itself: the sparse rows must take the
    linear-counting branch (n_buckets < m) and the dense rows the LogLog
    branch (all buckets present) — otherwise the parametrized bounds are
    not testing what they claim."""
    out = {}
    for n in (5, 50000):
        df = spark.range(n).select(F.lit("g").alias("g"), col("id"))
        s = hll.partial(df, ["g"], "id").groupBy("g").agg(
            F.count(F.lit(1)).alias("n_buckets")
        )
        out[n] = s.first().n_buckets
    assert out[5] < hll.M
    assert out[50000] == hll.M


# ---------------------------------------------------------------- CMS ----
def _cms(spark, rows):
    from blockchain_etl_spark.plans.olap import _CMS_W, cms_estimates

    df = spark.createDataFrame([(k,) for k in rows], ["user_id"])
    got = {r.user_id: r for r in cms_estimates(df).collect()}
    n_total = len(rows)
    return got, n_total, _CMS_W


def test_cms_heavy_hitter_regime(spark):
    """Few heavy keys over a light tail — the CMS sweet spot: estimates
    are overestimates, heavy keys stay within the collision-mass band
    (~N/w per cell, min over 4 rows), and the top-k ORDER recovers the
    true heavy hitters."""
    rows = [f"heavy{i}" for i in range(5) for _ in range(500)]
    rows += [f"tail{i}" for i in range(400) for _ in range(2)]
    got, n, w = _cms(spark, rows)
    assert all(r.est_n >= r.exact_n for r in got.values())
    for i in range(5):
        r = got[f"heavy{i}"]
        assert r.est_n - r.exact_n <= 3 * n // w, (i, r)
    top5 = sorted(got.values(), key=lambda r: (-r.est_n, r.user_id))[:5]
    assert {r.user_id for r in top5} == {f"heavy{i}" for i in range(5)}


def test_cms_uniform_regime(spark):
    """All-light keys (collision-dominated): still never an
    underestimate, and the MEAN overestimate stays within the expected
    collision mass (the min-over-d rows concentrates below one cell's
    mean load)."""
    rows = [f"u{i}" for i in range(1500) for _ in range(3)]
    got, n, w = _cms(spark, rows)
    assert all(r.est_n >= r.exact_n for r in got.values())
    mean_over = sum(r.est_n - r.exact_n for r in got.values()) / len(got)
    assert mean_over <= 2 * n / w, mean_over


def test_cms_skewed_regime(spark):
    """Zipf-ish skew: the head estimate must not inflate beyond the
    collision band — a sketch-width or min-row inversion shows up here as
    a head estimate tracking the TOTAL mass instead of the key's."""
    rows = [f"z{i}" for i in range(1, 80) for _ in range(1000 // i)]
    got, n, w = _cms(spark, rows)
    assert all(r.est_n >= r.exact_n for r in got.values())
    head = got["z1"]
    assert head.exact_n == 1000
    assert head.est_n - head.exact_n <= 3 * n // w, head


# ------------------------------------------------------------ MinHash ----
def _minhash_mean_est(spark, pairs_per_regime, set_size, inter):
    """Build ``pairs_per_regime`` doc pairs with |A|=|B|=set_size and
    |A∩B|=inter (true J = inter / (2*set_size - inter)), return the mean
    signature-agreement estimate over the pairs."""
    from blockchain_etl_spark.plans.dedup import _NUM_HASHES, minhash_signatures

    rows = []
    for p in range(pairs_per_regime):
        ns = f"i{inter}p{p}"
        shared = [f"{ns}s{j}" for j in range(inter)]
        for j in range(set_size - inter):
            rows.append((2 * p, f"{ns}a{j}"))
            rows.append((2 * p + 1, f"{ns}b{j}"))
        for sh in shared:
            rows.append((2 * p, sh))
            rows.append((2 * p + 1, sh))
    df = spark.createDataFrame(rows, ["doc_id", "shingle"])
    sig = minhash_signatures(df)
    a = sig.select(*[col(c).alias(f"a_{c}") for c in sig.columns])
    b = sig.select(*[col(c).alias(f"b_{c}") for c in sig.columns])
    j = a.join(b, a.a_doc_id + 1 == b.b_doc_id).filter(col("a_doc_id") % 2 == 0)
    agree = sum(
        F.when(col(f"a_mh{k}") == col(f"b_mh{k}"), 1).otherwise(0)
        for k in range(_NUM_HASHES)
    )
    ests = [r.e / _NUM_HASHES for r in j.select(agree.alias("e")).collect()]
    assert len(ests) == pairs_per_regime
    return sum(ests) / len(ests)


def test_minhash_agreement_tracks_jaccard_per_regime(spark):
    """Mean signature agreement over 40 pairs per regime must land within
    3σ of the true Jaccard in the low (~0.1), mid (~0.5), and high (~0.9)
    similarity regimes, and the regime means must be strictly ordered —
    an inverted agreement formula (1 - a/k, a/k², band-hit count as
    similarity) fails both."""
    regimes = {}
    for inter, true_j in ((9, 9 / 91), (33, 33 / 67), (47, 47 / 53)):
        est = _minhash_mean_est(spark, pairs_per_regime=40, set_size=50, inter=inter)
        # σ(mean) = sqrt(J(1-J)/8)/sqrt(40) ≤ 0.028 — 0.09 is > 3σ
        assert abs(est - true_j) <= 0.09, (inter, est, true_j)
        regimes[true_j] = est
    ordered = [regimes[j] for j in sorted(regimes)]
    assert ordered[0] < ordered[1] < ordered[2], regimes


# ------------------------------------------------------------ SimHash ----
def _simhash_mean_hamming(spark, n_pairs, n_tokens, shared_frac):
    from blockchain_etl_spark.plans.dedup import simhash_signatures

    n_shared = int(n_tokens * shared_frac)
    rows = []
    for p in range(n_pairs):
        ns = f"f{int(shared_frac * 100)}p{p}"
        shared = " ".join(f"{ns}s{j}" for j in range(n_shared))
        a_own = " ".join(f"{ns}a{j}" for j in range(n_tokens - n_shared))
        b_own = " ".join(f"{ns}b{j}" for j in range(n_tokens - n_shared))
        rows.append((2 * p, f"{shared} {a_own}".strip()))
        rows.append((2 * p + 1, f"{shared} {b_own}".strip()))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = simhash_signatures(df)
    a = sig.select(col("doc_id").alias("ida"), col("simhash").alias("sa"))
    b = sig.select(col("doc_id").alias("idb"), col("simhash").alias("sb"))
    j = a.join(b, a.ida + 1 == b.idb).filter(col("ida") % 2 == 0)
    hams = [
        r.h
        for r in j.select(
            F.bit_count(F.expr("sa ^ sb")).cast("long").alias("h")
        ).collect()
    ]
    assert len(hams) == n_pairs
    return sum(hams) / len(hams)


def test_simhash_hamming_tracks_overlap_per_regime(spark):
    """Mean Hamming distance over 25 pairs per token-overlap regime:
    near-identical docs must sit at/below the accept threshold's
    neighborhood, disjoint docs near the 60-bit coin-flip distance (~30),
    and the means must be strictly ordered by overlap — a bit-packing or
    XOR inversion flattens or reverses the curve."""
    from blockchain_etl_spark.plans.dedup import _SIMHASH_MAX_HAMMING

    near = _simhash_mean_hamming(spark, 25, 200, 0.95)
    mid = _simhash_mean_hamming(spark, 25, 200, 0.50)
    far = _simhash_mean_hamming(spark, 25, 200, 0.00)
    assert near < mid < far, (near, mid, far)
    assert near <= 2 * _SIMHASH_MAX_HAMMING, near
    assert far >= 20, far
    # identical docs: exactly zero
    assert _simhash_mean_hamming(spark, 5, 200, 1.0) == 0.0


# ------------------------------------------------- histogram quantile ----
def _hist_quantile(spark, values, bin_width, q_num, q_den):
    """The events_approx_stats quantile construction at a configurable
    bin width: bin counts → cumulative → first bin whose cumulative count
    crosses ceil(q*n) (integer cross-multiply), bin lower edge returned."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(float(v),) for v in values], "value double")
    binned = df.select(
        (F.floor(col("value").cast("decimal(25,6)") / bin_width) * bin_width)
        .cast("long")
        .alias("cb")
    )
    hist = binned.groupBy("cb").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("cb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("cum", F.sum("n").over(w)).crossJoin(
        hist.groupBy().agg(F.sum("n").alias("tot"))
    )
    return cum.agg(
        F.min(F.when(col("cum") * q_den >= col("tot") * q_num, col("cb"))).alias("q")
    ).first().q


@pytest.mark.parametrize("bin_width", [1, 10, 100])
def test_histogram_quantile_rank_error_bounded_by_bin_mass(spark, bin_width):
    """The approximate regime the registered cent-bin query never enters:
    at coarser bins the returned edge's RANK error must stay within the
    largest single bin's mass — the histogram-quantile guarantee — on a
    heavy-tailed (Zipf-ish) distribution, per quantile level."""
    values = []
    for i in range(1, 400):
        values += [i * 3.17] * max(1, 400 // i)  # heavy head, long tail
    n = len(values)
    values_sorted = sorted(values)
    for q_num, q_den in ((1, 2), (9, 10), (99, 100)):
        edge = _hist_quantile(spark, values, bin_width, q_num, q_den)
        at_or_below = sum(1 for v in values_sorted if v <= edge + bin_width - 1e-9)
        strictly_below = sum(1 for v in values_sorted if v < edge)
        target = -(-q_num * n // q_den)  # ceil(q*n)
        # the true quantile's rank lies inside the chosen bin
        assert strictly_below < target <= at_or_below, (
            bin_width, q_num, q_den, edge, strictly_below, target, at_or_below
        )
