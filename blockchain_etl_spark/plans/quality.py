"""Data-quality, governance, and entity-resolution plans (round 4).

A production corpus pipeline needs preflight gates before any training run:
expectation suites (Great-Expectations shape), referential-integrity audits,
k-anonymity checks before release, fuzzy entity resolution for source
canonicalization, and temporal (SCD Type 2) state tracking. The reference's
operational analog is its data-consistency fixups and backfill repairs
(``/root/reference/src/be_db_backfill.erl:22-43``, ``migrations/
1586300385-rebuild_first_blocks.sql:4-11``) — checks it ran as one-off SQL;
here they are first-class, oracle-checked operators.

Determinism: all rates/ratios are integer fixed-point (ppm); fuzzy matching
uses exact levenshtein over a deterministic md5-derived corruption; interval
tie-breaks ride event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..sources.testdata import load_table
from .registry import register

_LANG_WHITELIST = ("de", "en", "es", "fr", "zh")


# --------------------------------------------------------------------------
# Expectation suite: one corpus scan, N checks. The Great-Expectations /
# dbt-test shape: each expectation folds into the SAME single hash
# aggregate (conditional counts), then unpivots to one row per check —
# adding a check costs a column, never another pass over 100 TB.
# --------------------------------------------------------------------------
@register(
    "doc_expectations_audit",
    sql=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS v_empty,
             CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
               AS BIGINT) AS v_nchars,
             CAST(SUM(CASE WHEN lang NOT IN {str(_LANG_WHITELIST)} THEN 1 ELSE 0 END)
               AS BIGINT) AS v_lang,
             CAST(SUM(CASE WHEN n_chars < 1 OR n_chars > 100000 THEN 1 ELSE 0 END)
               AS BIGINT) AS v_range,
             CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS v_dupid
      FROM documents)
    SELECT 'doc_id_unique' AS check_name, n_rows, v_dupid AS n_violations,
           CASE WHEN v_dupid = 0 THEN 1 ELSE 0 END AS passed FROM agg
    UNION ALL
    SELECT 'lang_whitelisted', n_rows, v_lang,
           CASE WHEN v_lang = 0 THEN 1 ELSE 0 END FROM agg
    UNION ALL
    SELECT 'n_chars_in_range', n_rows, v_range,
           CASE WHEN v_range = 0 THEN 1 ELSE 0 END FROM agg
    UNION ALL
    SELECT 'n_chars_matches_text', n_rows, v_nchars,
           CASE WHEN v_nchars = 0 THEN 1 ELSE 0 END FROM agg
    UNION ALL
    SELECT 'text_nonempty', n_rows, v_empty,
           CASE WHEN v_empty = 0 THEN 1 ELSE 0 END FROM agg
    """,
    survey_ops=(),
    doc="Expectation-suite preflight over the documents table: five checks "
    "(unique key, language whitelist, value range, derived-column "
    "consistency, non-empty text) folded into ONE hash aggregate over a "
    "single corpus scan, then unpivoted to a row per check. The 100 TB "
    "shape: map-side conditional counts -> 1-row reduce; adding a check "
    "adds a column to the same pass, never a new scan. Mirrors the "
    "reference's ad-hoc consistency fixups (be_db_backfill.erl:22-43) as "
    "a standing gate.",
)
def doc_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)
        ).alias("v_empty"),
        F.sum(F.when(col("n_chars") != F.length("text"), 1).otherwise(0)).alias("v_nchars"),
        F.sum(F.when(~col("lang").isin(*_LANG_WHITELIST), 1).otherwise(0)).alias("v_lang"),
        F.sum(F.when((col("n_chars") < 1) | (col("n_chars") > 100000), 1).otherwise(0)).alias(
            "v_range"
        ),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("v_dupid"),
    )
    # unpivot: stack() is a zero-shuffle projection over the 1-row aggregate
    checks = [
        ("doc_id_unique", "v_dupid"),
        ("lang_whitelisted", "v_lang"),
        ("n_chars_in_range", "v_range"),
        ("n_chars_matches_text", "v_nchars"),
        ("text_nonempty", "v_empty"),
    ]
    stack_expr = "stack({}, {}) AS (check_name, n_violations)".format(
        len(checks), ", ".join(f"'{name}', {v}" for name, v in checks)
    )
    return agg.select(F.expr(stack_expr), "n_rows").select(
        "check_name",
        "n_rows",
        "n_violations",
        F.when(col("n_violations") == 0, 1).otherwise(0).cast("int").alias("passed"),
    )


# --------------------------------------------------------------------------
# Referential-integrity audit: orphan counts for each FK edge of the
# schema. Scale shape: the fact side is pre-aggregated to (fk, n) BEFORE
# the anti-join, so only distinct keys + counts cross the wire — never
# fact rows.
# --------------------------------------------------------------------------
@register(
    "referential_integrity_audit",
    sql="""
    WITH lo AS (
      SELECT l_orderkey AS fk, COUNT(*) AS n FROM lineitem GROUP BY 1),
    lp AS (
      SELECT l_partkey AS fk, COUNT(*) AS n FROM lineitem GROUP BY 1),
    oc AS (
      SELECT o_custkey AS fk, COUNT(*) AS n FROM orders GROUP BY 1)
    SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COALESCE(SUM(CASE WHEN miss THEN n END), 0) AS BIGINT) AS n_orphan_rows,
           COUNT(*) FILTER (WHERE miss) AS n_orphan_keys
    FROM (SELECT n, NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = lo.fk) AS miss
          FROM lo) t
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN miss THEN n END), 0) AS BIGINT),
           COUNT(*) FILTER (WHERE miss)
    FROM (SELECT n, NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = lp.fk) AS miss
          FROM lp) t
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN miss THEN n END), 0) AS BIGINT),
           COUNT(*) FILTER (WHERE miss)
    FROM (SELECT n, NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = oc.fk) AS miss
          FROM oc) t
    """,
    survey_ops=("J6",),
    doc="Referential-integrity preflight: orphan-row and orphan-key counts "
    "per FK edge (lineitem->orders, lineitem->part, orders->customer). "
    "Scale shape: each fact side first collapses to (fk, row_count) — a "
    "map-combinable aggregate — and only that key-grain frame joins the "
    "PK side, so the join input is |distinct keys| not |rows|. One row "
    "per FK edge always (stable schema; zeros mean clean), with total "
    "key counts for context.",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")

    def orphans(fact_keys: DataFrame, pk: DataFrame, edge: str) -> DataFrame:
        marked = fact_keys.join(pk.withColumn("__pk", F.lit(1)), ["fk"], "left")
        miss_n = F.when(col("__pk").isNull(), col("n"))
        return marked.agg(
            F.lit(edge).alias("fk_edge"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.coalesce(F.sum(miss_n), F.lit(0)).cast("long").alias("n_orphan_rows"),
            F.count(F.when(col("__pk").isNull(), 1)).alias("n_orphan_keys"),
        )

    lo = lineitem.groupBy(col("l_orderkey").alias("fk")).agg(F.count(F.lit(1)).alias("n"))
    lp = lineitem.groupBy(col("l_partkey").alias("fk")).agg(F.count(F.lit(1)).alias("n"))
    oc = orders.groupBy(col("o_custkey").alias("fk")).agg(F.count(F.lit(1)).alias("n"))
    return (
        orphans(lo, orders.select(col("o_orderkey").alias("fk")), "lineitem.l_orderkey -> orders")
        .unionAll(orphans(lp, part.select(col("p_partkey").alias("fk")), "lineitem.l_partkey -> part"))
        .unionAll(orphans(oc, customer.select(col("c_custkey").alias("fk")), "orders.o_custkey -> customer"))
    )


# --------------------------------------------------------------------------
# k-anonymity audit: quasi-identifier group sizes before a data release.
# --------------------------------------------------------------------------
_K_ANON = 5


@register(
    "events_k_anonymity",
    sql=f"""
    WITH g AS (
      SELECT event_type,
             CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
             user_id % 100 AS user_bucket,
             COUNT(*) AS grp_n
      FROM events
      GROUP BY 1, 2, 3)
    SELECT CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_groups,
           CAST(MIN(grp_n) AS BIGINT) AS min_group_size,
           COUNT(*) FILTER (WHERE grp_n < {_K_ANON}) AS n_groups_below_k,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < {_K_ANON}), 0) AS BIGINT)
             AS n_rows_at_risk,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < {_K_ANON}), 0) * 1000000
                // SUM(grp_n) AS BIGINT) AS risk_ppm
    FROM g
    """,
    survey_ops=(),
    doc=f"k-anonymity release gate (k={_K_ANON}) over the quasi-identifier "
    "(event_type, hour-of-day, user bucket): any QI combination observed "
    "fewer than k times re-identifies its members, so the audit reports "
    "group count, minimum group size, and rows-at-risk as a ppm rate. "
    "Scale shape: one map-combinable groupBy on the QI key, then a 1-row "
    "reduce over the group-size frame — the second aggregate's input is "
    "|QI combinations|, not |rows|. Integer ppm keeps both engines exact.",
)
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        "event_type",
        F.hour("ts").cast("long").alias("hour_of_day"),
        (col("user_id") % 100).alias("user_bucket"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    below = F.when(col("grp_n") < _K_ANON, col("grp_n"))
    return g.agg(
        F.sum("grp_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp_n").cast("long").alias("min_group_size"),
        F.count(below).alias("n_groups_below_k"),
        F.coalesce(F.sum(below), F.lit(0)).cast("long").alias("n_rows_at_risk"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN grp_n < {_K_ANON} THEN grp_n END), 0) * 1000000"
            " div SUM(grp_n) AS BIGINT)"
        ).alias("risk_ppm"),
    )


# --------------------------------------------------------------------------
# Fuzzy entity resolution via SymSpell-style deletion neighborhoods.
#
# The scale-correct way to fuzzy-join two name sets under edit distance 1:
# every name expands to its <= len+1 single-deletion variants (the name
# itself plus each drop-one-char form); two strings within edit distance 1
# ALWAYS share a variant (delete-delete covers substitution, identity-delete
# covers insertion/deletion), so an EQUI-join on the variant finds every
# candidate — no quadratic self-join, no giant blocks. Fan-out is bounded
# by name length; the equi-join key (variant string) is md5-distributed.
# Candidates are then verified with exact levenshtein.
# --------------------------------------------------------------------------
@register(
    "customer_name_match",
    sql="""
    WITH mention AS (
      SELECT c_custkey AS mention_id,
             CASE WHEN CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6)
                       AS BIGINT) % 2 = 0
                  THEN substr(c_name, 1, 8 + CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6) AS BIGINT) % 10)
                       || substr(c_name, 10 + CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6) AS BIGINT) % 10)
                  ELSE c_name END AS mention
      FROM customer),
    mvar AS (
      SELECT mention_id, mention,
             CASE WHEN i = 0 THEN mention
                  ELSE substr(mention, 1, i - 1) || substr(mention, i + 1) END AS variant
      FROM (SELECT mention_id, mention,
                   unnest(range(0, length(mention) + 1)) AS i
            FROM mention)),
    cvar AS (
      SELECT c_custkey, c_name,
             CASE WHEN i = 0 THEN c_name
                  ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END AS variant
      FROM (SELECT c_custkey, c_name,
                   unnest(range(0, length(c_name) + 1)) AS i
            FROM customer))
    SELECT mention_id, mention, c_custkey, c_name,
           CAST(levenshtein(mention, c_name) AS BIGINT) AS dist
    FROM (SELECT DISTINCT m.mention_id, m.mention, c.c_custkey, c.c_name
          FROM mvar m JOIN cvar c ON m.variant = c.variant) cand
    WHERE levenshtein(mention, c_name) <= 1
    """,
    survey_ops=(),
    doc="Fuzzy entity resolution (edit distance <= 1) between a dirty "
    "mention set (deterministic md5-derived one-char deletions of half the "
    "customer names) and the canonical registry, via SymSpell deletion "
    "neighborhoods: each side expands to its <= len+1 single-deletion "
    "variants and candidates come from an EQUI-join on the variant — two "
    "strings within distance 1 always share one. Exact levenshtein then "
    "verifies candidates only. Scale shape: bounded map-side fan-out "
    "(len+1 per name) + one hash-distributed equi-join; no quadratic "
    "blocking, no cross join — the classic way a 100 TB mention table "
    "resolves against a registry.",
)
def customer_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # deterministic dirty mentions: even md5 bucket -> delete one character
    # at an md5-chosen position inside the digit suffix; odd -> verbatim
    bucket = "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 6), 16, 10) AS BIGINT)"
    pos = "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 7, 6), 16, 10) AS BIGINT)"
    mention = cust.select(
        col("c_custkey").alias("mention_id"),
        F.expr(
            f"""CASE WHEN {bucket} % 2 = 0
                 THEN concat(substring(c_name, 1, 8 + {pos} % 10),
                             substring(c_name, 10 + {pos} % 10))
                 ELSE c_name END"""
        ).alias("mention"),
    )

    def deletion_variants(df: DataFrame, text_col: str) -> DataFrame:
        # array_distinct BEFORE exploding: deleting any char of a repeated
        # run yields the SAME variant (names like Customer#000000012 have
        # 7-zero runs), and duplicate variants on both sides multiply the
        # join fan-out ~run²×. Distinct variants per name keep the
        # candidate join linear in the true neighborhood size.
        return df.select(
            "*",
            F.explode(
                F.expr(
                    f"""array_distinct(transform(sequence(0, length({text_col})),
                         i -> CASE WHEN i = 0 THEN {text_col}
                              ELSE concat(substring({text_col}, 1, i - 1),
                                          substring({text_col}, i + 1)) END))"""
                )
            ).alias("variant"),
        )

    # candidate pairs dedupe on IDS ONLY (16 bytes/row through the
    # distinct shuffle instead of four strings — measured 2.4x at sf0.1);
    # names re-attach afterwards by key join for the levenshtein verify.
    # The candidate equi-join itself rides xxhash64(variant) — 8 bytes on
    # the wire instead of the ~25-char variant string (guide: shuffle
    # fewer bytes). A 64-bit collision can only ADD a candidate pair,
    # which the exact levenshtein verify below drops — the same
    # no-false-negatives contract as a Bloom pre-filter — so the output
    # is identical by construction, not probabilistically.
    mvar = deletion_variants(mention.select("mention_id", "mention"), "mention").select(
        "mention_id", F.xxhash64("variant").alias("vh")
    )
    cvar = deletion_variants(cust, "c_name").select(
        "c_custkey", F.xxhash64("variant").alias("vh")
    )
    pairs = mvar.join(cvar, ["vh"]).select("mention_id", "c_custkey").distinct()
    return (
        pairs.join(mention, ["mention_id"])
        .join(cust, ["c_custkey"])
        .select(
            "mention_id",
            "mention",
            "c_custkey",
            "c_name",
            F.levenshtein("mention", "c_name").cast("long").alias("dist"),
        )
        .filter(col("dist") <= 1)
    )


# --------------------------------------------------------------------------
# SCD Type 2: per-user state intervals from the event stream. The
# temporal-dimension build every warehouse needs: collapse consecutive
# identical states, emit [valid_from, valid_to) with an is_current flag.
# --------------------------------------------------------------------------
@register(
    "user_state_intervals",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
             AS valid_to,
           CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY valid_from, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
    survey_ops=("W1", "J9"),
    doc="SCD Type 2 dimension build from the event stream: per user, "
    "consecutive identical event_types collapse into one validity interval "
    "[valid_from, valid_to) via change detection (lag) + interval close "
    "(lead), ties broken on event_id; the open interval is flagged "
    "is_current. This is the temporal generalization of the reference's "
    "inventory first_block/last_block bookkeeping (migrations/"
    "1590689602-gateway_inventory.sql:32-62). Scale shape: both windows "
    "share ONE user_id shuffle (same partition key and ordering), and the "
    "second window runs on the change rows only.",
)
def user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(col("prev_type").isNull() | (col("prev_type") != col("event_type")))
        .select("user_id", "event_type", col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.when(F.lead("valid_from").over(w2).isNull(), 1).otherwise(0).alias("is_current"),
    )


# --------------------------------------------------------------------------
# Bounded-round PageRank over the customer–supplier trade graph: the
# iterative-algorithm shape (superstep = join + aggregate) with integer
# fixed-point arithmetic so 3 rounds are bit-identical on both engines.
# --------------------------------------------------------------------------
_PR_ROUNDS = 3
_PR_SCALE = 10**12


def _pagerank_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.node, n.deg,
             base.b + COALESCE(s.contrib, 0) AS rank_fp
      FROM deg n
      CROSS JOIN base
      LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM((p.rank_fp * 85) // (100 * p.deg)) AS BIGINT) AS contrib
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        GROUP BY e.dst) s ON s.node = n.node)
    """


_PR_CHAIN = ",\n".join(
    _pagerank_round_sql(f"it{i}", f"it{i + 1}") for i in range(_PR_ROUNDS)
)


@register(
    "supplier_pagerank",
    sql=f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst FROM pairs
      UNION ALL
      SELECT 's' || CAST(l_suppkey AS VARCHAR),
             'c' || CAST(o_custkey AS VARCHAR) FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    base AS (SELECT ({_PR_SCALE} * 15) // (100 * n) AS b, n FROM nn),
    it0 AS (SELECT node, deg, {_PR_SCALE} // (SELECT n FROM nn) AS rank_fp FROM deg),
{_PR_CHAIN}
    SELECT CAST(substr(node, 2) AS BIGINT) AS s_suppkey,
           rank_fp AS rank_scaled
    FROM it{_PR_ROUNDS}
    WHERE node LIKE 's%'
    """,
    survey_ops=(),
    doc=f"PageRank ({_PR_ROUNDS} rounds, damping 0.85) over the bipartite "
    "customer-supplier trade graph (distinct order-lineitem pairs, edges "
    "both directions): the canonical iterative-graph shape — each "
    "superstep is one (edge join ranks) + groupBy(dst) — expressed with "
    "integer fixed-point ranks (1e12 scale, floor division) so all three "
    "rounds are bit-identical in Spark and the oracle's chained CTEs. "
    "Scale shape: ranks live at node grain (|V| rows), each round shuffles "
    "edge-contributions on dst; rounds are bounded a priori (not "
    "convergence-polled), matching how web-scale PageRank actually runs. "
    "Complements the connected-components operator "
    "(operators/components.py) as the second fixed-point graph primitive.",
)
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(lineitem, col("l_orderkey") == col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        F.concat(F.lit("c"), col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), col("l_suppkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionAll(fwd.select(col("dst").alias("src"), col("src").alias("dst")))
    # iterate from a stable frame: degree table = node set (every node has
    # deg >= 1 by construction, so there are no dangling nodes).
    # Measured alternative (rejected): pre-joining dst-degree onto the
    # edge frame to drop the per-round deg join was ~1.7x SLOWER at sf0.1
    # — the widened materialized edge frame costs more than the extra
    # node-grain join it saves.
    deg = edges.groupBy(col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    deg = deg.localCheckpoint()  # cut the lineage once; reused every round
    edges = edges.localCheckpoint()
    n = deg.count()
    base = (_PR_SCALE * 15) // (100 * n)
    ranks = deg.select(
        "node", "deg", F.lit(_PR_SCALE // n).cast("long").alias("rank_fp")
    )
    # Per-round joins BROADCAST the node-grain side (round 13): ranks and
    # contrib are |V| rows — dimension-sized on this bipartite trade graph
    # (customers + suppliers) — while the checkpointed edge frame loses
    # its partitioning (Scan ExistingRDD, UnknownPartitioning), so the
    # planner's sort-merge join re-shuffled and re-sorted all 2|pairs|
    # edge rows EVERY round (measured: 20 Exchanges in the final job).
    # Broadcasting ranks turns each round into one edge scan + map-side
    # hash join + a partial-aggregated contribution shuffle that is
    # node-grain on the wire. At web-scale |V| this flips back to a
    # co-partitioned merge join (bucket the edges by src once); here the
    # node side is dimension-sized by construction — the same call
    # session.py makes for the dimension tables.
    for _ in range(_PR_ROUNDS):
        contrib = (
            edges.join(broadcast(ranks), edges.src == ranks.node)
            .select(
                col("dst").alias("node"),
                F.expr("(rank_fp * 85) div (100 * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = deg.join(broadcast(contrib), ["node"], "left").select(
            "node",
            "deg",
            (F.lit(base) + F.coalesce(col("contrib"), F.lit(0))).alias("rank_fp"),
        )
    return ranks.filter(col("node").startswith("s")).select(
        F.expr("CAST(substring(node, 2) AS BIGINT)").alias("s_suppkey"),
        col("rank_fp").alias("rank_scaled"),
    )


# --------------------------------------------------------------------------
# Retrieval-ranking eval: MRR of the IVF index against exact ground truth.
# Complements knn_recall_eval (set overlap) with a POSITION-sensitive
# metric: where does the true nearest neighbor land in the approximate
# ranking? Integer ppm reciprocal ranks keep both engines exact.
# --------------------------------------------------------------------------
@register(
    "retrieval_mrr_eval",
    sql=None,  # composed from the sibling knn queries' SQL post-registration
    survey_ops=(),
    doc="Position-sensitive ANN quality gate: for each query, the true "
    "nearest neighbor (exact rank 1) is looked up in the IVF top-k; "
    "rr_ppm = 1000000 div rank (0 when missed). Complements recall@k — "
    "an index can have perfect recall while burying the true neighbor at "
    "rank k. Composes the registered exact + IVF queries, so the oracle "
    "is their SQL verbatim; the comparison join touches k rows per query.",
)
def retrieval_mrr_eval(
    spark: SparkSession,
    sf_dir: str,
    exact_topk: DataFrame | None = None,
    approx_topk: DataFrame | None = None,
) -> DataFrame:
    """``exact_topk``/``approx_topk``: pipeline callers that already hold
    the (qid, neighbor_id, rank) frames pass them here so the gate scores
    WITHOUT recomputing its subject queries (the gate-composition 2x the
    r04 verdict flagged); default None recomputes, keeping the registered
    oracle self-contained. tests/test_eval_gate_injection.py proves the
    injected path is result-identical."""
    from .similarity import _with_norm, knn_cosine_bruteforce, knn_cosine_ivf

    # ONE normed-corpus checkpoint shared by both recomputed arms (round
    # 13, same move as knn_recall_eval) — each arm otherwise materializes
    # its own identical embeddings+norm frame inside one eval DAG.
    corpus = None
    if exact_topk is None or approx_topk is None:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        )
        # lazy (round 14): materialize-once inside the first consumer's
        # job — see knn_recall_eval for the measured rationale
        corpus = _with_norm(emb, "embedding", "nrm").localCheckpoint(eager=False)
    if exact_topk is None:
        exact_topk = knn_cosine_bruteforce(spark, sf_dir, corpus=corpus)
    if approx_topk is None:
        approx_topk = knn_cosine_ivf(spark, sf_dir, corpus=corpus, eager_ckpt=False)
    exact1 = (
        exact_topk
        .filter(col("rank") == 1)
        .select("qid", col("neighbor_id").alias("true_nn"))
    )
    approx = approx_topk.select(
        "qid", col("neighbor_id").alias("true_nn"), col("rank").alias("approx_rank")
    )
    return exact1.join(approx, ["qid", "true_nn"], "left").select(
        "qid",
        "true_nn",
        col("approx_rank").cast("long").alias("approx_rank"),
        F.coalesce(
            F.expr("CAST(1000000 div approx_rank AS BIGINT)"), F.lit(0)
        ).alias("rr_ppm"),
    )


def _finalize_mrr_oracle() -> None:
    from . import similarity  # noqa: F401  (ensure siblings are registered)
    from .registry import QUERIES

    QUERIES["retrieval_mrr_eval"].sql = f"""
    WITH exact AS ({QUERIES["knn_cosine_bruteforce"].sql}),
    approx AS ({QUERIES["knn_cosine_ivf"].sql})
    SELECT e.qid, e.neighbor_id AS true_nn,
           CAST(a.rank AS BIGINT) AS approx_rank,
           COALESCE(CAST(1000000 // a.rank AS BIGINT), 0) AS rr_ppm
    FROM exact e
    LEFT JOIN approx a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
    WHERE e.rank = 1
    """


_finalize_mrr_oracle()


# --------------------------------------------------------------------------
# Entity-resolution evaluation gate — the matcher twin of the dedup/ANN
# recall gates: the corruption is deterministic, so ground truth is known
# (mention_id == c_custkey), and the matcher's candidate table can be
# scored exactly. trusted = the match a resolver would ACT on (unique
# minimal-distance candidate).
# --------------------------------------------------------------------------
@register(
    "name_match_eval",
    sql=None,  # composed from the registered matcher SQL post-registration
    survey_ops=(),
    doc="Entity-resolution quality gate over customer_name_match: "
    "per-mention, the minimal-distance candidates are the actionable "
    "match; a mention resolves CORRECTLY when its true customer "
    "(mention_id == c_custkey by construction) is the UNIQUE minimal "
    "candidate. Reports resolved/ambiguous/missed counts and "
    "precision-like resolution rate in ppm — the number that gates a "
    "matcher config change, exactly as the MinHash/SimHash recall gates "
    "gate sketch parameters. Cost: one aggregate over the match table.",
)
def name_match_eval(
    spark: SparkSession, sf_dir: str, matches: DataFrame | None = None
) -> DataFrame:
    """``matches``: a pipeline that already materialized the
    customer_name_match frame passes it here to skip the matcher re-run
    (2.8 s of the 3.4 s gate at sf0.1); default None recomputes so the
    registered oracle stays self-contained."""
    m = matches if matches is not None else customer_name_match(spark, sf_dir)
    # minimal-distance candidate set per mention via ONE window over the
    # mention partition instead of a groupBy(min) + join-back: the join
    # form consumes `m` twice, so the whole matcher (the expensive hash-
    # candidate + levenshtein verify pipeline) executed twice inside one
    # DAG; the window reads it once, and the groupBy right after reuses
    # the window's mention_id partitioning (no extra exchange). Same
    # rows: dist == min(dist) over the same grouping.
    from pyspark.sql import Window

    best = m.withColumn(
        "min_dist", F.min("dist").over(Window.partitionBy("mention_id"))
    ).filter(col("dist") == col("min_dist"))
    per = best.groupBy("mention_id").agg(
        F.count(F.lit(1)).alias("n_best"),
        F.count(F.when(col("c_custkey") == col("mention_id"), 1)).alias("true_in_best"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.count(F.when((col("n_best") == 1) & (col("true_in_best") == 1), 1)).alias(
            "n_resolved"
        ),
        F.count(F.when((col("n_best") > 1) & (col("true_in_best") >= 1), 1)).alias(
            "n_ambiguous"
        ),
        F.count(F.when(col("true_in_best") == 0, 1)).alias("n_missed"),
        F.expr(
            "CAST(COUNT(CASE WHEN n_best = 1 AND true_in_best = 1 THEN 1 END) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("resolution_ppm"),
    )


def _finalize_name_match_eval_oracle() -> None:
    from .registry import QUERIES

    QUERIES["name_match_eval"].sql = f"""
    WITH m AS ({QUERIES["customer_name_match"].sql}),
    mind AS (SELECT mention_id, MIN(dist) AS min_dist FROM m GROUP BY mention_id),
    best AS (
      SELECT m.* FROM m JOIN mind USING (mention_id) WHERE m.dist = mind.min_dist),
    per AS (
      SELECT mention_id,
             COUNT(*) AS n_best,
             COUNT(CASE WHEN c_custkey = mention_id THEN 1 END) AS true_in_best
      FROM best GROUP BY mention_id)
    SELECT COUNT(*) AS n_mentions,
           COUNT(CASE WHEN n_best = 1 AND true_in_best = 1 THEN 1 END) AS n_resolved,
           COUNT(CASE WHEN n_best > 1 AND true_in_best >= 1 THEN 1 END) AS n_ambiguous,
           COUNT(CASE WHEN true_in_best = 0 THEN 1 END) AS n_missed,
           CAST(COUNT(CASE WHEN n_best = 1 AND true_in_best = 1 THEN 1 END) * 1000000
                // COUNT(*) AS BIGINT) AS resolution_ppm
    FROM per
    """


_finalize_name_match_eval_oracle()


# --------------------------------------------------------------------------
# l-diversity audit — the second privacy release gate beside k-anonymity:
# a QI group can be large enough to pass k-anonymity and still leak via a
# HOMOGENEITY attack when (almost) every row shares one sensitive value.
# Distinct l-diversity counts sensitive values per QI group; the worst
# homogeneity share measures how close the corpus is to the attack.
# --------------------------------------------------------------------------
_L_DIV = 3


@register(
    "events_l_diversity",
    sql=f"""
    WITH g AS (
      SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
             user_id % 1000 AS user_bucket,
             event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3),
    q AS (
      SELECT hour_of_day, user_bucket,
             COUNT(*) AS n_sensitive,
             CAST(SUM(n) AS BIGINT) AS grp_n,
             CAST(MAX(n) AS BIGINT) AS top_n
      FROM g GROUP BY 1, 2)
    SELECT COUNT(*) AS n_groups,
           CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity,
           COUNT(*) FILTER (WHERE n_sensitive < {_L_DIV}) AS n_groups_below_l,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE n_sensitive < {_L_DIV}), 0)
             AS BIGINT) AS n_rows_at_risk,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE n_sensitive < {_L_DIV}), 0)
                * 1000000 // SUM(grp_n) AS BIGINT) AS risk_ppm,
           CAST(MAX(top_n * 1000000 // grp_n) AS BIGINT)
             AS worst_homogeneity_ppm
    FROM q
    """,
    survey_ops=(),
    doc=f"Distinct l-diversity release gate (l={_L_DIV}) with the "
    "quasi-identifier (hour-of-day, user bucket) and event_type as the "
    "sensitive attribute: a QI group whose rows carry fewer than l "
    "distinct sensitive values — or one dominated by a single value "
    "(worst_homogeneity_ppm) — leaks the sensitive attribute even when "
    "it passes the k-anonymity size gate (events_k_anonymity). Two "
    "map-combinable aggregates: (QI, sensitive) counts, then QI-grain "
    "diversity stats, then a 1-row reduce — the second stage's input is "
    "|QI x sensitive| combinations, never |rows|. Integer ppm only.",
)
def events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        F.hour("ts").cast("long").alias("hour_of_day"),
        (col("user_id") % 1000).alias("user_bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    q = g.groupBy("hour_of_day", "user_bucket").agg(
        F.count(F.lit(1)).alias("n_sensitive"),
        F.sum("n").cast("long").alias("grp_n"),
        F.max("n").cast("long").alias("top_n"),
    )
    below = F.when(col("n_sensitive") < _L_DIV, col("grp_n"))
    return q.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
        F.count(below).alias("n_groups_below_l"),
        F.coalesce(F.sum(below), F.lit(0)).cast("long").alias("n_rows_at_risk"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN n_sensitive < {_L_DIV} THEN grp_n END), 0)"
            " * 1000000 div SUM(grp_n) AS BIGINT)"
        ).alias("risk_ppm"),
        F.expr("CAST(MAX(top_n * 1000000 div grp_n) AS BIGINT)").alias(
            "worst_homogeneity_ppm"
        ),
    )


# --------------------------------------------------------------------------
# t-closeness audit — the third privacy release gate: a QI group can be
# large (passes k-anonymity) and diverse (passes l-diversity) yet still
# leak when its sensitive-value DISTRIBUTION differs sharply from the
# table-wide one (skewness attack: "this group skews to the top value
# band"). t-closeness bounds the earth-mover's distance between each
# group's distribution and the global distribution. The sensitive
# attribute here is ORDERED (event value band), so EMD has the closed
# form (1/(m-1)) * Σ_i |cumsum_i(p) - cumsum_i(q)| over the m ordered
# bins — pure integer arithmetic in ppm.
# --------------------------------------------------------------------------
_T_CLOSE_PPM = 200_000  # t = 0.2
_T_BINS = 10  # ordered 50-unit value bands, top band open


@register(
    "events_t_closeness",
    sql=f"""
    WITH e AS (
      SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day,
             user_id % 1000 AS user_bucket,
             LEAST(CAST(ROUND(value * 100) AS BIGINT) // 5000,
                   {_T_BINS - 1}) AS bin
      FROM events),
    gb AS (SELECT hour_of_day, user_bucket, bin, CAST(COUNT(*) AS BIGINT) AS n
           FROM e GROUP BY 1, 2, 3),
    grp AS (SELECT hour_of_day, user_bucket, CAST(SUM(n) AS BIGINT) AS grp_n
            FROM gb GROUP BY 1, 2),
    gdist AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS gn FROM gb GROUP BY bin),
    tot AS (SELECT CAST(SUM(gn) AS BIGINT) AS total FROM gdist),
    bins AS (SELECT unnest(generate_series(0, {_T_BINS - 1})) AS bin),
    dense AS (
      SELECT g.hour_of_day, g.user_bucket, b.bin, g.grp_n,
             COALESCE(gb.n, 0) AS n
      FROM grp g CROSS JOIN bins b
      LEFT JOIN gb ON gb.hour_of_day = g.hour_of_day
                  AND gb.user_bucket = g.user_bucket AND gb.bin = b.bin),
    cums AS (
      SELECT hour_of_day, user_bucket, bin, grp_n,
             (CAST(SUM(n) OVER (PARTITION BY hour_of_day, user_bucket
                    ORDER BY bin) AS BIGINT) * 1000000) // grp_n AS cum_g_ppm,
             (CAST(SUM(COALESCE(gl.gn, 0)) OVER (PARTITION BY hour_of_day,
                    user_bucket ORDER BY bin) AS BIGINT) * 1000000)
               // total AS cum_all_ppm
      FROM dense LEFT JOIN gdist gl USING (bin) CROSS JOIN tot),
    emd AS (
      SELECT hour_of_day, user_bucket, grp_n,
             CAST(SUM(ABS(cum_g_ppm - cum_all_ppm)) AS BIGINT)
               // {_T_BINS - 1} AS emd_ppm
      FROM cums GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(emd_ppm) AS BIGINT) AS worst_emd_ppm,
           COUNT(*) FILTER (WHERE emd_ppm > {_T_CLOSE_PPM})
             AS n_groups_above_t,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE emd_ppm > {_T_CLOSE_PPM}),
                         0) AS BIGINT) AS n_rows_at_risk,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE emd_ppm > {_T_CLOSE_PPM}),
                         0) * 1000000 // SUM(grp_n) AS BIGINT) AS risk_ppm
    FROM emd
    """,
    survey_ops=(),
    doc=f"t-closeness release gate (t=0.2) with the same quasi-identifier "
    "as the k-anonymity/l-diversity gates (hour-of-day, user bucket) and "
    f"ORDERED value bands (50-unit, {_T_BINS} bins) as the sensitive "
    "attribute: per-group earth-mover's distance to the global "
    "distribution via the cumulative-sum closed form, all ppm integers. "
    "Catches the skewness attack the other two gates miss. Scale shape: "
    "one (QI, bin) aggregate over rows, then everything is group-grain — "
    "the dense frame is groups x a constant 10 bins (explicit cross "
    "join), cumsums are 10-row windows, and the gate is a 1-row reduce. "
    "abs() operates on a ppm DIFFERENCE computed by subtraction — no "
    "negative division anywhere, so Spark div == DuckDB //.",
)
def events_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        F.hour("ts").cast("long").alias("hour_of_day"),
        (col("user_id") % 1000).alias("user_bucket"),
        F.expr(
            f"LEAST(CAST(ROUND(value * 100) AS BIGINT) div 5000L,"
            f" {_T_BINS - 1}L)"
        ).alias("bin"),
    )
    gb = e.groupBy("hour_of_day", "user_bucket", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # lazy: reused by group totals, global, dense join — with the total
    # riding a broadcast singleton the whole gate is one job
    gb = gb.localCheckpoint(eager=False)
    grp = gb.groupBy("hour_of_day", "user_bucket").agg(
        F.sum("n").cast("long").alias("grp_n")
    )
    glob = gb.groupBy("bin").agg(F.sum("n").cast("long").alias("gn"))
    # broadcast 1-row singleton, not a driver collect: the whole gate
    # stays one lazy plan (same convention as bm25_rank_frames).
    totf = glob.agg(F.sum("gn").cast("long").alias("__total"))
    bins = spark.range(_T_BINS).select(col("id").cast("long").alias("bin"))
    dense = (
        grp.crossJoin(broadcast(bins))
        .join(gb, ["hour_of_day", "user_bucket", "bin"], "left")
        .select(
            "hour_of_day",
            "user_bucket",
            "bin",
            "grp_n",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .join(broadcast(glob), ["bin"], "left")
        .select(
            "hour_of_day", "user_bucket", "bin", "grp_n", "n",
            F.coalesce("gn", F.lit(0)).cast("long").alias("gn"),
        )
    )
    wcum = (
        Window.partitionBy("hour_of_day", "user_bucket")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = dense.select(
        "hour_of_day",
        "user_bucket",
        "grp_n",
        F.sum("n").over(wcum).cast("long").alias("cum_n"),
        F.sum("gn").over(wcum).cast("long").alias("cum_gn"),
    ).crossJoin(broadcast(totf)).select(
        "hour_of_day",
        "user_bucket",
        "grp_n",
        F.expr("(cum_n * 1000000L) div grp_n").alias("cum_g_ppm"),
        F.expr("(cum_gn * 1000000L) div __total").alias("cum_all_ppm"),
    )
    emd = cums.groupBy("hour_of_day", "user_bucket", "grp_n").agg(
        F.expr(
            f"CAST(SUM(ABS(cum_g_ppm - cum_all_ppm)) AS BIGINT)"
            f" div {_T_BINS - 1}L"
        ).alias("emd_ppm")
    )
    above = F.when(col("emd_ppm") > _T_CLOSE_PPM, col("grp_n"))
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("emd_ppm").cast("long").alias("worst_emd_ppm"),
        F.count(above).alias("n_groups_above_t"),
        F.coalesce(F.sum(above), F.lit(0)).cast("long").alias("n_rows_at_risk"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN emd_ppm > {_T_CLOSE_PPM}"
            " THEN grp_n END), 0) * 1000000 div SUM(grp_n) AS BIGINT)"
        ).alias("risk_ppm"),
    )


# --------------------------------------------------------------------------
# PII detection + redaction — the pre-release privacy pass every public
# training corpus runs (emails, phone numbers, IPv4 addresses, SSN-shaped
# ids). The synthetic corpus carries no natural PII, so both engines
# INJECT the same deterministic spans (a pure function of doc_id) before
# detection — the operators under test are the regex detect/count/redact
# pipeline, and hash equality proves byte-identical behavior across
# Spark's Java regex and DuckDB's RE2 (patterns restricted to the common
# dialect: no lookaround, no backreferences, ASCII \b). 100 TB shape:
# pure map-side projection (regexp_count / regexp_replace inside codegen),
# one corpus scan, per-source 1-row reduce for the audit.
# --------------------------------------------------------------------------
# class -> (detect regex, redaction placeholder); order = redaction order
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)

# deterministic injected spans: doc_id % 7 picks the class, digits derive
# from doc_id; docs with doc_id % 10 = 4 gain a SECOND email so one doc
# can carry two classes (audit must count the doc once)
_PII_INJECT_SQL = """
    CASE doc_id % 7
      WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com now'
      WHEN 1 THEN text || ' call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      WHEN 2 THEN text || ' host 10.'
                  || CAST(doc_id % 200 AS VARCHAR) || '.'
                  || CAST((doc_id * 7) % 250 AS VARCHAR) || '.'
                  || CAST((doc_id * 13) % 250 AS VARCHAR) || ' up'
      WHEN 3 THEN text || ' ssn '
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' filed'
      ELSE text
    END
    || CASE WHEN doc_id % 10 = 4
            THEN ' and user' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
            ELSE '' END
"""


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    inject = _PII_INJECT_SQL.replace("VARCHAR", "STRING")
    return docs.select("doc_id", "source", F.expr(inject).alias("text"))


@register(
    "doc_pii_audit",
    sql=f"""
    WITH injected AS (
      SELECT doc_id, source, {_PII_INJECT_SQL} AS text FROM documents),
    counted AS (
      SELECT doc_id, source,
             {", ".join(
                 f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
                 f" AS n_{cls}"
                 for cls, pat, _ in _PII_PATTERNS)}
      FROM injected)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           COUNT(*) FILTER (WHERE n_email + n_ssn + n_phone + n_ipv4 > 0)
             AS docs_with_pii,
           {", ".join(
               f"COUNT(*) FILTER (WHERE n_{cls} > 0) AS docs_{cls},"
               f" CAST(SUM(n_{cls}) AS BIGINT) AS spans_{cls}"
               for cls, _, _ in _PII_PATTERNS)},
           CAST(SUM(n_email + n_ssn + n_phone + n_ipv4) AS BIGINT) AS n_spans
    FROM counted GROUP BY source
    """,
    survey_ops=(),
    doc="PII pre-release audit: per source, documents screened, documents "
    "carrying any PII (counted once even with multiple classes), and "
    "per-class document/span counts for emails, SSN-shaped ids, phone "
    "numbers and IPv4 addresses — the standing privacy gate a public "
    "corpus runs before release (the governance sibling of "
    "events_k_anonymity). Spans are injected deterministically from "
    "doc_id in BOTH engines (the synthetic corpus has no natural PII), "
    "so the hash proves the detect/count machinery identical across "
    "Java regex and RE2. Scale shape: map-side regexp_count inside "
    "whole-stage codegen, one corpus scan, per-source 1-row reduce.",
)
def doc_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    counted = _pii_docs(spark, sf_dir).select(
        "source",
        *[
            F.regexp_count("text", F.lit(pat)).cast("long").alias(f"n_{cls}")
            for cls, pat, _ in _PII_PATTERNS
        ],
    )
    total = sum(col(f"n_{cls}") for cls, _, _ in _PII_PATTERNS)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(total > 0, 1)).alias("docs_with_pii"),
    ]
    for cls, _, _ in _PII_PATTERNS:
        aggs.append(F.count(F.when(col(f"n_{cls}") > 0, 1)).alias(f"docs_{cls}"))
        aggs.append(F.sum(f"n_{cls}").cast("long").alias(f"spans_{cls}"))
    aggs.append(F.sum(total).cast("long").alias("n_spans"))
    return counted.groupBy("source").agg(*aggs)


@register(
    "doc_pii_redact",
    sql=f"""
    WITH injected AS (
      SELECT doc_id, {_PII_INJECT_SQL} AS text FROM documents),
    redacted AS (
      SELECT doc_id, text,
             {"".join("regexp_replace(" for _ in _PII_PATTERNS)}text,
             {", ".join(f"'{pat}', '{ph}', 'g')" for _, pat, ph in _PII_PATTERNS)}
             AS clean
      FROM injected)
    SELECT doc_id,
           CAST(length(text) - length(clean) AS BIGINT) AS n_chars_removed,
           {" + ".join(
               f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
               for _, pat, _ in _PII_PATTERNS)} AS n_spans_redacted,
           md5(clean) AS redacted_md5
    FROM redacted
    WHERE doc_id % 7 < 4 OR doc_id % 10 = 4
    """,
    survey_ops=(),
    doc="PII redaction: every detected span replaced by its class "
    "placeholder ([EMAIL]/[SSN]/[PHONE]/[IP]) in a fixed class order, "
    "emitting per-doc span counts, characters removed, and the md5 of "
    "the redacted text — hash equality proves the REDACTED BYTES "
    "identical across engines, not just the counts. Redaction is a "
    "single map-side projection (nested regexp_replace inside codegen): "
    "at 100 TB this is one pass over the corpus with no shuffle at all "
    "(the output keys on doc_id). Patterns are restricted to the "
    "Java-regex ∩ RE2 dialect so both engines replace the same spans.",
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _pii_docs(spark, sf_dir)
    clean = col("text")
    for _, pat, ph in _PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, ph)
    out = injected.select(
        "doc_id",
        "text",
        clean.alias("clean"),
        sum(
            F.regexp_count("text", F.lit(pat)).cast("long")
            for _, pat, _ in _PII_PATTERNS
        ).alias("n_spans_redacted"),
    )
    return out.filter((col("doc_id") % 7 < 4) | (col("doc_id") % 10 == 4)).select(
        "doc_id",
        (F.length("text") - F.length("clean")).cast("long").alias("n_chars_removed"),
        "n_spans_redacted",
        F.md5("clean").alias("redacted_md5"),
    )
