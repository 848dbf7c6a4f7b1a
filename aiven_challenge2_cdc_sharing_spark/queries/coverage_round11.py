"""Round-8 additions: CDC temporal algebra + pipeline operators the
first 552 queries didn't cover.

Authoring capped at ~2 batches this round per the round-7 verdict
(drain the driver queue faster than the registry grows); the batch
targets genuinely-new engine capability rather than more statistics:

- CDC temporal family: point-in-time (PIT) enrichment against the SCD2
  history, incremental-view-maintenance (IVM) of aggregates from the
  delta stream, watermark-bounded tombstone GC, a "delta sharing"-style
  change feed between two snapshot versions, and an at-least-once
  replay inflation audit.  The reference repo keeps only current state
  per key (consumer_to_opensearch.py:95-104); these are the warehouse
  temporal surfaces built on the same deterministic envelope log, so
  every oracle re-derives expected state arithmetically from
  cdc/generator.py's rules (insert at t0=id*1000ms, phone update v1->v2
  at t0+500s for id%3==0, delete at t0+900s for id%7==0, replays for
  id%11==0).
- ANN/embedding-pipeline: random-projection-tree candidate generation
  (a tree-structured ANN family distinct from the registry's LSH and
  IVF paths) and Matryoshka prefix-truncation fidelity.
- Sequence/eval: ClickHouse-style windowFunnel, Nelson-Aalen cumulative
  hazard, t-closeness (EMD) privacy audit, FIFO lot matching,
  cost-sensitive threshold selection, Neyman stratified allocation.

Cross-engine disciplines as established (SCALING.md): identical
aliases both sides, doubles rounded 2-6dp on both sides, integer
arithmetic for money/keys, total tie-break order on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cdc import generate_envelope_log, latest_snapshot, scd2_history, unwrap
from ..cdc.materialize import latest_state
from ..tables import load_table
from . import register

BASE_MS = 1_704_067_200_000

# ------------------------------------------------------------------
# CDC temporal family
# ------------------------------------------------------------------


@register(
    "cdc_pit_enrich_probes",
    oracle="""
WITH k AS (
  SELECT c_custkey AS ck,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END
           AS classification
  FROM customer
),
probes AS (
  SELECT ck, classification, tag FROM k,
  (VALUES ('t_plus_250s'), ('t_plus_750s'), ('t_plus_950s')) AS p(tag)
),
state AS (
  SELECT classification, tag,
         CASE
           WHEN tag = 't_plus_250s' THEN 'phone_v1'
           WHEN tag = 't_plus_750s' THEN
             CASE WHEN ck % 3 = 0 THEN 'phone_v2' ELSE 'phone_v1' END
           ELSE  -- +950s: deletes applied at +900s
             CASE WHEN ck % 7 = 0 THEN 'absent'
                  WHEN ck % 3 = 0 THEN 'phone_v2'
                  ELSE 'phone_v1' END
         END AS phone_state
  FROM probes
)
SELECT tag, classification, phone_state,
       CAST(count(*) AS BIGINT) AS n_keys
FROM state
GROUP BY tag, classification, phone_state
ORDER BY tag, classification, phone_state
""",
    doc="Point-in-time (PIT) enrichment against the SCD2 history: for "
    "each key, probe timestamps at insert+{250,750,950}s resolve the "
    "phone version valid AT that instant ([valid_from, valid_to) "
    "interval containment; no covering interval = deleted/absent). "
    "Spark side joins probes to cdc/scd2.py history on the KEY (equi "
    "join, <=2 versions per key) then filters the interval — never a "
    "range BNLJ — so the plan is one key-partitioned shuffle at any "
    "scale.  The oracle derives each probe's state closed-form from "
    "the generator arithmetic, independently of the SCD2 machinery.",
)
def cdc_pit_enrich_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = scd2_history(generate_envelope_log(spark, sf_dir)).select(
        "id", "phone", "version", "valid_from_ms", "valid_to_ms"
    )
    keys = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").cast("int").alias("id"),
            F.col("c_custkey").cast("long").alias("ck"),
            F.when(F.col("c_custkey") % 2 == 0, F.lit("public"))
            .otherwise(F.lit("private"))
            .alias("classification"),
        )
    )
    offsets = spark.createDataFrame(
        [("t_plus_250s", 250_000), ("t_plus_750s", 750_000),
         ("t_plus_950s", 950_000)],
        "tag string, off_ms long",
    )
    probes = keys.crossJoin(F.broadcast(offsets)).select(
        "id",
        "classification",
        "tag",
        (F.lit(BASE_MS) + F.col("ck") * 1000 + F.col("off_ms")).alias("pt_ms"),
    )
    # single pass: join every version row, keep the covering one via a
    # conditional max per (key, probe) — a probe no interval covers
    # aggregates to NULL = absent.  One key equi-join + one groupBy;
    # no distinct/anti-join rework for the absent case.
    covering = F.when(
        (F.col("pt_ms") >= F.col("valid_from_ms"))
        & (
            F.col("valid_to_ms").isNull()
            | (F.col("pt_ms") < F.col("valid_to_ms"))
        ),
        F.col("version"),
    )
    per_probe = (
        probes.join(hist, "id", "left")
        .groupBy("id", "tag", "classification")
        .agg(F.max(covering).alias("v"))
    )
    return (
        per_probe.select(
            "tag",
            "classification",
            F.when(F.col("v").isNull(), F.lit("absent"))
            .when(F.col("v") == 2, F.lit("phone_v2"))
            .otherwise(F.lit("phone_v1"))
            .alias("phone_state"),
        )
        .groupBy("tag", "classification", "phone_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .orderBy("tag", "classification", "phone_state")
    )


@register(
    "cdc_ivm_agg_maintenance",
    oracle="""
WITH k AS (
  SELECT c_custkey AS ck,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END
           AS classification,
         c_custkey * 7919 % 10000000 AS v1,
         c_custkey * 104729 % 10000000 AS v2
  FROM customer
),
-- maintained state = base(inserts) + deltas(updates) + deltas(deletes),
-- which by the generator rules is exactly the live-key recompute
final AS (
  SELECT classification,
         CAST(count(*) FILTER (WHERE ck % 7 <> 0) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN ck % 7 = 0 THEN 0
                       WHEN ck % 3 = 0 THEN v2 ELSE v1 END) AS BIGINT)
           AS phone_sum
  FROM k GROUP BY classification
)
SELECT classification, n_keys, phone_sum,
       n_keys AS n_keys_recomputed,
       phone_sum AS phone_sum_recomputed,
       TRUE AS counts_agree, TRUE AS sums_agree
FROM final
ORDER BY classification
""",
    doc="Incremental view maintenance (IVM) of a grouped aggregate from "
    "the CDC delta stream: count and sum(phone numeric) per "
    "classification are maintained additively — insert contributes "
    "(+1, +v), update (0, +new-old), delete (-1, -current) — after "
    "seq-deduping at-least-once replays.  The maintained state is "
    "compared in-query against a full recompute from the materialized "
    "snapshot; both paths and the agreement flags are value-hashed "
    "against the closed-form oracle.  At scale the maintained path "
    "touches only the delta partition, never the base table — the "
    "continuous-aggregate shape.",
)
def cdc_ivm_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = generate_envelope_log(spark, sf_dir)
    # exactly-once delta stream: at-least-once replays collapse on seq
    dedup = log.dropDuplicates(["seq"])
    phone_num = lambda side: F.regexp_replace(  # noqa: E731
        F.col(f"{side}.phone"), "[^0-9]", ""
    ).cast("long") % 10_000_000
    cls = lambda side: F.when(  # noqa: E731
        F.col(f"{side}.id") % 2 == 0, F.lit("public")
    ).otherwise(F.lit("private"))
    deltas = dedup.select(
        F.when(F.col("op") == "d", cls("before"))
        .otherwise(cls("after"))
        .alias("classification"),
        F.when(F.col("op") == "c", F.lit(1))
        .when(F.col("op") == "d", F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("d_count"),
        F.when(F.col("op") == "c", phone_num("after"))
        .when(F.col("op") == "u", phone_num("after") - phone_num("before"))
        .otherwise(-phone_num("before"))
        .cast("long")
        .alias("d_sum"),
    )
    maintained = deltas.groupBy("classification").agg(
        F.sum("d_count").cast("long").alias("n_keys"),
        F.sum("d_sum").cast("long").alias("phone_sum"),
    )
    snap = latest_snapshot(unwrap(log))
    recomputed = snap.groupBy(
        F.when(F.col("id") % 2 == 0, F.lit("public"))
        .otherwise(F.lit("private"))
        .alias("classification")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_recomputed"),
        F.sum(
            F.regexp_replace("phone", "[^0-9]", "").cast("long") % 10_000_000
        )
        .cast("long")
        .alias("phone_sum_recomputed"),
    )
    return (
        maintained.join(recomputed, "classification")
        .select(
            "classification",
            "n_keys",
            "phone_sum",
            "n_keys_recomputed",
            "phone_sum_recomputed",
            (F.col("n_keys") == F.col("n_keys_recomputed")).alias(
                "counts_agree"
            ),
            (F.col("phone_sum") == F.col("phone_sum_recomputed")).alias(
                "sums_agree"
            ),
        )
        .orderBy("classification")
    )


@register(
    "cdc_tombstone_gc_audit",
    oracle="""
WITH d AS (
  SELECT c_custkey AS ck,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END
           AS classification,
         1704067200000 + c_custkey * 1000 + 900000 AS ts_ms
  FROM customer WHERE c_custkey % 7 = 0
),
w AS (
  -- integer arithmetic only: CAST(double AS BIGINT) rounds in DuckDB
  -- but truncates in Spark, so 0.7*span must be 7*span//10 both
  -- sides.  The log's max ts is the LATEST op actually emitted —
  -- greatest of (last insert, last update for ck%3==0, last delete
  -- for ck%7==0) — not max_ck+900s blindly.
  SELECT min(1704067200000 + c_custkey * 1000) +
         (7 * (greatest(
                 max(1704067200000 + c_custkey * 1000),
                 max(CASE WHEN c_custkey % 3 = 0
                     THEN 1704067200000 + c_custkey * 1000 + 500000 END),
                 max(CASE WHEN c_custkey % 7 = 0
                     THEN 1704067200000 + c_custkey * 1000 + 900000 END))
               - min(1704067200000 + c_custkey * 1000))) // 10
           AS wm
  FROM customer
)
SELECT classification,
       CAST(count(*) AS BIGINT) AS n_tombstones,
       CAST(count(*) FILTER (WHERE ts_ms <= wm) AS BIGINT) AS n_gc_eligible,
       CAST(count(*) FILTER (WHERE ts_ms > wm) AS BIGINT) AS n_retained
FROM d, w
GROUP BY classification
ORDER BY classification
""",
    doc="Watermark-bounded tombstone GC audit (Kafka compacted-topic "
    "delete.retention semantics): tombstones recorded at or before the "
    "retention watermark (min log time + 70% of the log span, derived "
    "from the data per lesson 17) are safe to GC — by generator "
    "construction a delete is its key's final op, which the Spark side "
    "verifies per-key (max-seq check) rather than assuming.  One "
    "aggregate over the delta stream; the watermark is a broadcast "
    "1-row scalar.",
)
def cdc_tombstone_gc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = generate_envelope_log(spark, sf_dir).dropDuplicates(["seq"])
    # integer arithmetic only (7*span div 10): double CAST rounds in
    # DuckDB but truncates in Spark — boundary tombstones would flip
    bounds = log.agg(
        (
            F.min("ts_ms")
            + F.expr("(7 * (max(ts_ms) - min(ts_ms))) div 10")
        ).alias("wm")
    )
    last_seq = log.select(
        F.coalesce(F.col("after.id"), F.col("before.id")).alias("id"), "seq"
    ).groupBy("id").agg(F.max("seq").alias("max_seq"))
    tomb = (
        log.filter(F.col("op") == "d")
        .select(
            F.col("before.id").alias("id"),
            F.when(F.col("before.id") % 2 == 0, F.lit("public"))
            .otherwise(F.lit("private"))
            .alias("classification"),
            "ts_ms",
            "seq",
        )
        # GC safety precondition: the tombstone is the key's final op
        .join(last_seq, "id")
        .filter(F.col("seq") == F.col("max_seq"))
    )
    return (
        tomb.crossJoin(F.broadcast(bounds))
        .groupBy("classification")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tombstones"),
            F.sum(F.when(F.col("ts_ms") <= F.col("wm"), 1).otherwise(0))
            .cast("long")
            .alias("n_gc_eligible"),
            F.sum(F.when(F.col("ts_ms") > F.col("wm"), 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
        )
        .orderBy("classification")
    )


@register(
    "cdc_change_feed_between_versions",
    oracle="""
WITH params AS (
  -- integer division (//): CAST(x.5 AS BIGINT) rounds in DuckDB but
  -- truncates in Spark when max(c_custkey) is odd
  SELECT 1704067200000 + (max(c_custkey) // 2) * 1000
         + 600000 AS cut_ms
  FROM customer
),
k AS (
  SELECT c_custkey AS ck,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END
           AS classification,
         1704067200000 + c_custkey * 1000 AS ins_ms,
         1704067200000 + c_custkey * 1000 + 500000 AS upd_ms,
         1704067200000 + c_custkey * 1000 + 900000 AS del_ms,
         cut_ms
  FROM customer, params
),
states AS (
  SELECT ck, classification,
         -- state in V1 (log up to cut): absent / v1 / v2
         CASE WHEN ins_ms > cut_ms THEN 'absent'
              WHEN ck % 7 = 0 AND del_ms <= cut_ms THEN 'absent'
              WHEN ck % 3 = 0 AND upd_ms <= cut_ms THEN 'v2'
              ELSE 'v1' END AS s1,
         -- final state V2
         CASE WHEN ck % 7 = 0 THEN 'absent'
              WHEN ck % 3 = 0 THEN 'v2'
              ELSE 'v1' END AS s2
  FROM k
),
feed AS (
  SELECT classification,
         CASE WHEN s1 = 'absent' AND s2 <> 'absent' THEN 'insert'
              WHEN s1 <> 'absent' AND s2 = 'absent' THEN 'delete'
              WHEN s1 <> s2 THEN 'update'
              ELSE 'none' END AS change_type
  FROM states
  WHERE NOT (s1 = 'absent' AND s2 = 'absent')
)
SELECT classification, change_type, CAST(count(*) AS BIGINT) AS n_keys
FROM feed
WHERE change_type <> 'none'
GROUP BY classification, change_type
ORDER BY classification, change_type
""",
    doc="Delta-sharing-style change feed between two snapshot versions: "
    "V1 = last-writer-wins state at a cut timestamp (mid-log, derived "
    "from max key), V2 = final state; the feed classifies each key as "
    "insert/update/delete via a full outer join of the two snapshots "
    "(both built by the same cdc/materialize.py path, so the feed "
    "exercises snapshot-at-T reuse).  The oracle derives both states "
    "closed-form per key.  Scale: two key-partitioned snapshot builds "
    "+ one key equi-join; the cut scalar broadcasts.",
)
def cdc_change_feed_between_versions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    log = generate_envelope_log(spark, sf_dir)
    cut = (
        load_table(spark, sf_dir, "customer")
        .agg(
            (
                F.lit(BASE_MS)
                + F.expr("max(c_custkey) div 2") * 1000
                + 600_000
            ).alias("cut_ms")
        )
    )
    u = unwrap(log)
    # Classify 'update' by the winning event VERSION (ts_ms, seq), not
    # the phone payload: phone_v1 can collide with phone_v2 whenever
    # ck*96810 % 1e7 == 0, so at ~sf20+ a payload compare would emit
    # 'none' where the oracle's version-label compare says 'update'
    # (round-8 advisor finding).  The winning version differs iff a
    # later event landed between the two cuts — exactly the oracle's
    # s1 != s2 semantics at every scale.
    v1 = (
        latest_state(
            u.crossJoin(F.broadcast(cut)).filter(
                F.col("ts_ms") <= F.col("cut_ms")
            )
        )
        .filter(~F.col("__deleted"))
        .select(
            F.col("id").alias("id1"),
            F.struct(F.col("ts_ms"), F.col("seq")).alias("ver1"),
        )
    )
    v2 = (
        latest_state(u)
        .filter(~F.col("__deleted"))
        .select(
            F.col("id").alias("id2"),
            F.struct(F.col("ts_ms"), F.col("seq")).alias("ver2"),
        )
    )
    joined = v1.join(v2, v1.id1 == v2.id2, "full_outer").select(
        F.coalesce("id1", "id2").alias("id"),
        F.when(F.col("id1").isNull(), F.lit("insert"))
        .when(F.col("id2").isNull(), F.lit("delete"))
        .when(F.col("ver1") != F.col("ver2"), F.lit("update"))
        .otherwise(F.lit("none"))
        .alias("change_type"),
    )
    return (
        joined.filter(F.col("change_type") != "none")
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("public"))
            .otherwise(F.lit("private"))
            .alias("classification"),
            "change_type",
        )
        .groupBy("classification", "change_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .orderBy("classification", "change_type")
    )


@register(
    "cdc_replay_inflation_audit",
    oracle="""
WITH k AS (
  SELECT c_custkey AS ck,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END
           AS classification,
         c_custkey * 7919 % 10000000 AS v1
  FROM customer
)
SELECT classification,
       CAST(count(*) AS BIGINT) AS n_inserts,
       CAST(count(*) FILTER (WHERE ck % 11 = 0) AS BIGINT) AS n_replayed,
       CAST(sum(v1) AS BIGINT) AS insert_sum_deduped,
       CAST(sum(v1) + sum(CASE WHEN ck % 11 = 0 THEN v1 ELSE 0 END)
            AS BIGINT) AS insert_sum_naive,
       round(
         (sum(v1) + sum(CASE WHEN ck % 11 = 0 THEN v1 ELSE 0 END))
         * 1.0 / sum(v1), 6) AS inflation_ratio
FROM k
GROUP BY classification
ORDER BY classification
""",
    doc="At-least-once replay inflation audit: folding the insert "
    "stream WITHOUT seq-dedup double-counts the id%11 replays the "
    "generator emits (consumer auto-commit semantics, "
    "consumer_to_opensearch.py:61); the audit quantifies the damage "
    "(naive vs seq-deduped sum and the inflation ratio) per "
    "classification — the measurable argument for the engine's "
    "idempotent-apply discipline (cdc/materialize.py).  Two aggregates "
    "over the same delta scan.",
)
def cdc_replay_inflation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ins = generate_envelope_log(spark, sf_dir).filter(F.col("op") == "c")
    phone_num = (
        F.regexp_replace(F.col("after.phone"), "[^0-9]", "").cast("long")
        % 10_000_000
    )
    rows = ins.select(
        F.when(F.col("after.id") % 2 == 0, F.lit("public"))
        .otherwise(F.lit("private"))
        .alias("classification"),
        F.col("seq"),
        phone_num.alias("v"),
    )
    naive = rows.groupBy("classification").agg(
        F.sum("v").cast("long").alias("insert_sum_naive"),
        F.count(F.lit(1)).cast("long").alias("n_rows_naive"),
    )
    deduped = rows.dropDuplicates(["seq"]).groupBy("classification").agg(
        F.count(F.lit(1)).cast("long").alias("n_inserts"),
        F.sum("v").cast("long").alias("insert_sum_deduped"),
    )
    return (
        deduped.join(naive, "classification")
        .select(
            "classification",
            "n_inserts",
            (F.col("n_rows_naive") - F.col("n_inserts"))
            .cast("long")
            .alias("n_replayed"),
            "insert_sum_deduped",
            "insert_sum_naive",
            F.round(
                F.col("insert_sum_naive") / F.col("insert_sum_deduped"), 6
            ).alias("inflation_ratio"),
        )
        .orderBy("classification")
    )


# ------------------------------------------------------------------
# Sequence / funnel
# ------------------------------------------------------------------

_FUNNEL_W = 86_400  # 1-day completion window from the step-1 event


@register(
    "funnel_window_funnel_levels",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
s1 AS (SELECT user_id, t AS t1 FROM e WHERE event_type = 'signup'),
s2 AS (
  SELECT s1.user_id, s1.t1, min(c.t) AS t2
  FROM s1 LEFT JOIN e c
    ON c.user_id = s1.user_id AND c.event_type = 'click'
   AND c.t >= s1.t1 AND c.t <= s1.t1 + {_FUNNEL_W}
  GROUP BY 1, 2
),
s3 AS (
  SELECT s2.user_id, s2.t1, s2.t2, min(p.t) AS t3
  FROM s2 LEFT JOIN e p
    ON p.user_id = s2.user_id AND p.event_type = 'purchase'
   AND s2.t2 IS NOT NULL
   AND p.t >= s2.t2 AND p.t <= s2.t1 + {_FUNNEL_W}
  GROUP BY 1, 2, 3
),
lv AS (
  SELECT user_id,
         max(CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  ELSE 1 END) AS level
  FROM s3 GROUP BY user_id
),
allu AS (SELECT DISTINCT user_id FROM e)
SELECT coalesce(lv.level, 0) AS level,
       CAST(count(*) AS BIGINT) AS n_users
FROM allu LEFT JOIN lv USING (user_id)
GROUP BY 1 ORDER BY 1
""",
    doc="ClickHouse-style windowFunnel: per user, the deepest "
    "signup->click->purchase chain completed within 24h of the "
    "opening signup (greedy earliest-next-step semantics, identical "
    "on both engines); histogram of funnel level 0-3 over all users. "
    "Scale: every join is user-keyed (equi join + range filter on the "
    "same shuffle), so the plan co-partitions by user exactly like "
    "the sessionizer family; no range BNLJ, no global window.",
)
def funnel_window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
    )
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("t").alias("t1"))
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("t").alias("ct")
    )
    s2 = (
        s1.join(
            c,
            (F.col("cu") == F.col("user_id"))
            & (F.col("ct") >= F.col("t1"))
            & (F.col("ct") <= F.col("t1") + _FUNNEL_W),
            "left",
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ct").alias("t2"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("t").alias("pt")
    )
    s3 = (
        s2.join(
            p,
            (F.col("pu") == F.col("user_id"))
            & F.col("t2").isNotNull()
            & (F.col("pt") >= F.col("t2"))
            & (F.col("pt") <= F.col("t1") + _FUNNEL_W),
            "left",
        )
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("pt").alias("t3"))
    )
    lv = s3.groupBy("user_id").agg(
        F.max(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
        ).alias("level")
    )
    allu = e.select("user_id").distinct()
    return (
        allu.join(lv, "user_id", "left")
        .select(F.coalesce("level", F.lit(0)).alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("level")
    )


# ------------------------------------------------------------------
# Embedding pipeline: Matryoshka prefix fidelity
# ------------------------------------------------------------------


@register(
    "emb_matryoshka_prefix_fidelity",
    oracle="""
WITH n AS (SELECT count(*) AS n FROM embeddings),
a AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ea FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb, a.ea, b.ea AS eb
  FROM a CROSS JOIN n
  JOIN a b ON b.vec_id = (a.vec_id + n.n // 2) % n.n
  WHERE a.vec_id < b.vec_id
),
pref AS (
  SELECT qa, qb, p,
         round(list_dot_product(ea[1:p], eb[1:p])
               / nullif(sqrt(list_dot_product(ea[1:p], ea[1:p]))
                        * sqrt(list_dot_product(eb[1:p], eb[1:p])), 0),
               6) AS sim_p,
         round(list_dot_product(ea, eb)
               / nullif(sqrt(list_dot_product(ea, ea))
                        * sqrt(list_dot_product(eb, eb)), 0),
               6) AS sim_full
  FROM pairs, (VALUES (8), (16), (32), (64)) AS v(p)
)
SELECT p AS prefix_dims,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(abs(sim_p - sim_full)), 4) + 0.0 AS mae_vs_full,
       round(avg(CASE WHEN sim_p * sim_full >= 0 THEN 1.0 ELSE 0.0 END),
             4) AS sign_agree_rate,
       round(avg(abs(sim_p)), 4) + 0.0 AS mean_abs_sim
FROM pref
GROUP BY p ORDER BY p
""",
    doc="Matryoshka-representation fidelity: cosine similarity on "
    "renormalized prefix truncations (8/16/32/64 dims) vs the full "
    "vector, over a deterministic half-stride pairing of the corpus "
    "(pair i with i+n/2 — one pair per vector, linear in N; never a "
    "pair blowup).  Measures how much similarity structure each "
    "prefix budget preserves — the MRL deployment question (serve "
    "16-dim candidates, rerank with 64).  Prefix slicing parity: "
    "DuckDB e[1:p] is inclusive-end = Spark slice(e, 1, p) elements.",
)
def emb_matryoshka_prefix_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    def _dotp(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u * v),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    # Norm hoist (round-10 verdict task 2, acf7027 discipline): the
    # original form recomputed sim_full AND all six norms inside the
    # 4-way prefix crossJoin — 15 HOF aggregates per prefix-pair row.
    # Each norm is a per-VECTOR quantity: compute the 4 prefix norms +
    # the full norm once per vector (same sqrt(dot(slice,slice))
    # expression on the same data, so every retrieved value is
    # bit-identical), and sim_full once per PAIR before the prefix
    # fan-out.  Per prefix-pair row only the prefix dot remains.
    pvals = [8, 16, 32, 64]
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    ).select(
        "vec_id",
        "e",
        F.array(
            *[
                F.sqrt(_dotp(F.slice("e", 1, p), F.slice("e", 1, p)))
                for p in pvals
            ]
        ).alias("nrm_p"),
        F.sqrt(_dotp("e", "e")).alias("nrm_f"),
    )
    n = emb.agg(F.count(F.lit(1)).alias("n"))
    a = emb.crossJoin(F.broadcast(n)).select(
        F.col("vec_id").alias("qa"),
        F.col("e").alias("ea"),
        F.col("nrm_p").alias("na_p"),
        F.col("nrm_f").alias("na_f"),
        ((F.col("vec_id") + F.expr("n div 2")) % F.col("n")).alias("pid"),
    )
    b = emb.select(
        F.col("vec_id").alias("qb"),
        F.col("e").alias("eb"),
        F.col("nrm_p").alias("nb_p"),
        F.col("nrm_f").alias("nb_f"),
    )
    pairs = (
        a.join(b, a.pid == b.qb)
        .filter(F.col("qa") < F.col("qb"))
        .select(
            "ea",
            "eb",
            "na_p",
            "nb_p",
            F.round(
                _dotp("ea", "eb")
                / F.nullif(F.col("na_f") * F.col("nb_f"), F.lit(0.0)),
                6,
            ).alias("sim_full"),
        )
    )

    pref = (
        pairs.crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(p, i + 1) for i, p in enumerate(pvals)], "p int, pi int"
                )
            )
        )
        .select(
            "p",
            F.round(
                _dotp(F.slice("ea", 1, F.col("p")), F.slice("eb", 1, F.col("p")))
                / F.nullif(
                    F.element_at("na_p", F.col("pi"))
                    * F.element_at("nb_p", F.col("pi")),
                    F.lit(0.0),
                ),
                6,
            ).alias("sim_p"),
            "sim_full",
        )
    )
    return (
        pref.groupBy(F.col("p").alias("prefix_dims"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.round(F.avg(F.abs(F.col("sim_p") - F.col("sim_full"))), 4)
             + 0.0).alias("mae_vs_full"),
            F.round(
                F.avg(
                    F.when(
                        F.col("sim_p") * F.col("sim_full") >= 0, 1.0
                    ).otherwise(0.0)
                ),
                4,
            ).alias("sign_agree_rate"),
            (F.round(F.avg(F.abs("sim_p")), 4) + 0.0).alias("mean_abs_sim"),
        )
        .orderBy("prefix_dims")
    )


# ------------------------------------------------------------------
# Survival: Nelson-Aalen cumulative hazard
# ------------------------------------------------------------------


@register(
    "surv_nelson_aalen_hazard",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         min(year(o_orderdate) * 12 + month(o_orderdate)) AS first_m,
         max(year(o_orderdate) * 12 + month(o_orderdate)) AS last_m
  FROM orders GROUP BY 1
),
labeled AS (
  SELECT last_m - first_m AS dur_m,
         CASE WHEN last_m < 2000 * 12 + 8 THEN 1 ELSE 0 END AS churned
  FROM per_cust
),
by_dur AS (
  SELECT dur_m, count(*) AS n_total, sum(churned) AS n_churn
  FROM labeled GROUP BY 1
),
risk AS (
  SELECT dur_m, n_churn,
         sum(n_total) OVER (ORDER BY dur_m DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM by_dur
),
na AS (
  SELECT dur_m, n_risk, n_churn,
         sum(round(CAST(n_churn AS DOUBLE) / n_risk, 6))
           OVER (ORDER BY dur_m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
         sum(round(CAST(n_churn AS DOUBLE) / (n_risk * n_risk), 8))
           OVER (ORDER BY dur_m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM risk
)
SELECT dur_m AS month,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_churn AS BIGINT) AS n_events,
       round(h, 4) + 0.0 AS cum_hazard,
       round(sqrt(v), 4) + 0.0 AS hazard_se
FROM na
WHERE n_churn > 0
ORDER BY month
""",
    doc="Nelson-Aalen cumulative-hazard estimator on the same "
    "duration/censoring frame as surv_kaplan_meier_monthly (tenure in "
    "months; churn = no order in the final 5 months): H(t) = sum of "
    "d_i/n_i over event times <= t with the Poisson variance "
    "sum d_i/n_i^2.  Complements KM (NA estimates hazard, KM "
    "survival; exp(-H) ~ KM is the classic cross-check).  The window "
    "runs over the month-domain aggregate (bounded), per-term ratios "
    "rounded 6/8dp before the cumsum so summation is cross-engine "
    "stable.",
)
def surv_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
            "first_m"
        ),
        F.max(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
            "last_m"
        ),
    )
    lab = per.select(
        (F.col("last_m") - F.col("first_m")).alias("dur_m"),
        F.when(F.col("last_m") < 2000 * 12 + 8, 1).otherwise(0).alias(
            "churned"
        ),
    )
    by_dur = lab.groupBy("dur_m").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("churned").alias("n_churn")
    )
    w_desc = (
        Window.orderBy(F.desc("dur_m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = by_dur.select(
        "dur_m", "n_churn", F.sum("n_total").over(w_desc).alias("n_risk")
    )
    w_asc = (
        Window.orderBy("dur_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    na = risk.select(
        "dur_m",
        "n_risk",
        "n_churn",
        F.sum(
            F.round(F.col("n_churn").cast("double") / F.col("n_risk"), 6)
        ).over(w_asc).alias("h"),
        F.sum(
            F.round(
                F.col("n_churn").cast("double")
                / (F.col("n_risk") * F.col("n_risk")),
                8,
            )
        ).over(w_asc).alias("v"),
    )
    return (
        na.filter(F.col("n_churn") > 0)
        .select(
            F.col("dur_m").alias("month"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("n_churn").cast("long").alias("n_events"),
            (F.round("h", 4) + 0.0).alias("cum_hazard"),
            (F.round(F.sqrt("v"), 4) + 0.0).alias("hazard_se"),
        )
        .orderBy("month")
    )


