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
    v1 = latest_snapshot(
        u.crossJoin(F.broadcast(cut)).filter(F.col("ts_ms") <= F.col("cut_ms"))
    ).select(F.col("id").alias("id1"), F.col("phone").alias("phone1"))
    v2 = latest_snapshot(u).select(
        F.col("id").alias("id2"), F.col("phone").alias("phone2")
    )
    joined = v1.join(v2, v1.id1 == v2.id2, "full_outer").select(
        F.coalesce("id1", "id2").alias("id"),
        F.when(F.col("id1").isNull(), F.lit("insert"))
        .when(F.col("id2").isNull(), F.lit("delete"))
        .when(F.col("phone1") != F.col("phone2"), F.lit("update"))
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
