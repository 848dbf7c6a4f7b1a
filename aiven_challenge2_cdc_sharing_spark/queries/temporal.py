"""Temporal / time-series queries: SCD2 history and gap-filled rollups.

``cdc_scd2_history`` extends the CDC flagship surface (the reference
keeps only current state per key, consumer_to_opensearch.py:95-104)
with the warehouse-standard Type 2 history table; the oracle re-derives
every version interval arithmetically from the deterministic generator
rules (cdc/generator.py), so interval endpoints, version numbers and
the is_current flag are all value-hash checked.

``ts_gapfill_locf`` is the timescale-style continuous-aggregate shape:
bucket → aggregate → dense spine → last-observation-carried-forward.
Spark side: one groupBy shuffle for the per-bucket sums, a broadcast
spine × users grid (spine is tiny: one row per bucket, independent of
fact size), and one window pass per user for the fill — at 100 TB the
grid stays proportional to users × buckets, never to raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cdc import generate_envelope_log, scd2_history
from ..tables import load_table
from . import register

# Shares the generator arithmetic with cdc_queries.SNAPSHOT_SQL: insert
# at t0 = 1704067200000 + id*1000 (phone v1 = id*7919 % 1e7), update at
# t0+500000 for id%3==0 (phone v2 = id*104729 % 1e7), delete at
# t0+900000 for id%7==0.  Deletes close the last interval but emit no
# version row, so is_current = (no update or delete after this row).
SCD2_SQL = """
WITH k AS (
  SELECT CAST(c_custkey AS INTEGER) AS id,
         c_custkey AS ck,
         c_name AS full_name,
         lower(regexp_replace(c_name, '[^A-Za-z0-9]+', '.', 'g')) || '@example.com' AS email,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END AS classification,
         make_timestamp((1704067200 + c_custkey) * 1000000) AS created_at
  FROM customer
),
v1 AS (
  SELECT id, full_name, email,
         '+1-' || lpad(CAST(ck * 7919 % 10000000 AS VARCHAR), 7, '0') AS phone,
         classification, created_at,
         1 AS version,
         1704067200000 + ck * 1000 AS valid_from_ms,
         CASE WHEN ck % 3 = 0 THEN 1704067200000 + ck * 1000 + 500000
              WHEN ck % 7 = 0 THEN 1704067200000 + ck * 1000 + 900000
         END AS valid_to_ms
  FROM k
),
v2 AS (
  SELECT id, full_name, email,
         '+1-' || lpad(CAST(ck * 104729 % 10000000 AS VARCHAR), 7, '0') AS phone,
         classification, created_at,
         2 AS version,
         1704067200000 + ck * 1000 + 500000 AS valid_from_ms,
         CASE WHEN ck % 7 = 0 THEN 1704067200000 + ck * 1000 + 900000
         END AS valid_to_ms
  FROM k WHERE ck % 3 = 0
)
SELECT id, full_name, email, phone, classification, created_at,
       version, valid_from_ms, valid_to_ms,
       valid_to_ms IS NULL AS is_current
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
"""


@register(
    "cdc_scd2_history",
    oracle=SCD2_SQL,
    doc="SCD Type 2 history from the envelope log: one row per key "
    "version with [valid_from, valid_to) intervals, version numbers, "
    "is_current; deletes close intervals, replays dropped. One shuffle "
    "(both windows share the key partitioning)",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_history(generate_envelope_log(spark, sf_dir))


BUCKET_S = 21600  # 6-hour buckets: ~30-day span -> 120 buckets per user


@register(
    "ts_gapfill_locf",
    oracle=f"""
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / {BUCKET_S}) * {BUCKET_S} AS BIGINT) AS bucket_s,
         value
  FROM events
),
agg AS (
  SELECT user_id, bucket_s, round(sum(value), 2) AS bucket_sum
  FROM b GROUP BY user_id, bucket_s
),
bounds AS (SELECT min(bucket_s) AS mn, max(bucket_s) AS mx FROM b),
spine AS (SELECT unnest(generate_series(mn, mx, {BUCKET_S})) AS bucket_s FROM bounds),
grid AS (
  SELECT u.user_id, s.bucket_s
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s
)
SELECT g.user_id,
       make_timestamp(g.bucket_s * 1000000) AS bucket,
       a.bucket_sum,
       last_value(a.bucket_sum IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket_s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
FROM grid g LEFT JOIN agg a
  ON g.user_id = a.user_id AND g.bucket_s = a.bucket_s
""",
    doc="Gap-filled time-bucket rollup with LOCF interpolation "
    "(timescale-style continuous aggregate): 6h buckets, dense spine "
    "per user, NULL gaps + last-observation-carried-forward fill",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = events.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / BUCKET_S) * BUCKET_S)
        .cast("long")
        .alias("bucket_s"),
        "value",
    )
    agg = b.groupBy("user_id", "bucket_s").agg(
        F.round(F.sum("value"), 2).alias("bucket_sum")
    )
    # spine: one row per bucket across the global span — tiny (span /
    # 6h), safe to broadcast regardless of fact-table size
    spine = (
        b.agg(F.min("bucket_s").alias("mn"), F.max("bucket_s").alias("mx"))
        .select(
            F.explode(
                F.sequence("mn", "mx", F.lit(BUCKET_S).cast("long"))
            ).alias("bucket_s")
        )
    )
    users = events.select("user_id").distinct()
    grid = users.join(F.broadcast(spine))
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["user_id", "bucket_s"], "left")
        .withColumn("filled_sum", F.last("bucket_sum", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.timestamp_seconds("bucket_s").alias("bucket"),
            "bucket_sum",
            "filled_sum",
        )
    )


# 24 conditional sums make the hour-of-day profile DENSE by
# construction (missing hours coalesce to 0) — no pivot, no gap-fill
# join, and both engines build the identical array.
_HOUR_TERMS_SQL = ", ".join(
    f"coalesce(round(sum(CASE WHEN extract(hour FROM ts) = {h} "
    f"THEN value END), 4), 0)"
    for h in range(24)
)


@register(
    "ts_user_profile_similarity",
    oracle=f"""
WITH prof AS (
  SELECT user_id, [{_HOUR_TERMS_SQL}] AS profile
  FROM events GROUP BY user_id
),
probes AS (SELECT user_id AS query_id, profile AS qp FROM prof
           WHERE user_id IN (0, 1, 2))
SELECT query_id, user_id, sim FROM (
  SELECT p.query_id, v.user_id,
         round(list_cosine_similarity(v.profile, p.qp), 6) AS sim
  FROM prof v CROSS JOIN probes p
  WHERE v.user_id <> p.query_id
)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, user_id)
        <= 5
ORDER BY query_id, sim DESC, user_id
""",
    doc="time-series similarity search (the EDBT'19 streaming-series "
    "theme, done batch): each user's 24-dim hour-of-day activity "
    "profile — dense by construction from 24 conditional sums, no "
    "pivot/gap-fill — then cosine top-5 neighbors for 3 probe users. "
    "Scale shape: one groupBy builds all profiles (map-side partial "
    "agg over 24 columns), probes broadcast, zero fact re-shuffles — "
    "identical to the embedding ANN baseline but with the vector "
    "MANUFACTURED from event time series",
)
def ts_user_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    prof = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array(
                *[
                    F.coalesce(
                        F.round(
                            F.sum(
                                F.when(F.hour("ts") == h, F.col("value"))
                            ),
                            4,
                        ),
                        F.lit(0.0),
                    )
                    for h in range(24)
                ]
            ).alias("profile")
        )
    )
    probes = prof.filter(F.col("user_id").isin(0, 1, 2)).select(
        F.col("user_id").alias("query_id"), F.col("profile").alias("qp")
    )
    scored = (
        prof.crossJoin(F.broadcast(probes))
        .filter(F.col("user_id") != F.col("query_id"))
        .select(
            "query_id",
            "user_id",
            F.round(cosine(F.col("profile"), F.col("qp")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "user_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("query_id", F.desc("sim"), "user_id")
    )


@register(
    "ts_anomaly_daily_values",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         round(sum(value), 2) AS total
  FROM events GROUP BY 1
),
scored AS (
  SELECT day, total,
         avg(total) OVER w AS mu,
         stddev_pop(total) OVER w AS sd,
         count(*) OVER w AS n_prior
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, total,
       round(mu, 2) AS trailing_mean,
       round((total - mu) / (CASE WHEN sd = 0 THEN NULL ELSE sd END), 4) AS z,
       coalesce(abs((total - mu)
                    / (CASE WHEN sd = 0 THEN NULL ELSE sd END)) > 3.0,
                FALSE) AS is_anomaly
FROM scored WHERE n_prior = 7
ORDER BY day
""",
    doc="trailing-window anomaly detection (the ops-monitoring panel): "
    "daily totals scored against the prior 7 days' mean/stddev "
    "(frame excludes the current row — no self-contamination), "
    "|z| > 3 flags.  The global-ordered window runs on the DAILY "
    "aggregate (a few hundred rows), not the raw stream — same "
    "tiny-after-aggregation rule as the WoW movers query; warm-up "
    "days with fewer than 7 priors are excluded deterministically. "
    "A flat trailing window (sd=0) is explicitly NULLed on BOTH "
    "engines before the division: Spark's Divide returns NULL on /0 "
    "but DuckDB's IEEE float division yields +/-Inf, so an unguarded "
    "flat window would silently diverge (z NULL vs Inf)",
)
def ts_anomaly_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "day",
        "total",
        F.avg("total").over(w).alias("mu"),
        F.stddev_pop("total").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_prior"),
    )
    # sd=0 (flat trailing window) -> z NULL, is_anomaly FALSE; Spark's
    # Divide gives NULL on /0 natively but the guard is explicit so the
    # convention is engine-independent (mirrors the oracle's CASE)
    sd_safe = F.when(F.col("sd") == 0, F.lit(None)).otherwise(F.col("sd"))
    z = (F.col("total") - F.col("mu")) / sd_safe
    return (
        scored.filter(F.col("n_prior") == 7)
        .select(
            "day",
            "total",
            F.round("mu", 2).alias("trailing_mean"),
            F.round(z, 4).alias("z"),
            F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("day")
    )


@register(
    "ts_resample_linear",
    oracle=f"""
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / {BUCKET_S}) * {BUCKET_S} AS BIGINT) AS bucket_s,
         value
  FROM events
),
agg AS (
  SELECT user_id, bucket_s, round(sum(value), 2) AS bucket_sum
  FROM b GROUP BY user_id, bucket_s
),
bounds AS (SELECT min(bucket_s) AS mn, max(bucket_s) AS mx FROM b),
spine AS (SELECT unnest(generate_series(mn, mx, {BUCKET_S})) AS bucket_s FROM bounds),
grid AS (
  SELECT u.user_id, s.bucket_s
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s
),
j AS (
  SELECT g.user_id, g.bucket_s, a.bucket_sum,
         last_value(a.bucket_s IGNORE NULLS) OVER w_prev AS prev_b,
         last_value(a.bucket_sum IGNORE NULLS) OVER w_prev AS prev_v,
         first_value(a.bucket_s IGNORE NULLS) OVER w_next AS next_b,
         first_value(a.bucket_sum IGNORE NULLS) OVER w_next AS next_v
  FROM grid g LEFT JOIN agg a
    ON g.user_id = a.user_id AND g.bucket_s = a.bucket_s
  WINDOW
    w_prev AS (PARTITION BY g.user_id ORDER BY g.bucket_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY g.user_id ORDER BY g.bucket_s
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       make_timestamp(bucket_s * 1000000) AS bucket,
       bucket_sum,
       round(CASE
         WHEN bucket_sum IS NOT NULL THEN bucket_sum
         WHEN prev_b IS NOT NULL AND next_b IS NOT NULL
         THEN prev_v + (next_v - prev_v)
              * (bucket_s - prev_b) / (next_b - prev_b)
       END, 4) AS interp_sum
FROM j
""",
    doc="gap-filled rollup with LINEAR interpolation (the timescale "
    "interpolate() twin of ts_gapfill_locf): 6h buckets, dense spine, "
    "and each interior gap filled by the line between its neighboring "
    "observations — two IGNORE NULLS window passes (prev from the "
    "preceding frame, next from the following frame) carry (bucket, "
    "value) of the nearest observation in each direction, so the fill "
    "is one window stage over the user-partitioned grid, no self-join "
    "and no per-gap scan.  Rows before the first / after the last "
    "observation stay NULL (extrapolation is a policy, not a default). "
    " Same scale shape as the LOCF variant: grid ~ users x buckets, "
    "never raw events",
)
def ts_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = events.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / BUCKET_S) * BUCKET_S)
        .cast("long")
        .alias("bucket_s"),
        "value",
    )
    agg = b.groupBy("user_id", "bucket_s").agg(
        F.round(F.sum("value"), 2).alias("bucket_sum")
    )
    spine = (
        b.agg(F.min("bucket_s").alias("mn"), F.max("bucket_s").alias("mx"))
        .select(
            F.explode(
                F.sequence("mn", "mx", F.lit(BUCKET_S).cast("long"))
            ).alias("bucket_s")
        )
    )
    grid = events.select("user_id").distinct().join(F.broadcast(spine))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("bucket_sum").isNotNull(), F.col("bucket_s"))
    j = (
        grid.join(agg, ["user_id", "bucket_s"], "left")
        .withColumn("prev_b", F.last(obs_b, ignorenulls=True).over(w_prev))
        .withColumn(
            "prev_v", F.last("bucket_sum", ignorenulls=True).over(w_prev)
        )
        .withColumn("next_b", F.first(obs_b, ignorenulls=True).over(w_next))
        .withColumn(
            "next_v", F.first("bucket_sum", ignorenulls=True).over(w_next)
        )
    )
    interp = F.when(F.col("bucket_sum").isNotNull(), F.col("bucket_sum")).when(
        F.col("prev_b").isNotNull() & F.col("next_b").isNotNull(),
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * (F.col("bucket_s") - F.col("prev_b"))
        / (F.col("next_b") - F.col("prev_b")),
    )
    # round via multiply-round-divide, NOT F.round(x, 4): Spark's
    # fractional round goes through BigDecimal.valueOf(double) whose
    # shortest-decimal repr can sit on the .00005 boundary that the
    # true binary value is just below — DuckDB's round multiplies
    # first and sees the binary truth (one boundary row at sf0.001
    # differed 111.4937 vs .4938); rounding at scale 0 makes both
    # engines see the same integer
    return j.select(
        "user_id",
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket"),
        "bucket_sum",
        (F.round(interp * 10000, 0) / 10000).alias("interp_sum"),
    )
