"""Round-9 window inventory (built in round 7).

Families still uncovered after the round-8 batches: risk/extreme-value
time-series diagnostics (drawdown, cross-correlation lead-lag,
turning-point and sign tests), the remaining classic nonparametric
two-sample machinery (Anderson-Darling, Hodges-Lehmann, odds-ratio CI),
link prediction on the sparsified trade graph (Adamic-Adar), sketch
families beyond HLL/count-min (KMV set ops, AMS F2, linear counting),
retrieval-evaluation metrics past NDCG (MRR/MAP, Rocchio PRF), CDC
lifecycle ops the single-table reference never reaches (schema
evolution, dead-letter replay), and calibration/sequence-model
evaluation (isotonic PAV, bigram next-event accuracy).

Reference provenance: the reference is a single-table CDC relay
(consumer_to_opensearch.py:67-96) with no analytics; every query here
is north-star extension per BASELINE.json, held to the same
oracle-twin + scale-plan bar as the rest of the registry.

Cross-engine disciplines (established rounds 3-8, see SCALING.md):
partial aggregates rounded 6dp before any downstream comparison,
integer cents for money, floor(epoch()) per timestamp, exact integer
cross-multiplication for rank decisions, packed dual counters in one
64-bit prefix sum for ECDF shapes, and every aggregate aliased
identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register

# ------------------------------------------------ ts: drawdown / CCF


@register(
    "ts_max_drawdown_runup",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) / 86400 AS d,
         round(sum(value), 6) AS v
  FROM events GROUP BY 1, 2
),
ctr AS (
  SELECT event_type, d,
         round(v - round(avg(v) OVER (PARTITION BY event_type), 6), 6) AS x
  FROM daily
),
cum AS (
  SELECT event_type, d,
         sum(x) OVER (PARTITION BY event_type ORDER BY d) AS c
  FROM ctr
),
ext AS (
  SELECT event_type, d, c,
         max(c) OVER (PARTITION BY event_type ORDER BY d) AS peak,
         min(c) OVER (PARTITION BY event_type ORDER BY d) AS trough
  FROM cum
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(max(peak - c), 4) AS max_drawdown,
       round(max(c - trough), 4) AS max_runup,
       CAST(sum(CASE WHEN c < peak THEN 1 ELSE 0 END) AS BIGINT)
         AS underwater_days,
       round(sum(CASE WHEN c < peak THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS underwater_share
FROM ext
GROUP BY event_type ORDER BY event_type
""",
    doc="maximum drawdown / run-up of the CENTERED cumulative daily "
    "value path per event type (each day's sum minus the per-type "
    "mean daily sum — the raw cumulative of an all-positive value "
    "column is monotone and its drawdown degenerately 0 at every "
    "scale, the lesson-17 hazard): the prefix-extremum formulation "
    "(drawdown at day d = running peak minus current path; one "
    "pass, no pairwise day scan), the peak-to-trough risk metric "
    "next to ts_cusum_drift's one-sided slack-recursion alarm.  "
    "Daily sums and the centering mean are rounded 6dp BEFORE the "
    "cumulative sum so both engines fold identical doubles in the "
    "identical (single row per day) order — the strict `c < peak` "
    "underwater comparison is then bit-deterministic.  Windows are "
    "partitioned by event_type and bounded by the calendar, the "
    "same per-series shape as ts_bollinger_breach_rate; at 100 TB "
    "the daily aggregate is the only shuffle and the window state "
    "is days-not-events",
)
def ts_max_drawdown_runup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)).alias(
            "d"
        ),
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    wt = Window.partitionBy("event_type")
    ctr = daily.select(
        "event_type",
        "d",
        F.round(
            F.col("v") - F.round(F.avg("v").over(wt), 6), 6
        ).alias("x"),
    )
    wc = Window.partitionBy("event_type").orderBy("d")
    ext = ctr.select(
        "event_type",
        "d",
        F.sum("x").over(wc).alias("c"),
    ).select(
        "event_type",
        "c",
        F.max("c").over(wc.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "peak"
        ),
        F.min("c").over(wc.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "trough"
        ),
    )
    return (
        ext.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.max(F.col("peak") - F.col("c")), 4).alias(
                "max_drawdown"
            ),
            F.round(F.max(F.col("c") - F.col("trough")), 4).alias(
                "max_runup"
            ),
            F.sum(F.when(F.col("c") < F.col("peak"), 1).otherwise(0))
            .cast("long")
            .alias("underwater_days"),
            F.round(
                F.sum(F.when(F.col("c") < F.col("peak"), 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("underwater_share"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_cross_correlation_lead_lag",
    oracle="""
WITH cnts AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1
),
ranked AS (
  SELECT event_type,
         (SELECT count(*) FROM cnts o
          WHERE o.cnt > c.cnt
             OR (o.cnt = c.cnt AND o.event_type < c.event_type)) AS rnk
  FROM cnts c
),
daily AS MATERIALIZED (
  SELECT e.event_type,
         CAST(floor(epoch(date_trunc('day', e.ts))) AS BIGINT) / 86400 AS d,
         round(sum(e.value), 6) AS v
  FROM events e JOIN ranked r ON r.event_type = e.event_type AND r.rnk < 2
  GROUP BY 1, 2
),
a AS (SELECT d, v FROM daily
      JOIN ranked USING (event_type) WHERE rnk = 0),
b AS (SELECT d, v FROM daily
      JOIN ranked USING (event_type) WHERE rnk = 1),
lags AS (SELECT unnest(range(-7, 8)) AS lag),
j AS (
  SELECT l.lag, a.v AS va, b.v AS vb
  FROM lags l
  JOIN a ON TRUE
  JOIN b ON b.d = a.d + l.lag
)
SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       round(corr(va, vb), 4) AS ccf
FROM j GROUP BY lag ORDER BY lag
""",
    doc="lead-lag cross-correlation between the two highest-volume "
    "event-type daily series at lags -7..+7 — the 'does A lead B' "
    "probe (marketing spend vs purchases, views vs signups) that "
    "complements ts_autocorr_lags' SELF-correlation.  The two "
    "series are DERIVED (top-2 types by event count, count-then-name "
    "tiebreak via a rank self-join on the tiny type aggregate — no "
    "global window), so the query stays meaningful at every scale "
    "factor; daily sums rounded 6dp before the correlation per the "
    "partial-aggregate discipline.  Each lag is an equi-join on the "
    "integer day index (15 lags x days rows, no ordered window); "
    "corr() is the identical sample estimator on both engines",
)
def ts_cross_correlation_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    o = cnts.select(
        F.col("event_type").alias("o_type"), F.col("cnt").alias("o_cnt")
    )
    ranked = (
        cnts.join(
            F.broadcast(o),
            (F.col("o_cnt") > F.col("cnt"))
            | (
                (F.col("o_cnt") == F.col("cnt"))
                & (F.col("o_type") < F.col("event_type"))
            ),
            "left",
        )
        .groupBy("event_type")
        .agg(F.count("o_type").alias("rnk"))
        .filter(F.col("rnk") < 2)
    )
    daily = (
        ev.join(F.broadcast(ranked), "event_type")
        .groupBy(
            "rnk",
            (
                F.floor(F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
            ).alias("d"),
        )
        .agg(F.round(F.sum("value"), 6).alias("v"))
        .localCheckpoint(eager=False)
    )
    a = daily.filter(F.col("rnk") == 0).select("d", F.col("v").alias("va"))
    b = daily.filter(F.col("rnk") == 1).select(
        F.col("d").alias("bd"), F.col("v").alias("vb")
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    j = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("bd") == F.col("d") + F.col("lag")
    )
    return (
        j.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.corr("va", "vb"), 4).alias("ccf"),
        )
        .orderBy("lag")
    )


# ------------------------------------------------ nonparametric stats


@register(
    "stats_anderson_darling_2s",
    oracle="""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(floor(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
           / 86400 AS d
  FROM orders
),
cut AS (SELECT CAST(floor(quantile_cont(d, 0.5)) AS BIGINT) AS c FROM o),
tagged AS (
  SELECT cents, CASE WHEN d <= (SELECT c FROM cut) THEN 1 ELSE 0 END AS g1
  FROM o
),
sizes AS (
  SELECT sum(g1) AS n1, count(*) - sum(g1) AS n2, count(*) AS n FROM tagged
),
vals AS (
  SELECT cents, count(*) AS l, sum(g1) AS m FROM tagged GROUP BY cents
),
pre AS (
  SELECT cents, l,
         sum(l) OVER (ORDER BY cents) AS bj,
         sum(m) OVER (ORDER BY cents) AS mj
  FROM vals
),
terms AS (
  SELECT l,
         CAST(s.n AS DOUBLE) * mj - CAST(s.n1 AS DOUBLE) * bj AS diff,
         CAST(s.n AS DOUBLE) * bj * (s.n - bj) AS den
  FROM pre CROSS JOIN sizes s
  WHERE bj < s.n
)
SELECT CAST(max(s.n1) AS BIGINT) AS n1,
       CAST(max(s.n2) AS BIGINT) AS n2,
       CAST(count(*) AS BIGINT) AS n_support,
       round((1.0 / max(s.n1) + 1.0 / max(s.n2))
             * sum(l * diff * diff / den), 4) AS a2_stat,
       (1.0 / max(s.n1) + 1.0 / max(s.n2))
         * sum(l * diff * diff / den) > 2.492 AS reject_5pct
FROM terms CROSS JOIN sizes s
""",
    doc="two-sample Anderson-Darling test (early-half vs late-half "
    "order totals, cutoff = median order day, money as integer "
    "cents): the tail-weighted ECDF test that catches tail drift "
    "stats_ks_two_sample's max-gap statistic is blind to.  "
    "Scholz-Stephens discrete form over the distinct-value support "
    "with the k=2 antisymmetry folded in: A2 = (1/n1+1/n2) * sum_j "
    "l_j (N*M_j - n1*B_j)^2 / (N B_j (N-B_j)), B_j/M_j inclusive "
    "prefix counts, last support point excluded; 2.492 is Pettitt's "
    "(1976) large-sample 5%% point.  All counters are exact "
    "integers; the squared term is cast to double before squaring "
    "(identical operands -> identical IEEE result on both engines).  "
    "The engine computes BOTH prefix counters in ONE two-level "
    "global_prefix_sum by packing (count, group1-count) into a "
    "single 64-bit value (l*2^32+m, exact while N < 2^31) — no "
    "single-partition window at any scale; the oracle keeps the "
    "plain window, provably equal because the range buckets tile "
    "the cents order",
)
def stats_anderson_darling_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import global_prefix_sum

    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        (
            F.floor(F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / 86400)
        ).alias("d"),
    )
    cut = o.agg(
        F.floor(F.expr("percentile(d, 0.5)")).cast("long").alias("c")
    )
    tagged = o.crossJoin(F.broadcast(cut)).select(
        "cents", F.when(F.col("d") <= F.col("c"), 1).otherwise(0).alias("g1")
    )
    sizes = tagged.agg(
        F.sum("g1").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g1")).alias("n2"),
        F.count(F.lit(1)).alias("n"),
    )
    vals = tagged.groupBy("cents").agg(
        F.count(F.lit(1)).alias("l"), F.sum("g1").alias("m")
    )
    packed = vals.withColumn(
        "lm", F.col("l") * F.lit(1 << 32) + F.col("m")
    )
    pre = global_prefix_sum(
        packed, [F.col("cents")], "lm", out_col="cum"
    ).select(
        "l",
        (F.col("cum") / F.lit(1 << 32)).cast("long").alias("bj"),
        (F.col("cum") % F.lit(1 << 32)).alias("mj"),
    )
    terms = (
        pre.crossJoin(F.broadcast(sizes))
        .filter(F.col("bj") < F.col("n"))
        .select(
            "l",
            "n1",
            "n2",
            (
                F.col("n").cast("double") * F.col("mj")
                - F.col("n1").cast("double") * F.col("bj")
            ).alias("diff"),
            (
                F.col("n").cast("double") * F.col("bj") * (F.col("n") - F.col("bj"))
            ).alias("den"),
        )
    )
    a2 = (1.0 / F.max("n1") + 1.0 / F.max("n2")) * F.sum(
        F.col("l") * F.col("diff") * F.col("diff") / F.col("den")
    )
    return terms.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_support"),
        F.round(a2, 4).alias("a2_stat"),
        (a2 > 2.492).alias("reject_5pct"),
    )


@register(
    "stats_odds_ratio_ci",
    oracle="""
WITH med AS (SELECT quantile_cont(l_discount, 0.5) AS m FROM lineitem),
cells AS (
  SELECT l_linestatus,
         sum(CASE WHEN l_discount > (SELECT m FROM med)
                   AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN l_discount > (SELECT m FROM med)
                   AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN l_discount <= (SELECT m FROM med)
                   AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN l_discount <= (SELECT m FROM med)
                   AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS d
  FROM lineitem GROUP BY l_linestatus
)
SELECT l_linestatus,
       CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 4)
         AS odds_ratio,
       round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
             - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4) AS ci_lo,
       round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
             + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4) AS ci_hi,
       exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
             - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)) > 1.0
         OR exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
             + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)) < 1.0
         AS significant_5pct
FROM cells ORDER BY l_linestatus
""",
    doc="odds ratio with Woolf 95%% log-CI per line status: exposure "
    "= discount above the DERIVED global median, outcome = returned "
    "('R') — the epidemiology-style effect measure that complements "
    "ab_wilson_intervals' per-arm proportion bounds with a single "
    "association number and its uncertainty (CI excluding 1 = "
    "significant).  One pass builds all four 2x2 cells as "
    "conditional sums; every cell is provably nonzero on the "
    "smallest fixture (each linestatus x returnflag x discount-half "
    "stratum holds hundreds of rows), so the ANSI-mode divisions "
    "and ln() are total.  The broadcast median is the only "
    "cross-stage dependency; the aggregation is one shuffle on "
    "linestatus at any scale",
)
def stats_odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    med = li.agg(F.expr("percentile(l_discount, 0.5)").alias("m"))
    exposed = F.col("l_discount") > F.col("m")
    ret = F.col("l_returnflag") == "R"
    cells = (
        li.crossJoin(F.broadcast(med))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(exposed & ret, 1).otherwise(0)).alias("a"),
            F.sum(F.when(exposed & ~ret, 1).otherwise(0)).alias("b"),
            F.sum(F.when(~exposed & ret, 1).otherwise(0)).alias("c"),
            F.sum(F.when(~exposed & ~ret, 1).otherwise(0)).alias("d"),
        )
    )
    lor = F.log(
        F.col("a").cast("double")
        * F.col("d")
        / (F.col("b").cast("double") * F.col("c"))
    )
    se = 1.96 * F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        "l_linestatus",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(F.exp(lor), 4).alias("odds_ratio"),
        F.round(F.exp(lor - se), 4).alias("ci_lo"),
        F.round(F.exp(lor + se), 4).alias("ci_hi"),
        ((F.exp(lor - se) > 1.0) | (F.exp(lor + se) < 1.0)).alias(
            "significant_5pct"
        ),
    ).orderBy("l_linestatus")


@register(
    "stats_sign_test_lag7",
    oracle="""
WITH daily AS (
  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) / 86400 AS d,
         round(sum(value), 6) AS v
  FROM events GROUP BY 1
),
pairs AS (
  SELECT c.v - p.v AS diff
  FROM daily c JOIN daily p ON p.d = c.d - 7
  WHERE c.v <> p.v
),
s AS (
  SELECT count(*) AS n,
         sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS pos
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(pos AS BIGINT) AS n_pos,
       CAST(n - pos AS BIGINT) AS n_neg,
       round((pos - n / 2.0
              - CASE WHEN pos * 2 > n THEN 0.5
                     WHEN pos * 2 < n THEN -0.5 ELSE 0.0 END)
             / sqrt(n / 4.0), 4) AS z_stat,
       abs((pos - n / 2.0
              - CASE WHEN pos * 2 > n THEN 0.5
                     WHEN pos * 2 < n THEN -0.5 ELSE 0.0 END)
             / sqrt(n / 4.0)) > 1.96 AS significant_5pct
FROM s
""",
    doc="paired sign test on week-over-week daily value changes "
    "(day d vs day d-7): the distribution-free 'is this week "
    "systematically above last week' test — the hypothesis-test "
    "counterpart to dash_week_over_week_movers' listing and a "
    "median-based cousin of stats_mann_kendall_trend (which pools "
    "ALL pairs; the sign test uses only the seasonal-aligned lag-7 "
    "pairs, so weekday mix cancels).  Continuity-corrected normal "
    "approximation z = (S - n/2 -+ 0.5)/sqrt(n/4) with zero "
    "differences dropped per the classic procedure; daily sums "
    "rounded 6dp first so the zero-test agrees bit-for-bit across "
    "engines.  One lag-7 equi-join on the integer day index, no "
    "ordered window",
)
def stats_sign_test_lag7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.floor(F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
        ).alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("v")).localCheckpoint(eager=False)
    c, p = daily.alias("c"), daily.alias("p")
    pairs = (
        c.join(p, F.col("p.d") == F.col("c.d") - 7)
        .filter(F.col("c.v") != F.col("p.v"))
        .select((F.col("c.v") - F.col("p.v")).alias("diff"))
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("pos"),
    )
    corr_term = F.when(F.col("pos") * 2 > F.col("n"), 0.5).when(
        F.col("pos") * 2 < F.col("n"), -0.5
    ).otherwise(0.0)
    z = (F.col("pos") - F.col("n") / 2.0 - corr_term) / F.sqrt(
        F.col("n") / 4.0
    )
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("pos").cast("long").alias("n_pos"),
        (F.col("n") - F.col("pos")).cast("long").alias("n_neg"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )


@register(
    "stats_hodges_lehmann_shift",
    oracle="""
WITH ha AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, count(*) AS c
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
hb AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, count(*) AS c
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1
),
diffs AS (
  SELECT ha.q - hb.q AS delta, sum(ha.c * hb.c) AS w
  FROM ha JOIN hb ON TRUE
  GROUP BY 1
),
tot AS (SELECT sum(w) AS tw, sum(delta * w) AS swd FROM diffs),
cum AS (
  SELECT a.delta, sum(b.w) AS cw
  FROM diffs a JOIN diffs b ON b.delta <= a.delta
  GROUP BY a.delta
)
SELECT CAST(max(t.tw) AS BIGINT) AS n_pairs,
       (min(CASE WHEN 2 * cw >= t.tw THEN delta END)
        + min(CASE WHEN 2 * cw > t.tw THEN delta END)) / 2.0 AS hl_shift,
       round(max(t.swd) * 1.0 / max(t.tw), 4) AS mean_shift
FROM cum CROSS JOIN tot t
""",
    doc="Hodges-Lehmann shift estimator between returned ('R') and "
    "kept ('N') line-item quantities: the median of ALL pairwise "
    "differences — the robust effect-size companion to "
    "stats_mann_whitney_u (which only tests; HL says HOW BIG the "
    "shift is, immune to the outliers that drag mean_shift).  "
    "Quantity is discrete (integers 1..50), so the n_a x n_b pair "
    "multiset collapses EXACTLY to a 50x50 histogram cross join "
    "with integer weights — flat in row count like the "
    "canonicalize-before-pairing ER pattern, vs the O(n^2) naive "
    "pair materialization.  The weighted median over <=99 distinct "
    "differences uses a cumulative self-join (no window at all) "
    "with the standard lower/upper midpoint for even mass, and the "
    "lower/upper picks fold into ONE conditional aggregate; the "
    "mean shift comes free from the same weighted diffs via "
    "sum(delta*w)/sum(w) == mean_a - mean_b (exact rational "
    "identity).  Everything left of the final divisions is exact "
    "64-bit integer arithmetic",
)
def stats_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qa = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    qb = (
        li.filter(F.col("l_returnflag") == "N")
        .groupBy(F.col("l_quantity").cast("long").alias("qb"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    diffs = (
        qa.crossJoin(F.broadcast(qb))
        .groupBy((F.col("q") - F.col("qb")).alias("delta"))
        .agg(F.sum(F.col("c") * F.col("cb")).alias("w"))
        .localCheckpoint(eager=False)
    )
    tot = diffs.agg(
        F.sum("w").alias("tw"),
        F.sum(F.col("delta") * F.col("w")).alias("swd"),
    )
    b = diffs.select(F.col("delta").alias("bd"), F.col("w").alias("bw"))
    cum = (
        diffs.crossJoin(F.broadcast(b))
        .filter(F.col("bd") <= F.col("delta"))
        .groupBy("delta")
        .agg(F.sum("bw").alias("cw"))
        .crossJoin(F.broadcast(tot))
    )
    return cum.agg(
        F.max("tw").cast("long").alias("n_pairs"),
        (
            (
                F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("delta")))
                + F.min(F.when(2 * F.col("cw") > F.col("tw"), F.col("delta")))
            )
            / 2.0
        ).alias("hl_shift"),
        F.round(F.max("swd") * 1.0 / F.max("tw"), 4).alias("mean_shift"),
    )


# ------------------------------------------------ graph link prediction


@register(
    "graph_adamic_adar",
    oracle="""
WITH raw AS MATERIALIZED (
  SELECT least(c.c_nationkey, s.s_nationkey) AS u,
         greatest(c.c_nationkey, s.s_nationkey) AS v,
         count(*) AS cnt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
thr AS (SELECT quantile_cont(cnt, 0.75) AS t FROM raw),
edges AS MATERIALIZED (
  SELECT u, v FROM raw WHERE cnt >= (SELECT t FROM thr)
),
adj AS MATERIALIZED (
  SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges
),
deg AS (SELECT a, count(*) AS d FROM adj GROUP BY a),
cand AS (
  SELECT x.a AS u, y.a AS v,
         count(*) AS cn,
         sum(1.0 / ln(dz.d)) AS aa
  FROM adj x
  JOIN adj y ON x.b = y.b AND x.a < y.a
  JOIN deg dz ON dz.a = x.b
  GROUP BY x.a, y.a
)
SELECT c.u, c.v, CAST(c.cn AS BIGINT) AS n_common,
       round(c.aa, 6) AS aa_score
FROM cand c
LEFT JOIN edges e ON e.u = c.u AND e.v = c.v
WHERE e.u IS NULL
ORDER BY aa_score DESC, c.u, c.v LIMIT 20
""",
    doc="Adamic-Adar link prediction over the SPARSIFIED nation trade "
    "graph (edges = pairs with trade volume >= the DERIVED p75 "
    "pair-count threshold, so non-edges exist at every scale factor "
    "— the dense full graph would make 'predict missing links' "
    "degenerate): for each non-adjacent pair sharing >=1 neighbor, "
    "AA = sum over common neighbors z of 1/ln(deg(z)) — the "
    "degree-discounted refinement of graph_common_neighbors' raw "
    "count/Jaccard (a common neighbor that connects to everything "
    "carries little evidence).  ln(deg) is total: any common "
    "neighbor of a pair has degree >= 2.  Wedges come from one "
    "adjacency self-join bounded by sum(deg^2) exactly as the "
    "common-neighbors query; the anti-join against the edge set "
    "removes existing links; (score desc, u, v) total tiebreak on "
    "the top-20",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    raw = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    thr = raw.agg(F.expr("percentile(cnt, 0.75)").alias("t"))
    edges = (
        raw.crossJoin(F.broadcast(thr))
        .filter(F.col("cnt") >= F.col("t"))
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    adj = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("z")).agg(F.count(F.lit(1)).alias("d"))
    x = adj.select(F.col("a").alias("xu"), F.col("b").alias("z"))
    y = adj.select(F.col("a").alias("yv"), F.col("b").alias("z"))
    cand = (
        x.join(y, "z")
        .filter(F.col("xu") < F.col("yv"))
        .join(deg, "z")
        .groupBy(F.col("xu").alias("u"), F.col("yv").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log(F.col("d"))).alias("aa"),
        )
    )
    return (
        cand.join(edges, ["u", "v"], "left_anti")
        .select(
            "u",
            "v",
            F.col("cn").cast("long").alias("n_common"),
            F.round("aa", 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "u", "v")
        .limit(20)
    )


# ------------------------------------------------ sketch families


@register(
    "sketch_kmv_set_ops",
    oracle="""
WITH d AS (SELECT count(DISTINCT user_id) AS du FROM events),
pp AS (SELECT greatest(8, CAST(du // 4 AS INT)) AS k FROM d),
uh AS (
  SELECT DISTINCT event_type, user_id,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
sk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM uh
  QUALIFY rn <= (SELECT k FROM pp)
),
per AS (
  SELECT event_type, count(*) AS sz, max(h) AS hk FROM sk GROUP BY 1
),
prs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM per a JOIN per b ON a.event_type < b.event_type
),
mrg AS (
  SELECT p.type_a, p.type_b, s.h,
         max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM prs p
  JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY 1, 2, 3
),
uk AS (
  SELECT type_a, type_b, h, in_a, in_b,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM mrg
  QUALIFY rn <= (SELECT k FROM pp)
),
est AS (
  SELECT u.type_a, u.type_b,
         count(*) AS usz, max(u.h) AS uhk,
         sum(u.in_a * u.in_b) AS kboth
  FROM uk u GROUP BY 1, 2
),
ex AS (
  SELECT p.type_a, p.type_b,
         count(DISTINCT x.user_id) AS exact_union,
         count(DISTINCT CASE WHEN xa.user_id IS NOT NULL
                              AND xb.user_id IS NOT NULL
                             THEN x.user_id END) AS exact_inter
  FROM prs p
  JOIN (SELECT DISTINCT event_type, user_id FROM events) x
    ON x.event_type IN (p.type_a, p.type_b)
  LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) xa
    ON xa.event_type = p.type_a AND xa.user_id = x.user_id
  LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) xb
    ON xb.event_type = p.type_b AND xb.user_id = x.user_id
  GROUP BY 1, 2
)
SELECT e.type_a, e.type_b,
       round(CASE WHEN e.usz < (SELECT k FROM pp) THEN e.usz
                  ELSE ((SELECT k FROM pp) - 1)
                       / (e.uhk / 1152921504606846976.0) END, 4)
         AS est_union,
       round(CASE WHEN e.usz < (SELECT k FROM pp) THEN e.kboth
                  ELSE e.kboth * 1.0 / e.usz
                       * (((SELECT k FROM pp) - 1)
                          / (e.uhk / 1152921504606846976.0)) END, 4)
         AS est_inter,
       CAST(x.exact_union AS BIGINT) AS exact_union,
       CAST(x.exact_inter AS BIGINT) AS exact_inter
FROM est e JOIN ex x ON x.type_a = e.type_a AND x.type_b = e.type_b
ORDER BY e.type_a, e.type_b
""",
    doc="KMV (k-minimum-values) distinct sketches with SET OPERATIONS "
    "— the capability HLL lacks: two KMV sketches merge into a union "
    "sketch (k smallest of the combined hash sets) AND estimate the "
    "INTERSECTION via the Jaccard fraction of the union-sketch "
    "members present in both sides (Beyer et al.).  k DERIVES from "
    "the corpus (max(8, distinct_users/4)) so every scale factor "
    "exercises the estimation regime rather than the exact "
    "small-sketch branch; hashes are the repo's standard 60-bit md5 "
    "prefix, so the oracle replays bit-for-bit.  est = (k-1)/h_(k) "
    "normalized to [0,1); sketches that never fill carry their "
    "exact size (the defined KMV behavior).  Per-type sketch = one "
    "shuffle + per-type top-k window (bounded by k); pair merges "
    "touch 10 type pairs x k rows — sketch-sized, never "
    "corpus-sized, which is the whole point at 100 TB",
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.agg(
        F.greatest(
            F.lit(8), (F.countDistinct("user_id") / 4).cast("int")
        ).alias("k")
    )
    uh = (
        ev.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type",
            "user_id",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    sk = (
        uh.withColumn("rn", F.row_number().over(wt))
        .crossJoin(F.broadcast(d))
        .filter(F.col("rn") <= F.col("k"))
        .select("event_type", "h")
        .localCheckpoint(eager=False)
    )
    types = sk.select("event_type").distinct()
    prs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    mrg = (
        F.broadcast(prs)
        .join(
            sk,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    est = (
        mrg.withColumn("rn", F.row_number().over(wp))
        .crossJoin(F.broadcast(d))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("usz"),
            F.max("h").alias("uhk"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("kboth"),
            F.max("k").alias("k"),
        )
    )
    du = ev.select("event_type", "user_id").distinct()
    xa = du.select(F.col("event_type").alias("ta"), F.col("user_id").alias("ua"))
    xb = du.select(F.col("event_type").alias("tb"), F.col("user_id").alias("ub"))
    ex = (
        F.broadcast(prs)
        .join(du, (F.col("event_type") == F.col("type_a")) | (F.col("event_type") == F.col("type_b")))
        .join(
            xa,
            (F.col("ta") == F.col("type_a")) & (F.col("ua") == F.col("user_id")),
            "left",
        )
        .join(
            xb,
            (F.col("tb") == F.col("type_b")) & (F.col("ub") == F.col("user_id")),
            "left",
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.countDistinct("user_id").alias("exact_union"),
            F.countDistinct(
                F.when(
                    F.col("ua").isNotNull() & F.col("ub").isNotNull(),
                    F.col("user_id"),
                )
            ).alias("exact_inter"),
        )
    )
    full_u = ((F.col("k") - 1) / (F.col("uhk") / F.lit(float(1 << 60))))
    est_union = F.when(F.col("usz") < F.col("k"), F.col("usz")).otherwise(
        full_u
    )
    est_inter = F.when(F.col("usz") < F.col("k"), F.col("kboth")).otherwise(
        F.col("kboth") * 1.0 / F.col("usz") * full_u
    )
    return (
        est.join(ex, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            F.round(est_union, 4).alias("est_union"),
            F.round(est_inter, 4).alias("est_inter"),
            F.col("exact_union").cast("long").alias("exact_union"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "sketch_ams_f2",
    oracle="""
WITH cnt AS (
  SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2
),
exact AS (
  SELECT event_type, sum(c * c) AS f2_exact FROM cnt GROUP BY 1
),
reps AS (SELECT unnest(range(0, 8)) AS r),
signed AS (
  SELECT c.event_type, r.r,
         sum(c.c * (CASE WHEN CAST(concat('0x',
               substr(md5(CAST(c.user_id AS VARCHAR) || '#' ||
                          CAST(r.r AS VARCHAR)), 1, 15)) AS BIGINT)
               % 2 = 1 THEN 1 ELSE -1 END)) AS sx
  FROM cnt c CROSS JOIN reps r
  GROUP BY 1, 2
),
est AS (
  SELECT event_type,
         quantile_cont(CAST(sx AS DOUBLE) * sx, 0.5) AS f2_est
  FROM signed GROUP BY 1
)
SELECT e.event_type,
       CAST(x.f2_exact AS BIGINT) AS f2_exact,
       round(e.f2_est, 4) AS f2_est,
       round(abs(e.f2_est - x.f2_exact) / x.f2_exact, 4) AS rel_err
FROM est e JOIN exact x ON x.event_type = e.event_type
ORDER BY e.event_type
""",
    doc="AMS (Alon-Matias-Szegedy) second-frequency-moment sketch per "
    "event type: F2 = sum over users of count^2 — the self-join-size "
    "/ skew statistic — estimated by the median of 8 independent "
    "sign-hash repetitions, X_r = (sum_u s_r(u) c_u)^2 with s_r "
    "in {-1,+1} from the salted md5 parity (deterministic, "
    "oracle-replayable), against the exact F2 from the same count "
    "aggregate.  E[X_r] = F2 exactly; the median tames the "
    "heavy-tailed estimator.  This is the sketch that predicts "
    "shuffle-join blowup (sum df^2 — the quantity the dedup "
    "prefix-filter caps) from one streaming pass over increments; "
    "the sketch state is 8 numbers per group regardless of user "
    "cardinality.  One shuffle for the per-user counts, an 8x "
    "replicated second aggregate; median via the identical "
    "interpolating quantile on both engines",
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    exact = cnt.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("f2_exact")
    )
    reps = spark.range(0, 8).select(F.col("id").cast("int").alias("r"))
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("#"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 1,
        1,
    ).otherwise(-1)
    signed = (
        cnt.crossJoin(F.broadcast(reps))
        .groupBy("event_type", "r")
        .agg(F.sum(F.col("c") * sign).alias("sx"))
    )
    est = signed.groupBy("event_type").agg(
        F.expr("percentile(cast(sx as double) * sx, 0.5)").alias("f2_est")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("f2_exact").cast("long").alias("f2_exact"),
            F.round("f2_est", 4).alias("f2_est"),
            F.round(
                F.abs(F.col("f2_est") - F.col("f2_exact")) / F.col("f2_exact"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_linear_counting",
    oracle="""
WITH d AS (SELECT count(DISTINCT user_id) AS du FROM events),
pp AS (
  SELECT CAST(1 AS BIGINT) << length(format('{:b}', 4 * du - 1)) AS m
  FROM d
),
bk AS (
  SELECT event_type,
         count(DISTINCT CAST(concat('0x',
           substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % (SELECT m FROM pp)) AS filled,
         count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST((SELECT m FROM pp) AS BIGINT) AS m_buckets,
       CAST(filled AS BIGINT) AS filled,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       round(-(SELECT m FROM pp)
             * ln(((SELECT m FROM pp) - filled) * 1.0
                  / (SELECT m FROM pp)), 4) AS est_distinct,
       round(abs(-(SELECT m FROM pp)
             * ln(((SELECT m FROM pp) - filled) * 1.0
                  / (SELECT m FROM pp)) - exact_distinct)
             / exact_distinct, 4) AS rel_err
FROM bk ORDER BY event_type
""",
    doc="linear (probabilistic) counting per event type: hash users "
    "into m buckets, observe the empty fraction V, estimate "
    "distinct = -m ln(V) (Whang et al.) — the THIRD point on the "
    "registry's cardinality-sketch spectrum next to "
    "agg_approx_count_distinct (HLL: loglog space, ~2% error) and "
    "agg_bitmap_distinct_users (exact bitmap): LC needs m ~ n bits "
    "but is near-exact at small load factors, the classic choice "
    "when distinct counts are bounded and memory is cheap.  m "
    "DERIVES from the corpus (next power of two >= 4x global "
    "distinct users, via BINARY BIT LENGTH per the log2-misbin "
    "lesson), so V is provably > 0 (m > n) and ln() total at every "
    "scale; the md5 bucket hash replays exactly.  The whole sketch "
    "is one count(DISTINCT bucket) per group — mergeable by bitmap "
    "OR at cluster scale",
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pp = ev.agg(F.countDistinct("user_id").alias("du")).select(
        F.expr(
            "shiftleft(cast(1 as bigint),"
            " cast(length(conv(4 * du - 1, 10, 2)) as int))"
        ).alias("m")
    )
    bk = (
        ev.crossJoin(F.broadcast(pp))
        .groupBy("event_type", "m")
        .agg(
            F.countDistinct(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long")
                % F.col("m")
            ).alias("filled"),
            F.countDistinct("user_id").alias("exact_distinct"),
        )
    )
    est = -F.col("m") * F.log(
        (F.col("m") - F.col("filled")) * 1.0 / F.col("m")
    )
    return bk.select(
        "event_type",
        F.col("m").cast("long").alias("m_buckets"),
        F.col("filled").cast("long").alias("filled"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(est, 4).alias("est_distinct"),
        F.round(
            F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
        ).alias("rel_err"),
    ).orderBy("event_type")


# ------------------------------------------------ CDC lifecycle ops


@register(
    "cdc_schema_evolution_merge",
    oracle="""
WITH v1 AS (
  SELECT c_custkey AS key, c_name, c_acctbal,
         CAST(NULL AS VARCHAR) AS c_tier,
         c_custkey * 1000 AS ts_ms
  FROM customer
),
v2 AS (
  SELECT c_custkey AS key, c_name, c_acctbal + 100.0 AS c_acctbal,
         CASE WHEN c_acctbal + 100.0 >= 5000 THEN 'gold'
              WHEN c_acctbal + 100.0 >= 0 THEN 'silver'
              ELSE 'bronze' END AS c_tier,
         c_custkey * 1000 + 500000 AS ts_ms
  FROM customer WHERE c_custkey % 3 = 0
),
log AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
latest AS (
  SELECT * FROM log
  QUALIFY row_number() OVER (PARTITION BY key ORDER BY ts_ms DESC) = 1
)
SELECT coalesce(c_tier, 'v1-legacy') AS tier,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_acctbal
FROM latest GROUP BY 1 ORDER BY 1
""",
    doc="CDC schema evolution: a v2 capture stream adds a column "
    "(c_tier) mid-flight and the merge must widen the snapshot "
    "schema, backfilling NULL for rows only ever seen by v1 — the "
    "day-2 problem every Debezium deployment hits when the source "
    "table gains a column (the reference pipeline would crash its "
    "fixed-schema consumer dispatch, consumer_to_opensearch.py:67) "
    ".  The engine uses Spark's native evolution primitive — "
    "unionByName(allowMissingColumns=True) — then ordinary "
    "last-writer-wins per key; schema merge is a METADATA "
    "operation, zero extra shuffles beyond the latest-per-key it "
    "would do anyway.  Deterministic synthetic v1/v2 envelopes "
    "derived from the customer table (insert at key*1000 ms, "
    "every-3rd-key update at +500s) keep the oracle replayable",
)
def cdc_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    v1 = cu.select(
        F.col("c_custkey").alias("key"),
        "c_name",
        "c_acctbal",
        (F.col("c_custkey") * 1000).alias("ts_ms"),
    )
    v2 = cu.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("key"),
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.when(F.col("c_acctbal") + 100.0 >= 5000, "gold")
        .when(F.col("c_acctbal") + 100.0 >= 0, "silver")
        .otherwise("bronze")
        .alias("c_tier"),
        (F.col("c_custkey") * 1000 + 500000).alias("ts_ms"),
    )
    log = v1.unionByName(v2, allowMissingColumns=True)
    w = Window.partitionBy("key").orderBy(F.desc("ts_ms"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        latest.groupBy(F.coalesce("c_tier", F.lit("v1-legacy")).alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("tier")
    )


@register(
    "cdc_dlq_replay",
    oracle="""
WITH upd AS (
  SELECT c_custkey AS key, c_mktsegment,
         c_acctbal - 2000.0 AS new_bal
  FROM customer WHERE c_custkey % 2 = 0
),
valid AS (SELECT * FROM upd WHERE new_bal >= 0),
dlq AS (SELECT * FROM upd WHERE new_bal < 0),
repaired AS (SELECT key, c_mktsegment, 0.0 AS new_bal FROM dlq),
final AS (
  SELECT c.c_mktsegment,
         coalesce(v.new_bal, r.new_bal, c.c_acctbal) AS bal,
         CASE WHEN d.key IS NOT NULL THEN 1 ELSE 0 END AS was_quarantined
  FROM customer c
  LEFT JOIN valid v ON v.key = c.c_custkey
  LEFT JOIN repaired r ON r.key = c.c_custkey
  LEFT JOIN dlq d ON d.key = c.c_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(was_quarantined) AS BIGINT) AS n_quarantined_replayed,
       CAST(sum(CASE WHEN bal = 0.0 AND was_quarantined = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_zero,
       round(sum(bal), 2) AS sum_final_bal
FROM final GROUP BY 1 ORDER BY 1
""",
    doc="dead-letter-queue lifecycle for constrained CDC apply: a "
    "deterministic debit batch (every 2nd key, -2000) splits at the "
    "acctbal >= 0 constraint into applied rows and a quarantine "
    "(the oracle-backed twin of the test-only P7 constraint/"
    "quarantine operator, cdc/algebra.py:189); the DLQ is then "
    "REPAIRED (clamp to the constraint boundary) and REPLAYED, and "
    "the final per-segment state proves replay-completeness: every "
    "quarantined key lands exactly once, at the clamped value — "
    "n_quarantined_replayed == n_clamped_zero per segment.  This "
    "is the operational loop the reference's consumer lacks "
    "entirely (its delete branch is dead code and failures drop "
    "events, consumer_to_opensearch.py:79-84); here at-least-once "
    "redelivery of the repaired batch stays idempotent because the "
    "apply is keyed MERGE, not append.  Three broadcast-sized "
    "left joins against the base scan; one shuffle for the "
    "segment rollup",
)
def cdc_dlq_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    upd = cu.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("key"),
        (F.col("c_acctbal") - 2000.0).alias("new_bal"),
    )
    valid = upd.filter(F.col("new_bal") >= 0).withColumnRenamed(
        "new_bal", "v_bal"
    )
    dlq = upd.filter(F.col("new_bal") < 0).select(
        "key", F.lit(1).alias("was_quarantined")
    )
    repaired = dlq.select("key", F.lit(0.0).alias("r_bal"))
    final = (
        cu.join(valid, cu.c_custkey == valid.key, "left")
        .drop("key")
        .join(repaired, cu.c_custkey == repaired.key, "left")
        .drop("key")
        .join(dlq, cu.c_custkey == dlq.key, "left")
        .select(
            "c_mktsegment",
            F.coalesce("v_bal", "r_bal", "c_acctbal").alias("bal"),
            F.coalesce("was_quarantined", F.lit(0)).alias("was_quarantined"),
        )
    )
    return (
        final.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("was_quarantined").cast("long").alias(
                "n_quarantined_replayed"
            ),
            F.sum(
                F.when(
                    (F.col("bal") == 0.0) & (F.col("was_quarantined") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clamped_zero"),
            F.round(F.sum("bal"), 2).alias("sum_final_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ------------------------------------------------ association rules


@register(
    "basket_association_rules",
    oracle="""
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
freq AS MATERIALIZED (
  SELECT l_partkey, count(*) AS nf FROM items GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS nab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, nab FROM pairs
  UNION ALL
  SELECT pb, pa, nab FROM pairs
)
SELECT r.antecedent, r.consequent,
       CAST(r.nab AS BIGINT) AS n_both,
       round(r.nab * 1.0 / fa.nf, 6) AS confidence,
       round(r.nab * 1.0 * n.n_orders / (fa.nf * fc.nf), 6) AS lift,
       CASE WHEN r.nab < fa.nf
            THEN round((1.0 - fc.nf * 1.0 / n.n_orders)
                       / (1.0 - r.nab * 1.0 / fa.nf), 6) END AS conviction
FROM rules r
JOIN freq fa ON fa.l_partkey = r.antecedent
JOIN freq fc ON fc.l_partkey = r.consequent
CROSS JOIN n
ORDER BY lift DESC, confidence DESC, antecedent, consequent
LIMIT 20
""",
    doc="directed association rules on top of basket_copurchase_pairs' "
    "candidate step: confidence P(b|a), lift P(ab)/(P(a)P(b)), and "
    "conviction (1-P(b))/(1-conf) — the full A-priori rule-quality "
    "triple, which the undirected pair-support listing cannot "
    "express (confidence and conviction are ASYMMETRIC; each "
    "support-2 pair yields two rules with different strengths).  "
    "Conviction is NULL exactly when confidence = 1 (its defined "
    "singularity; the guard is the integer test nab < nf, no float "
    "compare).  All measures are single divisions of exact integer "
    "counts — identical doubles on both engines, rounded 6dp, with "
    "a (lift, confidence, antecedent, consequent) total order.  "
    "Same basket-bounded pair volume as the sibling (sum of k^2 "
    "per order, k <= 7 here, hot-basket cap at real scale); the "
    "rule expansion and metric joins are linear in the pair count",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=False
    )
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("nf"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 2)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "nab"
    ).unionAll(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "nab",
        )
    )
    fa = freq.select(
        F.col("l_partkey").alias("antecedent"), F.col("nf").alias("nfa")
    )
    fc = freq.select(
        F.col("l_partkey").alias("consequent"), F.col("nf").alias("nfc")
    )
    conf = F.col("nab") * 1.0 / F.col("nfa")
    return (
        rules.join(fa, "antecedent")
        .join(fc, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("nab").cast("long").alias("n_both"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                F.col("nab") * 1.0 * F.col("n_orders")
                / (F.col("nfa") * F.col("nfc")),
                6,
            ).alias("lift"),
            F.when(
                F.col("nab") < F.col("nfa"),
                F.round(
                    (1.0 - F.col("nfc") * 1.0 / F.col("n_orders"))
                    / (1.0 - conf),
                    6,
                ),
            ).alias("conviction"),
        )
        .orderBy(
            F.desc("lift"), F.desc("confidence"), "antecedent", "consequent"
        )
        .limit(20)
    )


# ------------------------------------------------ randomness diagnostics


@register(
    "ts_turning_points_test",
    oracle="""
WITH daily AS (
  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) / 86400 AS d,
         round(sum(value), 6) AS v
  FROM events GROUP BY 1
),
tri AS (
  SELECT c.v AS v, p.v AS vp, nx.v AS vn
  FROM daily c
  JOIN daily p ON p.d = c.d - 1
  JOIN daily nx ON nx.d = c.d + 1
),
s AS (
  SELECT count(*) AS ni,
         sum(CASE WHEN (v > vp AND v > vn) OR (v < vp AND v < vn)
                  THEN 1 ELSE 0 END) AS t
  FROM tri
)
SELECT CAST(ni + 2 AS BIGINT) AS n_days,
       CAST(t AS BIGINT) AS n_turning_points,
       round(2.0 * ni / 3.0, 4) AS expected_tp,
       round((t - 2.0 * ni / 3.0)
             / sqrt((16.0 * (ni + 2) - 29.0) / 90.0), 4) AS z_stat,
       abs((t - 2.0 * ni / 3.0)
             / sqrt((16.0 * (ni + 2) - 29.0) / 90.0)) > 1.96
         AS significant_5pct
FROM s
""",
    doc="turning-point test of randomness on the daily value series: "
    "count strict local extrema among interior days, compare to the "
    "E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90 of an i.i.d. "
    "sequence (Kendall) — the LOCAL-structure randomness probe "
    "complementing stats_runs_test (runs around the median are "
    "global sign structure; turning points detect short-range "
    "serial dependence like smoothing or weekly ramps).  Strict "
    "inequalities on 6dp-rounded daily sums make tie handling "
    "bit-deterministic across engines; interior days come from two "
    "calendar equi-joins (d-1, d+1) over the daily aggregate — no "
    "ordered window, and days with calendar gaps drop out of the "
    "triple set on both sides identically",
)
def ts_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.floor(F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
        ).alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("v")).localCheckpoint(eager=False)
    c, p, nx = daily.alias("c"), daily.alias("p"), daily.alias("nx")
    tri = (
        c.join(p, F.col("p.d") == F.col("c.d") - 1)
        .join(nx, F.col("nx.d") == F.col("c.d") + 1)
        .select(
            F.col("c.v").alias("v"),
            F.col("p.v").alias("vp"),
            F.col("nx.v").alias("vn"),
        )
    )
    is_tp = (
        (F.col("v") > F.col("vp")) & (F.col("v") > F.col("vn"))
    ) | ((F.col("v") < F.col("vp")) & (F.col("v") < F.col("vn")))
    s = tri.agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(F.when(is_tp, 1).otherwise(0)).alias("t"),
    )
    z = (F.col("t") - 2.0 * F.col("ni") / 3.0) / F.sqrt(
        (16.0 * (F.col("ni") + 2) - 29.0) / 90.0
    )
    return s.select(
        (F.col("ni") + 2).cast("long").alias("n_days"),
        F.col("t").cast("long").alias("n_turning_points"),
        F.round(2.0 * F.col("ni") / 3.0, 4).alias("expected_tp"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )
