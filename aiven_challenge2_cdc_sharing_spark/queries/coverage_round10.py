"""Round-10 window feed (built in round 7).

Families still uncovered after the round-9 batches: the
experimentation guardrail stack every A/B platform ships (sample-ratio
mismatch, CUPED variance reduction, TOST equivalence), paired and
ordered-alternative nonparametrics (paired t, Mood's median, Page's L),
resampling-free uncertainty (jackknife ratio SE), and agreement /
errors-in-variables regression (Lin's CCC, Deming).

Reference provenance: the reference is a single-table CDC relay
(consumer_to_opensearch.py:67-96) with no analytics; every query here
is north-star extension per BASELINE.json, held to the same
oracle-twin + scale-plan bar as the rest of the registry.

Cross-engine disciplines (established rounds 3-9, see SCALING.md):
md5-derived deterministic assignment (the sampling-family discipline),
exact integer cents for money sums, per-key partial sums rounded 6dp
before any second-level moment pass, floor(epoch()) per timestamp,
integer floor-division only on BIGINT operands, scenario constants
DERIVED from the data (lesson 17), and every aggregate aliased
identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


def _md5_mod(prefix: str, col, m: int):
    """Deterministic md5-derived bucket in [0, m) — Spark side of the
    oracle's CAST(concat('0x', substr(md5(...),1,15)) AS BIGINT) % m."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 15), 16, 10
        ).cast("long")
        % m
    )


# ------------------------------------------------ A/B guardrails


@register(
    "ab_srm_check",
    oracle="""
WITH arms AS (
  SELECT CAST(concat('0x', substr(md5('srm:' || c_custkey), 1, 15))
              AS BIGINT) % 2 AS arm
  FROM customer
),
g AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
       round(pow(n_a - n_b, 2) * 1.0 / (n_a + n_b), 4) AS chi2_stat,
       CASE WHEN pow(n_a - n_b, 2) * 1.0 / (n_a + n_b) > 3.841
            THEN 1 ELSE 0 END AS srm_flag
FROM g
""",
    doc="sample-ratio-mismatch guardrail: customers assigned to two "
    "arms by md5(custkey) and the observed split tested against the "
    "designed 50/50 with the 1-df chi-square goodness-of-fit "
    "(chi2 = (n_a-n_b)^2/n), flagged at the 0.05 critical value "
    "3.841.  The FIRST check any experimentation platform runs "
    "before reading a metric — a biased assignment invalidates "
    "every downstream test (ab_test_conversion, ab_wilson_intervals "
    "assume this passed).  The md5 draw is the registry's "
    "deterministic-assignment discipline, so both engines replay "
    "the identical arms.  One map-side hash + a 2-counter "
    "aggregate: no shuffle beyond the final single-row reduce at "
    "any scale",
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    arm = _md5_mod("srm:", F.col("c_custkey"), 2)
    g = cust.agg(
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    chi2 = F.pow(F.col("n_a") - F.col("n_b"), 2) / (
        F.col("n_a") + F.col("n_b")
    )
    return g.select(
        "n_a",
        "n_b",
        F.round(chi2, 4).alias("chi2_stat"),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("srm_flag"),
    )


@register(
    "ab_cuped_adjustment",
    oracle="""
WITH bounds AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
          + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS cut
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(concat('0x', substr(md5('cuped:' || user_id), 1, 15))
              AS BIGINT) % 2 AS arm,
         round(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < cut
                        THEN value ELSE 0 END), 6) AS pre,
         round(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= cut
                        THEN value ELSE 0 END), 6) AS post
  FROM events, bounds
  GROUP BY user_id, cut
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(pre) AS sx, sum(post) AS sy,
         sum(pre * pre) AS sxx, sum(pre * post) AS sxy,
         sum(post * post) AS syy,
         sum(CASE WHEN arm = 1 THEN pre ELSE 0 END) AS sx_t,
         sum(CASE WHEN arm = 1 THEN post ELSE 0 END) AS sy_t,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         sum(CASE WHEN arm = 0 THEN pre ELSE 0 END) AS sx_c,
         sum(CASE WHEN arm = 0 THEN post ELSE 0 END) AS sy_c,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c
  FROM per_user
),
d AS (
  SELECT n, n_t, n_c,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
         (sxy - sx * sy / n)
           / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS rho,
         sy_t / n_t - sy_c / n_c AS diff_raw,
         sx_t / n_t - sx_c / n_c AS pre_imbalance
  FROM m
)
SELECT n AS n_users, n_t, n_c,
       round(theta, 4) AS theta,
       round(diff_raw, 4) AS diff_raw,
       round(diff_raw - theta * pre_imbalance, 4) AS diff_cuped,
       round(rho * rho, 4) AS rho2,
       round(100 * rho * rho, 2) AS var_reduction_pct
FROM d
""",
    doc="CUPED variance reduction (Deng et al. 2013): the events "
    "month is split at the DERIVED midpoint of its epoch span "
    "(lesson-17 discipline — no hardcoded calendar cut), per-user "
    "pre/post value sums become the covariate/metric pair, arms "
    "come from the md5 assignment, theta = cov(pre,post)/var(pre) "
    "is the pooled OLS adjustment, and the CUPED effect is "
    "diff_raw - theta * pre_imbalance.  rho^2 IS the variance "
    "reduction CUPED buys — the single number an experimentation "
    "platform quotes when deciding whether the covariate is worth "
    "wiring in.  Per-user sums are rounded 6dp BEFORE the moment "
    "pass so both engines fold identical doubles; the user-level "
    "float sums drift ~1e-15 relative against the 4dp output "
    "rounding.  Plan: one groupBy(user_id) shuffle, then a "
    "single-row moment reduce — covariate adjustment at 100 TB "
    "costs exactly one extra aggregation column, which is the "
    "point of the demo",
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = F.unix_timestamp("ts").cast("long")
    bounds = ev.agg(
        ((F.min(e) + F.max(e)) / 2).cast("long").alias("cut")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "cut")
        .agg(
            F.round(
                F.sum(F.when(e < F.col("cut"), F.col("value")).otherwise(0.0)),
                6,
            ).alias("pre"),
            F.round(
                F.sum(
                    F.when(e >= F.col("cut"), F.col("value")).otherwise(0.0)
                ),
                6,
            ).alias("post"),
        )
        .withColumn("arm", _md5_mod("cuped:", F.col("user_id"), 2))
    )
    x, y, arm = F.col("pre"), F.col("post"), F.col("arm")
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
        F.sum(F.when(arm == 1, x).otherwise(0.0)).alias("sx_t"),
        F.sum(F.when(arm == 1, y).otherwise(0.0)).alias("sy_t"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(arm == 0, x).otherwise(0.0)).alias("sx_c"),
        F.sum(F.when(arm == 0, y).otherwise(0.0)).alias("sy_c"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n_c"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    theta = cxy / cxx
    rho = cxy / F.sqrt(cxx * cyy)
    diff_raw = F.col("sy_t") / F.col("n_t") - F.col("sy_c") / F.col("n_c")
    pre_imb = F.col("sx_t") / F.col("n_t") - F.col("sx_c") / F.col("n_c")
    return m.select(
        n.alias("n_users"),
        "n_t",
        "n_c",
        F.round(theta, 4).alias("theta"),
        F.round(diff_raw, 4).alias("diff_raw"),
        F.round(diff_raw - theta * pre_imb, 4).alias("diff_cuped"),
        F.round(rho * rho, 4).alias("rho2"),
        F.round(100 * rho * rho, 2).alias("var_reduction_pct"),
    )


@register(
    "ab_equivalence_tost",
    oracle="""
WITH x AS (
  SELECT o_totalprice AS v,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(concat('0x', substr(md5('tost:' || o_custkey), 1, 15))
              AS BIGINT) % 2 AS arm
  FROM orders
),
g AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sc, sum(v * v) AS s2
  FROM x GROUP BY 1
),
ab AS (
  SELECT a.n AS n_a, b.n AS n_b,
         a.sc / 100.0 / a.n AS m_a, b.sc / 100.0 / b.n AS m_b,
         (a.sc + b.sc) / 100.0 / (a.n + b.n) AS m_pool,
         (a.s2 - a.n * pow(a.sc / 100.0 / a.n, 2)) / (a.n - 1) AS v_a,
         (b.s2 - b.n * pow(b.sc / 100.0 / b.n, 2)) / (b.n - 1) AS v_b
  FROM g a, g b WHERE a.arm = 0 AND b.arm = 1
),
t AS (
  SELECT n_a, n_b, m_a - m_b AS diff, 0.05 * m_pool AS margin,
         sqrt(v_a / n_a + v_b / n_b) AS se,
         pow(v_a / n_a + v_b / n_b, 2)
           / (pow(v_a / n_a, 2) / (n_a - 1)
              + pow(v_b / n_b, 2) / (n_b - 1)) AS df_welch
  FROM ab
)
SELECT n_a, n_b,
       round(diff, 4) AS diff,
       round(margin, 4) AS margin,
       round((diff + margin) / se, 4) AS t_lower,
       round((diff - margin) / se, 4) AS t_upper,
       round(df_welch, 1) AS df_welch,
       CASE WHEN (diff + margin) / se > 1.645
             AND (diff - margin) / se < -1.645
            THEN 1 ELSE 0 END AS equivalent_flag
FROM t
""",
    doc="TOST equivalence test (two one-sided tests) on order value "
    "between md5-assigned arms: H0 is 'the arms DIFFER by more than "
    "the margin' and rejecting BOTH one-sided tests at alpha=0.05 "
    "(z 1.645, df in the thousands) declares equivalence — the "
    "correct way to claim 'no effect', which a non-significant "
    "ab_test_conversion t-test can never do.  The margin DERIVES "
    "from the data (5% of the pooled mean, exact integer cents — "
    "lesson 17) and the SE/df machinery is the Welch pattern of "
    "stats_welch_t_test.  Since assignment is a pure md5 hash the "
    "arms are exchangeable and the flag is expected to fire "
    "(equivalence true by construction) at every scale — the "
    "invariant the test suite pins.  One map-side hash, one 2-row "
    "aggregate: guardrail cost is O(scan)",
)
def ab_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = F.col("o_totalprice")
    g = (
        orders.select(
            v.alias("v"),
            F.round(v * 100).cast("long").alias("cents"),
            _md5_mod("tost:", F.col("o_custkey"), 2).alias("arm"),
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sc"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
    )
    a = g.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"),
        F.col("sc").alias("sc_a"),
        F.col("s2").alias("s2_a"),
    )
    b = g.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"),
        F.col("sc").alias("sc_b"),
        F.col("s2").alias("s2_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    ma = F.col("sc_a") / 100.0 / na
    mb = F.col("sc_b") / 100.0 / nb
    mpool = (F.col("sc_a") + F.col("sc_b")) / 100.0 / (na + nb)
    va = (F.col("s2_a") - na * F.pow(ma, 2)) / (na - 1)
    vb = (F.col("s2_b") - nb * F.pow(mb, 2)) / (nb - 1)
    diff = ma - mb
    margin = 0.05 * mpool
    se = F.sqrt(va / na + vb / nb)
    df = F.pow(va / na + vb / nb, 2) / (
        F.pow(va / na, 2) / (na - 1) + F.pow(vb / nb, 2) / (nb - 1)
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round(diff, 4).alias("diff"),
        F.round(margin, 4).alias("margin"),
        F.round((diff + margin) / se, 4).alias("t_lower"),
        F.round((diff - margin) / se, 4).alias("t_upper"),
        F.round(df, 1).alias("df_welch"),
        F.when(
            ((diff + margin) / se > 1.645) & ((diff - margin) / se < -1.645),
            1,
        )
        .otherwise(0)
        .alias("equivalent_flag"),
    )


# ------------------------------------------------ paired / ordered tests


@register(
    "stats_paired_t_user_halves",
    oracle="""
WITH bounds AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
          + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS cut
  FROM events
),
halves AS (
  SELECT user_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < cut
              THEN 0 ELSE 1 END AS half,
         value
  FROM events, bounds
),
per AS (
  SELECT user_id, half, round(avg(value), 6) AS m
  FROM halves GROUP BY 1, 2
),
paired AS (
  SELECT a.user_id, b.m - a.m AS d
  FROM per a JOIN per b
    ON a.user_id = b.user_id AND a.half = 0 AND b.half = 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         sum(d) AS sd, sum(d * d) AS sdd
  FROM paired
)
SELECT n_pairs,
       round(sd / n_pairs, 4) AS mean_diff,
       round((sd / n_pairs)
             / sqrt(((sdd - sd * sd / n_pairs) / (n_pairs - 1)) / n_pairs),
             4) AS t_stat,
       CASE WHEN abs((sd / n_pairs)
             / sqrt(((sdd - sd * sd / n_pairs) / (n_pairs - 1)) / n_pairs))
            > 1.96 THEN 1 ELSE 0 END AS reject_flag
FROM agg
""",
    doc="paired t-test on per-user mean event value between the two "
    "DERIVED halves of the events month: each user is their own "
    "control, which removes the between-user variance that "
    "dominates stats_welch_t_test's unpaired comparison — the "
    "within-subject design every growth team reaches for on "
    "before/after questions.  Pairs are users present in both "
    "halves (inner join of the per-(user,half) means, each rounded "
    "6dp before differencing); t = mean(d)/(sd(d)/sqrt(n)) with "
    "the variance from convention-free power sums.  Plan: one "
    "groupBy(user_id, half) shuffle, a self-join on user_id that "
    "reuses the same hash partitioning, single-row reduce — the "
    "state is users, not events",
)
def stats_paired_t_user_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = F.unix_timestamp("ts").cast("long")
    bounds = ev.agg(((F.min(e) + F.max(e)) / 2).cast("long").alias("cut"))
    per = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            F.when(e < F.col("cut"), 0).otherwise(1).alias("half"),
        )
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    a = per.filter(F.col("half") == 0).select("user_id", F.col("m").alias("m0"))
    b = per.filter(F.col("half") == 1).select("user_id", F.col("m").alias("m1"))
    paired = a.join(b, "user_id").select((F.col("m1") - F.col("m0")).alias("d"))
    agg = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    n = F.col("n_pairs")
    mean_d = F.col("sd") / n
    var_d = (F.col("sdd") - F.col("sd") * F.col("sd") / n) / (n - 1)
    t = mean_d / F.sqrt(var_d / n)
    return agg.select(
        "n_pairs",
        F.round(mean_d, 4).alias("mean_diff"),
        F.round(t, 4).alias("t_stat"),
        F.when(F.abs(t) > 1.96, 1).otherwise(0).alias("reject_flag"),
    )


@register(
    "stats_moods_median_test",
    oracle="""
WITH med AS (
  SELECT quantile_cont(value, 0.5) AS m FROM events
),
cells AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value > m THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above
  FROM events, med GROUP BY event_type, m
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(n_above) AS BIGINT) AS ta
  FROM cells
)
SELECT CAST((SELECT count(*) FROM cells) - 1 AS BIGINT) AS df,
       (SELECT nn FROM tot) AS n_total,
       round(sum(
         pow(n_above - n * ta * 1.0 / nn, 2) / (n * ta * 1.0 / nn)
         + pow((n - n_above) - n * (nn - ta) * 1.0 / nn, 2)
           / (n * (nn - ta) * 1.0 / nn)
       ), 4) AS chi2_stat
FROM cells, tot
""",
    doc="Mood's median test across the five event types: counts "
    "above/below the POOLED exact median of value feed a k x 2 "
    "chi-square — the robust-to-outliers k-sample location test "
    "that complements stats_kruskal_wallis (ranks) and "
    "stats_anova_oneway (means).  The pooled median is the exact "
    "interpolated quantile (identical order statistics both "
    "engines: Spark percentile() == DuckDB quantile_cont), and the "
    "strict '> median' cell split is decided on bit-identical "
    "doubles.  Expected counts use exact integer margins scaled by "
    "1.0/nn.  Plan: the median is one sort-free exact-percentile "
    "aggregate, then a 5-row cell table — at 100 TB the pooled "
    "median would swap in the approx-percentile sketch with a "
    "tolerance oracle (the agg_approx_percentile_band pattern); "
    "the chi-square machinery is unchanged",
)
def stats_moods_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.agg(F.expr("percentile(value, 0.5)").alias("m"))
    cells = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type", "m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("value") > F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("n_above").cast("long").alias("ta"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    ea = F.col("n") * F.col("ta") / F.col("nn")
    eb = F.col("n") * (F.col("nn") - F.col("ta")) / F.col("nn")
    return j.groupBy().agg(
        (F.max("k") - 1).cast("long").alias("df"),
        F.max("nn").cast("long").alias("n_total"),
        F.round(
            F.sum(
                F.pow(F.col("n_above") - ea, 2) / ea
                + F.pow((F.col("n") - F.col("n_above")) - eb, 2) / eb
            ),
            4,
        ).alias("chi2_stat"),
    )


@register(
    "stats_page_trend_test",
    oracle="""
WITH bounds AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS e0,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) + 1 AS span
  FROM events
),
q AS (
  SELECT user_id,
         ((CAST(floor(epoch(ts)) AS BIGINT) - e0) * 4) // span AS quarter,
         value
  FROM events, bounds
),
per AS (
  SELECT user_id, quarter, round(avg(value), 6) AS m
  FROM q GROUP BY 1, 2
),
complete AS (
  SELECT user_id FROM per GROUP BY 1 HAVING count(*) = 4
),
ranked AS (
  SELECT p.user_id, p.quarter,
         rank() OVER (PARTITION BY p.user_id ORDER BY p.m, p.quarter) AS r
  FROM per p JOIN complete c ON p.user_id = c.user_id
),
agg AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_subjects,
         CAST(sum((quarter + 1) * r) AS BIGINT) AS l_stat
  FROM ranked
)
SELECT n_subjects, l_stat,
       round((l_stat - 25.0 * n_subjects)
             / sqrt(n_subjects * 3600.0 / 432.0), 4) AS z_stat
FROM agg
""",
    doc="Page's L trend test for an ordered alternative across the "
    "four DERIVED quarters of the events month: each active-in-all-"
    "four user ranks their own quarterly mean values 1..4, and "
    "L = sum over subjects of quarter_index x rank detects a "
    "monotone drift that stats_friedman_test (any difference) "
    "dilutes.  Quarter ids come from exact BIGINT floor-division "
    "of the epoch offset (lesson 23: never // on doubles), "
    "per-(user,quarter) means are rounded 6dp before ranking, and "
    "rank ties break on the quarter id so both engines replay one "
    "total order.  E[L] = n k(k+1)^2/4 = 25n and Var[L] = "
    "n(k^3-k)^2/(144(k-1)) = 3600n/432 under H0.  Plan: "
    "groupBy(user, quarter) then a 4-row-per-user window — state "
    "is users x 4, embarrassingly partitionable",
)
def stats_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = F.unix_timestamp("ts").cast("long")
    bounds = ev.agg(
        F.min(e).alias("e0"), (F.max(e) - F.min(e) + 1).alias("span")
    )
    per = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            F.expr(
                "(CAST(unix_timestamp(ts) AS BIGINT) - e0) * 4 div span"
            ).alias("quarter"),
        )
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    complete = (
        per.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nq"))
        .filter(F.col("nq") == 4)
        .select("user_id")
    )
    w = Window.partitionBy("user_id").orderBy("m", "quarter")
    ranked = per.join(complete, "user_id").select(
        "user_id", "quarter", F.rank().over(w).alias("r")
    )
    agg = ranked.agg(
        F.countDistinct("user_id").cast("long").alias("n_subjects"),
        F.sum((F.col("quarter") + 1) * F.col("r"))
        .cast("long")
        .alias("l_stat"),
    )
    n = F.col("n_subjects")
    return agg.select(
        "n_subjects",
        "l_stat",
        F.round(
            (F.col("l_stat") - 25.0 * n) / F.sqrt(n * 3600.0 / 432.0), 4
        ).alias("z_stat"),
    )


# ------------------------------------------------ jackknife / agreement


@register(
    "stats_jackknife_ratio_se",
    oracle="""
WITH t AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS yc,
         CAST(round(l_quantity * 100) AS BIGINT) AS xc
  FROM lineitem
),
g AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yc) AS BIGINT) AS sy, CAST(sum(xc) AS BIGINT) AS sx
  FROM t GROUP BY 1
),
d AS (
  SELECT t.flag, g.n, g.sy, g.sx,
         (t.xc * g.sy - t.yc * g.sx) * 1.0
           / (g.sx * 1.0 * (g.sx - t.xc)) AS di
  FROM t JOIN g ON t.flag = g.flag
),
agg AS (
  SELECT flag, max(n) AS n, max(sy) AS sy, max(sx) AS sx,
         sum(di) AS sd, sum(di * di) AS sdd
  FROM d GROUP BY 1
)
SELECT flag, n,
       round(sy * 1.0 / sx, 6) AS ratio,
       round(sqrt((n - 1.0) / n * (sdd - sd * sd / n)), 6) AS jk_se,
       round((n - 1.0) * sd / n, 8) AS jk_bias
FROM agg ORDER BY flag
""",
    doc="jackknife standard error of the ratio estimator "
    "revenue-per-unit-quantity by returnflag: the leave-one-out "
    "pseudo-deviation d_i = R_(-i) - R has the closed form "
    "(x_i*Sy - y_i*Sx)/(Sx*(Sx-x_i)) from EXACT integer-cent "
    "totals, so the O(N) two-pass computes every deviation "
    "directly — no cancellation (naive sum(R_(-i)^2) - n*mean^2 "
    "on 60k near-identical values loses ~8 digits) and no N "
    "recomputations of the estimator.  SE = sqrt((n-1)/n * "
    "sum(d-dbar)^2) and bias = (n-1)*dbar — the resampling-free "
    "uncertainty for any smooth statistic of totals, next to "
    "stats_bootstrap_ci_mean's md5-replay resampling.  Plan: one "
    "groupBy for totals broadcast back over the scan, one "
    "groupBy for the deviation moments — two map-side passes, "
    "state is groups",
)
def stats_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yc"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("xc"),
    )
    g = t.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum("xc").cast("long").alias("sx"),
    )
    d = t.join(F.broadcast(g), "flag").select(
        "flag",
        "n",
        "sy",
        "sx",
        (
            (F.col("xc") * F.col("sy") - F.col("yc") * F.col("sx"))
            / (F.col("sx").cast("double") * (F.col("sx") - F.col("xc")))
        ).alias("di"),
    )
    agg = d.groupBy("flag").agg(
        F.max("n").alias("n"),
        F.max("sy").alias("sy"),
        F.max("sx").alias("sx"),
        F.sum("di").alias("sd"),
        F.sum(F.col("di") * F.col("di")).alias("sdd"),
    )
    n = F.col("n")
    return agg.select(
        "flag",
        "n",
        F.round(F.col("sy") / F.col("sx"), 6).alias("ratio"),
        F.round(
            F.sqrt(
                (n - 1.0) / n * (F.col("sdd") - F.col("sd") * F.col("sd") / n)
            ),
            6,
        ).alias("jk_se"),
        F.round((n - 1.0) * F.col("sd") / n, 8).alias("jk_bias"),
    ).orderBy("flag")


@register(
    "stats_lin_ccc",
    oracle="""
WITH t AS (
  SELECT l_extendedprice AS x,
         l_extendedprice * (1 - l_discount) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM t
)
SELECT n,
       round((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 4)
         AS pearson_r,
       round(2 * (sxy - sx * sy / n)
             / ((sxx - sx * sx / n) + (syy - sy * sy / n)
                + n * pow(sx / n - sy / n, 2)), 4) AS lin_ccc,
       round(2 * (sxy - sx * sy / n)
             / ((sxx - sx * sx / n) + (syy - sy * sy / n)
                + n * pow(sx / n - sy / n, 2))
             / ((sxy - sx * sy / n)
                / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))), 4)
         AS accuracy_cb
FROM m
""",
    doc="Lin's concordance correlation coefficient between gross and "
    "net line price (the lesson-27 constructed pair — fixture "
    "columns are mutually independent, so agreement demos must "
    "build a structurally related target: y = x*(1-discount)): "
    "CCC = 2*cov / (var_x + var_y + (mean_x - mean_y)^2) penalizes "
    "both scatter AND the systematic location/scale shift that "
    "Pearson r is blind to — the standard method-agreement metric "
    "when a cheaper measurement replaces a reference one.  The "
    "bias-correction factor C_b = CCC/r isolates how much of the "
    "disagreement is pure shift.  Single-pass power sums (the "
    "welch-family discipline: the sums are 1e14-scale but the "
    "centered differences retain >= 10 significant digits against "
    "the 4dp rounding).  Plan: one map-side moment aggregate, "
    "zero shuffles beyond the single-row reduce",
)
def stats_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_extendedprice").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    m = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    shift = F.pow(F.col("sx") / n - F.col("sy") / n, 2)
    r = cxy / F.sqrt(cxx * cyy)
    ccc = 2 * cxy / (cxx + cyy + n * shift)
    return m.select(
        "n",
        F.round(r, 4).alias("pearson_r"),
        F.round(ccc, 4).alias("lin_ccc"),
        F.round(ccc / r, 4).alias("accuracy_cb"),
    )


@register(
    "stats_deming_regression",
    oracle="""
WITH t AS (
  SELECT l_extendedprice AS x,
         l_extendedprice * (1 - l_discount) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM t
),
c AS (
  SELECT n,
         (sxx - sx * sx / n) / n AS vx,
         (syy - sy * sy / n) / n AS vy,
         (sxy - sx * sy / n) / n AS cxy,
         sx / n AS mx, sy / n AS my
  FROM m
)
SELECT n,
       round((vy - vx + sqrt(pow(vy - vx, 2) + 4 * cxy * cxy))
             / (2 * cxy), 6) AS deming_slope,
       round(my - (vy - vx + sqrt(pow(vy - vx, 2) + 4 * cxy * cxy))
                  / (2 * cxy) * mx, 4) AS deming_intercept,
       round(cxy / vx, 6) AS ols_slope
FROM c
""",
    doc="Deming errors-in-variables regression (delta = 1: equal "
    "error variance in both measurements) of net on gross line "
    "price: slope = (vy - vx + sqrt((vy-vx)^2 + 4*cov^2)) / "
    "(2*cov), the closed form that stays consistent when the "
    "x-axis is ALSO noisy — OLS (shipped alongside for contrast) "
    "attenuates toward zero under x-error, the classic calibration "
    "trap when comparing two measurement systems.  Same "
    "constructed x/y pair and single-pass moment discipline as "
    "stats_lin_ccc (lesson 27); cov is provably nonzero there by "
    "construction so the 2*cov denominator is ANSI-safe.  Plan: "
    "one moment aggregate, single-row reduce, zero shuffles",
)
def stats_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_extendedprice").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    m = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    vx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / n
    vy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / n
    cxy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    mx = F.col("sx") / n
    my = F.col("sy") / n
    slope = (vy - vx + F.sqrt(F.pow(vy - vx, 2) + 4 * cxy * cxy)) / (2 * cxy)
    return m.select(
        "n",
        F.round(slope, 6).alias("deming_slope"),
        F.round(my - slope * mx, 4).alias("deming_intercept"),
        F.round(cxy / vx, 6).alias("ols_slope"),
    )
