"""Round-6 operator additions.

Opens with the two production twins the round-5 verdict ordered —
kNN classification through the LSH candidate generator instead of the
brute-force broadcast crossJoin, and grid-cell + 3x3-neighbor-ring
blocking for the nearest-neighbor geo join instead of attribute
blocking — then widens the statistics / ML-ops / data-quality
families: exact distinct via mergeable bitmaps, mutual information,
robust trend estimators (Theil-Sen, Mann-Kendall), rank correlations
(Spearman, binned Kendall), drift metrics (PSI, early/late profile
drift), deterministic resampling (bootstrap CI, uniform reservoir),
differential-privacy noise, attribution, and interval algebra.

Reference provenance: the reference has no analytics engine of its own
(consumer loop at consumer_to_opensearch.py:67-96; dashboards at
README.md:150-160); these are north-star extensions per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register
from .coverage_round5 import _LAT_DUCK, _LAT_SPARK, _LON_DUCK, _LON_SPARK

# ------------------------------------------- kNN via ANN candidates


@register(
    "ml_knn_classify_ann",
    oracle="""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 100 < 80 AS is_train,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
base AS (
  -- normalize ONCE per vector; the per-pair work inside the bucket
  -- join is then a plain dot product (cosine == dot of unit vectors)
  SELECT vec_id, label, is_train, bucket,
         list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS en
  FROM raw
),
probes AS (
  SELECT vec_id, label AS actual, en,
         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS pbucket
  FROM base WHERE NOT is_train
),
scored AS (
  SELECT t.vec_id, t.actual, tr.label AS cand, tr.vec_id AS nb,
         round(list_dot_product(t.en, tr.en), 6) AS sim
  FROM probes t JOIN base tr
    ON tr.is_train AND tr.bucket = t.pbucket
),
top5 AS (
  SELECT vec_id, actual, cand FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, nb) <= 5
),
votes AS (
  SELECT vec_id, actual, cand, count(*) AS n
  FROM top5 GROUP BY 1, 2, 3
),
pred AS (
  SELECT vec_id, actual, cand AS predicted FROM votes
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY n DESC, cand) = 1
)
SELECT actual,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(count(*) FILTER (WHERE predicted = actual) AS BIGINT)
         AS n_correct
FROM pred GROUP BY actual ORDER BY actual
""",
    doc="the PRODUCTION twin of ml_knn_classify: candidates come from "
    "sign-bit LSH buckets (axis-aligned 4-bit planes so DuckDB can "
    "replay the bucketing verbatim, Hamming-1 multi-probe = 5 of 16 "
    "buckets) joined train-to-test on the bucket key — a plain "
    "shuffled equi-join whose pair volume is ~5/16 of brute force "
    "and, unlike the brute-force twin's broadcast of 80pct of the "
    "table, never materializes the train split on every executor. "
    "Top-5 vote over the candidate set with the same (sim, id) and "
    "(votes, label) tie-breaks; recall vs the exact path is pinned "
    "by tests/test_round6_ops.py (>=0.9 on clustered embeddings, a "
    "regression floor on the isotropic-random fixture).  At 100 TB: more bits + "
    "capped buckets (cosine_topk_lsh's max_bucket_size) bound "
    "per-test-vector work",
)
def ml_knn_classify_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import _dot

    raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        "label",
        (
            F.expr(
                "cast(conv(substr(md5(cast(vec_id as string)), 1, 15),"
                " 16, 10) as bigint)"
            )
            % 100
            < 80
        ).alias("is_train"),
        sum(
            F.when(F.element_at(F.col("embedding"), i + 1) > 0, 1 << i)
            .otherwise(0)
            for i in range(4)
        ).alias("bucket"),
    )
    # normalize once per vector BEFORE the join: per-pair work drops
    # from cosine (dot + two norms) to a single dot product
    emb = raw.withColumn(
        "nrm", F.sqrt(_dot(F.col("e"), F.col("e")))
    ).select(
        "vec_id",
        "label",
        "is_train",
        "bucket",
        F.transform("e", lambda x: x / F.col("nrm")).alias("en"),
    )
    train = emb.filter("is_train").select(
        F.col("vec_id").alias("nb"),
        F.col("en").alias("ten"),
        F.col("label").alias("cand"),
        "bucket",
    )
    probes = (
        emb.filter(~F.col("is_train"))
        .select(
            "vec_id",
            F.col("label").alias("actual"),
            "en",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(4)
                    ],
                )
            ).alias("bucket"),
        )
    )
    # no broadcast hint: the probe side is 20% of the corpus x5 — at
    # scale this must stay a shuffled hash join on the bucket key
    scored = probes.join(train, "bucket").select(
        "vec_id",
        "actual",
        "cand",
        "nb",
        F.round(_dot(F.col("en"), F.col("ten")), 6).alias("sim"),
    )
    w5 = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nb")
    top5 = scored.withColumn("rn", F.row_number().over(w5)).filter(
        F.col("rn") <= 5
    )
    votes = top5.groupBy("vec_id", "actual", "cand").agg(
        F.count(F.lit(1)).alias("n")
    )
    wv = Window.partitionBy("vec_id").orderBy(F.desc("n"), "cand")
    pred = votes.withColumn("rv", F.row_number().over(wv)).filter(
        F.col("rv") == 1
    )
    return (
        pred.groupBy("actual")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.count(F.when(F.col("cand") == F.col("actual"), 1))
            .cast("long")
            .alias("n_correct"),
        )
        .orderBy("actual")
    )


# ------------------------------------- grid-cell nearest geo join

# 15-degree cells: 12 latitude bands x 24 longitude columns = 288
# cells.  Production sizing picks the cell edge ~ the max search
# radius so the 3x3 ring is a correctness guarantee, and refines the
# cell grid as density grows (geohash prefix length / S2 level) to
# hold per-cell pair volume constant.
_CELL_DEG = 15
_N_LON = 360 // _CELL_DEG
_N_LAT = 180 // _CELL_DEG


@register(
    "geo_cell_nearest",
    oracle=f"""
WITH s AS (
  -- +1000000 salts the supplier key out of the customer key space:
  -- unsalted, supplier k and customer k share md5 coordinates and
  -- every nearest-neighbor degenerates to the dist-0 twin
  SELECT s_suppkey,
         {_LAT_DUCK.format(k='s_suppkey + 1000000')} AS lat1,
         {_LON_DUCK.format(k='s_suppkey + 1000000')} AS lon1
  FROM supplier
),
c AS (
  SELECT c_custkey,
         {_LAT_DUCK.format(k='c_custkey')} AS lat2,
         {_LON_DUCK.format(k='c_custkey')} AS lon2,
         CAST(floor((({_LAT_DUCK.format(k='c_custkey')}) + 90) / {_CELL_DEG})
              AS BIGINT) * {_N_LON}
         + CAST(floor((({_LON_DUCK.format(k='c_custkey')}) + 180)
                / {_CELL_DEG}) AS BIGINT) AS cell
  FROM customer
),
sp AS (
  SELECT s_suppkey, lat1, lon1,
         greatest(0, least({_N_LAT - 1},
           CAST(floor((lat1 + 90) / {_CELL_DEG}) AS BIGINT) + dl))
           * {_N_LON}
         + ((CAST(floor((lon1 + 180) / {_CELL_DEG}) AS BIGINT) + dc
             + {_N_LON}) % {_N_LON}) AS cell
  FROM s, (SELECT unnest([-1, 0, 1]) AS dl),
          (SELECT unnest([-1, 0, 1]) AS dc)
),
dists AS (
  SELECT s_suppkey, c_custkey,
         round(2 * 6371.0 * asin(sqrt(
           pow(sin((radians(lat2) - radians(lat1)) / 2), 2)
           + cos(radians(lat1)) * cos(radians(lat2))
             * pow(sin((radians(lon2) - radians(lon1)) / 2), 2)
         )), 6) AS dist
  FROM sp JOIN c ON sp.cell = c.cell
)
SELECT s_suppkey, c_custkey AS nearest_custkey,
       round(dist, 2) AS dist_km
FROM dists
QUALIFY row_number() OVER (PARTITION BY s_suppkey
                           ORDER BY dist, c_custkey) = 1
ORDER BY s_suppkey
""",
    doc="the PRODUCTION twin of geo_haversine_nearest: the pair space "
    "is blocked by 15-degree grid cell + the 3x3 neighbor ring "
    "(longitude wraps mod 24, latitude clamps at the poles) instead "
    "of the nation attribute, so per-block pair volume is bounded by "
    "spatial density — the same neighbor-band discipline "
    "join_event_self_interval applies to time, in two dimensions.  "
    "Candidate generation is one equi-join on the cell id (supplier "
    "side exploded to its 9 probe cells); haversine is JVM "
    "arithmetic rounded to 6dp before the min(struct) argmin.  "
    "Cross-cell correctness at the boundaries is pinned by "
    "tests/test_geo_cell.py",
)
def geo_cell_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        f"{_LAT_SPARK.format(k='s_suppkey + 1000000')} lat1",
        f"{_LON_SPARK.format(k='s_suppkey + 1000000')} lon1",
    )
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        f"{_LAT_SPARK.format(k='c_custkey')} lat2",
        f"{_LON_SPARK.format(k='c_custkey')} lon2",
    )
    lat_cell = lambda c: F.floor((F.col(c) + 90) / _CELL_DEG)  # noqa: E731
    lon_cell = lambda c: F.floor((F.col(c) + 180) / _CELL_DEG)  # noqa: E731
    cust = cust.withColumn(
        "cell", lat_cell("lat2") * _N_LON + lon_cell("lon2")
    )
    ring = F.explode(
        F.array(
            *[
                F.struct(F.lit(dl).alias("dl"), F.lit(dc).alias("dc"))
                for dl in (-1, 0, 1)
                for dc in (-1, 0, 1)
            ]
        )
    )
    probes = supp.withColumn("d", ring).select(
        "s_suppkey",
        "lat1",
        "lon1",
        (
            F.greatest(
                F.lit(0),
                F.least(F.lit(_N_LAT - 1), lat_cell("lat1") + F.col("d.dl")),
            )
            * _N_LON
            + (lon_cell("lon1") + F.col("d.dc") + _N_LON) % _N_LON
        ).alias("cell"),
    )
    dist = F.round(
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin((F.radians("lat2") - F.radians("lat1")) / 2), 2
                )
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.pow(
                    F.sin((F.radians("lon2") - F.radians("lon1")) / 2), 2
                )
            )
        ),
        6,
    )
    pairs = probes.join(cust, "cell").select(
        "s_suppkey", "c_custkey", dist.alias("dist")
    )
    return (
        pairs.groupBy("s_suppkey")
        .agg(F.min(F.struct("dist", "c_custkey")).alias("b"))
        .select(
            "s_suppkey",
            F.col("b.c_custkey").alias("nearest_custkey"),
            F.round(F.col("b.dist"), 2).alias("dist_km"),
        )
        .orderBy("s_suppkey")
    )


# ------------------------------------- exact distinct via bitmaps


@register(
    "agg_bitmap_distinct_users",
    oracle="""
WITH words AS (
  SELECT event_type, user_id // 63 AS word,
         bit_or((1::BIGINT) << CAST(user_id % 63 AS INT)) AS bm
  FROM events GROUP BY 1, 2
)
SELECT w.event_type,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(bit_count(w.bm)) AS BIGINT) AS distinct_bitmap,
       x.distinct_exact
FROM words w
JOIN (SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_exact
      FROM events GROUP BY 1) x USING (event_type)
GROUP BY w.event_type, x.distinct_exact
ORDER BY w.event_type
""",
    doc="EXACT count-distinct via mergeable bitmaps (the roaring-"
    "bitmap idiom in relational form): user ids pack into 63-bit "
    "words (63, not 64, so the sign bit never enters a shift), "
    "bit_or is the per-(type, word) combiner — associative and "
    "partial-aggregable map-side, so the shuffle carries one word "
    "per 63-id range per type instead of every distinct id, and at "
    "100 TB the words also serve incremental refresh (bit_or of "
    "yesterday's bitmap with today's delta).  popcount-sum recovers "
    "the exact count; the plain count(DISTINCT) rides along as the "
    "self-check column",
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id div 63").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(user_id % 63 as int))"
            ).alias("m"),
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(m)").alias("bm"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("distinct_exact")
    )
    return (
        words.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.bit_count("bm")).cast("long").alias("distinct_bitmap"),
        )
        .join(exact, "event_type")
        .orderBy("event_type")
    )


# ------------------------------------------- mutual information


@register(
    "agg_mutual_information",
    oracle="""
WITH joint AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y,
         count(*) AS nxy
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT sum(nxy) AS n FROM joint),
mx AS (SELECT x, sum(nxy) AS nx FROM joint GROUP BY x),
my AS (SELECT y, sum(nxy) AS ny FROM joint GROUP BY y),
terms AS (
  SELECT (j.nxy * 1.0 / t.n)
         * ln((j.nxy * 1.0 * t.n) / (mx.nx * 1.0 * my.ny)) AS mi_term,
         j.nxy, t.n
  FROM joint j CROSS JOIN tot t
  JOIN mx USING (x) JOIN my USING (y)
),
hx AS (SELECT -sum((nx * 1.0 / t.n) * ln(nx * 1.0 / t.n)) AS h
       FROM mx CROSS JOIN tot t),
hy AS (SELECT -sum((ny * 1.0 / t.n) * ln(ny * 1.0 / t.n)) AS h
       FROM my CROSS JOIN tot t)
SELECT round(sum(mi_term), 6) + 0.0 AS mi_nats,
       round((SELECT h FROM hx), 6) AS h_priority,
       round((SELECT h FROM hy), 6) AS h_status,
       round(sum(mi_term) / sqrt((SELECT h FROM hx)
                                 * (SELECT h FROM hy)), 6) + 0.0 AS nmi
FROM terms
""",
    doc="mutual information between order priority and status — the "
    "feature-screening measure for categorical pairs: joint counts "
    "(one hash aggregate over the fact table; the contingency table "
    "is bounded by the category-domain product, never by N), "
    "broadcast marginal join-back, one sum of p*ln(p/(px*py)) terms. "
    "Normalized MI (geometric-mean denominator) rides along.  "
    "+0.0 folds IEEE -0.0 on the near-independent fixture to match "
    "across engines",
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # the joint table is category-domain-sized (25 rows) and feeds six
    # consumers (marginals, total, terms, both entropies) — checkpoint
    # so the N-sized aggregate runs ONCE, not once per consumer
    joint = (
        orders.groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("nxy"))
        .localCheckpoint(eager=False)
    )
    tot = joint.agg(F.sum("nxy").alias("n"))
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    terms = (
        joint.crossJoin(F.broadcast(tot))
        .join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .select(
            (
                (F.col("nxy") / F.col("n"))
                * F.log(
                    (F.col("nxy") * F.col("n"))
                    / (F.col("nx") * F.col("ny"))
                )
            ).alias("mi_term"),
            "n",
        )
    )
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("nx") / F.col("n")) * F.log(F.col("nx") / F.col("n"))))
        .alias("h")
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("ny") / F.col("n")) * F.log(F.col("ny") / F.col("n"))))
        .alias("h")
    )
    return (
        terms.agg(F.sum("mi_term").alias("mi"))
        .crossJoin(F.broadcast(hx.select(F.col("h").alias("hx"))))
        .crossJoin(F.broadcast(hy.select(F.col("h").alias("hy"))))
        .select(
            (F.round(F.col("mi"), 6) + 0.0).alias("mi_nats"),
            F.round("hx", 6).alias("h_priority"),
            F.round("hy", 6).alias("h_status"),
            (
                F.round(
                    F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6
                )
                + 0.0
            ).alias("nmi"),
        )
    )


# ------------------------------------------- DAU/MAU stickiness


@register(
    "dash_dau_mau_stickiness",
    oracle="""
WITH daily AS (
  SELECT date_trunc('week', ts) AS w, date_trunc('day', ts) AS d,
         count(DISTINCT user_id) AS dau
  FROM events GROUP BY 1, 2
),
weekly AS (
  SELECT date_trunc('week', ts) AS w,
         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM events GROUP BY 1
)
SELECT CAST(d.w AS TIMESTAMP) AS week,
       round(avg(d.dau), 2) AS avg_dau, any_value(wk.wau) AS wau,
       round(avg(d.dau) / any_value(wk.wau), 4) AS stickiness
FROM daily d JOIN weekly wk ON wk.w = d.w
GROUP BY d.w ORDER BY week
""",
    doc="the DAU/WAU stickiness board (the engagement ratio product "
    "dashboards track): per-day and per-week distinct users (two "
    "hash aggregates — at 100 TB the distinct would come from the "
    "bitmap words of agg_bitmap_distinct_users or an HLL merge "
    "instead of a re-scan), joined on week.  WAU is provably >= any "
    "DAU of its week so the ratio is in (0, 1] and division is "
    "ANSI-safe; both engines truncate weeks to ISO Monday",
)
def dash_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("w"),
        F.date_trunc("day", "ts").alias("d"),
        "user_id",
    )
    daily = ev.groupBy("w", "d").agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy("w").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        daily.join(weekly, "w")
        .groupBy("w")
        .agg(
            F.round(F.avg("dau"), 2).alias("avg_dau"),
            F.any_value("wau").alias("wau"),
            F.round(F.avg("dau") / F.any_value("wau"), 4).alias(
                "stickiness"
            ),
        )
        .select(
            F.col("w").alias("week"), "avg_dau", "wau", "stickiness"
        )
        .orderBy("week")
    )


# ------------------------------------------- degree histogram


@register(
    "graph_degree_histogram",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS (
  SELECT DISTINCT a.p AS p1, b.p AS p2
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT p1 AS node, p2 AS other FROM edges
    UNION ALL
    SELECT p2 AS node, p1 AS other FROM edges
  ) GROUP BY node
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_parts
FROM deg GROUP BY degree ORDER BY degree
""",
    doc="degree distribution of the co-purchase graph (parts sharing "
    "an order are adjacent): per-order item pairs — pair volume is "
    "sum(k^2) over order sizes, bounded by the max basket, never "
    "N^2 — distinct edges, per-node degree from the symmetrized "
    "edge list, then the histogram.  The standard first look at any "
    "graph's shape (power-law check) before running the heavier "
    "triangle/k-core/PageRank suite on it",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoint: the distinct item list feeds both join sides — one
    # N-sized distinct, not two
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
    )
    sym = edges.select(F.col("p1").alias("node")).unionAll(
        edges.select(F.col("p2").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .select(F.col("degree").cast("long").alias("degree"), "n_parts")
        .orderBy("degree")
    )


# ------------------------------------------- Theil-Sen robust slope


@register(
    "stats_theil_sen_slope",
    oracle="""
WITH series AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS slope
  FROM series a JOIN series b ON b.x > a.x
)
SELECT round(quantile_cont(slope, 0.5), 4) AS ts_slope,
       CAST((SELECT count(*) FROM series) AS BIGINT) AS n_points,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
""",
    doc="Theil-Sen estimator — the robust twin of "
    "agg_regr_value_by_hour's OLS slope: median of all pairwise "
    "slopes of the monthly-revenue series (29pct breakdown point vs "
    "OLS's zero).  The pairwise join runs over the AGGREGATED series "
    "— month count is bounded by the calendar, never by N, so the "
    "O(m^2) pair volume is a constant at 100 TB while the only "
    "N-sized work is the one groupBy producing the series.  Exact "
    "interpolated median (Spark percentile == DuckDB quantile_cont)",
)
def stats_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("x")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    a = series.alias("a")
    b = series.alias("b")
    pairs = a.join(b, F.col("b.x") > F.col("a.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x")))
        .alias("slope")
    )
    n_points = series.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        pairs.agg(
            F.round(F.expr("percentile(slope, 0.5)"), 4).alias("ts_slope"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .crossJoin(F.broadcast(n_points))
        .select("ts_slope", "n_points", "n_pairs")
    )


# ------------------------------------------- Mann-Kendall trend test


@register(
    "stats_mann_kendall_trend",
    oracle="""
WITH series AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s,
         (SELECT count(*) FROM series) AS n
  FROM series a JOIN series b ON b.x > a.x
)
SELECT s,
       CAST(n AS BIGINT) AS n_points,
       round((s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
             / sqrt(n * (n - 1) * (2 * n + 5) / 18.0), 4) AS z,
       CASE WHEN s > 0 THEN 'increasing'
            WHEN s < 0 THEN 'decreasing' ELSE 'no trend' END AS direction
FROM s
""",
    doc="Mann-Kendall monotone-trend test on the monthly-revenue "
    "series: S = sum of pairwise sign comparisons (the "
    "non-parametric cousin of stats_theil_sen_slope, usually "
    "reported together), normal approximation z with the standard "
    "continuity correction.  Same scale shape as Theil-Sen: the "
    "O(m^2) pair join runs over the bounded aggregated series.  "
    "Sign comparisons are over 2dp-rounded sums so both engines "
    "agree on equality",
)
def stats_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("x")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    a = series.alias("a")
    b = series.alias("b")
    n_row = series.agg(F.count(F.lit(1)).alias("n"))
    stat = (
        a.join(b, F.col("b.x") > F.col("a.x"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), 1)
                .when(F.col("b.y") < F.col("a.y"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
        .crossJoin(F.broadcast(n_row))
    )
    return stat.select(
        "s",
        F.col("n").cast("long").alias("n_points"),
        F.round(
            (
                F.col("s")
                - F.when(F.col("s") > 0, 1)
                .when(F.col("s") < 0, -1)
                .otherwise(0)
            )
            / F.sqrt(
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0
            ),
            4,
        ).alias("z"),
        F.when(F.col("s") > 0, "increasing")
        .when(F.col("s") < 0, "decreasing")
        .otherwise("no trend")
        .alias("direction"),
    )


# ------------------------------- Spearman rho over bounded domains


@register(
    "stats_spearman_by_returnflag",
    oracle="""
WITH joint AS (
  SELECT l_returnflag AS mode, l_quantity AS q, l_discount AS d,
         count(*) AS w
  FROM lineitem GROUP BY 1, 2, 3
),
qh AS (SELECT mode, q, sum(w) AS nq FROM joint GROUP BY 1, 2),
dh AS (SELECT mode, d, sum(w) AS nd FROM joint GROUP BY 1, 2),
qr AS (
  SELECT mode, q,
         sum(nq) OVER (PARTITION BY mode ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           IS NOT DISTINCT FROM NULL AS _first,
         coalesce(sum(nq) OVER (PARTITION BY mode ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (nq + 1) / 2.0 AS rq
  FROM qh
),
dr AS (
  SELECT mode, d,
         coalesce(sum(nd) OVER (PARTITION BY mode ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (nd + 1) / 2.0 AS rd
  FROM dh
),
ranked AS (
  SELECT j.mode, j.w, qr.rq, dr.rd
  FROM joint j
  JOIN qr ON qr.mode = j.mode AND qr.q = j.q
  JOIN dr ON dr.mode = j.mode AND dr.d = j.d
),
sums AS (
  SELECT mode, sum(w) AS n,
         sum(w * rq) AS sx, sum(w * rd) AS sy,
         sum(w * rq * rq) AS sxx, sum(w * rd * rd) AS syy,
         sum(w * rq * rd) AS sxy
  FROM ranked GROUP BY mode
)
SELECT mode,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         + 0.0 AS spearman_rho,
       CAST(n AS BIGINT) AS n
FROM sums ORDER BY mode
""",
    doc="Spearman rank correlation per return flag between quantity and "
    "discount — computed WITHOUT ranking N rows: both variables live "
    "on bounded domains (50 quantities, 11 discounts), so average "
    "ranks come from the value histograms (cumulative count of "
    "smaller values + (ties+1)/2) and rho is weighted Pearson over "
    "the joint histogram.  Every window runs over <=50 aggregated "
    "rows per flag; the only N-sized work is one groupBy.  This is "
    "the 100 TB formulation — rank-then-correlate would range-sort "
    "the fact table twice",
)
def stats_spearman_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # bounded joint histogram feeds three consumers (two marginal
    # rank tables + the weighted-correlation join) — checkpoint so
    # the N-sized aggregate runs once
    joint = (
        li.groupBy(
            F.col("l_returnflag").alias("mode"),
            F.col("l_quantity").alias("q"),
            F.col("l_discount").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    qh = joint.groupBy("mode", "q").agg(F.sum("w").alias("nq"))
    dh = joint.groupBy("mode", "d").agg(F.sum("w").alias("nd"))
    wq = (
        Window.partitionBy("mode")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    qr = qh.select(
        "mode",
        "q",
        (
            F.coalesce(F.sum("nq").over(wq), F.lit(0))
            + (F.col("nq") + 1) / 2.0
        ).alias("rq"),
    )
    wd = (
        Window.partitionBy("mode")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dr = dh.select(
        "mode",
        "d",
        (
            F.coalesce(F.sum("nd").over(wd), F.lit(0))
            + (F.col("nd") + 1) / 2.0
        ).alias("rd"),
    )
    ranked = joint.join(qr, ["mode", "q"]).join(dr, ["mode", "d"])
    sums = ranked.groupBy("mode").agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("rq")).alias("sx"),
        F.sum(F.col("w") * F.col("rd")).alias("sy"),
        F.sum(F.col("w") * F.col("rq") * F.col("rq")).alias("sxx"),
        F.sum(F.col("w") * F.col("rd") * F.col("rd")).alias("syy"),
        F.sum(F.col("w") * F.col("rq") * F.col("rd")).alias("sxy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "mode",
        (F.round(rho, 6) + 0.0).alias("spearman_rho"),
        F.col("n").cast("long").alias("n"),
    ).orderBy("mode")


# ------------------------------------------- Kendall tau-b, binned


@register(
    "stats_kendall_tau_binned",
    oracle="""
WITH joint AS (
  SELECT l_quantity AS q, l_discount AS d, count(*) AS w
  FROM lineitem GROUP BY 1, 2
),
cd AS (
  SELECT
    CAST(sum(CASE WHEN b.d > a.d THEN a.w * b.w ELSE 0 END) AS BIGINT)
      AS c,
    CAST(sum(CASE WHEN b.d < a.d THEN a.w * b.w ELSE 0 END) AS BIGINT)
      AS disc
  FROM joint a JOIN joint b ON b.q > a.q
),
tx AS (SELECT sum(tq * (tq - 1) / 2) AS n1 FROM (
         SELECT sum(w) AS tq FROM joint GROUP BY q)),
ty AS (SELECT sum(td * (td - 1) / 2) AS n2 FROM (
         SELECT sum(w) AS td FROM joint GROUP BY d)),
tot AS (SELECT sum(w) AS n FROM joint)
SELECT round((c - disc) / sqrt(
         (n * (n - 1) / 2.0 - n1) * (n * (n - 1) / 2.0 - n2)), 6)
         + 0.0 AS tau_b,
       CAST(c - disc AS BIGINT) AS s_stat,
       CAST(n AS BIGINT) AS n
FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN tot
""",
    doc="Kendall tau-b between quantity and discount from the JOINT "
    "HISTOGRAM, not row pairs: concordant/discordant counts are a "
    "self-join over the <=550-cell contingency table (bounded value "
    "domains), with the standard tie corrections from the marginal "
    "histograms.  Naive Kendall is O(N^2) row pairs and impossible "
    "at 100 TB; this shape pays one N-sized groupBy then "
    "domain^2 cell pairs.  Pair sums stay in exact BIGINT "
    "arithmetic (overflow-free while N < ~3e9; past that the cell "
    "products move to DOUBLE)",
)
def stats_kendall_tau_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    joint = (
        li.groupBy(
            F.col("l_quantity").alias("q"), F.col("l_discount").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    a = joint.alias("a")
    b = joint.alias("b")
    cd = a.join(b, F.col("b.q") > F.col("a.q")).agg(
        F.sum(
            F.when(
                F.col("b.d") > F.col("a.d"), F.col("a.w") * F.col("b.w")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.when(
                F.col("b.d") < F.col("a.d"), F.col("a.w") * F.col("b.w")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("disc"),
    )
    tx = (
        joint.groupBy("q")
        .agg(F.sum("w").alias("tq"))
        .agg(F.sum(F.col("tq") * (F.col("tq") - 1) / 2).alias("n1"))
    )
    ty = (
        joint.groupBy("d")
        .agg(F.sum("w").alias("td"))
        .agg(F.sum(F.col("td") * (F.col("td") - 1) / 2).alias("n2"))
    )
    tot = joint.agg(F.sum("w").alias("n"))
    n0 = F.col("n") * (F.col("n") - 1) / 2.0
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.round(
                    (F.col("c") - F.col("disc"))
                    / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
                    6,
                )
                + 0.0
            ).alias("tau_b"),
            (F.col("c") - F.col("disc")).cast("long").alias("s_stat"),
            F.col("n").cast("long").alias("n"),
        )
    )


# ------------------------------------------- one-way ANOVA


@register(
    "stats_anova_oneway",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp, count(*) AS ng,
         sum(o_totalprice) AS sx, sum(o_totalprice * o_totalprice) AS sxx
  FROM orders GROUP BY 1
),
tot AS (
  SELECT sum(ng) AS n, count(*) AS k,
         sum(sx) AS tsx, sum(sxx) AS tsxx,
         sum(sx * sx / ng) AS sgroup
  FROM g
)
SELECT round((sgroup - tsx * tsx / n) / (k - 1)
             / ((tsxx - sgroup) / (n - k)), 4) AS f_stat,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(n - k AS BIGINT) AS df_within,
       round((sgroup - tsx * tsx / n) / (tsxx - tsx * tsx / n), 6)
         AS eta_squared
FROM tot
""",
    doc="one-way ANOVA of order value across the 5 priority groups: "
    "F = between-group over within-group mean square, computed "
    "entirely from per-group (n, sum, sum-of-squares) — one hash "
    "aggregate over the fact table and a 5-row combine, the "
    "map-side-partial shape that never shuffles raw values.  "
    "Eta-squared (variance explained) rides along.  4dp rounding "
    "absorbs summation-order drift between engines",
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("o_totalprice").alias("sx"),
        F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("sxx"),
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sx").alias("tsx"),
        F.sum("sxx").alias("tsxx"),
        F.sum(F.col("sx") * F.col("sx") / F.col("ng")).alias("sgroup"),
    )
    ssb = F.col("sgroup") - F.col("tsx") * F.col("tsx") / F.col("n")
    ssw = F.col("tsxx") - F.col("sgroup")
    sst = F.col("tsxx") - F.col("tsx") * F.col("tsx") / F.col("n")
    return tot.select(
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4
        ).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n") - F.col("k")).cast("long").alias("df_within"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


# ------------------------------------------- deterministic bootstrap


@register(
    "stats_bootstrap_ci_mean",
    oracle="""
WITH series AS (
  SELECT row_number() OVER (ORDER BY d) AS idx, y
  FROM (SELECT date_trunc('day', ts) AS d, round(sum(value), 2) AS y
        FROM events GROUP BY 1)
),
n AS (SELECT count(*) AS n FROM series),
draws AS (
  SELECT b.b, i.i,
         CAST(concat('0x', substr(md5(CAST(b.b AS VARCHAR) || '#'
                || CAST(i.i AS VARCHAR)), 1, 15)) AS BIGINT)
           % (SELECT n FROM n) + 1 AS idx
  FROM (SELECT unnest(range(1, 201)) AS b) b,
       (SELECT unnest(range(1, (SELECT n FROM n) + 1)) AS i) i
),
reps AS (
  SELECT d.b, avg(s.y) AS m
  FROM draws d JOIN series s ON s.idx = d.idx
  GROUP BY d.b
)
SELECT round(avg(m), 2) AS boot_mean,
       round(quantile_cont(m, 0.025), 2) AS ci_lo,
       round(quantile_cont(m, 0.975), 2) AS ci_hi,
       CAST(count(*) AS BIGINT) AS n_replicas,
       (SELECT CAST(n AS BIGINT) FROM n) AS n_days
FROM reps
""",
    doc="bootstrap 95pct CI for the mean daily event value with "
    "DETERMINISTIC resampling: replica b's i-th draw is md5(b#i) mod "
    "n — both engines replay the identical resample, so the CI is "
    "exact-matchable (the md5-as-uniform trick the sampling family "
    "established).  The bootstrap runs on the AGGREGATED daily "
    "series (calendar-bounded), so the 200 x n draw table is "
    "constant-sized at 100 TB; the only N-sized work is the daily "
    "rollup.  The row_number window orders <=31 aggregated rows",
)
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.round(F.sum("value"), 2).alias("y"))
    )
    series = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("idx"), "y"
    ).localCheckpoint(eager=False)
    n_row = series.agg(F.count(F.lit(1)).alias("n"))
    draws = (
        spark.range(1, 201)
        .select(F.col("id").alias("b"))
        .crossJoin(F.broadcast(n_row))
        .select(
            "b", "n", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
        )
        .select(
            "b",
            (
                F.expr(
                    "cast(conv(substr(md5(concat(cast(b as string), '#',"
                    " cast(i as string))), 1, 15), 16, 10) as bigint)"
                )
                % F.col("n")
                + 1
            ).alias("idx"),
        )
    )
    reps = (
        draws.join(F.broadcast(series), "idx")
        .groupBy("b")
        .agg(F.avg("y").alias("m"))
    )
    return (
        reps.agg(
            F.round(F.avg("m"), 2).alias("boot_mean"),
            F.round(F.expr("percentile(m, 0.025)"), 2).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 2).alias("ci_hi"),
            F.count(F.lit(1)).cast("long").alias("n_replicas"),
        )
        .crossJoin(
            F.broadcast(n_row.select(F.col("n").cast("long").alias("n_days")))
        )
    )


# ------------------------------------------- PSI score drift


@register(
    "ml_psi_score_drift",
    oracle="""
WITH binned AS (
  SELECT least(9, CAST(floor(o_totalprice / 60000) AS BIGINT)) AS bin,
         o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
  FROM orders
),
ref AS (SELECT bin, count(*) AS c FROM binned WHERE is_ref GROUP BY bin),
cur AS (SELECT bin, count(*) AS c FROM binned WHERE NOT is_ref GROUP BY bin),
nt AS (SELECT (SELECT sum(c) FROM ref) AS nr, (SELECT sum(c) FROM cur) AS nc),
bins AS (SELECT unnest(range(0, 10)) AS bin)
SELECT b.bin,
       round((coalesce(r.c, 0) + 1.0) / (nt.nr + 10), 6) AS p_ref,
       round((coalesce(u.c, 0) + 1.0) / (nt.nc + 10), 6) AS p_cur,
       round(((coalesce(u.c, 0) + 1.0) / (nt.nc + 10)
              - (coalesce(r.c, 0) + 1.0) / (nt.nr + 10))
             * ln(((coalesce(u.c, 0) + 1.0) / (nt.nc + 10))
                  / ((coalesce(r.c, 0) + 1.0) / (nt.nr + 10))), 6)
         + 0.0 AS psi_term
FROM bins b
LEFT JOIN ref r ON r.bin = b.bin
LEFT JOIN cur u ON u.bin = b.bin
CROSS JOIN nt
ORDER BY b.bin
""",
    doc="population-stability index between pre- and post-1998 order "
    "values over 10 FIXED-WIDTH bins (fixed edges, not quantiles, so "
    "no global sort and the bin map is a pure projection): per-bin "
    "Laplace-smoothed proportions ((c+1)/(n+10), so ln never sees "
    "zero under ANSI) and the (p_cur-p_ref)*ln(p_cur/p_ref) "
    "contribution — the monitoring metric every deployed model's "
    "feature pipeline recomputes per batch.  One scan, two "
    "bounded-width aggregates; sum of psi_term is the headline PSI",
)
def ml_psi_score_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(F.lit(9), F.floor(F.col("o_totalprice") / 60000))
        .cast("long")
        .alias("bin"),
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .alias("is_ref"),
    )
    ref = binned.filter("is_ref").groupBy("bin").agg(
        F.count(F.lit(1)).alias("cr")
    )
    cur = binned.filter(~F.col("is_ref")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("cc")
    )
    nt = binned.agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("nr"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("nc"),
    )
    bins = spark.range(0, 10).select(F.col("id").alias("bin"))
    p_ref = (F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / (F.col("nr") + 10)
    p_cur = (F.coalesce(F.col("cc"), F.lit(0)) + 1.0) / (F.col("nc") + 10)
    return (
        bins.join(F.broadcast(ref), "bin", "left")
        .join(F.broadcast(cur), "bin", "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "bin",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            (F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6) + 0.0)
            .alias("psi_term"),
        )
        .orderBy("bin")
    )


# ------------------------------------------- precision@k


@register(
    "ml_eval_precision_at_k",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
         label AS qlabel
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT q.query_id, q.qlabel, v.vec_id, v.label,
         round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
                                      q.qe), 6) AS sim
  FROM embeddings v CROSS JOIN q
  WHERE v.vec_id != q.query_id
),
topk AS (
  SELECT query_id, qlabel, label FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) <= 10
)
SELECT query_id, any_value(qlabel) AS label,
       CAST(count(*) FILTER (WHERE label = qlabel) AS BIGINT)
         AS n_relevant_at_10,
       round(count(*) FILTER (WHERE label = qlabel) / 10.0, 2)
         AS precision_at_10
FROM topk GROUP BY query_id ORDER BY query_id
""",
    doc="retrieval-quality metric over the similarity stack: "
    "precision@10 for the 3 standard query vectors, where a "
    "neighbor is relevant iff it shares the query's label (self "
    "excluded).  Reuses the brute-force top-k shape (broadcast "
    "queries, map-side cosine, per-query window) — the evaluation "
    "harness every ANN variant in operators/similarity.py is "
    "benchmarked with, now driver-checkable",
)
def ml_eval_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            "vec_id",
            "label",
            F.round(
                cosine(F.col("embedding").cast("array<double>"), F.col("qe")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 10
    )
    return (
        topk.groupBy("query_id")
        .agg(
            F.any_value("qlabel").alias("label"),
            F.count(F.when(F.col("label") == F.col("qlabel"), 1))
            .cast("long")
            .alias("n_relevant_at_10"),
            F.round(
                F.count(F.when(F.col("label") == F.col("qlabel"), 1)) / 10.0,
                2,
            ).alias("precision_at_10"),
        )
        .orderBy("query_id")
    )


# ------------------------------------------- deterministic reservoir


@register(
    "ml_reservoir_sample_det",
    oracle="""
SELECT c_mktsegment AS segment, c_custkey,
       substr(md5(CAST(c_custkey AS VARCHAR) || '#res'), 1, 8) AS tag
FROM customer
QUALIFY row_number() OVER (
  PARTITION BY c_mktsegment
  ORDER BY md5(CAST(c_custkey AS VARCHAR) || '#res'), c_custkey) <= 10
ORDER BY segment, tag, c_custkey
""",
    doc="per-segment uniform sample of 10 WITHOUT replacement via the "
    "md5-rank trick: rank every row by a keyed hash and keep the k "
    "smallest — the order-statistics formulation of reservoir "
    "sampling, which distributes as a per-group top-k (partial "
    "top-k per partition, merge — no global sort, no sequential "
    "reservoir state) and is deterministic for the oracle.  "
    "Complements ml_weighted_sample_es, which does the weighted "
    "variant (Efraimidis-Spirakis) with the same machinery",
)
def ml_reservoir_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("#res")))
        .alias("h"),
    )
    w = Window.partitionBy("segment").orderBy("h", "c_custkey")
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "segment", "c_custkey", F.substring("h", 1, 8).alias("tag")
        )
        .orderBy("segment", "tag", "c_custkey")
    )


# ------------------------------------------- early/late drift audit


@register(
    "dq_drift_early_late",
    oracle="""
WITH halves AS (
  SELECT o_orderstatus AS status,
         o_orderdate < TIMESTAMP '1998-01-01' AS early
  FROM orders
),
tot AS (
  SELECT sum(CASE WHEN early THEN 1 ELSE 0 END) AS ne,
         sum(CASE WHEN early THEN 0 ELSE 1 END) AS nl
  FROM halves
)
SELECT status,
       round(sum(CASE WHEN early THEN 1 ELSE 0 END) * 1.0 / nt.ne, 6)
         AS p_early,
       round(sum(CASE WHEN early THEN 0 ELSE 1 END) * 1.0 / nt.nl, 6)
         AS p_late,
       round(abs(sum(CASE WHEN early THEN 1 ELSE 0 END) * 1.0 / nt.ne
                 - sum(CASE WHEN early THEN 0 ELSE 1 END) * 1.0 / nt.nl),
             6) AS abs_diff
FROM halves CROSS JOIN tot nt
GROUP BY status, nt.ne, nt.nl
ORDER BY status
""",
    doc="categorical drift audit between the early and late halves of "
    "the order stream (fixed 1998-01-01 split): per-status share in "
    "each half and the absolute difference — half of the sum of "
    "abs_diff is the total-variation distance a data-quality gate "
    "thresholds on.  One scan, one aggregate; the category domain "
    "bounds the output",
)
def dq_drift_early_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    halves = orders.select(
        F.col("o_orderstatus").alias("status"),
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .alias("early"),
    )
    tot = halves.agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("ne"),
        F.sum(F.when(F.col("early"), 0).otherwise(1)).alias("nl"),
    )
    pe = F.sum(F.when(F.col("early"), 1).otherwise(0)) / F.col("ne")
    pl = F.sum(F.when(F.col("early"), 0).otherwise(1)) / F.col("nl")
    return (
        halves.crossJoin(F.broadcast(tot))
        .groupBy("status", "ne", "nl")
        .agg(
            F.round(pe, 6).alias("p_early"),
            F.round(pl, 6).alias("p_late"),
            F.round(F.abs(pe - pl), 6).alias("abs_diff"),
        )
        .select("status", "p_early", "p_late", "abs_diff")
        .orderBy("status")
    )


# ------------------------------------------- SPC p-chart


@register(
    "dq_spc_p_chart",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f
  FROM events GROUP BY 1
),
pbar AS (SELECT sum(f) * 1.0 / sum(n) AS p FROM daily)
SELECT day, CAST(n AS BIGINT) AS n,
       round(f * 1.0 / n, 6) AS p_day,
       round(p + 3 * sqrt(p * (1 - p) / n), 6) AS ucl,
       round(greatest(0.0, p - 3 * sqrt(p * (1 - p) / n)), 6) AS lcl,
       (f * 1.0 / n > p + 3 * sqrt(p * (1 - p) / n)
        OR f * 1.0 / n < greatest(0.0, p - 3 * sqrt(p * (1 - p) / n)))
         AS out_of_control
FROM daily CROSS JOIN pbar
ORDER BY day
""",
    doc="statistical-process-control p-chart over the event stream: "
    "each day's purchase share against 3-sigma binomial control "
    "limits around the pooled proportion (the Shewhart chart "
    "ops teams run on conversion/failure rates).  Two bounded "
    "aggregates (per-day, pooled) and a broadcast join — the "
    "day domain bounds everything after the first scan",
)
def dq_spc_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("f"),
    )
    pbar = daily.agg((F.sum("f") / F.sum("n")).alias("p"))
    p_day = F.col("f") / F.col("n")
    ucl = F.col("p") + 3 * F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("n"))
    lcl = F.greatest(
        F.lit(0.0),
        F.col("p") - 3 * F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("n")),
    )
    return (
        daily.crossJoin(F.broadcast(pbar))
        .select(
            "day",
            F.col("n").cast("long").alias("n"),
            F.round(p_day, 6).alias("p_day"),
            F.round(ucl, 6).alias("ucl"),
            F.round(lcl, 6).alias("lcl"),
            ((p_day > ucl) | (p_day < lcl)).alias("out_of_control"),
        )
        .orderBy("day")
    )


# ------------------------------------------- robust scaling


@register(
    "prep_robust_scale",
    oracle="""
WITH stats AS (
  SELECT c_mktsegment AS segment,
         quantile_cont(c_acctbal, 0.5) AS med,
         quantile_cont(c_acctbal, 0.75)
           - quantile_cont(c_acctbal, 0.25) AS iqr
  FROM customer GROUP BY 1
)
SELECT s.segment,
       round(med, 2) AS med,
       round(iqr, 2) AS iqr,
       round(avg((c_acctbal - med) / iqr), 6) + 0.0 AS scaled_mean,
       round(min((c_acctbal - med) / iqr), 6) AS scaled_min,
       round(max((c_acctbal - med) / iqr), 6) AS scaled_max
FROM customer c JOIN stats s ON s.segment = c.c_mktsegment
GROUP BY s.segment, med, iqr ORDER BY s.segment
""",
    doc="robust (median/IQR) feature scaling per segment — the "
    "outlier-resistant twin of z-scoring: exact interpolated "
    "quantiles per group (Spark percentile == DuckDB "
    "quantile_cont), broadcast back, one scan of scaled-value "
    "stats.  IQR is provably nonzero on the fixture (acctbal "
    "spreads within every segment) so ANSI division is safe; at "
    "100 TB the exact percentile swaps for approx_percentile with "
    "everything else unchanged",
)
def prep_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    stats = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("med"),
        (
            F.expr("percentile(c_acctbal, 0.75)")
            - F.expr("percentile(c_acctbal, 0.25)")
        ).alias("iqr"),
    )
    scaled = (F.col("c_acctbal") - F.col("med")) / F.col("iqr")
    return (
        cust.join(
            F.broadcast(stats),
            F.col("c_mktsegment") == F.col("segment"),
        )
        .groupBy("segment", "med", "iqr")
        .agg(
            (F.round(F.avg(scaled), 6) + 0.0).alias("scaled_mean"),
            F.round(F.min(scaled), 6).alias("scaled_min"),
            F.round(F.max(scaled), 6).alias("scaled_max"),
        )
        .select(
            "segment",
            F.round("med", 2).alias("med"),
            F.round("iqr", 2).alias("iqr"),
            "scaled_mean",
            "scaled_min",
            "scaled_max",
        )
        .orderBy("segment")
    )


# ------------------------------------------- touch attribution


@register(
    "funnel_attribution_first_last",
    oracle="""
WITH touched AS (
  SELECT user_id, ts, event_id, event_type,
         first_value(CASE WHEN event_type != 'purchase'
                          THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS first_touch,
         last_value(CASE WHEN event_type != 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM events
)
SELECT coalesce(first_touch, '(none)') AS first_touch,
       coalesce(last_touch, '(none)') AS last_touch,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM touched WHERE event_type = 'purchase'
GROUP BY 1, 2 ORDER BY n_purchases DESC, first_touch, last_touch
""",
    doc="first-touch / last-touch marketing attribution: every "
    "purchase credits the user's earliest and latest preceding "
    "non-purchase event via two IGNORE-NULLS frame functions over "
    "the per-user event stream — one shuffle on user_id, windows "
    "partitioned by user (never global), one aggregate over the "
    "(first, last) channel matrix.  The standard last-click board "
    "plus the first-click comparison in one pass",
)
def funnel_attribution_first_last(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    touched = ev.select(
        "event_type",
        F.first(non_purchase, ignorenulls=True).over(w).alias("first_touch"),
        F.last(non_purchase, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .orderBy(F.desc("n_purchases"), "first_touch", "last_touch")
    )


# ------------------------------------------- DP Laplace noise


@register(
    "privacy_dp_laplace_counts",
    oracle="""
WITH g AS (
  SELECT c_mktsegment AS segment, count(*) AS n FROM customer GROUP BY 1
),
noised AS (
  SELECT segment, n,
         (CAST(concat('0x', substr(md5(segment || '#dp'), 1, 15))
               AS BIGINT) % 1000000 + 0.5) / 1000001.0 AS u
  FROM g
)
SELECT segment,
       round(n + (-1 / 0.5) *
             (CASE WHEN u >= 0.5 THEN 1 ELSE -1 END)
             * ln(1 - 2 * abs(u - 0.5)), 4) AS noisy_count,
       CAST(n AS BIGINT) AS true_count
FROM noised ORDER BY segment
""",
    doc="differentially-private release of per-segment counts: "
    "Laplace(1/eps) noise (eps=0.5, sensitivity 1) via inverse-CDF "
    "over an md5-derived uniform — deterministic, so the oracle "
    "replays the exact noise draw (the md5-as-uniform discipline of "
    "the sampling family).  u = (h%1e6 + 0.5)/1000001 is strictly "
    "inside (0,1), so ln's argument is provably positive under "
    "ANSI.  true_count rides along for the epsilon-utility "
    "comparison this demo exists to show; a real release drops it.  "
    "EXPLICITLY NOT PRIVATE: the seed is the PUBLIC segment name, so "
    "anyone can replay and subtract the noise — the deterministic "
    "draw exists only for oracle replayability; a real DP mechanism "
    "derives the seed from a secret salt (or a true RNG), which the "
    "operator form accepts as a parameter",
)
def privacy_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (
        F.expr(
            "cast(conv(substr(md5(concat(segment, '#dp')), 1, 15),"
            " 16, 10) as bigint)"
        )
        % 1000000
        + 0.5
    ) / 1000001.0
    lap = (
        (-1 / 0.5)
        * F.when(u >= 0.5, 1).otherwise(-1)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return g.select(
        "segment",
        F.round(F.col("n") + lap, 4).alias("noisy_count"),
        F.col("n").cast("long").alias("true_count"),
    ).orderBy("segment")


# ------------------------------------------- ER blocking pairs


@register(
    "er_levenshtein_blocked_pairs",
    oracle="""
WITH names AS (
  SELECT p_name, string_split(p_name, ' ')[-1] AS block,
         count(*) AS cnt
  FROM part GROUP BY 1, 2
)
SELECT a.p_name AS name1, b.p_name AS name2,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       CAST(a.cnt * b.cnt AS BIGINT) AS n_record_pairs
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
ORDER BY dist, name1, name2
""",
    doc="entity-resolution candidate pairs via CANONICALIZE-then-"
    "block: the name table collapses to distinct values WITH "
    "multiplicities first (64 strings stand in for 20k rows at "
    "sf0.1 — the single biggest lever in any ER pipeline), then "
    "blocks on the head noun and keeps within-block pairs at "
    "levenshtein <= 4; n_record_pairs = cnt_a*cnt_b recovers the "
    "record-level pair count without materializing it.  Both "
    "engines share the same builtin levenshtein.  At 100 TB the "
    "block key comes from multiple redundant keys (soundex, "
    "prefix, token sets) unioned, same join shape; skewed blocks "
    "get the df-cap treatment the Jaccard join uses",
)
def er_levenshtein_blocked_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("block"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = names.alias("a")
    b = names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.p_name").alias("name1"),
        F.col("b.p_name").alias("name2"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        (F.col("a.cnt") * F.col("b.cnt")).alias("n_record_pairs"),
    )
    return (
        pairs.filter(F.col("dist") <= 4)
        .select(
            "name1",
            "name2",
            F.col("dist").cast("long").alias("dist"),
            F.col("n_record_pairs").cast("long").alias("n_record_pairs"),
        )
        .orderBy("dist", "name1", "name2")
    )


# ------------------------------------------- density core points


@register(
    "emb_density_core_points",
    oracle="""
WITH pp AS (
  SELECT least(16, greatest(4, CAST(ceil(log2(count(*) / 128.0)) AS INT)))
           AS bits,
         greatest(64, (8 * count(*)) // (1 << least(16, greatest(4,
           CAST(ceil(log2(count(*) / 128.0)) AS INT))))) AS cap
  FROM embeddings
),
raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
),
b AS (
  SELECT vec_id, label,
         list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS en,
         CAST(list_sum(list_transform(range(0, p.bits),
           i -> CASE WHEN e[CAST(i + 1 AS INT)] > 0
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT)
           AS bucket
  FROM raw CROSS JOIN pp p
),
capped AS (
  SELECT vec_id, en, bucket FROM b
  QUALIFY count(*) OVER (PARTITION BY bucket) <= (SELECT cap FROM pp)
),
probes AS (
  SELECT vec_id, en, label,
         unnest(list_prepend(bucket,
           list_transform(range(0, p.bits),
             i -> xor(bucket, CAST(1 AS BIGINT) << i)))) AS pbucket
  FROM b CROSS JOIN pp p
),
neigh AS (
  SELECT p.vec_id, p.label,
         count(*) FILTER (
           WHERE round(list_dot_product(p.en, v.en), 6) >= 0.2
             AND v.vec_id != p.vec_id) AS n_eps
  FROM probes p LEFT JOIN capped v ON v.bucket = p.pbucket
  GROUP BY 1, 2
)
SELECT label,
       CAST(count(*) FILTER (WHERE n_eps >= 5) AS BIGINT) AS n_core,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(n_eps) AS BIGINT) AS total_eps_neighbors
FROM neigh GROUP BY label ORDER BY label
""",
    doc="DBSCAN-style density profile: a vector is a CORE point if "
    ">=5 neighbors within its LSH probe set (bucket + Hamming-1 "
    "ring, the sub-quadratic candidate discipline of the dedup "
    "family) have cosine >= 0.2.  The density-reachability step "
    "every density clusterer starts from, expressed as one bucket "
    "equi-join + per-vector count — never the N^2 epsilon-"
    "neighborhood scan.  Round-6 verdict fix: the bit count DERIVES "
    "from corpus size (bits = clamp(4..16, ceil(log2(n/128))), so "
    "expected bucket size stays ~128 as N grows — pair volume "
    "(bits+1)*128*N, linear in N, not the fixed-16-bucket 5N^2/16), "
    "and the build side passes through cap_hot_buckets at 8x the "
    "expected bucket size (exactly the dedup_embedding_cosine "
    "guard; the oracle replays the cap via QUALIFY so the capped "
    "semantics sit under the hash gate).  The probe side LEFT-joins "
    "the capped build so a vector whose own bucket is dropped still "
    "contributes n_eps=0 to n_total rather than vanishing.  Missed "
    "cross-bucket neighbors are the documented LSH recall trade, "
    "same as ml_knn_classify_ann.  Per-pair scoring is a cogroup-"
    "by-bucket BLAS matmul (one (p x d) @ (d x v) per bucket) — "
    "promoted to the registry default in round 9 on measured "
    "evidence (round-8 verdict task 7): exact bit-parity with the "
    "HOF-dot reference path at sf0.001/0.01/0.1 AND at the N=20k "
    "sf1.0 stress point, where it runs 8.7s vs the HOF path's "
    "103.7s (exponent 0.41 vs 1.01; SCALING.md).  The sequential-"
    "fold HOF path remains as _density_core_points_hof, parity-"
    "pinned per round in tests/test_round11_ops.py and timed as "
    "bench_density_core_points_hof — if a BLAS library change ever "
    "flips a 6dp-rounded sim at the eps boundary, that pin is the "
    "tripwire",
)
def emb_density_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _density_core_points_blas(spark, sf_dir)


def _density_core_points_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-fold JVM HOF-dot reference path for
    emb_density_core_points (the registry default until round 9;
    demoted to oracle-exact twin when the BLAS cogroup scorer proved
    bit-identical at every measured scale and 12x faster at N=20k —
    see the registered doc above)."""
    import math

    from ..operators.dedup import cap_hot_buckets
    from ..operators.similarity import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    # One bounded driver-side action: corpus size picks the code width
    # (the scale knob the round-6 verdict ordered) and the bucket cap.
    n = emb.count()
    bits = min(16, max(4, math.ceil(math.log2(max(n, 1) / 128.0))))
    cap = max(64, (8 * n) >> bits)
    b = (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            "label",
            sum(
                F.when(F.element_at(F.col("embedding"), i + 1) > 0, 1 << i)
                .otherwise(0)
                for i in range(bits)
            ).cast("long").alias("bucket"),
        )
        .withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.transform("e", lambda x: x / F.col("nrm")).alias("en"),
        )
    )
    probes = b.select(
        "vec_id",
        "en",
        "label",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(bits)
                ],
            )
        ).alias("bucket"),
    )
    v = cap_hot_buckets(b, ["bucket"], cap).select(
        F.col("vec_id").alias("nb"), F.col("en").alias("ven"), "bucket"
    )
    neigh = (
        probes.join(v, "bucket", "left")
        .groupBy("vec_id", "label")
        .agg(
            F.count(
                F.when(
                    (F.round(_dot(F.col("en"), F.col("ven")), 6) >= 0.2)
                    & (F.col("nb") != F.col("vec_id")),
                    1,
                )
            ).alias("n_eps")
        )
    )
    return (
        neigh.groupBy("label")
        .agg(
            F.count(F.when(F.col("n_eps") >= 5, 1))
            .cast("long")
            .alias("n_core"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("n_eps").cast("long").alias("total_eps_neighbors"),
        )
        .orderBy("label")
    )


def _density_core_points_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench twin of emb_density_core_points with the per-pair scoring
    swapped from the JVM HOF dot to a cogroup-by-bucket BLAS matmul
    (VERDICT r7 task 7: the production-default scorer at cluster scale,
    kept OUT of the registry because BLAS summation order can flip a
    6dp-rounded sim exactly at the eps boundary — the hash gate demands
    bit-stable counts).  Candidate generation, multiprobe fan-out, and
    the hot-bucket cap are byte-identical to the registry query; only
    the probe x bucket scoring differs: one (p x d) @ (d x v) numpy
    matmul per bucket group instead of p*v interpreted HOF dots.
    Parity with the registry row is pinned at relaxed tolerance in
    tests/test_round11_ops.py; wall time is recorded every round as
    ``bench_density_core_points_blas`` in BENCH_FULL.json."""
    import math

    import numpy as np
    import pandas as pd

    from ..operators.dedup import cap_hot_buckets
    from ..operators.similarity import _dot, _round6_half_up

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits = min(16, max(4, math.ceil(math.log2(max(n, 1) / 128.0))))
    cap = max(64, (8 * n) >> bits)
    b = (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            "label",
            sum(
                F.when(F.element_at(F.col("embedding"), i + 1) > 0, 1 << i)
                .otherwise(0)
                for i in range(bits)
            ).cast("long").alias("bucket"),
        )
        .withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.transform("e", lambda x: x / F.col("nrm")).alias("en"),
        )
    )
    probes = b.select(
        "vec_id",
        "en",
        "label",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(bits)
                ],
            )
        ).alias("bucket"),
    )
    v = cap_hot_buckets(b, ["bucket"], cap).select(
        F.col("vec_id").alias("nb"), F.col("en").alias("ven"), "bucket"
    )

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # LEFT-join semantics: probes with an empty bucket still emit
        # a zero partial so capped-away vectors count toward n_total
        if left.empty:
            return pd.DataFrame(
                {"vec_id": [], "label": [], "n_eps": []}
            ).astype({"vec_id": "int64", "label": "int32",
                      "n_eps": "int64"})
        if right.empty:
            return pd.DataFrame(
                {
                    "vec_id": left["vec_id"].astype("int64"),
                    "label": left["label"].astype("int32"),
                    "n_eps": np.zeros(len(left), dtype="int64"),
                }
            )
        P = np.asarray(left["en"].tolist(), dtype=np.float64)
        V = np.asarray(right["ven"].tolist(), dtype=np.float64)
        sims = _round6_half_up(P @ V.T)
        hit = sims >= 0.2
        # exclude self-pairs (same vec_id on both sides)
        self_mask = (
            left["vec_id"].to_numpy()[:, None]
            == right["nb"].to_numpy()[None, :]
        )
        counts = (hit & ~self_mask).sum(axis=1).astype("int64")
        return pd.DataFrame(
            {
                "vec_id": left["vec_id"].astype("int64"),
                "label": left["label"].astype("int32"),
                "n_eps": counts,
            }
        )

    partials = (
        probes.groupBy("bucket")
        .cogroup(v.groupBy("bucket"))
        .applyInPandas(score, "vec_id long, label int, n_eps long")
    )
    neigh = partials.groupBy("vec_id", "label").agg(
        F.sum("n_eps").alias("n_eps")
    )
    return (
        neigh.groupBy("label")
        .agg(
            F.count(F.when(F.col("n_eps") >= 5, 1))
            .cast("long")
            .alias("n_core"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("n_eps").cast("long").alias("total_eps_neighbors"),
        )
        .orderBy("label")
    )


# ------------------------------------------- BM25F multi-field

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "search_bm25f_multifield",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, len(a) AS dl, i.i AS p, a[i.i] AS term
  FROM (SELECT doc_id, {_TOKS} AS a FROM documents),
       LATERAL (SELECT unnest(range(1, len(a) + 1)) AS i) i
),
fields AS (
  SELECT doc_id, dl,
         least(3, dl) AS len_title, dl - least(3, dl) AS len_body,
         CASE WHEN p <= 3 THEN 'title' ELSE 'body' END AS field, term
  FROM pos
),
tf AS (
  SELECT doc_id, dl, len_title, len_body, field, term, count(*) AS tf
  FROM fields WHERE term IN ('join', 'scan') GROUP BY ALL
),
avglen AS (
  SELECT avg(least(3, len({_TOKS}))) AS avg_title,
         avg(len({_TOKS}) - least(3, len({_TOKS}))) AS avg_body,
         count(*) AS n_docs
  FROM documents
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
tfw AS (
  SELECT doc_id, term, any_value(dl) AS dl,
         sum(CASE WHEN field = 'title'
                  THEN 2.0 * tf / (1 - 0.75 + 0.75 * len_title / g.avg_title)
                  ELSE 1.0 * tf / (1 - 0.75 + 0.75 * len_body / g.avg_body)
             END) AS w
  FROM tf CROSS JOIN avglen g
  GROUP BY doc_id, term
),
scored AS (
  SELECT t.doc_id, any_value(t.dl) AS dl,
         sum(ln(1 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
             * t.w / (1.2 + t.w)) AS s
  FROM tfw t JOIN df d USING (term) CROSS JOIN avglen g
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(dl AS BIGINT) AS dl, round(s, 6) AS score
FROM scored
ORDER BY round(s, 6) DESC, doc_id LIMIT 10
""",
    doc="BM25F — the multi-field generalization of "
    "search_bm25_ranking (Robertson/Zaragoza): the first 3 tokens "
    "act as a 'title' field weighted 2x, the rest as body; per-"
    "field tf is normalized by its own length prior (b=0.75) "
    "BEFORE the k1 saturation, which is what distinguishes BM25F "
    "from per-field-BM25-then-sum.  Same inverted-index scale "
    "shape as BM25: posting lists for the 2 query terms only, "
    "broadcast df/avglen stats, top-10 with doc_id tiebreak",
)
def search_bm25f_multifield(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pos = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.posexplode(toks).alias("p0", "term"),
    ).select(
        "doc_id",
        "dl",
        (F.col("p0") + 1).alias("p"),
        "term",
    )
    fields = pos.select(
        "doc_id",
        "dl",
        F.least(F.lit(3), F.col("dl")).alias("len_title"),
        (F.col("dl") - F.least(F.lit(3), F.col("dl"))).alias("len_body"),
        F.when(F.col("p") <= 3, "title").otherwise("body").alias("field"),
        "term",
    )
    # the posting list feeds df AND the weighted-tf aggregate —
    # checkpoint so the token explode runs once (persisting this
    # bucketed by term IS inverted-index construction at scale)
    tf = (
        fields.filter(F.col("term").isin("join", "scan"))
        .groupBy("doc_id", "dl", "len_title", "len_body", "field", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    avglen = docs.agg(
        F.avg(F.least(F.lit(3), F.size(toks))).alias("avg_title"),
        F.avg(F.size(toks) - F.least(F.lit(3), F.size(toks))).alias(
            "avg_body"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tfw = (
        tf.crossJoin(F.broadcast(avglen))
        .groupBy("doc_id", "term")
        .agg(
            F.any_value("dl").alias("dl"),
            F.sum(
                F.when(
                    F.col("field") == "title",
                    2.0
                    * F.col("tf")
                    / (
                        1
                        - 0.75
                        + 0.75 * F.col("len_title") / F.col("avg_title")
                    ),
                ).otherwise(
                    1.0
                    * F.col("tf")
                    / (
                        1
                        - 0.75
                        + 0.75 * F.col("len_body") / F.col("avg_body")
                    )
                )
            ).alias("w"),
        )
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tfw.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(avglen.select("n_docs")))
        .groupBy("doc_id")
        .agg(
            F.any_value("dl").cast("long").alias("dl"),
            F.sum(idf * F.col("w") / (1.2 + F.col("w"))).alias("s"),
        )
    )
    return (
        scored.select("doc_id", "dl", F.round("s", 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


# ------------------------------------------- Allen interval algebra


@register(
    "join_interval_allen_counts",
    oracle="""
WITH marks AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
               OR CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id))) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS MATERIALIZED (
  SELECT user_id,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS s,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS e
  FROM (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marks)
  GROUP BY user_id, sid
),
a_spans AS (
  SELECT user_id, s, e, unnest(range(s // 3600, e // 3600 + 1)) AS bucket
  FROM sessions
),
pairs AS (
  SELECT a.user_id AS u1, a.s AS s1, a.e AS e1,
         b.user_id AS u2, b.s AS s2, b.e AS e2
  FROM a_spans a
  JOIN a_spans b
    ON b.bucket = a.bucket AND b.user_id > a.user_id
  WHERE b.s <= a.e AND a.s <= b.e
    AND a.bucket = greatest(a.s, b.s) // 3600
),
rel AS (
  SELECT CASE
           WHEN s1 = s2 AND e1 = e2 THEN 'equals'
           WHEN s1 = s2 THEN 'starts'
           WHEN e1 = e2 THEN 'finishes'
           WHEN (s1 > s2 AND e1 < e2) OR (s2 > s1 AND e2 < e1)
             THEN 'during'
           WHEN e1 = s2 OR e2 = s1 THEN 'meets'
           ELSE 'overlaps'
         END AS relation
  FROM pairs
)
SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs
FROM rel GROUP BY relation ORDER BY relation
""",
    doc="Allen-algebra census over cross-user session intervals "
    "(30-min-gap sessionization, the dash_peak_concurrency "
    "definition): every intersecting pair of sessions from "
    "DIFFERENT users is classified (equals/starts/finishes/"
    "during/meets/overlaps, precedence top-down).  The pair join "
    "uses hour-bucket banding — both interval sets explode over "
    "the buckets they span and a pair counts ONCE, at the bucket "
    "of the later start (an instant both intervals provably "
    "cover) — the join_event_self_interval discipline lifted "
    "from points to intervals.  Candidate volume is sum over "
    "buckets of concurrent-session products: bounded by "
    "concurrency density, never by history length",
)
def join_interval_allen_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wm = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(wm).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(wm))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
        "event_id",
    )
    # order by (ts, event_id): with duplicate (user_id, ts) rows a
    # ts-only ROWS frame is nondeterministic among peers (ADVICE r6)
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = (
        marks.withColumn("sid", F.sum("new_session").over(ws))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("s"),
            F.unix_timestamp(F.max("ts")).alias("e"),
        )
        .drop("sid")
        .localCheckpoint(eager=False)
    )
    spans = sessions.select(
        "user_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / 3600), F.floor(F.col("e") / 3600)
            )
        ).alias("bucket"),
    )
    a = spans.select(
        F.col("user_id").alias("u1"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
        "bucket",
    )
    b = spans.select(
        F.col("user_id").alias("u2"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("u2") > F.col("u1"))
        & (F.col("s2") <= F.col("e1"))
        & (F.col("s1") <= F.col("e2"))
        & (
            F.col("bucket")
            == F.floor(F.greatest(F.col("s1"), F.col("s2")) / 3600)
        )
    )
    relation = (
        F.when(
            (F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")),
            "equals",
        )
        .when(F.col("s1") == F.col("s2"), "starts")
        .when(F.col("e1") == F.col("e2"), "finishes")
        .when(
            ((F.col("s1") > F.col("s2")) & (F.col("e1") < F.col("e2")))
            | ((F.col("s2") > F.col("s1")) & (F.col("e2") < F.col("e1"))),
            "during",
        )
        .when(
            (F.col("e1") == F.col("s2")) | (F.col("e2") == F.col("s1")),
            "meets",
        )
        .otherwise("overlaps")
    )
    return (
        pairs.select(relation.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("relation")
    )


# ------------------------------------------- BFS levels (iterative)


@register(
    "graph_bfs_levels",
    oracle="""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
                  greatest(c.c_nationkey, s.s_nationkey) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
edges AS MATERIALIZED (
  SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
),
walk AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS lvl
  UNION
  SELECT e.v AS node, w.lvl + 1 AS lvl
  FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.lvl < 6
)
SELECT node, CAST(min(lvl) AS BIGINT) AS lvl
FROM walk GROUP BY node ORDER BY node
""",
    doc="BFS shortest-hop levels from nation 0 over the trade graph "
    "(same edge reduction as graph_triangle_count_trade: the fact "
    "join collapses to distinct nation pairs BEFORE any graph "
    "work).  Spark side is frontier-iteration — per round, the "
    "frontier equi-joins the edge list, anti-joins the visited "
    "set, and the lineage is localCheckpoint-truncated exactly "
    "like PageRank/label-propagation; the oracle replays it as a "
    "bounded recursive CTE.  Six rounds cover any diameter the "
    "25-nation graph can have; at 100 TB frontier expansion is "
    "the textbook Pregel superstep",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .distinct()
    )
    edges = (
        pairs.unionAll(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    visited = (
        edges.sparkSession.range(1)
        .select(F.lit(0).cast("long").alias("node"), F.lit(0).alias("lvl"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for lvl in range(1, 7):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(lvl).alias("lvl"))
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(
        "node", F.col("lvl").cast("long").alias("lvl")
    ).orderBy("node")


# ------------------------------------------- regexp scalar suite


@register(
    "fn_regexp_suite",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1) AS adjective,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT)
         AS n_vowels,
       regexp_matches(p_name, '(bolt|gear)$') AS is_hardware,
       regexp_replace(p_name, '(\\w+) (\\w+)', '\\2, \\1') AS swapped
FROM part
ORDER BY p_partkey LIMIT 200
""",
    doc="regexp scalar-function parity row: extract (capture "
    "group), global replace, match-count via extract_all, "
    "anchored boolean match, and backreference swap — the regexp "
    "corner of the P8 scalar surface, pinned cross-engine "
    "(Spark regexp_* over Java regex vs DuckDB RE2; the suite "
    "deliberately stays on the common-semantics subset: character "
    "classes, anchors, capture groups)",
)
def fn_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("adjective"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("devoweled"),
            F.size(F.expr("regexp_extract_all(p_name, '[aeiou]', 0)"))
            .cast("long")
            .alias("n_vowels"),
            F.col("p_name").rlike("(bolt|gear)$").alias("is_hardware"),
            F.regexp_replace("p_name", r"(\w+) (\w+)", "$2, $1").alias(
                "swapped"
            ),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


# ------------------------------------------- rolling z-score


@register(
    "win_rolling_zscore_7d",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         round(sum(value), 2) AS y
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, y,
         avg(y) OVER w AS m,
         stddev_samp(y) OVER w AS sd,
         count(*) OVER w AS n_win
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, y,
       round(m, 2) AS mean_7d,
       round((y - m) / (CASE WHEN sd > 0 THEN sd END), 4) AS z,
       (n_win >= 4 AND abs((y - m) / (CASE WHEN sd > 0 THEN sd END)) > 2)
         AS is_anomaly
FROM win ORDER BY event_type, day
""",
    doc="rolling 7-day z-score anomaly flags per event type: RANGE "
    "window over the per-(type, day) aggregate — partitioned by "
    "type, input bounded by the calendar, so the window never sees "
    "raw events.  sd guards through a CASE (NULL z on a constant "
    "week, never an ANSI divide-by-zero); flags need >=4 window "
    "days so the first days don't alarm on tiny samples.  The "
    "online-monitoring twin of ts_outliers_mad's batch MAD test",
)
def win_rolling_zscore_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multiply-form rounding (round(x*100)/100): Spark F.round's
    # shortest-repr HALF_UP and DuckDB's multiply-first split exactly
    # the ...5 boundary this fixture hits (285.465 -> 285.47 vs .46)
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg((F.round(F.sum("value") * 100, 0) / 100).alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("day"))
        .rangeBetween(-6 * 86400, 0)
    )
    win = daily.select(
        "event_type",
        "day",
        "y",
        F.avg("y").over(w).alias("m"),
        F.stddev_samp("y").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    z = (F.col("y") - F.col("m")) / F.when(F.col("sd") > 0, F.col("sd"))
    return win.select(
        "event_type",
        "day",
        "y",
        (F.round(F.col("m") * 100, 0) / 100).alias("mean_7d"),
        (F.round(z * 10000, 0) / 10000).alias("z"),
        ((F.col("n_win") >= 4) & (F.abs(z) > 2)).alias("is_anomaly"),
    ).orderBy("event_type", "day")


# ------------------------------------------- HHI concentration


@register(
    "agg_hhi_by_nation",
    oracle="""
WITH rev AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS r
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
tot AS (SELECT nation, sum(r) AS tr, count(*) AS n_suppliers FROM rev
        GROUP BY nation)
SELECT t.nation,
       CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
       round(sum(pow(r.r / t.tr, 2)) * 10000, 2) AS hhi,
       round(1.0 / t.n_suppliers * 10000, 2) AS hhi_floor
FROM rev r JOIN tot t USING (nation)
GROUP BY t.nation, t.n_suppliers ORDER BY t.nation
""",
    doc="Herfindahl-Hirschman market-concentration index per nation "
    "(sum of squared supplier revenue shares, x10000 per antitrust "
    "convention) with the 1/n perfect-competition floor — the "
    "concentration complement of agg_gini_revenue_concentration.  "
    "Two hash aggregates (supplier revenue, nation totals) and a "
    "broadcast join-back; shares are exact ratios of 2-pass sums",
)
def agg_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    # one row per supplier, feeds the nation rollup AND the share
    # join-back — checkpoint so the fact join runs once
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("r")
        )
        .localCheckpoint(eager=False)
    )
    tot = rev.groupBy("nation").agg(
        F.sum("r").alias("tr"), F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation", "n_suppliers")
        .agg(
            F.round(
                F.sum(F.pow(F.col("r") / F.col("tr"), 2)) * 10000, 2
            ).alias("hhi")
        )
        .select(
            "nation",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            "hhi",
            F.round(1.0 / F.col("n_suppliers") * 10000, 2).alias(
                "hhi_floor"
            ),
        )
        .orderBy("nation")
    )


# ------------------------------------------- geometric/harmonic means


@register(
    "agg_geo_harmonic_means",
    oracle="""
SELECT c_mktsegment AS segment,
       round(avg(c_acctbal), 2) AS arith_mean,
       round(exp(avg(ln(c_acctbal + 10000))) - 10000, 2) AS geo_mean,
       round(count(*) / sum(1.0 / (c_acctbal + 10000)) - 10000, 2)
         AS harm_mean,
       CAST(count(*) AS BIGINT) AS n
FROM customer GROUP BY 1 ORDER BY segment
""",
    doc="the Pythagorean-means parity row per segment: geometric mean "
    "via exp-of-avg-log and harmonic via n-over-reciprocal-sum, both "
    "single hash aggregates.  Account balances can be negative, so "
    "both means run on a +10000 shift (documented offset, provably "
    "positive on the fixture domain [-1000, 10000)) and shift back — "
    "the standard trick for log-mean over signed data.  Verifies "
    "AM >= GM >= HM ordering implicitly through the oracle hash",
)
def agg_geo_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    shifted = F.col("c_acctbal") + 10000
    return (
        cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.avg("c_acctbal"), 2).alias("arith_mean"),
            F.round(F.exp(F.avg(F.log(shifted))) - 10000, 2).alias(
                "geo_mean"
            ),
            F.round(
                F.count(F.lit(1)) / F.sum(1.0 / shifted) - 10000, 2
            ).alias("harm_mean"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("segment")
    )


# ------------------------------------------- Wald-Wolfowitz runs test


@register(
    "stats_runs_test",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         sum(o_totalprice) AS y
  FROM orders GROUP BY 1
),
med AS (SELECT quantile_cont(y, 0.5) AS m FROM daily),
signs AS (
  SELECT day, y > m AS above FROM daily CROSS JOIN med WHERE y != m
),
runs AS (
  SELECT count(*) AS n_runs FROM (
    SELECT CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                 OR lag(above) OVER (ORDER BY day) != above
                THEN 1 ELSE 0 END AS new_run
    FROM signs)
  WHERE new_run = 1
),
counts AS (
  SELECT sum(CASE WHEN above THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN above THEN 0 ELSE 1 END) AS n2
  FROM signs
)
SELECT CAST(r.n_runs AS BIGINT) AS n_runs,
       CAST(c.n1 AS BIGINT) AS n_above,
       CAST(c.n2 AS BIGINT) AS n_below,
       round((r.n_runs - (2.0 * c.n1 * c.n2 / (c.n1 + c.n2) + 1))
             / sqrt(2.0 * c.n1 * c.n2 * (2.0 * c.n1 * c.n2 - c.n1 - c.n2)
                    / (pow(c.n1 + c.n2, 2) * (c.n1 + c.n2 - 1))), 4)
         AS z
FROM runs r CROSS JOIN counts c
""",
    doc="Wald-Wolfowitz runs test for randomness of the daily-revenue "
    "sequence around its median: runs counted with the gaps-and-"
    "islands lag trick over the per-day aggregate (calendar-bounded "
    "window, ties-to-median dropped per the classic test), then the "
    "closed-form normal approximation.  Complements Mann-Kendall: "
    "MK detects monotone trend, runs detects ANY serial dependence",
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # calendar-bounded series feeds the median AND the sign stream;
    # signs feed the run counter AND the above/below counts —
    # checkpoint both so the N-sized aggregate runs once
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
        .localCheckpoint(eager=False)
    )
    med = daily.agg(F.expr("percentile(y, 0.5)").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("m"))
        .select("day", (F.col("y") > F.col("m")).alias("above"))
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("day")
    runs = (
        signs.select(
            F.when(
                F.lag("above").over(w).isNull()
                | (F.lag("above").over(w) != F.col("above")),
                1,
            )
            .otherwise(0)
            .alias("new_run")
        )
        .agg(F.sum("new_run").alias("n_runs"))
    )
    counts = signs.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).alias("n2"),
    )
    n1, n2, nr = F.col("n1"), F.col("n2"), F.col("n_runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / (F.pow(n1 + n2, 2) * (n1 + n2 - 1))
    )
    return runs.crossJoin(F.broadcast(counts)).select(
        nr.cast("long").alias("n_runs"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        F.round((nr - mu) / F.sqrt(var), 4).alias("z"),
    )


# ---------------------------------- round-7 window inventory below:
# gated this round (3-scale), queued at positions 51+ for the next
# rotation.


@register(
    "stats_levene_test",
    oracle="""
WITH med AS (
  SELECT o_orderpriority AS grp, quantile_cont(o_totalprice, 0.5) AS md
  FROM orders GROUP BY 1
),
z AS (
  SELECT o.o_orderpriority AS grp, abs(o.o_totalprice - m.md) AS z
  FROM orders o JOIN med m ON m.grp = o.o_orderpriority
),
g AS (
  SELECT grp, count(*) AS ng, sum(z) AS sz, sum(z * z) AS szz
  FROM z GROUP BY 1
),
tot AS (
  SELECT sum(ng) AS n, count(*) AS k, sum(sz) AS tsz, sum(szz) AS tszz,
         sum(sz * sz / ng) AS sgroup
  FROM g
)
SELECT round((sgroup - tsz * tsz / n) / (k - 1)
             / ((tszz - sgroup) / (n - k)), 4) AS w_stat,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(n - k AS BIGINT) AS df_within
FROM tot
""",
    doc="Brown-Forsythe homogeneity-of-variance test (the robust "
    "Levene variant): one-way ANOVA on absolute deviations from the "
    "GROUP MEDIANS — exact per-group medians broadcast back, then "
    "the same sums-only F machinery as stats_anova_oneway.  The "
    "gatekeeper test run before trusting ANOVA's equal-variance "
    "assumption; two scans + bounded combines",
)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("md")
    )
    z = orders.join(
        F.broadcast(med), orders.o_orderpriority == med.grp
    ).select("grp", F.abs(F.col("o_totalprice") - F.col("md")).alias("z"))
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sz").alias("tsz"),
        F.sum("szz").alias("tszz"),
        F.sum(F.col("sz") * F.col("sz") / F.col("ng")).alias("sgroup"),
    )
    ssb = F.col("sgroup") - F.col("tsz") * F.col("tsz") / F.col("n")
    ssw = F.col("tszz") - F.col("sgroup")
    return tot.select(
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4
        ).alias("w_stat"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n") - F.col("k")).cast("long").alias("df_within"),
    )


@register(
    "stats_cohens_d_effect",
    oracle="""
WITH g AS (
  SELECT c_mktsegment AS seg, count(*) AS n, avg(c_acctbal) AS m,
         var_samp(c_acctbal) AS v
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1
),
w AS (
  SELECT
    max(CASE WHEN seg = 'BUILDING' THEN m END) AS m1,
    max(CASE WHEN seg = 'MACHINERY' THEN m END) AS m2,
    max(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
    max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n2,
    max(CASE WHEN seg = 'BUILDING' THEN v END) AS v1,
    max(CASE WHEN seg = 'MACHINERY' THEN v END) AS v2
  FROM g
)
SELECT round(m1, 2) AS mean_building,
       round(m2, 2) AS mean_machinery,
       round(sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)), 4)
         AS pooled_sd,
       round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                              / (n1 + n2 - 2)), 4) + 0.0 AS cohens_d,
       round(((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                               / (n1 + n2 - 2)))
             * (1 - 3.0 / (4 * (n1 + n2) - 9)), 4) + 0.0 AS hedges_g
FROM w
""",
    doc="standardized effect size between two segments' balances: "
    "Cohen's d over the pooled sample SD plus the small-sample "
    "Hedges' g correction — the companion number every A/B z-test "
    "(ab_test_conversion) should report, since significance without "
    "magnitude is how dashboards mislead.  One filtered aggregate, "
    "one pivot row",
)
def stats_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    g = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("c_acctbal").alias("m"),
        F.var_samp("c_acctbal").alias("v"),
    )
    w = g.agg(
        F.max(F.when(F.col("seg") == "BUILDING", F.col("m"))).alias("m1"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("m"))).alias("m2"),
        F.max(F.when(F.col("seg") == "BUILDING", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("seg") == "BUILDING", F.col("v"))).alias("v1"),
        F.max(F.when(F.col("seg") == "MACHINERY", F.col("v"))).alias("v2"),
    )
    pooled = F.sqrt(
        (
            (F.col("n1") - 1) * F.col("v1")
            + (F.col("n2") - 1) * F.col("v2")
        )
        / (F.col("n1") + F.col("n2") - 2)
    )
    d = (F.col("m1") - F.col("m2")) / pooled
    return w.select(
        F.round("m1", 2).alias("mean_building"),
        F.round("m2", 2).alias("mean_machinery"),
        F.round(pooled, 4).alias("pooled_sd"),
        (F.round(d, 4) + 0.0).alias("cohens_d"),
        (
            F.round(
                d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)), 4
            )
            + 0.0
        ).alias("hedges_g"),
    )


@register(
    "stats_poisson_rate_test",
    oracle="""
WITH halves AS (
  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'h1' ELSE 'h2' END
           AS half,
         date_trunc('day', ts) AS d,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
),
g AS (
  SELECT half, CAST(sum(is_p) AS BIGINT) AS k,
         CAST(count(DISTINCT d) AS BIGINT) AS t
  FROM halves GROUP BY 1
),
w AS (
  SELECT max(CASE WHEN half = 'h1' THEN k END) AS k1,
         max(CASE WHEN half = 'h2' THEN k END) AS k2,
         max(CASE WHEN half = 'h1' THEN t END) AS t1,
         max(CASE WHEN half = 'h2' THEN t END) AS t2
  FROM g
)
SELECT k1, k2, t1, t2,
       round(k1 * 1.0 / t1, 4) AS rate1,
       round(k2 * 1.0 / t2, 4) AS rate2,
       round((k1 * 1.0 / t1 - k2 * 1.0 / t2)
             / sqrt(k1 * 1.0 / (t1 * t1) + k2 * 1.0 / (t2 * t2)), 4)
         + 0.0 AS z
FROM w
""",
    doc="two-sample Poisson rate test on daily purchase counts "
    "between the stream's two halves (fixed 2024-01-16 split): "
    "exposure-normalized rates and the normal-approximation z over "
    "sqrt(k1/t1^2 + k2/t2^2) — the incident/conversion rate "
    "comparison on-call dashboards run.  Counts and exposures from "
    "one aggregate; k>0 on the fixture so the variance term is "
    "ANSI-safe",
)
def stats_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    halves = ev.select(
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "h1"
        )
        .otherwise("h2")
        .alias("half"),
        F.date_trunc("day", "ts").alias("d"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_p"
        ),
    )
    g = halves.groupBy("half").agg(
        F.sum("is_p").cast("long").alias("k"),
        F.countDistinct("d").cast("long").alias("t"),
    )
    w = g.agg(
        F.max(F.when(F.col("half") == "h1", F.col("k"))).alias("k1"),
        F.max(F.when(F.col("half") == "h2", F.col("k"))).alias("k2"),
        F.max(F.when(F.col("half") == "h1", F.col("t"))).alias("t1"),
        F.max(F.when(F.col("half") == "h2", F.col("t"))).alias("t2"),
    )
    r1 = F.col("k1") / F.col("t1")
    r2 = F.col("k2") / F.col("t2")
    z = (r1 - r2) / F.sqrt(
        F.col("k1") / (F.col("t1") * F.col("t1"))
        + F.col("k2") / (F.col("t2") * F.col("t2"))
    )
    return w.select(
        "k1",
        "k2",
        "t1",
        "t2",
        F.round(r1, 4).alias("rate1"),
        F.round(r2, 4).alias("rate2"),
        (F.round(z, 4) + 0.0).alias("z"),
    )


@register(
    "graph_clustering_coefficient",
    oracle="""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
                  greatest(c.c_nationkey, s.s_nationkey) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
  GROUP BY node
),
tri AS (
  SELECT node, count(*) AS t FROM (
    SELECT e1.u AS node FROM pairs e1
    JOIN pairs e2 ON e2.u = e1.v
    JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    UNION ALL
    SELECT e1.v FROM pairs e1
    JOIN pairs e2 ON e2.u = e1.v
    JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    UNION ALL
    SELECT e2.v FROM pairs e1
    JOIN pairs e2 ON e2.u = e1.v
    JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v)
  GROUP BY node
)
SELECT d.node, CAST(d.d AS BIGINT) AS degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS n_triangles,
       round(2.0 * coalesce(t.t, 0) / (d.d * (d.d - 1)), 4) AS coeff
FROM deg d LEFT JOIN tri t ON t.node = d.node
WHERE d.d >= 2
ORDER BY d.node
""",
    doc="per-node local clustering coefficient on the nation trade "
    "graph: triangles-through-node over deg*(deg-1)/2 possible "
    "wedges — the node-level refinement of "
    "graph_triangle_count_trade's global count, using the same "
    "ordered-edge triangle join (each triangle credited to its 3 "
    "corners via union).  Degree-1 nodes are excluded (undefined "
    "coefficient, and the ANSI division demands it)",
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tris = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select("e1.u", "e1.v", F.col("e2.v").alias("w"))
        .localCheckpoint(eager=False)
    )
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("v").alias("node")))
        .unionAll(tris.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.join(corners, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce("t", F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                4,
            ).alias("coeff"),
        )
        .orderBy("node")
    )


@register(
    "graph_degree_assortativity",
    oracle="""
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS MATERIALIZED (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
),
deg AS MATERIALIZED (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
  GROUP BY node
),
ends AS (
  -- degrees as DOUBLE: the m*sxx / sx*sx products overflow BIGINT on
  -- hub-heavy graphs; integer-valued doubles sum exactly (< 2^53)
  -- and the product rounding is identical IEEE on both engines
  SELECT CAST(du.d AS DOUBLE) AS dx, CAST(dv.d AS DOUBLE) AS dy
  FROM pairs p
  JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v
  UNION ALL
  SELECT CAST(dv.d AS DOUBLE), CAST(du.d AS DOUBLE) FROM pairs p
  JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v
),
sums AS (
  SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
         sum(dx * dx) AS sxx, sum(dy * dy) AS syy, sum(dx * dy) AS sxy
  FROM ends
)
SELECT round((m * sxy - sx * sy)
             / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 6)
         + 0.0 AS assortativity,
       CAST(m / 2 AS BIGINT) AS n_edges
FROM sums
""",
    doc="degree assortativity of the co-purchase graph (Newman r): "
    "Pearson correlation of endpoint degrees over the symmetrized "
    "edge list — negative r means hub parts pair with niche parts "
    "(disassortative).  The nation trade graph is near-complete on "
    "the fixture (constant degree, r undefined), so this runs on "
    "the same per-order part pairs as graph_degree_histogram.  "
    "Degree table joins back to the edges; one sums-only "
    "correlation, no windows",
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
        )
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(
        F.col("node").alias("u"), F.col("d").cast("double").alias("dx")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("d").cast("double").alias("dy")
    )
    joined = pairs.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    ends = joined.select("dx", "dy").unionAll(
        joined.select(F.col("dy").alias("dx"), F.col("dx").alias("dy"))
    )
    sums = ends.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    r = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        (F.round(r, 6) + 0.0).alias("assortativity"),
        (F.col("m") / 2).cast("long").alias("n_edges"),
    )


@register(
    "ml_ridge_normal_eq",
    oracle="""
WITH pts AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS DOUBLE) AS x,
         o_totalprice AS y
  FROM orders
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         sum(y) AS sy, sum(x * y) AS sxy
  FROM pts
)
SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS b_ols,
       round((n * sxy - sx * sy) / (n * (sxx + 1000) - sx * sx), 6)
         AS b_ridge,
       round(((n * sxy - sx * sy) / (n * (sxx + 1000) - sx * sx))
             / ((n * sxy - sx * sy) / (n * sxx - sx * sx)), 4)
         AS shrinkage
FROM s
""",
    doc="ridge regression (L2 on the slope, lambda=1000) by the "
    "closed-form normal equations next to its OLS twin "
    "(ml_linreg_normal_eq): the 2x2 Cramer solve only gains +lambda "
    "on the Gram diagonal, so the shrinkage ratio is directly "
    "readable.  One sums-only aggregate; the canonical "
    "regularization demo for the sums-based regression family",
)
def ml_ridge_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("double")
        .alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    b_ols = num / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    b_ridge = num / (
        F.col("n") * (F.col("sxx") + 1000)
        - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.round(b_ols, 6).alias("b_ols"),
        F.round(b_ridge, 6).alias("b_ridge"),
        F.round(b_ridge / b_ols, 4).alias("shrinkage"),
    )


_LR_DIM6 = 4096


@register(
    "ml_confusion_logreg",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % {_LR_DIM6}
           AS idx
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents)
),
c AS (SELECT doc_id, idx, count(*) AS cnt FROM tk GROUP BY ALL),
dot AS (
  SELECT doc_id,
         CAST(sum(cnt * ((idx * 2654435761) % 1001 - 500)) AS BIGINT)
           AS dot_int
  FROM c GROUP BY doc_id
),
pred AS (
  SELECT d.doc_id,
         1.0 / (1.0 + exp(-(d.dot_int / 250000.0))) >= 0.5 AS p,
         doc.lang = 'en' AS actual
  FROM dot d JOIN documents doc ON doc.doc_id = d.doc_id
),
cm AS (
  SELECT CAST(count(*) FILTER (WHERE p AND actual) AS BIGINT) AS tp,
         CAST(count(*) FILTER (WHERE p AND NOT actual) AS BIGINT) AS fp,
         CAST(count(*) FILTER (WHERE NOT p AND actual) AS BIGINT) AS fn,
         CAST(count(*) FILTER (WHERE NOT p AND NOT actual) AS BIGINT) AS tn
  FROM pred
)
SELECT tp, fp, fn, tn,
       round((tp + tn) * 1.0 / (tp + fp + fn + tn), 4) AS accuracy,
       round(CASE WHEN tp + fp > 0
                  THEN tp * 1.0 / (tp + fp) END, 4) AS precision_,
       round(CASE WHEN tp + fn > 0
                  THEN tp * 1.0 / (tp + fn) END, 4) AS recall_
FROM cm
""",
    doc="confusion matrix + accuracy/precision/recall for the "
    "hashing-trick logistic scorer (ml_score_logreg's integer-exact "
    "pipeline) against the lang='en' pseudo-label: the evaluation "
    "half every deployed classifier pairs with its inference half.  "
    "Guarded CASE keeps the ratios NULL rather than tripping ANSI "
    "division when a predicted class is empty",
)
def ml_confusion_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10)
        .cast("long")
        .__mod__(_LR_DIM6)
        .alias("idx"),
    )
    c = tk.groupBy("doc_id", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    w = (F.col("idx") * F.lit(2654435761)) % 1001 - 500
    dot = c.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * w).cast("long").alias("dot_int")
    )
    pred = dot.join(docs.select("doc_id", "lang"), "doc_id").select(
        (1.0 / (1.0 + F.exp(-(F.col("dot_int") / 250000.0))) >= 0.5)
        .alias("p"),
        (F.col("lang") == "en").alias("actual"),
    )
    cm = pred.agg(
        F.count(F.when(F.col("p") & F.col("actual"), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.when(F.col("p") & ~F.col("actual"), 1))
        .cast("long")
        .alias("fp"),
        F.count(F.when(~F.col("p") & F.col("actual"), 1))
        .cast("long")
        .alias("fn"),
        F.count(F.when(~F.col("p") & ~F.col("actual"), 1))
        .cast("long")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((tp + tn) / (tp + fp + fn + tn), 4).alias("accuracy"),
        F.round(
            F.when(tp + fp > 0, tp / (tp + fp)), 4
        ).alias("precision_"),
        F.round(F.when(tp + fn > 0, tp / (tp + fn)), 4).alias("recall_"),
    )


@register(
    "ml_lift_by_score_band",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % {_LR_DIM6}
           AS idx
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents)
),
c AS (SELECT doc_id, idx, count(*) AS cnt FROM tk GROUP BY ALL),
dot AS (
  SELECT doc_id,
         CAST(sum(cnt * ((idx * 2654435761) % 1001 - 500)) AS BIGINT)
           AS dot_int
  FROM c GROUP BY doc_id
),
banded AS (
  SELECT least(4, CAST(floor(
           (1.0 / (1.0 + exp(-(d.dot_int / 250000.0)))) * 5) AS BIGINT))
           AS band,
         CASE WHEN doc.lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM dot d JOIN documents doc ON doc.doc_id = d.doc_id
),
tot AS (SELECT sum(pos) * 1.0 / count(*) AS base FROM banded)
SELECT band, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       round(sum(pos) * 1.0 / count(*), 6) AS rate,
       round(sum(pos) * 1.0 / count(*) / t.base, 4) AS lift
FROM banded CROSS JOIN tot t
GROUP BY band, t.base ORDER BY band
""",
    doc="lift table over FIXED score bands (5 bands of 0.2 score "
    "width): per-band positive rate over the base rate for the "
    "logistic scorer — fixed band edges, not ntile deciles, so band "
    "assignment is a projection and no global sort exists anywhere "
    "in the plan (the agg_equidepth_histogram_scalable argument "
    "applied to model evaluation).  Base rate > 0 on the fixture "
    "(en docs exist), so the lift division is ANSI-safe",
)
def ml_lift_by_score_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10)
        .cast("long")
        .__mod__(_LR_DIM6)
        .alias("idx"),
    )
    c = tk.groupBy("doc_id", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    w = (F.col("idx") * F.lit(2654435761)) % 1001 - 500
    dot = c.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * w).cast("long").alias("dot_int")
    )
    score = 1.0 / (1.0 + F.exp(-(F.col("dot_int") / 250000.0)))
    # (band, pos) pairs feed the base-rate aggregate AND the per-band
    # rollup — checkpoint so the token-explode pipeline runs once
    banded = (
        dot.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            F.least(F.lit(4), F.floor(score * 5))
            .cast("long")
            .alias("band"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .localCheckpoint(eager=False)
    )
    tot = banded.agg(
        (F.sum("pos") / F.count(F.lit(1))).alias("base")
    )
    return (
        banded.crossJoin(F.broadcast(tot))
        .groupBy("band", "base")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.round(F.sum("pos") / F.count(F.lit(1)), 6).alias("rate"),
            F.round(
                F.sum("pos") / F.count(F.lit(1)) / F.first("base"), 4
            ).alias("lift"),
        )
        .select("band", "n", "n_pos", "rate", "lift")
        .orderBy("band")
    )


@register(
    "dash_new_vs_returning",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(date_trunc('day', ts)) AS fd FROM events GROUP BY 1
),
daily AS (
  SELECT CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS week,
         e.user_id,
         min(CASE WHEN date_trunc('day', e.ts) = f.fd THEN 1 ELSE 0 END)
           AS any_first
  FROM events e JOIN first_seen f USING (user_id)
  GROUP BY 1, 2
)
SELECT week,
       CAST(count(*) FILTER (WHERE any_first = 1) AS BIGINT) AS new_users,
       CAST(count(*) FILTER (WHERE any_first = 0) AS BIGINT)
         AS returning_users,
       round(count(*) FILTER (WHERE any_first = 0) * 1.0 / count(*), 4)
         AS returning_share
FROM daily GROUP BY week ORDER BY week
""",
    doc="new-vs-returning weekly split: a user counts as NEW in the "
    "week containing their first-ever active day (the first-seen "
    "trick from win_cumulative_distinct_users — one min-aggregate, "
    "no expanding window), returning otherwise.  Two hash "
    "aggregates + an equi-join on user_id; the growth-accounting "
    "board every product dashboard opens with",
)
def dash_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("fd")
    )
    daily = (
        ev.join(first_seen, "user_id")
        .groupBy(
            F.date_trunc("week", "ts").alias("week"), "user_id"
        )
        .agg(
            F.min(
                F.when(
                    F.date_trunc("day", "ts") == F.col("fd"), 1
                ).otherwise(0)
            ).alias("any_first")
        )
    )
    return (
        daily.groupBy("week")
        .agg(
            F.count(F.when(F.col("any_first") == 1, 1))
            .cast("long")
            .alias("new_users"),
            F.count(F.when(F.col("any_first") == 0, 1))
            .cast("long")
            .alias("returning_users"),
            F.round(
                F.count(F.when(F.col("any_first") == 0, 1))
                / F.count(F.lit(1)),
                4,
            ).alias("returning_share"),
        )
        .orderBy("week")
    )


@register(
    "emb_centroid_shift_drift",
    oracle="""
WITH halves AS (
  SELECT label, vec_id % 2 = 0 AS h1, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
),
dims AS (
  SELECT label, h1, i.i AS pos, avg(e[i.i]) AS m
  FROM halves, LATERAL (SELECT unnest(range(1, 65)) AS i) i
  GROUP BY 1, 2, 3
),
cents AS (
  SELECT label, h1, list(m ORDER BY pos) AS cv
  FROM dims GROUP BY 1, 2
),
paired AS (
  SELECT a.label, a.cv AS c1, b.cv AS c2
  FROM cents a JOIN cents b ON a.label = b.label AND a.h1 AND NOT b.h1
)
SELECT label,
       round(list_cosine_similarity(c1, c2), 6) AS centroid_cosine
FROM paired ORDER BY label
""",
    doc="embedding drift monitor: per-label centroid of the even-id "
    "half vs the odd-id half, compared by cosine — the cheap "
    "detector for embedding-model version skew or ingest drift "
    "(production compares yesterday's centroids to today's).  "
    "Centroids are per-(label, dim) means — posexplode + hash "
    "aggregate, the train_ivf_centroids Lloyd-update shape — so "
    "nothing N-sized survives the first aggregate",
)
def emb_centroid_shift_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("h1"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    cents = (
        emb.groupBy("label", "h1", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("label", "h1")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            "label",
            "h1",
            F.transform("pm", lambda s: s["m"]).alias("cv"),
        )
    )
    a = cents.filter("h1").select("label", F.col("cv").alias("c1"))
    b = cents.filter(~F.col("h1")).select(
        F.col("label").alias("l2"), F.col("cv").alias("c2")
    )
    return (
        a.join(b, a.label == b.l2)
        .select(
            "label",
            F.round(cosine(F.col("c1"), F.col("c2")), 6).alias(
                "centroid_cosine"
            ),
        )
        .orderBy("label")
    )


@register(
    "dq_duplicate_key_audit",
    oracle="""
SELECT * FROM (
  SELECT 'orders.o_orderkey' AS key_col,
         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
         (SELECT CAST(count(*) AS BIGINT) FROM (
            SELECT o_orderkey FROM orders GROUP BY 1
            HAVING count(*) > 1)) AS n_dup_keys
  UNION ALL
  SELECT 'customer.c_custkey',
         (SELECT CAST(count(*) AS BIGINT) FROM customer),
         (SELECT CAST(count(*) AS BIGINT) FROM (
            SELECT c_custkey FROM customer GROUP BY 1
            HAVING count(*) > 1))
  UNION ALL
  SELECT 'part.p_partkey',
         (SELECT CAST(count(*) AS BIGINT) FROM part),
         (SELECT CAST(count(*) AS BIGINT) FROM (
            SELECT p_partkey FROM part GROUP BY 1 HAVING count(*) > 1))
  UNION ALL
  SELECT 'lineitem.(l_orderkey,l_linenumber)',
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(count(*) AS BIGINT) FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY 1, 2 HAVING count(*) > 1))
) ORDER BY key_col
""",
    doc="primary-key uniqueness audit across the star schema "
    "(including the composite lineitem key): per-key group-and-"
    "count-violations, one lazy union so all four audits run as one "
    "action — the companion gate to dq_referential_orphans "
    "(uniqueness upstream, referential integrity downstream)",
)
def dq_duplicate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(df, cols, name):
        # both counts stay lazy branches of ONE union plan — no
        # eager .count() driver jobs at build time
        total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        dups = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.count(F.lit(1)).cast("long").alias("n_dup_keys"))
        )
        return total.crossJoin(dups).select(
            F.lit(name).alias("key_col"), "n_rows", "n_dup_keys"
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        audit(orders, ["o_orderkey"], "orders.o_orderkey")
        .unionAll(audit(cust, ["c_custkey"], "customer.c_custkey"))
        .unionAll(audit(part, ["p_partkey"], "part.p_partkey"))
        .unionAll(
            audit(
                li,
                ["l_orderkey", "l_linenumber"],
                "lineitem.(l_orderkey,l_linenumber)",
            )
        )
    )
    return out.orderBy("key_col")


@register(
    "agg_skew_kurtosis_moments",
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS grp, count(*) AS n,
         avg(o_totalprice) AS m,
         sum(o_totalprice) AS s1,
         sum(o_totalprice * o_totalprice) AS s2,
         sum(o_totalprice * o_totalprice * o_totalprice) AS s3,
         sum(o_totalprice * o_totalprice * o_totalprice * o_totalprice)
           AS s4
  FROM orders GROUP BY 1
),
mom AS (
  SELECT grp, n,
         s2 / n - m * m AS m2,
         s3 / n - 3 * m * s2 / n + 2 * m * m * m AS m3,
         s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n
           - 3 * m * m * m * m AS m4
  FROM s
)
SELECT grp,
       round(m3 / pow(m2, 1.5), 4) + 0.0 AS skewness,
       round(m4 / (m2 * m2) - 3, 4) + 0.0 AS excess_kurtosis
FROM mom ORDER BY grp
""",
    doc="population skewness and excess kurtosis per priority from "
    "RAW power sums (s1..s4 in one aggregate pass, central moments "
    "by the binomial expansion) — deliberately NOT the engines' "
    "skewness()/kurtosis() builtins, whose sample-correction "
    "conventions differ between Spark and DuckDB; the raw-moment "
    "formulation is convention-free and matches bit-for-bit after "
    "rounding.  The shape-profiling add-on to agg_stats_moments",
)
def agg_skew_kurtosis_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = F.col("o_totalprice")
    s = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderpriority").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("m"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    m, n = F.col("m"), F.col("n")
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3 * m * F.col("s2") / n + 2 * m * m * m
    m4 = (
        F.col("s4") / n
        - 4 * m * F.col("s3") / n
        + 6 * m * m * F.col("s2") / n
        - 3 * m * m * m * m
    )
    return s.select(
        "grp",
        (F.round(m3 / F.pow(m2, 1.5), 4) + 0.0).alias("skewness"),
        (F.round(m4 / (m2 * m2) - 3, 4) + 0.0).alias("excess_kurtosis"),
    ).orderBy("grp")


@register(
    "ml_systematic_sample",
    oracle="""
WITH ranked AS (
  SELECT c_custkey, c_mktsegment,
         row_number() OVER (
           ORDER BY md5(CAST(c_custkey AS VARCHAR) || '#sys')) AS rn
  FROM customer
)
SELECT c_custkey, c_mktsegment
FROM ranked WHERE rn % 20 = 7
ORDER BY c_custkey
""",
    doc="systematic 1-in-20 sample over a hashed ordering: rows "
    "ranked by keyed md5 (so the 'systematic' stride is over a "
    "pseudorandom permutation, immune to layout periodicity — the "
    "failure mode plain every-20th-row sampling has on sorted "
    "files), then every 20th taken at fixed offset 7.  "
    "Deterministic, so both engines draw the identical sample.  "
    "The global rank is the demo form; at 100 TB the same "
    "md5-threshold idea (take keys whose hash mod 20 = 7) "
    "needs no rank at all — that variant is "
    "ml_stratified_sample_det's machinery",
)
def ml_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.row_number()
        .over(
            Window.orderBy(
                F.md5(
                    F.concat(
                        F.col("c_custkey").cast("string"), F.lit("#sys")
                    )
                )
            )
        )
        .alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") % 20 == 7)
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "text_char_entropy_per_source",
    oracle="""
WITH chars AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '')) AS ch
  FROM documents
),
freq AS (
  SELECT source, ch, count(*) AS n FROM chars
  WHERE ch != '' GROUP BY 1, 2
),
tot AS (SELECT source, sum(n) AS t FROM freq GROUP BY 1)
SELECT f.source,
       CAST(count(*) AS BIGINT) AS alphabet_size,
       round(-sum((n * 1.0 / t.t) * log2(n * 1.0 / t.t)), 4)
         AS char_entropy_bits
FROM freq f JOIN tot t USING (source)
GROUP BY f.source ORDER BY f.source
""",
    doc="character-level Shannon entropy per source — the "
    "compressibility fingerprint corpus-quality pipelines use to "
    "flag boilerplate/encoding junk (low entropy) and binary "
    "contamination (high): explode to characters, bounded "
    "per-(source, char) histogram, one entropy fold.  The "
    "character-alphabet domain bounds everything after the first "
    "aggregate",
)
def text_char_entropy_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    chars = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), "")
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    # alphabet-bounded histogram feeds the totals AND the entropy
    # fold — checkpoint so the character explode runs once
    freq = (
        chars.groupBy("source", "ch")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = freq.groupBy("source").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    return (
        freq.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("alphabet_size"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("char_entropy_bits"),
        )
        .orderBy("source")
    )
