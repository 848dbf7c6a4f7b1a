"""Round-2 coverage additions: tolerance-checked approximate
percentiles, deterministic stratified sampling, bigram collocations
(PMI), k-anonymity profiling, and null-safe joins.

Each rides the same oracle discipline as the rest of the registry:
approximate ops assert their own error bound in-query (the
agg_approx_count_distinct pattern) so the tolerance — not just the row
shape — is value-hash checked; sampling uses an md5-derived hash both
engines compute bit-identically, so the SAMPLE ITSELF is deterministic
and oracle-checked, not just its size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "agg_approx_percentile_band",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5) AS exact_p50,
       TRUE AS within_band
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Approximate percentile (GK sketch) as the scale path for "
    "medians: constant-memory vs exact percentile's full sort per "
    "group. accuracy=1000 bounds rank error at 0.1pct; the query "
    "asserts the estimate lands inside the exact discrete [p49, p51] "
    "value band, so the oracle hash-checks the tolerance claim "
    "itself. Discrete (actual-data-value) percentiles throughout — "
    "interpolated medians differ in the last double bit across "
    "engines and can flip a round(2) at a .005 boundary",
)
def agg_approx_percentile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one sorted buffer per group, indexed at ceil(p*n) ==
    # percentile_disc's smallest-value-with-cume>=p (same pattern as
    # agg_quartiles, verified bit-identical to quantile_disc)
    disc = lambda p: F.element_at(  # noqa: E731
        "__s", F.ceil(F.lit(p) * F.col("__n")).cast("int")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sort_array(F.collect_list("l_extendedprice")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
            F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(1000)
            ).alias("__approx"),
        )
        .select(
            "l_returnflag",
            disc(0.5).alias("exact_p50"),
            (
                (F.col("__approx") >= disc(0.49))
                & (F.col("__approx") <= disc(0.51))
            ).alias("within_band"),
        )
    )


# 15 md5 hex chars -> 60-bit int, same idiom as operators/dedup.simhash_md5;
# mod 100 gives a deterministic per-row percentile bucket both engines agree on
_HASH_SPARK = "cast(conv(substr(md5(cast(c_custkey as string)), 1, 15), 16, 10) as bigint)"
_HASH_DUCK = "CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "ml_stratified_sample_det",
    oracle=f"""
SELECT c_mktsegment,
       count(*) AS n_total,
       count(*) FILTER (WHERE {_HASH_DUCK} % 100 < 20) AS n_sampled,
       round(sum(c_acctbal) FILTER (WHERE {_HASH_DUCK} % 100 < 20), 2) AS sampled_balance
FROM customer
GROUP BY c_mktsegment
""",
    doc="Deterministic stratified ~20pct sample per market segment via "
    "an md5-derived hash bucket — reproducible across engines, runs "
    "and cluster sizes (no rand(), no per-partition state), the "
    "property a training-data split needs. The oracle recomputes "
    "membership row-by-row, so the sample itself is hash-checked",
)
def ml_stratified_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    in_sample = F.expr(_HASH_SPARK) % 100 < 20
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(in_sample, 1)).alias("n_sampled"),
        F.round(F.sum(F.when(in_sample, F.col("c_acctbal"))), 2).alias(
            "sampled_balance"
        ),
    )


@register(
    "text_bigram_pmi",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
uni AS (
  SELECT unnest(t) AS w FROM toks
),
uni_c AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
n1 AS (SELECT count(*) AS n FROM uni),
bi AS (
  SELECT unnest(list_transform(
           t[1:len(t)-1],
           (x, i) -> struct_pack(w1 := x, w2 := t[i + 1])
         )) AS b
  FROM toks
),
bi_c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c2 FROM bi GROUP BY ALL),
n2 AS (SELECT count(*) AS n FROM bi)
SELECT w1, w2, c2 AS pair_count,
       round(ln((c2 / n2.n) / ((a.c / n1.n) * (b.c / n1.n))), 6) AS pmi
FROM bi_c
JOIN uni_c a ON bi_c.w1 = a.w
JOIN uni_c b ON bi_c.w2 = b.w
CROSS JOIN n1 CROSS JOIN n2
WHERE c2 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 30
""",
    doc="Bigram collocation mining via pointwise mutual information — "
    "the classic phrase-detection pass over a training corpus "
    "(word2vec-style phrase merging). Bigrams from one indexed "
    "array transform (no self-join), unigram/bigram counts with "
    "map-side combine, tiny count tables broadcast back",
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    uni = toks.select(F.explode("t").alias("w"))
    uni_c = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n1 = uni.count()
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bi_c = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    n2 = bi.count()
    pmi = F.round(
        F.log(
            (F.col("c2") / F.lit(n2))
            / ((F.col("a.c") / F.lit(n1)) * (F.col("b.c") / F.lit(n1)))
        ),
        6,
    )
    return (
        bi_c.filter(F.col("c2") >= 5)
        .join(F.broadcast(uni_c.alias("a")), F.col("w1") == F.col("a.w"))
        .join(F.broadcast(uni_c.alias("b")), F.col("w2") == F.col("b.w"))
        .select(
            "w1", "w2", F.col("c2").alias("pair_count"), pmi.alias("pmi")
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(30)
    )


@register(
    "privacy_k_anonymity",
    oracle="""
SELECT c_mktsegment, c_nationkey,
       count(*) AS group_size,
       count(*) < 5 AS violates_k5
FROM customer
GROUP BY c_mktsegment, c_nationkey
ORDER BY c_mktsegment, c_nationkey
""",
    doc="k-anonymity audit over the (segment, nation) quasi-identifier "
    "pair: equivalence-class sizes and k<5 violations — the privacy "
    "gate a training-data release pipeline runs before export",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("violates_k5", F.col("group_size") < 5)
        .orderBy("c_mktsegment", "c_nationkey")
    )


@register(
    "join_null_safe_eq",
    oracle="""
WITH c AS (
  SELECT c_custkey, nullif(c_nationkey % 5, 0) AS bucket FROM customer
),
s AS (
  SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS bucket FROM supplier
)
SELECT coalesce(CAST(c.bucket AS VARCHAR), 'NULL') AS bucket_s,
       count(*) AS n_pairs
FROM c JOIN s ON c.bucket IS NOT DISTINCT FROM s.bucket
GROUP BY bucket_s
ORDER BY bucket_s
""",
    doc="J1+ null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL "
    "buckets match each other instead of dropping — still a hash "
    "join in Spark (EqualNullSafe is a valid equi-join key), not a "
    "BNLJ",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("cb")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("sb")
    )
    return (
        cust.join(supp, cust["cb"].eqNullSafe(supp["sb"]))
        .groupBy(
            F.coalesce(F.col("cb").cast("string"), F.lit("NULL")).alias(
                "bucket_s"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("bucket_s")
    )
