"""Training-data pipeline extras: incremental dedup, profiling,
embedding quantization.

Three operators a 100-TB corpus pipeline needs beyond the one-shot
shapes already covered:

- ``dedup_incremental_batch`` — the production dedup loop is
  INCREMENTAL: yesterday's corpus is already deduplicated, today's
  crawl batch must be checked against it without re-pairing the whole
  corpus.  Anti-join of batch fingerprints against the corpus
  fingerprint set: shuffle carries 16-byte hashes, never documents,
  and the corpus side would be a bucketed fingerprint table at scale
  so the probe is a bucket-local join.
- ``profile_orders_columns`` — per-column data-quality profile
  (rows/nulls/distincts/min/max), the first query anyone runs on an
  unknown table.  One branch per column, each a single-column
  parquet scan (column pruning keeps I/O at one column per branch);
  a multi-distinct single pass would Expand the whole row instead.
- ``emb_quantize_int8`` — max-abs int8 scalar quantization of the
  embedding column (the standard vector-index compression, e.g.
  faiss SQ8): per-vector scale, quantized codes, and reconstruction
  RMSE, all JVM higher-order functions — no Python in the loop, 4x
  smaller vectors for the ANN index build.

Rounding note: quantization uses floor(x+0.5) on BOTH sides (not
round()) — Spark rounds half-up, DuckDB half-even, and quantized
grids land on .5 boundaries routinely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "dedup_incremental_batch",
    oracle="""
WITH corpus AS (
  SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 <> 7
),
incoming AS (
  SELECT doc_id, md5(text) AS fp, source
  FROM documents WHERE doc_id % 10 = 7
  UNION ALL
  SELECT doc_id + 100000, md5(text), source
  FROM documents WHERE doc_id % 10 = 3
)
SELECT i.doc_id, i.fp AS fingerprint, i.source
FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = i.fp)
""",
    doc="Incremental dedup: a crawl batch (fresh docs + re-crawled "
    "copies of corpus docs under new ids) anti-joined on content "
    "fingerprint against the existing corpus — re-crawls drop, fresh "
    "docs survive. Shuffle carries 16-byte md5s only",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 7).select(
        F.md5("text").alias("fp")
    )
    fresh = docs.filter(F.col("doc_id") % 10 == 7)
    recrawled = docs.filter(F.col("doc_id") % 10 == 3).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    incoming = fresh.unionByName(recrawled).select(
        "doc_id", F.md5("text").alias("fp"), "source"
    )
    return (
        incoming.join(corpus, "fp", "left_anti")
        .select("doc_id", F.col("fp").alias("fingerprint"), "source")
    )


@register(
    "profile_orders_columns",
    oracle="""
SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate),
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
""",
    doc="Per-column data-quality profile of orders: rows, nulls, exact "
    "distincts, min/max. One branch per column so every branch scans "
    "exactly one parquet column; doubles excluded (engine-specific "
    "float-to-string formatting), timestamps pinned to a shared format",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def prof(col: str, ts: bool = False) -> DataFrame:
        c = F.col(col)
        mn, mx = F.min(c), F.max(c)
        if ts:
            mn = F.date_format(mn, "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(mx, "yyyy-MM-dd HH:mm:ss")
        else:
            mn, mx = mn.cast("string"), mx.cast("string")
        return orders.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.count_distinct(c).alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        )

    parts = [
        prof("o_orderkey"),
        prof("o_custkey"),
        prof("o_orderstatus"),
        prof("o_orderpriority"),
        prof("o_orderdate", ts=True),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "emb_quantize_int8",
    oracle="""
WITH scaled AS (
  SELECT vec_id, embedding,
         127.0 / greatest(list_max(list_transform(embedding, x -> abs(x))), 1e-30) AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, embedding, scale,
         list_transform(embedding, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS qvec
  FROM scaled
)
SELECT vec_id,
       array_to_string(qvec, ',') AS qvec_csv,
       round(scale, 6) AS scale_r,
       round(sqrt(list_sum(list_transform(
               list_zip(embedding, qvec),
               p -> pow(p[1] - p[2] / scale, 2)
             )) / len(embedding)), 6) AS rmse
FROM q
""",
    doc="Max-abs int8 scalar quantization of the embedding column "
    "(faiss-SQ8 shape): per-vector scale, int codes, reconstruction "
    "RMSE — all JVM higher-order functions, floor(x+0.5) rounding on "
    "both engines. The code vector ships as a CSV string (concat_ws / "
    "array_to_string): a raw array<int> top-level column breaks the "
    "driver's pandas sort_values canonicalizer (unhashable list).",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.withColumn(
        "scale",
        127.0
        / F.greatest(
            F.array_max(F.transform("embedding", lambda x: F.abs(x))),
            F.lit(1e-30),
        ),
    )
    q = scaled.withColumn(
        "qvec",
        F.transform(
            "embedding",
            lambda x: F.floor(x * F.col("scale") + 0.5).cast("int"),
        ),
    )
    return q.select(
        "vec_id",
        F.concat_ws(",", F.col("qvec")).alias("qvec_csv"),
        F.round("scale", 6).alias("scale_r"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        "qvec",
                        lambda a, b: F.pow(a - b / F.col("scale"), 2),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size("embedding")
            ),
            6,
        ).alias("rmse"),
    )


@register(
    "ml_decontaminate_eval",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 8
                     THEN list_transform(generate_series(1, len(t) - 7),
                                         i -> array_to_string(t[i:i+7], ' '))
                     ELSE [] END) AS ng
  FROM t
),
train AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 <> 7),
eval_g AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 = 7)
SELECT e.doc_id,
       count(*) AS n_ngrams,
       count(*) FILTER (WHERE tr.ng IS NOT NULL) AS n_hits,
       count(*) FILTER (WHERE tr.ng IS NOT NULL) > 0 AS contaminated
FROM eval_g e LEFT JOIN train tr ON e.ng = tr.ng
GROUP BY e.doc_id
ORDER BY e.doc_id
""",
    doc="Train/eval decontamination (the 8-gram-overlap check every "
    "LLM training pipeline runs before benchmark evals): eval docs "
    "whose word 8-grams appear anywhere in the train split are "
    "flagged, with hit counts. Shuffle carries n-gram strings once "
    "for the distinct + once for the join — at 100 TB both sides "
    "would be md5(ngram) 16-byte keys instead (same plan shape)",
)
def ml_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 8,
                F.expr(
                    "transform(sequence(0, size(t) - 8),"
                    " i -> array_join(slice(t, i + 1, 8), ' '))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ng"),
    )
    train = (
        grams.filter(F.col("doc_id") % 10 != 7).select("ng").distinct()
        .withColumn("__hit", F.lit(1))
    )
    eval_g = grams.filter(F.col("doc_id") % 10 == 7)
    return (
        eval_g.join(train, "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_hits"),
            (F.count("__hit") > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_repetition_ratio",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
tri AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(generate_series(1, len(t) - 2),
                                  i -> array_to_string(t[i:i+2], ' '))
              ELSE [] END AS g
  FROM t
)
SELECT doc_id,
       len(g) AS n_trigrams,
       round(CASE WHEN len(g) > 0
                  THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                  ELSE 0.0 END, 6) AS dup_trigram_ratio,
       CASE WHEN len(g) > 0
            THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
            ELSE 0.0 END > 0.2 AS flagged
FROM tri
ORDER BY doc_id
""",
    doc="Gopher/MassiveText-style repetition filter: fraction of "
    "duplicated word trigrams per document, flagging docs above 0.2 "
    "— a pure per-row JVM array computation, no shuffle at all",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = F.when(
        F.size("t") >= 3,
        F.expr(
            "transform(sequence(0, size(t) - 3),"
            " i -> array_join(slice(t, i + 1, 3), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    ratio = F.when(
        F.size("g") > 0,
        1.0 - F.size(F.array_distinct("g")).cast("double") / F.size("g"),
    ).otherwise(F.lit(0.0))
    return (
        docs.select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
        )
        .withColumn("g", g)
        .select(
            "doc_id",
            F.size("g").alias("n_trigrams"),
            F.round(ratio, 6).alias("dup_trigram_ratio"),
            (ratio > 0.2).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@register(
    "ml_domain_reweight",
    oracle="""
WITH counts AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars_total
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_docs) AS n FROM counts)
SELECT c.source, c.n_docs, c.n_chars_total,
       round(CAST(c.n_docs AS DOUBLE) / t.n, 6) AS natural_share,
       round(1.0 / (SELECT count(*) FROM counts), 6) AS target_share,
       round((1.0 / (SELECT count(*) FROM counts))
             / (CAST(c.n_docs AS DOUBLE) / t.n), 6) AS sample_weight
FROM counts c CROSS JOIN tot t
ORDER BY c.source
""",
    doc="Domain mixture reweighting (DoReMi-style static reweight to a "
    "uniform target): per-source natural share vs target share and "
    "the per-document sampling weight that achieves it — feeds "
    "ml_mixture_sample's weighted draw",
)
def ml_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    # tiny per-source table: totals via a broadcastable single-row agg
    tot = counts.agg(
        F.sum("n_docs").alias("n"), F.count(F.lit(1)).alias("n_sources")
    )
    natural = F.col("n_docs").cast("double") / F.col("n")
    target = 1.0 / F.col("n_sources")
    return (
        counts.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_chars_total",
            F.round(natural, 6).alias("natural_share"),
            F.round(target, 6).alias("target_share"),
            F.round(target / natural, 6).alias("sample_weight"),
        )
        .orderBy("source")
    )


@register(
    "dedup_jaccard_threshold_pairs",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
),
sh0 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM toks
),
ex AS (SELECT doc_id, unnest(s) AS tok FROM sh0),
hot AS (SELECT tok FROM ex GROUP BY tok HAVING count(*) > 1000),
sh AS (
  SELECT doc_id, list(tok) AS s
  FROM ex WHERE tok NOT IN (SELECT tok FROM hot)
  GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / len(list_distinct(a.s || b.s)) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(j, 6) AS jaccard
FROM pairs WHERE j >= 0.5
ORDER BY id_a, id_b
""",
    doc="EXACT Jaccard>=0.5 similarity self-join (All-Pairs count "
    "formulation with size filter), with the shingle-df cap ACTIVE "
    "(max_shingle_df=1000) and REPLICATED in the oracle — both "
    "engines drop shingles in >1000 docs from the universe, so the "
    "semantics agree at every scale factor, not just where the cap "
    "is a no-op. The oracle is the BRUTE-FORCE all-pairs join — a "
    "hash match proves the pruning lost nothing (exactness, which "
    "MinHash can't claim)",
)
def dedup_jaccard_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_threshold_join

    # spread (round-12): shingle build + posting explode are CPU-bound
    # map passes over a single-row-group scan
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return jaccard_threshold_join(
        docs, id_col="doc_id", text_col="text", threshold=0.5,
        max_shingle_df=1000,
    ).orderBy("id_a", "id_b")


@register(
    "dedup_containment_pairs",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
),
sh0 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM toks
),
ex AS (SELECT doc_id, unnest(s) AS tok FROM sh0),
hot AS (SELECT tok FROM ex GROUP BY tok HAVING count(*) > 1000),
sh AS (
  SELECT doc_id, list(tok) AS s
  FROM ex WHERE tok NOT IN (SELECT tok FROM hot)
  GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS c
  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
)
SELECT id_a, id_b, round(c, 6) AS containment
FROM pairs WHERE c >= 0.8
ORDER BY id_a, id_b
""",
    doc="DIRECTIONAL partial-dup detection: shingle containment "
    "C(A->B) = |A∩B|/|A| >= 0.8 with the same shingle-df cap (1000) "
    "as the Jaccard join, replicated in the oracle.  Catches "
    "doc-inside-doc duplication (quoted reposts, boilerplate-wrapped "
    "copies) that symmetric Jaccard structurally misses; the oracle "
    "is the brute-force all-ordered-pairs join, so a hash match "
    "proves the posting-list pruning (one-sided size filter "
    "|B| >= t|A|) lossless",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_join

    # spread (round-12): same scan-parallelism rationale as the
    # Jaccard threshold join above
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return containment_join(
        docs, id_col="doc_id", text_col="text", threshold=0.8,
        max_shingle_df=1000,
    ).orderBy("id_a", "id_b")
