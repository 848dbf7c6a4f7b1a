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
SELECT vec_id, qvec, round(scale, 6) AS scale_r,
       round(sqrt(list_sum(list_transform(
               list_zip(embedding, qvec),
               p -> pow(p[1] - p[2] / scale, 2)
             )) / len(embedding)), 6) AS rmse
FROM q
""",
    doc="Max-abs int8 scalar quantization of the embedding column "
    "(faiss-SQ8 shape): per-vector scale, int codes, reconstruction "
    "RMSE — all JVM higher-order functions, floor(x+0.5) rounding on "
    "both engines",
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
        "qvec",
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
