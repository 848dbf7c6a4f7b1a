"""Pandas-UDF / mapInPandas query surface (SURVEY.md §2.10 + multimodal
north star).  ``sim_cosine_topk_pandas`` shares the exact oracle of the
JVM higher-order-function path — the two implementations must agree to
the last rounded digit, which pins the Arrow crossing's correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector_udfs import (
    label_centroids,
    mean_vector_norm,
    pairwise_cosine,
)
from ..sources.multimodal import (
    attach_fake_media,
    attach_png_media,
    decode_media_features,
    decode_real_media,
)
from ..tables import load_table
from . import register


@register(
    "sim_cosine_topk_pandas",
    oracle="""
SELECT query_id, vec_id, sim
FROM (
  SELECT q.vec_id AS query_id, v.vec_id,
         round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS sim
  FROM embeddings v
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id IN (0, 1, 2)) q
)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= 10
""",
    doc="§2.10 scalar pandas_udf (Arrow-batched numpy matmul) — must equal "
    "the JVM HOF implementation sim_cosine_topk exactly",
)
def sim_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Arrow path mirroring ``cosine_topk_bruteforce``: one
    scan of the fact table crossJoined with the broadcast query set,
    one two-column pandas_udf scoring each (vector, query) row.  No
    driver-side collect, no per-query union — round 1's version looped
    queries on the driver, growing the plan O(Q) and re-scanning the
    fact table per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    scored = emb.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.round(
            pairwise_cosine(F.col("embedding"), F.col("query_vec")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "sim_label_centroids",
    oracle="""
SELECT label, count(*) AS n,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS centroid_0,
       round(avg(CAST(embedding[64] AS DOUBLE)), 6) AS centroid_63
FROM embeddings
GROUP BY label
""",
    doc="§2.10 grouped-map applyInPandas: per-label embedding centroid. "
    "Exact math (per-dim float64 mean of float32 inputs), so the Arrow "
    "path sits under the oracle gate: DuckDB recomputes each projected "
    "dimension as avg(embedding[d]) and both engines round to 6dp, "
    "absorbing summation-order drift",
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb).select(
        "label",
        "n",
        F.round(F.element_at("centroid", 1), 6).alias("centroid_0"),
        F.round(F.element_at("centroid", 64), 6).alias("centroid_63"),
    )


@register(
    "udaf_label_norm_mean",
    oracle="""
SELECT label,
       count(*) AS n,
       round(avg(round(sqrt(list_sum(list_transform(
             CAST(embedding AS DOUBLE[]), x -> x*x))), 6)), 4) AS mean_norm
FROM embeddings
GROUP BY label
""",
    doc="§2.10 grouped-AGG pandas_udf (Series -> scalar, numpy batch "
    "reduction per group) — completes the UDF matrix alongside scalar "
    "pandas_udf, grouped-map applyInPandas, mapInPandas, and UDTF; "
    "oracle recomputes the mean embedding norm exactly in SQL",
)
def udaf_label_norm_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT): compute the count in its own tiny
    # aggregation and join on the group key
    norms = emb.groupBy("label").agg(
        F.round(mean_vector_norm("embedding"), 4).alias("mean_norm")
    )
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return norms.join(counts, "label").select("label", "n", "mean_norm")


@register(
    "mm_decode_features",
    oracle="""
SELECT doc_id,
       'image/fake' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
       CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height,
       CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
            % 1000003 AS BIGINT) AS byte_sum_mod
FROM documents
""",
    doc="multimodal plumbing: binary payload column -> mapInPandas decode "
    "stub -> typed features; oracle recomputes the deterministic fake "
    "features from the source text",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_features(attach_fake_media(docs))


@register(
    "mm_decode_png_features",
    oracle="""
WITH src AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         list_transform(string_split(text, ''), c -> ascii(c)) AS byte_vals
  FROM documents
)
SELECT doc_id,
       CAST(n % 16 + 1 AS INTEGER) AS width,
       CAST(n % 8 + 1 AS INTEGER) AS height,
       CAST(CASE WHEN n = 0 THEN 0
            ELSE list_sum(list_transform(range(0, (n % 16 + 1) * (n % 8 + 1)),
                                         i -> byte_vals[(i % n) + 1]))
       END AS BIGINT) AS pixel_sum
FROM src
""",
    doc="REAL media decode under the oracle gate: each document's text is "
    "encoded into a genuine grayscale PNG (stdlib zlib/struct writer), "
    "decoded back by the engine's own chunk-parse + inflate + unfilter "
    "decoder via mapInPandas, and DuckDB recomputes the expected "
    "dimensions and pixel sum directly from the source text — the decode "
    "path, not a fake, is what must round-trip",
)
def mm_decode_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_real_media(attach_png_media(docs)).select(
        "doc_id", "width", "height", "pixel_sum"
    )


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(j AS INTEGER) AS frame_idx,
       md5(substr(text, CAST(j * 32 + 1 AS INTEGER), 32)) AS frame_md5
FROM (SELECT doc_id, text, unnest(range(0, length(text) // 32, 4)) AS j
      FROM documents)
""",
    doc="multimodal frame sampling (the video-pipeline shape): binary "
    "payload -> mapInPandas chop into 32-byte frames -> keep every 4th "
    "-> one row per sampled frame with its md5.  The corpus is ASCII so "
    "DuckDB reproduces each frame's hash from substr(text, ...); a real "
    "pipeline swaps the chop for an ffmpeg keyframe extract behind the "
    "same seam (sources/multimodal.py:sample_frames)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_fake_media(docs))


@register(
    "udtf_sentence_stats",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '[.!?]\\s+'),
                       s -> len(s) > 0)) AS n_sentences
FROM documents
ORDER BY doc_id
""",
    doc="U3 Python UDTF under the oracle gate: LATERAL split_sentences "
    "(one doc in, one row per sentence out) aggregated back to a "
    "per-doc sentence count.  DuckDB's RE2 has no lookbehind, so the "
    "oracle counts boundary matches ('[.!?]\\s+' consumes one "
    "delimiter run exactly where the UDTF's '(?<=[.!?])\\s+' splits) "
    "— same cardinality, which is precisely what a UDTF contributes "
    "over a scalar UDF.  Span contents are pinned engine-side by "
    "test_udtf_sentence_splitter",
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udtf_ops import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, count(*) AS n_sentences
        FROM __udtf_docs d, LATERAL split_sentences(d.text) s
        GROUP BY d.doc_id
        ORDER BY d.doc_id
        """
    )


@register(
    "udaf_source_stats_arrow",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 4) AS mean_chars,
       round(stddev_samp(n_chars), 4) AS sd_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source ORDER BY source
""",
    doc="grouped Arrow-native compute via applyInArrow (Spark 4): the "
    "group's rows arrive as a pyarrow.Table, stats run in Arrow "
    "compute kernels, and no pandas object is ever materialized on "
    "either side of the serialization fence — the lowest-overhead "
    "grouped-Python path, completing the API matrix next to "
    "pandas_udf / applyInPandas / mapInPandas / grouped-agg / UDTF.  "
    "Stats chosen to be JVM-expressible ON PURPOSE: the plain-SQL "
    "oracle pins the Arrow path's wiring (grouping, schema mapping, "
    "null handling) rather than novel math",
)
def udaf_source_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector_udfs import source_stats_arrow

    docs = load_table(spark, sf_dir, "documents")
    return source_stats_arrow(docs.select("source", "n_chars")).orderBy(
        "source"
    )


@register(
    "udf_arrow_map_doc_stats",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_pieces
FROM documents ORDER BY doc_id
""",
    doc="mapInArrow coverage — the last Python-surface API next to "
    "pandas_udf / applyInPandas / mapInPandas / grouped-agg / "
    "applyInArrow / UDTF: per-batch Arrow-native doc stats via "
    "pyarrow.compute kernels (utf8_length, split_pattern) with zero "
    "pandas materialization — the leanest Python path Spark offers "
    "(Arrow RecordBatch in, RecordBatch out, no index/dtype "
    "conversion).  Single-space split keeps empty pieces on both "
    "engines, so the counts hash-match exactly",
)
def udf_arrow_map_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(
                            pc.split_pattern(text, pattern=" ")
                        ),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_chars", "n_pieces"],
            )

    return docs.mapInArrow(
        stats, "doc_id long, n_chars long, n_pieces long"
    ).orderBy("doc_id")
