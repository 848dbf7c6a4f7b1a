"""Training-data pipeline queries: reproducible train/eval splits,
per-source mixture sampling, and concat-then-chunk sequence packing —
the operations between "deduped corpus" and "tokenizer input" in an
LLM data pipeline, each with an exact DuckDB oracle twin.

All three are pure per-row expressions or single-key window scans:
no Python UDFs, no driver collects, nothing that changes shape at
100 TB (the split/mixture hash is embarrassingly parallel; packing
shuffles once on the source key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.sampling import duck_hash_bucket, mixture_keep, split_assign
from ..tables import load_table
from . import register

_EVAL_FRACTION = 0.1

# Mixture weights: up/down-sample sources into the training blend the
# way web/books/code corpora are re-weighted for pretraining runs.
_MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 0.6


@register(
    "ml_split_train_eval",
    oracle=f"""
SELECT doc_id, source,
       {duck_hash_bucket("doc_id", "split")} AS bucket,
       CASE WHEN {duck_hash_bucket("doc_id", "split")} < {int(_EVAL_FRACTION * 65536)}
            THEN 'eval' ELSE 'train' END AS split
FROM documents
""",
    doc="reproducible train/eval split by content hash: "
    "md5('split:'||doc_id) bucket < 10%% of 2^16 -> eval.  Stable "
    "across engines, partitionings, and re-runs — unlike seeded "
    "sample(), the same document lands in the same split everywhere",
)
def ml_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        hash_bucket(F.col("doc_id"), "split").alias("bucket"),
        split_assign(F.col("doc_id"), "split", _EVAL_FRACTION).alias("split"),
    )


def _mix_rate_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES.items()
    )
    return f"(CASE {whens} ELSE {_MIX_DEFAULT} END)"


@register(
    "ml_mixture_sample",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {duck_hash_bucket("doc_id", "mix")}
      < CAST({_mix_rate_sql()} * 65536 AS INTEGER)
ORDER BY source, doc_id
""",
    doc="deterministic data-mixture sampling: per-source keep rates "
    "(src0 100%%, src1 75%%, src2 50%%, src3 25%%, rest 60%%) applied "
    "via an independent content-hash band in ONE scan — the "
    "re-weighting step that turns a raw corpus into a training blend, "
    "with byte-stable membership",
)
def ml_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(r)) for s, r in _MIX_RATES.items()
        ],
        F.lit(_MIX_DEFAULT),
    )
    return (
        docs.filter(mixture_keep(F.col("doc_id"), rate, "mix"))
        .select("doc_id", "source", "n_chars")
        .orderBy("source", "doc_id")
    )


@register(
    "ml_pack_sequences",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
), offs AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_off
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(floor(start_off / 512) AS INTEGER) AS seq_id,
       CASE WHEN floor(start_off / 512)
              <> floor((start_off + n_tokens - 1) / 512)
            THEN TRUE ELSE FALSE END AS spans_boundary
FROM offs
ORDER BY source, doc_id
""",
    doc="concat-then-chunk sequence packing: documents are concatenated "
    "per source in deterministic doc_id order and cut into 512-token "
    "training windows; each doc reports its window id (by start "
    "offset) and whether it straddles a cut.  The exclusive prefix "
    "sum is one window scan per source key — the exact packing "
    "semantics of pretraining dataloaders, derivable as metadata "
    "without materializing the concatenation",
)
def ml_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    budget = 512
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off")
    return (
        docs.select("doc_id", "source", "n_tokens", start)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(F.col("start_off") / budget).cast("int").alias("seq_id"),
            (
                F.floor(F.col("start_off") / budget)
                != F.floor((F.col("start_off") + F.col("n_tokens") - 1) / budget)
            ).alias("spans_boundary"),
        )
        .orderBy("source", "doc_id")
    )


@register(
    "emb_standardize_dims",
    oracle="""
WITH flat AS (
  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS v
  FROM embeddings, range(1, 65) t(i)
),
stats AS (
  SELECT pos, avg(v) AS mu, stddev_pop(v) AS sd FROM flat GROUP BY pos
),
z AS (
  SELECT f.vec_id, f.pos,
         round((f.v - s.mu) / CASE WHEN s.sd = 0 THEN 1 ELSE s.sd END, 6) AS zv
  FROM flat f JOIN stats s USING (pos)
)
SELECT vec_id,
       round(list_min(list(zv ORDER BY pos)), 6) AS z_min,
       round(list_max(list(zv ORDER BY pos)), 6) AS z_max,
       round(list_sum(list(zv ORDER BY pos)), 4) AS z_sum
FROM z GROUP BY vec_id ORDER BY vec_id
""",
    doc="feature standardization (the ML-preprocessing pass): "
    "per-DIMENSION mean/stddev over the corpus (posexplode -> "
    "per-(dim) aggregate — shuffles scalars, never vectors), z-score "
    "each component, reassemble in dimension order.  Zero-variance "
    "dims divide by 1 (the sklearn StandardScaler convention).  "
    "Summarized per vector (min/max/sum of z) so the oracle compares "
    "64-dim results without 64 columns",
)
def emb_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    flat = emb.select(
        "vec_id", F.posexplode("e").alias("pos0", "v")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "v")
    stats = flat.groupBy("pos").agg(
        F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd")
    )
    z = flat.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "pos",
        F.round(
            (F.col("v") - F.col("mu"))
            / F.when(F.col("sd") == 0, F.lit(1.0)).otherwise(F.col("sd")),
            6,
        ).alias("zv"),
    )
    return (
        z.groupBy("vec_id")
        .agg(
            F.round(F.min("zv"), 6).alias("z_min"),
            F.round(F.max("zv"), 6).alias("z_max"),
            F.round(F.sum("zv"), 4).alias("z_sum"),
        )
        .orderBy("vec_id")
    )


def _cluster_safe_split_oracle() -> str:
    # llm_ops is always imported before this module by load_registry
    # (alphabetical) and has no back-import, so this is cycle-free
    from .llm_ops import _MD5_PAIRS_CTES

    bucket = duck_hash_bucket("coalesce(c.component, d.doc_id)", "csplit")
    return f"""
WITH RECURSIVE {_MD5_PAIRS_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand_pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM cand_pairs
),
reach(node, r) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT e.src, w.r FROM edges e JOIN reach w ON e.dst = w.node
  WHERE w.r <> e.src
),
comp AS (
  SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       CASE WHEN {bucket} < {int(0.1 * 65536)}
            THEN 'eval' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
ORDER BY d.doc_id
"""


@register(
    "ml_cluster_safe_split",
    oracle=_cluster_safe_split_oracle(),
    doc="leakage-safe train/eval split: hash-split on the near-dup "
    "CLUSTER id, not the doc id — a naive per-doc split puts "
    "near-identical documents on both sides of the split (silent "
    "eval contamination); splitting the cluster keeps every near-dup "
    "set wholly in one partition.  Composes dedup_cluster_resolution "
    "(exact CC over capped LSH pairs) with the deterministic "
    "hash-bucket splitter; the oracle recomputes BOTH (recursive-CTE "
    "CC + md5 bucket) so the leakage-safety property itself is "
    "hash-verified",
)
def ml_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import dedup_clusters
    from ..operators.sampling import split_assign
    from .llm_ops import dedup_minhash_md5_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_md5_pairs(spark, sf_dir)
    clusters = dedup_clusters(docs, pairs)
    return clusters.select(
        "doc_id",
        "cluster_id",
        split_assign(F.col("cluster_id"), "csplit", 0.1).alias("split"),
    ).orderBy("doc_id")
