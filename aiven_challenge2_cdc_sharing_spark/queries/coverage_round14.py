"""Round-11 coverage batch: tokenizer-apply throughput, IVF serving,
int8 quantization audit, and RAG chunk materialization.

Four ops a 100 TB training/serving platform runs that the registry did
not yet cover, per the round-10 verdict's candidate list:

- the TRAINED tokenizer applied at document grain and rolled into the
  packing budget a batch builder consumes (text_bpe_token_budget_bins
  — the throughput-shaped sibling of text_bpe_encode_compression's
  per-source stats);
- IVF serving with a real probe BATCH (sim_ivf_serving_batch — 20
  probes at sf0.01, 80 at sf0.1's 2000 vectors, capped at 512 at any
  scale — the amortized-index question, with bench.py's
  ``bench_ivf_build_only`` twin isolating build cost so SCALING.md
  can report per-probe serving cost);
- per-vector symmetric int8 quantization error (the
  serving-quantization go/no-go audit: reconstruction RMSE, worst
  element error, cosine fidelity — all deterministic closed-form, no RNG);
- sliding-window RAG chunking (W=64 tokens, stride 48) materialized
  and audited per source (chunk counts, storage amplification — the
  fan-out is the operator; the rollup keeps the output bounded).

Same conventions as every coverage module: each Spark query is paired
with a hand-written DuckDB oracle over the same parquet, aggregates
aliased identically on both sides, doubles rounded so summation order
can't flip the last bit, and every output carries a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


# ------------------------------------------------------------------
# Tokenizer-apply throughput: trained BPE at doc grain -> packing bins
# ------------------------------------------------------------------

_BIN = 512  # packing bin size in BPE tokens (256-token ctx x2, small
# enough that even the sf0.01 check corpus fills several bins/source)


def _bpe_budget_oracle(n_merges: int = 6, bin_tokens: int = _BIN) -> str:
    from ..operators.bpe import bpe_apply_ctes

    return (
        bpe_apply_ctes(n_merges, "source, doc_id")
        + f""",
per_doc AS (
  SELECT o.source, o.doc_id, sum(e.n_tok) AS doc_tokens
  FROM occ o JOIN enc e USING (w)
  GROUP BY o.source, o.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_tokens) AS BIGINT) AS bpe_tokens,
       CAST(max(doc_tokens) AS BIGINT) AS max_doc_tokens,
       round(median(doc_tokens), 2) + 0.0 AS median_doc_tokens,
       CAST(ceil(sum(doc_tokens) / {bin_tokens}.0) AS BIGINT) AS bins,
       round(sum(doc_tokens)
             / (ceil(sum(doc_tokens) / {bin_tokens}.0) * {bin_tokens}.0),
             6) AS fill_rate
FROM per_doc
GROUP BY source ORDER BY source"""
    )


@register(
    "text_bpe_token_budget_bins",
    oracle=_bpe_budget_oracle(),
    doc="tokenizer-apply THROUGHPUT at document grain (round-10 verdict "
    "task 6 candidate): the 6 trained BPE merges encode the full "
    "occurrence stream, per-doc token counts roll into the per-source "
    "packing budget a concat-then-chunk batch builder consumes — bins "
    f"of {_BIN} BPE tokens, fill rate, doc-size median/max.  Encoding "
    "stays once-per-DISTINCT-word (K string replaces over the "
    "vocabulary, broadcast back to occurrences, the "
    "text_bpe_encode_compression discipline); the doc-grain rollup "
    "adds one map-side-combinable groupBy.  Concat-then-chunk bin "
    "count is ceil(total/B) — pure arithmetic on the per-source sum, "
    "NO global window (the packing ordinal a naive implementation "
    "would sort for).  Oracle replays train+apply via the unrolled "
    "CTE chain (operators/bpe._bpe_cte_chain) plus the same doc-grain "
    "rollup.  Ref parity anchor: reference has no tokenizer; this is "
    "north-star LLM-pipeline surface (SURVEY.md NS-3).",
)
def text_bpe_token_budget_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.bpe import bpe_encoded_vocab, bpe_word_occurrences

    # spread (round-12): vocab train pass + occurrence explode are
    # CPU-bound map work over a single-row-group scan
    docs = load_table(spark, sf_dir, "documents", spread=True)
    enc = bpe_encoded_vocab(docs, "text", 6)
    occ = bpe_word_occurrences(docs, "text", "source", "doc_id")
    per_doc = (
        occ.join(F.broadcast(enc), "w")
        .groupBy("source", "doc_id")
        .agg(F.sum("n_tok").alias("doc_tokens"))
    )
    total = F.sum("doc_tokens")
    bins = F.ceil(total / F.lit(float(_BIN)))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            total.cast("long").alias("bpe_tokens"),
            F.max("doc_tokens").cast("long").alias("max_doc_tokens"),
            (F.round(F.expr("percentile(doc_tokens, 0.5)"), 2) + 0.0).alias(
                "median_doc_tokens"
            ),
            bins.cast("long").alias("bins"),
            F.round(total / (bins * F.lit(float(_BIN))), 6).alias(
                "fill_rate"
            ),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# IVF serving batch: one deterministic index, a real probe batch
# ------------------------------------------------------------------


def _ivf_serving_oracle() -> str:
    from .llm_ops import _ivf_assign_cte, _ivf_update_cte

    return f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cid, e AS cvec
  FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT 16)
),
a1 AS {_ivf_assign_cte("vecs", "c0")},
c1 AS {_ivf_update_cte("a1")},
a2 AS {_ivf_assign_cte("vecs", "c1")},
c2 AS {_ivf_update_cte("a2")},
a3 AS {_ivf_assign_cte("vecs", "c2")},
qp AS (
  SELECT query_id, qe, cid AS cluster FROM (
    SELECT q.vec_id AS query_id, q.e AS qe, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.e, c.cvec) DESC, c.cid) AS rn
    FROM vecs q CROSS JOIN c2 c
    WHERE q.vec_id % 25 = 0 AND q.vec_id < 12800) WHERE rn <= 2
)
SELECT query_id, vec_id, sim FROM (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(a.e, p.qe), 6) AS sim
  FROM qp p JOIN a3 a ON a.cluster = p.cluster)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
        <= 5
"""


@register(
    "sim_ivf_serving_batch",
    oracle=_ivf_serving_oracle(),
    doc="IVF SERVING shape (round-10 verdict task 6 candidate): the "
    "same deterministic 16-list index as sim_cosine_topk_ivf (init = "
    "first 16 ids, 2 Lloyd iterations), but probed by a real serving "
    "BATCH — every 25th vector id below 12800, i.e. AT MOST 512 "
    "probes at ANY scale (serving batches are bounded by the caller, "
    "never by corpus size — the literal cap is what makes the probe "
    "broadcast legitimate at 100 TB; 20 probes at sf0.01) at "
    "n_probe=2, k=5.  Substantiates the SCALING.md amortization claim "
    "with a driver-gated row: index cost is paid once per BUILD while "
    "probe cost scales with the batch; bench.py's "
    "``bench_ivf_build_only`` twin isolates the build so "
    "(this - build)/n_probes is the measured per-probe serving cost.  "
    "Oracle replays the entire build + batch probe via the unrolled "
    "Lloyd CTE pairs (llm_ops._ivf_assign_cte/_ivf_update_cte).",
)
def sim_ivf_serving_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_ivf

    # spread (round-12): assignment/scoring are CPU-bound map passes
    # over a single-row-group scan — no-op when the scan has splits
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 12800)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return cosine_topk_ivf(
        emb.select("vec_id", "embedding"),
        queries,
        k=5,
        n_lists=16,
        n_probe=2,
    )


def _ivf_build_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench twin (not registered): JUST the deterministic 16-list
    index build sim_ivf_serving_batch / sim_cosine_topk_ivf share, so
    the suite records build cost separately and SCALING.md can report
    amortized per-probe serving cost as
    (t(sim_ivf_serving_batch) - t(bench_ivf_build_only)) / n_probes."""
    from ..operators.similarity import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return train_ivf_centroids(emb.select("vec_id", "embedding"), 16)


# ------------------------------------------------------------------
# Int8 quantization audit: symmetric per-vector scale, closed form
# ------------------------------------------------------------------


@register(
    "emb_int8_quantization_error",
    oracle="""
WITH q AS (
  SELECT label,
         list_max(list_transform(e, x -> abs(x))) AS mx,
         list_transform(e, x ->
           floor(x * 127.0 / list_max(list_transform(e, y -> abs(y)))
                 + 0.5)
           * list_max(list_transform(e, y -> abs(y))) / 127.0) AS d,
         e
  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
  WHERE list_max(list_transform(e, x -> abs(x))) > 0
),
per_vec AS (
  SELECT label,
         round(sqrt(list_sum(list_transform(range(1, len(e) + 1),
                i -> (e[i] - d[i]) * (e[i] - d[i]))) / len(e)), 6) AS rmse,
         list_max(list_transform(range(1, len(e) + 1),
                i -> abs(e[i] - d[i]))) AS max_err,
         round(list_cosine_similarity(e, d), 6) AS cosim
  FROM q
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(rmse), 5) + 0.0 AS avg_rmse,
       round(max(max_err), 6) + 0.0 AS worst_abs_err,
       round(avg(cosim), 5) + 0.0 AS avg_cosine
FROM per_vec
GROUP BY label ORDER BY label
""",
    doc="serving-quantization go/no-go audit: symmetric per-vector "
    "int8 quantization (scale = max|x|/127, level = floor(x/scale + "
    "0.5) — floor(+0.5) instead of round() because Spark F.round is "
    "shortest-repr HALF_UP while DuckDB round is binary-scaled, and "
    "floor is bit-identical in both) with reconstruction RMSE, worst "
    "element error, and cosine similarity per label.  One scan, all "
    "HOF "
    "lambda expressions JVM-side, no shuffle before the 10-row label "
    "rollup — the shape survives any SF.  Per-vector cosine rounded "
    "6dp before the group avg (rounded 5dp) so cross-engine summation "
    "order can't flip the last digit.",
)
def emb_int8_quantization_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    )
    mx = F.array_max(F.transform("e", lambda x: F.abs(x)))
    emb = emb.withColumn("mx", mx).filter(F.col("mx") > 0)
    # dequantized vector: quantize each element at scale mx/127, then
    # reconstruct — floor(x*127/mx + 0.5) * mx/127
    d = F.transform(
        "e",
        lambda x: F.floor(x * F.lit(127.0) / F.col("mx") + F.lit(0.5))
        * F.col("mx")
        / F.lit(127.0),
    )
    emb = emb.withColumn("d", d)
    diff_sq = F.aggregate(
        F.zip_with("e", "d", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    dot_ed = F.aggregate(
        F.zip_with("e", "d", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
    )
    per_vec = emb.select(
        "label",
        F.round(F.sqrt(diff_sq / F.size("e")), 6).alias("rmse"),
        F.array_max(
            F.zip_with("e", "d", lambda a, b: F.abs(a - b))
        ).alias("max_err"),
        F.round(dot_ed / (nrm(F.col("e")) * nrm(F.col("d"))), 6).alias(
            "cosim"
        ),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (F.round(F.avg("rmse"), 5) + 0.0).alias("avg_rmse"),
            (F.round(F.max("max_err"), 6) + 0.0).alias("worst_abs_err"),
            (F.round(F.avg("cosim"), 5) + 0.0).alias("avg_cosine"),
        )
        .orderBy("label")
    )


# ------------------------------------------------------------------
# RAG chunking: sliding windows materialized, amplification audited
# ------------------------------------------------------------------

_CHUNK_W = 64
_CHUNK_S = 48


@register(
    "text_chunk_sliding_windows",
    oracle=f"""
WITH base AS (
  SELECT source, doc_id,
         len(string_split_regex(lower(trim(text)), '\\s+')) AS n
  FROM documents
),
chunks AS (
  SELECT source, doc_id, s,
         least({_CHUNK_W}, n - s + 1) AS chunk_len
  FROM base, unnest(range(1, n + 1, {_CHUNK_S})) AS t(s)
),
corpus AS (SELECT source, sum(n) AS corpus_tokens FROM base GROUP BY source),
agg AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(*) FILTER (WHERE chunk_len = {_CHUNK_W}) AS BIGINT)
           AS full_chunks,
         round(sum(chunk_len) * 1.0 / count(*), 6) AS avg_chunk_tokens,
         sum(chunk_len) AS ct
  FROM chunks GROUP BY source
)
SELECT source, n_docs, n_chunks, full_chunks, avg_chunk_tokens,
       round(ct * 1.0 / corpus_tokens, 6) AS amplification
FROM agg JOIN corpus USING (source)
ORDER BY source
""",
    doc=f"RAG chunk materialization: sliding windows of {_CHUNK_W} "
    f"whitespace tokens at stride {_CHUNK_S} (chunk starts 1, "
    f"1+{_CHUNK_S}, ... <= n_tokens — Spark sequence(1, n, s) == "
    "DuckDB range(1, n+1, s)), rolled into the per-source audit a "
    "chunking pipeline publishes: chunk counts, full-vs-ragged split, "
    "and storage AMPLIFICATION (chunk tokens / corpus tokens — the "
    "cost of overlap, exact integer sums so the ratio is "
    "order-independent).  The explode is the operator: fan-out "
    "~n_tokens/stride per doc, combined map-side before the 20-row "
    "source rollup; no window, no join, survives any SF.",
)
def text_chunk_sliding_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        # NULL text would make size(split(NULL)) illegal sequence
        # bounds on the Spark side while the oracle's unnest(range)
        # just emits no rows — filter so both degrade identically
        # (no NULL text exists at any current SF; latent-only guard)
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            "doc_id",
            F.size(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("n"),
        )
    )
    chunks = docs.select(
        "source",
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(_CHUNK_S))
        ).alias("s"),
    ).select(
        "source",
        "doc_id",
        "n",
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("s") + 1).alias(
            "chunk_len"
        ),
    )
    corpus = docs.groupBy("source").agg(F.sum("n").alias("corpus_tokens"))
    return (
        chunks.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count(F.when(F.col("chunk_len") == _CHUNK_W, 1))
            .cast("long")
            .alias("full_chunks"),
            F.round(
                F.sum("chunk_len") / F.count(F.lit(1)), 6
            ).alias("avg_chunk_tokens"),
            F.sum("chunk_len").alias("__chunk_tokens"),
        )
        .join(F.broadcast(corpus), "source")
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "full_chunks",
            "avg_chunk_tokens",
            F.round(
                F.col("__chunk_tokens") / F.col("corpus_tokens"), 6
            ).alias("amplification"),
        )
        .orderBy("source")
    )
