"""Round-12 coverage batch: CDC-maintained IVF index churn and
held-out tokenizer fertility/OOV audit.

Two ops the round-11 verdict named as the next serving-platform
surface the registry did not yet cover:

- ``cdc_ivf_list_churn`` ties the engine's two halves together: a CDC
  batch of embedding upserts/deletes is MERGEd with the real
  ``apply_changes`` machinery, then the IVF index is maintained
  INCREMENTALLY — only the changed vectors are re-assigned against
  the frozen coarse quantizer — and the query emits the per-list
  freshness audit a serving fleet reads before deciding to rebuild
  (list sizes before/after, departures, arrivals, reassignment
  stay-rate).  Maintenance DISTANCE work is O(|batch| * k); the MERGE
  and index anti-join are O(N) scan-only passes with no distance
  math (partition-prunable to the touched lists in a real store) —
  what maintenance avoids is the O(N * k * (iters+1)) re-cluster.
  Measured at N=2M, k=256 (SCALING.md round 12): rebuild min 10.4 s
  vs maintenance min 2.7 s, maintenance flat across a 1000x batch-
  size sweep — at k=16 both sit on the scan floor and the MERGE
  itself dominates, so the win GROWS with nlist.  The dataflow
  (anti-join + delta assign + union) is the incremental index update
  a 100 TB store runs.
- ``text_bpe_fertility_oov`` is the tokenizer-evaluation loop: merges
  trained on HALF the corpus (doc_id parity split), applied to the
  HELD-OUT half, reporting per-source fertility (BPE tokens per
  word), novel-word rate, fully-unmerged ("cold") occurrence rate,
  and chars-per-token — the go/no-go numbers a tokenizer ships with.

Same conventions as every coverage module: hand-written DuckDB
oracles over the same parquet, identical aliases both sides, doubles
rounded so summation order can't flip the last digit, total output
order.  Ref parity anchor: the reference (a 278-line CDC relay,
consumer_to_opensearch.py) has neither vector indexes nor tokenizers;
both ops are north-star LLM-pipeline surface (SURVEY.md NS-2/NS-3)
composed with its CDC semantics (S7 MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


# ------------------------------------------------------------------
# CDC-maintained IVF index: per-list churn audit
# ------------------------------------------------------------------

_N_LISTS = 16


def _ivf_churn_oracle() -> str:
    from .llm_ops import _ivf_assign_cte, _ivf_update_cte

    return f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cid, e AS cvec
  FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {_N_LISTS})
),
a1 AS {_ivf_assign_cte("vecs", "c0")},
c1 AS {_ivf_update_cte("a1")},
a2 AS {_ivf_assign_cte("vecs", "c1")},
c2 AS {_ivf_update_cte("a2")},
a3 AS {_ivf_assign_cte("vecs", "c2")},
dels AS (SELECT vec_id FROM vecs WHERE vec_id % 11 = 3),
ups AS (
  SELECT vec_id, list_transform(e, x -> x * 0.9 + 0.05) AS e
  FROM vecs WHERE vec_id % 7 = 0 AND vec_id % 11 != 3
),
ua AS {_ivf_assign_cte("ups", "c2")},
mv AS (
  SELECT u.vec_id, o.cluster AS old_c, u.cluster AS new_c
  FROM ua u JOIN a3 o USING (vec_id)
),
base AS (SELECT cluster, count(*) AS n_base FROM a3 GROUP BY cluster),
delc AS (
  SELECT a.cluster, count(*) AS n_del
  FROM a3 a JOIN dels d USING (vec_id) GROUP BY a.cluster
),
upc AS (
  SELECT old_c AS cluster, count(*) AS n_up,
         sum(CASE WHEN new_c <> old_c THEN 1 ELSE 0 END) AS n_out
  FROM mv GROUP BY old_c
),
inc AS (
  SELECT new_c AS cluster,
         sum(CASE WHEN new_c <> old_c THEN 1 ELSE 0 END) AS n_in
  FROM mv GROUP BY new_c
)
SELECT c.cid AS cluster,
       CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
       CAST(coalesce(d.n_del, 0) AS BIGINT) AS n_del,
       CAST(coalesce(u.n_up, 0) AS BIGINT) AS n_up,
       CAST(coalesce(u.n_out, 0) AS BIGINT) AS n_out,
       CAST(coalesce(i.n_in, 0) AS BIGINT) AS n_in,
       CAST(coalesce(b.n_base, 0) - coalesce(d.n_del, 0)
            - coalesce(u.n_out, 0) + coalesce(i.n_in, 0) AS BIGINT)
         AS n_after,
       CASE WHEN coalesce(u.n_up, 0) > 0
            THEN round((u.n_up - u.n_out) * 1.0 / u.n_up, 6)
            ELSE 0.0 END AS stay_rate
FROM c2 c
LEFT JOIN base b ON b.cluster = c.cid
LEFT JOIN delc d ON d.cluster = c.cid
LEFT JOIN upc u ON u.cluster = c.cid
LEFT JOIN inc i ON i.cluster = c.cid
ORDER BY cluster
"""


@register(
    "cdc_ivf_list_churn",
    oracle=_ivf_churn_oracle(),
    doc="incremental IVF maintenance under CDC upserts (round-11 "
    "verdict task 5 first candidate): a deterministic CDC batch "
    "(deletes: vec_id%11=3; upserts: vec_id%7=0 with a fixed drift "
    "x*0.9+0.05) is MERGEd via the real apply_changes machinery "
    "(cdc/materialize.py:69 — WHEN MATCHED DELETE/UPDATE semantics), "
    "then the frozen 16-list coarse quantizer (same deterministic "
    "build as sim_cosine_topk_ivf) re-assigns ONLY the post-merge "
    "changed vectors — a broadcast 16-centroid argmax over |batch| "
    "rows, never a corpus re-CLUSTER (the MERGE and anti-join are "
    "O(N) scan-only passes, no distance math; measured vs rebuild "
    "in SCALING.md round 12).  The maintained index is "
    "(base-assignment ANTI-JOIN batch keys) UNION (delta "
    "assignment); the audit reports per-list size before/after, "
    "deletes, upsert departures/arrivals, and the stay-rate a "
    "serving fleet thresholds to schedule re-clustering.  n_after "
    "comes from COUNTING the maintained index, so the oracle's "
    "arithmetic identity (base - del - out + in) cross-checks the "
    "dataflow.  Oracle replays build + both assignments via the "
    "unrolled Lloyd CTE pairs (llm_ops._ivf_assign_cte).",
)
def cdc_ivf_list_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cdc.materialize import apply_changes
    from ..operators.similarity import _assign, train_ivf_centroids

    # spread (round-12): the base assignment + MERGE feed off a
    # single-row-group scan; assignment is CPU-bound map work
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # frozen coarse quantizer, consumed by the base and delta assigns
    cents = train_ivf_centroids(emb, _N_LISTS).localCheckpoint(eager=False)
    # the base assignment IS the persisted index: checkpoint it once —
    # four consumers (base counts, delete counts, move join, anti-join
    # survivor leg) would otherwise each replay the full Lloyd chain
    a3 = (
        _assign(emb, cents, "embedding", "cluster", _N_LISTS)
        .select("vec_id", "cluster")
        .localCheckpoint(eager=False)
    )

    dels = emb.filter(F.col("vec_id") % 11 == 3).select(
        "vec_id",
        F.lit(None).cast("array<double>").alias("embedding"),
        F.lit(True).alias("__deleted"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.lit(0).cast("long").alias("seq"),
    )
    ups = emb.filter(
        (F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 11 != 3)
    ).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x * F.lit(0.9) + F.lit(0.05)
        ).alias("embedding"),
        F.lit(False).alias("__deleted"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.lit(1).cast("long").alias("seq"),
    )
    batch = dels.unionByName(ups)
    state1 = apply_changes(
        emb, batch, key_cols=("vec_id",), order_cols=("ts_ms", "seq")
    )

    # incremental maintenance: re-assign ONLY the changed vectors
    # (post-merge state joined to the upsert keys), broadcast
    # 16-centroid argmax — O(|batch| * k) distance work
    changed = state1.join(
        ups.select("vec_id"), "vec_id"
    ).select("vec_id", "embedding")
    ua = _assign(changed, cents, "embedding", "new_cluster", _N_LISTS).select(
        "vec_id", "new_cluster"
    )
    # |batch|-sized move table, consumed by the departure and arrival
    # rollups — checkpoint so the delta assign runs once
    mv = (
        ua.join(a3.withColumnRenamed("cluster", "old_c"), "vec_id")
        .select("vec_id", "old_c", F.col("new_cluster").alias("new_c"))
        .localCheckpoint(eager=False)
    )
    index1 = a3.join(
        batch.select("vec_id"), "vec_id", "left_anti"
    ).unionByName(ua.withColumnRenamed("new_cluster", "cluster"))

    base = a3.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_base"))
    delc = (
        a3.join(dels.select("vec_id"), "vec_id")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_del"))
    )
    upc = mv.groupBy(F.col("old_c").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_up"),
        F.sum(
            F.when(F.col("new_c") != F.col("old_c"), 1).otherwise(0)
        ).alias("n_out"),
    )
    inc = mv.groupBy(F.col("new_c").alias("cluster")).agg(
        F.sum(
            F.when(F.col("new_c") != F.col("old_c"), 1).otherwise(0)
        ).alias("n_in"),
    )
    after = index1.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_after"))

    lists = cents.select(F.col("__cid").alias("cluster"))
    z = F.lit(0).cast("long")
    return (
        lists.join(F.broadcast(base), "cluster", "left")
        .join(F.broadcast(delc), "cluster", "left")
        .join(F.broadcast(upc), "cluster", "left")
        .join(F.broadcast(inc), "cluster", "left")
        .join(F.broadcast(after), "cluster", "left")
        .select(
            "cluster",
            F.coalesce("n_base", z).cast("long").alias("n_base"),
            F.coalesce("n_del", z).cast("long").alias("n_del"),
            F.coalesce("n_up", z).cast("long").alias("n_up"),
            F.coalesce("n_out", z).cast("long").alias("n_out"),
            F.coalesce("n_in", z).cast("long").alias("n_in"),
            F.coalesce("n_after", z).cast("long").alias("n_after"),
            F.when(
                F.coalesce("n_up", z) > 0,
                F.round(
                    (F.col("n_up") - F.col("n_out")) * 1.0 / F.col("n_up"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("stay_rate"),
        )
        .orderBy("cluster")
    )


# ------------------------------------------------------------------
# Held-out tokenizer audit: fertility / novel-word / cold-word rates
# ------------------------------------------------------------------

_FERT_MERGES = 6


def _fertility_oracle(n_merges: int = _FERT_MERGES) -> str:
    from ..operators.bpe import _bpe_cte_chain

    sql, final, winners = _bpe_cte_chain(
        n_merges, carry_word=True, doc_where="doc_id % 2 = 0"
    )
    # apply the trained winners to the HELD-OUT split's vocabulary
    apply_chain = ""
    prev = "h0"
    for k, b in enumerate(winners):
        apply_chain += f""",
h{k + 1} AS MATERIALIZED (
  SELECT w, replace(sym, (SELECT l || chr(31) || r FROM {b}),
                    (SELECT l || r FROM {b})) AS sym
  FROM {prev}
)"""
        prev = f"h{k + 1}"
    return (
        sql
        + f""",
hold_occ AS (
  SELECT source, w FROM (
    SELECT source,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents WHERE doc_id % 2 = 1
  ) WHERE length(w) > 0 AND NOT contains(w, chr(31))
),
h0 AS (
  SELECT w, array_to_string(string_split(w, ''), chr(31)) AS sym
  FROM (SELECT DISTINCT w FROM hold_occ)
){apply_chain},
henc AS (
  SELECT h.w, len(string_split(h.sym, chr(31))) AS n_tok,
         CASE WHEN t.w IS NULL THEN 1 ELSE 0 END AS novel
  FROM {prev} h LEFT JOIN (SELECT DISTINCT w FROM {final}) t ON h.w = t.w
)
SELECT o.source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(count(DISTINCT o.w) AS BIGINT) AS n_distinct,
       CAST(sum(e.n_tok) AS BIGINT) AS bpe_tokens,
       round(sum(e.n_tok) * 1.0 / count(*), 6) AS fertility,
       round(sum(e.novel) * 1.0 / count(*), 6) AS novel_rate,
       round(sum(CASE WHEN e.n_tok = length(o.w) THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS cold_rate,
       round(sum(length(o.w)) * 1.0 / sum(e.n_tok), 6) AS chars_per_token
FROM hold_occ o JOIN henc e ON o.w = e.w
GROUP BY o.source ORDER BY o.source"""
    )


@register(
    "text_bpe_fertility_oov",
    oracle=_fertility_oracle(),
    doc="tokenizer fertility / OOV audit on a HELD-OUT split "
    "(round-11 verdict task 5 second candidate): 6 BPE merges "
    "trained on the doc_id-even half of the corpus, applied to the "
    "odd half — per source: fertility (BPE tokens per word "
    "occurrence, THE tokenizer-quality number), novel-word "
    "occurrence rate (holdout words absent from the training "
    "vocabulary — the byte/char-fallback pressure gauge for a "
    "char-init BPE), cold-word rate (occurrences no trained merge "
    "touches, n_tok == word length), and chars-per-token.  Encoding "
    "stays once-per-DISTINCT-holdout-word (K ordered string replaces "
    "via bpe_apply_merges, broadcast back to occurrences — the "
    "text_bpe_encode_compression discipline); the train-split merge "
    "table is the K-row driver artifact a trained tokenizer IS.  "
    "Oracle replays train (WHERE doc_id%2=0 chain) + held-out apply "
    "(h0..h6 replace chain) end-to-end.",
)
def text_bpe_fertility_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import (
        bpe_apply_merges,
        bpe_train_merges,
        bpe_word_occurrences,
        word_vocab,
    )

    # spread (round-12): train + holdout vocab passes are CPU-bound
    # map work over a single-row-group scan
    docs = load_table(spark, sf_dir, "documents", spread=True)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    hold = docs.filter(F.col("doc_id") % 2 == 1)

    merges = [
        (r["l"], r["r"])
        for r in bpe_train_merges(train, "text", _FERT_MERGES).collect()
    ]
    henc = bpe_apply_merges(word_vocab(hold, "text", keep_word=True), merges)
    train_words = word_vocab(train, "text", keep_word=True).select("w")
    henc = henc.join(
        train_words.withColumn("__seen", F.lit(1)), "w", "left"
    ).select(
        "w",
        "n_tok",
        F.when(F.col("__seen").isNull(), 1).otherwise(0).alias("novel"),
    )
    occ = bpe_word_occurrences(hold, "text", "source")
    return (
        occ.join(F.broadcast(henc), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.countDistinct("w").cast("long").alias("n_distinct"),
            F.sum("n_tok").cast("long").alias("bpe_tokens"),
            F.round(
                F.sum("n_tok") / F.count(F.lit(1)), 6
            ).alias("fertility"),
            F.round(
                F.sum("novel") / F.count(F.lit(1)), 6
            ).alias("novel_rate"),
            F.round(
                F.sum(
                    F.when(F.col("n_tok") == F.length("w"), 1).otherwise(0)
                )
                / F.count(F.lit(1)),
                6,
            ).alias("cold_rate"),
            F.round(
                F.sum(F.length("w")) / F.sum("n_tok"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )
