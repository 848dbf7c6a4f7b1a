"""Dedup-pipeline stress harness: 3x / 10x the sf0.1 documents corpus.

The near-dup pipeline (MinHash/SimHash/Jaccard/containment/CC) is the
scale-critical path of this engine, and its claims are about JOIN
VOLUME, not row count: banded LSH is sum(bucket^2), the exact
set-similarity joins are sum(df(shingle)^2).  This harness measures
those claims by replicating the sf0.1 documents table K times (doc_id
offset per replica; each replica's text gets a replica-unique suffix
token, so replicas are NEAR-dups of their original, not byte-identical
copies — the corpus shape a crawl actually produces).

By construction every original becomes a K-member duplicate clique, so
the TRUE pair count grows ~K^2 — and therefore so must the work of any
correct pair-emitting operator.  What the harness checks is that cost
tracks OUTPUT (true pairs / collisions), never N^2 over non-duplicates:

- per-row stages (signatures) must grow ~K (linear in rows);
- pair-emitting stages must grow ~K^2 ONLY in proportion to their
  output rows (wall/output-pair stays ~flat as K grows);
- CC grows with edges (~K^2 here), rounds stay O(log diameter).

Pair-emitting stages are measured at 1x/3x (9x true pairs — enough to
read the slope); signatures also at 10x.

Usage: python tools/stress_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def replicated_docs(spark, sf_dir: str, k: int) -> DataFrame:
    """K near-dup replicas of the documents table, distinct doc_ids."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reps = spark.range(k).select(F.col("id").alias("__rep"))
    return (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__rep") * 1_000_000_000).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" replicatoken"), F.col("__rep"))
            )
            .alias("text"),
        )
        .localCheckpoint()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark()

    from aiven_challenge2_cdc_sharing_spark.operators.clustering import (
        dedup_clusters,
    )
    from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
        containment_join,
        jaccard_pairs,
        jaccard_threshold_join,
        lsh_candidate_pairs,
        minhash_signature,
        simhash64,
        simhash_near_pairs,
    )

    def signatures(docs):
        return minhash_signature(docs, "text", num_hashes=16).select(
            "doc_id", "minhash"
        )

    def simhash_sigs(docs):
        return simhash64(docs, "text").select("doc_id", "simhash")

    def lsh_candidates(docs):
        signed = minhash_signature(docs, "text", num_hashes=16).localCheckpoint(
            eager=False
        )
        return lsh_candidate_pairs(signed, "doc_id", bands=4)

    def minhash_full(docs):
        cands = lsh_candidates(docs).localCheckpoint()
        return jaccard_pairs(cands, docs, "doc_id", "text").filter(
            F.col("jaccard") >= 0.5
        )

    def simhash_full(docs):
        sigs = simhash_sigs(docs).localCheckpoint(eager=False)
        return simhash_near_pairs(sigs, "doc_id", max_hamming=3)

    def jaccard_full(docs):
        return jaccard_threshold_join(
            docs, "doc_id", "text", 0.5, max_shingle_df=10_000
        )

    def containment_full(docs):
        return containment_join(
            docs, "doc_id", "text", 0.8, max_shingle_df=10_000
        )

    def cc_full(docs):
        pairs = simhash_full(docs).select("id_a", "id_b").localCheckpoint()
        return dedup_clusters(docs.select("doc_id"), pairs)

    stages = [
        # (name, fn, max replication measured)
        ("minhash signatures (per-row)", signatures, 10),
        ("simhash signatures (per-row)", simhash_sigs, 10),
        ("LSH banding -> candidates", lsh_candidates, 3),
        ("minhash+LSH+verify pairs", minhash_full, 3),
        ("simhash band+hamming pairs", simhash_full, 3),
        ("exact jaccard join", jaccard_full, 3),
        ("containment join", containment_full, 3),
        ("CC cluster resolution", cc_full, 3),
    ]

    def incremental_probe(docs):
        # the r3 incremental shape inlined against the replicated corpus:
        # xxhash64 signatures (fast path), batch = doc_id%5==0 probes the
        # capped band table of the rest
        from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
            cap_hot_buckets,
        )

        signed = minhash_signature(docs, "text", num_hashes=16)
        width = 4
        banded = signed.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.xxhash64(
                                F.slice("minhash", b * width + 1, width)
                            ).alias("band_hash"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band"),
        ).select("doc_id", "band.band_idx", "band.band_hash")
        index_side = cap_hot_buckets(
            banded.filter(F.col("doc_id") % 5 != 0),
            ["band_idx", "band_hash"],
            10_000,
        ).localCheckpoint(eager=False)
        batch_side = banded.filter(F.col("doc_id") % 5 == 0)
        return (
            batch_side.alias("b")
            .join(
                index_side.alias("i"),
                (F.col("b.band_idx") == F.col("i.band_idx"))
                & (F.col("b.band_hash") == F.col("i.band_hash")),
            )
            .groupBy(F.col("b.doc_id").alias("new_id"))
            .agg(F.min(F.col("i.doc_id")).alias("dup_of"))
        )

    stages.append(("incremental LSH index probe", incremental_probe, 10))

    print("| pipeline | docs | wall | output rows |")
    print("|---|---|---|---|")
    for kk in (1, 3, 10):
        docs = replicated_docs(spark, sf_dir, kk)
        n = docs.count()
        for name, fn, max_k in stages:
            if kk > max_k:
                continue
            t0 = time.time()
            df = fn(docs)
            # noop sink, not count(): count() lets Catalyst prune the
            # computed columns entirely (a per-row signature stage
            # would be measured as a bare scan)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            out = df.count()
            print(f"| {name} ({kk}x) | {n} | {dt:.1f} s | {out} |", flush=True)

    # ---- semantic dedup: replicated embeddings, n_clusters scaled with
    # K so N/k stays constant (the SemDeDup prescription — the honest
    # scale response is more clusters, not bigger cluster self-joins)
    from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    print("| semantic dedup | vectors | n_clusters | wall | output pairs |")
    print("|---|---|---|---|---|")
    for kk in (1, 3, 10):
        reps = spark.range(kk).select(F.col("id").alias("__rep"))
        vecs = (
            emb.crossJoin(F.broadcast(reps))
            .select(
                (F.col("vec_id") + F.col("__rep") * 1_000_000_000).alias(
                    "vec_id"
                ),
                "embedding",
            )
            .localCheckpoint()
        )
        n = vecs.count()
        t0 = time.time()
        df = semantic_dedup_pairs(
            vecs, threshold=0.40, n_clusters=16 * kk, iters=2
        )
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        out = df.count()
        print(
            f"| semantic pairs ({kk}x) | {n} | {16 * kk} | {dt:.1f} s | {out} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
