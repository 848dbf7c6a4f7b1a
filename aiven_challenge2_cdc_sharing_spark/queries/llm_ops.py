"""LLM training-data pipeline operators (SURVEY.md §2.11 + north star):
dedup (exact + MinHash/SimHash near-dup), similarity search, text
analysis.  Nearly everything is oracle-checked — including the
approximate ANN paths, whose deterministic index builds DuckDB replays
exactly (axis-plane LSH buckets; unrolled Lloyd CTEs).  Only the
xxhash64-based fast paths register rows-only, each with an oracled md5
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    EN_STOPWORDS,
    distinct_token_ratio,
    doc_fingerprint,
    quality_score,
    stopword_hits,
    token_count,
    tokenize,
)
from ..operators.dedup import (
    exact_dedup_by_fingerprint,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash64,
)
from ..operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from ..tables import load_table
from . import register

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


@register(
    "text_doc_stats",
    oracle=f"""
SELECT doc_id,
       len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS n_unique,
       round(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+')))
             * 1.0 / len(string_split_regex(lower(trim(text)), '\\s+')), 6)
         AS unique_ratio,
       len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> list_contains({_SW_SQL}, t))) AS stopword_hits
FROM documents
""",
    doc="text analysis: token counts, lexical diversity, stopword hits — "
    "all codegen'd column expressions",
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.size(F.array_distinct(tokenize(t))).alias("n_unique"),
        F.round(distinct_token_ratio(t), 6).alias("unique_ratio"),
        stopword_hits(t).alias("stopword_hits"),
    )


@register(
    "text_quality_scores",
    oracle="""
SELECT doc_id,
       round(0.5 * least(len(string_split_regex(lower(trim(text)), '\\s+')) / 100.0, 1.0)
           + 0.5 * (len(list_distinct(string_split_regex(lower(trim(text)), '\\s+')))
                    * 1.0 / len(string_split_regex(lower(trim(text)), '\\s+'))), 6)
         AS quality
FROM documents
""",
    doc="quality scoring heuristic (length credit + lexical diversity)",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    )


@register(
    "text_top_tokens",
    oracle="""
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 50
""",
    doc="term frequency: explode + count + top-k (the OpenSearch terms-agg "
    "over analyzed text, done relationally)",
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(50)
    )


@register(
    "text_fingerprints",
    oracle="""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
    doc="document fingerprinting: canonicalize + md5 (cross-engine stable)",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )


@register(
    "text_lang_distribution",
    oracle="""
SELECT lang, source, count(*) AS cnt, round(avg(n_chars), 2) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
    doc="corpus composition by language/source",
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "text_redact_pii",
    oracle="""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text || ' contact doc' || doc_id || '@corp.example or +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\+?[0-9][0-9\\-]{6,}', '<PHONE>', 'g') AS redacted
FROM documents
""",
    doc="PII redaction for training corpora: email + phone patterns "
    "scrubbed with JVM-side regexp_replace (PII synthesized "
    "deterministically since the corpus has none)",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    with_pii = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@corp.example or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("with_pii"),
    )
    return with_pii.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                "with_pii",
                r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                "<EMAIL>",
            ),
            r"\+?[0-9][0-9\-]{6,}",
            "<PHONE>",
        ).alias("redacted"),
    )


@register(
    "text_char_trigrams",
    oracle="""
SELECT tri, count(*) AS cnt
FROM (
  SELECT unnest(list_transform(range(1, length(text) - 1),
                               i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
  FROM documents
)
GROUP BY tri
ORDER BY cnt DESC, tri
LIMIT 30
""",
    doc="character trigram profile (the language-ID building block): "
    "generated with a JVM-side transform over positions, no UDF",
)
def text_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # substr with a dynamic start position needs the SQL-expr form.
    # spread: the per-char transform+explode is CPU-bound map work on
    # a single-row-group scan (round-12; counts are exact integers)
    docs = load_table(spark, sf_dir, "documents", spread=True).withColumn(
        "__tris",
        F.expr("transform(sequence(1, length(text) - 2), i -> substr(text, i, 3))"),
    )
    return (
        docs.select(F.explode("__tris").alias("tri"))
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tri")
        .limit(30)
    )


@register(
    "text_winnow_fingerprints",
    oracle="""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
h AS (
  SELECT doc_id,
         list_transform(
           list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                          i -> substr(t, CAST(i AS INTEGER), 5)),
           x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS hv
  FROM norm
),
wmin AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(hv) - 3, 1) + 1),
                        j -> list_min(hv[j:j+3])) AS mins
  FROM h
)
SELECT doc_id,
       len(list_distinct(mins)) AS n_fp,
       array_to_string(list_sort(list_distinct(mins)), ',') AS fps
FROM wmin
""",
    doc="document fingerprinting via winnowing (the MOSS scheme): "
    "rolling char-5-gram hashes, min per sliding window of 4, distinct "
    "survivors are the fingerprint set — near-identical documents "
    "share most fingerprints, enabling partial-overlap detection that "
    "whole-doc md5 (text_fingerprints) cannot.  Hashes are md5-prefix "
    "60-bit ints so DuckDB reproduces the selection bit-identically; "
    "per-row expression, embarrassingly parallel, no shuffle",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        docs.withColumn(
            "__t", F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        )
        .withColumn(
            "__hv",
            F.expr(
                "transform("
                "  transform(sequence(1, greatest(length(__t) - 4, 1)),"
                "            i -> substr(__t, i, 5)),"
                "  x -> cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint))"
            ),
        )
        .withColumn(
            "__mins",
            F.expr(
                "transform(sequence(1, greatest(size(__hv) - 3, 1)),"
                "          j -> array_min(slice(__hv, j, 4)))"
            ),
        )
        .select(
            "doc_id",
            F.size(F.array_distinct("__mins")).alias("n_fp"),
            # CSV string, not array<long>: a top-level array column
            # breaks the driver's pandas canonicalizer
            F.concat_ws(",", F.array_sort(F.array_distinct("__mins"))).alias(
                "fps"
            ),
        )
    )


# GPT-2-style pretokenizer shape without lookahead, so Java (Spark) and
# RE2 (DuckDB) produce identical token streams: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs.  Whitespace
# is pre-normalized to single spaces so the literal-space classes are
# exhaustive in both engines.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@register(
    "text_bpe_token_counts",
    oracle=f"""
SELECT doc_id,
       len(string_split_regex(lower(trim(text)), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(regexp_replace(trim(text), '\\s+', ' ', 'g'),
                              '{_BPE_PAT.replace("'", "''")}')) AS bpe_tokens,
       round(len(regexp_extract_all(regexp_replace(trim(text), '\\s+', ' ', 'g'),
                                    '{_BPE_PAT.replace("'", "''")}')) * 1.0
             / len(string_split_regex(lower(trim(text)), '\\s+')), 4) AS fertility
FROM documents
""",
    doc="token counting both ways the north star asks for: whitespace "
    "words AND a BPE-ish pretokenizer regex (contractions / letter "
    "runs / digit runs / punctuation), plus fertility (subword tokens "
    "per word) — the metric that prices a corpus in tokens.  All "
    "JVM-side regexp_extract_all; no Python",
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    bpe = F.size(F.regexp_extract_all(norm, F.lit(_BPE_PAT), 0))
    ws = token_count(F.col("text"))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(bpe * 1.0 / ws, 4).alias("fertility"),
    )


@register(
    "text_lang_id_stopword",
    oracle=f"""
SELECT doc_id, lang,
       round(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             t -> list_contains({_SW_SQL}, t))) * 1.0
             / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS en_ratio,
       len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> list_contains({_SW_SQL}, t))) * 1.0
             / len(string_split_regex(lower(trim(text)), '\\s+')) >= 0.1 AS pred_en
FROM documents
""",
    doc="language-ID heuristic: fraction of tokens that are English "
    "stopwords; >=10%% predicts English.  The honest n-gram-free "
    "baseline (char-trigram profiles are in text_char_trigrams); "
    "per-row, embarrassingly parallel",
)
def text_lang_id_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    ratio = stopword_hits(t) * 1.0 / token_count(t)
    return docs.select(
        "doc_id",
        "lang",
        F.round(ratio, 6).alias("en_ratio"),
        (ratio >= 0.1).alias("pred_en"),
    )


@register(
    "dedup_exact_fingerprint",
    oracle="""
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
    doc="exact dedup via 16-byte fingerprint groupBy: deterministic "
    "survivor (min id); shuffle moves hashes, not documents",
)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_dedup_by_fingerprint(docs, "text", "doc_id")


@register(
    "dedup_distinct_doc_count",
    oracle="""
SELECT count(DISTINCT text) AS n_distinct, count(*) AS n_total
FROM documents
""",
    doc="dedup cardinality check",
)
def dedup_distinct_doc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").agg(
        F.countDistinct("text").alias("n_distinct"),
        F.count(F.lit(1)).alias("n_total"),
    )


def _minhash_near_pairs_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION fast path: xxhash64 MinHash -> banded LSH ->
    exact-Jaccard verify.  xxhash64 has no DuckDB twin, so this path is
    bench/pytest-pinned only; the driver-facing registry row below runs
    the md5-family pipeline, whose every stage an oracle replays."""
    # spread (round-12): signature + shingle-verify build are
    # CPU-bound map passes over a single-row-group scan
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    # localCheckpoint: the LSH band self-join consumes the signatures
    # twice; materializing once halves the signature compute (and at
    # scale would be a persisted signature table)
    signed = minhash_signature(docs, "text", num_hashes=16).localCheckpoint(
        eager=False
    )
    cands = lsh_candidate_pairs(signed, "doc_id", bands=4)
    return (
        jaccard_pairs(cands, docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


_MD5_SIG_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM toks
)
SELECT doc_id,
       list_min(list_transform(s, x -> md5('0:' || x))) AS sig_0,
       list_min(list_transform(s, x -> md5('1:' || x))) AS sig_1,
       list_min(list_transform(s, x -> md5('2:' || x))) AS sig_2,
       list_min(list_transform(s, x -> md5('3:' || x))) AS sig_3,
       list_min(list_transform(s, x -> md5('4:' || x))) AS sig_4,
       list_min(list_transform(s, x -> md5('5:' || x))) AS sig_5
FROM sh
"""

N_MD5_SIGS = 6


def _md5_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine MinHash: h_i = min(md5('i:' || shingle)) — md5 hex
    strings compare identically in Spark and DuckDB, so the whole
    near-dup signature (not just exact dedup) sits under the oracle
    gate.  xxhash64-based minhash (operators/dedup.py) remains the
    fast production path; this is its verifiable twin."""
    from ..operators.dedup import with_shingles

    docs = with_shingles(
        load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text"), "text"
    )
    def _salted(i: int):
        # NB: must be a ONE-arg lambda — a second parameter (even with a
        # default) makes PySpark pass the array index into it
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    cols = [
        F.array_min(F.transform(F.col("__sh"), _salted(i))).alias(f"sig_{i}")
        for i in range(N_MD5_SIGS)
    ]
    return docs.select("doc_id", *cols)


@register(
    "dedup_minhash_md5_signatures",
    oracle=_MD5_SIG_SQL,
    doc="oracle-checked MinHash signatures (md5 hash family, 6 hashes): "
    "DuckDB recomputes byte-identical signatures from the raw text",
)
def dedup_minhash_md5_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _md5_minhash_signatures(spark, sf_dir)


# CTE chain shared by the pair query and the cluster-resolution oracle:
# signatures -> banded rows -> hot-bucket cap -> distinct candidate pairs.
_MD5_PAIRS_CTES = f"""sigs AS ({_MD5_SIG_SQL}),
banded AS (
  SELECT doc_id, 0 AS band, sig_0 AS sig FROM sigs
  UNION ALL SELECT doc_id, 1, sig_1 FROM sigs
  UNION ALL SELECT doc_id, 2, sig_2 FROM sigs
  UNION ALL SELECT doc_id, 3, sig_3 FROM sigs
  UNION ALL SELECT doc_id, 4, sig_4 FROM sigs
  UNION ALL SELECT doc_id, 5, sig_5 FROM sigs
),
capped AS (
  SELECT doc_id, band, sig
  FROM banded
  QUALIFY count(*) OVER (PARTITION BY band, sig) <= 64
),
cand_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""


@register(
    "dedup_minhash_md5_pairs",
    oracle=f"""
WITH {_MD5_PAIRS_CTES}
SELECT id_a, id_b FROM cand_pairs
""",
    doc="oracle-checked near-dup CANDIDATE PAIRS: signature bands joined "
    "per (band, sig) — an equi-join both engines compute identically; "
    "collision iff >=1 of 6 minhashes agree (P ~ 1-(1-J)^6).  Buckets "
    "larger than 64 are dropped on BOTH engines (hot-bucket guard: "
    "self-join cost is sum(bucket^2)), so the capped semantics — not "
    "just the happy path — sit under the oracle gate",
)
def dedup_minhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cap_hot_buckets

    sigs = _md5_minhash_signatures(spark, sf_dir)
    stack_expr = "stack({}, {}) as (band, sig)".format(
        N_MD5_SIGS, ", ".join(f"{i}, sig_{i}" for i in range(N_MD5_SIGS))
    )
    banded = cap_hot_buckets(
        sigs.selectExpr("doc_id", stack_expr), ["band", "sig"], 64
    ).localCheckpoint(eager=False)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


@register(
    "dedup_minhash_near_pairs",
    oracle=f"""
WITH {_MD5_PAIRS_CTES},
toks2 AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
),
sh2 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM toks2
),
verified AS (
  SELECT p.id_a, p.id_b,
         round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(a.s || b.s)), 6) AS jaccard
  FROM cand_pairs p
  JOIN sh2 a ON p.id_a = a.doc_id
  JOIN sh2 b ON p.id_b = b.doc_id
)
SELECT id_a, id_b, jaccard FROM verified
WHERE jaccard >= 0.5
ORDER BY id_a, id_b
""",
    doc="the FULL MinHash near-dup pipeline under the exact oracle "
    "gate: md5-family signatures -> banded buckets (hot-bucket cap "
    "64, replicated in SQL) -> candidate pairs -> exact "
    "shingle-Jaccard verify >= 0.5.  Shuffle is O(bands*N) band "
    "hashes plus the candidate verify, never N^2 comparisons.  The "
    "xxhash64 signature family (operators/dedup.py minhash_signature) "
    "stays the production fast path — same pipeline shape, cheaper "
    "hash — pinned by pytest and bench.py rather than an oracle, "
    "since xxhash64 has no DuckDB twin",
)
def dedup_minhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cap_hot_buckets

    # spread (round-12): the pair-grain verify rebuilds shingles on
    # both join sides from this scan — CPU-bound map work
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    sigs = _md5_minhash_signatures(spark, sf_dir)
    stack_expr = "stack({}, {}) as (band, sig)".format(
        N_MD5_SIGS, ", ".join(f"{i}, sig_{i}" for i in range(N_MD5_SIGS))
    )
    # localCheckpoint: both sides of the band self-join consume the
    # capped band table; without it the 6 md5s/shingle are computed
    # twice (measured 11.2s -> 9.0s at sf0.1)
    banded = cap_hot_buckets(
        sigs.selectExpr("doc_id", stack_expr), ["band", "sig"], 64
    ).localCheckpoint(eager=False)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return (
        jaccard_pairs(cands, docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_cluster_resolution",
    oracle=f"""
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
       (d.doc_id = coalesce(c.component, d.doc_id)) AS is_survivor
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
ORDER BY d.doc_id
""",
    doc="near-dup pairs -> duplicate clusters via iterative min-label "
    "propagation (connected components); every doc marked with "
    "(cluster_id, is_survivor) — the keep/drop decision a training "
    "pipeline actually applies.  Oracle: DuckDB recursive-CTE exact "
    "transitive closure over the same capped candidate pairs — the "
    "pointer-jumping BSP result must equal exact CC",
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import dedup_clusters

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_md5_pairs(spark, sf_dir)
    return dedup_clusters(docs, pairs).orderBy("doc_id")


@register(
    "dedup_embedding_cosine",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
capped AS (
  SELECT * FROM b QUALIFY count(*) OVER (PARTITION BY bucket) <= 2000
),
probes AS (
  SELECT vec_id, e,
         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS pbucket
  FROM capped
)
SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
       round(list_cosine_similarity(a.e, c.e), 6) AS sim
FROM probes a JOIN capped c ON a.pbucket = c.bucket AND a.vec_id < c.vec_id
WHERE round(list_cosine_similarity(a.e, c.e), 6) >= 0.35
""",
    doc="embedding-cosine near-dup detection (the fifth dedup modality): "
    "vectors bucket by the sign bits of their first 4 dimensions — "
    "axis-aligned hyperplane LSH that is deterministic and therefore "
    "exactly recomputable by DuckDB, unlike the random-hyperplane path "
    "in operators/similarity.py — then a hot-bucket-capped, Hamming-1 "
    "multi-probe self-join (recall: 134 vs 40 single-probe pairs at "
    "sf0.01) scores exact cosine and keeps pairs >= 0.35 (the synthetic embeddings top out near 0.51 in-bucket, so the threshold sits where real signal exists).  Shuffle "
    "carries (bucket, id, vector); cost is sum(bucket^2), never N^2",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cap_hot_buckets
    from ..operators.similarity import _dot, _norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bucket = sum(
        F.when(F.element_at("e", i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(4)
    )
    # norms computed once per VECTOR before the self-join (the join
    # would otherwise re-aggregate both norms for every candidate pair)
    bucketed = cap_hot_buckets(
        emb.withColumn("__bucket", bucket).withColumn("__n", _norm(F.col("e"))),
        ["__bucket"],
        2000,
    )
    # multi-probe: a near pair split by exactly one of the 4 sign
    # planes still collides — one side also probes each Hamming-1
    # bucket.  The probe explosion and the candidate join carry ONLY
    # (vec_id, bucket) longs — never the vectors — and pairs dedupe
    # BEFORE scoring (one pair can match through several probes), so
    # each surviving pair is scored exactly once after the vectors
    # join back in.  Shuffling 5x vectors through the probe join and
    # re-scoring duplicates was measured ~2x slower at sf0.1.
    probe_ids = bucketed.select(
        "vec_id",
        F.explode(
            F.array(
                F.col("__bucket"),
                *[F.col("__bucket").bitwiseXOR(F.lit(1 << i)) for i in range(4)],
            )
        ).alias("__pbucket"),
    )
    build_ids = bucketed.select(
        F.col("vec_id").alias("__vid_b"), F.col("__bucket")
    )
    cands = (
        probe_ids.join(
            build_ids,
            (probe_ids.__pbucket == build_ids.__bucket)
            & (probe_ids.vec_id < build_ids.__vid_b),
        )
        .select(F.col("vec_id").alias("id_a"), F.col("__vid_b").alias("id_b"))
        .distinct()
    )
    va = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("__ea"),
        F.col("__n").alias("__na"),
    )
    vb = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("__eb"),
        F.col("__n").alias("__nb"),
    )
    sim = F.round(
        _dot(F.col("__ea"), F.col("__eb")) / (F.col("__na") * F.col("__nb")), 6
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.35)
    )


def _simhash_signatures_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production fast path: xxhash64-derived 64-bit SimHash — no DuckDB
    twin, so bench/pytest-pinned; the registry row below computes the
    md5-family signature the oracle replays bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash64(docs, "text").select("doc_id", "simhash")


# 60 per-bit majority votes over the token-hash list; generated once so
# DuckDB evaluates literal shifts exactly like the codegen'd Spark side.
_SIMHASH_BIT_TERMS = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hv, h -> CASE WHEN ((h >> {b}) & 1) = 1"
    f" THEN 1 ELSE -1 END)) > 0 THEN CAST(1 AS BIGINT) << {b}"
    f" ELSE CAST(0 AS BIGINT) END)"
    for b in range(60)
)

_SIMHASH_MD5_SIG_CTES = f"""toks AS (
  SELECT doc_id,
         list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS tk
  FROM documents
),
hs AS (
  SELECT doc_id,
         list_transform(tk,
           t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)) AS hv
  FROM toks
),
sig AS (SELECT doc_id, ({_SIMHASH_BIT_TERMS}) AS simhash FROM hs)"""

_SIMHASH_MD5_PAIRS_SQL = f"""
WITH {_SIMHASH_MD5_SIG_CTES},
bands AS (
  SELECT doc_id, simhash, b.bv AS band_idx,
         (simhash >> (15 * b.bv)) & 32767 AS band_val
  FROM sig, range(0, 4) b(bv)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, r.doc_id AS id_b
  FROM bands a
  JOIN bands r ON a.band_idx = r.band_idx AND a.band_val = r.band_val
              AND a.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b,
       bit_count(xor(sa.simhash, sb.simhash)) AS hamming
FROM cand c
JOIN sig sa ON c.id_a = sa.doc_id
JOIN sig sb ON c.id_b = sb.doc_id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
ORDER BY id_a, id_b
"""


@register(
    "dedup_simhash_signatures",
    oracle=f"""
WITH {_SIMHASH_MD5_SIG_CTES}
SELECT doc_id, simhash FROM sig
""",
    doc="SimHash 60-bit signatures under the exact oracle gate: "
    "md5-derived token hashes, per-bit +/-1 majority vote, one "
    "codegen'd expression per row — DuckDB rebuilds every signature "
    "bit-identically from the raw text.  The xxhash64 64-bit variant "
    "(operators/dedup.py simhash64) stays the production fast path, "
    "pinned by pytest and bench.py (no DuckDB xxhash twin)",
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_md5

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_md5(docs, "text").select("doc_id", "simhash")


@register(
    "dedup_simhash_md5_pairs",
    oracle=_SIMHASH_MD5_PAIRS_SQL,
    doc="N1 SimHash near-dup under the exact oracle gate: md5-derived "
    "60-bit signatures (bit-identical in DuckDB), banded into 4x15-bit "
    "buckets, candidates from bucket collisions only (never N^2), "
    "verified by Hamming <= 3.  Distance < bands makes pigeonhole "
    "recall EXACT: the banded join provably finds every qualifying "
    "pair, so the oracle pins the full near-dup answer, not a sample",
)
def dedup_simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_md5, simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    # localCheckpoint: the band self-join + verify reads signatures three
    # times; at scale this is the persisted signature table
    sigs = simhash_md5(docs, "text").select("doc_id", "simhash").localCheckpoint(
        eager=False
    )
    return simhash_near_pairs(sigs, "doc_id", max_hamming=3).orderBy("id_a", "id_b")


@register(
    "text_chunk_documents",
    oracle="""
SELECT doc_id, chunk_idx,
       array_to_string(list_slice(string_split_regex(lower(trim(text)), '\\s+'),
                                  chunk_idx * 50 + 1, chunk_idx * 50 + 64), ' ')
         AS chunk_text
FROM (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(len(string_split_regex(lower(trim(text)), '\\s+'))
                                   / 50.0) AS BIGINT))) AS chunk_idx
  FROM documents
)
""",
    doc="document chunking for training pipelines: 64-token windows with "
    "stride 50 (14-token overlap), generated per-row with JVM array ops "
    "— no shuffle until a downstream op needs one",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__tok", tokenize(F.col("text"))
    )
    chunks = docs.select(
        "doc_id",
        "__tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("__tok") / F.lit(50.0)).cast("long") - 1,
            )
        ).alias("chunk_idx"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(
            " ", F.slice(F.col("__tok"), (F.col("chunk_idx") * 50 + 1).cast("int"), 64)
        ).alias("chunk_text"),
    )


@register(
    "text_token_budget_by_source",
    oracle="""
SELECT source,
       CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
         AS total_tokens,
       count(*) AS n_docs,
       round(avg(len(string_split_regex(lower(trim(text)), '\\s+'))), 2)
         AS avg_tokens
FROM documents
GROUP BY source
ORDER BY total_tokens DESC, source
""",
    doc="token budget accounting per source — the sizing query every "
    "training-data pipeline runs first",
)
def text_token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__n", token_count(F.col("text"))
    )
    return (
        docs.groupBy("source")
        .agg(
            F.sum("__n").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__n"), 2).alias("avg_tokens"),
        )
        .orderBy(F.desc("total_tokens"), "source")
    )


@register(
    "sim_cosine_topk",
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
    doc="ANN baseline: exact brute-force cosine top-10 for 3 query vectors "
    "— broadcast queries, map-side score, window top-k",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk_bruteforce(emb.select("vec_id", "embedding"), queries, k=10)


@register(
    "sim_cosine_topk_lsh",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qb FROM b
      WHERE vec_id IN (0, 1, 2)),
probes AS (
  SELECT query_id, qe,
         unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8)])
           AS pbucket
  FROM q
)
SELECT query_id, vec_id, sim FROM (
  SELECT p.query_id, v.vec_id,
         round(list_cosine_similarity(v.e, p.qe), 6) AS sim
  FROM probes p JOIN b v ON v.bucket = p.pbucket
)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
        <= 10
""",
    doc="ANN scale path: sign-bit LSH buckets (4 bits => ~1/16 of "
    "candidates single-probe; Hamming-1 multi-probe scans 5/16), "
    "axis-aligned planes so the bucket assignment — and therefore the "
    "whole approximate result — is exactly recomputable by DuckDB. "
    "The seeded random-hyperplane path stays the operator default and "
    "is pinned by recall-floor tests instead "
    "(tests/test_similarity_recall.py)",
)
def sim_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # axis-aligned unit planes: bucket bit i == (embedding[i] > 0),
    # which the oracle recomputes verbatim.  max_bucket_size=None here
    # because the oracle scores every bucket member: the default cap
    # only coincides with uncapped semantics while EVERY bucket holds
    # <=100k vectors (worst case N <= 100k, not 16*100k — skew can put
    # nearly all of N in one bucket), and a silent truncation at larger
    # SFs would diverge from the oracle.  The capped path is exercised
    # by the recall tests, which replicate the cap explicitly.
    axis_planes = [[1.0 if j == i else 0.0 for j in range(64)] for i in range(4)]
    return cosine_topk_lsh(
        emb.select("vec_id", "embedding"), queries, dim=64, k=10, bits=4,
        planes=axis_planes, max_bucket_size=None,
    )


# The IVF pipeline is deterministic end-to-end (centroid init = first
# n_lists ids, fixed Lloyd iteration count, total tiebreaks), so DuckDB
# can replay the ENTIRE index build + search by unrolling the two Lloyd
# iterations as CTE pairs.  These helpers emit the repeated
# assign-to-nearest / recompute-means CTE bodies.
def _ivf_assign_cte(src: str, cents: str) -> str:
    """Nearest-centroid assignment (max cosine, min cid tiebreak)."""
    return f"""(
  SELECT vec_id, e, cid AS cluster FROM (
    SELECT v.vec_id, v.e, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(v.e, c.cvec) DESC, c.cid) AS rn
    FROM {src} v CROSS JOIN {cents} c) WHERE rn = 1
)"""


def _ivf_update_cte(assigned: str) -> str:
    """Lloyd update: per-(cluster, dim) mean, reassembled in dim order."""
    return f"""(
  SELECT cluster AS cid, list(m ORDER BY pos) AS cvec FROM (
    SELECT cluster, t.i AS pos, avg(e[t.i]) AS m
    FROM {assigned}, range(1, 65) t(i)
    GROUP BY cluster, t.i) GROUP BY cluster
)"""


_IVF_ORACLE = f"""
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
    FROM vecs q CROSS JOIN c2 c WHERE q.vec_id IN (0, 1, 2)) WHERE rn <= 4
)
SELECT query_id, vec_id, sim FROM (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(a.e, p.qe), 6) AS sim
  FROM qp p JOIN a3 a ON a.cluster = p.cluster)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
        <= 10
"""


@register(
    "sim_cosine_topk_ivf",
    oracle=_IVF_ORACLE,
    doc="ANN scale path 2: IVF — deterministic k-means coarse quantizer "
    "(init = first 16 ids, 2 Lloyd iterations, cosine assignment), "
    "n_probe=4 of 16 lists scored per query (~1/4 of candidates). "
    "Oracle: DuckDB replays the ENTIRE index build by unrolling both "
    "Lloyd iterations as assign/update CTE pairs, then probes and "
    "scores identically — the approximate result is still a "
    "deterministic function of the input, so it hash-matches",
)
def sim_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread (round-12): the 16-way HOF argmax assignment is CPU-bound
    # map work over a single-row-group scan — 1 of 32 threads before
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk_ivf(
        emb.select("vec_id", "embedding"), queries, k=10, n_lists=16, n_probe=4
    )


@register(
    "text_heavy_hitter_tokens",
    oracle="""
WITH tk AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
),
tot AS (SELECT count(*) AS n FROM tk)
SELECT token, count(*) AS cnt
FROM tk GROUP BY token
HAVING count(*) > (SELECT n FROM tot) / 100.0
ORDER BY cnt DESC, token
""",
    doc="two-pass EXACT heavy hitters (tokens with freq > N/100): "
    "pass 1 = per-partition Misra-Gries summaries (capacity 99, "
    "Arrow-batched mapInPandas) whose union is a guaranteed candidate "
    "superset by pigeonhole; pass 2 = broadcast semi-join + exact "
    "count + threshold.  The sketch bounds shuffle size by "
    "99*n_partitions instead of the distinct-token universe — at "
    "100 TB the full groupBy the oracle runs is exactly what this "
    "avoids — yet the output is exact, so the plain GROUP BY/HAVING "
    "oracle hash-matches",
)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import heavy_hitters_exact

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokenize(F.col("text"))).alias("token")
    )
    return heavy_hitters_exact(toks, "token", k=100).orderBy(
        F.desc("cnt"), "token"
    )


@register(
    "text_dup_ngram_spans",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
),
base AS (
  SELECT doc_id, len(tk) AS n_tokens, greatest(len(tk) - 7, 0) AS n_grams, tk
  FROM toks
),
grams AS (
  SELECT doc_id, u.pos AS pos, u.g AS g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk) - 7, 0) + 1),
             i -> {'pos': i,
                   'g': md5(list_aggregate(tk[i:i+7], 'string_agg', ' '))}))
             AS u
    FROM base)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
dpos AS (SELECT doc_id, pos, pos + 7 AS e FROM grams JOIN dup USING (g)),
isl AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id
                ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM dpos
),
isl2 AS (
  SELECT doc_id, pos, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
cov AS (
  SELECT doc_id, sum(c) AS n_dup_grams, sum(cov_len) AS dup_tokens FROM (
    SELECT doc_id, island, max(e) - min(pos) + 1 AS cov_len, count(*) AS c
    FROM isl2 GROUP BY doc_id, island) GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_grams,
       CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(coalesce(c.dup_tokens, 0) * 1.0 / b.n_tokens, 6)
         AS dup_token_frac,
       coalesce(c.dup_tokens, 0) * 1.0 / b.n_tokens >= 0.2 AS flagged
FROM base b LEFT JOIN cov c USING (doc_id)
ORDER BY doc_id
""",
    doc="cross-document duplicated-SPAN detection (the exact-substring "
    "dedup of Lee et al. 2022, 'Deduplicating Training Data Makes "
    "Language Models Better', at 8-token granularity): rolling 8-gram "
    "md5s with positions; grams seen in >=2 distinct docs mark their "
    "[pos, pos+7] token interval; per-doc interval UNION via "
    "gaps-and-islands gives exactly how many tokens sit inside "
    "cross-corpus duplicated spans.  Shuffle carries (16-byte hash, "
    "doc_id, pos) — never text; the dup-gram set join is a semi-join "
    "on the hash.  At 100 TB the gram table is the suffix-array "
    "substitute: same signal, embarrassingly parallel",
)
def text_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    base = docs.select(
        "doc_id",
        tokenize(F.col("text")).alias("__tk"),
    ).select(
        "doc_id",
        F.size("__tk").alias("n_tokens"),
        F.greatest(F.size("__tk") - 7, F.lit(0)).alias("n_grams"),
        "__tk",
    )
    # sequence(1, 0) would yield [1, 0] (Spark sequences run backwards),
    # so short docs get an explicit empty gram array
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n_grams") > 0,
                F.expr(
                    "transform(sequence(1, size(__tk) - 7), i -> "
                    "struct(i AS pos, md5(concat_ws(' ', slice(__tk, i, 8))) AS g))"
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
        ).alias("u"),
    ).select("doc_id", F.col("u.pos").alias("pos"), F.col("u.g").alias("g"))
    # the gram stream feeds both the dup-set aggregate and the semi-join
    # probe; materialize once instead of tokenizing + hashing twice (at
    # scale this IS the persisted gram/posting table)
    grams = grams.localCheckpoint()
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("g")
    )
    dpos = grams.join(dup, "g", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + 7).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("doc_id").orderBy("pos")
    isl = dpos.withColumn(
        "ni",
        F.when(
            F.col("pos") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("ni").over(w_run))
    cov = (
        isl.groupBy("doc_id", "island")
        .agg(
            (F.max("e") - F.min("pos") + 1).alias("cov_len"),
            F.count(F.lit(1)).alias("c"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_dup_grams"),
            F.sum("cov_len").alias("dup_tokens"),
        )
    )
    return (
        base.select("doc_id", "n_tokens", "n_grams")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_token_frac"),
            (
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens") >= 0.2
            ).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_perplexity_filter",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
  FROM documents
),
uni AS (SELECT t AS tok, count(*) AS cu
        FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t),
v AS (SELECT count(*) AS vsz FROM uni),
grams AS (
  SELECT doc_id, u.u AS u, u.w AS w FROM (
    SELECT doc_id,
           unnest(list_transform(range(2, len(tk) + 1),
                                 i -> {'u': tk[i-1], 'w': tk[i]})) AS u
    FROM toks)
),
bi AS (SELECT u, w, count(*) AS cb FROM grams GROUP BY u, w),
scored AS (
  SELECT g.doc_id,
         ln((b.cb + 0.1) / (un.cu + 0.1 * (SELECT vsz FROM v))) AS lp
  FROM grams g JOIN bi b USING (u, w) JOIN uni un ON g.u = un.tok
),
agg AS (SELECT doc_id, count(*) AS n_bigrams, -avg(lp) AS h
        FROM scored GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(a.h, 6) AS cross_entropy,
       round(exp(a.h), 4) AS perplexity,
       coalesce(exp(a.h) > 32.0, false) AS flagged
FROM toks t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
""",
    doc="perplexity quality filter (the CCNet/LLaMA corpus-cleaning "
    "signal): a bigram LM with add-0.1 smoothing is trained on the "
    "corpus ITSELF — P(w|u) = (C(u,w)+0.1)/(C(u)+0.1|V|) — and each "
    "doc is scored by bigram cross-entropy; docs above perplexity 32 "
    "(~top decile) flag as out-of-distribution.  Entirely "
    "deterministic (counts + ln), so DuckDB replays LM training AND "
    "scoring exactly.  Scale shape: two count tables shuffled on "
    "token/bigram keys, then re-joined to the gram stream — the "
    "count-then-broadcast-threshold pattern, never a per-doc Python "
    "loop",
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three consumers (gram stream, unigram counts, final doc spine) —
    # tokenize once; at scale this is the persisted tokenized corpus
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.col("text")).alias("__tk")
    ).localCheckpoint()
    # sequence(2, 1) would run BACKWARDS for 1-token docs — guard to empty
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("__tk") >= 2,
                F.expr(
                    "transform(sequence(2, size(__tk)), i -> struct("
                    "element_at(__tk, i-1) AS u, element_at(__tk, i) AS w))"
                ),
            ).otherwise(F.array().cast("array<struct<u:string,w:string>>"))
        ).alias("g"),
    ).select("doc_id", "g.u", "g.w")
    uni = (
        toks.select(F.explode("__tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    vsz = uni.agg(F.count(F.lit(1)).alias("__v"))
    bi = grams.groupBy("u", "w").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        grams.join(bi, ["u", "w"])
        .join(uni.withColumnRenamed("tok", "u"), "u")
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            F.log(
                (F.col("cb") + 0.1) / (F.col("cu") + 0.1 * F.col("__v"))
            ).alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), (-F.avg("lp")).alias("h")
    )
    return (
        toks.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("h", 6).alias("cross_entropy"),
            F.round(F.exp("h"), 4).alias("perplexity"),
            F.coalesce(F.exp("h") > 32.0, F.lit(False)).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_parent_chain_depth",
    oracle=f"""
WITH RECURSIVE {_MD5_PAIRS_CTES},
parent AS (
  SELECT id_b AS node, min(id_a) AS par FROM cand_pairs GROUP BY id_b
),
chain(doc_id, cur, hop) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION ALL
  SELECT c.doc_id, p.par, c.hop + 1
  FROM chain c JOIN parent p ON p.node = c.cur
)
SELECT doc_id, arg_max(cur, hop) AS root, CAST(max(hop) AS INT) AS hops
FROM chain GROUP BY doc_id ORDER BY doc_id
""",
    doc="pointer-chase depth to each doc's greedy dedup representative, "
    "via WITH RECURSIVE on BOTH engines (Spark 4.x recursive CTE vs "
    "DuckDB recursive CTE).  parent(d) = min smaller-id near-dup "
    "neighbor gives a functional graph (out-degree <= 1, ids strictly "
    "decrease), so the recursion provably terminates with zero row "
    "explosion — total work = sum of chain depths, each iteration a "
    "hash join on (node).  The hop histogram is exactly why "
    "operators/clustering.py's pointer-jumping converges in O(log "
    "depth) BSP rounds; this query is the declarative-recursion twin "
    "of that iterative loop",
)
def dedup_parent_chain_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # each recursive step re-evaluates referenced relations — materialize
    # the pair table once or every iteration replays minhash signing
    # (16.5s -> ~4s at sf0.1)
    pairs = dedup_minhash_md5_pairs(spark, sf_dir).localCheckpoint()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return spark.sql(
        """
WITH RECURSIVE parent AS (
  SELECT id_b AS node, min(id_a) AS par FROM {pairs} GROUP BY id_b
),
chain(doc_id, cur, hop) AS (
  SELECT doc_id, doc_id, 0 FROM {docs}
  UNION ALL
  SELECT c.doc_id, p.par, c.hop + 1
  FROM chain c JOIN parent p ON p.node = c.cur
)
SELECT doc_id, max_by(cur, hop) AS root, CAST(max(hop) AS INT) AS hops
FROM chain GROUP BY doc_id ORDER BY doc_id
""",
        pairs=pairs,
        docs=docs,
    )


# Deterministic messy-URL builder shared by both engines (CASE on
# doc_id % 4): scheme case, www prefix, trailing slash, utm params,
# fragments — the variance a real crawl exhibits for ONE logical page.
_URL_SQL = """CASE doc_id % 4
  WHEN 0 THEN 'https://WWW.' || source || '.example/doc/' || doc_id
              || '/?utm_source=feed&ref=' || lang || '#top'
  WHEN 1 THEN 'https://' || source || '.example/doc/' || doc_id
              || '?ref=' || lang
  WHEN 2 THEN 'HTTP://' || source || '.example/doc/' || doc_id
              || '?utm_campaign=x'
  ELSE 'https://www.' || source || '.example/doc/' || doc_id || '/'
END"""


@register(
    "text_url_canonicalize",
    oracle=f"""
WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '://([^/]+)', 1)) AS host0,
         regexp_extract(url, '://[^/]*(/[^?#]*)', 1) AS path0,
         regexp_extract(url, '\\?([^#]*)', 1) AS query0
  FROM u
),
canon AS (
  SELECT doc_id, url,
         'https://' || regexp_replace(host0, '^www\\.', '')
         || regexp_replace(path0, '/$', '')
         || CASE WHEN len(kept) > 0
                 THEN '?' || list_aggregate(list_sort(kept), 'string_agg', '&')
                 ELSE '' END AS canonical
  FROM (SELECT doc_id, url, host0, path0,
               list_filter(string_split(query0, '&'),
                           p -> p <> '' AND p NOT LIKE 'utm_%') AS kept
        FROM parts)
)
SELECT doc_id, url, canonical,
       count(*) OVER (PARTITION BY canonical) AS n_same_canonical
FROM canon ORDER BY doc_id
""",
    doc="URL canonicalization (the dedup key of every web crawl): "
    "scheme/host-case folding, www and trailing-slash stripping, "
    "utm_* tracking-param removal, fragment drop, param sorting — "
    "Spark uses the real parse_url; the oracle recomputes with "
    "regexps over the same deterministically-messed URLs and must "
    "agree on every canonical form AND its duplicate count.  Pure "
    "per-row JVM expressions + one count window on the canonical key",
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    u = docs.selectExpr("doc_id", f"{_URL_SQL} AS url")
    host = F.regexp_replace(
        F.lower(F.parse_url("url", F.lit("HOST"))), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("")), r"/$", ""
    )
    kept = F.filter(
        F.split(F.coalesce(F.parse_url("url", F.lit("QUERY")), F.lit("")), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(
            F.size(kept) > 0,
            F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")),
        ).otherwise(F.lit("")),
    )
    w = Window.partitionBy("canonical")
    return (
        u.withColumn("canonical", canonical)
        .withColumn("n_same_canonical", F.count(F.lit(1)).over(w))
        .orderBy("doc_id")
    )


from ..operators.bpe import bpe_oracle_sql as _bpe_oracle_sql  # noqa: E402


@register(
    "text_bpe_train_merges",
    oracle=_bpe_oracle_sql(6),
    doc="tokenizer INDUCTION, not just application: the classic BPE "
    "training loop (Sennrich et al. 2016) learns 6 merges from the "
    "corpus vocabulary — per round, corpus-frequency-weighted adjacent "
    "symbol-pair counts, deterministic argmax (count desc, pair asc), "
    "leftmost-nonoverlapping merge via string replace on a "
    "separator-joined symbol encoding both engines implement "
    "identically.  The oracle unrolls all 6 rounds as CTE chains and "
    "must reproduce every winner — including round 6, whose winning "
    "pair contains a symbol learned in round 1 ('m'+'er'), proving the "
    "iteration feeds back.  Rounds iterate the distinct-word "
    "vocabulary, never the corpus; the per-round winner is a bounded "
    "1-row collect (driver coordinates, cluster counts)",
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train_merges

    # spread (round-12): the one corpus pass (explode+groupBy word
    # vocab) is CPU-bound over a single-row-group scan
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return bpe_train_merges(docs, "text", n_merges=6).orderBy("merge_rank")


@register(
    "text_bpe_train_merges_batched",
    oracle=_bpe_oracle_sql(12),
    doc="the BPE trainer's SCALE PATH: identical merge table, driver "
    "round-trips bounded at ~n_merges/batch instead of n_merges (at a "
    "real 32k-merge vocabulary the sequential loop is 32k Spark jobs). "
    "Per round the top `batch` candidates are fetched (bounded k-row "
    "collect) and the provably-safe prefix applied: pairwise "
    "symbol-disjoint, strictly above the best excluded count, and "
    "strictly above floor(cnt/2) after any l==r acceptance (the "
    "run-self-merge (aa,aa) bound) — so every accepted merge is one "
    "the sequential trainer would make, in the same order, by "
    "construction.  The oracle replays the SEQUENTIAL trainer (12 "
    "unrolled rounds): a hash match IS the parity proof under the "
    "driver gate",
)
def text_bpe_train_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train_merges_batched

    # spread (round-12): same corpus-pass rationale as the sequential
    # trainer above
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return bpe_train_merges_batched(docs, "text", n_merges=12, batch=8).orderBy(
        "merge_rank"
    )


from ..operators.bpe import bpe_apply_oracle_sql as _bpe_apply_oracle_sql  # noqa: E402


@register(
    "text_bpe_encode_compression",
    oracle=_bpe_apply_oracle_sql(6),
    doc="the train->apply loop closed: the 6 learned BPE merges encode "
    "every word and per-source compression (chars/token) is reported — "
    "the metric tokenizer builders actually optimize.  Encoding runs "
    "once per DISTINCT word (K string replaces over the vocabulary) "
    "and broadcast-joins back to the occurrence stream, which is "
    "scanned once and never carries symbols.  Oracle replays training "
    "AND application (word carried through the unrolled rounds, "
    "occurrence join in SQL)",
)
def text_bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode_stats

    # spread (round-12): vocab build + occurrence stream are CPU-bound
    # map passes over a single-row-group scan
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return bpe_encode_stats(docs, "text", "source", n_merges=6)
