"""Full-text relevance ranking: BM25 and TF-IDF over the documents
table, both under the exact DuckDB oracle gate.

The reference's serving layer is OpenSearch (consumer_to_opensearch.py
indexes into it; README.md's query section searches it), and
OpenSearch's `match` query scores hits with BM25.  These queries
re-express that relevance model relationally — no inverted index, but
the same math — so a user of the reference's search path has a Spark
twin for it:

- ``search_bm25_ranking`` — Okapi BM25 (k1=1.2, b=0.75) of a fixed
  term query against every document, top-20 by score.
- ``text_tfidf_top_terms`` — the classic doc-term matrix reduction:
  per-source top-5 terms by summed TF-IDF.

Scale shape: one explode of the token stream (shuffle ~ corpus token
count, with map-side partial aggregation collapsing it to distinct
(doc, term) pairs first), then small statistics tables (df per term,
one global row for N/avgdl) that broadcast back.  Everything is JVM
built-ins; floats cross the oracle boundary as integer-count ×
single-log products so both engines compute bit-identical doubles
(modulo 1-ulp libm differences absorbed by round()).

At 100 TB the tf table is the big intermediate: it is exactly the
posting list of an inverted index, so persisting it bucketed by term
IS index construction — the queries here are the "query-time" half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register

# OpenSearch match-query defaults
K1 = 1.2
B = 0.75

QUERY_TERMS = ["join", "window", "vector"]

_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, source, dl, term) token stream with per-doc length."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )


@register(
    "search_bm25_ranking",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         len({_TOKS_SQL}) AS dl,
         unnest({_TOKS_SQL}) AS term
  FROM documents
),
gstats AS (
  SELECT count(*) AS n_docs, avg(len({_TOKS_SQL})) AS avgdl FROM documents
),
tf AS (
  SELECT doc_id, source, dl, term, count(*) AS tf
  FROM toks
  WHERE term IN ({", ".join(f"'{t}'" for t in QUERY_TERMS)})
  GROUP BY ALL
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.doc_id, t.source, t.dl,
         sum(ln(1 + (g.n_docs - d.df + 0.5) / (d.df + 0.5))
             * t.tf * ({K1} + 1)
             / (t.tf + {K1} * (1 - {B} + {B} * t.dl / g.avgdl))) AS s
  FROM tf t JOIN df d USING (term) CROSS JOIN gstats g
  GROUP BY t.doc_id, t.source, t.dl
)
SELECT doc_id, source, dl, round(s, 6) AS score
FROM scored
ORDER BY round(s, 6) DESC, doc_id
LIMIT 20
""",
    doc="Okapi BM25 top-20 for the query 'join window vector' — the "
    "relational twin of the reference's OpenSearch match query "
    "(k1=1.2, b=0.75).  One token explode with map-side combine, then "
    "broadcast-sized df/global stats joined back",
)
def search_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    # global stats straight off the documents table (mirrors the
    # oracle's gstats CTE): count + avg of the per-row token-array
    # size — no explode, no token-stream shuffle.  The previous
    # groupBy(doc_id) over the exploded stream shuffled every token
    # occurrence to recover a number already known per row.
    glob = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(QUERY_TERMS))
        .groupBy("doc_id", "source", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * F.col("tf")
        * (K1 + 1)
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(glob))
        .groupBy("doc_id", "source", "dl")
        .agg(F.sum(term_score).alias("s"))
    )
    return (
        scored.select(
            "doc_id", "source", "dl", F.round("s", 6).alias("score")
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, unnest({_TOKS_SQL}) AS term FROM documents
),
tf AS (
  SELECT doc_id, source, term, count(*) AS tf FROM toks GROUP BY ALL
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
st AS (SELECT source, term, sum(tf) AS total_tf FROM tf GROUP BY ALL)
SELECT source, term,
       round(total_tf * ln((n_docs + 1.0) / (df + 1.0)), 4) AS tfidf
FROM st CROSS JOIN n JOIN df USING (term)
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY total_tf * ln((n_docs + 1.0) / (df + 1.0)) DESC, term
) <= 5
ORDER BY source, tfidf DESC, term
""",
    doc="doc-term matrix reduction: per-source top-5 terms by summed "
    "TF-IDF (smoothed ln((N+1)/(df+1))).  The per-(source,term) sum is "
    "an integer, so the double crossing the oracle boundary is one "
    "count x one log — bit-stable across engines",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        _tokens(docs)
        .groupBy("doc_id", "source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    st = tf.groupBy("source", "term").agg(F.sum("tf").alias("total_tf"))
    tfidf = F.col("total_tf") * F.log(
        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
    )
    w = Window.partitionBy("source").orderBy(F.desc(tfidf), "term")
    return (
        st.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("source", "term", F.round(tfidf, 4).alias("tfidf"))
        .orderBy("source", F.desc("tfidf"), "term")
    )


@register(
    "search_fuzzy_match",
    oracle="""
WITH toks AS (
  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
),
probes AS (
  SELECT unnest(['jion', 'hsah', 'bacth', 'partitoin']) AS probe
)
SELECT p.probe, t.token,
       CAST(levenshtein(p.probe, t.token) AS INTEGER) AS dist
FROM probes p JOIN toks t ON levenshtein(p.probe, t.token) <= 2
ORDER BY p.probe, dist, t.token
""",
    doc="fuzzy term matching (the OpenSearch `fuzzy`/`match` "
    "fuzziness=2 query, README.md's search DSL): misspelled probes "
    "against the DISTINCT analyzed-token universe by Levenshtein "
    "edit distance.  Scale shape: dedup the token universe FIRST "
    "(distinct tokens << token stream), then a broadcast "
    "nested-loop against the tiny probe set — the edit-distance "
    "scan never touches the corpus itself, mirroring how a fuzzy "
    "query walks an index's term dictionary, not its postings",
)
def search_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("token"))
        .distinct()
    )
    probes = spark.createDataFrame(
        [("jion",), ("hsah",), ("bacth",), ("partitoin",)], "probe string"
    )
    return (
        toks.crossJoin(F.broadcast(probes))
        .withColumn(
            "dist", F.levenshtein("probe", "token").cast("int")
        )
        .filter(F.col("dist") <= 2)
        .select("probe", "token", "dist")
        .orderBy("probe", "dist", "token")
    )
