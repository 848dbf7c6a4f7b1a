"""Round-4 operator additions: sequence CEP, Count-Min sketch,
equi-depth histogram, SymSpell edit-distance join, bipartite PageRank.

Each closes a family gap rather than adding a variant: event-sequence
pattern matching with a time constraint (the MATCH_RECOGNIZE / Flink
CEP shape), a deterministic mergeable Count-Min sketch (completing the
sketch family next to HLL partials and Misra-Gries), equi-DEPTH
histograms (the quantile-binning twin of the equi-width
``agg_value_histogram``), a deletion-neighborhood edit-distance join
(the 9th dedup modality — typo-class near-dup, the SymSpell candidate
scheme), and PageRank (iterative graph analytics beyond connected
components).  All five are exactly replayable in DuckDB — including
the sketch and the 5 unrolled PageRank iterations.

Reference provenance: the reference has no analytics engine of its own
(consumer loop at consumer_to_opensearch.py:67-96; dashboards at
README.md:150-160); these are north-star extensions per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from . import register

# ------------------------------------------------ sequence CEP


@register(
    "cep_purchase_within_hour",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS v_ts
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
p AS (
  SELECT v.user_id, v.v_ts, min(e.ts) AS p_ts
  FROM v LEFT JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'purchase'
   AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 1 HOUR
  GROUP BY v.user_id, v.v_ts
)
SELECT p.user_id,
       CAST(p.p_ts IS NOT NULL AND count(er.event_id) = 0 AS BOOLEAN)
         AS converted,
       CASE WHEN p.p_ts IS NOT NULL AND count(er.event_id) = 0
            THEN CAST(date_diff('second', p.v_ts, p.p_ts) AS BIGINT)
            END AS secs_to_purchase
FROM p LEFT JOIN events er
  ON er.user_id = p.user_id AND er.event_type = 'error'
 AND er.ts > p.v_ts AND er.ts < p.p_ts
GROUP BY p.user_id, p.p_ts, p.v_ts
ORDER BY p.user_id
""",
    doc="MATCH_RECOGNIZE / Flink-CEP-shaped sequence detection: per "
    "user, did a purchase follow the FIRST view within one hour with "
    "no intervening error?  (view -> [^error]* -> purchase within 1h.) "
    "Three keyed stages — first-view agg, bounded-follow agg, "
    "absence check — all shuffling on user_id, so at 100 TB the plan "
    "is one partitioning reused across stages (AQE coalesces the "
    "co-partitioned joins); no window scans the full event history "
    "per row, and state per user is two timestamps, which is also the "
    "streaming formulation (applyInPandasWithState carrying v_ts/p_ts)",
)
def cep_purchase_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts_cand")
    )
    p = (
        v.join(
            pur,
            (v.user_id == pur.user_id)
            & (F.col("p_ts_cand") > F.col("v_ts"))
            & (
                F.col("p_ts_cand")
                <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")
            ),
            "left",
        )
        .groupBy(v.user_id, "v_ts")
        .agg(F.min("p_ts_cand").alias("p_ts"))
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts")
    )
    joined = p.join(
        err,
        (p.user_id == err.user_id)
        & (F.col("e_ts") > F.col("v_ts"))
        & (F.col("e_ts") < F.col("p_ts")),
        "left",
    )
    clean = F.col("p_ts").isNotNull() & (F.count("e_ts") == 0)
    return (
        joined.groupBy(p.user_id, "v_ts", "p_ts")
        .agg(
            clean.alias("converted"),
            F.when(
                clean,
                (
                    F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")
                ).cast("long"),
            ).alias("secs_to_purchase"),
        )
        .select("user_id", "converted", "secs_to_purchase")
        .orderBy("user_id")
    )


# ------------------------------------------------ Count-Min sketch

_CM_DEPTH = 3
_CM_WIDTH = 32


@register(
    "agg_count_min_probe",
    oracle=f"""
WITH toks AS (
  SELECT w FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) >= 3
),
cells AS (
  SELECT i, ('0x' || substr(md5(w), i * 8 + 1, 8))::BIGINT % {_CM_WIDTH}
           AS col, count(*) AS cnt
  FROM toks, (SELECT unnest(range({_CM_DEPTH})) AS i)
  GROUP BY 1, 2
),
probes AS (
  SELECT w, count(*) AS exact FROM toks GROUP BY w
)
SELECT p.w AS token,
       CAST(p.exact AS BIGINT) AS exact_cnt,
       CAST(min(c.cnt) AS BIGINT) AS cm_estimate,
       CAST(min(c.cnt) >= p.exact AS BOOLEAN) AS never_underestimates
FROM probes p
JOIN cells c
  ON c.col = ('0x' || substr(md5(p.w), c.i * 8 + 1, 8))::BIGINT
             % {_CM_WIDTH}
GROUP BY p.w, p.exact
ORDER BY token
""",
    doc="Count-Min sketch (Cormode & Muthukrishnan '05) built as a "
    "mergeable aggregate and probed for every distinct token, next to "
    "its exact count: depth 3 x width 32, hash rows = independent "
    "8-hex slices of one md5, so the sketch is DETERMINISTIC and "
    "DuckDB replays cell-for-cell — the oracle checks the estimates "
    "themselves plus the one-sided error invariant (est >= exact, "
    "always true by construction).  The cell table IS the merged "
    "sketch: groupBy (row, col) sum is map-side-combined, each "
    "partition contributes its partial sketch and merge = cell-wise "
    "add (Mergeable Summaries, PODS'12) — d*w = 96 counters total "
    "regardless of corpus size, vs the unbounded distinct universe a "
    "full groupBy would shuffle.  Width 32 is deliberately small so "
    "collisions actually occur at test scale and the estimate/exact "
    "gap is exercised; production sizing is w = ceil(e/eps)",
)
def agg_count_min_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the tokenize/explode pass is CPU-bound and the test
    # tables are single-row-group parquet (1 scan partition)
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        F.explode(
            F.split(F.lower(F.col("text")), "[^a-z]+")
        ).alias("w")
    ).filter(F.length("w") >= 3)
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(_CM_DEPTH - 1))
    ).alias("i")
    # Round-12 (guide §2.3 "aggregate before you shuffle"): the sketch
    # is built as a WEIGHTED update over the distinct-token counts —
    # cell count = sum of occurrence counts of the tokens hashing
    # there, exactly the integer the per-occurrence update produced —
    # so the corpus is tokenized ONCE (was twice) and md5 runs once
    # per DISTINCT token (was once per occurrence + 3x per probe).
    # The mergeable-aggregate story is unchanged: the distinct-token
    # table is itself the map-side-combined partial, and the weighted
    # cell add is the same cell-wise merge.
    probes = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact"))
        .withColumn("h", F.md5("w"))
        .localCheckpoint(eager=False)
    )
    cells = (
        probes.select("exact", rows, "h")
        .select(
            "i",
            F.conv(
                F.expr("substring(h, i * 8 + 1, 8)"), 16, 10
            ).cast("long").__mod__(_CM_WIDTH).alias("col"),
            "exact",
        )
        .groupBy("i", "col")
        .agg(F.sum("exact").alias("cnt"))
    )
    probe_cols = probes.select(
        "w", "exact", rows, "h"
    ).select(
        "w",
        "exact",
        "i",
        F.conv(
            F.expr("substring(h, i * 8 + 1, 8)"), 16, 10
        ).cast("long").__mod__(_CM_WIDTH).alias("col"),
    )
    return (
        probe_cols.join(F.broadcast(cells), ["i", "col"])
        .groupBy("w", "exact")
        .agg(F.min("cnt").alias("est"))
        .select(
            F.col("w").alias("token"),
            F.col("exact").cast("long").alias("exact_cnt"),
            F.col("est").cast("long").alias("cm_estimate"),
            (F.col("est") >= F.col("exact")).alias(
                "never_underestimates"
            ),
        )
        .orderBy("token")
    )


# ------------------------------------------------ equi-depth histogram


@register(
    "agg_equidepth_histogram",
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM ranked GROUP BY bin ORDER BY bin
""",
    doc="equi-DEPTH histogram (quantile binning): ntile(8) with a "
    "total tiebreak order, then per-bin count/lo/hi — the optimizer-"
    "statistics twin of the equi-width agg_value_histogram.  The "
    "global ntile is the scale caveat: a single-direction sort, which "
    "Spark executes as a range-partitioned sort (sampled boundaries), "
    "so at 100 TB this is the same cost class as sort_global_orders; "
    "the approximate alternative (approx_percentile boundaries + one "
    "scan of bucket assignment) is the production path when exact "
    "bin population parity doesn't matter",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_totalprice", F.ntile(8).over(w).alias("bin")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bin")
    )


# ------------------------------------------------ edit-distance join


@register(
    "dedup_edit_distance_pairs",
    oracle="""
WITH toks AS (
  SELECT DISTINCT w FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) >= 3
),
d0 AS (SELECT w, w AS v FROM toks),
d1 AS (
  -- position range derived from each token's own length via LATERAL
  -- (matches the Spark side's unbounded sequence(1, length(w)) —
  -- a fixed ceiling silently diverged for tokens past it)
  SELECT w, substr(w, 1, i - 1) || substr(w, i + 1) AS v
  FROM toks, LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i)
),
d2 AS (
  SELECT w, substr(v, 1, i - 1) || substr(v, i + 1) AS v
  FROM d1, LATERAL (SELECT unnest(range(1, length(v) + 1)) AS i)
),
vars AS (
  SELECT DISTINCT w, v FROM (
    SELECT * FROM d0 UNION ALL SELECT * FROM d1 UNION ALL
    SELECT * FROM d2)
),
cand AS (
  SELECT DISTINCT a.w AS w1, b.w AS w2
  FROM vars a JOIN vars b ON a.v = b.v AND a.w < b.w
)
SELECT w1, w2, CAST(levenshtein(w1, w2) AS BIGINT) AS dist
FROM cand WHERE levenshtein(w1, w2) <= 2
ORDER BY w1, w2
""",
    doc="the 9th dedup modality: typo-class near-duplicates via an "
    "edit-distance self-join with SymSpell deletion-neighborhood "
    "candidate generation (Garbe's scheme; sound AND complete: two "
    "strings within Levenshtein distance k always share a variant "
    "obtainable by <= k deletions from each — the alignment's "
    "unmatched positions).  Each distinct token emits O(len^2) "
    "delete-variants, candidates come from ONE equi-join on the "
    "variant string, and only candidates pay the O(mn) levenshtein — "
    "never the V^2 token cross-product, which is what makes the shape "
    "hold on a 100 TB vocabulary (variant table ~ V * len^2 rows, "
    "equi-join shuffles hash-partitioned variants; hot variants like "
    "short stems are the skew hazard and would get the same df-cap "
    "treatment as the Jaccard join's shingle cap)",
)
def dedup_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("w")
        )
        .filter(F.length("w") >= 3)
        .distinct()
    )
    # delete-variants up to depth 2, as one JVM-side HOF chain:
    # d1 = all single-deletes, d2 = single-deletes of d1
    d1 = F.expr(
        "transform(sequence(1, length(w)), "
        "i -> concat(substring(w, 1, i - 1), substring(w, i + 1)))"
    )
    vars_df = (
        toks.select(
            "w",
            F.explode(
                F.array_union(
                    F.array(F.col("w")),
                    F.expr(
                        "array_union("
                        " transform(sequence(1, length(w)),"
                        "  i -> concat(substring(w, 1, i - 1),"
                        "              substring(w, i + 1))),"
                        " flatten(transform("
                        "  transform(sequence(1, length(w)),"
                        "   i -> concat(substring(w, 1, i - 1),"
                        "               substring(w, i + 1))),"
                        "  v -> transform(sequence(1, length(v)),"
                        "   j -> concat(substring(v, 1, j - 1),"
                        "               substring(v, j + 1))))))"
                    ),
                )
            ).alias("v"),
        )
        .distinct()
    )
    a = vars_df.select(F.col("w").alias("w1"), "v")
    b = vars_df.select(F.col("w").alias("w2"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2")
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("w1", "w2").cast("long")
        )
        .filter(F.col("dist") <= 2)
        .orderBy("w1", "w2")
    )


# ------------------------------------------------ PageRank

_PR_ITERS = 5
_PR_DAMP = 0.85


def _pagerank_oracle() -> str:
    sql = """
WITH fwd AS MATERIALIZED (
  SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM fwd
  UNION ALL SELECT dst AS src, src AS dst FROM fwd
),
deg AS MATERIALIZED (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
),
n AS MATERIALIZED (SELECT count(*) AS n FROM deg),
r0 AS MATERIALIZED (SELECT src AS node, 1.0 / n.n AS rank FROM deg, n)"""
    prev = "r0"
    for k in range(_PR_ITERS):
        sql += f""",
r{k + 1} AS MATERIALIZED (
  SELECT e.dst AS node,
         (1 - {_PR_DAMP}) / n.n
           + {_PR_DAMP} * sum(r.rank / d.outdeg) AS rank
  FROM edges e
  JOIN {prev} r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  CROSS JOIN n
  GROUP BY e.dst, n.n
)"""
        prev = f"r{k + 1}"
    return (
        sql
        + f"""
SELECT node, round(rank, 10) AS rank
FROM {prev}
ORDER BY rank DESC, node LIMIT 20"""
    )


@register(
    "graph_pagerank_suppliers",
    oracle=_pagerank_oracle(),
    doc="PageRank over the bipartite customer-supplier purchase graph "
    "(edges = distinct (custkey, suppkey) pairs from orders x "
    "lineitem, bidirected so the chain is irreducible): 5 power "
    "iterations at damping 0.85 from the uniform vector, top-20 nodes. "
    " The iterative-graph twin of dedup_cluster_resolution: every "
    "iteration is join(rank, edges) + groupBy(dst) — rank and edge "
    "tables both hash-partitioned on the join key, so one partitioning "
    "is reused across all 5 rounds and data is never re-scanned; "
    "localCheckpoint truncates the growing lineage exactly as the CC "
    "operator does.  Bidirecting removes dangling nodes by "
    "construction (every node has outdegree >= 1), which is why no "
    "dangling-mass redistribution term is needed.  Deterministic: "
    "fixed iteration count and uniform start; DuckDB replays all 5 "
    "rounds as MATERIALIZED CTEs (inlining would be exponential) and "
    "the 10-dp rounded ranks hash-match — float association drift "
    "(~1e-15 relative on ~1e-3 ranks) is orders of magnitude inside "
    "the rounding margin",
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # node ids are LONGS through the iterations (customers even 2k,
    # suppliers odd 2k+1) and become the 'c<k>'/'s<k>' labels only in
    # the final projection: hashing/shuffling/comparing 8-byte longs
    # through 5 join+agg rounds measured 1.5x faster than string ids
    # on the sf0.1 graph (6.3s -> 4.2s loop time), and the rank values
    # are id-type-independent so the string-keyed oracle still matches
    fwd = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # node count as ONE bounded driver scalar (round-12): the previous
    # 1-row broadcast DataFrame was re-derived from `deg` inside every
    # iteration's plan — with the lazy checkpoints triggering AQE
    # materialization per round, that re-ran the edges->deg->count
    # aggregate 6 times (guide §1.2: don't recompute what you already
    # have).  The literal divisions below are the same IEEE doubles the
    # broadcast-column divisions produced (long / long -> double in the
    # JVM either way), so every rank value is bit-identical.
    n_nodes = deg.count()
    rank = deg.select(
        F.col("src").alias("node"),
        (F.lit(1.0) / F.lit(n_nodes)).alias("rank"),
    )
    contrib_edges = edges.join(
        deg.select("src", "outdeg"), "src"
    ).localCheckpoint(eager=False)
    # The 5 Lloyd-style power iterations chain as ONE lazy plan: the
    # per-iteration localCheckpoint was copying every (node, rank) row
    # into block storage each round AND (via AQE's eager toRdd) turning
    # each round into its own job wave — 41 jobs at build time measured
    # at sf0.1; without them the same 5 join+agg shuffles execute once
    # inside a single action (round-12: isolated warm 5.7 s -> see
    # OPTIMIZATION_r12.md; the plan stays 5 iterations deep, bounded).
    for _ in range(_PR_ITERS):
        rank = (
            contrib_edges.join(
                rank, contrib_edges.src == rank.node
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("__m"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(1 - _PR_DAMP) / F.lit(n_nodes)
                    + F.lit(_PR_DAMP) * F.col("__m")
                ).alias("rank"),
            )
        )
    return (
        rank.select(
            F.when(
                F.col("node") % 2 == 0,
                F.concat(
                    F.lit("c"), (F.col("node") / 2).cast("long")
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("s"), ((F.col("node") - 1) / 2).cast("long")
                )
            )
            .alias("node"),
            F.round("rank", 10).alias("rank"),
        )
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


# ------------------------------------------------ model inference

_LR_DIM = 64


@register(
    "ml_score_logreg",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % {_LR_DIM}
           AS idx
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
    FROM documents
  )
),
c AS (SELECT doc_id, idx, count(*) AS cnt FROM tk GROUP BY ALL),
dot AS (
  SELECT doc_id,
         CAST(sum(cnt * ((idx * 2654435761) % 1001 - 500)) AS BIGINT)
           AS dot_int
  FROM c GROUP BY doc_id
)
SELECT doc_id,
       dot_int,
       round(1.0 / (1.0 + exp(-(dot_int / 250000.0))), 6) AS score,
       CAST(1.0 / (1.0 + exp(-(dot_int / 250000.0))) >= 0.5 AS BOOLEAN)
         AS predicted
FROM dot ORDER BY doc_id
""",
    doc="batch model INFERENCE as a pure DataFrame program: logistic "
    "scoring over hashing-trick features (same md5-bucket map as "
    "ml_feature_hashing) with a broadcast weight vector — the shape "
    "of quality-classifier / fastText-style corpus filtering at 100 "
    "TB (one scan, per-row compute, no state).  The dot product is "
    "computed in INTEGER space (counts x integer weights derived from "
    "the bucket index) so it is exact and association-order-free "
    "across engines; exactly ONE float op per doc (the sigmoid) "
    "happens after aggregation, making the 6-dp rounded score "
    "engine-stable.  The weight table here is derived (a stand-in "
    "for trained parameters); a real deployment broadcast-joins the "
    "trained (idx, weight) table the same way",
)
def ml_score_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tk = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("term"),
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10)
            .cast("long")
            .__mod__(_LR_DIM)
            .alias("idx"),
        )
    )
    c = tk.groupBy("doc_id", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    w = (F.col("idx") * F.lit(2654435761)) % 1001 - 500
    dot = c.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * w).cast("long").alias("dot_int")
    )
    score = 1.0 / (1.0 + F.exp(-(F.col("dot_int") / 250000.0)))
    return dot.select(
        "doc_id",
        "dot_int",
        F.round(score, 6).alias("score"),
        (score >= 0.5).alias("predicted"),
    ).orderBy("doc_id")


# ------------------------------------------------ sweep-line concurrency


@register(
    "dash_peak_concurrency",
    oracle="""
WITH marks AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id,
         min(ts) AS s_start, max(ts) AS s_end
  FROM (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marks)
  GROUP BY user_id, sid
),
deltas AS (
  SELECT s_start AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT s_end + INTERVAL 1 SECOND AS t, -1 AS d FROM sessions
),
sweep AS (
  SELECT t, sum(sum(d)) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM deltas GROUP BY t
)
SELECT CAST(max(live) AS BIGINT) AS peak_concurrency,
       CAST(count(*) AS BIGINT) AS n_change_points
FROM sweep
""",
    doc="sweep-line interval analytics: peak concurrent user sessions. "
    "Sessions come from the same 30-min-gap sessionization as "
    "win_session_windows; each emits +1 at start and -1 just past its "
    "inclusive end, the change points are aggregated per timestamp "
    "(the map-side combine step — ties collapse BEFORE the running "
    "sum, which is what makes the sweep associative), and one "
    "cumulative sum over the ordered delta stream yields the live "
    "count.  The global ordered sum is the scale caveat — but it runs "
    "over CHANGE POINTS (2 per session), not events, and at 100 TB "
    "you'd partition the sweep by coarse time range and prefix-sum "
    "the per-range totals (a two-level scan), same cost class as "
    "sort_global_ordinal_scalable",
)
def dash_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # (ts, event_id): pin a total order among duplicate-ts peers
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marks = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w_order).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_order))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = (
        marks.withColumn("sid", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    deltas = sessions.select(
        F.col("s_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        sessions.select(
            (F.col("s_end") + F.expr("INTERVAL 1 SECOND")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w_sweep = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = (
        deltas.groupBy("t")
        .agg(F.sum("d").alias("dd"))
        .select("t", F.sum("dd").over(w_sweep).alias("live"))
    )
    return sweep.agg(
        F.max("live").cast("long").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("long").alias("n_change_points"),
    )


# ------------------------------------------------ market basket


@register(
    "basket_copurchase_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
FROM pairs
GROUP BY part_a, part_b
HAVING count(*) >= 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
""",
    doc="market-basket co-occurrence (the candidate-pair step of "
    "A-priori / the input to item-item recommenders): distinct "
    "(order, part) pairs self-joined per order, support >= 2, top-20. "
    " Pair volume is sum over orders of k^2 where k = items per order "
    "(TPC-H k <= 7) — bounded by the BASKET size, never by catalog or "
    "order count, which is the property that keeps this tractable at "
    "100 TB; degenerate mega-baskets (a cart with 10^4 items) would "
    "get the same cap-and-truncate treatment as the dedup joins' "
    "hot-shingle cap.  One shuffle on orderkey for the self-join, one "
    "on the pair for the count",
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


# ------------------------------------------------ sparse TF-IDF cosine

_TFIDF_DF_CAP = 100


@register(
    "sim_sparse_tfidf_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS a
  FROM documents
),
grams AS (
  -- positions generated from len(a) per document: no fixed ceiling
  -- that a long document could silently overflow (Spark side uses
  -- sequence(1, size-2) unbounded)
  SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS term
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(a) - 1, 1))) AS i)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM grams GROUP BY ALL),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
  HAVING count(*) <= {_TFIDF_DF_CAP}
),
n AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n * 1.0 / df.df) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b,
       round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN nrm na ON na.doc_id = d.doc_a
JOIN nrm nb ON nb.doc_id = d.doc_b
ORDER BY cosine DESC, doc_a, doc_b
LIMIT 20
""",
    doc="sparse-vector similarity via an inverted index: TF-IDF over "
    "word 3-grams, cosine between docs computed ONLY where they share "
    "a term (posting-list self-join + per-pair dot aggregation) — the "
    "sparse twin of dedup_embedding_cosine, and the join shape of "
    "every BM25/TF-IDF dedup pass.  Pair work is sum over terms of "
    "df^2, never N^2, and the df cap (<= {_TFIDF_DF_CAP}; max "
    "observed df at sf0.1 is 25, so the cap is headroom, not an "
    "approximation here) bounds the quadratic term exactly like the "
    "Jaccard join's shingle cap.  Norms aggregate per doc before the "
    "join, so the pair stage ships (doc, term, weight) scalars only; "
    "top-20 ordered on the ROUNDED cosine with id tiebreaks so the "
    "cutoff is cross-engine stable",
)
def sim_sparse_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # Round-12: tokenize ONCE per row into an intermediate column —
    # the previous single-expression form repeated
    # split(lower(trim(text))) five times per row (size + sequence +
    # three element_at probes; HOFs get no common-subexpression
    # elimination), and the intermediate alias below is referenced
    # enough times that CollapseProject keeps it materialized (the
    # with_shingles discipline).  Same 3-gram terms, bit-identical.
    toks = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__tk"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(__tk) >= 3 "
                "THEN transform(sequence(1, size(__tk) - 2), i -> concat("
                " element_at(__tk, i), ' ',"
                " element_at(__tk, i + 1), ' ',"
                " element_at(__tk, i + 2)))"
                "ELSE array() END"
            )
        ).alias("term"),
    )
    tf = grams.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _TFIDF_DF_CAP)
    )
    # count on the raw scan (metadata-served), not the spread
    # repartition — the old form shuffled every row to count them
    n = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("w"),
        )
    )
    # w feeds THREE consumers (both posting sides + the norms);
    # without truncation Catalyst re-derives the whole
    # explode->tf->df->join chain per consumer (plan audit counted 42
    # exchanges, 3.4s) — one localCheckpoint collapses it to the
    # materialized weight table reused three times
    w = w.localCheckpoint(eager=False)
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(20)
    )


# ------------------------------------------------ robust outliers (MAD)


@register(
    "ts_outliers_mad",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       round(d.med, 4) AS med,
       round(m.mad, 4) AS mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (
         WHERE d.adev > 3 * 1.4826 * m.mad) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type, d.med, m.mad
ORDER BY d.event_type
""",
    doc="robust outlier detection via median absolute deviation — the "
    "heavy-tail-safe twin of the z-score anomaly query "
    "(ts_anomaly_daily_values): per event type, median, MAD, and the "
    "count of values beyond 3 scaled MADs (1.4826 = consistency "
    "constant for normal data).  Exact medians are the scale caveat: "
    "each needs an ordered scan per group (Spark runs "
    "percentile(0.5) as a typed aggregate, fine for bounded group "
    "counts; an unbounded group universe would switch to "
    "approx_percentile's mergeable sketch).  Two aggregate passes by "
    "construction — MAD is a median OF deviations from a median — "
    "with the per-type medians broadcast back both times",
)
def ts_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n",
            "n_outliers",
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ regex sequence CEP


@register(
    "cep_regex_journey_patterns",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v'
                                    WHEN 'click' THEN 'c'
                                    WHEN 'purchase' THEN 'p'
                                    WHEN 'error' THEN 'e'
                                    ELSE 's' END, ''
                    ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT)
         AS browse_buy,
       CAST(len(regexp_extract_all(s, 'ec*e')) AS BIGINT)
         AS error_loops,
       CAST(regexp_matches(s, 'v.*p') AS BOOLEAN) AS ever_converted
FROM seq ORDER BY user_id
""",
    doc="regex CEP over symbolized journeys — the generalization of "
    "cep_purchase_within_hour to ARBITRARY sequence patterns: each "
    "user's ordered event types collapse to a one-char-per-event "
    "string (v/c/p/e/s), and patterns become plain regexes "
    "(browse-then-buy 'vc*p', error loops 'ec*e', any-conversion "
    "'v.*p') counted with leftmost non-overlapping semantics — which "
    "Java regex and RE2 agree on for these star-height-1 patterns.  "
    "One shuffle (the per-user ordered agg); the symbol string is "
    "bounded by events-per-user, the per-key state a streaming "
    "version would carry.  At 100 TB journeys stay kilobytes because "
    "the alphabet is event TYPES, and a hot user with millions of "
    "events would be windowed first (the session or time-bucket ops) "
    "— the same cap discipline as the dedup joins",
)
def cep_regex_journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .otherwise("s")
    )
    seq = (
        ev.select("user_id", "ts", "event_id", sym.alias("sym"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(ts, event_id, sym))), x -> x.sym)"
                ),
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        F.size(F.expr("regexp_extract_all(s, 'vc*p', 0)"))
        .cast("long")
        .alias("browse_buy"),
        F.size(F.expr("regexp_extract_all(s, 'ec*e', 0)"))
        .cast("long")
        .alias("error_loops"),
        F.expr("s rlike 'v.*p'").alias("ever_converted"),
    ).orderBy("user_id")


# ------------------------------------------------ CUSUM change-point


@register(
    "ts_cusum_drift",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         round(sum(value), 2) AS total
  FROM events GROUP BY 1
),
base AS (
  SELECT avg(total) AS mu, stddev_samp(total) AS sigma
  FROM (SELECT total FROM daily ORDER BY day LIMIT 10)
),
s AS (
  SELECT d.day, d.total, b.mu, b.sigma,
         sum(d.total - b.mu - 0.5 * b.sigma) OVER w AS s_hi,
         sum(d.total - b.mu + 0.5 * b.sigma) OVER w AS s_lo
  FROM daily d CROSS JOIN base b
  WINDOW w AS (ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT day, total, mu, sigma,
         s_hi - min(s_hi) OVER w AS cusum_hi,
         max(s_lo) OVER w - s_lo AS cusum_lo
  FROM s
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT day, total,
       round(cusum_hi, 4) AS cusum_hi,
       round(cusum_lo, 4) AS cusum_lo,
       CAST(cusum_hi > 4 * sigma OR cusum_lo > 4 * sigma AS BOOLEAN)
         AS drift
FROM c ORDER BY day
""",
    doc="CUSUM change-point detection over the daily value series — "
    "the sequential-drift twin of the point-anomaly ops (z-score, "
    "MAD): baseline mean/std from the first 10 days, slack k=0.5 "
    "sigma, threshold h=4 sigma.  The textbook recursion "
    "C_t = max(0, C_{t-1} + dev_t) is NOT a window aggregate, but its "
    "closed form IS: C_t = S_t - min_{j<=t} S_j for the running "
    "deviation sum S — two stacked window passes (cumsum, then "
    "running extreme of the cumsum), both engines express it "
    "declaratively and whole-stage-codegen it.  The window is "
    "unpartitioned but runs over DAYS (one row per day after the "
    "aggregate), so the single-partition stage is bounded by the "
    "calendar, not the data",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    first10 = daily.orderBy("day").limit(10)
    base = first10.agg(
        F.avg("total").alias("mu"),
        F.stddev_samp("total").alias("sigma"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = daily.join(F.broadcast(base)).select(
        "day",
        "total",
        "mu",
        "sigma",
        F.sum(
            F.col("total") - F.col("mu") - 0.5 * F.col("sigma")
        ).over(w).alias("s_hi"),
        F.sum(
            F.col("total") - F.col("mu") + 0.5 * F.col("sigma")
        ).over(w).alias("s_lo"),
    )
    c = s.select(
        "day",
        "total",
        "sigma",
        (F.col("s_hi") - F.min("s_hi").over(w)).alias("cusum_hi"),
        (F.max("s_lo").over(w) - F.col("s_lo")).alias("cusum_lo"),
    )
    return c.select(
        "day",
        "total",
        F.round("cusum_hi", 4).alias("cusum_hi"),
        F.round("cusum_lo", 4).alias("cusum_lo"),
        (
            (F.col("cusum_hi") > 4 * F.col("sigma"))
            | (F.col("cusum_lo") > 4 * F.col("sigma"))
        ).alias("drift"),
    ).orderBy("day")


# ------------------------------------------------ A/B significance


@register(
    "ab_test_conversion",
    oracle="""
WITH assign AS (
  SELECT user_id,
         ('0x' || substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 8))
           ::BIGINT % 2 AS arm,
         max(CASE WHEN event_type = 'purchase'
                    AND ts < TIMESTAMP '2024-01-03' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
agg AS (
  SELECT arm, count(*) AS n, sum(converted) AS conv
  FROM assign GROUP BY arm
),
wide AS (
  SELECT
    max(CASE WHEN arm = 0 THEN n END) AS n_a,
    max(CASE WHEN arm = 1 THEN n END) AS n_b,
    max(CASE WHEN arm = 0 THEN conv END) AS conv_a,
    max(CASE WHEN arm = 1 THEN conv END) AS conv_b
  FROM agg
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       round(conv_a * 1.0 / n_a, 6) AS rate_a,
       round(conv_b * 1.0 / n_b, 6) AS rate_b,
       round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
             / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 4) AS z_stat,
       CAST(abs((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
             / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS BOOLEAN)
         AS significant_95
FROM wide
""",
    doc="two-proportion z-test on deterministically hash-assigned "
    "arms — the experimentation-platform readout: users split by "
    "md5('ab1:'||id)%2 (the salted-hash assignment real A/B systems "
    "use, reproducible across engines and runs, no RNG), per-user "
    "conversion = a purchase inside the first-two-day window "
    "(any-purchase saturates to p=1 over the 30-day fixture and "
    "zeroes the pooled variance), pooled-variance z and the 95% "
    "verdict.  One user-level aggregate, one 2-row arm aggregate, "
    "one pivot — entirely map-side-combinable; at 100 TB the "
    "per-user dedup is the only shuffle",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    early = (F.col("event_type") == "purchase") & (
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    assign = ev.groupBy("user_id").agg(
        F.max(F.when(early, 1).otherwise(0)).alias("converted")
    ).select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1:"), F.col("user_id"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .__mod__(2)
        .alias("arm"),
        "converted",
    )
    agg = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = agg.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    ra = F.col("conv_a") / F.col("n_a")
    rb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = (ra - rb) / F.sqrt(
        pp * (1 - pp) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


# ------------------------------------------------ correlation matrix


@register(
    "agg_corr_matrix_lineitem",
    oracle="""
SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
       round(corr(l_quantity, l_extendedprice), 6) AS r
FROM lineitem
UNION ALL
SELECT 'quantity', 'discount', round(corr(l_quantity, l_discount), 6)
FROM lineitem
UNION ALL
SELECT 'quantity', 'tax', round(corr(l_quantity, l_tax), 6)
FROM lineitem
UNION ALL
SELECT 'extendedprice', 'discount',
       round(corr(l_extendedprice, l_discount), 6)
FROM lineitem
UNION ALL
SELECT 'extendedprice', 'tax', round(corr(l_extendedprice, l_tax), 6)
FROM lineitem
UNION ALL
SELECT 'discount', 'tax', round(corr(l_discount, l_tax), 6)
FROM lineitem
ORDER BY col_a, col_b
""",
    doc="pairwise Pearson correlation matrix over the lineitem "
    "measures in ONE aggregation pass: all six corr() aggregates "
    "share the single scan and each is a moments accumulator "
    "(sum x, sum y, sum xy, sum x2, sum y2, n) that combines "
    "map-side — the feature-analysis prelude every modeling pipeline "
    "runs, at a cost independent of row count beyond the scan.  "
    "Long-form (col_a, col_b, r) output; the oracle's UNION of six "
    "single-corr scans is the semantic spec while the engine runs "
    "one multi-aggregate pass — same values, different plan, which "
    "is the point",
)
def agg_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("quantity", "extendedprice", "l_quantity", "l_extendedprice"),
        ("quantity", "discount", "l_quantity", "l_discount"),
        ("quantity", "tax", "l_quantity", "l_tax"),
        ("extendedprice", "discount", "l_extendedprice", "l_discount"),
        ("extendedprice", "tax", "l_extendedprice", "l_tax"),
        ("discount", "tax", "l_discount", "l_tax"),
    ]
    wide = li.agg(
        *[
            F.round(F.corr(ca, cb), 6).alias(f"{a}|{b}")
            for a, b, ca, cb in pairs
        ]
    )
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"`{a}|{b}`").alias("r"),
                    )
                    for a, b, _, _ in pairs
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.col_a", "p.col_b", "p.r").orderBy(
        "col_a", "col_b"
    )


# ------------------------------------------------ winsorization


@register(
    "prep_winsorize_values",
    oracle="""
WITH bounds AS (
  SELECT event_type,
         quantile_disc(value, 0.01) AS lo,
         quantile_disc(value, 0.99) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE e.value < b.lo) AS BIGINT)
         AS n_clipped_lo,
       CAST(count(*) FILTER (WHERE e.value > b.hi) AS BIGINT)
         AS n_clipped_hi,
       round(avg(greatest(b.lo, least(b.hi, e.value))), 4)
         AS winsorized_mean,
       round(avg(e.value), 4) AS raw_mean
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
""",
    doc="percentile winsorization — the robust-preprocessing step "
    "(clip to [P1, P99] per group) every feature pipeline applies "
    "before scale-sensitive math: per-type discrete percentile "
    "bounds (percentile_disc picks an actual data value, identical "
    "on both engines — no interpolation drift), broadcast back, "
    "clip with greatest/least, report clipped counts and the "
    "mean-shift.  Two aggregate passes (bounds, then clipped stats), "
    "the bounds table is group-count-sized and broadcast — at 100 TB "
    "the second pass is the only full scan and it carries no state "
    "beyond the running means",
)
def prep_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)")
        .alias("lo"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)")
        .alias("hi"),
    )
    clipped = F.greatest(
        F.col("lo"), F.least(F.col("hi"), F.col("value"))
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("value") < F.col("lo"), 1).otherwise(0)
            ).cast("long").alias("n_clipped_lo"),
            F.sum(
                F.when(F.col("value") > F.col("hi"), 1).otherwise(0)
            ).cast("long").alias("n_clipped_hi"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
        )
        .orderBy("event_type")
    )
