"""BPE merge training — tokenizer induction as corpus-level DataFrame ops.

The registry's other text ops ANALYZE with a fixed tokenizer
(``text_bpe_token_counts`` applies a GPT-2-style pretokenizer regex);
this operator LEARNS one: the classic byte-pair-encoding training loop
(Sennrich et al. 2016, the tokenizer-construction algorithm behind
GPT/LLaMA vocabularies), run as iterative Spark jobs over the corpus
vocabulary.

Representation trick that keeps every round JVM-side AND exactly
replayable by a SQL oracle: a word's symbol sequence is its symbols
joined by an out-of-band separator (U+001F).  Then

- pair counting is a 2-gram zip_with over the split array, weighted by
  corpus word frequency (one groupBy per round — the vocabulary table,
  not the corpus, is what iterates, exactly like single-node BPE
  trainers);
- applying the winning merge is ``replace(sym, l||SEP||r, l||r)`` —
  string replace is left-to-right non-overlapping in both Spark and
  DuckDB, which IS BPE's leftmost-first merge semantics (verified:
  "a a a" under merge (a,a) -> "aa a");
- the argmax is deterministic: highest count, then lexicographically
  smallest (l, r) — both engines compare strings bytewise.

Scale shape: after the one corpus pass that builds (word, freq), every
round touches only the distinct-word vocabulary (|V| rows, shuffling
(symbol-pair, count) pairs).  The per-round winner is a bounded 1-row
collect — the driver coordinates rounds, the cluster counts pairs —
which is how distributed tokenizer training actually runs; at 100 TB
the corpus pass dominates and happens once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BPE_SEP = "\x1f"


def word_vocab(
    docs: DataFrame, text_col: str, keep_word: bool = False
) -> DataFrame:
    """(sym, freq): distinct lowercased whitespace words with corpus
    frequencies, symbols initialized to characters.  Words containing
    the separator byte are dropped (defensive; none exist in text)."""
    v = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter((F.length("w") > 0) & (~F.col("w").contains(BPE_SEP)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("sym", F.concat_ws(BPE_SEP, F.split(F.col("w"), "")))
    )
    return v.select("w", "sym", "freq") if keep_word else v.select("sym", "freq")


def bpe_train_merges(
    docs: DataFrame, text_col: str, n_merges: int = 6
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table — the
    model artifact a tokenizer ships — as (merge_rank, l, r, merged,
    pair_count), built from the per-round winners (a K-row
    driver-side result, like a trained centroid table)."""
    spark: SparkSession = docs.sparkSession
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=False)
    merges = []
    for k in range(n_merges):
        pairs = (
            vocab.withColumn("__a", F.split("sym", BPE_SEP))
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(__a, 1, greatest(size(__a)-1, 0)),"
                        "         slice(__a, 2, greatest(size(__a)-1, 0)),"
                        "         (x, y) -> struct(x AS l, y AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append((k, l, r, l + r, int(cnt)))
        vocab = vocab.withColumn(
            "sym",
            F.replace(F.col("sym"), F.lit(l + BPE_SEP + r), F.lit(l + r)),
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "merge_rank int, l string, r string, merged string, pair_count long"
    )


def _safe_merge_batch(
    ranked: list[tuple[str, str, int]],
) -> list[tuple[str, str, int]]:
    """Longest prefix of the ranked (l, r, cnt) candidates that the
    SEQUENTIAL trainer is guaranteed to pick in the same order.

    Three conditions, all required for exactness (not heuristics):

    - **pairwise symbol-disjoint prefix**: accepted pairs share no
      symbol (l, r, or the merged token l+r).  Merging (a,b) only
      changes counts of pairs touching a, b, or ab — disjoint pairs
      keep their exact counts through every merge in the batch.
    - **strict count cutoff**: every accepted count must be strictly
      greater than the best excluded candidate's.  A merge can CREATE
      pairs (x, ab) whose count is bounded by a conflicting parent
      pair — (x,a), (b,y), or (b,a) for the self-chain (ab,ab) — all
      of which share a symbol with the merge and therefore rank below
      the prefix, so strictness guarantees no such created pair can
      tie an accepted one and steal its turn via the lexicographic
      tie-break.
    - **run-self-merge bound**: the one created pair whose parent is
      NOT a conflicting lower-ranked pair is (aa,aa) from accepting
      (a,a) — its parent is the accepted pair itself (a run of n 'a's
      holds n-1 (a,a) pairs and floor(n/2)-1 (aa,aa) pairs, so
      count(aa,aa) <= floor(count(a,a)/2)).  Every acceptance after
      an l==r pair must exceed that bound strictly, or sequential
      could pick the created (aa,aa) first on a tie.

    Worst case (all candidates share symbols, or ties at the cutoff)
    degenerates to batch size 1 == the sequential trainer.
    """
    used: set[str] = set()
    accepted: list[tuple[str, str, int]] = []
    cutoff = None
    run_bound = -1  # max floor(cnt/2) over accepted l==r pairs
    for l, r, cnt in ranked:
        merged = l + r
        if l in used or r in used or merged in used or cnt <= run_bound:
            cutoff = cnt
            break
        used.update((l, r, merged))
        accepted.append((l, r, cnt))
        if l == r:
            run_bound = max(run_bound, cnt // 2)
    if cutoff is not None:
        accepted = [t for t in accepted if t[2] > cutoff]
    return accepted


def bpe_train_merges_batched(
    docs: DataFrame, text_col: str, n_merges: int = 6, batch: int = 8
) -> DataFrame:
    """EXACTLY the ``bpe_train_merges`` merge table, with driver
    round-trips bounded by ~n_merges/batch instead of n_merges.

    The sequential trainer is inherently one Spark job per merge (each
    merge depends on the last) — at a real 32k-merge vocabulary that
    is 32k driver round-trips.  This variant fetches the top ``batch``
    candidates per round (a bounded batch-row collect) and applies the
    provably-safe prefix (see ``_safe_merge_batch``): every accepted
    merge is one the sequential trainer would have made, in the same
    order, so the output — and the ``text_bpe_train_merges`` oracle
    hash — is identical by construction, not just empirically.
    Parity-tested against the sequential trainer and the tie-heavy
    adversarial corpus in tests/test_bpe_batched.py.
    """
    spark: SparkSession = docs.sparkSession
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = (
            vocab.withColumn("__a", F.split("sym", BPE_SEP))
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(__a, 1, greatest(size(__a)-1, 0)),"
                        "         slice(__a, 2, greatest(size(__a)-1, 0)),"
                        "         (x, y) -> struct(x AS l, y AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        want = min(batch, n_merges - len(merges))
        # fetch one extra row: the cutoff candidate the strictness
        # rule compares against (limit(want) alone couldn't see it)
        ranked = [
            (row["l"], row["r"], int(row["cnt"]))
            for row in pairs.orderBy(F.desc("cnt"), "l", "r")
            .limit(want + 1)
            .collect()
        ]
        if not ranked:
            break
        accepted = _safe_merge_batch(ranked)
        # the prefix rule may admit the sentinel row; never exceed want
        accepted = accepted[:want]
        if len(ranked) > want:
            # pairs OUTSIDE the fetched window have cnt <= the
            # sentinel's, and any of them conflicting with an accepted
            # merge can parent created pairs up to that count — the
            # strict cutoff must therefore also hold against the
            # sentinel, not only against in-window conflicts
            accepted = [t for t in accepted if t[2] > ranked[want][2]]
        if not accepted:
            # conflict at position 1 can't happen (prefix of 1 is
            # always safe unless the strict cutoff kills it: a tie
            # between rank-1 and rank-2 still picks rank-1 first in
            # BOTH trainers, so fall back to the single best pair)
            accepted = ranked[:1]
        sym = F.col("sym")
        for l, r, cnt in accepted:
            merges.append((len(merges), l, r, l + r, cnt))
            sym = F.replace(sym, F.lit(l + BPE_SEP + r), F.lit(l + r))
        vocab = vocab.withColumn("sym", sym).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "merge_rank int, l string, r string, merged string, pair_count long",
    )


def _bpe_cte_chain(
    n_merges: int, carry_word: bool, doc_where: str = ""
) -> tuple[str, str, list[str]]:
    """(cte_sql, final_vocab_cte, [winner_cte names]) — the training
    rounds unrolled as CTE chains (v0 -> p_k/b_k/v_{k+1}); chr(31) is
    the separator.  ``carry_word`` threads the original word through
    every round so an apply step can join back to occurrences.
    ``doc_where`` restricts the TRAINING corpus (e.g. a held-out
    split's complement); empty keeps the historical whole-corpus
    chain byte-for-byte."""
    wcol = "w, " if carry_word else ""
    where = f" WHERE {doc_where}" if doc_where else ""
    sql = f"""
WITH v0 AS MATERIALIZED (
  SELECT {wcol}array_to_string(string_split(w, ''), chr(31)) AS sym, freq FROM (
    SELECT w, count(*) AS freq FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents{where}
    ) WHERE length(w) > 0 AND NOT contains(w, chr(31))
    GROUP BY w)
)"""
    prev = "v0"
    winners = []
    for k in range(n_merges):
        sql += f""",
p{k} AS MATERIALIZED (
  SELECT l, r, sum(freq) AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(a)),
                  i -> {{'l': a[i], 'r': a[i+1]}}), recursive := true)
    FROM (SELECT string_split(sym, chr(31)) AS a, freq FROM {prev})
  ) GROUP BY l, r
),
b{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
v{k + 1} AS MATERIALIZED (
  SELECT {wcol}replace(sym, (SELECT l || chr(31) || r FROM b{k}),
                      (SELECT l || r FROM b{k})) AS sym, freq
  FROM {prev}
)"""
        winners.append(f"b{k}")
        prev = f"v{k + 1}"
    return sql, prev, winners


def bpe_oracle_sql(n_merges: int = 6) -> str:
    """DuckDB replay of the identical training loop."""
    sql, _, winners = _bpe_cte_chain(n_merges, carry_word=False)
    sel = [
        f"SELECT {k} AS merge_rank, l, r, l || r AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM {b}"
        for k, b in enumerate(winners)
    ]
    return sql + "\n" + " UNION ALL ".join(sel) + " ORDER BY merge_rank"


def bpe_apply_ctes(n_merges: int = 6, occ_cols: str = "source") -> str:
    """Shared train+apply CTE prefix: the unrolled training chain plus
    ``enc`` (word -> trained token count) and ``occ`` (the filtered
    word-occurrence stream carrying ``occ_cols``).  Both per-source
    compression (``bpe_apply_oracle_sql``) and the doc-grain budget
    oracle (queries/coverage_round14) extend this one text, so a
    tokenizer change can't leave one oracle on old behavior."""
    sql, final, _ = _bpe_cte_chain(n_merges, carry_word=True)
    return (
        sql
        + f""",
enc AS (
  SELECT w, len(string_split(sym, chr(31))) AS n_tok FROM {final}
),
occ AS (
  SELECT {occ_cols}, w FROM (
    SELECT {occ_cols},
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents
  ) WHERE length(w) > 0 AND NOT contains(w, chr(31))
)"""
    )


def bpe_apply_oracle_sql(n_merges: int = 6) -> str:
    """Train the merges AND apply them: per-source corpus compression
    stats from the encoded vocabulary joined back to occurrences."""
    return (
        bpe_apply_ctes(n_merges, "source")
        + """
SELECT o.source,
       CAST(sum(e.n_tok) AS BIGINT) AS bpe_tokens,
       CAST(sum(length(o.w)) AS BIGINT) AS n_chars,
       round(sum(length(o.w)) * 1.0 / sum(e.n_tok), 6) AS chars_per_token
FROM occ o JOIN enc e USING (w)
GROUP BY o.source
ORDER BY o.source"""
    )


def bpe_apply_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(w, n_tok): apply a FIXED ordered merge list to a word table
    carrying (w, sym) — the serving-side half of the tokenizer, split
    out (round 12) so a model trained on one split can encode another
    (fertility / OOV audits).  K string replaces in rank order, same
    leftmost-first semantics as training."""
    sym = F.col("sym")
    for l, r in merges:
        sym = F.replace(sym, F.lit(l + BPE_SEP + r), F.lit(l + r))
    return words.select("w", F.size(F.split(sym, BPE_SEP)).alias("n_tok"))


def bpe_encoded_vocab(
    docs: DataFrame, text_col: str, n_merges: int = 6
) -> DataFrame:
    """(w, n_tok): every distinct word with its trained-BPE token
    count — train ``n_merges`` merges, then apply them as K string
    replaces over the vocabulary symbols.  The encode step every
    apply-shaped query shares; encoding happens once per DISTINCT
    word, never on the occurrence stream."""
    merges = [
        (r["l"], r["r"])
        for r in bpe_train_merges(docs, text_col, n_merges).collect()
    ]
    enc = word_vocab(docs, text_col, keep_word=True)
    return bpe_apply_merges(enc, merges)


def bpe_word_occurrences(docs: DataFrame, text_col: str, *cols) -> DataFrame:
    """(*cols, w): the filtered word-occurrence stream — the SAME
    tokenize + filter as ``word_vocab``, carrying the caller's grain
    columns, so occurrence totals always reconcile with the vocab."""
    return docs.select(
        *cols,
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter((F.length("w") > 0) & (~F.col("w").contains(BPE_SEP)))


def bpe_encode_stats(
    docs: DataFrame, text_col: str, group_col: str, n_merges: int = 6
) -> DataFrame:
    """Train ``n_merges`` merges on the corpus, encode every word with
    them, and report per-group compression: (group, bpe_tokens,
    n_chars, chars_per_token).  Encoding happens once per DISTINCT
    word (the vocabulary, with the K merges applied as K string
    replaces) and broadcast-joins back to word occurrences — the
    occurrences stream is scanned once and never carries symbols."""
    enc = bpe_encoded_vocab(docs, text_col, n_merges)
    occ = bpe_word_occurrences(docs, text_col, group_col)
    return (
        occ.join(F.broadcast(enc), "w")
        .groupBy(group_col)
        .agg(
            F.sum("n_tok").cast("long").alias("bpe_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.round(
                F.sum(F.length("w")) / F.sum("n_tok"), 6
            ).alias("chars_per_token"),
        )
        .orderBy(group_col)
    )
