"""LLM-pipeline batch 14 (round 9): the next curation asks from the r8
verdict —

- maximal duplicate spans (``q_max_dup_span``): exact substring dedup at
  the Lee et al. granularity — the longest verbatim token runs (>= 50
  tokens) shared across documents, found suffix-array-free via sorted
  shingle runs (extends q_duplicate_spans from fixed-8 spans to MAXIMAL
  spans);
- Stupid-backoff trigram LM (``q_stupid_backoff``): per-document mean
  trigram surprisal under a train-split trigram model with the Brants et
  al. 0.4-backoff chain (trigram -> bigram -> unigram -> OOV floor) — the
  higher-order cousin of q_kn_doc_surprisal, and the LM-scoring shape
  used at web scale precisely because it needs no discount bookkeeping;
- cross-lingual alignment eval (``q_bitext_precision``): precision@k of
  the CCMatrix ratio-margin miner against a planted parallel set (anchor
  2i <-> candidate 2i+1) — the eval a bitext pipeline runs before
  trusting mined pairs for training (reuses q_bitext_mining's relational
  matmul via the shared _bitext_margin_frame);
- data attribution proxy (``q_source_attribution``): per-source mean
  EXCESS loss (weak minus strong scorer) leaderboard on the RHO
  learnability scorers — the influence-function-free answer to "which
  sources contribute the most learnable data", i.e. a datamodels-style
  source-level attribution at aggregation cost instead of retraining
  cost.

Determinism discipline (the llm13 rules): every statistic is integer
ppm/micro BIGINT arithmetic with non-negative division numerators (Spark
``div`` == DuckDB ``//`` there); LN only ever sees exact integer-valued
ratios (the q_unigram_surprisal precedent); every top-k carries a total
tiebreak order and rides orderBy().limit() (TakeOrderedAndProject, the
round-9 llm13 rewrite shape) — no unpartitioned rank windows over
unbounded tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators.dedup import normalize_text
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

_NORM = "REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')"


# ---------------------------------------------------------------------------
# Maximal duplicate spans (exact substring dedup, Lee et al. granularity)
# ---------------------------------------------------------------------------

_SPAN_K = 8  # shingle width: a length-L duplicated run = L-K+1 dup shingles
_SPAN_MIN_TOKENS = 50  # Lee et al.'s "substantial duplication" threshold
_SPAN_TOPN = 20


def _max_span_oracle() -> str:
    return f"""
    WITH t AS (
        SELECT doc_id,
               LIST_FILTER(STRING_SPLIT({_NORM}, ' '), x -> x != '') AS w
        FROM documents
    ), s AS MATERIALIZED (
        SELECT doc_id, i AS pos,
               ARRAY_TO_STRING(w[i : i + {_SPAN_K - 1}], ' ') AS span
        FROM t, UNNEST(GENERATE_SERIES(1, LEN(w) - {_SPAN_K - 1})) AS u(i)
        WHERE LEN(w) >= {_SPAN_K}
    ), pd AS (
        SELECT span, doc_id FROM s GROUP BY 1, 2
    ), dup AS MATERIALIZED (
        SELECT span FROM pd GROUP BY span HAVING COUNT(*) >= 2
    ), flag AS (
        SELECT s.doc_id, s.pos FROM s JOIN dup USING (span)
    ), runs AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM flag
    ), agg AS (
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS start_pos,
               CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
        FROM runs GROUP BY doc_id, grp
    )
    SELECT doc_id, start_pos, span_tokens
    FROM agg WHERE span_tokens >= {_SPAN_MIN_TOKENS}
    ORDER BY span_tokens DESC, doc_id, start_pos LIMIT {_SPAN_TOPN}
    """


@register(
    "q_max_dup_span",
    oracle=_max_span_oracle(),
    tags=("llm", "dedup", "substring", "spans", "lee-et-al"),
)
def q_max_dup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL cross-document duplicated substrings >= 50 tokens (the Lee
    et al. "Deduplicating Training Data Makes Language Models Better"
    granularity), suffix-array-free: a token run of length L is
    duplicated across docs iff all of its L-K+1 overlapping K-shingles
    are (K=8 — the necessary condition the shingle-run form flags), so
    maximal runs fall out of a gaps-and-islands pass over the flagged
    shingle POSITIONS. Extends q_duplicate_spans (fixed-8 spans) to the
    maximal-span report a dedup pipeline actually cuts on.

    Plan: one scan explodes positions+shingles; ONE repartition(span)
    exchange is shared by the dup-set aggregate (grouping on (span,
    doc_id) and then (span) — subset-key clustering, the r5 lesson) and
    the flag join, so the explode subtree executes once; the island
    grouping is a per-doc window (keyed on doc_id, never global) and the
    final top-20 rides TakeOrderedAndProject. Shuffle is O(tokens) on
    the span key; boilerplate-heavy span skew is AQE-split. At 100 TB
    the span string key would be swapped for a 60-bit md5 (the
    q_dedup_minhash portable-hash twin) to shrink shuffle bytes — kept
    as the string here so the oracle is trivially identical."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(normalize_text(F.col("text")), " "),
            lambda w: F.length(w) > 0,
        ).alias("w"),
    ).filter(F.size("w") >= _SPAN_K)
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(w) - {_SPAN_K - 1}),"
                f" i -> array_join(slice(w, i, {_SPAN_K}), ' '))"
            )
        ).alias("j", "span"),
    ).select("doc_id", (F.col("j") + 1).alias("pos"), "span")
    # One exchange on span serves both consumers: the (span, doc_id)
    # aggregate and the dup-flag join both cluster on span.
    spans = spans.repartition("span")
    dup = (
        spans.select("span", "doc_id")
        .groupBy("span", "doc_id")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span")
    )
    flag = spans.join(dup, "span").select("doc_id", "pos")
    from pyspark.sql.window import Window

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    runs = flag.select(
        "doc_id", "pos", (F.col("pos") - F.row_number().over(w_doc)).alias("grp")
    )
    agg = runs.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("start_pos"),
        (F.count(F.lit(1)) + (_SPAN_K - 1)).cast("long").alias("span_tokens"),
    )
    return (
        agg.filter(F.col("span_tokens") >= _SPAN_MIN_TOKENS)
        .select("doc_id", "start_pos", "span_tokens")
        .orderBy(F.desc("span_tokens"), "doc_id", "start_pos")
        .limit(_SPAN_TOPN)
    )


# ---------------------------------------------------------------------------
# Stupid-backoff trigram LM document scoring
# ---------------------------------------------------------------------------

_SB_TOPN = 20


def _sb_oracle() -> str:
    return f"""
    WITH tr AS (
        SELECT STRING_SPLIT({_NORM}, ' ') AS words
        FROM documents WHERE doc_id % 2 = 0
    ), tg AS (
        SELECT words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS t
        FROM tr, UNNEST(GENERATE_SERIES(1, LEN(words) - 2)) AS u(i)
        WHERE LEN(words) >= 3
    ), cnt AS MATERIALIZED (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS c123 FROM tg GROUP BY 1
    ), tri0 AS (
        SELECT t,
               SPLIT_PART(t, ' ', 1) || ' ' || SPLIT_PART(t, ' ', 2) AS b12,
               SPLIT_PART(t, ' ', 2) || ' ' || SPLIT_PART(t, ' ', 3) AS b23,
               SPLIT_PART(t, ' ', 3) AS w3, c123
        FROM cnt
    ), tri AS MATERIALIZED (
        SELECT t, b23, w3, c123,
               CAST(SUM(c123) OVER (PARTITION BY b12) AS BIGINT) AS c12
        FROM tri0
    ), tri_j AS (
        SELECT t, c123, c12 FROM tri
    ), big0 AS (
        SELECT b23, CAST(SUM(c123) AS BIGINT) AS c23 FROM tri GROUP BY 1
    ), big AS MATERIALIZED (
        SELECT b23, c23,
               CAST(SUM(c23) OVER (PARTITION BY SPLIT_PART(b23, ' ', 1))
                    AS BIGINT) AS c2
        FROM big0
    ), uni0 AS (
        SELECT w3, CAST(SUM(c123) AS BIGINT) AS c3 FROM tri GROUP BY 1
    ), uni AS MATERIALIZED (
        SELECT w3, c3, CAST(SUM(c3) OVER () AS BIGINT) AS n FROM uni0
    ), ev AS (
        SELECT doc_id,
               words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS t,
               words[i + 1] || ' ' || words[i + 2] AS b23,
               words[i + 2] AS w3
        FROM (SELECT doc_id, STRING_SPLIT({_NORM}, ' ') AS words
              FROM documents WHERE doc_id % 2 = 1),
             UNNEST(GENERATE_SERIES(1, LEN(words) - 2)) AS u(i)
        WHERE LEN(words) >= 3
    ), s AS (
        SELECT ev.doc_id,
               CASE
                   WHEN tri_j.c123 IS NOT NULL THEN
                       GREATEST((1000000 * tri_j.c123) // tri_j.c12, 1)
                   WHEN big.c23 IS NOT NULL THEN
                       GREATEST((2000000 * big.c23) // (5 * big.c2), 1)
                   WHEN uni.c3 IS NOT NULL THEN
                       GREATEST((4000000 * uni.c3) // (25 * uni.n), 1)
                   ELSE 1
               END AS s_ppm
        FROM ev
        LEFT JOIN tri_j USING (t)
        LEFT JOIN big USING (b23)
        LEFT JOIN uni USING (w3)
    ), sc AS (
        SELECT doc_id,
               CAST(FLOOR(-LN(s_ppm / 1000000.0) * 1000000 + 0.5) AS BIGINT)
                   AS sup
        FROM s
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(sup) // COUNT(*) AS BIGINT) AS mean_surprisal_micro
    FROM sc GROUP BY 1
    ORDER BY mean_surprisal_micro DESC, doc_id LIMIT {_SB_TOPN}
    """


@register(
    "q_stupid_backoff",
    oracle=_sb_oracle(),
    tags=("llm", "lm", "stupid-backoff", "trigram", "quality"),
)
def q_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation"): train trigram counts on the
    even-doc_id split, score every odd-doc_id document's trigrams with
    the backoff chain

        S(w3|w1w2) = c123/c12                 if the trigram was seen
                   = 0.4 * c23/c2             else if (w2,w3) was seen
                   = 0.4^2 * c3/N             else if w3 was seen
                   = 1 ppm                    else (OOV floor)

    and report the top-20 highest mean-surprisal documents — the
    higher-order upgrade of q_kn_doc_surprisal that catches word-ORDER
    anomalies at trigram range, in the un-normalized score form used at
    web scale precisely because it needs no discount bookkeeping. The
    0.4 factors ride as exact rationals (2/5, 4/25) so every score is an
    integer ppm with a non-negative numerator; the per-trigram surprisal
    floors ONCE to micro-nats and everything downstream is exact BIGINT.

    Plan: the trigram-type training table comes from the process-shared
    corpus.ngram_types spool (ONE train corpus scan per process — the
    trade_edges pattern, r9 VERDICT #2; three backoff tables derive from
    it with divergent column pruning, which kills exchange reuse — the
    r4 lesson — so spooling is also what keeps a single call's train
    scan at exactly one); the prefix marginal
    (c12) rides a WINDOW over the type table (the kn_bigram_probs
    shape), the (w2,w3)/w3 tables are re-aggregates of the spool, and N
    is a 1-row broadcast scalar frame (never an unpartitioned window).
    Scoring re-scans the corpus once for the eval split and
    key-partition-joins the three type tables. Two corpus scans total —
    train and score — the honest minimum for a train-then-apply model;
    every join is keyed, every aggregate is vocabulary-bounded, the
    top-20 rides TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    words = F.split(normalize_text(F.col("text")), " ")

    def trigrams(df: DataFrame) -> DataFrame:
        staged = df.select(
            "doc_id", words.alias("__w")
        ).filter(F.size("__w") >= 3)
        return staged.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w) - 2),"
                    " i -> concat(element_at(__w, i), ' ',"
                    " element_at(__w, i + 1), ' ',"
                    " element_at(__w, i + 2)))"
                )
            ).alias("t"),
        )

    # The trigram TYPE table feeds THREE backoff tables whose column
    # pruning diverges (t/b12 vs b23 vs w3) — divergent pruning kills
    # exchange reuse (the r4 lesson) — and is identical across calls, so
    # it comes from the process-shared ngram_types spool: one train
    # corpus scan per process, every derivation re-reads the small
    # (vocabulary-bounded) parquet artifact.
    from pulsar_lunar_spark.operators.corpus import ngram_types

    cnt = ngram_types(spark, sf_dir, 3, doc_id_parity=0).select(
        F.col("g").alias("t"), F.col("c").alias("c123")
    )
    tri0 = cnt.select(
        "t",
        F.expr("concat(split_part(t, ' ', 1), ' ', split_part(t, ' ', 2))")
        .alias("b12"),
        F.expr("concat(split_part(t, ' ', 2), ' ', split_part(t, ' ', 3))")
        .alias("b23"),
        F.expr("split_part(t, ' ', 3)").alias("w3"),
        "c123",
    )
    tri = tri0.select(
        "t",
        "b23",
        "w3",
        "c123",
        F.sum("c123")
        .over(Window.partitionBy("b12"))
        .cast("long")
        .alias("c12"),
    )
    tri_j = tri.select("t", "c123", "c12")
    big = (
        tri.groupBy("b23")
        .agg(F.sum("c123").cast("long").alias("c23"))
        .select(
            "b23",
            "c23",
            F.sum("c23")
            .over(Window.partitionBy(F.expr("split_part(b23, ' ', 1)")))
            .cast("long")
            .alias("c2"),
        )
    )
    # N is a 1-row scalar frame broadcast onto the unigram table (the
    # kn_doc corpus-mean precedent) — NOT an unpartitioned window over
    # the O(V) unigram table (the round-9 llm13 hazard class). Derive it
    # from the spooled type table directly so the lineage stays flat.
    n_tot = cnt.agg(F.sum("c123").cast("long").alias("n"))
    uni = (
        tri.groupBy("w3")
        .agg(F.sum("c123").cast("long").alias("c3"))
        .crossJoin(F.broadcast(n_tot))
    )
    ev = trigrams(docs.filter(F.col("doc_id") % 2 == 1)).select(
        "doc_id",
        "t",
        F.expr("concat(split_part(t, ' ', 2), ' ', split_part(t, ' ', 3))")
        .alias("b23"),
        F.expr("split_part(t, ' ', 3)").alias("w3"),
    )
    s = (
        ev.join(tri_j, "t", "left")
        .join(big, "b23", "left")
        .join(uni, "w3", "left")
        .select(
            "doc_id",
            F.when(
                F.col("c123").isNotNull(),
                F.greatest(
                    F.expr("(1000000L * c123) div c12"), F.lit(1).cast("long")
                ),
            )
            .when(
                F.col("c23").isNotNull(),
                F.greatest(
                    F.expr("(2000000L * c23) div (5 * c2)"),
                    F.lit(1).cast("long"),
                ),
            )
            .when(
                F.col("c3").isNotNull(),
                F.greatest(
                    F.expr("(4000000L * c3) div (25 * n)"),
                    F.lit(1).cast("long"),
                ),
            )
            .otherwise(F.lit(1).cast("long"))
            .alias("s_ppm"),
        )
    )
    sc = s.select(
        "doc_id",
        F.floor(-F.log(F.col("s_ppm") / 1000000.0) * 1000000 + 0.5)
        .cast("long")
        .alias("sup"),
    )
    return (
        sc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.expr("sum(sup) div count(1)")
            .cast("long")
            .alias("mean_surprisal_micro"),
        )
        .orderBy(F.desc("mean_surprisal_micro"), "doc_id")
        .limit(_SB_TOPN)
    )


# ---------------------------------------------------------------------------
# Cross-lingual alignment eval: margin-mining precision@k
# ---------------------------------------------------------------------------

_BP_KS = (1, 2, 4)


def _bitext_precision_oracle() -> str:
    from pulsar_lunar_spark.queries.llm13 import _BT_ANCHOR_CAP, _BT_K

    ks = ", ".join(str(k) for k in _BP_KS)
    return f"""
    WITH q AS (
        SELECT vec_id,
               LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                              x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT))
                   AS qv
        FROM embeddings
    ), a AS (
        SELECT vec_id AS anchor_id, qv AS av FROM q
        WHERE vec_id % 2 = 0 AND vec_id < {_BT_ANCHOR_CAP}
    ), b AS (
        SELECT vec_id AS cand_id, qv AS bv FROM q WHERE vec_id % 2 = 1
    ), sims AS MATERIALIZED (
        SELECT a.anchor_id, b.cand_id,
               CAST(FLOOR((LIST_INNER_PRODUCT(a.av, b.bv)
                    / (SQRT(LIST_INNER_PRODUCT(a.av, a.av))
                       * SQRT(LIST_INNER_PRODUCT(b.bv, b.bv))))
                    * 1000000 + 0.5) AS BIGINT) AS sim_micro
        FROM a CROSS JOIN b
    ), ra AS MATERIALIZED (
        SELECT anchor_id, cand_id, sim_micro,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY sim_micro DESC, cand_id) AS rna
        FROM sims
    ), ta AS (
        SELECT anchor_id,
               CAST(SUM(CASE WHEN rna <= {_BT_K} THEN sim_micro ELSE 0 END)
                    AS BIGINT) AS tsa
        FROM ra GROUP BY 1
    ), tb AS (
        SELECT cand_id,
               CAST(SUM(CASE WHEN rnb <= {_BT_K} THEN sim_micro ELSE 0 END)
                    AS BIGINT) AS tsb
        FROM (SELECT cand_id, sim_micro,
                     ROW_NUMBER() OVER (PARTITION BY cand_id
                                        ORDER BY sim_micro DESC, anchor_id)
                         AS rnb
              FROM sims)
        GROUP BY 1
    ), margins AS (
        SELECT ra.anchor_id, ra.cand_id,
               CASE WHEN ra.sim_micro >= 0 THEN
                   CAST((8000000 * ra.sim_micro)
                        // GREATEST(ta.tsa + tb.tsb, 1) AS BIGINT)
               ELSE
                   -CAST((8000000 * (-ra.sim_micro))
                         // GREATEST(ta.tsa + tb.tsb, 1) AS BIGINT)
               END AS margin_ppm
        FROM ra JOIN ta USING (anchor_id) JOIN tb USING (cand_id)
        WHERE ra.rna <= {_BT_K}
    ), rankm AS (
        SELECT anchor_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY margin_ppm DESC, cand_id) AS rm
        FROM margins
    ), per_anchor AS (
        SELECT anchor_id,
               MIN(CASE WHEN cand_id = anchor_id + 1 THEN rm END) AS hit_rank
        FROM rankm GROUP BY 1
    )
    SELECT CAST(kk.k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(SUM(CASE WHEN hit_rank <= kk.k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           CAST((1000000 * SUM(CASE WHEN hit_rank <= kk.k THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS precision_ppm
    FROM per_anchor CROSS JOIN UNNEST([{ks}]) AS kk(k)
    GROUP BY kk.k ORDER BY k
    """


@register(
    "q_bitext_precision",
    oracle=_bitext_precision_oracle(),
    tags=("llm", "embedding", "bitext", "eval", "precision"),
)
def q_bitext_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@k of margin-based bitext mining against a PLANTED
    parallel set: anchor 2i's true translation is declared to be
    candidate 2i+1 (adjacent vec_ids — the planted-pair convention the
    synthetic embedding table supports deterministically), and the
    metric is the share of anchors whose planted pair appears in their
    top-k MARGIN-ranked candidates, for k in (1, 2, 4). This is the
    alignment eval a parallel-corpus pipeline runs before trusting mined
    pairs for training: raw-cosine recall says the space is healthy,
    margin precision@k says the MINER is.

    Plan: reuses q_bitext_mining's relational matmul verbatim via the
    shared _bitext_margin_frame (keep_rn=4 — margins for the top-4
    cosine candidates per anchor instead of only the best); the margin
    re-rank is a window over the <=16x4-row margin frame, the k sweep is
    an explode of a 3-literal array on the 16-row per-anchor frame, and
    the output is 3 rows. Nothing downstream of the (bounded) margin
    frame grows with data."""
    from pyspark.sql.window import Window

    from pulsar_lunar_spark.queries.llm13 import _BT_K, _bitext_margin_frame

    m = _bitext_margin_frame(spark, sf_dir, _BT_K)
    wm = Window.partitionBy("anchor_id").orderBy(
        F.desc("margin_ppm"), F.asc("cand_id")
    )
    rankm = m.select(
        "anchor_id", "cand_id", F.row_number().over(wm).alias("rm")
    )
    per_anchor = rankm.groupBy("anchor_id").agg(
        F.min(
            F.when(F.col("cand_id") == F.col("anchor_id") + 1, F.col("rm"))
        ).alias("hit_rank")
    )
    ks = per_anchor.select(
        "anchor_id",
        "hit_rank",
        F.explode(F.array(*[F.lit(k) for k in _BP_KS])).alias("k"),
    )
    return (
        ks.groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.sum(
                F.when(F.col("hit_rank") <= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_hits"),
        )
        .select(
            "k",
            "n_anchors",
            "n_hits",
            F.expr("(1000000L * n_hits) div n_anchors")
            .cast("long")
            .alias("precision_ppm"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Data attribution proxy: per-source excess-loss leaderboard
# ---------------------------------------------------------------------------


def _attribution_oracle() -> str:
    from pulsar_lunar_spark.queries.llm12 import _RHO_WEAK_BUCKETS, _scorer_sql

    return f"""
    WITH {_scorer_sql(_RHO_WEAK_BUCKETS, "weak")},
         {_scorer_sql(4096, "strong")},
    ex AS (
        SELECT d.source, w.loss_micro - s.loss_micro AS excess_micro
        FROM weak w JOIN strong s USING (doc_id)
        JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN excess_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_learnable,
           CAST(CASE WHEN SUM(excess_micro) >= 0 THEN
                    SUM(excess_micro) // COUNT(*)
                ELSE
                    -((-SUM(excess_micro)) // COUNT(*))
                END AS BIGINT) AS mean_excess_micro
    FROM ex GROUP BY source
    ORDER BY mean_excess_micro DESC, source
    """


@register(
    "q_source_attribution",
    oracle=_attribution_oracle(),
    tags=("llm", "attribution", "rho", "selection", "datamodels"),
)
def q_source_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence-function-free data attribution: the per-SOURCE excess
    loss leaderboard on the RHO weak-vs-strong scorers — for every
    source, how many of its documents are learnable (weak loss exceeds
    strong loss) and what the mean excess is. Sources whose documents a
    stronger model fits much better than a weak one are the ones
    contributing learnable signal; sources where both models agree
    (boilerplate, or noise neither can fit) attribute low — the
    datamodels/influence-style answer at aggregation cost instead of
    retraining cost, exactly the leaderboard a data buyer reads.

    Determinism: losses are the q_rho_select micro-integers; the mean is
    SIGN-SEPARATED integer division (excess sums can be negative — Spark
    div truncates, DuckDB // floors; they agree only on non-negative
    numerators, so the division runs on |sum|).

    Plan: the q_rho_select one-pass shape with source carried through
    the token explode — ONE corpus scan feeds both scorers via two
    broadcast weight joins (64 + 4096 rows), one (doc, source)
    aggregate, one source rollup; the scorer body IS q_rho_select's
    (the shared scored_docs/ce_loss_micro pair, mirroring the shared
    _scorer_sql oracle builder). At 100 TB: one pass + dimension
    broadcasts + a sources-bounded output."""
    from pulsar_lunar_spark.queries.llm12 import ce_loss_micro, scored_docs

    sc = scored_docs(spark, sf_dir, extra_cols=("source",), weak=True)
    ex = sc.select(
        "source",
        (
            ce_loss_micro("logit_weak") - ce_loss_micro("logit_strong")
        ).alias("excess_micro"),
    )
    agg = ex.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("excess_micro") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_learnable"),
        F.sum("excess_micro").cast("long").alias("__sum"),
    )
    mean = F.when(
        F.col("__sum") >= 0, F.expr("__sum div n_docs")
    ).otherwise(-F.expr("(-__sum) div n_docs"))
    return agg.select(
        "source",
        "n_docs",
        "n_learnable",
        mean.cast("long").alias("mean_excess_micro"),
    ).orderBy(F.desc("mean_excess_micro"), "source")
