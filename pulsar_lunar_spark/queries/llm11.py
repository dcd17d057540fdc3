"""LLM-pipeline batch 11 (round 8): the next curation asks after round
7's eval/mixture set (VERDICT r7 next-round #4) —

- DoReMi-style domain reweighting (``q_doremi_weights``): iterative
  multiplicative-update mixture weights over a per-source excess-loss
  proxy — the iterative twin of q_temperature_mixture, with the bounded
  fixed-iteration loop discipline of kmeans/pagerank;
- span-level decontamination audit (``q_span_decontamination``): exact
  duplicated-8-token-span hits between the training corpus and the
  benchmark set — the span-granular upgrade of q_contamination's
  doc-level shingle overlap (what teams actually ship before an eval);
- bootstrap confidence interval (``q_bootstrap_ci``): Poisson-bootstrap
  resampling of the hashed-classifier accuracy via deterministic md5
  draws (the q_sample_* discipline) — exact integer percentile ranks,
  no RNG stream anywhere;
- pass@k estimation (``q_pass_at_k``): the unbiased 1 - C(n-c,k)/C(n,k)
  estimator as exact ppm CASE literals from Python big-int
  combinatorics — zero transcendentals;
- PSI drift monitoring (``q_psi_drift``): population-stability-index
  between two crawl snapshots over Laplace-smoothed length-bucket
  shares — the crawler-regression alarm statistic;
- vocabulary OOV coverage (``q_vocab_coverage``): per-source
  out-of-vocabulary rate against the top-1000 corpus vocabulary — the
  fertility-blowup predictor for a fixed tokenizer.

Determinism discipline: every statistic is integer ppm/milli arithmetic
(BIGINT DIV both sides); the one transcendental (EXP in the DoReMi
update) follows the q_quality_classifier precedent — EXP +
FLOOR(x*1e6+0.5) hash-matches Spark vs DuckDB at ppm scale — with the
argument clamped to [-2, 2] on BOTH sides so the multiplier stays
int64-bounded; bootstrap draws are md5-derived uniforms against
pre-computed integer Poisson(1) CDF thresholds (identical literals in
both engines, embedded from one Python computation).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.operators import text as T
from pulsar_lunar_spark.operators.dedup import normalize_text
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

_NORM = "REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')"
_TOKEN_RE_SQL = "'[A-Za-z]+(?:''[A-Za-z]+)?|[0-9]+|[^A-Za-z0-9\\s]'"


# ---------------------------------------------------------------------------
# DoReMi-style iterative domain reweighting (multiplicative updates)
# ---------------------------------------------------------------------------

_DOREMI_ITERATIONS = 4
# Multiplicative-update step, shared literal-for-literal by both engines:
#   excess_i  = loss_milli_i * 1e6 - SUM_j w_ppm_j * loss_milli_j   (nano)
#   arg_i     = clamp(excess_i / 2e9, -2, 2)        (eta = 0.5 in loss units)
#   mult_i    = floor(exp(arg_i) * 1e6 + 0.5)       (ppm, <= 7 389 057)
#   raw_i     = w_ppm_i * mult_i                    (<= 7.39e12)
#   wn_i      = (1e6 * raw_i) div SUM raw           (numerator <= 7.39e18)
#   w'_i      = (990 000 * wn_i + 10 000 * u_ppm) div 1e6   (1% uniform mix)
# Every intermediate fits int64 BECAUSE the clamp bounds mult; the clamp is
# part of the algorithm on both sides, not a Spark-only guard.


def _doremi_cte() -> str:
    """The shared DoReMi CTE chain (base -> s0 -> s{N}): reused by the
    q_doremi_weights oracle and the q_domain_curriculum oracle (llm18) —
    the engine/oracle pairs must share SQL builders, not copy them."""
    steps = []
    for t in range(_DOREMI_ITERATIONS):
        steps.append(f""", s{t + 1} AS (
        SELECT source, n_docs, loss_milli, u_ppm,
               CAST((990000 * ((1000000 * raw)
                               // CAST(SUM(raw) OVER () AS BIGINT))
                     + 10000 * u_ppm) // 1000000 AS BIGINT) AS w_ppm
        FROM (
            SELECT source, n_docs, loss_milli, u_ppm,
                   w_ppm * CAST(FLOOR(EXP(LEAST(GREATEST(
                       CAST(loss_milli * 1000000
                            - CAST(SUM(w_ppm * loss_milli) OVER () AS BIGINT)
                            AS DOUBLE) / 2000000000.0,
                       -2.0), 2.0)) * 1000000 + 0.5) AS BIGINT) AS raw
            FROM s{t}
        )
    )""")
    return f"""
    WITH base AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST((1000 * SUM(n_tokens)) // SUM(n_words) AS BIGINT)
                   AS loss_milli
        FROM (
            SELECT source,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, {_TOKEN_RE_SQL}))
                        AS BIGINT) AS n_tokens,
                   CAST(LEN(STRING_SPLIT({_NORM}, ' ')) AS BIGINT) AS n_words
            FROM documents
        ) GROUP BY source
    ), s0 AS (
        SELECT source, n_docs, loss_milli,
               CAST(1000000 // COUNT(*) OVER () AS BIGINT) AS u_ppm,
               CAST(1000000 // COUNT(*) OVER () AS BIGINT) AS w_ppm
        FROM base
    ){"".join(steps)}"""


def _doremi_oracle() -> str:
    return f"""{_doremi_cte()}
    SELECT source, n_docs, loss_milli,
           u_ppm AS uniform_ppm,
           CAST(w_ppm AS BIGINT) AS doremi_ppm
    FROM s{_DOREMI_ITERATIONS} ORDER BY source
    """


@register(
    "q_doremi_weights",
    oracle=_doremi_oracle(),
    tags=("llm", "mixture", "doremi", "iterative", "training-prep"),
)
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain mixture weights: starting uniform, each of 4
    multiplicative updates up-weights sources whose excess-loss proxy
    exceeds the current weighted average (w_i <- w_i * exp(eta * (loss_i
    - sum_j w_j loss_j))), renormalizes, and mixes 1% uniform for
    coverage — the iterative counterpart of q_temperature_mixture's
    closed-form alpha=0.5 rule. The excess-loss proxy is the source's
    tokenizer fertility (BPE-ish tokens per whitespace word, milli) — a
    deterministic stand-in for the proxy-model loss the published method
    trains (high-fertility domains are the ones a fixed token budget
    underserves).

    Exact-integer state between iterations: weights live as ppm BIGINTs;
    the only float is the EXP multiplier, floored back to ppm immediately
    (the q_quality_classifier EXP precedent), with the argument clamped
    to [-2, 2] on BOTH engines so w*mult and its 1e6-scaled normalizer
    stay inside int64 at ANY source count and loss magnitude.

    Plan: one corpus scan into a 20-row source aggregate, then 4
    iterations of window arithmetic ON 20 ROWS (two SinglePartition
    window exchanges per iteration — bytes, not data); no driver loop
    state, no checkpoint needed (linear lineage, fixed 4 iterations —
    the bounded-loop discipline of ml.kmeans_fit / graph.pagerank).
    At 100 TB the corpus aggregate is the only data-bearing stage; the
    iteration cost is invariant in corpus size because the state is one
    row per SOURCE, not per document."""
    cur = doremi_frame(spark, sf_dir)
    return cur.select(
        "source", "n_docs", "loss_milli",
        F.col("u_ppm").cast("long").alias("uniform_ppm"),
        F.col("w_ppm").cast("long").alias("doremi_ppm"),
    ).orderBy("source")


def doremi_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared DoReMi weight pipeline: (source, n_docs, loss_milli,
    u_ppm, w_ppm) after the 4 multiplicative updates — consumed by
    q_doremi_weights and q_domain_curriculum (llm18); the Spark twin of
    _doremi_cte, factored so the two queries cannot drift."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    base = (
        d.select(
            "source",
            T.token_count(F.col("text")).cast("long").alias("n_tokens"),
            T.word_count(F.col("text")).cast("long").alias("n_words"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("(1000 * sum(n_tokens)) div sum(n_words)")
            .cast("long")
            .alias("loss_milli"),
        )
    )
    cur = base.select(
        "source", "n_docs", "loss_milli",
        F.expr("1000000 div count(*) over ()").cast("long").alias("u_ppm"),
        F.expr("1000000 div count(*) over ()").cast("long").alias("w_ppm"),
    )
    for _ in range(_DOREMI_ITERATIONS):
        inner = cur.select(
            "source", "n_docs", "loss_milli", "u_ppm",
            F.expr(
                "w_ppm * CAST(FLOOR(EXP(LEAST(GREATEST("
                "CAST(loss_milli * 1000000L"
                " - SUM(w_ppm * loss_milli) OVER () AS DOUBLE)"
                " / 2000000000.0, -2.0), 2.0)) * 1000000 + 0.5) AS BIGINT)"
            ).alias("raw"),
        )
        cur = inner.select(
            "source", "n_docs", "loss_milli", "u_ppm",
            F.expr(
                "(990000 * ((1000000 * raw) div SUM(raw) OVER ())"
                " + 10000 * u_ppm) div 1000000"
            )
            .cast("long")
            .alias("w_ppm"),
        )
    return cur


# ---------------------------------------------------------------------------
# Train -> benchmark span-level decontamination audit (8-token spans)
# ---------------------------------------------------------------------------


@register(
    "q_span_decontamination",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               LIST_FILTER(
                   STRING_SPLIT(REGEXP_REPLACE(TRIM(LOWER(text)),
                                               '\s+', ' ', 'g'), ' '),
                   x -> x != '') AS w
        FROM documents
    ), s AS (
        SELECT doc_id, ARRAY_TO_STRING(w[i : i + 7], ' ') AS span
        FROM t, UNNEST(GENERATE_SERIES(1, LEN(w) - 7)) AS u(i)
        WHERE LEN(w) >= 8
    ), hits AS (
        SELECT DISTINCT b.doc_id AS bench_id, tr.doc_id AS train_id, b.span
        FROM (SELECT DISTINCT doc_id, span FROM s WHERE doc_id < 10) b
        JOIN (SELECT doc_id, span FROM s WHERE doc_id >= 10) tr
          USING (span)
    ), agg AS (
        SELECT bench_id,
               CAST(COUNT(DISTINCT train_id) AS BIGINT) AS n_train_docs,
               CAST(COUNT(DISTINCT span) AS BIGINT) AS n_shared_spans,
               CAST(COUNT(*) AS BIGINT) AS n_span_hits
        FROM hits GROUP BY bench_id
    )
    SELECT d.doc_id AS bench_id,
           CAST(COALESCE(a.n_train_docs, 0) AS BIGINT) AS n_train_docs,
           CAST(COALESCE(a.n_shared_spans, 0) AS BIGINT) AS n_shared_spans,
           CAST(COALESCE(a.n_span_hits, 0) AS BIGINT) AS n_span_hits
    FROM (SELECT doc_id FROM documents WHERE doc_id < 10) d
    LEFT JOIN agg a ON a.bench_id = d.doc_id
    ORDER BY bench_id
    """,
    tags=("llm", "contamination", "spans", "decontamination"),
)
def q_span_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level train->benchmark decontamination audit: for every
    benchmark document (doc_id < 10, the q_contamination convention), the
    exact count of training documents sharing at least one VERBATIM
    8-token span, plus how many distinct spans leak and the total
    distinct (train doc, span) hit pairs — zero rows emitted as zeros,
    so a clean benchmark is a visible all-zero audit, not an absent one.
    This is the span-granular upgrade of q_contamination's doc-level
    3-gram overlap: 8-token verbatim spans (the q_duplicate_spans
    granularity) are what decontamination pipelines actually match on.

    Plan: the benchmark side's span table is built from a 10-document
    scan (the doc_id < 10 filter reaches the parquet reader), deduped,
    and BROADCAST; the training side's span stream joins it un-deduped —
    the selective broadcast join drops non-leaking spans before the
    (bench_id, train_id, span) distinct, so the only shuffle over
    corpus-sized data never happens (contrast: distincting the train
    span stream first would shuffle O(tokens) rows). The final aggregate
    runs two COUNT(DISTINCT) + COUNT(*) in one pass — the Expand x3 is
    over the HIT table (bounded by leakage volume, not corpus size).
    At 100 TB the benchmark side stays broadcast-sized by construction
    (benchmarks are small); training-span skew on boilerplate spans is
    AQE-split."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(normalize_text(F.col("text")), " "),
            lambda w: F.length(w) > 0,
        ).alias("w"),
    ).filter(F.size("w") >= 8)
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 7),"
                " i -> array_join(slice(w, i, 8), ' '))"
            )
        ).alias("span"),
    )
    bench = (
        spans.filter(F.col("doc_id") < 10)
        .select(F.col("doc_id").alias("bench_id"), "span")
        .distinct()
    )
    train = spans.filter(F.col("doc_id") >= 10).select(
        F.col("doc_id").alias("train_id"), "span"
    )
    hits = (
        train.join(F.broadcast(bench), "span")
        .select("bench_id", "train_id", "span")
        .distinct()
    )
    agg = hits.groupBy("bench_id").agg(
        F.countDistinct("train_id").cast("long").alias("n_train_docs"),
        F.countDistinct("span").cast("long").alias("n_shared_spans"),
        F.count(F.lit(1)).cast("long").alias("n_span_hits"),
    )
    bench_ids = d.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id")
    )
    return (
        bench_ids.join(agg, "bench_id", "left")
        .select(
            "bench_id",
            F.coalesce("n_train_docs", F.lit(0)).cast("long").alias("n_train_docs"),
            F.coalesce("n_shared_spans", F.lit(0)).cast("long").alias("n_shared_spans"),
            F.coalesce("n_span_hits", F.lit(0)).cast("long").alias("n_span_hits"),
        )
        .orderBy("bench_id")
    )


# ---------------------------------------------------------------------------
# Bootstrap confidence interval on classifier accuracy (Poisson bootstrap)
# ---------------------------------------------------------------------------

_BOOTSTRAP_B = 20
# Poisson(1) CDF thresholds scaled to the md5_int 6-hex range [0, 2^24):
# a deterministic uniform u falls in bucket k (weight = k) iff
# _POIS_CDF[k-1] <= u < _POIS_CDF[k]; u >= _POIS_CDF[4] draws weight 5.
# Computed ONCE here and embedded as identical literals in both engines.
_POIS_CDF = []
_acc = 0.0
for _k in range(5):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(int(_acc * (1 << 24)))

def _pois_case(u_expr: str) -> str:
    """Poisson(1) inverse-CDF CASE over a uniform-in-[0, 2^24) SQL
    expression — parameterized (never textual substitution into a
    template: a str.replace would silently corrupt the SQL in BOTH
    engines the moment the template gained another matching token)."""
    branches = " ".join(
        f"WHEN ({u_expr}) < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 5 END"


def _bootstrap_oracle() -> str:
    from pulsar_lunar_spark.queries.llm5 import _md5_int_sql
    from pulsar_lunar_spark.queries.llm10 import _clf_p_sql

    u_sql = _md5_int_sql(
        "CAST(r AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)", 6, "bs-"
    )
    return f"""
    WITH {_clf_p_sql()}, lab AS (
        SELECT doc_id,
               CASE WHEN (CASE WHEN score_ppm >= 500000 THEN 1 ELSE 0 END)
                         = pos THEN 1 ELSE 0 END AS correct
        FROM p
    ), draws AS (
        SELECT r, correct,
               CASE WHEN r = -1 THEN 1 ELSE {_pois_case(u_sql)} END AS w
        FROM lab, UNNEST(GENERATE_SERIES(-1, {_BOOTSTRAP_B - 1})) AS g(r)
    ), accs AS (
        SELECT r,
               CAST(SUM(w) AS BIGINT) AS n_w,
               CAST((1000000 * CAST(SUM(w * correct) AS BIGINT))
                    // CAST(SUM(w) AS BIGINT) AS BIGINT) AS acc_ppm
        FROM draws GROUP BY r
    ), ranked AS (
        SELECT r, n_w, acc_ppm,
               CASE WHEN r = -1 THEN 1 ELSE 0 END AS is_point,
               ROW_NUMBER() OVER (
                   PARTITION BY (CASE WHEN r = -1 THEN 1 ELSE 0 END)
                   ORDER BY acc_ppm, r) AS rn
        FROM accs
    )
    SELECT CAST(MAX(CASE WHEN is_point = 1 THEN n_w END) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN is_point = 1 THEN acc_ppm END) AS BIGINT)
               AS point_acc_ppm,
           CAST(MAX(CASE WHEN is_point = 0 AND rn = 2 THEN acc_ppm END)
               AS BIGINT) AS boot_lo_ppm,
           CAST((MAX(CASE WHEN is_point = 0 AND rn = 10 THEN acc_ppm END)
                 + MAX(CASE WHEN is_point = 0 AND rn = 11 THEN acc_ppm END))
                // 2 AS BIGINT) AS boot_median_ppm,
           CAST(MAX(CASE WHEN is_point = 0 AND rn = {_BOOTSTRAP_B - 1}
                         THEN acc_ppm END) AS BIGINT) AS boot_hi_ppm,
           CAST({_BOOTSTRAP_B} AS BIGINT) AS n_resamples
    FROM ranked
    """


@register(
    "q_bootstrap_ci",
    oracle=_bootstrap_oracle(),
    tags=("llm", "eval", "bootstrap", "confidence-interval"),
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval on an eval metric — the hashed
    quality classifier's accuracy against its n_chars>=300 proxy label —
    via the POISSON bootstrap: each (resample r, doc) pair draws a
    deterministic Poisson(1) replication weight from an md5 uniform
    (the q_sample_* discipline: no RNG stream, any engine replays the
    draw bit-for-bit), the scale-correct bootstrap because each doc's
    weight is independent — no global n-with-replacement pass exists at
    100 TB. Reports the point accuracy plus the 5th/95th percentile
    ranks (rank 2 and 19 of B=20 resample accuracies, exact integers)
    and the rank-10/11 median.

    Exactness: accuracies are integer ppm DIV; the Poisson inverse-CDF
    thresholds are integer literals in [0, 2^24) computed once in Python
    and embedded in BOTH engines; ranking breaks ties by (acc, r), a
    total order. The r = -1 pseudo-resample carries weight 1 everywhere
    = the point estimate, so ONE scoring pass serves both the point and
    the bootstrap (no second corpus scan, no shared-subtree re-exec).

    Plan: the scoring pass (word explode + broadcast weight join + doc
    agg) is the only corpus-sized work; the 21-way sequence explode
    happens on the 1-row-per-doc label table, the resample aggregate is
    21 rows, and the CI is one window + one conditional aggregate."""
    from pulsar_lunar_spark.queries.llm10 import _clf_scored

    p = _clf_scored(spark, sf_dir)
    lab = p.select(
        "doc_id",
        F.when(
            F.when(F.col("score_ppm") >= 500_000, 1).otherwise(0)
            == F.col("pos"),
            1,
        )
        .otherwise(0)
        .alias("correct"),
    )
    draws = lab.select(
        "doc_id",
        "correct",
        F.explode(F.sequence(F.lit(-1), F.lit(_BOOTSTRAP_B - 1))).alias("r"),
    ).select(
        "r",
        "correct",
        F.when(F.col("r") == -1, F.lit(1))
        .otherwise(
            F.expr(
                _pois_case(
                    "CAST(conv(substring(md5(concat('bs-', CAST(r AS STRING),"
                    " ':', CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT)"
                )
            )
        )
        .cast("long")
        .alias("w"),
    )
    accs = draws.groupBy("r").agg(
        F.sum("w").cast("long").alias("n_w"),
        F.expr("(1000000 * sum(w * correct)) div sum(w)")
        .cast("long")
        .alias("acc_ppm"),
    )
    ranked = accs.select(
        "r", "n_w", "acc_ppm",
        F.when(F.col("r") == -1, 1).otherwise(0).alias("is_point"),
        F.expr(
            "ROW_NUMBER() OVER (PARTITION BY (CASE WHEN r = -1 THEN 1 ELSE 0 END)"
            " ORDER BY acc_ppm, r)"
        ).alias("rn"),
    )
    return ranked.agg(
        F.max(F.when(F.col("is_point") == 1, F.col("n_w")))
        .cast("long")
        .alias("n_docs"),
        F.max(F.when(F.col("is_point") == 1, F.col("acc_ppm")))
        .cast("long")
        .alias("point_acc_ppm"),
        F.max(F.when((F.col("is_point") == 0) & (F.col("rn") == 2), F.col("acc_ppm")))
        .cast("long")
        .alias("boot_lo_ppm"),
        F.expr(
            "(MAX(CASE WHEN is_point = 0 AND rn = 10 THEN acc_ppm END)"
            " + MAX(CASE WHEN is_point = 0 AND rn = 11 THEN acc_ppm END)) div 2"
        )
        .cast("long")
        .alias("boot_median_ppm"),
        F.max(
            F.when(
                (F.col("is_point") == 0) & (F.col("rn") == _BOOTSTRAP_B - 1),
                F.col("acc_ppm"),
            )
        )
        .cast("long")
        .alias("boot_hi_ppm"),
        F.lit(_BOOTSTRAP_B).cast("long").alias("n_resamples"),
    )


# ---------------------------------------------------------------------------
# pass@k eval estimator (exact combinatorial, zero transcendentals)
# ---------------------------------------------------------------------------

_PASSK_N = 10          # attempts per task
_PASSK_KS = (1, 5, 10)
# Exact pass@k lookup for n=10: pass@k(c) = 1e6 - floor(1e6 * C(n-c, k)
# / C(n, k)) — the unbiased estimator 1 - C(n-c,k)/C(n,k) in exact ppm,
# computed ONCE with Python big-int combinatorics and embedded as
# identical CASE literals in both engines (c is the per-task success
# count; C(n-c,k) = 0 when fewer than k failures exist -> pass = 1e6).


def _passk_ppm(c: int, k: int) -> int:
    fail_num = math.comb(_PASSK_N - c, k) if _PASSK_N - c >= k else 0
    return 1_000_000 - (1_000_000 * fail_num) // math.comb(_PASSK_N, k)


def _passk_case(k: int) -> str:
    branches = " ".join(
        f"WHEN c = {c} THEN {_passk_ppm(c, k)}" for c in range(_PASSK_N + 1)
    )
    return f"CASE {branches} END"


def _passk_oracle() -> str:
    from pulsar_lunar_spark.queries.llm5 import _md5_int_sql

    u_sql = _md5_int_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)", 6, "att-"
    )
    per_k = ", ".join(
        f"WHEN k = {k} THEN {_passk_case(k)}" for k in _PASSK_KS
    ).replace(", WHEN", " WHEN")
    return f"""
    WITH att AS (
        SELECT doc_id, r,
               CASE WHEN ({u_sql}) % 100 < 30 THEN 1 ELSE 0 END AS ok
        FROM documents, UNNEST(GENERATE_SERIES(0, {_PASSK_N - 1})) AS g(r)
    ), per_task AS (
        SELECT doc_id, CAST(SUM(ok) AS BIGINT) AS c FROM att GROUP BY doc_id
    ), scored AS (
        SELECT k, CAST(CASE {per_k} END AS BIGINT) AS pass_ppm
        FROM per_task, UNNEST([{", ".join(str(k) for k in _PASSK_KS)}]) AS ks(k)
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           CAST(SUM(pass_ppm) // COUNT(*) AS BIGINT) AS mean_pass_ppm
    FROM scored GROUP BY k ORDER BY k
    """


@register(
    "q_pass_at_k",
    oracle=_passk_oracle(),
    tags=("llm", "eval", "pass-at-k", "combinatorial"),
)
def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over a task suite: every document is a task, each task gets
    n=10 deterministic attempts (md5 draw, 30% success rate — the
    q_sample_* discipline), and pass@k is the standard unbiased
    estimator 1 - C(n-c,k)/C(n,k) averaged over tasks, for k = 1, 5, 10.
    ZERO transcendentals: with n fixed the estimator is a rational in
    small integers, so the per-(c, k) values are exact ppm literals
    computed once with Python big-int combinatorics and embedded
    identically in both engines — no float anywhere, no rounding
    boundary to disagree on.

    Plan: one 10-way attempt explode on the (doc_id)-only projection
    (the parquet reader never touches text), one per-task aggregate, a
    3-literal k explode, one 3-row aggregate. At 100 TB: shuffle is
    O(tasks) on doc_id; everything downstream of the per-task aggregate
    is dimension-sized."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    att = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_PASSK_N - 1))).alias("r"),
    ).select(
        "doc_id",
        F.when(
            C.md5_int(
                F.concat_ws(":", F.col("doc_id"), F.col("r")), hex_chars=6,
                salt="att-",
            )
            % 100
            < 30,
            1,
        )
        .otherwise(0)
        .alias("ok"),
    )
    per_task = att.groupBy("doc_id").agg(F.sum("ok").cast("long").alias("c"))
    per_k = " ".join(f"WHEN k = {k} THEN {_passk_case(k)}" for k in _PASSK_KS)
    scored = per_task.select(
        "c",
        F.explode(F.array(*[F.lit(k) for k in _PASSK_KS])).alias("k"),
    ).select("k", F.expr(f"CAST(CASE {per_k} END AS BIGINT)").alias("pass_ppm"))
    return (
        scored.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tasks"),
            F.expr("sum(pass_ppm) div count(*)").cast("long").alias("mean_pass_ppm"),
        )
        .select(F.col("k").cast("long").alias("k"), "n_tasks", "mean_pass_ppm")
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# PSI distribution drift between two crawl snapshots
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 8
_PSI_WIDTH = 250  # n_chars per bucket; bucket = least(n_chars div 250, 7)


@register(
    "q_psi_drift",
    oracle=f"""
    WITH b AS (
        SELECT CAST(LEAST(n_chars // {_PSI_WIDTH}, {_PSI_BUCKETS - 1}) AS BIGINT)
                   AS bucket,
               doc_id % 2 AS snap
        FROM documents
    ), spine AS (
        SELECT CAST(i AS BIGINT) AS bucket FROM RANGE({_PSI_BUCKETS}) AS t(i)
    ), counts AS (
        SELECT s.bucket,
               CAST(COALESCE(SUM(CASE WHEN b.snap = 0 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_a,
               CAST(COALESCE(SUM(CASE WHEN b.snap = 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_b
        FROM spine s LEFT JOIN b ON b.bucket = s.bucket
        GROUP BY s.bucket
    ), shares AS (
        SELECT bucket, n_a, n_b,
               CAST((1000000 * (n_a + 1))
                    // (CAST(SUM(n_a) OVER () AS BIGINT) + {_PSI_BUCKETS})
                    AS BIGINT) AS p_ppm,
               CAST((1000000 * (n_b + 1))
                    // (CAST(SUM(n_b) OVER () AS BIGINT) + {_PSI_BUCKETS})
                    AS BIGINT) AS q_ppm
        FROM counts
    ), contrib AS (
        SELECT bucket, n_a, n_b, p_ppm, q_ppm,
               CAST(FLOOR((p_ppm - q_ppm)
                          * LN(CAST(p_ppm AS DOUBLE) / CAST(q_ppm AS DOUBLE))
                          + 0.5) AS BIGINT) AS psi_contrib_micro
        FROM shares
    )
    SELECT bucket, n_a, n_b, p_ppm, q_ppm, psi_contrib_micro,
           CAST(SUM(psi_contrib_micro) OVER () AS BIGINT) AS psi_total_micro
    FROM contrib ORDER BY bucket
    """,
    tags=("llm", "drift", "psi", "monitoring"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two crawl snapshots (even
    vs odd doc_ids standing in for last month's and this month's crawl):
    doc-length distribution over 8 fixed-width buckets, Laplace-smoothed
    ppm shares, and the PSI contribution (p-q)*ln(p/q) per bucket plus
    the total — the monitoring statistic a curation team alarms on when
    an upstream crawler changes behavior (PSI > 0.2 = major shift).

    Determinism: shares are exact integer ppm with +1 Laplace smoothing
    (so LN never sees zero and EVERY bucket row exists via the spine
    LEFT JOIN even at tiny scales); the single float op is
    FLOOR((p-q)*LN(p/q) + 0.5) at micro scale — the q_unigram_surprisal
    LN-floor precedent — and (p-q) and ln(p/q) always share a sign, so
    the product is non-negative and the floor has no negative-truncation
    hazard.

    Plan: one scan into an 8-bucket aggregate (counts for both
    snapshots ride one CASE pass — no second scan), a static 8-row
    spine join, window sums on 8 rows. At 100 TB the only data-bearing
    stage is the bucket aggregate: shuffle is 8 rows wide."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        F.least(
            (F.col("n_chars") / _PSI_WIDTH).cast("long"),
            F.lit(_PSI_BUCKETS - 1),
        ).alias("bucket"),
        (F.col("doc_id") % 2).alias("snap"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    spine = spark.range(_PSI_BUCKETS).select(F.col("id").cast("long").alias("bucket"))
    full = spine.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
    )
    shares = full.select(
        "bucket", "n_a", "n_b",
        F.expr(
            f"(1000000 * (n_a + 1)) div (SUM(n_a) OVER () + {_PSI_BUCKETS})"
        )
        .cast("long")
        .alias("p_ppm"),
        F.expr(
            f"(1000000 * (n_b + 1)) div (SUM(n_b) OVER () + {_PSI_BUCKETS})"
        )
        .cast("long")
        .alias("q_ppm"),
    )
    contrib = shares.select(
        "bucket", "n_a", "n_b", "p_ppm", "q_ppm",
        F.expr(
            "CAST(FLOOR((p_ppm - q_ppm)"
            " * LN(CAST(p_ppm AS DOUBLE) / CAST(q_ppm AS DOUBLE))"
            " + 0.5) AS BIGINT)"
        ).alias("psi_contrib_micro"),
    )
    return contrib.select(
        "bucket", "n_a", "n_b", "p_ppm", "q_ppm", "psi_contrib_micro",
        F.expr("SUM(psi_contrib_micro) OVER ()")
        .cast("long")
        .alias("psi_total_micro"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage / OOV rate per source
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 1000


@register(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT source, UNNEST(STRING_SPLIT({_NORM}, ' ')) AS token
        FROM documents
    ), st AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ), vocab AS (
        SELECT token FROM (
            SELECT token, SUM(cnt) AS tf FROM st GROUP BY token
            ORDER BY tf DESC, token LIMIT {_VOCAB_SIZE}
        )
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN cnt ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST((1000000 * SUM(CASE WHEN v.token IS NULL THEN cnt ELSE 0 END))
                // SUM(cnt) AS BIGINT) AS oov_ppm
    FROM st LEFT JOIN vocab v USING (token)
    GROUP BY source ORDER BY source
    """,
    tags=("llm", "tokenizer", "vocabulary", "oov", "training-prep"),
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: build the top-1000-by-frequency token
    vocabulary (deterministic tiebreak by token), then per source the
    total token count, out-of-vocabulary token count, and OOV rate in
    exact ppm — the statistic that predicts how much of a new source a
    fixed tokenizer will shred into bytes/unk (high OOV = fertility blowup
    = budget burn, see q_tokenizer_fertility).

    Plan: ONE corpus-sized shuffle — tokens aggregate to (source, token)
    counts first; the global vocabulary re-aggregates THAT table (distinct
    tokens, not the token stream), takes a TakeOrdered top-1000, and
    broadcasts back as a LEFT join for the OOV flag. The token stream is
    never shuffled twice and never joined row-at-a-time. At 100 TB the
    (source, token) table is bounded by sources x vocabulary-of-corpus —
    the natural compression of this statistic."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token"),
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    vocab = (
        st.groupBy("token")
        .agg(F.sum("cnt").alias("tf"))
        .orderBy(F.desc("tf"), "token")
        .limit(_VOCAB_SIZE)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    return (
        st.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "(1000000 * sum(CASE WHEN __in_vocab IS NULL THEN cnt ELSE 0 END))"
                " div sum(cnt)"
            )
            .cast("long")
            .alias("oov_ppm"),
        )
        .orderBy("source")
    )
