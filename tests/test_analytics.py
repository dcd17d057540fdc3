"""Semantic pins for the batch-8 analytics queries beyond the oracle
hash-match: delete-neighborhood candidate completeness, binned-interval-
join equivalence to the theta spec inside Spark itself, and funnel /
normalization invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_lunar_spark.queries import all_queries

SPECS = all_queries()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_delete_neighborhood_finds_all_lev1_pairs(spark):
    """The variant equi-join must produce EXACTLY the lev<=1 pairs of a
    crafted vocabulary (insert / delete / substitute / transpose cases)."""
    names = [
        "alpha", "alpah",  # transposition: lev 2, must NOT match
        "beta", "betta",   # insertion: lev 1
        "gamma", "gamm",   # deletion: lev 1
        "delta", "delza",  # substitution: lev 1
        "epsilon",         # isolated
    ]
    rows = [(i + 1, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    variants = F.array_distinct(
        F.expr(
            "transform(sequence(0, length(c_name)), i -> "
            "IF(i = 0, c_name, "
            "concat(substring(c_name, 1, i-1), substring(c_name, i+1))))"
        )
    )
    ex = df.select("c_custkey", "c_name", F.explode(variants).alias("v"))
    got = {
        (r.na, r.nb)
        for r in ex.alias("a")
        .join(ex.alias("b"), "v")
        .filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(F.col("a.c_name").alias("na"), F.col("b.c_name").alias("nb"))
        .distinct()
        .filter(F.levenshtein("na", "nb") <= 1)
        .collect()
    }
    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= 1
    }
    assert got == want
    assert ("beta", "betta") in got and ("gamma", "gamm") in got
    assert ("alpha", "alpah") not in got  # transpose is lev 2


def test_interval_binned_equals_theta_join(spark, sf_dir):
    """The bucketed equi-join rewrite must be row-identical to the naive
    theta self-join computed by Spark itself (not just the DuckDB twin)."""
    from pulsar_lunar_spark.session import load_table

    binned = SPECS["q_interval_pairs_binned"].fn(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    a = e.select(
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
        F.col("event_id").alias("id_a"),
        F.col("event_type").alias("type_a"),
    )
    b = e.select(
        F.col("user_id"),
        F.col("ts").alias("ts_b"),
        F.col("event_id").alias("id_b"),
        F.col("event_type").alias("type_b"),
    )
    theta = (
        a.join(b, "user_id")
        .filter(
            (
                (F.col("ts_b") > F.col("ts_a"))
                | ((F.col("ts_b") == F.col("ts_a")) & (F.col("id_b") > F.col("id_a")))
            )
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("interval 300 seconds"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    assert binned.exceptAll(theta).isEmpty()
    assert theta.exceptAll(binned).isEmpty()


def test_funnel_stage_counts_are_monotone(spark, sf_dir):
    rows = {r.stage: r.n_users for r in SPECS["q_funnel"].fn(spark, sf_dir).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_percentrank_norm_bounds(spark, sf_dir):
    out = SPECS["q_percentrank_norm"].fn(spark, sf_dir)
    bad = out.filter((F.col("qnorm") < 0) | (F.col("qnorm") > 1)).count()
    assert bad == 0


def test_cohort_offsets_start_at_zero(spark, sf_dir):
    out = SPECS["q_cohort_retention"].fn(spark, sf_dir)
    assert out.filter(F.col("week_offset") < 0).isEmpty()
    # every cohort has an offset-0 row (the week the user first appeared)
    cohorts = out.select("cohort_week").distinct().count()
    zero = out.filter(F.col("week_offset") == 0).count()
    assert zero == cohorts


def test_approx_quantile_accuracy_bound(spark, sf_dir, duck):
    """GK sketch at accuracy 10000 => rank error <= n/10000 (< 3 ranks at
    test scale). Each reported quantile must sit within a small exact-rank
    envelope around the target. (q_approx_quantile itself emits boolean
    flags for the oracle; this test recomputes the raw sketch values.)"""
    from pulsar_lunar_spark.session import load_table

    raw = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"))
        .groupBy("event_type")
        .agg(F.percentile_approx("cents", [0.5, 0.9, 0.99], 10000).alias("q"))
        .collect()
    )
    got = {r.event_type: (r.q[0], r.q[1], r.q[2]) for r in raw}
    for etype, qs in got.items():
        exact = duck.sql(
            f"""
            SELECT QUANTILE_DISC(c, [0.45, 0.55, 0.85, 0.95, 0.97, 1.0])
            FROM (SELECT CAST(FLOOR(value*100+0.5) AS BIGINT) AS c
                  FROM events WHERE event_type = '{etype}')
            """
        ).fetchone()[0]
        lo45, hi55, lo85, hi95, lo97, hi100 = exact
        assert lo45 <= qs[0] <= hi55, (etype, "p50", qs[0], exact)
        assert lo85 <= qs[1] <= hi95, (etype, "p90", qs[1], exact)
        assert lo97 <= qs[2] <= hi100, (etype, "p99", qs[2], exact)


def test_scd2_intervals_partition_time(spark, sf_dir):
    """Per user: exactly one is_current row, intervals non-overlapping and
    contiguous (each valid_to equals the next valid_from), and consecutive
    rows never share a state (duplicates were collapsed)."""
    rows = SPECS["q_scd2_intervals"].fn(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for recs in by_user.values():
        assert sum(r.is_current for r in recs) == 1
        assert recs[-1].is_current == 1
        for a, b in zip(recs, recs[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """The Spark merge fold (corpus._merge_adjacent applied in rank order)
    must equal a pure-python replication of (train merges -> greedy
    rank-order fold) on the same sampled docs. (q_bpe_encode itself emits
    a tokens_ok flag for the oracle; this test recomputes raw counts.)"""
    from pulsar_lunar_spark.operators.corpus import _merge_adjacent, bpe_train
    from pulsar_lunar_spark.operators.dedup import normalize_text
    from pulsar_lunar_spark.session import load_table
    import re

    d = load_table(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", n_merges=6)

    def norm(t: str) -> str:
        return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()

    def encode(word: str) -> int:
        syms = list(word)
        for _rank, a, b, _cnt in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    rows = d.filter(F.col("doc_id") % 19 == 0).select("doc_id", "text").collect()
    want = {}
    for r in rows:
        ws = [w for w in norm(r.text).split(" ") if w]
        want[r.doc_id] = (len(ws), sum(encode(w) for w in ws))
    words = d.filter(F.col("doc_id") % 19 == 0).select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(normalize_text(F.col("text")), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("w"),
    )
    syms = F.split(F.regexp_replace("w", "(?<=.)", " "), " ")
    toks = words.select(
        "doc_id", F.filter(syms, lambda s: F.length(s) > 0).alias("syms")
    )
    for _rank, a, b, _cnt in merges:
        toks = toks.select("doc_id", _merge_adjacent(F.col("syms"), a, b).alias("syms"))
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("syms")).alias("n_tokens"),
        )
        .collect()
    }
    assert got == want
    # and the registered query's envelope flags must all hold
    assert all(r.tokens_ok for r in SPECS["q_bpe_encode"].fn(spark, sf_dir).collect())
