"""Batch-10 operator semantics: cross-modal blocked GEMM pairs (side
masking, block isolation), SoftDeDup cluster weights (exact integer
weights per component), and calibration-bucket arithmetic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import dedup as D
from pulsar_lunar_spark.operators import similarity as S
from pulsar_lunar_spark.queries import all_queries


def test_cross_modal_pairs_only_cross_side_and_within_block(spark):
    rows = [
        # block 0: vec 0 (side 0) identical to vec 1 (side 1) -> pair;
        # vec 2 (side 0) orthogonal to vec 1 -> no pair;
        # vecs 0 and 2 are SAME side -> never compared even though cos=1
        (0, 0, [1.0, 0.0]),
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),
        (3, 0, [0.0, 1.0]),
        # block 1: identical to vec 0 but a different block -> no pair
        (5, 1, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"]).withColumn(
        "side", (F.col("vec_id") % 2).cast("int")
    )
    got = {
        (r.id_a, r.id_b): round(r.cosine_sim, 6)
        for r in S.blocked_cross_modal_pairs(
            df, block_col="label", side_col="side", threshold=0.5
        ).collect()
    }
    assert got == {(0, 1): 1.0, (2, 1): 1.0}


def test_cross_modal_empty_side_emits_nothing(spark):
    rows = [(0, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0])]  # side-0 only
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"]).withColumn(
        "side", (F.col("vec_id") % 2).cast("int")
    )
    assert (
        S.blocked_cross_modal_pairs(
            df, block_col="label", side_col="side", threshold=0.0
        ).count()
        == 0
    )


def test_softdedup_weights_exact_integer_per_cluster(spark):
    # chain 1-2-3 (one component of 3) and pair 5-6 (component of 2)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    got = {r.doc_id: r.weight_ppm for r in D.softdedup_weights(pairs).collect()}
    assert got == {1: 333333, 2: 333333, 3: 333333, 5: 500000, 6: 500000}


def test_calibration_buckets_internally_consistent(spark, sf_dir):
    rows = all_queries()["q_calibration_ece"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r.n for r in rows)
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert r.gap_ppm == abs(r.mean_pred_ppm - r.frac_pos_ppm)
        assert 0 <= r.frac_pos_ppm <= 1_000_000
        # every row carries the same global ECE, recomputable exactly
        assert r.ece_ppm == sum(x.n * x.gap_ppm for x in rows) // total


def test_threshold_sweep_monotone_and_consistent(spark, sf_dir):
    rows = all_queries()["q_threshold_sweep"].fn(spark, sf_dir).collect()
    assert [r.thr_ppm for r in rows] == sorted(r.thr_ppm for r in rows)
    positives = {r.tp + r.fn for r in rows}
    assert len(positives) == 1  # the label set does not depend on the threshold
    for a, b in zip(rows, rows[1:]):
        assert b.n_flagged <= a.n_flagged  # higher cutoff flags fewer
        assert b.recall_ppm <= a.recall_ppm  # recall only falls
    for r in rows:
        assert r.n_flagged == r.tp + r.fp
        if r.tp:
            assert r.precision_ppm == 1_000_000 * r.tp // (r.tp + r.fp)
            assert r.recall_ppm == 1_000_000 * r.tp // (r.tp + r.fn)
            assert r.f1_ppm == (2 * r.precision_ppm * r.recall_ppm) // (
                r.precision_ppm + r.recall_ppm
            )


def test_filter_agreement_kappa_recomputes(spark, sf_dir):
    r = all_queries()["q_filter_agreement"].fn(spark, sf_dir).collect()[0]
    assert r.n == r.n_both + r.n_only_rule + r.n_only_clf + r.n_neither
    po = 1_000_000 * (r.n_both + r.n_neither) // r.n
    # chance agreement via ppm marginals — the overflow-safe form (no
    # intermediate above 1e12, vs n^2-scaled count products that wrap
    # int64 past ~3M docs)
    pa = 1_000_000 * (r.n_both + r.n_only_rule) // r.n
    pb = 1_000_000 * (r.n_both + r.n_only_clf) // r.n
    pe = (pa * pb + (1_000_000 - pa) * (1_000_000 - pb)) // 1_000_000
    assert (r.po_ppm, r.pe_ppm) == (po, pe)
    want = (
        0
        if pe == 1_000_000
        else (
            1_000_000 * (po - pe) // (1_000_000 - pe)
            if po >= pe
            else -(1_000_000 * (pe - po) // (1_000_000 - pe))
        )
    )
    assert r.kappa_ppm == want
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000


def test_token_budget_mix_fills_quota_greedily(spark, sf_dir):
    import hashlib

    from pulsar_lunar_spark.session import load_table

    rows = all_queries()["q_token_budget_mix"].fn(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()

    def norm_tokens(t):
        return len(" ".join(t.strip().lower().split()).split(" "))

    def pri(doc_id):
        return int(hashlib.md5(f"mix-{doc_id}".encode()).hexdigest()[:15], 16)

    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append((pri(d.doc_id), d.doc_id, norm_tokens(d.text)))
    for r in rows:
        assert r.tokens_selected <= r.quota_tokens
        assert r.n_selected <= r.n_docs
        # exact greedy replay: cumulative fill in priority order
        cum = n = tok = 0
        for _, _, nt in sorted(by_src[r.source]):
            cum += nt
            if cum > r.quota_tokens:
                break
            n += 1
            tok += nt
        assert (r.n_selected, r.tokens_selected) == (n, tok)


def test_leakage_safe_split_has_zero_leaky_groups(spark, sf_dir):
    from pulsar_lunar_spark.session import load_table

    rows = all_queries()["q_leakage_safe_split"].fn(spark, sf_dir).collect()
    assert rows and all(r.n_leaky_groups == 0 for r in rows)
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    splits = {r.split for r in rows}
    assert splits <= {"train", "val"} and "train" in splits


def test_softdedup_weights_empty_pairs(spark):
    # a corpus with no near-dups must yield an empty weight table (every
    # doc then weighs 1e6 via the caller's left-join + coalesce)
    from pyspark.sql.types import LongType, StructField, StructType

    empty = spark.createDataFrame(
        [], StructType([StructField("id_a", LongType()), StructField("id_b", LongType())])
    )
    assert D.softdedup_weights(empty).count() == 0
