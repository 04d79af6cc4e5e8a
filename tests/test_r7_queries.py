"""Focused property tests for the round-7 queries, beyond the
registry-wide oracle parity gate: planted-configuration behavior for
the link-prediction operator and internal-consistency invariants for
the statistical queries (identities the oracle comparison alone would
not catch if both sides drifted together)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import QUERIES


def test_linkpred_planted_graph(spark):
    """triangle 1-2-3 plus leaf 4 attached to 2 and 3: the one
    non-adjacent pair with common neighbors is (1,4) — cn=2, both
    degrees 2, union degree 2, Jaccard exactly 1.0. Superhub
    exclusion: capping centers at degree 2 removes vertices 2 and 3
    (degree 3) from wedge enumeration, leaving no candidates."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.graph import (
        common_neighbor_link_prediction,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "id_a long, id_b long"
    )
    out = common_neighbor_link_prediction(edges, k=10).collect()
    assert [(r.id_a, r.id_b, r.cn, r.union_deg, r.jaccard) for r in out] == [
        (1, 4, 2, 2, 1.0)
    ]

    capped = common_neighbor_link_prediction(
        edges, k=10, max_center_degree=2
    ).collect()
    assert capped == []


def test_wilson_ranking_formula_and_order(spark, sf_dir):
    """every emitted bound must equal a driver-side recomputation of
    the same expression from the exact (n, r) integers, the output
    must be bound-descending, and a perfect-but-tiny supplier must
    not outrank a large near-perfect one (the query's reason to
    exist, checked on a planted pair via the operator formula)."""
    rows = QUERIES["wilson_ranking"](spark, sf_dir).collect()
    assert rows, "sf data must produce a ranking"

    def wilson(n, r):
        phat = (n - r) / n
        return (
            phat + 3.8416 / (2.0 * n)
            - 1.96 * math.sqrt((phat * (1.0 - phat) + 3.8416 / (4.0 * n)) / n)
        ) / (1.0 + 3.8416 / n)

    for row in rows:
        assert abs(row.wilson_lb - wilson(row.n, row.r)) < 1e-12
        assert row.n >= 20
    bounds = [r.wilson_lb for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    # the ranking's raison d'etre
    assert wilson(200, 4) > wilson(4, 0)


def test_stl_decompose_additive_identity(spark, sf_dir):
    """x·1e6 = trend + seasonal + residual must hold EXACTLY per row
    (integer arithmetic, no rounding slack), and the trend must stay
    within the ppm range spanned by the raw series."""
    rows = QUERIES["stl_decompose"](spark, sf_dir).collect()
    assert rows
    xs = [r.x for r in rows]
    for r in rows:
        assert 1000000 * r.x - r.trend_ppm - r.seas_ppm == r.resid_ppm
        assert 0 <= r.trend_ppm <= 1000000 * max(xs)


def test_acf_lag_matches_float_recomputation(spark, sf_dir):
    """acf must be in [-1, 1] and equal the Pearson correlation
    recomputed in Python from the emitted exact sufficient
    statistics (same expression tree, so equality is bitwise)."""
    rows = QUERIES["acf_lag"](spark, sf_dir).collect()
    assert {r.lag for r in rows} == {1, 2, 3}
    for r in rows:
        var_a = float(r.n_pairs) * float(r.saa) - float(r.sa) * float(r.sa)
        var_b = float(r.n_pairs) * float(r.sbb) - float(r.sb) * float(r.sb)
        cov = float(r.n_pairs) * float(r.sab) - float(r.sa) * float(r.sb)
        if var_a * var_b > 0:
            expect = cov / math.sqrt(var_a * var_b)
            assert r.acf == expect
            assert -1.0 - 1e-12 <= r.acf <= 1.0 + 1e-12
        else:
            assert r.acf is None


def test_benford_partition_and_chi2(spark, sf_dir):
    """exactly 9 rows; observed counts partition the positive rows
    (freq ppm from the emitted total), and chi2 recomputes from the
    emitted integers."""
    rows = {r.digit: r for r in QUERIES["benford_quality"](spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, 10))
    total = sum(r.n_obs for r in rows.values())
    assert total > 0
    assert sum(r.exp_ppm for r in rows.values()) == 1_000_000
    for r in rows.values():
        assert r.freq_ppm == (1_000_000 * r.n_obs) // total
        assert r.dev_ppm == r.freq_ppm - r.exp_ppm
        assert r.chi2_ppm == (r.dev_ppm * r.dev_ppm) // r.exp_ppm


def test_feature_binning_equal_frequency(spark, sf_dir):
    """10 bins covering all rows; NTILE sizes differ by at most 1
    with the remainder on the EARLIER bins; bin value ranges ascend
    without overlap."""
    rows = sorted(
        QUERIES["feature_binning"](spark, sf_dir).collect(), key=lambda r: r.bin
    )
    assert [r.bin for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # remainder lands early
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_cents <= hi.min_cents
        assert lo.min_cents <= lo.max_cents


def test_keyword_rake_score_invariants(spark, sf_dir):
    """per-doc ranks are 1..≤3 and distinct; deg ≥ freq (every
    occurrence sits in a phrase of length ≥ 1); score is exactly
    deg/freq; keywords are never stopwords."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import _RAKE_STOPS

    rows = QUERIES["keyword_rake"](spark, sf_dir).collect()
    assert rows
    bydoc: dict = {}
    for r in rows:
        bydoc.setdefault(r.doc_id, []).append(r)
        assert r.deg >= r.freq >= 1
        assert r.score == r.deg / r.freq
        assert r.keyword not in _RAKE_STOPS
    for doc_rows in bydoc.values():
        rnks = sorted(r.rnk for r in doc_rows)
        assert rnks == list(range(1, len(rnks) + 1)) and len(rnks) <= 3


def test_zipf_profile_products_and_median(spark, sf_dir):
    """rank·count products recompute from the emitted integers, ranks
    are 1..k by descending count, and the lower-median row's
    deviation is exactly 0 ppm."""
    rows = sorted(
        QUERIES["zipf_profile"](spark, sf_dir).collect(), key=lambda r: r.rnk
    )
    assert rows and len(rows) <= 50
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.rank_cnt == r.rnk * r.cnt
    products = sorted((r.rank_cnt, r.word) for r in rows)
    med = products[(len(products) + 1) // 2 - 1][0]
    assert {r.zipf_dev_ppm for r in rows if r.rank_cnt == med} == {0}


def test_l_diversity_distribution_consistency(spark, sf_dir):
    """group counts times rows reconcile with the customer table, and
    the below-l flag is l < 3 exactly."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table

    rows = QUERIES["l_diversity"](spark, sf_dir).collect()
    n_rows = sum(r.n_rows for r in rows)
    assert n_rows == load_table(spark, sf_dir, "customer").count()
    for r in rows:
        assert r.below_l3 == (r.l_value < 3)
        assert r.l_value >= 1 and r.n_groups >= 1


def test_attribution_partitions_purchases(spark, sf_dir):
    """attributed touches partition the purchase events exactly; a
    purchase can never be credited to another purchase; revenue is
    the exact-cents sum."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table

    rows = QUERIES["attribution_last_touch"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purch
    assert "purchase" not in {r.touch for r in rows}
    total_cents = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.sum(F.round(F.col("value") * 100, 0).cast("long")))
        .first()[0]
    )
    assert sum(r.revenue_cents for r in rows) == total_cents


def test_reconciliation_covers_all_orders(spark, sf_dir):
    """bucket counts partition the orders table; the no_lineitems
    bucket equals the anti-join count; an 'exact' bucket, if present,
    has zero deviation extrema."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table

    rows = {r.bucket: r for r in QUERIES["order_total_reconciliation"](
        spark, sf_dir
    ).collect()}
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r.n_orders for r in rows.values()) == orders.count()
    headerless = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).count()
    got = rows.get("no_lineitems")
    assert (got.n_orders if got else 0) == headerless
    if "exact" in rows:
        assert rows["exact"].min_dev_cents == rows["exact"].max_dev_cents == 0
    for r in rows.values():
        assert r.min_dev_cents <= r.max_dev_cents


def test_kendall_tau_identity(spark, sf_dir):
    """C + D = n_pairs = k(k-1)/2 (no ties by construction), and tau
    is exactly (C-D)/n_pairs in [-1, 1]."""
    row = QUERIES["kendall_tau_rankings"](spark, sf_dir).first()
    assert row.concordant + row.discordant == row.n_pairs
    k = (1 + (1 + 8 * row.n_pairs) ** 0.5) / 2
    assert abs(k - round(k)) < 1e-9  # n_pairs is a triangular number
    assert row.kendall_tau == (row.concordant - row.discordant) / row.n_pairs
    assert -1.0 <= row.kendall_tau <= 1.0
