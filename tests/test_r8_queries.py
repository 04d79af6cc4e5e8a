"""Focused property tests for the round-8 queries, beyond the
registry-wide oracle parity gate: internal-consistency invariants
(identities the oracle comparison alone would not catch if both sides
drifted together) plus the plan shapes the r8 verdict items demanded."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import QUERIES
from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table


def test_bipartite_projection_invariants(spark, sf_dir):
    """pair weights are symmetric by construction (type_a < type_b
    canonical), overlap can't exceed either audience, jaccard is
    exactly |A∩B| / (|A|+|B|−|A∩B|) and lives in (0, 1]; audience
    sizes agree with a direct distinct count."""
    rows = QUERIES["bipartite_projection"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    audiences = {
        r.event_type: r.n
        for r in ev.select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_a == audiences[r.type_a]
        assert r.n_b == audiences[r.type_b]
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        assert r.jaccard == r.n_common / (r.n_a + r.n_b - r.n_common)
        assert 0.0 < r.jaccard <= 1.0


def test_drift_timeline_invariants(spark, sf_dir):
    """TV distance is a bounded metric: every (type, day) cell sits in
    [0, 1]; each type appears once per active day; n_buckets equals
    the type's GLOBAL bucket count (the zero-padded grid) for every
    day of that type."""
    rows = QUERIES["drift_timeline"](spark, sf_dir).collect()
    assert rows
    per_type_buckets = {}
    for r in rows:
        assert 0.0 <= r.tv_distance <= 1.0
        per_type_buckets.setdefault(r.event_type, set()).add(r.n_buckets)
    # grid property: constant bucket count within a type
    assert all(len(v) == 1 for v in per_type_buckets.values())
    keys = [(r.event_type, r.d) for r in rows]
    assert len(keys) == len(set(keys))


def test_ivf_nprobe_recall_curve_monotone(spark, sf_dir):
    """more probes can only help: recall@5 and candidate volume are
    both non-decreasing in nprobe, recall stays in [0, 1], and hits
    can never exceed k × n_queries."""
    rows = {
        r.nprobe: r for r in QUERIES["ivf_nprobe_recall"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4}
    for r in rows.values():
        assert 0.0 <= r.recall_at_5 <= 1.0
        assert r.total_hits <= 5 * r.n_queries
    assert rows[1].recall_at_5 <= rows[2].recall_at_5 <= rows[4].recall_at_5
    assert (
        rows[1].total_candidates
        <= rows[2].total_candidates
        <= rows[4].total_candidates
    )


def test_isotonic_calibration_is_isotonic(spark, sf_dir):
    """the defining property: iso_rate is monotone non-decreasing in
    bucket; it averages the raw rates (global pos/n conservation under
    each pooled level is implied by the minimax form — check the
    weaker but oracle-independent facts: fit is bounded by the raw
    rate range and agrees with raw_rate wherever raw is already
    isotonic across the whole frame)."""
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    lo = min(r.raw_rate for r in rows)
    hi = max(r.raw_rate for r in rows)
    prev = None
    for r in rows:
        assert r.raw_rate == r.pos / r.n
        assert lo <= r.iso_rate <= hi
        if prev is not None:
            assert r.iso_rate >= prev - 1e-12
        prev = r.iso_rate


def test_isotonic_pava_planted(spark):
    """planted violator: rates (0.5, 0.1) over equal weights must pool
    to the weighted mean 0.3 for both buckets; an already-isotonic
    tail stays untouched."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import ORACLES
    import duckdb

    con = duckdb.connect()
    con.execute(
        """CREATE VIEW events AS
           SELECT * FROM (VALUES
             (1, 'purchase', 2.0), (1, 'view', 2.0),
             (2, 'purchase', 7.0), (2, 'view', 7.0),
             (3, 'view', 7.0), (3, 'view2', 7.0),
             (4, 'purchase', 12.0), (4, 'purchase', 12.0)
           ) t(user_id, event_type, value)"""
    )
    got = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(ORACLES["isotonic_calibration"]).fetchall()
    }
    # bucket 0: 1/2 pos. bucket 1: 1/4 pos (violator). bucket 2: 2/2.
    # PAVA pools buckets 0 and 1 at (1+1)/(2+4) = 1/3.
    assert got[0] == (2, 1, 1 / 3)
    assert got[1] == (4, 1, 1 / 3)
    assert got[2] == (2, 2, 1.0)


def test_ntile_refinement_is_noop_at_bench_sf(spark, sf_dir):
    """the Munro-Paterson refinement loop in ntile_boundary_values is
    a no-op at bench data: no bit-prefix bucket of the NTILE callers'
    metrics holds anywhere near target_bucket_rows rows."""
    orders = load_table(spark, sf_dir, "orders")
    b = F.expr(
        "length(bin(cast(round(o_totalprice * 100, 0) as bigint))) * 2048L"
        " + shiftright(cast(round(o_totalprice * 100, 0) as bigint),"
        " greatest(length(bin(cast(round(o_totalprice * 100, 0) as bigint))) - 11, 0))"
    )
    mx = (
        orders.select(b.alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .first()[0]
    )
    assert mx < 2_000_000


def test_linkpred_adaptive_cap_budget_rule(spark):
    """the auto superhub cap picks the largest degree whose cumulative
    wedge volume fits wedges_per_edge × |sym edges|, and falls back to
    the minimum degree class when even that class busts the budget —
    planted star-plus-ring where the rule is hand-checkable."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.graph import (
        common_neighbor_link_prediction,
    )

    # ring 1..6 (degrees 2) plus a hub 99 wired to all six (degrees →
    # ring vertices 3, hub 6). sym edges = 24; wedge vol = 6·9+36 = 90.
    ring = [(i, i % 6 + 1) for i in range(1, 7)]
    edges = spark.createDataFrame(
        ring + [(99, i) for i in range(1, 7)], "id_a long, id_b long"
    )
    # budget 1×24 = 24 < 54 (the d=3 class) → fallback to min degree …
    # which IS 3 here, so the hub alone is excluded: candidates exist.
    out = common_neighbor_link_prediction(
        edges, k=100, max_center_degree="auto", wedges_per_edge=1
    ).collect()
    assert out, "fallback-to-min-degree must still enumerate wedges"
    assert all(r.cn >= 1 for r in out)
    # generous budget (90 ≤ 4×24=96) → hub included as a center: the
    # six ring pairs through the hub now score with cn ≥ 1 and pairs
    # of opposite ring vertices appear
    rich = common_neighbor_link_prediction(
        edges, k=100, max_center_degree="auto", wedges_per_edge=4
    ).collect()
    assert len(rich) >= len(out)
