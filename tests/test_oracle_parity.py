"""Mirror of the driver's t2 gate: run every registered query on Spark
AND its DuckDB oracle on the same parquet, compare row count, column
names, and order-insensitive values. This is the local correctness
feedback loop (sf0.001 for speed; the driver runs sf0.01).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import ORACLES, QUERIES
from data_engineering_demo_real_time_city_mood_tracker_spark.schemas import TESTDATA_TABLES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


# marked slow (excluded from the default driver-window gate; run via
# -m slow): the two heaviest oracle rows — kcore_portable's unrolled
# 4-round peel CTE takes DuckDB ~220 s alone. The driver's own t2
# correctness sampler still covers every registered query at sf0.01.
_SLOW_ORACLE_ROWS = {"kcore_portable", "ivfpq_index_probe"}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE_ROWS else n
        for n in sorted(ORACLES)
    ],
)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    # Driver-canon contract (r3 verdict item 2): the external driver
    # canonicalizes both result frames with pandas sort_values, which
    # raises "unhashable type" on array/map/struct cells — bpe_encode's
    # array<string> sample column crashed the r3 gate this way. No
    # oracle-backed query may emit a complex-typed output column.
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if any(t in f.dataType.simpleString() for t in ("array", "map", "struct"))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would crash "
        "the driver's pandas canonicalizer — serialize them "
        "(concat_ws / array_to_string) on both sides"
    )
    if orows:
        obad = [
            ocols[i]
            for i, v in enumerate(orows[0])
            if isinstance(v, (list, dict, tuple))
        ]
        assert not obad, f"{name}: oracle emits complex-typed columns {obad}"

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    # Vacuity guard (the r3 priority_linestatus lesson: a date slice
    # outside the testdata's range made both engines return 0 rows and
    # the hash row proved nothing). A 0-row match is not evidence —
    # every oracle-backed query must exercise its logic on the gate
    # data. Whitelist additions need a written sparsity argument.
    if len(srows) == 0:
        # Sparsity exceptions, sf0.001 ONLY — all verified non-empty
        # at the driver's sf0.01 by the verify harness every round,
        # so the guard stays STRICT there:
        # - the events co-activity graph has no qualifying edges /
        #   triangles / 4-cores at 1/10 the gate SF (too few
        #   same-minute co-occurrences) -> the four graph queries
        #   built on it are legitimately empty here;
        # - important_parts (Q11) slices to NATION_7 suppliers, of
        #   which sf0.001 has ZERO (measured; sf0.01 has 6);
        # - linkpred_topk rides the SAME sparse co-activity graph as
        #   the four graph queries (no wedges at sf0.001; 100 rows at
        #   sf0.01, hash-matched);
        # - burst_detection's 3-event min-support floor is unreachable
        #   at sf0.001's ~0.1 events/min/type (1 interval at sf0.01,
        #   hash-matched; the floor is what makes the detector
        #   meaningful — see its docstring).
        sparse_at_toy_sf = {
            "triangle_count", "label_propagation", "pagerank_portable",
            "kcore_portable", "important_parts", "clustering_coefficient",
            "linkpred_topk", "burst_detection", "degree_distribution",
        }
        assert name in sparse_at_toy_sf and sf_dir.rstrip("/").endswith(
            "sf0.001"
        ), (
            f"{name}: 0 rows on BOTH sides — the gate row is vacuous; "
            "widen the query's slice to the testdata's range"
        )
    sset = _rowset(scols, [tuple(r) for r in srows])
    oset = _rowset(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b]
    assert sset == oset, f"{name}: first mismatched rows {[(sset[i], oset[i]) for i in mism[:3]]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_selection_queries_release_their_caches(spark, sf_dir):
    """r4 ADVICE: DataFrame.persist registers in the session
    CacheManager and is NEVER reclaimed by the ContextCleaner, so the
    r4 selection block's trainer caches (bigram partials, DSIR bucket
    counts, probe features, funnel stages, waterfilling token counts)
    accumulated across a 169-query registry run. Every one of those
    operators now checkpoints its result and unpersists before
    returning — a full materialization of each must leave the
    CacheManager exactly as it found it."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    for name in (
        "bigram_lm_score", "dsir_sample", "moore_lewis_select",
        "quality_classifier", "kcenter_coreset", "filter_funnel_report",
        "token_budget_mixture", "grad_match_select", "ccnet_buckets",
        # r5 ADVICE: the corpus-rewrite dedup ops persisted their
        # token-level frames with no release — they now checkpoint the
        # dup-volume-bound cut lists and unpersist.
        "paragraph_dedup", "exact_substring_dedup",
        # r6: cross-corpus decontamination checkpoints its match set
        # and releases both shingle caches
        "cross_dedup_fuzzy",
        # r6 leak-scan sweep: every remaining CacheManager-leaking
        # query (shared shingle/array/postings frames, returned graph
        # frames, probe/report partials) now uses reclaimable
        # localCheckpoints instead of persists — one representative
        # per converted helper plus each bespoke query-level site.
        "dedup_ngram_topk",        # _sized_shingle_rows
        "dedup_minhash_pairs",     # minhash arr
        "dedup_prefix_filter",     # prefix arr
        "dedup_clusters",          # minhash arr via connected_components
        "minhash_estimate_accuracy",
        "repeated_ngram_spans",    # repeated_span_mass garr/gc
        "dedup_index_probe",       # index probe base/exact_pairs
        "bm25_topk",               # bm25_rank tf
        "bm25_index_probe",
        "rrf_fusion",
        "semantic_dedup",
        "tfidf_topk",
        "token_df_stats",
        "top_supplier",
        "important_parts",
        "join_key_skew_profile",
        "bloom_dedup",
        "pq_ann_topk",
        "label_propagation",       # graph returned-frame checkpoints
        "pagerank_portable",
        "kcore_portable",
        "kcore_decomposition",
        "pagerank_topk",
        "connected_components_star",
        "cluster_representatives",
    ):
        QUERIES[name](spark, sf_dir).collect()
        assert cm.isEmpty(), f"{name} left persisted frames behind"


@pytest.mark.parametrize(
    "name", ["quality_classifier", "grad_match_select"]
)
def test_probe_gates_exact_on_empty_docs(spark, sf_dir, name, tmp_path):
    """r5 verdict item 2: the probe oracles used to drop documents with
    zero feature rows (NULL text — an empty STRING splits to [''] in
    BOTH engines, so only NULL tokenizes to nothing) from their
    residual/gradient sums, while the trainer keeps them via the b = -1
    sentinel row. The oracle's f CTE now carries the same sentinel
    rows; plant empty/NULL/whitespace-only documents into the corpus
    and require the hash gate to stay EXACT."""
    import duckdb as ddb

    src = f"{sf_dir}/documents.parquet"
    planted = tmp_path / "corpus"
    planted.mkdir()
    con0 = ddb.connect()
    con0.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{src}')
          UNION ALL
          SELECT * FROM (VALUES
            (100000, '', 'en', 'planted', 0),
            (100001, CAST(NULL AS VARCHAR), 'en', 'planted', 0),
            (100002, '   ', 'de', 'planted', 3),
            (100003, CAST(NULL AS VARCHAR), 'de', 'planted', 0)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{planted}/documents.parquet' (FORMAT PARQUET)"""
    )
    sdf = QUERIES[name](spark, str(planted))
    srows = sdf.collect()
    con = ddb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{planted}/documents.parquet')"
    )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows) and len(srows) > 0
    assert _rowset(sdf.columns, [tuple(r) for r in srows]) == _rowset(
        ocols, orows
    ), f"{name}: diverges on a corpus with empty/NULL documents"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_output_columns(spark, sf_dir, name):
    """Registry-wide complex-type ban (r4 verdict item 1). The driver's
    pandas canonicalizer sort_values raises "unhashable type" on
    array/map/struct cells, so EVERY registered query — oracle-backed
    OR rows-only — must emit scalar columns. The r4 version of this
    check lived inside test_query_matches_oracle and therefore only
    covered ORACLES, which is exactly how the rows-only quantile_sketch
    re-walked into the r3 bpe_encode failure class (array<double>
    output → spark_rows null in CORRECTNESS_r04)."""
    sdf = QUERIES[name](spark, sf_dir)
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if any(t in f.dataType.simpleString() for t in ("array", "map", "struct"))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would crash "
        "the driver's pandas canonicalizer — serialize them "
        "(concat_ws / element_at scalars) before returning"
    )
