"""Hypothesis property tests: the engine's Column-expression text
primitives must agree with an executable pure-Python model on arbitrary
(printable-ASCII) input — guarding the regex/split/shingle semantics
that every dedup and text-analysis operator builds on.

ASCII alphabet on purpose: the model pins SEMANTICS, not Java-vs-Python
unicode case-folding trivia (corpus normalization strips non-ASCII
anyway).
"""

from __future__ import annotations

import hashlib
import re

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.functions import text as T

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


def py_normalize(s: str) -> str:
    t = s.lower()
    t = re.sub(r"[^a-z0-9 ]", " ", t)
    t = re.sub(r" +", " ", t)
    return t.strip()


def py_tokens(s: str) -> list[str]:
    return py_normalize(s).split(" ")


def py_shingles(s: str, k: int) -> list[str]:
    toks = py_tokens(s)
    if len(toks) >= k:
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return [" ".join(toks)]


@given(st.lists(ASCII, min_size=1, max_size=30))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_text_primitives_match_python_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        T.normalize(F.col("text")).alias("norm"),
        T.tokens(F.col("text")).alias("toks"),
        T.word_shingles(F.col("text"), 3).alias("sh3"),
        T.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    for r in out:
        s = texts[r.doc_id]
        assert r.norm == py_normalize(s)
        assert list(r.toks) == py_tokens(s)
        assert list(r.sh3) == py_shingles(s, 3)
        assert r.fp == hashlib.md5(py_normalize(s).encode()).hexdigest()


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=50))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_decimal_sum_matches_python(spark, values):
    """the dsum discipline (decimal sum → double) must equal Python's
    arbitrary-precision integer sum, regardless of partitioning."""
    df = spark.createDataFrame([(v,) for v in values], "v long")
    got = (
        df.repartition(7)
        .agg(F.sum(F.col("v").cast("decimal(28,0)")).cast("double").alias("s"))
        .first()
        .s
    )
    assert got == float(sum(values))


def py_jaccard_pairs(texts: list[str], k: int, threshold: float, max_df=None):
    """Pure-Python model of ngram_jaccard_pairs (ids = list index)."""
    sh = {i: set(py_shingles(t, k)) for i, t in enumerate(texts)}
    if max_df is not None:
        from collections import Counter

        df = Counter(s for ss in sh.values() for s in ss)
        sh = {i: {s for s in ss if df[s] <= max_df} for i, ss in sh.items()}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if inter and union and inter / union >= threshold:
                out[(a, b)] = inter / union
    return out


@given(
    st.lists(ASCII, min_size=2, max_size=12),
    st.sampled_from([0.0, 0.3, 0.6]),
    st.sampled_from([None, 2]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_ngram_jaccard_matches_python_model(spark, texts, threshold, max_df):
    """exact Jaccard pairs — with and without the hot-shingle df cap —
    must agree with the brute-force Python model on arbitrary input
    (pair set AND values)."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators import dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=threshold, max_df=max_df
        ).collect()
    }
    spark.catalog.clearCache()
    want = py_jaccard_pairs(texts, 2, threshold, max_df)
    assert set(got) == set(want), (texts, threshold, max_df)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # user
            st.integers(min_value=0, max_value=10_000),  # ts seconds
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=3600),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_sessionization_matches_python_model(spark, events, gap_sec):
    """gap sessionization must agree with a direct Python fold on
    arbitrary event sets (duplicates and unordered input included)."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.sessions import session_stats

    df = spark.createDataFrame(
        [(i, u, float(t)) for i, (u, t) in enumerate(events)],
        "event_id long, user_id long, secs double",
    ).select("event_id", "user_id", F.timestamp_seconds("secs").alias("ts"))
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in session_stats(df, "user_id", "ts", "event_id", gap_sec=gap_sec).collect()
    }

    import datetime as dt

    want = set()
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap_sec:
                want.add((u, str(dt.datetime.utcfromtimestamp(start)), str(dt.datetime.utcfromtimestamp(prev)), n))
                start, n = t, 0
            n += 1
            prev = t
        want.add((u, str(dt.datetime.utcfromtimestamp(start)), str(dt.datetime.utcfromtimestamp(prev)), n))
    assert got == want, (events, gap_sec)


def py_containment_pairs(texts, k, threshold, max_df):
    """brute-force model of containment_pairs (shares py_jaccard_pairs'
    shingle + df-cap semantics; score = inter / min set size)."""
    from collections import Counter

    sh = {i: set(py_shingles(t, k)) for i, t in enumerate(texts)}
    if max_df is not None:
        df = Counter(s for ss in sh.values() for s in ss)
        sh = {i: {s for s in ss if df[s] <= max_df} for i, ss in sh.items()}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sh[a] & sh[b])
            mn = min(len(sh[a]), len(sh[b]))
            if inter and mn and inter / mn >= threshold:
                out[(a, b)] = inter / mn
    return out


@given(
    st.lists(ASCII, min_size=2, max_size=12),
    st.sampled_from([0.3, 0.6]),
    st.sampled_from([None, 2]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_containment_matches_python_model(spark, texts, threshold, max_df):
    """asymmetric containment pairs — with and without the df cap —
    must agree with the brute-force Python model (pair set AND
    values) on arbitrary input."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators import dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(
            df, "text", "doc_id", k=2, threshold=threshold, max_df=max_df
        ).collect()
    }
    spark.catalog.clearCache()
    want = py_containment_pairs(texts, 2, threshold, max_df)
    assert set(got) == set(want), (texts, threshold, max_df)
    for pair, c in want.items():
        assert abs(got[pair] - c) < 1e-12


@given(
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_portable_mean_matches_python_model(spark, values):
    """clustering._portable_mean == the pure-Python floor-quantized
    model (math.floor(x*1e10) exact-int sum → two float divisions),
    regardless of partitioning — the tie-free discipline that keeps
    trained centroids engine-portable."""
    import math

    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.clustering import _portable_mean

    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = df.repartition(5).agg(_portable_mean(F.col("x")).alias("m")).first().m
    want = float(sum(math.floor(v * 1e10) for v in values)) / len(values) / 1e10
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=60))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hll_registers_match_python_model(spark, keys):
    """operators/sketches.py register derivation == a pure-Python md5
    model (index from first 2 hex chars mod m; rank = leading-zero
    bits of the next 64 + 1) for arbitrary keys."""
    import hashlib

    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.sketches import HLL_M, hll_register_rows

    def py_reg(k):
        h = hashlib.md5(f"hll:{k}".encode()).hexdigest()
        idx = int(h[:2], 16) % HLL_M
        tail = int(h[2:18], 16)
        rank = 65 if tail == 0 else 64 - tail.bit_length() + 1
        return idx, rank

    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    rows = hll_register_rows(df.select(F.lit("g").alias("g"), "k"), ["g"], F.col("k"))
    got = sorted((r.idx, r.rnk) for r in rows.collect())
    want = sorted(py_reg(k) for k in keys)
    assert got == want


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=4,
        max_size=4,
    ),
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=4,
        max_size=4,
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_sq8_codes_match_python_model(spark, vec_a, vec_b):
    """pq.sq8_code_expr == the pure-Python IEEE model
    (clamp(floor((x - mn) * 255 / rg))) on arbitrary finite doubles —
    the portability contract that lets the DuckDB oracle re-derive
    the quantizer; degenerate zero-range dims code to 0."""
    import math

    from data_engineering_demo_real_time_city_mood_tracker_spark.operators import pq

    df = spark.createDataFrame(
        [(0, [float(x) for x in vec_a]), (1, [float(x) for x in vec_b])],
        "vec_id long, embedding array<double>",
    )
    mins, ranges = pq.train_sq8(df, "embedding", dim=4)

    def model(x, mn, rg):
        if rg <= 0:
            return 0
        return min(255, max(0, math.floor((x - mn) * 255.0 / rg)))

    got = {
        r.vec_id: list(r.c)
        for r in df.select(
            "vec_id",
            pq.sq8_code_expr(F.col("embedding"), mins, ranges).alias("c"),
        ).collect()
    }
    for vid, vec in ((0, vec_a), (1, vec_b)):
        want = [model(x, mn, rg) for x, mn, rg in zip(vec, mins, ranges)]
        assert got[vid] == want


@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=12).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # excluded from the driver-window gate (pytest.ini); run via -m slow
def test_exact_substring_dedup_matches_python_model(spark, texts):
    """dedup_exact_substrings == a pure-Python replica (sliding
    min_len-gram hashing, keep the (doc_id, pos)-first occurrence,
    overlap-union the cut spans) on adversarial tiny-alphabet corpora
    where nearly every gram is duplicated — the regime that stresses
    the canonical-occurrence and span-union logic hardest."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.dedup import (
        dedup_exact_substrings,
    )

    L = 3
    occ: dict[str, tuple[int, int]] = {}
    docs = list(enumerate(texts))
    for did, t in docs:
        w = t.split(" ")
        for p in range(len(w) - L + 1):
            g = " ".join(w[p : p + L])
            if g not in occ:
                occ[g] = (did, p)
    counts: dict[str, int] = {}
    for did, t in docs:
        w = t.split(" ")
        for p in range(len(w) - L + 1):
            g = " ".join(w[p : p + L])
            counts[g] = counts.get(g, 0) + 1
    want = {}
    for did, t in docs:
        w = t.split(" ")
        cut = set()
        for p in range(len(w) - L + 1):
            g = " ".join(w[p : p + L])
            if counts[g] >= 2 and occ[g] != (did, p):
                cut.update(range(p, p + L))
        kept = [tok for i, tok in enumerate(w) if i not in cut]
        want[did] = (" ".join(kept), len(w) - len(kept), len(w))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_cut_tokens, r.n_tokens)
        for r in dedup_exact_substrings(df, "text", "doc_id", min_len=L).collect()
    }
    assert got == want
