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
