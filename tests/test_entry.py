"""Driver-contract invariants for __spark_entry__.py — cheap static
checks that catch registry/ordering drift before the external driver
does (a typo in the front-load list would silently demote a query to
the unchecked tail)."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry = importlib.import_module("__spark_entry__")

from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import ORACLES, QUERIES


def test_front_list_names_exist():
    missing = [n for n in entry._FRONT if n not in QUERIES]
    assert not missing, f"_FRONT names not in registry: {missing}"


def test_every_oracle_has_a_query():
    stray = sorted(set(ORACLES) - set(QUERIES))
    assert not stray, f"oracles without queries: {stray}"


def test_queries_and_oracles_share_ordering():
    q = list(entry.queries())
    o = list(entry.oracle_sql())
    # front block: oracle-backed (hard-signal) entries first, stable
    # within each group — must survive any driver gate cap
    front = sorted(
        (n for n in entry._FRONT if n in QUERIES), key=lambda k: k not in ORACLES
    )
    assert q[: len(front)] == front
    assert all(n in ORACLES for n in q[:50]), "first 50 must be hash-gated"
    # oracle dict must follow the same front-loaded order restricted
    # to oracle-backed names (driver zips them positionally by name)
    assert o == [n for n in q if n in ORACLES]


def test_exposes_full_registry():
    assert set(entry.queries()) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLES)
