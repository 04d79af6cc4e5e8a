"""Join strategies for skewed keys.

``salted_join`` splits each hot key into ``n_salts`` sub-keys: the
skewed (fact) side gets a deterministic per-row salt, the dim side is
replicated n_salts ways, and the join runs on (key, salt). Shuffle
partitions then receive ~1/n of the hottest key's rows instead of all
of them. Result is row-identical to the plain join.

AQE's skew-join splitting handles moderate skew automatically (see
session.py); salting is the explicit tool for the pathological case —
a single key holding >1 partition-budget of rows — and for engines or
stages where AQE cannot rewrite (e.g. a skewed aggregate upstream of
the join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: str | Column | None = None,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (skewed side) to ``dim`` on key equality via
    salting. ``salt_on``: column giving per-row salt entropy (defaults
    to the fact key's row spread via xxhash64 of all fact columns is
    NOT deterministic across column sets — pass an id column)."""
    if salt_on is None:
        salt_on = fact_key
    salt = F.pmod(F.xxhash64(salt_on), F.lit(n_salts))
    f = fact.withColumn("_salt_f", salt)
    d = dim.withColumn("_salt_d", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(
        d,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("_salt_f") == F.col("_salt_d")),
        how,
    )
    return out.drop("_salt_f", "_salt_d")
