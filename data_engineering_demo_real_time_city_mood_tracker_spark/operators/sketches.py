"""Mergeable sketch operators built as pure DataFrame compositions.

Count-min sketch: d independent hash rows × w buckets, bucket id =
first hex chars of a salted md5 (deterministic, reproducible in the
DuckDB oracle with zero hex→int conversion). Cells are additive, so
the same build works batch (one groupBy) and streaming (update-mode
windowless agg: Spark's state IS the sketch, micro-batches merge in).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2 hex chars → w = 256 buckets; e/256 ≈ 1% of N expected overestimate
CMS_DEPTH = 4
CMS_HEX_CHARS = 2


def cms_buckets(key: Column, depth: int = CMS_DEPTH, hex_chars: int = CMS_HEX_CHARS) -> Column:
    """array<struct<i,b>> of the key's (hash-row, bucket) cells."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), key)), 1, hex_chars
                ).alias("b"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key: Column,
    depth: int = CMS_DEPTH,
    hex_chars: int = CMS_HEX_CHARS,
) -> DataFrame:
    """(i, b, n) sketch cells. One shuffle of depth×N exploded rows
    that map-side-combines to ≤ depth×16^hex_chars cells per partition
    — O(d×w) memory for any N. On a STREAMING frame the identical
    expression is an update-mode aggregation: per-trigger state is the
    sketch and micro-batches merge additively (cells are mergeable)."""
    return (
        df.select(F.explode(cms_buckets(key, depth, hex_chars)).alias("c"))
        .select("c.i", "c.b")
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    keys: DataFrame,
    cells: DataFrame,
    key: Column,
    depth: int = CMS_DEPTH,
    hex_chars: int = CMS_HEX_CHARS,
) -> DataFrame:
    """point estimates (min over hash rows) for each row of ``keys``.
    The finished sketch is tiny (d×w rows) → broadcast join."""
    out_cols = keys.columns
    return (
        keys.select(*out_cols, F.explode(cms_buckets(key, depth, hex_chars)).alias("c"))
        .select(*out_cols, "c.i", "c.b")
        .join(F.broadcast(cells), ["i", "b"])
        .groupBy(*out_cols)
        .agg(F.min("n").alias("est_n"))
    )


# --------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007,
# "HyperLogLog: the analysis of a near-optimal cardinality estimation
# algorithm"): every arithmetic step is engine-exact, so the whole
# sketch — registers, harmonic sum, estimate — hash-matches a SQL
# oracle bitwise (unlike approx_count_distinct / hll_sketch_agg, whose
# sketch internals are engine-specific by construction).
#
# Portability discipline:
# - hash = md5 (identical hex on any engine);
# - register index = integer arithmetic on the first 2 hex chars;
# - rank = leading-zero count of the next 16 hex chars (64 bits) done
#   entirely in string ops (trim + CASE) — no float anywhere;
# - harmonic sum scaled by 2^40 so every term 2^(40-M) is an EXACT
#   integer (BIGINT; ranks > 40 truncate to 0 on both engines alike,
#   P[rank>40] ≈ 2^-40 per key) and the total ≤ 32·2^40 < 2^53, so the
#   final int→double cast is exact and the one IEEE division portable;
# - alpha_m for m=32 is the standard fixed constant 0.697 — the
#   numerator alpha·m²·2^40 is ONE shared literal, never recomputed.
# No small/large-range corrections: they need ln(), which is not
# bitwise-portable across libms; the raw estimate is the contract
# (documented; the registered query also returns the exact count so
# accuracy stays test-assertable).

HLL_P = 5          # m = 32 registers: raw-branch territory for the
HLL_M = 1 << HLL_P  # test corpus (n_distinct ≈ 150 > 2.5·m = 80)
HLL_SCALE_BITS = 40
# one literal, bit-identical in the Spark plan and the SQL oracle
HLL_NUMER = repr(0.697 * HLL_M * HLL_M * float(1 << HLL_SCALE_BITS))

_HEX = "0123456789abcdef"


def hll_register_rows(
    df: DataFrame, group_cols: list[str], key: Column
) -> DataFrame:
    """(group..., idx, rnk) — one row per input row with its HLL
    register index and rank; groupBy(...).agg(max(rnk)) folds these to
    registers, and register frames from different partitions/batches
    merge with the same max (the sketch is mergeable by construction).
    """
    hexv = lambda e: f"(instr('{_HEX}', {e}) - 1)"
    tail = "substr(_h, 3, 16)"
    lt = f"trim(LEADING '0' FROM {tail})"
    clz4 = (
        f"(CASE substr({lt}, 1, 1) WHEN '1' THEN 3 WHEN '2' THEN 2 "
        f"WHEN '3' THEN 2 WHEN '4' THEN 1 WHEN '5' THEN 1 "
        f"WHEN '6' THEN 1 WHEN '7' THEN 1 ELSE 0 END)"
    )
    return df.select(
        *group_cols,
        F.md5(F.concat(F.lit("hll:"), key.cast("string"))).alias("_h"),
    ).select(
        *group_cols,
        F.expr(
            f"(({hexv('substr(_h, 1, 1)')} * 16 + {hexv('substr(_h, 2, 1)')})"
            f" % {HLL_M})"
        ).alias("idx"),
        F.expr(
            f"CASE WHEN {lt} = '' THEN 65 "
            f"ELSE (16 - length({lt})) * 4 + {clz4} + 1 END"
        ).alias("rnk"),
    )


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: list[str], est_name: str
) -> DataFrame:
    """(group..., est) from a (group..., idx, m) register frame —
    scaled exact-integer harmonic sum, empty registers contributing
    2^40 (i.e. 2^-0) each, one portable double division at the end."""
    term = F.when(F.col("m") > HLL_SCALE_BITS, F.lit(0).cast("long")).otherwise(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE_BITS} - m)")
    )
    return (
        registers.groupBy(*group_cols)
        .agg(F.sum(term).alias("_s"), F.count(F.lit(1)).alias("_nreg"))
        .select(
            *group_cols,
            (
                F.lit(float(HLL_NUMER))
                / (
                    F.col("_s")
                    + (F.lit(HLL_M) - F.col("_nreg"))
                    * F.lit(1 << HLL_SCALE_BITS)
                ).cast("double")
            ).alias(est_name),
        )
    )
