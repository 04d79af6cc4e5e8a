"""Streaming materialized-aggregate maintenance: the live twin of
``plans/pipelines.py:merge_agg_partials`` — each micro-batch collapses
to per-key mergeable partials and merges into a standing base table,
so the aggregate stays fresh without a stateful streaming agg holding
every key in executor memory forever. The state IS the base table:
unbounded key cardinality costs parquet, not state store.

Exactness discipline: sums are carried as DECIMAL columns end-to-end
(decimal + decimal is exact and associative), so after any number of
micro-batch merges the base is bitwise-equal to a from-scratch batch
aggregation over the same rows — averages derive from the moments at
read time.

Replay safety (crash-atomic): each merge writes a fresh batch-versioned
directory ``{base_path}__v{batch_id}`` carrying the full committed-id
set in ``_committed.json`` (underscore-prefixed, so Spark's parquet
reader ignores it), then a single ``os.rename`` flips the
``base_path`` symlink onto it. That one rename is simultaneously the
data swap and the commit record: a crash before it leaves the old base
intact and the batch uncommitted (replay re-merges into the OLD data —
no loss, no double count); a crash after it leaves the batch both
visible and recorded (replay sees its id in ``_committed.json`` and
skips). There is no window where the base is missing or a batch can
merge twice. Committed ids are scoped to one checkpoint lineage —
pointing a fresh checkpoint (whose batch ids restart at 0) at an
existing base is out of contract, as with any foreachBatch commit log.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COMMITS = "_committed.json"


def _read_committed(version_dir: str | None) -> set[int]:
    if not version_dir:
        return set()
    try:
        with open(os.path.join(version_dir, _COMMITS)) as fh:
            return set(json.load(fh))
    except (OSError, ValueError):
        return set()


def _current_version(base_path: str) -> str | None:
    """Resolve the live version dir, migrating legacy layouts.

    Legacy (pre-versioned) layout was a real directory at ``base_path``
    staged via ``__agg_tmp``/``__agg_old`` renames; a crash between its
    two renames could leave ``base_path`` missing with the standing
    aggregate stranded in ``__agg_old`` — restore it here (the ADVICE
    r2 scenario) before anything merges against an empty base."""
    if os.path.islink(base_path):
        target = os.path.realpath(base_path)
        return target if os.path.isdir(target) else None
    legacy_old = f"{base_path}__agg_old"
    if not os.path.exists(base_path) and os.path.isdir(legacy_old):
        os.rename(legacy_old, base_path)
    return base_path if os.path.isdir(base_path) else None


def incremental_agg_stream(
    stream_df: DataFrame,
    keys: list[str],
    value_col: str,
    base_path: str,
    checkpoint: str,
    commit_log_dir: str,
    count_col: str = "n",
    sum_col: str = "value_sum",
    scale: int = 6,
    **trigger,
):
    """Maintain a per-``keys`` (count, exact-decimal sum) base table
    under ``base_path`` from a document/event stream.

    Per micro-batch: one delta agg (∝ batch size), one merge re-agg
    (∝ touched keys + base keys — never raw history), one
    atomically-flipped versioned write (readers always see a complete,
    committed base). Returns the StreamingQuery."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.plans.pipelines import merge_agg_partials

    os.makedirs(commit_log_dir, exist_ok=True)

    def step(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(commit_log_dir, f"batch-{batch_id}.committed")
        current = _current_version(base_path)
        committed = _read_committed(current)
        if batch_id in committed or os.path.exists(marker) or batch.isEmpty():
            return
        spark = batch.sparkSession
        delta = batch.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias(count_col),
            F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).alias(sum_col),
        )
        if current is not None:
            base = spark.read.parquet(current)
            merged = merge_agg_partials(
                base, delta, keys, count_col=count_col, sum_cols=(sum_col,)
            )
        else:
            merged = delta
        # Stage the new version: data + its own commit record. A stale
        # dir from a crashed attempt of this same batch is overwritten.
        vdir = os.path.abspath(f"{base_path}__v{batch_id}")
        merged.write.mode("overwrite").parquet(vdir)
        with open(os.path.join(vdir, _COMMITS), "w") as fh:
            json.dump(sorted(committed | {batch_id}), fh)
        # One-time migration off the legacy real-directory layout: park
        # the old dir so the symlink can take its name. A crash between
        # these two renames is recovered by _current_version above.
        if os.path.isdir(base_path) and not os.path.islink(base_path):
            os.rename(base_path, f"{base_path}__agg_old")
        # THE commit point: one atomic rename flips data + commit set.
        ptr_tmp = f"{base_path}__ptr_tmp"
        if os.path.lexists(ptr_tmp):
            os.remove(ptr_tmp)
        os.symlink(os.path.abspath(vdir), ptr_tmp)
        os.rename(ptr_tmp, base_path)
        # Post-commit housekeeping (best-effort; crash leaves only
        # junk). Deletion is restricted to the EXACT names this module
        # creates — `__v<digits>`, `__agg_old`, `__agg_tmp`,
        # `__ptr_tmp` — so an unrelated user directory sharing the
        # `{base}__` prefix (e.g. agg_base__backup) is never touched
        # (ADVICE r3).
        basename = os.path.basename(base_path)
        own = re.compile(
            re.escape(basename) + r"__(v\d+|agg_old|agg_tmp|ptr_tmp)$"
        )
        parent = os.path.dirname(os.path.abspath(base_path)) or "."
        for name in os.listdir(parent):
            full = os.path.join(parent, name)
            if (
                own.fullmatch(name)
                and full != vdir
                and not os.path.islink(full)
                and os.path.isdir(full)
            ):
                shutil.rmtree(full, ignore_errors=True)
        open(marker, "w").close()

    writer = stream_df.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def hll_distinct_stream(stream_df: DataFrame, group_cols: list[str], key_col: str):
    """Streaming distinct-count sketch: the portable HLL's register
    aggregation (operators/sketches.py) as an UPDATE-mode streaming
    agg — Spark's state store holds exactly the registers, max-merging
    each micro-batch in, so state is O(groups × m) rows (m = 32)
    FOREVER, regardless of how many events or distinct keys stream
    through. That is the whole point of sketch-backed streaming
    dashboards: exact streaming countDistinct needs O(distinct keys)
    state; this needs 32 rows per group at any cardinality.

    Returns the register frame (group..., idx, m); the consumer feeds
    it to hll_estimate_from_registers batch-side (the estimate is a
    per-group fold over ≤ m rows). Because registers max-merge, the
    drained stream's registers — and therefore the estimate — equal
    the batch computation on the same data EXACTLY (parity
    test-asserted, not approximately)."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.sketches import hll_register_rows

    rows = hll_register_rows(stream_df, group_cols, F.col(key_col))
    return rows.groupBy(*group_cols, "idx").agg(F.max("rnk").alias("m"))
