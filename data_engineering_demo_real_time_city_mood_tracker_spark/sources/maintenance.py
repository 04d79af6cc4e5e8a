"""Lake maintenance: small-file compaction and schema-evolution reads.

At 100 TB the classic operational problems are (a) streaming sinks and
per-trigger writes leaving thousands of tiny parquet files per
partition — listing cost and task-per-file overhead dominate scans —
and (b) producers adding columns over time. Neither needs a table
format: compaction is a deterministic rewrite sized by real bytes, and
parquet's mergeSchema handles additive evolution.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def data_files(path: str) -> list[str]:
    """Parquet data files under ``path`` (recursively; skips _SUCCESS,
    checkpoint metadata and hidden files)."""
    out = []
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(dirpath, f))
    return out


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` with file count sized by ACTUAL bytes
    (ceil(total/target)), preserving hive partitioning when
    ``partition_cols`` is given.

    Staged swap: the rewrite lands in ``path/../<name>__compact_tmp``
    and replaces the original only after success — a failure BEFORE
    the swap leaves the table untouched; a crash BETWEEN the two
    renames leaves the data intact in ``<path>__compact_old`` and the
    next run refuses to start until it is restored (fail-fast guard).
    (On an object store, make the swap a manifest/catalog pointer
    flip — directory rename is not atomic there; this local layout
    mirrors that contract.)

    Returns {files_before, files_after, bytes}.
    """
    backup = path.rstrip("/") + "__compact_old"
    if os.path.exists(backup):
        raise RuntimeError(
            f"stale {backup} from an interrupted compaction — restore it "
            f"to {path} (or delete it if {path} is intact) before re-running"
        )
    files = data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    # mergeSchema: a directory with additive schema drift (see
    # read_evolved) must compact to the UNION schema — a plain read
    # would take one file's footer and silently drop late-added columns
    df = spark.read.option("mergeSchema", "true").parquet(path)
    tmp = os.path.join(
        os.path.dirname(path.rstrip("/")),
        os.path.basename(path.rstrip("/")) + "__compact_tmp",
    )
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    import shutil

    # two renames cannot be atomic together on a plain filesystem: a
    # crash between them leaves `path` absent but FULLY recoverable
    # from `backup` (the guard above points the operator at it). The
    # backup is dropped only after the new layout is in place.
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return {
        "files_before": len(files),
        "files_after": len(data_files(path)),
        "bytes": total,
    }


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files have ADDITIVE schema drift
    (columns added over time): ``mergeSchema`` unions all file footers'
    schemas; missing columns surface as nulls. Costs one footer read
    per file at planning — acceptable for occasional evolved reads;
    compact (above) to re-homogenize the schema physically."""
    return spark.read.option("mergeSchema", "true").parquet(path)
