"""Snapshot-versioned parquet tables: time travel, rollback, vacuum —
the minimum viable lakehouse commit protocol (the Delta/Iceberg shape:
immutable data files + a manifest per version + one pointer whose
flip IS the commit), built on plain parquet directories so it runs on
any Hadoop-API filesystem with zero extra dependencies.

Layout under ``base``:

    data/v{N}-{uuid}/...parquet   immutable per-commit file groups
    _manifests/{N}.json           {"version", "parent", "op", "dirs"}
    _current.json                 {"version": N}   ← the commit point

Write protocol (crash-safe by ordering):
1. write the new data directory (invisible — nothing references it)
2. write manifest N (still invisible — the pointer names N-1)
3. flip ``_current.json`` to N (staged write + rename)
A crash before step 3 leaves the table at version N-1 with some
unreferenced garbage that ``vacuum`` collects; readers never see a
partial commit. If the pointer file is mid-flip (deleted, not yet
renamed), readers fall back to the highest manifest — never an error.

Reads cost one JSON fetch + one parquet scan over the manifest's
directories; time travel is just reading an older manifest, rollback
is a pointer flip to an older version (the abandoned versions stay
until vacuum, so rollback is itself reversible), and vacuum deletes
data directories no retained manifest references.

Scale: manifests store DIRECTORY names, not file lists, so commit
metadata is O(commits) bytes; appends never rewrite or move existing
data. For 100 TB tables pair with ``compact`` (sources/maintenance.py)
by writing the compacted files as a new ``overwrite`` snapshot.

Concurrency contract: SINGLE WRITER (the streaming sink's foreachBatch
serialization, or one batch job at a time). Two concurrent writers
would both read parent N and race on manifest N+1; ``vacuum`` run
concurrently with an in-flight commit could sweep its not-yet-pointed
manifest. Readers are always safe — they only ever follow committed
pointers/manifests. Multi-writer coordination needs a lock or a
conditional-put filesystem (the same line Delta/Iceberg draw).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import read_json_meta, write_json_meta


def _manifest_path(base: str, version: int) -> str:
    return f"{base}/_manifests/{version}.json"


def _pointer_path(base: str) -> str:
    return f"{base}/_current.json"


def _list_manifest_versions(spark: SparkSession, base: str) -> list[int]:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{base}/_manifests")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                out.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def current_version(spark: SparkSession, base: str) -> int | None:
    """Committed version: the pointer, or (mid-flip/crash fallback)
    the highest manifest present."""
    ptr = read_json_meta(spark, _pointer_path(base))
    if ptr is not None:
        return int(ptr["version"])
    versions = _list_manifest_versions(spark, base)
    return versions[-1] if versions else None


def write_snapshot(
    df: DataFrame,
    base: str,
    mode: str = "append",
    extra_meta: dict | None = None,
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version.
    ``mode='append'`` adds to the current version's data;
    ``'overwrite'`` replaces it (old versions stay time-travelable
    until vacuum). Writing after a rollback branches from the
    rolled-back version: the abandoned lineage's manifest numbers are
    overwritten by the new lineage (run ``vacuum`` after rollback to
    drop the abandoned versions explicitly first)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    parent = current_version(spark, base)
    version = 0 if parent is None else parent + 1
    new_dir = f"data/v{version}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(f"{base}/{new_dir}")
    dirs = [new_dir]
    if mode == "append" and parent is not None:
        prev = read_json_meta(spark, _manifest_path(base, parent))
        dirs = list(prev["dirs"]) + dirs
    write_json_meta(
        spark,
        _manifest_path(base, version),
        {
            "version": version,
            "parent": parent,
            "op": mode,
            "dirs": dirs,
            **(extra_meta or {}),
        },
    )
    write_json_meta(spark, _pointer_path(base), {"version": version})
    return version


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: current). Time travel =
    passing any retained version."""
    if version is None:
        version = current_version(spark, base)
        if version is None:
            raise ValueError(f"no committed snapshots at {base}")
    man = read_json_meta(spark, _manifest_path(base, version))
    if man is None:
        raise ValueError(f"no manifest for version {version} at {base}")
    return spark.read.parquet(*[f"{base}/{d}" for d in man["dirs"]])


def rollback_snapshot(spark: SparkSession, base: str, version: int) -> None:
    """Point the table back at an older version (a pointer flip — the
    abandoned versions stay readable until vacuum, so rollback is
    itself reversible)."""
    if read_json_meta(spark, _manifest_path(base, version)) is None:
        raise ValueError(f"no manifest for version {version} at {base}")
    write_json_meta(spark, _pointer_path(base), {"version": version})


def vacuum_snapshots(spark: SparkSession, base: str, keep_last: int = 2) -> list[str]:
    """Delete data directories referenced by NO retained manifest
    (retained = the ``keep_last`` highest versions ≤ current, plus the
    current version's ancestry dirs by construction) and drop the
    pruned manifests. Returns the deleted directory names. Also
    collects never-committed garbage from crashed writes."""
    cur = current_version(spark, base)
    if cur is None:
        return []
    all_versions = _list_manifest_versions(spark, base)
    versions = [v for v in all_versions if v <= cur]
    # manifests ABOVE current were abandoned by a rollback; vacuum
    # finalizes the rollback by dropping them too (otherwise their
    # data dirs would be deleted out from under a live manifest)
    retained = set(versions[-keep_last:]) | {cur}
    keep_dirs: set[str] = set()
    for v in retained:
        man = read_json_meta(spark, _manifest_path(base, v))
        if man is not None:
            keep_dirs.update(man["dirs"])
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    data_root = jvm.org.apache.hadoop.fs.Path(f"{base}/data")
    fs = data_root.getFileSystem(conf)
    deleted = []
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            name = f"data/{st.getPath().getName()}"
            if name not in keep_dirs:
                fs.delete(st.getPath(), True)
                deleted.append(name)
    for v in all_versions:
        if v not in retained:
            mp = jvm.org.apache.hadoop.fs.Path(_manifest_path(base, v))
            if fs.exists(mp):
                fs.delete(mp, False)
    return deleted
