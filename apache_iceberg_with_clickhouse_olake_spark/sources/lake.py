"""Parquet-native lake features (SURVEY.md §2.9/§2.11). The reference
gets these from Iceberg (time travel BLOG_POST_COMPLETE_WALKTHROUGH.md:
521-527, evolution :539-553, compaction/expiry destination.json:92-93,
261-267). No Iceberg runtime ships in this sandbox, so each feature has
the documented parquet-native equivalent; with the Iceberg jar on the
classpath the same call sites map to ``writeTo``/`VERSION AS OF`/
``rewrite_data_files`` (kept behind this one module so the swap is
local).

- Versioned-directory snapshots: each write lands in ``<table>/v<N>``;
  reads pin a version (L1 time travel) or take the latest; the version
  listing is the L4 snapshot-metadata surface.
- Schema evolution: writers may add columns; readers use
  ``mergeSchema`` so old snapshots surface NULLs for new columns (D7).
- Compaction: coalesce-rewrite to a target file count -- the
  ``rewrite_data_files`` equivalent (D11); at scale this is the
  small-file GC that keeps scan tasks ~128 MiB.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def _version_dirs(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Append a new immutable snapshot version; returns its id (L1/D5)."""
    versions = _version_dirs(table_dir)
    v = (versions[-1] + 1) if versions else 1
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, f"v{v}"))
    return v


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read a pinned snapshot (time travel) or the latest; mergeSchema
    tolerates schema evolution across versions (D7/L1)."""
    versions = _version_dirs(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    v = version if version is not None else versions[-1]
    return spark.read.option("mergeSchema", "true").parquet(
        os.path.join(table_dir, f"v{v}")
    )


def snapshot_history(table_dir: str) -> list[int]:
    """L4: the snapshot listing (metadata-table equivalent)."""
    return _version_dirs(table_dir)


def compact(spark: SparkSession, data_dir: str, target_files: int) -> tuple[int, int]:
    """D11 rewrite_data_files equivalent: rewrite a parquet directory to
    ``target_files`` files; returns (files_before, files_after)."""
    before = len(
        [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    )
    df = spark.read.parquet(data_dir)
    tmp = data_dir.rstrip("/") + ".compact"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # Atomic-ish swap (single-FS local mode; a lake would commit a snapshot).
    bak = data_dir.rstrip("/") + ".old"
    os.rename(data_dir, bak)
    os.rename(tmp, data_dir)
    import shutil

    shutil.rmtree(bak)
    after = len([f for f in os.listdir(data_dir) if f.endswith(".parquet")])
    return before, after
