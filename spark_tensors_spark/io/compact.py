"""Small-file compaction — the table-maintenance pass every
long-running parquet sink needs: streaming/CDC writers leave one file
per micro-batch (or per task), and a 100 TB table made of 10 KB files
is scan-bound on file-open overhead and driver-bound on file listing
long before it is IO-bound.

``compact_parquet`` rewrites a directory into ~``target_bytes`` files
and commits by RENAME-INTO-PLACE (write to ``<dir>.__compact__``, swap
directories).  A crash during the REWRITE leaves the original
untouched; the swap itself is TWO renames, so there is a brief window
in which ``path`` does not exist — a concurrent reader in that window
fails with path-not-found, and a crash inside it leaves the data under
``<dir>.__old__`` needing a hand rename (plain filesystems have no
atomic directory swap; a table format's pointer commit closes this).
Run compaction when no reader races the swap — per partition directory
at real scale, which also keeps each swap small.

Scale shape: one distributed read + write, no shuffle — coalesce()
only MERGES partitions (narrow dependency); rows never move between
executors, so compaction cost is a copy of the data, not a sort.  Row
order within merged files is partition-concatenation order; compaction
never changes table CONTENT (pinned by digest in tests).  At real
scale run it per partition directory (date=/hour=) so each swap is
partition-scoped and incremental writers are never blocked globally.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def plan_target_files(total_bytes: int, target_bytes: int) -> int:
    """ceil(total/target), at least 1 — how many output files a
    compaction should produce."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    return max(1, -(-total_bytes // target_bytes))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(size/target_bytes)`` files; returns (files_before,
    files_after).  No-op (and no rewrite) when already at or below the
    target count."""

    def _data_files(d: str) -> list[str]:
        return [
            os.path.join(dp, f)
            for dp, _dn, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = plan_target_files(total, target_bytes)
    if len(before) <= n_out:
        return len(before), len(before)
    tmp = path.rstrip("/") + ".__compact__"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_out).write.mode(
        "overwrite"
    ).parquet(tmp)
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        # roll the original back into place so a failed swap leaves
        # the table readable; manual recovery is now needed only for a
        # hard crash BETWEEN the two renames
        os.rename(old, path)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return len(before), len(_data_files(path))
