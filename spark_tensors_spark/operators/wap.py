"""Write-Audit-Publish (WAP) — the governance pattern over the
versioned snapshot store (operators/merge.py): a batch is merged into a
STAGED snapshot that readers cannot see, the data-quality rule engine
(operators/quality.py) audits the staged result, and only a clean audit
publishes the snapshot (one atomic directory rename).  A failed audit
discards the stage; readers keep the previous version — bad data never
becomes visible, even transiently.

Mechanics: `read_merged`/`_versions` only recognize ``_v=<n>`` dirs, so
the stage lives under ``wap_stage._v=<n>`` (the same
invisible-namespace rule the purge/compact maintenance ops follow).
Publishing is ``os.rename(stage, _v=<n>)`` — atomic on POSIX, and a
crash before it leaves only an ignorable stage dir.

At 100 TB the audit is the cheap part by design: `quality.validate` is
ONE wide aggregate over the staged snapshot (the profiler's shape), so
WAP costs one extra scan of the data that was just written — usually
cache/OS-page warm — and buys the invariant that every reader-visible
version passed its checks.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from spark_tensors_spark.operators.merge import _versions, merge_upsert
from spark_tensors_spark.operators.quality import validate


def write_audit_publish(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    rules: list[dict],
    order_col: str | None = None,
    delete_col: str | None = None,
) -> tuple[bool, int | None, list]:
    """Merge ``updates`` into the table at ``path`` behind an audit
    gate.  Returns (published, version-or-None, audit rows): the audit
    is `quality.validate` over the FULL staged snapshot (not just the
    batch — a merge can only be published if the resulting table
    passes, which also catches rule regressions from deletes/updates).
    """
    vs = _versions(path)
    if vs:
        base = spark.read.parquet(os.path.join(path, f"_v={vs[-1]}"))
    else:
        base = updates.limit(0)
        if delete_col is not None:
            base = base.drop(delete_col)
    merged = merge_upsert(
        base, updates, key_cols, order_col=order_col, delete_col=delete_col
    )
    new_v = (vs[-1] + 1) if vs else 0
    stage = os.path.join(path, f"wap_stage._v={new_v}")
    merged.write.mode("overwrite").parquet(stage)
    audit = validate(spark.read.parquet(stage), rules).collect()
    ok = all(r.n_violations == 0 for r in audit)
    if ok:
        final = os.path.join(path, f"_v={new_v}")
        shutil.rmtree(final, ignore_errors=True)  # crashed retry leftover
        os.rename(stage, final)
        return True, new_v, audit
    shutil.rmtree(stage, ignore_errors=True)
    return False, None, audit


def rollback_to_version(path: str, version: int) -> int:
    """The third verb of the governance story: REVERT a bad-but-
    published version by publishing a copy of ``_v=<version>`` as the
    NEWEST version — readers move back without manual surgery, history
    stays intact (the bad version remains addressable for forensics /
    time travel, exactly like Iceberg's rollback-creates-a-new-snapshot
    semantics, never a destructive delete).

    The copy is staged under the invisible ``wap_stage.`` namespace and
    renamed into place, so a crash mid-rollback leaves readers on the
    current version with only an ignorable stage dir behind.  No audit
    re-runs: the target version already passed its audit when it was
    first published.

    This store versions by physical directory, so rollback costs one
    file-level copy of the target snapshot (no recompute, no shuffle);
    a manifest-pointer layout (Iceberg/Delta) would make it O(1) — see
    SCALE.md on merge.py's full-rewrite cliff, which this inherits.
    """
    vs = _versions(path)
    if version not in vs:
        raise ValueError(
            f"version {version} not in committed versions {vs}"
        )
    new_v = vs[-1] + 1
    stage = os.path.join(path, f"wap_stage._v={new_v}")
    shutil.rmtree(stage, ignore_errors=True)
    shutil.copytree(os.path.join(path, f"_v={version}"), stage)
    final = os.path.join(path, f"_v={new_v}")
    shutil.rmtree(final, ignore_errors=True)  # crashed retry leftover
    os.rename(stage, final)
    return new_v
