"""Write-Audit-Publish (WAP): data lands durably, gets audited, and
only PUBLISHES into the consumer-visible table if every expectation
passes — the lakehouse pattern that keeps a bad batch out of every
downstream reader without any reader-side coordination.

Shape on this engine's fallback Delta log:

1. **Write**: the batch commits to a STAGING table (its own
   ``_delta_log``) — durable, replayable, invisible to consumers.
2. **Audit**: ``quality.expectation_report`` runs against the staged
   snapshot (row rules, uniqueness, referential rules). The report is
   persisted next to the staging table for the operator's post-mortem
   either way.
3. **Publish**: on a green report, the staged rows append to the
   target via an IDEMPOTENT txn commit (``txnAppId`` = the WAP id), so
   a crashed-and-retried publish cannot double-land; on a red report
   the target is untouched and the staged batch stays inspectable.

At 100 TB the only data movement is the staged files' one append
rewrite into the target layout; audit cost is the expectation scans.
(Engines with native branch/tag support express step 3 as a branch
fast-forward; the txn-append publish gives the same exactly-once
visibility semantics on a plain Delta log.)

Reference parity: the reference loads then validates (recon AFTER
publish, ``reporting_utils.py``); WAP is the graduation of that recon
into a pre-publish gate.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources import delta_log
from ..sources.readers import read_delta
from .quality import expectation_report

__all__ = ["wap_run", "WapRejected"]


class WapRejected(Exception):
    """The audit failed: the batch stays in staging, the target is
    untouched. Carries the failing rules for the operator."""

    def __init__(self, failures: list[dict], staging_path: str):
        self.failures = failures
        self.staging_path = staging_path
        super().__init__(
            f"WAP audit failed ({[f['rule'] for f in failures]}); "
            f"batch retained at {staging_path}"
        )


def wap_run(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    staging_root: str,
    *,
    wap_id: str | None = None,
    row_rules=None,
    unique_rules=None,
    ref_rules=None,
    partition_by: list[str] | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    fresh_staging: bool = False,
) -> dict:
    """Run one Write-Audit-Publish cycle; returns a summary dict
    (wap_id, staging_path, audit rows, published version or None).

    ``wap_id`` doubles as the idempotency key: re-running the same
    cycle (same id) is safe at EVERY crash point — a retry that finds
    the staging table already committed REUSES the staged snapshot
    instead of appending a second copy (the staging commit is atomic,
    so an existing log version means the batch landed whole; the
    ``batch`` argument is then ignored, which is why each distinct
    batch needs a distinct id), and a retry after publish is a no-op
    append (txn high-water mark). Defaults to a fresh UUID.

    ``txn_app_id``/``txn_version`` override the publish idempotency
    key (default ``wap-<wap_id>`` at version 1) — a streaming caller
    passes ONE app id with the batch id as the version, so the
    target's txn state stays one entry per stream instead of one per
    batch. ``fresh_staging`` appends a per-ATTEMPT suffix to the
    staging path for callers that re-derive the batch each attempt
    (a streaming replay's frame may differ from the crashed
    attempt's) — the publish key, not the staging path, still
    carries the publish idempotency.
    """
    wap_id = wap_id or uuid.uuid4().hex
    suffix = f"-{uuid.uuid4().hex[:8]}" if fresh_staging else ""
    staging_path = f"{staging_root.rstrip('/')}/wap-{wap_id}{suffix}"

    # 1. WRITE: durable, consumer-invisible. A retry of a crashed
    # cycle may find the staging table already committed — appending
    # again would DOUBLE the batch and publish the doubled snapshot
    # (the publish txn key can't catch it: that cycle never
    # published). The staging commit is atomic (rename-published
    # commit file), so an existing log version means the staged copy
    # is complete: reuse it as-is.
    if delta_log.log_version(spark, staging_path) is None:
        delta_log.append_commit(
            batch, staging_path, partition_by=partition_by
        )
    staged = read_delta(spark, staging_path)

    # 2. AUDIT the staged snapshot (what will actually publish —
    # auditing the input frame instead would re-run its lineage and
    # could see different data under non-deterministic sources).
    # With no rules the cycle degrades to write-then-publish — still
    # valuable for the durable staging + exactly-once visibility.
    if row_rules or unique_rules or ref_rules:
        report = expectation_report(
            staged,
            row_rules=row_rules,
            unique_rules=unique_rules,
            ref_rules=ref_rules,
        )
        rows = [r.asDict() for r in report.collect()]
    else:
        rows = []
    _write_report(spark, staging_path, wap_id, rows)
    failures = [r for r in rows if not r["passed"]]
    if failures:
        raise WapRejected(failures, staging_path)

    # 3. PUBLISH: idempotent txn append into the target
    version = delta_log.append_commit(
        staged,
        target_path,
        partition_by=partition_by,
        txn_app_id=txn_app_id or f"wap-{wap_id}",
        txn_version=1 if txn_version is None else int(txn_version),
    )
    return {
        "wap_id": wap_id,
        "staging_path": staging_path,
        "audit": rows,
        "published_version": version,  # None == replayed no-op
    }


def _write_report(
    spark: SparkSession, staging_path: str, wap_id: str, rows: list[dict]
) -> None:
    """Persist the audit report beside the staged batch (atomic rename
    — a torn report never masquerades as a verdict)."""
    payload = json.dumps(
        {
            "wap_id": wap_id,
            "auditedAt": int(time.time() * 1000),
            "report": rows,
        },
        separators=(",", ":"),
    ).encode()
    fs, jvm = delta_log._fs(spark, staging_path)
    hpath = jvm.org.apache.hadoop.fs.Path
    tmp = f"{staging_path}/_audit.json.tmp-{uuid.uuid4().hex}"
    delta_log._write_bytes(spark, tmp, payload)
    dest = hpath(f"{staging_path}/_audit.json")
    if fs.exists(dest):
        fs.delete(dest, False)
    if not fs.rename(hpath(tmp), dest):
        raise IOError(f"could not publish WAP audit report for {wap_id}")
