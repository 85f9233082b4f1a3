"""Minimal Delta-protocol transaction-log WRITER for the fallback path.

The reference appends to Delta tables through delta-spark
(``utils.py:76-80``) and MERGEs through ``DeltaTable``
(``utils.py:222-230``). This container cannot install delta-spark, so
the engine's fallback has so far READ real ``_delta_log`` directories
(``readers.py _delta_live_files`` replays adds/removes, checkpoints,
time travel) while WRITES degraded to plain parquet. This module closes
that gap: fallback writes now produce a real transaction log — the
newline-delimited-JSON action format from the public Delta protocol
spec (delta.io PROTOCOL.md) — so fallback-written tables get

- **atomic, isolated commits** with OPTIMISTIC CONCURRENCY: a writer
  claims version N by atomically renaming a fully-written temp file to
  ``_delta_log/N.json``; rename-to-existing fails on local/HDFS
  filesystems, so losing a race is detected, the winner's commit is
  re-read, and the loser retries at N+1 — the same claim protocol
  delta-spark's HDFSLogStore runs. (Object stores without atomic
  rename-if-absent need a coordinating LogStore; same caveat as
  open-source Delta on S3 — documented, not hidden.)
- **copy-on-write MERGE with tombstones**: the merge commit removes the
  old live files and adds the merged ones in ONE action list — readers
  replaying the log never observe a half-merged table, and the old
  version stays readable (time travel) until a vacuum.
- **torn-write immunity**: content is fully written before the rename,
  so a crashed writer can leave only ignorable temp junk, never a
  truncated committed file (the reader's torn-log rejection then only
  fires for external corruption).

Actions carry exactly what the replay reader consumes (add.path /
add.size / remove.path, protocol, metaData with the Spark-JSON
schemaString), so delta-spark itself can read these tables when the
jar is present. Scope: unpartitioned tables — the fallback writer's
surface, matching the reference's usage.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def log_version(spark: SparkSession, table_path: str) -> int | None:
    """Latest committed version of ``table_path``'s log, or None when
    no log exists (plain parquet dir / new table). Checkpoints count:
    after log truncation a checkpoint may be the only witness of the
    latest version, and the next commit must claim the slot above it."""
    import re

    log_dir = table_path.rstrip("/") + "/_delta_log"
    fs, jvm = _fs(spark, log_dir)
    hlog = jvm.org.apache.hadoop.fs.Path(log_dir)
    if not fs.exists(hlog):
        return None
    versions = []
    for st in fs.listStatus(hlog):
        name = st.getPath().getName()
        if m := re.fullmatch(r"(\d{20})\.json", name):
            versions.append(int(m.group(1)))
        elif (
            m := re.match(r"(\d{20})\.checkpoint", name)
        ) and name.endswith(".parquet"):
            versions.append(int(m.group(1)))
    return max(versions) if versions else None


def _write_bytes(spark: SparkSession, path: str, data: bytes) -> None:
    fs, jvm = _fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


class CommitConflict(Exception):
    """Another writer committed the version this transaction read its
    snapshot at — the caller must re-read and redo its reconciliation
    (the optimistic-concurrency abort path)."""


def commit(
    spark: SparkSession,
    table_path: str,
    actions: list[dict],
    max_retries: int = 50,
    expected_version: int | None = None,
) -> int:
    """Atomically commit ``actions`` as the table's next version and
    return it. The action list is serialized ONCE to a temp file inside
    ``_delta_log`` (ignored by replay: the name never matches
    ``NNN.json``), then renamed into the next free version slot —
    rename is the atomic claim, so two racing writers serialize into
    consecutive versions instead of clobbering each other.

    ``expected_version`` pins the claim to exactly that slot: commits
    whose actions DEPEND on the snapshot they read (merge/overwrite
    tombstones) must pass the version they read + 1, and a lost race
    raises :class:`CommitConflict` instead of silently committing
    stale reconciliation on top of someone else's — blind appends
    commute and leave it None to retry into the next free slot."""
    base = table_path.rstrip("/")
    log_dir = base + "/_delta_log"
    fs, jvm = _fs(spark, log_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(hpath(log_dir))
    payload = (
        "\n".join(json.dumps(a, separators=(",", ":")) for a in actions)
        + "\n"
    ).encode()
    tmp = f"{log_dir}/.tmp-{uuid.uuid4().hex}.json"
    _write_bytes(spark, tmp, payload)
    try:
        if expected_version is not None:
            dest = hpath(f"{log_dir}/{expected_version:020d}.json")
            if fs.rename(hpath(tmp), dest):
                return expected_version
            raise CommitConflict(
                f"version {expected_version} of {table_path} was claimed "
                "by another writer; re-read the table and retry the "
                "transaction"
            )
        for _ in range(max_retries):
            v = log_version(spark, base)
            next_v = 0 if v is None else v + 1
            dest = hpath(f"{log_dir}/{next_v:020d}.json")
            if fs.rename(hpath(tmp), dest):
                return next_v
            # lost the race for next_v (or a writer landed between the
            # listing and the rename) — re-list and try the next slot
        raise RuntimeError(
            f"could not claim a Delta log version for {table_path} after "
            f"{max_retries} attempts (pathological commit contention)"
        )
    finally:
        tmp_p = hpath(tmp)
        if fs.exists(tmp_p):
            fs.delete(tmp_p, False)


def bootstrap_actions(df: DataFrame) -> list[dict]:
    """protocol + metaData actions for a new unpartitioned table."""
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        },
    ]


def stage_data_files(df: DataFrame, table_path: str) -> list[dict]:
    """Write ``df`` as parquet data files INSIDE ``table_path`` and
    return their ``add`` actions — but the files are invisible to log
    readers until a later :func:`commit` publishes them, which is what
    makes the write all-or-nothing. Files are written to a temp subdir
    first (so a crashed job can't leave half-written parts in the
    table root) and renamed in; Spark part names embed a per-job UUID,
    so names never collide across writers."""
    spark = df.sparkSession
    base = table_path.rstrip("/")
    tmp_dir = f"{base}/.stage-{uuid.uuid4().hex}"
    df.write.parquet(tmp_dir)
    fs, jvm = _fs(spark, base)
    hpath = jvm.org.apache.hadoop.fs.Path
    adds: list[dict] = []
    for st in fs.listStatus(hpath(tmp_dir)):
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        if not fs.rename(st.getPath(), hpath(f"{base}/{name}")):
            raise RuntimeError(
                f"could not move staged file {name} into {table_path}"
            )
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": int(st.getLen()),
                    "modificationTime": int(st.getModificationTime()),
                    "dataChange": True,
                }
            }
        )
    fs.delete(hpath(tmp_dir), True)
    return adds


def remove_actions(live_files: list[str], table_path: str) -> list[dict]:
    """remove (tombstone) actions for currently-live files, given the
    absolute paths the replay reader returns."""
    base = table_path.rstrip("/") + "/"
    now = int(time.time() * 1000)
    out = []
    for f in live_files:
        rel = f[len(base):] if f.startswith(base) else f
        out.append(
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": now,
                    "dataChange": True,
                }
            }
        )
    return out


def table_schema_json(spark: SparkSession, table_path: str) -> str | None:
    """schemaString from the latest metaData action, or None for an
    un-logged path. Scans the log newest-first — metaData rides commit
    0 (and any later schema-change commit), so the first hit wins."""
    import re

    base = table_path.rstrip("/")
    log_dir = base + "/_delta_log"
    fs, jvm = _fs(spark, log_dir)
    hlog = jvm.org.apache.hadoop.fs.Path(log_dir)
    if not fs.exists(hlog):
        return None
    versions = sorted(
        (
            int(m.group(1))
            for st in fs.listStatus(hlog)
            if (m := re.fullmatch(r"(\d{20})\.json", st.getPath().getName()))
        ),
        reverse=True,
    )
    for v in versions:
        raw = read_commit_text(spark, f"{log_dir}/{v:020d}.json")
        for line in raw.splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                return action["metaData"]["schemaString"]
    return None


def read_commit_text(spark: SparkSession, path: str) -> str:
    """Whole small-file read through the Hadoop FS API (py4j can't
    fill a java byte[] in place, so delegate to commons-io, which
    ships on Spark's classpath)."""
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def append_commit(df: DataFrame, table_path: str) -> int:
    """Append ``df`` to the log-backed table at ``table_path`` (first
    commit bootstraps protocol+metaData). Returns the committed
    version.

    Schema-enforcement on append, like real Delta: a frame whose
    schema differs from the table's metaData is REJECTED before any
    file lands — committing mismatched files would poison every later
    log-replay read with an undetected schema union."""
    spark = df.sparkSession
    v = log_version(spark, table_path)
    if v is not None:
        expected = table_schema_json(spark, table_path)
        if expected is not None and expected != df.schema.json():
            raise ValueError(
                f"schema mismatch appending to Delta table {table_path}: "
                f"table has {expected}, frame has {df.schema.json()} — "
                "evolve the table schema explicitly instead of appending "
                "mismatched files"
            )
    adds = stage_data_files(df, table_path)
    actions = (bootstrap_actions(df) if v is None else []) + adds
    return commit(spark, table_path, actions)


def overwrite_commit(df: DataFrame, table_path: str) -> int:
    """Copy-on-write replacement of the table's contents with ``df`` in
    ONE commit: tombstone every live file, add the new ones. The prior
    version stays readable (time travel) until vacuumed.

    The tombstone set depends on the snapshot read here, so the commit
    pins ``expected_version = read_version + 1`` — a concurrent writer
    landing in between raises :class:`CommitConflict` rather than
    letting two reconciliations both "win" (the caller re-reads and
    redoes the merge; blind appends never conflict)."""
    from .readers import _delta_live_files

    spark = df.sparkSession
    read_v = log_version(spark, table_path)
    live = _delta_live_files(spark, table_path) or []
    adds = stage_data_files(df, table_path)
    boot = bootstrap_actions(df) if read_v is None else []
    expected = 0 if read_v is None else read_v + 1
    return commit(
        spark,
        table_path,
        boot + remove_actions(live, table_path) + adds,
        expected_version=expected,
    )


def write_checkpoint(spark: SparkSession, table_path: str) -> int:
    """Write a parquet checkpoint of the table's CURRENT state at the
    latest version — the reconciled add-set readers can start from
    instead of replaying every commit (the same role Delta's periodic
    checkpoints play; the replay reader already consumes them). After
    a checkpoint at V, the JSON commits at or below V are redundant
    for reads at HEAD and may be truncated (``truncate_log``);
    time travel below V then requires the checkpoint's version only.

    Returns the checkpointed version.
    """
    from .readers import _delta_live_files

    base = table_path.rstrip("/")
    v = log_version(spark, base)
    if v is None:
        raise ValueError(f"{table_path} has no transaction log")
    live = _delta_live_files(spark, base) or []
    from pyspark.sql import functions as F

    prefix = base + "/"
    rows = [
        (p[len(prefix):] if p.startswith(prefix) else p,)
        for p in live
    ]
    cp = spark.createDataFrame(rows, "path string").select(
        F.struct(F.col("path")).alias("add")
    )
    # one file, deterministic name the replay reader globs
    cp.coalesce(1).write.mode("overwrite").parquet(
        f"{base}/_delta_log/.cp-stage-{v}"
    )
    fs, jvm = _fs(spark, base)
    hpath = jvm.org.apache.hadoop.fs.Path
    stage = f"{base}/_delta_log/.cp-stage-{v}"
    for st in fs.listStatus(hpath(stage)):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            fs.rename(
                st.getPath(),
                hpath(f"{base}/_delta_log/{v:020d}.checkpoint.parquet"),
            )
    fs.delete(hpath(stage), True)
    return v


def truncate_log(spark: SparkSession, table_path: str) -> int:
    """Delete JSON commits covered by the newest checkpoint (replay
    starts there). Returns how many commit files were removed. Reads
    at HEAD are unaffected; time travel below the checkpoint version
    becomes unavailable — the vacuum-adjacent retention trade."""
    import re

    base = table_path.rstrip("/")
    log_dir = base + "/_delta_log"
    fs, jvm = _fs(spark, log_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    names = [
        st.getPath().getName() for st in fs.listStatus(hpath(log_dir))
    ]
    cps = [
        int(m.group(1))
        for n in names
        if (m := re.match(r"(\d{20})\.checkpoint", n))
        and n.endswith(".parquet")
    ]
    if not cps:
        return 0
    cutoff = max(cps)
    n = 0
    for name in names:
        m = re.fullmatch(r"(\d{20})\.json", name)
        if m and int(m.group(1)) <= cutoff:
            fs.delete(hpath(f"{log_dir}/{name}"), False)
            n += 1
    return n


def vacuum(
    spark: SparkSession, table_path: str, min_age_seconds: int = 0
) -> list[str]:
    """Delete data files no longer live at HEAD (tombstoned by merges/
    overwrites). Returns the deleted file names. After a vacuum, time
    travel to versions that referenced those files stops working —
    run it when the retention window closes, exactly like Delta's
    VACUUM. Never touches ``_delta_log`` or live files.

    ``min_age_seconds`` protects IN-FLIGHT readers: a query that
    resolved its live-file list just before a merge landed still reads
    the pre-merge files; deleting them instantly would fail it
    mid-scan. Production deployments pass hours (Delta defaults to 7
    days); the default 0 is for tests and single-process pipelines."""
    from .readers import _delta_live_files

    base = table_path.rstrip("/")
    live = set(_delta_live_files(spark, base) or [])
    fs, jvm = _fs(spark, base)
    hpath = jvm.org.apache.hadoop.fs.Path
    cutoff_ms = (time.time() - min_age_seconds) * 1000
    deleted: list[str] = []
    for st in fs.listStatus(hpath(base)):
        name = st.getPath().getName()
        if st.isDirectory() or not name.endswith(".parquet"):
            continue
        if (
            f"{base}/{name}" not in live
            and st.getModificationTime() <= cutoff_ms
        ):
            fs.delete(st.getPath(), False)
            deleted.append(name)
    return deleted
