"""Table sinks.

Design-scale target is Iceberg (``df.writeTo("glue.kg.nodes").append()``
with hidden partitioning ``days(warc_ts)`` and snapshot isolation); this
sandbox has no Iceberg runtime jar, so the same call sites write
date-partitioned parquet — which preserves the properties the engine
depends on and the tests verify:

  * partition pruning: a ``warc_date`` predicate reaches the scan as a
    PartitionFilter (never reads other days' files);
  * idempotent re-writes: dynamic partition overwrite replaces exactly
    the partitions present in the incoming data (the lineage/resume
    contract, plans/lineage.py);
  * snapshot isolation + time travel: ``snapshot_append`` commits a
    JSON manifest naming the data directories visible at each snapshot
    (readers only see committed manifests — a crashed write leaves an
    orphan data dir that no snapshot references), and
    ``read_snapshot(..., snapshot_id=k)`` reads the table as of any
    committed snapshot, mirroring Iceberg's snapshot log.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame,
    path: str,
    ts_col: str = "warc_ts",
    mode: str = "overwrite",
) -> None:
    """Materialize with the Iceberg ``days(ts)`` transform emulated as an
    explicit ``warc_date`` partition column (dynamic overwrite)."""
    (
        df.withColumn("warc_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("warc_date")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Partition-pruned read of one day (predicate lands in the scan's
    PartitionFilters — asserted by tests/test_plans.py)."""
    return spark.read.parquet(path).filter(F.col("warc_date") == day)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize hash-bucketed by ``key`` (metastore-backed parquet):
    two tables bucketed the same way equi-join WITHOUT a shuffle — the
    co-located-join layout for repeatedly-joined big tables (e.g.
    mentions x sentences by url). Asserted by tests/test_plans.py."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


# --------------------------------------------------------------------------
# snapshot-manifest table emulation (Iceberg snapshot log semantics)
# --------------------------------------------------------------------------
def _snap_dir(path: str) -> str:
    return os.path.join(path, "snapshots")


def committed_snapshots(path: str) -> list[int]:
    """Sorted committed snapshot ids (empty for a fresh/absent table)."""
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
    )


def _commit_manifest(path: str, new_id: int, manifest: dict) -> bool:
    """Compare-and-swap commit: write the manifest to a hidden temp file
    and atomically ``os.link`` it to ``snapshots/<id>.json`` — the link
    either publishes a COMPLETE manifest or fails with FileExistsError
    when another writer won the race (Iceberg's CAS commit in
    miniature). Readers can never observe a partially-written manifest,
    and a writer crashing mid-commit leaves only an invisible temp file,
    not a poisoned snapshot id. Returns False on a lost race — the
    caller retries with a fresh id; its data dir stays orphaned."""
    import uuid

    os.makedirs(_snap_dir(path), exist_ok=True)
    target = os.path.join(_snap_dir(path), f"{new_id}.json")
    tmp = os.path.join(
        _snap_dir(path), f".{new_id}-{uuid.uuid4().hex[:8]}.tmp"
    )
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


_COMMIT_RETRIES = 64


def snapshot_append(
    df: DataFrame, path: str, partition_by: str | None = None
) -> int:
    """Append ``df`` as a new snapshot; returns the new snapshot id.

    Data lands ONCE in its own uniquely-named directory; visibility
    comes only from the CAS manifest commit (previous snapshot's dir
    list + the new directory). Concurrent appenders never clobber each
    other: the loser's exclusive-create fails and it retries with the
    next id against the refreshed parent. A writer that dies before
    committing leaves an orphan data dir invisible to every reader.

    ``partition_by`` emulates Iceberg's hidden partitioning (e.g. a
    ``warc_date`` column from days(warc_ts)): the snapshot's directory
    is written partitioned, and because read_snapshot reads each data
    dir as its own scan, a predicate on the partition column prunes at
    the scan (PartitionFilters — plan-tested) even when other snapshots
    in the same table are unpartitioned. The partition column's TRUE
    type is recorded in a ``_partition_meta.json`` sidecar; read_snapshot
    re-attaches it per subdirectory as a typed literal (no directory-name
    type inference anywhere) — otherwise a string key like '0123'
    silently reads back as bigint 123."""
    import uuid

    data_dir = os.path.join(path, "data", f"snap-{uuid.uuid4().hex[:12]}")
    w = df.write.mode("overwrite")
    if partition_by is not None:
        w = w.partitionBy(partition_by)
    w.parquet(data_dir)
    if partition_by is not None:
        _write_partition_meta(data_dir, partition_by,
                              df.schema[partition_by].dataType.simpleString())
    n_rows = _dir_row_count(data_dir)
    for _ in range(_COMMIT_RETRIES):
        snaps = committed_snapshots(path)
        new_id = (snaps[-1] + 1) if snaps else 1
        if snaps:
            with open(os.path.join(_snap_dir(path), f"{snaps[-1]}.json")) as f:
                head = json.load(f)
            prev = head["data_dirs"]
            prev_rows = head.get("dir_rows", {})
        else:
            prev, prev_rows = [], {}
        rows = {d: prev_rows[d] for d in prev if d in prev_rows}
        rows[data_dir] = n_rows
        manifest = {
            "snapshot_id": new_id,
            "parent_id": snaps[-1] if snaps else None,
            "data_dirs": prev + [data_dir],
            "dir_rows": rows,
        }
        if _commit_manifest(path, new_id, manifest):
            return new_id
    raise RuntimeError(
        f"snapshot_append lost {_COMMIT_RETRIES} commit races on {path}"
    )


def _dir_row_count(data_dir: str) -> int:
    """Footer-metadata row count of one data dir (no Spark job) —
    recorded into the manifest at commit time (Iceberg's
    ``total-records`` analog) so later reads are O(1) manifest lookups
    instead of per-call footer walks."""
    from zh_ner_tf_spark.sources.tables import parquet_dir_row_count

    return parquet_dir_row_count(data_dir)


def _dir_fingerprint(data_dir: str) -> str:
    """Content fingerprint of a data directory: md5 over the sorted
    (relative path, size, mtime_ns) listing. Cheap (no data reads);
    path+size alone already catches the rewrite shapes this store
    produces (a rewritten part file virtually never keeps identical
    size AND its task-UUID name), and mtime_ns closes the residual
    same-name-same-size rewrite hole (ADVICE r5) — a rewrite that also
    forges mtimes is outside this store's threat model.

    RESTORE CAVEAT (ADVICE r6): because mtime_ns participates, any
    byte-identical but mtime-touching operation — archive restore,
    cp/rsync without timestamp preservation, filesystem migration —
    changes every fingerprint. Copy a snapshot store ONLY with
    mtime-preserving tools (`cp -p`, `rsync -a`, tar). After a
    non-preserving copy the store stays fully readable and consistent,
    but two one-time effects appear at the boundary: a crash-replay
    re-publish no longer matches the recorded fingerprint (the replay
    commits an extra snapshot instead of deduping — append-only, never
    corruption) and `snapshot_diff` refuses across the boundary. The
    same one-time effects apply to manifests recorded under the
    pre-mtime (path, size) scheme. Extra snapshots right after a
    restore are this, not corruption."""
    import hashlib

    entries = []
    for root, _dirs, files in os.walk(data_dir):
        for f in sorted(files):
            full = os.path.join(root, f)
            try:
                st = os.stat(full)
                entries.append(
                    (os.path.relpath(full, data_dir), st.st_size,
                     st.st_mtime_ns)
                )
            except OSError:
                continue  # file vanished mid-walk (concurrent cleanup)
    entries.sort()
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()


def snapshot_commit_dir(path: str, data_dir: str, replace: bool = False) -> int:
    """CAS-publish an ALREADY-WRITTEN data directory as the next snapshot.
    Append semantics by default (the head's directory list + ``data_dir``);
    ``replace=True`` publishes a snapshot referencing ONLY ``data_dir``
    (the full-rebuild shape — old snapshots stay time-travel-readable).
    Idempotent: if the head already expresses the requested state AND the
    directory's content fingerprint matches the one the head recorded,
    the head's id is returned unchanged, so re-publishing after a crash
    between the data write and the manifest commit is safe. A CHANGED
    fingerprint (the documented empty-then-nonempty stage supersede
    rewrites a stage dir in place) commits a NEW snapshot instead of
    silently returning the head (ADVICE r4) — the table history records
    the rewrite and snapshot_diff refuses to diff across it. Time travel
    to a pre-rewrite id over an in-place-rewritten dir still reads the
    new bytes (inherent to rewriting a shared directory; real Iceberg
    avoids it by never rewriting files in place). This is the primitive
    that lets the per-bucket lineage writer (plans/lineage.py) and the
    snapshot log compose — data materializes incrementally under lineage
    commits, visibility flips atomically here."""
    fp = _dir_fingerprint(data_dir)
    for _ in range(_COMMIT_RETRIES):
        snaps = committed_snapshots(path)
        if snaps:
            with open(os.path.join(_snap_dir(path), f"{snaps[-1]}.json")) as f:
                head = json.load(f)
            prev = head["data_dirs"]
            prev_fps = head.get("dir_fps", {})
        else:
            prev, prev_fps = [], {}
        if (prev == [data_dir]) if replace else (data_dir in prev):
            # idempotent ONLY when the recorded fingerprint proves the
            # dir unchanged; a manifest without a recorded fp (written
            # by snapshot_append or pre-fingerprint code) gets one extra
            # snapshot that RECORDS it — cheap, and it closes the hole
            # where an in-place rewrite of an un-fingerprinted dir would
            # silently pass as idempotent
            if prev_fps.get(data_dir) == fp:
                return snaps[-1]
        new_id = (snaps[-1] + 1) if snaps else 1
        new_dirs = [data_dir] if replace else (
            prev if data_dir in prev else prev + [data_dir]
        )
        fps = {d: prev_fps[d] for d in new_dirs if d in prev_fps}
        fps[data_dir] = fp
        prev_rows = head.get("dir_rows", {}) if snaps else {}
        rows = {d: prev_rows[d] for d in new_dirs if d in prev_rows}
        rows[data_dir] = _dir_row_count(data_dir)
        manifest = {
            "snapshot_id": new_id,
            "parent_id": snaps[-1] if snaps else None,
            "data_dirs": new_dirs,
            "dir_fps": fps,
            "dir_rows": rows,
        }
        if _commit_manifest(path, new_id, manifest):
            return new_id
    raise RuntimeError(
        f"snapshot_commit_dir lost {_COMMIT_RETRIES} commit races on {path}"
    )


def snapshot_stage_with_lineage(
    df: DataFrame,
    spark: SparkSession,
    table_path: str,
    stage: str,
    key_col: str,
    n_buckets: int = 32,
    transform=None,
    replace: bool = False,
) -> tuple[int, DataFrame]:
    """Unified exact-resume + time-travel write: the ONE sink the
    pipeline's node/edge tables go through.

    The stage's rows land bucket-partitioned under
    ``<table>/data/stage-<stage>`` with per-bucket lineage commits
    (plans/lineage.py): a writer killed mid-stage re-runs ONLY its
    uncommitted buckets on the next call. Table readers never see the
    partial stage — visibility comes from the CAS snapshot commit
    (snapshot_commit_dir), which publishes the directory as one snapshot
    only after every bucket is committed; until then the table stays at
    its previous snapshot, which remains time-travel-readable forever.

    ``stage`` names one increment (e.g. one crawl batch): calling again
    with the same stage RESUMES it (idempotent once complete); a new
    increment needs a new stage name, appending a new snapshot. Snapshot
    immutability assumes increments are immutable — re-using a stage
    name with DIFFERENT data is a contract violation (uncommitted
    buckets pick up the new rows; in particular a published empty-input
    snapshot is superseded in place rather than wedging the stage).
    Returns (snapshot_id, full stage output DataFrame)."""
    from zh_ner_tf_spark.plans.lineage import run_stage_with_lineage

    data_dir = os.path.join(table_path, "data", f"stage-{stage}")
    manifest_dir = os.path.join(table_path, "lineage", stage)
    out = run_stage_with_lineage(
        df, transform or (lambda pending: pending), spark, stage, key_col,
        data_dir, manifest_dir, n_buckets,
    )
    sid = snapshot_commit_dir(table_path, data_dir, replace=replace)
    return sid, out


def snapshot_compact(
    spark: SparkSession, path: str, target_partitions: int | None = None
) -> int:
    """Compaction (Iceberg ``rewrite_data_files`` shape): rewrite the
    CURRENT snapshot's rows into one fresh directory with
    ``target_partitions`` files and commit a snapshot referencing ONLY
    the compacted directory. Old snapshots stay readable (time travel);
    at crawl scale this is the small-file maintenance pass that keeps
    scan task counts sane after many incremental appends. A partition
    layout declared by the head's dirs (``_partition_meta.json``
    sidecars, all agreeing) is PRESERVED through the rewrite — Iceberg's
    rewrite_data_files keeps the partition spec, and silently flattening
    would break every downstream partition-pruned read."""
    import uuid

    snaps = committed_snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    base = snaps[-1]
    with open(os.path.join(_snap_dir(path), f"{base}.json")) as f:
        base_dirs = json.load(f)["data_dirs"]
    part_metas = []
    for d in base_dirs:
        mp = os.path.join(d, _PARTITION_META)
        if os.path.exists(mp):
            with open(mp) as f:
                part_metas.append(json.load(f))
    part = None
    if part_metas and all(m == part_metas[0] for m in part_metas):
        part = part_metas[0]
    cur = read_snapshot(spark, path, base)
    if target_partitions is None:
        target_partitions = max(
            1, spark.sparkContext.defaultParallelism
        )
    data_dir = os.path.join(path, "data", f"snap-{uuid.uuid4().hex[:12]}")
    w = cur.repartition(target_partitions).write.mode("overwrite")
    if part is not None:
        w = w.partitionBy(part["col"])
    w.parquet(data_dir)
    if part is not None:
        _write_partition_meta(data_dir, part["col"], part["type"])
    new_id = base + 1
    manifest = {
        "snapshot_id": new_id,
        "parent_id": base,
        "data_dirs": [data_dir],
        "dir_rows": {data_dir: _dir_row_count(data_dir)},
        "compaction": True,
    }
    # Compaction replaces the WHOLE table as of `base`, so unlike append
    # it cannot blind-retry past a concurrent commit (the rewrite would
    # drop those rows): CAS on base+1 or tell the caller to re-run.
    if not _commit_manifest(path, new_id, manifest):
        raise RuntimeError(
            f"concurrent commit advanced {path} past snapshot {base}; "
            "re-run compaction against the new head"
        )
    return new_id


_PARTITION_META = "_partition_meta.json"


def _write_partition_meta(data_dir: str, col: str, type_str: str) -> None:
    """Sidecar recording a partitioned dir's partition column and TRUE
    type (underscore-prefixed: invisible to parquet readers)."""
    with open(os.path.join(data_dir, _PARTITION_META), "w") as f:
        json.dump({"col": col, "type": type_str}, f)


def _read_dirs(spark: SparkSession, dirs: list[str]) -> DataFrame:
    """Read a snapshot's data directories. Directories written by the
    lineage writer are bucket-partitioned — a ``_bucket`` partition
    column Spark refuses to merge with unpartitioned sibling dirs in one
    multi-path read, and which is commit bookkeeping, not table data —
    so each dir is read separately, the reserved ``_bucket`` column is
    dropped, and the parts are unioned by name.

    A dir carrying a ``_partition_meta.json`` sidecar is read WITHOUT
    Spark's directory-name partition discovery at all: each ``col=value``
    subdirectory is scanned as its own parquet source and the partition
    column re-attached as a literal of the sidecar's recorded TRUE type.
    Directory-name type inference would coerce a string key '0123' to
    bigint 123 (losing the leading zero); the previous fix toggled the
    session-wide inference conf around the read, which RACES any
    concurrent read in the same SparkSession (ADVICE r4) — explicit
    per-subdir reads need no session state."""
    from urllib.parse import unquote

    parts = []
    for d in dirs:
        meta = None
        meta_path = os.path.join(d, _PARTITION_META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        subs = []
        if meta is not None and os.path.isdir(d):
            prefix = meta["col"] + "="
            subs = sorted(
                s for s in os.listdir(d)
                if s.startswith(prefix)
                and os.path.isdir(os.path.join(d, s))
            )
        if meta is not None and subs:
            for s in subs:
                raw = unquote(s[len(meta["col"]) + 1:])
                val = None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
                sdf = spark.read.parquet(os.path.join(d, s)).withColumn(
                    meta["col"], F.lit(val).cast(meta["type"])
                )
                if "_bucket" in sdf.columns:
                    sdf = sdf.drop("_bucket")
                parts.append(sdf)
            continue
        df = spark.read.parquet(d)
        if "_bucket" in df.columns:
            df = df.drop("_bucket")
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_expire(
    path: str,
    keep_last: int = 1,
    vacuum_orphans: bool = False,
    orphan_older_than_s: float = 24 * 3600,
) -> dict:
    """Table maintenance (Iceberg ``expire_snapshots`` +
    ``remove_orphan_files`` parity): drop all but the newest
    ``keep_last`` snapshot manifests and delete the data directories no
    surviving snapshot references. Time travel to expired ids stops
    working (that is the point — this bounds metadata and reclaims the
    space that compaction/replace left behind); surviving snapshots are
    untouched, and append-chain directories shared with a survivor are
    never deleted.

    ``vacuum_orphans=True`` additionally removes data dirs referenced by
    NO manifest at all (crashed writers that died before their CAS
    commit) — but ONLY dirs older than ``orphan_older_than_s`` (Iceberg's
    remove_orphan_files ``older_than`` guard): a live appender's freshly
    written dir is indistinguishable from an orphan until its manifest
    commit lands, so vacuuming young dirs would race concurrent writers
    and destroy their data. Manifest paths are realpath-normalized
    before comparison so a different spelling of the table path (./tbl
    vs tbl vs absolute) can never misclassify committed data as orphans.
    Lineage ``stage-*`` dirs are never vacuumed directly; when an
    EXPIRED snapshot was a stage dir's only reference, the stage's
    lineage manifest is deleted along with its data so a later reuse of
    the stage name recomputes instead of silently publishing empty.

    Idempotent and safe to re-run: already-missing manifests/dirs are
    skipped. Returns {"expired": ids, "deleted_dirs": paths actually
    removed}."""
    import shutil
    import time

    snaps = committed_snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    keep = snaps[-max(keep_last, 1):]
    expired = [s for s in snaps if s not in keep]

    def dirs(sid: int) -> list[str]:
        with open(os.path.join(_snap_dir(path), f"{sid}.json")) as f:
            return json.load(f)["data_dirs"]

    rp = os.path.realpath
    keep_dirs = {rp(d) for s in keep for d in dirs(s)}
    expired_dirs = {rp(d) for s in expired for d in dirs(s)}
    for s in expired:
        try:
            os.unlink(os.path.join(_snap_dir(path), f"{s}.json"))
        except FileNotFoundError:
            pass  # concurrent/prior expire already removed it
    deleted = []

    def _remove(full: str) -> None:
        shutil.rmtree(full, ignore_errors=True)
        if not os.path.exists(full):  # report only real deletions
            deleted.append(full)

    for d in sorted(expired_dirs - keep_dirs):
        base = os.path.basename(d)
        if base.startswith("stage-"):
            # the stage's lineage manifest must die WITH its data:
            # leaving it would make a later same-stage call see every
            # bucket committed, write nothing, and publish an empty
            # snapshot while believing the rows are in the table
            lineage_dir = os.path.join(
                rp(path), "lineage", base[len("stage-"):]
            )
            shutil.rmtree(lineage_dir, ignore_errors=True)
        _remove(d)
    if vacuum_orphans:
        data_root = os.path.join(path, "data")
        now = time.time()
        if os.path.isdir(data_root):
            for name in sorted(os.listdir(data_root)):
                if name.startswith("stage-"):
                    # pre-publish stage dirs hold a killed writer's
                    # committed resume buckets — never orphans
                    continue
                full = rp(os.path.join(data_root, name))
                if full in keep_dirs or full in expired_dirs:
                    continue
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue
                if age >= orphan_older_than_s:
                    _remove(full)
    return {"expired": expired, "deleted_dirs": deleted}


def snapshot_diff(
    spark: SparkSession, path: str, from_id: int, to_id: int | None = None
) -> DataFrame:
    """Incremental read: ONLY the rows appended after ``from_id`` (up to
    ``to_id``, default latest) — the CDC-lite consumption pattern that
    lets a downstream pipeline process each crawl increment once,
    reading O(new data) instead of rescanning the table. Defined for
    append-only history; raises if a compaction rewrote the base
    snapshot's files inside the range (the diff would double-count)."""
    snaps = committed_snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    if to_id is None:
        to_id = snaps[-1]
    if from_id not in snaps or to_id not in snaps or from_id > to_id:
        raise ValueError(f"bad snapshot range [{from_id}, {to_id}] of {snaps}")

    def manifest(sid: int) -> dict:
        with open(os.path.join(_snap_dir(path), f"{sid}.json")) as f:
            return json.load(f)

    m_base, m_head = manifest(from_id), manifest(to_id)
    base, head = m_base["data_dirs"], m_head["data_dirs"]
    bset = set(base)
    if not bset <= set(head):
        raise ValueError(
            f"snapshots {from_id}..{to_id} are not append-only (a "
            "compaction rewrote the base files); re-baseline the consumer"
        )
    # a shared dir whose content FINGERPRINT changed between the two
    # manifests was rewritten in place (stage supersede) — the diff
    # would silently miss those changed rows, so refuse (ADVICE r4)
    fp_base = m_base.get("dir_fps", {})
    fp_head = m_head.get("dir_fps", {})
    for d in base:
        if d in fp_base and d in fp_head and fp_base[d] != fp_head[d]:
            raise ValueError(
                f"snapshots {from_id}..{to_id} are not append-only "
                f"({d} was rewritten in place); re-baseline the consumer"
            )
    new_dirs = [d for d in head if d not in bset]
    if not new_dirs:
        return read_snapshot(spark, path, to_id).limit(0)
    return _read_dirs(spark, new_dirs)


def snapshot_row_count(path: str, snapshot_id: int | None = None) -> int:
    """Row count of a snapshot (Iceberg's manifest ``total-records``
    analog) — no Spark job. Commit paths record per-dir counts in the
    manifest (``dir_rows``), so the common case is an O(1) manifest
    read; dirs a pre-recording manifest missed fall back to a one-time
    parquet-footer walk. This is the metadata source adaptive operators
    use for corpus size (SRP band family, IVF codebook —
    operators/similarity.py) when the corpus lives in a snapshot table:
    an extra full-scan ``count()`` per ANN call is a whole wasted job at
    10^9 rows, while the manifest already knows."""
    from zh_ner_tf_spark.sources.tables import parquet_dir_row_count

    snaps = committed_snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    sid = snaps[-1] if snapshot_id is None else snapshot_id
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in {snaps}")
    with open(os.path.join(_snap_dir(path), f"{sid}.json")) as f:
        m = json.load(f)
    rows = m.get("dir_rows", {})
    return sum(
        rows[d] if d in rows else parquet_dir_row_count(d)
        for d in m["data_dirs"]
    )


def read_snapshot(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the table as of ``snapshot_id`` (default: latest committed).
    Uncommitted data directories are never visible."""
    snaps = committed_snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    sid = snaps[-1] if snapshot_id is None else snapshot_id
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in {snaps}")
    with open(os.path.join(_snap_dir(path), f"{sid}.json")) as f:
        dirs = json.load(f)["data_dirs"]
    return _read_dirs(spark, dirs)
