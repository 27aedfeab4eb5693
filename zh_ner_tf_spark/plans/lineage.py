"""Per-partition checkpoint / lineage manifests with exact resume
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

The unit of commit is an INPUT PARTITION (a stable, data-derived key such
as ``pmod(xxhash64(url), n_buckets)`` — NOT ``spark_partition_id()``,
which is scheduling-dependent and would break exact resume). For each
stage run:

  1. plan = input keyed by bucket; committed = manifest rows with
     status='committed' for (stage, bucket)
  2. work = input LEFT ANTI JOIN committed  -> only unfinished buckets
  3. outputs are written bucket-partitioned (parquet partitionBy) so a
     re-run overwrites its own bucket idempotently (dynamic partition
     overwrite), never double-appends
  4. after the write, manifest rows (stage, bucket, input_fingerprint,
     rows_in, rows_out, status, run_id) are appended atomically (single
     task via coalesce(1) on manifest-sized data)

Idempotence argument: a crash between 3 and 4 re-runs the bucket and
overwrites the same partition directory; a crash before 3 changes
nothing. The manifest is append-only; readers take the latest run_id per
(stage, bucket). The reference's analog is TF checkpointing
(model.py:≈200 [R]) — model-state-only; per-partition data lineage is the
graft extension.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "stage string, bucket int, input_fingerprint string, rows_in bigint, "
    "rows_out bigint, status string, run_id string, committed_at double"
)


def bucket_col(key_col: str, n_buckets: int) -> F.Column:
    """Stable, data-derived partition key for commit bookkeeping."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def read_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    if os.path.exists(manifest_dir) and any(
        f.endswith(".parquet") for f in os.listdir(manifest_dir)
    ):
        return spark.read.parquet(manifest_dir)
    return spark.createDataFrame([], MANIFEST_SCHEMA)


def committed_buckets(spark: SparkSession, manifest_dir: str, stage: str) -> DataFrame:
    m = read_manifest(spark, manifest_dir)
    return (
        m.filter((F.col("stage") == stage) & (F.col("status") == "committed"))
        .select("bucket")
        .distinct()
    )


def resume_filter(
    df: DataFrame,
    spark: SparkSession,
    manifest_dir: str,
    stage: str,
    key_col: str,
    n_buckets: int,
) -> DataFrame:
    """Input minus already-committed buckets (exact resume)."""
    with_bucket = df.withColumn("_bucket", bucket_col(key_col, n_buckets))
    done = committed_buckets(spark, manifest_dir, stage).withColumnRenamed(
        "bucket", "_bucket"
    )
    return with_bucket.join(F.broadcast(done), "_bucket", "left_anti")


_STAGE_SIDECAR = "_stage_sidecar.json"


def _write_stage_sidecar(out_dir: str, manifest_dir: str, stage: str) -> None:
    """Sidecar pairing an output directory with ITS manifest directory
    (underscore-prefixed: invisible to parquet readers). Written before
    the data lands so any directory this writer created names its owner."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _STAGE_SIDECAR), "w") as f:
        json.dump(
            {"manifest_dir": os.path.realpath(manifest_dir), "stage": stage}, f
        )


def _is_empty_marker_layout(out_dir: str) -> bool:
    """True iff ``out_dir`` looks exactly like the root-level
    empty-input marker this module writes: only Spark bookkeeping files
    and parquet parts whose footers total ZERO rows, and no partition
    subdirectories. Used to migrate pre-sidecar marker dirs through the
    supersede delete without weakening the guard for real data."""
    names = os.listdir(out_dir)
    parquet_parts = []
    for n in names:
        full = os.path.join(out_dir, n)
        if os.path.isdir(full):
            return False  # a partitioned layout is never the marker
        if n.endswith(".parquet") and n.startswith("part-"):
            parquet_parts.append(full)
        elif n == "_SUCCESS" or n.startswith("."):
            continue  # bookkeeping (_SUCCESS, .crc files)
        else:
            return False
    # _SUCCESS is NOT required: a marker write killed between the part
    # files and _SUCCESS leaves zero-row parts only — still provably
    # harmless to supersede (real stage data lives in bucket subdirs,
    # rejected above). But an EMPTY or hidden-files-only dir (e.g. an
    # interrupted writer's .part temp files before rename) proves
    # nothing — keep the hard refusal for those.
    if not parquet_parts:
        return False
    try:
        import pyarrow.parquet as pq

        return all(
            pq.ParquetFile(p).metadata.num_rows == 0 for p in parquet_parts
        )
    except Exception:
        return False  # unreadable footer: not provably the marker


def _check_stage_sidecar(out_dir: str, manifest_dir: str, stage: str) -> None:
    """Refuse to delete a directory this (out_dir, manifest_dir) pairing
    does not own. run_stage_with_lineage takes the two paths
    independently, so a caller passing a wrong/respelled manifest_dir
    would see zero committed buckets and rmtree LIVE, snapshot-referenced
    data (ADVICE r4) — the sidecar written at data-write time is the
    ownership proof the delete requires."""
    sidecar = os.path.join(out_dir, _STAGE_SIDECAR)
    if not os.path.exists(sidecar):
        # Migration path for out_dirs written by pre-sidecar versions of
        # this code (ADVICE r5): the ONLY legitimate pre-sidecar shape
        # reaching this delete is the root-level empty-input marker — a
        # flat dir of Spark bookkeeping + zero-row parquet, no partition
        # subdirs. Accept exactly that; anything else still hard-fails.
        if _is_empty_marker_layout(out_dir):
            return
        raise ValueError(
            f"refusing to delete {out_dir}: no {_STAGE_SIDECAR} pairing it "
            f"with a lineage manifest dir and it is not a bare empty-input "
            f"marker — it was not written by run_stage_with_lineage; remove "
            f"it manually if it is really a superseded stage dir"
        )
    with open(sidecar) as f:
        meta = json.load(f)
    if meta.get("manifest_dir") != os.path.realpath(manifest_dir):
        raise ValueError(
            f"refusing to delete {out_dir}: its sidecar names manifest dir "
            f"{meta.get('manifest_dir')!r}, not {os.path.realpath(manifest_dir)!r} "
            f"— wrong (out_dir, manifest_dir) pairing"
        )
    if meta.get("stage") != stage:
        # same manifest dir can serve several stages; a wrong (out_dir,
        # stage) pairing must not delete another stage's committed data
        raise ValueError(
            f"refusing to delete {out_dir}: its sidecar names stage "
            f"{meta.get('stage')!r}, not {stage!r} — wrong (out_dir, stage) "
            f"pairing"
        )


def run_stage_with_lineage(
    df: DataFrame,
    transform,
    spark: SparkSession,
    stage: str,
    key_col: str,
    out_dir: str,
    manifest_dir: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Execute ``transform`` bucket-partitioned with exact resume.

    transform: DataFrame (with _bucket col) -> DataFrame (must keep
    _bucket). Returns the full stage output (committed ∪ new).
    """
    pending = resume_filter(df, spark, manifest_dir, stage, key_col, n_buckets)
    run_id = uuid.uuid4().hex

    if pending.limit(1).count() > 0:
        if (
            os.path.exists(out_dir)
            and committed_buckets(spark, manifest_dir, stage)
            .limit(1).count() == 0
        ):
            # out_dir exists but NO bucket was ever committed: it holds
            # either the root-level empty-input marker (written below on
            # a previous empty run) or a crashed write that predates any
            # manifest commit — both are fully superseded by this run,
            # and root-level files would otherwise mix with the
            # partitioned layout and wedge every future read. The
            # sidecar check guards against the delete firing on a dir
            # this stage does NOT own (wrong manifest_dir pairing).
            import shutil

            _check_stage_sidecar(out_dir, manifest_dir, stage)
            shutil.rmtree(out_dir)
        out = transform(pending)
        per_bucket_in = (
            pending.groupBy("_bucket").agg(F.count(F.lit(1)).alias("rows_in"))
        )
        # ownership sidecar BEFORE the data write: dynamic partition
        # overwrite never truncates the base dir, so the sidecar
        # survives, and a writer killed mid-parquet-write leaves a dir
        # that still names its manifest (the resume path's rmtree guard
        # accepts it instead of wedging)
        _write_stage_sidecar(out_dir, manifest_dir, stage)
        (
            out.write.mode("overwrite")
            .partitionBy("_bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )
        per_bucket_out = (
            spark.read.parquet(out_dir)
            .join(per_bucket_in.select("_bucket"), "_bucket", "left_semi")
            .groupBy("_bucket")
            .agg(F.count(F.lit(1)).alias("rows_out"))
        )
        fingerprint = json.dumps({"stage": stage, "key": key_col, "n": n_buckets})
        manifest_rows = (
            per_bucket_in.join(per_bucket_out, "_bucket", "left")
            .na.fill(0, ["rows_out"])
            .select(
                F.lit(stage).alias("stage"),
                F.col("_bucket").alias("bucket"),
                F.lit(fingerprint).alias("input_fingerprint"),
                F.col("rows_in"),
                F.col("rows_out"),
                F.lit("committed").alias("status"),
                F.lit(run_id).alias("run_id"),
                F.lit(time.time()).alias("committed_at"),
            )
        )
        manifest_rows.coalesce(1).write.mode("append").parquet(manifest_dir)
    elif not os.path.exists(out_dir):
        # first call with an EMPTY input: nothing pending and nothing
        # ever written — materialize an empty, schema-carrying output so
        # the read-back (and any snapshot publish of this directory)
        # sees a valid empty table instead of failing on a missing path.
        # Write marker + sidecar into a TEMP dir and atomically rename:
        # a crash mid-write leaves only an invisible temp dir, never an
        # out_dir without its ownership sidecar (which would wedge the
        # later supersede delete on the missing-sidecar refusal).
        tmp = f"{out_dir}.tmp-{run_id[:8]}"
        transform(pending).write.mode("overwrite").parquet(tmp)
        _write_stage_sidecar(tmp, manifest_dir, stage)
        os.rename(tmp, out_dir)
    return spark.read.parquet(out_dir)


def stage_metrics(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Per-stage rows_in/rows_out/buckets — the run-metrics surface
    (reference analog: tf.summary + logger, model.py:≈139-144 [R])."""
    m = read_manifest(spark, manifest_dir)
    return (
        m.filter(F.col("status") == "committed")
        .groupBy("stage")
        .agg(
            F.countDistinct("bucket").alias("n_buckets"),
            F.sum("rows_in").alias("rows_in"),
            F.sum("rows_out").alias("rows_out"),
        )
    )
