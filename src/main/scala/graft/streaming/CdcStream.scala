package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog
import graft.operators.Upsert

/** Streaming CDC apply — u03's latest-op-wins collapse run per
  * micro-batch against a persisted, snapshot-logged target: the
  * `foreachBatch → MERGE → commit` loop every Delta/Iceberg CDC
  * pipeline runs (the reference only ever appends,
  * `/root/reference/src/main.rs:146`). Composes the two round-10
  * pieces: [[Upsert.latestOps]] for the in-batch collapse and
  * [[SnapshotLog]] for atomic, versioned, exactly-once publication.
  *
  * The apply is the Delta-MERGE file-level shape, not a table rewrite:
  *   1. collapse the batch (window over the SMALL batch only);
  *   2. find the target files that contain an affected key — one scan
  *     of the key column with a broadcast semi-join, grouped by
  *     `_metadata.file_path` (the key column is the only column read,
  *     and at 100 TB zone maps i11 would shortcut this to a manifest
  *     lookup);
  *   3. rewrite ONLY those files (broadcast anti-join removes old
  *     versions of affected keys, non-delete ops union in);
  *   4. commit a manifest = untouched files (carried over verbatim,
  *     zero IO) + the rewritten files, with the optimistic
  *     expected-parent check.
  * Per-batch cost is O(batch + touched files), never O(table) — a
  * 1000-key CDC batch against a 100 TB table rewrites a few files.
  *
  * Exactly-once across restarts is layered: Structured Streaming's
  * checkpoint skips fully-committed batches, and for the
  * crash-between-sink-and-checkpoint window each commit records its
  * `batchId` in the manifest op — a replayed batch finds its op
  * already committed and no-ops (the Delta `txn` appId/version
  * idempotence pattern). */
object CdcStream {

  /** Load the initial target state as snapshot v1. */
  def seedTarget(s: SparkSession, table: String, data: DataFrame): Long = {
    val dir = s"$table/data/base"
    data.repartition(4).write.mode("overwrite").parquet(dir)
    SnapshotLog.commit(s, table, "base-load",
      SnapshotLog.dataFiles(s, dir), Some(0L))
  }

  private def opName(batchId: Long) = s"cdc-batch-$batchId"

  /** Op strings of every committed snapshot — bounded by version count
    * (metadata, not data; same class as the manifest read itself). */
  private def committedOps(s: SparkSession, table: String): Set[String] =
    (1L to SnapshotLog.currentVersion(s, table)).flatMap(v =>
      SnapshotLog.readManifest(s, table, v).map(_.op)).toSet

  /** Apply one CDC micro-batch to the snapshot table. Idempotent on
    * `batchId`: a replayed batch (restart after a crash between the
    * sink commit and the checkpoint commit) is detected by its op
    * string and skipped. Returns the committed version, or -1 when
    * the batch was already applied or empty. */
  def applyBatch(s: SparkSession, table: String, batch: DataFrame,
      batchId: Long, key: String): Long = {
    if (committedOps(s, table).contains(opName(batchId))) return -1L
    val latest = Upsert.latestOps(batch, key).cache()
    try {
      if (latest.isEmpty) return -1L
      val cur = SnapshotLog.currentVersion(s, table)
      val m = SnapshotLog.readManifest(s, table, cur).getOrElse(
        throw new IllegalStateException(s"CDC apply against unseeded $table"))
      val target = SnapshotLog.readAt(s, table, cur)
      val cols = target.columns

      // files containing an affected key: key-column-only scan, keys
      // broadcast; normalize _metadata.file_path (scheme-qualified) to
      // the manifest's plain-path form driver-side — bounded by file
      // count, the InMemoryFileIndex footprint class
      val touched = target
        .select(col(key), col("_metadata.file_path").as("__f"))
        .join(broadcast(latest.select(key)), Seq(key), "left_semi")
        .select("__f").distinct().collect()
        .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath)
        .toSet
      val (touchedFiles, untouched) = m.files.partition(f => touched(f._1))

      // rewrite only the touched files: survivors (anti-join the
      // broadcast key set) + applied non-delete ops
      val touchedScan =
        if (touchedFiles.isEmpty) target.limit(0)
        else s.read.parquet(touchedFiles.map(_._1): _*)
      val rewritten = touchedScan
        .join(broadcast(latest.select(key)), Seq(key), "left_anti")
        .select(cols.map(col): _*)
        .unionByName(latest.filter(col("op") =!= "D")
          .select(cols.map(col): _*))
      // output parallelism ∝ files being replaced: a batch that
      // touches k files writes ~k files back (collapsing to 1 would
      // funnel a multi-GB rewrite through one task at scale; growing
      // the count would fragment the layout — compaction's job)
      val dir = s"$table/data/${opName(batchId)}"
      rewritten.repartition(math.max(1, touchedFiles.size))
        .write.mode("overwrite").parquet(dir)
      SnapshotLog.commit(s, table, opName(batchId),
        untouched ++ SnapshotLog.dataFiles(s, dir), Some(cur))
    } finally latest.unpersist()
  }

  /** Wire a CDC ops stream into the apply loop: one snapshot commit
    * per micro-batch. Caller owns start()/awaitTermination. */
  def applyStream(s: SparkSession, table: String, ops: DataFrame,
      key: String, checkpoint: String) =
    ops.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(s, table, batch, id, key); ()
      }
}
