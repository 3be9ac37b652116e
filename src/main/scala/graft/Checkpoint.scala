package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a fault-tolerance switch.
  *
  * The iterative operators (c03 components, c11 pagerank, s06's
  * quantized-row reuse) must cut lineage every few rounds or the plan
  * tree grows unboundedly. `localCheckpoint()` does that by pinning
  * executor-local blocks — fast, zero configuration, and the right
  * default for `local[*]` — but those blocks are NOT fault-tolerant:
  * on a real cluster, losing one executor mid-iteration kills the job
  * with unrecomputable lineage.
  *
  * Setting `spark.graft.checkpointDir` to a durable path (HDFS/object
  * store on a cluster; any directory locally) switches every
  * truncation point to reliable `checkpoint()`: blocks are written to
  * the shared store and survive executor loss, at the cost of one
  * write+read round-trip per truncation. That is the config a 100 TB
  * run uses; the conf is read per-call, so one session can flip it
  * between queries (tests do).
  */
object Checkpoint {

  /** When set (non-empty), iterative operators checkpoint reliably to
    * this directory instead of to executor-local storage. */
  val DirConf = "spark.graft.checkpointDir"

  /** Materialize `df` now and return it with truncated lineage —
    * reliably if [[DirConf]] is set, executor-locally otherwise. */
  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir creates a fresh UUID subdir each call; the
        // current dir reports fully qualified ("file:<dir>/<uuid>").
        // Compare the configured path EXACTLY against the parent of
        // that UUID subdir after qualifying both through the target
        // FileSystem — substring containment would mis-match prefixes
        // (switching '/tmp/ck2' → '/tmp/ck' must re-point, not no-op).
        val wanted = new org.apache.hadoop.fs.Path(dir)
        val qualified = wanted
          .getFileSystem(s.sparkContext.hadoopConfiguration)
          .makeQualified(wanted)
        val current = s.sparkContext.getCheckpointDir
          .map(c => new org.apache.hadoop.fs.Path(c).getParent)
        if (!current.contains(qualified))
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Call-site sugar: `df.truncated` ≡ `Checkpoint.truncate(df)`. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = truncate(df)
  }
}
