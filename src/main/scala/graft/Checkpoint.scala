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
  def truncate(df: DataFrame): DataFrame = checkpointed(df, eagerLocal = true)

  /** Like [[truncate]] but LAZY: the logical plan is cut to a
    * `LogicalRDD` immediately (so downstream planning/codegen stays
    * per-round small), while the blocks pin when the caller's next
    * action first computes them. Use when the very next step is an
    * action that scans every partition anyway (the CC loop's
    * convergence fingerprint, a fixed-iteration loop's terminal
    * collect): the materialization rides that job instead of paying a
    * dedicated one — for checkpoint-per-round iterative operators the
    * per-round job count halves, which is the dominant fixed cost at
    * small-round scale. NOT for multi-consumer bases whose eager
    * materialization intentionally isolates codegen/JIT into its own
    * job (d04's gram stage — see BASELINE.md round-4).
    *
    * RELIABLE-CHECKPOINT CAVEAT: the one-scan rationale holds only for
    * `localCheckpoint` (blocks pin as a side effect of the caller's
    * next action). A reliable `checkpoint(eager = false)` writes its
    * files in a SEPARATE job that recomputes the full unpersisted
    * lineage — the caller's action pays the scan once and the
    * checkpoint write pays it again, so with [[DirConf]] set the lazy
    * variant would cost MORE than the eager one, not less. Therefore
    * when [[DirConf]] is set this method falls back to an eager
    * reliable checkpoint (one dedicated materialization job, lineage
    * scanned exactly once); correctness is identical either way since
    * all lineage here is deterministic. */
  def truncateLazy(df: DataFrame): DataFrame = checkpointed(df, eagerLocal = false)

  /** `eagerLocal` governs ONLY the executor-local branch; the reliable
    * branch is always eager (scaladoc on [[truncateLazy]]) — the name
    * makes that override explicit at the call site. */
  private def checkpointed(df: DataFrame, eagerLocal: Boolean): DataFrame = {
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
        // Always eager on the reliable path: lazy reliable checkpoints
        // recompute lineage in their separate write job (scaladoc above).
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eagerLocal)
    }
  }

  /** Call-site sugar: `df.truncated` ≡ `Checkpoint.truncate(df)`. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = truncate(df)
    def truncatedLazy: DataFrame = truncateLazy(df)
  }
}
