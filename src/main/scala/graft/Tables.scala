package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish fixture tables
  * (`/root/repo/TESTDATA.md`). One parquet file per table under
  * `\$sfDir/`. Schema is footer-inferred, mirroring the reference's
  * dynamic-schema stance (`/root/reference/src/main.rs:56`) — no
  * user-declared schemas anywhere.
  *
  * Scale notes: these are plain `spark.read.parquet` scans, so Catalyst
  * pushes filters/projections into the scan (`PushedFilters`/`ReadSchema`)
  * and partition planning follows `spark.sql.files.maxPartitionBytes` —
  * at 100 TB each table is a directory of many files and the same call
  * parallelizes across executors unchanged.
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped in THREE physical shapes across testdata
    * generations: Parquet TIMESTAMP(NANOS) — which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as a long of epoch-nanos via
    * the legacy conf — TIMESTAMP(MICROS, adjustedToUTC=true) which
    * Spark reads as TimestampType, and TIMESTAMP(MICROS,
    * adjustedToUTC=false) which Spark reads as TIMESTAMP_NTZ.
    * Normalize all three to a microsecond TimestampType: the nanos leg
    * floor-truncates exactly like DuckDB reading TIMESTAMP_NS, and the
    * NTZ→LTZ cast is value-identical under the UTC session timezone
    * every entry point pins — so oracle comparisons stay exact in
    * every shape. Downstream consumers (watermarks, unix_millis, the
    * range-join binning rule) all require plain TimestampType, which
    * is why the normalization lives here at the source.
    */
  private def eventsNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, not `/`: epoch-nanos (~1.7e18) overflow
        // double's 53-bit mantissa, so floating division would corrupt
        // microseconds.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already TimestampType (micros)
    }
  }

  /** Fan a too-few-splits table out to the session's parallelism.
    *
    * The text/embedding operators put their heaviest work — gram
    * explodes, per-position digests, cosine scans — on the MAP side of
    * their first exchange, so their parallelism is the SCAN's split
    * count. Spark packs files into splits of
    * min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism)),
    * which floors at openCost (4 MB default): a sub-4-MB table arrives
    * as ONE split and serializes every per-row digest/explode on a
    * single core (measured: t15's whole 2.7 M-bigram build ran as a
    * 1-task 6.3 s stage while 31 cores idled). Fan out ONLY when the
    * natural split count cannot fill the cores; a table that already
    * scans at session parallelism passes through untouched — at
    * 100 TB the repartition branch never fires, because adding a full
    * shuffle of a large table to "gain" parallelism it already has
    * would be pure loss (guide §2.4).
    *
    * Hash-keyed on the table's id column, not round-robin: downstream
    * work overwhelmingly groups/joins on that key (so the exchange is
    * reusable), the assignment is retry-deterministic (SPARK-38388
    * class) without the sort-before-repartition pass, and the id is a
    * column those consumers read anyway. */
  private def fannedOut(s: SparkSession, d: String, name: String,
      key: String): DataFrame = {
    val df = table(s, d, name)
    val cores = s.sparkContext.defaultParallelism
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: Exception => Long.MaxValue } // unknowable → assume big
    val splitBytes = math.min(conf.filesMaxPartitionBytes,
      math.max(conf.filesOpenCostInBytes, bytes / math.max(1, cores)))
    val estSplits = math.max(1L, (bytes + splitBytes - 1) / splitBytes)
    if (estSplits < cores) df.repartition(cores, col(key)) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  // orders/lineitem deliberately do NOT fan out here: their heavy
  // consumers are the lake-layer lifecycle queries, which re-execute
  // the scan once per commit action (seed + N mutation batches) — a
  // blanket fan-out re-pays its shuffle on every one of those actions
  // (measured: u04 4.1→6.5 s, i30 3.6→5.9 s, i29 2.4→4.1 s). The two
  // single-action aggregate queries that DO win from it (q18, a07)
  // take [[ordersFanned]]/[[lineitemFanned]] at the query site.
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  private[graft] def ordersFanned(s: SparkSession, d: String): DataFrame =
    fannedOut(s, d, "orders", "o_orderkey")
  private[graft] def lineitemFanned(s: SparkSession, d: String): DataFrame =
    fannedOut(s, d, "lineitem", "l_orderkey")
  def events(s: SparkSession, d: String): DataFrame    = eventsNormalized(s, d)
  def documents(s: SparkSession, d: String): DataFrame =
    fannedOut(s, d, "documents", "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame =
    fannedOut(s, d, "embeddings", "vec_id")
}
