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

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsNormalized(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
