package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Reference-parity Parquet source (SURVEY §2.1 ops 1–2).
  *
  * The reference opens one file, parses the footer, and pulls Arrow
  * record batches of 1000 rows (`/root/reference/src/main.rs:52-56,74`).
  * Spark's vectorized Parquet reader does all of that natively and
  * multi-file / multi-executor: a path may be a single file, a glob, or
  * a 100 TB directory tree — partition planning, footer-schema
  * inference, predicate pushdown and column pruning are automatic.
  */
object ParquetSource {

  /** Open a Parquet path. `columnarBatchSize` mirrors the reference's
    * record-batch size knob (`src/main.rs:74`); Spark default is 4096.
    */
  def read(spark: SparkSession, path: String,
           columnarBatchSize: Int = 4096,
           mergeSchema: Boolean = false): DataFrame =
    spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(path)

  /** Footer-inferred schema without reading data (SURVEY §2.1 op 2:
    * `arrow_reader.get_schema()`, `src/main.rs:56`).
    */
  def schemaOf(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema
}
