package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Bucketed storage — the co-located-join strategy the 100 TB design
  * stance calls for. Writing both join sides pre-hashed into the same
  * number of buckets on the join key means every subsequent equi-join
  * on that key reads already-distribution-compatible data: NO exchange
  * on either side, at any scale. On a 1000-executor cluster this is
  * the difference between a full 100 TB shuffle and a local
  * merge per bucket pair.
  *
  * The reference has no storage layout notion at all (it reads one
  * parquet file straight through, `/root/reference/src/main.rs:52`);
  * this is the Spark-native capability that replaces "hope the data
  * arrives partitioned right".
  */
object Bucketing {

  val NumBuckets = 8

  /** Write `df` as a bucketed external parquet table (hash-bucketed +
    * per-bucket sorted on `key`) under `baseDir`, registered as
    * `table` in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    baseDir: String, buckets: Int = NumBuckets): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"$baseDir/$table")
      .saveAsTable(table)

  /** orders ⋈ customer both bucketed on custkey, then the revenue
    * rollup — the i03 query. The bucket metadata satisfies both
    * sides' hash-distribution requirement, so the join itself plans
    * with no Exchange (asserted in BucketingSpec); only the final
    * small aggregate shuffles. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    // per-sfDir table names: one session may touch several SF dirs
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val od = s"orders_bkt_$tag"
    val cd = s"customer_bkt_$tag"
    val base = graft.LocalScratch.scratchDir + "/graft_bucketed"
    if (!s.catalog.tableExists(od))
      writeBucketed(Tables.orders(s, d), od, "o_custkey", base)
    if (!s.catalog.tableExists(cd))
      writeBucketed(Tables.customer(s, d), cd, "c_custkey", base)
    s.table(od)
      .join(s.table(cd), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType)
          .as("revenue"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i03_bucketed_join" -> ((s, d) => bucketedJoin(s, d))
  )

  val oracle: Map[String, String] = Map(
    "i03_bucketed_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  )
}
