package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Approximate/sketch aggregations — the constant-memory versions of
  * exact aggregates, which is what survives a 100 TB cardinality
  * estimate (HyperLogLog++) or quantile (KLL/GK) when the exact form
  * would shuffle the world.
  *
  * Sketch outputs are implementation-defined, so there is no DuckDB
  * hash oracle; a01 gets the driver's rows-only check and SketchSpec
  * asserts the estimates against exact values within published error
  * bounds (HLL++ rsd default 5%; percentile_approx accuracy 10000).
  */
object Sketches {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_approx_sketches" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          approx_count_distinct(col("o_custkey")).as("approx_customers"),
          countDistinct(col("o_custkey")).as("exact_customers"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_median"),
          asDouble(sum(col("o_totalprice").cast(DecimalType(12, 2)))).as("sum_price"))
        .orderBy("o_orderpriority"))
  )

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  val oracle: Map[String, String] = Map.empty // sketches are engine-specific
}
