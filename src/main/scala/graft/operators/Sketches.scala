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
        .orderBy("o_orderpriority")),

    // a02: MERGEABLE sketch state — the actual 100 TB cardinality
    // workflow. Each group materializes a DataSketches HLL as bytes
    // (persistable: write per-day/per-partition sketches once, never
    // rescan), and hll_union_agg re-aggregates the SKETCHES — the
    // merged estimate needs only the tiny sketch blobs, not a second
    // pass over the data. Per-priority rows carry their estimate;
    // the ALL row is estimated from the union of the five sketches.
    "a02_hll_mergeable" -> ((s, d) => {
      val perGroup = Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(hll_sketch_agg(col("o_custkey")).as("sketch"),
          countDistinct(col("o_custkey")).as("exact_customers"))
      val groups = perGroup.select(col("o_orderpriority"),
        hll_sketch_estimate(col("sketch")).as("est_customers"),
        col("exact_customers"))
      val merged = perGroup
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_customers"))
        .select(lit("ALL").as("o_orderpriority"), col("est_customers"),
          lit(null).cast(LongType).as("exact_customers"))
      groups.unionByName(merged).orderBy("o_orderpriority")
    })
  )

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  val oracle: Map[String, String] = Map.empty // sketches are engine-specific
}
