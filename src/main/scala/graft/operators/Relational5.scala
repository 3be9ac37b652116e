package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Fifth relational batch: explicit skew-salted join and
  * distribution-rank window functions. Both absent from the reference
  * (whole program is `/root/reference/src/main.rs:49-210`, no joins or
  * windows at all); both oracle-checked against DuckDB.
  */
object Relational5 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def asDouble(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q40: salted skew join — the deterministic fallback for producers
    // too skewed for AQE's runtime splitting (one key = 10% of a
    // 100 TB fact table). lineitem is salted into 8 sub-keys per
    // supplier, supplier is replicated 8x, the join key becomes
    // (suppkey, salt) so each hot key's rows spread across 8 reducers.
    // Semantically identical to the plain equi-join — which is exactly
    // what the oracle asserts. Salt comes from the row's own key
    // columns (not a random), so retries/speculative tasks re-derive
    // the same salt.
    "q40_skew_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
        .withColumnRenamed("s_suppkey", "l_suppkey")
      Skew.saltedJoinDeterministic(li, sup, "l_suppkey",
          Seq(col("l_orderkey"), col("l_linenumber")), saltFactor = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          asDouble(sum(dec(col("l_extendedprice")))).as("revenue"))
        .orderBy("s_nationkey")
    }),

    // q41: distribution ranks — ntile quartiles, percent_rank,
    // cume_dist per market segment. The window order carries a unique
    // tiebreak (c_custkey) so ntile bucket assignment is total-ordered
    // and deterministic in both engines. One shuffle on the partition
    // key, then a per-partition sort — the standard window plan; at
    // scale the partition count (segments) bounds parallelism, which
    // is why rank-style analytics want a finer partition key than 5
    // segments (noted, not needed at fixture scale).
    "q41_window_distribution" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cum_dist"))
        .orderBy("c_mktsegment", "c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q40_skew_salted_join" -> """
      SELECT s_nationkey, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey""",

    "q41_window_distribution" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal,
        CAST(ntile(4) OVER w AS INT) AS quartile,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cum_dist
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_mktsegment, c_custkey"""
  )
}
