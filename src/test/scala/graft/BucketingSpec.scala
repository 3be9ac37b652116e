package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed co-located join: correctness vs the plain join, and the
  * plan property that justifies bucketing at 100 TB — the equi-join
  * on the bucket key runs with NO exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  test("bucketed join matches the unbucketed join and plans no exchange on the join") {
    val out = Bucketing.bucketedJoin(s, d)
    val plain = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"))
    val got = out.select("c_mktsegment", "n_orders").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp)

    // Plan property: disable broadcast so the join must pick a
    // distribution-requiring strategy, then check the bucket metadata
    // satisfied it without any shuffle under the join.
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val joined = s.table(s"orders_bkt_$tag")
        .join(s.table(s"customer_bkt_$tag"),
          col("o_custkey") === col("c_custkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a distribution-requiring join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("Bucketed: true"), s"scan did not use buckets:\n$p")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
