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
      val (od, cd) = Bucketing.tableNames(s, d)
      val joined = s.table(od)
        .join(s.table(cd), col("o_custkey") === col("c_custkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a distribution-requiring join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("Bucketed: true"), s"scan did not use buckets:\n$p")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a fresh catalog re-attaches to the existing layout instead of rewriting") {
    Bucketing.bucketedJoin(s, d).collect() // ensure the layout exists
    val (od, cd) = Bucketing.tableNames(s, d)
    val success = new java.io.File(
      LocalScratch.scratchDir + s"/graft_bucketed/$od/_SUCCESS")
    assert(success.exists())
    val before = success.lastModified()
    // dropping the EXTERNAL tables empties the catalog but keeps the
    // files — the state a brand-new JVM's in-memory catalog starts in
    s.sql(s"DROP TABLE $od")
    s.sql(s"DROP TABLE $cd")
    val out = Bucketing.bucketedJoin(s, d).collect()
    assert(out.nonEmpty)
    assert(success.lastModified() == before,
      "layout was rewritten; expected a DDL attach to the existing files")
    // the attach carries the bucket metadata: distribution-requiring
    // join still plans with no exchange
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table(od)
        .join(s.table(cd), col("o_custkey") === col("c_custkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"attached bucketed join shuffles:\n$p")
      assert(p.contains("Bucketed: true"), s"attached scan did not use buckets:\n$p")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
