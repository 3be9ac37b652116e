package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Sketches, Skew}

class SkewAndSketchSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  test("salted join equals the plain equi-join") {
    val o = Tables.orders(s, d).withColumnRenamed("o_custkey", "c_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val plain = o.join(c, Seq("c_custkey"))
      .select("o_orderkey", "c_mktsegment").orderBy("o_orderkey")
    val salted = Skew.saltedJoin(o, c, "c_custkey", 8)
      .select("o_orderkey", "c_mktsegment").orderBy("o_orderkey")
    assert(salted.collect().map(_.toSeq).toSeq === plain.collect().map(_.toSeq).toSeq)
  }

  test("deterministic salted join equals the plain equi-join") {
    val o = Tables.orders(s, d).withColumnRenamed("o_custkey", "c_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
    val plain = o.join(c, Seq("c_custkey")).count()
    val salted = Skew.saltedJoinDeterministic(o, c, "c_custkey",
      Seq(col("o_orderkey")), 4).count()
    assert(salted === plain)
  }

  test("approx sketches are within published error bounds of exact values") {
    val rows = Sketches.queries("a01_approx_sketches")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_customers").toDouble
      val exact = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(approx - exact) / exact < 0.15,
        s"HLL estimate $approx vs exact $exact out of bounds")
      assert(r.getAs[Double]("approx_median") > 0)
    }
  }

  test("mergeable HLL: union of group sketches estimates the global distinct") {
    val rows = Sketches.queries("a02_hll_mergeable")(s, d).collect()
    val exactGlobal = Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey"))).first().getLong(0).toDouble
    val byPrio = rows.map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    assert(byPrio.contains("ALL"))
    // per-group estimates within HLL error of their exacts
    rows.filter(_.getAs[String]("o_orderpriority") != "ALL").foreach { r =>
      val est = r.getAs[Long]("est_customers").toDouble
      val exact = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(est - exact) / exact < 0.15,
        s"group estimate $est vs exact $exact out of bounds")
    }
    // the UNION-of-sketches estimate tracks the global exact count —
    // i.e. merging sketch state is equivalent to re-scanning the data
    val merged = byPrio("ALL").getAs[Long]("est_customers").toDouble
    assert(math.abs(merged - exactGlobal) / exactGlobal < 0.15,
      s"merged estimate $merged vs global exact $exactGlobal out of bounds")
  }
}
