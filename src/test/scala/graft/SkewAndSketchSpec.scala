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

  test("a09: inclusion–exclusion overlap error stays within HALF the " +
    "registered gate (measured headroom, sf0.01)") {
    // sf0.01 deliberately: the sf0.001 events table has only 15
    // distinct users, where HLL sits in sparse mode and is EXACT —
    // a zero-error draw proves nothing about the envelope. The 10k-row
    // fixture exercises dense estimation on all three sketch terms.
    val big = "/root/testdata/sf0.01"
    // the SAME construction the registered query runs (shared helper,
    // not a copy — a drifted copy would measure the wrong pipeline)
    val (estDf, exactDf) = Sketches.overlapLegs(s, big)
    val est = estDf.collect()
    assert(est.length === 10) // C(5,2) event-type pairs
    val exact = exactDf.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("exact_overlap")).toMap
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      // hll_sketch_estimate returns LONG — the integer arithmetic keeps
      // est_overlap a Long column
      val err = math.abs(r.getAs[Long]("est_overlap").toDouble - exact(key).toDouble)
      val halfGate = r.getAs[Long]("nd_sum") * 0.025 + 2.5
      assert(err <= halfGate,
        s"$key: est error $err exceeds HALF the gate ($halfGate) — the " +
          "registered 5% envelope is losing its headroom")
    }
    // and the registered gate rows themselves are green at both SFs
    Seq(d, big).foreach { dir =>
      val flags = Sketches.queries("a09_hll_intersection")(s, dir).collect()
      assert(flags.nonEmpty && flags.forall(_.getAs[Long]("overlap_ok") == 1L))
    }
  }
}
