package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational3

/** Semantic invariants for the third relational batch (q27–q33) at
  * sf0.001 — properties the DuckDB value-parity gate can't express.
  */
class Relational3Spec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  private def q(name: String) = Relational3.queries(name)(s, d)

  test("q27 pivot: wide totals equal the long-form group totals") {
    val wide = q("q27_pivot")
      .agg(sum(coalesce(col("qty_f"), lit(0.0)) + coalesce(col("qty_o"), lit(0.0))))
      .first().getDouble(0)
    val long = Tables.lineitem(s, d).agg(sum("l_quantity")).first().getDouble(0)
    assert(math.abs(wide - long) < 1e-6)
  }

  test("q28 percentiles: p50 <= p90 and both within column bounds") {
    q("q28_percentiles").collect().foreach { r =>
      val (p50, p90) = (r.getDouble(r.fieldIndex("p50_price")),
        r.getDouble(r.fieldIndex("p90_price")))
      assert(p50 <= p90)
    }
    val (mn, mx) = Tables.lineitem(s, d)
      .agg(min("l_extendedprice"), max("l_extendedprice"))
      .as[(Double, Double)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble)).first()
    q("q28_percentiles").collect().foreach { r =>
      assert(r.getDouble(r.fieldIndex("p90_price")) >= mn)
      assert(r.getDouble(r.fieldIndex("p90_price")) <= mx)
    }
  }

  test("q29 grouping sets: contains the grand total exactly once") {
    val total = Tables.lineitem(s, d).count()
    val grand = q("q29_grouping_sets")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_rows") == total)
  }

  test("q30 correlated subquery: each customer appears with its max price") {
    val out = q("q30_correlated_subquery")
    val perCust = Tables.orders(s, d).groupBy("o_custkey")
      .agg(max("o_totalprice").as("mx"))
    val joined = out.join(perCust, "o_custkey")
      .filter(col("o_totalprice") =!= col("mx"))
    assert(joined.count() == 0)
    // every customer with at least one order is represented
    assert(out.select("o_custkey").distinct().count() == perCust.count())
  }

  test("q31 struct/map roundtrip equals a plain group-by") {
    val viaMap = q("q31_struct_map").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = Tables.orders(s, d).groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaMap == plain)
  }

  test("q32 gap fill: spine is contiguous hours and counts sum to row count") {
    val rows = q("q32_resample_gapfill").collect()
    val hours = rows.map(_.getTimestamp(0).getTime)
    assert(hours.sliding(2).forall { case Array(a, b) => b - a == 3600 * 1000L
                                     case _ => true })
    assert(rows.map(_.getLong(1)).sum == Tables.events(s, d).count())
  }

  test("q33 hash sample: deterministic across runs and ~1/16 selectivity") {
    val a = q("q33_sample_hash").collect().map(_.getLong(0)).toSeq
    val b = q("q33_sample_hash").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    val total = Tables.orders(s, d).count().toDouble
    assert(a.length > total / 32 && a.length < total / 8) // loose binomial bounds
  }
}
