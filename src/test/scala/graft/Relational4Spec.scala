package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational4

/** Semantic invariants for the fourth relational batch (q34–q39) at
  * sf0.001 — properties the DuckDB value-parity gate can't express.
  */
class Relational4Spec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  private def q(name: String) = Relational4.queries(name)(s, d)

  test("q34 map funcs: per-status counts reassemble the total order count") {
    val rows = q("q34_map_funcs").collect()
    val total = rows.map { r =>
      Seq("n_f", "n_o", "n_p").map { c =>
        if (r.isNullAt(r.fieldIndex(c))) 0L else r.getLong(r.fieldIndex(c))
      }.sum
    }.sum
    assert(total === Tables.orders(s, d).count())
    rows.foreach { r =>
      val nonNull = Seq("n_f", "n_o", "n_p").count(c => !r.isNullAt(r.fieldIndex(c)))
      assert(r.getInt(r.fieldIndex("n_statuses")) === nonNull)
      assert(r.getInt(r.fieldIndex("n_major")) <= nonNull)
    }
  }

  test("q35 regexp: masking removes every digit and extraction counts them") {
    val rows = q("q35_regexp")
    assert(rows.filter(col("masked").rlike("[0-9]")).count() === 0L)
    // props is {"k": <num>} so exactly one digit-run per row
    assert(rows.filter(col("n_nums") =!= 1).count() === 0L)
    assert(rows.filter(col("first_num").isNull).count() === 0L)
  }

  test("q36 conditional aggregates are bounded by the group totals") {
    q("q36_conditional_agg").collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("n_disc")) <= r.getLong(r.fieldIndex("n_rows")))
      assert(r.getDouble(r.fieldIndex("disc_revenue")) >= 0.0)
    }
  }

  test("q37 interval arithmetic: derived dates keep their ordering invariants") {
    val bad = q("q37_interval_arith")
      .join(Tables.orders(s, d), "o_orderkey")
      .filter(col("due_45d") <= col("o_orderdate").cast("date") ||
        col("plus_3m") <= col("o_orderdate").cast("date") ||
        col("month_end") < col("o_orderdate").cast("date") ||
        col("iso_week") < 1 || col("iso_week") > 53 ||
        col("dow") < 1 || col("dow") > 7)
    assert(bad.count() === 0L)
  }

  test("q38 union by name: branch cardinalities add up, missing columns null-fill") {
    val out = q("q38_union_by_name")
    val o = Tables.orders(s, d)
    val high = o.filter(col("o_totalprice") > 400000.0).count()
    val urgent = o.filter(year(col("o_orderdate")) === 1998 &&
      col("o_orderpriority") === "1-URGENT").count()
    assert(out.count() === high + urgent)
    assert(out.filter(col("tag") === "high" && col("o_date").isNotNull).count() === 0L)
    assert(out.filter(col("tag") === "urgent98" && col("o_totalprice").isNotNull).count() === 0L)
  }

  test("q39 range frame: trailing 7-day revenue dominates the daily revenue") {
    val out = q("q39_window_range_frame")
    assert(out.filter(col("rev_7d") < col("rev")).count() === 0L)
    // a 1-day frame equals the daily value wherever the prior 6 days are empty;
    // global check: the final day's trailing sum never exceeds the grand total
    val total = out.agg(sum("rev")).first().getDouble(0)
    out.collect().foreach(r => assert(r.getDouble(r.fieldIndex("rev_7d")) <= total + 1e-6))
  }
}
