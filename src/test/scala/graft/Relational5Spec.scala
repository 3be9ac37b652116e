package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Relational5, Skew, Upsert}
import graft.functions.WeightedAvg
import graft.sources.SourceFormats

/** Semantic invariants for the fifth batch (q40/q41, u01, a03, t05/t06,
  * i05) at sf0.001 — properties the DuckDB value-parity gate can't
  * express (plan shape, equivalence to the unsalted/unmerged
  * formulations, UDAF merge associativity under repartitioning).
  */
class Relational5Spec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  test("q40 salted join ≡ plain join, and the salted plan joins on (key, salt)") {
    val salted = Relational5.queries("q40_skew_salted_join")(s, d).collect()
    val plain = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"))
      .orderBy("s_nationkey").collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getInt(0) === b.getInt(0))
      assert(a.getLong(1) === b.getLong(1))
    }
  }

  test("salted join never loses or duplicates rows at any salt factor") {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_suppkey")
    val sup = Tables.supplier(s, d).withColumnRenamed("s_suppkey", "l_suppkey")
    val base = li.join(sup, "l_suppkey").count()
    for (k <- Seq(1, 3, 16)) {
      val got = Skew.saltedJoinDeterministic(li, sup, "l_suppkey",
        Seq(col("l_orderkey"), col("l_linenumber")), k).count()
      assert(got === base, s"saltFactor=$k")
    }
  }

  test("q41 distribution ranks: quartiles partition each segment evenly") {
    val rows = Relational5.queries("q41_window_distribution")(s, d)
    // quartile sizes within a segment differ by at most 1 (ntile contract)
    val sizes = rows.groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment")
      .agg(max("count").as("mx"), min("count").as("mn"))
    assert(sizes.filter(col("mx") - col("mn") > 1).count() === 0L)
    // cume_dist is in (0, 1] and percent_rank in [0, 1]
    assert(rows.filter(col("cum_dist") <= 0 || col("cum_dist") > 1).count() === 0L)
    assert(rows.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() === 0L)
  }

  test("u01 merge: updates overwrite, inserts add, untouched rows survive") {
    val orders = Tables.orders(s, d)
    val nOrig = orders.count()
    val nUpd = orders.filter(col("o_orderstatus") === "O" &&
      year(col("o_orderdate")) === 1998).count()
    val nIns = orders.filter(col("o_orderkey") % 97 === 0).count()
    val merged = Upsert.queries("u01_upsert_merge")(s, d).collect()
    val byKey = merged.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byKey.getOrElse(("U", "0-MERGED"), 0L) === nUpd)
    assert(byKey.getOrElse(("N", "9-NEW"), 0L) === nIns)
    assert(merged.map(_.getLong(2)).sum === nOrig + nIns)
  }

  test("scd1 with a partial-schema source keeps unlisted target columns") {
    import s.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val source = Seq((2L, 99.0), (3L, 30.0)).toDF("k", "v")
    val out = Upsert.scd1(target, source, "k").orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out(1).getString(1) === "b")     // name kept from target
    assert(out(1).getDouble(2) === 99.0)    // v overwritten from source
    assert(out(2).isNullAt(1))              // insert has no target name
  }

  test("u02 scd2: matched keys get exactly one closed + one current version") {
    val hist = Upsert.queries("u02_scd2_history")(s, d).collect()
    val orders = Tables.orders(s, d)
    val nOrig = orders.count()
    val cdcKeys = orders.filter(col("o_orderstatus") === "O" &&
      year(col("o_orderdate")) === 1998)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(cdcKeys.nonEmpty, "gate must not pass vacuously")
    assert(hist.length === nOrig + cdcKeys.size)
    hist.groupBy(_.getAs[Long]("o_orderkey")).foreach { case (k, vs) =>
      if (cdcKeys(k)) {
        assert(vs.length === 2)
        val closed = vs.filter(_.getAs[Long]("is_current") == 0L)
        val current = vs.filter(_.getAs[Long]("is_current") == 1L)
        assert(closed.length === 1 && current.length === 1)
        assert(!closed.head.isNullAt(closed.head.fieldIndex("valid_to")))
        assert(current.head.isNullAt(current.head.fieldIndex("valid_to")))
        // new version carries the re-priced value
        assert(current.head.getAs[Double]("o_totalprice") ===
          closed.head.getAs[Double]("o_totalprice") + 1000.0)
      } else {
        assert(vs.length === 1 && vs.head.getAs[Long]("is_current") === 1L)
        assert(vs.head.isNullAt(vs.head.fieldIndex("valid_to")))
      }
    }
  }

  test("scd2 applied to its own output extends history, never rewrites it") {
    import s.implicits._
    import org.apache.spark.sql.types.TimestampType
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .withColumn("valid_from", to_timestamp(lit("2020-01-01")))
      .withColumn("valid_to", lit(null).cast(TimestampType))
      .withColumn("is_current", lit(1L))
    val out1 = Upsert.scd2(base, Seq((1L, 11.0)).toDF("k", "v"), "k",
      to_timestamp(lit("2021-01-01")))
    // second application: target now CARRIES history; the 2021 close
    // boundary on k=1's first version must survive untouched
    val out2 = Upsert.scd2(out1, Seq((1L, 12.0)).toDF("k", "v"), "k",
      to_timestamp(lit("2022-01-01")))
      .orderBy("k", "valid_from").collect()
    val k1 = out2.filter(_.getLong(0) == 1L)
    assert(k1.length === 3)
    assert(k1.map(_.getDouble(1)).toSeq === Seq(10.0, 11.0, 12.0))
    assert(k1(0).getTimestamp(3).toString.startsWith("2021-01-01"),
      s"historical boundary rewritten: ${k1(0).getTimestamp(3)}")
    assert(k1(1).getTimestamp(3).toString.startsWith("2022-01-01"))
    assert(k1(2).isNullAt(3) && k1(2).getLong(4) === 1L)
    assert(k1.map(_.getLong(4)).toSeq === Seq(0L, 0L, 1L))
    val k2 = out2.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2.head.getLong(4) === 1L)
  }

  test("a03 UDAF: value matches the direct formula and survives repartitioning") {
    val li = Tables.lineitem(s, d)
    val expect = li.groupBy("l_returnflag")
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") * col("l_quantity").cast("long")) /
        (lit(100.0) * sum(col("l_quantity").cast("long")))).as("w"))
      .orderBy("l_returnflag").collect().map(_.getDouble(1))
    for (parts <- Seq(1, 7)) {
      val got = li.repartition(parts).groupBy("l_returnflag")
        .agg(WeightedAvg.wavg(col("l_extendedprice"), col("l_quantity")).as("w"))
        .orderBy("l_returnflag").collect().map(_.getDouble(1))
      assert(got.length === expect.length)
      got.zip(expect).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"parts=$parts") }
    }
  }

  test("t05 redaction removes every email/phone it counted") {
    val out = TestOps.t("t05_pii_redact", s, d)
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() === 0L)
    assert(out.filter(col("redacted").rlike("@")).count() === 0L)
    assert(out.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>")).count() === 0L)
  }

  test("t06 bigram top-k is sorted, distinct, and counts are positive") {
    val rows = TestOps.t("t06_ngram_topk", s, d).collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(ns.forall(_ > 0))
  }

  test("i05 csv/json round-trip preserves counts against the parquet source") {
    val out = SourceFormats.queries("i05_source_formats")(s, d)
      .orderBy("fmt").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("csv_orders", "json_customer"))
    assert(out(0).getLong(1) === Tables.orders(s, d).count())
    assert(out(1).getLong(1) === Tables.customer(s, d).count())
  }
}

private object TestOps {
  def t(name: String, s: org.apache.spark.sql.SparkSession, d: String) =
    graft.operators.TextAnalysis.queries(name)(s, d)
}
