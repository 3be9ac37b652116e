package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-shape canary (VERDICT r7 item 4).
  *
  * The driver regenerates `/root/testdata` between rounds, and the
  * physical shape has already shifted twice: `events.ts` shipped as
  * Parquet TIMESTAMP(NANOS), then TIMESTAMP(MICROS, adjustedToUTC=true),
  * then TIMESTAMP(MICROS, adjustedToUTC=false) — the last silently
  * turning nine scattered tests red (round 7). This suite turns the
  * next silent regeneration into ONE obvious failure: it opens every
  * table at every present scale factor through [[Tables]] and asserts
  * the exact NORMALIZED schema the operator surface is written
  * against. Footer-only reads — no data is scanned, so the sweep is
  * cheap even at sf0.1.
  */
class FixtureCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDirs: Seq[String] = {
    val root = new java.io.File("/root/testdata")
    Option(root.listFiles).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
  }

  /** name → loader → expected (column, dataType) in order. Timestamps
    * that downstream code requires as LTZ (watermarks, unix_millis,
    * the range-join binning rule) are pinned to TimestampType — that
    * is the contract [[Tables]] normalization exists to uphold.
    * `l_shipdate`/`o_orderdate` are pinned to the timestamp FAMILY
    * (either physical shape is fine: every consumer is
    * date-arithmetic that accepts both, and the oracle hashes are
    * exact in both shapes). */
  private val tsFamily: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val expected: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, Seq[(String, Either[Set[DataType], DataType])])] = Seq(
    ("region", Tables.region _, Seq(
      "r_regionkey" -> Right(IntegerType), "r_name" -> Right(StringType))),
    ("nation", Tables.nation _, Seq(
      "n_nationkey" -> Right(IntegerType), "n_name" -> Right(StringType),
      "n_regionkey" -> Right(IntegerType))),
    ("customer", Tables.customer _, Seq(
      "c_custkey" -> Right(LongType), "c_name" -> Right(StringType),
      "c_nationkey" -> Right(IntegerType), "c_acctbal" -> Right(DoubleType),
      "c_mktsegment" -> Right(StringType))),
    ("supplier", Tables.supplier _, Seq(
      "s_suppkey" -> Right(LongType), "s_name" -> Right(StringType),
      "s_nationkey" -> Right(IntegerType), "s_acctbal" -> Right(DoubleType))),
    ("part", Tables.part _, Seq(
      "p_partkey" -> Right(LongType), "p_name" -> Right(StringType),
      "p_brand" -> Right(StringType), "p_type" -> Right(StringType),
      "p_size" -> Right(IntegerType), "p_retailprice" -> Right(DoubleType))),
    ("orders", Tables.orders _, Seq(
      "o_orderkey" -> Right(LongType), "o_custkey" -> Right(LongType),
      "o_orderstatus" -> Right(StringType), "o_totalprice" -> Right(DoubleType),
      "o_orderdate" -> Left(tsFamily), "o_orderpriority" -> Right(StringType))),
    ("lineitem", Tables.lineitem _, Seq(
      "l_orderkey" -> Right(LongType), "l_partkey" -> Right(LongType),
      "l_suppkey" -> Right(LongType), "l_linenumber" -> Right(IntegerType),
      "l_quantity" -> Right(DoubleType), "l_extendedprice" -> Right(DoubleType),
      "l_discount" -> Right(DoubleType), "l_tax" -> Right(DoubleType),
      "l_returnflag" -> Right(StringType), "l_linestatus" -> Right(StringType),
      "l_shipdate" -> Left(tsFamily))),
    ("events", Tables.events _, Seq(
      "event_id" -> Right(LongType),
      // the load-bearing assertion: every physical shape (nanos-long,
      // LTZ micros, NTZ micros) must normalize to plain TimestampType
      "ts" -> Right(TimestampType),
      "user_id" -> Right(LongType), "event_type" -> Right(StringType),
      "value" -> Right(DoubleType), "props" -> Right(StringType))),
    ("documents", Tables.documents _, Seq(
      "doc_id" -> Right(LongType), "text" -> Right(StringType),
      "lang" -> Right(StringType), "source" -> Right(StringType),
      "n_chars" -> Right(LongType))),
    ("embeddings", Tables.embeddings _, Seq(
      "vec_id" -> Right(LongType),
      "embedding" -> Right(ArrayType(FloatType, containsNull = true)),
      "label" -> Right(IntegerType))))

  test("at least one sf fixture directory exists") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  for (dir <- sfDirs; (name, loader, cols) <- expected)
    test(s"$name normalized schema holds at ${dir.split('/').last}") {
      val schema = loader(spark, dir).schema
      assert(schema.fieldNames.toSeq == cols.map(_._1),
        s"$name columns changed: got ${schema.fieldNames.mkString(",")}")
      for ((colName, want) <- cols) {
        val got = schema(colName).dataType
        want match {
          case Right(t) => assert(got == t,
            s"$name.$colName: got $got, want $t — fixture shape changed; " +
              s"update Tables normalization FIRST, then this canary")
          case Left(fam) => assert(fam.contains(got),
            s"$name.$colName: got $got, want one of $fam")
        }
      }
    }
}
