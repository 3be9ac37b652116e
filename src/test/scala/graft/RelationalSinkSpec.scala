package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

/** Offline-max coverage for the live-JDBC reference ops #4/#6/#8
  * (`/root/reference/src/main.rs:60-72,146-149`): no Postgres driver
  * jar ships in this image, so instead of executing against a DB these
  * pin the EXACT contract `JdbcSink` hands to Spark's JDBC writer —
  * the batch size, the connection-fanout bound, and the DDL type
  * string. If any of those drift, the live path would too.
  */
class RelationalSinkSpec extends AnyFunSuite {

  test("writerOptions carries the reference's batchsize=1000 and the SchemaMapper DDL") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("price", DecimalType(12, 2)),
      StructField("created", TimestampType),
      StructField("flags", ShortType)))
    val opts = JdbcSink.writerOptions(schema) // defaults = reference knobs
    assert(opts == Map(
      "batchsize" -> "1000",
      "createTableColumnTypes" ->
        ("id BIGINT, name TEXT, price NUMERIC(12,2), " +
          "created TIMESTAMPTZ, flags SMALLINT")))
  }

  test("bounded caps a wide write at 10 partitions (the reference's semaphore) without shuffling") {
    val spark = TestSpark.spark
    val wide = spark.range(0, 1000, 1, 32).toDF("id")
    val capped = JdbcSink.bounded(wide)
    assert(capped.rdd.getNumPartitions == 10)
    // coalesce, not repartition: the cap must not introduce an exchange
    assert(!capped.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bounded leaves an already-thin write untouched") {
    val spark = TestSpark.spark
    val thin = spark.range(0, 10, 1, 4).toDF("id")
    assert(JdbcSink.bounded(thin).rdd.getNumPartitions == 4)
  }
}
