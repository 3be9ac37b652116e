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
    // Spark-parseable types (the option goes through Spark's parser);
    // the PG dialect renders them as TEXT/NUMERIC/TIMESTAMPTZ on the wire
    assert(opts == Map(
      "batchsize" -> "1000",
      "createTableColumnTypes" ->
        ("id BIGINT, name STRING, price DECIMAL(12,2), " +
          "created TIMESTAMP, flags SMALLINT")))
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

  test("LIVE JDBC round-trip: DDL + batched inserts + read-back against embedded Derby") {
    // No Postgres driver ships offline, but Spark's own Derby jars do —
    // an embedded in-memory Derby database executes the REAL JdbcSink
    // path end to end: CREATE TABLE from createTableColumnTypes,
    // multi-row prepared-statement batches, connection fan-out capped
    // by coalesce, then spark.read.jdbc verification. Column choice is
    // deliberately string/timestamp-free: SchemaMapper emits the
    // Postgres dialect (TEXT/TIMESTAMPTZ), and BIGINT / DOUBLE
    // PRECISION are the portable subset Derby also accepts.
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val url = "jdbc:derby:memory:graftlive;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // batch 300 over ~1500 rows and 3 connections → several batches
    // per partition, exercising the reference's batching shape live
    new JdbcSink(url, props, batchSize = 300, numPartitions = 3)
      .write(df, "orders_live", org.apache.spark.sql.SaveMode.Overwrite)
    val back = spark.read.jdbc(url, "orders_live", props)
    val (nIn, sumIn) = df.agg(count(lit(1)), sum(col("o_totalprice")))
      .as[(Long, Double)](spark.implicits.newProductEncoder).head()
    val (nOut, sumOut) = back.agg(count(lit(1)), sum(col("o_totalprice")))
      .as[(Long, Double)](spark.implicits.newProductEncoder).head()
    assert(nOut === nIn && nIn > 0)
    assert(math.abs(sumOut - sumIn) < 1e-6)
    // key set survives exactly
    assert(back.select("o_orderkey").except(df.select("o_orderkey")).count() === 0)
    assert(df.select("o_orderkey").except(back.select("o_orderkey")).count() === 0)
  }

  test("DuckDbDialect classifies the catalog-miss probe exception (and only that)") {
    // Spark 4.x rethrows the tableExists probe unless the dialect says
    // "object not found"; DuckDB raises `Catalog Error: Table with name
    // t does not exist!` with a null SQLState.
    assert(DuckDbDialect.canHandle("jdbc:duckdb:/tmp/x.db"))
    assert(!DuckDbDialect.canHandle("jdbc:derby:memory:g"))
    assert(DuckDbDialect.isObjectNotFoundException(
      new java.sql.SQLException("Catalog Error: Table with name orders_live does not exist!")))
    assert(!DuckDbDialect.isObjectNotFoundException(
      new java.sql.SQLException("Constraint Error: Duplicate key violates primary key constraint")))
    assert(!DuckDbDialect.isObjectNotFoundException(new java.sql.SQLException()))
  }

  test("LIVE JDBC round-trip #2: DuckDB file database (second real dialect)") {
    // build.sbt globs the offline cache's duckdb_jdbc jar onto the test
    // classpath when present; this leg then runs the SAME JdbcSink path
    // against a second real database engine — different SQL dialect,
    // different driver, file-backed storage. Cancels (visible in the
    // report, not silently green) on images without the jar.
    assume(scala.util.Try(Class.forName("org.duckdb.DuckDBDriver")).isSuccess,
      "duckdb_jdbc jar absent from the offline cache")
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val db = java.nio.file.Files.createTempDirectory("graft_duck").resolve("live.db")
    val url = s"jdbc:duckdb:$db"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.duckdb.DuckDBDriver")
    val df = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // One connection by design: DuckDB transactions are optimistically
    // concurrent and cross-connection appends to one table can raise
    // write-write conflicts — the fan-out shape is live-tested on the
    // Derby leg above; THIS leg adds dialect + driver diversity.
    new JdbcSink(url, props, batchSize = 300, numPartitions = 1)
      .write(df, "orders_live", org.apache.spark.sql.SaveMode.Overwrite)
    val back = spark.read.jdbc(url, "orders_live", props)
    val (nIn, sumIn) = df.agg(count(lit(1)), sum(col("o_totalprice")))
      .as[(Long, Double)](spark.implicits.newProductEncoder).head()
    val (nOut, sumOut) = back.agg(count(lit(1)), sum(col("o_totalprice")))
      .as[(Long, Double)](spark.implicits.newProductEncoder).head()
    assert(nOut === nIn && nIn > 0)
    assert(math.abs(sumOut - sumIn) < 1e-6)
    assert(back.select("o_orderkey").except(df.select("o_orderkey")).count() === 0)
    assert(df.select("o_orderkey").except(back.select("o_orderkey")).count() === 0)
  }
}
