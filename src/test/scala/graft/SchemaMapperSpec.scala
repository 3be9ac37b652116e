package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.SchemaMapper

class SchemaMapperSpec extends AnyFunSuite {

  // The §1.3 DDL table done right — including the types the reference
  // mishandled (SURVEY §1.4: Int16/Date/Timestamp fell into the TEXT
  // fallback at /root/reference/src/main.rs:113 and then failed at
  // insert time).
  val expected: Seq[(DataType, String)] = Seq(
    BooleanType -> "BOOLEAN",
    ShortType -> "SMALLINT",
    IntegerType -> "INT",
    LongType -> "BIGINT",
    FloatType -> "REAL",
    DoubleType -> "DOUBLE PRECISION",
    StringType -> "TEXT",
    BinaryType -> "BYTEA",
    DateType -> "DATE",
    TimestampType -> "TIMESTAMPTZ",
    TimestampNTZType -> "TIMESTAMP",
    DecimalType(10, 2) -> "NUMERIC(10,2)",
    ArrayType(FloatType) -> "REAL[]",
    MapType(StringType, LongType) -> "JSONB",
    StructType(Seq(StructField("a", IntegerType))) -> "JSONB")

  test("every Parquet-representable Spark type maps to a faithful PG type") {
    expected.foreach { case (dt, ddl) => assert(SchemaMapper.pgType(dt) === ddl) }
  }

  test("createTableSql mirrors the reference's CREATE TABLE IF NOT EXISTS shape") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    assert(SchemaMapper.createTableSql("flights", schema) ===
      """CREATE TABLE IF NOT EXISTS flights ("id" BIGINT NOT NULL, "name" TEXT)""")
  }

  test("createTableColumnTypes covers every field, in Spark-parseable types") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", DoubleType)))
    // Spark parses this option itself; the dialect maps DOUBLE →
    // DOUBLE PRECISION on the PG wire (see sparkDdlType scaladoc)
    assert(SchemaMapper.createTableColumnTypes(schema) === "a INT, b DOUBLE")
  }
}
