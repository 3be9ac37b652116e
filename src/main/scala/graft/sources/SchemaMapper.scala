package graft.sources

import org.apache.spark.sql.types._

/** Spark schema → PostgreSQL DDL mapping — the reference's
  * `generate_create_table_sql` (`/root/reference/src/main.rs:104-118`)
  * done right.
  *
  * The reference maps only {Boolean, Int32, Int64, Float32/64, Utf8}
  * and falls back to TEXT for everything else (`src/main.rs:113`),
  * which combined with its value map makes Int16/Date/Timestamp columns
  * fail at insert time (SURVEY §1.4 — a latent bug we deliberately do
  * NOT port). Here every Spark type that can appear from a Parquet
  * footer gets a faithful Postgres type, including the decimal,
  * date/time, binary and nested types the reference lacks
  * (`src/main.rs:153-210` has no such arms).
  */
object SchemaMapper {

  /** One column's DDL type. Nested types map to Postgres-idiomatic
    * representations (array for 1-D arrays, JSONB for struct/map) —
    * strictly wider than the reference's TEXT fallback.
    */
  def pgType(dt: DataType): String = dt match {
    case BooleanType            => "BOOLEAN"
    case ByteType               => "SMALLINT" // PG has no 1-byte int
    case ShortType              => "SMALLINT" // ref widened to INT at src/main.rs:162
    case IntegerType            => "INT"      // src/main.rs:109
    case LongType               => "BIGINT"   // src/main.rs:110
    case FloatType              => "REAL"     // ref lossy-merged F32/F64 to FLOAT (src/main.rs:111)
    case DoubleType             => "DOUBLE PRECISION"
    case d: DecimalType         => s"NUMERIC(${d.precision},${d.scale})"
    case StringType             => "TEXT"     // src/main.rs:112
    case BinaryType             => "BYTEA"
    case DateType               => "DATE"     // ref emitted raw day-counts (src/main.rs:192)
    case TimestampType          => "TIMESTAMPTZ"
    case TimestampNTZType       => "TIMESTAMP"
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "INTERVAL"
    case ArrayType(elem, _)     => s"${pgType(elem)}[]"
    case _: StructType | _: MapType => "JSONB"
    case other                  => "TEXT"     // ref fallback (src/main.rs:113)
  }

  /** `CREATE TABLE IF NOT EXISTS` DDL for a whole schema — the
    * reference's only generated statement (`src/main.rs:104-118`).
    * Nullability is carried through (the reference ignored null
    * bitmaps entirely, `src/main.rs:157` et al.).
    */
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"\"${f.name}\" ${pgType(f.dataType)}$notNull"
    }
    s"CREATE TABLE IF NOT EXISTS $table (${cols.mkString(", ")})"
  }

  /** The DDL-override type Spark's JDBC writer will accept for a
    * column. `createTableColumnTypes` is parsed by SPARK's SQL parser
    * (not the database's): the value must be a valid Spark SQL type,
    * which the JDBC dialect then translates to the target database's
    * DDL — for PostgresDialect, STRING → TEXT, DOUBLE → DOUBLE
    * PRECISION, DECIMAL → NUMERIC: exactly [[pgType]]'s intent.
    * (Caught LIVE by the embedded-Derby round-trip in
    * RelationalSinkSpec: the earlier pgType-valued option string —
    * TEXT / TIMESTAMPTZ / DOUBLE PRECISION — fails Spark's parser on
    * any real `.jdbc()` execute with PARSE_SYNTAX_ERROR, a bug the
    * offline option-map assertions could never see.)
    */
  def sparkDdlType(dt: DataType): String = dt match {
    case ByteType   => "SMALLINT" // keep the PG-shaped widening
    case ShortType  => "SMALLINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    // every other scalar/nested type: Spark's own DDL name round-trips
    // through the parser and the dialect unchanged
    case other      => other.sql
  }

  /** Spark-side value for `createTableColumnTypes` on `df.write.jdbc`:
    * Spark-parseable types whose dialect translation reproduces
    * [[pgType]]'s mapping on PostgreSQL.
    */
  def createTableColumnTypes(schema: StructType): String =
    schema.fields.map(f => s"${f.name} ${sparkDdlType(f.dataType)}").mkString(", ")
}
