package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Relational sink — the reference's whole reason to exist
  * (`/root/reference/src/main.rs:120-151`): batched, concurrent
  * `INSERT`s into Postgres.
  *
  * The reference shape: ≤10 concurrent insert tasks (semaphore,
  * `src/main.rs:68`), 1000-row multi-row INSERT statements
  * (`src/main.rs:74,126-149`), pooled connections (`src/main.rs:65`).
  * Spark's JDBC writer preserves exactly that shape distributed:
  * one connection per partition (`numPartitions` = the semaphore),
  * `batchsize` rows per prepared-statement batch, `CREATE TABLE`
  * emitted from the dialect mapping. At cluster scale the same call
  * fans out over executors; the DB-side concurrency cap stays
  * `numPartitions`, which is the knob that matters at 1000 executors.
  *
  * No Postgres JDBC driver jar ships in this offline image (SURVEY
  * §7.1), but Spark's own embedded Derby does: RelationalSinkSpec
  * executes this sink LIVE against `jdbc:derby:memory:` — real DDL,
  * real batched inserts, read-back verified. That live run is what
  * caught the createTableColumnTypes dialect bug (see
  * SchemaMapper.sparkDdlType). [[ParquetSink]] remains the bulk-test
  * sink through the same trait.
  */
trait RelationalSink {
  def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Append): Unit
}

/** Postgres/JDBC sink with the reference's knobs as defaults:
  * batch 1000 (`src/main.rs:74`), fan-out 10 (`src/main.rs:68`).
  *
  * Option construction and partition bounding are factored into
  * [[JdbcSink.writerOptions]] / [[JdbcSink.bounded]] so the exact
  * contract handed to `.jdbc()` is unit-testable in isolation, and
  * the whole path also executes LIVE against embedded Derby in
  * RelationalSinkSpec — covering reference ops #4/#6/#8
  * (`/root/reference/src/main.rs:60-72,146-149`) with a real
  * database despite the offline image.
  */
final class JdbcSink(url: String, props: java.util.Properties,
                     batchSize: Int = 1000, numPartitions: Int = 10)
    extends RelationalSink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit = {
    // DuckDB's driver reports no SQLState, so without a registered
    // dialect Spark's table-existence probe rethrows and kills the
    // write (see DuckDbDialect). Registration is idempotent and a
    // no-op for every other URL scheme.
    if (url.startsWith("jdbc:duckdb:")) DuckDbDialect.ensureRegistered()
    var w = JdbcSink.bounded(df, numPartitions).write.mode(mode)
    JdbcSink.writerOptions(df.schema, batchSize).foreach { case (k, v) =>
      w = w.option(k, v)
    }
    w.jdbc(url, table, props)
  }
}

object JdbcSink {
  /** The exact option map the JDBC writer receives: multi-row batch
    * size (reference `src/main.rs:74`) and the dialect DDL types from
    * SchemaMapper (reference `generate_create_table_sql`). */
  def writerOptions(schema: org.apache.spark.sql.types.StructType,
                    batchSize: Int = 1000): Map[String, String] =
    Map(
      "batchsize" -> batchSize.toString,
      "createTableColumnTypes" -> SchemaMapper.createTableColumnTypes(schema))

  /** Caps concurrent DB connections exactly like the reference's
    * `Semaphore::new(10)` capped in-flight inserts: one JDBC
    * connection per partition, so ≤ numPartitions connections
    * regardless of cluster parallelism. Unconditional `coalesce`:
    * it is already a planning no-op on an input at or under the cap
    * (coalesce never widens), so no partition-count probe is needed —
    * probing via `df.rdd` would force a second physical planning of
    * the whole lineage just to learn a number the operator ignores. */
  def bounded(df: DataFrame, numPartitions: Int = 10): DataFrame =
    df.coalesce(numPartitions)
}

/** Test/offline sink: same trait, parquet directory instead of a DB. */
final class ParquetSink(baseDir: String) extends RelationalSink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(s"$baseDir/$table")
}
