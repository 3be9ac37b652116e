package graft.sources

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Minimal DuckDB dialect so Spark's JDBC writer can probe table
  * existence against `jdbc:duckdb:` URLs.
  *
  * Spark 4.x `JdbcUtils.tableExists` runs `SELECT 1 FROM t WHERE 1=0`
  * and rethrows the probe exception UNLESS the dialect's
  * `isObjectNotFoundException` classifies it as "object not found".
  * DuckDB's JDBC driver reports no SQLState, so the default dialect
  * can't classify `Catalog Error: Table with name t does not exist!`
  * and an `Overwrite` write of a brand-new table dies inside the
  * existence probe. This dialect closes exactly that gap — everything
  * else (type mapping, identifier quoting) stays at the sane defaults,
  * which DuckDB's ANSI-ish SQL surface accepts.
  *
  * Mirrors the reference's DDL-then-insert contract
  * (`/root/reference/src/main.rs:71-72,149`) on a second real engine;
  * exercised live by RelationalSinkSpec's DuckDB round-trip.
  */
object DuckDbDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:duckdb:")

  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val msg = Option(e.getMessage).getOrElse("")
    // Tight match on DuckDB's table-miss shape ("Catalog Error: Table
    // with name t does not exist!") plus the schema-miss shape a
    // schema-qualified target raises from the same existence probe
    // ("Catalog Error: Schema with name s does not exist!") — both
    // mean "the write target isn't there". A loose "does not exist"
    // would also classify column/sequence misses as table-not-found,
    // sending Spark down CREATE TABLE and masking the real error.
    msg.contains("Catalog Error") && msg.contains("does not exist") &&
      (msg.contains("Table with name") || msg.contains("Schema with name"))
  }

  /** Idempotent: Spark keeps a registration list; re-registering the
    * same singleton is harmless, so callers can invoke this freely
    * before any duckdb read/write. */
  def ensureRegistered(): Unit = DuckDbDialect.synchronized {
    JdbcDialects.unregisterDialect(DuckDbDialect)
    JdbcDialects.registerDialect(DuckDbDialect)
  }
}
