package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Upsert / MERGE semantics as a batch operator. The reference is
  * append-only — re-running it duplicates every row
  * (`/root/reference/src/main.rs:117,146`: CREATE TABLE IF NOT EXISTS
  * + unconditional INSERT). A real lake pipeline needs MERGE: matched
  * keys take the source row (SCD-1 overwrite), unmatched source keys
  * insert, unmatched target keys survive.
  *
  * Expressed Spark-first as one full-outer join on the key plus
  * per-column coalesce — a single shuffle on the merge key (or zero
  * shuffles if both sides are bucketed on it, see
  * [[graft.sources.Bucketing]]). At 100 TB this is exactly the plan
  * Delta/Iceberg MERGE lowers to, minus the transaction log: the join
  * is the cost, and it scales with the usual equi-join machinery
  * (AQE skew splitting, broadcast if the source batch is small —
  * which a CDC batch usually is, so the hint below).
  */
object Upsert {

  /** SCD-1 merge: rows of `source` overwrite same-key rows of
    * `target` column-by-column; source-only keys insert; target-only
    * keys pass through. Schemas must share the key; columns are
    * aligned by name (source may carry a subset — missing source
    * columns keep the target value, and insert rows null-fill them).
    *
    * Deliberately NOT one full-outer join: full outer can't broadcast
    * (both sides can produce unmatched rows, so both must be
    * partitioned), which would shuffle the entire target. Split by
    * match class instead:
    *   - update/pass-through = LEFT join target→source, which DOES
    *     support a broadcast build of the small CDC batch — the
    *     100 TB side is never shuffled, the overlay happens at scan
    *     parallelism;
    *   - inserts = source anti-join the target's KEY COLUMN ONLY —
    *     column pruning reduces the big side's shuffle to bare keys.
    * Net data movement: target keys once, source twice. The
    * full-outer formulation moves every target BYTE; this moves ~1%.
    */
  def scd1(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val srcCols = source.columns.toSet
    val updated = target.as("t")
      .join(broadcast(source.as("s")),
        col(s"t.$key") === col(s"s.$key"), "left_outer")
      .select(target.columns.map { c =>
        if (srcCols.contains(c) && c != key)
          coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
        else col(s"t.$c").as(c)
      }.toIndexedSeq: _*)
    val targetSchema = target.schema
    val inserts = source.as("s")
      .join(target.select(col(key)).as("tk"),
        col(s"s.$key") === col(s"tk.$key"), "left_anti")
      .select(target.columns.map { c =>
        if (srcCols.contains(c)) col(s"s.$c").as(c)
        else lit(null).cast(targetSchema(c).dataType).as(c)
      }.toIndexedSeq: _*)
    updated.unionByName(inserts)
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // u01: MERGE of a synthetic CDC batch into orders — open 1998
    // orders get re-priced (+1000) and re-tagged (update path), every
    // 97th key arrives as a brand-new order (insert path), the rest
    // pass through untouched. The per-(status, priority) rollup
    // fingerprints all three paths: updates land under (U, 0-MERGED),
    // inserts under (N, 9-NEW), survivors keep their original groups.
    "u01_upsert_merge" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val updates = orders
        .filter(col("o_orderstatus") === "O" &&
          year(col("o_orderdate")) === 1998)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
          col("o_orderdate"),
          lit("0-MERGED").as("o_orderpriority"))
      val inserts = orders
        .filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"),
          lit("9-NEW").as("o_orderpriority"))
      scd1(orders, updates.unionByName(inserts), "o_orderkey")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    })
  )

  val oracle: Map[String, String] = Map(
    "u01_upsert_merge" -> """
      WITH updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
               '0-MERGED' AS o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'O' AND EXTRACT(YEAR FROM o_orderdate) = 1998),
      inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
               'N' AS o_orderstatus, o_totalprice, o_orderdate,
               '9-NEW' AS o_orderpriority
        FROM orders WHERE o_orderkey % 97 = 0),
      src AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts),
      merged AS (
        SELECT COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
               COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
               COALESCE(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
        FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey)
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM merged GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
