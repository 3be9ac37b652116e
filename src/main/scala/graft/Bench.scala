package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line of per-query seconds.
  * Config mirrors what we'd set on a real cluster: AQE on (runtime
  * re-plan, skew-join splitting, partition coalescing), shuffle
  * partitions sized to cores rather than the 200 default.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // The fixtures are single-digit-MB but CPU-dense (hashing,
      // signatures, array math), so byte-based coalescing to ~1
      // partition would serialize the compute; let AQE keep small
      // partitions. At cluster scale shuffles are GBs and this floor
      // is inert.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once on the smallest SF so per-query numbers
    // measure the plan, not first-call JIT + classloading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // optional args = subset of query names to time (dev loop)
    val selected = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    var failed = List.empty[String]
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
