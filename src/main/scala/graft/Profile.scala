package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing loop: runs the named queries twice (cold, warm)
  * against SPARK_GRAFT_SF_DIR with the same session config as Bench.
  * `sbt "runMain graft.Profile d02_dedup_minhash d04_ngram_jaccard"` */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.sql.autoBroadcastJoinThreshold", "4m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.rangeJoin.binSeconds", "3600")
      // Align whole-stage-codegen fallback with HotSpot's 8000-bytecode
      // JIT ceiling (DontCompileHugeMethods): a fused method over this
      // size would never be JIT-compiled and runs interpreted at 10-50x.
      // Falling back to per-operator execution keeps codegen'd
      // projections AND JIT-able method sizes. SPARK-21871's knob.
      .config("spark.sql.codegen.hugeMethodLimit", "4000")
      // Split generated expression code into ~256-byte-estimate methods
      // (default 1024): keeps every generated method far below HotSpot's
      // compile ceiling so the JIT always wins; fat methods (decimal
      // money math) otherwise sat in a dead zone where C2 sometimes
      // never compiled them and a 200k-row task burned minutes in the
      // interpreter (observed in Decimal.changePrecision).
      .config("spark.sql.codegen.methodSplitThreshold", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    for (name <- names; run <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name%-24s run$run ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
