package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line of per-query seconds.
  *
  * The session config is tuned for what this actually is — a 32-core
  * single-JVM box replaying ~50 heterogeneous queries back to back —
  * and each knob documents how it would differ on a real cluster.
  * The through-line of every setting: keep ALL generated code small
  * enough that HotSpot reliably JIT-compiles it, and never let a
  * planner heuristic serialize a stage onto one thread.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE OFF for the local 45-query single-JVM benchmark, ON for a
      // real cluster. AQE re-optimizes and re-CODEGENS every query
      // stage: across 45 heterogeneous queries that multiplies the
      // distinct generated classes ~4x, and the class churn flushes
      // HotSpot inline caches (observed: ICBufferFull safepoint storms,
      // shared Spark hot paths deoptimized to the interpreter, the
      // same query 5s or 150s depending on where in the run it fell —
      // full-suite totals 460-860s vs 154s with AQE off). Locally AQE
      // also has nothing left to decide: join strategies are hinted
      // explicitly (broadcast()/shuffle_hash), partitions are fixed at
      // core count, and fixture-scale skew is nil. On a 1000-executor
      // cluster the codegen cost amortizes over GB-scale stages and
      // skew/coalescing matter — set SPARK_GRAFT_AQE=true there.
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      // AQE partition coalescing targets 64 MB partitions BY BYTES.
      // The fixtures are single-digit-MB but CPU-dense (hashing,
      // signatures, similarity math), so coalescing collapses every
      // shuffle to 1-2 partitions and serializes the compute on a
      // 32-core box (observed: the same query 5s or 45s depending on
      // which side of the stats threshold a run landed). Keep the
      // shuffle at spark.sql.shuffle.partitions = cores locally; on a
      // real cluster with GB-scale shuffles coalescing earns its keep
      // and would stay on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 4m, deliberately BELOW Spark's 10m default: a broadcast hash
      // relation is built on ONE thread, so a "small" 600k-row side
      // that sneaks under a fat threshold serializes the whole stage
      // (observed: q04 28s from broadcasting projected lineitem).
      // True dims (region/nation/customer/part/supplier) are far under
      // 4m at any bench SF; genuinely-small intermediates are hinted
      // with broadcast() at the query site instead.
      .config("spark.sql.autoBroadcastJoinThreshold", "4m")
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
      // dev-only: SPARK_GRAFT_EVENTLOG=true dumps per-stage metrics
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once on the smallest SF so the first timed
    // query doesn't also pay first-call framework classloading. ONE
    // query only — a full warm-up sweep was tried and made things
    // WORSE (doubling the generated-class population re-triggered the
    // inline-cache churn the session config exists to avoid).
    // ONE query only. Warming more was tried twice and regressed both
    // times (full sweep: 428 s; just the dedup trio at sf0.001: 413 s
    // vs 137 s control) — every extra pre-warmed plan's generated
    // classes deepen the inline-cache churn the session config exists
    // to avoid, and the damage lands on UNRELATED queries mid-suite.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "true") == "true")
      try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // optional args = subset of query names to time (dev loop)
    val names = (if (args.isEmpty) SparkEntry.queries.keys.toSeq
      else SparkEntry.queries.keys.toSeq.filter(args.toSet)).sorted
    var failed = List.empty[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
