ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquet_to_postgresspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The image's offline maven cache happens to carry a DuckDB JDBC jar.
// Glob it onto the TEST classpath when present — NOT a resolvable
// dependency (zero-egress build stays green when it's absent) — so
// RelationalSinkSpec can drive the live JdbcSink path against a second
// real external database beyond Spark's embedded Derby. No Postgres
// driver jar exists anywhere on this image (verified by full-disk
// find), so the PG leg itself remains deployment-only (SURVEY §7.1).
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  (cache ** "duckdb_jdbc-*.jar").get().map(Attributed.blank(_))
}
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Headroom for the per-query generated classes of a 45-query run;
  // the default 240m is enough but leaves little margin once JIT'd
  // application code piles on top. (Huge-method handling is done the
  // Spark way instead: spark.sql.codegen.hugeMethodLimit=8000 in the
  // session config — forcing HotSpot to compile 8000+-bytecode
  // monsters with -XX:-DontCompileHugeMethods stalls the C2 queue for
  // minutes and everything behind it runs interpreted.)
  "-XX:ReservedCodeCacheSize=512m",
  // (Tried and rejected: -XX:PerMethod/PerBytecodeRecompilationCutoff=-1
  // — the "method made permanently not-compilable after 400 deopts"
  // hypothesis. Measured 207 s and a mid-suite degradation band on
  // back-to-back full runs, i.e. the same lottery as default flags.
  // The actual fix is structural: Bench isolates query families into
  // child JVMs so no single code cache hosts all ~65 plans.)
) ++ sys.env.get("SPARK_GRAFT_JVMLOG").toSeq.map(f =>
  s"-Xlog:safepoint=info:file=$f:time,uptime"
) ++ Seq(
  // local[32] is driver+executors in ONE JVM: size the heap like the
  // sum of a small cluster's executors, not like a driver. 8g caused
  // cross-query full-GC drag in long Bench runs (341s -> ~100s total).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
