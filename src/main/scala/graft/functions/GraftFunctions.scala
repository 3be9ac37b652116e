package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Registration + Column-level entry points for graft's native
  * expressions.
  *
  * Two paths, matching how Spark exposes engine extensions:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at
  *     session build time (the library-user path);
  *   - [[GraftFunctions.register]] at runtime (idempotent; what the
  *     operator modules call so queries work on any session the
  *     driver hands them).
  */
object GraftFunctions {
  /** Accepts array<float> too — wraps args in a cast to array<double>
    * (exact), mirroring what ImplicitCastInputTypes would do. */
  private val builder: Seq[Expression] => Expression = exprs =>
    CosineSimilarity(
      Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))

  /** Idempotent session-level registration of `cosine_sim`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), CosineSimilarity.info, builder)

  /** `cosine_sim(a, b)` as a Column (requires register() first). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}

/** For `spark.sql.extensions` — injects graft functions into every
  * session derived from the configured builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((FunctionIdentifier("cosine_sim"), CosineSimilarity.info,
      exprs => CosineSimilarity(
        Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))))
}
