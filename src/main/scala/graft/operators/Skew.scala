package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles most cases at
  * runtime (enabled in Bench/Verify sessions); explicit salting is the
  * deterministic fallback for pathological producers — e.g. a 100 TB
  * fact table where one key holds 10% of rows.
  */
object Skew {

  /** Salted inner equi-join: the large/skewed side gets a salt in
    * [0, saltFactor) derived from a per-row hash, the small side is
    * replicated saltFactor times, and the join key becomes
    * (key, salt) — splitting each hot key's rows across saltFactor
    * reducers. Semantically identical to `large.join(small, key)`
    * (verified in SkewSpec); costs a saltFactor× blowup of the small
    * side, so keep it for genuinely skewed shuffles.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic variant when a stable salt matters (retries,
    * speculative tasks): salt from the row's own columns. */
  def saltedJoinDeterministic(large: DataFrame, small: DataFrame, key: String,
                              saltCols: Seq[Column], saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(saltFactor.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
