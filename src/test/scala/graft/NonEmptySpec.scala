package graft

import org.scalatest.funsuite.AnyFunSuite

/** Anti-vacuity gate: every registered query must return rows at the
  * smallest fixture SF. A 0-row result that equals a 0-row oracle
  * "passes" the driver's hash compare while proving nothing (it
  * happened to d04 and q07 in round 2) — this spec turns that silent
  * hole into a loud test failure the moment a predicate goes vacuous.
  */
class NonEmptySpec extends AnyFunSuite {

  /** Queries allowed to be empty at sf0.001, each with a reason.
    * (Currently none — keep it that way.) */
  private val allowedEmpty: Set[String] = Set.empty

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      val df = fn(TestSpark.spark, TestSpark.sf0001)
      if (!allowedEmpty(name))
        assert(!df.isEmpty, s"$name returned 0 rows at sf0.001 — vacuous gate")
    }
  }
}
