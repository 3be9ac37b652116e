package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's artifact capture keeps only the last ~2000 chars of
  * Bench stdout — BENCH_r05 lost half its per-query record that way.
  * These pin the compact stdout twin: every query must survive under
  * a unique short id, and the whole line must fit the capture window.
  */
class BenchCompactSpec extends AnyFunSuite {

  test("compact keeps every query under its unique short id and fits 2000 chars") {
    // synthesize a full-size line: every registered query at full precision
    val names = SparkEntry.queries.keys.toSeq.sorted
    val full = names.zipWithIndex
      .map { case (n, i) => s""""$n":${1.0 + i * 0.037}""" }
      .mkString(
        """{"metric":"total","value":999.0,"unit":"sec","queries":{""",
        ",",
        """},"failed":["q51_sole_blame_supplier"],"sf":"/root/testdata/sf0.1"}""")
    val c = Bench.compact(full, "/root/repo/BENCH_FULL.json")
    assert(c.length <= 2000, s"compact line is ${c.length} chars")
    // every query survives as its unique prefix id
    val shortIds = names.map(_.takeWhile(ch => ch.isLetter || ch.isDigit))
    assert(shortIds.distinct.size === names.size) // prefixes are unique
    shortIds.foreach(id => assert(c.contains(s""""$id":"""), s"missing $id"))
    assert(c.contains(s""""n":${names.size}"""))
    assert(c.contains(""""failed":["q51_sole_blame_supplier"]"""))
    assert(c.contains(""""sf":"/root/testdata/sf0.1""""))
  }
}
