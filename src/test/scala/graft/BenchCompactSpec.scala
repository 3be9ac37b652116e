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

  test("compact degrades to deciseconds when centiseconds would overflow " +
      "the capture window, and every id still survives") {
    // the surface keeps growing while the capture window does not:
    // when centisecond values would overflow, the stdout twin degrades
    // to deciseconds, then to whole seconds (full precision stays in
    // BENCH_FULL.json / the spread-carrying BENCH_COMPACT.json, which
    // never degrades). The seconds tier is nearly value-free but keeps
    // the twin's real contract — ids + total + failed surviving the
    // tail capture whole; its envelope shape supports ~240 ids — past
    // that the stdout twin needs a different channel, not more trim.
    val names = SparkEntry.queries.keys.toSeq.sorted ++
      (1 to 12).map(i => f"z$i%02d_synthetic_growth")
    val full = names.zipWithIndex
      .map { case (n, i) => s""""$n":${1.0 + i * 0.037}""" }
      .mkString(
        """{"metric":"total","value":999.0,"unit":"sec","queries":{""",
        ",",
        """},"failed":[],"sf":"/root/testdata/sf0.1"}""")
    val c = Bench.compact(full, "/root/repo/BENCH_FULL.json")
    assert(c.length <= 2000, s"compact line is ${c.length} chars")
    names.foreach { n =>
      val id = n.takeWhile(ch => ch.isLetter || ch.isDigit)
      assert(c.contains(s""""$id":"""), s"missing $id")
    }
  }

  test("past the whole-second ceiling the stdout twin becomes a digest " +
      "(count+total+failed+top10) and still fits 2000 chars at 250 ids") {
    // the per-id envelope supports ~240 ids even at whole seconds; the
    // r11 verdict flagged that the surface hits that next — past the
    // ceiling the per-query map is ELIDED to the 10 slowest (the
    // plan-regression signal) and the full record stays in
    // BENCH_FULL/BENCH_COMPACT, which never degrade
    val names = (1 to 250).map(i => f"z$i%03d_synthetic_growth_padding")
    val full = names.zipWithIndex
      .map { case (n, i) => s""""$n":${1.0 + i * 0.037}""" }
      .mkString(
        """{"metric":"total","value":999.0,"unit":"sec","queries":{""",
        ",",
        """},"failed":["z007_synthetic_growth_padding"],"sf":"/root/testdata/sf0.1"}""")
    val c = Bench.compact(full, "/root/repo/BENCH_FULL.json")
    assert(c.length <= 2000, s"digest line is ${c.length} chars")
    assert(c.contains(""""n":250"""), c)
    // elided counts only what top10 does NOT carry: 250 − 10 (the
    // ADVICE self-consistency fix — n stays the total)
    assert(c.contains(""""queries_elided":240"""), c)
    assert(c.contains(""""failed":["z007_synthetic_growth_padding"]"""), c)
    assert(c.contains(""""full":"/root/repo/BENCH_FULL.json""""), c)
    // the 10 slowest survive as the top10 map — here the highest
    // indices carry the largest synthetic values
    assert(c.contains(""""top10":{"z250":"""), c)
    assert(c.contains(""""z241":"""), c)
    assert(!c.contains(""""z001":"""), c)
    // the FILE variant never degrades: same 250-id line with spread
    // stays a full per-query map
    val withSp = Bench.compact(full, "/root/repo/BENCH_FULL.json",
      withSpread = true)
    assert(withSp.contains(""""z001":"""), "file variant lost per-query map")
  }

  test("compact file variant carries per-query draw spread; stdout variant stays slim") {
    // the BENCH_COMPACT.json FILE records each query's [min,max] draw
    // spread (noise vs plan-regression separation without the log
    // tail); the stdout twin must NOT — 127 extra pairs would blow the
    // ~2000-char capture window
    val full =
      """{"metric":"total","value":3.0,"unit":"sec","queries":{"q01_pricing_summary":1.25,"c14_bloom_decontaminate":1.75},""" +
        """"failed":[],"errors":{},""" +
        """"spread":{"q01_pricing_summary":[1.25,1.311],"c14_bloom_decontaminate":[1.75,4.02]},""" +
        """"sf":"/root/testdata/sf0.1"}"""
    val withSp = Bench.compact(full, "/x/BENCH_FULL.json", withSpread = true)
    assert(withSp.contains(""""spread":{"q01":[1.25,1.31],"c14":[1.75,4.02]}"""), withSp)
    assert(withSp.contains(""""q01":1.25"""), withSp)
    val noSp = Bench.compact(full, "/x/BENCH_FULL.json")
    assert(!noSp.contains("spread"), noSp)
    // a pre-spread line (old artifact replayed) must not break either variant
    val old = full.replace(""""spread":{"q01_pricing_summary":[1.25,1.311],"c14_bloom_decontaminate":[1.75,4.02]},""", "")
    assert(!Bench.compact(old, "/x/f.json", withSpread = true).contains("spread"))
  }

  test("objectEnd bounds the errors scan despite braces/escapes in messages") {
    // a message containing '{', '}', an escaped quote, AND a later
    // string field whose key collides with a query name must not leak
    // into the merge window — the scan stops at the errors object's
    // own closing brace
    val line =
      """{"queries":{"q01_x":1.0},"failed":["q01_x"],""" +
        """"errors":{"q01_x":"boom {nested} \" [x]"},""" +
        """"note":"q01_x looks like an error but is not","sf":"/tmp"}"""
    val eIdx = line.indexOf("\"errors\":")
    val eEnd = Bench.objectEnd(line, eIdx + 9)
    val window = line.substring(eIdx + 9, eEnd)
    assert(window.endsWith("}"))
    assert(window.contains("boom {nested}"))
    assert(!window.contains("note"), window)
    assert(!window.contains("looks like an error"), window)
    // unbalanced input degrades to scan-to-end, never throws
    val unbalanced = """{"a":"b"""
    assert(Bench.objectEnd(unbalanced, 0) == unbalanced.length)
  }

  test("compact tolerates the errors object (messages with brackets/escapes)") {
    // a failed query's message may contain ']', '}', escaped quotes —
    // compact's positional parsing (brace-match on queries, first ']'
    // for failed, indexOf for sf) must not be derailed because errors
    // sits AFTER failed and BEFORE sf in the envelope
    val full =
      """{"metric":"total","value":9.9,"unit":"sec","queries":{"q01_pricing_summary":1.25,"st05_stateful_user_totals":0.1},""" +
        """"failed":["st05_stateful_user_totals"],""" +
        """"errors":{"st05_stateful_user_totals":"AnalysisException: [DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE] unix_millis(ts) \" [x] {y}"},""" +
        """"sf":"/root/testdata/sf0.1"}"""
    val c = Bench.compact(full, "/root/repo/BENCH_FULL.json")
    assert(c.contains(""""q01":1.25"""), c)
    assert(c.contains(""""st05":0.1"""), c) // trailing zero trimmed
    assert(c.contains(""""failed":["st05_stateful_user_totals"]"""), c)
    assert(c.contains(""""sf":"/root/testdata/sf0.1""""), c)
    assert(c.contains(""""n":2"""), c)
  }
}
