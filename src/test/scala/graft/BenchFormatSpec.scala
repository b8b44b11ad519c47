package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last ~2000 chars of bench stdout (every
  * BENCH_r01-r10 artifact is a truncated tail with parsed:null), so
  * the compact line Bench prints last must stay parseable inside that
  * window — against the REAL query set, at worst-case value widths,
  * with room for sbt's "[success] Total time: ..." trailer. This spec
  * fails the build the moment a future round's query additions would
  * silently overflow the window or collide a short key. */
class BenchFormatSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("short keys are collision-free over the declared query set") {
    def shortKey(n: String) =
      n.split('_')(0).stripPrefix("q") + (if (n.endsWith("_sql")) "s" else "")
    val keys = names.map(shortKey)
    val dup = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"short-key collisions (compact line would fall " +
      s"back to full names and overflow the window): ${dup.take(5)}")
  }

  test("compact line fits the 2000-char capture window at worst-case widths") {
    // worst case: fmt() is unbounded above 100 s, so certify the widest
    // rendering a real suite could plausibly hit — four digits before
    // the point per median ("9999.9" at %.1f), total likewise
    val line = Bench.compactJson(names.map(n => (n, 9999.9)), 9999.9,
      "/root/testdata/sf0.1", cpuSlow = true, contended = true,
      normValue = Some(9999.9), parSlow = true)
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.length <= 1900,
      s"compact line ${line.length} B leaves <100 B for the sbt trailer " +
        "inside the 2000-char capture window — shorten keys or drop a field")
    // shape check without a JSON lib: balanced braces, the fields the
    // driver contract names, and no unescaped newline
    assert(line.count(_ == '{') == line.count(_ == '}'))
    Seq("\"metric\":", "\"value\":", "\"unit\":\"sec\"", "\"queries\":", "\"sf\":",
        "\"fl\":\"SPC\"", "\"norm\":")
      .foreach(f => assert(line.contains(f), s"missing $f"))
    assert(!line.contains("\n"))
    assert(line.count(_ == ':') >= names.size + 5)
  }
}
