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
    // fmt() renders a flat 5-char median at ANY magnitude, so the line
    // length is set by suite SIZE, not value widths. Past ~150 entries
    // the full map no longer fits; compactJson degrades by keeping the
    // slowest entries and recording "qtrunc" — certify that the line
    // stays parseable and keeps the slowest query at pathological
    // widths, no matter how many rounds of queries get added.
    val line = Bench.compactJson(names.map(n => (n, 9999.9)), 9999.9,
      "/root/testdata/sf0.1", cpuSlow = true, contended = true,
      normValue = Some(9999.9), parSlow = true)
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.length <= 1900,
      s"compact line ${line.length} B leaves <100 B for the sbt trailer " +
        "inside the 2000-char capture window — width degradation broken")
    // shape check without a JSON lib: balanced braces, the fields the
    // driver contract names, and no unescaped newline
    assert(line.count(_ == '{') == line.count(_ == '}'))
    Seq("\"metric\":", "\"value\":", "\"unit\":\"sec\"", "\"queries\":", "\"sf\":",
        "\"fl\":\"SPC\"", "\"norm\":")
      .foreach(f => assert(line.contains(f), s"missing $f"))
    assert(!line.contains("\n"))
  }

  test("degradation keeps the slowest entries and counts the dropped") {
    // one hot query among uniform fast ones: if the map must shrink,
    // the hot entry survives and qtrunc accounts for every dropped one
    val uniform = names.map(n => (n, 0.5))
    val medians = (uniform.head._1, 9999.9) +: uniform.tail
    val hotKey = medians.head._1.split('_')(0).stripPrefix("q") +
      (if (medians.head._1.endsWith("_sql")) "s" else "")
    val line = Bench.compactJson(medians, 9999.9, "/root/testdata/sf0.1",
      cpuSlow = false, contended = false)
    assert(line.length <= 1900)
    if (line.contains("\"qtrunc\":")) {
      assert(line.contains(s""""$hotKey":"""), "slowest entry was dropped")
      val kept = line.count(_ == ':') - 6 - 1 // metric/value/unit/queries/sf/fl + qtrunc
      val dropped = line.split("\"qtrunc\":")(1).takeWhile(_.isDigit).toInt
      assert(kept + dropped == names.size,
        s"kept $kept + dropped $dropped != declared ${names.size}")
    } else {
      assert(line.count(_ == ':') >= names.size + 5)
    }
  }
}
