package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Artifact-shape guarantees for the driver correctness dump (round-13
  * verdict item 2): a broken query must leave an explicit `_ERROR`
  * marker — never silently vanish from the artifact — and the set of
  * materialized keys must equal the declared key set. Round 13 shipped
  * 135 of 138 declared keys with nothing flagging the 3 missing. */
class VerifyShapeSpec extends SparkSpec {

  private def boom(msg: String): (SparkSession, String) => DataFrame =
    (_, _) => throw new RuntimeException(msg)

  test("a failing query writes an _ERROR marker instead of vanishing") {
    val out = Files.createTempDirectory("graft_vshape").toString
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "good" -> ((s, dir) => Tables.region(s, dir)),
      "broken" -> boom("deliberate failure"))
    val failed = Verify.dump(spark, sf, out, qs)
    assert(failed == List("broken"))
    // key-set parity: every declared key materialized as a directory
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == qs.keySet, s"artifact keys $dirs != declared ${qs.keySet}")
    // good → parquet result, no marker
    assert(Files.exists(Paths.get(out, "good", "_SUCCESS")))
    assert(!Files.exists(Paths.get(out, "good", "_ERROR")))
    // broken → marker carrying the message, and NOTHING else (a stale
    // result next to the marker could still read as a pass)
    val marker = Paths.get(out, "broken", "_ERROR")
    assert(Files.exists(marker), "_ERROR marker missing for failed query")
    assert(Files.readString(marker).contains("deliberate failure"))
    assert(new java.io.File(out, "broken").listFiles().map(_.getName).toSeq == Seq("_ERROR"))
  }

  test("a query that fails AFTER a prior success wipes the stale result") {
    val out = Files.createTempDirectory("graft_vshape2").toString
    val good = Map[String, (SparkSession, String) => DataFrame](
      "q" -> ((s, dir) => Tables.region(s, dir)))
    assert(Verify.dump(spark, sf, out, good).isEmpty)
    assert(Files.exists(Paths.get(out, "q", "_SUCCESS")))
    val bad = Map[String, (SparkSession, String) => DataFrame]("q" -> boom("now broken"))
    assert(Verify.dump(spark, sf, out, bad) == List("q"))
    assert(new java.io.File(out, "q").listFiles().map(_.getName).toSeq == Seq("_ERROR"),
      "stale parquet survived next to the _ERROR marker")
  }

  test("every declared query key has oracle coverage accounted for") {
    // oracleSql keys must be a subset of queries (an orphan SQL entry
    // would make the driver compare a query that never materializes)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }
}
