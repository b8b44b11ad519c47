package graft

/** Runtime record of which branch each occupancy-GUARDED operator took
  * (round-12 advice): `editDistanceNearDupsAuto` / `cosineNearDupsAuto`
  * silently swap the declared exact/fixed-plane plan for a bounded
  * reduced-recall generator above a data-derived threshold — correct by
  * design (the declared DuckDB oracle is only run at scales far below
  * the guards), but an operator that changes plan shape must SAY so
  * outside its own tests. Every guard decision lands here; the scaled
  * branch additionally logs one stderr line, and Bench embeds the map
  * in its full-JSON env so a bench artifact records which semantics it
  * timed.
  *
  * Oracle-validity contract: a guard's DuckDB twin states the EXACT
  * relation; hash-checks are valid only while the guard stays on the
  * exact branch (occupancy below threshold — true at every driver
  * scale factor). Above it the output is the documented candidate-
  * generator subset, rows-only comparable.
  */
object GuardLog {

  private val branches =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record `op`'s branch choice ("exact" / "scaled"); scaled choices
    * log one stderr line per (op, branch) change. */
  def record(op: String, scaled: Boolean): Unit = {
    val b = if (scaled) "scaled" else "exact"
    val prev = branches.put(op, b)
    if (scaled && prev != b)
      System.err.println(s"[guard] $op: occupancy above threshold — " +
        "bounded-candidate branch (oracle hash-checks do not apply at this scale)")
  }

  /** Record a guard whose branches are BOTH exact (same results,
    * different plan shape — e.g. the CC small-sliver fast path): no
    * oracle-validity caveat, so no stderr line; the bench artifact
    * still records which plan it timed. */
  def branch(op: String, name: String): Unit = branches.put(op, name)

  /** Snapshot as a JSON object string ("{}" when no guard ran). */
  def json: String = {
    import scala.jdk.CollectionConverters._
    branches.asScala.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
  }
}
