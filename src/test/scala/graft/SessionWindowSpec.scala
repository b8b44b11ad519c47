package graft

import org.apache.spark.sql.functions._

/** Pins the session-window gap semantics q38's oracle depends on:
  * Spark merges an event that arrives AT OR within `gap` of the
  * previous event (inclusive boundary — [t, t+gap] overlap test), so
  * the gaps-and-islands oracle must split only on `diff > gap`. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def sessions(times: Seq[String]): Long = {
    val df = times.toDF("t")
      .select(lit(1L).as("user_id"), $"t".cast("timestamp").as("ts"))
    df.groupBy(session_window($"ts", "5 minutes"), $"user_id")
      .count().count()
  }

  test("exactly-gap-apart merges (inclusive); beyond gap splits") {
    assert(sessions(Seq("2024-01-01 00:00:00", "2024-01-01 00:05:00")) == 1)
    assert(sessions(Seq("2024-01-01 00:00:00", "2024-01-01 00:05:00.000001")) == 2)
    assert(sessions(Seq("2024-01-01 00:00:00", "2024-01-01 00:04:59")) == 1)
    assert(sessions(Seq(
      "2024-01-01 00:00:00", "2024-01-01 00:04:00",
      "2024-01-01 00:08:00", "2024-01-01 00:20:00")) == 2)
  }

  test("session end = last event + gap") {
    val df = Seq("2024-01-01 00:00:00", "2024-01-01 00:03:00").toDF("t")
      .select(lit(1L).as("user_id"), $"t".cast("timestamp").as("ts"))
    val w = df.groupBy(session_window($"ts", "5 minutes").as("w"), $"user_id")
      .count()
      .select(date_format($"w.end", "yyyy-MM-dd HH:mm:ss")).as[String].collect()
    assert(w.sameElements(Array("2024-01-01 00:08:00")))
  }
}
