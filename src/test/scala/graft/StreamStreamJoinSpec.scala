package graft

import graft.queries.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins q48's cost story: its wall time is FIXED AvailableNow
  * machinery — a small, data-independent trigger count, each trigger
  * committing one join-state store per shuffle partition per side —
  * not data volume. If the trigger count ever grows with input, the
  * stream-stream join has regressed to per-file batching and the
  * bench number means something else. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("q48 stream-stream join runs in a bounded trigger count and matches batch") {
    val a = Streaming.streamEvents(spark, sf).withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts".as("ts_a"))
    val b = Streaming.streamEvents(spark, sf).withWatermark("ts", "10 minutes")
      .select($"user_id".as("user_b"), $"ts".as("ts_b"))
    val joined = a.join(b,
      $"user_id" === $"user_b" &&
        $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_pin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // AvailableNow over a single-file source: one data trigger plus at
    // most two bookkeeping triggers (watermark commit / no-data final)
    val triggers = q.recentProgress.length
    assert(triggers <= 3, s"expected <=3 triggers, saw $triggers — " +
      "q48 cost is no longer fixed micro-batch machinery")
    // batch equivalence of the joined pairs
    val ev = Tables.events(spark, sf).select($"user_id", $"ts")
    val batch = ev.as("x").join(ev.as("y"),
        $"x.user_id" === $"y.user_id" &&
          $"y.ts" > $"x.ts" && $"y.ts" <= $"x.ts" + expr("INTERVAL 5 MINUTES"))
      .count()
    assert(spark.table("ssj_pin").count() == batch)
  }
}
