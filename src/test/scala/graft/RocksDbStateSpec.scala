package graft

import graft.queries.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._

/** SCALING.md promises RocksDB-backed streaming state at 100 TB; this
  * spec actually flips the provider: (1) the declared q39 stateful
  * dedup returns identical results under RocksDB and the default
  * HDFS-backed store, and (2) RocksDB really served the state —
  * provider-specific custom metrics appear in the query progress. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val confKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](provider: Option[String])(f: => A): A = {
    val prev = spark.conf.getOption(confKey)
    provider match {
      case Some(p) => spark.conf.set(confKey, p)
      case None    => spark.conf.unset(confKey)
    }
    try f
    finally prev match {
      case Some(p) => spark.conf.set(confKey, p)
      case None    => spark.conf.unset(confKey)
    }
  }

  test("q39 stateful dedup returns identical results under RocksDB state store") {
    val default = withProvider(None) {
      Streaming.q39.fn(spark, sf).collect().toSeq
    }
    val rocks = withProvider(Some(rocksProvider)) {
      // q39 plans on the dedicated stream session — the provider flip
      // must reach it, or this comparison silently tests nothing
      assert(Streaming.streamSession(spark).conf.get(confKey) == rocksProvider,
        "provider conf did not propagate to the stream session")
      Streaming.q39.fn(spark, sf).collect().toSeq
    }
    assert(rocks == default,
      "RocksDB-backed dedup diverges from default state store")
    assert(rocks.nonEmpty, "vacuous: dedup produced no groups")
  }

  test("RocksDB provider actually serves the state (rocksdb metrics in progress)") {
    withProvider(Some(rocksProvider)) {
      val deduped = Streaming.streamEvents(spark, sf)
        .withColumn("dup", explode(array(lit(1), lit(2))))
        .drop("dup")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      val q = deduped.writeStream.format("memory").queryName("rocks_probe")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val metricKeys = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.asScala.keys)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics in progress (saw: ${metricKeys.distinct.take(10)})")
      // exactly-once restored: duplicated input, deduped output
      val batchCnt = Tables.events(spark, sf).count()
      assert(spark.table("rocks_probe").count() == batchCnt)
    }
  }
}
