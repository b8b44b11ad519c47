package graft.queries

import graft.{Canon, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Q36–Q39: Structured Streaming — tumbling / sliding+watermark /
  * session windows and stateful dedup, run as real readStream →
  * memory-sink pipelines with Trigger.AvailableNow. Correctness is
  * batch-equivalence (SURVEY.md §5.2-3): the oracle SQL computes the
  * same aggregation over the same events, and the final streaming
  * state must match it.
  *
  * At scale the same pipelines run unchanged over a file/Kafka source
  * with RocksDB state and real watermark eviction; AvailableNow here
  * exercises the identical operators and state machinery.
  */
object Streaming {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Staged streaming source dirs, one per events file: the symlink
    * target never changes for a given path, so re-staging per query
    * invocation only leaked temp dirs (a bench run strews dozens).
    * computeIfAbsent keeps it race-free under concurrent queries. */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Dedicated reduced-partition streaming sessions, one per root
    * session (not per invocation — each newSession carries
    * listener/conf state that would otherwise accumulate until GC).
    * The map holds at most a handful of entries per JVM (root + spec
    * sessions).
    *
    * EVERY streaming query runs through this session: each stateful
    * operator commits one state store per shuffle partition per
    * trigger, so the session's 32 partitions meant 32 state commits
    * per trigger where 8 carry the same sf0.1 data — a 4x cut in the
    * fixed trigger cost (measured: the 6-query streaming floor drops
    * 13.9 s -> 9.5 s, q36 2.6 -> 1.5 s, isolated n=3 at sf0.1; q48b
    * is join-bound and barely moves). At cluster scale it is sized to
    * executor-core
    * count; the conf lives in a DEDICATED session (shared
    * SparkContext, isolated SQL conf + temp views) because toggling
    * the shared session's conf would leak into concurrently-planned
    * queries, and a failure between set and restore would leave the
    * whole suite at 8 partitions. */
  private val streamSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  private[graft] def streamSession(s: SparkSession): SparkSession = {
    val n = streamSessions.computeIfAbsent(s, parent => {
      val fresh = parent.newSession()
      fresh.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTS", "8"))
      fresh
    })
    // newSession() does NOT see the parent's runtime conf mutations —
    // mirror the caller's streaming knobs (state-store provider etc.)
    // on every call, including REMOVALS, so a caller-side conf change
    // (RocksDbStateSpec's provider flip and its restore) reaches the
    // session the query actually plans on. The dedicated session
    // overrides only shuffle.partitions, which this prefix never
    // touches.
    // The mirror runs under the dedicated session's monitor: the
    // session is shared per root session, so a concurrent streaming
    // query planning on `n` while a caller flips a streaming conf
    // (the RocksDbStateSpec pattern) must not observe a half-applied
    // unset/set sequence. (Queries that PLAN outside the lock still
    // race a concurrent flip by nature — the lock guarantees the
    // mirror itself is atomic.)
    n.synchronized {
      val prefix = "spark.sql.streaming."
      val parentStreaming = s.conf.getAll.filter(_._1.startsWith(prefix))
      n.conf.getAll.keysIterator
        .filter(k => k.startsWith(prefix) && !parentStreaming.contains(k))
        .foreach(n.conf.unset)
      parentStreaming.foreach { case (k, v) =>
        if (!n.conf.getOption(k).contains(v)) n.conf.set(k, v)
      }
    }
    n
  }

  /** Streaming scan of the events table (schema from the batch read;
    * TIMESTAMP(NANOS) arrives as LONG under nanosAsLong — truncate to
    * micros exactly like Tables.load). `private[graft]` so streaming
    * specs (RocksDB provider, q48 trigger pin) drive the same source. */
  private[graft] def streamEvents(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val sch = s.read.parquet(path).schema
    // The streaming file source wants a DIRECTORY. A directory-shaped
    // table (every real table at scale — flat part files or
    // hive-partitioned) streams DIRECTLY from its own path: the
    // source's leaf listing recurses through partition directories and
    // keeps partition-COLUMN VALUES intact (flattening those files
    // into a staging dir would silently read every partition column as
    // NULL — the round-13 review catch). Only the driver testdata's
    // SINGLE-FILE layout needs staging: one symlink in a scratch dir,
    // once per (JVM, events path). The round-12 bug — a symlinked
    // DIRECTORY inside a staging dir is skipped by the listing and the
    // stream reads ZERO rows — is gone with the staging itself;
    // StreamScaleSpec pins flat-sharded AND hive-partitioned input.
    val streamDir = stagedDirs.computeIfAbsent(
      java.nio.file.Paths.get(path).toAbsolutePath.toString,
      abs => {
        val target = java.nio.file.Paths.get(abs) // absolute; relative would dangle
        if (java.nio.file.Files.isDirectory(target)) {
          // fail LOUDLY on a dataless table dir — the file source
          // would otherwise stream zero rows and complete "green"
          val parts = java.nio.file.Files.walk(target)
          val hasData =
            try parts.anyMatch(p => p.getFileName.toString.endsWith(".parquet") &&
              java.nio.file.Files.isRegularFile(p))
            finally parts.close()
          require(hasData, s"events table $abs contains no parquet data files — " +
            "the stream would silently read zero rows")
          abs // stream the table directory itself — no staging
        } else {
          val d = java.nio.file.Files.createTempDirectory("graft_stream")
          java.nio.file.Files.createSymbolicLink(d.resolve("events.parquet"), target)
          d.toString
        }
      })
    val raw = s.readStream.schema(sch).parquet(streamDir)
    // Same ts-encoding normalization as the batch path (nanos-Long /
    // micros-NTZ / micros-UTC → session-TZ TIMESTAMP; Tables.normalizeTs
    // documents the policy). NTZ in particular must be cast here:
    // withWatermark rejects TIMESTAMP_NTZ event time.
    graft.Tables.normalizeTs(raw)
  }

  /** Stage `df` as `n` single-file parquet arrivals under `feed`,
    * split on `slice` (a 0..n-1 column the caller derives, e.g. the
    * tens-digit-mod idiom): ONE staged pass over the producer (the
    * per-slice writes reuse it instead of recomputing the pipeline),
    * each slice coalesced to a single file named f<i>.parquet so
    * `maxFilesPerTrigger=1` yields deterministic micro-batches
    * whatever the source's file ordering. Files are overwritten in
    * place (REPLACE_EXISTING) so a crashed build's re-run restages
    * cleanly, and the per-slice write-staging dirs are removed after
    * the move. Shared by the streaming maintenance entries
    * (q79b/q79c) so their arrival mechanics cannot diverge. */
  private[graft] def stageSingleFileSlices(df: DataFrame,
      slice: org.apache.spark.sql.Column, n: Int, feed: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(feed))
    val staged = graft.Staging.stage(df)
    (0 until n).foreach { i =>
      val w = s"${feed}_w$i"
      staged.filter(slice === i).coalesce(1)
        .write.mode("overwrite").parquet(w)
      val part = new java.io.File(w).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(feed, s"f$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(w))
    }
    graft.CheckpointJanitor.dropNow(staged)
  }

  /** Remove a (possibly stale) streaming checkpoint and PROVE it is
    * gone: a silently-surviving checkpoint would make a restarted
    * AvailableNow stream resume past already-committed micro-batches
    * against an artifact the retry just reset — the accepts of the
    * skipped ticks would vanish without an error (the q79b/q79c
    * crash-retry hazard). deleteQuietly alone swallows exactly that
    * failure, so the survival check is load-bearing. */
  private[graft] def wipeCheckpoint(ckpt: String): Unit = {
    val f = new java.io.File(ckpt)
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    require(!f.exists(),
      s"stale streaming checkpoint survived deletion: $ckpt")
  }

  /** Unload every loaded state-store provider (round-22). A finished
    * AvailableNow query leaves its providers LOADED on the executor,
    * and the 60 s maintenance tick then snapshots/cleans every
    * accumulated provider at once — in a suite that runs dozens of
    * streaming queries per JVM, that wave lands inside some later
    * query's timed window (the BENCHLOG round-20 "q48 transient"
    * class: isolated q48 converges at ~3 s while in-suite medians read
    * 5–13 s with identical code). Providers reload on demand, so this
    * is pure hygiene: a concurrently-running query would only pay one
    * reload, and a finished query's state is already in the sink. */
  private[graft] def unloadStateStores(): Unit =
    org.apache.spark.sql.GraftBridge.unloadStateStores()

  /** Run a streaming DF to a memory sink, return the final table. */
  private def runToTable(s: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val qn = s"graft_sink_${counter.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    unloadStateStores()
    // resolve the sink relation eagerly, then drop the catalog entry:
    // the returned DataFrame's analyzed plan holds the sink rows, so
    // the temp view would only pin them past the caller's lifetime
    val t = s.table(qn)
    s.catalog.dropTempView(qn)
    t
  }

  val q36 = QueryDef("q36_stream_tumbling",
    s"""SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS ws,
       |  event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
       |  ${Canon.sql.dsum("value")} AS val_sum
       |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val agg = streamEvents(s, dir)
      .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"value").as("val_sum"))
      .select(Canon.tsStr($"w.start").as("ws"), $"event_type", $"cnt", $"val_sum")
    runToTable(s, agg, "complete").orderBy("ws", "event_type")
  }

  val q37 = QueryDef("q37_stream_sliding_watermark",
    s"""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws,
       |  CAST(COUNT(*) AS BIGINT) AS cnt, ${Canon.sql.dsum("value")} AS val_sum
       |FROM (SELECT value,
       |        UNNEST([time_bucket(INTERVAL '5 minutes', ts),
       |                time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTES]) AS ws
       |      FROM events)
       |GROUP BY ws ORDER BY ws""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val agg = streamEvents(s, dir)
      .withWatermark("ts", "15 minutes")
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"value").as("val_sum"))
      .select(Canon.tsStr($"w.start").as("ws"), $"cnt", $"val_sum")
    runToTable(s, agg, "complete").orderBy("ws")
  }

  /** Session windows (5-minute gap) per user. Spark sessions span
    * [first_ts, last_ts + gap); the oracle reproduces them with the
    * gaps-and-islands formulation. */
  val q38 = QueryDef("q38_stream_session_window",
    """SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(MAX(ts) + INTERVAL 5 MINUTES, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM (
      |  SELECT user_id, ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                > INTERVAL 5 MINUTES OR
      |                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM events)
      |) GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val agg = streamEvents(s, dir)
      .groupBy(session_window($"ts", "5 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .select($"user_id", Canon.tsStr($"w.start").as("session_start"),
        Canon.tsStr($"w.end").as("session_end"), $"cnt")
    runToTable(s, agg, "complete").orderBy("user_id", "session_start")
  }

  /** Stateful streaming dedup: every event duplicated 3×, then
    * dropDuplicatesWithinWatermark on event_id must restore exactly-once. */
  val q39 = QueryDef("q39_stream_dedup",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val deduped = streamEvents(s, dir)
      .withColumn("dup", explode(array(lit(1), lit(2), lit(3))))
      .drop("dup")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val sink = runToTable(s, deduped, "append")
    sink.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** Incremental resume cursor (R1's `startblock` watermark,
    * walletDataConsumer.py:51): per-wallet max-block state maintained
    * with flatMapGroupsWithState — the cursor a restarted ingest would
    * resume from. Final state must equal the batch max. */
  val q39b = QueryDef("q39b_stream_resume_cursor",
    """SELECT user_id % 29 AS wallet_key,
      |  MAX(event_id * 7 + user_id) AS resume_block
      |FROM events GROUP BY user_id % 29 ORDER BY wallet_key""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val cursors = streamEvents(s, dir)
      .select(($"user_id" % 29).as("wallet_key"),
        ($"event_id" * 7 + $"user_id").as("block"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) => {
          val sofar = state.getOption.getOrElse(Long.MinValue)
          val hi = rows.map(_._2).foldLeft(sofar)(_ max _)
          state.update(hi)
          Iterator((key, hi))
        })
      .toDF("wallet_key", "cursor")
    // update-mode sink appends each state revision; the resume point
    // is the last (max) cursor per wallet
    runToTable(s, cursors, "update")
      .groupBy("wallet_key").agg(max($"cursor").as("resume_block"))
      .orderBy("wallet_key")
  }

  /** Stream-stream inner join with watermarks + time-range condition:
    * pairs of events from the same user within 5 minutes. State on
    * both sides is bounded by the watermark; the oracle is the batch
    * self-join of the same predicate.
    *
    * Cost story (pinned by StreamStreamJoinSpec): wall time is FIXED
    * micro-batch machinery — AvailableNow runs a small, data-
    * independent number of triggers (data + watermark-finalize), and
    * each trigger commits one join-state store per shuffle partition
    * per side. The state-store count IS the batching knob: the join
    * runs at `stateParts` shuffle partitions (8 locally — 4× fewer
    * state commits than the session's 32; at cluster scale size it to
    * the executor-core count). Throughput at 100 TB is bounded by
    * state volume inside the watermark, not by this constant. */
  val q48 = QueryDef("q48_stream_stream_join",
    """SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTES
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin) { (s, dir) =>
    val s2 = streamSession(s)
    import s2.implicits._
    val a = streamEvents(s2, dir).withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts".as("ts_a"))
    val b = streamEvents(s2, dir).withWatermark("ts", "10 minutes")
      .select($"user_id".as("user_b"), $"ts".as("ts_b"))
    val joined = a.join(b,
      $"user_id" === $"user_b" &&
        $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"))
    val sink = runToTable(s2, joined, "append")
    sink.groupBy("user_id").agg(count(lit(1)).as("pair_cnt"))
      .orderBy("user_id")
  }

  /** Stream-static join: the streaming events feed enriched against a
    * STATIC dimension (the wallet fixture keyed by user bucket) — no
    * state store involved (the static side is re-planned per batch,
    * broadcast when small), the standard enrichment topology a
    * training-data ingest runs. Oracle is the batch join. */
  val q48b = QueryDef("q48b_stream_static_join",
    graft.Fixtures.cte.stripSuffix("\n") +
      """, dim AS (SELECT CAST(substr(wallet_address, 3) AS BIGINT) % 29 AS wkey,
        |                 CAST(COUNT(*) AS BIGINT) AS wallet_txn_cnt
        |          FROM wallet_txs GROUP BY 1)
        |SELECT e.user_id % 29 AS wkey, CAST(COUNT(*) AS BIGINT) AS ev_cnt,
        |  MIN(wallet_txn_cnt) AS dim_cnt
        |FROM events e JOIN dim ON e.user_id % 29 = dim.wkey
        |GROUP BY 1 ORDER BY wkey""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val dim = graft.Fixtures.walletTxs(s, dir)
      .groupBy((substring($"wallet_address", 3, 40).cast("long") % 29).as("wkey"))
      .agg(count(lit(1)).as("wallet_txn_cnt"))
    val enriched = streamEvents(s, dir)
      .withColumn("wkey", $"user_id" % 29)
      .join(dim, "wkey") // stream-static: dim is batch, broadcast per micro-batch
    val sink = runToTable(s, enriched, "append")
    sink.groupBy("wkey")
      .agg(count(lit(1)).as("ev_cnt"), min($"wallet_txn_cnt").as("dim_cnt"))
      .orderBy("wkey")
  }

  /** LEFT-OUTER stream-stream interval join: unmatched left rows are
    * null-extended only when the watermark passes their join window —
    * the semantics that make outer joins runnable on unbounded
    * streams (state for a left row is dropped, and its null row
    * emitted, once no future right row could match it). Under
    * AvailableNow the trailing no-data micro-batch advances the final
    * watermark to max(ts) − 10 min, so the oracle reproduces Spark's
    * eviction rule EXACTLY: inner pairs unconditionally, plus one
    * null-extended row for each unmatched left row whose window
    * upper bound (ts + 5 min) closed strictly before the final
    * watermark; unmatched rows still inside the horizon at shutdown
    * produce NOTHING (their state dies with the query). Per-user
    * row/match counts keep the result compact and hash-stable. */
  val q48c = QueryDef("q48c_stream_stream_left_outer",
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |lrows AS (
      |  SELECT a.user_id, a.event_id, a.ts, COUNT(b.ts) AS matches
      |  FROM events a LEFT JOIN events b
      |    ON a.user_id = b.user_id
      |   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTES
      |  GROUP BY 1, 2, 3)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN matches > 0 THEN matches
      |       WHEN ts + INTERVAL 5 MINUTES < m - INTERVAL 10 MINUTES THEN 1
      |       ELSE 0 END) AS BIGINT) AS row_cnt,
      |  CAST(SUM(matches) AS BIGINT) AS matched_cnt
      |FROM lrows CROSS JOIN mx
      |GROUP BY user_id
      |HAVING CAST(SUM(CASE WHEN matches > 0 THEN matches
      |       WHEN ts + INTERVAL 5 MINUTES < m - INTERVAL 10 MINUTES THEN 1
      |       ELSE 0 END) AS BIGINT) > 0
      |ORDER BY user_id""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val a = streamEvents(s, dir).withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts".as("ts_a"))
    val b = streamEvents(s, dir).withWatermark("ts", "10 minutes")
      .select($"user_id".as("user_b"), $"ts".as("ts_b"))
    val joined = a.join(b,
      $"user_id" === $"user_b" &&
        $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"),
      "left_outer")
    val sink = runToTable(s, joined, "append")
    sink.groupBy("user_id")
      .agg(count(lit(1)).as("row_cnt"), count($"ts_b").as("matched_cnt"))
      .orderBy("user_id")
  }

  /** Full-outer stream-stream interval join (q48d): completes the
    * declared join family (q48 inner / q48c left / full here). Null
    * extension happens for EACH side exactly at its state eviction:
    * a left row's window must fully pass the final watermark
    * (ts_a + 5min < wm, q48c's rule), a right row evicts once no
    * future left row can precede it (ts_b < wm — the join needs
    * ts_a < ts_b, and future arrivals have ts_a ≥ wm). The oracle
    * reproduces both eviction rules against wm = max(ts) - 10min;
    * StreamScaleSpec separately pins the state bound on the horizon. */
  val q48d = QueryDef("q48d_stream_stream_full_outer",
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |lrows AS (
      |  SELECT a.user_id, a.event_id, a.ts, COUNT(b.ts) AS matches
      |  FROM events a LEFT JOIN events b
      |    ON a.user_id = b.user_id
      |   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTES
      |  GROUP BY 1, 2, 3),
      |rrows AS (
      |  SELECT b.user_id, b.event_id, b.ts, COUNT(a.ts) AS matches
      |  FROM events b LEFT JOIN events a
      |    ON a.user_id = b.user_id
      |   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTES
      |  GROUP BY 1, 2, 3),
      |agg_l AS (
      |  SELECT user_id, CAST(SUM(matches) AS BIGINT) AS matched,
      |    CAST(SUM(CASE WHEN matches = 0
      |         AND ts + INTERVAL 5 MINUTES < m - INTERVAL 10 MINUTES
      |         THEN 1 ELSE 0 END) AS BIGINT) AS lonly
      |  FROM lrows CROSS JOIN mx GROUP BY 1),
      |agg_r AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN matches = 0
      |         AND ts < m - INTERVAL 10 MINUTES
      |         THEN 1 ELSE 0 END) AS BIGINT) AS ronly
      |  FROM rrows CROSS JOIN mx GROUP BY 1)
      |SELECT user_id, matched + lonly + ronly AS row_cnt,
      |  matched AS matched_cnt, lonly AS left_null_cnt,
      |  ronly AS right_null_cnt
      |FROM agg_l JOIN agg_r USING (user_id)
      |WHERE matched + lonly + ronly > 0
      |ORDER BY user_id""".stripMargin) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val a = streamEvents(s, dir).withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts".as("ts_a"))
    val b = streamEvents(s, dir).withWatermark("ts", "10 minutes")
      .select($"user_id".as("user_b"), $"ts".as("ts_b"))
    val joined = a.join(b,
      $"user_id" === $"user_b" &&
        $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"),
      "full_outer")
    val sink = runToTable(s, joined, "append")
    sink.groupBy(coalesce($"user_id", $"user_b").as("user_id"))
      .agg(count(lit(1)).as("row_cnt"),
        sum(when($"ts_a".isNotNull && $"ts_b".isNotNull, 1L).otherwise(0L))
          .as("matched_cnt"),
        sum(when($"ts_b".isNull, 1L).otherwise(0L)).as("left_null_cnt"),
        sum(when($"ts_a".isNull, 1L).otherwise(0L)).as("right_null_cnt"))
      .orderBy("user_id")
  }

  /** Streaming CDC upsert (q60c): the change feed arrives as a STREAM
    * (maxFilesPerTrigger=1 forces multiple micro-batches, so latest-
    * wins state genuinely merges across triggers), `max(struct(eff,
    * attrs…))` holds one row of state per key in the agg store, and
    * Complete mode publishes the current snapshot — the streaming twin
    * of q60b, sharing its oracle verbatim. State is keys × one struct,
    * bounded by dimension cardinality, not feed volume; max is
    * order-independent, so cross-batch arrival order (which the file
    * source does not guarantee per key) cannot change the result. */
  val q60c = QueryDef("q60c_cdc_stream_upsert",
    Warehouse.q60b.oracle.get) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val feed = Warehouse.changeFeed(s, dir)
    val root = cdcFeedScratch.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/feed"
      feed.repartition(4).write.mode("overwrite").parquet(d)
      d
    })
    val stream = s.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", "1").parquet(root)
    val latest = stream.groupBy($"cust_id")
      .agg(max(struct($"eff_ts", $"segment", $"acctbal")).as("_r"))
    runToTable(s, latest, "complete")
      .select($"cust_id", $"_r.segment".as("segment"),
        $"_r.acctbal".as("acctbal"), Canon.tsStr($"_r.eff_ts").as("as_of"))
      .orderBy("cust_id")
  }

  private val cdcFeedScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Streaming incremental dedup (q79): q41h's crawl-ingest shape with
    * the fresh batch arriving as a STREAM — multi-file parquet feed,
    * maxFilesPerTrigger=1 forces multi-batch arrival, and a
    * min(doc_id)-per-content-hash streaming aggregate merges
    * first-keeper state ACROSS triggers (Complete mode publishes the
    * converged set, the q60c pattern). The corpus fingerprint
    * anti-join runs batch-side on the sink — at 100 TB it is the
    * persisted-fingerprint-table join of q41h, stream state is one
    * (hash, min-id) pair per distinct arriving content. Shares q41h's
    * oracle VERBATIM: trigger count must not change the answer
    * (batch ≡ stream equivalence). */
  val q79 = QueryDef("q79_stream_incremental_dedup",
    NorthStar.q41h.oracle.get) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val batch = NorthStar.incrementalBatch(d)
    val root = dedupFeedScratch.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_sdedup").toString + "/feed"
      batch.repartition(4).write.mode("overwrite").parquet(p)
      p
    })
    val stream = s.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(root)
    val firstKeeper = stream.withColumn("h", md5($"text"))
      .groupBy($"h").agg(min($"doc_id").as("doc_id"))
    runToTable(s, firstKeeper, "complete")
      .join(d.select(md5($"text").as("h")), Seq("h"), "left_anti")
      .select($"doc_id")
      .orderBy("doc_id")
  }

  private val dedupFeedScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Streaming model-based quality filter (q98b): q98's hashed linear
    * classifier applied IN the ingest stream — the filter-at-ingest
    * deployment where documents are scored as they arrive instead of
    * by a later corpus pass. The scorer is STATELESS (one fused
    * map-only kernel, no aggregation state at all), so Append mode
    * emits verdicts per micro-batch and the state store holds
    * nothing; maxFilesPerTrigger=1 forces multi-batch arrival and the
    * shared-verbatim q98 oracle pins batch ≡ stream whatever the
    * batching. Also the compatibility pin for a custom codegen
    * expression (BucketWeightSum) planning inside a streaming
    * query. */
  val q98b = QueryDef("q98b_stream_quality_filter",
    graft.ops.Curation.hashedLinearScoreSql("documents")) { (s0, dir) =>
    val s = streamSession(s0)
    import s.implicits._
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val root = qfFeedScratch.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_qf").toString + "/feed"
      docs.repartition(4).write.mode("overwrite").parquet(p)
      p
    })
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(root)
    runToTable(s, graft.ops.Curation.hashedLinearScore(stream, "doc_id", "text"),
        "append")
      .orderBy("doc_id")
  }

  private val qfFeedScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val defs: Seq[QueryDef] = Seq(q36, q37, q38, q39, q39b, q48, q48b, q48c, q48d,
    q60c, q79, q98b)
}
