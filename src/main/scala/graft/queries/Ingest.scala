package graft.queries

import graft.{Canon, Fixtures, Tables}
import org.apache.spark.sql.functions._

/** Q45/Q46: the ingestion surface end-to-end — the polygonscan DSv2
  * connector (R1: partition-per-wallet paginated scan, block-range
  * pushdown) and the full-refresh overwrite load (R14–R16).
  * The fixture transport is deterministic arithmetic, so the DuckDB
  * oracle reproduces the ENTIRE ingest pipeline from generate_series.
  */
object Ingest {

  val q45 = QueryDef("q45_polygonscan_scan",
    """SELECT '0xw' || CAST(wi AS VARCHAR) AS wallet_address,
      |  '0xh' || CAST(wi AS VARCHAR) || '_' || CAST(b AS VARCHAR) AS hash,
      |  b AS block_number,
      |  1700000000 + b * 60 AS time_stamp,
      |  '0xf' || CAST((b * 31 + wi) % 1000 AS VARCHAR) AS from_address,
      |  '0xt' || CAST((b * 17 + wi) % 1000 AS VARCHAR) AS to_address,
      |  '0xc' || CAST(b % 25 AS VARCHAR) AS contract_address,
      |  'Token' || CAST(b % 25 AS VARCHAR) AS token_name,
      |  'TK' || CAST(b % 25 AS VARCHAR) AS token_symbol,
      |  CAST(CASE b % 4 WHEN 0 THEN 6 WHEN 1 THEN 8 WHEN 2 THEN 18 ELSE 0 END AS INTEGER) AS token_decimal,
      |  CAST((b % 9 + 1) * 1000000 + wi AS VARCHAR) AS value,
      |  CAST((b % 9 + 1) * 1000000 + wi AS DOUBLE) /
      |    power(10, CASE b % 4 WHEN 0 THEN 6 WHEN 1 THEN 8 WHEN 2 THEN 18 ELSE 0 END) AS quantity
      |FROM generate_series(0, 4) AS w(wi), generate_series(0, 400) AS t(b)
      |WHERE b < (wi % 3 + 1) * 100 + (wi * 7919) % 100
      |  AND b BETWEEN 50 AND 180
      |ORDER BY wallet_address, block_number""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.functions.WeiToToken.register(s)
    s.read.format("polygonscan")
      .option("wallets", (0 to 4).map(w => s"0xw$w").mkString(","))
      .option("pageSize", "100")
      .option("source", "fixture")
      .load()
      .filter($"block_number" >= 50 && $"block_number" <= 180) // → pushdown
      .withColumn("quantity",
        expr("wei_to_token(CAST(value AS BIGINT), token_decimal)"))
      .orderBy("wallet_address", "block_number")
  }

  /** Wallet-predicate pushdown: an IN filter on `wallet_address`
    * prunes the per-wallet InputPartition list (2 partitions planned,
    * 3 wallets never fetched — PolygonscanSpec asserts the plan), the
    * connector-side mirror of the reference's per-wallet scan loop
    * (walletDataConsumer.py:126-128). Same derivation as q45 with the
    * wallet restriction applied at the source. */
  val q45b = QueryDef("q45b_polygonscan_wallet_pruning",
    """SELECT '0xw' || CAST(wi AS VARCHAR) AS wallet_address,
      |  '0xh' || CAST(wi AS VARCHAR) || '_' || CAST(b AS VARCHAR) AS hash,
      |  b AS block_number,
      |  1700000000 + b * 60 AS time_stamp,
      |  '0xf' || CAST((b * 31 + wi) % 1000 AS VARCHAR) AS from_address,
      |  '0xt' || CAST((b * 17 + wi) % 1000 AS VARCHAR) AS to_address,
      |  '0xc' || CAST(b % 25 AS VARCHAR) AS contract_address,
      |  'Token' || CAST(b % 25 AS VARCHAR) AS token_name,
      |  'TK' || CAST(b % 25 AS VARCHAR) AS token_symbol,
      |  CAST(CASE b % 4 WHEN 0 THEN 6 WHEN 1 THEN 8 WHEN 2 THEN 18 ELSE 0 END AS INTEGER) AS token_decimal,
      |  CAST((b % 9 + 1) * 1000000 + wi AS VARCHAR) AS value
      |FROM generate_series(0, 4) AS w(wi), generate_series(0, 400) AS t(b)
      |WHERE b < (wi % 3 + 1) * 100 + (wi * 7919) % 100
      |  AND b BETWEEN 50 AND 180
      |  AND wi IN (1, 3)
      |ORDER BY wallet_address, block_number""".stripMargin) { (s, dir) =>
    import s.implicits._
    s.read.format("polygonscan")
      .option("wallets", (0 to 4).map(w => s"0xw$w").mkString(","))
      .option("pageSize", "100")
      .option("source", "fixture")
      .load()
      .filter($"wallet_address".isin("0xw1", "0xw3")) // → partition pruning
      .filter($"block_number" >= 50 && $"block_number" <= 180)
      .orderBy("wallet_address", "block_number")
  }

  /** Full-refresh load (R14–R16): the reference's upload→TRUNCATE→COPY
    * becomes a STAGE-AND-SWAP generation load (graft.ops.StagedRefresh):
    * the new generation writes completely beside the live one, then an
    * atomic pointer rename makes it live — readers see old XOR new,
    * never the empty window a delete-then-write overwrite opens
    * (StageSwapSpec injects crashes between the stages). Read back via
    * the pointer and aggregate. */
  val q46 = QueryDef("q46_full_refresh_load",
    Fixtures.cte +
      s"""SELECT token_symbol, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  ${Canon.sql.dsum("quantity")} AS qty
         |FROM wallet_txs GROUP BY token_symbol ORDER BY token_symbol""".stripMargin) { (s, dir) =>
    import s.implicits._
    // scratch root memoized per dataset (same rationale as q02): each
    // refresh GCs older generations, so a fresh temp dir per invocation
    // would only accumulate parquet copies across runs
    val root = loadScratch.computeIfAbsent(dir,
      _ => java.nio.file.Files.createTempDirectory("graft_load").toString + "/wallet_txs")
    // load twice: the second refresh must fully replace the first
    // (no duplicates — resources/redshift.py:124's contract).
    // StagedRefresh assumes a single writer per root, so both loads +
    // readback run under the per-root lock (the memoized String is one
    // instance per dataset); the readback pins eagerly because a LATER
    // invocation's GC may drop the generation a lazily-consumed scan
    // would read (same fix as q02).
    root.synchronized {
      graft.ops.StagedRefresh.refresh(Fixtures.walletTxs(s, dir).limit(10), root)
      graft.ops.StagedRefresh.refresh(Fixtures.walletTxs(s, dir), root)
      graft.ops.StagedRefresh.readCurrent(s, root).localCheckpoint()
    }
      .groupBy("token_symbol")
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"quantity").as("qty"))
      .orderBy("token_symbol")
  }

  /** R15 fidelity: the COPY target is a CATALOG table
    * (`polygonscan.wallet_txs`, resources/redshift.py:89-112) — the
    * reference's output contract is a warehouse table any SQL client
    * can query, not a bare path. The catalog analog of stage-and-swap:
    * each load lands in a fresh GENERATION table
    * (`wallet_txs_g<N>`), then `CREATE OR REPLACE VIEW
    * polygonscan.wallet_txs` repoints the queryable name — one catalog
    * operation, so a reader resolving the name sees the old or the new
    * generation, never a dropped/empty table (the previous
    * DROP+saveAsTable sequence had exactly that window). The double
    * load proves the repoint fully replaces (the aggregate would
    * double-count leaked rows), and the readback goes through the
    * session catalog by NAME. Older generation tables are dropped,
    * keeping the immediate predecessor for in-flight readers. */
  val q46b = QueryDef("q46b_full_refresh_catalog",
    Fixtures.cte +
      s"""SELECT token_symbol, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  ${Canon.sql.dsum("quantity")} AS qty
         |FROM wallet_txs GROUP BY token_symbol ORDER BY token_symbol""".stripMargin) { (s, dir) =>
    import s.implicits._
    catalogRefresh(s, Fixtures.walletTxs(s, dir).limit(10))
    catalogRefresh(s, Fixtures.walletTxs(s, dir))
    s.table("polygonscan.wallet_txs")
      .groupBy("token_symbol")
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"quantity").as("qty"))
      .orderBy("token_symbol")
  }

  /** One catalog stage-and-swap load: stage `df` into the next
    * `polygonscan.wallet_txs_g<N>` generation table, repoint the
    * `polygonscan.wallet_txs` view in one catalog op, GC generations
    * older than the predecessor. Serialized per JVM (single-writer
    * discipline, like the path-sink refresh). `hook` is the crash-
    * injection seam ("staged" = table written, view not yet
    * repointed). Returns the new generation table name. */
  private[graft] def catalogRefresh(s: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame,
      hook: String => Unit = _ => ()): String = catalogLock.synchronized {
    s.sql("CREATE DATABASE IF NOT EXISTS polygonscan")
    val existing = s.catalog.listTables("polygonscan").collect()
      .map(_.name).filter(_.startsWith("wallet_txs_g"))
      .flatMap(n => n.stripPrefix("wallet_txs_g").toLongOption)
    val n = existing.maxOption.getOrElse(0L) + 1
    val gen = s"wallet_txs_g$n"
    // a FRESH session's in-memory catalog doesn't know a previous
    // JVM's managed-table location — clear any leftover dir so
    // saveAsTable can create the generation table (idempotent re-runs)
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, s"polygonscan.db/$gen")
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite").saveAsTable(s"polygonscan.$gen")
    hook("staged")
    // migration guard: a TABLE named wallet_txs (the pre-round-12
    // scheme) blocks CREATE OR REPLACE VIEW — drop it once
    if (s.catalog.tableExists("polygonscan.wallet_txs") &&
        s.catalog.getTable("polygonscan.wallet_txs").tableType != "VIEW")
      s.sql("DROP TABLE polygonscan.wallet_txs")
    // The generation the view names RIGHT NOW — read from the catalog
    // ITSELF before the swap, exactly as the path-sink refresh re-reads
    // its pointer file (round-12 advice: a JVM shadow var desyncs from
    // the catalog when a refresh crashes between the swap and the var
    // update, and the NEXT refresh then GCs the real live predecessor
    // while sparing a stale generation).
    val spare: Option[Long] =
      if (s.catalog.tableExists("polygonscan.wallet_txs"))
        "wallet_txs_g(\\d+)".r
          .findFirstMatchIn(
            s.sql("SHOW CREATE TABLE polygonscan.wallet_txs").head().getString(0))
          .map(_.group(1).toLong)
      else None
    // THE swap: one catalog operation repoints the queryable name
    s.sql(s"CREATE OR REPLACE VIEW polygonscan.wallet_txs AS " +
      s"SELECT * FROM polygonscan.$gen")
    hook("swapped")
    // GC keeps the generation the view NAMED before this swap (the one
    // in-flight readers may hold) — not the max-numbered table, which
    // after a crashed load is an orphan nobody reads (the path-sink
    // refresh makes the same distinction)
    existing.filter(g => g != n && !spare.contains(g)).foreach(old =>
      s.sql(s"DROP TABLE IF EXISTS polygonscan.wallet_txs_g$old"))
    gen
  }

  private val catalogLock = new Object

  /** Storage-layout scale demo: orders/lineitem bucketed by join key
    * into the session catalog, then joined WITHOUT any shuffle — the
    * SCALING.md "co-locate joins via bucketing" claim as an executable,
    * oracle-checked query (PlanSpec asserts the exchange-free plan).
    * At 100 TB this is the difference between re-shuffling 100 TB per
    * join and reading pre-bucketed files. */
  val q50 = QueryDef("q50_bucketed_colocated_join",
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
       |  ${graft.Canon.sql.dsum("l_quantity")} AS qty
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    import s.implicits._
    bucketedJoinInput(s, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), graft.Canon.dsum($"l_quantity").as("qty"))
      .orderBy("o_orderpriority")
  }

  /** Dirs whose bucketed tables this JVM already materialized — the
    * bucketing is INDEX BUILD (done once per dataset, like any storage
    * layout), not per-query work; rebuilding it on every q50 execution
    * would bill layout cost to the query. Keyed by source dir so a
    * different scale factor in the same JVM rebuilds. */
  // The dir whose data the graft.*_b tables currently hold. A dir-keyed
  // *set* had two failure modes: a second SparkContext in the same JVM
  // (fresh in-memory catalog) would skip the build and then fail or read
  // a stale warehouse, and switching dirA→dirB→dirA would skip the
  // rebuild and silently join dirB's rows. One mutable "current dir"
  // plus a live tableExists check covers both.
  private val bucketedDir =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Test hook: force the next bucketedJoinInput call to rebuild. */
  private[graft] def invalidateBucketedForTest(): Unit = bucketedDir.set(null)

  /** q46's parquet scratch paths, one per dataset (see q46's comment). */
  private val loadScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The bucketed join itself, exposed for PlanSpec's no-exchange
    * assertion: both sides land in the catalog bucketed 8-ways by the
    * join key, so the sort-merge join reads co-located buckets. */
  /** Ensure the bucketed catalog tables exist for `dir` (extracted
    * from [[bucketedJoinInput]] so q67's bucket-pruning read shares
    * the same tables without paying for the join). */
  private[queries] def ensureBucketedTables(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    // synchronized (mirroring Tables.registerViews): two concurrent
    // executions must not both enter the rebuild and interleave
    // DROP/overwrite on the same catalog tables
    bucketedDir.synchronized {
      if (bucketedDir.get != dir ||
          !s.catalog.tableExists("graft.orders_b") ||
          !s.catalog.tableExists("graft.lineitem_b")) {
        // invalidate BEFORE touching the tables: if materialize fails
        // midway (orders_b rebuilt, lineitem_b not), a later call with
        // the OLD dir must not see a matching marker + both tables and
        // silently return a mixed-dir join — null forces a rebuild
        bucketedDir.set(null)
        s.sql("CREATE DATABASE IF NOT EXISTS graft")
        def materialize(name: String, df: org.apache.spark.sql.DataFrame,
            key: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS graft.$name")
          val loc = new org.apache.hadoop.fs.Path(
            s.sessionState.conf.warehousePath, s"graft.db/$name")
          loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
          df.write.mode("overwrite").format("parquet")
            .bucketBy(8, key).sortBy(key).saveAsTable(s"graft.$name")
        }
        materialize("orders_b",
          graft.Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
          "o_orderkey")
        materialize("lineitem_b",
          graft.Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
          "l_orderkey")
        bucketedDir.set(dir) // only after BOTH tables hold dir's rows
      }
    }
  }

  def bucketedJoinInput(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    ensureBucketedTables(s, dir)
    s.table("graft.orders_b").join(s.table("graft.lineitem_b"),
      col("l_orderkey") === col("o_orderkey"))
  }

  /** q46c: the reference's WHOLE weekly topology as one pipeline —
    * periodic trigger (AvailableNow stream, R19) → windowed transform
    * (the q36 tumbling aggregate) → full-refresh load (stage-and-swap
    * generation write, R13–R16) → queryable readback of the swapped
    * generation. The oracle is q36's batch-equivalent SQL: the load
    * step must neither drop nor duplicate a row of the streamed
    * aggregate (redshift.py:124's "full refresh, no duplicates"
    * contract, held atomically). Double refresh proves replacement
    * exactly like q46. */
  private val streamLoadScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q46c = QueryDef("q46c_stream_refresh_pipeline",
    Streaming.q36.oracle.get) { (s, dir) =>
    import s.implicits._
    val agg = Streaming.q36.fn(s, dir) // readStream -> window agg -> sink table
    val root = streamLoadScratch.computeIfAbsent(dir,
      _ => java.nio.file.Files.createTempDirectory("graft_sload").toString + "/events_10m")
    root.synchronized {
      graft.ops.StagedRefresh.refresh(agg.limit(3), root) // stale generation
      graft.ops.StagedRefresh.refresh(agg, root)          // weekly full refresh
      graft.ops.StagedRefresh.readCurrent(s, root).localCheckpoint()
    }
      .orderBy("ws", "event_type")
  }

  /** Hive-partitioned layout + partition pruning (q62): the storage
    * lever that makes 100 TB scannable at all. The events table is
    * laid out `partitionBy(event_date)` (30 directories here; day
    * partitions in production), and a day-equality query then prunes
    * at PLANNING time — EXPLAINS shows `PartitionFilters:
    * [(event_date = 2024-01-15)]` and a 1/30 file listing; the data
    * filter never touches the other 29 days' bytes. The layout is
    * written once per (JVM, source dir) and reused, mirroring how a
    * real table is laid out once and queried forever. The oracle runs
    * the same day filter over the unpartitioned source — pruning must
    * not change a single row. */
  private val partitionedScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The day-partitioned events layout, written once per (JVM, source
    * dir) and shared by q62 (static pruning) and q64 (dynamic). */
  private def partitionedEvents(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    partitionedScratch.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_by_day"
      Tables.events(s, dir)
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("event_date").parquet(d)
      d
    })

  val q62 = QueryDef("q62_partitioned_layout_pruning",
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
       |  ${graft.Canon.sql.dsum("value")} AS val_sum
       |FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    s.read.parquet(partitionedEvents(s, dir))
      .filter($"event_date" === "2024-01-15")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), graft.Canon.dsum($"value").as("val_sum"))
      .orderBy("event_type")
  }

  /** Dynamic partition pruning (q64): the pruning predicate isn't a
    * literal — it comes from a JOIN against a filtered dim (the "audit
    * days" calendar). Catalyst turns the broadcast dim into a
    * `dynamicpruningexpression` on the fact scan's PARTITION column,
    * so only the 4 matching day directories are listed/read — the
    * star-schema version of q62's literal pruning, and the pattern
    * every date-dim warehouse query at 100 TB lives on. PlanSpec pins
    * the dynamicpruning expression; the oracle recomputes the audit-
    * day predicate directly on ts. */
  val q64 = QueryDef("q64_dynamic_partition_pruning",
    s"""SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       |  CAST(COUNT(*) AS BIGINT) AS cnt,
       |  ${graft.Canon.sql.dsum("value")} AS val_sum
       |FROM events WHERE CAST(strftime(ts, '%d') AS INT) % 7 = 0
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val fact = s.read.parquet(partitionedEvents(s, dir))
    // The calendar dim must be a STORED table, not a literal Seq: a
    // local relation constant-folds its Filter away (LocalTableScan
    // arrives pre-filtered), and the PartitionPruning rule looks for a
    // selective predicate on the build side — no Filter node, no DPP.
    // A real star schema's date dim is a table anyway. The layout's
    // partition column type-infers to DATE, so the dim key is DATE too:
    // DPP only prunes on the bare (uncast) partition attribute.
    // (a bare boolean flag also wouldn't qualify: PartitionPruning's
    // isLikelySelective wants a comparison — the EqualTo below is it)
    val calRoot = partitionedEvents(s, dir).stripSuffix("/events_by_day") + "/calendar"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(calRoot)))
      (1 to 30).map(d => (f"2024-01-$d%02d", if (d % 7 == 0) "audit" else "regular"))
        .toDF("d", "day_kind")
        .select(to_date($"d").as("event_date"), $"day_kind")
        .write.mode("overwrite").parquet(calRoot)
    val calendar = s.read.parquet(calRoot)
    fact.join(calendar.filter($"day_kind" === "audit"), Seq("event_date"))
      .groupBy("event_date")
      .agg(count(lit(1)).as("cnt"), graft.Canon.dsum($"value").as("val_sum"))
      .select(date_format($"event_date", "yyyy-MM-dd").as("event_date"),
        $"cnt", $"val_sum")
      .orderBy("event_date")
  }

  /** Bucket pruning (q67): the third scan lever beside q62/q64 —
    * a point lookup on the BUCKETING key of a bucketed catalog table
    * reads only the buckets the literals hash to
    * (`SelectedBucketsCount: k out of 8` on the scan, PlanSpec-
    * pinned), no shuffle, no full scan. At 100 TB this is the
    * primary-key-lookup shape: hash the key, open one bucket's files.
    * Shares q50's bucketed tables; the oracle runs the same IN filter
    * over the unbucketed source. */
  val q67 = QueryDef("q67_bucket_pruned_lookup",
    """SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 6) AS qty
      |FROM lineitem WHERE l_orderkey IN (1, 7, 33)
      |GROUP BY 1 ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    ensureBucketedTables(s, dir)
    // the aggregate is keyed on the BUCKETING key, so the bucketed
    // scan both prunes (IN-list → 2 of 8 buckets) and feeds the
    // aggregate exchange-free — without the agg, Spark's
    // DisableUnnecessaryBucketedScan rightly drops the bucketed read
    // (and with it the pruning)
    s.table("graft.lineitem_b")
      .filter($"l_orderkey".isin(1L, 7L, 33L))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), graft.Canon.dsum($"l_quantity").as("qty"))
      .orderBy("l_orderkey")
  }

  /** One-step generation time travel (q80): two full refreshes land a
    * pre-restatement and a post-restatement monthly rollup in the same
    * stage-and-swap root; the query then reads BOTH the live
    * generation and its retained predecessor
    * ([[graft.ops.StagedRefresh.readPrevious]]) and reports the
    * per-status restatement delta — the audit question ("what did the
    * refresh change?") that overwrite-in-place loads cannot answer.
    * GC's keep-the-predecessor rule, originally for in-flight readers,
    * is thereby a queryable contract: a Delta/Iceberg-style previous-
    * snapshot read with a retention window of exactly one refresh.
    * Decimal sums on both sides make the delta exact (v2 restates
    * every 7th order's price by +100). */
  val q80 = QueryDef("q80_refresh_time_travel",
    """WITH v1 AS (
      |  SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s
      |  FROM orders GROUP BY 1),
      |v2 AS (
      |  SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
      |                       ELSE o_totalprice END AS DECIMAL(12,2))) AS DOUBLE) AS s
      |  FROM orders GROUP BY 1)
      |SELECT v2.status, v2.n AS n_current, v1.n AS n_previous,
      |  ROUND(v2.s - v1.s, 2) AS restated_delta
      |FROM v2 JOIN v1 USING (status) ORDER BY status""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ord = Tables.orders(s, dir)
    def rollup(price: org.apache.spark.sql.Column) =
      ord.select($"o_orderstatus".as("status"),
          price.cast("decimal(12,2)").as("price"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum($"price").as("s"))
    val v1 = rollup($"o_totalprice")
    val v2 = rollup(when($"o_orderkey" % 7 === 0, $"o_totalprice" + 100.0)
      .otherwise($"o_totalprice"))
    val root = loadScratch.computeIfAbsent(dir + "#tt",
      _ => java.nio.file.Files.createTempDirectory("graft_tt").toString + "/rollup")
    val (cur, prev) = root.synchronized {
      graft.ops.StagedRefresh.refresh(v1, root)
      graft.ops.StagedRefresh.refresh(v2, root)
      (graft.ops.StagedRefresh.readCurrent(s, root).localCheckpoint(),
        graft.ops.StagedRefresh.readPrevious(s, root).localCheckpoint())
    }
    cur.select($"status", $"n".as("n_current"), $"s".as("s_cur"))
      .join(prev.select($"status", $"n".as("n_previous"), $"s".as("s_prev")),
        Seq("status"))
      .select($"status", $"n_current", $"n_previous",
        round(($"s_cur" - $"s_prev").cast("double"), 2).as("restated_delta"))
      .orderBy("status")
  }

  /** Small-file compaction (q94): the `OPTIMIZE` table-maintenance
    * primitive ([[graft.ops.Compaction]]) composed with the atomic
    * stage-and-swap refresh. The load deliberately lands FRAGMENTED —
    * 64 round-robin files, the layout a micro-batched incremental
    * ingest leaves behind — then one `compact` rewrites the live
    * generation into target-size files behind the same atomic pointer
    * swap every refresh uses (zero reader downtime, GC spares the
    * fragmented predecessor for in-flight scans). The declared result
    * is the per-type rollup read back THROUGH the pointer after
    * compaction: hash-equality with the oracle's direct aggregate over
    * the source table proves the rewrite moved every row and invented
    * none — the only correctness contract compaction has. The file-
    * count collapse (64 → byte-sized handful) and idempotence
    * (re-compact = same file count) are pinned in CompactionSpec;
    * at 100 TB the rewrite is one read + one round-robin exchange +
    * one write of the live generation, and the payoff is scans that
    * open ceil(bytes/target) files instead of one per micro-batch. */
  val q94 = QueryDef("q94_compaction",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS val_sum
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val root = loadScratch.computeIfAbsent(dir + "#cmp",
      _ => java.nio.file.Files.createTempDirectory("graft_cmp").toString + "/events_tbl")
    root.synchronized {
      graft.ops.StagedRefresh.refresh(
        Tables.events(s, dir).repartition(64), root) // fragmented ingest layout
      graft.ops.Compaction.compact(s, root, targetBytes = 8L * 1024 * 1024)
      graft.ops.StagedRefresh.readCurrent(s, root).localCheckpoint()
    }
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"value").as("val_sum"))
      .orderBy("event_type")
  }

  val defs: Seq[QueryDef] = Seq(q45, q45b, q46, q46b, q46c, q50, q62, q64, q67,
    q80, q94)
}
