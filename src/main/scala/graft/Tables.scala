package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All relational queries in the engine take a `dir` (scale-factor
  * directory) and read the parquet tables lazily — filters/projections
  * are pushed into the parquet scan by Catalyst, which is the same
  * access path a production deployment would use against a large
  * partitioned table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize the physical encoding of `events.ts` to session-TZ
    * TIMESTAMP (the session is pinned to UTC in Verify/Bench/tests, so
    * every rendered value — and thus every oracle hash — is identical
    * across encodings). Driver testdata has shipped three layouts:
    *   - TIMESTAMP(NANOS): Spark only reads it as a nanos-since-epoch
    *     LONG (spark.sql.legacy.parquet.nanosAsLong) → truncate to
    *     micros, the same coercion DuckDB applies;
    *   - micros NTZ (timestamp[us], isAdjustedToUTC=false) → Spark's
    *     TIMESTAMP_NTZ, which `withWatermark` hard-rejects
    *     (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) → cast to TIMESTAMP,
    *     an identity under the UTC session;
    *   - micros UTC (isAdjustedToUTC=true) → already TIMESTAMP, no-op.
    * Policy documented in SURVEY.md §1.2 / FIXTURES.md. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  // CURRENT registered dir per session. Temp views are session-global,
  // so a (session, dir) *set* would wrongly no-op when a session
  // returns to a dir it saw before a different one was registered —
  // the views would silently still read the other dir's data. A weak
  // key lets dead sessions drop out (and an identityHashCode reused by
  // a new session can never alias a live entry).
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Register every table (plus the derived wallet_txs fixture) as a
    * temp view so SQL-text entry points (subqueries, CTEs) can run.
    * Idempotent while the session stays on one dir — the 11
    * createOrReplaceTempView calls + fixture plan construction are
    * pure constant overhead on every `_sql` query — but re-registers
    * whenever the requested dir differs from the last one. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.get(spark) != dir) {
        names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
        Fixtures.walletTxs(spark, dir).createOrReplaceTempView("wallet_txs")
        registeredDir.put(spark, dir)
      }
    }
}
