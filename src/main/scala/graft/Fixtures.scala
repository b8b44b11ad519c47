package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `wallet_txs` fixture — the engine's core table, shaped exactly
  * like the reference's output projection (walletDataConsumer.py:92-104,
  * FIXTURES.md §1.1).
  *
  * The driver's DuckDB oracle can only see the parquet tables in the
  * scale-factor directory, so the fixture is *derived deterministically
  * from `events`* with portable expressions: the identical derivation
  * runs as a SQL CTE on the DuckDB side ([[cte]]), making every
  * wallet_txs query oracle-checkable.
  *
  * Numeric design (cross-engine determinism): `quantity` is always
  * `v / 1e6` for an integer v ≤ 9.99e8 — a 6-decimal-terminating value
  * of bounded magnitude. DuckDB casts/rounds doubles via scaled double
  * arithmetic (not exact decimal like Spark), which diverges near
  * midpoints and at magnitudes where ulp(x*10^6) matters; terminating
  * 6-dp values of magnitude ≤ 1e3 are exact under BOTH schemes, so
  * every decimal-accumulated aggregate of quantity hash-matches.
  * `value_raw` still exercises the >2^53 range (token_decimal=18 rows
  * reach 9e18, the reference's 256-bit wei scenario, SURVEY §0.1-3):
  * v*10^12 stays exactly representable as double (v ≤ 9e6 → v·5^12 <
  * 2^53), so quantity = value_raw/10^d is bit-identical on both sides.
  *
  * Column semantics mirror the reference:
  *  - wallet_address: driving wallet, 29 distinct (WALLET_ADDRESSES,
  *    walletDataConsumer.py:11-41)
  *  - quantity = value / 10^token_decimal (walletDataConsumer.py:103)
  *  - nullable to_address / token_name for null-predicate coverage
  */
object Fixtures {

  /** Scratch parquet per (JVM, dataset) for the materialized fixture. */
  private val matScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The wallet_txs relation every query consumes: the [[walletTxsDerived]]
    * expression view MATERIALIZED once per (JVM, dataset) to a scratch
    * parquet and read back (round-12 verdict item 5). The expression
    * view computed every column at plan time, so scans over it could
    * never push a filter into a parquet reader (EXPLAINS r12 q05:
    * `PushedFilters: []`) — production-shaped queries scan a real
    * table. The derivation is deterministic and every column type
    * (string/long/int/double/timestamp-micros) round-trips parquet
    * bit-exactly, so results — and the DuckDB oracle CTE, which still
    * derives the same rows from `events` — are unchanged. The write
    * happens at most once per dataset (computeIfAbsent is atomic per
    * key) and lands in Bench's untimed warmup, never in a timing. */
  def walletTxs(spark: SparkSession, dir: String): DataFrame = {
    val path = matScratch.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_wtx")
        .resolve("wallet_txs.parquet").toString
      walletTxsDerived(spark, dir).write.parquet(d)
      d
    })
    spark.read.parquet(path)
  }

  /** The fixture DERIVATION (see object doc): wallet_txs as pure
    * expressions over `events` — the writer behind [[walletTxs]] and
    * the exact twin of the oracle's [[cte]]. */
  def walletTxsDerived(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val base = $"event_id" * 31 + $"user_id" * 7
    val dec = when($"event_id" % 4 === 0, 0)
      .when($"event_id" % 4 === 1, 6)
      .when($"event_id" % 4 === 2, 8)
      .otherwise(18).cast("int")
    val valueRaw = when($"event_id" % 4 === 0, base % 99999 + 1)
      .when($"event_id" % 4 === 1, base % 999999937 + 1)
      .when($"event_id" % 4 === 2, (base % 999999937 + 1) * 100L)
      .otherwise((base % 8999999 + 1) * 1000000000000L)
    e.select(
      concat(lit("0x"), lpad(($"user_id" % 29).cast("string"), 40, "0"))
        .as("wallet_address"),
      concat(lit("0xh"), $"event_id".cast("string")).as("tx_hash"),
      ($"event_id" * 7 + $"user_id").as("block_number"),
      $"ts".as("tx_time"),
      concat(lit("0xf"), $"user_id".cast("string")).as("from_address"),
      when($"event_id" % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("0xt"), (($"user_id" * 13 + 3) % 97).cast("string")))
        .as("to_address"),
      concat(lit("0xc"), ($"event_id" % 50).cast("string")).as("token_contract"),
      when($"event_id" % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("Token"), ($"event_id" % 50).cast("string")))
        .as("token_name"),
      concat(lit("TK"), ($"event_id" % 50).cast("string")).as("token_symbol"),
      dec.as("token_decimal"),
      valueRaw.as("value_raw"))
    .withColumn("quantity",
      $"value_raw".cast("double") / pow(lit(10), $"token_decimal"))
  }

  /** The identical derivation as a DuckDB-runnable SELECT body. */
  val walletTxsSelect: String = """
    SELECT
      concat('0x', lpad(CAST(user_id % 29 AS VARCHAR), 40, '0')) AS wallet_address,
      concat('0xh', CAST(event_id AS VARCHAR)) AS tx_hash,
      event_id * 7 + user_id AS block_number,
      ts AS tx_time,
      concat('0xf', CAST(user_id AS VARCHAR)) AS from_address,
      CASE WHEN event_id % 10 = 0 THEN NULL
           ELSE concat('0xt', CAST((user_id * 13 + 3) % 97 AS VARCHAR)) END AS to_address,
      concat('0xc', CAST(event_id % 50 AS VARCHAR)) AS token_contract,
      CASE WHEN event_id % 11 = 0 THEN NULL
           ELSE concat('Token', CAST(event_id % 50 AS VARCHAR)) END AS token_name,
      concat('TK', CAST(event_id % 50 AS VARCHAR)) AS token_symbol,
      CAST(CASE event_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 6 WHEN 2 THEN 8 ELSE 18 END AS INTEGER) AS token_decimal,
      CASE event_id % 4
        WHEN 0 THEN (event_id * 31 + user_id * 7) % 99999 + 1
        WHEN 1 THEN (event_id * 31 + user_id * 7) % 999999937 + 1
        WHEN 2 THEN ((event_id * 31 + user_id * 7) % 999999937 + 1) * 100
        ELSE ((event_id * 31 + user_id * 7) % 8999999 + 1) * 1000000000000
      END AS value_raw,
      CAST(CASE event_id % 4
        WHEN 0 THEN (event_id * 31 + user_id * 7) % 99999 + 1
        WHEN 1 THEN (event_id * 31 + user_id * 7) % 999999937 + 1
        WHEN 2 THEN ((event_id * 31 + user_id * 7) % 999999937 + 1) * 100
        ELSE ((event_id * 31 + user_id * 7) % 8999999 + 1) * 1000000000000
      END AS DOUBLE) / power(10, CASE event_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 6 WHEN 2 THEN 8 ELSE 18 END) AS quantity
    FROM events"""

  /** `WITH wallet_txs AS (…)` prefix for oracle SQL. */
  val cte: String = s"WITH wallet_txs AS ($walletTxsSelect)\n"
}
