package graft.queries

import graft.{Canon, Fixtures, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Q01–Q07: scans (parquet / CSV round-trip / raw JSON pages),
  * projection, filters, casts. SURVEY.md §2.2.
  */
object Scans {

  /** q02's CSV scratch dirs, one per dataset (see q02's comment). */
  private val csvScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** All wallet_txs columns, timestamps canonically rendered. */
  private def walletCanon(s: SparkSession, dir: String): DataFrame = {
    Fixtures.walletTxs(s, dir).select(
      col("wallet_address"), col("tx_hash"), col("block_number"),
      Canon.tsStr(col("tx_time")).as("tx_time"),
      col("from_address"), col("to_address"), col("token_contract"),
      col("token_name"), col("token_symbol"), col("token_decimal"),
      col("value_raw"), col("quantity"))
  }

  private val walletCanonSql =
    """SELECT wallet_address, tx_hash, block_number,
      |  strftime(tx_time, '%Y-%m-%d %H:%M:%S') AS tx_time,
      |  from_address, to_address, token_contract, token_name,
      |  token_symbol, token_decimal, value_raw, quantity
      |FROM wallet_txs""".stripMargin

  val q01 = QueryDef("q01_scan_parquet",
    Fixtures.cte + walletCanonSql + "\nORDER BY tx_hash") { (s, dir) =>
    walletCanon(s, dir).orderBy("tx_hash")
  }

  /** CSV round-trip (R12): write with header, read back with an explicit
    * schema — result must equal the parquet-derived original. */
  val q02 = QueryDef("q02_scan_csv",
    Fixtures.cte + walletCanonSql + "\nORDER BY tx_hash") { (s, dir) =>
    // scratch sink memoized per dataset: mode=overwrite fully replaces
    // the previous run's files, so one dir per (JVM, dataset) suffices —
    // a fresh dir per invocation accumulated a CSV copy per bench run
    val tmp = Scans.csvScratch.computeIfAbsent(dir,
      _ => java.nio.file.Files.createTempDirectory("graft_csv").toString)
    val schema = StructType(Seq(
      StructField("wallet_address", StringType), StructField("tx_hash", StringType),
      StructField("block_number", LongType), StructField("tx_time", StringType),
      StructField("from_address", StringType), StructField("to_address", StringType),
      StructField("token_contract", StringType), StructField("token_name", StringType),
      StructField("token_symbol", StringType), StructField("token_decimal", IntegerType),
      StructField("value_raw", LongType), StructField("quantity", DoubleType)))
    // write + readback under a per-dir lock (the map stores one String
    // instance per dataset, so it doubles as the lock), with the
    // readback pinned EAGERLY: mode=overwrite first deletes the dir's
    // files, so a concurrent invocation's lazily-consumed CSV scan
    // could read mid-replace; localCheckpoint materializes the rows
    // before the lock is released, decoupling the result from the
    // files (mirrors the bucketedDir lock in Ingest).
    tmp.synchronized {
      walletCanon(s, dir).write.mode("overwrite").option("header", true).csv(tmp)
      s.read.option("header", true).schema(schema).csv(tmp).localCheckpoint()
    }.orderBy("tx_hash")
  }

  /** Raw PolygonScan API pages (FIXTURES.md §1.2): envelope check (R2),
    * flatten, project/rename (R3), casts (R4), epoch→UTC render (R5),
    * wei rescale (R6), constant wallet column (R7).
    * Mirrors walletDataConsumer.py:64-66,92-104. */
  val apiPages: Seq[String] = Seq(
    """{"status":"1","message":"OK","result":[
      |{"hash":"0xh001","blockNumber":"100","timeStamp":"1609459200","from":"0xfa","to":"0xta","contractAddress":"0xc1","tokenName":"TokenA","tokenSymbol":"TKA","tokenDecimal":"6","value":"1500000"},
      |{"hash":"0xh002","blockNumber":"101","timeStamp":"1609462800","from":"0xfb","to":"0xtb","contractAddress":"0xc2","tokenName":"TokenB","tokenSymbol":"TKB","tokenDecimal":"18","value":"2000000000000000000"},
      |{"hash":"0xh003","blockNumber":"102","timeStamp":"1609466400","from":"0xfc","to":"0xtc","contractAddress":"0xc1","tokenName":"TokenA","tokenSymbol":"TKA","tokenDecimal":"0","value":"42"}]}""".stripMargin.replace("\n", ""),
    """{"status":"1","message":"OK","result":[
      |{"hash":"0xh004","blockNumber":"200","timeStamp":"1612137600","from":"0xfd","to":"0xtd","contractAddress":"0xc3","tokenName":"TokenC","tokenSymbol":"TKC","tokenDecimal":"8","value":"123456789"},
      |{"hash":"0xh005","blockNumber":"201","timeStamp":"1612141200","from":"0xfe","to":"0xte","contractAddress":"0xc1","tokenName":"TokenA","tokenSymbol":"TKA","tokenDecimal":"6","value":"1000001"}]}""".stripMargin.replace("\n", ""),
    """{"status":"0","message":"No transactions found","result":[]}""")

  val txStruct = StructType(Seq("hash", "blockNumber", "timeStamp", "from", "to",
    "contractAddress", "tokenName", "tokenSymbol", "tokenDecimal", "value")
    .map(StructField(_, StringType)))
  val envelopeSchema: StructType = StructType(Seq(
    StructField("status", StringType), StructField("message", StringType),
    StructField("result", ArrayType(txStruct))))

  /** The R2–R7 transform pipeline, reusable by the ingestion connector. */
  def transformPages(s: SparkSession, pages: DataFrame, wallet: String): DataFrame = {
    pages
      .select(from_json(col("body"), envelopeSchema).as("p"))
      .filter(col("p.status") === "1")
      .select(explode(col("p.result")).as("tx"))
      .select(
        lit(wallet).as("wallet_address"),
        col("tx.hash").as("tx_hash"),
        col("tx.blockNumber").cast(LongType).as("block_number"),
        Canon.tsStr(to_timestamp(from_unixtime(col("tx.timeStamp").cast(LongType)))).as("tx_time"),
        col("tx.from").as("from_address"),
        col("tx.to").as("to_address"),
        col("tx.contractAddress").as("token_contract"),
        col("tx.tokenName").as("token_name"),
        col("tx.tokenSymbol").as("token_symbol"),
        col("tx.tokenDecimal").cast(IntegerType).as("token_decimal"),
        (col("tx.value").cast(DoubleType) / pow(lit(10), col("tx.tokenDecimal").cast(IntegerType))).as("quantity"))
  }

  val q03 = QueryDef("q03_scan_json_pages",
    """SELECT * FROM (VALUES
      |  ('0xw1','0xh001',CAST(100 AS BIGINT),'2021-01-01 00:00:00','0xfa','0xta','0xc1','TokenA','TKA',CAST(6 AS INTEGER),CAST(1.5 AS DOUBLE)),
      |  ('0xw1','0xh002',CAST(101 AS BIGINT),'2021-01-01 01:00:00','0xfb','0xtb','0xc2','TokenB','TKB',CAST(18 AS INTEGER),CAST(2.0 AS DOUBLE)),
      |  ('0xw1','0xh003',CAST(102 AS BIGINT),'2021-01-01 02:00:00','0xfc','0xtc','0xc1','TokenA','TKA',CAST(0 AS INTEGER),CAST(42.0 AS DOUBLE)),
      |  ('0xw1','0xh004',CAST(200 AS BIGINT),'2021-02-01 00:00:00','0xfd','0xtd','0xc3','TokenC','TKC',CAST(8 AS INTEGER),CAST(1.23456789 AS DOUBLE)),
      |  ('0xw1','0xh005',CAST(201 AS BIGINT),'2021-02-01 01:00:00','0xfe','0xte','0xc1','TokenA','TKA',CAST(6 AS INTEGER),CAST(1.000001 AS DOUBLE))
      |) t(wallet_address, tx_hash, block_number, tx_time, from_address, to_address,
      |    token_contract, token_name, token_symbol, token_decimal, quantity)
      |ORDER BY tx_hash""".stripMargin) { (s, _) =>
    import s.implicits._
    transformPages(s, apiPages.toDF("body"), "0xw1").orderBy("tx_hash")
  }

  val q04 = QueryDef("q04_projection",
    Fixtures.cte +
      "SELECT tx_hash, block_number FROM wallet_txs ORDER BY tx_hash") { (s, dir) =>
    Fixtures.walletTxs(s, dir).select("tx_hash", "block_number").orderBy("tx_hash")
  }

  val q05 = QueryDef("q05_filter_conj",
    Fixtures.cte +
      """SELECT tx_hash, token_symbol, quantity FROM wallet_txs
        |WHERE quantity > 100 AND token_symbol = 'TK6'
        |ORDER BY tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir)
      .filter($"quantity" > 100 && $"token_symbol" === "TK6")
      .select("tx_hash", "token_symbol", "quantity")
      .orderBy("tx_hash")
  }

  val q06 = QueryDef("q06_filter_null_in",
    Fixtures.cte +
      """SELECT tx_hash, to_address, token_name FROM wallet_txs
        |WHERE to_address IN ('0xt3', '0xt16', '0xt29') OR token_name IS NULL
        |ORDER BY tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir)
      .filter($"to_address".isin("0xt3", "0xt16", "0xt29") || $"token_name".isNull)
      .select("tx_hash", "to_address", "token_name")
      .orderBy("tx_hash")
  }

  val q07 = QueryDef("q07_casts",
    Fixtures.cte +
      """SELECT tx_hash,
        |  CAST(block_number AS VARCHAR) AS bn_str,
        |  CAST(token_decimal AS BIGINT) AS td_long,
        |  CAST(block_number AS DOUBLE) AS bn_dbl,
        |  CAST(substr(tx_hash, 4) AS BIGINT) AS hash_num
        |FROM wallet_txs ORDER BY tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir).select(
      $"tx_hash",
      $"block_number".cast(StringType).as("bn_str"),
      $"token_decimal".cast(LongType).as("td_long"),
      $"block_number".cast(DoubleType).as("bn_dbl"),
      substring($"tx_hash", 4, 1000000).cast(LongType).as("hash_num"))
      .orderBy("tx_hash")
  }

  val defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07)
}
