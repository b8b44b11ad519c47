package graft.sources.polygonscan

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Or}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's paginated REST scan
  * (R1, `fetch_erc20_token_transfers`, walletDataConsumer.py:51-83),
  * re-architected Spark-first:
  *
  *  - the reference fetches 29 wallets sequentially on one thread
  *    (walletDataConsumer.py:126-133); here each wallet is an
  *    `InputPartition`, so a cluster scans wallets in parallel and a
  *    1000-executor job ingests 1000 wallets concurrently;
  *  - the reference's pagination bug (page never re-interpolated into
  *    the URL, walletDataConsumer.py:57,73 — SURVEY §0.1-1) is fixed:
  *    the reader advances `page` until a short page arrives, honoring
  *    the documented contract;
  *  - `block_number` range predicates push down into the scan as the
  *    API's `startblock`/`endblock` parameters (the only pushdown the
  *    upstream API supports, walletDataConsumer.py:51), so Catalyst
  *    filters become server-side range restriction;
  *  - `wallet_address` `=`/`IN` predicates prune the per-wallet
  *    `InputPartition` list (the wallet list IS the scan driver,
  *    walletDataConsumer.py:126-128): filtering to 2 of 1000 wallets
  *    plans 2 partitions and fetches nothing else;
  *  - column pruning pushes down (`SupportsPushDownRequiredColumns`);
  *  - per-source error tolerance mirrors the reference's swallowed
  *    RequestException (walletDataConsumer.py:78-80): mode=permissive
  *    skips a failing wallet, mode=failfast propagates.
  *
  * Usage:
  * {{{
  * spark.read.format("polygonscan")
  *   .option("wallets", "0xw0,0xw1")
  *   .option("pageSize", "100")          // the reference's `offset`
  *   .option("source", "fixture")        // or "http" in production
  *   .option("apikey", "…")              // http: credential (R18)
  *   .option("baseUrl", "https://…")     // http: endpoint override
  *   .load()
  * }}}
  */
class PolygonscanSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "polygonscan"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PolygonscanSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PolygonscanTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object PolygonscanSource {
  /** Raw scan schema: API fields (walletDataConsumer.py:94-103) typed
    * at the connector boundary; `value` stays string (256-bit wei). */
  val schema: StructType = StructType(Seq(
    StructField("wallet_address", StringType),
    StructField("hash", StringType),
    StructField("block_number", LongType),
    StructField("time_stamp", LongType),
    StructField("from_address", StringType),
    StructField("to_address", StringType),
    StructField("contract_address", StringType),
    StructField("token_name", StringType),
    StructField("token_symbol", StringType),
    StructField("token_decimal", IntegerType),
    StructField("value", StringType)))
}

class PolygonscanTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "polygonscan"
  override def schema(): StructType = PolygonscanSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new PolygonscanScanBuilder(options)
}

class PolygonscanScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var startBlock = 0L
  private var endBlock = 99999999L // the reference's default endblock
  // None = no wallet predicate; Some(s) = only wallets in s survive.
  // Each InputPartition serves exactly one wallet and stamps
  // `wallet_address` as that constant, so EqualTo/In on it are
  // satisfied COMPLETELY by partition pruning — the connector-side
  // mirror of the reference's wallet loop (walletDataConsumer.py:126-128),
  // where the wallet list IS the scan driver.
  private var walletSet: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = PolygonscanSource.schema

  /** The wallet set a filter restricts to, if it is built ONLY from
    * wallet equalities: `=`, `IN`, and `OR`-trees of those (the shapes
    * `w === a || w === b` and `w.isin(...)` plan to). null literals
    * can't equal any wallet (SQL null semantics drop the row), so
    * skipping them prunes exactly as the filter would. */
  private def walletValues(f: Filter): Option[Set[String]] = f match {
    case EqualTo("wallet_address", v: String) => Some(Set(v))
    // `<=>` never evaluates to NULL: for a non-null literal it is
    // exactly EqualTo here, and `<=> NULL` keeps only null-wallet rows
    // — every connector row stamps its partition's non-null wallet
    // constant, so the empty wallet set prunes exactly.
    case EqualNullSafe("wallet_address", v) if v == null || v.isInstanceOf[String] =>
      Some(Option(v).map(_.asInstanceOf[String]).toSet)
    case In("wallet_address", vs) if vs.forall(v => v == null || v.isInstanceOf[String]) =>
      Some(vs.collect { case s: String => s }.toSet)
    case Or(l, r) =>
      for { a <- walletValues(l); b <- walletValues(r) } yield a union b
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("block_number", _: Long) => true
      case GreaterThan("block_number", _: Long) => true
      case LessThanOrEqual("block_number", _: Long) => true
      case LessThan("block_number", _: Long) => true
      case f => walletValues(f).isDefined
    }
    def intersect(ws: Set[String]): Unit =
      walletSet = Some(walletSet.fold(ws)(_ intersect ws))
    accepted.foreach {
      case GreaterThanOrEqual("block_number", v: Long) => startBlock = startBlock.max(v)
      case GreaterThan("block_number", v: Long) => startBlock = startBlock.max(v + 1)
      case LessThanOrEqual("block_number", v: Long) => endBlock = endBlock.min(v)
      case LessThan("block_number", v: Long) => endBlock = endBlock.min(v - 1)
      case f => walletValues(f).foreach(intersect)
    }
    pushed = accepted
    rejected // residual filters Spark must still apply
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan = new PolygonscanScan(
    options.getOrDefault("wallets", "").split(",").map(_.trim).filter(_.nonEmpty)
      .filter(w => walletSet.forall(_.contains(w))), // partition pruning
    startBlock, endBlock,
    options.getOrDefault("pageSize", "10000").toInt,
    options.getOrDefault("source", "fixture"),
    options.getOrDefault("mode", "permissive"),
    options.getOrDefault("baseUrl", HttpPageSource.DefaultHost),
    options.getOrDefault("apikey", ""),
    options.getOrDefault("maxRetries", "2").toInt,
    options.getOrDefault("retryBackoffMs", "500").toLong,
    requiredSchema)
}

class PolygonscanScan(wallets: Array[String], startBlock: Long, endBlock: Long,
    pageSize: Int, source: String, mode: String, baseUrl: String,
    apiKey: String, maxRetries: Int, retryBackoffMs: Long,
    required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"polygonscan wallets=${wallets.length} blocks=[$startBlock,$endBlock] pageSize=$pageSize"

  override def planInputPartitions(): Array[InputPartition] =
    // contradictory range (e.g. b > 100 AND b < 50): nothing can match,
    // so plan NO partitions — readers would otherwise issue one empty
    // probe request per wallet
    if (startBlock > endBlock) Array.empty
    else wallets.map(w => WalletPartition(w, startBlock, endBlock, pageSize,
      source, mode, baseUrl, apiKey, maxRetries, retryBackoffMs))

  override def createReaderFactory(): PartitionReaderFactory =
    new WalletReaderFactory(required)
}

/** One wallet = one partition: the unit of parallel ingest. */
case class WalletPartition(wallet: String, startBlock: Long, endBlock: Long,
    pageSize: Int, source: String, mode: String, baseUrl: String,
    apiKey: String, maxRetries: Int, retryBackoffMs: Long)
  extends InputPartition

class WalletReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val wp = p.asInstanceOf[WalletPartition]
    new WalletReader(wp, required)
  }
}

class WalletReader(p: WalletPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val pages: PageSource = p.source match {
    case "fixture" => FixturePageSource
    case "http" =>
      HttpPageSource(p.baseUrl, p.apiKey,
        maxRetries = p.maxRetries, retryBackoffMs = p.retryBackoffMs)
    case other => throw new IllegalArgumentException(s"unknown source: $other")
  }

  // correct pagination (SURVEY §0.1-1): advance `page` until a short
  // page; each fetch re-parameterizes the request. Fetching is lazy —
  // failures surface in next()/hasNext, where the R17 permissive guard
  // lives.
  private val iter: Iterator[Tx] = new Iterator[Tx] {
    private var page = 1
    private var buf: Seq[Tx] = Seq.empty
    private var i = 0
    private var exhausted = false
    private def refill(): Unit = {
      while (!exhausted && i >= buf.length) {
        buf = pages.fetch(p.wallet, p.startBlock, p.endBlock, page, p.pageSize)
        i = 0
        if (buf.length < p.pageSize) exhausted = true // short page ends scan
        page += 1
        if (buf.isEmpty) return
      }
    }
    override def hasNext: Boolean = { if (i >= buf.length) refill(); i < buf.length }
    override def next(): Tx = { val t = buf(i); i += 1; t }
  }

  private var current: Tx = _
  private val fieldIdx = required.fieldNames.map(PolygonscanSource.schema.fieldIndex)

  override def next(): Boolean = {
    val has =
      try iter.hasNext
      catch { case e: Exception if p.mode == "permissive" => false }
    if (has) current = iter.next()
    has
  }

  override def get(): InternalRow = {
    val full: Array[Any] = Array(
      UTF8String.fromString(p.wallet), UTF8String.fromString(current.hash),
      current.blockNumber, current.timeStamp,
      UTF8String.fromString(current.from), UTF8String.fromString(current.to),
      UTF8String.fromString(current.contractAddress),
      UTF8String.fromString(current.tokenName),
      UTF8String.fromString(current.tokenSymbol),
      current.tokenDecimal, UTF8String.fromString(current.value))
    new GenericInternalRow(fieldIdx.map(full))
  }

  override def close(): Unit = ()
}
