package graft.sources.polygonscan

/** One ERC-20 transfer record as the API returns it
  * (walletDataConsumer.py:94-103; values typed at the boundary). */
case class Tx(hash: String, blockNumber: Long, timeStamp: Long,
    from: String, to: String, contractAddress: String,
    tokenName: String, tokenSymbol: String, tokenDecimal: Int, value: String)

/** Pluggable page fetcher — the seam between the connector's
  * pagination/partitioning logic and the transport. */
trait PageSource extends Serializable {
  /** Return the `page`-th page (1-based, ≤ `offset` rows, ascending
    * block order) of transfers for `wallet` within [startBlock, endBlock]. */
  def fetch(wallet: String, startBlock: Long, endBlock: Long,
      page: Int, offset: Int): Seq[Tx]
}

/** Deterministic synthetic pages: wallet `0xwN` has
  * `(N%3+1)*offset + (N*7919 % offset)` transfers at blocks 0,1,2,…
  * — guaranteeing multi-page scans with a short final page (and an
  * exactly-full page for N%3 cases where the remainder is 0). The
  * identical arithmetic runs as the DuckDB oracle's generate_series
  * derivation, making the whole ingest pipeline hash-checkable. */
object FixturePageSource extends PageSource {
  def walletIndex(wallet: String): Int = wallet.stripPrefix("0xw").toInt
  def totalTxs(w: Int, offset: Int): Long = (w % 3 + 1).toLong * offset + w * 7919 % offset

  /** Simulated transport failure for error-tolerance tests (R17). */
  val failingWallet = "0xwFAIL"

  override def fetch(wallet: String, startBlock: Long, endBlock: Long,
      page: Int, offset: Int): Seq[Tx] = {
    if (wallet == failingWallet)
      throw new RuntimeException("simulated RequestException (R17)")
    val w = walletIndex(wallet)
    val n = totalTxs(w, offset)
    // blocks are 0..n-1 ascending; apply the server-side range first
    // (the API's startblock/endblock), then paginate the restriction.
    val lo = startBlock.max(0)
    val hi = endBlock.min(n - 1)
    val first = lo + (page - 1).toLong * offset
    val last = (first + offset - 1).min(hi)
    if (first > hi) Seq.empty
    else (first to last).map { b =>
      Tx(
        hash = s"0xh${w}_$b",
        blockNumber = b,
        timeStamp = 1700000000L + b * 60,
        from = s"0xf${(b * 31 + w) % 1000}",
        to = s"0xt${(b * 17 + w) % 1000}",
        contractAddress = s"0xc${b % 25}",
        tokenName = s"Token${b % 25}",
        tokenSymbol = s"TK${b % 25}",
        tokenDecimal = Seq(6, 8, 18, 0)((b % 4).toInt),
        value = ((b % 9 + 1) * 1000000L + w).toString)
    }
  }
}

/** Production transport: GET {baseUrl}/api?module=account&action=
  * tokentx&address=…&startblock=…&endblock=…&page=…&offset=…&sort=asc
  * &apikey=… (config/polygonscan.py:7, walletDataConsumer.py:57).
  *
  * Envelope semantics mirror the reference
  * (walletDataConsumer.py:60-80):
  *  - non-2xx HTTP → IOException (`raise_for_status`); the reader's
  *    permissive mode (R17) swallows it per wallet, failfast
  *    propagates;
  *  - `status == "1"` → `result` is the page's transfer list, every
  *    field a string (typed here at the boundary, as
  *    walletDataConsumer.py:92-104 does downstream);
  *  - any other `status` (including "No transactions found") → empty
  *    page, which cleanly ends the wallet's pagination loop;
  *  - malformed body → exception (same R17 handling as transport
  *    errors).
  *
  * The credential surface (R18): `apiKey` arrives as a connector
  * option — the Spark-idiomatic analog of the reference's Secrets
  * Manager lookup (config/polygonscan.py:20-29), which belongs to the
  * caller's environment, not inside the engine. `baseUrl` is
  * overridable so tests drive the full client against an in-process
  * stub server (production default: the reference's DEFAULT_HOST).
  */
case class HttpPageSource(baseUrl: String, apiKey: String,
    connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000,
    maxRetries: Int = 2, retryBackoffMs: Long = 500)
  extends PageSource {

  import com.fasterxml.jackson.databind.ObjectMapper

  /** Transient transport failures (IO errors, 5xx) retry up to
    * `maxRetries` times with linear backoff before surfacing to the
    * reader's permissive/failfast handling (R17) — a page-level retry
    * is strictly better than the reference's drop-the-whole-wallet
    * response to one flaky request. 4xx and envelope errors do NOT
    * retry (they are deterministic). */
  override def fetch(wallet: String, startBlock: Long, endBlock: Long,
      page: Int, offset: Int): Seq[Tx] = {
    var attempt = 0
    while (true) {
      try return fetchOnce(wallet, startBlock, endBlock, page, offset)
      catch {
        case e: java.io.IOException if attempt < maxRetries &&
            !e.isInstanceOf[ClientErrorException] =>
          attempt += 1
          if (retryBackoffMs > 0) Thread.sleep(retryBackoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Deterministic (non-retryable) HTTP client error. */
  final class ClientErrorException(msg: String) extends java.io.IOException(msg)

  private def fetchOnce(wallet: String, startBlock: Long, endBlock: Long,
      page: Int, offset: Int): Seq[Tx] = {
    val url = s"$baseUrl/api?module=account&action=tokentx&address=$wallet" +
      s"&startblock=$startBlock&endblock=$endBlock&page=$page&offset=$offset" +
      s"&sort=asc&apikey=${java.net.URLEncoder.encode(apiKey, "UTF-8")}"
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try {
      val code = conn.getResponseCode
      if (code >= 400 && code < 500)
        throw new ClientErrorException(
          s"HTTP $code from $baseUrl for wallet $wallet page $page")
      if (code < 200 || code >= 300)
        throw new java.io.IOException(
          s"HTTP $code from $baseUrl for wallet $wallet page $page")
      val in = conn.getInputStream
      val body =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val root = new ObjectMapper().readTree(body)
      if (root.path("status").asText() != "1") return Seq.empty
      val result = root.path("result")
      (0 until result.size()).map { i =>
        val tx = result.get(i)
        Tx(
          hash = tx.path("hash").asText(),
          blockNumber = tx.path("blockNumber").asText().toLong,
          timeStamp = tx.path("timeStamp").asText().toLong,
          from = tx.path("from").asText(),
          to = tx.path("to").asText(),
          contractAddress = tx.path("contractAddress").asText(),
          tokenName = tx.path("tokenName").asText(),
          tokenSymbol = tx.path("tokenSymbol").asText(),
          tokenDecimal = tx.path("tokenDecimal").asText().toInt,
          value = tx.path("value").asText())
      }
    } finally conn.disconnect()
  }
}

object HttpPageSource {
  /** The reference's production endpoint (config/polygonscan.py:7). */
  val DefaultHost = "https://api.polygonscan.com"
}
