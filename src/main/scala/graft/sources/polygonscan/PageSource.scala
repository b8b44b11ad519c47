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

/** Production transport: GET api.polygonscan.com/api?module=account&
  * action=tokentx&address=…&startblock=…&endblock=…&page=…&offset=…
  * &sort=asc (config/polygonscan.py:7-29). Not exercised in this
  * zero-egress environment; the connector's partitioning, pagination
  * and pushdown logic above is transport-independent. */
object HttpPageSource extends PageSource {
  override def fetch(wallet: String, startBlock: Long, endBlock: Long,
      page: Int, offset: Int): Seq[Tx] =
    throw new UnsupportedOperationException(
      "HTTP transport requires network access; inject a PageSource or use source=fixture")
}
