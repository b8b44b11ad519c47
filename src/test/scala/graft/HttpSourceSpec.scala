package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.polygonscan.FixturePageSource
import org.apache.spark.sql.DataFrame

/** R1/R17/R18: the HTTP transport driven end-to-end against an
  * in-process stub server that speaks the polygonscan envelope
  * (walletDataConsumer.py:57-80) — multi-page scans, short pages,
  * "no transactions" envelopes, server errors, and the apikey
  * credential option. */
class HttpSourceSpec extends SparkSpec {

  /** Stub polygonscan API: pages generated from FixturePageSource so
    * HTTP results are comparable to fixture-source results. Special
    * wallets: `0xwERR` → status-0 envelope; `0xw500` → HTTP 500. */
  private def withStubServer(f: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new AtomicInteger(0)
    val keyed = new AtomicInteger(0) // requests carrying the expected apikey
    server.createContext("/api", (ex: HttpExchange) => {
      requests.incrementAndGet()
      val params = ex.getRequestURI.getRawQuery.split("&")
        .map(_.split("=", 2)).map(kv => kv(0) -> kv.lift(1).getOrElse("")).toMap
      if (params.get("apikey").contains("sekret")) keyed.incrementAndGet()
      val wallet = params("address")
      def respond(code: Int, body: String): Unit = {
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
      wallet match {
        case "0xw500" => respond(500, """{"status":"0","message":"NOTOK"}""")
        case "0xwFLAKY" =>
          // transient: first two requests 500, then behave as wallet 3
          if (requests.get() <= 2) respond(500, """{"status":"0","message":"NOTOK"}""")
          else {
            val txs = FixturePageSource.fetch("0xw3",
              params("startblock").toLong, params("endblock").toLong,
              params("page").toInt, params("offset").toInt)
            val rows = txs.map { t =>
              s"""{"hash":"${t.hash}","blockNumber":"${t.blockNumber}",""" +
                s""""timeStamp":"${t.timeStamp}","from":"${t.from}","to":"${t.to}",""" +
                s""""contractAddress":"${t.contractAddress}","tokenName":"${t.tokenName}",""" +
                s""""tokenSymbol":"${t.tokenSymbol}","tokenDecimal":"${t.tokenDecimal}",""" +
                s""""value":"${t.value}"}"""
            }.mkString("[", ",", "]")
            respond(200, s"""{"status":"1","message":"OK","result":$rows}""")
          }
        case "0xwERR" =>
          respond(200, """{"status":"0","message":"No transactions found","result":[]}""")
        case w =>
          val txs = FixturePageSource.fetch(w,
            params("startblock").toLong, params("endblock").toLong,
            params("page").toInt, params("offset").toInt)
          val rows = txs.map { t =>
            s"""{"hash":"${t.hash}","blockNumber":"${t.blockNumber}",""" +
              s""""timeStamp":"${t.timeStamp}","from":"${t.from}","to":"${t.to}",""" +
              s""""contractAddress":"${t.contractAddress}","tokenName":"${t.tokenName}",""" +
              s""""tokenSymbol":"${t.tokenSymbol}","tokenDecimal":"${t.tokenDecimal}",""" +
              s""""value":"${t.value}"}"""
          }.mkString("[", ",", "]")
          respond(200, s"""{"status":"1","message":"OK","result":$rows}""")
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", requests, keyed)
    finally server.stop(0)
  }

  private def readHttp(baseUrl: String, wallets: String, mode: String = "permissive",
      pageSize: Int = 100, maxRetries: Int = 2): DataFrame =
    spark.read.format("polygonscan")
      .option("wallets", wallets).option("pageSize", pageSize.toString)
      .option("source", "http").option("baseUrl", baseUrl)
      .option("apikey", "sekret").option("mode", mode)
      .option("maxRetries", maxRetries.toString)
      .option("retryBackoffMs", "0") // keep specs fast
      .load()

  test("multi-page HTTP scan equals the fixture source, apikey forwarded") {
    withStubServer { (base, requests, keyed) =>
      // sort driver-side: a Spark orderBy adds a range-sampling pass
      // that would double-count page requests
      def sorted(df: DataFrame) =
        df.collect().sortBy(r => (r.getString(0), r.getLong(2)))
      val h = sorted(readHttp(base, "0xw5,0xw7"))
      val f = sorted(spark.read.format("polygonscan")
        .option("wallets", "0xw5,0xw7").option("pageSize", "100")
        .option("source", "fixture").load())
      assert(h.length == f.length && h.sameElements(f),
        s"http scan (${h.length} rows) diverges from fixture (${f.length})")
      // wallet 0xw5: (5%3+1)*100 + 5*7919%100 = 395 txs → pages 1-4,
      // last short; wallet 0xw7: (7%3+1)*100+43 = 243 → pages 1-3
      assert(requests.get() == 7, s"expected 7 page requests, saw ${requests.get()}")
      assert(keyed.get() == requests.get(), "apikey missing from some requests")
    }
  }

  test("status-0 'No transactions found' envelope ends the scan cleanly") {
    withStubServer { (base, _, _) =>
      assert(readHttp(base, "0xwERR").count() == 0)
    }
  }

  test("HTTP 5xx: permissive skips the wallet, failfast propagates (R17)") {
    withStubServer { (base, _, _) =>
      // permissive: the healthy wallet's rows survive the broken one
      val ok = readHttp(base, "0xw1,0xw500")
      assert(ok.count() ==
        FixturePageSource.totalTxs(1, 100),
        "permissive mode must keep healthy wallets")
      val e = intercept[Exception] {
        readHttp(base, "0xw1,0xw500", mode = "failfast").count()
      }
      assert(e.getMessage != null)
    }
  }

  test("transient 5xx pages succeed after bounded retry (R17)") {
    withStubServer { (base, _, _) =>
      // two 500s then healthy: retries recover the full wallet
      val rows = readHttp(base, "0xwFLAKY", maxRetries = 2).count()
      assert(rows == FixturePageSource.totalTxs(3, 100),
        s"retry should recover the wallet, got $rows rows")
    }
    withStubServer { (base, _, _) =>
      // retries disabled: permissive mode drops the flaky wallet
      assert(readHttp(base, "0xwFLAKY", maxRetries = 0).count() == 0)
    }
  }

  test("wallet pruning: filtered-out wallets issue ZERO HTTP requests") {
    withStubServer { (base, requests, _) =>
      import spark.implicits._
      // 3 configured wallets, predicate keeps one: only 0xw7's pages
      // (243 txs @100/page -> 3 requests) may reach the server
      val rows = readHttp(base, "0xw5,0xw7,0xw8")
        .filter($"wallet_address" === "0xw7").count()
      assert(rows == FixturePageSource.totalTxs(7, 100))
      assert(requests.get() == 3,
        s"pruned wallets must not be fetched; saw ${requests.get()} requests")
    }
  }

  test("block-range pushdown reaches the HTTP request parameters") {
    withStubServer { (base, requests, _) =>
      import spark.implicits._
      val df = readHttp(base, "0xw5")
        .filter($"block_number" >= 100 && $"block_number" <= 150)
      // server-side restriction: 51 rows in one page, one request
      assert(df.count() == 51)
      assert(requests.get() == 1,
        s"range pushdown should need exactly 1 page request, saw ${requests.get()}")
    }
  }
}
