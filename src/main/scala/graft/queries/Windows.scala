package graft.queries

import graft.{Canon, Fixtures, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q21–Q24: window functions (ranking, analytic, frames) and
  * sort/limit/top-k — delegated warehouse surface
  * (resources/redshift.py:89-112).
  */
object Windows {

  val q21 = QueryDef("q21_window_rank",
    Fixtures.cte +
      """SELECT wallet_address, tx_hash,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        |  CAST(RANK() OVER (PARTITION BY wallet_address ORDER BY token_decimal) AS INTEGER) AS rk,
        |  CAST(DENSE_RANK() OVER (PARTITION BY wallet_address ORDER BY token_decimal) AS INTEGER) AS drk,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile
        |FROM wallet_txs
        |WINDOW w AS (PARTITION BY wallet_address ORDER BY block_number, tx_hash)
        |ORDER BY wallet_address, tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy("wallet_address").orderBy("block_number", "tx_hash")
    val wd = Window.partitionBy("wallet_address").orderBy("token_decimal")
    Fixtures.walletTxs(s, dir).select(
      $"wallet_address", $"tx_hash",
      row_number().over(w).as("rn"),
      rank().over(wd).as("rk"),
      dense_rank().over(wd).as("drk"),
      ntile(4).over(w).as("quartile"))
      .orderBy("wallet_address", "tx_hash")
  }

  val q22 = QueryDef("q22_window_analytic",
    Fixtures.cte +
      """SELECT wallet_address, tx_hash,
        |  ROUND(lag(quantity) OVER w, 6) AS prev_qty,
        |  ROUND(lead(quantity) OVER w, 6) AS next_qty,
        |  first_value(tx_hash) OVER w AS first_hash,
        |  last_value(tx_hash) OVER w AS running_last
        |FROM wallet_txs
        |WINDOW w AS (PARTITION BY wallet_address ORDER BY block_number, tx_hash)
        |ORDER BY wallet_address, tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy("wallet_address").orderBy("block_number", "tx_hash")
    Fixtures.walletTxs(s, dir).select(
      $"wallet_address", $"tx_hash",
      round(lag($"quantity", 1).over(w), 6).as("prev_qty"),
      round(lead($"quantity", 1).over(w), 6).as("next_qty"),
      first($"tx_hash").over(w).as("first_hash"),
      last($"tx_hash").over(w).as("running_last"))
      .orderBy("wallet_address", "tx_hash")
  }

  /** ROWS frame: exact-decimal running sum per wallet. */
  val q23 = QueryDef("q23_window_rows_frame",
    Fixtures.cte +
      """SELECT wallet_address, tx_hash,
        |  ROUND(CAST(SUM(CAST(quantity AS DECIMAL(28,6))) OVER (
        |    PARTITION BY wallet_address ORDER BY block_number, tx_hash
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS running_qty
        |FROM wallet_txs ORDER BY wallet_address, tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy("wallet_address").orderBy("block_number", "tx_hash")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Fixtures.walletTxs(s, dir).select(
      $"wallet_address", $"tx_hash",
      round(sum($"quantity".cast(Canon.Money)).over(w).cast("double"), 6)
        .as("running_qty"))
      .orderBy("wallet_address", "tx_hash")
  }

  /** Sort + limit (TakeOrderedAndProject) and per-group top-k. */
  val q24 = QueryDef("q24_topk",
    Fixtures.cte +
      """SELECT tx_hash, quantity FROM wallet_txs
        |ORDER BY quantity DESC, tx_hash LIMIT 10""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir).select("tx_hash", "quantity")
      .orderBy($"quantity".desc, $"tx_hash").limit(10)
  }

  val q24b = QueryDef("q24b_topk_per_group",
    Fixtures.cte +
      """SELECT wallet_address, tx_hash, quantity FROM (
        |  SELECT wallet_address, tx_hash, quantity,
        |    ROW_NUMBER() OVER (PARTITION BY wallet_address
        |      ORDER BY quantity DESC, tx_hash) AS rn
        |  FROM wallet_txs
        |) WHERE rn <= 3 ORDER BY wallet_address, quantity DESC, tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy("wallet_address").orderBy($"quantity".desc, $"tx_hash")
    Fixtures.walletTxs(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select("wallet_address", "tx_hash", "quantity")
      .orderBy($"wallet_address", $"quantity".desc, $"tx_hash")
  }

  val defs: Seq[QueryDef] = Seq(q21, q22, q23, q24, q24b)
}
