package graft.queries

import graft.{Canon, Fixtures, Tables}
import graft.functions.{CharNGrams, WeiToToken, WeightedAvg}
import org.apache.spark.sql.functions._

/** Q40: the extension surface — Scala UDF, native Catalyst
  * `Expression` (codegen), typed `Aggregator` UDAF, custom `Generator`
  * UDTF, plus the builtin explode/posexplode generators.
  */
object Extensions {

  /** Scala UDF vs native codegen Expression vs builtin composition —
    * all three must agree bit-for-bit with the oracle's arithmetic. */
  val q40a = QueryDef("q40a_udf_and_expression",
    Fixtures.cte +
      """SELECT tx_hash,
        |  CAST(value_raw AS DOUBLE) / power(10, token_decimal) AS qty_expr,
        |  CAST(value_raw AS DOUBLE) / power(10, token_decimal) AS qty_udf,
        |  CAST(value_raw AS DOUBLE) / power(10, token_decimal) AS qty_native
        |FROM wallet_txs ORDER BY tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    WeiToToken.register(s)
    val weiUdf = udf((v: Long, d: Int) => v.toDouble / math.pow(10.0, d.toDouble))
    Fixtures.walletTxs(s, dir).select(
      $"tx_hash",
      ($"value_raw".cast("double") / pow(lit(10), $"token_decimal")).as("qty_expr"),
      weiUdf($"value_raw", $"token_decimal").as("qty_udf"),
      expr("wei_to_token(value_raw, token_decimal)").as("qty_native"))
      .orderBy("tx_hash")
  }

  /** Typed Aggregator UDAF: quantity-weighted average price. */
  val q40b = QueryDef("q40b_udaf_weighted_avg",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wavg = udaf(new WeightedAvg())
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** Custom Generator UDTF (char 3-grams) + builtin posexplode. */
  val q40c = QueryDef("q40c_generator_ngrams",
    Fixtures.cte +
      """SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT substr(token_symbol, g.i, 3) AS gram
        |      FROM wallet_txs, generate_series(1, 16) AS g(i)
        |      WHERE g.i <= length(token_symbol) - 2)
        |GROUP BY gram ORDER BY gram""".stripMargin) { (s, dir) =>
    import s.implicits._
    CharNGrams.register(s)
    Tables.registerViews(s, dir)
    s.sql("""SELECT gram, COUNT(*) AS cnt
            |FROM (SELECT char_ngrams(token_symbol, 3) AS gram FROM wallet_txs)
            |GROUP BY gram ORDER BY gram""".stripMargin)
  }

  /** Builtin generators: posexplode of whitespace-split text. */
  val q40d = QueryDef("q40d_posexplode",
    """SELECT doc_id, CAST(pos AS INTEGER) AS pos, token
      |FROM (SELECT doc_id,
      |        UNNEST(string_split(text, ' ')) AS token,
      |        UNNEST(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
      |      FROM documents
      |      WHERE doc_id % 100 = 0)
      |WHERE token <> ''
      |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"doc_id" % 100 === 0)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
      .filter($"token" =!= "")
      .orderBy("doc_id", "pos")
  }

  /** explode_outer: null arrays keep their row (null element) —
    * DuckDB's UNNEST drops them, so the oracle wraps null in [NULL]. */
  val q40e = QueryDef("q40e_explode_outer",
    Fixtures.cte +
      """SELECT tx_hash, part FROM (
        |  SELECT tx_hash,
        |    UNNEST(CASE WHEN to_address IS NULL THEN [NULL]
        |                ELSE string_split(to_address, 'x') END) AS part
        |  FROM wallet_txs)
        |ORDER BY tx_hash, part NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir)
      .select($"tx_hash", explode_outer(split($"to_address", "x")).as("part"))
      .orderBy($"tx_hash", $"part".asc_nulls_first)
  }

  /** TypedImperativeAggregate surface: space-saving heavy hitters.
    * capacity 64 ≥ 50 distinct symbols → exact → oracle = plain
    * top-10 group counts. */
  val q40f = QueryDef("q40f_imperative_topk",
    Fixtures.cte +
      """SELECT token_symbol AS value, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM wallet_txs GROUP BY token_symbol
        |ORDER BY cnt DESC, value LIMIT 10""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.functions.TopKFreq.register(s)
    Tables.registerViews(s, dir)
    s.sql("""SELECT t.col.value AS value, t.col.cnt AS cnt
            |FROM (SELECT explode(topk_freq(token_symbol, 10, 64)) AS col
            |      FROM wallet_txs) t
            |ORDER BY cnt DESC, value""".stripMargin)
  }

  /** q40a through the SQL-text entry: the registered native Expression
    * (`wei_to_token`) invoked from `spark.sql` — a user typing SQL gets
    * the same codegen'd function the DataFrame path binds. */
  val q40aSql = QueryDef("q40a_udf_and_expression_sql", q40a.oracle.get) { (s, dir) =>
    WeiToToken.register(s)
    Tables.registerViews(s, dir)
    s.sql("""SELECT tx_hash,
            |  CAST(value_raw AS DOUBLE) / power(10, token_decimal) AS qty_expr,
            |  wei_to_token(value_raw, token_decimal) AS qty_udf,
            |  wei_to_token(value_raw, token_decimal) AS qty_native
            |FROM wallet_txs ORDER BY tx_hash""".stripMargin)
  }

  val defs: Seq[QueryDef] = Seq(q40a, q40aSql, q40b, q40c, q40d, q40e, q40f)
}
