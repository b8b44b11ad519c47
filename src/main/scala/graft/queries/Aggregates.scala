package graft.queries

import graft.{Canon, Fixtures, Tables}
import org.apache.spark.sql.functions._

/** Q16–Q20 + Q35: aggregation family — hash agg, full agg-function
  * sweep, distinct, rollup/cube, having, approx-distinct — the
  * warehouse surface the reference delegates (resources/redshift.py:89-112).
  */
object Aggregates {

  val q16 = QueryDef("q16_agg_hash",
    Fixtures.cte +
      s"""SELECT token_symbol, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  ${Canon.sql.dsum("quantity")} AS qty_sum,
         |  ${Canon.sql.davg("quantity")} AS qty_avg
         |FROM wallet_txs GROUP BY token_symbol ORDER BY token_symbol""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir)
      .groupBy("token_symbol")
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"quantity").as("qty_sum"),
        Canon.davg($"quantity").as("qty_avg"))
      .orderBy("token_symbol")
  }

  /** Full aggregate-function sweep; stddev/var derived from exact
    * decimal sums so both engines run identical IEEE arithmetic. */
  val q17 = QueryDef("q17_agg_functions",
    s"""SELECT l_returnflag,
       |  min(l_quantity) AS min_q, max(l_quantity) AS max_q,
       |  ${Canon.sql.dsum("l_quantity")} AS sum_q,
       |  ${Canon.sql.davg("l_quantity")} AS avg_q,
       |  CAST(COUNT(*) AS BIGINT) AS cnt,
       |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nparts,
       |  ${Canon.sql.dstddevSamp("l_quantity")} AS std_q,
       |  ${Canon.sql.dvarSamp("l_quantity")} AS var_q,
       |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_ship
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        min($"l_quantity").as("min_q"), max($"l_quantity").as("max_q"),
        Canon.dsum($"l_quantity").as("sum_q"), Canon.davg($"l_quantity").as("avg_q"),
        count(lit(1)).as("cnt"), countDistinct($"l_partkey").as("nparts"),
        Canon.dstddevSamp($"l_quantity").as("std_q"),
        Canon.dvarSamp($"l_quantity").as("var_q"),
        Canon.tsStr(min($"l_shipdate")).as("first_ship"))
      .orderBy("l_returnflag")
  }

  /** Order statistics + bivariate stats. Quantiles are exact linear
    * interpolation (identical definition in both engines); corr/covar
    * are derived from exact decimal sums via one shared IEEE formula
    * (builtin corr accumulates floats in partition order — not
    * reproducible across engines or partitionings). */
  val q17b = QueryDef("q17b_agg_stats",
    s"""SELECT l_returnflag,
       |  round(median(l_quantity), 6) AS med_q,
       |  round(quantile_cont(l_quantity, 0.25), 6) AS p25_q,
       |  round(quantile_cont(l_quantity, 0.75), 6) AS p75_q,
       |  ROUND((CAST(COUNT(*) AS DOUBLE) * ${x("l_quantity", "l_extendedprice")} -
       |     ${s1("l_quantity")} * ${s1("l_extendedprice")}) /
       |    (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)), 6) AS covar_s,
       |  ROUND((CAST(COUNT(*) AS DOUBLE) * ${x("l_quantity", "l_extendedprice")} -
       |     ${s1("l_quantity")} * ${s1("l_extendedprice")}) /
       |    sqrt((CAST(COUNT(*) AS DOUBLE) * ${x("l_quantity", "l_quantity")} -
       |          ${s1("l_quantity")} * ${s1("l_quantity")}) *
       |         (CAST(COUNT(*) AS DOUBLE) * ${x("l_extendedprice", "l_extendedprice")} -
       |          ${s1("l_extendedprice")} * ${s1("l_extendedprice")})), 6) AS corr_qp
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.Column
    val n = count(lit(1)).cast("double")
    def sd(c: Column) = Canon.dsumExact(c)
    // (19,3)×(18,3): forces int128 arithmetic in DuckDB (width-19
    // operand) while Spark's product type stays within precision 38
    def sxy(a: Column, b: Column) =
      sum(a.cast(org.apache.spark.sql.types.DecimalType(19, 3)) *
        b.cast(org.apache.spark.sql.types.DecimalType(18, 3))).cast("double")
    val (q, p) = ($"l_quantity", $"l_extendedprice")
    Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
      round(median(q), 6).as("med_q"),
      round(percentile(q, lit(0.25)), 6).as("p25_q"),
      round(percentile(q, lit(0.75)), 6).as("p75_q"),
      round((n * sxy(q, p) - sd(q) * sd(p)) / (n * (n - lit(1.0))), 6).as("covar_s"),
      round((n * sxy(q, p) - sd(q) * sd(p)) /
        sqrt((n * sxy(q, q) - sd(q) * sd(q)) * (n * sxy(p, p) - sd(p) * sd(p))), 6)
        .as("corr_qp"))
      .orderBy("l_returnflag")
  }
  // oracle SQL helpers for q17b
  private def s1(c: String) = Canon.sql.dsumExact(c)
  private def x(a: String, b: String) =
    s"CAST(SUM(CAST($a AS DECIMAL(19,3)) * CAST($b AS DECIMAL(18,3))) AS DOUBLE)"

  val q18 = QueryDef("q18_distinct",
    Fixtures.cte +
      """SELECT DISTINCT token_contract, token_symbol FROM wallet_txs
        |ORDER BY token_contract, token_symbol""".stripMargin) { (s, dir) =>
    Fixtures.walletTxs(s, dir)
      .select("token_contract", "token_symbol").distinct()
      .orderBy("token_contract", "token_symbol")
  }

  val q19 = QueryDef("q19_rollup",
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) AS INTEGER) AS gr, CAST(GROUPING(n_name) AS INTEGER) AS gn,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gr, gn, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.nation(s, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(s, dir), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(grouping($"r_name").cast("int").as("gr"),
        grouping($"n_name").cast("int").as("gn"),
        count(lit(1)).as("cnt"))
      .orderBy($"gr", $"gn", $"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q19b = QueryDef("q19b_cube",
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS gs, CAST(GROUPING(o_orderpriority) AS INTEGER) AS gp,
       |  CAST(COUNT(*) AS BIGINT) AS cnt, ${Canon.sql.dsum("o_totalprice")} AS total
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY gs, gp, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(grouping($"o_orderstatus").cast("int").as("gs"),
        grouping($"o_orderpriority").cast("int").as("gp"),
        count(lit(1)).as("cnt"), Canon.dsum($"o_totalprice").as("total"))
      .orderBy($"gs", $"gp", $"o_orderstatus".asc_nulls_first,
        $"o_orderpriority".asc_nulls_first)
  }

  val q20 = QueryDef("q20_having",
    Fixtures.cte +
      """SELECT wallet_address, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM wallet_txs GROUP BY wallet_address
        |HAVING COUNT(*) > 5 ORDER BY wallet_address""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir)
      .groupBy("wallet_address").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 5)
      .orderBy("wallet_address")
  }

  /** Approx percentile beside its exact twin (the q35 discipline for
    * quantile sketches): the exact per-language median is duck-checked
    * value-for-value; the Greenwald-Khanna approx (accuracy 1000 — a
    * KB-scale summary however many rows stream through it, THE
    * quantile structure that scales where exact percentile's per-group
    * sort-buffer does not) is asserted within 5% Spark-side, and the
    * oracle checks the verdict. */
  val q63 = QueryDef("q63_approx_percentile",
    """SELECT lang,
      |  ROUND(quantile_cont(n_chars, 0.5), 6) AS exact_p50,
      |  TRUE AS approx_ok
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir).groupBy("lang")
      .agg(round(expr("percentile(n_chars, 0.5D)"), 6).as("exact_p50"),
        expr("approx_percentile(n_chars, 0.5D, 1000)").as("apx"))
      .select($"lang", $"exact_p50",
        (abs($"apx" - $"exact_p50") <=
          greatest(abs($"exact_p50") * 0.05, lit(1.0))).as("approx_ok"))
      .orderBy("lang")
  }

  /** HLL++ approx distinct beside its exact twin; the approx value is
    * asserted within 5% Spark-side (engines' sketches differ), the
    * oracle checks the exact value and the tolerance verdict. */
  val q35 = QueryDef("q35_approx_distinct",
    Fixtures.cte +
      """SELECT CAST(COUNT(DISTINCT token_contract) AS BIGINT) AS exact_contracts,
        |  CAST(COUNT(DISTINCT from_address) AS BIGINT) AS exact_senders,
        |  TRUE AS approx_ok""".stripMargin + "\nFROM wallet_txs") { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir)
      .agg(countDistinct($"token_contract").as("exact_contracts"),
        countDistinct($"from_address").as("exact_senders"),
        approx_count_distinct($"token_contract", 0.01).as("apx_c"),
        approx_count_distinct($"from_address", 0.01).as("apx_s"))
      .select($"exact_contracts", $"exact_senders",
        (abs($"apx_c" - $"exact_contracts") <= $"exact_contracts" * 0.05 &&
          abs($"apx_s" - $"exact_senders") <= $"exact_senders" * 0.05).as("approx_ok"))
  }

  /** Pivot: group × pivoted-column counts as wide columns. */
  val q19c = QueryDef("q19c_pivot",
    s"""SELECT l_returnflag,
       |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F,
       |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O,
       |  ${Canon.sql.dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F_qty,
       |  ${Canon.sql.dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O_qty
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import s.implicits._
    val counts = Tables.lineitem(s, dir)
      .groupBy("l_returnflag").pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("c"), Canon.dsum($"l_quantity").as("qty"))
    counts.select($"l_returnflag",
        $"F_c".as("F"), $"O_c".as("O"), $"F_qty", $"O_qty")
      .orderBy("l_returnflag")
  }

  /** Skew-resistant salted aggregation (Skew.scala): event_type has ~5
    * values — catastrophic key skew at 100 TB — so distinct-count and
    * sum run as two balanced shuffles; results must equal the plain
    * single-shuffle formulation (the oracle). */
  val q47 = QueryDef("q47_salted_skew_agg",
    s"""SELECT event_type,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_id_distinct,
       |  ${Canon.sql.dsum("value")} AS value_sum,
       |  CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val d = graft.ops.Skew.saltedDistinctCount(ev, Seq("event_type"), "user_id", 32)
    val sc = graft.ops.Skew.saltedSumCount(ev, Seq("event_type"), $"value", 32)
    d.join(sc, "event_type")
      .select("event_type", "user_id_distinct", "value_sum", "cnt")
      .orderBy("event_type")
  }

  /** The canonical TPC-H Q1 pricing summary, decimal-exact. */
  val q49 = QueryDef("q49_tpch_q1",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Canon.sql.dsum("l_quantity")} AS sum_qty,
       |  ${Canon.sql.dsum("l_extendedprice")} AS sum_base_price,
       |  ${Canon.sql.revenue("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
       |    CAST(1 - l_discount AS DECIMAL(8,2)) *
       |    CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE), 6) AS sum_charge,
       |  ${Canon.sql.davg("l_quantity")} AS avg_qty,
       |  ${Canon.sql.davg("l_extendedprice")} AS avg_price,
       |  ${Canon.sql.davg("l_discount")} AS avg_disc,
       |  CAST(COUNT(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1999-09-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1999-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Canon.dsum($"l_quantity").as("sum_qty"),
        Canon.dsum($"l_extendedprice").as("sum_base_price"),
        Canon.revenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        round(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1) - $"l_discount").cast(DecimalType(8, 2)) *
          (lit(1) + $"l_tax").cast(DecimalType(8, 2))).cast("double"), 6)
          .as("sum_charge"),
        Canon.davg($"l_quantity").as("avg_qty"),
        Canon.davg($"l_extendedprice").as("avg_price"),
        Canon.davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Frequent-item (heavy-hitter) sketch beside its exact twin (q73 —
    * the q35/q63 discipline extended to FREQUENCY sketches): the
    * exact corpus-wide token top-10 is duck-checked value-for-value,
    * and Spark's `approx_top_k` (DataSketches ItemsSketch — the
    * KB-state structure that finds hot keys in one pass at 100 TB,
    * where the exact groupBy needs a vocab-sized shuffle) must agree
    * with the exact count on every top-10 row. With maxItemsTracked
    * (10 000) ≥ the distinct-term count the sketch is exact by
    * construction, so `sketch_ok` is a hard equality, not a
    * tolerance; the oracle pins the verdict TRUE. The ranking window
    * runs over the DISTINCT-TERM relation — vocab-sized, which grows
    * sublinearly with the corpus (Heaps' law), so the single-partition
    * row_number is bounded; the two corpus passes (exact + sketch)
    * are the comparison's point, not overhead a user pays. */
  val q73 = QueryDef("q73_heavy_hitters",
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
      |  FROM documents),
      |t2 AS (SELECT term FROM toks WHERE term <> ''),
      |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
      |r AS (SELECT term, cnt,
      |        ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk FROM tc)
      |SELECT term, cnt, CAST(rk AS BIGINT) AS rk, TRUE AS sketch_ok
      |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "\\s+")).as("term"))
      .filter($"term" =!= "")
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val top = exact
      .withColumn("rk", row_number().over(Window.orderBy($"cnt".desc, $"term")))
      .filter($"rk" <= 10)
    // sketch k (50) > report k (10): a COUNT tie at the report
    // boundary lets the sketch order tied items arbitrarily, so the
    // margin guarantees every exact top-10 term appears in the sketch
    // output regardless of tie-break (first observed failure: 'merge',
    // tied at rank 10, swapped out of the sketch's top-10)
    val sketch = toks.agg(expr("approx_top_k(term, 50, 10000)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("term"), $"e.count".as("apx_cnt"))
    top.join(sketch, Seq("term"), "left_outer")
      .select($"term", $"cnt", $"rk".cast("long").as("rk"),
        ($"apx_cnt".isNotNull && $"apx_cnt" === $"cnt").as("sketch_ok"))
      .orderBy("rk")
  }

  val defs: Seq[QueryDef] =
    Seq(q16, q17, q17b, q18, q19, q19b, q19c, q20, q35, q47, q49, q63, q73)
}
