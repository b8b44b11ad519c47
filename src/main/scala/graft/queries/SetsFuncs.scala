package graft.queries

import graft.{Canon, Fixtures, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Q25–Q32: set operations and the scalar-function surface (string,
  * datetime, math, array, map, json, conditional) — delegated
  * warehouse surface (resources/redshift.py:89-112); R8 union
  * accumulation generalizes walletDataConsumer.py:67,133.
  */
object SetsFuncs {

  /** UNION / UNION ALL / INTERSECT / EXCEPT between two wallet_txs
    * partitions (R8 generalized), normalized to (op, value, cnt). */
  val q25 = QueryDef("q25_set_ops",
    Fixtures.cte +
      """, a AS (SELECT token_contract FROM wallet_txs WHERE block_number % 2 = 0),
        |  b AS (SELECT token_contract FROM wallet_txs WHERE block_number % 3 = 0)
        |SELECT op, token_contract, cnt FROM (
        |  SELECT 'union_all' AS op, token_contract, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY token_contract
        |  UNION ALL
        |  SELECT 'union' AS op, token_contract, CAST(1 AS BIGINT) AS cnt
        |  FROM (SELECT * FROM a UNION SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'intersect' AS op, token_contract, CAST(1 AS BIGINT) AS cnt
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'except' AS op, token_contract, CAST(1 AS BIGINT) AS cnt
        |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |) ORDER BY op, token_contract""".stripMargin) { (s, dir) =>
    import s.implicits._
    val txs = Fixtures.walletTxs(s, dir)
    val a = txs.filter($"block_number" % 2 === 0).select("token_contract")
    val b = txs.filter($"block_number" % 3 === 0).select("token_contract")
    val unionAll = a.unionByName(b).groupBy("token_contract")
      .agg(count(lit(1)).as("cnt")).select(lit("union_all").as("op"), $"token_contract", $"cnt")
    def one(op: String, df: org.apache.spark.sql.DataFrame) =
      df.select(lit(op).as("op"), $"token_contract", lit(1L).as("cnt"))
    unionAll
      .unionByName(one("union", a.unionByName(b).distinct()))
      .unionByName(one("intersect", a.intersect(b)))
      .unionByName(one("except", a.except(b)))
      .orderBy("op", "token_contract")
  }

  val q26 = QueryDef("q26_string_fns",
    Fixtures.cte +
      """SELECT tx_hash,
        |  upper(token_symbol) AS sym_up,
        |  substr(wallet_address, 3, 6) AS addr_mid,
        |  CAST(length(wallet_address) AS INTEGER) AS addr_len,
        |  concat(from_address, '->', coalesce(to_address, '?')) AS edge,
        |  trim(concat(' ', token_symbol, ' ')) AS sym_trim,
        |  replace(tx_hash, '0xh', 'H') AS hash_h,
        |  lpad(token_symbol, 8, '*') AS sym_pad,
        |  string_split(coalesce(to_address, '0xt?'), 't')[2] AS to_num,
        |  regexp_extract(coalesce(to_address, '0xt0'), '0xt(\d+)', 1) AS to_digits
        |FROM wallet_txs ORDER BY tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir).select(
      $"tx_hash",
      upper($"token_symbol").as("sym_up"),
      substring($"wallet_address", 3, 6).as("addr_mid"),
      length($"wallet_address").as("addr_len"),
      concat($"from_address", lit("->"), coalesce($"to_address", lit("?"))).as("edge"),
      trim(concat(lit(" "), $"token_symbol", lit(" "))).as("sym_trim"),
      regexp_replace($"tx_hash", "0xh", "H").as("hash_h"),
      lpad($"token_symbol", 8, "*").as("sym_pad"),
      element_at(split(coalesce($"to_address", lit("0xt?")), "t"), 2).as("to_num"),
      regexp_extract(coalesce($"to_address", lit("0xt0")), "0xt(\\d+)", 1).as("to_digits"))
      .orderBy("tx_hash")
  }

  val q27 = QueryDef("q27_datetime_fns",
    """SELECT event_id,
      |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_start,
      |  CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
      |  CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  strftime(epoch_ms(CAST(floor(epoch(ts)) AS BIGINT) * 1000), '%Y-%m-%d %H:%M:%S') AS from_epoch,
      |  strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS next_week
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir).select(
      $"event_id",
      Canon.tsStr(date_trunc("day", $"ts")).as("day_start"),
      year($"ts").as("y"), month($"ts").as("m"),
      dayofmonth($"ts").as("d"), hour($"ts").as("h"),
      unix_timestamp($"ts".cast(TimestampType)).as("epoch_s"),
      Canon.tsStr(to_timestamp(from_unixtime(unix_timestamp($"ts".cast(TimestampType))))).as("from_epoch"),
      Canon.tsStr($"ts" + expr("INTERVAL 7 DAY")).as("next_week"))
      .orderBy("event_id")
  }

  val q28 = QueryDef("q28_math_fns",
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice * 0.1, 6) AS tithe,
      |  CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS ce,
      |  round(abs(l_discount - 0.05), 6) AS adj,
      |  power(2, l_linenumber) AS pw,
      |  round(ln(l_extendedprice), 6) AS lnp,
      |  round(log10(l_extendedprice), 6) AS lgp,
      |  round(sqrt(l_quantity), 6) AS sq,
      |  l_orderkey % 97 AS mod97
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.lineitem(s, dir).select(
      $"l_orderkey", $"l_linenumber",
      round($"l_extendedprice" * 0.1, 6).as("tithe"),
      floor($"l_quantity" / 7).as("fl"), ceil($"l_quantity" / 7).as("ce"),
      round(abs($"l_discount" - 0.05), 6).as("adj"),
      pow(lit(2), $"l_linenumber").as("pw"),
      round(log($"l_extendedprice"), 6).as("lnp"),
      round(log10($"l_extendedprice"), 6).as("lgp"),
      round(sqrt($"l_quantity"), 6).as("sq"),
      ($"l_orderkey" % 97).as("mod97"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Array functions + higher-order lambdas over 64-dim embeddings;
    * dot-products accumulate in exact decimal (order-safe). */
  val q29 = QueryDef("q29_array_fns",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  embedding[1] AS e1,
      |  round(CAST(list_sum(list_transform(embedding,
      |    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(23,14)))) AS DOUBLE), 6) AS sumsq,
      |  CAST(len(list_filter(embedding, x -> x > 0.1)) AS INTEGER) AS n_big,
      |  embedding[5] AS e5,
      |  round(CAST(list_sum(list_transform(embedding[1:3],
      |    x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(23,14)))) AS DOUBLE), 6) AS s3,
      |  list_contains(embedding, 0.0) AS has_zero
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.embeddings(s, dir).select(
      $"vec_id",
      size($"embedding").as("dim"),
      element_at($"embedding", 1).as("e1"),
      round(aggregate($"embedding", lit(BigDecimal(0)).cast(DecimalType(37, 14)),
        (acc, x) => (acc + (x.cast(DoubleType) * x.cast(DoubleType)).cast(DecimalType(23, 14)))
          .cast(DecimalType(37, 14)))
        .cast(DoubleType), 6).as("sumsq"),
      size(filter($"embedding", x => x > 0.1)).as("n_big"),
      element_at($"embedding", 5).as("e5"),
      round(aggregate(slice($"embedding", 1, 3),
        lit(BigDecimal(0)).cast(DecimalType(37, 14)),
        (acc, x) => (acc + x.cast(DoubleType).cast(DecimalType(23, 14)))
          .cast(DecimalType(37, 14)))
        .cast(DoubleType), 6).as("s3"),
      array_contains($"embedding", 0.0f).as("has_zero"))
      .orderBy("vec_id")
  }

  /** Map functions over parsed props (the raw-ingest MapType stage). */
  val q30 = QueryDef("q30_map_fns",
    """SELECT event_id,
      |  array_to_string(json_keys(props), ',') AS keys,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
      |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS v1
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("m", from_json($"props", MapType(StringType, LongType)))
      .select(
        $"event_id",
        array_join(map_keys($"m"), ",").as("keys"),
        element_at($"m", "k").as("k_val"),
        size(map_keys($"m")).as("n_keys"),
        element_at(map_values($"m"), 1).as("v1"))
      .orderBy("event_id")
  }

  val q31 = QueryDef("q31_json_fns",
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
      |  CASE WHEN json_extract(props, '$.missing') IS NULL THEN NULL
      |       ELSE 'x' END AS missing
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir).select(
      $"event_id",
      get_json_object($"props", "$.k").as("k_str"),
      get_json_object($"props", "$.k").cast(LongType).as("k_num"),
      get_json_object($"props", "$.missing").as("missing"))
      .orderBy("event_id")
  }

  val q32 = QueryDef("q32_conditional",
    Fixtures.cte +
      """SELECT tx_hash,
        |  CASE WHEN quantity > 500 THEN 'large'
        |       WHEN quantity > 1 THEN 'medium' ELSE 'small' END AS bucket,
        |  coalesce(token_name, 'unknown') AS name_c,
        |  nullif(token_decimal, 0) AS dec_nz,
        |  least(block_number, value_raw) AS lo,
        |  greatest(block_number, CAST(token_decimal AS BIGINT)) AS hi
        |FROM wallet_txs ORDER BY tx_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    Fixtures.walletTxs(s, dir).select(
      $"tx_hash",
      when($"quantity" > 500, "large").when($"quantity" > 1, "medium")
        .otherwise("small").as("bucket"),
      coalesce($"token_name", lit("unknown")).as("name_c"),
      nullif($"token_decimal", lit(0)).as("dec_nz"),
      least($"block_number", $"value_raw").as("lo"),
      greatest($"block_number", $"token_decimal".cast(LongType)).as("hi"))
      .orderBy("tx_hash")
  }

  val defs: Seq[QueryDef] = Seq(q25, q26, q27, q28, q29, q30, q31, q32)
}
