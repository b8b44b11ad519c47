package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q60/q60b — dimension maintenance over a change feed: the MERGE
  * surface of the warehouse the reference loads into. The reference
  * itself only full-refreshes (resources/redshift.py:114-130 → q46);
  * a maintained warehouse additionally needs type-2 history and
  * CDC latest-wins upsert, both expressed here as pure relational
  * derivations over an append-only version feed
  * ([[graft.ops.Scd2]] documents the plan shapes).
  *
  * The feed is derived deterministically from `customer`: the base
  * snapshot at 2024-01-01, an acctbal restatement for every 7th key
  * at 2024-02-01, a new-account insert batch at 2024-02-15, and a
  * segment+balance restatement for every 13th key at 2024-03-01 —
  * inserts, single updates, and multi-update chains all present.
  */
object Warehouse {

  /** Deterministic CDC feed (cust_id, segment, acctbal, eff_ts). */
  private[graft] def changeFeed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    def ts(lit0: String) = to_timestamp(lit(lit0))
    val base = cust.select($"c_custkey".as("cust_id"),
      $"c_mktsegment".as("segment"), round($"c_acctbal", 2).as("acctbal"),
      ts("2024-01-01 00:00:00").as("eff_ts"))
    val upd1 = cust.filter($"c_custkey" % 7 === 0).select(
      $"c_custkey".as("cust_id"), $"c_mktsegment".as("segment"),
      round($"c_acctbal" + 100.0, 2).as("acctbal"),
      ts("2024-02-01 00:00:00").as("eff_ts"))
    val ins = cust.filter($"c_custkey" % 50 === 0).select(
      ($"c_custkey" + 1000000L).as("cust_id"), lit("NEWACCT").as("segment"),
      lit(0.0).as("acctbal"), ts("2024-02-15 00:00:00").as("eff_ts"))
    val upd2 = cust.filter($"c_custkey" % 13 === 0).select(
      $"c_custkey".as("cust_id"), lit("MACHINERY").as("segment"),
      round($"c_acctbal" + 200.0, 2).as("acctbal"),
      ts("2024-03-01 00:00:00").as("eff_ts"))
    base.unionByName(upd1).unionByName(ins).unionByName(upd2)
  }

  /** The shared feed CTE, DuckDB dialect (Spark-SQL twin swaps nothing
    * but the outer query's strftime — TIMESTAMP literals, %, ROUND are
    * shared dialect). */
  private[queries] val feedCte =
    """chg AS (
      |  SELECT c_custkey AS cust_id, c_mktsegment AS segment,
      |         ROUND(c_acctbal, 2) AS acctbal,
      |         TIMESTAMP '2024-01-01 00:00:00' AS eff_ts FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, ROUND(c_acctbal + 100.0, 2),
      |         TIMESTAMP '2024-02-01 00:00:00' FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEWACCT', 0.0,
      |         TIMESTAMP '2024-02-15 00:00:00' FROM customer WHERE c_custkey % 50 = 0
      |  UNION ALL
      |  SELECT c_custkey, 'MACHINERY', ROUND(c_acctbal + 200.0, 2),
      |         TIMESTAMP '2024-03-01 00:00:00' FROM customer WHERE c_custkey % 13 = 0)""".stripMargin

  /** Type-2 slowly-changing-dimension history: every version with its
    * validity interval; open `valid_to` (NULL) + is_current on the
    * latest version per key. One shuffle on cust_id, per-key window
    * over version chains of ≤ 3 rows. */
  val q60 = QueryDef("q60_scd2_history",
    s"""WITH $feedCte
       |SELECT cust_id, segment, acctbal,
       |  strftime(eff_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       |  strftime(lead(eff_ts) OVER (PARTITION BY cust_id ORDER BY eff_ts),
       |           '%Y-%m-%d %H:%M:%S') AS valid_to,
       |  CAST(CASE WHEN lead(eff_ts) OVER (PARTITION BY cust_id ORDER BY eff_ts)
       |       IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
       |FROM chg ORDER BY cust_id, valid_from""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.ops.Scd2.history(changeFeed(s, dir), "cust_id", "eff_ts")
      .select($"cust_id", $"segment", $"acctbal",
        graft.Canon.tsStr($"eff_ts").as("valid_from"),
        graft.Canon.tsStr($"valid_to_ts").as("valid_to"),
        $"is_current")
      .orderBy("cust_id", "valid_from")
  }

  /** CDC latest-wins snapshot (upsert apply): the current dimension
    * state after replaying the feed — `max(struct)` hash aggregate,
    * partial combine map-side, no sort anywhere (see
    * [[graft.ops.Scd2.latest]]). Oracle spells the same semantics as
    * a ROW_NUMBER pick. */
  val q60b = QueryDef("q60b_cdc_upsert_latest",
    s"""WITH $feedCte,
       |r AS (SELECT chg.*, ROW_NUMBER() OVER (
       |        PARTITION BY cust_id ORDER BY eff_ts DESC) AS rn FROM chg)
       |SELECT cust_id, segment, acctbal,
       |  strftime(eff_ts, '%Y-%m-%d %H:%M:%S') AS as_of
       |FROM r WHERE rn = 1 ORDER BY cust_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.ops.Scd2.latest(changeFeed(s, dir), "cust_id", "eff_ts",
      Seq("segment", "acctbal"))
      .select($"cust_id", $"segment", $"acctbal",
        graft.Canon.tsStr($"eff_ts").as("as_of"))
      .orderBy("cust_id")
  }

  val defs: Seq[QueryDef] = Seq(q60, q60b)
}
