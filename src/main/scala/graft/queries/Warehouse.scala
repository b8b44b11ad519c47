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

  /** Data-quality constraint audit (q65): the dbt-test / Deequ-style
    * checks a warehouse load gates on, expressed as ONE pass of
    * relational assertions over the star schema — each constraint
    * contributes a violation count, so the result is a compact audit
    * report (green = all zeros… except the seeded orphan check, see
    * below). Checks: key uniqueness (orders), not-null (customer
    * name), referential integrity orders→customer BOTH directions
    * (orphan FKs / childless keys are informational), and a domain
    * check on o_totalprice. Each check is an independent aggregate
    * over ONE table or ONE co-partitioned anti-join — no check needs
    * more than a single shuffle, and the report is a handful of rows
    * whatever the corpus size. */
  val q65 = QueryDef("q65_quality_audit",
    """WITH dup_keys AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM (
      |    SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)),
      |null_names AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM customer WHERE c_name IS NULL),
      |orphan_orders AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |childless_custs AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
      |bad_price AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders WHERE o_totalprice <= 0)
      |SELECT 'childless_custkeys' AS chk, v AS violations FROM childless_custs
      |UNION ALL SELECT 'duplicate_orderkeys', v FROM dup_keys
      |UNION ALL SELECT 'nonpositive_totalprice', v FROM bad_price
      |UNION ALL SELECT 'null_customer_names', v FROM null_names
      |UNION ALL SELECT 'orphan_order_custkeys', v FROM orphan_orders
      |ORDER BY chk""".stripMargin) { (s, dir) =>
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    def one(chk: String, v: DataFrame) =
      v.select(lit(chk).as("chk"), $"v".cast("long").as("violations"))
    val dupKeys = orders.groupBy("o_orderkey").count()
      .filter($"count" > 1).agg(count(lit(1)).as("v"))
    val nullNames = cust.filter($"c_name".isNull).agg(count(lit(1)).as("v"))
    val orphans = orders.join(cust, orders("o_custkey") === cust("c_custkey"),
      "left_anti").agg(count(lit(1)).as("v"))
    val childless = cust.join(orders, cust("c_custkey") === orders("o_custkey"),
      "left_anti").agg(count(lit(1)).as("v"))
    val badPrice = orders.filter($"o_totalprice" <= 0).agg(count(lit(1)).as("v"))
    one("childless_custkeys", childless)
      .unionByName(one("duplicate_orderkeys", dupKeys))
      .unionByName(one("nonpositive_totalprice", badPrice))
      .unionByName(one("null_customer_names", nullNames))
      .unionByName(one("orphan_order_custkeys", orphans))
      .orderBy("chk")
  }

  /** Snapshot diff → CDC feed (q66): the INVERSE of q60 — given two
    * snapshots of a dimension, derive the change feed (insert /
    * update / delete verdict per changed key) a downstream consumer
    * would replay. One co-partitioned full-outer join on the key, and
    * the update test compares an (order-insensitive) payload, so the
    * whole diff is one shuffle of each snapshot; unchanged rows drop
    * out before the output. Old snapshot = the feed's 2024-01-01
    * state, new = the replayed latest (q60b), so the diff provably
    * inverts the merge. */
  val q66 = QueryDef("q66_snapshot_diff_cdc",
    s"""WITH $feedCte,
       |old AS (SELECT cust_id, segment, acctbal FROM chg
       |        WHERE eff_ts = TIMESTAMP '2024-01-01 00:00:00'),
       |r AS (SELECT chg.*, ROW_NUMBER() OVER (
       |        PARTITION BY cust_id ORDER BY eff_ts DESC) AS rn FROM chg),
       |new AS (SELECT cust_id, segment, acctbal FROM r WHERE rn = 1)
       |SELECT COALESCE(o.cust_id, n.cust_id) AS cust_id,
       |  CASE WHEN o.cust_id IS NULL THEN 'insert'
       |       WHEN n.cust_id IS NULL THEN 'delete'
       |       ELSE 'update' END AS op,
       |  n.segment AS segment, n.acctbal AS acctbal
       |FROM old o FULL OUTER JOIN new n ON o.cust_id = n.cust_id
       |WHERE o.cust_id IS NULL OR n.cust_id IS NULL
       |   OR o.segment <> n.segment OR o.acctbal <> n.acctbal
       |ORDER BY cust_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val feed = changeFeed(s, dir)
    val old = feed.filter($"eff_ts" === to_timestamp(lit("2024-01-01 00:00:00")))
      .select($"cust_id".as("o_id"), $"segment".as("o_seg"), $"acctbal".as("o_bal"))
    val latest = graft.ops.Scd2.latest(feed, "cust_id", "eff_ts",
      Seq("segment", "acctbal"))
      .select($"cust_id".as("n_id"), $"segment".as("n_seg"), $"acctbal".as("n_bal"))
    old.join(latest, $"o_id" === $"n_id", "full_outer")
      .filter($"o_id".isNull || $"n_id".isNull ||
        $"o_seg" =!= $"n_seg" || $"o_bal" =!= $"n_bal")
      .select(coalesce($"o_id", $"n_id").as("cust_id"),
        when($"o_id".isNull, "insert")
          .when($"n_id".isNull, "delete")
          .otherwise("update").as("op"),
        $"n_seg".as("segment"), $"n_bal".as("acctbal"))
      .orderBy("cust_id")
  }

  /** Incremental materialized-aggregate maintenance (q70): the
    * monthly revenue rollup kept fresh by MERGING stored partial
    * aggregates with a delta batch instead of rescanning the base.
    * Base = orders before 2000-01-01 (the "already aggregated"
    * history), delta = everything after; each side collapses to
    * per-(month, status) partials — count / sum / min / max, all
    * algebraically mergeable — and the refresh re-aggregates the
    * UNION OF PARTIALS (sum of counts, sum of sums, min of mins, max
    * of maxes), deriving avg = sum/count only at publish. At 100 TB
    * the base partials are a stored table of O(groups) rows, so a
    * refresh scans ONLY the delta: the whole merge is delta-sized +
    * O(groups). Prices go through DECIMAL(12,2) so every sum is
    * exact integer arithmetic — associativity-proof across the
    * base/delta split and across engines. The oracle recomputes the
    * rollup directly over all of orders: hash equality IS the proof
    * of the partial-merge law (merge(partials(A), partials(B)) ≡
    * agg(A ∪ B)). */
  val q70 = QueryDef("q70_incremental_agg_merge",
    """WITH src AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |         o_orderstatus AS status,
      |         CAST(o_totalprice AS DECIMAL(12,2)) AS price
      |  FROM orders)
      |SELECT month, status, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(price) AS DOUBLE) AS sum_price,
      |  CAST(MIN(price) AS DOUBLE) AS min_price,
      |  CAST(MAX(price) AS DOUBLE) AS max_price,
      |  ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 6) AS avg_price
      |FROM src GROUP BY month, status
      |ORDER BY month, status""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ord = Tables.orders(s, dir).select(
      date_format($"o_orderdate", "yyyy-MM").as("month"),
      $"o_orderstatus".as("status"),
      $"o_totalprice".cast("decimal(12,2)").as("price"),
      $"o_orderdate".as("od"))
    val cutoff = to_timestamp(lit("2000-01-01 00:00:00"))
    def partials(df: DataFrame): DataFrame =
      df.groupBy("month", "status").agg(
        count(lit(1)).as("pn"), sum($"price").as("ps"),
        min($"price").as("pmn"), max($"price").as("pmx"))
    val base  = partials(ord.filter($"od" < cutoff))
    val delta = partials(ord.filter($"od" >= cutoff))
    base.unionByName(delta).groupBy("month", "status").agg(
        sum($"pn").cast("long").as("n_orders"),
        sum($"ps").as("ms"), min($"pmn").as("mmn"), max($"pmx").as("mmx"))
      .select($"month", $"status", $"n_orders",
        $"ms".cast("double").as("sum_price"),
        $"mmn".cast("double").as("min_price"),
        $"mmx".cast("double").as("max_price"),
        round($"ms".cast("double") / $"n_orders", 6).as("avg_price"))
      .orderBy("month", "status")
  }

  /** HLL sketch-merge incremental distinct (q96 — round-16 verdict
    * item 4): q70's partial-merge law applied to the ONE aggregate
    * that has no algebraic partial — COUNT(DISTINCT). The mergeable
    * partial is the Datasketches HLL sketch (Spark 4's
    * `hll_sketch_agg`): each ingest generation persists a KB-scale
    * sketch per group, and a refresh `hll_union_agg`s the stored
    * sketches instead of rescanning history — the 100 TB
    * incremental-distinct path (a refresh is delta-scan + O(groups)
    * sketch unions). The generation split (orders before/after
    * 2000-01-01) is deliberately ORTHOGONAL to the group key
    * (o_orderstatus), so customers active in both generations are
    * genuinely deduplicated by the union, not by partition luck.
    * Published per group: the EXACT distinct count (duck-checked
    * value-for-value), `approx_ok` (merged estimate within 5% — the
    * q35/q63 sketch-beside-exact discipline), and `merge_law_ok`
    * (estimate of the merged per-generation sketches vs the estimate
    * of one whole-corpus sketch). The merge law is TOLERANCE-based,
    * not bit-exact, for a real Datasketches reason worth pinning: a
    * STREAMED sketch estimates via the HIP accumulator while a union
    * result must fall back to the register-only composite estimator
    * (HIP cannot survive a merge), so the two agree within the
    * sketch's error envelope — 2·RSE ≈ 2·1.04/√2^12 ≈ 3.3% at the
    * default lgK=12 — not to the bit (measured drift here: ≤1.1%).
    * WarehouseAnalyticsSpec pins the law against a finer 4-generation
    * split. */
  val q96 = QueryDef("q96_hll_incremental_distinct",
    """SELECT o_orderstatus AS status,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
      |  TRUE AS approx_ok, TRUE AS merge_law_ok
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ord = Tables.orders(s, dir).select(
      $"o_orderstatus".as("status"), $"o_custkey".as("cust"),
      $"o_orderdate".as("od"))
    val cutoff = to_timestamp(lit("2000-01-01 00:00:00"))
    // per-(generation, group) sketch partials — the persisted artifact
    def sketch(df: DataFrame): DataFrame =
      df.groupBy("status").agg(hll_sketch_agg($"cust").as("sk"))
    val base  = sketch(ord.filter($"od" < cutoff))
    val delta = sketch(ord.filter($"od" >= cutoff))
    val merged = base.unionByName(delta).groupBy("status")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_m"))
    val whole = ord.groupBy("status")
      .agg(hll_sketch_estimate(hll_sketch_agg($"cust")).as("est_w"))
    val exact = ord.groupBy("status")
      .agg(countDistinct($"cust").as("exact_custs"))
    exact.join(merged, "status").join(whole, "status")
      .select($"status", $"exact_custs",
        (abs($"est_m" - $"exact_custs") <= $"exact_custs" * 0.05).as("approx_ok"),
        // HIP (streamed) vs composite (merged) estimator envelope:
        // 2·RSE at lgK=12, floored at 2 absolute for tiny groups
        (abs($"est_m" - $"est_w") <=
          greatest($"exact_custs" * 0.033, lit(2.0))).as("merge_law_ok"))
      .orderBy("status")
  }

  /** Column-profiling summary (q71): the Deequ/dbt-profile operator a
    * pipeline runs before trusting a new corpus drop — row count,
    * empty-text count, n_chars min/max/mean/median, lang and source
    * cardinalities, and a fixed-bound equi-width histogram of
    * n_chars (10 × 250-char buckets, top bucket open), all in a tall
    * (metric, value) report. Plan shape: the scalar metrics are ONE
    * aggregate pass melted by `stack` (no re-scan per metric); each
    * distinct-count is its own single-column shuffle (kept out of
    * the main aggregate so Catalyst doesn't plan an Expand over the
    * corpus); the histogram is one integer-arithmetic groupBy. Report
    * size is O(metrics) whatever the corpus size. Exact percentile ≡
    * DuckDB quantile_cont under R-7 (the q43f precedent). */
  val q71 = QueryDef("q71_profile_summary",
    """WITH m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_rows,
      |    CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS DOUBLE) AS text_empty,
      |    CAST(MIN(n_chars) AS DOUBLE) AS n_chars_min,
      |    CAST(MAX(n_chars) AS DOUBLE) AS n_chars_max,
      |    ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars), 6) AS n_chars_mean,
      |    ROUND(quantile_cont(n_chars, 0.5), 6) AS n_chars_p50
      |  FROM documents),
      |d1 AS (SELECT CAST(COUNT(DISTINCT lang) AS DOUBLE) AS v FROM documents),
      |d2 AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS v FROM documents),
      |h AS (SELECT least(n_chars // 250, 9) AS b, CAST(COUNT(*) AS DOUBLE) AS v
      |      FROM documents GROUP BY 1)
      |SELECT metric, value FROM (
      |  SELECT 'n_rows' AS metric, n_rows AS value FROM m
      |  UNION ALL SELECT 'text_empty', text_empty FROM m
      |  UNION ALL SELECT 'n_chars_min', n_chars_min FROM m
      |  UNION ALL SELECT 'n_chars_max', n_chars_max FROM m
      |  UNION ALL SELECT 'n_chars_mean', n_chars_mean FROM m
      |  UNION ALL SELECT 'n_chars_p50', n_chars_p50 FROM m
      |  UNION ALL SELECT 'lang_distinct', v FROM d1
      |  UNION ALL SELECT 'source_distinct', v FROM d2
      |  UNION ALL SELECT 'hist_' || CAST(b AS VARCHAR), v FROM h)
      |ORDER BY metric""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val melted = docs.agg(
        count(lit(1)).cast("double").as("n_rows"),
        sum(when($"text".isNull || $"text" === "", 1).otherwise(0))
          .cast("double").as("text_empty"),
        min($"n_chars").cast("double").as("n_chars_min"),
        max($"n_chars").cast("double").as("n_chars_max"),
        round(sum($"n_chars").cast("double") / count($"n_chars"), 6)
          .as("n_chars_mean"),
        round(expr("percentile(n_chars, 0.5D)"), 6).as("n_chars_p50"))
      .select(expr(
        """stack(6,
          |  'n_rows', n_rows, 'text_empty', text_empty,
          |  'n_chars_min', n_chars_min, 'n_chars_max', n_chars_max,
          |  'n_chars_mean', n_chars_mean, 'n_chars_p50', n_chars_p50)
          |AS (metric, value)""".stripMargin))
    def dcount(metric: String, c: String) =
      docs.agg(countDistinct(col(c)).cast("double").as("value"))
        .select(lit(metric).as("metric"), $"value")
    val hist = docs
      .groupBy(expr("least(n_chars DIV 250, 9)").as("b"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(concat(lit("hist_"), $"b".cast("string")).as("metric"), $"value")
    melted
      .unionByName(dcount("lang_distinct", "lang"))
      .unionByName(dcount("source_distinct", "source"))
      .unionByName(hist)
      .orderBy("metric")
  }

  /** SCD2 point-in-time temporal join (q82): every fact row joined to
    * the dimension VERSION that was valid at its event time — the
    * query a type-2 dimension exists to answer, composing q60's
    * history with the as-of machinery. The oracle writes the textbook
    * INTERVAL formulation (valid_from ≤ t < valid_to over the q60
    * history); the Spark entry plans the equivalent AS-OF join
    * ([[graft.ops.AsOf.join]] — union + one per-key window pass, no
    * interval-predicate join at all): because version intervals CHAIN,
    * "interval containing t" ≡ "last version starting ≤ t", and the
    * hash-equality of the two formulations is the proof. Facts are a
    * deterministic derivation of events spread across the feed's
    * version dates; at 100 TB the as-of side shuffles each relation
    * once on the key, where the naive interval theta-join would
    * replicate the dimension against every fact. */
  val q82 = QueryDef("q82_scd2_point_in_time",
    s"""WITH $feedCte,
       |hist AS (
       |  SELECT cust_id, segment, acctbal, eff_ts AS valid_from,
       |    lead(eff_ts) OVER (PARTITION BY cust_id ORDER BY eff_ts) AS valid_to
       |  FROM chg),
       |f AS (SELECT event_id,
       |        1 + user_id % (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS cust_id,
       |        TIMESTAMP '2024-01-01 00:00:00'
       |          + to_days(CAST(event_id % 120 AS INT)) AS lts
       |      FROM events)
       |SELECT f.event_id, f.cust_id,
       |  strftime(f.lts, '%Y-%m-%d %H:%M:%S') AS lookup_ts,
       |  h.segment, h.acctbal
       |FROM f JOIN hist h ON h.cust_id = f.cust_id
       |  AND h.valid_from <= f.lts
       |  AND (h.valid_to IS NULL OR f.lts < h.valid_to)
       |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val cnt = Tables.customer(s, dir).agg(count(lit(1)).as("c"))
    val facts = Tables.events(s, dir).crossJoin(broadcast(cnt))
      .select($"event_id", (lit(1) + $"user_id" % $"c").as("cust_id"),
        expr("timestampadd(DAY, CAST(event_id % 120 AS INT), " +
          "TIMESTAMP '2024-01-01 00:00:00')").as("lts"))
    graft.ops.AsOf.join(facts, "cust_id", "lts",
        changeFeed(s, dir), "cust_id", "eff_ts",
        Seq("segment", "acctbal"), tieBreak = "cust_id")
      .select($"event_id", $"cust_id", graft.Canon.tsStr($"lts").as("lookup_ts"),
        $"asof_segment".as("segment"), $"asof_acctbal".as("acctbal"))
      .orderBy("event_id")
  }

  /** Schema-evolution union (q86): reconcile two ingest generations of
    * one table whose schemas DIFFER — the v1 batch predates `source` /
    * `n_chars` tracking (the columns every long-lived pipeline grows
    * mid-life), the v2 batch carries them. `unionByName(
    * allowMissingColumns = true)` aligns by NAME and null-fills the
    * missing columns — positional `union` would silently misalign the
    * moment either schema reorders, the classic ingest corruption.
    * Downstream sees one relation with an explicit `(legacy)` marker
    * where provenance predates tracking. Map-only: two pruned scans of
    * the same parquet (disjoint id slices), no shuffle anywhere — the
    * oracle's UNION ALL with typed NULLs states the identical
    * alignment. */
  val q86 = QueryDef("q86_schema_evolution_union",
    """WITH v1 AS (SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0),
      |v2 AS (SELECT doc_id, lang, source, n_chars FROM documents
      |       WHERE doc_id % 3 <> 0)
      |SELECT doc_id, lang, source, n_chars,
      |  COALESCE(source, '(legacy)') AS source_filled
      |FROM (
      |  SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
      |    CAST(NULL AS BIGINT) AS n_chars FROM v1
      |  UNION ALL
      |  SELECT doc_id, lang, source, n_chars FROM v2)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val v1 = docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"lang")
    val v2 = docs.filter($"doc_id" % 3 =!= 0)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    v1.unionByName(v2, allowMissingColumns = true)
      .select($"doc_id", $"lang", $"source", $"n_chars",
        coalesce($"source", lit("(legacy)")).as("source_filled"))
      .orderBy("doc_id")
  }

  /** Z-order (Morton-curve) layout clustering (q89): the THIRD scan
    * lever beside hive partitioning (q62/q64) and bucketing (q67) —
    * the Delta/Iceberg `OPTIMIZE ZORDER BY` primitive. Single-column
    * layouts prune on one dimension only; interleaving the bits of
    * (user_id % 256, day-of-month) into one Morton key gives a total
    * order whose contiguous ranges are COMPACT IN BOTH dimensions, so
    * files written in z-order carry tight min/max on user AND day and
    * a scan filtering EITHER column skips most files. The query
    * computes the z-value per event (pure bit arithmetic — integer
    * shifts/masks, exact on both engines) and reports per-tile (z
    * div 64 — an 8×8 block of (x, y) space) extents: every tile's
    * x-span and y-span ≤ 8 IS the locality proof (GraphAnalyticsSpec
    * pins it; a single-column sort shows span 31 on the other axis).
    * Work: one map-only pass + an O(tiles) aggregate. */
  val q89 = {
    def zSqlBits =
      ((0 until 8).map(b => s"(((user_id % 256) >> $b) & 1) << ${2 * b}") ++
        (0 until 5).map(b => s"(((day(ts) - 1) >> $b) & 1) << ${2 * b + 1}"))
        .mkString("(", ") + (", ")")
    QueryDef("q89_zorder_layout",
      s"""WITH z AS (
         |  SELECT user_id % 256 AS x, day(ts) - 1 AS y,
         |    $zSqlBits AS zval
         |  FROM events)
         |SELECT CAST(zval // 64 AS BIGINT) AS tile,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
         |  CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y,
         |  CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
         |  CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val z = graft.ops.Zorder.zValue($"user_id" % 256, dayofmonth($"ts") - 1,
        xBits = 8, yBits = 5)
      Tables.events(s, dir)
        .select(($"user_id" % 256).as("x"), (dayofmonth($"ts") - 1).as("y"),
          z.as("zval"))
        .groupBy(expr("zval div 64").as("tile"))
        .agg(count(lit(1)).as("n_events"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").cast("long").as("min_y"), max($"y").cast("long").as("max_y"),
          (max($"x") - min($"x")).as("x_span"),
          (max($"y") - min($"y")).cast("long").as("y_span"))
        .orderBy("tile")
    }
  }

  val defs: Seq[QueryDef] = Seq(q60, q60b, q65, q66, q70, q71, q82, q86, q89, q96)
}
