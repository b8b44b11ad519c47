package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** q57–q58 — the classic product-analytics queries the reference's
  * delegated warehouse surface exists to serve (the wallet_txs table
  * is loaded into Redshift precisely so analysts can run funnels and
  * cohorts over it; events stands in as the behavioral table here).
  *
  * Both are pure relational compositions: per-user tiny aggregates
  * (min timestamps / first-seen week) joined back against the event
  * stream. The join strategy is LEFT TO CATALYST: at test scale the
  * per-user relations sit under the broadcast threshold and plan as
  * BHJ; at 100 TB (unbounded user cardinality) the same code plans as
  * a sort-merge join on user_id — forcing broadcast() here would be
  * exactly the hint that breaks at scale. The only corpus-sized work
  * is the initial filter+partial-agg, which Catalyst pushes into the
  * scan stage.
  */
object Analytics {

  /** Ordered conversion funnel view → click → purchase: each stage's
    * timestamp is the user's FIRST qualifying event strictly after the
    * previous stage (the standard "ordered funnel" definition — a
    * click before the first view does not count). Null stage = user
    * never converted that far. Three tiny per-user aggregates chained
    * by joins (strategy left to Catalyst — see the object doc). */
  val q57 = QueryDef("q57_funnel_ordered",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      |SELECT v.user_id,
      |  strftime(v.t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
      |  strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
      |  strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    def fmt(c: org.apache.spark.sql.Column) =
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    val v = ev.filter($"event_type" === "view")
      .groupBy("user_id").agg(min($"ts").as("t_view"))
    val c = ev.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ts" > $"t_view")
      .groupBy("user_id").agg(min($"ts").as("t_click"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ts" > $"t_click")
      .groupBy("user_id").agg(min($"ts").as("t_purchase"))
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select($"user_id", fmt($"t_view").as("t_view"),
        fmt($"t_click").as("t_click"), fmt($"t_purchase").as("t_purchase"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention: users grouped by first-seen (signup)
    * week, activity counted as distinct users per (cohort week,
    * weeks-since-signup) cell — the retention matrix every analytics
    * stack publishes. Week truncation is ISO-Monday in both engines;
    * the offset is an exact integer day difference / 7. */
  val q58 = QueryDef("q58_cohort_retention",
    """WITH first_seen AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
      |  FROM events GROUP BY 1)
      |SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
      |  CAST(datediff('day', f.cohort_w, date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_n,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
      |FROM events e JOIN first_seen f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val firstSeen = ev.groupBy("user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_w"))
    ev.join(firstSeen, "user_id")
      .select(date_format($"cohort_w", "yyyy-MM-dd").as("cohort_week"),
        (datediff(date_trunc("week", $"ts"), $"cohort_w") / 7)
          .cast("long").as("week_n"),
        $"user_id")
      .groupBy("cohort_week", "week_n")
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy("cohort_week", "week_n")
  }

  /** Gap-based batch sessionization (30-minute inactivity gap): the
    * relational twin of q38's streaming `session_window`, computed
    * with lag + running-sum session index + per-session aggregate —
    * [[graft.ops.Sessions]] documents the one-shuffle plan shape
    * (the session aggregate reuses the window's user_id partitioning;
    * no second exchange). Gap comparison is in epoch seconds, strict
    * `> 1800`, identical integer arithmetic in both engines. */
  val q61 = QueryDef("q61_sessionize_batch",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, event_id, value,
      |    SUM(CASE WHEN prev_ts IS NULL
      |             OR date_diff('second', prev_ts, ts) > 1800
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM o)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_value
      |FROM s GROUP BY 1, 2
      |ORDER BY user_id, session_idx""".stripMargin) { (s, dir) =>
    graft.ops.Sessions.sessionStats(Tables.events(s, dir), gapSeconds = 1800)
      .orderBy("user_id", "session_idx")
  }

  /** Date-spine gap fill + rolling window (q68): per-user daily
    * activity densified over the full calendar (absent days become
    * explicit zero rows — the shape every downstream time-series
    * model/chart needs), then a 7-day rolling average over the now
    * gap-free frame. The spine is users × 30 days built by exploding
    * a `sequence()` per user (no driver-side loop); the fill is one
    * left join co-keyed with the daily aggregate; the rolling window
    * rides the same user partitioning. Row counts are bounded by
    * users × days — calendar densification, not event volume. */
  val q68 = QueryDef("q68_gap_fill_rolling",
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS val_sum
      |  FROM events GROUP BY 1, 2),
      |users AS (SELECT DISTINCT user_id FROM events),
      |spine AS (
      |  SELECT u.user_id,
      |    CAST(UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30',
      |      INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM users u),
      |filled AS (
      |  SELECT s.user_id, s.day,
      |    COALESCE(d.cnt, 0) AS cnt, COALESCE(d.val_sum, 0.0) AS val_sum
      |  FROM spine s LEFT JOIN daily d
      |    ON d.user_id = s.user_id AND d.day = s.day)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |  CAST(cnt AS BIGINT) AS cnt, val_sum,
      |  ROUND(CAST(SUM(CAST(val_sum AS DECIMAL(28,6))) OVER w AS DOUBLE)
      |        / COUNT(*) OVER w, 6) AS avg_7d
      |FROM filled
      |WINDOW w AS (PARTITION BY user_id ORDER BY day
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy($"user_id",
        to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), graft.Canon.dsum($"value").as("val_sum"))
    val spine = ev.select("user_id").distinct().select($"user_id",
      explode(sequence(to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
        expr("interval 1 day"))).as("day"))
    val filled = spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select($"user_id", $"day", coalesce($"cnt", lit(0L)).as("cnt"),
        coalesce($"val_sum", lit(0.0)).as("val_sum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    filled.select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
        $"cnt", $"val_sum",
        round(sum($"val_sum".cast(graft.Canon.Money)).over(w).cast("double")
          / count(lit(1)).over(w), 6).as("avg_7d"))
      .orderBy("user_id", "day")
  }

  /** Rolling z-score anomaly flags (q72): per-(event_type, day)
    * volumes scored against the TRAILING 7-day window (rows 7
    * preceding .. 1 preceding — the current day never contaminates
    * its own baseline), z = (cnt − μ)/σ, |z| > 2 flagged. The
    * monitoring query a pipeline runs over its own ingest volumes.
    *
    * Determinism across engines: the window carries only exact
    * BIGINT sums (Σcnt, Σcnt², n), and μ/σ²/z are derived from them
    * in ONE fixed IEEE expression tree — no streaming stddev
    * accumulator (Spark's stddev_samp and DuckDB's disagree in
    * association order). σ² ≤ 0 (constant window, or the tiny
    * negative the subtraction can produce at var≈0) → z NULL, flag 0.
    * Plan: one (type, day) partial-agg pass over events, then a
    * window over the DAYS relation — types × days rows, thousands of
    * times smaller than the corpus; per-partition window state is
    * the 8-row frame. At 100 TB the corpus pass is the only
    * data-proportional term. */
  val q72 = QueryDef("q72_anomaly_zscore",
    """WITH d AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, cnt,
      |    CAST(COUNT(cnt) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS np,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS sm,
      |    CAST(SUM(cnt * cnt) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS ssq
      |  FROM d),
      |v AS (
      |  SELECT event_type, day, cnt, np,
      |    CAST(sm AS DOUBLE) / np AS mu,
      |    (CAST(ssq AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / np)
      |      / (np - 1) AS vr
      |  FROM w WHERE np >= 3)
      |SELECT event_type, day, cnt,
      |  CASE WHEN vr > 0
      |       THEN ROUND((CAST(cnt AS DOUBLE) - mu) / sqrt(vr), 6) END AS z,
      |  CAST(CASE WHEN vr > 0 AND
      |            abs((CAST(cnt AS DOUBLE) - mu) / sqrt(vr)) > 2.0
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM v ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(s, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val win = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    d.withColumn("np", count($"cnt").over(win))
      .withColumn("sm", sum($"cnt").over(win))
      .withColumn("ssq", sum($"cnt" * $"cnt").over(win))
      .filter($"np" >= 3)
      .withColumn("mu", $"sm".cast("double") / $"np")
      .withColumn("vr",
        ($"ssq".cast("double") - $"sm".cast("double") * $"sm".cast("double") / $"np")
          / ($"np" - 1))
      .select($"event_type", $"day", $"cnt",
        when($"vr" > 0,
          round(($"cnt".cast("double") - $"mu") / sqrt($"vr"), 6)).as("z"),
        when($"vr" > 0 &&
            abs(($"cnt".cast("double") - $"mu") / sqrt($"vr")) > 2.0, 1L)
          .otherwise(0L).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Sequence training examples (q75): next-event-prediction pairs
    * from per-user event streams — a length-3 context window and its
    * following event, the (context, target) dataset shape a behavioral
    * sequence model trains on. Built with a LEAD CHAIN over one
    * user_id window, NOT collect_list: per-user arrays would buffer a
    * bot account's millions of events in one task, while lead(k) keeps
    * a bounded 3-row look-ahead whatever the user's history length —
    * the formulation that survives skewed users at 100 TB. One
    * exchange total; output rows = events with ≥ 3 successors. */
  val q75 = QueryDef("q75_sequence_examples",
    """WITH t AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER w AS pos,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2,
      |    lead(event_type, 3) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(pos AS BIGINT) AS pos,
      |  event_type || '>' || t1 || '>' || t2 AS context, t3 AS target
      |FROM t WHERE t3 IS NOT NULL
      |ORDER BY user_id, pos""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("t1", lead("event_type", 1).over(w))
      .withColumn("t2", lead("event_type", 2).over(w))
      .withColumn("t3", lead("event_type", 3).over(w))
      .filter($"t3".isNotNull)
      .select($"user_id", $"pos",
        concat_ws(">", $"event_type", $"t1", $"t2").as("context"),
        $"t3".as("target"))
      .orderBy("user_id", "pos")
  }

  /** Last-touch attribution (q84): every purchase credited to the
    * user's most recent PRECEDING non-purchase event — the marketing
    * query a conversion warehouse answers after the funnel (q57). One
    * user_id window carrying three `last(_, ignoreNulls)` columns over
    * ROWS UNBOUNDED PRECEDING..1 PRECEDING: all three project the SAME
    * row (they are null on exactly the same rows), so touch id / type
    * / lag are mutually consistent by construction — no self-join of
    * purchases back against the event stream, which would rescan the
    * corpus. One exchange; window state is one row per ignore-nulls
    * column. Purchases with no preceding touch surface as NULLs (the
    * honest "direct conversion" row), not dropped. */
  val q84 = QueryDef("q84_attribution_last_touch",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
      |      OVER w AS touch_id,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER w AS touch_type,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
      |      OVER w AS touch_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, touch_id, touch_type,
      |  CAST(date_diff('second', touch_ts, ts) AS BIGINT) AS lag_s
      |FROM o WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def touch(c: org.apache.spark.sql.Column) =
      last(when($"event_type" =!= "purchase", c), ignoreNulls = true).over(w)
    Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("touch_id", touch($"event_id"))
      .withColumn("touch_type", touch($"event_type"))
      .withColumn("touch_ts", touch($"ts"))
      .filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"touch_id",
        $"touch_type",
        (unix_timestamp($"ts") - unix_timestamp($"touch_ts")).as("lag_s"))
      .orderBy("purchase_id")
  }

  /** Peak concurrent sessions per day (q87): interval algebra by
    * SWEEP-LINE — each q61 session contributes a +1 marker at its
    * start and a −1 at its end, the running sum of deltas over the
    * global time order is the live concurrency, and the per-day max of
    * that sum is the capacity-planning number an ops team asks for.
    *
    * The global running sum does NOT use a single-partition window:
    * [[graft.ops.Ranking.globalPrefixSum]] (q59's range-partition +
    * per-partition-offset machinery, factored out) computes it with a
    * range shuffle over (ts, delta desc, user, session) — markers are
    * 2×sessions rows, far below event volume, and every stage is
    * partition-parallel. Tie rule: +1 sorts before −1 at the same
    * instant (delta DESC), so back-to-back touching sessions count as
    * concurrent — stated identically in the oracle's window ORDER BY.
    * Day attribution is by marker timestamp; a session spanning
    * midnight is counted into the day its markers fall on, carry-over
    * concurrency reaching the next day's first marker included (the
    * prefix sum is global, not per-day). */
  val q87 = QueryDef("q87_session_concurrency",
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, event_id,
      |    SUM(CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM o),
      |iv AS (
      |  SELECT user_id, session_idx, MIN(ts) AS s_ts, MAX(ts) AS e_ts
      |  FROM s GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, session_idx, s_ts AS ts, CAST(1 AS BIGINT) AS delta FROM iv
      |  UNION ALL
      |  SELECT user_id, session_idx, e_ts AS ts, CAST(-1 AS BIGINT) AS delta FROM iv),
      |c AS (
      |  SELECT ts, SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_idx
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM m)
      |SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(MAX(conc) AS BIGINT) AS peak_conc
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val iv = graft.ops.Sessions.sessionize(Tables.events(s, dir), 1800)
      .groupBy("user_id", "session_idx")
      .agg(min($"ts").as("s_ts"), max($"ts").as("e_ts"))
    val markers = iv.select($"user_id", $"session_idx",
        $"s_ts".as("ts"), lit(1L).as("delta"))
      .union(iv.select($"user_id", $"session_idx",
        $"e_ts".as("ts"), lit(-1L).as("delta")))
    graft.ops.Ranking.globalPrefixSum(markers, "conc", "delta",
        $"ts", $"delta".desc, $"user_id", $"session_idx")
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(max($"conc").as("peak_conc"))
      .orderBy("day")
  }

  /** Market-basket association rules (q93): pairwise support /
    * confidence / lift over orders-as-baskets (basket = the distinct
    * brands on one order) — the Apriori level-2 pass every
    * recommendations/affinity stack runs. The plan follows the
    * textbook algorithm BECAUSE it is the scale mitigation:
    *
    *  1. frequent-item prefilter (support ≥ 50 baskets) BEFORE any
    *     pairing — the Apriori downward-closure step. Pair generation
    *     cost is Σ per-basket k², so dropping infrequent items first
    *     bounds k by the frequent-item count, not the raw vocabulary;
    *     a long-tail item can never explode the self-join.
    *  2. pair generation is a SELF-JOIN ON THE BASKET KEY (a.okey =
    *     b.okey AND a.item < b.item): both sides shuffle once on the
    *     same key (co-partitioned), and the (item_a, item_b) count
    *     partial-aggregates map-side — the only corpus-proportional
    *     shuffles in the query.
    *  3. the item-count and basket-total relations are O(items) and
    *     O(1) rows — Catalyst broadcasts them onto the pair counts.
    *
    * Determinism across engines: support counts are exact BIGINTs;
    * confidence = pair/cnt_a and lift = (pair·n)/(cnt_a·cnt_b) with
    * each FACTOR cast to double BEFORE multiplying — every count is
    * < 2^53 so the conversions are exact, the double products and the
    * one division are identical IEEE on both engines, and the int64
    * overflow past ~3e9 baskets (where Spark non-ANSI silently wraps
    * while DuckDB raises) can never occur. Output is ≤ C(frequent
    * items, 2) rows whatever the corpus size. */
  val q93 = QueryDef("q93_market_basket",
    """WITH baskets AS (
      |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets FROM baskets),
      |item_cnt AS (
      |  SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM baskets GROUP BY 1),
      |freq AS (SELECT item, cnt FROM item_cnt WHERE cnt >= 50),
      |fb AS (SELECT b.okey, b.item FROM baskets b JOIN freq f ON f.item = b.item),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b,
      |    CAST(COUNT(*) AS BIGINT) AS pair_cnt
      |  FROM fb a JOIN fb b ON a.okey = b.okey AND a.item < b.item
      |  GROUP BY 1, 2)
      |SELECT item_a, item_b, pair_cnt, fa.cnt AS cnt_a, fb2.cnt AS cnt_b,
      |  ROUND(CAST(pair_cnt AS DOUBLE) / fa.cnt, 6) AS confidence,
      |  ROUND((CAST(pair_cnt AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
      |    / (CAST(fa.cnt AS DOUBLE) * CAST(fb2.cnt AS DOUBLE)), 6) AS lift
      |FROM pairs
      |JOIN freq fa ON fa.item = pairs.item_a
      |JOIN freq fb2 ON fb2.item = pairs.item_b
      |CROSS JOIN n
      |WHERE pair_cnt >= 20
      |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
    import s.implicits._
    val baskets = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("okey"), $"l_partkey")
      .join(Tables.part(s, dir)
        .select($"p_partkey", $"p_brand".as("item")),
        $"l_partkey" === $"p_partkey")
      .select("okey", "item").distinct()
    val n = baskets.agg(countDistinct($"okey").as("n_baskets"))
    val freq = baskets.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= 50)
    val fb = baskets.join(freq.select("item"), "item").select("okey", "item")
    val pairs = fb.as("a").join(fb.as("b"),
        $"a.okey" === $"b.okey" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("item_a"), $"b.item".as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter($"pair_cnt" >= 20)
    pairs
      .join(freq.select($"item".as("item_a"), $"cnt".as("cnt_a")), "item_a")
      .join(freq.select($"item".as("item_b"), $"cnt".as("cnt_b")), "item_b")
      .crossJoin(n)
      .select($"item_a", $"item_b", $"pair_cnt", $"cnt_a", $"cnt_b",
        round($"pair_cnt".cast("double") / $"cnt_a", 6).as("confidence"),
        round(($"pair_cnt".cast("double") * $"n_baskets".cast("double"))
          / ($"cnt_a".cast("double") * $"cnt_b".cast("double")), 6).as("lift"))
      .orderBy("item_a", "item_b")
  }

  val defs: Seq[QueryDef] = Seq(q57, q58, q61, q68, q72, q75, q84, q87, q93)
}
