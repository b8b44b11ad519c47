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

  val defs: Seq[QueryDef] = Seq(q57, q58, q61)
}
