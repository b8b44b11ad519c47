package graft.queries

import graft.{Canon, Fixtures, Tables}
import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** Q08–Q15: join family — inner/outer/semi/anti, multi-way, broadcast,
  * theta, as-of, cross. SURVEY.md §2.2 — the relational surface the
  * reference delegates to its warehouse (resources/redshift.py:89-112).
  */
object Joins {

  val q08 = QueryDef("q08_join_inner",
    """SELECT o_orderkey, o_custkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir); val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val q09 = QueryDef("q09_join_multiway",
    s"""SELECT r_name, n_name, ${Canon.sql.revenue("l_extendedprice", "l_discount")} AS revenue,
       |  CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY r_name, n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(s, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(s, dir), $"n_regionkey" === $"r_regionkey")
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .groupBy($"r_name", $"n_name")
      .agg(Canon.revenue($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q10 = QueryDef("q10_join_left",
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left")
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
  }

  val q10b = QueryDef("q10b_join_full",
    """SELECT a.c_custkey, a.c_name, b.o_custkey, b.cnt
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) a
      |FULL JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM orders WHERE o_custkey % 3 <= 1 GROUP BY o_custkey) b
      |  ON a.c_custkey = b.o_custkey
      |ORDER BY coalesce(a.c_custkey, b.o_custkey), a.c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    val a = Tables.customer(s, dir).filter($"c_custkey" % 3 === 0)
      .select("c_custkey", "c_name")
    val b = Tables.orders(s, dir).filter($"o_custkey" % 3 <= 1)
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    a.join(b, a("c_custkey") === b("o_custkey"), "full")
      .select(a("c_custkey"), a("c_name"), b("o_custkey"), b("cnt"))
      .orderBy(coalesce(a("c_custkey"), b("o_custkey")).asc,
        a("c_custkey").asc_nulls_first)
  }

  val q11 = QueryDef("q11_join_semi_anti",
    """SELECT 'semi' AS tag, c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'anti' AS tag, c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY tag, c_custkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(lit("semi").as("tag"), $"c_custkey")
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(lit("anti").as("tag"), $"c_custkey")
    semi.unionByName(anti).orderBy("tag", "c_custkey")
  }

  /** Small-dim broadcast join (a spec asserts BroadcastHashJoin). */
  val q12 = QueryDef("q12_join_broadcast",
    s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt, ${Canon.sql.dsum("c_acctbal")} AS acct
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"), Canon.dsum($"c_acctbal").as("acct"))
      .orderBy("n_name")
  }

  /** Equi + theta residual self-join: ordered line pairs per order. */
  val q13 = QueryDef("q13_join_theta",
    s"""SELECT l1.l_orderkey, CAST(COUNT(*) AS BIGINT) AS pair_cnt,
       |  ${Canon.sql.dsum("l1.l_extendedprice")} AS price_sum
       |FROM lineitem l1 JOIN lineitem l2
       |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
       |GROUP BY l1.l_orderkey ORDER BY l1.l_orderkey""".stripMargin) { (s, dir) =>
    val l1 = Tables.lineitem(s, dir).as("l1")
    val l2 = Tables.lineitem(s, dir).as("l2")
    l1.join(l2, col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_linenumber") < col("l2.l_linenumber"))
      .groupBy(col("l1.l_orderkey"))
      .agg(count(lit(1)).as("pair_cnt"),
        Canon.dsum(col("l1.l_extendedprice")).as("price_sum"))
      .orderBy("l_orderkey")
  }

  /** Pure-theta join (no equi component) → BroadcastNestedLoopJoin;
    * only ever used on bounded small sides. */
  val q13b = QueryDef("q13b_join_pure_theta",
    """SELECT r1.r_name AS a, r2.r_name AS b
      |FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
      |ORDER BY a, b""".stripMargin) { (s, dir) =>
    val r1 = Tables.region(s, dir).as("r1")
    val r2 = Tables.region(s, dir).as("r2")
    r1.join(r2, col("r1.r_regionkey") < col("r2.r_regionkey"))
      .select(col("r1.r_name").as("a"), col("r2.r_name").as("b"))
      .orderBy("a", "b")
  }

  /** As-of join: latest event (ts <= o_orderdate) per order, keyed on
    * custkey%20 vs user_id%20; ties → smallest event_id. */
  val q14 = QueryDef("q14_join_asof",
    """SELECT o_orderkey, asof_event_id, asof_ts FROM (
      |  SELECT o.o_orderkey, e.event_id AS asof_event_id,
      |    strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
      |    ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
      |      ORDER BY e.ts DESC NULLS LAST, e.event_id ASC) AS rn
      |  FROM orders o LEFT JOIN events e
      |    ON e.user_id % 20 = o.o_custkey % 20 AND e.ts <= o.o_orderdate
      |) WHERE rn = 1 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    val o = Tables.orders(s, dir).withColumn("k", $"o_custkey" % 20)
    val e = Tables.events(s, dir).withColumn("k", $"user_id" % 20)
    AsOf.join(o, "k", "o_orderdate", e, "k", "ts",
        Seq("event_id", "ts"), "event_id")
      .select($"o_orderkey", $"asof_event_id",
        Canon.tsStr($"asof_ts").as("asof_ts"))
      .orderBy("o_orderkey")
  }

  /** Same as-of semantics through the NATIVE custom operator
    * (AsOfJoinPlan → AsOfJoinExec sort-merge via GraftExtensions);
    * shares q14's oracle. */
  val q14b = QueryDef("q14b_join_asof_native",
    q14.oracle.get) { (s, dir) =>
    import s.implicits._
    val o = Tables.orders(s, dir).withColumn("k", $"o_custkey" % 20)
    val e = Tables.events(s, dir).withColumn("k", $"user_id" % 20)
    AsOf.joinNative(o, "k", "o_orderdate", e, "k", "ts",
        Seq("event_id", "ts"), "event_id")
      .select($"o_orderkey", $"asof_event_id",
        Canon.tsStr($"asof_ts").as("asof_ts"))
      .orderBy("o_orderkey")
  }

  /** Same as-of semantics through the time-bucketed scale variant:
    * co-partition on (key, week-bucket) with boundary carry-over, so
    * parallelism is |keys × buckets| instead of q14's 20-value key
    * cardinality; shares q14's oracle. */
  val q14c = QueryDef("q14c_join_asof_bucketed",
    q14.oracle.get) { (s, dir) =>
    import s.implicits._
    val o = Tables.orders(s, dir).withColumn("k", $"o_custkey" % 20)
    val e = Tables.events(s, dir).withColumn("k", $"user_id" % 20)
    AsOf.joinBucketed(o, "k", "o_orderdate", e, "k", "ts",
        Seq("event_id", "ts"), "event_id")(
        t => floor(unix_timestamp(t) / lit(604800L)))
      .select($"o_orderkey", $"asof_event_id",
        Canon.tsStr($"asof_ts").as("asof_ts"))
      .orderBy("o_orderkey")
  }

  /** Banded RANGE join — the scale topology for "pairs within Δt": the
    * time axis is bucketed at the band width (300 s) and the left side
    * fans out to its bucket and the next one, so the join is a pure
    * EQUI-join on (user, bucket) with the range predicate as residual.
    * A bucket(b) for b.ts ∈ (a.ts, a.ts+band] is always bucket(a) or
    * bucket(a)+1, so every qualifying pair appears in EXACTLY one
    * bucket match — no dedup needed, bounded 2× fan-out. At 100 TB
    * this replaces the per-key cartesian (hot user × full history)
    * that a key-only equi-join + filter would build; parallelism is
    * |users × buckets|, not |users|. Same oracle shape as q48's batch
    * twin but at raw-pair granularity. */
  val q13c = QueryDef("q13c_join_range_banded",
    """SELECT a.event_id AS ea, b.event_id AS eb
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTES
      |ORDER BY ea, eb""".stripMargin) { (s, dir) =>
    import s.implicits._
    val e = Tables.events(s, dir).select($"event_id", $"user_id", $"ts")
    val band = 300L // seconds — equal to the range width
    def bucket(t: org.apache.spark.sql.Column) =
      floor(unix_timestamp(t) / band)
    val a = e.select($"event_id".as("ea"), $"user_id", $"ts".as("ts_a"),
      explode(array(bucket($"ts"), bucket($"ts") + 1)).as("bucket"))
    val b = e.select($"event_id".as("eb"), $"user_id".as("user_b"),
      $"ts".as("ts_b"), bucket($"ts").as("bucket"))
    a.join(b, $"user_id" === $"user_b" && a("bucket") === b("bucket") &&
        $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"))
      .select($"ea", $"eb")
      .orderBy("ea", "eb")
  }

  val q15 = QueryDef("q15_join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select("r_name", "n_name").orderBy("r_name", "n_name")
  }

  /** Skew-salted shuffle join (q47's JOIN-side twin): dim replicated
    * 8×, fact rows salted by their OWN identity hash so a hot join key
    * spreads across 8 reducers — [[graft.ops.Skew.saltedJoin]]
    * documents when this beats broadcast and AQE skew-split. The salt
    * never reaches the output, so the result is EXACTLY the plain
    * join the oracle runs; only the shuffle distribution differs. */
  val q47b = QueryDef("q47b_salted_skew_join",
    s"""SELECT p_brand,
       |  ${graft.Canon.sql.revenue("l_extendedprice", "l_discount")} AS revenue,
       |  CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    import s.implicits._
    val joined = graft.ops.Skew.saltedJoin(
      Tables.lineitem(s, dir),
      Tables.part(s, dir).select("p_partkey", "p_brand"),
      "l_partkey", "p_partkey", buckets = 8,
      saltSource = Seq("l_orderkey", "l_linenumber"))
    joined.groupBy("p_brand")
      .agg(graft.Canon.revenue($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy("p_brand")
  }

  val defs: Seq[QueryDef] =
    Seq(q08, q09, q10, q10b, q11, q12, q13, q13b, q13c, q14, q14b, q14c, q15,
      q47b)
}
