package graft

import graft.ops.{Scd2, Sessions, Skew, TextAnalysis}
import graft.queries.{NorthStar, Warehouse}
import org.apache.spark.sql.functions._

/** Round-15 batch-2 operators: sessionization (q61), SCD2/CDC
  * (q60/q60b), salted skew join (q47b), unigram-LM scoring (q43h),
  * semantic dedup (q41j). The oracle pins each query's full output;
  * these tests pin the INVARIANTS the oracle can't see — boundary
  * exactness, salt-independence, structural laws — on controlled
  * inputs.
  */
class WarehouseAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, Double)*) =
    rows.toSeq.toDF("user_id", "tss", "event_id", "value")
      .select($"user_id", to_timestamp($"tss").as("ts"), $"event_id", $"value")

  test("sessionize: a gap of exactly gapSeconds stays in-session; +1 s splits") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (1L, "2024-01-01 00:30:00", 2L, 1.0), // exactly 1800 s later → same
      (1L, "2024-01-01 01:00:01", 3L, 1.0), // 1801 s later → new session
      (2L, "2024-01-01 00:00:00", 4L, 1.0))
    val s = Sessions.sessionize(e, 1800)
      .select("user_id", "event_id", "session_idx").as[(Long, Long, Long)]
      .collect().toSet
    assert(s == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("sessionize: session indexes are contiguous from 1 per user") {
    val e = Tables.events(spark, sf)
    val idx = Sessions.sessionize(e, 1800)
      .groupBy("user_id")
      .agg(min("session_idx").as("lo"), max("session_idx").as("hi"),
        countDistinct("session_idx").as("n"))
    assert(idx.filter($"lo" =!= 1 || $"hi" =!= $"n").isEmpty,
      "session_idx must be a dense 1..n sequence per user")
  }

  test("scd2 history: intervals chain per key, exactly one current") {
    val chg = Warehouse.changeFeed(spark, sf)
    val h = Scd2.history(chg, "cust_id", "eff_ts").cache()
    // exactly one open interval per key
    val open = h.groupBy("cust_id")
      .agg(sum(when($"valid_to_ts".isNull, 1).otherwise(0)).as("n_open"))
    assert(open.filter($"n_open" =!= 1).isEmpty)
    // closed intervals are non-empty and chain: valid_to = next valid_from
    assert(h.filter($"valid_to_ts".isNotNull && $"valid_to_ts" <= $"eff_ts").isEmpty)
    val nexts = h.select($"cust_id".as("cid"), $"eff_ts".as("nxt"))
    val closed = h.filter($"valid_to_ts".isNotNull)
      .join(nexts, $"cust_id" === $"cid" && $"valid_to_ts" === $"nxt",
        "left_anti")
    assert(closed.isEmpty, "every valid_to must be the key's next valid_from")
    h.unpersist()
  }

  test("scd2 latest == history's current slice") {
    val chg = Warehouse.changeFeed(spark, sf)
    val latest = Scd2.latest(chg, "cust_id", "eff_ts", Seq("segment", "acctbal"))
      .select("cust_id", "segment", "acctbal", "eff_ts")
    val current = Scd2.history(chg, "cust_id", "eff_ts")
      .filter($"is_current" === 1)
      .select("cust_id", "segment", "acctbal", "eff_ts")
    assert(latest.exceptAll(current).isEmpty && current.exceptAll(latest).isEmpty)
  }

  test("salted join: result multiset equals the plain join, salt never leaks") {
    val li = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf).select("p_partkey", "p_brand")
    val salted = Skew.saltedJoin(li, p, "l_partkey", "p_partkey", 8,
      Seq("l_orderkey", "l_linenumber"))
    assert(!salted.columns.contains("_salt"))
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
    assert(salted.count() == plain.count())
    val cols = plain.columns.map(col).toSeq
    assert(salted.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty &&
      plain.select(cols: _*).exceptAll(salted.select(cols: _*)).isEmpty)
  }

  test("unigram LM: hand-computed probabilities on a 3-doc corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1, total=6
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "avg_logp").as[(Long, Long, Double)]
      .collect().map { case (k, n, l) => k -> ((n, l)) }.toMap
    def lp(c: Int) = BigDecimal(math.log(c / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mirror Canon.davg exactly: EXACT decimal sum of the 6-dp log-probs,
    // ONE double division, then the 6-dp output round — summing rounded
    // doubles in binary instead would split half-way cases
    def avg6(xs: Double*) = BigDecimal(
      xs.map(BigDecimal(_)).sum.toDouble / xs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == 3 && math.abs(out(1L)._2 - avg6(lp(3), lp(3), lp(2))) < 1e-9)
    assert(out(2L)._1 == 2 && math.abs(out(2L)._2 - avg6(lp(3), lp(2))) < 1e-9)
    assert(out(3L)._1 == 1 && math.abs(out(3L)._2 - lp(1)) < 1e-9)
  }

  test("streaming CDC upsert (q60c) equals the batch latest-wins (q60b)") {
    // the stream arrives as multiple micro-batches with no per-key
    // order guarantee; the final Complete-mode snapshot must still be
    // exactly the batch replay's answer
    val streamed = graft.queries.Streaming.q60c.fn(spark, sf)
    val batch = Warehouse.q60b.fn(spark, sf)
    assert(streamed.schema.fieldNames.sameElements(batch.schema.fieldNames))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("snapshot diff (q66) round-trips: old + diff == new") {
    // the CDC feed q66 derives must, replayed onto the old snapshot,
    // reproduce the new snapshot exactly — the defining law of a diff
    val diff = Warehouse.q66.fn(spark, sf).cache()
    val feed = Warehouse.changeFeed(spark, sf)
    val old = feed.filter($"eff_ts" === to_timestamp(lit("2024-01-01 00:00:00")))
      .select("cust_id", "segment", "acctbal")
    val newSnap = graft.ops.Scd2.latest(feed, "cust_id", "eff_ts",
      Seq("segment", "acctbal")).select("cust_id", "segment", "acctbal")
    val upserts = diff.filter($"op" =!= "delete")
      .select("cust_id", "segment", "acctbal")
    val deletes = diff.filter($"op" === "delete").select("cust_id")
    val replayed = old
      .join(diff.select("cust_id"), Seq("cust_id"), "left_anti") // untouched
      .unionByName(upserts)
      .join(deletes, Seq("cust_id"), "left_anti")
    assert(replayed.exceptAll(newSnap).isEmpty && newSnap.exceptAll(replayed).isEmpty)
    diff.unpersist()
  }

  test("quality audit (q65): structural checks are zero, childless is informational") {
    val audit = Warehouse.q65.fn(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(audit("duplicate_orderkeys") == 0)
    assert(audit("null_customer_names") == 0)
    assert(audit("orphan_order_custkeys") == 0)
    assert(audit("nonpositive_totalprice") == 0)
    assert(audit("childless_custkeys") >= 0)
    assert(audit.size == 5)
  }

  test("q70 incremental merge law: merge(partials(base), partials(delta)) == agg(all)") {
    val merged = Warehouse.q70.fn(spark, sf)
    // the law's right-hand side, computed directly (no split, no merge)
    val direct = Tables.orders(spark, sf)
      .select(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"o_orderstatus".as("status"),
        $"o_totalprice".cast("decimal(12,2)").as("price"))
      .groupBy("month", "status")
      .agg(count(lit(1)).as("n_orders"),
        sum($"price").cast("double").as("sum_price"),
        min($"price").cast("double").as("min_price"),
        max($"price").cast("double").as("max_price"))
      .withColumn("avg_price", round($"sum_price" / $"n_orders", 6))
      .orderBy("month", "status")
    assert(merged.collect().toSeq == direct.collect().toSeq,
      "partial-aggregate merge must be bit-identical to the direct aggregate")
  }

  test("q96 HLL merge law holds under a finer 4-generation split; estimates track exact") {
    // the q70 merge law applied to the non-algebraic aggregate: union
    // of per-generation HLL sketches must estimate within the HIP-vs-
    // composite envelope of the whole-corpus sketch, however the
    // corpus is cut into generations (here: 4 cuts by order year)
    val ord = Tables.orders(spark, sf).select(
      $"o_orderstatus".as("status"), $"o_custkey".as("cust"),
      year($"o_orderdate").as("gen"))
    val merged4 = ord.groupBy("status", "gen")
      .agg(hll_sketch_agg($"cust").as("sk"))
      .groupBy("status")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_m"))
    val whole = ord.groupBy("status")
      .agg(hll_sketch_estimate(hll_sketch_agg($"cust")).as("est_w"))
    val exact = ord.groupBy("status").agg(countDistinct($"cust").as("x"))
    val bad = exact.join(merged4, "status").join(whole, "status")
      .filter(abs($"est_m" - $"est_w") > greatest($"x" * 0.033, lit(2.0)) ||
        abs($"est_m" - $"x") > $"x" * 0.05)
    assert(bad.isEmpty, s"merge law violated: ${bad.collect().mkString(", ")}")
    // and the declared entry publishes all-true verdicts
    val q = Warehouse.q96.fn(spark, sf)
    assert(q.filter(!$"approx_ok" || !$"merge_law_ok").isEmpty)
  }

  test("q71 profile: metric key set is complete and n_rows/histogram are consistent") {
    val prof = Warehouse.q71.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fixed = Set("n_rows", "text_empty", "n_chars_min", "n_chars_max",
      "n_chars_mean", "n_chars_p50", "lang_distinct", "source_distinct")
    assert(fixed.subsetOf(prof.keySet))
    assert(prof.keySet.forall(k => fixed(k) || k.startsWith("hist_")))
    val nRows = Tables.documents(spark, sf).count().toDouble
    assert(prof("n_rows") == nRows)
    // histogram buckets partition the corpus exactly
    val histSum = prof.collect { case (k, v) if k.startsWith("hist_") => v }.sum
    assert(histSum == nRows, "histogram buckets must partition all rows")
    assert(prof("n_chars_min") <= prof("n_chars_p50") &&
      prof("n_chars_p50") <= prof("n_chars_max"))
  }

  test("q72 z-score: constant baseline + spike → spike flagged, constants unflagged") {
    // fixture events table: one type, days 1..9 constant 10 events/day,
    // day 10 spikes to 100 — written as a real events.parquet so the
    // declared query runs end-to-end against it
    val dir = java.nio.file.Files.createTempDirectory("graft_zscore").toString
    val rows = for {
      day <- 1 to 10
      i <- 1 to (if (day == 10) 100 else 10)
    } yield (day * 1000L + i, f"2024-03-$day%02d 12:00:00", i.toLong, "view",
      1.0, "{}")
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select($"event_id", to_timestamp($"tss").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Analytics.q72.fn(spark, dir).collect()
    // days 1-3 dropped (np < 3); days 4-9 constant window → vr = 0 → z null
    val byDay = out.map(r => r.getString(1) -> r).toMap
    assert(byDay.keySet == (4 to 10).map(d => f"2024-03-$d%02d").toSet)
    (4 to 9).foreach { d =>
      val r = byDay(f"2024-03-$d%02d")
      assert(r.isNullAt(3) && r.getLong(4) == 0L,
        s"constant-window day $d must have null z and no flag")
    }
    val spike = byDay("2024-03-10")
    assert(spike.isNullAt(3) && spike.getLong(4) == 0L,
      "a spike over an all-constant window has vr=0 → null z by the guard")
    // now a noisy baseline: alternate 9/11, then spike — vr > 0, |z| > 2
    val rows2 = for {
      day <- 1 to 10
      i <- 1 to (if (day == 10) 100 else if (day % 2 == 0) 11 else 9)
    } yield (day * 1000L + i, f"2024-03-$day%02d 12:00:00", i.toLong, "view",
      1.0, "{}")
    rows2.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select($"event_id", to_timestamp($"tss").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out2 = graft.queries.Analytics.q72.fn(spark, dir).collect()
      .map(r => r.getString(1) -> r).toMap
    val sp2 = out2("2024-03-10")
    assert(!sp2.isNullAt(3) && sp2.getDouble(3) > 2.0 && sp2.getLong(4) == 1L,
      "spike over a noisy baseline must be flagged")
    assert((4 to 9).forall(d => out2(f"2024-03-$d%02d").getLong(4) == 0L),
      "baseline days must stay unflagged")
  }

  test("q82 point-in-time: one version per fact; boundary facts take the NEW version") {
    val out = Warehouse.q82.fn(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    assert(out.count() == nEvents,
      "chained intervals ⇒ exactly one dimension version per fact")
    // a fact timestamped exactly at a restatement boundary
    // (2024-02-01 00:00:00, cust_id % 7 = 0) must see the restated
    // (+100) balance — interval [from, to) and as-of ≤ agree here
    val boundary = out.filter(
      $"lookup_ts" === "2024-02-01 00:00:00" && $"cust_id" % 7 === 0)
    if (boundary.count() > 0) {
      val cust = Tables.customer(spark, sf)
        .select($"c_custkey".as("cust_id"), round($"c_acctbal" + 100.0, 2).as("expect"))
      assert(boundary.join(cust, "cust_id")
        .filter($"acctbal" =!= $"expect").isEmpty,
        "boundary fact must resolve to the version effective AT its timestamp")
    }
    // facts after the 2024-03-01 restatement on %13 keys see MACHINERY
    val late = out.filter($"lookup_ts" >= "2024-03-01 00:00:00" &&
      $"cust_id" % 13 === 0 && $"cust_id" <= 1000000)
    assert(late.filter($"segment" =!= "MACHINERY").isEmpty)
    out.unpersist()
  }

  test("q79 streaming incremental dedup equals the batch q41h (trigger-count invariance)") {
    val streamed = graft.queries.Streaming.q79.fn(spark, sf)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val batch = graft.queries.NorthStar.q41h.fn(spark, sf)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch,
      "multi-trigger streaming arrival must not change the kept set")
    assert(streamed.nonEmpty)
  }

  test("q98b streaming quality filter equals the batch q98 (stateless Append across triggers)") {
    val streamed = graft.queries.Streaming.q98b.fn(spark, sf)
      .select("doc_id", "logit_micro", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val batch = graft.queries.Curation5x.q98.fn(spark, sf)
      .select("doc_id", "logit_micro", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed == batch,
      "micro-batched arrival must not change a single verdict or logit")
    assert(streamed.nonEmpty)
  }

  test("q75 sequence examples: lead-chain windows on a hand-ordered stream") {
    // user 1: a b c d e → examples (a>b>c, d), (b>c>d, e); user 2: too short
    val e = ev(
      (1L, "2024-01-01 00:00:01", 1L, 1.0), // a=view
      (1L, "2024-01-01 00:00:02", 2L, 1.0),
      (1L, "2024-01-01 00:00:03", 3L, 1.0),
      (1L, "2024-01-01 00:00:04", 4L, 1.0),
      (1L, "2024-01-01 00:00:05", 5L, 1.0),
      (2L, "2024-01-01 00:00:01", 6L, 1.0),
      (2L, "2024-01-01 00:00:02", 7L, 1.0),
      (2L, "2024-01-01 00:00:03", 8L, 1.0))
      .withColumn("event_type",
        element_at(split(lit("a,b,c,d,e,x,y,z"), ","), $"event_id".cast("int")))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_seq").toString
    e.select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.Analytics.q75.fn(spark, dir)
      .select("user_id", "pos", "context", "target")
      .as[(Long, Long, String, String)].collect().toSet
    assert(out == Set((1L, 1L, "a>b>c", "d"), (1L, 2L, "b>c>d", "e")),
      "3-context windows with the following event as target; short users drop")
  }

  test("q73 heavy hitters: sketch agrees with exact on every top-10 row") {
    val out = graft.queries.Aggregates.q73.fn(spark, sf).collect()
    assert(out.length == 10)
    assert(out.forall(_.getBoolean(3)),
      "maxItemsTracked >= vocab ⇒ the sketch estimate is exact on every row")
    val cnts = out.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      "rows must rank by descending count")
  }

  test("q93 market basket: counting laws tie support to the basket relation") {
    val out = graft.queries.Analytics.q93.fn(spark, sf).cache()
    assert(out.count() > 0, "sf0.001 still has frequent brand pairs")
    // pair support can never exceed either item's support
    assert(out.filter($"pair_cnt" > $"cnt_a" || $"pair_cnt" > $"cnt_b").isEmpty)
    // thresholds held, confidence in (0,1], canonical pair order
    assert(out.filter($"cnt_a" < 50 || $"cnt_b" < 50 || $"pair_cnt" < 20).isEmpty)
    assert(out.filter($"confidence" <= 0 || $"confidence" > 1).isEmpty)
    assert(out.filter($"item_a" >= $"item_b").isEmpty)
    // spot-check one pair's support against a direct recount
    val r = out.orderBy("item_a", "item_b").head()
    val (a, b) = (r.getString(0), r.getString(1))
    val baskets = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
    val direct = baskets.filter($"p_brand" === a).select("l_orderkey")
      .intersect(baskets.filter($"p_brand" === b).select("l_orderkey")).count()
    assert(r.getLong(2) == direct, s"pair ($a,$b) support mismatch")
    out.unpersist()
  }

  test("semantic dedup: verdict laws — one keeper per cluster, sizes partition the corpus") {
    val out = NorthStar.q41j.fn(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n, "every vector gets a verdict")
    // keeper is the cluster id itself, exactly one per cluster
    assert(out.filter(($"kept" === 1) =!= ($"vec_id" === $"comp")).isEmpty)
    val perComp = out.groupBy("comp").agg(
      sum("kept").as("keepers"), count(lit(1)).as("members"),
      min("vec_id").as("lo"), first("comp_size").as("sz"))
    assert(perComp.filter($"keepers" =!= 1).isEmpty)
    assert(perComp.filter($"members" =!= $"sz").isEmpty)
    assert(perComp.filter($"lo" =!= $"comp").isEmpty,
      "cluster id must be its min member (the keeper rule)")
    out.unpersist()
  }
}
