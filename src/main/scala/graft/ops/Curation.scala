package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation operators a pre-training pipeline runs between dedup /
  * quality-filtering (q41/q43) and the training job itself:
  *
  *  - benchmark decontamination (word-n-gram overlap against an eval
  *    set — the exact-substring/13-gram check every serious corpus
  *    release documents),
  *  - PII redaction (regex scrub of emails / phone numbers / long
  *    account-like digit runs),
  *  - sequence packing (concatenate-then-chunk document → context-
  *    window assignment, and the greedy no-straddle variant).
  *
  * Everything except the greedy packer is pure relational algebra, so
  * the DuckDB oracle replicates it verbatim. Scale shape at 100 TB:
  * the eval-gram side of decontamination is benchmark-sized (thousands
  * of docs) → broadcast; the train side is a map-only explode feeding
  * a broadcast semi/inner join — no shuffle of the corpus itself. The
  * packers shuffle once on the shard key and are embarrassingly
  * parallel across shards.
  */
object Curation {

  // ───────────────────────── decontamination ─────────────────────────

  /** Distinct word n-grams of the eval (benchmark) slice. Benchmark
    * sets are small by construction — the result is broadcast-sized
    * even when the corpus is 100 TB. */
  def evalGrams(docs: DataFrame, isEval: Column, n: Int): DataFrame =
    Dedup.wordShingles(docs.filter(isEval), "doc_id", "text", n)
      .select(col("shingle")).distinct()

  /** Per-train-doc count of distinct n-grams shared with the eval set
    * (only contaminated docs appear). `wordShingles` already emits
    * each doc's grams distinct, so the post-join count IS the distinct
    * shared-gram count. Plan: map-only explode → broadcast hash join →
    * one partial-agg shuffle on doc_id. */
  def contaminationScores(docs: DataFrame, isEval: Column, n: Int): DataFrame =
    Dedup.wordShingles(docs.filter(!isEval), "doc_id", "text", n)
      .join(broadcast(evalGrams(docs, isEval, n)), Seq("shingle"))
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_shared"))

  /** The contaminated-id SET (no per-doc counts): train-gram rows
    * semi-joined to the broadcast eval grams, then distinct doc ids.
    * The distinct is the scale guard — the anti-join consumer would
    * tolerate duplicate ids, but broadcasting the raw (doc, shared
    * gram) matches could be GBs on a heavily-contaminated 100 TB
    * corpus while the distinct id set stays ∝ contaminated docs.
    * (Round-13 advice asked for this semi-join shape over
    * `contaminationScores.select("doc_id")`; the physical plan was
    * ALREADY identical — Catalyst prunes the unused count, leaving
    * HashAggregate(functions=[]) — so this is the logical plan saying
    * what it means, verified plan-equal in EXPLAINS q52b.) */
  def contaminatedIds(docs: DataFrame, isEval: Column, n: Int): DataFrame =
    Dedup.wordShingles(docs.filter(!isEval), "doc_id", "text", n)
      .join(broadcast(evalGrams(docs, isEval, n)), Seq("shingle"), "left_semi")
      .select(col("doc").as("doc_id")).distinct()

  /** The decontaminated training slice: train docs sharing NO n-gram
    * with the eval set. The contaminated-id set is a (small) derived
    * relation — broadcast anti-join, corpus stays map-side. */
  def decontaminated(docs: DataFrame, isEval: Column, n: Int): DataFrame =
    docs.filter(!isEval)
      .join(broadcast(contaminatedIds(docs, isEval, n)), Seq("doc_id"), "left_anti")

  // ───────────────────── repetition filtering ─────────────────────

  /** Gopher-style repetition metrics per document: the fraction of
    * words that are repeats (1 − distinct/total) and the fraction of
    * word bigrams that are repeats — the standard signals a
    * pre-training pipeline thresholds to drop boilerplate/looped text.
    * Pure codegen'd array expressions (split → array_distinct → size),
    * map-only: at 100 TB this runs inside the scan stage with zero
    * shuffle. Fractions round to 6 digits (the q43 quality-score
    * discipline) so Spark and DuckDB hash-agree. */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
      maxDupWord: Double = 0.55, maxDupBigram: Double = 0.04): DataFrame = {
    val w = split(lower(trim(col(textCol))), "\\s+")
    val n = size(w)
    val dupW = round(lit(1.0) - size(array_distinct(w)) / n.cast("double"), 6)
    val grams = transform(sequence(lit(1), n - 1),
      i => concat(element_at(w, i), lit(" "), element_at(w, i + 1)))
    val dup2 = when(n >= 2,
      round(lit(1.0) - size(array_distinct(grams)) / (n - 1).cast("double"), 6))
      .otherwise(lit(0.0))
    docs.select(col(idCol),
        n.cast("long").as("n_words"), dupW.as("dup_word_frac"),
        dup2.as("dup_2gram_frac"))
      .withColumn("keep",
        (col("dup_word_frac") <= maxDupWord &&
         col("dup_2gram_frac") <= maxDupBigram).cast("long"))
  }

  // ──────────────────────────── PII scrub ────────────────────────────

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  private val LongNumRe = "[0-9]{6,}"

  /** Regex PII scrub: emails, phone-shaped numbers, then 6+-digit
    * account-like runs — in that order so an email's local part is
    * consumed before the digit-run rule can see it. Plain codegen'd
    * `regexp_replace` chain (map-only; the patterns are shared by the
    * DuckDB oracle, which needs the 'g' flag for replace-all). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      LongNumRe, "<NUM>")

  // ───────────────────────── sequence packing ─────────────────────────

  /** Concatenate-then-chunk packing (the GPT-style pre-training
    * layout): within each shard, documents are laid head-to-tail in
    * doc_id order and the token stream is cut every `budget` tokens; a
    * document is assigned to EVERY chunk its span touches (one output
    * row per (doc, chunk)). Exactly SQL-expressible — the start offset
    * is a window prefix-sum, the chunk list an integer-division
    * `sequence` — so the DuckDB oracle checks it bit-for-bit.
    * One shuffle (window partition on the shard key); shards are
    * independent, so 100 TB parallelizes across shards. */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
      shard: Int, budget: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("grp", expr(s"$idCol DIV $shard"))
      .withColumn("n_tokens",
        size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("start_off", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("chunk", explode(expr(
        s"sequence(start_off DIV $budget, (start_off + n_tokens - 1) DIV $budget)")))
      .select(col(idCol), col("grp"), col("n_tokens"),
        col("start_off"), col("chunk"))
  }

  /** Greedy no-straddle packing: within each shard (doc_id order) a
    * document that would overflow the current pack starts a new one;
    * a document longer than `budget` gets a pack of its own. A genuine
    * running-reset scan — not window-expressible — so this is the one
    * curation op on the imperative `mapPartitions` path: rows are
    * co-located per shard (`repartition(grp)`) and sorted
    * (`sortWithinPartitions`), the scan is streaming (no per-group
    * buffering), and the result is a pure function of (grp, doc_id)
    * order — deterministic under any partition count (CurationSpec
    * pins this plus the pack-capacity invariants). */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      shard: Int, budget: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .withColumn("grp", expr(s"$idCol DIV $shard"))
      .withColumn("n_tokens",
        size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .select(col(idCol).cast("long").as("doc_id"),
        col("grp").cast("long"), col("n_tokens"))
    base.repartition(col("grp")).sortWithinPartitions("grp", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curGrp = Long.MinValue
        var pack = 0L
        var used = 0L
        it.map { case (id, grp, n) =>
          if (grp != curGrp) { curGrp = grp; pack = 0L; used = 0L }
          if (used > 0 && used + n > budget) { pack += 1L; used = 0L }
          used += n
          (id, grp, n, pack)
        }
      }
      .toDF("doc_id", "grp", "n_tokens", "pack")
  }

  // ───────────────────── token-budget selection ─────────────────────

  /** Select the highest-`quality` rows until a global `tokens` budget
    * is filled — the corpus-selection op every training-data build
    * runs last ("take the best N-token subset"). A row is kept iff
    * the running token total over the (quality DESC, id) order,
    * INCLUDING the row, fits the budget.
    *
    * The global prefix sum is computed scale-safely — NOT with a
    * single-partition global window:
    *
    *  1. range-repartition on (quality DESC, id): partition i holds a
    *     contiguous slice of the selection order;
    *  2. per-partition token subtotals (one tiny agg, ≤ #partitions
    *     rows) become cumulative partition offsets on the driver —
    *     bounded by the partition count, never by data;
    *  3. each partition adds its offset to a PARTITION-LOCAL window
    *     prefix sum — map-side after the one range shuffle.
    *
    * Partitions whose offset already exceeds the budget are dropped
    * wholesale before the window runs (predicate on the offset
    * literal, pushed BELOW the window's exchange), so everything after
    * the range shuffle is bounded by the budget, not the corpus: the
    * window's `_pid` re-hash (Catalyst cannot see that a checkpointed
    * RDD is already pid-clustered) shuffles only the affordable slice.
    * Pass a SLIM projection (id, quality, tokens, carry-along keys) and
    * join text back by id afterwards — the two shuffles then move
    * ~24 B/row, not documents. The kept set is a pure function of the
    * total order — independent of the partition count (CurationSpec
    * pins 1-vs-many partition equality). */
  def selectUnderBudget(docs: DataFrame, idCol: String, qualityCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    val ranged = docs
      .repartitionByRange(col(qualityCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
    // localCheckpoint: the offsets agg and the main pass must see the
    // SAME partitioning (range sampling re-runs otherwise)
    val staged = ranged.transform(graft.Staging.stage)
    val ptok = staged.groupBy("_pid")
      .agg(sum(col(tokensCol).cast("long")).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      ptok.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid + 1, acc + t) }
        .init.zip(ptok).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val offExpr = coalesce(
      element_at(typedLit(offsets), col("_pid")), lit(0L))
    val w = Window.partitionBy("_pid")
      .orderBy(col(qualityCol).desc, col(idCol))
    staged
      .filter(offExpr <= budget) // whole-partition prune past the budget
      .withColumn("cum_tokens",
        sum(col(tokensCol).cast("long")).over(w) + offExpr)
      .filter(col("cum_tokens") <= budget)
      .drop("_pid")
  }
}
