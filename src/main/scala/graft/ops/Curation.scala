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

  // ───────────── model-based filtering / importance resampling ─────────────

  /** Feature-hashing bucket count for the linear scorer family (q98/
    * q99). 1024 buckets keeps the weight array broadcast-trivial and
    * the DuckDB restatement enumerable. */
  val HashDim = 1024

  /** q98's deterministic stand-in for TRAINED logistic-regression
    * weights: w⁺(b) = (1664525·b + 1013904223) mod 2001 ∈ [0, 2000] —
    * milli-units shifted by +1000 so every per-token contribution is
    * POSITIVE (the q43j discipline: integer DIV needs a non-negative
    * numerator for Spark's truncation and DuckDB's floor to agree).
    * The formula (an LCG step) is stated identically in the oracle;
    * a production pipeline loads real trained weights here and the
    * plan does not change. */
  def lcgWeights(d: Int = HashDim): Array[Long] =
    Array.tabulate(d)(b => (1664525L * b + 1013904223L) % 2001L)

  /** fastText-style HASHED LINEAR quality classifier (q98): score
    * every document with a logistic model over hashed bag-of-words
    * features — the model-based quality-filter stage of the published
    * LLM pipelines (GPT-3's quality classifier, CCNet, LLaMA), whose
    * defining scale trick is the HASHING TRICK: features are
    * `portableBase(token) mod D`, so there is NO vocabulary relation,
    * NO join, and the whole scoring pass is one map over the corpus
    * ([[graft.functions.BucketWeightSum]] — a fused kernel walking
    * each token array once; weights ride the expression as a codegen
    * reference object, the PqCodes discipline).
    *
    * Exactness: per-token weights are integer milli-units; the per-doc
    * mean is integer micro-units via DIV on the positive-shifted sum;
    * the only IEEE arithmetic is the final sigmoid rendering, computed
    * from the already-exact integer logit in one fixed tree. The keep
    * verdict compares INTEGERS (logit_micro > 0) — no float in the
    * decision. */
  def hashedLinearScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bw = graft.functions.BucketWeightSum(
      array_remove(split(lower(col(textCol)), "\\s+"), ""),
      lcgWeights())
    docs.select(col(idCol).as("doc_id"), bw.as("bw"))
      .filter(col("bw").isNotNull)
      .select(col("doc_id"), col("bw").getItem(0).as("n_tokens"),
        col("bw").getItem(1).as("sw"))
      .withColumn("logit_micro",
        expr("(sw * 1000) div n_tokens") - lit(1000000L))
      .select(col("doc_id"), col("n_tokens"), col("logit_micro"),
        round(lit(1.0) / (lit(1.0) +
          exp(-col("logit_micro").cast("double") / lit(1000000.0))), 6)
          .as("prob"),
        (col("logit_micro") > 0).as("keep"))
  }

  /** DuckDB restatement of [[hashedLinearScore]] — explode + the same
    * LCG weight formula per bucket; integer sums are order-independent
    * so the fused-kernel result matches bit-exactly. */
  def hashedLinearScoreSql(src: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split_regex(lower(text), '\\s+')) AS t
       |  FROM $src),
       |t2 AS (SELECT doc_id, t FROM toks WHERE t <> ''),
       |bh AS (SELECT doc_id, ${Dedup.baseHashSql("t")} % $HashDim AS b FROM t2),
       |contrib AS (SELECT doc_id, (1664525 * b + 1013904223) % 2001 AS wpos FROM bh),
       |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |        CAST(SUM(wpos) AS BIGINT) AS sw
       |      FROM contrib GROUP BY 1),
       |sc AS (SELECT doc_id, n_tokens,
       |         (sw * 1000) // n_tokens - 1000000 AS logit_micro
       |       FROM d)
       |SELECT doc_id, n_tokens, logit_micro,
       |  ROUND(1.0 / (1.0 + exp(-CAST(logit_micro AS DOUBLE) / 1000000.0)), 6) AS prob,
       |  (logit_micro > 0) AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  /** DSIR importance resampling (q99 — Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): weight
    * every raw document by how much its hashed-unigram profile looks
    * like a TARGET domain, then keep the top quarter. The published
    * recipe verbatim: build unigram distributions over HASHED buckets
    * (the same D=[[HashDim]] hashing trick — no vocabulary) for the
    * target slice and the raw corpus, add-one smooth, and score each
    * doc by Σ_tokens log(p_target(bucket)/p_raw(bucket)).
    *
    * Plan: two bucket-histogram aggregates (output D rows each — the
    * "model" is a D-row relation whatever the corpus size), their
    * per-bucket log-ratios rounded ONCE to integer micro-nats (D IEEE
    * trees total, each one ln + one round from exact integers), then
    * the corpus-wide scoring pass is [[graft.functions
    * .BucketWeightSum]] again — the micro-nat table collected to a
    * D-long literal array (metadata-sized, the Pq codebook precedent)
    * and fused into one map-only kernel: zero explode, zero join, and
    * the per-doc sum is EXACT integer arithmetic so partial-agg order
    * can't flip a verdict. Selection is a distributed global rank
    * ([[Ranking.globalRank]] — no single-partition window) with
    * keep = rank ≤ ⌈n/4⌉.
    *
    * The target here is the English slice (`lang = 'en'`) — a
    * deterministic stand-in for "looks like Wikipedia"; a production
    * run swaps in any target corpus and the plan is unchanged. Note
    * the published weight is the per-doc SUM of token log-ratios, so
    * short documents are favored when the average ratio is negative
    * (most tokens off-target) — the per-token average variant divides
    * by n_tokens (q43j's shifted-DIV discipline) if length-fairness
    * matters more than paper fidelity. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, keepNum: Int = 1, keepDen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val d = HashDim
    val toks = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        isTarget.as("is_t"))
      .select(col("doc_id"), col("is_t"),
        explode(array_remove(split(lower(col("text")), "\\s+"), ""))
          .as("t"))
    val bucketed = toks
      .withColumn("b", graft.functions.PortableHash(col("t")) % d)
    // two histograms in ONE corpus pass (conditional agg), output D rows
    val hist = bucketed.groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val totals = hist.agg(sum("cr").as("nr"), sum("ct").as("nt")).collect()(0)
    val (nr, nt) = (totals.getLong(0), totals.getLong(1))
    // per-bucket micro-nat log-ratio, one fixed IEEE tree from exact
    // int64 products ((c+1)·(N+D) < 2^53 up to ~10^8-token corpora per
    // side — rescale to doubles-first past that, documented here)
    val lrRows = hist.select(col("b"),
        (round(log(
          ((col("ct") + 1) * lit(nr + d)).cast("double") /
            ((col("cr") + 1) * lit(nt + d)).cast("double")) * 1000000.0))
          .cast("long").as("lr"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    // unseen buckets (no token hashed there): ct=cr=0 → lr of the pure
    // smoothing ratio — same closed form, stated in the oracle too
    val weights = Array.tabulate(d)(b => lrRows.getOrElse(b,
      math.round(math.log((nr + d).toDouble / (nt + d).toDouble) * 1000000.0)))
    val bw = graft.functions.BucketWeightSum(
      array_remove(split(lower(col(textCol)), "\\s+"), ""), weights)
    val scored = docs
      .select(col(idCol).as("doc_id"), col("lang"), bw.as("bw"))
      .filter(col("bw").isNotNull)
      .select(col("doc_id"), col("lang"),
        col("bw").getItem(0).as("n_tokens"),
        col("bw").getItem(1).as("weight_micro"))
    val n = scored.count()
    val keepUpTo = (n * keepNum + keepDen - 1) / keepDen // ⌈n·num/den⌉
    Ranking.globalRank(scored, "rnk",
        col("weight_micro").desc, col("doc_id"))
      .withColumn("keep", col("rnk") <= keepUpTo)
      .select("doc_id", "lang", "n_tokens", "weight_micro", "rnk", "keep")
  }

  /** DuckDB restatement of [[dsirSelect]] with `lang = 'en'` as the
    * target — histograms, smoothing, micro-nat rounding, scoring and
    * the ⌈n/4⌉ keep rule, bit-exact. The naive global window here vs
    * the distributed rank in the DataFrame plan is the q78/q95
    * distributed≡naive proof pattern. */
  def dsirSelectSql(src: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, UNNEST(string_split_regex(lower(text), '\\s+')) AS t
       |  FROM $src),
       |t2 AS (SELECT doc_id, lang, t FROM toks WHERE t <> ''),
       |bh AS (SELECT doc_id, lang, ${Dedup.baseHashSql("t")} % $HashDim AS b FROM t2),
       |hist AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
       |           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |         FROM bh GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
       |        FROM hist),
       |lr AS (SELECT b,
       |         CAST(ROUND(ln(CAST((ct + 1) * (nr + $HashDim) AS DOUBLE) /
       |                       CAST((cr + 1) * (nt + $HashDim) AS DOUBLE)) * 1000000.0)
       |           AS BIGINT) AS lr
       |       FROM hist CROSS JOIN tot),
       |scored AS (SELECT bh.doc_id, ANY_VALUE(bh.lang) AS lang,
       |             CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |             CAST(SUM(lr.lr) AS BIGINT) AS weight_micro
       |           FROM bh JOIN lr USING (b) GROUP BY bh.doc_id),
       |ranked AS (SELECT doc_id, lang, n_tokens, weight_micro,
       |             CAST(ROW_NUMBER() OVER (ORDER BY weight_micro DESC, doc_id)
       |               AS BIGINT) AS rnk,
       |             COUNT(*) OVER () AS n
       |           FROM scored)
       |SELECT doc_id, lang, n_tokens, weight_micro, rnk,
       |  (rnk * 4 <= n + 3) AS keep
       |FROM ranked ORDER BY doc_id""".stripMargin
}
