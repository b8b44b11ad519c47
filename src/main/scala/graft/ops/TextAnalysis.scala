package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md Q43
  * + north-star ops): language-ID, quality scoring, token counting,
  * document fingerprinting. All pure column expressions — codegen'd,
  * no UDFs, embarrassingly parallel (no shuffle except final aggs).
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (top function words). The
    * heuristic is the classic stopword-ratio vote — fully relational,
    * so the DuckDB oracle can replicate it verbatim. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "on", "for"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du"),
    "es" -> Seq("el", "los", "de", "y", "en", "para", "que", "con"),
    "de" -> Seq("der", "die", "und", "das", "ein", "mit", "ist", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "人"))

  /** Per-language stopword-hit ratio columns + argmax prediction.
    * Ties break alphabetically (deterministic). */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val n = greatest(size(toks), lit(1)).cast("double")
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.foldLeft(df) { (acc, l) =>
      acc.withColumn(s"score_$l",
        size(filter(toks, t => t.isin(stopwords(l): _*))).cast("double") / n)
    }
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("pred_lang", best.getField("l"))
  }

  /** Heuristic quality score from length / punctuation / stopword /
    * word-length signals (the usual pre-training filters). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = split(lower(t), "\\s+")
    val nTok = size(toks).cast("double")
    val nChar = length(t).cast("double")
    val punct = (nChar - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))).cast("double")
    val stopHits = size(filter(toks, x => x.isin(stopwords("en"): _*))).cast("double")
    df.withColumn("n_tokens", size(toks))
      .withColumn("avg_word_len", round(nChar / greatest(nTok, lit(1.0)), 6))
      .withColumn("punct_ratio", round(punct / greatest(nChar, lit(1.0)), 6))
      .withColumn("stopword_ratio", round(stopHits / greatest(nTok, lit(1.0)), 6))
      .withColumn("quality",
        round(least(nTok / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - punct / greatest(nChar, lit(1.0))) * 0.3 +
          least(stopHits / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)) * 0.3, 6))
  }

  /** Token counts: whitespace tokens, a BPE-ish subword estimate
    * (word chunks of ≤4 chars — the ~chars/4 heuristic per word so it
    * tracks word boundaries), and a regex tokenizer count (letter runs
    * / digit runs / single punctuation — the GPT-2-style pre-split). */
  val tokenRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    df.withColumn("ws_tokens", size(toks))
      .withColumn("bpe_tokens",
        aggregate(toks, lit(0),
          (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("int")))
      .withColumn("re_tokens",
        regexp_count(lower(col(textCol)), lit(tokenRegex)).cast("int"))
  }

  /** Rolling polynomial fingerprint of normalized text: base-31 Horner
    * fold over character codes, mod 1e9+7 (modular — ANSI-safe and
    * reproducible in any engine). Pure HOF fold, no UDF. */
  def fingerprint(textCol: Column): Column =
    aggregate(
      transform(filter(split(lower(trim(textCol)), ""), c => c =!= ""),
        c => ascii(c).cast("long")),
      lit(7L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  /** Content-defined chunking (CDC — the rsync/LBFS boundary rule,
    * token-granular): split each document's token stream AFTER every
    * token whose rolling-hash fingerprint falls in the 0 residue
    * class mod `divisor` — expected chunk length ≈ `divisor` tokens.
    * Fixed-size chunking shifts EVERY downstream boundary when one
    * token is inserted (so chunk-level dedup/caching misses the whole
    * tail); content-defined boundaries depend only on local content,
    * so an edit disturbs boundaries only at the edited token — the
    * chunk-dedup-friendly split a RAG/pretraining chunker wants
    * (GraphAnalyticsSpec pins the edit-locality law). Per-token hash
    * is the engine-portable modular Horner fold ([[fingerprint]]);
    * plan: one explode pass + one per-doc window (running boundary
    * count) + the (doc, chunk) aggregate riding the same doc
    * partitioning. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos0", "token")))
      .filter(col("token") =!= "")
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("token"))
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("bnd",
        // native Horner-fold kernel — bit-identical to fingerprint()
        // on these tokens (already lowercase, no whitespace), without
        // the per-char array the HOF fold builds per token
        when(graft.functions.PortableHash(col("token")) % divisor === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk", lit(1L) + coalesce(sum(col("bnd")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        min("pos").as("start_pos"), max("pos").as("end_pos"))
  }

  /** Winnowing-style document sketch: min rolling-hash over each
    * k-token window, distinct — robust to small edits. */
  def winnowSketch(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val sh = Dedup.wordShingles(df, idCol, textCol, k)
    sh.withColumn("whash", xxhash64(col("shingle")))
      .groupBy("doc")
      .agg(min("whash").as("min_hash"),
        countDistinct("whash").as("n_windows"))
  }

  /** TF-IDF top-`k` terms per document — the keyword/salience op of
    * the text-analysis family. tf = per-(doc, term) count; df = docs
    * containing the term (derived from the tf relation, no second
    * corpus pass); idf = ln((N+1)/(df+1)) + 1 (the smoothed form, no
    * zero/negative weights); score = tf·idf rounded to 6 digits.
    *
    * RANKING uses the ROUNDED score (then term ASC): the oracle
    * hash-compares the rounded value anyway, so ranking on it adds no
    * new cross-engine surface — ranking on the raw double would let a
    * 1-ulp libm difference (Java Math.log vs the oracle's ln) flip
    * ranks that the value hash can't see.
    *
    * Scale shape: explode + (doc, term) partial-agg count (map-side
    * combine absorbs within-doc repeats), term-keyed agg for df, a
    * term-keyed join (AQE broadcasts df when the vocabulary is small;
    * shuffles both sides on term otherwise), then a per-doc top-k
    * window — WindowGroupLimit prunes to k per doc before the final
    * sort. N arrives as a literal (one count, driver-side). */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val n = docs.count().toDouble
    val toks = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf", round(
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rk").cast("int").as("rk"))
  }

  /** Corpus-frequency boilerplate stripping (the C4 rule): drop every
    * LINE that occurs in more than `maxLineDf` documents — navigation
    * chrome, subscribe banners, copyright footers repeat verbatim
    * across a crawl, and line-level global frequency finds them
    * without any pattern list. One posexplode pass, a line-hash
    * aggregate (map-side combine; the hash relation is
    * vocabulary-sized), a frequency join back, and a per-doc ordered
    * reassembly via sort_array(collect_list(struct(pos, line))) —
    * the only per-doc state is that doc's own lines. */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      maxLineDf: Int): DataFrame = {
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val freq = lines.groupBy("line").agg(count(lit(1)).as("ldf"))
    val kept = lines.join(freq, "line").filter(col("ldf") <= maxLineDf)
    docs.select(col(idCol),
        (size(split(col(textCol), "\n"))).as("n_lines_in"))
      .join(
        kept.groupBy(col(idCol)).agg(
          count(lit(1)).as("n_lines_kept"),
          md5(concat_ws("\n",
            transform(array_sort(collect_list(struct(col("pos"), col("line")))),
              x => x.getField("line")))).as("clean_hash")),
        Seq(idCol), "left_outer")
      .select(col(idCol), col("n_lines_in").cast("long").as("n_lines_in"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("clean_hash"), md5(lit(""))).as("clean_hash"))
  }

  /** Corpus-trained unigram-LM scoring — the perplexity-proxy quality
    * filter: P(w) = corpus count / corpus tokens, each document scored
    * by its mean token log-probability (and the equivalent per-token
    * perplexity). Repetitive boilerplate scores HIGH (common tokens),
    * rare-garbage scores LOW — the standard cheap stand-in for a real
    * LM filter, trained and applied in one job.
    *
    * Scale shape: one explode pass feeds the term-count aggregate
    * (map-side combine), the corpus total is a 1-row aggregate
    * broadcast onto the stream, and the token→probability join is
    * term-keyed (AQE broadcasts small vocabularies). Per-token
    * log-probs are ROUNDED to the 6-dp boundary before the
    * order-independent decimal mean (Canon discipline), so the result
    * hash-matches the oracle regardless of partitioning. */
  def unigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tc = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = tc.agg(sum("cnt").cast("double").as("total"))
    val lp = toks.join(tc, "term")
      .crossJoin(broadcast(total))
      .withColumn("lp", round(log(col("cnt").cast("double") / col("total")), 6))
    lp.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        graft.Canon.davg(col("lp")).as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))
  }

  /** Corpus-trained BIGRAM LM scoring (q43j) — [[unigramLogProb]]'s
    * sequence-aware sibling: P(b|a) = (c(a,b) + 1) / (c(a) + V)
    * (add-one smoothing; c(a) is the full unigram count, V the
    * distinct-token count), each doc scored by the mean log-prob of
    * its bigrams. Plan shape: ONE bigram-explode pass feeds both the
    * count relation and the scoring join; c(a) and V come from the
    * token pass; V (one row) broadcasts, and the two count joins are
    * vocab-/bigram-type-sized — BHJ here, SMJ at web-corpus
    * vocabularies, both chosen by Catalyst. Cross-engine determinism
    * goes one step beyond q43h's rounded-decimal mean: per-bigram
    * log-probs are quantized to INTEGER micro-nats (round(ln·10⁶) —
    * a generic double, so the rounding boundary is hit with ~10⁻¹⁰
    * probability), and the per-doc mean is then EXACT BIGINT
    * arithmetic — sum of micro-nats, ×1000, integer-DIV by the
    * bigram count (negated to positives first, so truncation
    * semantics agree everywhere) — with zero floating-point anywhere
    * in the mean. Motivation: the davg discipline divides a
    * 6-dp-exact decimal sum by the count, and when that quotient
    * lands EXACTLY on a .5×10⁻⁶ boundary DuckDB's ROUND (FP-product,
    * half-away) and Spark's (exact-expansion HALF_UP) disagree —
    * q43j's sf0.1 corpus hits this at doc 1705 (Σlp −327.752592 over
    * 96 bigrams = −3.4140895 exactly). Integer DIV has no boundary.
    * Docs with < 2 tokens have no bigrams and drop out (same rule
    * both engines). */
  def bigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = docs
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    val bg = words.select(col(idCol), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))")).as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"))
    val bc = bg.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val toks = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val uc = toks.groupBy(col("t").as("a")).agg(count(lit(1)).as("ca"))
    val vocab = toks.agg(countDistinct(col("t")).as("v"))
    val lp = bg.join(bc, Seq("a", "b")).join(uc, Seq("a"))
      .crossJoin(broadcast(vocab))
      .withColumn("lpm", round(log(
        (col("cab") + 1).cast("double") / (col("ca") + col("v")).cast("double"))
        * 1000000.0, 0).cast("long"))
    lp.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpm")).as("k"))
      // exact integer mean in nano-nats: (−k)·1000 DIV n, negated back
      .withColumn("avg_logp",
        -(expr("(-k) * 1000L DIV n_bigrams").cast("double")) / 1000000000.0)
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))
      .drop("k")
  }

  /** "More like this" (q81): sparse TF-IDF cosine top-k document
    * neighbors via an INVERTED-INDEX join — the third similarity
    * implementation shape beside dense LSH (q42b) and IVF (q42d/e):
    * no embeddings, no all-pairs — each (query, candidate) pair is
    * generated ONLY through terms they share, with the per-(qid, did)
    * partial dot products combined map-side. With a fixed query
    * batch, pair volume is Σ_term tf_q(term)·df(term) — linear in the
    * corpus; at web scale the standard df-ceiling (drop stop-terms
    * from the INDEX, not the norms) bounds the hot-term fan-out:
    * `maxDf > 0` applies it (round-16 verdict item 9 — exercised and
    * measured at 100× in SCALING.md, where the hot-term fan-out is
    * real), the declared q81 keeps maxDf = 0 because the oracle
    * fixture's vocabulary has no long tail to drop.
    *
    * Numeric discipline: weights use q43g's exact formula rounded at
    * 6 dp, then live as DECIMAL(18,6) — every product and sum (dots,
    * norms²) is exact decimal, order-independent; the single double
    * division + sqrt is one fixed IEEE expression, and ranks order by
    * the ROUNDED score (q43g's rank discipline), so the whole top-k
    * is engine- and partitioning-proof. */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      k: Int, queryModulo: Int = 100, maxDf: Long = 0): DataFrame =
    moreLikeThisStages(docs, idCol, textCol, k, queryModulo, maxDf)._2

  /** [[moreLikeThis]] plus its candidate-pair relation — exposed so the
    * SCALING probe can measure exactly what the df-ceiling bounds. */
  def moreLikeThisStages(docs: DataFrame, idCol: String, textCol: String,
      k: Int, queryModulo: Int = 100,
      maxDf: Long = 0): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    // ONE materialization of the tokenize→explode→(doc, term) count
    // pass (round-22, guide §2.4 — share one exchange across the tf,
    // df and norm aggregations): every downstream relation (dfreq, w,
    // norms, BOTH sides of the inverted-index join) derives from tf,
    // and without a stage barrier Catalyst re-executes the corpus
    // explode+agg subtree once per consumer that ReuseExchange cannot
    // dedup across AQE replanning. The staged relation is
    // (doc, term, tf) — vocabulary-sized, never the text.
    val tf = graft.Staging.stage(
      toks.groupBy("doc", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    // Weights in exact int64 MICRO-units (round-16: was decimal(18,6)
    // — value-equivalent at the same 6-dp rounding, but the 4.5M-row
    // pair stage then ran BigDecimal multiply+accumulate; int64 cuts
    // the measured sf0.1 wall 5.9→3.7 s, TfidfProbe). Cosine is
    // scale-free, so the 1e12 factors of dot and √(nq·nd) cancel and
    // the score formula is unchanged. Exactness bound: a pair's dot
    // stays in int64 while Σ_shared (tf_q·tf_d·(idf+1)²) < 9.2e6 —
    // generous for tf-bounded corpora (fixture max ≈ 9e3); a web-scale
    // deployment with pathological tf rescales to MILLI-units (3-dp
    // weights, bound ×1e6) — the q93 documented-rescale discipline.
    // The weighted index is consumed by norms AND both sides of the
    // candidate join — stage it once too, then release tf (its last
    // consumer just materialized).
    val w = graft.Staging.stage(tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("w",
        round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0)
          * 1000000.0).cast("long"))
      .select("doc", "term", "w", "df"))
    graft.CheckpointJanitor.dropNow(tf)
    // norms keep EVERY term (a doc's length is what it is); only the
    // INVERTED INDEX drops stop-terms — the standard ceiling semantics
    val norms = w.groupBy("doc").agg(sum(col("w") * col("w")).as("nsq"))
    // The pair enumeration below is CPU-DENSE, not byte-dense (each
    // shared term of a (query, candidate) pair emits a row into the
    // partial dot-product aggregate): the staged w arrives with the
    // byte-derived partitioning AQE gave it — 1-2 partitions at KB-MB
    // index sizes — which serializes the join+agg on one core
    // (measured round-22: one 2.0 s single-task stage = 55% of the
    // query). Spread the streamed index side to the core count first
    // (the cosineNearDups discipline); at corpus scale the index
    // already exceeds the core count and the conditional is a no-op.
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val idx0 = (if (maxDf > 0) w.filter(col("df") <= maxDf) else w)
      .select("doc", "term", "w")
    val idx = if (idx0.rdd.getNumPartitions < cores) idx0.repartition(cores)
      else idx0
    val q = idx.filter(col("doc") % queryModulo === 0)
      .select(col("doc").as("qid"), col("term"), col("w").as("wq"))
    // PIN the query batch as the build side (guide §3.1). Both sides
    // fit under the broadcast threshold here, and AQE's side choice
    // then depends on which exchange materializes first — measured
    // round-22: the flip to build=INDEX made the streamed side the
    // KB-sized query batch (1 post-coalesce task) probing a broadcast
    // index, i.e. the whole 4.5M-row pair explosion ran serially
    // (4-5 s single-task stage); build=QUERY-BATCH streams the index
    // wide and costs 1.5 s of TASK time across cores. The query batch
    // is the broadcast-class side by the op's own scale story (fixed
    // batch, corpus-sized index), so the pin is also the 100 TB plan:
    // the corpus side is never shuffled OR broadcast.
    val cand = broadcast(q)
      .join(idx.select(col("doc").as("did"), col("term"), col("w").as("wd")),
        Seq("term"))
      .filter(col("qid") =!= col("did"))
    val pairs = cand
      .groupBy("qid", "did").agg(sum(col("wq") * col("wd")).as("dot"))
    val scored = pairs
      .join(norms.select(col("doc").as("qid"), col("nsq").as("nq")), Seq("qid"))
      .join(norms.select(col("doc").as("did"), col("nsq").as("nd")), Seq("did"))
      .withColumn("score", round(col("dot").cast("double") /
        sqrt(col("nq").cast("double") * col("nd").cast("double")), 6))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("did"))
    (cand,
      scored.withColumn("rk", row_number().over(win).cast("long"))
        .filter(col("rk") <= k)
        .select(col("qid"), col("did"), col("rk"), col("score")))
  }
}
