package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts on a known string") {
    val df = Seq((1L, "the cat sat on the extraordinary mat")).toDF("id", "text")
    val out = TextAnalysis.tokenCounts(df, "text")
      .select("ws_tokens", "bpe_tokens").as[(Int, Int)].collect()(0)
    assert(out._1 == 7)
    // ceil(3/4)+ceil(3/4)+ceil(3/4)+ceil(2/4)+ceil(3/4)+ceil(13/4)+ceil(3/4)
    assert(out._2 == 1 + 1 + 1 + 1 + 1 + 4 + 1)
  }

  test("fingerprint: deterministic, order-sensitive, edit-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("id", "text")
      .withColumn("fp", TextAnalysis.fingerprint($"text"))
    val fps = df.select("id", "fp").as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("languageId predicts the language of stopword-bearing text") {
    val df = Seq(
      (1L, "the quick fox and the lazy dog of the farm is on for a walk in town"),
      (2L, "le chat et la souris du jardin les des un une")).toDF("id", "text")
    val out = TextAnalysis.languageId(df, "text")
      .select("id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "fr")
  }

  test("winnow sketch: min-hash law, edit robustness, window count") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      // doc 2 = doc 1 with ONE tail word changed: the min over 3-token
      // window hashes usually survives a single edit — here it must,
      // because the minimal window is among the unchanged prefix ones
      (2L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    val sk = TextAnalysis.winnowSketch(df, "doc_id", "text", k = 3)
      .orderBy("doc").collect()
    // law: min_hash IS the min over the doc's shingle hashes
    val shingleMin = graft.ops.Dedup.wordShingles(df, "doc_id", "text", 3)
      .withColumn("h", xxhash64($"shingle"))
      .groupBy("doc").agg(min("h").as("m"))
      .orderBy("doc").collect()
    sk.zip(shingleMin).foreach { case (s, m) =>
      assert(s.getLong(0) == m.getLong(0))
      assert(s.getLong(1) == m.getLong(1), s"sketch min != shingle min for doc ${s.getLong(0)}")
    }
    // 8 tokens, k=3 → 6 distinct windows each
    assert(sk.forall(_.getLong(2) == 6))
    // edit robustness holds iff the two docs' minimal window is shared;
    // verify by checking the docs share >= 1 window, then compare mins
    val shared = graft.ops.Dedup.wordShingles(df, "doc_id", "text", 3)
      .groupBy("shingle").agg(countDistinct("doc").as("d"))
      .filter($"d" === 2).count()
    assert(shared == 5)
    if (sk(0).getLong(1) == sk(1).getLong(1))
      succeed // min fell in the shared prefix — the robustness story
  }

  test("quality score is in [0,1] and penalizes punctuation soup") {
    val df = Seq(
      (1L, "the ordinary sentence of reasonable length and the usual words for a test"),
      (2L, "!!! ### $$$ %%% ^^^ &&&")).toDF("id", "text")
    val out = TextAnalysis.qualityScore(df, "text")
      .select("id", "quality").as[(Long, Double)].collect().toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L))
  }

  test("tfidf top terms: hand-computed scores, rare terms outrank common ones") {
    // 3 docs; "shared" is in all 3 (df=3), "rare" only in doc 1 (df=1),
    // "twice" twice in doc 2 (tf=2, df=1). idf = ln((N+1)/(df+1)) + 1.
    val df = Seq(
      (1L, "shared rare"),
      (2L, "shared twice twice"),
      (3L, "shared")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", 5)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    def idf(dfq: Long) = math.log(4.0 / (dfq + 1.0)) + 1.0
    def exp(tf: Long, dfq: Long) =
      BigDecimal(tf * idf(dfq)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, "rare"))._5 == exp(1, 1))
    assert(out((2L, "twice"))._5 == exp(2, 1))
    assert(out((1L, "shared"))._5 == exp(1, 3))
    // rare (df=1) outranks shared (df=3) in doc 1
    assert(out((1L, "rare"))._6 == 1 && out((1L, "shared"))._6 == 2)
    // doc 3 has only one term and it still appears, rk=1
    assert(out((3L, "shared"))._6 == 1)
    // k bounds output per doc
    val perDoc = out.values.groupBy(_._1).view.mapValues(_.size)
    assert(perDoc.values.forall(_ <= 5))
  }

  test("boilerplate strip recovers exactly the pre-injection text") {
    // q43i's corpus: original docs + injected banner/footer lines; the
    // strip must remove exactly the injected lines (corpus-hot) and
    // keep every original line (unique), so clean_hash == md5(original)
    val d = Tables.documents(spark, sf).select($"doc_id", $"text")
    val docs2 = d.select($"doc_id",
      concat($"text",
        when($"doc_id" % 3 === 0, concat(lit("\n"), lit("subscribe to our newsletter today"))).otherwise(""),
        when($"doc_id" % 5 === 0, concat(lit("\n"), lit("copyright 2024 example corp all rights reserved"))).otherwise(""))
        .as("text"))
    val out = TextAnalysis.stripBoilerplate(docs2, "doc_id", "text", maxLineDf = 10)
    val expected = d.select($"doc_id", md5($"text").as("expect_hash"))
    val joined = out.join(expected, "doc_id")
    assert(joined.filter($"clean_hash" =!= $"expect_hash").isEmpty,
      "stripping must recover the original text byte-for-byte")
    assert(joined.filter($"n_lines_kept" =!= 1).isEmpty,
      "every original doc is a single (unique) line here")
    // injected docs really did have more lines going in
    assert(out.filter($"doc_id" % 3 === 0 && $"n_lines_in" < 2).isEmpty)
  }

  test("bigram LM: hand-computed smoothed probabilities, exact integer mean") {
    // corpus: d1 = "x x x" (bigrams xx, xx), d2 = "x y" (bigram xy)
    // unigrams: c(x)=4, c(y)=1, V=2
    // P(x|x) = (2+1)/(4+2) = 0.5        → lpm = round(ln(.5)·1e6)  = -693147
    // P(y|x) = (1+1)/(4+2) = 1/3        → lpm = round(ln(1/3)·1e6) = -1098612
    val docs = Seq((1L, "x x x"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val d1 = out(0); val d2 = out(1)
    assert(d1.getLong(1) == 2 && d2.getLong(1) == 1)
    // avg = -((-k)*1000 DIV n)/1e9, exact integer arithmetic
    assert(d1.getDouble(2) == -(693147L * 2 * 1000 / 2) / 1e9)
    assert(d2.getDouble(2) == -1098612L * 1000 / 1e9)
    assert(d2.getDouble(3) == math.rint(math.exp(1.098612) * 1e6) / 1e6)
  }

  test("more-like-this: inverted-index join equals a dense driver-side tf-idf cosine") {
    val corpus = Seq(
      (0L, "apple banana apple"), (1L, "apple banana"),
      (2L, "cherry durian cherry durian"), (3L, "cherry durian"),
      (4L, "apple cherry"), (5L, "banana durian banana"))
    val out = TextAnalysis.moreLikeThis(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k = 3, queryModulo = 3)
      .select("qid", "did", "rk", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    // dense reference: full tf-idf vectors, all-pairs cosine, top-3
    val tf = corpus.map { case (id, t) =>
      id -> t.split("\\s+").groupBy(identity).map { case (w, a) => w -> a.length }
    }.toMap
    val vocabDf = tf.values.flatMap(_.keys).toSeq.groupBy(identity)
      .map { case (w, a) => w -> a.length }
    val n = corpus.size.toDouble
    def weight(c: Int, df: Int): BigDecimal =
      BigDecimal(c * (math.log((n + 1.0) / (df + 1.0)) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val vecs = tf.map { case (id, m) =>
      id -> m.map { case (w, c) => w -> weight(c, vocabDf(w)) }
    }
    def cos(a: Map[String, BigDecimal], b: Map[String, BigDecimal]): Double = {
      val dot = a.keySet.intersect(b.keySet).toSeq.map(w => a(w) * b(w)).sum
      val na = a.values.map(x => x * x).sum; val nb = b.values.map(x => x * x).sum
      BigDecimal(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (for {
      qid <- Seq(0L, 3L)
      ranked = corpus.map(_._1).filter(_ != qid)
        .map(did => (did, cos(vecs(qid), vecs(did))))
        .sortBy { case (did, s) => (-s, did) }.take(3).zipWithIndex
      ((did, s), i) <- ranked
    } yield (qid, did, (i + 1).toLong, s)).toSet
    assert(out == expected,
      s"inverted-index result diverged from the dense reference:\n$out\nvs\n$expected")
  }

  test("bigram LM sees word ORDER where the unigram model cannot") {
    // corpus dominated by the order "alpha beta"; probe docs use the
    // same unigram bag in both orders → identical unigram score,
    // different bigram score (the model's reason to exist)
    val train = (1L to 20L).map(i => (i, "alpha beta")) :+
      (21L, "beta alpha")
    val docs = train.toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .select($"doc_id", $"avg_logp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(21L),
      "the corpus-common order must outscore the rare order")
    val uni = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .select($"doc_id", $"avg_logp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(1L) == uni(21L),
      "unigram scoring is order-blind on the same bag of words")
  }
}
