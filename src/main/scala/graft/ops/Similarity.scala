package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Similarity search over embedding columns (SURVEY.md Q42 + north-star
  * ops): brute-force cosine top-k as the exact baseline, LSH-bucketed
  * ANN as the scale path.
  *
  * Numeric discipline: dot products and norms accumulate per-term
  * decimal(22,15) values (exact, order-independent) and only the final
  * cosine is IEEE double — so results are deterministic across
  * partitionings and bit-match the DuckDB oracle.
  */
object Similarity {

  /** Exact decimal dot product of two float-array columns.
    * Terms at scale 14 with a (37,14) accumulator: the Add stays at
    * precision 38 so Spark never engages precision-loss rescaling —
    * every partial sum is exact and matches DuckDB's exact list_sum
    * over the same scale-14 terms. */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) * y.cast(DoubleType)).cast(DecimalType(23, 14))),
      lit(BigDecimal(0)).cast(DecimalType(37, 14)),
      (acc, x) => (acc + x).cast(DecimalType(37, 14)))
      .cast(DoubleType)

  /** Exact decimal squared norm. */
  def normSqDecimal(a: Column): Column = dotDecimal(a, a)

  /** Double-fold dot product: sequential HOF fold → deterministic for
    * a fixed element order (cheaper than the decimal path; used by the
    * ANN/near-dup variants where no cross-engine oracle is involved). */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * the corpus — one pass over the corpus, no shuffle of the corpus
    * itself; per-query top-k via window. At 100 TB the corpus side
    * stays partition-local; only (query, k) results shuffle. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", normSqDecimal(col("qe")))
    val scored = c.join(broadcast(q), col("qid") =!= col("vid"))
      .withColumn("cosine",
        dotDecimal(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vid"), col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `planes` deterministic pseudo-random directions (hash-derived, no
    * stored model). Vectors in the same bucket are ANN candidates. */
  def lshBucket(emb: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // pseudo-random plane: component j has sign from xxhash64(p, j)
      val s = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, j) =>
          when(xxhash64(lit(p), j) % 2 === 0, x.cast(DoubleType))
            .otherwise(-x.cast(DoubleType))),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket, then
    * exact cosine within the bucket. The bucket join is an equi-join
    * (shuffle on bucket id) instead of a full cross product — the 100 TB
    * path. Recall vs. the exact baseline is asserted in specs. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("bucket", lshBucket(col("ce"), planes))
      .withColumn("cnorm", normSqDecimal(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("bucket", lshBucket(col("qe"), planes))
      .withColumn("qnorm", normSqDecimal(col("qe")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cosine",
        dotDouble(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vid"), col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed self-join,
    * exact cosine verify, threshold filter. */
  def cosineNearDups(emb: DataFrame, planes: Int, threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshBucket(col("embedding"), planes))
      .withColumn("nrm", normSqDecimal(col("embedding")))
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        dotDouble(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cosine"), 6).as("cosine"))
  }
}
