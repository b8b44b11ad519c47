package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cost-attribution probe for q81 (TF-IDF more-like-this): same plan
  * shape with (a) the declared exact-DECIMAL weight arithmetic,
  * (b) int64 micro-unit weights (exact, bounded), (c) raw doubles
  * (inexact — FLOOR measurement only). Separates "the decimal
  * arithmetic costs X" from "the join/shuffle volume costs Y" before
  * any rewrite of the declared query.
  *
  * Usage: runMain graft.tools.TfidfProbe <sfDir> [queryModulo]
  */
object TfidfProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qmod = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    def base(): (DataFrame, DataFrame) = {
      val toks = docs.select(col("doc_id").as("doc"),
          explode(split(lower(col("text")), "\\s+")).as("term"))
        .filter(col("term") =!= "")
      val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("n"))
      (tf.join(dfreq, "term").crossJoin(broadcast(n)), docs)
    }

    // (a) declared: decimal(18,6) weights, decimal partial-agg dot
    def runDecimal(): Long = {
      val (j, _) = base()
      val w = j.withColumn("w",
          round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6)
            .cast("decimal(18,6)"))
        .select("doc", "term", "w")
      val norms = w.groupBy("doc").agg(sum(col("w") * col("w")).as("nsq"))
      val q = w.filter(col("doc") % qmod === 0)
        .select(col("doc").as("qid"), col("term"), col("w").as("wq"))
      val pairs = q.join(w.select(col("doc").as("did"), col("term"), col("w").as("wd")), Seq("term"))
        .filter(col("qid") =!= col("did"))
        .groupBy("qid", "did").agg(sum(col("wq") * col("wd")).as("dot"))
      val scored = pairs
        .join(norms.select(col("doc").as("qid"), col("nsq").as("nq")), Seq("qid"))
        .join(norms.select(col("doc").as("did"), col("nsq").as("nd")), Seq("did"))
        .withColumn("score", round(col("dot").cast("double") /
          sqrt(col("nq").cast("double") * col("nd").cast("double")), 6))
      val win = Window.partitionBy("qid").orderBy(col("score").desc, col("did"))
      scored.withColumn("rk", row_number().over(win)).filter(col("rk") <= 5).count()
    }

    // (b) int64 micro-unit weights: exact under documented bounds
    def runInt(): Long = {
      val (j, _) = base()
      val w = j.withColumn("wi",
          round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0) * 1000000.0)
            .cast("long"))
        .select("doc", "term", "wi")
      val norms = w.groupBy("doc").agg(sum(col("wi") * col("wi")).as("nsq"))
      val q = w.filter(col("doc") % qmod === 0)
        .select(col("doc").as("qid"), col("term"), col("wi").as("wq"))
      val pairs = q.join(w.select(col("doc").as("did"), col("term"), col("wi").as("wd")), Seq("term"))
        .filter(col("qid") =!= col("did"))
        .groupBy("qid", "did").agg(sum(col("wq") * col("wd")).as("dot"))
      val scored = pairs
        .join(norms.select(col("doc").as("qid"), col("nsq").as("nq")), Seq("qid"))
        .join(norms.select(col("doc").as("did"), col("nsq").as("nd")), Seq("did"))
        .withColumn("score", round(col("dot").cast("double") /
          sqrt(col("nq").cast("double") * col("nd").cast("double")), 6))
      val win = Window.partitionBy("qid").orderBy(col("score").desc, col("did"))
      scored.withColumn("rk", row_number().over(win)).filter(col("rk") <= 5).count()
    }

    // (c) double weights — floor (inexact, never declared)
    def runDouble(): Long = {
      val (j, _) = base()
      val w = j.withColumn("w",
          col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
        .select("doc", "term", "w")
      val norms = w.groupBy("doc").agg(sum(col("w") * col("w")).as("nsq"))
      val q = w.filter(col("doc") % qmod === 0)
        .select(col("doc").as("qid"), col("term"), col("w").as("wq"))
      val pairs = q.join(w.select(col("doc").as("did"), col("term"), col("w").as("wd")), Seq("term"))
        .filter(col("qid") =!= col("did"))
        .groupBy("qid", "did").agg(sum(col("wq") * col("wd")).as("dot"))
      val scored = pairs
        .join(norms.select(col("doc").as("qid"), col("nsq").as("nq")), Seq("qid"))
        .join(norms.select(col("doc").as("did"), col("nsq").as("nd")), Seq("did"))
        .withColumn("score", round(col("dot") / sqrt(col("nq") * col("nd")), 6))
      val win = Window.partitionBy("qid").orderBy(col("score").desc, col("did"))
      scored.withColumn("rk", row_number().over(win)).filter(col("rk") <= 5).count()
    }

    // warmup once, then 3 timed rounds each
    runDecimal(); runInt(); runDouble()
    for (r <- 1 to 3) {
      val (cd, td) = timed(runDecimal())
      val (ci, ti) = timed(runInt())
      val (cf, tf2) = timed(runDouble())
      println(f"[tfidfprobe] round=$r decimal=$td%.2fs($cd) int64=$ti%.2fs($ci) double=$tf2%.2fs($cf)")
    }
    spark.stop()
  }
}
