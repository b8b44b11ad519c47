package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-validation data generator: derives an N× dataset from a
  * driver test-data directory by unioning N key-shifted copies of each
  * table (foreign keys shift by the REFERENCED table's key range, so
  * join fan-outs are preserved exactly).
  *
  * Content columns are decorrelated per copy so the scaled corpus
  * behaves like N independent shards rather than an N-deep exact-dup
  * explosion (which would turn every near-dup/LSH query into a
  * different, artificially quadratic workload):
  *   - `documents.text`: per-copy Caesar rotation of a-z — within-copy
  *     shingle/near-dup structure is preserved verbatim, across-copy
  *     shingles are disjoint;
  *   - `embeddings.embedding`: per-copy deterministic ±1 component
  *     mask — Gaussian components are sign-symmetric, so each copy has
  *     the original distribution but is near-orthogonal to the rest.
  *
  * Usage: runMain graft.tools.ScaleData <baseDir> <outDir> <factor> [tables CSV]
  * (the optional table list limits the derivation — e.g. `documents`
  * for the 100× text rungs, where deriving 60 M lineitem rows would
  * be pure waste)
  */
object ScaleData {

  private def rot(i: Int): String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    a.drop(i % 26) + a.take(i % 26)
  }

  def main(args: Array[String]): Unit = {
    val (baseDir, outDir, factorS, onlyTables) = args match {
      case Array(b, o, f)    => (b, o, f, None)
      case Array(b, o, f, t) => (b, o, f, Some(t.split(",").map(_.trim).toSet))
    }
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$baseDir/$t.parquet")
    def keyRange(t: String, c: String): Long =
      read(t).agg(max(col(c).cast("long"))).head().getLong(0) + 1L

    // key ranges of the REFERENCED tables (FKs shift by these)
    val C = keyRange("customer", "c_custkey")
    val S = keyRange("supplier", "s_suppkey")
    val P = keyRange("part", "p_partkey")
    val O = keyRange("orders", "o_orderkey")
    val E = keyRange("events", "event_id")
    val U = keyRange("events", "user_id")
    val D = keyRange("documents", "doc_id")
    val V = keyRange("embeddings", "vec_id")

    val shifts: Map[String, Seq[(String, Long)]] = Map(
      "region" -> Nil, "nation" -> Nil,
      "customer" -> Seq("c_custkey" -> C),
      "supplier" -> Seq("s_suppkey" -> S),
      "part" -> Seq("p_partkey" -> P),
      "orders" -> Seq("o_orderkey" -> O, "o_custkey" -> C),
      "lineitem" -> Seq("l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S),
      "events" -> Seq("event_id" -> E, "user_id" -> U),
      "documents" -> Seq("doc_id" -> D),
      "embeddings" -> Seq("vec_id" -> V))

    for ((t, cols) <- shifts if onlyTables.forall(_.contains(t))) {
      val base = read(t)
      val out =
        if (cols.isEmpty || factor == 1) base
        else (0 until factor).map { i =>
          val shifted = cols.foldLeft(base) { case (df, (c, range)) =>
            df.withColumn(c,
              (col(c).cast("long") + lit(i * range)).cast(base.schema(c).dataType))
          }
          val decorrelated = t match {
            case "documents" => shifted.withColumn("text",
              translate(col("text"), rot(0), rot(i)))
            case "embeddings" => shifted.withColumn("embedding",
              transform(col("embedding"), (x, j) =>
                when(pmod(xxhash64(j, lit(i)), lit(2)) === 0, x).otherwise(-x))
                .cast("array<float>"))
            case _ => shifted
          }
          decorrelated
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale] $t x$factor -> $outDir/$t.parquet")
    }
    spark.stop()
  }
}
