package graft.ops

import org.apache.spark.sql.{Row, SparkSession}

/** Persistence for the IVF coarse quantizer (round-12 verdict item 6):
  * at 100 TB the index is BUILT ONCE — one corpus pass for the strided
  * sample + Lloyd step, a (cell, dim, partial-sum) shuffle, cells×dim
  * rows — and then PROBED by every query session; rebuilding the
  * quantizer per query (what a bare `ivfTopK` call does) is the
  * anti-pattern this object removes.
  *
  * The at-rest format is a tiny parquet of (cell INT, centroid
  * ARRAY<DOUBLE>, norm_sq DOUBLE) — a few KB for any realistic cell
  * count, trivially readable by any engine. Doubles round-trip parquet
  * bit-exactly, and the norm is STORED rather than recomputed on load,
  * so a loaded index reproduces `ivfCentroids`' output to the bit and
  * `ivfTopKWith(load(...))` returns byte-identical answers to the
  * inline build (IvfIndexSpec pins both).
  */
object IvfIndex {

  /** Write centroids (the [[Similarity.ivfCentroids]] result shape) as
    * one small parquet file. Overwrites `path`. */
  def save(spark: SparkSession, cents: Seq[(Int, Array[Double], Double)],
      path: String): Unit = {
    import spark.implicits._
    // coalesce(1): the index is KBs — one file, one footer to read back
    cents.map { case (cell, v, n) => (cell, v.toSeq, n) }
      .toDF("cell", "centroid", "norm_sq")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a saved index. Bounded driver collect — `cells` rows, the
    * same size class as the build's own centroid collect. */
  def load(spark: SparkSession, path: String): Seq[(Int, Array[Double], Double)] =
    spark.read.parquet(path).select("cell", "centroid", "norm_sq")
      .orderBy("cell").collect().toSeq.map {
        case Row(cell: Int, v: scala.collection.Seq[_], n: Double) =>
          (cell, v.map(_.asInstanceOf[Double]).toArray, n)
      }

  /** Build-if-absent convenience: load `path` when it already holds an
    * index, else build from `corpus` and save. The check reads only the
    * path listing, not the data. */
  def buildOrLoad(spark: SparkSession, corpus: org.apache.spark.sql.DataFrame,
      cells: Int, path: String): Seq[(Int, Array[Double], Double)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      load(spark, path)
    else {
      val cents = Similarity.ivfCentroids(corpus, cells)
      save(spark, cents, path)
      cents
    }
  }
}
