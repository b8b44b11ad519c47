package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the q41b/q41c golden pin CSVs at sf0.001 from the
  * CURRENT portable hash family. Run only after the family's outputs
  * hash-match the DuckDB oracle (the pins inherit the oracle's
  * authority; this tool just snapshots them for in-suite drift checks).
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("golden-gen")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val sf = "/root/testdata/sf0.001"
    val out = new java.io.File("src/test/resources/golden")
    out.mkdirs()
    def dump(name: String, header: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.collect().map { r =>
        s"${r.get(0)},${r.get(1)},${r.get(2)}"
      }
      val w = new java.io.PrintWriter(new java.io.File(out, name), "UTF-8")
      try { w.println(header); rows.foreach(w.println) } finally w.close()
      println(s"$name: ${rows.length} rows")
    }
    dump("q41b_sf0001.csv", "doc_a,doc_b,est_jaccard",
      graft.queries.NorthStar.q41b.fn(spark, sf))
    dump("q41c_sf0001.csv", "doc_a,doc_b,hamming",
      graft.queries.NorthStar.q41c.fn(spark, sf))
    spark.stop()
  }
}
