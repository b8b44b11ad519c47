package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val chain = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("da", "db")
    val t0 = System.nanoTime()
    // smallGraphEdges = 0: the probe exists to measure the DISTRIBUTED star
    // rounds; the default guard would route a 1000-chain to the fast path
    val (comp, rounds) = graft.ops.Dedup.nearDupComponentsWithRounds(chain, smallGraphEdges = 0)
    val roots = comp.select("comp").distinct().count()
    println(f"[chainprobe] n=$n rounds=$rounds roots=$roots wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
