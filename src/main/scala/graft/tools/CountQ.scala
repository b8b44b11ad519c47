package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    println("DECLARED=" + graft.SparkEntry.queries.size)
    println("DUALS=" + graft.queries.SqlQueries.dualPairs.size)
    println("ORACLES=" + graft.SparkEntry.oracleSql.size)
  }
}
