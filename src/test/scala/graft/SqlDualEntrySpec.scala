package graft

import graft.queries.SqlQueries

/** Every SQL-text dual entry (SqlQueries.dualPairs) must be the SAME
  * query as its DataFrame twin: identical column names and identical
  * row multiset. The driver's oracle gate checks each `_sql` entry
  * against DuckDB independently; this spec pins the two Spark entry
  * styles to each other. */
class SqlDualEntrySpec extends SparkSpec {

  test("SQL-text entries match their DataFrame twins row-for-row") {
    assert(SqlQueries.dualPairs.size >= 15, "dual-entry surface shrank")
    SqlQueries.dualPairs.foreach { case (twin, text) =>
      Tables.registerViews(spark, sf)
      val df = twin.fn(spark, sf)
      val sq = spark.sql(text)
      assert(sq.schema.fieldNames.sameElements(df.schema.fieldNames),
        s"${twin.name}: columns ${sq.schema.fieldNames.mkString(",")} vs " +
          df.schema.fieldNames.mkString(","))
      assert(sq.count() == df.count(), s"${twin.name}: row count differs")
      assert(sq.exceptAll(df).isEmpty && df.exceptAll(sq).isEmpty,
        s"${twin.name}: SQL-text result diverges from DataFrame twin")
    }
  }
}
