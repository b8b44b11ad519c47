package graft

/** Session-global state that is keyed by dataset dir must FOLLOW the
  * dir: temp views (Tables.registerViews) and the bucketed catalog
  * tables (Ingest.bucketedJoinInput) are both memoized for speed, and
  * a stale memo silently answers queries from the wrong dataset. */
class TablesViewsSpec extends SparkSpec {

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  test("registerViews re-registers when the requested dir changes") {
    def viewRows: Long =
      spark.sql("SELECT COUNT(*) AS c FROM orders").head().getLong(0)
    Tables.registerViews(spark, dirA)
    assert(viewRows == Tables.orders(spark, dirA).count())
    Tables.registerViews(spark, dirB)
    assert(viewRows == Tables.orders(spark, dirB).count(),
      "views still read the previous dir after a dir switch")
    // A→B→A: a (session, dir)-set memo marks this a no-op and leaves
    // the views on dirB — the regression ADVICE flagged
    Tables.registerViews(spark, dirA)
    assert(viewRows == Tables.orders(spark, dirA).count(),
      "returning to an already-seen dir must re-register, not no-op")
  }

  test("bucketedJoinInput rebuilds its catalog tables when dir changes") {
    def direct(dir: String): Long =
      Tables.orders(spark, dir).join(Tables.lineitem(spark, dir),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey")).count()
    assert(queries.Ingest.bucketedJoinInput(spark, dirA).count() == direct(dirA))
    assert(queries.Ingest.bucketedJoinInput(spark, dirB).count() == direct(dirB),
      "bucketed tables still hold the previous dir's rows")
    assert(queries.Ingest.bucketedJoinInput(spark, dirA).count() == direct(dirA),
      "returning to an already-built dir must rebuild, not reuse dirB's tables")
  }
}
