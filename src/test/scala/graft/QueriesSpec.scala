package graft

/** Smoke-level checks for every declared query: runs at sf0.001, non-empty
  * result, oracle SQL declared. Operator-specific semantics get their own
  * specs. */
class QueriesSpec extends SparkSpec {

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf("0.001")).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every query has an oracle") {
    // since r2 every declared query has a SQL twin: the LSH queries embed
    // their deterministic plane literals in the oracle SQL, and winnow
    // uses an md5-prefix gram hash both engines compute.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates match hand computation at sf0.001") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf("0.001"))
    val rows = df.collect()
    // group keys unique & sorted
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    assert(keys.sorted.sameElements(keys))
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = Tables.lineitem(spark, sf("0.001"))
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(totalCount === liCount)
  }
}
