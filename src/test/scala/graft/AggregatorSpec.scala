package graft

import org.apache.spark.sql.functions.udaf

import graft.functions.LatestAggregator
import graft.functions.LatestAggregator.TimedValue

/** Typed Aggregator + UDAF registration surface, and the approximate
  * distinct-count sketch (no oracle twin — approximation bound asserted
  * instead). */
class AggregatorSpec extends SparkSpec {

  test("Latest aggregator: typed groupBy keeps newest per key, unsigned time") {
    import spark.implicits._
    val ds = Seq(
      (1L, TimedValue(10L, 100L)), (1L, TimedValue(20L, 200L)),
      (2L, TimedValue(5L, 50L)), (2L, TimedValue(-1L, 99L)),  // -1 = Word64 max
      (3L, TimedValue(7L, 70L))).toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(LatestAggregator.Latest.toColumn)
      .collect().toMap
    assert(got === Map(
      1L -> TimedValue(20L, 200L),
      2L -> TimedValue(-1L, 99L),   // unsigned max wins
      3L -> TimedValue(7L, 70L)))
  }

  test("Latest aggregator registers and runs as a SQL UDAF") {
    import spark.implicits._
    spark.udf.register("latest_tv", udaf(LatestAggregator.Latest))
    Seq(TimedValue(1L, 10L), TimedValue(9L, 90L), TimedValue(5L, 50L))
      .toDF().createOrReplaceTempView("tv")
    val r = spark.sql(
      "SELECT latest_tv(time, payload) AS l FROM tv")
      .selectExpr("l.time", "l.payload").first()
    assert((r.getLong(0), r.getLong(1)) === ((9L, 90L)))
  }

  test("approx_count_distinct stays within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, sf("0.01"))
    val exact = li.select("l_orderkey").distinct().count().toDouble
    val approx = li.selectExpr("approx_count_distinct(l_orderkey) c")
      .first().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
