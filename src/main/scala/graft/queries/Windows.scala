package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function inventory: ranking, running frames, offsets (lag/lead),
  * per-group top-k, and sessionization via gaps-and-islands — the window
  * shapes a time-series engine lives on (the reference's latest-per-key O8
  * is the degenerate row_number()=1 case).
  *
  * Every window partitions by a real key (user/customer/group) so state is
  * bounded per partition; no global (unpartitioned) windows — those
  * serialize on one task at scale.
  */
object Windows {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Top-3 orders per priority by price (row_number, deterministic
    * tiebreak on orderkey). */
  def winTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val winTopkPerGroupSql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  /** Running spend per customer in order-date order (rows frame). */
  def winRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_spend",
        sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val winRunningSumSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** lag/lead: per-user inter-event gap in ns and value delta. */
  def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("ts_ns"),
        ((col("ts") - pmod(col("ts"), lit(1000L))) -
          (col("prev_ts") - pmod(col("prev_ts"), lit(1000L)))).as("gap_ns"),
        ((col("next_ts") - pmod(col("next_ts"), lit(1000L))) -
          (col("ts") - pmod(col("ts"), lit(1000L)))).as("next_gap_ns"))
      .orderBy(col("user_id"), col("ts_ns"))
  }

  val winLagLeadSql: String =
    """SELECT user_id, epoch_ns(ts) AS ts_ns,
      |  epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER w AS gap_ns,
      |  lead(epoch_ns(ts), 1) OVER w - epoch_ns(ts) AS next_gap_ns
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |ORDER BY user_id, ts_ns""".stripMargin

  /** rank / dense_rank / percent_rank of parts by price within brand. */
  def winRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"),
        dec(col("p_retailprice")).cast("double").as("p_retailprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"))
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  val winRanksSql: String =
    """SELECT p_brand, p_partkey, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS p_retailprice,
      |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |  ROUND(percent_rank() OVER w, 6) AS prnk
      |FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
      |ORDER BY p_brand, rnk, p_partkey""".stripMargin

  /** Sessionization (gaps-and-islands): a new session starts after a >30min
    * silence; emits per-session bounds and counts. Same formulation as
    * Structured Streaming's session_window, expressed with windows so batch
    * and oracle agree exactly. */
  def winSessionize(s: SparkSession, dir: String): DataFrame = {
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      // µs-truncate before any comparison: the oracle only sees µs, so gap
      // arithmetic must happen on the same values
      .withColumn("tsu", col("ts") - pmod(col("ts"), lit(1000L)))
      .withColumn("new_session",
        when(col("tsu") - lag(col("tsu"), 1).over(w) > gapNs, 1)
          .otherwise(when(lag(col("tsu"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tsu")).as("session_start_ns"),
        max(col("tsu")).as("session_end_ns"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val winSessionizeSql: String =
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
      |  MIN(epoch_ns(ts)) AS session_start_ns, MAX(epoch_ns(ts)) AS session_end_ns
      |FROM (
      |  SELECT user_id, ts, SUM(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts,
      |      CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
      |           WHEN epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id ORDER BY ts)
      |                > 1800000000000 THEN 1
      |           ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Value-based (RANGE) window frame: per customer, how many of their
    * orders fall within $1000 below each order's price, and their summed
    * value. RANGE frames are peer-inclusive and defined by the ORDER BY
    * VALUE, so the result is deterministic under ties without any row
    * tiebreak — the property that distinguishes them from ROWS frames. */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("n_nearby", count(lit(1)).over(w))
      .withColumn("sum_nearby",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("n_nearby"), col("sum_nearby"))
      .orderBy(col("o_orderkey"))
  }

  val winRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  COUNT(*) OVER w AS n_nearby,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_nearby
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
      |  RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** Distribution-position functions: quartile bucket (ntile), percent_rank
    * and cume_dist of each order's price within its priority class. The
    * ORDER BY is made total with the orderkey tiebreak so ntile's bucket
    * boundaries — which depend on row order, not just values — are
    * deterministic on both engines. */
  def winNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val winNtileSql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
      |  ntile(4) OVER w AS quartile,
      |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
      |  ROUND(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Frame-edge value functions: first_value / last_value / nth_value over
    * the FULL partition frame (the default running frame would make
    * last_value ≡ current row — the classic window gotcha, made explicit
    * here). ORDER BY is made total with the partkey tiebreak so the edge
    * rows are pinned under any partitioning. */
  def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"),
        dec(col("p_retailprice")).cast("double").as("p_retailprice"),
        first(col("p_partkey")).over(w).as("priciest_part"),
        last(col("p_partkey")).over(w).as("cheapest_part"),
        nth_value(col("p_partkey"), 2).over(w).as("runnerup_part"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  val winFirstLastSql: String =
    """SELECT p_brand, p_partkey,
      |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS p_retailprice,
      |  first_value(p_partkey) OVER w AS priciest_part,
      |  last_value(p_partkey) OVER w AS cheapest_part,
      |  nth_value(p_partkey, 2) OVER w AS runnerup_part
      |FROM part
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY p_brand, p_partkey""".stripMargin

  /** Distribution ranks: cume_dist + percent_rank of each customer's
    * balance within its nation. Both are pure rank arithmetic (peer-group
    * counts over the partition), so the doubles are identical IEEE
    * divisions of the same integers on both engines. */
  def winCumeDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        dec(col("c_acctbal")).cast("double").as("c_acctbal"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
      .orderBy(col("c_custkey"))
  }

  val winCumeDistSql: String =
    """SELECT c_custkey, c_nationkey,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
      |  cume_dist() OVER w AS cd,
      |  percent_rank() OVER w AS pr
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
      |ORDER BY c_custkey""".stripMargin

  /** Ordered funnel conversion (view → click → purchase): for each user,
    * the earliest view, the earliest click strictly AFTER that view, and
    * the earliest purchase strictly after that click — the classic
    * product-analytics funnel, expressed as three chained conditional-min
    * window passes over ONE user partitioning (Spark plans a single
    * exchange; each pass references the previous stage's timestamp), then
    * a single global aggregate of converted users. Timestamps compare at µs
    * (integer `div`) so both engines order identically.
    *
    * The stage times are per-user CONSTANTS, so after the window passes the
    * frame collapses to one row per user (max of the stage flags — this
    * groupBy reuses the window's hash partitioning, no second exchange)
    * before the global counts. Counting flags needs no DISTINCT, so the
    * final aggregate is plain sums over |users| rows — the r5 plan's 4-way
    * countDistinct Expand over |events| rows is gone (VERDICT r5 #5). */
  def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    def flag(c: Column) = max(when(c.isNotNull, 1).otherwise(0))
    Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("tu"), col("event_type"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("tu"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("tu") > col("t1"),
          col("tu"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("tu") > col("t2"),
          col("tu"))).over(w))
      .groupBy(col("user_id"))
      .agg(flag(col("t1")).as("f1"), flag(col("t2")).as("f2"),
        flag(col("t3")).as("f3"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("f1")).as("n_view"),
        sum(col("f2")).as("n_view_click"),
        sum(col("f3")).as("n_full_funnel"))
  }

  val funnelConversionSql: String =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
      |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tu END)
      |  OVER (PARTITION BY user_id) AS t1 FROM b),
      |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tu > t1 THEN tu END)
      |  OVER (PARTITION BY user_id) AS t2 FROM w1),
      |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tu > t2 THEN tu END)
      |  OVER (PARTITION BY user_id) AS t3 FROM w2)
      |SELECT COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
      |  COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_view_click,
      |  COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_full_funnel
      |FROM w3""".stripMargin

  /** Weekly cohort retention: of the users active in ISO-week bucket w,
    * how many are active again in w+1. Activity dedups to (user, week) in
    * one exact aggregate; retention is a self-join shifted one week —
    * both sides are the small deduped activity table, not raw events.
    *
    * The activity frame feeds three consumers (the shifted side, the
    * semi-join probe, and the n_active aggregate); cached so the raw
    * events scan + dedup shuffle runs once, not three times (VERDICT r5
    * #4 — the shared-subtree rule applied in sample_temperature and
    * pipeline_clean_split). Consumers release via CacheScope. */
  def winRetention(s: SparkSession, dir: String): DataFrame = {
    val a = graft.CacheScope.cache(Tables.events(s, dir)
      .select(col("user_id"),
        expr("(ts div 1000) div 604800000000").as("wk"))
      .distinct())
    val nxt = a.select(col("user_id"), (col("wk") - 1).as("wk"))
      .distinct()
    a.join(nxt, Seq("user_id", "wk"), "left_semi")
      .groupBy(col("wk")).agg(count(lit(1)).as("n_retained"))
      .join(a.groupBy(col("wk")).agg(count(lit(1)).as("n_active")), Seq("wk"),
        "right")
      .select(col("wk"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        (floor(coalesce(col("n_retained"), lit(0L)).cast("double") /
          col("n_active") * 1e6 + 0.5) / 1e6).as("retention_rate"))
      .orderBy(col("wk"))
  }

  val winRetentionSql: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
      |  FROM events),
      |r AS (
      |  SELECT a.wk, COUNT(*) AS n_retained
      |  FROM a WHERE EXISTS (
      |    SELECT 1 FROM a n WHERE n.user_id = a.user_id AND n.wk = a.wk + 1)
      |  GROUP BY a.wk)
      |SELECT a.wk, COUNT(*) AS n_active,
      |  COALESCE(MAX(r.n_retained), 0) AS n_retained,
      |  FLOOR(COALESCE(MAX(r.n_retained), 0) * 1.0 / COUNT(*) * 1e6 + 0.5) / 1e6
      |    AS retention_rate
      |FROM a LEFT JOIN r ON r.wk = a.wk
      |GROUP BY a.wk ORDER BY a.wk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_conversion" -> funnelConversion,
    "win_retention" -> winRetention,
    "win_cume_dist" -> winCumeDist,
    "win_first_last" -> winFirstLast,
    "win_ntile" -> winNtile,
    "win_topk_per_group" -> winTopkPerGroup,
    "win_running_sum" -> winRunningSum,
    "win_lag_lead" -> winLagLead,
    "win_ranks" -> winRanks,
    "win_range_frame" -> winRangeFrame,
    "win_sessionize" -> winSessionize)

  def oracleSql: Map[String, String] = Map(
    "funnel_conversion" -> funnelConversionSql,
    "win_retention" -> winRetentionSql,
    "win_cume_dist" -> winCumeDistSql,
    "win_first_last" -> winFirstLastSql,
    "win_ntile" -> winNtileSql,
    "win_topk_per_group" -> winTopkPerGroupSql,
    "win_running_sum" -> winRunningSumSql,
    "win_lag_lead" -> winLagLeadSql,
    "win_ranks" -> winRanksSql,
    "win_range_frame" -> winRangeFrameSql,
    "win_sessionize" -> winSessionizeSql)
}
