package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SkewOps

/** Join-family inventory: inner/left/right/full/semi/anti/cross plus the
  * as-of join (the reference's index floor-lookup O15 generalized).
  *
  * Scale notes: dimension sides (region/nation/customer/supplier/part at
  * TPC-H proportions) are broadcast — no shuffle of the fact table; the
  * fact-fact join (lineitem ⋈ orders) shuffles on the join key once, which
  * AQE re-plans at runtime. The as-of join is the union+running-max form —
  * one shuffle on the key, no range-join row explosion.
  */
object Joins {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Inner fact-dim-dim join: revenue per nation (lineitem⋈orders⋈customer
    * ⋈nation). customer/nation broadcast; lineitem⋈orders shuffles once. */
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val joinInnerSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left outer: every customer with order count + spend (zeros kept). */
  def joinLeft(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(col("o_totalprice"))), lit(0).cast("decimal(18,2)"))
          .cast("double").as("spend"))
      .orderBy(col("c_custkey"))
  }

  val joinLeftSql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Right outer join (orders RIGHT JOIN customer ≡ customer LEFT): kept as
    * its own declared operator. */
  def joinRight(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy(col("c_nationkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  val joinRightSql: String =
    """SELECT c_nationkey, COUNT(o_orderkey) AS n_orders,
      |  COUNT(DISTINCT c_custkey) AS n_customers
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Full outer: per-nation customer count vs supplier count (nations may
    * have only one side). */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_customers"))
    val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(su, col("nk_c") === col("nk_s"), "full")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  val joinFullSql: String =
    """SELECT COALESCE(c.nk, s.nk) AS nationkey,
      |  COALESCE(n_customers, 0) AS n_customers,
      |  COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
      |  ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  /** Left semi (EXISTS): customers that placed at least one urgent order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Left anti (NOT EXISTS): customers that never placed an urgent order. */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Cross join of the two smallest dims (region × nation). */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  val joinCrossSql: String =
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"

  /** As-of join (O15 generalized): for each purchase event, the most recent
    * signup event of the same user at or before it. Union + running-max over
    * a RANGE frame — one shuffle on user_id, no range-join explosion; ties
    * at equal time are included, matching ASOF's >= bound. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("ts"), col("event_type"),
      col("value").cast("decimal(18,2)").as("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = e.withColumn("signup_ts",
      max(when(col("event_type") === "signup", col("ts"))).over(w))
    tagged.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("purchase_ts_ns"),
        col("value").cast("double").as("value"),
        (col("signup_ts") - pmod(col("signup_ts"), lit(1000L))).as("signup_ts_ns"))
      .orderBy(col("user_id"), col("purchase_ts_ns"))
  }

  val joinAsofSql: String =
    """SELECT p.user_id AS user_id, epoch_ns(p.ts) AS purchase_ts_ns,
      |  CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS value, epoch_ns(si.ts) AS signup_ts_ns
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') si
      |  ON p.user_id = si.user_id AND p.ts >= si.ts
      |ORDER BY user_id, purchase_ts_ns""".stripMargin

  /** As-of join with a TOLERANCE bound (pandas merge_asof `tolerance`, kdb
    * wj's window): the backward match is discarded when it is STALER than
    * 48 h — the staleness guard every sensor/price alignment needs (an
    * hours-old quote should not fill a current tick). Same single-window
    * running-max plan as [[joinAsof]] — the bound is one row-local CASE on
    * the matched timestamp afterwards, so the tolerance adds ZERO cost at
    * any scale (the alternative, a range join on [ts−tol, ts], explodes).
    * The compare runs on the µs-truncated values both engines emit. */
  def joinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolNs = 48L * 3600L * 1000000000L
    val e = Tables.events(s, dir).select(
      col("user_id"), col("ts"), col("event_type"),
      col("value").cast("decimal(18,2)").as("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = e.withColumn("signup_ts",
      max(when(col("event_type") === "signup", col("ts"))).over(w))
    def usec(c: Column): Column = c - pmod(c, lit(1000L))
    tagged.filter(col("event_type") === "purchase")
      .withColumn("pt", usec(col("ts")))
      .withColumn("st", usec(col("signup_ts")))
      .select(col("user_id"), col("pt").as("purchase_ts_ns"),
        col("value").cast("double").as("value"),
        when(col("pt") - col("st") <= tolNs, col("st"))
          .as("recent_signup_ts_ns"))
      .orderBy(col("user_id"), col("purchase_ts_ns"))
  }

  val joinAsofToleranceSql: String =
    """SELECT user_id, purchase_ts_ns, value,
      |  CASE WHEN purchase_ts_ns - signup_ts_ns <= 172800000000000
      |       THEN signup_ts_ns END AS recent_signup_ts_ns
      |FROM (
      |  SELECT p.user_id AS user_id, epoch_ns(p.ts) AS purchase_ts_ns,
      |    CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |    epoch_ns(si.ts) AS signup_ts_ns
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') si
      |    ON p.user_id = si.user_id AND p.ts >= si.ts)
      |ORDER BY user_id, purchase_ts_ns""".stripMargin

  /** FORWARD as-of: each purchase matched to the EARLIEST signup at or
    * after it per user — the "next event" lookup (churn/conversion
    * attribution looks forward; the reference's indexLookup floor is the
    * backward twin). Same single-table running-extremum shape as
    * [[joinAsof]], mirrored: a conditional running MIN over a GROWING
    * frame on DESCENDING ts — `min over (current, unbounded following)`
    * is semantically identical, but Spark evaluates shrinking frames by
    * rescanning current→end per row, O(partition²) (measured 26× on
    * `ts_interpolate`'s carries; see TimeSeries.scala). The desc growing
    * frame updates one buffer per row — O(partition). RANGE (not ROWS) so
    * a signup tied at the purchase's exact ts stays in frame, matching
    * ASOF's inclusive bound. No join, one shuffle on user_id shared with
    * the sort. */
  def joinAsofForward(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("ts"), col("event_type"),
      col("value").cast("decimal(18,2)").as("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = e.withColumn("next_signup_ts",
      min(when(col("event_type") === "signup", col("ts"))).over(w))
    tagged.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("purchase_ts_ns"),
        col("value").cast("double").as("value"),
        (col("next_signup_ts") - pmod(col("next_signup_ts"), lit(1000L)))
          .as("next_signup_ts_ns"))
      .orderBy(col("user_id"), col("purchase_ts_ns"))
  }

  val joinAsofForwardSql: String =
    """SELECT p.user_id AS user_id, epoch_ns(p.ts) AS purchase_ts_ns,
      |  CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  epoch_ns(si.ts) AS next_signup_ts_ns
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') si
      |  ON p.user_id = si.user_id AND p.ts <= si.ts
      |ORDER BY user_id, purchase_ts_ns""".stripMargin

  /** NEAREST as-of: each purchase matched to the signup closest in time,
    * either direction, backward winning ties — the sensor-alignment
    * variant of as-of (floor and forward are the two halves; nearest
    * composes them). Both extrema are GROWING frames — the forward one
    * over DESCENDING ts (shrinking frames rescan current→end per row,
    * O(partition²); see [[joinAsofForward]]) — so this is two Window
    * operators (asc + desc sort) over ONE exchange on user_id, each
    * O(partition). The delta compare runs on the µs-truncated values both
    * engines emit, so the pick can't flip on sub-µs ns the oracle's
    * reader never sees. */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("ts"), col("event_type"),
      col("value").cast("decimal(18,2)").as("value"))
    def usec(c: Column): Column = c - pmod(c, lit(1000L))
    val wb = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id")).orderBy(col("ts").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = e
      .withColumn("prev_ns",
        usec(max(when(col("event_type") === "signup", col("ts"))).over(wb)))
      .withColumn("next_ns",
        usec(min(when(col("event_type") === "signup", col("ts"))).over(wf)))
    tagged.filter(col("event_type") === "purchase")
      .withColumn("pt", usec(col("ts")))
      .select(col("user_id"), col("pt").as("purchase_ts_ns"),
        col("value").cast("double").as("value"),
        when(col("prev_ns").isNull, col("next_ns"))
          .when(col("next_ns").isNull, col("prev_ns"))
          .when(col("pt") - col("prev_ns") <= col("next_ns") - col("pt"),
            col("prev_ns"))
          .otherwise(col("next_ns")).as("nearest_signup_ts_ns"))
      .orderBy(col("user_id"), col("purchase_ts_ns"))
  }

  val joinAsofNearestSql: String =
    """SELECT user_id, purchase_ts_ns, value,
      |  CASE WHEN prev_ns IS NULL THEN next_ns
      |       WHEN next_ns IS NULL THEN prev_ns
      |       WHEN purchase_ts_ns - prev_ns <= next_ns - purchase_ts_ns THEN prev_ns
      |       ELSE next_ns END AS nearest_signup_ts_ns
      |FROM (
      |  SELECT p.user_id AS user_id, epoch_ns(p.ts) AS purchase_ts_ns,
      |    CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |    epoch_ns(sb.ts) AS prev_ns, epoch_ns(sf.ts) AS next_ns
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') sb
      |    ON p.user_id = sb.user_id AND p.ts >= sb.ts
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') sf
      |    ON p.user_id = sf.user_id AND p.ts <= sf.ts)
      |ORDER BY user_id, purchase_ts_ns""".stripMargin

  /** Skew-resilient join (manual salting — [[SkewOps.saltedJoin]]): the
    * event stream joined to a small per-nation-ish cohort dimension on
    * user_id. The big side salts on event_id (high-cardinality
    * disambiguator), the small side explodes 8-fold, so one hot user fans
    * over 8 reducers instead of serializing on one — the static-planning
    * fallback when AQE's runtime skew split isn't in play. Semantics are
    * identical to the plain join, which is exactly what the oracle checks. */
  def joinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val cohorts = e.select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(7L)))
    SkewOps.saltedJoin(e, cohorts, "user_id", "event_id", salts = 8)
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("cohort"))
  }

  val joinSkewSaltedSql: String =
    """SELECT user_id % 7 AS cohort, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin

  /** Correlated LATERAL join: each nation's top-2 customers by account
    * balance — the per-outer-row dependent-subquery shape (top-N per key
    * written as the user writes it). Catalyst decorrelates the ordered
    * limit into a partitioned window, so the physical plan is the same
    * single-shuffle rank-filter as [[Windows.winTopkPerGroup]] — no
    * per-row re-execution, which is what makes lateral viable at scale. */
  def joinLateral(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .lateralJoin(Tables.customer(s, dir)
        .where(col("c_nationkey") === col("n_nationkey").outer())
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(2))
      .select(col("n_name"), col("c_custkey"),
        dec(col("c_acctbal")).cast("double").as("c_acctbal"))
      .orderBy(col("n_name"), col("c_custkey"))

  val joinLateralSql: String =
    """SELECT n_name, c_custkey,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n_name, c_custkey""".stripMargin

  /** Blocked fuzzy string join (edit-distance similarity join): part names
    * within levenshtein ≤ 3 of each other. The scalable shape, in order:
    * (1) DEDUPE to the string domain first — a grouped aggregate collapses
    * row-count to name-count, which is what makes the self-join feasible
    * (string domains are orders of magnitude smaller than fact tables);
    * (2) BLOCK on cheap signatures — the length band (±3) is LOSSLESS
    * for the threshold (edit distance ≥ length difference), while the
    * shared-last-token block is the standard recall-trading blocking key
    * (a pair whose last tokens differ, e.g. 'blue'/'blues', is not
    * compared — the deliberate blocking trade-off, tune the key to the
    * domain); (3) VERIFY with the O(len²) DP only inside blocks.
    * Levenshtein is exact integer DP in both engines, so the whole join is
    * hash-gated. Never the naive n² name cross join, and never the DP on
    * un-blocked pairs. */
  def joinFuzzy(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir).groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      .withColumn("ln", length(col("p_name")))
    val a = names.select(col("p_name").as("name_a"),
      col("n_parts").as("parts_a"), col("blk"), col("ln").as("ln_a"))
    val b = names.select(col("p_name").as("name_b"),
      col("n_parts").as("parts_b"), col("blk").as("blk_b"), col("ln").as("ln_b"))
    a.join(b, col("blk") === col("blk_b") &&
        abs(col("ln_a") - col("ln_b")) <= 3 && col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 3)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("parts_a"), col("parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val joinFuzzySql: String =
    """WITH names AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
      |    string_split(p_name, ' ')[-1] AS blk, length(p_name) AS ln
      |  FROM part GROUP BY p_name)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |  a.n_parts AS parts_a, b.n_parts AS parts_b
      |FROM names a JOIN names b
      |  ON a.blk = b.blk AND abs(a.ln - b.ln) <= 3 AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a, name_b""".stripMargin

  /** MERGE INTO semantics (the lakehouse upsert), expressed relationally:
    * a change set (per-customer spend, plus synthetic new keys) merges
    * into the customer table — WHEN MATCHED update the balance, WHEN NOT
    * MATCHED insert, untouched rows kept — as ONE full outer join +
    * row-local CASE. This is exactly the join Delta/Iceberg MERGE plans
    * under the hood; at scale it shuffles both sides once on the key (or
    * broadcasts a small change set), and the `action` column makes the
    * three-way row accounting hash-gated, not just the end state. Exact
    * decimal balance arithmetic; deletes would be one more CASE branch
    * emitting a filter flag. */
  def joinMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(s, dir).groupBy(col("o_custkey").as("key"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("spend"))
    // synthetic NEW keys are negated, not offset: c_custkey is strictly
    // positive at every TPC-H scale, so -key can never collide with a
    // real customer (a +1000000 offset silently collides once the table
    // passes a million keys and misclassifies the row as 'updated' —
    // review finding)
    val updates = src.filter(col("key") % 50 =!= 0)
      .unionAll(src.filter(col("key") % 50 === 0)
        .select((-col("key")).as("key"), col("spend")))
    val c = Tables.customer(s, dir)
    val matched = c("c_custkey").isNotNull && updates("key").isNotNull
    c.join(updates, c("c_custkey") === updates("key"), "full_outer")
      .select(
        coalesce(c("c_custkey"), updates("key")).as("key"),
        coalesce(c("c_name"),
          concat(lit("new-"), updates("key").cast("string"))).as("name"),
        when(matched,
            c("c_acctbal").cast("decimal(18,2)") - updates("spend"))
          .when(c("c_custkey").isNotNull, c("c_acctbal").cast("decimal(18,2)"))
          .otherwise(updates("spend")).cast("double").as("balance"),
        when(matched, "updated")
          .when(c("c_custkey").isNotNull, "kept")
          .otherwise("inserted").as("action"))
      .orderBy(col("key"))
  }

  val joinMergeUpsertSql: String =
    """WITH src AS (
      |  SELECT o_custkey AS key,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
      |  FROM orders GROUP BY o_custkey),
      |updates AS (
      |  SELECT * FROM src WHERE key % 50 != 0
      |  UNION ALL SELECT -key AS key, spend FROM src WHERE key % 50 = 0)
      |SELECT COALESCE(c.c_custkey, u.key) AS key,
      |  COALESCE(c.c_name, 'new-' || CAST(u.key AS VARCHAR)) AS name,
      |  CAST(CASE
      |    WHEN c.c_custkey IS NOT NULL AND u.key IS NOT NULL
      |      THEN CAST(c.c_acctbal AS DECIMAL(18,2)) - u.spend
      |    WHEN c.c_custkey IS NOT NULL THEN CAST(c.c_acctbal AS DECIMAL(18,2))
      |    ELSE u.spend END AS DOUBLE) AS balance,
      |  CASE WHEN c.c_custkey IS NOT NULL AND u.key IS NOT NULL THEN 'updated'
      |       WHEN c.c_custkey IS NOT NULL THEN 'kept' ELSE 'inserted' END AS action
      |FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.key
      |ORDER BY key""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_merge_upsert" -> joinMergeUpsert,
    "join_fuzzy" -> joinFuzzy,
    "join_lateral" -> joinLateral,
    "join_skew_salted" -> joinSkewSalted,
    "join_inner" -> joinInner,
    "join_left" -> joinLeft,
    "join_right" -> joinRight,
    "join_full" -> joinFull,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_cross" -> joinCross,
    "join_asof" -> joinAsof,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_nearest" -> joinAsofNearest,
    "join_asof_tolerance" -> joinAsofTolerance)

  def oracleSql: Map[String, String] = Map(
    "join_merge_upsert" -> joinMergeUpsertSql,
    "join_fuzzy" -> joinFuzzySql,
    "join_lateral" -> joinLateralSql,
    "join_skew_salted" -> joinSkewSaltedSql,
    "join_inner" -> joinInnerSql,
    "join_left" -> joinLeftSql,
    "join_right" -> joinRightSql,
    "join_full" -> joinFullSql,
    "join_semi" -> joinSemiSql,
    "join_anti" -> joinAntiSql,
    "join_cross" -> joinCrossSql,
    "join_asof" -> joinAsofSql,
    "join_asof_forward" -> joinAsofForwardSql,
    "join_asof_nearest" -> joinAsofNearestSql,
    "join_asof_tolerance" -> joinAsofToleranceSql)
}
