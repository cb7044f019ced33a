package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational query surface over the TPC-H-ish fixture tables.
  *
  * The reference engine has no relational algebra beyond scans (SURVEY §2.3);
  * this module declares the full operator families the Spark engine exposes —
  * aggregations, all join types, windows, sorts/top-k, set ops — each with a
  * DuckDB-oracle SQL twin in [[oracleSql]].
  *
  * Numeric discipline: every aggregated double is first cast to
  * DECIMAL(18,2) (the fixtures carry exactly 2 decimal places), making
  * sums/averages exact integer arithmetic — identical in Spark and DuckDB no
  * matter the partitioning or summation order. Averages are computed as
  * decimal-sum / count cast through double with a fixed rounding, again
  * deterministic on both engines.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary: filter + groupBy + sum/avg/count. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // internal arithmetic stays exact decimal; the FINAL projection is
        // DOUBLE on both engines so the driver's normalizer sees the same
        // representation (str(Decimal) keeps trailing zeros, repr(float)
        // doesn't — the round-1 hash-gate artifact, VERDICT r1 #1)
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-table join (two dimensions
    * broadcast against the lineitem fact), revenue aggregate, top-10. The
    * date split (orders before / shipments after a cutoff) means both
    * filters push to their respective scans BEFORE the joins — the
    * selectivity lands at the parquet reader, not the join. Top-10 is
    * TakeOrderedAndProject with deterministic tiebreaks, no global sort. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      // no broadcast HINT on customer: at fixture scale the planner
      // auto-broadcasts it; at 100 TB customer is a fact-sized table and a
      // forced broadcast would OOM — AQE picks shuffle join then
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("rev"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_orderpriority"), col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style local-supplier volume: 6-table star join — the truly
    * small dimensions (region → nation → supplier) broadcast explicitly,
    * customer is left to AQE, and the lineitem fact streams through one
    * pipeline into a single hash aggregate (nation count = 25 rows out).
    * The customer-nation = supplier-nation predicate rides the join
    * condition. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, dir)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    // semi-join reduction: only customers in ASIA nations can satisfy the
    // c_nationkey = s_nationkey predicate (suppliers are ASIA-restricted),
    // so filter customer against the broadcast nation keys BEFORE the fact
    // join — the big exchange then carries 1/5 of the customer rows
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      // customer unhinted for the same reason as q3 — genuinely small dims
      // (region/nation/supplier) carry explicit hints, scale-growing ones
      // rely on AQE
      .join(cust,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("rev"))
      .select(col("n_name"), col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): aggregate the fact table
    * first (one map-side-combined hash aggregate on l_orderkey), filter to
    * the rare heavy orders, then join the *small filtered result* to orders
    * and customer. The join order matters at 100 TB: the heavy-order set
    * after HAVING is tiny (0.3% of orders here), so Spark broadcasts it to
    * both dimension joins instead of shuffling lineitem twice — AQE picks
    * the broadcast from the runtime size of the filtered aggregate. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
      |  CAST(sum_qty AS DOUBLE) AS sum_qty
      |FROM customer, orders,
      |  (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      |   FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250) heavy
      |WHERE o_orderkey = l_orderkey AND c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q7 shape (volume shipping between two nations, by direction and
    * ship year): the two tiny nation dims filter-then-broadcast so the
    * supplier/customer joins stay shuffle-free; lineitem⋈orders is the one
    * fact shuffle. The symmetric nation-pair predicate lands AFTER both
    * broadcasts as a cheap row filter. */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_19")
    val sn = Tables.nation(s, dir)
      .filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = Tables.nation(s, dir)
      .filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE sn.n_name IN ('NATION_3','NATION_19')
      |  AND cn.n_name IN ('NATION_3','NATION_19')
      |  AND sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q10 shape (returned-item report): customers ranked by revenue
    * lost to returns. The returnflag filter is pushed to the lineitem
    * scan; one fact shuffle for lineitem⋈orders; customer join left to
    * AQE (broadcastable after aggregation at every fixture scale); top-20
    * as TakeOrdered, no global sort. */
  def q10Returns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_returned"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_returned
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Fixed 6dp floor-rounding for ratio-derived doubles — token-identical
    * in the SQL twins, so both engines round the same IEEE double the same
    * way (Spark's round() is HALF_UP via BigDecimal; DuckDB's is
    * half-away-from-zero — close but not the same function). */
  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** TPC-H Q6 shape (forecast revenue change): the no-join scan-aggregate.
    * All four predicates are plain column comparisons, so every one reaches
    * the parquet reader as a pushed filter + min/max row-group skip — at
    * 100 TB this query is pure IO on the shipdate-sorted fraction. The
    * discount bounds are midpoints (0.045/0.075) between the fixture's
    * 0.01-grid values rather than exact endpoints: doubles on the grid
    * compare identically in both engines, and the uncast column keeps the
    * scan-level pushdown a DECIMAL cast would forfeit. */
  def q6RevenueDelta(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.045 AND l_discount <= 0.075
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q14 shape (promotion effect): conditional aggregate ratio over a
    * broadcast part join. The month filter pushes to the lineitem scan; the
    * part side ships only (p_partkey, p_type). Both sums stay exact
    * decimal; only the final percentage divides as double (identical IEEE
    * on both engines) under the fixed r6 rounding. */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-03-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0))).as("pr"),
        sum(vol).as("tr"))
      .select(
        col("pr").cast("double").as("promo_revenue"),
        col("tr").cast("double").as("total_revenue"),
        r6(lit(100) * col("pr").cast("double") / col("tr").cast("double"))
          .as("promo_pct"))
  }

  val q14Sql: String =
    """WITH s AS (
      |  SELECT
      |    SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE 0 END) AS pr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-03-01 00:00:00')
      |SELECT CAST(pr AS DOUBLE) AS promo_revenue, CAST(tr AS DOUBLE) AS total_revenue,
      |  FLOOR((100 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS promo_pct
      |FROM s""".stripMargin

  /** TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three disjunctive
    * brand/size/quantity brackets spanning both join sides. No single
    * disjunct can push to either scan, so the plan hoists the UNION BOUND
    * of the per-branch quantity ranges (1..30) as an explicit conjunct that
    * DOES reach the lineitem reader — the standard trick for disjunctive
    * predicates at scale. Part stays broadcast; the residual OR evaluates
    * post-join in one codegen stage. */
  def q19BracketRevenue(s: SparkSession, dir: String): DataFrame = {
    def bracket(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, dir)
      .filter(col("l_quantity").between(1, 30)) // union bound: pushable
      .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(bracket("Brand#1", 1, 15, 1, 11) ||
        bracket("Brand#2", 1, 25, 10, 20) ||
        bracket("Brand#3", 1, 35, 20, 30))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity BETWEEN 1 AND 30
      |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  /** TPC-H Q15 shape (top supplier): the period-revenue aggregate is
    * computed ONCE (CacheScope-persisted — two plan branches reference it:
    * the scalar max and the equality filter), the 1-row max broadcasts,
    * and the winner filter is an exact DECIMAL equality — no float
    * boundary flip can change the winner set. At 100 TB the cached frame
    * is one row per supplier, orders of magnitude smaller than the scanned
    * fact. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.CacheScope.cache(
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("tr")))
    val mx = rev.agg(max(col("tr")).as("mx"))
    Tables.supplier(s, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx), col("tr") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        col("tr").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_rev
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE tr = (SELECT MAX(tr) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q22 shape (dormant high-balance customers): scalar-subquery
    * threshold + anti join + aggregate. The above-average test is the
    * exact-decimal CROSS-MULTIPLIED form (bal × n > sum, no division — the
    * subq_* determinism discipline), the 1-row positive-balance aggregate
    * broadcasts, and "no recent orders" is a left_anti against the
    * date-filtered orders scan (the filter pushes; the anti join's build
    * side is only the recent slice). */
  def q22DormantBalance(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2000-01-01").cast("timestamp")
    val pos = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("sum_pos"), count(lit(1)).as("n_pos"))
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= cutoff).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(pos))
      .filter(dec(col("c_acctbal")) * col("n_pos") > col("sum_pos"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val q22Sql: String =
    """WITH pos AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos, COUNT(*) AS n_pos
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, pos
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q8 shape (national market share): the widest star in the
    * inventory — lineitem against part/orders/customer/nation/region/
    * supplier/nation — with a conditional-aggregate share per order year.
    * Genuinely small sides (filtered part keys, both nation maps, the
    * region-filtered customer-nation set) broadcast; lineitem⋈orders is
    * the one fact shuffle. The share divides exact-decimal sums as double
    * under r6. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    val amer = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
    val custNat = Tables.nation(s, dir)
      .join(broadcast(amer), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNat = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val econParts = Tables.part(s, dir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    // semi-join reduction: restrict customer to AMERICA nations BEFORE it
    // meets the fact stream — the broadcast against ~5 nation keys shrinks
    // the customer side of the one big shuffle ~5× (joining the full
    // customer table first and filtering after moves the whole table
    // through the exchange for rows the region filter then drops)
    val amerCust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(custNat), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(amerCust, col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNat), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", vol).otherwise(lit(0))).as("nv"),
        sum(vol).as("tv"))
      .select(col("o_year"),
        col("tv").cast("double").as("total_volume"),
        r6(col("nv").cast("double") / col("tv").cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    """WITH vols AS (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
      |    sn.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey)
      |SELECT o_year,
      |  CAST(SUM(vol) AS DOUBLE) AS total_volume,
      |  FLOOR((CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE 0 END) AS DOUBLE)
      |         / CAST(SUM(vol) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mkt_share
      |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * per-part average-quantity subquery, decorrelated to ONE aggregate over
    * the same brand-filtered scan and joined back. The below-0.2×avg test
    * is exact integer arithmetic (fixture quantities are integral):
    * 5·n·q < Σq ⟺ q < 0.2·avg — no decimal division, no float boundary.
    * Both passes scan only the broadcast-filtered brand slice (the
    * decorrelated aggregate is NOT computed over all parts — the filter
    * lands before both scans, which is the whole point at 100 TB). */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    def li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        col("l_extendedprice"))
    val pq = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("sum_qty"), count(lit(1)).as("n_li"))
    li.join(pq, col("l_partkey") === col("pk"))
      .filter(col("q") * 5 * col("n_li") < col("sum_qty"))
      .agg(r6(sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  val q17Sql: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'),
      |pq AS (SELECT l_partkey AS pk, SUM(q) AS sum_qty, COUNT(*) AS n_li
      |       FROM li GROUP BY 1)
      |SELECT
      |  FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0) * 1e6 + 0.5) / 1e6 AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM li JOIN pq ON l_partkey = pk
      |WHERE q * 5 * n_li < sum_qty""".stripMargin

  /** All queries this module contributes to SparkEntry. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_local_supplier" -> q5LocalSupplier,
    "q18_large_orders" -> q18LargeOrders,
    "q7_volume" -> q7Volume,
    "q10_returns" -> q10Returns,
    "q6_revenue_delta" -> q6RevenueDelta,
    "q14_promo_share" -> q14PromoShare,
    "q19_bracket_revenue" -> q19BracketRevenue,
    "q15_top_supplier" -> q15TopSupplier,
    "q22_dormant_balance" -> q22DormantBalance,
    "q8_market_share" -> q8MarketShare,
    "q17_small_quantity" -> q17SmallQuantity
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "q18_large_orders" -> q18Sql,
    "q7_volume" -> q7Sql,
    "q10_returns" -> q10Sql,
    "q6_revenue_delta" -> q6Sql,
    "q14_promo_share" -> q14Sql,
    "q19_bracket_revenue" -> q19Sql,
    "q15_top_supplier" -> q15Sql,
    "q22_dormant_balance" -> q22Sql,
    "q8_market_share" -> q8Sql,
    "q17_small_quantity" -> q17Sql
  )
}
