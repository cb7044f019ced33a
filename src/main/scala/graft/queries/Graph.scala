package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relationally-derived graphs. The engine's existing
  * iterative-graph machinery (HashToMin connected components in
  * [[graft.operators.Dedup]]) covers the clustering side; this module adds
  * the centrality side with PageRank (Page et al. 1999) as BOUNDED
  * unrolled iterations under the DuckDB hash gate.
  *
  * Determinism discipline (the [[NorthStar]] emb_pca_power pattern): a
  * float PageRank sum over a shuffled groupBy is order-dependent, so each
  * iteration quantizes the per-edge contribution `r/deg` to
  * DECIMAL(18,9) BEFORE the aggregate (exact, order-independent sum) and
  * re-quantizes the damped update to 9 decimals — the twin unrolls the
  * identical three iterations as CTEs and every intermediate matches
  * bit-for-bit.
  *
  * 100 TB shape: ranks are node-narrow (node, deg, r); each iteration is
  * one broadcast-or-shuffle join edges⋈ranks plus one exact-decimal
  * aggregate on dst — the classic Pregel-as-SQL step. Edge storage is hit
  * once per iteration with NO per-iteration lineage growth (the rank
  * frame is tiny and re-planned from literals each round via checkpointed
  * aggregates; the edge frame is cached once). Iteration count is fixed
  * (power iteration converges geometrically at the damping rate), so the
  * job count does not scale with graph size.
  */
object Graph {

  /** The Pregel core shared by the declared query and the scale probe
    * (one copy — a probe measuring a drifted duplicate of the shipped
    * algorithm is worthless; review finding): takes the UNDIRECTED pair
    * frame `(a, b)`, walks it in both directions (no dangling nodes by
    * construction), runs `iters` damped rounds at d = 0.85 from a uniform
    * start, returns `(node, pr)` unordered. `lvl` is the storage level
    * for the edge/rank caches — the probe passes DISK_ONLY for big-n
    * single-JVM runs. */
  private[graft] def pagerankCore(und: DataFrame, iters: Int = 3,
      lvl: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val edges = graft.CacheScope.cache(
      und.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(und.select(col("b").as("src"), col("a").as("dst"))), lvl)
    val deg = graft.CacheScope.cache(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), lvl)
    val n = deg.count()
    // uniform start, quantized exactly like every later iterate
    var ranks = deg.select(col("src").as("node"), col("deg"),
      round(lit(1.0 / n), 9).cast("decimal(18,9)").as("r"))
    for (_ <- 1 to iters) {
      // name-based join keys with globally unique column names: deg sits in
      // BOTH lineages (directly and through ranks), so df("col") references
      // would trip the ambiguous-self-join check
      val contrib = edges
        .join(ranks.withColumnRenamed("deg", "ndeg"),
          col("src") === col("node"))
        .select(col("dst"),
          round(col("r").cast("double") / col("ndeg").cast("double"), 9)
            .cast("decimal(18,9)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // Pregel superstep materialization: persist each iterate and CUT the
      // plan there — without it the final plan is the whole 3-round chain
      // and AQE sizes every rank join from the base-table estimate (a
      // measured 4.5× cliff at 1.28M nodes when the join strategy flips);
      // with it each round's join is planned against the materialized
      // node-narrow frame's REAL size. Eagerly counted: two downstream
      // consumers must not race the fill (verify-recipe rule).
      ranks = graft.CacheScope.cache(deg
        .join(contrib, col("src") === col("dst"), "left")
        .select(col("src").as("node"), col("deg"),
          round(lit(0.15 / n) +
            lit(0.85) * coalesce(col("s"), lit(0)).cast("double"), 9)
            .cast("decimal(18,9)").as("r")), lvl)
      ranks.count()
    }
    ranks.select(col("node"), col("r").cast("double").as("pr"))
  }

  /** PageRank over the user↔event-type interaction graph: distinct
    * (user, event_type) interactions become undirected edges, walked in
    * both directions (so there are no dangling nodes by construction —
    * every node that exists has degree ≥ 1). Three damped iterations at
    * d = 0.85 from a uniform start; output is every node's rank. */
  def pagerank(s: SparkSession, dir: String): DataFrame =
    pagerankCore(Tables.events(s, dir)
        .select(concat(lit("u:"), col("user_id").cast("string")).as("a"),
          concat(lit("t:"), col("event_type")).as("b"))
        .distinct())
      .orderBy(col("node"))

  /** Twin: identical unrolled iterations. DuckDB's sum over DECIMAL(18,9)
    * is exact, and the 1/n, damping, and rounding arithmetic copies the
    * engine's expression trees, so all three iterates are bit-equal. */
  val pagerankSql: String =
    """WITH und AS (
      |  SELECT DISTINCT 'u:'||CAST(user_id AS VARCHAR) AS a,
      |    't:'||event_type AS b FROM events),
      |edges AS (
      |  SELECT a AS src, b AS dst FROM und
      |  UNION ALL SELECT b AS src, a AS dst FROM und),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
      |r0 AS (
      |  SELECT src AS node, deg,
      |    CAST(round(1.0 / n, 9) AS DECIMAL(18,9)) AS r FROM deg, nn),
      |s1 AS (
      |  SELECT e.dst, sum(CAST(round(CAST(r.r AS DOUBLE) / CAST(r.deg AS DOUBLE), 9)
      |    AS DECIMAL(18,9))) AS s
      |  FROM edges e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
      |r1 AS (
      |  SELECT d.src AS node, d.deg,
      |    CAST(round(0.15 / n + 0.85 * CAST(COALESCE(s1.s, 0) AS DOUBLE), 9)
      |      AS DECIMAL(18,9)) AS r
      |  FROM deg d LEFT JOIN s1 ON d.src = s1.dst, nn),
      |s2 AS (
      |  SELECT e.dst, sum(CAST(round(CAST(r.r AS DOUBLE) / CAST(r.deg AS DOUBLE), 9)
      |    AS DECIMAL(18,9))) AS s
      |  FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
      |r2 AS (
      |  SELECT d.src AS node, d.deg,
      |    CAST(round(0.15 / n + 0.85 * CAST(COALESCE(s2.s, 0) AS DOUBLE), 9)
      |      AS DECIMAL(18,9)) AS r
      |  FROM deg d LEFT JOIN s2 ON d.src = s2.dst, nn),
      |s3 AS (
      |  SELECT e.dst, sum(CAST(round(CAST(r.r AS DOUBLE) / CAST(r.deg AS DOUBLE), 9)
      |    AS DECIMAL(18,9))) AS s
      |  FROM edges e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
      |r3 AS (
      |  SELECT d.src AS node, d.deg,
      |    CAST(round(0.15 / n + 0.85 * CAST(COALESCE(s3.s, 0) AS DOUBLE), 9)
      |      AS DECIMAL(18,9)) AS r
      |  FROM deg d LEFT JOIN s3 ON d.src = s3.dst, nn)
      |SELECT node, CAST(r AS DOUBLE) AS pr FROM r3 ORDER BY node""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank)

  def oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql)
}
