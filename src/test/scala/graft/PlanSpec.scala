package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.core.Point
import graft.sources.{PointCodec, TimeStore}

/** Plan-shape guards: predicates reach the parquet scan, dimensions
  * broadcast, scans prune columns — the properties that keep these plans
  * viable at 100 TB. Failures here mean a regression in plan quality even
  * if results stay correct. */
class PlanSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan
    val stripped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    stripped.collect { case s: FileSourceScanExec => s }
  }

  test("ts_range_scan pushes address-set and time-range filters to parquet") {
    val df = SparkEntry.queries("ts_range_scan")(spark, sf("0.001"))
    val s = scans(df)
    assert(s.nonEmpty)
    val pushed = s.head.metadata("PushedFilters")
    assert(pushed.contains("In(user_id"), pushed)
    // BOTH range bounds must reach parquet — the r5 regression pushed only
    // IsNotNull(ts)/In(user_id) after the nsTs projection hid the physical
    // column (VERDICT r5 #1); eventsInRange restores the pruned read.
    assert(pushed.contains("GreaterThanOrEqual(ts"), pushed)
    assert(pushed.contains("LessThanOrEqual(ts"), pushed)
    // column pruning: props never read
    assert(!s.head.metadata("ReadSchema").contains("props"))
  }

  test("q1 pushes the shipdate filter and prunes columns") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf("0.001"))
    val pushed = scans(df).head.metadata("PushedFilters")
    assert(pushed.contains("LessThanOrEqual(l_shipdate"), pushed)
    assert(!scans(df).head.metadata("ReadSchema").contains("l_comment"))
  }

  test("join_inner broadcasts every dimension (fact table never shuffles pre-agg)") {
    val df = SparkEntry.queries("join_inner")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("dedup_embedding has no corpus-cross-corpus nested loop (LSH candidates)") {
    val df = SparkEntry.queries("dedup_embedding")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "dedup_embedding degraded to an all-pairs nested loop")
  }

  test("text_seg_dedup broadcasts the boilerplate set (no corpus-wide SMJ on segments)") {
    val df = SparkEntry.queries("text_seg_dedup")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the census output above threshold is the small side — the drop-list
    // join must broadcast it, not sort-merge the exploded segment stream
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "segment match degraded to a nested loop")
  }

  test("text_substr_dedup broadcasts the dup-gram set (no corpus-wide SMJ)") {
    val df = SparkEntry.queries("text_substr_dedup")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the repeated-fingerprint set is the small side of the hit join —
    // it must broadcast against the stride-1 gram stream
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "gram match degraded to a nested loop")
    graft.CacheScope.release(spark)
  }

  test("text_dsir_weight broadcasts the bucket model (fact stream never re-shuffles)") {
    val df = SparkEntry.queries("text_dsir_weight")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BuildRight, Cross"), // the 1-row totals cross join broadcasts
      "model join degraded")
    graft.CacheScope.release(spark)
  }

  test("emb_hard_negatives pairs within cells only (no all-pairs nested loop)") {
    val df = SparkEntry.queries("emb_hard_negatives")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "cell-scoped mining degraded to corpus×corpus")
    graft.CacheScope.release(spark)
  }

  test("text_contamination_bloom probes the bloom inside the scan stage before the exact join") {
    val df = SparkEntry.queries("text_contamination_bloom")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the codegen'd membership probe must appear as a Filter predicate
    // (pruning the gram stream), and the exact verify join must broadcast
    assert(plan.toLowerCase.contains("bloommightcontain"), plan.take(500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    graft.CacheScope.release(spark)
  }

  test("dedup_semantic pairs within cells only (no all-pairs nested loop)") {
    val df = SparkEntry.queries("dedup_semantic")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "cell-scoped pairing degraded to corpus×corpus")
    graft.CacheScope.release(spark)
  }

  test("ann_ivf assigns cells row-locally (only the final top-k windows)") {
    // the corpus→cell assignment must be a projection (array_position over
    // literal-centroid dots), NOT an explode + window — a window there
    // shuffles cells× the corpus at 100 TB
    val df = SparkEntry.queries("ann_ivf")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows === 1, s"expected exactly 1 window (final top-k), saw $windows")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "cell join degraded")
  }

  test("layout_bucketed_join joins co-located buckets with no exchange below the join") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("layout_bucketed_join")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan
    val stripped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val smjs = stripped.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a bucketed SortMergeJoin:\n$stripped")
    // both sides read pre-bucketed, pre-sorted parquet: the join subtree
    // must contain NO shuffle — that elimination is the entire point of
    // the layout at 100 TB
    val shuffles = smjs.head.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"bucketed join still shuffles:\n${smjs.head}")
  }

  test("layout_bucketed_join works from a SECOND session (cache keyed per session)") {
    // the layout cache is keyed by sessionUUID; a new session must re-run
    // the bucketize (its catalog lacks the registered tables) instead of
    // hitting a stale/colliding cache entry and throwing on s.table(...)
    // (VERDICT r6 wrong #1 — the identityHashCode key's failure mode)
    val first = SparkEntry.queries("layout_bucketed_join")(spark, sf("0.001"))
      .collect().map(_.toSeq).toSeq
    val s2 = spark.newSession()
    val second = SparkEntry.queries("layout_bucketed_join")(s2, sf("0.001"))
      .collect().map(_.toSeq).toSeq
    assert(second === first)
  }

  test("large-k ivf switches to the broadcast-codebook join (plan size O(1) in k)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    // 256 cells × 64 dims = 16384 terms — past CellLiteralBudget, so the
    // centroid matrix must ride as broadcast DATA, not expression literals:
    // a literal plan here would carry ~16k constants into analysis/codegen
    // and hit JIT method-size ceilings at production cell counts
    val emb = Tables.embeddings(spark, sf("0.001"))
    val probes = emb.filter(col("vec_id") < 5)
    val cents = Array.tabulate(256, 64)(Similarity.centroidComponent)
    val df = Similarity.ivfTopKWith(emb, probes, "vec_id", "embedding",
      5, 8, cents)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.length < 100000, s"plan ballooned to ${plan.length} chars")
    assert(plan.contains("BroadcastExchange"), plan.take(400))
  }

  test("funnel_conversion collapses to one row per user before the global counts") {
    val df = SparkEntry.queries("funnel_conversion")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // flag sums over the per-user frame, never countDistinct over raw
    // events — an Expand there multiplies |events| ×4 into the final
    // exchange (VERDICT r5 #5)
    assert(!plan.contains("Expand"), "funnel re-grew a countDistinct Expand")
    // per-user collapse reuses the window's user_id partitioning: exactly
    // one exchange up to the (tiny) final global aggregate
    val exchanges = "\\bExchange hashpartitioning\\b".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 hash exchange (window+groupBy co-partitioned), saw $exchanges:\n$plan")
  }

  test("win_retention scans events once (activity subtree cached)") {
    val df = SparkEntry.queries("win_retention")(spark, sf("0.001"))
    try {
      df.count() // materialize so InMemoryRelation replaces repeated scans
      val plan = df.queryExecution.executedPlan.toString
      val eventScans = scans(df).count(_.metadata("Location").contains("events"))
      assert(eventScans <= 1,
        s"activity subtree recomputed: $eventScans events scans\n$plan")
      // the shared subtree must actually be served from the cache — a
      // single merged re-scan would also pass the count above
      assert(plan.contains("InMemoryTableScan"), plan.take(500))
    } finally graft.CacheScope.release(spark)
  }

  test("join_lateral decorrelates to a window group-limit (no per-row subquery)") {
    val df = SparkEntry.queries("join_lateral")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the correlated ORDER BY + LIMIT must become a rank filter with a
    // map-side partial group-limit before the single exchange — not a
    // nested-loop re-execution of the inner query per outer row
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("subq_scalar is a single DAG (broadcast aggregate, no driver collect)") {
    val df = SparkEntry.queries("subq_scalar")(spark, sf("0.001"))
    // the global aggregate must be computed INSIDE the plan (broadcast of
    // a 1-row aggregate); a driver-side .first() collect would leave only
    // a constant literal in the filter and no aggregate subtree
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("sum(") && plan.contains("count("), plan.take(800))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastExchange"), physical.take(800))
  }

  test("text_langid broadcasts the stopword dim (no shuffle of the profile table)") {
    val df = SparkEntry.queries("text_langid")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("q3/q5 push date filters to the scans and broadcast the small dims") {
    val q3 = SparkEntry.queries("q3_shipping_priority")(spark, sf("0.001"))
    val q3scans = scans(q3)
    // both date predicates land at their respective parquet readers —
    // selectivity applies BEFORE the joins
    assert(q3scans.exists(_.metadata("PushedFilters").contains("LessThan(o_orderdate")),
      q3scans.map(_.metadata("PushedFilters")).mkString("; "))
    assert(q3scans.exists(_.metadata("PushedFilters").contains("GreaterThan(l_shipdate")),
      q3scans.map(_.metadata("PushedFilters")).mkString("; "))
    val q5plan = SparkEntry.queries("q5_local_supplier")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(q5plan.contains("BroadcastHashJoin"), q5plan.take(500))
  }

  test("ts_anomaly broadcasts the per-key stats (fact table never shuffles)") {
    val df = SparkEntry.queries("ts_anomaly")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"),
      "stats join degraded to SMJ — would shuffle the event stream")
  }

  test("q18 aggregates lineitem once (partial+final) and takes top-k without a global sort") {
    val df = SparkEntry.queries("q18_large_orders")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the heavy-order HAVING aggregate is the ONLY aggregation, and the
    // fact table is scanned exactly once — no re-scan for the final output
    val aggs = "\\bHashAggregate\\b".r.findAllIn(plan).size
    assert(aggs === 2, s"expected partial+final of ONE lineitem aggregate:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT 100 should be TakeOrdered, not a global sort")
    assert(!plan.contains("SortMergeJoin"), "q18 joins should broadcast at this scale")
  }

  test("ts_ohlc is one hash aggregate — no per-row window pass over events") {
    val df = SparkEntry.queries("ts_ohlc")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // open/close come from min_by/max_by inside the same aggregate, so the
    // plan must NOT contain a Window operator (the oracle's row_number pin
    // is a small-scale twin, not the execution shape). The struct ordering
    // key makes Spark pick SortAggregate over HashAggregate — still one
    // partial+final pass with map-side combine.
    assert(!plan.contains(" Window"), s"ts_ohlc grew a window pass:\n$plan")
    val aggs = "\\b(Hash|Sort)Aggregate\\b".r.findAllIn(plan).size
    assert(aggs === 2, s"expected partial+final of ONE aggregate:\n$plan")
  }

  test("pipeline assignment queries are a single aggregate over a row-local hash") {
    for (q <- Seq("sample_stratified", "split_train_test", "doc_shard")) {
      val df = SparkEntry.queries(q)(spark, sf("0.001"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$q must not join")
      assert(!plan.contains(" Window"), s"$q must not window")
      val aggs = "\\bHashAggregate\\b".r.findAllIn(plan).size
      assert(aggs === 2, s"$q: expected partial+final of ONE aggregate:\n$plan")
    }
  }

  test("agg_corr is one hash aggregate (moment sums, map-side partials)") {
    val df = SparkEntry.queries("agg_corr")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val aggs = "\\bHashAggregate\\b".r.findAllIn(plan).size
    // partial + final of the single groupBy — no second aggregation pass,
    // no join, no window
    assert(aggs === 2, s"expected partial+final of ONE aggregate, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan.take(500))
  }

  test("emb_quantize shuffles the exploded components once (single window spec)") {
    val df = SparkEntry.queries("emb_quantize")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // ONE hash exchange feeding the per-vector min/max window; the final
    // hash aggregate reuses its partitioning. (The presentation orderBy
    // adds a range exchange — not data-movement that grows with a join or
    // a second clustering, so it is not counted.)
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashShuffles === 1, s"expected 1 hash exchange, saw $hashShuffles:\n$plan")
    assert(!plan.contains("Join"), "quantization must not join")
  }

  test("bucketed tables co-locate the fact join (zero Exchange in the plan)") {
    // the 100 TB pattern for repeated fact-fact joins: bucket both sides on
    // the join key at write time, and the join needs NO shuffle at read
    // time — EnsureRequirements sees compatible HashPartitioning from the
    // bucketing metadata
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf("0.001")).write.mode("overwrite")
        .option("path", s"$wh/b_orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      Tables.lineitem(spark, sf("0.001")).write.mode("overwrite")
        .option("path", s"$wh/b_lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
      val j = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(800)}")
      // and it computes the same result as the plain shuffled join
      val expected = Tables.orders(spark, sf("0.001"))
        .join(Tables.lineitem(spark, sf("0.001")),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q6 pushes every predicate to the lineitem scan (pure-IO aggregate)") {
    val df = SparkEntry.queries("q6_revenue_delta")(spark, sf("0.001"))
    val pushed = scans(df).head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.045)"), pushed)
    assert(pushed.contains("LessThan(l_quantity,24.0)"), pushed)
    // no join anywhere: scan → partial agg → final agg
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(500))
  }

  test("q19 pushes the union bound of the disjunctive quantity brackets") {
    val df = SparkEntry.queries("q19_bracket_revenue")(spark, sf("0.001"))
    val li = scans(df).find(_.metadata("Location").contains("lineitem")).get
    val pushed = li.metadata("PushedFilters")
    // the OR-of-ANDs itself can't push (spans both sides), but the hoisted
    // quantity union bound must reach the reader
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,1.0)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_quantity,30.0)"), pushed)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part side must broadcast")
  }

  test("ann_range broadcasts the probe set and needs no rank window") {
    val df = SparkEntry.queries("ann_range")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "probe set must broadcast against the corpus scan")
    assert(!plan.contains("Window"), "radius search needs no rank window")
  }

  test("ts_ewma evaluates all 8 taps in ONE window operator") {
    // both frames share (partition, order), so Catalyst must merge the
    // lags into a single Window node — one shuffle, one sort, not eight
    val df = SparkEntry.queries("ts_ewma")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan
    val stripped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = stripped.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.length === 1, s"expected one Window operator, got $windows")
  }

  test("q17 broadcasts the brand filter into both lineitem passes") {
    val df = SparkEntry.queries("q17_small_quantity")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "brand parts must broadcast")
    // both scans carry the quantity/price projection only after the join —
    // but the part scans themselves must push the brand predicate
    val partScans = scans(df).filter(_.metadata("Location").contains("part"))
    assert(partScans.nonEmpty)
    partScans.foreach { sc =>
      assert(sc.metadata("PushedFilters").contains("EqualTo(p_brand,Brand#1)"),
        sc.metadata("PushedFilters"))
    }
  }

  test("as-of variants never use a shrinking (unbounded-following) frame") {
    // Spark evaluates [current, unboundedFollowing) frames by rescanning
    // current→end per row — O(partition²), measured 26× on ts_interpolate's
    // carries at sf0.1. All as-of variants must express the forward extremum
    // as a GROWING frame over descending ts instead.
    for (q <- Seq("join_asof", "join_asof_forward", "join_asof_nearest",
        "join_asof_tolerance")) {
      val df = SparkEntry.queries(q)(spark, sf("0.001"))
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("unboundedfollowing"),
        s"$q window frame shrank (O(partition²) rescan):\n${plan.take(800)}")
    }
    // nearest composes asc+desc extrema: two Window operators, but ONE
    // hash exchange — the desc sort reuses the user_id partitioning
    val nearest = SparkEntry.queries("join_asof_nearest")(spark, sf("0.001"))
    val nplan = nearest.queryExecution.executedPlan.toString
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(nplan).size
    assert(hashShuffles === 1, s"expected 1 hash exchange, saw $hashShuffles:\n$nplan")
  }

  test("sample_reservoir pushes a partial per-group top-k below the exchange") {
    // the rank-filter must rewrite into WindowGroupLimit with a Partial pass
    // BEFORE the lang exchange — the shuffle then carries ≤ k rows per
    // (mapper × stratum) instead of the corpus
    val df = SparkEntry.queries("sample_reservoir")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not push a WindowGroupLimit:\n${plan.take(800)}")
    assert(plan.contains("Partial"),
      s"no map-side partial top-k below the exchange:\n${plan.take(800)}")
  }

  test("ann_pq scans code words against a broadcast probe table") {
    // the ADC contract: the corpus side carries only (nbr_id, pq_code) into
    // a broadcast nested-loop against the probes' distance tables — the big
    // side must not shuffle before the rank window, and the rank filter
    // must push a partial top-k below that single exchange
    val df = SparkEntry.queries("ann_pq")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"probe table did not broadcast:\n${plan.take(800)}")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashShuffles === 1,
      s"expected only the window exchange, saw $hashShuffles:\n${plan.take(1200)}")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"rank filter did not push a partial top-k:\n${plan.take(800)}")
    graft.CacheScope.release(spark)
  }

  test("ann_ivfpq joins the cached code index to broadcast probe cells") {
    // the composed index contract: the corpus side is the cached narrow
    // (nbr_id, cell, pq_code) table, probes broadcast into the cell join,
    // and the only exchange is the rank window's
    val df = SparkEntry.queries("ann_ivfpq")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"corpus index not pinned to its own stage:\n${plan.take(800)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe cells did not broadcast into the cell join:\n${plan.take(800)}")
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashShuffles === 1,
      s"expected only the window exchange, saw $hashShuffles:\n${plan.take(1200)}")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"rank filter did not push a partial top-k:\n${plan.take(800)}")
    graft.CacheScope.release(spark)
  }

  test("emb_kmeans: row-local assignment, one aggregate exchange, broadcast spine") {
    // the training contract: assignment is a pure projection (no join, no
    // window over the corpus), so the returned final-iteration plan has
    // exactly ONE hash exchange (the update aggregate's); the k*dim spine
    // joins via broadcast
    val df = SparkEntry.queries("emb_kmeans")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashShuffles === 1,
      s"expected only the update-aggregate exchange, saw $hashShuffles:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"spine did not broadcast:\n${plan.take(800)}")
    assert(!plan.contains("SortMergeJoin"),
      s"unexpected sort-merge join in the training plan:\n${plan.take(800)}")
  }

  test("emb_pq_quantize encodes in one row-local projection (no shuffle ops)") {
    // the PQ encoding is a pure projection over the corpus scan: any
    // Window / aggregate / join in the plan means the codebook assignment
    // stopped being row-local
    val df = SparkEntry.queries("emb_pq_quantize")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("Window", "HashAggregate", "SortAggregate", "Join"))
      assert(!plan.contains(bad), s"PQ plan contains $bad:\n${plan.take(800)}")
  }

  test("dedup_cross pairs batch against corpus through band buckets only") {
    // the incremental-dedup contract: candidates come from the (band, bh)
    // bucket join — never a batch×corpus nested loop or cartesian product
    val df = SparkEntry.queries("dedup_cross")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "dedup_cross degraded to a nested loop")
    assert(!plan.contains("CartesianProduct"),
      "dedup_cross degraded to a cartesian product")
    CacheScope.release(spark)
  }

  test("q5/q8 reduce customer against the broadcast nation keys before the fact join") {
    // semi-join reduction: the region-restricted nation set must filter
    // customer BELOW the exchange that feeds the fact join, or the full
    // customer table shuffles for rows the region filter then drops
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def pathToCustomerScan(p: SparkPlan): Option[List[SparkPlan]] = p match {
      case s: FileSourceScanExec
          if s.metadata("Location").contains("customer") => Some(List(s))
      case _ => p.children.view.flatMap(pathToCustomerScan)
        .headOption.map(p :: _)
    }
    for (q <- Seq("q5_local_supplier", "q8_market_share")) {
      val df = SparkEntry.queries(q)(spark, sf("0.001"))
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val path = pathToCustomerScan(plan)
        .getOrElse(fail(s"$q: no customer scan found"))
      // walking UP from the scan, a broadcast join must appear before any
      // shuffle exchange
      val fromScan = path.reverse
      val bcast = fromScan.indexWhere(_.isInstanceOf[BroadcastHashJoinExec])
      val shuffle = fromScan.indexWhere(_.isInstanceOf[ShuffleExchangeLike])
      assert(bcast >= 0, s"$q: customer never meets a broadcast join")
      assert(shuffle < 0 || bcast < shuffle,
        s"$q: customer shuffles before the nation-key broadcast filters it")
    }
  }

  test("timestore read pushes signed time range + prunes partitions") {
    val root = Files.createTempDirectory("graft-plan").toString
    val n = TimeStore.namespace(root, "PLAN")
    TimeStore.register(spark, n, 8, 8)
    TimeStore.writeEncoded(spark, n,
      PointCodec.encode((0L until 64L by 2L).map(a => Point(a, a, a))))
    val df = TimeStore.readSimple(spark, n, 4, 20, Seq(2L, 10L))
    val s = scans(df)
    assert(s.nonEmpty)
    val pushed = s.head.metadata("PushedFilters")
    assert(pushed.contains("In(address"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(time,4)"), pushed)
    // partition pruning: only bucket 2 of epoch 0 listed
    val parts = s.head.relation.location.listFiles(
      s.head.partitionFilters, s.head.dataFilters)
    assert(parts.length === 1, parts.map(_.values.toString))
  }

  test("text_chunk is shuffle-free (tokenize → explode → slice, no Exchange)") {
    // the fan-out stage must inherit the scan's partitioning: at corpus
    // scale any exchange here shuffles the full token stream for nothing.
    // (Tables.documents itself round-robins the small fixture for local
    // parallelism — the guard is that chunking adds NOTHING on top.)
    def exchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val base = exchanges(Tables.documents(spark, sf("0.001")))
    val df = graft.operators.TextAnalysis.chunk(
      Tables.documents(spark, sf("0.001")), "doc_id", "text")
    assert(exchanges(df) === base,
      df.queryExecution.executedPlan.toString.take(600))
  }

  test("agg_countmin broadcasts the counter matrix (fact side never re-shuffles)") {
    val df = SparkEntry.queries("agg_countmin")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the d×w cell matrix is the small side of the probe join by
    // construction — a sort-merge here would shuffle the probe stream on
    // the sketch cell key
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("imiTrainedTopK's cell join never shuffles the corpus (VERDICT r11 #4)") {
    // the inverted-list ⋈ probed-cells join must broadcast the probe side
    // on the COLD plan — at corpus scale an `Exchange hashpartitioning(cell`
    // would shuffle every corpus vector for a handful of probed cells. The
    // only hash exchanges allowed are the probe-/query-keyed rank windows.
    val df = SparkEntry.queries("ann_imi_trained")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(cell"),
      plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    CacheScope.release(spark)
  }

  test("join_fuzzy verifies inside blocks only (no all-pairs nested loop)") {
    val df = SparkEntry.queries("join_fuzzy")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the levenshtein DP must run on block-join survivors; a nested-loop
    // join would mean the blocking keys fell out of the join condition
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "fuzzy join degraded to all-pairs")
  }

  test("bm25IndexSearch pushes the query-term set into the postings scan " +
      "and broadcasts the query/stats sides") {
    import graft.operators.TextIndex
    import org.apache.spark.sql.functions.{array_join, col, slice}
    val docs = Tables.documents(spark, sf("0.001"))
    val path = Files.createTempDirectory("graft-bm25-plan").toString
    TextIndex.bm25IndexWrite(docs, "doc_id", "text", path)
    val qs = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 6),
          " ").as("qtext"))
    val df = TextIndex.bm25IndexSearch(spark, qs, "query_id", "qtext",
      path, k = 5)
    // the term predicate must reach parquet — at corpus scale this is the
    // difference between O(matched postings) and a full postings scan
    val pushed = scans(df).map(_.metadata("PushedFilters"))
    assert(pushed.exists(_.contains("In(term64")),
      pushed.mkString("; "))
    val stripped = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the corpus-sized side never shuffles raw: walking UP from the
    // postings scan, both query/stats joins (broadcast) AND the partial
    // score aggregate must appear BELOW the first exchange — so the only
    // shuffled rows are the map-side-combined (query, doc) partials of
    // MATCHED postings. (The tiny filtered-vocab df aggregate and the
    // one-row globals frame each shuffle/broadcast their own
    // ≤query-terms rows — bounded by the probe batch, not the corpus.)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def chainTo(p: SparkPlan): Option[List[SparkPlan]] = p match {
      case s: FileSourceScanExec
          if s.metadata("Location").contains("/postings/") => Some(List(p))
      case _ => p.children.view.flatMap(chainTo(_)).headOption.map(p :: _)
    }
    val chain = chainTo(stripped)
      .getOrElse(fail("no postings scan in the plan"))
    val belowFirstExchange = chain.reverse.takeWhile(!_.isInstanceOf[Exchange])
    assert(belowFirstExchange.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      s"query/stats joins must broadcast below the shuffle:\n$stripped")
    assert(belowFirstExchange.exists(_.isInstanceOf[HashAggregateExec]),
      s"score aggregation must partial-combine before the shuffle:\n$stripped")
    CacheScope.release(spark)
    val fsys = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("store reads with pending delete tombstones anti-join via a " +
      "BROADCAST, never a shuffle of the point scan") {
    import graft.core.Point
    import graft.sources.TimeStore
    import spark.implicits._
    val root = Files.createTempDirectory("graft-del-plan").toString
    val n = TimeStore.namespace(root, "DELPLAN")
    TimeStore.register(spark, n, 4, 4)
    TimeStore.writePoints(spark, n, spark.createDataset(
      (0 until 64).map(a => Point(a.toLong * 2, 100L + a, a.toLong))))
    TimeStore.deletePoints(spark, n, Seq(4L, 8L), 0L, 1000L)
    val df = TimeStore.readSimple(spark, n, 0L, 100000L,
      (0 until 8).map(_.toLong * 2))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"pending deletes must apply as a broadcast anti-join:\n${plan.take(1200)}")
    val fsys = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("bm25IndexSearch past the In-list ceiling: bounded semi-join plan, " +
      "no literal term predicate, identical results") {
    import graft.operators.TextIndex
    import org.apache.spark.sql.functions.{array_join, col, slice}
    val docs = Tables.documents(spark, sf("0.001"))
    val path = Files.createTempDirectory("graft-bm25-gate-plan").toString
    TextIndex.bm25IndexWrite(docs, "doc_id", "text", path)
    val qs = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 6),
          " ").as("qtext"))
    def run(ceiling: Long) = TextIndex.bm25IndexSearch(spark, qs,
      "query_id", "qtext", path, k = 5, maxTermInList = ceiling)
    val below = run(TextIndex.MaxTermInListValues)
    val above = run(0L) // every batch is "past the ceiling"
    // the gated plan must NOT splice term literals (a bulk vocabulary
    // would make the predicate plan-sized); the restriction rides a
    // semi-join instead, and the postings scan shows no In(term64 push
    val pushed = scans(above).map(_.metadata("PushedFilters"))
    assert(!pushed.exists(_.contains("In(term64")),
      s"gated path must not push a literal term list: $pushed")
    val plan = above.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"gated path must restrict terms via a semi-join:\n${plan.take(1200)}")
    // both strategies are the same retrieval
    assert(above.collect().map(_.toSeq).toSeq ===
      below.collect().map(_.toSeq).toSeq)
    CacheScope.release(spark)
    val fsys = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("online hybrid's per-batch lexical restriction is a broadcast " +
      "semi-join, never a literal id predicate") {
    import org.apache.spark.sql.functions.{array_join, col, slice}
    val docs = Tables.documents(spark, sf("0.001"))
    val lexQs = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 6),
          " ").as("qtext"))
    val batch = Tables.embeddings(spark, sf("0.001"))
      .filter(col("vec_id") < 4)
    val restricted = graft.queries.Streaming.lexForBatch(lexQs, batch, "vec_id")
    val plan = restricted.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"batch restriction must be a broadcast semi-join:\n${plan.take(1200)}")
    assert(!plan.contains("query_id#") || !plan.contains(" IN ("),
      s"batch restriction must not splice a literal id list:\n${plan.take(1200)}")
    // and it is the same restriction the literal splice computed
    val ids = batch.select(col("vec_id")).collect().map(_.getLong(0))
    val spliced = lexQs.filter(col("query_id").isin(ids.map(Long.box): _*))
    assert(restricted.collect().map(_.getLong(0)).sorted.toSeq ===
      spliced.collect().map(_.getLong(0)).sorted.toSeq)
    CacheScope.release(spark)
  }
}
