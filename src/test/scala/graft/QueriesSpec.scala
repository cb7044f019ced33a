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

  test("agg_corr matches Spark's built-in corr (within its 6dp rounding)") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("agg_corr")(spark, sf("0.001"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val builtin = Tables.lineitem(spark, sf("0.001"))
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === builtin.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6,
        s"corr($k): moment-sum $v vs builtin ${builtin(k)}")
    }
  }

  test("ts_anomaly flags exactly the |z| > 2.5 events") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ts_anomaly")(spark, sf("0.001")).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getAs[Double]("z")) > 2.49999),
      "every flagged event clears the threshold")
    // spot-check one flagged event against driver-side stats for its key
    val r0 = out.head
    val uid = r0.getAs[Long]("user_id")
    val vals = Tables.events(spark, sf("0.001"))
      .filter(col("user_id") === uid)
      .select(col("value").cast("decimal(18,2)").cast("double"))
      .collect().map(_.getDouble(0))
    val mean = vals.sum / vals.length
    val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
    val z = (r0.getAs[Double]("value") - mean) / std
    assert(math.abs(math.floor(z * 1e6 + 0.5) / 1e6 - r0.getAs[Double]("z")) < 1e-4)
  }

  test("containment dominates jaccard: every jaccard pair is a containment pair") {
    // |A∩B|/min ≥ |A∩B|/|A∪B| always, so at equal thresholds the
    // containment pair set must be a superset of the jaccard pair set
    import org.apache.spark.sql.functions.col
    val sh = graft.operators.Dedup.shingles(
      Tables.documents(spark, sf("0.001")), "doc_id", "text", 3)
    val jac = graft.operators.Dedup.jaccardPairs(sh, 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val con = graft.operators.Dedup.containmentPairs(
        graft.operators.Dedup.shingles(
          Tables.documents(spark, sf("0.001")), "doc_id", "text", 3), 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty && jac.subsetOf(con),
      s"jaccard pairs missing from containment: ${jac -- con}")
  }

  test("as-of joins bracket each purchase: prev signup <= purchase <= next signup") {
    val back = SparkEntry.queries("join_asof")(spark, sf("0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val fwd = SparkEntry.queries("join_asof_forward")(spark, sf("0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(back.keySet === fwd.keySet)
    assert(back.exists(_._2.isDefined) && fwd.exists(_._2.isDefined))
    back.foreach { case (k @ (_, pts), prev) =>
      prev.foreach(p => assert(p <= pts, s"backward match after purchase at $k"))
      fwd(k).foreach(n => assert(n >= pts, s"forward match before purchase at $k"))
    }
  }

  test("train/val/test split partitions the corpus exactly") {
    val rows = SparkEntry.queries("split_train_test")(spark, sf("0.001")).collect()
    val splits = rows.map(_.getString(0)).distinct.sorted
    assert(splits === Array("test", "train", "val"))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.documents(spark, sf("0.001")).count())
    // deterministic: a second run produces the identical audit
    val again = SparkEntry.queries("split_train_test")(spark, sf("0.001")).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("ohlc bars are coherent: low <= open/close <= high, volume >= 1") {
    SparkEntry.queries("ts_ohlc")(spark, sf("0.001")).collect().foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open_val"), r.getAs[Double]("high_val"),
        r.getAs[Double]("low_val"), r.getAs[Double]("close_val"))
      assert(l <= o && o <= h, s"open outside [low,high]: $r")
      assert(l <= c && c <= h, s"close outside [low,high]: $r")
      assert(r.getAs[Long]("n_events") >= 1)
    }
  }

  test("embedding dimension stats are coherent: var >= 0, min <= mean <= max") {
    val rows = SparkEntry.queries("emb_dim_stats")(spark, sf("0.001")).collect()
    assert(rows.length === 64)
    rows.foreach { r =>
      assert(r.getAs[Double]("var_pop") >= 0, s"negative variance: $r")
      assert(r.getAs[Double]("min_x") <= r.getAs[Double]("mean") + 1e-6 &&
        r.getAs[Double]("mean") <= r.getAs[Double]("max_x") + 1e-6, s"mean outside range: $r")
    }
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

  test("ann_range contains every brute-force neighbor above its threshold") {
    val range = SparkEntry.queries("ann_range")(spark, sf("0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos_sim")).toMap
    assert(range.values.forall(_ >= 0.2), "radius search leaked below-threshold rows")
    val bf = SparkEntry.queries("ann_bruteforce")(spark, sf("0.001")).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("nbr_id")) -> r.getAs[Double]("cos_sim"))
      .filter(_._2 >= 0.2)
    assert(bf.nonEmpty)
    bf.foreach { case (k, sim) =>
      assert(range.get(k).contains(sim),
        s"brute-force neighbor $k (cos $sim) missing from radius search")
    }
  }

  test("centroid audits partition the corpus and stay in the label domain") {
    val n = Tables.embeddings(spark, sf("0.001")).count()
    val conf = SparkEntry.queries("emb_nearest_centroid")(spark, sf("0.001")).collect()
    assert(conf.map(_.getAs[Long]("n_vecs")).sum === n,
      "confusion counts must partition the corpus")
    val labels = conf.map(_.getAs[Int]("label")).toSet
    assert(conf.map(_.getAs[Int]("assigned")).toSet.subsetOf(labels))
    val out = SparkEntry.queries("emb_outliers")(spark, sf("0.001")).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === n)
    out.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Double]("mean_d") > 0, s"degenerate distances: $r")
      if (r.getAs[Long]("n_outliers") > 0)
        assert(r.getAs[Double]("max_z") > 2.0, s"outliers without a >2σ z: $r")
    }
  }

  test("ts_ewma FIR tracks the exact recursive fold within the tail bound") {
    // 8-tap truncation drops (1-α)^8 of the mass; renormalized, the FIR
    // can deviate from the recursion by at most that fraction of the
    // key's value range (derivation in TimeSeries.ewma scaladoc context)
    val q = 0.7 * 0.7 * 0.7 * 0.7 * 0.7 * 0.7 * 0.7 * 0.7
    val rows = SparkEntry.queries("ts_ewma")(spark, sf("0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("value"), r.getAs[Double]("ewma")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val seq = rs.sortBy(r => (r._2, r._3))
      val range = seq.map(_._4).max - seq.map(_._4).min
      var s = Double.NaN
      seq.zipWithIndex.foreach { case ((_, _, _, v, fir), i) =>
        s = if (s.isNaN) v else 0.3 * v + 0.7 * s
        // head rows (i < 8) renormalize over the taps that exist, which
        // over-weights recent values vs the recursion's v0 anchor — their
        // worst-case coefficient is 0.7·(0.3/0.51 − 0.3) ≈ 0.288 at i=1;
        // once all 8 taps exist the deviation is the dropped tail mass
        val bound = (if (i >= 8) q else 0.3) * range + 1e-6
        assert(math.abs(fir - s) <= bound,
          s"FIR $fir drifted from recursion $s beyond the $bound bound (i=$i)")
      }
    }
    // and the smoothing is not a no-op: some row differs from its raw value
    assert(rows.exists(r => math.abs(r._5 - r._4) > 1e-9))
  }

  test("sample_temperature weights are a distribution that flattens shares") {
    val rows = SparkEntry.queries("sample_temperature")(spark, sf("0.001")).collect()
    val rawSum = rows.map(_.getAs[Double]("raw_share")).sum
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(rawSum - 1.0) < 1e-4 && math.abs(wSum - 1.0) < 1e-4)
    // temperature < 1 compresses: the smallest source is boosted at least
    // as much as the largest (oversample is anti-monotone in raw share)
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("oversample") >=
      bySize.last.getAs[Double]("oversample"))
  }
}
