package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** Pinned-winner determinism (VERDICT r1 #2): conflicting duplicates on
  * (addr, time) — same key, different payloads — spread across partitions
  * must resolve to the same winner no matter the partitioning, and that
  * winner must be the one the SQL oracle's `ORDER BY tiebreak` picks.
  */
class DeterminismSpec extends SparkSpec {

  import spark.implicits._

  // (addr, time, payload, event_id): two conflicting rows per (addr, time),
  // lower event_id carries the payload the oracle must keep.
  private def conflicted(parts: Int) = Seq(
    (1L, 100L, "keep-a", 10L), (1L, 100L, "drop-a", 11L),
    (1L, 200L, "keep-b", 20L), (1L, 200L, "drop-b", 21L),
    (2L, 100L, "keep-c", 30L), (2L, 100L, "drop-c", 31L),
    (3L, 300L, "solo", 40L)
  ).toDF("addr", "time", "payload", "event_id").repartition(parts)

  test("rangeScan pins the dedup winner across partitionings") {
    val expected = Set((1L, 100L, "keep-a"), (1L, 200L, "keep-b"),
      (2L, 100L, "keep-c"), (3L, 300L, "solo"))
    for (parts <- Seq(1, 3, 7)) {
      val got = TimeSeriesOps.rangeScan(conflicted(parts), "time", "addr",
          0L, 1000L, Seq(1L, 2L, 3L), tiebreak = Seq(col("event_id")))
        .select("addr", "time", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("latestPerKey pins the tie winner across partitionings") {
    // ties on time within a key: highest event_id must win (matching the
    // oracle's ORDER BY ts DESC, event_id DESC)
    val expected = Set((1L, 200L, "drop-b"), (2L, 100L, "drop-c"),
      (3L, 300L, "solo"))
    for (parts <- Seq(1, 3, 7)) {
      val got = TimeSeriesOps.latestPerKey(conflicted(parts), "addr", "time",
          Seq("payload"), tiebreak = Some(col("event_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  // ---- store-path determinism + unsigned ordering (VERDICT r2 #2/#3) ----

  import java.nio.file.Files
  import graft.core.Point
  import graft.sources.{MutableKV, TimeStore}

  private def freshNs(tag: String): TimeStore.Namespace =
    TimeStore.namespace(Files.createTempDirectory(s"graft-det-$tag").toString, "DET")

  test("readSimple pins the duplicate winner across writes (first-wins, Algorithms.hs:273-298)") {
    val n = freshNs("dup")
    TimeStore.register(spark, n, 4, 4)
    // conflicting (address, time) pairs land in SEPARATE batches -> separate
    // parquet files -> separate scan partitions; -7L is unsigned-huge so the
    // unsigned-min winner is 3L, not the signed min
    TimeStore.writePoints(spark, n, spark.createDataset(Seq(Point(2L, 10L, 5L)))(
      org.apache.spark.sql.Encoders.product[Point]))
    TimeStore.writePoints(spark, n, spark.createDataset(Seq(Point(2L, 10L, 3L)))(
      org.apache.spark.sql.Encoders.product[Point]))
    TimeStore.writePoints(spark, n, spark.createDataset(Seq(Point(2L, 10L, -7L)))(
      org.apache.spark.sql.Encoders.product[Point]))
    (1 to 3).foreach { i =>
      val rows = TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L)).collect()
      assert(rows.length === 1, s"run $i")
      assert(rows.head.getAs[Long]("payload") === 3L, s"run $i: pinned winner flipped")
    }
  }

  test("latestPerAddress orders by UNSIGNED time (a point at 2^64-1 wins)") {
    val n = freshNs("uns")
    TimeStore.register(spark, n, 4, 4)
    // -1L is Word64 maxBound (Core.hs:232-243); under signed max_by it would
    // LOSE to 1L
    TimeStore.writePoints(spark, n, spark.createDataset(Seq(
      Point(2L, 1L, 100L), Point(2L, -1L, 200L)))(
      org.apache.spark.sql.Encoders.product[Point]))
    val rows = TimeStore.latestPerAddress(spark, n, "simple").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("time") === -1L)
    assert(rows.head.getAs[Long]("payload") === 200L)
  }

  test("lookup and enumerate agree on duplicate-(address,time) winners (ADVICE r3)") {
    // duplicate (address, time=latest) rows with different payloads, written
    // in separate batches so they land in separate files/partitions; the
    // winner must be the smallest UNSIGNED (payload, value) on BOTH read
    // paths — readExtended-based lookup and latestPerAddress-based enumerate.
    // Payloads {-9L, -5L} (= 2^64-9, 2^64-5 unsigned): unsigned-min keeps
    // -9L on both paths; the OLD signed-max tiebreak in latestPerAddress
    // would have kept -5L, disagreeing with readKind — the exact divergence
    // this pins shut.
    val n = freshNs("agree")
    TimeStore.register(spark, n, 4, 4)
    def one(payload: Long, v: Array[Byte]) =
      TimeStore.writePoints(spark, n, spark.createDataset(Seq(
        Point(5L, 40L, payload, v)))(org.apache.spark.sql.Encoders.product[Point]))
    one(-5L, "beta".getBytes)
    one(-9L, "alpha".getBytes)
    val viaRead = TimeStore.readExtended(spark, n, 0L, 100L, Seq(5L))
      .orderBy(col("time").bitwiseXOR(lit(Long.MinValue)).desc).limit(1)
      .collect().head
    val viaLatest = TimeStore.latestPerAddress(spark, n, "extended")
      .collect().head
    assert(viaRead.getAs[Long]("payload") === -9L)
    assert(viaLatest.getAs[Long]("payload") === -9L)
    assert(new String(viaLatest.getAs[Array[Byte]]("value")) ===
      new String(viaRead.getAs[Array[Byte]]("value")))
  }

  test("MutableKV.lookup resolves by UNSIGNED seq (Mutable.hs:69 maxBound-adjacent)") {
    val root = Files.createTempDirectory("graft-det-mut").toString
    val n = TimeStore.namespace(root, "M")
    MutableKV.insert(spark, n, 4L, "small-seq".getBytes)
    // inject a record at seq = 2^64-1 directly into the shadow namespace:
    // unsigned order must prefer it over seq 1. Built via copy — the
    // '-INTERNAL' suffix is reserved, so namespace() rightly rejects it
    val shadow = n.copy(ns = s"${n.ns}-INTERNAL")
    val big = "unsigned-max-seq".getBytes
    TimeStore.writePoints(spark, shadow, spark.createDataset(Seq(
      Point(5L, -1L, big.length.toLong, big)))(
      org.apache.spark.sql.Encoders.product[Point]))
    assert(MutableKV.lookup(spark, n, 4L).map(new String(_)) ===
      Some("unsigned-max-seq"))
  }

  test("asofJoin pins the floor-tie winner") {
    val left = Seq((1L, 150L), (1L, 250L)).toDF("k", "t")
    // two right rows share the floor time 100 for key-less broadcast join;
    // higher rid wins under the tiebreak
    val right = Seq((100L, "r1", 1L), (100L, "r2", 2L), (200L, "r3", 3L))
      .toDF("rt", "rv", "rid")
    val got = TimeSeriesOps.asofJoin(left, right, col("t"), col("rt"),
        Seq("rv" -> col("rv")), rightTiebreak = Some(col("rid")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, 150L, "r2"), (1L, 250L, "r3")))
  }

  test("EVERY declared query is partitioning-invariant (shuffle 3 vs 7)") {
    // the blanket form of the pinned-winner property: identical row
    // multisets under different shuffle-partition counts. Catches any
    // unpinned dedup winner, rank tie, or order-dependent float fold in
    // the whole inventory — the oracle gate can't see this (it runs one
    // partitioning); a 1000-executor cluster runs a different one.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: String): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries.map { case (name, fn) =>
        try name -> fn(spark, sf("0.001")).collect()
          .map(_.toString).sorted.toSeq
        finally CacheScope.release(spark)
      }
    }
    try {
      val a = runAll("3")
      val b = runAll("7")
      val diff = a.keys.filter(k => a(k) != b(k))
      assert(diff.isEmpty,
        s"partitioning-dependent results: ${diff.toSeq.sorted.mkString(", ")}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
