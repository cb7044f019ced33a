package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Point
import graft.sources.TimeStore
import graft.streaming.StreamingIngest

/** Streaming-ingest semantics: micro-batched writes land like batch writes,
  * late (out-of-order) data is accepted into old epochs, the latest
  * watermark advances monotonically, and windowed streaming aggregation
  * matches its batch twin. */
class StreamingSpec extends SparkSpec {

  test("streaming ingest: batches land, late data accepted, latest monotonic") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream").toString
    val n = TimeStore.namespace(root, "STREAM")
    TimeStore.register(spark, n, 4, 4)

    val input = MemoryStream[Point]
    input.addData(Point(0, 100, 1), Point(2, 200, 2), Point(4, 300, 3))
    val q = StreamingIngest.start(spark, n, input.toDS(),
      s"$root/checkpoint", Trigger.AvailableNow())
    q.processAllAvailable(); q.stop()
    assert(TimeStore.fetchLatest(spark, n) === ((300L, 0L)))

    // second batch: late point at t=50 (before everything seen so far);
    // restarting on the same checkpoint also exercises resume
    input.addData(Point(6, 50, 4), Point(0, 400, 5))
    val q2 = StreamingIngest.start(spark, n, input.toDS(),
      s"$root/checkpoint", Trigger.AvailableNow())
    q2.processAllAvailable(); q2.stop()

    // late point readable; latest stayed monotonic at 400
    assert(TimeStore.fetchLatest(spark, n) === ((400L, 0L)))
    val all = TimeStore.readSimple(spark, n, 0, -1L, Seq(0L, 2L, 4L, 6L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(all === Seq(
      (6L, 50L, 4L), (0L, 100L, 1L), (2L, 200L, 2L), (4L, 300L, 3L), (0L, 400L, 5L)))
  }

  test("checkpoint recovery: a crash between sink and checkpoint commit stays exactly-once") {
    // The reference's crash story (lock watchdog + double-checked rollover)
    // maps here to checkpoint recovery: foreachBatch is at-least-once when
    // a writer dies AFTER the store append commits but BEFORE the offset
    // checkpoint does — the restart re-delivers that batch and appends it
    // AGAIN. The engine's exactly-once contract is the composition: the
    // read path's pinned first-wins (address, time) dedup and the monotonic
    // latest max make the redelivered append invisible. This test injects
    // exactly that crash and asserts read parity with a batch twin.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream-recover").toString
    val n = TimeStore.namespace(root, "RECOVER")
    TimeStore.register(spark, n, 4, 4)

    val batchA = Seq(Point(0, 100, 1), Point(2, 200, 2))
    val batchB = Seq(Point(4, 300, 3), Point(0, 400, 4))
    val input = MemoryStream[Point]
    input.addData(batchA: _*)
    val q1 = StreamingIngest.start(spark, n, input.toDS(),
      s"$root/ckpt", Trigger.AvailableNow())
    q1.processAllAvailable(); q1.stop()

    // batch B: the store write COMMITS, then the "process" dies before the
    // checkpoint records the offset
    input.addData(batchB: _*)
    val crashing = input.toDS().writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Point], _: Long) =>
        TimeStore.writePoints(spark, n, batch)
        throw new RuntimeException("injected crash after sink commit")
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashing.awaitTermination()
    }

    // restart from the same checkpoint: batch B's offset was never
    // committed, so the recovered writer re-delivers and re-appends it
    val q2 = StreamingIngest.start(spark, n, input.toDS(),
      s"$root/ckpt", Trigger.AvailableNow())
    q2.processAllAvailable(); q2.stop()

    // the crash DID double-append: raw storage holds batch B twice —
    // proving this run exercised redelivery, not a silent no-op
    val raw = spark.read.parquet(TimeStore.livePointsPath(spark, n).get)
      .filter($"time" === 300L).count()
    assert(raw === 2L, s"expected the injected crash to double-append (got $raw)")

    // ...and the READ contract is still exactly-once: parity with a batch
    // twin that saw each point exactly once
    val twin = TimeStore.namespace(root, "TWIN")
    TimeStore.register(spark, twin, 4, 4)
    TimeStore.writePoints(spark, twin, spark.createDataset(batchA ++ batchB))
    def readAll(ns: TimeStore.Namespace) =
      TimeStore.readSimple(spark, ns, 0L, -1L, Seq(0L, 2L, 4L))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(readAll(n) === readAll(twin))
    assert(TimeStore.fetchLatest(spark, n) === TimeStore.fetchLatest(spark, twin))
    assert(TimeStore.fetchLatest(spark, n) === ((400L, 0L)))
  }

  test("file replay with maxFilesPerTrigger=1 appends once per staged file") {
    // the rate-limit contract ts_store_stream relies on: AvailableNow
    // honors maxFilesPerTrigger, so a 4-file staging directory drives four
    // separate store-append transactions, not one bulk batch
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream-files").toString
    val n = TimeStore.namespace(root, "FILES")
    TimeStore.register(spark, n, 4, 4)
    val pts = (1L to 8L).map(i => Point(i * 2, i * 100, i))
    val staged = s"$root/staged"
    val ds = spark.createDataset(pts)
    ds.repartition(4).write.parquet(staged)
    val nFiles = new java.io.File(staged).listFiles()
      .count(f => f.getName.startsWith("part-"))
    val src = spark.readStream.schema(ds.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(staged).as[Point]
    val q = StreamingIngest.start(spark, n, src, s"$root/ckpt",
      Trigger.AvailableNow())
    q.awaitTermination()
    val fed = q.recentProgress.count(_.numInputRows > 0)
    assert(fed === nFiles,
      s"expected one micro-batch per staged file ($nFiles), got $fed")
    assert(nFiles >= 2, "staging must produce a genuinely multi-batch replay")
    val all = TimeStore.readSimple(spark, n, 0L, -1L, (1L to 8L).map(_ * 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(all === pts.sortBy(_.time).map(p => (p.address, p.time, p.payload)))
  }

  test("stateful latest-per-key stream: state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Point]
    val q = StreamingIngest.statefulLatest(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_state")
      .start()
    input.addData(Point(2, 10, 1), Point(2, 30, 3), Point(4, 5, 9))
    q.processAllAvailable()
    // older point for addr 2 arrives late: state must not regress
    input.addData(Point(2, 20, 2), Point(4, 50, 10))
    q.processAllAvailable()
    q.stop()
    val byBatchLatest = spark.table("latest_state")
      .groupBy($"address").agg(org.apache.spark.sql.functions.expr("max_by(payload, time)").as("p"),
        org.apache.spark.sql.functions.max($"time").as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(1)))).toMap
    assert(byBatchLatest === Map(2L -> ((30L, 3L)), 4L -> ((50L, 10L))))
  }

  test("streaming windowed aggregation matches the batch twin") {
    val events = Tables.events(spark, sf("0.001"))
    val batchExpected = events
      .withColumn("hour_ns", col("ts") - pmod(col("ts"), lit(3600L * 1000 * 1000 * 1000)))
      .groupBy(col("hour_ns"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // run the same data through the streaming aggregation (complete mode via
    // memory sink)
    val streamed = StreamingIngest.windowedCounts(events, "ts")
    // batch DataFrame through the same plan builder: assert shape + totals
    val got = streamed.collect()
      .map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000000L,
        r.getString(1)) -> r.getLong(2)).toMap
    assert(got === batchExpected)
  }

  test("streaming hopping-window aggregation matches the batch ts_sliding twin") {
    val events = Tables.events(spark, sf("0.001"))
    val batchExpected = SparkEntry.queries("ts_sliding")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val streamed = StreamingIngest.windowedCounts(events, "ts",
      windowLen = "2 hours", slide = Some("1 hour"))
    val got = streamed.collect()
      .map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000000L,
        r.getString(1)) -> r.getLong(2)).toMap
    assert(got === batchExpected)
  }

  test("streaming sessionization: gap-merged sessions with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val minNs = 60L * 1000 * 1000 * 1000
    val t0 = 1704067200000000000L  // 2024-01-01T00:00Z
    val input = MemoryStream[(Long, Long)]
    val df = input.toDS().toDF("user_id", "ts_ns")
    val q = StreamingIngest.sessionCounts(df, "ts_ns", gap = "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions")
      .start()
    // user 1: two events 10min apart (one session), then one 60min later
    // (new session); user 2: a single event
    input.addData((1L, t0), (1L, t0 + 10 * minNs), (1L, t0 + 70 * minNs),
      (2L, t0 + 5 * minNs))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq.sorted
    // (user, n_events) per session: user1 -> 2 then 1, user2 -> 1
    assert(got === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("streaming dedup drops cross-batch duplicates with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = 1704067200000000000L
    val input = MemoryStream[(Long, Long, Long)]
    val df = input.toDS().toDF("address", "ts_ns", "payload")
    val q = StreamingIngest.dedupStream(df, Seq("address", "ts_ns"), "ts_ns")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .start()
    input.addData((2L, t0, 1L), (2L, t0, 99L), (4L, t0, 2L))
    q.processAllAvailable()
    // same (address, ts) replayed in a LATER micro-batch: still a duplicate
    input.addData((2L, t0, 77L), (6L, t0, 3L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((2L, t0), (4L, t0), (6L, t0)))
  }

  test("streaming dedup keys on exact ns time (sub-µs events are distinct — ADVICE r3)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = 1704067200000000000L
    val input = MemoryStream[(Long, Long, Long)]
    val df = input.toDS().toDF("address", "ts_ns", "payload")
    // keyCols deliberately OMITS ts_ns: dedupStream must append the raw ns
    // column itself, or two distinct events inside the same microsecond
    // would collapse into the µs-truncated event_time key
    val q = StreamingIngest.dedupStream(df, Seq("address"), "ts_ns")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_ns")
      .start()
    input.addData((2L, t0, 1L), (2L, t0 + 1L, 2L), // 1ns apart: BOTH survive
      (2L, t0, 9L))                                // exact dup: dropped
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((2L, t0), (2L, t0 + 1L)))
  }

  test("online z-score flags spikes against PREFIX moments only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingIngest.{KeyedValue, Outlier}
    val input = MemoryStream[KeyedValue]
    val q = StreamingIngest.anomalyStream(input.toDS(), threshold = 2.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("anomaly_stream")
      .start()
    // batch 1: establish a baseline (mean 10, small variance); none of
    // these can be flagged — the first two have n<2 history, the rest sit
    // inside 2.5σ of their prefixes
    input.addData(KeyedValue(1L, 1, 9.0), KeyedValue(1L, 2, 11.0),
      KeyedValue(1L, 3, 10.0), KeyedValue(1L, 4, 10.0), KeyedValue(1L, 5, 10.0))
    q.processAllAvailable()
    assert(spark.table("anomaly_stream").isEmpty)
    // batch 2: a spike (50) fires; the normal reading after it does not,
    // even though the spike inflated the prefix variance
    input.addData(KeyedValue(1L, 6, 50.0), KeyedValue(1L, 7, 10.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("anomaly_stream").as[Outlier].collect()
    assert(got.length === 1)
    assert(got.head.ts === 6L && got.head.value === 50.0)
    // hand-computed prefix z: mean 10, varPop of {9,11,10,10,10} = 0.4
    val expectedZ = (50.0 - 10.0) / math.sqrt(0.4)
    assert(math.abs(got.head.z - expectedZ) < 1e-9)
  }

  test("online EWMA folds recursively and state survives micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingIngest.{KeyedValue, Smoothed}
    val input = MemoryStream[KeyedValue]
    val q = StreamingIngest.ewmaStream(input.toDS(), alpha = 0.3)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_stream")
      .start()
    input.addData(KeyedValue(1L, 1, 10.0), KeyedValue(1L, 2, 20.0),
      KeyedValue(2L, 1, 5.0))
    q.processAllAvailable()
    // batch 2 must continue key 1's state, not restart at the raw value
    input.addData(KeyedValue(1L, 3, 10.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ewma_stream").as[Smoothed].collect()
      .map(s => (s.key, s.ts) -> s.ewma).toMap
    // exact recursive fold: s1=10; s2=0.3*20+0.7*10=13; s3=0.3*10+0.7*13=12.1
    assert(math.abs(got((1L, 1L)) - 10.0) < 1e-12)
    assert(math.abs(got((1L, 2L)) - 13.0) < 1e-12)
    assert(math.abs(got((1L, 3L)) - 12.1) < 1e-12)
    assert(math.abs(got((2L, 1L)) - 5.0) < 1e-12)
  }

  test("stream-static decontamination join is stateless and matches the batch intersection") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stat = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text") // eval/held-out side (static)
    val evalGrams = graft.operators.Dedup
      .shingles(stat, "doc_id", "text", 5).select(col("s")).distinct()
    val docs = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup
      .shingles(docs.toDS().toDF("doc_id", "text"), "doc_id", "text", 5)
      .join(broadcast(evalGrams), "s")
      .select(col("doc").as("doc_id"), col("s"))
      .writeStream.outputMode("append")
      .format("memory").queryName("decon")
      .start()
    docs.addData(
      (1L, "he said the quick brown fox jumps right here"), // 1 shared 5-gram
      (2L, "a completely different sentence about spark engines"))
    q.processAllAvailable()
    docs.addData( // second batch: earlier docs need no state to stay correct
      (3L, "quick brown fox jumps over the lazy dog indeed"))
    q.processAllAvailable()
    // STATELESS is the deployability claim: the progress reports must show
    // zero stateful operators (no watermark, no state store growth)
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty)
    q.stop()
    val got = spark.table("decon").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.count(_._1 == 1L) === 1)
    assert(got.count(_._1 == 2L) === 0)
    assert(got.count(_._1 == 3L) >= 4) // sliding 5-grams of the shared span
    // parity with the batch gram intersection on the same rows
    val batch = graft.operators.Dedup
      .shingles(Seq(
          (1L, "he said the quick brown fox jumps right here"),
          (2L, "a completely different sentence about spark engines"),
          (3L, "quick brown fox jumps over the lazy dog indeed"))
        .toDF("doc_id", "text"), "doc_id", "text", 5)
      .join(evalGrams, "s")
      .select(col("doc"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet === batch.toSet)
  }

  test("stream-stream attribution join matches within the interval only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val minNs = 60L * 1000 * 1000 * 1000
    val t0 = 1704067200000000000L
    val purchases = MemoryStream[(Long, Long)]
    val signups = MemoryStream[(Long, Long)]
    val q = StreamingIngest.attributionJoin(
        purchases.toDS().toDF("user_id", "ts_ns"),
        signups.toDS().toDF("user_id", "ts_ns"), "ts_ns", within = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib")
      .start()
    signups.addData((1L, t0), (2L, t0))
    // user 1 buys 30min after signup (match); user 2 buys 2h after (no
    // match); user 3 never signed up (no match)
    purchases.addData((1L, t0 + 30 * minNs), (2L, t0 + 120 * minNs),
      (3L, t0 + 10 * minNs))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }
}
