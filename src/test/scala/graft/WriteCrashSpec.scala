package graft

import java.nio.file.Files

import graft.core.Point
import graft.sources.TimeStore

/** Crash injection for the BATCH write path (VERDICT r8 #5) — the missing
  * third of the protocol's fault coverage: StoreProtocolSpec covers lease
  * races and StreamingSpec covers sink/checkpoint crashes; these tests kill
  * `writePoints` between its non-atomic protocol steps via the
  * [[TimeStore.crashSeams]] fail-points and assert the store the crash
  * leaves behind is readable and the NEXT writer converges it.
  *
  * The write protocol's commit points, in order: (1) the parquet job
  * commit (atomic via _SUCCESS/rename — a crash before it leaves only
  * `_temporary`, which every reader skips), (2) the `latest` watermark
  * publish (atomic rename), (3) the rollover index append (atomic rename).
  * A crash between them leaves: after (1) committed data with a stale
  * watermark; after (2) an advanced watermark with an un-rolled index.
  * Neither state gates READS — visibility is by scan, not watermark — and
  * both converge under the next writer: the watermark re-advances
  * monotonically (maxU against the published value) and `maybeRollover`
  * re-probes sizes on every batch. */
class WriteCrashSpec extends SparkSpec {

  private def pts(addrs: Range, t0: Long): Seq[Point] =
    addrs.map(a => Point(a.toLong * 2, t0 + a, a.toLong))

  test("crash between parquet commit and writeLatest: readable store, watermark re-advances") {
    val root = Files.createTempDirectory("graft-crash-a").toString
    val n = TimeStore.namespace(root, "CRASHA")
    TimeStore.register(spark, n, 4, 4)
    import spark.implicits._

    TimeStore.writePoints(spark, n, spark.createDataset(pts(0 until 8, 100L)))
    val (latest1, _) = TimeStore.fetchLatest(spark, n)
    assert(latest1 === 107L)

    // writer 2 dies after the parquet commit, before publishing `latest`
    TimeStore.crashSeams.add("after-parquet-commit")
    val boom = intercept[RuntimeException] {
      TimeStore.writePoints(spark, n, spark.createDataset(pts(0 until 8, 5000L)))
    }
    assert(boom.getMessage.contains("injected crash"))
    assert(TimeStore.crashSeams.isEmpty, "seam did not fire")

    // the crashed batch COMMITTED (job-level atomicity) but the watermark is
    // stale — and the store is still fully readable, with the crashed
    // batch's rows visible (visibility is by scan, not watermark)
    assert(TimeStore.fetchLatest(spark, n)._1 === latest1)
    val addrs = (0 until 8).map(_.toLong * 2)
    val rows = TimeStore.readSimple(spark, n, 0L, 100000L, addrs).collect()
    assert(rows.length === 16, s"expected both batches, got ${rows.length}")

    // next writer (lower times than the crashed batch): succeeds, and the
    // watermark re-advances MONOTONICALLY — never below the published value
    TimeStore.writePoints(spark, n, spark.createDataset(pts(0 until 8, 500L)))
    val (s2, _) = TimeStore.fetchLatest(spark, n)
    assert(s2 >= latest1 && s2 >= 507L)

    // a later batch above the crashed batch's times restores dominance of
    // the watermark over EVERYTHING on disk
    TimeStore.writePoints(spark, n, spark.createDataset(pts(0 until 8, 9000L)))
    val (s3, _) = TimeStore.fetchLatest(spark, n)
    assert(s3 === 9007L)
    val all = TimeStore.readSimple(spark, n, 0L, 100000L, addrs).collect()
    assert(all.length === 32)

    // latest-value serving agrees with the full scan image
    val latest = TimeStore.latestPerAddress(spark, n, "simple")
      .orderBy("address").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(latest.toSeq === (0 until 8).map(a => (a.toLong * 2, 9000L + a)))
  }

  test("crash between writeLatest and rollover: next batch completes the rollover") {
    val root = Files.createTempDirectory("graft-crash-b").toString
    val n = TimeStore.namespace(root, "CRASHB")
    TimeStore.register(spark, n, 4, 4)
    import spark.implicits._

    // writer dies after publishing `latest`, before the rollover append —
    // the 1-byte threshold guarantees the probe WOULD have rolled
    TimeStore.crashSeams.add("after-write-latest")
    intercept[RuntimeException] {
      TimeStore.writePoints(spark, n,
        spark.createDataset(pts(0 until 32, 100L)), rolloverBytes = 1L)
    }
    assert(TimeStore.crashSeams.isEmpty, "seam did not fire")
    // watermark committed; index did NOT roll
    assert(TimeStore.fetchLatest(spark, n)._1 === 131L)
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries.length === 1)

    // the next batch's rollover probe converges the index
    TimeStore.writePoints(spark, n,
      spark.createDataset(pts(0 until 4, 200L)), rolloverBytes = 1L)
    val idx = TimeStore.fetchIndex(spark, n, "simple").get
    assert(idx.entries.length === 2, s"rollover not completed: $idx")
    // the new epoch opens at the re-advanced watermark
    assert(idx.entries(1)._1 === 203L)

    // everything written before and after the crash reads back
    val addrs = (0 until 32).map(_.toLong * 2)
    val rows = TimeStore.readSimple(spark, n, 0L, 100000L, addrs).collect()
    assert(rows.length === 36)
  }
}
