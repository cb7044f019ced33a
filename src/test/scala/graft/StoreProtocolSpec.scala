package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.core.Point
import graft.sources.TimeStore

/** Write-protocol specs: the writer fence (the enforced form of the
  * single-writer declaration — the reference's lock contract,
  * `Core.hs:125-164`, `StoreTests.hs:128-157`), the single-scan ingest
  * (observe-based watermark), compaction crash recovery, and the register
  * CLI. */
class StoreProtocolSpec extends SparkSpec {

  def freshNs(): TimeStore.Namespace =
    TimeStore.namespace(Files.createTempDirectory("graft-proto").toString, "PROTO")

  def pts(ps: (Long, Long, Long)*): org.apache.spark.sql.Dataset[Point] = {
    import spark.implicits._
    spark.createDataset(ps.map { case (a, t, p) => Point(a, t, p) })
  }

  test("a second concurrent writer fails loudly (lease held)") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    TimeStore.withWriterLease(spark, n) {
      val ex = intercept[IllegalStateException] {
        TimeStore.writePoints(spark, n, pts((2L, 10L, 1L)))
      }
      assert(ex.getMessage.contains("active writer"))
    }
    // lease released -> the same write now succeeds
    TimeStore.writePoints(spark, n, pts((2L, 10L, 1L)))
    assert(TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L)).count() === 1)
  }

  test("a stale lease (older than the 120s watchdog) is broken, not fatal") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    val conf = spark.sparkContext.hadoopConfiguration
    val lease = new Path(s"${n.metaDir}/write.lease")
    val f = lease.getFileSystem(conf)
    f.create(lease, false).close()
    val old = System.currentTimeMillis() - TimeStore.LeaseTimeoutMs - 5000
    f.setTimes(lease, old, old)
    TimeStore.writePoints(spark, n, pts((2L, 10L, 1L)))  // breaks + proceeds
    assert(TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L)).count() === 1)
    assert(!f.exists(lease), "lease released after the write")
  }

  test("ingest runs ONE action per batch (watermark via observe, not a 2nd scan)") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    @volatile var actions = 0
    val listener = new QueryExecutionListener {
      def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        actions += 1
      def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      TimeStore.writePoints(spark, n, pts((2L, 10L, 1L), (3L, 20L, 2L), (4L, 7L, 3L)))
      // listener delivery is async; wait for it to drain
      val deadline = System.currentTimeMillis() + 10000
      while (actions < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(500)  // allow any unexpected second action to surface
      assert(actions === 1, s"expected exactly one Spark action per ingest batch, saw $actions")
    } finally spark.listenerManager.unregister(listener)
    // and the watermarks still advanced (observe metrics applied): addrs
    // 2/4 are simple (max t=10), addr 3 is extended (t=20)
    assert(TimeStore.fetchLatest(spark, n) === ((10L, 20L)))
  }

  test("recoverStranded heals a crash in compact's swap window") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    TimeStore.writePoints(spark, n, pts((2L, 10L, 1L), (4L, 20L, 2L)))
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(n.pointsDir)
    val f = live.getFileSystem(conf)
    // simulate dying between rename(live -> bak) and rename(tmp -> live)
    f.rename(live, new Path(s"${n.dir}/points-old"))
    assert(!f.exists(live))
    TimeStore.recoverStranded(spark, n)
    assert(f.exists(live))
    assert(!f.exists(new Path(s"${n.dir}/points-old")))
    assert(TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L, 4L)).count() === 2)
  }

  test("register CLI is idempotent and spark-submit shaped (Store.hs:87-105)") {
    val root = Files.createTempDirectory("graft-cli").toString
    val first = RegisterNamespace.run(spark, root, "CLI", 8, 16)
    assert(first.contains("registered 'CLI'"))
    val n = TimeStore.namespace(root, "CLI")
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries === Vector((0L, 8)))
    assert(TimeStore.fetchIndex(spark, n, "extended").get.entries === Vector((0L, 16)))
    val again = RegisterNamespace.run(spark, root, "CLI", 2, 2)
    assert(again.contains("already registered"))
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries === Vector((0L, 8)))
  }
}
