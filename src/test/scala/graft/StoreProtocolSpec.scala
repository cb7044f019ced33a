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

  test("recoverStranded removes a dead compaction's incomplete generation") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    TimeStore.writePoints(spark, n, pts((2L, 10L, 1L), (4L, 20L, 2L)))
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new Path(n.dir).getFileSystem(conf)
    // simulate a compaction that died mid-write: a new generation exists
    // but its _SUCCESS never committed
    val dead = new Path(s"${n.dir}/points-g1")
    f.mkdirs(new Path(dead, "kind=simple"))
    // readers never resolve the incomplete generation...
    assert(TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L, 4L)).count() === 2)
    // ...and recovery clears it
    TimeStore.recoverStranded(spark, n)
    assert(!f.exists(dead))
    assert(TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L, 4L)).count() === 2)
  }

  test("readers are never broken by concurrent compactions (reader-safe swap)") {
    val n = freshNs()
    TimeStore.register(spark, n, 2, 2)
    (1 to 4).foreach(i =>
      TimeStore.writePoints(spark, n, pts((2L, i.toLong, i.toLong), (4L, i.toLong + 10, i.toLong))))
    val expected = TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L, 4L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    val readers = (0 until 2).map { _ =>
      new Thread(() => {
        try while (!stop) {
          val got = TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L, 4L)).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          if (got != expected) errors.add(s"content flipped: $got")
        } catch { case t: Throwable => errors.add(s"reader broke: $t") }
      })
    }
    readers.foreach(_.start())
    try {
      // two cycles: points -> g1 (old swap window) and g1 -> g2 (also
      // exercises retiring generation 0 under live readers)
      TimeStore.compact(spark, n)
      TimeStore.compact(spark, n)
    } finally {
      stop = true
      readers.foreach(_.join(60000))
    }
    assert(errors.isEmpty, s"readers saw errors during compaction: $errors")
    assert(TimeStore.readSimple(spark, n, 0L, 100L, Seq(2L, 4L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === expected)
  }

  test("lease hammer: racing writers serialize and all eventually succeed (StoreTests.hs:128-157)") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    val threads = 12
    val perThread = 3
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val completed = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // the reference proves exclusion through the STORE (a counter every
    // writer read-modify-writes, StoreTests.hs:128-157), not through
    // process-local atomics — do both: lost updates on the file counter
    // reveal interleaving even if the atomics happen to look clean
    val conf = spark.sparkContext.hadoopConfiguration
    val counterPath = new Path(s"${n.metaDir}/counter")
    val cfs = counterPath.getFileSystem(conf)
    def readCounter(): Long = {
      if (!cfs.exists(counterPath)) 0L
      else {
        val in = cfs.open(counterPath)
        try new String(in.readAllBytes()).trim.toLong finally in.close()
      }
    }
    def writeCounter(v: Long): Unit = {
      val out = cfs.create(counterPath, true)
      try out.write(v.toString.getBytes) finally out.close()
    }
    val pool = (0 until threads).map { _ =>
      new Thread(() => {
        try {
          var done = 0
          while (done < perThread) {
            try {
              TimeStore.withWriterLease(spark, n) {
                val now = inside.incrementAndGet()
                maxInside.accumulateAndGet(now, math.max(_, _))
                writeCounter(readCounter() + 1) // unprotected RMW but for the lease
                Thread.sleep(2)
                inside.decrementAndGet()
                completed.incrementAndGet()
              }
              done += 1
            } catch {
              case _: IllegalStateException => Thread.sleep(5) // busy; retry
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    pool.foreach(_.start())
    pool.foreach(_.join(120000))
    assert(errors.isEmpty, s"writer threads failed: $errors")
    assert(completed.get() === threads * perThread)
    assert(maxInside.get() === 1, "two writers held the lease simultaneously")
    assert(readCounter() === threads.toLong * perThread,
      "lost update on the lease-protected counter — writers interleaved")
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
