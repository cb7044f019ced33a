package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.core.Point
import graft.sources.TimeStore

/** Streaming TAIL of the primary store (`TimeStore.tailPoints`) — the
  * read arm of the store's streaming story. Pins the delivery contract
  * the `stream_store_tail` gate builds on: each committed append surfaces
  * in the NEXT tail pass exactly once, a replayed pass on the same
  * checkpoint delivers nothing, and a compaction (generation swap) can
  * never double-feed rewritten copies of rows already delivered. */
class StoreTailSpec extends SparkSpec {

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pts(addrs: Range, t0: Long): Seq[Point] =
    addrs.map(a => Point(a.toLong * 2, t0 + a, a.toLong))

  /** One AvailableNow tail pass; returns the rows it delivered. */
  private def tailPass(n: TimeStore.Namespace, gen: Long, ckpt: String)
      : Seq[(Long, Long)] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = TimeStore.tailPoints(spark, n, generation = Some(gen))
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= b.collect().map(r =>
          (r.getAs[Long]("address"), r.getAs[Long]("time")))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    got.toSeq
  }

  test("tail delivers each committed append exactly once; replay on the " +
      "same checkpoint delivers nothing; compaction never double-feeds; " +
      "unwritten/unregistered namespaces fail loudly") {
    val root = Files.createTempDirectory("graft-tail").toString
    val n = TimeStore.namespace(root, "TAIL")
    intercept[IllegalStateException] { // unregistered: loud
      TimeStore.tailPoints(spark, TimeStore.namespace(root, "NOPE"))
    }
    TimeStore.register(spark, n, 4, 4)
    intercept[IllegalStateException] { // registered but never written: loud
      TimeStore.tailPoints(spark, n)
    }
    import spark.implicits._
    val ckpt = s"$root/ckpt"

    // append 1 → pass delivers exactly those rows
    val a1 = pts(0 until 8, 100L)
    TimeStore.writePoints(spark, n, spark.createDataset(a1))
    val gen = TimeStore.liveGeneration(spark, n).get
    TimeStore.pinGeneration(spark, n, gen)
    val d1 = tailPass(n, gen, ckpt)
    assert(d1.toSet === a1.map(p => (p.address, p.time)).toSet)

    // replay with nothing new: empty
    assert(tailPass(n, gen, ckpt).isEmpty,
      "a pass with no new commits must deliver nothing")

    // append 2 → only the new rows
    val a2 = pts(0 until 8, 200L)
    TimeStore.writePoints(spark, n, spark.createDataset(a2))
    val d2 = tailPass(n, gen, ckpt)
    assert(d2.toSet === a2.map(p => (p.address, p.time)).toSet,
      "the second pass must deliver the second append alone")

    // compact: live moves to a NEW generation; the pinned tail generation
    // is untouched, so the next pass sees no new files — the rewrite can
    // never re-deliver rows the tail already served
    TimeStore.compact(spark, n)
    assert(TimeStore.liveGeneration(spark, n).get === gen + 1)
    assert(tailPass(n, gen, ckpt).isEmpty,
      "a generation swap must not double-feed the tail")

    // an append AFTER the swap lands in the live generation, outside the
    // tailed one — documented invisibility (restart the tail to follow)
    TimeStore.writePoints(spark, n, spark.createDataset(pts(0 until 4, 300L)))
    assert(tailPass(n, gen, ckpt).isEmpty,
      "post-swap appends belong to the new generation, not this tail")

    TimeStore.unpinGeneration(spark, n, gen)
    fs.delete(new Path(root), true)
  }
}
