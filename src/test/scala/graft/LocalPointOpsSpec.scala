package graft

import java.nio.file.Files

import graft.core.Point
import graft.sources.{MutableKV, TimeStore}

/** Driver-local point-op parity: the single-object read/append twins
  * ([[TimeStore.readSimpleLocal]]/[[TimeStore.readExtendedLocal]]/
  * [[TimeStore.writePointsLocal]] — the reference's one-rados-object cost
  * model for `Mutable.lookup`/`insertWith`, `Mutable.hs:48-103`) must be
  * interchangeable per-call with the distributed path on the same
  * namespace: same layout, same pinned dedup winner, same unsigned order,
  * same lease fence. */
class LocalPointOpsSpec extends SparkSpec {

  def freshNs(): TimeStore.Namespace =
    TimeStore.namespace(Files.createTempDirectory("graft-local").toString, "LOCAL")

  def ds(ps: Point*): org.apache.spark.sql.Dataset[Point] = {
    import spark.implicits._
    spark.createDataset(ps)
  }

  private def collectSimple(n: TimeStore.Namespace, start: Long, end: Long,
                            addrs: Seq[Long]): Seq[Point] =
    TimeStore.readSimple(spark, n, start, end, addrs).collect().toSeq
      .map(r => Point(r.getLong(0), r.getLong(1), r.getLong(2)))

  private def collectExtended(n: TimeStore.Namespace, start: Long, end: Long,
                              addrs: Seq[Long]): Seq[Point] =
    TimeStore.readExtended(spark, n, start, end, addrs).collect().toSeq
      .map(r => Point(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Array[Byte]](3)))

  test("local and distributed paths are interchangeable on one namespace") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    // batch 1 through the DISTRIBUTED writer: simple + extended points,
    // including one side of a duplicate (address, time) pair and a point
    // past 2^63 (unsigned-time corner)
    TimeStore.writePoints(spark, n, ds(
      Point(2L, 10L, 100L),
      Point(4L, 10L, 7L),          // dup pair, payload 7 — loses to 3 below
      Point(6L, -5L, 1L),          // time >= 2^63
      Point(3L, 20L, 2L, Array[Byte](1, 2)),
      Point(5L, 20L, 2L, Array[Byte](9))))  // dup (5,20) vs local batch
    // batch 2 through the LOCAL writer: the other duplicate halves + more
    TimeStore.writePointsLocal(spark, n, Seq(
      Point(4L, 10L, 3L),          // pinned winner: smaller unsigned payload
      Point(2L, 30L, 200L),
      Point(5L, 20L, 2L, Array[Byte](1)),  // same payload, smaller value wins
      Point(7L, -3L, 2L, Array[Byte](4, 4))))
    val addrsS = Seq(2L, 4L, 6L)
    val addrsE = Seq(3L, 5L, 7L)
    // full unsigned range [0, maxBound]
    val simpleDist = collectSimple(n, 0L, -1L, addrsS)
    val simpleLocal = TimeStore.readSimpleLocal(spark, n, 0L, -1L, addrsS)
    assert(simpleLocal === simpleDist)
    assert(simpleDist.map(p => (p.address, p.time, p.payload)) ===
      Seq((2L, 10L, 100L), (4L, 10L, 3L), (2L, 30L, 200L), (6L, -5L, 1L)))
    val extDist = collectExtended(n, 0L, -1L, addrsE)
    val extLocal = TimeStore.readExtendedLocal(spark, n, 0L, -1L, addrsE)
    assert(extLocal === extDist)
    assert(extDist.find(p => p.address == 5L).get.value === Array[Byte](1))
    // a bounded unsigned sub-range prunes identically on both paths
    val subDist = collectSimple(n, 15L, -4L, addrsS)
    assert(TimeStore.readSimpleLocal(spark, n, 15L, -4L, addrsS) === subDist)
    assert(subDist.map(_.address) === Seq(2L, 6L))
  }

  test("local write honors the writer fence") {
    val n = freshNs()
    TimeStore.register(spark, n, 4, 4)
    TimeStore.withWriterLease(spark, n) {
      intercept[TimeStore.LeaseContentionException] {
        TimeStore.writePointsLocal(spark, n, Seq(Point(2L, 10L, 1L)))
      }
    }
    // released -> succeeds, and the distributed reader sees it
    TimeStore.writePointsLocal(spark, n, Seq(Point(2L, 10L, 1L)))
    assert(collectSimple(n, 0L, -1L, Seq(2L)) === Seq(Point(2L, 10L, 1L)))
  }

  test("local write routes against the rolled index like the distributed writer") {
    val n = freshNs()
    TimeStore.register(spark, n, 2, 2)
    // force a rollover through the distributed path (tiny threshold)
    TimeStore.writePoints(spark, n, ds(
      Point(2L, 10L, 1L), Point(4L, 20L, 2L)), rolloverBytes = 1L)
    val rolled = TimeStore.fetchIndex(spark, n, "simple").get
    assert(rolled.entries.length === 2)
    // a local append after the roll must land in the NEW epoch
    TimeStore.writePointsLocal(spark, n, Seq(Point(2L, 30L, 3L)))
    val (epoch, _) = graft.core.EpochIndex.locate(rolled, 30L, 2L)
    assert(epoch === rolled.entries.last._1)
    assert(collectSimple(n, 0L, -1L, Seq(2L, 4L)).map(_.payload) ===
      Seq(1L, 2L, 3L))
    assert(TimeStore.readSimpleLocal(spark, n, 0L, -1L, Seq(2L, 4L)) ===
      collectSimple(n, 0L, -1L, Seq(2L, 4L)))
  }

  test("mutable KV protocol is unchanged on the local fast path") {
    val root = Files.createTempDirectory("graft-local-kv").toString
    val n = TimeStore.namespace(root, "KV")
    val merge = (nw: Array[Byte], prev: Array[Byte]) =>
      prev ++ ",".getBytes("UTF-8") ++ nw
    MutableKV.insertWith(spark, n, merge, 10L, "a".getBytes("UTF-8"))
    MutableKV.insertWith(spark, n, merge, 10L, "b".getBytes("UTF-8"))
    MutableKV.insertWith(spark, n, merge, 10L, "c".getBytes("UTF-8"))
    assert(new String(MutableKV.lookup(spark, n, 10L).get, "UTF-8") === "a,b,c")
    MutableKV.insert(spark, n, 12L, "x".getBytes("UTF-8"))
    val rows = MutableKV.enumerate(spark, n).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1),
      new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSeq ===
      Seq((11L, 3L, "a,b,c"), (13L, 1L, "x")))
  }
}
