package graft

import java.nio.file.Files

import org.scalacheck.Gen

import graft.core.Point
import graft.sources.{MutableKV, PointCodec, TimeStore}

/** End-to-end store tests ported from the reference's `tests/UnitTests.hs`
  * (golden write-then-read, rollover layout, corner cases) and
  * `tests/FuzzyTests.hs` (round-trip properties). */
class TimeStoreSpec extends SparkSpec with PropHelper {

  def freshRoot(): String =
    Files.createTempDirectory("graft-ts").toString

  def ns(root: String) = TimeStore.namespace(root, "PONIES")

  val simplePoints = Seq(
    Point(0, 0, 0), Point(2, 2, 0), Point(4, 4, 0), Point(8, 8, 0))
  val extraSimples = Seq(
    Point(0, 10, 0), Point(4, 20, 0), Point(14, 18, 0), Point(6, 15, 0))
  val extendedPoints = Seq(
    Point(1, 1, 3, "hai".getBytes), Point(1, 2, 5, "there".getBytes),
    Point(3, 1, 4, "pony".getBytes))

  def collectSimple(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("namespace validation rejects empty and underscore (Core.hs:226-230)") {
    intercept[IllegalArgumentException](TimeStore.namespace("/tmp", ""))
    intercept[IllegalArgumentException](TimeStore.namespace("/tmp", "a_b"))
  }

  test("register writes both index seeds (UnitTests.hs:140-147)") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 10, 20)
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries === Vector((0L, 10)))
    assert(TimeStore.fetchIndex(spark, n, "extended").get.entries === Vector((0L, 20)))
    // idempotent
    TimeStore.register(spark, n, 99, 99)
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries === Vector((0L, 10)))
  }

  test("readSimple golden (UnitTests.hs:93-114) with rollover threshold 0") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 10, 20)
    TimeStore.writeEncoded(spark, n, PointCodec.encode(simplePoints), rolloverBytes = 0)
    TimeStore.writeEncoded(spark, n, PointCodec.encode(extraSimples), rolloverBytes = 0)

    assert(collectSimple(TimeStore.readSimple(spark, n, 0, 21, Nil)) === Nil)
    assert(collectSimple(TimeStore.readSimple(spark, n, 0, 21, Seq(2L))) ===
      Seq((2L, 2L, 0L)))
    // same multiset as the reference's chunked result, globally time-sorted
    assert(collectSimple(TimeStore.readSimple(spark, n, 0, 21, Seq(14L, 4L, 6L, 8L))) ===
      Seq((4L, 4L, 0L), (8L, 8L, 0L), (6L, 15L, 0L), (14L, 18L, 0L), (4L, 20L, 0L)))
    // inclusive bounds: start=4, end=18
    assert(collectSimple(TimeStore.readSimple(spark, n, 4, 18, Seq(14L, 4L, 6L, 8L))) ===
      Seq((4L, 4L, 0L), (8L, 8L, 0L), (6L, 15L, 0L), (14L, 18L, 0L)))
  }

  test("rollover appends index entries at latest time (UnitTests.hs:179-185)") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 10, 20)
    TimeStore.writeEncoded(spark, n, PointCodec.encode(simplePoints), rolloverBytes = 0)
    // after first write: latest simple = 8, so entry (8, 10) appended
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries ===
      Vector((0L, 10), (8L, 10)))
    TimeStore.writeEncoded(spark, n, PointCodec.encode(extraSimples), rolloverBytes = 0)
    assert(TimeStore.fetchIndex(spark, n, "simple").get.entries ===
      Vector((0L, 10), (8L, 10), (20L, 10)))
    assert(TimeStore.fetchLatest(spark, n) === ((20L, 0L)))
    // extended side untouched: no extended writes
    assert(TimeStore.fetchIndex(spark, n, "extended").get.entries === Vector((0L, 20)))
  }

  test("readExtended golden (UnitTests.hs:116-134)") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 5, 10)
    TimeStore.writeEncoded(spark, n, PointCodec.encode(extendedPoints))

    assert(TimeStore.readExtended(spark, n, 0, 21, Nil).count() === 0)
    val one = TimeStore.readExtended(spark, n, 0, 21, Seq(1L)).collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]]("value")))).toSeq ===
      Seq((1L, 1L, "hai"), (1L, 2L, "there")))
    val two = TimeStore.readExtended(spark, n, 0, 21, Seq(1L, 3L)).collect()
    assert(two.map(r => (r.getLong(0), r.getLong(1), new String(r.getAs[Array[Byte]]("value")))).toSeq ===
      Seq((1L, 1L, "hai"), (3L, 1L, "pony"), (1L, 2L, "there")))
  }

  test("ext write after simple rollover (UnitTests.hs:62-73)") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 4, 5)
    TimeStore.writeEncoded(spark, n, PointCodec.encode(Seq(Point(6, 6, 3))), rolloverBytes = 0)
    val eWrite = Seq(Point(7, 7, 5, "yayyy".getBytes))
    TimeStore.writeEncoded(spark, n, PointCodec.encode(eWrite), rolloverBytes = 0)
    val got = TimeStore.readExtended(spark, n, 0, -1L, Seq(7L)).collect()
    assert(got.length === 1)
    assert(new String(got.head.getAs[Array[Byte]]("value")) === "yayyy")
  }

  test("mutable overwrite/lookup/enumerate (UnitTests.hs:75-88)") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 3, 2)
    assert(MutableKV.lookup(spark, n, 0L) === None)
    MutableKV.insert(spark, n, 0L, "Hi.".getBytes)
    MutableKV.insert(spark, n, 0L, "I'm a duck".getBytes)
    assert(MutableKV.lookup(spark, n, 0L).map(new String(_)) === Some("I'm a duck"))
    val all = MutableKV.enumerate(spark, n).collect()
    assert(all.length === 1)
    assert(all.head.getLong(0) === 1L)  // address forced odd
    assert(all.head.getLong(1) === 2L)  // two inserts -> seq 2
    assert(new String(all.head.getAs[Array[Byte]]("value")) === "I'm a duck")
  }

  test("insertWith merges with existing value (Mutable.hs:75-103)") {
    val n = ns(freshRoot())
    TimeStore.register(spark, n, 3, 2)
    MutableKV.insert(spark, n, 4L, "a".getBytes)
    val merged = MutableKV.insertWith(spark, n,
      (nw, old) => old ++ nw, 4L, "b".getBytes)
    assert(new String(merged) === "ab")
    assert(MutableKV.lookup(spark, n, 4L).map(new String(_)) === Some("ab"))
  }

  // propImmutableStore (FuzzyTests.hs:150-200): every written point is
  // findable by a full-range read at its address.
  test("property: all written points readable at their address") {
    val genPoints: Gen[List[Point]] = Gen.resize(24, Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 64L); t <- Gen.chooseNum(0L, 100L)
      ext <- Gen.oneOf(true, false)
      n <- Gen.chooseNum(0, 16)
      bytes <- Gen.listOfN(n, Gen.choose[Byte](-128, 127))
    } yield if (ext) Point(a | 1L, t, n.toLong, bytes.toArray)
            else Point(a & ~1L, t, 7L)))
    forAllSampled(genPoints, n = 5) { ps =>
      val n = ns(freshRoot())
      TimeStore.register(spark, n, 4, 4)
      // two chunked writes with a tiny rollover threshold
      val (c1, c2) = ps.splitAt(ps.length / 2)
      Seq(c1, c2).filter(_.nonEmpty).foreach(c =>
        TimeStore.writeEncoded(spark, n, PointCodec.encode(c), rolloverBytes = 64))
      val simple = ps.filter(!_.isExtended)
      val ext = ps.filter(_.isExtended)
      if (simple.nonEmpty) {
        val got = collectSimple(TimeStore.readSimple(spark, n, 0, -1L,
          simple.map(_.address).distinct))
        // first-wins dedup on (addr,time): compare the deduped key sets
        assert(simple.map(p => (p.address, p.time)).toSet
          .subsetOf(got.map(r => (r._1, r._2)).toSet))
      }
      if (ext.nonEmpty) {
        val got = TimeStore.readExtended(spark, n, 0, -1L,
          ext.map(_.address).distinct).collect()
        assert(ext.map(p => (p.address, p.time)).toSet
          .subsetOf(got.map(r => (r.getLong(0), r.getLong(1))).toSet))
      }
    }
  }

  // propMutableStore (FuzzyTests.hs:122-147): last insert per key wins.
  test("property: mutable lookup returns last insert per key") {
    val genOps: Gen[List[(Long, String)]] = Gen.resize(8, Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(0L, 6L)
      v <- Gen.alphaStr.map(_.take(8))
    } yield (k, v)))
    forAllSampled(genOps, n = 3) { ops =>
      val n = ns(freshRoot())
      TimeStore.register(spark, n, 3, 2)
      ops.foreach { case (k, v) => MutableKV.insert(spark, n, k, v.getBytes) }
      // addresses are forced odd (Mutable.hs:95), so keys alias on k|1 —
      // the reference's generator does the same (FuzzyTests.hs:139).
      val expected = ops.groupBy(_._1 | 1L).view.mapValues(_.last._2).toMap
      expected.foreach { case (k, v) =>
        assert(MutableKV.lookup(spark, n, k).map(new String(_)) === Some(v),
          s"key $k")
      }
    }
  }
}
