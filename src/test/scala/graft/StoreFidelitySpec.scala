package graft

import java.nio.file.Files

import org.scalacheck.Gen

import graft.core.{EpochIndex, Point}
import graft.operators.SkewOps
import graft.sources.{PointCodec, TimeStore}

/** Fidelity extras ported from the reference's backend-contract suite
  * (`tests/StoreTests.hs`) and golden byte layouts (`tests/UnitTests.hs`),
  * plus compaction and skew helpers. */
class StoreFidelitySpec extends SparkSpec with PropHelper {

  def freshRoot(): String = Files.createTempDirectory("graft-fid").toString

  test("namespace isolation (StoreTests.hs:106-120)") {
    val root = freshRoot()
    val a = TimeStore.namespace(root, "AAA")
    val b = TimeStore.namespace(root, "BBB")
    TimeStore.register(spark, a, 4, 4)
    TimeStore.register(spark, b, 4, 4)
    TimeStore.writeEncoded(spark, a, PointCodec.encode(Seq(Point(2, 2, 22))))
    TimeStore.writeEncoded(spark, b, PointCodec.encode(Seq(Point(2, 3, 33))))
    val ra = TimeStore.readSimple(spark, a, 0, -1L, Seq(2L)).collect()
    val rb = TimeStore.readSimple(spark, b, 0, -1L, Seq(2L)).collect()
    assert(ra.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((2L, 22L)))
    assert(rb.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((3L, 33L)))
    assert(TimeStore.fetchLatest(spark, a) === ((2L, 0L)))
    assert(TimeStore.fetchLatest(spark, b) === ((3L, 0L)))
  }

  test("golden bucket bytes (UnitTests.hs:214-265): simple buckets s00/s02/s68") {
    val simpleIndex = EpochIndex(Vector((0L, 4), (6L, 10)))
    val pts = Seq(Point(0, 0, 0), Point(2, 2, 0), Point(4, 4, 0), Point(8, 8, 0))
    val grouped = pts.groupBy(p => EpochIndex.locate(simpleIndex, p.time, p.address))
      .view.mapValues(ps => PointCodec.encode(ps)).toMap
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // s00: Point 0 0 0 ++ Point 4 4 0
    assert(grouped((0L, 0)) === (hex("00" * 24) ++
      hex("0400000000000000" + "0400000000000000" + "0000000000000000")))
    // s02: Point 2 2 0
    assert(grouped((0L, 2)) === hex("0200000000000000" + "0200000000000000" + "0000000000000000"))
    // s68: Point 8 8 0
    assert(grouped((6L, 8)) === hex("0800000000000000" + "0800000000000000" + "0000000000000000"))
  }

  test("golden extended bucket bytes (UnitTests.hs:252-265): e00/e02 wire layout") {
    val extendedIndex = EpochIndex(Vector((0L, 3)))
    val pts = Seq(Point(1, 1, 3, "hai".getBytes), Point(1, 2, 5, "there".getBytes),
      Point(3, 1, 4, "pony".getBytes))
    // extended bucket layout = concat of (word64LE len ++ bytes) per point
    def extBytes(ps: Seq[Point]): Array[Byte] = ps.flatMap { p =>
      val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(p.value.length.toLong)
      b.array() ++ p.value
    }.toArray
    val grouped = pts.groupBy(p => EpochIndex.locate(extendedIndex, p.time, p.address))
    val e00 = extBytes(grouped((0L, 0)))
    val e02 = extBytes(grouped((0L, 2)))
    assert(new String(e00.slice(8, 11)) === "hai" && e00(0) === 3.toByte)
    assert(new String(e00.slice(19, 24)) === "there" && e00(11) === 5.toByte)
    assert(new String(e02.slice(8, 12)) === "pony" && e02(0) === 4.toByte)
    assert(e00.length === 24 && e02.length === 12)
  }

  test("compaction merges append files, preserves content") {
    val root = freshRoot()
    val n = TimeStore.namespace(root, "COMPACT")
    TimeStore.register(spark, n, 2, 2)
    // 5 appends -> >=5 files in hot buckets
    (1 to 5).foreach(i =>
      TimeStore.writeEncoded(spark, n, PointCodec.encode(
        Seq(Point(0, i.toLong, i.toLong), Point(2, i.toLong + 100, i.toLong)))))
    def liveFiles(): Long = {
      // livePointsPath carries the Hadoop scheme (file:/...) — resolve via URI
      val p = new org.apache.hadoop.fs.Path(TimeStore.livePointsPath(spark, n).get)
      Files.walk(java.nio.file.Paths.get(p.toUri.getPath))
        .filter(_.toString.endsWith(".parquet")).count()
    }
    val before = TimeStore.readSimple(spark, n, 0, -1L, Seq(0L, 2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val filesBefore = liveFiles()
    TimeStore.compact(spark, n)
    val filesAfter = liveFiles()
    val after = TimeStore.readSimple(spark, n, 0, -1L, Seq(0L, 2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before)
    assert(filesAfter < filesBefore, s"$filesAfter vs $filesBefore")
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf("0.001"))
    val p = Tables.part(spark, sf("0.001"))
    val expected = li.withColumnRenamed("l_partkey", "p_partkey")
      .join(p, Seq("p_partkey")).count()
    val salted = SkewOps.saltedJoin(
      li.withColumnRenamed("l_partkey", "p_partkey"), p,
      "p_partkey", "l_orderkey", salts = 4).count()
    assert(salted === expected)
  }

  // propImmutableStore under random bucket counts + thresholds
  // (FuzzyTests.hs:220-243 varies both; the earlier spec fixed them)
  test("property: random bucket counts and rollover thresholds preserve reads") {
    val gen = for {
      sb <- Gen.chooseNum(1, 8); eb <- Gen.chooseNum(1, 8)
      thr <- Gen.oneOf(0L, 64L, 1L << 20)
      pts <- Gen.resize(16, Gen.nonEmptyListOf(for {
        a <- Gen.chooseNum(0L, 32L); t <- Gen.chooseNum(0L, 50L)
      } yield Point(a & ~1L, t, 1L)))
    } yield (sb, eb, thr, pts)
    forAllSampled(gen, n = 4) { case (sb, eb, thr, pts) =>
      val n = TimeStore.namespace(freshRoot(), "RAND")
      TimeStore.register(spark, n, sb, eb)
      TimeStore.writeEncoded(spark, n, PointCodec.encode(pts), rolloverBytes = thr)
      val got = TimeStore.readSimple(spark, n, 0, -1L, pts.map(_.address).distinct)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pts.map(p => (p.address, p.time)).toSet === got)
    }
  }
}
