package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.core.{EpochIndex, Point}
import graft.sources.PointCodec

/** Golden + property tests for the wire codec and index, ported from the
  * reference's `tests/UnitTests.hs` / `tests/FuzzyTests.hs` fixtures. */
class CodecSpec extends AnyFunSuite with PropHelper {

  // UnitTests.hs:299-333 fixtures
  val simplePoints = Seq(
    Point(0, 0, 0), Point(2, 2, 0), Point(4, 4, 0), Point(8, 8, 0))
  val extendedPoints = Seq(
    Point(1, 1, 3, "hai".getBytes), Point(1, 2, 5, "there".getBytes),
    Point(3, 1, 4, "pony".getBytes))
  val simpleIndex = EpochIndex(Vector((0L, 4), (6L, 10)))
  val extendedIndex = EpochIndex(Vector((0L, 3)))

  test("encode simple points matches 24-byte LE layout (Core.hs:260-270)") {
    val bytes = PointCodec.encode(Seq(Point(4, 4, 0)))
    assert(bytes.length === 24)
    assert(bytes(0) === 4.toByte && bytes(8) === 4.toByte)
    assert(bytes.drop(1).take(7).forall(_ == 0) && bytes.drop(16).forall(_ == 0))
  }

  test("encode extended appends blob after header (Algorithms.hs:135-160)") {
    val bytes = PointCodec.encode(Seq(Point(1, 1, 3, "hai".getBytes)))
    assert(bytes.length === 27)
    assert(bytes(16) === 3.toByte)  // payload = length
    assert(new String(bytes.drop(24)) === "hai")
  }

  test("decode mixed blob recovers both kinds") {
    val blob = PointCodec.encode(simplePoints ++ extendedPoints)
    assert(PointCodec.decode(blob) === Right((simplePoints ++ extendedPoints).toVector))
  }

  test("decode rejects truncated input (InvalidPayload, Core.hs:278-287)") {
    val blob = PointCodec.encode(simplePoints)
    assert(PointCodec.decode(blob.dropRight(1)).isLeft)
    val ext = PointCodec.encode(extendedPoints)
    assert(PointCodec.decode(ext.dropRight(1)).isLeft)
  }

  test("routing groups simple points like groupMixed (UnitTests.hs:189-209)") {
    // expected: (0,0)->[0@0, 4@4], (0,2)->[2@2], (6,8)->[8@8]; latest 8
    val routed = simplePoints.groupBy(p =>
      EpochIndex.locate(simpleIndex, p.time, p.address))
    assert(routed === Map(
      (0L, 0) -> Seq(Point(0, 0, 0), Point(4, 4, 0)),
      (0L, 2) -> Seq(Point(2, 2, 0)),
      (6L, 8) -> Seq(Point(8, 8, 0))))
  }

  test("routing groups extended points like groupMixed (UnitTests.hs:271-297)") {
    // expected extended buckets: (0,0)->{hai,there}, (0,2)->{pony}; latest 2
    val routed = extendedPoints.groupBy(p =>
      EpochIndex.locate(extendedIndex, p.time, p.address))
    assert(routed.keySet === Set((0L, 0), (0L, 2)))
    assert(routed((0L, 0)).map(p => new String(p.value)) === Seq("hai", "there"))
    assert(routed((0L, 2)).map(p => new String(p.value)) === Seq("pony"))
  }

  test("index floor semantics incl. boundary + leftmost (Index.hs:76-88)") {
    val idx = EpochIndex(Vector((0L, 4), (6L, 10)))
    assert(idx.epochFor(0L) === ((0L, 4)))   // leftmost exact match
    assert(idx.epochFor(5L) === ((0L, 4)))
    assert(idx.epochFor(6L) === ((0L, 4)))   // boundary stays in older epoch
    assert(idx.epochFor(7L) === ((6L, 10)))
    assert(idx.epochFor(-1L) === ((6L, 10))) // unsigned maxBound
  }

  test("placeBucket clears bit 0 and mods unsigned (Core.hs:272-276)") {
    assert(EpochIndex.placeBucket(4, 5L) === 0)   // 5 &~1 = 4; 4 % 4
    assert(EpochIndex.placeBucket(10, 14L) === 4) // UnitTests "mod 10"
    // top-bit-set address: unsigned semantics (no negative bucket)
    val b = EpochIndex.placeBucket(7, Long.MinValue)
    assert(b >= 0 && b < 7)
    assert(b === java.lang.Long.remainderUnsigned(Long.MinValue & ~1L, 7L).toInt)
  }

  // FuzzyTests.hs:78-91 generators
  val genSimple: Gen[Point] = for {
    a <- Gen.chooseNum(0L, 1000L); t <- Gen.chooseNum(0L, 1000L)
    p <- Gen.long
  } yield Point(a & ~1L, t, p)
  val genExtended: Gen[Point] = for {
    a <- Gen.chooseNum(0L, 1000L); t <- Gen.chooseNum(0L, 1000L)
    n <- Gen.chooseNum(0, 255); bytes <- Gen.listOfN(n, Gen.choose[Byte](-128, 127))
  } yield Point(a | 1L, t, n.toLong, bytes.toArray)
  val genMixed: Gen[List[Point]] = Gen.listOf(Gen.oneOf(genSimple, genExtended))

  test("codec round-trips arbitrary mixed blobs (FuzzyTests.hs:56-67)") {
    forAllSampled(genMixed) { ps =>
      assert(PointCodec.decode(PointCodec.encode(ps)) === Right(ps.toVector))
    }
  }

  test("grouping invariant e_max <= s_max shape (FuzzyTests.hs:245-253)") {
    // In the unified design every extended point is also visible to the
    // simple-side watermark via its header; assert the adapted invariant:
    // the extended max never exceeds the overall max.
    forAllSampled(genMixed) { ps =>
      val sMax = ps.map(_.time).maxOption.getOrElse(0L)
      val eMax = ps.filter(_.isExtended).map(_.time).maxOption.getOrElse(0L)
      assert(java.lang.Long.compareUnsigned(eMax, sMax) <= 0)
    }
  }
}
