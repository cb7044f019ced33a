package graft.core

import org.apache.spark.sql.types._

/** The engine's sole record type — the reference's 24-byte `Point`
  * (`lib/TimeStore/Core.hs:245-270`) in unified-table form.
  *
  * `address` bit 0 clear ⇒ simple: `payload` is the opaque 8-byte value and
  * `value` is null. Bit 0 set ⇒ extended: `value` holds the variable-length
  * blob and `payload` its byte length (`lib/TimeStore/Algorithms.hs:133-167`).
  * The reference's pointer/offset machinery is a storage detail Parquet's
  * native variable-length BINARY makes unnecessary (SURVEY §1.6).
  *
  * Both `address` and `time` carry unsigned Word64 semantics in a signed
  * Long: comparisons that must be unsigned go through
  * `java.lang.Long.compareUnsigned`/`remainderUnsigned`, and the reference's
  * `maxBound :: Word64` sentinel maps to `-1L` (all bits set) — see
  * [[graft.functions.UnsignedMod]] and [[EpochIndex]].
  */
final case class Point(address: Long, time: Long, payload: Long,
                       value: Array[Byte] = null) {
  def isExtended: Boolean = (address & 1L) == 1L

  // Array[Byte] is reference-equal by default; golden tests need value equality.
  override def equals(o: Any): Boolean = o match {
    case Point(a, t, p, v) =>
      a == address && t == time && p == payload &&
        java.util.Arrays.equals(v, value)
    case _ => false
  }
  override def hashCode: Int =
    (address, time, payload, java.util.Arrays.hashCode(value)).hashCode
}

object Point {
  /** Points compare time-first, then address (`Core.hs:252-258`) — the sort
    * order adjacent-deduplication relies on. Unsigned on both fields. */
  implicit val ordering: Ordering[Point] = (x: Point, y: Point) => {
    val c = java.lang.Long.compareUnsigned(x.time, y.time)
    if (c != 0) c else java.lang.Long.compareUnsigned(x.address, y.address)
  }

  val schema: StructType = StructType(Seq(
    StructField("address", LongType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("payload", LongType, nullable = false),
    StructField("value", BinaryType, nullable = true)))
}
