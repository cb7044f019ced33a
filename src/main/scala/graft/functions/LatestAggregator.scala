package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-facing aggregator surface (SURVEY §2.3 "UDF/UDAF" — the
  * reference's only user-extensible hooks are the `insertWith` merge
  * function and the Store SPI; this is the aggregate-level analog).
  *
  * `Latest` keeps the newest (time, payload) pair per group with unsigned
  * time comparison — usable as a typed `Dataset` aggregate or registered as
  * a SQL UDAF via `functions.udaf`. The buffer is two longs: partial
  * aggregation (map-side combine) works like any built-in. */
object LatestAggregator {

  final case class TimedValue(time: Long, payload: Long)

  val Latest: Aggregator[TimedValue, TimedValue, TimedValue] =
    new Aggregator[TimedValue, TimedValue, TimedValue] {
      private def newer(a: TimedValue, b: TimedValue): TimedValue =
        if (java.lang.Long.compareUnsigned(a.time, b.time) >= 0) a else b
      override def zero: TimedValue = TimedValue(0L, 0L)
      override def reduce(buf: TimedValue, in: TimedValue): TimedValue = newer(buf, in)
      override def merge(a: TimedValue, b: TimedValue): TimedValue = newer(a, b)
      override def finish(r: TimedValue): TimedValue = r
      override def bufferEncoder: Encoder[TimedValue] = Encoders.product[TimedValue]
      override def outputEncoder: Encoder[TimedValue] = Encoders.product[TimedValue]
    }
}
