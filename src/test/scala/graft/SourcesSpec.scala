package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth (SURVEY §2.3 "scans/sources/sinks"): the
  * engine's tables round-trip through CSV, JSON, and ORC — not just the
  * Parquet the store uses natively. Schema fidelity rules per format:
  * ORC is self-describing (types survive as written, including BINARY);
  * CSV and JSON get the explicit schema on read (the production pattern —
  * schema inference is a scan of its own and type-lossy). */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // deterministic, binary-free projection of the events fixture
  private def sample() =
    Tables.events(spark, sf("0.001"))
      .select(col("event_id"), col("user_id"), col("ts").as("ts_ns"),
        col("event_type"), col("value").cast("decimal(18,2)").as("value"))

  private def key(r: org.apache.spark.sql.Row): (Long, Long, Long, String, String) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      Option(r.getDecimal(4)).map(_.toPlainString).orNull)

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts_ns", LongType), StructField("event_type", StringType),
    StructField("value", DecimalType(18, 2))))

  test("CSV round-trip preserves every row under an explicit schema") {
    val dir = tmp("graft-csv")
    val src = sample()
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.schema === schema)
    assert(back.collect().map(key).sorted.toSeq ===
      src.collect().map(key).sorted.toSeq)
  }

  test("JSON round-trip preserves every row under an explicit schema") {
    val dir = tmp("graft-json")
    val src = sample()
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.collect().map(key).sorted.toSeq ===
      src.collect().map(key).sorted.toSeq)
  }

  test("ORC round-trips the unified points table including BINARY payloads") {
    val dir = tmp("graft-orc")
    import spark.implicits._
    val pts = Seq(
      (2L, 10L, 8L, null.asInstanceOf[Array[Byte]]),
      (3L, 11L, 3L, "hai".getBytes("UTF-8")),
      (3L, 12L, 5L, "there".getBytes("UTF-8")))
      .toDF("address", "time", "payload", "value")
    pts.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema("value").dataType === BinaryType)
    val got = back.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Array[Byte]](3)).map(new String(_, "UTF-8")).orNull))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq((2L, 10L, 8L, null), (3L, 11L, 3L, "hai"),
      (3L, 12L, 5L, "there")))
  }
}
