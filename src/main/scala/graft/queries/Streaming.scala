package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.StreamingIngest

/** Declared queries that run THROUGH Structured Streaming — a real
  * streaming execution (file source → watermark → stateful aggregation →
  * append-mode sink), not a batch plan that merely shares the operators.
  * The DuckDB twin reproduces the append-mode emission rule from first
  * principles, so the driver's gate hash-checks the streaming engine's
  * watermark semantics against an independent implementation.
  */
object Streaming {

  /** Tumbling event counts driven through a streaming execution with
    * `Trigger.AvailableNow` (the bounded-replay form of a continuous
    * ingest — the reference's whole store IS such a replayable event log,
    * `TimeStore.hs:98-137`). Append mode emits exactly the windows whose
    * END has passed the final watermark; Spark tracks event time in
    * MILLISECONDS (floor of the µs time) and the watermark is
    * `max_event_ms − delay_ms`, so the twin applies the same integer rule.
    * The last hour(s) of the fixture stay in (discarded) state — that
    * withholding is the semantics under test; `agg_events_tumbling` is the
    * complete-data batch twin of the same aggregation. */
  def streamEventsTumbling(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-replay")
    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    val batchSchema = Tables.events(s, dir).schema // also applies tune()
    // the file stream source requires a DIRECTORY; select just the events
    // fixture out of it by name
    val src = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val q = StreamingIngest.windowedCounts(src, "ts", watermarkDelay = "1 hour")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read
      .schema("window_start TIMESTAMP, event_type STRING, " +
        "n_events BIGINT, sum_value DECIMAL(28,2)")
      .parquet(out)
      .select((unix_micros(col("window_start")) * 1000L).as("hour_ns"),
        col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("hour_ns"), col("event_type"))
  }

  /** Twin: hourly buckets whose end (in ms) is at or before the final
    * watermark — max event time floored to ms minus the 1 h delay. All
    * integer arithmetic; DuckDB's `ts` is the µs truncation of the same
    * nanosecond instants Spark reads (both floor to ms identically). */
  val streamEventsTumblingSql: String =
    """WITH wm AS (
      |  SELECT epoch_us(MAX(ts)) // 1000 - 3600000 AS wm_ms FROM events)
      |SELECT epoch_ns(date_trunc('hour', ts)) AS hour_ns, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events, wm
      |WHERE epoch_us(date_trunc('hour', ts)) // 1000 + 3600000 <= wm_ms
      |GROUP BY 1, 2 ORDER BY hour_ns, event_type""".stripMargin

  /** Watermark-bounded streaming dedup driven through a real execution —
    * the exactly-once ingest shape ([[StreamingIngest.dedupStream]]):
    * events stream through `dropDuplicatesWithinWatermark` on
    * (user_id, ts) and land in an append sink; the read-back audits
    * distinct event counts per user. Dedup emits each first occurrence
    * immediately (no watermark withholding in the OUTPUT — the watermark
    * only bounds state), so with the whole fixture replayed the surviving
    * set is exactly the batch distinct, which is what the twin computes.
    * Only key columns are emitted: which duplicate ROW survives is
    * engine-internal, the surviving key set is the contract. */
  def streamDedupEvents(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-dedup")
    val out = s"$tmp/out"
    val batchSchema = Tables.events(s, dir).schema
    val src = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      // µs-truncate the dedup key up front (integer ops) so the Spark-side
      // distinct-ns set IS the distinct-µs set the DuckDB twin sees —
      // semantic equality by construction, not fixture luck
      .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
    val q = StreamingIngest.dedupStream(src, Seq("user_id"), "ts",
        watermarkDelay = "1 hour")
      .select(col("user_id"), col("ts"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.schema("user_id BIGINT, ts BIGINT").parquet(out)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_distinct_events"),
        min(col("ts")).as("first_ts_us_ns"))
      .orderBy(col("user_id"))
  }

  /** Twin: batch distinct over the same keys — the Spark side µs-truncates
    * its dedup key up front, and DuckDB's `ts` IS the µs truncation of the
    * same instants, so both engines count the identical distinct set. */
  val streamDedupEventsSql: String =
    """SELECT user_id, COUNT(DISTINCT epoch_us(ts)) AS n_distinct_events,
      |  MIN(epoch_us(ts)) * 1000 AS first_ts_us_ns
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_events_tumbling" -> streamEventsTumbling,
    "stream_dedup_events" -> streamDedupEvents)

  def oracleSql: Map[String, String] = Map(
    "stream_events_tumbling" -> streamEventsTumblingSql,
    "stream_dedup_events" -> streamDedupEventsSql)
}
