package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.core.Point
import graft.sources.TimeStore

/** Structured Streaming ingest — the streaming form of the reference's
  * `writeEncoded` protocol (`TimeStore.hs:98-137`), with the semantics
  * SURVEY §2.3 requires:
  *
  *  - **late data is always accepted**: a point whose time falls in an old
  *    epoch routes to that epoch's buckets (`Index.hs:76-88`) — routing
  *    happens per micro-batch against the current index, so out-of-order
  *    points land exactly where the batch path would put them;
  *  - **latest files are the watermark**: `TimeStore.writePoints` advances
  *    the per-kind monotonic max inside each `foreachBatch` transaction
  *    (`StoreHelpers.hs:227-265`);
  *  - **rollover only on the latest epoch** — unchanged from the batch path;
  *  - the reference's inter-daemon locks become the single-streaming-writer
  *    + idempotent-by-checkpoint discipline of `foreachBatch`.
  *
  * Scale notes: each micro-batch is one partitioned append (shuffle on
  * (kind, epoch, bucket) only); state on the driver is the tiny index. For
  * multi-TB/day streams, raise the trigger interval so batches amortize
  * file-commit overhead, and let AQE size the shuffle.
  */
object StreamingIngest {

  /** Start a streaming writer pumping a point stream into a namespace. */
  def start(spark: SparkSession, n: TimeStore.Namespace, points: Dataset[Point],
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second"),
            rolloverBytes: Long = TimeStore.DefaultRolloverBytes): StreamingQuery =
    points.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Point], _: Long) =>
        TimeStore.writePoints(spark, n, batch, rolloverBytes)
      }
      .start()

  /** Unsigned lexicographic byte comparison (null first) — the streaming
    * mirror of Spark's BinaryType ordering, for pinning tie winners. */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int =
    if (a eq b) 0
    else if (a == null) -1
    else if (b == null) 1
    else {
      var i = 0
      var r = 0
      val n = math.min(a.length, b.length)
      while (r == 0 && i < n) {
        r = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        i += 1
      }
      if (r != 0) r else java.lang.Integer.compare(a.length, b.length)
    }

  /** Stateful latest-per-key over a point stream — the reference's
    * latest-value materialization (`latestUniques` / the latest files) as
    * live streaming state via `mapGroupsWithState`: per address, the state
    * is the newest point seen (unsigned time comparison); each micro-batch
    * emits the refreshed value per touched key.
    *
    * Equal-time ties pin to the smallest unsigned (payload, value) — the
    * SAME winner as the batch read path's first-wins dedup and
    * `latestPerAddress`, so streaming state and a batch read can never
    * disagree. Iterator arrival order (shuffle-dependent, replay-variant)
    * must never decide (the determinism rule every other stateful op here
    * follows).
    *
    * State size is one point per address — bounded by key cardinality, the
    * same footprint the reference's mutable view carries. */
  def statefulLatest(points: Dataset[Point]): Dataset[Point] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.address)
      .mapGroupsWithState[Point, Point](GroupStateTimeout.NoTimeout) {
        (_: Long, in: Iterator[Point], state: GroupState[Point]) =>
          val newest = (state.getOption.iterator ++ in).reduceLeft { (a, b) =>
            val ct = java.lang.Long.compareUnsigned(b.time, a.time)
            if (ct > 0) b
            else if (ct < 0) a
            else {
              val cp = java.lang.Long.compareUnsigned(b.payload, a.payload)
              if (cp < 0 || (cp == 0 && cmpBytes(b.value, a.value) < 0)) b
              else a
            }
          }
          state.update(newest)
          newest
      }
  }

  /** Event-time sessionization with a watermark — the streaming twin of the
    * batch `Windows.winSessionize` (gaps-and-islands): `session_window`
    * merges events closer than `gap` into one session per user, state
    * expires once the watermark passes a session's close. Emits one row per
    * closed-or-updated session per micro-batch. */
  def sessionCounts(events: DataFrame, tsNsCol: String,
                    gap: String = "30 minutes",
                    watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr(s"`$tsNsCol` div 1000")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream interval join: each purchase matched to same-user
    * signups at or before it within `within` — the streaming attribution
    * join. Both sides carry watermarks and the join condition bounds the
    * time skew, so Spark can expire join state on both sides (unbounded
    * state otherwise — the classic stream-stream join pitfall). */
  def attributionJoin(purchases: DataFrame, signups: DataFrame,
                      tsNsCol: String, within: String = "1 hour",
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    def prep(df: DataFrame, side: String) = df
      .withColumn(s"${side}_time",
        timestamp_micros(expr(s"`$tsNsCol` div 1000")))
      .withWatermark(s"${side}_time", watermarkDelay)
      .withColumnRenamed("user_id", s"${side}_user")
    val p = prep(purchases, "p")
    val sg = prep(signups, "s")
    p.join(sg,
      expr(s"""p_user = s_user AND s_time <= p_time AND
               p_time <= s_time + interval $within"""))
      .select(col("p_user").as("user_id"), col("p_time").as("purchase_time"),
        col("s_time").as("signup_time"))
  }

  /** Streaming dedup with BOUNDED state — the streaming form of the store's
    * first-wins (address, time) dedup (`deDuplicate`,
    * `Algorithms.hs:273-298`): the first arrival of a key wins, replays and
    * cross-batch duplicates within the watermark horizon are dropped, and —
    * the part that matters at 100 TB — `dropDuplicatesWithinWatermark`
    * expires each key's state once the watermark passes it, so dedup state
    * is bounded by the delay window instead of growing with the stream's
    * lifetime key cardinality (plain streaming `dropDuplicates` never
    * evicts). `tsNsCol` is an epoch-ns Long column.
    *
    * The raw ns column is always part of the dedup key: `event_time` is
    * µs-truncated (TimestampType's resolution), so keying on it alone would
    * collapse distinct events within the same microsecond — the batch-side
    * `deDuplicate` twin keys on exact ns time. Integer `div` (not `/`,
    * which promotes to Double and rounds ~256ns at epoch-ns magnitudes)
    * derives the watermark column. */
  def dedupStream(points: DataFrame, keyCols: Seq[String], tsNsCol: String,
                  watermarkDelay: String = "10 minutes"): DataFrame = {
    val ks = (keyCols :+ tsNsCol).distinct :+ "event_time"
    points
      .withColumn("event_time", timestamp_micros(expr(s"`$tsNsCol` div 1000")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark(ks.head, ks.tail: _*)
      .drop("event_time")
  }

  /** Input/state/output records for [[anomalyStream]]. State is Welford
    * form: running mean and centered second moment M2 = Σ(v−mean)². */
  case class KeyedValue(key: Long, ts: Long, value: Double)
  case class Moments(n: Long, mean: Double, m2: Double)
  case class Outlier(key: Long, ts: Long, value: Double, z: Double)

  /** ONLINE z-score anomaly detection — the streaming sibling of the batch
    * `ts_anomaly` query, with the semantics a live monitor actually wants:
    * each event is scored against the statistics of everything seen BEFORE
    * it (prefix moments), not a global pass, so alerts fire in-stream and
    * a later regime change can't retroactively excuse an early spike.
    * State per key is three numbers via WELFORD's update (n, mean, M2) —
    * O(1), unbounded-stream safe without a watermark, and numerically
    * stable: the raw-moment form `(Σv² − (Σv)²/n)/n` cancels
    * catastrophically for large-magnitude values (|v| ~ 1e9 with unit
    * variance leaves NO correct bits in the double subtraction), silently
    * disabling or corrupting detection for that key. Within a micro-batch
    * events process in (ts, value) order so replays are deterministic.
    * Emits only outliers (flatMapGroupsWithState, Append). */
  def anomalyStream(events: Dataset[KeyedValue],
                    threshold: Double = 2.5): Dataset[Outlier] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Moments, Outlier](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, in: Iterator[KeyedValue], state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
          val flagged = Seq.newBuilder[Outlier]
          in.toSeq.sortBy(e => (e.ts, e.value)).foreach { e =>
            if (m.n >= 2) {
              val varPop = m.m2 / m.n
              if (varPop > 0) {
                val z = (e.value - m.mean) / math.sqrt(varPop)
                if (math.abs(z) > threshold) flagged += Outlier(key, e.ts, e.value, z)
              }
            }
            val n1 = m.n + 1
            val d = e.value - m.mean
            val mean1 = m.mean + d / n1
            m = Moments(n1, mean1, m.m2 + d * (e.value - mean1))
          }
          state.update(m)
          flagged.result().iterator
      }
  }

  /** Smoothed output record for [[ewmaStream]]. */
  case class Smoothed(key: Long, ts: Long, value: Double, ewma: Double)

  /** ONLINE exponential smoothing — the streaming sibling of the batch
    * `ts_ewma` query, but the EXACT recursive form the FIR truncation
    * approximates: s ← α·v + (1−α)·s. Streaming is where the recursion is
    * natural — state per key is ONE number, each event reads and updates
    * it in order, no window, no lag buffer. (Batch can't fold
    * sequentially without giving up partition-order independence, which is
    * why the declared query carries fixed taps instead.) Within a
    * micro-batch events process in (ts, value) order so replays are
    * deterministic; emits every event with its smoothed value
    * (flatMapGroupsWithState, Append). */
  def ewmaStream(events: Dataset[KeyedValue],
                 alpha: Double = 0.3): Dataset[Smoothed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Double, Smoothed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, in: Iterator[KeyedValue], state: GroupState[Double]) =>
          val out = Seq.newBuilder[Smoothed]
          var s = state.getOption
          in.toSeq.sortBy(e => (e.ts, e.value)).foreach { e =>
            val next = s.fold(e.value)(prev => alpha * e.value + (1 - alpha) * prev)
            out += Smoothed(key, e.ts, e.value, next)
            s = Some(next)
          }
          s.foreach(state.update)
          out.result().iterator
      }
  }

  /** Stream-static broadcast enrichment — the dimension join every
    * streaming pipeline runs (attach account/user attributes to each
    * event): the static side is a batch DataFrame joined into every
    * micro-batch as a broadcast hash join. No state, no watermark — a
    * row-level inner join emits each match exactly once in append mode,
    * and the static relation is re-resolved per batch (so a dim refresh
    * between batches is picked up). At 100 TB the static side is the
    * broadcastable dim; a dim too big to broadcast joins bucketed
    * instead. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   joinKeys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), joinKeys)

  /** Event-time windowed aggregation with a watermark — the streaming form
    * of `Aggregates.aggEventsTumbling`; late events beyond the watermark are
    * dropped by Spark (whereas the store path above accepts them — both
    * behaviors exist in the engine, chosen per use case). `tsNsCol` is an
    * epoch-ns Long column; rows carry (window_start, event_type, n, sum). */
  def windowedCounts(events: DataFrame, tsNsCol: String,
                     watermarkDelay: String = "10 minutes",
                     windowLen: String = "1 hour",
                     slide: Option[String] = None): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr(s"`$tsNsCol` div 1000")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(
        slide.fold(window(col("event_time"), windowLen))(sl =>
          window(col("event_time"), windowLen, sl)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
