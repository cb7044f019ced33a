package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-loop profiler (optimization rounds): run one declared query with a
  * job-level listener and print each Spark job's wall time, so a gate's
  * seconds decompose into its constituent actions (train iterations, model
  * writes, data writes, probe collects, searches). Bench tells you WHICH
  * query is expensive; this tells you WHY — the §1 "empirical" loop of the
  * optimization guide without the (disabled) UI.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.JobProfile ann_imi_index_append'
  * }}}
  *
  * Each named query runs twice: an untimed warmup (JIT/codegen/footer
  * caching, exactly Bench's policy) and one profiled pass. Job rows print
  * as `job <id> <seconds> <first line of the job's callsite/description>`.
  */
object JobProfile {

  private final class JobTimes extends SparkListener {
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val desc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val nTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val rows = new java.util.concurrent.CopyOnWriteArrayList[(Int, Double, String)]()
    var enabled = false
    override def onJobStart(j: SparkListenerJobStart): Unit = if (enabled) {
      t0.put(j.jobId, System.nanoTime())
      j.stageIds.foreach(sid => stageJob.put(sid, j.jobId))
      val d = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .filter(_.nonEmpty)
        .orElse(j.stageInfos.lastOption.map(_.name))
        .getOrElse("")
      desc.put(j.jobId, d)
    }
    val gcMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val deserMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    private def acc(m: java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong],
                    jid: Int, v: Long): Unit =
      m.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(v)
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (enabled) Option(stageJob.get(t.stageId)).foreach { jid =>
        Option(t.taskMetrics).foreach { m =>
          acc(taskMs, jid, m.executorRunTime)
          acc(gcMs, jid, m.jvmGCTime)
          acc(deserMs, jid, m.executorDeserializeTime)
        }
        acc(nTasks, jid, 0L)
        nTasks.get(jid).incrementAndGet()
      }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = if (enabled) {
      Option(t0.get(j.jobId)).foreach { s =>
        rows.add((j.jobId, (System.nanoTime() - s) / 1e9,
          Option(desc.get(j.jobId)).getOrElse("")))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // r16 session tuning — see Bench.scala for the rationale
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
    // ad-hoc A/B knobs: SPARK_GRAFT_EXTRA_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // profile sessions mirror Bench's ephemeral-checkpoint tuning
    Tables.ephemeralStreamTuning(spark)
    val listener = new JobTimes
    spark.sparkContext.addSparkListener(listener)

    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cleanup(): Unit = {
      CacheScope.release(spark)
      spark.catalog.clearCache()
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    }

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try { exec(fn(spark, sfDir)) } catch { case _: Throwable => } finally cleanup()
      listener.rows.clear(); listener.enabled = true
      val t0 = System.nanoTime()
      exec(fn(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      listener.enabled = false
      cleanup()
      // listener events are async; give the bus a beat to drain
      Thread.sleep(400)
      val inJob = {
        var s = 0.0; listener.rows.forEach { case (_, sec, _) => s += sec }; s
      }
      println(f"==== $name%s total ${total}%.3f s, ${listener.rows.size()}%d jobs, " +
        f"in-job ${inJob}%.3f s ====")
      listener.rows.forEach { case (id, sec, d) =>
        val tms = Option(listener.taskMs.get(id)).map(_.get()).getOrElse(0L)
        val nt = Option(listener.nTasks.get(id)).map(_.get()).getOrElse(0L)
        val gc = Option(listener.gcMs.get(id)).map(_.get()).getOrElse(0L)
        val de = Option(listener.deserMs.get(id)).map(_.get()).getOrElse(0L)
        println(f"  job $id%4d ${sec}%7.3f  task-sum ${tms / 1e3}%7.3f  " +
          f"gc ${gc / 1e3}%6.3f deser ${de / 1e3}%6.3f " +
          f"tasks $nt%3d  ${d.linesIterator.nextOption().getOrElse("").take(110)}%s")
      }
    }
    spark.stop()
  }
}
