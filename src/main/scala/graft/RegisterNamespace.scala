package graft

import org.apache.spark.sql.SparkSession

import graft.sources.TimeStore

/** `spark-submit`-able namespace registration — parity with the reference's
  * CLI (`src/Store.hs:87-105`: `timestore register` with origin + bucket
  * count options).
  *
  * {{{
  * spark-submit --class graft.RegisterNamespace graft.jar \
  *   <rootPath> <namespace> <simpleBuckets> [extendedBuckets]
  * }}}
  *
  * Idempotent like the reference (`registerNamespace`, `TimeStore.hs:73-95`):
  * re-registering an existing namespace is a no-op.
  */
object RegisterNamespace {

  /** Testable core: returns the status line `main` prints. */
  def run(spark: SparkSession, root: String, ns: String,
          simpleBuckets: Int, extendedBuckets: Int): String = {
    val n = TimeStore.namespace(root, ns)
    if (TimeStore.isRegistered(spark, n))
      s"namespace '$ns' already registered under $root"
    else {
      TimeStore.register(spark, n, simpleBuckets, extendedBuckets)
      s"registered '$ns' under $root ($simpleBuckets simple / $extendedBuckets extended buckets)"
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3 || args.length > 4) {
      System.err.println(
        "usage: RegisterNamespace <rootPath> <namespace> <simpleBuckets> [extendedBuckets]")
      sys.exit(2)
    }
    val sb = args(2).toInt
    val eb = if (args.length == 4) args(3).toInt else sb
    val spark = SparkSession.builder()
      .appName(s"graft-register-${args(1)}").getOrCreate()
    try println(run(spark, args(0), args(1), sb, eb))
    finally spark.stop()
  }
}
