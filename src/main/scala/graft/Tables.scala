package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders shared by every query entry point.
  *
  * All tables are driver-generated parquet under `/root/testdata/sf*` (see
  * TESTDATA.md). `events.ts` is physically `timestamp[ns]`, which Spark reads
  * as a nanosecond `LongType` when `spark.sql.legacy.parquet.nanosAsLong` is
  * set — [[GraftSession.tune]] applies that plus the rest of the standard
  * session tuning, so every entry point (Verify, Bench, tests) sees identical
  * semantics.
  */
object Tables {
  /** Session settings every graft entry point needs. Safe to call repeatedly. */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    // events.ts is timestamp[ns]; read it as a Long of epoch nanoseconds
    // (matches the reference's Word64 ns `Time` exactly - Core.hs:232-243).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    // AQE re-plans shuffles at runtime (partition coalescing, skew joins) -
    // essential at 100 TB, harmless at sf0.001.
    c.set("spark.sql.adaptive.enabled", "true")
    spark
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
