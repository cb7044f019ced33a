package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.core.Point
import graft.plans.GraftExtensions
import graft.sources.{PointCodec, TimeStore}

/** GraftExtensions: SQL function surface + bucket-prune optimizer rule,
  * installed into the shared session via [[GraftExtensions.install]] (the
  * `spark.sql.extensions` conf path binds the same objects at session
  * build). */
class ExtensionsSpec extends SparkSpec {

  test("decode_points and unsigned_mod work from SQL") {
    GraftExtensions.install(spark)
    val blob = PointCodec.encode(Seq(
      Point(0, 0, 7), Point(1, 1, 3, "hai".getBytes)))
    import spark.implicits._
    Seq(blob).toDF("b").createOrReplaceTempView("blobs")
    val rows = spark.sql(
      "SELECT p.address, p.time, p.payload, p.value FROM blobs " +
      "LATERAL VIEW decode_points(b) p AS address, time, payload, value")
      .collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(new String(rows(1).getAs[Array[Byte]]("value")) === "hai")

    assert(spark.sql("SELECT unsigned_mod(-1, 10) m").first().getLong(0) ===
      java.lang.Long.remainderUnsigned(-1L, 10L))
  }

  test("BucketPruneRule prunes bucket partitions from address IN filters") {
    GraftExtensions.install(spark)
    val root = Files.createTempDirectory("graft-prune").toString
    val n = TimeStore.namespace(root, "PRUNE")
    TimeStore.register(spark, n, 8, 8)
    // 32 addresses spread over 8 buckets
    val pts = (0L until 64L by 2L).map(a => Point(a, a, a))
    TimeStore.writeEncoded(spark, n, PointCodec.encode(pts))
    TimeStore.fetchIndex(spark, n, "simple")  // publishes the index conf

    val df = spark.read.parquet(n.pointsDir)
      .where("kind = 'simple' AND address IN (2, 10)")  // both hash to bucket 2
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.toString.contains("bucket")),
      s"no bucket filter injected: ${scans.head.partitionFilters}")
    val parts = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters)
    assert(parts.length === 1,
      s"expected 1 pruned partition, got ${parts.map(_.values.toString)}")
    // and the result is still correct
    val got = df.selectExpr("address", "time").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 2L), (10L, 10L)))
  }

  test("property: prune rule never changes results for random address sets") {
    GraftExtensions.install(spark)
    val root = Files.createTempDirectory("graft-prune-prop").toString
    val n = TimeStore.namespace(root, "PROP")
    TimeStore.register(spark, n, 5, 5)
    TimeStore.writeEncoded(spark, n, PointCodec.encode(
      (0L until 40L).map(a => Point(a & ~1L, a, a))), rolloverBytes = 200)
    TimeStore.fetchIndex(spark, n, "simple")
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val addrs = Seq.fill(rnd.nextInt(5) + 1)(rnd.nextInt(48).toLong & ~1L).distinct
      val sql = s"kind = 'simple' AND address IN (${addrs.mkString(",")})"
      val pruned = spark.read.parquet(n.pointsDir).where(sql)
        .selectExpr("address", "time").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the rule only fires on filters carrying an address list, so a
      // kind-only scan is the unpruned oracle (unsetting the conf no
      // longer disables pruning — the path-based fallback resolves the
      // index from the relation root)
      val plain = spark.read.parquet(n.pointsDir).where("kind = 'simple'")
        .selectExpr("address", "time").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, _) => addrs.contains(a) }.toSet
      assert(pruned === plain, s"addrs=$addrs")
    }
  }

  test("BucketPruneRule prunes in a fresh session (path-based index fallback)") {
    GraftExtensions.install(spark)
    val root = Files.createTempDirectory("graft-prune-fresh").toString
    val n = TimeStore.namespace(root, "FRESH")
    TimeStore.register(spark, n, 8, 8)
    TimeStore.writeEncoded(spark, n,
      PointCodec.encode((0L until 64L by 2L).map(a => Point(a, a, a))))
    // simulate a FRESH session running ad-hoc SQL before any store read:
    // no spark.graft.index.* conf published (register/write published one —
    // drop it)
    spark.conf.unset("spark.graft.index.FRESH.simple")
    val df = spark.read.parquet(n.pointsDir)
      .where("kind = 'simple' AND address IN (2, 10)")
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.toString.contains("bucket")),
      s"fallback did not inject a bucket filter: ${scans.head.partitionFilters}")
    val parts = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters)
    assert(parts.length === 1,
      s"expected 1 pruned partition, got ${parts.map(_.values.toString)}")
    // the fallback re-publishes the conf for later queries in the session
    assert(spark.conf.getOption("spark.graft.index.FRESH.simple").isDefined)
    assert(df.selectExpr("address", "time").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2L, 2L), (10L, 10L)))
  }
}
