package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.AnalysisException

import graft.core.Point
import graft.sources.{GraftCatalog, TimeStore}

/** The `TableCatalog` surface (`graft.sources.GraftCatalog`): SQL-native
  * time travel plus catalog DDL semantics. The happy path (VERSION AS OF /
  * TIMESTAMP AS OF / live read hash-equality) is the
  * `ts_store_sql_timetravel` gate; this pins the loud edges. */
class GraftCatalogSpec extends SparkSpec {

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshCatalog(root: String): String = {
    val cat = "gcat" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("catalog loads live tables, lists registered namespaces, travels " +
      "to pinned generations, and fails loudly on every bad edge") {
    val root = Files.createTempDirectory("graft-cat").toString
    val cat = freshCatalog(root)
    val n = TimeStore.namespace(root, "CTT")
    TimeStore.register(spark, n, 4, 4)
    import spark.implicits._
    val pts = (0 until 8).map(a => Point(a.toLong * 2, 100L + a, a.toLong))
    TimeStore.writePoints(spark, n, spark.createDataset(pts))
    TimeStore.pinGeneration(spark, n, 0L)

    // live read through the catalog = the provider's relation
    assert(spark.sql(s"SELECT * FROM $cat.`CTT`").count() === 8)
    // SHOW TABLES sees the namespace; the -INTERNAL shadow would not show
    val listed = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(listed === Set("CTT"))

    // takedown + vacuum -> generation 1 live; VERSION AS OF 0 pre-delete
    TimeStore.deletePoints(spark, n, Seq(4L))
    TimeStore.vacuumDeletes(spark, n)
    assert(spark.sql(s"SELECT * FROM $cat.`CTT`").count() === 7)
    assert(spark.sql(s"SELECT * FROM $cat.`CTT` VERSION AS OF 0").count() === 8)
    // TIMESTAMP AS OF now() resolves the vacuumed live generation
    assert(spark.sql(
      s"SELECT * FROM $cat.`CTT` TIMESTAMP AS OF now()").count() === 7)

    // time-travel relations are read-only. The SQL grammar already rejects
    // a temporal clause on INSERT/DELETE targets, so exercise the table's
    // OWN guards directly — the parser must not be the only line of
    // defense (a programmatic caller reaches the table object)
    intercept[UnsupportedOperationException] {
      graft.sources.GraftTable(root, "CTT", Some(0L)).newWriteBuilder(null)
    }
    intercept[UnsupportedOperationException] {
      graft.sources.GraftTable(root, "CTT", Some(0L))
        .deleteWhere(Array.empty[org.apache.spark.sql.sources.Filter])
    }
    // an explicit generation option that disagrees with the pin is loud
    intercept[IllegalArgumentException] {
      graft.sources.GraftTable(root, "CTT", Some(0L)).newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("generation", "1")))
    }

    // TIMESTAMP AS OF must resolve by the write-once _BORN_AT birth time,
    // not the _SUCCESS mtime a later append refreshes: capture an instant
    // AFTER generation 1 went live, then append (which re-commits gen 1's
    // _SUCCESS) — resolution at that instant must still be generation 1
    Thread.sleep(20)
    val tMid = System.currentTimeMillis()
    Thread.sleep(20)
    // …while the live table accepts writes through the same catalog
    spark.sql(s"INSERT INTO $cat.`CTT` (address, time, payload, value) " +
      "VALUES (20, 999, 9, NULL)")
    assert(spark.sql(s"SELECT * FROM $cat.`CTT`").count() === 8)
    assert(spark.sql(s"SELECT * FROM $cat.`CTT` TIMESTAMP AS OF " +
        s"timestamp_micros(${tMid}000) WHERE address = 4").count() === 0,
      "an mtime-refreshed _SUCCESS must not time-travel to the " +
        "PRE-VACUUM generation (address 4 was taken down before tMid)")
    // a pending (unvacuumed) takedown must stay suppressed under
    // timestamp travel that resolves the live generation — a pinned
    // no-overlay scan here would leak the tombstoned rows
    spark.sql(s"DELETE FROM $cat.`CTT` WHERE address = 20")
    assert(spark.sql(s"SELECT * FROM $cat.`CTT`").count() === 7)
    assert(spark.sql(
        s"SELECT * FROM $cat.`CTT` TIMESTAMP AS OF now()").count() === 7,
      "timestamp travel to the live generation must apply the pending-" +
        "tombstone overlay (takedown wins over bit-exact fidelity)")
    // …while VERSION AS OF the live generation is the documented verbatim
    // lineage read: no overlay, the pending tombstone does not apply
    assert(spark.sql(
        s"SELECT * FROM $cat.`CTT` VERSION AS OF 1").count() === 8)

    // loud edges: unknown table, unknown/garbage version, pre-history
    // timestamp, unsupported DDL
    intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.`NOPE`").collect()
    }
    intercept[Exception] { // unknown generation (never created)
      spark.sql(s"SELECT * FROM $cat.`CTT` VERSION AS OF 9").collect()
    }
    intercept[Exception] { // non-numeric version
      spark.sql(s"SELECT * FROM $cat.`CTT` VERSION AS OF 'vX'").collect()
    }
    intercept[Exception] { // before the first generation committed
      spark.sql(s"SELECT * FROM $cat.`CTT` TIMESTAMP AS OF " +
        "TIMESTAMP '2001-01-01 00:00:00'").collect()
    }
    intercept[Exception] { spark.sql(s"DROP TABLE $cat.`CTT`") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.`CTT` SET TBLPROPERTIES ('a'='b')")
    }

    // CREATE TABLE registers a namespace; re-create fails loudly; a
    // schema that isn't the store's is rejected
    val storeCols = "address BIGINT, time BIGINT, payload BIGINT, " +
      "value BINARY, kind STRING, epoch BIGINT, bucket INT"
    spark.sql(s"CREATE TABLE $cat.`FRESH` ($storeCols) " +
      "TBLPROPERTIES ('simple.buckets'='4', 'extended.buckets'='4')")
    assert(TimeStore.isRegistered(spark, TimeStore.namespace(root, "FRESH")))
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`FRESH` ($storeCols)")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`WRONG` (x INT)")
    }

    TimeStore.unpinGeneration(spark, n, 0L)
    fs.delete(new Path(root), true)
  }
}
