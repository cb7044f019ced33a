package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` over one store root — the catalog-qualified SQL
  * surface of the engine, and the piece that makes time travel reachable
  * from PURE SQL: Spark routes `SELECT … FROM <cat>.<ns> VERSION AS OF g`
  * through [[loadTable(ident:Identifier,version:String)*]], which no
  * `TableProvider` path ever receives (the `USING graft` session-catalog
  * route has no version hook — reads there pin generations via
  * `option("generation", g)` instead; this catalog serves the SQL-native
  * spelling of the same [[TimeStore.pinGeneration]] lineage story).
  *
  * Configuration:
  * {{{
  *   spark.sql.catalog.<name>      = graft.sources.GraftCatalog
  *   spark.sql.catalog.<name>.root = /path/to/store/root
  * }}}
  * then `<name>.<NS>` is the live table (same relation the provider
  * serves: vectorized scans, runtime filtering, INSERT INTO, DELETE),
  * `<name>.<NS> VERSION AS OF <g>` is generation g's immutable snapshot,
  * and `<name>.<NS> TIMESTAMP AS OF <t>` resolves the generation that
  * was live at `t` ([[TimeStore.generationAsOf]] over the write-once
  * `_BORN_AT` birth markers; generation-granular, and a resolution to
  * the current live generation serves the LIVE relation so published
  * takedowns stay suppressed — see the timestamp overload's doc).
  * Time-travel relations are read-only (writes/DELETE fail loudly at
  * analysis) and resolve only generations still on disk — pin the ones
  * you need historical reads of.
  *
  * `CREATE TABLE <name>.<NS>` registers the namespace (the reference's
  * `registerNamespace`, `TimeStore.hs:73-95`; bucket counts via table
  * properties `simple.buckets` / `extended.buckets`, default 8). DROP is
  * deliberately unsupported: removal of data goes through the takedown
  * protocol (`DELETE FROM` → tombstones → vacuum), never a metadata drop
  * that strands the corpus. Catalog state IS the store's own on-disk
  * registration — no second metastore to drift against it. */
class GraftCatalog extends TableCatalog {

  private var catName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' requires spark.sql.catalog.$name.root"))
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  /** Tables are top-level (`<cat>.<NS>`): the store root has exactly one
    * level of namespaces, so a multi-level identifier cannot resolve. On
    * the LOAD paths an invalid name (contains '_', reserved '-INTERNAL'
    * suffix) maps to NoSuchTableException — such a table cannot exist,
    * and the analyzer's `tableExists` / IF NOT EXISTS flows probe through
    * loadTable and must see absence, not a crash. CREATE keeps the loud
    * IllegalArgumentException: there the user needs to know WHY the name
    * is rejected. */
  private def namespaceOf(ident: Identifier,
                          forLoad: Boolean): TimeStore.Namespace = {
    if (ident.namespace().nonEmpty) {
      if (forLoad) throw new NoSuchTableException(ident)
      else throw new NoSuchNamespaceException(ident.namespace())
    }
    try TimeStore.namespace(root, ident.name()) // validates the name
    catch {
      case e: IllegalArgumentException =>
        if (forLoad) throw new NoSuchTableException(ident) else throw e
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    val base = new Path(root)
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(base)) Array.empty
    else f.listStatus(base).filter(_.isDirectory).map(_.getPath.getName)
      .filter { nm =>
        // the `-INTERNAL` KV shadow namespaces are implementation detail
        // (their name is reserved — validation rejects it as a table, so
        // they are neither listed nor loadable); anything else must both
        // pass name validation and carry the store's registration marker
        !nm.endsWith("-INTERNAL") &&
        (try TimeStore.isRegistered(spark, TimeStore.namespace(root, nm))
         catch { case _: IllegalArgumentException => false })
      }
      .sorted.map(Identifier.of(Array.empty, _))
  }

  override def loadTable(ident: Identifier): Table = {
    val n = namespaceOf(ident, forLoad = true)
    if (!TimeStore.isRegistered(spark, n)) throw new NoSuchTableException(ident)
    GraftTable(root, ident.name())
  }

  /** SQL `VERSION AS OF <g>`: generation g's immutable files, verbatim —
    * loud at analysis on a retired/unknown/incomplete generation. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val n = namespaceOf(ident, forLoad = true)
    if (!TimeStore.isRegistered(spark, n)) throw new NoSuchTableException(ident)
    val g = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a generation number, got '$version' " +
          "(generations: TimeStore.storeGenerations / ts_store_stats)")
    }
    require(g >= 0, s"graft generation must be >= 0, got $g")
    TimeStore.snapshotPath(spark, n, g) // loud on retired/incomplete
    GraftTable(root, ident.name(), pinnedGeneration = Some(g))
  }

  /** SQL `TIMESTAMP AS OF <t>` (micros): the generation live at `t` —
    * newest born (`_BORN_AT`) by then and still on disk. Resolution is
    * GENERATION-granular: appends within a generation are not versioned.
    * When `t` resolves to the CURRENT live generation the LIVE relation
    * is returned — crucially including the pending-tombstone overlay: a
    * pinned scan serves files verbatim with no overlay, so pinning the
    * live generation would hand back rows a published takedown already
    * suppresses from every other read path. Takedown correctness beats
    * bit-exact historical fidelity here; for bit-reproducible lineage
    * reads use `VERSION AS OF` a pinned generation (that verbatim
    * no-overlay contract is the documented snapshot semantics). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val n = namespaceOf(ident, forLoad = true)
    if (!TimeStore.isRegistered(spark, n)) throw new NoSuchTableException(ident)
    val g = TimeStore.generationAsOf(spark, n, timestampMicros / 1000L)
      .getOrElse(throw new IllegalStateException(
        s"namespace '${n.ns}': no generation existed at " +
          s"timestamp $timestampMicros µs (first commit is later, or the " +
          "generation retired — pin generations you need historical reads of)"))
    if (TimeStore.liveGeneration(spark, n).contains(g))
      GraftTable(root, ident.name()) // live: tombstone overlay applies
    else
      GraftTable(root, ident.name(), pinnedGeneration = Some(g))
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val n = namespaceOf(ident, forLoad = false)
    if (TimeStore.isRegistered(spark, n))
      throw new TableAlreadyExistsException(ident)
    // the relation is fixed: reject a schema that isn't ours (empty = let
    // the store define it) and any partitioning (epoch/bucket routing is
    // the store's own, derived at write)
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft tables route their own (kind, epoch, bucket) partitioning; " +
        "PARTITIONED BY is not supported")
    val given = columns.map(c => (c.name, c.dataType)).toSeq
    val fixed = GraftTableProvider.StoreSchema.fields
      .map(f => (f.name, f.dataType)).toSeq
    if (given.nonEmpty && given != fixed)
      throw new IllegalArgumentException(
        s"graft tables have the fixed schema " +
          s"${GraftTableProvider.StoreSchema.simpleString}; got " +
          columns.map(c => s"${c.name} ${c.dataType.simpleString}")
            .mkString(", "))
    def buckets(key: String): Int = {
      val v = properties.getOrDefault(key, "8")
      val b = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"table property '$key' must be a positive integer, got '$v'")
      }
      require(b > 0, s"table property '$key' must be positive, got $b")
      b
    }
    TimeStore.register(spark, n,
      buckets("simple.buckets"), buckets("extended.buckets"))
    GraftTable(root, ident.name())
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTable(ident,
      schema.fields.map(f => Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft namespaces are immutable metadata (fixed schema, seeded " +
        "bucket counts); ALTER TABLE is not supported")

  /** Deliberately unsupported: data removal is the takedown protocol
    * (`DELETE FROM` → tombstones → `vacuumDeletes`), auditable and
    * reader-safe — never a metadata drop that strands a corpus. */
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft tables cannot be dropped through the catalog; takedown goes " +
        "through DELETE FROM (tombstones) + TimeStore.vacuumDeletes")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces cannot be renamed (addresses route by namespace " +
        "registration; a rename would strand every bucket)")
}
