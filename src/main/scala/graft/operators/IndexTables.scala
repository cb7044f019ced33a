package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.sources.{ParquetConcat, SerializableHadoopConf, TimeStore}

/** Generational storage for the persisted ANN index DATA tables (`lists/`,
  * `codes/`) — the store's reader-safe compaction discipline
  * ([[graft.sources.TimeStore.compact]]) applied to the index family
  * (VERDICT r12 #1): a steady stream of [[Similarity.imiIndexAppend]]-style
  * appends lands each batch as its own parquet file, fragmenting the table
  * into exactly the small-file layout whose search cost SCALE.md's
  * imi_index_ab measured (26.6 s across 1,753 file-tasks vs 4.7 s).
  *
  * Layout: a table is a directory of `gen-NNNNNN` generations. The LIVE
  * generation is the newest one whose `_SUCCESS` committed (the marker
  * lands atomically at Spark job commit, so the compaction swap is atomic
  * from a reader's view — before commit readers resolve the old
  * generation, after it the new one; never neither). Appends are ordinary
  * parquet appends INTO the live generation. [[compactTable]] merges the
  * live generation's accumulated files — one task per leaf directory,
  * respecting `cell=` partitioning — into generation N+1 by binary
  * row-group concatenation ([[graft.sources.ParquetConcat]]: raw page
  * copy, no decode), then retires superseded generations only after
  * [[graft.sources.TimeStore.LeaseTimeoutMs]], dated from a
  * `_SUPERSEDED_AT` marker stamped at first observation (the superseder's
  * own `_SUCCESS` mtime refreshes on every append, which would retain the
  * old copy forever — the store's r4 lesson, reused unchanged).
  *
  * Reference analog: the rollover/compaction machinery that keeps bucket
  * objects file-sized (rados-timestore `StoreHelpers.hs:194-221`).
  */
private[graft] object IndexTables {

  def genName(g: Int): String = f"gen-$g%06d"

  /** Byte ceiling under which a SINGLE-leaf compaction merges driver-side
    * instead of through a one-task Spark job — below it the job's
    * scheduling floor dominates the byte copy. */
  private val LocalMergeMaxBytes: Long = 64L << 20

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All on-disk generations of a table, ascending: (generation, path). */
  private def generations(f: FileSystem, table: Path): Seq[(Int, Path)] =
    if (!f.exists(table)) Seq.empty
    else f.listStatus(table).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .flatMap(st => st.getPath.getName.stripPrefix("gen-").toIntOption
        .map(g => (g, st.getPath)))
      .sortBy(_._1)

  private def isComplete(f: FileSystem, p: Path): Boolean =
    f.exists(new Path(p, "_SUCCESS"))

  /** The directory a fresh base write lands in. */
  def writeDir(table: String): String = s"$table/${genName(0)}"

  /** The live generation when the table exists: the newest complete one.
    * Fails loudly on a LEGACY (pre-generational) layout — real content
    * directly under the path with no `gen-*` directory at all. Treating
    * such a path as "never written" is the worst of both worlds (ADVICE
    * r14): the maintenance entry points would silently no-op forever
    * (tombstones pending, fragments accumulating) while serves throw
    * "index never written?" against data that plainly exists. There is no
    * silent migration: the caller must rebuild (or move the tables under
    * a committed `gen-000000`) deliberately. `tombstones` is the one
    * sanctioned non-generational resident of an index root; `_`/`.` names
    * are markers/staging. An in-flight FIRST build (gen dir present, no
    * `_SUCCESS` yet) is NOT legacy — maintenance stays a no-op on it. */
  def liveGenOpt(spark: SparkSession, table: String): Option[(Int, Path)] = {
    val f = fsOf(spark, table)
    val root = new Path(table)
    val gens = generations(f, root)
    if (gens.isEmpty && f.exists(root) &&
        f.listStatus(root).exists { st =>
          val nm = st.getPath.getName
          !nm.startsWith("_") && !nm.startsWith(".") && nm != "tombstones"
        })
      throw new IllegalStateException(
        s"$table holds content but no gen-* generation — a pre-generational " +
        "legacy layout this build cannot serve or maintain; rebuild the " +
        "index (e.g. *IndexWrite over a fresh path, or move the existing " +
        "tables under <path>/gen-000000 with a _SUCCESS marker) and retire " +
        "the legacy directory")
    gens.filter(g => isComplete(f, g._2)).lastOption
  }

  /** The live generation — where reads resolve and appends land. Fails
    * loudly on a table no complete write ever created ("invalid namespace"
    * discipline, like the store's fetchIndex). */
  def liveDir(spark: SparkSession, table: String): String =
    liveGenOpt(spark, table).map(_._2.toString)
      .getOrElse(throw new IllegalStateException(
        s"no complete generation under $table — index never written?"))

  /** Stamp/retire generations superseded by the current live one under the
    * lease-horizon rule — shared by [[compactTable]] and
    * [[graft.operators.Similarity.indexVacuum]]'s rewrite. */
  def retireSuperseded(spark: SparkSession, table: String): Unit = {
    val f = fsOf(spark, table)
    val gens = generations(f, new Path(table))
    gens.filter(g => isComplete(f, g._2)).lastOption.foreach {
      case (live, _) =>
        retireable(f, gens, live).foreach(g => f.delete(g._2, true))
    }
  }

  /** Whether the live generation is `cell=` partitioned — appends must
    * match the base layout. */
  def cellPartitioned(spark: SparkSession, table: String): Boolean = {
    val live = new Path(liveDir(spark, table))
    fsOf(spark, table).listStatus(live)
      .exists(_.getPath.getName.startsWith("cell="))
  }

  /** Compact a table's live generation into one file per leaf directory
    * (the `cell=` partitions when present, else the generation root) as
    * generation N+1. One executor task per leaf — the merge is IO-bound
    * and a retried task overwrites its own output, so tasks are
    * idempotent. Index writers all emit ONE physical schema by
    * construction, so a mixed-schema leaf is corruption and fails loudly
    * (no silent re-encode fallback here, unlike the store's evolving point
    * schema). No-op on a table that does not exist (an index family
    * without that data table). */
  def compactTable(spark: SparkSession, table: String): Unit = {
    val f = fsOf(spark, table)
    val root = new Path(table)
    val gens = generations(f, root)
    gens.filter(g => isComplete(f, g._2)).lastOption.foreach {
      case (cur, curPath) =>
        val next = new Path(root, genName(cur + 1))
        if (f.exists(next)) f.delete(next, true) // dead earlier attempt
        val cells = f.listStatus(curPath).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
          .map(_.getPath.getName).sorted
        val leaves = if (cells.isEmpty) Seq("") else cells
        val (curStr, nextStr) = (curPath.toString, next.toString)
        def mergeLeaf(conf: org.apache.hadoop.conf.Configuration,
                      rel: String): Unit = {
          val src = if (rel.isEmpty) new Path(curStr)
                    else new Path(s"$curStr/$rel")
          val dstDir = if (rel.isEmpty) nextStr else s"$nextStr/$rel"
          val files = ParquetConcat.dataFiles(conf, src)
          require(
            ParquetConcat.mergeSameSchema(conf, files,
              new Path(s"$dstDir/compacted-0.parquet")),
            s"mixed physical schemas under $src — index writers emit one " +
              "schema; refusing to guess a merge")
        }
        val conf0 = spark.sparkContext.hadoopConfiguration
        val smallSingleLeaf = leaves.size == 1 && {
          val src = if (leaves.head.isEmpty) curPath
                    else new Path(s"$curStr/${leaves.head}")
          ParquetConcat.dataFiles(conf0, src).map(_.getLen).sum <=
            LocalMergeMaxBytes
        }
        if (smallSingleLeaf)
          // driver-side: one small leaf's byte copy sits under Spark's
          // ~300 ms per-job scheduling floor (the kv_point_ops lesson —
          // never ride a job to move a few MB); every real multi-leaf or
          // large table still fans out one IO-bound task per leaf
          mergeLeaf(conf0, leaves.head)
        else {
          val sconf = new SerializableHadoopConf(conf0)
          spark.sparkContext.parallelize(leaves, leaves.size)
            .foreach(rel => mergeLeaf(sconf.conf, rel))
        }
        f.create(new Path(next, "_SUCCESS"), true).close()
        retireable(f, generations(f, root), cur + 1)
          .foreach(g => f.delete(g._2, true))
    }
  }

  /** Threshold-triggered [[compactTable]] — the index family's
    * `maybeRollover` (the store keeps bucket objects file-sized by
    * checking a threshold on every append, `TimeStore.maybeRollover`;
    * here the unit of fragmentation is files-per-leaf, the exact quantity
    * SCALE.md's imi_index_ab measured dominating search). Call it after
    * appends on whatever cadence the ingest runs; it compacts only when
    * some leaf directory of the live generation holds more than
    * `maxFilesPerLeaf` data files, so a quiet table costs one listing.
    * Returns whether a compaction ran. */
  def maybeCompactTable(spark: SparkSession, table: String,
                        maxFilesPerLeaf: Int = 16): Boolean = {
    val f = fsOf(spark, table)
    val live = liveGenOpt(spark, table)
    if (live.isEmpty) return false
    val livePath = live.get._2
    val cells = f.listStatus(livePath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(_.getPath)
    val leaves = if (cells.isEmpty) Seq(livePath) else cells
    val conf = spark.sparkContext.hadoopConfiguration
    val over = leaves.exists(l =>
      ParquetConcat.dataFiles(conf, l).size > maxFilesPerLeaf)
    if (over) compactTable(spark, table)
    over
  }

  // ---- index-ROOT generations (VERDICT r13 #1) --------------------------
  //
  // A persisted ANN index is a MODEL (codebooks) plus DATA assigned under
  // that model. Compaction and vacuum rewrite data bytes the model already
  // described, so per-TABLE generations suffice; a REBUILD (retrain)
  // changes model and assignments TOGETHER, and a reader interleaving
  // "load model" / "scan lists" across two independently-committed table
  // swaps could pair a new model with old-model assignments — wrong cells,
  // silently wrong results. So the index root `path` is ITSELF a
  // generational table: each `gen-NNNNNN` under it is one complete,
  // internally-consistent index (model tables + nested data-table
  // generations), committed by a single root `_SUCCESS` created LAST.
  // Readers resolve the root ONCE per serve ([[liveDir]] on the index
  // path) and derive model and data dirs from it — old index or new index,
  // never a mix. Appends/compacts operate INSIDE the live root generation;
  // a rebuild (or a fresh `*IndexWrite` over an existing path) lands as
  // root generation N+1 and the superseded index retires on the lease
  // horizon like every other generation. Tombstones live OUTSIDE the
  // generations at `path/tombstones` (ids are valid against any
  // generation; the operation that folds them in deletes them).

  /** Where the NEXT full index build (write or rebuild) lands: root
    * generation N+1 (0 for a fresh path), any incomplete earlier attempt
    * at that slot removed. The caller writes model + data beneath it, then
    * [[commitRoot]]s. */
  def nextRootDir(spark: SparkSession, path: String): String = {
    val next = liveGenOpt(spark, path).map(_._1 + 1).getOrElse(0)
    val f = fsOf(spark, path)
    val p = new Path(path, genName(next))
    if (f.exists(p)) f.delete(p, true) // dead earlier attempt
    p.toString
  }

  /** The single atomic commit point of a full index build: create the root
    * generation's `_SUCCESS` (readers resolve the new index from here on)
    * and start the superseded index's lease-horizon retirement clock. */
  def commitRoot(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    fsOf(spark, root).create(new Path(rootPath, "_SUCCESS"), true).close()
    retireSuperseded(spark, rootPath.getParent.toString)
  }

  /** Superseded complete generations old enough to retire — see the
    * object Scaladoc for why the clock is a first-observation marker, not
    * the superseder's `_SUCCESS` mtime. */
  private def retireable(f: FileSystem, gens: Seq[(Int, Path)],
                         live: Int): Seq[(Int, Path)] = {
    val complete = gens.filter(g => isComplete(f, g._2))
    complete.filter(_._1 < live).filter { case (_, p) =>
      val marker = new Path(p, "_SUPERSEDED_AT")
      if (!f.exists(marker)) {
        val out = f.create(marker, true)
        try out.write(System.currentTimeMillis().toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        false
      } else {
        val in = f.open(marker)
        val at =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong
          finally in.close()
        System.currentTimeMillis() - at > TimeStore.LeaseTimeoutMs
      }
    }
  }
}
