package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Maintenance lifecycle of the persisted ANN index tables (VERDICT r12
  * #1): appends fragment the data tables, [[Similarity.indexCompact]]
  * merges each leaf directory back to one file via binary row-group
  * concatenation into a NEW generation, results are row-identical across
  * the swap, and the superseded generation survives the swap (age-based
  * retirement — a reader that resolved it pre-swap keeps scanning). */
class IndexCompactSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf("0.001"))

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val nm = st.getPath.getName
      if (st.isFile && !nm.startsWith("_") && !nm.startsWith("."))
        out += st.getPath.toString
    }
    out.toSeq
  }

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("imi index: append fragments, compact merges to one file per leaf, " +
      "results identical, superseded generation retained") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-compact-spec").toString
    Similarity.imiIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, groups = 4, groupSize = 4, iters = 1,
      dim = 64)
    // three appends — each lands as its own file set in the live generation
    (0 until 3).foreach { i =>
      Similarity.imiIndexAppend(spark,
        emb.filter(pmod(col("vec_id"), lit(10)) === 0 &&
          pmod(col("vec_id"), lit(30)) === i * 10),
        "vec_id", "embedding", path, groupSize = 4)
    }
    def search() = Similarity.imiIndexSearch(spark,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", path,
      k = 5, groupSize = 4, nprobeGroups = 2, nprobeCells = 4)
    val before = resultSet(search())
    val root = Similarity.indexLiveRoot(spark, path)
    val gen0Files = dataFiles(s"$root/lists/gen-000000")
    assert(gen0Files.size > 3,
      s"appends should fragment the live generation (got ${gen0Files.size})")

    Similarity.indexCompact(spark, path)
    val live = s"$root/lists/gen-000001"
    assert(fs.exists(new Path(s"$live/_SUCCESS")),
      "compaction must commit a complete new generation")
    // one file per leaf: unpartitioned fixture layout -> exactly one file
    assert(dataFiles(live).size === 1,
      s"compacted generation should hold one file (got ${dataFiles(live)})")
    assert(resultSet(search()) === before,
      "search must be row-identical across the compaction swap")
    // reader safety: the superseded generation is NOT deleted at swap time
    assert(fs.exists(new Path(s"$root/lists/gen-000000")),
      "superseded generation must survive until the lease horizon")
    // idempotent: a second compact produces gen 2 with the same rows
    Similarity.indexCompact(spark, path)
    assert(resultSet(search()) === before)
    fs.delete(new Path(path), true)
  }

  test("cell-partitioned layout: compact merges PER CELL directory and " +
      "keeps the partition column readable") {
    // the public writers only partition past MinRowsPerCellPartition
    // (unreachable at fixture size by design), so exercise the partitioned
    // compact branch on a directly-fabricated generational table — the
    // same layout imiIndexWrite produces in the 100 TB regime
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-compact-cells-spec").toString
    val root = s"$path/gen-000000" // fabricated index-root generation
    val table = s"$root/lists"
    val gen0 = s"$table/gen-000000"
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, i % 4, Seq(i * 1.0, i * 2.0)))
        .toDF("nbr_id", "cell", "cv")
    batch(0, 400).write.partitionBy("cell").parquet(gen0)
    (1 to 3).foreach(b =>
      batch(400 * b, 400 * (b + 1)).write.mode("append")
        .partitionBy("cell").parquet(gen0))
    val before = spark.read.parquet(gen0)
      .collect().map(_.toSeq).toSet
    assert(dataFiles(s"$gen0/cell=0").size > 1,
      "appends should fragment each cell directory")
    graft.operators.IndexTables.commitRoot(spark, root)
    Similarity.indexCompact(spark, path)
    val live = s"$table/gen-000001"
    (0 until 4).foreach(c =>
      assert(dataFiles(s"$live/cell=$c").size === 1,
        s"cell=$c should compact to one file"))
    val after = spark.read.parquet(live).collect().map(_.toSeq).toSet
    assert(after === before,
      "partitioned compact must preserve every row including the cell col")
    fs.delete(new Path(path), true)
  }

  test("a compaction that died mid-write never becomes live and the next " +
      "compact recovers") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-compact-crash-spec").toString
    Similarity.imiIndexWrite(emb.filter(col("vec_id") < 300), "vec_id",
      "embedding", path, groups = 2, groupSize = 2, iters = 1, dim = 64)
    def search() = Similarity.imiIndexSearch(spark,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", path,
      k = 3, groupSize = 2, nprobeGroups = 1, nprobeCells = 2)
    val before = resultSet(search())
    val root = Similarity.indexLiveRoot(spark, path)
    // simulate a compact that crashed after writing data but before its
    // _SUCCESS commit: an incomplete newest generation with garbage
    val dead = new Path(s"$root/lists/gen-000001")
    fs.mkdirs(dead)
    fs.create(new Path(dead, "garbage.parquet"), true).close()
    assert(resultSet(search()) === before,
      "readers must resolve the old complete generation, never the dead one")
    // the next compact deletes the dead attempt and commits a real gen 1
    Similarity.indexCompact(spark, path)
    assert(fs.exists(new Path(s"$root/lists/gen-000001/_SUCCESS")))
    assert(resultSet(search()) === before)
    fs.delete(new Path(path), true)
  }

  test("dedup signature index: stored-table check equals the recomputed " +
      "cross pairs, across append + compact") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf("0.001"))
    val held = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-dedup-index-spec").toString
    Dedup.dedupIndexWrite(Dedup.shingles(
        held.filter(pmod(col("doc_id"), lit(2)) =!= 0), "doc_id", "text", 3),
      path, k = 64, r = 4)
    Dedup.dedupIndexAppend(Dedup.shingles(
        held.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", 3),
      path, k = 64, r = 4)
    Dedup.dedupIndexCompact(spark, path)
    val shI = Dedup.shingles(incoming, "doc_id", "text", 3)
    val fromIndex = resultSet(
      Dedup.dedupIndexCheck(spark, shI, path, k = 64, r = 4, threshold = 0.5))
    val recomputed = resultSet(
      Dedup.minhashLshPairsCross(shI,
        Dedup.shingles(held, "doc_id", "text", 3), k = 64, r = 4,
        threshold = 0.5))
    assert(fromIndex === recomputed,
      "persisted-index check must reproduce the recomputed cross pairs")
    // buckets / shingles / sizes all compacted to one file each
    val dedupRoot = graft.operators.IndexTables.liveDir(spark, path)
    Seq("buckets", "shingles", "sizes").foreach(t =>
      assert(dataFiles(s"$dedupRoot/$t/gen-000001").size === 1, t))
    fs.delete(new Path(path), true)
  }

  test("dedupIndexRecap re-asserts the hot-bucket cap globally across " +
      "appended batches") {
    import graft.operators.Dedup
    import spark.implicits._
    // identical texts -> identical signatures -> ONE degenerate bucket
    // that stays under the cap per batch but crosses it by accumulation
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-recap-spec").toString
    // three batches of 4, each under the cap of 5 — the bucket crosses
    // the cap only by accumulation (12 members), exactly the window the
    // per-batch cap can't see
    Dedup.dedupIndexWrite(Dedup.shingles(mk(0, 4), "doc_id", "text", 3),
      path, k = 8, r = 4, maxBucket = 5)
    Seq((4, 8), (8, 12)).foreach { case (lo, hi) =>
      Dedup.dedupIndexAppend(Dedup.shingles(mk(lo, hi), "doc_id", "text", 3),
        path, k = 8, r = 4, maxBucket = 5)
    }
    val shI = Dedup.shingles(mk(100, 102), "doc_id", "text", 3)
    def check() = Dedup.dedupIndexCheck(spark, shI, path, k = 8, r = 4,
      threshold = 0.5, maxBucket = 5)
    assert(check().count() > 0,
      "the accumulated 12-doc bucket must still pair before recap")
    Dedup.dedupIndexRecap(spark, path, maxBucket = 5)
    val after = check()
    assert(after.count() === 0,
      "recap must drop the globally-over-cap bucket")
    val cross = Dedup.minhashLshPairsCross(shI,
      Dedup.shingles(mk(0, 12), "doc_id", "text", 3), k = 8, r = 4,
      threshold = 0.5, maxBucket = 5)
    assert(resultSet(after) === resultSet(cross),
      "post-recap stored-side cap semantics == whole-corpus cross cap")
    fs.delete(new Path(path), true)
  }

  test("pq index: compact after appends is row-identical and single-file") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-compact-pq-spec").toString
    Similarity.pqIndexWrite(emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
      "vec_id", "embedding", path, subs = 8, ksub = 4, iters = 1, dim = 64)
    Similarity.pqIndexAppend(spark,
      emb.filter(pmod(col("vec_id"), lit(10)) === 0),
      "vec_id", "embedding", path, subs = 8, ksub = 4, dim = 64)
    def search() = Similarity.pqIndexSearch(spark,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", path,
      k = 5, subs = 8, ksub = 4, dim = 64)
    val before = resultSet(search())
    val root = Similarity.indexLiveRoot(spark, path)
    assert(dataFiles(s"$root/codes/gen-000000").size > 1)
    Similarity.indexCompact(spark, path)
    assert(dataFiles(s"$root/codes/gen-000001").size === 1)
    assert(resultSet(search()) === before)
    fs.delete(new Path(path), true)
  }

  test("maintenance ops are no-ops on a never-written index path — a " +
      "polling maintenance loop must not crash on an in-flight first build") {
    import graft.operators.{Dedup, IndexTables, TextIndex}
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-maint-noop-spec").toString
    Similarity.indexCompact(spark, path)
    assert(!Similarity.indexMaybeCompact(spark, path))
    Similarity.indexVacuum(spark, path) // nothing pending
    // a delete BEFORE any build: tombstones land, vacuum keeps them
    // pending until there is an index generation to fold them into
    Similarity.indexDelete(spark, Seq(1L, 2L).toDF("vec_id"), "vec_id", path)
    Similarity.indexVacuum(spark, path)
    assert(graft.sources.ParquetConcat.dataFiles(
      spark.sparkContext.hadoopConfiguration,
      new Path(s"$path/tombstones")).nonEmpty,
      "pre-build tombstones must stay pending, not vanish")
    TextIndex.bm25IndexCompact(spark, path)
    assert(!TextIndex.bm25IndexMaybeCompact(spark, path))
    Dedup.dedupIndexCompact(spark, path)
    assert(!Dedup.dedupIndexMaybeCompact(spark, path))
    Dedup.dedupIndexRecap(spark, path)
    assert(IndexTables.liveGenOpt(spark, path).isEmpty,
      "no maintenance op may conjure an index generation")
    fs.delete(new Path(path), true)
  }

  test("a legacy (pre-generational) layout fails loudly with a migration " +
      "hint — never a silent maintenance no-op or 'index never written?'") {
    import graft.operators.{IndexTables, TextIndex}
    val path = java.nio.file.Files
      .createTempDirectory("graft-legacy-spec").toString
    // the pre-r13 shape: table dirs directly under the index path
    emb.limit(4).select(col("vec_id")).write
      .parquet(s"$path/postings")
    def mustHint(body: => Any): Unit = {
      val e = intercept[IllegalStateException](body)
      assert(e.getMessage.contains("legacy"), e.getMessage)
    }
    mustHint(IndexTables.liveGenOpt(spark, path))
    mustHint(IndexTables.liveDir(spark, path))
    mustHint(TextIndex.bm25IndexCompact(spark, path)) // maintenance too
    // markers, staging and the sanctioned tombstones dir are NOT legacy
    // content: an in-flight or takedown-only path keeps the no-op contract
    val clean = java.nio.file.Files
      .createTempDirectory("graft-legacy-ok").toString
    fs.mkdirs(new Path(s"$clean/tombstones"))
    fs.create(new Path(s"$clean/_marker"), true).close()
    assert(IndexTables.liveGenOpt(spark, clean).isEmpty)
    fs.delete(new Path(path), true)
    fs.delete(new Path(clean), true)
  }

  test("maybeCompact: quiet below the threshold, fires above it, " +
      "self-maintains under an append stream") {
    import graft.operators.IndexTables
    val path = java.nio.file.Files
      .createTempDirectory("graft-maybe-compact-spec").toString
    Similarity.imiIndexWrite(emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding", path, groups = 4, groupSize = 4, iters = 1,
      dim = 64)
    val root = Similarity.indexLiveRoot(spark, path)
    val baseFiles = dataFiles(s"$root/lists/gen-000000").size
    // below threshold: no compaction, no new generation
    assert(!Similarity.indexMaybeCompact(spark, path,
      maxFilesPerLeaf = baseFiles + 64))
    assert(IndexTables.liveDir(spark, s"$root/lists").endsWith("gen-000000"))
    // an append stream with the check after every batch: whenever the live
    // generation crosses the threshold the table folds itself back
    (0 until 4).foreach { b =>
      Similarity.imiIndexAppend(spark,
        emb.filter(pmod(col("vec_id"), lit(8)) === (2 * b + 1)),
        "vec_id", "embedding", path, groupSize = 4)
      Similarity.indexMaybeCompact(spark, path, maxFilesPerLeaf = baseFiles)
    }
    val live = IndexTables.liveDir(spark, s"$root/lists")
    assert(!live.endsWith("gen-000000"), "threshold crossings must compact")
    assert(dataFiles(live).size <= baseFiles,
      s"self-maintained table holds ${dataFiles(live).size} files")
    // the maintained index serves the full union
    val served = resultSet(Similarity.imiIndexSearch(spark,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", path,
      k = 5, groupSize = 4, nprobeGroups = 2, nprobeCells = 4))
    assert(served.nonEmpty)
    fs.delete(new Path(path), true)
  }
}
