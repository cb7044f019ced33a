package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Tombstone-delete + vacuum lifecycle of the persisted ANN indexes:
  * deletes serve immediately through the anti-join, [[Similarity
  * .indexVacuum]] folds them in physically with IDENTICAL results, the
  * applied tombstones are cleared, and the vacuumed generation no longer
  * contains the deleted ids at all. */
class IndexDeleteSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf("0.001"))

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("imi index: tombstone serve == vacuumed serve; tombstones clear; " +
      "rows physically gone") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-delete-spec").toString
    Similarity.imiIndexWrite(emb, "vec_id", "embedding", path,
      groups = 4, groupSize = 4, iters = 1, dim = 64)
    def search() = Similarity.imiIndexSearch(spark,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", path,
      k = 5, groupSize = 4, nprobeGroups = 2, nprobeCells = 4)
    val full = resultSet(search())
    val delPred = pmod(col("vec_id"), lit(7)) === 3
    Similarity.indexDelete(spark,
      emb.filter(delPred).select(col("vec_id")), "vec_id", path)
    val tombstoned = resultSet(search())
    assert(tombstoned !== full,
      "fixture should lose at least one neighbor to the deletion batch")
    assert(!tombstoned.exists(r => r(2).asInstanceOf[Long] % 7 == 3),
      "no deleted id may appear as a neighbor")

    Similarity.indexVacuum(spark, path)
    assert(resultSet(search()) === tombstoned,
      "vacuum must not change served results")
    // applied tombstones are cleared (data files removed)
    assert(graft.sources.ParquetConcat.dataFiles(
      spark.sparkContext.hadoopConfiguration,
      new Path(s"$path/tombstones")).isEmpty)
    // physically gone from the live generation
    val live = graft.operators.IndexTables.liveDir(spark,
      s"${Similarity.indexLiveRoot(spark, path)}/lists")
    assert(spark.read.parquet(live)
      .filter(pmod(col("nbr_id"), lit(7)) === 3).count() === 0,
      "vacuumed generation must not contain deleted rows")
    // a later append still lands and serves
    Similarity.imiIndexAppend(spark,
      emb.filter(delPred && col("vec_id") > 100), "vec_id", "embedding",
      path, groupSize = 4)
    val after = resultSet(search())
    assert(after.nonEmpty)
    fs.delete(new Path(path), true)
  }

  test("dedup index: deleted docs stop matching immediately and vacuum " +
      "is identical") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf("0.001"))
    val held = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-dedup-delete-spec").toString
    Dedup.dedupIndexWrite(Dedup.shingles(held, "doc_id", "text", 3), path,
      k = 64, r = 4)
    val shI = Dedup.shingles(incoming, "doc_id", "text", 3)
    def check() = Dedup.dedupIndexCheck(spark, shI, path, k = 64, r = 4,
      threshold = 0.5)
    val full = resultSet(check())
    assert(full.nonEmpty)
    // delete every held doc that currently matches something — after the
    // delete the check must return NOTHING
    val matchedJs = full.map(_(1).asInstanceOf[Long]).toSeq
    Dedup.dedupIndexDelete(spark,
      spark.createDataFrame(spark.sparkContext.parallelize(
          matchedJs.map(org.apache.spark.sql.Row(_))),
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long")),
      "doc_id", path)
    assert(resultSet(check()).isEmpty,
      "tombstoned docs must stop matching immediately")
    Dedup.dedupIndexVacuum(spark, path)
    assert(resultSet(check()).isEmpty, "vacuum must not change the check")
    assert(graft.sources.ParquetConcat.dataFiles(
      spark.sparkContext.hadoopConfiguration,
      new Path(s"$path/tombstones")).isEmpty,
      "applied tombstones must clear")
    val live = graft.operators.IndexTables.liveDir(spark,
      s"${graft.operators.IndexTables.liveDir(spark, path)}/shingles")
    assert(spark.read.parquet(live)
      .filter(col("doc").isin(matchedJs.map(Long.box): _*)).count() === 0,
      "vacuumed shingle table must not contain deleted docs")
    fs.delete(new Path(path), true)
  }

  test("pq index: tombstoned codes drop from ADC serving and vacuum is " +
      "identical") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-delete-pq-spec").toString
    Similarity.pqIndexWrite(emb, "vec_id", "embedding", path,
      subs = 8, ksub = 4, iters = 1, dim = 64)
    def search() = Similarity.pqIndexSearch(spark,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", path,
      k = 5, subs = 8, ksub = 4, dim = 64)
    Similarity.indexDelete(spark,
      emb.filter(pmod(col("vec_id"), lit(5)) === 2).select(col("vec_id")),
      "vec_id", path)
    val tombstoned = resultSet(search())
    assert(!tombstoned.exists(r => r(2).asInstanceOf[Long] % 5 == 2))
    Similarity.indexVacuum(spark, path)
    assert(resultSet(search()) === tombstoned)
    fs.delete(new Path(path), true)
  }
}
