package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.imiIndexStats]] — the maintenance balance view over a
  * persisted IMI index: per-cell live list sizes must equal a direct count
  * of the served lists, track appends, and apply tombstone deletes. */
class IndexStatsSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf("0.001"))

  private def statsMap(path: String): Map[Int, Long] =
    Similarity.imiIndexStats(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("per-cell sizes equal the corpus size, track appends, and drop " +
      "tombstoned ids") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-stats-spec").toString
    val held = emb.filter(col("vec_id") < 400)
    Similarity.imiIndexWrite(held, "vec_id", "embedding", path,
      groups = 4, groupSize = 4, iters = 1, dim = 64)
    val s0 = statsMap(path)
    assert(s0.values.sum === 400L,
      "every indexed vector must appear in exactly one cell")
    assert(s0.keys.forall(c => c >= 0 && c < 16))

    Similarity.imiIndexAppend(spark,
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450),
      "vec_id", "embedding", path, groupSize = 4)
    val s1 = statsMap(path)
    assert(s1.values.sum === 450L, "appends must show up in the stats")
    assert(s0.forall { case (c, n) => s1.getOrElse(c, 0L) >= n },
      "appends never shrink a cell")

    Similarity.indexDelete(spark,
      emb.filter(col("vec_id") < 20).select(col("vec_id")), "vec_id", path)
    assert(statsMap(path).values.sum === 430L,
      "tombstoned ids must leave the live stats immediately")

    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
  }
}
