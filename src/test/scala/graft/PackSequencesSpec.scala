package graft

import org.apache.spark.sql.functions._

import graft.queries.Pipeline

/** Global concat-and-chunk sequence packing: the two-stage distributed
  * prefix sum must equal the single-ordering reference sum, straddle
  * arithmetic must be exact at boundaries, and empty documents drop. */
class PackSequencesSpec extends SparkSpec {

  private lazy val out = Pipeline
    .packSequences(spark, sf("0.001"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))
    .sortBy(_._1)

  test("start offsets are the exact global prefix sum in doc_id order") {
    var acc = 0L
    out.foreach { case (_, n, off, _, _, _) =>
      assert(off === acc)
      acc += n
    }
  }

  test("sequence indexes are the concat-and-chunk straddle arithmetic") {
    out.foreach { case (_, n, off, first, last, nseqs) =>
      assert(first === off / 512)
      assert(last === (off + n - 1) / 512)
      assert(nseqs === last - first + 1)
      assert(nseqs >= 1)
    }
  }

  test("the packing is gap-free and covers every token exactly once") {
    val total = out.map(_._2).sum
    assert(out.last._3 + out.last._2 === total)
    // at least one document straddles a sequence boundary on the fixture,
    // so the n_seqs > 1 branch is load-bearing
    assert(out.exists(_._6 > 1))
  }
}
