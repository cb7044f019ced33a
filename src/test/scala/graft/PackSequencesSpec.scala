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

  test("the per-sequence manifest is the exact inverse view: every full " +
      "sequence holds seqLen tokens, totals and straddles agree") {
    val man = Pipeline.packManifest(spark, sf("0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5),
        r.getLong(6)))
      .sortBy(_._1)
    // contiguous sequence ids from 0
    assert(man.map(_._1).toSeq === (0L until man.length).toSeq)
    // every sequence except the last is exactly full
    man.init.foreach { case (_, _, toks, _, _) => assert(toks === 512L) }
    // token totals agree with the per-doc view
    assert(man.map(_._3).sum === out.map(_._2).sum)
    // a sequence whose head cuts a document must be preceded by one whose
    // tail cuts a document (the same cut seen from both sides)
    man.sliding(2).foreach {
      case Array(prev, curr) => assert(curr._4 === prev._5)
      case _ =>
    }
    // doc straddle count (n_seqs − 1 summed) equals the manifest's
    // tail-cut count
    assert(out.map(_._6 - 1).sum === man.map(_._5).sum)
  }
}
