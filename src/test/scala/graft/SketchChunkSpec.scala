package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sketches, TextAnalysis}

/** Properties of the Count-Min sketch and token-window chunker that the
  * DuckDB hash gate can't express: the sketch's one-sided error and
  * mergeability (the distributed-correctness core — partial sketches
  * cell-wise-summed equal the whole-corpus sketch), and the chunker's
  * coverage/reconstruction invariants. */
class SketchChunkSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("count-min estimates are never below the exact count") {
    import spark.implicits._
    val keys = (1L to 400L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val df = keys.toDF("k")
    val counters = Sketches.countMinCounters(df, "k", depth = 4, hexChars = 1)
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(counters, exact, "k", depth = 4, hexChars = 1)
    val rows = est.collect()
    assert(rows.length === 400)
    assert(rows.forall(r => r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact")))
    // width 16 over 400 keys MUST collide — the sketch is genuinely
    // approximate, not a disguised exact count
    assert(rows.exists(r => r.getAs[Long]("est_cnt") > r.getAs[Long]("exact")))
  }

  test("count-min sketches merge: shard sketches cell-wise-summed equal the whole") {
    import spark.implicits._
    val df = (1L to 300L).toDF("k")
    val whole = Sketches.countMinCounters(df, "k", depth = 4, hexChars = 1)
    val a = Sketches.countMinCounters(df.filter(col("k") <= 150), "k", 4, 1)
    val b = Sketches.countMinCounters(df.filter(col("k") > 150), "k", 4, 1)
    val merged = a.unionAll(b).groupBy(col("d"), col("b"))
      .agg(sum(col("c")).as("c"))
    val diff = merged.join(whole, Seq("d", "b"), "full")
      .filter(merged("c") =!= whole("c") ||
        merged("c").isNull || whole("c").isNull)
    assert(diff.count() === 0)
  }

  test("bpe merges follow greedy frequency order with lexicographic ties") {
    // 'aaab' ×3 by hand: r1 (a,a)=6 wins; r2 three-way tie at 3 → lex
    // smallest lhs 'a' → (a,b); r3 tie (aa,ab)/(ab,</w>) → (aa,ab);
    // r4 only (aaab,</w>) remains
    val df = docs((1L, "aaab aaab aaab"))
    val out = TextAnalysis.bpeMerges(df, "text", k = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 3L),
      (4L, "aaab", "</w>", "aaab</w>", 3L)))
  }

  test("bpe merges adjacent occurrences greedily (banana) and stops when exhausted") {
    // 'banana' ×2: (a,n) and (n,a) tie at 4, lex lhs 'a' wins; the merge
    // must hit BOTH occurrences ([b,an,an,a,</w>]) — the single-space
    // representation's shared-delimiter replace skipped the second
    // (review finding). Round 2: four pairs tie at 2, lex → (a,</w>).
    val out = TextAnalysis.bpeMerges(docs((1L, "banana banana")), "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4)))
    assert(out.toSeq === Seq((1L, "a", "n", 4L), (2L, "a", "</w>", 2L)))
    // a corpus that fully merges before k rounds STOPS with the truncated
    // merge table instead of crashing on an empty argmax
    val tiny = TextAnalysis.bpeMerges(docs((1L, "a a a")), "text", k = 4)
      .collect()
    assert(tiny.length === 1 &&
      tiny(0).getString(1) === "a" && tiny(0).getString(2) === "</w>")
  }

  test("bpeEncode replays trained merges greedy-left, stays word-local, " +
      "and handles empty and unseen text") {
    // merges as trained on 'banana': (a,n) then (an,an). Encoding
    // 'banana' → [b, anan, a, </w>] (greedy-left: both (a,n)s merge in
    // round 1, then the adjacent 'an an' pair); 'ab' holds no (a,n) pair
    // → [a, b, </w>]; word boundaries never merge ('na an' keeps word1's
    // trailing a away from word2's leading a).
    val merges = Seq(("a", "n"), ("an", "an"))
    val enc = TextAnalysis.bpeEncode(
      docs((1L, "banana banana"), (2L, "ab"), (3L, ""), (4L, "na an")),
      "id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(enc(1L) === 8L, "two words of [b, anan, a, </w>]")
    assert(enc(2L) === 3L, "[a, b, </w>] — no pair applies")
    assert(enc(3L) === 0L, "empty text encodes to zero tokens")
    assert(enc(4L) === 5L, "[n, a, </w>] + [an, </w>] — word-local merge")
    // the fingerprint pins the SEQUENCE, not just the count
    val fps = TextAnalysis.bpeEncode(
      docs((1L, "banana"), (2L, "ananab")), "id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(fps(1L) !== fps(2L), "same multiset sizes, different sequences")
    // an encoded training word equals the trainer's own final rewrite
    val trained = TextAnalysis.bpeMerges(docs((1L, "banana banana")),
      "text", k = 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val both = TextAnalysis.bpeEncode(docs((1L, "banana")), "id",
      "text", trained).collect().head
    assert(both.getLong(1) === 4L, "[b, an, an, a</w>] after (a,n),(a,</w>)")
  }

  test("count-min estimates unseen keys as zero, not a dropped row") {
    import spark.implicits._
    // a SPARSE sketch (3 keys touch ≤ 12 of the 64 cells) so unseen
    // probes genuinely hit empty cells
    val counters = Sketches.countMinCounters(
      (1L to 3L).toDF("k"), "k", depth = 4, hexChars = 1)
    val unseen = (100001L to 100020L).toDF("k")
    val est = Sketches.countMinEstimate(counters, unseen, "k", 4, 1).collect()
    // every probe row survives; estimates are the CMS bound (>= 0, and 0
    // whenever any of the 4 cells was untouched)
    assert(est.length === 20)
    assert(est.forall(_.getAs[Long]("est_cnt") >= 0L))
    assert(est.exists(_.getAs[Long]("est_cnt") === 0L))
  }

  test("chunker covers every token and reconstructs the doc") {
    val df = docs(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),  // 100 toks -> 4 chunks
      (2L, (1 to 32).map(i => s"u$i").mkString(" ")),   // exactly one window
      (3L, "a b c"),                                    // shorter than window
      (4L, ""))                                         // empty doc
    val out = TextAnalysis.chunk(df, "id", "text", window = 32, stride = 24)
      .orderBy(col("id"), col("chunk_idx")).collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    // chunk counts: ceil(max(n-32,0)/24)+1
    assert(byDoc(1L).length === 4 && byDoc(2L).length === 1 &&
      byDoc(3L).length === 1 && byDoc(4L).length === 1)
    // doc 1: strides cover tokens 1..100; final chunk is the tail
    val chunks1 = byDoc(1L).map(_.getString(3).split(" ").toSeq)
    assert(chunks1.head === (1 to 32).map(i => s"t$i"))
    assert(chunks1(1) === (25 to 56).map(i => s"t$i"))  // overlap of 8
    assert(chunks1.last === (73 to 100).map(i => s"t$i"))
    // reconstruction: stride-prefixes of all but the last + the last chunk
    val rebuilt = chunks1.dropRight(1).flatMap(_.take(24)) ++ chunks1.last
    assert(rebuilt === (1 to 100).map(i => s"t$i"))
    // n_tokens column matches the actual slice
    assert(byDoc(1L).map(_.getLong(2)).toSeq === Seq(32L, 32L, 32L, 28L))
    // empty doc: one empty chunk, 0 tokens
    assert(byDoc(4L).head.getLong(2) === 0L &&
      byDoc(4L).head.getString(3) === "")
  }
}
