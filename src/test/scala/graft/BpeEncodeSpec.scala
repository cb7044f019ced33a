package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The scale-true BPE encode (VERDICT r15 #2): the codegen'd
  * [[graft.functions.BpeCodec]] walk must be BIT-IDENTICAL to the
  * k-chained `replace` fold it replaced — the fold was the hash-gated
  * reference semantics (sequential merge-list application, each merge one
  * left-to-right non-overlapping pass) — while keeping the plan O(1) in
  * the merge count. */
class BpeEncodeSpec extends SparkSpec {

  /** The replaced implementation (r14/r15 `bpeEncode`), kept here as the
    * semantics oracle: the double-space sentinel form + k literal
    * replaces. Only usable at small k — which is exactly the point. */
  private def chainEncode(df: DataFrame, idCol: String, textCol: String,
                          merges: Seq[(String, String)]): DataFrame = {
    val words = regexp_extract_all(lower(col(textCol)), lit("\\w+"), lit(0))
    val sym0 = when(size(words) === 0, lit(""))
      .otherwise(concat(lit("  "),
        array_join(transform(words, w =>
          array_join(regexp_extract_all(w, lit("."), lit(0)), "  ")),
          "  </w>    "),
        lit("  </w>  ")))
    val symN = merges.foldLeft(sym0) { case (c, (l, r)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    val toks = split(trim(col("sym")), " {2,}")
    df.select(col(idCol), symN.as("sym"))
      .select(col(idCol),
        when(col("sym") === "", lit(0L))
          .otherwise(size(toks).cast("long")).as("n_tokens"),
        md5(when(col("sym") === "", lit(""))
          .otherwise(array_join(toks, " ")).cast("binary")).as("fp"))
  }

  private def docs(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def assertSame(df: DataFrame, merges: Seq[(String, String)]): Unit = {
    val a = TextAnalysis.bpeEncode(df, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val b = chainEncode(df, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(a === b, s"expression != replace chain under merges $merges")
  }

  test("bit-identical to the replace chain: trained merge lists") {
    val df = docs(Seq(
      "banana bandana anagrams", "aaaa aaa aa a", "the cat sat on the mat",
      "Mixed CASE with Punctuation, numbers 123 and under_scores!",
      "", "   ", "one-token", "repeat repeat repeat repeat"))
    // a REAL trained list (well-formed: every merge's symbols derive from
    // earlier merges), k beyond the in-engine gate's 6
    val trained = TextAnalysis.bpeMerges(df, "text", k = 10)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(trained.nonEmpty)
    assertSame(df, trained)
  }

  test("bit-identical to the replace chain: adversarial hand lists " +
      "(list order beats rank-iterate rewriting)") {
    val df = docs(Seq("abc abcd bcbc aab", "banana", "xxxxxx yyy xy"))
    // (ab,c) is ranked FIRST but its lhs only exists after (a,b) — the
    // fold's sequential discipline leaves 'abc' as [ab, c]; a standard
    // lowest-rank-iterate encoder would produce [abc]. The expression
    // must reproduce the fold.
    assertSame(df, Seq(("ab", "c"), ("a", "b")))
    val enc = TextAnalysis.bpeEncode(docs(Seq("abc")), "doc_id", "text",
        Seq(("ab", "c"), ("a", "b")))
      .collect().head
    val chainFp = chainEncode(docs(Seq("abc")), "doc_id", "text",
        Seq(("ab", "c"), ("a", "b")))
      .collect().head
    assert(enc.getLong(1) === 3L, "abc -> [ab, c, </w>] under list order")
    assert(enc.getString(2) === chainFp.getString(2))
    // overlapping self-merges, </w> participation, duplicate pairs
    assertSame(df, Seq(("a", "a"), ("aa", "a"), ("b", "c"), ("a", "n")))
    assertSame(df, Seq(("a", "n"), ("an", "an"), ("x", "x"), ("xx", "xx")))
    assertSame(df, Seq(("c", "</w>"), ("b", "c</w>"), ("a", "b")))
    assertSame(df, Seq(("a", "b"), ("a", "b"), ("ab", "ab")))
    // a duplicate whose LATER occurrence fires: pass 1 of (ab,c) is a no-op,
    // (a,b) assembles the lhs, pass 3 merges the fresh "ab c" — the rank map
    // must keep BOTH ranks, not just the first
    assertSame(df, Seq(("ab", "c"), ("a", "b"), ("ab", "c")))
    val dup = TextAnalysis.bpeEncode(docs(Seq("abc")), "doc_id", "text",
        Seq(("ab", "c"), ("a", "b"), ("ab", "c")))
      .collect().head
    assert(dup.getLong(1) === 2L, "abc -> [abc, </w>]: the duplicate re-fires")
  }

  test("bit-identical on randomized merge lists over hash-derived docs") {
    val df = ScaleProbe.synthDocs(spark, 200L).select(col("doc_id"), col("text"))
    // pseudo-random but deterministic merge lists over the synth vocab's
    // alphabet (w + digits): mix well-formed chains and junk pairs
    val rng = new scala.util.Random(16)
    val alphabet = "w0123456789".map(_.toString)
    (1 to 3).foreach { _ =>
      var syms = alphabet.toVector
      val merges = (1 to 30).map { _ =>
        val l = syms(rng.nextInt(syms.size))
        val r = if (rng.nextInt(4) == 0) "</w>" else syms(rng.nextInt(syms.size))
        syms = (syms :+ (l + r)).distinct
        (l, r)
      }
      assertSame(df, merges)
    }
  }

  test("plan size is O(1) in merge count: one expression node at k=4096, " +
      "and analysis stays flat") {
    val df = docs(Seq("scale test words here"))
    val big = (1 to 4096).map(i => (s"q$i", s"z$i"))
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", big)
    val plan = enc.queryExecution.analyzed.toString
    assert(plan.length < 20000,
      s"plan grew with the merge list (len=${plan.length}) — the fold is back")
    // and it actually executes
    assert(enc.collect().head.getLong(1) > 0L)
  }
}
