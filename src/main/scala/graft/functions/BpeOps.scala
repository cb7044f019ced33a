package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local greedy-left BPE encoding against a trained merge list
  * (VERDICT r15 #2) — the scale-true replacement for the k-chained
  * `replace` fold: that fold is bit-exact but its PLAN is O(k) deep, and a
  * production tokenizer carries 32k–100k merges — a 32k-deep expression
  * tree does not analyze, let alone codegen. Here the merge list is a
  * BROADCAST-style reference object (a pair→rank hash map shipped through
  * the expression's reference array, the [[BloomMightContain]] /
  * codebook-join pattern), the plan is ONE node regardless of k, and each
  * word walks its own symbol list.
  *
  * Semantics are the trainer's own rewrite discipline
  * ([[graft.operators.TextAnalysis.bpeMerges]]), reproduced exactly:
  * merges apply IN LIST ORDER, each as one left-to-right non-overlapping
  * pass over the word's symbols (a merged symbol never becomes the LEFT
  * element of a later match in the same pass — the `String.replace`
  * contract the fold relied on). The walk below is that sequence with the
  * no-op passes skipped: at any point, every merge ranked ≤ the last
  * applied rank has already had its pass (pairs of those ranks created
  * later stay unmerged, exactly like the fold), and choosing the MINIMUM
  * present rank above it makes the skipped passes provably empty — so the
  * output is bit-identical to the fold at any k, at O(word · merges-fired)
  * cost independent of list length. Merges are word-local by construction
  * (each word ends in its own `</w>` terminal), matching the fold's
  * 4-space word-boundary guarantee.
  */
object BpeCodec {

  /** pair→ranks map for [[encode]]; symbols never contain spaces, so
    * `lhs + " " + rhs` is an injective pair key. Ranks start at 1. A pair
    * may appear at MULTIPLE ranks and every one is kept (ascending): a
    * duplicate's later pass CAN fire when an intervening merge assembles
    * its lhs anew (e.g. (ab,c),(a,b),(ab,c) on "abc" — pass 3 merges the
    * "ab c" that pass 2 just created), so [[rankAbove]] resolves the
    * smallest rank still ahead of the walk. */
  def ranks(merges: Seq[(String, String)]): java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val k = l + " " + r
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i + 1) else prev :+ (i + 1))
    }
    m
  }

  /** The smallest rank of `key` strictly above `prev`, or Int.MaxValue.
    * Rank arrays are ascending by construction and almost always length 1. */
  private def rankAbove(ranks: java.util.HashMap[String, Array[Int]],
                        key: String, prev: Int): Int = {
    val rs = ranks.get(key)
    if (rs == null) Int.MaxValue
    else {
      var j = 0
      while (j < rs.length && rs(j) <= prev) j += 1
      if (j < rs.length) rs(j) else Int.MaxValue
    }
  }

  /** Encode one document given its extracted words (the `\w+` matches of
    * the lowercased text, ASCII by the regex class): returns the final
    * symbol sequence across all words joined by single spaces — "" for a
    * wordless document. Called from codegen'd projections via the
    * expression's reference object; everything here is per-row local. */
  def encode(words: ArrayData, ranks: java.util.HashMap[String, Array[Int]])
      : UTF8String = {
    val nWords = words.numElements()
    val out = new java.lang.StringBuilder()
    var w = 0
    while (w < nWords) {
      // a null element (containsNull arrays through the public Column API)
      // contributes nothing, like a wordless document
      val u = words.getUTF8String(w)
      if (u != null) {
        val word = u.toString
        // symbols: the word's chars + the </w> terminal (training form)
        val syms = new java.util.ArrayList[String](word.length + 1)
        var c = 0
        while (c < word.length) { syms.add(String.valueOf(word.charAt(c))); c += 1 }
        syms.add("</w>")
        if (!ranks.isEmpty) {
          var prevRank = 0
          var continue = true
          while (continue && syms.size > 1) {
            // the minimum-ranked pair present that is ranked ABOVE the last
            // applied merge (list order: earlier passes already ran)
            var best = Int.MaxValue
            var i = 0
            while (i < syms.size - 1) {
              val r = rankAbove(ranks, syms.get(i) + " " + syms.get(i + 1), prevRank)
              if (r < best) best = r
              i += 1
            }
            if (best == Int.MaxValue) continue = false
            else {
              // one left-to-right non-overlapping pass of merge `best`
              i = 0
              while (i < syms.size - 1) {
                if (rankAbove(ranks, syms.get(i) + " " + syms.get(i + 1),
                    prevRank) == best) {
                  syms.set(i, syms.get(i) + syms.get(i + 1))
                  syms.remove(i + 1)
                }
                // advance past the (merged or unmatched) symbol either way:
                // a merged symbol is never the LEFT of a match in this pass
                i += 1
              }
              prevRank = best
            }
          }
        }
        var s = 0
        while (s < syms.size) {
          if (out.length > 0) out.append(' ')
          out.append(syms.get(s))
          s += 1
        }
      }
      w += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** `bpe_tokens(words)`: the trained-merge BPE token sequence of a word
  * array, single-space joined — O(1) plan size in the merge count. */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_tokens requires array<string>, got ${other.simpleString}")
    }

  @transient private lazy val rankMap = BpeCodec.ranks(merges)

  override def nullSafeEval(input: Any): Any =
    BpeCodec.encode(input.asInstanceOf[ArrayData], rankMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the merge-ranking map rides the reference array — ONE object however
    // long the merge list, the BloomMightContain/codebook pattern
    val ranksRef = ctx.addReferenceObj("bpeRanks", rankMap,
      "java.util.HashMap<String, int[]>")
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.BpeCodec.encode($w, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BpeOps {
  /** Column form of [[BpeEncodeWords]] over an `array<string>` of words. */
  def bpeTokens(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWords(ColumnBridge.expression(words), merges))
}
