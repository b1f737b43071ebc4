package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy byte-pair-encoding merge loop — the actual BPE tokenization
  * algorithm (rank-priority adjacent-pair merging, the GPT-2 `merges.txt`
  * scheme), shared by the interpreted and generated paths of
  * [[BpeMergeCount]]. The merge TABLE is caller-supplied: a real
  * deployment loads its tokenizer's ranked merge list; specs use a tiny
  * fixture table. Only the piece COUNT surfaces — the count is what
  * window packing and length stats consume. */
object BpeMerge {

  /** rank map keyed "left right" (the merges.txt line format), value =
    * priority (lower merges first). */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, Int.box(i))
    }
    m
  }

  /** BPE piece count of ONE token: start from single characters, repeatedly
    * merge the adjacent pair with the lowest rank until no pair is in the
    * table. Greedy rank order makes the result independent of scan
    * direction — the property that makes real BPE deterministic. */
  def countToken(tok: String, rank: java.util.HashMap[String, Integer]): Long = {
    if (tok.isEmpty) return 0L
    val pieces = new java.util.ArrayList[String](tok.length)
    var i = 0
    while (i < tok.length) {
      val n = Character.charCount(tok.codePointAt(i))
      pieces.add(tok.substring(i, i + n))
      i += n
    }
    var merging = pieces.size > 1
    while (merging) {
      var bestIdx = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < pieces.size - 1) {
        val r = rank.get(pieces.get(j) + " " + pieces.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) merging = false
      else {
        pieces.set(bestIdx, pieces.get(bestIdx) + pieces.get(bestIdx + 1))
        pieces.remove(bestIdx + 1)
        merging = pieces.size > 1
      }
    }
    pieces.size.toLong
  }

  /** Piece count over a whitespace-tokenized string (split keeps empty
    * tokens, which count 0 — the [[BpeCount]] convention). */
  def count(s: String, rank: java.util.HashMap[String, Integer]): Long = {
    var total = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        total += countToken(s.substring(start, i), rank)
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** Codegen'd exact BPE piece count under a caller-supplied merge table —
  * the "real tokenizer" plug for the `tokenCount` slot on
  * [[graft.operators.TrainPrep.packWindows]] / `tokenQuantiles` /
  * `corpusPrep` (the chars/4 [[BpeCount]] proxy stays the oracle-
  * expressible default; real BPE counts are not ANSI-SQL-expressible, so
  * plans built on this column are spec-pinned, not oracle-gated). The
  * generated code is one static call into [[BpeMerge]] with the rank map
  * attached as a codegen reference — no per-row interpretation of the
  * expression tree. */
case class BpeMergeCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_merge_count expects string, got $t")
  }

  override def dataType: DataType = LongType

  @transient private lazy val rank: java.util.HashMap[String, Integer] =
    BpeMerge.rankMap(merges)

  override def nullSafeEval(input: Any): Any =
    BpeMerge.count(input.asInstanceOf[UTF8String].toString, rank)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRank", rank, "java.util.HashMap<String, Integer>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeMerge.count($c.toString(), $ref);")
  }

  override protected def withNewChildInternal(c: Expression): BpeMergeCount = copy(child = c)
}
