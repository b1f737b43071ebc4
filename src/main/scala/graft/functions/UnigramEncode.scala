package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maximum-likelihood Viterbi encoding under a unigram-LM piece table
  * ([[graft.operators.Unigram]]) — the BpeEncode pattern: the trained
  * model rides the expression as a literal, evaluation is one per-row pass
  * (interpreted and generated paths share [[UnigramViterbi.Encoder]]), so
  * encoding shuffles nothing at any corpus size.
  *
  * Scores are the model's INTEGER log-micronats, so the per-text total is
  * an exact long sum — deterministic on any engine or partitioning. Ties
  * prefer the longer last piece (smaller split point), then earlier
  * backpointers — a total, deterministic order. Characters outside the
  * piece table encode as id −1 with a fixed UNK penalty. */
object UnigramViterbi {

  final val UnkMicro = -200000L

  final class Encoder(pieces: Seq[(String, Long)]) extends Serializable {
    private val idOf: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      pieces.zipWithIndex.foreach { case ((p, _), i) => m.putIfAbsent(p, Int.box(i)) }
      m
    }
    private val microOf: Array[Long] = pieces.map(_._2).toArray
    private val maxLen: Int = if (pieces.isEmpty) 1 else pieces.map(_._1.length).max

    /** Segment every space-separated word of `text`; returns
      * (ids, score_micro, n_unk). */
    def encode(text: String): InternalRow = {
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      var score = 0L
      var unk = 0L
      var start = 0
      val n = text.length
      while (start <= n) {
        var end = text.indexOf(' ', start)
        if (end < 0) end = n
        if (end > start) {
          val (s, u) = viterbi(text.substring(start, end), ids)
          score += s; unk += u
        }
        start = end + 1
      }
      InternalRow(new GenericArrayData(ids.toArray), score, unk)
    }

    /** Viterbi over one word's segmentation lattice: integer scores, ties
      * prefer the longer last piece. Appends ids; returns (score, nUnk). */
    private def viterbi(word: String, out: scala.collection.mutable.ArrayBuffer[Long]): (Long, Long) = {
      val n = word.length
      val best = Array.fill[Long](n + 1)(Long.MinValue)
      val back = Array.fill[Int](n + 1)(-1)
      val pick = Array.fill[Int](n + 1)(-2) // piece id of the arc ending at j
      best(0) = 0L
      var j = 1
      while (j <= n) {
        var i = math.max(0, j - maxLen)
        while (i < j) {
          if (best(i) != Long.MinValue) {
            val cand = word.substring(i, j)
            val hit = idOf.get(cand)
            val (micro, id) =
              if (hit != null) (microOf(hit.intValue()), hit.intValue())
              else if (j - i == 1) (UnkMicro, -1)
              else (Long.MinValue, -2)
            if (id != -2) {
              val s = best(i) + micro
              // strictly better, or equal score with a longer last piece
              if (s > best(j) || (s == best(j) && i < back(j))) {
                best(j) = s; back(j) = i; pick(j) = id
              }
            }
          }
          i += 1
        }
        j += 1
      }
      // backtrack (single chars always score, so best(n) is reachable)
      val rev = scala.collection.mutable.ArrayBuffer.empty[Int]
      var pos = n
      while (pos > 0) { rev += pick(pos); pos = back(pos) }
      var unk = 0L
      var r = rev.length - 1
      while (r >= 0) {
        val id = rev(r)
        if (id == -1) unk += 1
        out += id.toLong
        r -= 1
      }
      (best(n), unk)
    }
  }
}

case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unigram_encode expects string, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("score_micro", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  @transient private lazy val encoder = new UnigramViterbi.Encoder(pieces)

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncoder", encoder,
      classOf[UnigramViterbi.Encoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c.toString());")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
}
