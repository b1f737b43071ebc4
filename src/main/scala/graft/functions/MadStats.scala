package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd per-group median/MAD/outlier fold — the row-local core of
  * [[graft.operators.Robust.madOutliers]]. Input: ONE group's value
  * histogram as a SORTED array of (value, hn) structs (domain-bounded by
  * the caller's contract — the array is the size of the group's value
  * DOMAIN, never its row count). Output: struct(n, med, mad, n_outliers).
  *
  * Semantics are bit-identical to the relational window/join form it
  * replaced (the oracle SQL and both query hashes pin this):
  *  - n = Σ hn; med = the LOWER median — the first value whose cumulative
  *    count reaches ⌈n/2⌉ = (n+1) div 2 (exact integer rank, no float
  *    quantile);
  *  - the deviation histogram |v − med| is folded IN PLACE (two pointers
  *    walking outward from the median — values below it meet values above
  *    it in sorted |dev| order, so the MAD rank pick needs no re-sort and
  *    no allocation beyond two cursors);
  *  - n_outliers = Σ hn over |v − med| > factor·mad.
  * The relational form scheduled ~10 tiny stages (two windows, five joins)
  * per call — pure latency on a histogram-sized frame; this fold does the
  * same integer arithmetic in one pass per group. */
object MadStats {
  /** (n, med, mad, n_outliers) off a sorted (value, hn) histogram. */
  def fold(arr: ArrayData, factor: Int): InternalRow = {
    val k = arr.numElements()
    val vs = new Array[Long](k)
    val hs = new Array[Long](k)
    var n = 0L
    var i = 0
    while (i < k) {
      val row = arr.getStruct(i, 2)
      vs(i) = row.getLong(0); hs(i) = row.getLong(1); n += hs(i)
      i += 1
    }
    // lower median: first value whose cumulative count reaches ⌈n/2⌉
    val rank = (n + 1) / 2
    var cum = 0L
    var mi = 0
    while (cum + hs(mi) < rank) { cum += hs(mi); mi += 1 }
    val med = vs(mi)
    // MAD: the same rank pick over |v − med|, merged from two sorted runs
    // (left of the median reversed, right of it forward)
    var lo = mi // next candidate below (walks left), dev = med − vs(lo)
    var hi = mi // next candidate above (walks right), dev = vs(hi) − med
    var cum2 = 0L
    var mad = 0L
    var done = false
    while (!done) {
      val dLo = if (lo >= 0) med - vs(lo) else Long.MaxValue
      val dHi = if (hi < k) vs(hi) - med else Long.MaxValue
      if (dLo == dHi) { // same deviation from both sides: one histogram bin
        cum2 += hs(lo) + (if (hi != lo) hs(hi) else 0L)
        if (cum2 >= rank) { mad = dLo; done = true } else { lo -= 1; hi += 1 }
      } else if (dLo < dHi) {
        cum2 += hs(lo)
        if (cum2 >= rank) { mad = dLo; done = true } else lo -= 1
      } else {
        cum2 += hs(hi)
        if (cum2 >= rank) { mad = dHi; done = true } else hi += 1
      }
    }
    // outlier mass beyond factor·MAD
    val bound = factor.toLong * mad
    var out = 0L
    i = 0
    while (i < k) {
      val dev = math.abs(vs(i) - med)
      if (dev > bound) out += hs(i)
      i += 1
    }
    InternalRow(n, med, mad, out)
  }
}

case class MadStats(child: Expression, factor: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
      if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mad_stats expects array<struct<long,long>>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("med", LongType, nullable = false),
    StructField("mad", LongType, nullable = false),
    StructField("n_outliers", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    MadStats.fold(input.asInstanceOf[ArrayData], factor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MadStats.fold($c, $factor);")

  override protected def withNewChildInternal(c: Expression): MadStats = copy(child = c)
}
