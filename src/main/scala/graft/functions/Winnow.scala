package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
  * MOSS local document fingerprinting scheme) as ONE codegen'd row-local
  * pass: hash every k-gram of the text with the repo's rolling polynomial
  * ((acc·31 + char) mod P — [[RollingHash]]'s fold, so the DuckDB twin is
  * the same `list_reduce`), slide a w-window over the gram-hash sequence,
  * and keep each window's RIGHTMOST minimum. Guarantee: any shared
  * substring of length ≥ k + w − 1 yields at least one shared fingerprint,
  * while only ~2/(w+1) of the grams are kept — the bounded-sample
  * substring-match index full shingling can't afford at corpus scale.
  *
  * Returns the selected hashes in position order, one entry per selected
  * POSITION (the rightmost-min argmin is monotone non-decreasing as the
  * window slides, so "new argmin ⇒ append" dedups positions exactly).
  * A document with fewer than w grams winnows its single truncated
  * window; fewer than k characters ⇒ empty array. All arithmetic is
  * exact long mod P — bit-identical in any engine.
  *
  * Character convention — BMP/ASCII corpora only, the contract shared
  * with [[RollingHash]]: grams iterate Java UTF-16 code UNITS
  * (`charAt`/`length`), which equal code points exactly on BMP text.
  * On astral (non-BMP) characters the code-unit count exceeds the
  * code-point count, so gram values/positions here would diverge from a
  * code-point engine (DuckDB's `text[i:j]`) AND from Spark's own
  * code-point `length()` used for companion n-gram counts — enforce
  * BMP-clean text upstream (the documents fixture is ASCII) rather than
  * pay a surrogate-pair decode in this hot codegen'd loop.
  *
  * O(n·w) with w a small constant; zero shuffles at any corpus size —
  * the per-doc fan-in that makes the downstream pair join |selected|-
  * sized instead of |grams|-sized. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fingerprints expects string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val ng = s.length - k + 1
    if (ng <= 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + s.charAt(i + j)) % modulus; j += 1 }
      h(i) = acc
      i += 1
    }
    val nw = math.max(ng - w + 1, 1)
    val out = new Array[Long](nw)
    var nOut = 0
    var last = -1
    var st = 0
    while (st < nw) {
      val end = math.min(st + w - 1, ng - 1)
      var best = st
      var j = st
      while (j <= end) { if (h(j) <= h(best)) best = j; j += 1 }
      if (best != last) { out(nOut) = h(best); nOut += 1; last = best }
      st += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val ng = ctx.freshName("ng")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val nw = ctx.freshName("nw")
      val out = ctx.freshName("out")
      val nOut = ctx.freshName("nOut")
      val last = ctx.freshName("last")
      val st = ctx.freshName("st")
      val end = ctx.freshName("end")
      val best = ctx.freshName("best")
      s"""
         |final String $s = $c.toString();
         |final int $ng = $s.length() - $k + 1;
         |if ($ng <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  final long[] $h = new long[$ng];
         |  for (int $i = 0; $i < $ng; $i++) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $acc = ($acc * 31L + $s.charAt($i + $j)) % ${modulus}L;
         |    }
         |    $h[$i] = $acc;
         |  }
         |  final int $nw = java.lang.Math.max($ng - $w + 1, 1);
         |  final long[] $out = new long[$nw];
         |  int $nOut = 0;
         |  int $last = -1;
         |  for (int $st = 0; $st < $nw; $st++) {
         |    final int $end = java.lang.Math.min($st + $w - 1, $ng - 1);
         |    int $best = $st;
         |    for (int $j = $st; $j <= $end; $j++) {
         |      if ($h[$j] <= $h[$best]) $best = $j;
         |    }
         |    if ($best != $last) { $out[$nOut++] = $h[$best]; $last = $best; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $nOut));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}
