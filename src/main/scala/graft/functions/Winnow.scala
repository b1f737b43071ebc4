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
  * Character convention — CODE POINTS, the contract shared with
  * [[RollingHash]]: the kernel decodes the string to its code-point
  * sequence once (one `codePointAt` walk, surrogate pairs collapse to
  * one gram character) and grams index THAT sequence, so gram values and
  * positions agree with a code-point engine (DuckDB's `text[i:j]`) and
  * with Spark's own code-point `length()` on ANY text, astral included —
  * not just BMP. On ASCII/BMP input the decoded array equals the char
  * sequence, so hashes are unchanged from the earlier code-unit kernel;
  * the decode adds one int array per row (gram-hash arrays of the same
  * length already dominate the allocation).
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
    val cps = WinnowFingerprints.codePoints(s)
    val ng = cps.length - k + 1
    if (ng <= 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(i + j)) % modulus; j += 1 }
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
      val cps = ctx.freshName("cps")
      s"""
         |final String $s = $c.toString();
         |final int[] $cps = graft.functions.WinnowFingerprints.codePoints($s);
         |final int $ng = $cps.length - $k + 1;
         |if ($ng <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  final long[] $h = new long[$ng];
         |  for (int $i = 0; $i < $ng; $i++) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $acc = ($acc * 31L + $cps[$i + $j]) % ${modulus}L;
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

object WinnowFingerprints {
  /** The string's code-point sequence as a flat int array — the gram
    * alphabet shared with [[RollingHash]]'s fold. Called from the
    * generated code via the companion's static forwarder; one
    * `codePointAt` walk, no per-character boxing. */
  def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    out
  }
}
