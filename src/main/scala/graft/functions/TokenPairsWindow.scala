package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd co-occurrence pair fan-out for the TextRank graph: for a
  * token array, every (least, greatest)-normalized UNEQUAL pair of tokens
  * at positions ≤ `window − 1` apart, in-doc repeats kept —
  * array<struct<a: string, b: string>>, byte-equal to the interpreted
  * `flatten(transform(sequence…, transform(sequence…, named_struct(
  * least/greatest))))` + `a =!= b` filter it replaces (the lambda tree
  * evaluated per token × (window−1) across the corpus — the
  * [[FloatDot]]/[[LongDot]]/[[AdcDist]] lesson applied to the graph
  * construction; the a = b self-pairs the old form built and then
  * filtered are simply never emitted). String order is UTF8String binary
  * comparison — exactly `least`/`greatest` on Spark strings. */
case class TokenPairsWindow(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 2, s"token_pairs_window: need window >= 2, got $window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_pairs_window expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true))),
    containsNull = false)

  /** Kernel shared by the interpreted and generated paths. */
  def pairs(input: ArrayData): GenericArrayData = {
    val n = input.numElements()
    val out = new java.util.ArrayList[InternalRow](math.max(n, 8) * (window - 1))
    var o = 1
    while (o < window) {
      var i = 0
      while (i + o < n) {
        val x = input.getUTF8String(i)
        val y = input.getUTF8String(i + o)
        // tokens come from split(): never null. compareTo is UTF8String
        // binary order = Spark's string least/greatest.
        val c = x.compareTo(y)
        if (c < 0) out.add(InternalRow(x, y))
        else if (c > 0) out.add(InternalRow(y, x))
        // c == 0: the self-pair the old form built and then filtered
        i += 1
      }
      o += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    pairs(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenPairsKernel", this,
      classOf[TokenPairsWindow].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pairs($c);")
  }

  override protected def withNewChildInternal(c: Expression): TokenPairsWindow =
    copy(child = c)
}
