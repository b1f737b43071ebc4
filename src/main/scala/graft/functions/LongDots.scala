package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd exact integer dot products of one snapped `array<bigint>`
  * vector against a LITERAL query matrix, all in ONE row-local pass:
  * out[q] = Σᵢ queries(q)(i)·v(i), `array<bigint>` of length nQueries.
  *
  * This is the candidate-generation kernel of the MMR re-ranker
  * (`ext_sim_mmr`): the corpus scan scores every row against the whole
  * broadcast-literal query set with zero shuffles and zero per-query
  * re-reads — the [[IntCellAssign]] literal-matrix discipline applied to
  * inner products instead of distances. Exactness: inputs are 1e-6-unit
  * snapped longs, products ≤ dim·(2·10⁶)² ≪ 2⁶³, so the fold is exact
  * integer arithmetic any engine replays bit-for-bit.
  *
  * Codegen notes: the reference is a raw `long[][]` (no generics — the
  * Janino raw-type lesson from round 13), the inner loop bounds by the
  * query row's length so a ragged input can't read past the vector. */
case class LongDots(child: Expression, queries: Seq[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"long_dots expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val matrix: Array[Array[Long]] = queries.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](matrix.length)
    var q = 0
    while (q < matrix.length) {
      val row = matrix(q)
      val n = math.min(row.length, v.numElements())
      var acc = 0L
      var i = 0
      while (i < n) { acc += row(i) * v.getLong(i); i += 1 }
      out(q) = acc
      q += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("queries", matrix, "long[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final long[] $out = new long[$matRef.length];
         |for (int $q = 0; $q < $matRef.length; $q++) {
         |  final long[] $row = $matRef[$q];
         |  final int $n = java.lang.Math.min($row.length, $c.numElements());
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $row[$i] * $c.getLong($i);
         |  }
         |  $out[$q] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): LongDots = copy(child = c)
}
