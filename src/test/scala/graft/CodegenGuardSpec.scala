package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Codegen-fallback guard — every custom Catalyst Expression in the repo
  * must ACTUALLY compile under Janino, not silently degrade to interpreted
  * eval. Spark's production projection factories
  * (`UnsafeProjection.create`, whole-stage codegen) catch a failed compile
  * and fall back with only a WARN, which is how two kernels shipped
  * Janino-invalid Java for a round without failing any test (Janino
  * compiles generics as RAW types, so `HashMap<String, Long>.get` returns
  * `Object` there and an unboxed assignment is a compile error javac never
  * shows). `GenerateUnsafeProjection.generate` has NO fallback: a compile
  * failure throws and fails the suite.
  *
  * Each case also cross-checks the generated projection's value against
  * the interpreted `expr.eval` on the same row, so a kernel whose
  * generated code compiles but DIVERGES from its `nullSafeEval` twin is
  * caught here too, plus the null-input contract (all kernels are
  * null-intolerant via nullSafeCodeGen/nullSafeEval). */
class CodegenGuardSpec extends AnyFunSuite {

  private val text =
    "the quick brown fox jumps over the lazy dog the fox ate the dog"

  private val strType = StringType
  private val floatArrType = ArrayType(FloatType, containsNull = false)
  private val histType = ArrayType(
    StructType(Array(
      StructField("v", LongType, nullable = false),
      StructField("hn", LongType, nullable = false))),
    containsNull = false)

  private def strRow(s: String): InternalRow =
    InternalRow(UTF8String.fromString(s))
  private def farr(vs: Float*): ArrayData = ArrayData.toArrayData(vs.toArray)

  /** Normalize Unsafe vs Generic container classes to plain Seq/values so
    * the codegen and interpreted results compare structurally. */
  private def norm(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).map(norm(_, et)).toSeq
    case (r: InternalRow, st: StructType) =>
      st.fields.toSeq.zipWithIndex.map { case (f, i) =>
        norm(r.get(i, f.dataType), f.dataType)
      }
    case (u: UTF8String, _) => u.toString
    case (x, _) => x
  }

  /** Compile expr with the no-fallback generator, evaluate on `row`, and
    * pin codegen == interpreted; then pin the null contract. */
  private def check(name: String, expr: Expression, row: InternalRow,
                    inputTypes: Seq[DataType]): Unit =
    test(s"$name compiles under codegen and matches interpreted eval") {
      assert(expr.checkInputDataTypes().isSuccess, s"$name input types")
      val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino error
      val generated = norm(proj(row).get(0, expr.dataType), expr.dataType)
      val interpreted = norm(expr.eval(row), expr.dataType)
      assert(generated == interpreted,
        s"$name codegen/interpreted divergence: $generated vs $interpreted")
      val nullRow = InternalRow(inputTypes.map(_ => null): _*)
      assert(proj(nullRow).isNullAt(0), s"$name null input must yield null")
      assert(expr.eval(nullRow) == null, s"$name interpreted null contract")
    }

  private def str0 = BoundReference(0, strType, nullable = true)
  private def fvec0 = BoundReference(0, floatArrType, nullable = true)

  check("RollingHash", RollingHash(str0, 257L, 1000000007L), strRow(text), Seq(strType))
  check("TokenSetCount", TokenSetCount(str0, Seq("the", "fox", "dog")),
    strRow(text), Seq(strType))
  check("MultiTokenSetCount",
    MultiTokenSetCount(str0, Seq(Seq("the", "fox"), Seq("dog"), Seq("quick", "lazy", "over"))),
    strRow(text), Seq(strType))
  check("BpeCount", BpeCount(str0), strRow(text), Seq(strType))
  check("SimHash64", SimHash64(str0), strRow(text), Seq(strType))
  check("TokenSqFreqSum", TokenSqFreqSum(str0), strRow(text), Seq(strType))
  check("CharEntropyMoments", CharEntropyMoments(str0), strRow(text), Seq(strType))
  check("HashedShingles", HashedShingles(str0, 3), strRow(text), Seq(strType))
  check("BpeMergeCount",
    BpeMergeCount(str0, Seq(("t", "h"), ("th", "e"), ("f", "o"))),
    strRow(text), Seq(strType))
  check("BpeEncode",
    BpeEncode(str0, Seq(("t", "h"), ("th", "e"), ("f", "o"))),
    strRow(text), Seq(strType))
  check("UnigramEncode",
    UnigramEncode(str0, Seq(("the", -1200000L), ("fox", -1500000L),
      ("t", -3000000L), ("h", -3000000L), ("e", -3000000L), ("f", -3100000L),
      ("o", -2900000L), ("x", -3300000L))),
    strRow("the fox"), Seq(strType))
  private val encType = StructType(Array(
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("score_micro", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))
  check("UnigramAudit",
    UnigramAudit(BoundReference(0, strType, nullable = true),
      BoundReference(1, encType, nullable = true),
      Seq(("the", -1200000L), ("fox", -1500000L),
        ("t", -3000000L), ("h", -3000000L), ("e", -3000000L), ("f", -3100000L),
        ("o", -2900000L), ("x", -3300000L))),
    InternalRow(UTF8String.fromString("the fox"),
      InternalRow(ArrayData.toArrayData(Array(0L, 1L)), -2700000L, 0L)),
    Seq(strType, encType))
  check("SrpBandKeys", SrpBandKeys(fvec0, bands = 4, bitsPerBand = 8),
    InternalRow(farr(0.5f, -1.25f, 2.0f, 0.75f, -0.5f, 1.5f, -2.0f, 0.25f)),
    Seq(floatArrType))
  check("FloatDot",
    FloatDot(BoundReference(0, floatArrType, nullable = true),
      BoundReference(1, floatArrType, nullable = true)),
    InternalRow(farr(1.0f, 2.0f, 3.0f), farr(0.5f, -1.0f, 2.0f)),
    Seq(floatArrType, floatArrType))
  check("PqAssign",
    PqAssign(fvec0, Seq(
      Seq(Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
      Seq(Array(0.5f, 0.5f), Array(-0.5f, -0.5f)))),
    InternalRow(farr(0.9f, 1.1f, -0.4f, -0.6f)), Seq(floatArrType))
  check("IntCellAssign",
    IntCellAssign(fvec0, Seq(
      Seq((0, Array(0L, 0L)), (1, Array(1000000L, 1000000L))),
      Seq((0, Array(500000L, 500000L)), (2, Array(-500000L, -500000L))))),
    InternalRow(farr(0.9f, 1.1f, -0.4f, -0.6f)), Seq(floatArrType))
  check("IntCellTop2",
    IntCellTop2(fvec0, Seq(
      (0, Array(0L, 0L)), (1, Array(1000000L, 1000000L)),
      (3, Array(-500000L, -500000L)))),
    InternalRow(farr(0.9f, 1.1f)), Seq(floatArrType))
  private val longArrType = ArrayType(LongType, containsNull = false)
  check("LongDot",
    LongDot(BoundReference(0, longArrType, nullable = true),
      BoundReference(1, longArrType, nullable = true)),
    InternalRow(ArrayData.toArrayData(Array(3L, -2L, 7L)),
      ArrayData.toArrayData(Array(-4L, 5L, 6L))),
    Seq(longArrType, longArrType))
  private val dtType = ArrayType(ArrayType(DoubleType, containsNull = false),
    containsNull = false)
  check("AdcDist",
    AdcDist(BoundReference(0, dtType, nullable = true),
      BoundReference(1, ArrayType(IntegerType, containsNull = false), nullable = true)),
    InternalRow(
      ArrayData.toArrayData(Array(
        ArrayData.toArrayData(Array(1.5, 2.5)),
        ArrayData.toArrayData(Array(0.25, 4.0, 8.0)))),
      ArrayData.toArrayData(Array(1, 2))),
    Seq(dtType, ArrayType(IntegerType, containsNull = false)))
  check("LongDots",
    LongDots(BoundReference(0, longArrType, nullable = true),
      Seq(Array(1000000L, -2000000L, 3000000L), Array(500000L, 500000L, -500000L))),
    InternalRow(ArrayData.toArrayData(Array(2000000L, 1000000L, -1000000L))),
    Seq(longArrType))
  private val strArrType = ArrayType(StringType, containsNull = true)
  check("TokenPairsWindow",
    TokenPairsWindow(BoundReference(0, strArrType, nullable = true), window = 3),
    InternalRow(ArrayData.toArrayData(Array(
      UTF8String.fromString("b"), UTF8String.fromString("a"),
      UTF8String.fromString("b"), UTF8String.fromString("c")))),
    Seq(strArrType))
  check("WinnowFingerprints",
    WinnowFingerprints(str0, k = 8, w = 4, modulus = 1000000007L),
    strRow(text), Seq(strType))
  check("MadStats",
    MadStats(BoundReference(0, histType, nullable = true), factor = 3),
    InternalRow(ArrayData.toArrayData(Array(
      InternalRow(1L, 2L), InternalRow(5L, 3L), InternalRow(9L, 1L),
      InternalRow(100L, 1L)))),
    Seq(histType))
}
