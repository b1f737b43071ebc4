package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The dot product is a
  * custom codegen'd Catalyst expression ([[FloatDot]]); accumulation is a
  * deterministic left-to-right double fold, so the DuckDB oracle
  * (list_dot_product on a DOUBLE[] cast) computes bit-identical results.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ in double (codegen'd, stays inside WholeStageCodegen). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Exact integer Σ aᵢ·bᵢ over two `array<bigint>` columns (codegen'd —
    * [[LongDot]]; the interpreted `aggregate`+`zip_with` form costs ~5 µs
    * per pair and belongs nowhere near a candidate stream). */
  def longDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** ‖a‖ — for precomputing per-row norms BEFORE a pairwise join: scoring a
    * pair then costs one dot, not three. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot / (‖a‖·‖b‖), all in double. Prefer the
    * precomputed-norm form (`dot(a,b) / (normA * normB)`) in joins. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** All sign-random-projection LSH band keys for one embedding in one
    * codegen'd pass — `array<bigint>` of length `bands` ([[SrpBandKeys]]). */
  def srpBandKeys(emb: Column, bands: Int, bitsPerBand: Int): Column =
    ExpressionUtils.column(
      SrpBandKeys(ExpressionUtils.expression(emb), bands, bitsPerBand))

  /** Per-vector symmetric-int8 quantization scale: max |xᵢ| in double —
    * the factor an int8 ANN store divides by (q = x/scale·127). Row-local. */
  def absMax(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization of the vector under `scale` (=[[absMax]]):
    * qᵢ = clamp(⌊xᵢ/scale·127 + 0.5⌋, ±127), with an all-zero vector
    * (scale = 0) quantizing to zeros instead of dividing by zero.
    * `floor(x + 0.5)` rather than `round` pins half-way cases to
    * round-half-up on every engine (banker's-rounding `round` variants
    * differ). All double ops in fixed order → engine-exact; row-local,
    * zero shuffles at any scale. */
  def quantizeInt8(emb: Column, scale: Column): Column =
    transform(emb, x =>
      when(scale === 0.0, 0L).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / scale * 127.0 + 0.5)))))
}
