package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure column
  * expressions (zip_with / aggregate fold) — no UDF, no collect. The fold is
  * a deterministic left-to-right double accumulation, so the DuckDB oracle
  * (list_dot_product on a DOUBLE[] cast) computes bit-identical results.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ in double, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** cosine(a, b) = dot / (‖a‖·‖b‖), all in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
