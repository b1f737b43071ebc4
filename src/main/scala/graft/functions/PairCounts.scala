package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Co-occurrence pair counter over a ≤64-term vocabulary, fed one BITMASK
  * per document (bit i set ⇔ vocab term i present): accumulates the upper-
  * triangular 64×64 count matrix n_ab as one flat array — the whole pair
  * space of a bounded vocabulary is 2,016 cells, so counting it as a
  * mergeable fixed-size buffer replaces materializing Σ(per-doc k²/2) pair
  * ROWS (~12M at sf0.1) with ≤2,016 integer increments per document inside
  * the partial aggregate, and the merge is an elementwise array add.
  *
  * The bit-trick loop (`m &= m-1` clears the lowest set bit) touches only
  * PRESENT terms, so sparse documents cost |present|²/2, not k²/2. */
object CoocPairCounts extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](64 * 64)

  override def reduce(buf: Array[Long], mask: Long): Array[Long] = {
    var m1 = mask
    while (m1 != 0L) {
      val i = java.lang.Long.numberOfTrailingZeros(m1)
      m1 &= m1 - 1
      var m2 = m1 // only bits above i: upper triangle, i < j
      while (m2 != 0L) {
        val j = java.lang.Long.numberOfTrailingZeros(m2)
        m2 &= m2 - 1
        buf(i * 64 + j) += 1L
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
