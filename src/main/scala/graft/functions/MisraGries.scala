package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters buffer: up to `k` (key, count) counters,
  * parallel arrays (Encoders.product round-trips them; a map buffer would
  * serialize per row). `n` = stream length seen, carried for the error
  * contract (undercount ≤ n/(k+1)). */
final case class MGBuf(var keys: Array[String], var counts: Array[Long], var n: Long)

/** Misra–Gries frequent-elements sketch as a typed [[Aggregator]] — the
  * heavy-hitters form of the repo's "sketch when exact won't scale" family
  * (`agg_approx_distinct` = HLL for cardinality, `ext_token_quantiles_fast`
  * = domain histogram for ranks; this one is for top-k frequency).
  *
  * Why a sketch: exact global top-k frequencies need a full groupBy shuffle
  * of EVERY key — at 100 TB that is an all-data exchange to answer a k-row
  * question. Misra–Gries keeps ≤ `k` counters per partial, merges
  * associatively up the combine tree (map-side partials, one 1-row result),
  * and guarantees for every key:
  *
  *   true − n/(k+1)  ≤  estimate  ≤  true
  *
  * so every key with true frequency > n/(k+1) is PRESENT in the summary
  * (classic Misra–Gries 1982; mergeable-summaries merge rule per Agarwal
  * et al. 2012). When `k` ≥ the number of distinct keys, no counter is ever
  * evicted and the sketch is EXACT — the fixture-scale regime the oracle
  * checks (`agg_heavy_hitters`), while SketchesSpec pins the eviction-mode
  * error bound the oracle can't express.
  *
  * Reference analog: none — the reference's only rollup is the op-type
  * counter triple (js:155, 254); this is the [EXT] scale form of "what are
  * the hottest keys" over an unbounded key domain.
  */
class MisraGries(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
  require(k >= 1, s"MisraGries needs at least one counter, got $k")

  override def zero: MGBuf = MGBuf(Array.empty, Array.empty, 0L)

  override def reduce(b: MGBuf, key: String): MGBuf = {
    b.n += 1
    var i = 0
    while (i < b.keys.length) {
      if (b.keys(i) == key) { b.counts(i) += 1; return b }
      i += 1
    }
    if (b.keys.length < k) {
      b.keys = b.keys :+ key
      b.counts = b.counts :+ 1L
      b
    } else {
      // all k counters busy: decrement everyone (the arriving key included,
      // i.e. it is simply dropped), compact zeros away
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
      compact(b)
    }
  }

  /** Merge two summaries: counter-wise sum, then if more than `k` counters
    * survive, subtract the (k+1)-th largest count from all and drop the
    * non-positive — the offset each dropped counter could have absorbed,
    * which preserves the one-sided n/(k+1) bound for n = n₁+n₂. */
  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (b.keys.isEmpty) { a.n += b.n; return a }
    if (a.keys.isEmpty) { b.n += a.n; return b }
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a.keys.length) { m.update(a.keys(i), a.counts(i)); i += 1 }
    var j = 0
    while (j < b.keys.length) {
      m.update(b.keys(j), m.getOrElse(b.keys(j), 0L) + b.counts(j)); j += 1
    }
    if (m.size > k) {
      val d = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.mapValuesInPlace((_, c) => c - d).filterInPlace((_, c) => c > 0)
    }
    MGBuf(m.keys.toArray, m.values.toArray, a.n + b.n)
  }

  override def finish(r: MGBuf): Map[String, Long] =
    r.keys.zip(r.counts).toMap

  private def compact(b: MGBuf): MGBuf = {
    val keep = b.counts.iterator.zipWithIndex.filter(_._1 > 0).map(_._2).toArray
    if (keep.length < b.keys.length) {
      b.keys = keep.map(b.keys)
      b.counts = keep.map(b.counts)
    }
    b
  }

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
