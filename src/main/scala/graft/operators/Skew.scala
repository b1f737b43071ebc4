package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §4 physical-execution posture).
  * AQE's skew-join splits oversized partitions at runtime; explicit salting
  * is the deterministic fallback for pathological hot keys (one key holding
  * a double-digit share of the fact side): the hot side gets a per-row salt
  * in [0, f), the dimension side is replicated f ways, and the join runs on
  * (key, salt) — a hot key's rows spread over f tasks instead of one
  * straggler. Result is row-identical to the plain join; cost is f× the
  * (small) replicated side. */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltFactor: Int): DataFrame = {
    // per-row deterministic salt: hash of the whole fact row (identical rows
    // share a salt, which is fine — distinct rows spread)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
