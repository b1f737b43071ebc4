package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted skew join must be row-identical to the plain join. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed fact table") {
    // 90% of fact rows hit key 1 (the pathological-hot-key shape)
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 7).toLong, i.toLong))
      .toDF("k", "payload")
    val dim = (0 to 7).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }
}
