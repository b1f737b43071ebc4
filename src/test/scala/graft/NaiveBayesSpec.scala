package graft

import org.apache.spark.sql.DataFrame

import graft.operators.NaiveBayes

/** Naive Bayes classifier semantics: the model grid is complete, the
  * micronat values match the closed-form recomputation, and scoring
  * separates separable labels. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  private val d = docs(
    (1, "a", "x x y"), (2, "a", "x y"), (3, "b", "z z"))

  /** The operator's smoothing formula recomputed independently. */
  private def micro(c: Long, cl: Long, v: Long): Long =
    math.round(math.log((c + 0.5) / (cl + 0.5 * v)) * 10000)

  test("train emits the COMPLETE label x vocab grid with closed-form micronats") {
    val m = NaiveBayes.train(d, "text", "lang")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m.keySet === Set("a", "b").flatMap(l => Set("x", "y", "z").map(l -> _)))
    // label a: x=3, y=2, cl=5; label b: z=2, cl=2; V=3
    assert(m(("a", "x")) === ((3L, micro(3, 5, 3))))
    assert(m(("a", "z")) === ((0L, micro(0, 5, 3)))) // zero count still present
    assert(m(("b", "z")) === ((2L, micro(2, 2, 3))))
  }

  test("score classifies separable labels correctly and flags accuracy") {
    val model = NaiveBayes.train(d, "text", "lang")
    val r = NaiveBayes.score(d, "text", "lang", "doc_id", model)
      .select("doc_id", "label", "pred_label", "correct")
      .as[(Long, String, String, Boolean)].collect().toSet
    assert(r === Set((1L, "a", "a", true), (2L, "a", "a", true), (3L, "b", "b", true)))
  }

  test("score_micro equals prior + sum(tf * logprob_micro) recomputed by hand") {
    val model = NaiveBayes.train(d, "text", "lang")
    val got = NaiveBayes.score(d, "text", "lang", "doc_id", model)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val priorA = math.round(math.log(2.0 / 3.0) * 10000)
    val expected1 = priorA + 2 * micro(3, 5, 3) + 1 * micro(2, 5, 3)
    assert(got(1L) === expected1)
  }
}
