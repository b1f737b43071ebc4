package graft

import org.apache.spark.sql.DataFrame

import graft.operators.NaiveBayes

/** Naive Bayes classifier semantics: the model grid is complete (with
  * per-label priors learned at TRAIN time), the micronat values match the
  * closed-form recomputation, scoring separates separable labels, needs no
  * labels on the scored frame, and gives empty docs the prior argmax. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  private val d = docs(
    (1, "a", "x x y"), (2, "a", "x y"), (3, "b", "z z"))

  /** The operator's smoothing formula recomputed independently (×1e6, the
    * repo-wide lnMicro unit). */
  private def micro(c: Long, cl: Long, v: Long): Long =
    math.round(math.log((c + 0.5) / (cl + 0.5 * v)) * 1e6)

  test("train emits the COMPLETE label x vocab grid with closed-form micronats and train-time priors") {
    val m = NaiveBayes.train(d, "text", "lang")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(m.keySet === Set("a", "b").flatMap(l => Set("x", "y", "z").map(l -> _)))
    // label a: x=3, y=2, cl=5, 2 of 3 docs; label b: z=2, cl=2, 1 of 3; V=3
    val priorA = math.round(math.log(2.0 / 3.0) * 1e6)
    val priorB = math.round(math.log(1.0 / 3.0) * 1e6)
    assert(m(("a", "x")) === ((3L, micro(3, 5, 3), priorA)))
    assert(m(("a", "z")) === ((0L, micro(0, 5, 3), priorA))) // zero count still present
    assert(m(("b", "z")) === ((2L, micro(2, 2, 3), priorB)))
  }

  test("scoreAudit classifies separable labels correctly and flags accuracy") {
    val model = NaiveBayes.train(d, "text", "lang")
    val r = NaiveBayes.scoreAudit(d, "text", "lang", "doc_id", model)
      .select("doc_id", "label", "pred_label", "correct")
      .as[(Long, String, String, Boolean)].collect().toSet
    assert(r === Set((1L, "a", "a", true), (2L, "a", "a", true), (3L, "b", "b", true)))
  }

  test("score_micro equals TRAIN prior + sum(tf * logprob_micro) recomputed by hand") {
    val model = NaiveBayes.train(d, "text", "lang")
    val got = NaiveBayes.score(d, "text", "doc_id", model)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val priorA = math.round(math.log(2.0 / 3.0) * 1e6)
    val expected1 = priorA + 2 * micro(3, 5, 3) + 1 * micro(2, 5, 3)
    assert(got(1L) === expected1)
  }

  test("priors come from the training corpus, not the scored frame; empty docs get the prior argmax") {
    val model = NaiveBayes.train(d, "text", "lang")
    // the scored frame is UNLABELED and has a different label mix than the
    // training corpus — and contains an empty and a whitespace-only doc
    val unlabeled = Seq(
      (10L, "z z z"), (11L, ""), (12L, "   ")
    ).toDF("doc_id", "text")
    val got = NaiveBayes.score(unlabeled, "text", "doc_id", model)
      .select("doc_id", "pred_label", "score_micro")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.length === 3) // one row per input doc, empties included
    assert(got(0)._2 === "b")
    // zero-evidence prediction: label a has the larger train-time prior
    val priorA = math.round(math.log(2.0 / 3.0) * 1e6)
    assert(got(1) === ((11L, "a", priorA)))
    assert(got(2) === ((12L, "a", priorA)))
  }

  test("scoreFromGrid matches score() on all-out-of-vocab docs (the zero-EVIDENCE prior fallback)") {
    val model = NaiveBayes.train(d, "text", "lang")
    // doc 20 has tokens, none in the model vocabulary {x, y, z}; doc 21 is
    // empty. Both are zero-evidence: the grid must carry their prior rows
    // so the grid-derived argmax equals score()'s left-join fallback.
    val external = docs((20L, "a", "qq ww ee"), (21L, "a", ""), (22L, "a", "z"))
    val viaGrid = NaiveBayes.scoreFromGrid(
        NaiveBayes.scoredGrid(external, "text", "lang", "doc_id", model), "doc_id")
      .select("doc_id", "pred_label", "score_micro")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val viaScore = NaiveBayes.score(external, "text", "doc_id", model)
      .select("doc_id", "pred_label", "score_micro")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(viaGrid === viaScore)
    assert(viaGrid.map(_._1) === Seq(20L, 21L, 22L)) // no doc dropped
    val priorA = math.round(math.log(2.0 / 3.0) * 1e6)
    assert(viaGrid(0) === ((20L, "a", priorA))) // OOV doc: bare prior argmax
  }

  test("calibration bins best-vs-runner-up margins in whole nats with per-bin accuracy") {
    val model = NaiveBayes.train(d, "text", "lang")
    val got = NaiveBayes.calibration(d, "text", "lang", "doc_id", model)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // margins replayed: two labels, so runner-up = the other label's score
    val priorA = math.round(math.log(2.0 / 3.0) * 1e6)
    val priorB = math.round(math.log(1.0 / 3.0) * 1e6)
    def scoreA(x: Long, y: Long, z: Long) =
      priorA + x * micro(3, 5, 3) + y * micro(2, 5, 3) + z * micro(0, 5, 3)
    def scoreB(x: Long, y: Long, z: Long) =
      priorB + (x + y) * micro(0, 2, 3) + z * micro(2, 2, 3)
    val margins = Seq( // (margin, correct) — all three docs classify right
      math.abs(scoreA(2, 1, 0) - scoreB(2, 1, 0)),
      math.abs(scoreA(1, 1, 0) - scoreB(1, 1, 0)),
      math.abs(scoreA(0, 0, 2) - scoreB(0, 0, 2)))
    val expect = margins.groupBy(m => math.min(m / 1000000L, 5L))
      .map { case (b, ms) => b -> ((ms.size.toLong, ms.size.toLong, 1.0)) }
    assert(got === expect)
    // capping pushes everything into one bucket with global accuracy
    val capped = NaiveBayes.calibration(d, "text", "lang", "doc_id", model, maxBin = 0L)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(capped === Seq((0L, 3L, 3L, 1.0)))
  }

  test("labelNoise flags ONLY the confidently mislabeled doc, with the hand-computed margin") {
    // doc 4 is labeled b but speaks pure a-language; doc 5 is an empty doc
    // whose prior-argmax prediction matches its label (never flagged)
    val t = docs((1, "a", "x x y"), (2, "a", "x y"), (3, "b", "z z"),
      (4, "b", "x x x y y"), (5, "a", ""))
    val model = NaiveBayes.train(t, "text", "lang")
    val flagged = NaiveBayes
      .labelNoise(t, "text", "lang", "doc_id", model, minMarginMicro = 500000L)
      .as[(Long, String, String, Long)].collect().toSeq
    // counts (the empty doc tokenizes to one "" token, which joins the
    // vocab): label a = {x:3, y:2, "":1} over 6 tokens (docs 1, 2, 5);
    // label b = {x:3, y:2, z:2} over 7 (docs 3, 4); V = 4; priors 3/5, 2/5
    val priorA = math.round(math.log(3.0 / 5.0) * 1e6)
    val priorB = math.round(math.log(2.0 / 5.0) * 1e6)
    val scoreA = priorA + 3 * micro(3, 6, 4) + 2 * micro(2, 6, 4)
    val scoreB = priorB + 3 * micro(3, 7, 4) + 2 * micro(2, 7, 4)
    assert(scoreA > scoreB, "fixture sanity: doc 4 must score a over b")
    assert(flagged === Seq((4L, "b", "a", scoreA - scoreB)))
    // raising the bar above the margin empties the audit
    assert(NaiveBayes.labelNoise(t, "text", "lang", "doc_id", model,
      minMarginMicro = scoreA - scoreB + 1).count() === 0L)
  }
}
