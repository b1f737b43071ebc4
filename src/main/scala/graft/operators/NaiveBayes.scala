package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Multinomial Naive Bayes text classifier — the fastText-shaped
  * language/domain/quality gate of pretraining pipelines (label a crawl by
  * domain, route docs to per-language pipelines, score "looks like
  * reference corpus" vs "looks like spam"). Linear classifiers at this
  * scale are aggregation, not iteration: training is ONE (label, token)
  * count pass and scoring is ONE tokens⋈model join — both
  * shuffle-on-key, no gradient loop, which is exactly why the
  * fastText/NB family is what production corpus pipelines actually run.
  *
  * Determinism discipline (the `ext_lm_perplexity` pattern): Laplace-0.5
  * smoothed log-probs are rounded to integer log-MICROnats (×1e6 — the
  * repo-wide lnMicro unit) on the model frame — (labels × vocab)-bounded,
  * where a 1-ulp cross-engine `ln` disagreement flips a rounding with
  * probability ~1e-10 per entry — and every data-sized frame only ever
  * sums exact integers (tf · logprob_micro). Results are bit-identical on
  * any engine and any partitioning.
  *
  * Scale shape: the model is a COMPLETE (label × vocab) grid (a zero
  * count smooths to the unseen log-prob), so scoring needs no OOV
  * branch: labels are enum-bounded and the grid is vocab-sized — model
  * frames, not corpus frames. Class PRIORS are part of the model (learned
  * from the TRAINING corpus — scoring never looks at the scored frame's
  * label distribution, so an unlabeled frame scores fine and an eval
  * set's label mix can't leak into predictions). Corpus-sized work is two
  * token-keyed exchanges (count pass, score join) + one doc-keyed rollup;
  * the per-doc argmax window partitions by doc_id. */
object NaiveBayes {

  private def lnMicro(c: org.apache.spark.sql.Column) =
    round(log(c) * 1e6).cast("long")

  /** Train: complete (label, token) model with raw counts, smoothed
    * integer log-micronat probabilities, and the label's log-prior
    * (constant per label — the model is self-contained; [[score]] needs
    * nothing else).
    * logprob = ln((c + 0.5) / (c_label + 0.5·V)), V = corpus vocab size;
    * prior = ln(n_label_docs / n_docs). */
  def train(docs: DataFrame, textCol: String, classCol: String): DataFrame = {
    val toks = docs.select(col(classCol).as("label"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val cnt = toks.groupBy(col("label"), col("token")).agg(count(lit(1)).as("c"))
    val cls = cnt.groupBy(col("label")).agg(sum(col("c")).as("__cl"))
    // vocab off the aggregated count frame, not a second corpus explode
    val voc = cnt.select(col("token")).distinct()
    // no broadcast hints on the 1-row aggregates: an explicit broadcast of
    // a shuffle-derived frame forces an eager blocking materialization
    // (AQE broadcasts 1-row sides on its own)
    val v = voc.agg(count(lit(1)).as("__v"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val labels = docs.groupBy(col(classCol).as("label")).agg(count(lit(1)).as("__nc"))
      .crossJoin(n)
      .select(col("label"),
        lnMicro(col("__nc").cast("double") / col("__n")).as("prior_micro"))
    labels.crossJoin(voc)
      .join(cnt, Seq("label", "token"), "left")
      .join(cls, "label").crossJoin(v)
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .select(col("label"), col("token"), col("c"),
        lnMicro((col("c") + lit(0.5)) / (col("__cl") + lit(0.5) * col("__v")))
          .as("logprob_micro"),
        col("prior_micro"))
  }

  /** Score each doc against a [[train]] model: per-label integer score =
    * prior_micro + Σ tf·logprob_micro, argmax with label-asc tie-break
    * (total order ⇒ engine-independent prediction). Takes only (docs,
    * text, id, model) — no labels needed on the scored frame. A doc with
    * NO tokens (empty/whitespace text) has no evidence, so its score is
    * the bare prior and its prediction the prior argmax — the left join +
    * prior fallback keeps one output row per input doc. */
  def score(docs: DataFrame, textCol: String, idCol: String,
            model: DataFrame): DataFrame = {
    // labels-bounded; materialized so the prior extraction and its argmax
    // below don't each re-derive the full model plan (train-then-score
    // callers typically pass an already-materialized model, but a fused
    // train+score plan would otherwise recompute the grid three times)
    val pri = model.select(col("label"), col("prior_micro")).distinct()
      .localCheckpoint(true)
    val tf = docs.select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // prior rides the model rows (constant per label: min = the value), so
    // the model is scanned exactly once and no prior join is needed
    val scores = tf
      .join(model.select(col("label"), col("token"),
        col("logprob_micro"), col("prior_micro")), "token")
      .groupBy(col(idCol), col("label"))
      .agg((min(col("prior_micro")) + sum(col("tf") * col("logprob_micro")))
        .as("score_micro"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_micro").desc, col("label"))
    val best = scores.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    // prior argmax (label-asc tie-break): the zero-evidence prediction — a
    // 1-row label-bounded frame (no broadcast hint: an explicit broadcast
    // of a shuffle-derived frame forces an eager blocking materialization;
    // AQE broadcasts a 1-row side on its own)
    val topPrior = pri
      .orderBy(col("prior_micro").desc, col("label")).limit(1)
      .select(col("label").as("__p_label"), col("prior_micro").as("__p_score"))
    docs.select(col(idCol))
      .join(best.select(col(idCol), col("label").as("pred_label"), col("score_micro")),
        Seq(idCol), "left")
      .crossJoin(topPrior)
      .select(col(idCol),
        coalesce(col("pred_label"), col("__p_label")).as("pred_label"),
        coalesce(col("score_micro"), col("__p_score")).as("score_micro"))
  }

  /** [[score]] plus the accuracy audit against a labeled frame — the check
    * a pipeline runs before trusting the router. Kept separate so the
    * classifier API itself never requires labels at scoring time. */
  def scoreAudit(docs: DataFrame, textCol: String, classCol: String, idCol: String,
                 model: DataFrame): DataFrame =
    docs.select(col(idCol), col(classCol).as("label"))
      .join(score(docs, textCol, idCol, model), Seq(idCol))
      .withColumn("correct", col("label") === col("pred_label"))

  /** Label-noise audit (the confident-learning pattern, Northcutt 2021,
    * reduced to its NB-margin core): docs whose GIVEN label the classifier
    * confidently rejects — pred ≠ label AND the integer score margin
    * (best − given-label score, in log-micronats) is at least
    * `minMarginMicro`. These are the rows a labeling pass mis-tagged
    * (wrong-language crawl routing, mislabeled quality tiers); a pipeline
    * quarantines them before the labels train anything downstream.
    *
    * Needs EVERY doc's full per-label score row — including labels with no
    * token evidence and docs with no tokens — so the per-(doc, label) grid
    * is completed by a labels-bounded cross join (an L× row multiplier,
    * the same bound scoring itself pays on the token⋈model join) with the
    * bare prior as the zero-evidence score, exactly [[score]]'s fallback.
    * All comparisons are on exact integers; ties break label-asc. */
  /** Calibration/reliability table of the router: docs bucketed by the
    * best-vs-runner-up score margin (the classifier's own confidence
    * signal, in whole log-nats, capped at `maxBin`), each bucket's doc
    * count and observed accuracy — the "is high margin actually more
    * accurate" audit that decides whether a margin threshold is a usable
    * quality gate. Requires ≥ 2 labels (a runner-up must exist).
    *
    * Same completed (doc, label) score grid as [[labelNoise]] (priors as
    * zero-evidence scores, so empty docs calibrate too); margins are exact
    * integer differences, bins integer divisions — engine-deterministic;
    * the one ratio (accuracy) rounds to 4 dp per bin on the bin-bounded
    * frame. */
  def calibration(docs: DataFrame, textCol: String, classCol: String, idCol: String,
                  model: DataFrame, maxBin: Long = 5L): DataFrame =
    calibrationFromGrid(scoredGrid(docs, textCol, classCol, idCol, model),
      idCol, maxBin)

  /** [[calibration]] over an already-built (and typically session-shared)
    * [[scoredGrid]] — four audit surfaces read the same grid; rebuilding
    * it per query re-runs a byte-identical scoring pass each time. */
  def calibrationFromGrid(scored: DataFrame, idCol: String,
                          maxBin: Long = 5L): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_micro").desc, col("label"))
    val ranked = scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 2)
    val top2 = ranked.groupBy(col(idCol))
      .agg(min(when(col("__rn") === 1, col("label"))).as("pred_label"),
        min(when(col("__rn") === 1, col("score_micro"))).as("__best"),
        min(when(col("__rn") === 2, col("score_micro"))).as("__second"),
        min(col("__true")).as("__true"))
    top2
      .select(least(expr("(__best - __second) div 1000000"), lit(maxBin)).as("margin_bin"),
        (col("pred_label") === col("__true")).cast("long").as("__ok"))
      .groupBy(col("margin_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ok")).as("n_correct"))
      .select(col("margin_bin"), col("n_docs"), col("n_correct"),
        graft.Tables.rnd4(col("n_correct").cast("double") / col("n_docs").cast("double"))
          .as("accuracy"))
  }

  /** The completed per-(doc, label) score grid shared by [[labelNoise]]
    * and [[calibration]]: every doc × every model label, token-evidence
    * score where it exists, the bare prior where none does. The complete
    * model grid means a doc with ≥ 1 IN-VOCAB token already scores
    * against every label in the token⋈model join, so completion only has
    * to patch in the (rare) zero-EVIDENCE docs — zero tokens at all, or
    * every token outside the model vocabulary (possible only when scoring
    * a corpus the model wasn't trained on) — an anti-join sliver crossed
    * with the L-row priors, unioned in, NOT an L×corpus grid re-joined
    * against the L×corpus score frame. The evidence test is a broadcast
    * vocab semi-join on the tf frame (the vocab is model-sized), so both
    * fallback classes land the same prior rows [[score]]'s left join
    * gives them. */
  private[graft] def scoredGrid(docs: DataFrame, textCol: String, classCol: String,
                                idCol: String, model: DataFrame): DataFrame = {
    val pri = model.select(col("label"), col("prior_micro")).distinct()
      .localCheckpoint(true) // labels-bounded; read by the empty-doc patch
    val lab = docs.select(col(idCol), col(classCol).as("__true"))
    val tf = docs.select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val sc = tf
      .join(model.select(col("label"), col("token"),
        col("logprob_micro"), col("prior_micro")), "token")
      .groupBy(col(idCol), col("label"))
      .agg((min(col("prior_micro")) + sum(col("tf") * col("logprob_micro")))
        .as("score_micro"))
    val scored = sc.join(lab, Seq(idCol))
      .select(col(idCol), col("__true"), col("label"), col("score_micro"))
    // zero-EVIDENCE patch: docs with no score rows at all — no tokens, or
    // all tokens out-of-vocab. Deciding membership via a broadcast vocab
    // semi-join on tf (not an anti-join against sc) keeps the patch a
    // cheap second tf pass instead of re-evaluating the score subtree.
    val vocab = model.select(col("token")).distinct()
    val zeroEvidenceDocs = lab
      .join(tf.join(broadcast(vocab), Seq("token"), "left_semi")
        .select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      .crossJoin(pri)
      .select(col(idCol), col("__true"), col("label"),
        col("prior_micro").as("score_micro"))
    scored.unionByName(zeroEvidenceDocs)
  }

  def labelNoise(docs: DataFrame, textCol: String, classCol: String, idCol: String,
                 model: DataFrame, minMarginMicro: Long): DataFrame =
    labelNoiseFromGrid(scoredGrid(docs, textCol, classCol, idCol, model),
      idCol, minMarginMicro)

  /** The [[score]] view derived from an already-built [[scoredGrid]]: the
    * grid patches zero-evidence docs with the bare priors, so the per-doc
    * argmax under the same (score desc, label asc) order IS [[score]]'s
    * output including its zero-evidence prior fallback — one window over
    * the grid instead of a second corpus scoring pass. */
  def scoreFromGrid(scored: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_micro").desc, col("label"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("score_micro"))
  }

  /** [[labelNoise]] over an already-built [[scoredGrid]] (see
    * [[calibrationFromGrid]]). */
  def labelNoiseFromGrid(scored: DataFrame, idCol: String,
                         minMarginMicro: Long): DataFrame = {
    // the argmax row and the given-label row surface in the SAME window
    // pass and pivot per doc — a best⋈trueScore self-join would recompute
    // the whole unmaterialized score grid on each side
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_micro").desc, col("label"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || col("label") === col("__true"))
      .groupBy(col(idCol))
      .agg(min(when(col("__rn") === 1, col("label"))).as("pred_label"),
        min(when(col("__rn") === 1, col("score_micro"))).as("__best"),
        min(when(col("label") === col("__true"), col("score_micro"))).as("__true_sc"),
        min(col("__true")).as("label"))
      .select(col(idCol), col("label"), col("pred_label"),
        (col("__best") - col("__true_sc")).as("margin_micro"))
      .filter(col("pred_label") =!= col("label") &&
        col("margin_micro") >= minMarginMicro)
  }
}
