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
  * smoothed log-probs are rounded to integer log-MICROnats on the model
  * frame — (labels × vocab)-bounded, where a 1-ulp cross-engine `ln`
  * disagreement flips a rounding with probability ~1e-12 per entry — and
  * every data-sized frame only ever sums exact integers (tf ·
  * logprob_micro). Results are bit-identical on any engine and any
  * partitioning.
  *
  * Scale shape: the model is a COMPLETE (label × vocab) grid (a zero
  * count smooths to the unseen log-prob), so scoring needs no OOV
  * branch: labels are enum-bounded and the grid is vocab-sized — model
  * frames, not corpus frames. Corpus-sized work is two token-keyed
  * exchanges (count pass, score join) + one doc-keyed rollup; the
  * per-doc argmax window partitions by doc_id. */
object NaiveBayes {

  /** Train: complete (label, token) model with raw counts and smoothed
    * integer log-micronat probabilities.
    * logprob = ln((c + 0.5) / (c_label + 0.5·V)), V = corpus vocab size. */
  def train(docs: DataFrame, textCol: String, classCol: String): DataFrame = {
    val toks = docs.select(col(classCol).as("label"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val cnt = toks.groupBy(col("label"), col("token")).agg(count(lit(1)).as("c"))
    val cls = cnt.groupBy(col("label")).agg(sum(col("c")).as("__cl"))
    val voc = toks.select(col("token")).distinct()
    val v = broadcast(voc.agg(count(lit(1)).as("__v")))
    val labels = docs.select(col(classCol).as("label")).distinct()
    labels.crossJoin(voc)
      .join(cnt, Seq("label", "token"), "left")
      .join(cls, "label").crossJoin(v)
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .select(col("label"), col("token"), col("c"),
        round(log((col("c") + lit(0.5)) / (col("__cl") + lit(0.5) * col("__v"))) * 10000)
          .cast("long").as("logprob_micro"))
  }

  /** Score each doc against a [[train]] model: per-label integer score =
    * prior_micro + Σ tf·logprob_micro, argmax with label-asc tie-break
    * (total order ⇒ engine-independent prediction). Output carries the
    * actual label for accuracy audit. */
  def score(docs: DataFrame, textCol: String, classCol: String, idCol: String,
            model: DataFrame): DataFrame = {
    val tf = docs.select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val n = broadcast(docs.agg(count(lit(1)).as("__n")))
    val pri = docs.groupBy(col(classCol).as("label")).agg(count(lit(1)).as("__nc"))
      .crossJoin(n)
      .select(col("label"),
        round(log(col("__nc").cast("double") / col("__n").cast("double")) * 10000)
          .cast("long").as("__prior"))
    val scores = tf.join(model.select(col("label"), col("token"), col("logprob_micro")), "token")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf") * col("logprob_micro")).as("__s"))
      .join(pri, "label")
      .select(col(idCol), col("label"), (col("__prior") + col("__s")).as("score_micro"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score_micro").desc, col("label"))
    val best = scores.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    docs.select(col(idCol), col(classCol).as("label"))
      .join(best.select(col(idCol), col("label").as("pred_label"), col("score_micro")),
        Seq(idCol))
      .withColumn("correct", col("label") === col("pred_label"))
  }
}
