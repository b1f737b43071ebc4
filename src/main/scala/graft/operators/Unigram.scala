package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, UnigramEncode}

/** Unigram-LM (SentencePiece-style) subword tokenizer (Kudo 2018,
  * "Subword Regularization") — the EM-trained companion of the greedy BPE
  * family (`ext_bpe_*`): pieces carry probabilities, words segment by
  * maximum-likelihood Viterbi, and training is expectation-maximization
  * over the segmentation lattice instead of merge counting.
  *
  * Scale shape (the BPE/IVF sampling discipline): corpus-sized work is ONE
  * word-type tf aggregate; training then runs on the `trainWords`
  * highest-tf word types — a TakeOrdered + bounded collect, like
  * SentencePiece itself training on a sentence sample — so EM cost is
  * sample-bounded, corpus-size-INDEPENDENT. Encoding is one codegen'd
  * per-row pass ([[graft.functions.UnigramEncode]], the BpeEncode
  * pattern) against the literal piece table: zero shuffles at any scale.
  *
  * Determinism: the sample is (tf desc, word) ordered, driver EM folds
  * words in that fixed order, seed selection and pruning tie-break on
  * (score desc, piece), and Viterbi tie-breaks prefer the longer last
  * piece — the model is a pure function of (corpus, params). Not
  * oracle-expressible (iterative float EM); UnigramSpec pins the EM
  * contract instead: monotone log-likelihood, normalized probabilities,
  * single-char coverage, lossless round-trip, frequent-word pieces, and
  * refit determinism. */
object Unigram {

  /** Trained model: `pieces(id) = (piece, logprob_micro)` — id is the
    * table position; micro = round(ln p · 10⁴) (integer scores keep every
    * downstream sum exact). `probs` are the pre-rounding EM probabilities
    * (spec surface); `llHistory` the per-iteration total log-likelihood. */
  final case class Model(pieces: IndexedSeq[(String, Long)],
                         probs: IndexedSeq[Double],
                         llHistory: Seq[Double]) {
    def pieceSet: Map[String, Int] = pieces.iterator.map(_._1).zipWithIndex.toMap
  }

  final val MaxPieceLen = 8

  /** Fit on the `trainWords` highest-tf word types (bounded collect). */
  def train(docs: DataFrame, textCol: String = "text",
            vocabSize: Int = 120, seedSize: Int = 400, iters: Int = 4,
            trainWords: Int = 4096): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words: Array[(String, Long)] = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("w")) // TakeOrdered: one scan, no full sort
      .limit(trainWords)
      .as[(String, Long)].collect()
    require(words.nonEmpty, "Unigram.train: empty corpus")
    fitLocal(words, vocabSize, seedSize, iters)
  }

  /** The driver-side EM fit over a (word, tf) sample — fixed fold order,
    * fully deterministic. */
  private[graft] def fitLocal(words: Array[(String, Long)], vocabSize: Int,
                              seedSize: Int, iters: Int): Model = {
    // seed: all substrings ≤ MaxPieceLen scored by occurrence-weighted tf,
    // top seedSize by (score desc, piece) ∪ every single char (coverage)
    val occ = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for ((w, tf) <- words; i <- 0 until w.length;
         j <- (i + 1) to math.min(i + MaxPieceLen, w.length)) {
      val p = w.substring(i, j)
      occ.update(p, occ.getOrElse(p, 0L) + tf)
    }
    val chars = occ.keysIterator.filter(_.length == 1).toSeq.sorted
    val multi = occ.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, s) => (-s, p) }.take(math.max(seedSize - chars.length, 0))
      .map(_._1)
    var vocab: IndexedSeq[String] = (chars ++ multi).toIndexedSeq.sorted
    var probs: Map[String, Double] = {
      val tot = vocab.map(occ).map(_.toDouble).sum
      vocab.iterator.map(p => p -> occ(p) / tot).toMap
    }

    val ll = scala.collection.mutable.ArrayBuffer.empty[Double]
    def emPass(collectCounts: Boolean): Map[String, Double] = {
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      var total = 0.0
      for ((w, tf) <- words) {
        val n = w.length
        val alpha = Array.ofDim[Double](n + 1); alpha(0) = 1.0
        val beta = Array.ofDim[Double](n + 1); beta(n) = 1.0
        for (j <- 1 to n; i <- math.max(0, j - MaxPieceLen) until j)
          probs.get(w.substring(i, j)).foreach(p => alpha(j) += alpha(i) * p)
        for (i <- (n - 1) to 0 by -1;
             j <- (i + 1) to math.min(i + MaxPieceLen, n))
          probs.get(w.substring(i, j)).foreach(p => beta(i) += p * beta(j))
        val z = alpha(n)
        require(z > 0, s"Unigram EM: word '$w' has no segmentation (coverage bug)")
        total += tf * math.log(z)
        if (collectCounts)
          for (i <- 0 until n; j <- (i + 1) to math.min(i + MaxPieceLen, n))
            probs.get(w.substring(i, j)).foreach { p =>
              val e = tf * alpha(i) * p * beta(j) / z
              val piece = w.substring(i, j)
              counts.update(piece, counts.getOrElse(piece, 0.0) + e)
            }
      }
      ll += total
      if (!collectCounts) return probs
      val tot = counts.valuesIterator.sum
      counts.iterator.map { case (p, c) => p -> c / tot }.toMap
    }

    for (_ <- 1 to iters) probs = emPass(collectCounts = true)

    // prune to vocabSize by (prob desc, piece), always keeping single
    // chars (coverage invariant), renormalize, one refresh pass
    val keepMulti = vocab.filter(_.length > 1)
      .sortBy(p => (-probs(p), p)).take(math.max(vocabSize - chars.length, 0))
    vocab = (chars ++ keepMulti).toIndexedSeq.sorted
    val keptTot = vocab.map(probs).sum
    probs = vocab.iterator.map(p => p -> probs(p) / keptTot).toMap
    probs = emPass(collectCounts = true)
    // drop pieces EM zeroed out entirely (never expected in any lattice)
    vocab = vocab.filter(p => probs.getOrElse(p, 0.0) > 0 || p.length == 1)
    val zTot = vocab.map(p => probs.getOrElse(p, 1e-12)).sum

    val ordered = vocab.sortBy(p => (-probs.getOrElse(p, 0.0), p))
    val finalProbs = ordered.map(p => probs.getOrElse(p, 1e-12) / zTot)
    val micro = finalProbs.map(p => math.round(math.log(p) * 10000.0))
    Model(ordered.zip(micro), finalProbs, ll.toSeq)
  }

  /** Encode a text column under a fitted model: one codegen'd per-row pass
    * → struct(ids array, score_micro, n_unk). */
  def encode(model: Model, text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      UnigramEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(text), model.pieces))
}
