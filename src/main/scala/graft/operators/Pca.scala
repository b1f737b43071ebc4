package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Principal-component analysis over an `array<float>` embedding column —
  * the linear-structure tier of the embedding-QC family (int8 / PQ compress
  * it, outliers flag it, SemDeDup clusters it; PCA explains it): top-k
  * directions of variance, per-vector projections, and the off-subspace
  * residual that flags vectors the corpus' dominant structure does not
  * explain (the whitening/pre-rotation step SemDeDup-style pipelines run
  * before clustering).
  *
  * Scale shape (the IVF/PQ sampling contract, Knn.scala:173): the model is
  * trained on the `sampleN` LOWEST-ID vectors — ONE TakeOrdered scan, a
  * bounded O(sampleN·dim) collect, then mean/covariance/eigensolve entirely
  * on the driver (dim×dim = 64×64 here; corpus-size-INDEPENDENT).
  * Projection is a pure per-row kernel: k+1 codegen'd [[FloatDot]]s against
  * LITERAL component vectors — zero shuffles, zero extra scans at any
  * corpus size.
  *
  * Determinism: the sample is id-ordered, driver arithmetic is sequential
  * double folds, the cyclic Jacobi sweep order is fixed, and component
  * signs are canonicalized (largest-|coordinate| entry positive, lowest
  * index on ties) — the model is a pure function of (corpus, params). The
  * per-row kernel is a fixed IEEE op sequence. Not oracle-expressible
  * (iterative eigensolve); PcaSpec pins the algebraic contract instead:
  * orthonormal components, descending eigenvalues, sample projection
  * variance ≈ eigenvalue, residual ≥ 0, and planted-structure recovery. */
object Pca {

  /** Trained model: `mean` and `components` (row per PC, unit length) in
    * double; `eigenvalues` descending; `trace` = total sample variance. */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double], trace: Double)

  /** Fit on the `sampleN` lowest-id vectors (bounded collect — the
    * training cost is corpus-size-independent). */
  def fit(corpus: DataFrame, idCol: String, embCol: String,
          k: Int, sampleN: Int = 512): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long"), col(embCol))
      .orderBy(col(idCol)) // TakeOrdered: one scan, no full sort
      .limit(sampleN)
      .as[(Long, Array[Float])].collect()
      .sortBy(_._1).map(_._2) // id order fixes the fold order on the driver
    require(sample.nonEmpty, "Pca.fit: empty corpus")
    val dim = sample.head.length
    require(k >= 1 && k <= dim, s"Pca.fit: k=$k out of range for dim=$dim")
    val n = sample.length
    val mean = Array.ofDim[Double](dim)
    for (v <- sample; i <- 0 until dim) mean(i) += v(i)
    for (i <- 0 until dim) mean(i) /= n
    val cov = Array.ofDim[Double](dim, dim)
    for (v <- sample) {
      var i = 0
      while (i < dim) {
        val di = v(i) - mean(i)
        var j = i
        while (j < dim) { cov(i)(j) += di * (v(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until dim; j <- i until dim) {
      cov(i)(j) /= n; cov(j)(i) = cov(i)(j)
    }
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (values, vectors) = jacobi(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { c =>
      val w = Array.tabulate(dim)(r => vectors(r)(c))
      // canonical sign: the largest-|coordinate| entry (lowest index on
      // ties) points positive — eigenvectors are otherwise sign-ambiguous
      val pivot = (0 until dim).maxBy(i => (math.abs(w(i)), -i))
      if (w(pivot) < 0) w.map(-_) else w
    }.toArray
    Model(mean, comps, order.map(values).toArray, trace)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed sweep
    * order, converges quadratically; returns (eigenvalues, column-major
    * eigenvectors). Deterministic: no pivot search, no data-dependent
    * ordering — the rotation sequence depends only on off-diagonal
    * magnitudes crossing the threshold. */
  private def jacobi(a0: Array[Array[Double]],
                     maxSweeps: Int = 64, eps: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val dim = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > eps) {
      for (p <- 0 until dim - 1; q <- p + 1 until dim if math.abs(a(p)(q)) > eps / (dim * dim)) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // t = sign(θ)/(|θ|+√(θ²+1)) with sign(0) = +1
        val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        rotate(a, v, p, q, c, s)
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- i + 1 until a.length) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
                     p: Int, q: Int, c: Double, s: Double): Unit = {
    val dim = a.length
    for (i <- 0 until dim) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
    }
    for (j <- 0 until dim) {
      val apj = a(p)(j); val aqj = a(q)(j)
      a(p)(j) = c * apj - s * aqj
      a(q)(j) = s * apj + c * aqj
    }
    for (i <- 0 until dim) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
    }
  }

  /** Per-vector projections + off-subspace residual under a fitted model —
    * row-local (k+1 literal-component dots), zero shuffles at any scale.
    * Output: idCol, pc1..pck (projections of v−μ), resid (‖v−μ‖² minus the
    * projected mass, clamped at 0 against last-ulp negatives). */
  def project(model: Model, corpus: DataFrame, idCol: String, embCol: String): DataFrame = {
    val e = col(embCol)
    def litF(a: Array[Double]): Column = typedlit(a.map(_.toFloat))
    val meanF = model.mean.map(_.toFloat).map(_.toDouble) // float-rounded fold constants
    val pcCols = model.components.zipWithIndex.map { case (w, i) =>
      val wf = w.map(_.toFloat)
      val offset = { // dot(μ_f, w_f) in the same left-to-right double fold
        var s = 0.0; var j = 0
        while (j < wf.length) { s += meanF(j) * wf(j).toDouble; j += 1 }
        s
      }
      (VectorFns.dot(e, typedlit(wf)) - lit(offset)).as(s"pc${i + 1}")
    }
    val mu = litF(model.mean)
    val muNorm2 = { var s = 0.0; var j = 0
      while (j < meanF.length) { s += meanF(j) * meanF(j); j += 1 }; s }
    val cnorm2 = VectorFns.dot(e, e) - lit(2.0) * VectorFns.dot(e, mu) + lit(muNorm2)
    val projected = corpus.select(col(idCol) +: pcCols :+ cnorm2.as("__cn2"): _*)
    val projMass = (1 to model.components.length)
      .map(i => col(s"pc$i") * col(s"pc$i")).reduce(_ + _)
    projected.withColumn("resid", greatest(col("__cn2") - projMass, lit(0.0)))
      .drop("__cn2")
  }
}
