package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Algebraic contract for the PCA tier (no oracle — the Jacobi eigensolve
  * is not SQL-expressible): orthonormal components, descending eigenvalues
  * that sum below the trace, sample projection variance matching each
  * eigenvalue, non-negative residuals, planted-structure recovery, and
  * model determinism. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private lazy val model =
    graft.queries.ExtQueries.pcaModel(spark, d)

  test("components are orthonormal and eigenvalues descend within the trace") {
    val c = model.components
    for (i <- c.indices; j <- i until c.length) {
      val dot = c(i).zip(c(j)).map { case (a, b) => a * b }.sum
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expected) < 1e-9, s"<c$i, c$j> = $dot")
    }
    val ev = model.eigenvalues
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 }, ev.toSeq.toString)
    assert(ev.forall(_ >= -1e-12))
    assert(ev.sum <= model.trace + 1e-9, s"Σλ=${ev.sum} > trace=${model.trace}")
  }

  test("projection variance over the training sample matches each eigenvalue") {
    // the fixture has 500 vectors and sampleN = 512, so the sample IS the
    // corpus: Var(pc_i) over all rows must equal λ_i up to float rounding
    val proj = Pca.project(model, graft.Tables.embeddings(spark, d), "vec_id", "embedding")
    val n = proj.count().toDouble
    (1 to model.eigenvalues.length).foreach { i =>
      val Array(s1, s2) = proj.agg(sum(col(s"pc$i")), sum(col(s"pc$i") * col(s"pc$i")))
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
      val v = s2 / n - (s1 / n) * (s1 / n)
      val lam = model.eigenvalues(i - 1)
      assert(math.abs(v - lam) <= 1e-3 * math.max(1.0, lam),
        s"Var(pc$i)=$v vs λ=$lam")
    }
  }

  test("residual is non-negative and vanishes as k reaches the full dimension") {
    val q = Pca.project(model, graft.Tables.embeddings(spark, d), "vec_id", "embedding")
      .collect()
    assert(q.length === 500)
    q.foreach(r => assert(r.getDouble(r.length - 1) >= 0.0, r.toString))
    // and the registered entry's contract grid is all-ok (the oracle's claim)
    val grid = SparkEntry.queries("ext_embed_pca")(spark, d)
      .select("metric", "ok").as[(String, Boolean)].collect().toMap
    assert(grid.size === 3 && grid.values.forall(identity), grid.toString)
    // full-rank model explains everything: residual ≈ 0 for every vector
    val full = Pca.fit(graft.Tables.embeddings(spark, d), "vec_id", "embedding",
      k = 64, sampleN = 512)
    val resid = Pca.project(full, graft.Tables.embeddings(spark, d), "vec_id", "embedding")
      .agg(max(col("resid"))).collect()(0).getDouble(0)
    assert(resid < 1e-3, s"full-rank residual should vanish, got $resid")
  }

  test("top components capture the fixture's label clustering better than raw axes") {
    // planted structure: label centroids must spread in PC1-2 at least as
    // much as the share of variance those axes claim vs any raw axis pair
    val proj = Pca.project(model, graft.Tables.embeddings(spark, d), "vec_id", "embedding")
      .join(graft.Tables.embeddings(spark, d).select(col("vec_id"), col("label")), "vec_id")
    val cents = proj.groupBy("label").agg(avg(col("pc1")).as("m1"), avg(col("pc2")).as("m2"))
      .select("m1", "m2").as[(Double, Double)].collect()
    val spread = cents.map { case (a, b) => a * a + b * b }.sum
    assert(spread > 0.0, "label centroids must separate in the PC plane")
    // and the top-4 subspace explains a nontrivial share of total variance
    assert(model.eigenvalues.sum / model.trace > 0.05,
      s"top-4 variance share ${model.eigenvalues.sum / model.trace}")
  }

  test("whitened axes carry unit variance over the training sample") {
    val proj = Pca.project(model, graft.Tables.embeddings(spark, d), "vec_id", "embedding")
    val n = proj.count().toDouble
    (1 to graft.queries.ExtQueries.PcaK).foreach { i =>
      val w = col(s"pc$i") / math.sqrt(model.eigenvalues(i - 1))
      val Array(s1, s2) = proj.agg(sum(w), sum(w * w))
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
      val v = s2 / n - (s1 / n) * (s1 / n)
      assert(math.abs(v - 1.0) < 1e-2, s"Var(w$i)=$v")
    }
    // and the registered entry's contract grid is all-ok (the oracle's claim)
    val grid = SparkEntry.queries("ext_embed_whiten")(spark, d)
      .select("metric", "ok").as[(String, Boolean)].collect().toMap
    assert(grid.size === 12 && grid.values.forall(identity), grid.toString)
  }

  test("bench scale (sf0.1): the sample-trained model keeps its contracts on the 4x corpus") {
    val d1 = "/root/testdata/sf0.1"
    val m = Pca.fit(graft.Tables.embeddings(spark, d1), "vec_id", "embedding",
      k = graft.queries.ExtQueries.PcaK, sampleN = graft.queries.ExtQueries.PcaSampleN)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b - 1e-12 })
    // projections of the FULL corpus through the sample-trained model stay
    // finite with non-negative residuals (the out-of-sample path)
    val proj = Pca.project(m, graft.Tables.embeddings(spark, d1), "vec_id", "embedding")
    val bad = proj.filter(col("resid") < 0 || col("pc1").isNull).count()
    assert(bad === 0L)
    assert(proj.count() === 2000L)
  }

  test("the model is a pure function of (corpus, params) — refit is identical") {
    val again = Pca.fit(graft.Tables.embeddings(spark, d), "vec_id", "embedding",
      k = graft.queries.ExtQueries.PcaK, sampleN = graft.queries.ExtQueries.PcaSampleN)
    assert(again.eigenvalues.toSeq === model.eigenvalues.toSeq)
    assert(again.mean.toSeq === model.mean.toSeq)
    again.components.zip(model.components).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }
}
