package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Knn, Multimodal}

/** Similarity-search and centroid-aggregator semantics. */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")

  test("bruteForce ranks by exact cosine, excludes self, respects k") {
    val v = vecs(
      0L -> Seq(1f, 0f), // query
      1L -> Seq(2f, 0f), // cosine 1.0
      2L -> Seq(1f, 1f), // cosine ~0.7071
      3L -> Seq(0f, 1f)) // cosine 0.0
    val r = Knn.bruteForce(v, v.filter($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sorted
    assert(r === Seq((1L, 1L), (2L, 2L)))
  }

  test("lshKnn returns neighbors with the same cosine scores as brute force") {
    val base = (0 until 20).map(i => i.toLong -> Seq.tabulate(8)(j => ((i * 7 + j * 13) % 10).toFloat))
    val v = vecs(base: _*)
    val brute = Knn.bruteForce(v, v.filter($"vec_id" < 3), "vec_id", "embedding", k = 19)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = Knn.lshKnn(v, v.filter($"vec_id" < 3), "vec_id", "embedding",
      k = 5, bits = 4, spark = spark)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, n, c) => assert(brute((q, n)) === c) }
  }

  test("cosineNearDup finds planted duplicate vectors and nothing else") {
    val v = vecs(
      1L -> Seq(1f, 2f, 3f), 2L -> Seq(2f, 4f, 6f), // colinear → cosine 1
      3L -> Seq(-3f, 1f, 0f))
    val r = Knn.cosineNearDup(v, "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 2L)))
  }

  test("CentroidAgg computes the element-wise mean (map-side partial merge)") {
    import org.apache.spark.sql.functions.{col, udaf}
    val centroid = udaf(Multimodal.CentroidAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val df = Seq(
      ("a", Array(1f, 2f)), ("a", Array(3f, 4f)),
      ("b", Array(10f, 20f))).toDF("label", "embedding").repartition(3)
    val r = df.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .as[(String, Array[Double])].collect().toMap
    assert(r("a").toSeq === Seq(2.0, 3.0))
    assert(r("b").toSeq === Seq(10.0, 20.0))
  }

  test("decodeMeta produces deterministic stub metadata from payload bytes") {
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text") // 4 utf-8 bytes
    val m = Multimodal.decodeMeta(docs)(spark).collect().head
    assert(m === Multimodal.MediaMeta(1L, 4L, 16 + 4 % 64, 16 + (4 * 7) % 64, 1))
  }

  test("frameSample explodes every stride-th frame index per doc") {
    val docs = Seq((2L, "x" * 450)).toDF("doc_id", "text") // 450 bytes → 5 frames
    val rows = Multimodal.frameSample(docs, stride = 3)
      .select("frame_idx", "frame_hash").as[(Long, Long)].collect().sorted
    assert(rows.map(_._1).toSeq === Seq(0L, 3L))
    assert(rows.map(_._2).toSeq === Seq((2 * 31 + 0) % 997L, (2 * 31 + 21) % 997L))
  }

  test("featureVector emits a fixed-dim deterministic vector per doc") {
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text") // 4 bytes
    val v = Multimodal.featureVector(docs, d = 3)
      .select("features").as[Array[Float]].collect().head
    // (4*13 + i*17) % 101 / 100 for i = 0,1,2
    assert(v.toSeq === Seq(52 / 100f, 69 / 100f, 86 / 100f))
  }
}
