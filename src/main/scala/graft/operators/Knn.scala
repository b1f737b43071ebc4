package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Similarity search over an `array<float>` embedding column (SURVEY §2.8).
  *
  * Two paths:
  *  - [[bruteForce]]: exact top-k — broadcast the (small) query set against
  *    the corpus; the corpus never shuffles, cost is queries × corpus scored
  *    in-place. The oracle-parity baseline.
  *  - [[lshKnn]]: the scale path — sign-random-projection LSH buckets both
  *    sides; each query scores only its own bucket (corpus/2^bits per probe).
  *    Approximate by construction; recall is governed by the bit count.
  *
  * All scoring precomputes per-row norms BEFORE the pairwise join (one
  * codegen'd dot per pair instead of three) — at 100 TB the per-pair dot is
  * the entire cost of these operators.
  */
object Knn {

  /** cosine from a precomputed-norm pair: dot / (normA·normB) — identical
    * double arithmetic to sqrt(dot aa)·sqrt(dot bb) computed inline. */
  private def cos(aEmb: Column, bEmb: Column, aNorm: Column, bNorm: Column): Column =
    VectorFns.dot(aEmb, bEmb) / (aNorm * bNorm)

  /** Exact top-k cosine neighbours for each query vector (excluding self).
    * Queries are broadcast; ranking is one window shuffle on query_id. */
  def bruteForce(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(embCol).as("__q_emb"),
      VectorFns.norm(col(embCol)).as("__q_n")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__c_emb"),
      VectorFns.norm(col(embCol)).as("__c_n"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cos(col("__q_emb"), col("__c_emb"), col("__q_n"), col("__c_n")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.Tables.rnd4(col("cosine")).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: weight(plane, dim) derived
    * from xxhash64 — reproducible across runs with zero data movement. */
  private def hyperplaneWeight(plane: Column, dim: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), plane, dim), lit(20001L)) - 10000L).cast("double") / 10000.0

  /** Sign-random-projection bucket id (one bit per hyperplane): the vector
    * is posexploded and joined to the (tiny, broadcast) hyperplane grid —
    * dot products computed as a grouped sum, one narrow shuffle on (id). */
  def lshBuckets(vectors: DataFrame, idCol: String, embCol: String, bits: Int, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val dims = vectors.select(posexplode(col(embCol)).as(Seq("pos", "v")), col(idCol))
    val planes = broadcast(
      spark.range(bits).select(col("id").as("plane"))
        .crossJoin(spark.range(64).select(col("id").as("pos")))
        .withColumn("w", hyperplaneWeight(col("plane"), col("pos"))))
    dims
      .join(planes, Seq("pos"))
      .groupBy(col(idCol), col("plane"))
      .agg(sum(col("v") * col("w")).as("dot"))
      .groupBy(col(idCol))
      .agg(sum(when(col("dot") > 0, expr("shiftleft(1L, cast(plane as int))")).otherwise(0L)).as("bucket"))
  }

  /** Approximate top-k: score only within the query's LSH bucket. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
             k: Int, bits: Int, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val cb = lshBuckets(corpus, idCol, embCol, bits, spark)
      .join(corpus, Seq(idCol))
      .select(col(idCol).as("neighbor_id"), col("bucket"), col(embCol).as("__c_emb"),
        VectorFns.norm(col(embCol)).as("__c_n"))
    val qb = broadcast(
      lshBuckets(queries, idCol, embCol, bits, spark)
        .join(queries, Seq(idCol))
        .select(col(idCol).as("query_id"), col("bucket"), col(embCol).as("__q_emb"),
          VectorFns.norm(col(embCol)).as("__q_n")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    cb.join(qb, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cos(col("__q_emb"), col("__c_emb"), col("__q_n"), col("__c_n")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.Tables.rnd4(col("cosine")).as("cosine"))
  }

  /** All corpus pairs with cosine ≥ threshold (embedding near-dup). Exact
    * form is an O(n²) cross join — correct at oracle scale; at 100 TB the
    * LSH-bucketed variant ([[lshKnn]] with a threshold filter) replaces it. */
  def cosineNearDup(corpus: DataFrame, idCol: String, embCol: String, threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
      VectorFns.norm(col(embCol)).as("__na"))
    val b = corpus.select(col(idCol).as("id_b"), col(embCol).as("__eb"),
      VectorFns.norm(col(embCol)).as("__nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cos(col("__ea"), col("__eb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), graft.Tables.rnd4(col("cosine")).as("cosine"))
  }
}
