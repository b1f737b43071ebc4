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
    * from xxhash64 — reproducible across runs with zero data movement, and
    * defined for EVERY (plane, dim) pair, so the embedding dimension is
    * whatever `size(embCol)` says per row (nothing hard-codes it). */
  private def hyperplaneWeight(plane: Column, dim: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), plane, dim), lit(20001L)) - 10000L).cast("double") / 10000.0

  /** Per-band sign-random-projection keys: `bands` independent hash tables
    * of `bitsPerBand` hyperplane-sign bits each → one (id, band, key) row
    * per vector per band. Each vector element contributes to every plane via
    * an inline explode (no hyperplane grid to join — weights come from
    * [[hyperplaneWeight]] at the element's actual position, so any embedding
    * dimension works). Two narrow shuffles: (id, plane) for the projections,
    * (id, band) to pack sign bits into keys. */
  def lshBandKeys(vectors: DataFrame, idCol: String, embCol: String,
                  bands: Int, bitsPerBand: Int): DataFrame = {
    val nPlanes = bands * bitsPerBand
    vectors
      .select(col(idCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      .select(col(idCol), col("pos"), col("v"),
        explode(sequence(lit(0), lit(nPlanes - 1))).as("plane"))
      .groupBy(col(idCol), col("plane"))
      .agg(sum(col("v") * hyperplaneWeight(col("plane"), col("pos"))).as("dot"))
      .groupBy(col(idCol), (col("plane") / bitsPerBand).cast("int").as("band"))
      .agg(sum(when(col("dot") > 0,
        expr(s"shiftleft(1L, cast(plane % $bitsPerBand as int))")).otherwise(0L)).as("key"))
  }

  /** Single-table sign-random-projection bucket id (one bit per
    * hyperplane) — [[lshBandKeys]] with one band. */
  def lshBuckets(vectors: DataFrame, idCol: String, embCol: String, bits: Int): DataFrame =
    lshBandKeys(vectors, idCol, embCol, bands = 1, bitsPerBand = bits)
      .select(col(idCol), col("key").as("bucket"))

  /** Approximate top-k: score only within the query's LSH bucket. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
             k: Int, bits: Int): DataFrame = {
    val cb = lshBuckets(corpus, idCol, embCol, bits)
      .join(corpus, Seq(idCol))
      .select(col(idCol).as("neighbor_id"), col("bucket"), col(embCol).as("__c_emb"),
        VectorFns.norm(col(embCol)).as("__c_n"))
    val qb = broadcast(
      lshBuckets(queries, idCol, embCol, bits)
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
    * form is an O(n²) cross join — correct at oracle scale; at 100 TB
    * [[cosineNearDupLsh]] replaces it. */
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

  /** LSH-bucketed embedding near-dup — the 100 TB scale path. Candidates
    * come from a (band, key) equi-join over [[lshBandKeys]] (a pair is a
    * candidate iff it collides in ≥ 1 of the `bands` hash tables); the exact
    * cosine then verifies every candidate, so reported pairs are always
    * truly ≥ threshold and banding governs RECALL only:
    * P(candidate) = 1 − (1 − p^bitsPerBand)^bands with p = 1 − θ/π.
    *
    * Parameter note: pruning power depends on the threshold's angular gap.
    * At production near-dup thresholds (cosine ≥ 0.9, p ≈ 0.86 vs 0.5 for
    * unrelated pairs) a few 6–8-bit bands prune ~10–100× with recall ≥ 0.98;
    * at weak thresholds (≈ 0.3, p ≈ 0.6) bands must be short and numerous to
    * hold recall, and pruning fades — that regime is the exact join's job. */
  def cosineNearDupLsh(corpus: DataFrame, idCol: String, embCol: String,
                       threshold: Double, bands: Int, bitsPerBand: Int): DataFrame = {
    val keys = lshBandKeys(corpus, idCol, embCol, bands, bitsPerBand)
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val a = corpus.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
      VectorFns.norm(col(embCol)).as("__na"))
    val b = corpus.select(col(idCol).as("id_b"), col(embCol).as("__eb"),
      VectorFns.norm(col(embCol)).as("__nb"))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("cosine", cos(col("__ea"), col("__eb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), graft.Tables.rnd4(col("cosine")).as("cosine"))
  }
}
