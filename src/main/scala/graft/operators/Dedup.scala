package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for LLM training-data pipelines (SURVEY §2.8).
  *
  * Four tiers, all shuffle-on-key distributed — no all-pairs cross join
  * anywhere:
  *  - exact: hash-groupBy on a normalized-text digest (one shuffle; the
  *    digest, not the text, is the shuffle key — at 100 TB you shuffle
  *    32 bytes per row, not documents).
  *  - MinHash + banded LSH: shingle → H min-hashes → B band signatures →
  *    self-join on (band, signature) for candidates → exact-Jaccard verify.
  *    Candidate generation is equi-join-shaped, so it scales as the number
  *    of colliding pairs, not n².
  *  - SimHash: 64-bit fingerprint via per-bit majority vote of token
  *    hashes; candidates from 16-bit band collisions, verified by Hamming
  *    distance (bit_count of xor).
  *  - exact n-gram Jaccard: inverted-index self-join on shingle (standard
  *    similarity-join shape); exact, for verification and oracle parity.
  */
object Dedup {

  /** Registry of frames persisted by these operators. The returned queries
    * are lazy, so the operator cannot know when its caller is done — cache
    * lifecycle is CALLER-OWNED: materialize the result, then call
    * [[unpersistAll]] (Verify/Bench do this between queries). At 100 TB the
    * same registry would hold storage-backed checkpoints instead. */
  private val persisted = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private def registerPersist(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.add(df)
    df
  }

  /** Drop every intermediate this object has persisted (idempotent; safe
    * while nothing downstream of a returned frame is still running). */
  def unpersistAll(): Unit = {
    var df = persisted.poll()
    while (df != null) { df.unpersist(false); df = persisted.poll() }
  }

  /** Exact dedup groups: one row per distinct normalized text, with the
    * surviving doc (min id) and the duplicate count. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .groupBy(sha2(lower(trim(col(textCol))), 256).as("__digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("__digest")

  /** Distinct (id, shingle-hash) pairs — the shared input of the MinHash and
    * exact-Jaccard paths, derived by exploding the per-doc arrays of
    * [[shingleArrays]] so the (interpreted, higher-order) shingle generator
    * runs exactly ONCE per cold pipeline. Shingle identity is an int64 hash
    * of the token tuple ([[TextFns.hashedShingles]]): every downstream
    * shuffle/join/intersect moves 8-byte longs instead of n-word strings. A
    * within-pair hash collision (the only kind that could change a Jaccard
    * count) has probability ~|A∪B|²/2⁶⁵ ≈ 1e-16. Persisted: the similarity
    * pipelines read this 3–5× — at 100 TB this persist becomes a checkpoint
    * to storage. */
  def shingled(arrs: DataFrame): DataFrame =
    registerPersist(arrs.select(col("doc_id"), explode(col("__arr")).as("shingle")))

  /** One row per doc with its (distinct) shingle-hash array + size — the
    * compact verification side: candidate pairs join against this
    * 1-row-per-doc table (AQE broadcasts it when small) instead of
    * re-exploding shingles into a pairs × shingles blow-up. Persisted (used
    * by both join sides). */
  private def shingleArrays(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    registerPersist(
      docs.select(col(idCol).as("doc_id"), TextFns.hashedShingles(col(textCol), n).as("__arr"))
        .withColumn("__n_sh", size(col("__arr"))))

  /** Exact n-gram Jaccard similarity join, prefix-filtered (AllPairs /
    * PPJoin family): candidates come only from joining each doc's PREFIX —
    * its |X| − ⌈t·|X|⌉ + 1 globally-rarest shingles — then exact Jaccard is
    * recomputed for candidates. Lossless: order shingles globally by
    * ascending document frequency; for a pair with J ≥ t, the first common
    * shingle in that order must sit inside both prefixes (if it sat beyond
    * doc X's prefix, all common shingles would fit in X's last ⌈t·|X|⌉ − 1
    * positions, forcing |A∩B| < t·|A| ≤ t·|A∪B|). A naive inverted-index
    * self-join materializes Σ df² pairs over ALL shingles — frequent
    * shingles make that quadratic; the prefix join touches only rare ones. */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String, n: Int, threshold: Double): DataFrame = {
    val arrs = shingleArrays(docs, textCol, idCol, n)
    verifyJaccard(prefixCandidates(shingled(arrs), threshold), arrs, threshold)
  }

  /** Prefix-filtered candidate pairs (see [[ngramJaccard]]). Three sound
    * pruning rules compose (the AllPairs/PPJoin stack):
    *  - PREFIX rule: join only each doc's rarest |X| − ⌈t·|X|⌉ + 1 shingles.
    *  - LENGTH rule: J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|) (the
    *    intersection fits in the smaller set, the union contains the larger).
    *  - POSITIONAL rule (PPJoin): a match at rarity-order positions
    *    (posA, posB) bounds the overlap by min(|A|−posA, |B|−posB) + 1 —
    *    every common shingle sits at or after the matched position in BOTH
    *    docs' shared global order; J ≥ t needs overlap ≥ t/(1+t)·(|A|+|B|),
    *    so pairs whose bound can't reach it are pruned. Lossless under the
    *    trailing `distinct`: for a true pair, the row of the FIRST common
    *    shingle attains the pair's max bound (≥ its true overlap) and
    *    survives. Compared in the multiplied-out form
    *    bound·(1+t) ≥ t·(|A|+|B|) − ε, so float error can only ever
    *    under-prune, never drop a qualifying pair.
    * All three filters sit in the join condition, so pruned pairs never
    * materialize into shuffle output. */
  private def prefixCandidates(sh: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docFreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("shingle"))
    val all = Window.partitionBy(col("doc_id"))
    val prefix = sh.join(docFreq, "shingle")
      .withColumn("__pos", row_number().over(byRarity).cast("long"))
      .withColumn("__n", count(lit(1)).over(all))
      .filter(col("__pos") <= col("__n") - ceil(lit(t) * col("__n")) + 1)
      .select(col("doc_id"), col("shingle"), col("__pos"), col("__n"))
    registerPersist(prefix) // both sides of the self-join
    val overlapBound =
      (least(col("a.__n") - col("a.__pos"), col("b.__n") - col("b.__pos")) + 1).cast("double")
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id")
          && least(col("a.__n"), col("b.__n")) >= lit(t) * greatest(col("a.__n"), col("b.__n"))
          && overlapBound * lit(1.0 + t) >= lit(t) * (col("a.__n") + col("b.__n")) - lit(1e-9))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash signatures: H min-hashes per doc (seeded xxhash64 per shingle,
    * min-aggregated — H narrow aggregates, one shuffle). */
  private def minhashSignature(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Banded-LSH candidate pairs + exact-Jaccard verification.
    * numHashes = bands × rowsPerBand; a pair with Jaccard j collides on one
    * band with probability 1-(1-j^rows)^bands. Verification recomputes the
    * exact Jaccard for candidates only, so the output is sound (every
    * reported pair truly ≥ threshold); banding controls recall. */
  def minhashLsh(docs: DataFrame, textCol: String, idCol: String, n: Int,
                 bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val arrs = shingleArrays(docs, textCol, idCol, n)
    val sig = minhashSignature(shingled(arrs), bands * rowsPerBand)
    val bandSigs = (0 until bands).map { b =>
      xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
    }
    val banded = sig.select(col("doc_id"), posexplode(array(bandSigs: _*)).as(Seq("band", "sig")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, arrs, threshold)
  }

  /** Exact-Jaccard check of candidate pairs against per-doc shingle arrays:
    * two joins to the 1-row-per-doc side and a codegen-friendly
    * `array_intersect` per pair — candidates never fan out to
    * (pair × shingle) rows. Same count as the relational
    * join-on-shingle form (arrays are distinct). */
  private def verifyJaccard(cand: DataFrame, docArr: DataFrame, threshold: Double): DataFrame = {
    val a = docArr.select(col("doc_id"), col("__arr").as("__arr_a"), col("__n_sh").as("na"))
    val b = docArr.select(col("doc_id"), col("__arr").as("__arr_b"), col("__n_sh").as("nb"))
    val nCommon = size(array_intersect(col("__arr_a"), col("__arr_b")))
    val j = col("n_common") * lit(1.0) / (col("na") + col("nb") - col("n_common"))
    cand
      .join(a, col("doc_a") === a("doc_id")).drop("doc_id")
      .join(b, col("doc_b") === b("doc_id")).drop("doc_id")
      .withColumn("n_common", nCommon)
      .filter(j >= threshold)
      .select(col("doc_a"), col("doc_b"), graft.Tables.rnd4(j).as("jaccard"))
  }

  /** Duplicate clustering: connected components over a near-dup pair list —
    * each doc labelled with the min doc_id reachable through pairs (the
    * cluster's canonical survivor). Min-label propagation to fixpoint: per
    * round, every node takes min(own label, neighbours' labels) — one
    * shuffle per round, rounds ≤ graph diameter (near-dup clusters are
    * small, so a handful).
    *
    * Fault-tolerance story: each round's labels go through a RELIABLE
    * `checkpoint` (written to the cluster's checkpoint dir — HDFS/object
    * storage on a real cluster; a temp dir is provisioned here if unset), so
    * executor loss after lineage truncation replays from storage instead of
    * killing the job (`localCheckpoint` would trade that away for speed).
    * The convergence flag is FUSED into the label-update row (`__changed`),
    * so each round costs one full-pipeline checkpoint job plus a
    * metadata-cheap scan of the just-checkpointed files — the edge list and
    * the whole upstream pair pipeline are persisted once, never recomputed
    * per round. */
  def duplicateClusters(pairs: DataFrame): DataFrame = {
    val edges = registerPersist(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .distinct())
    val sc = edges.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .checkpoint(true)
    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "nl"), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("__changed"))
        .checkpoint(true) // the round's ONE heavy job
      converged = next.filter(col("__changed")).isEmpty // reads checkpointed files only
      labels = next.drop("__changed")
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Per-bit majority vote over token hashes as ONE typed Aggregator (a
    * 64-int vote buffer, map-side partial merge) instead of 64 separate
    * conditional-sum aggregate columns: same integer arithmetic and
    * therefore the same fingerprints, but the generated aggregate stays
    * small — the 64-column form compiled a codegen function big enough to
    * dominate the query's cold time. */
  private object SimhashAgg extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) { b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Int]): Long = {
      var fp = 0L
      var i = 0
      while (i < 64) { if (r(i) > 0) fp |= 1L << i; i += 1 }
      fp
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** 64-bit SimHash per doc: per-bit majority vote over token hashes —
    * one shuffle, one aggregate ([[SimhashAgg]]). */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val vote = udaf(SimhashAgg, org.apache.spark.sql.Encoders.scalaLong)
    docs.select(col(idCol).as("doc_id"), explode(TextFns.distinctTokens(col(textCol))).as("t"))
      .groupBy(col("doc_id"))
      .agg(vote(xxhash64(col("t"))).as("simhash"))
  }

  /** SimHash near-dup pairs: collide on one of four 16-bit bands, then
    * verify Hamming distance ≤ maxHamming via bit_count(xor). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String, maxHamming: Int): DataFrame = {
    // both sides of the band self-join re-read the fingerprints
    val fp = registerPersist(simhash(docs, textCol, idCol))
    val bandCols = (0 until 4).map(b => shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL))
    val banded = fp.select(col("doc_id"), col("simhash"), posexplode(array(bandCols: _*)).as(Seq("band", "key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
