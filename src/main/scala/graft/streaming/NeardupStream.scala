package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tables
import graft.functions.TextFns

/** Incremental near-duplicate detection at INGEST (SURVEY §2.7 × §2.8) —
  * the place a 100 TB pipeline actually runs dedup: as documents arrive
  * (at-least-once), each new doc's shingles probe the accumulated
  * inverted index, exact-Jaccard-verified pairs land in a pair table, and
  * the index absorbs the batch — so duplication is known the moment the
  * second copy arrives, not at the next full-corpus batch job.
  *
  * State and its merge discipline:
  *  - `index`: distinct (doc_id, 3-shingle-hash) rows — the same int64
  *    shingle rep as [[graft.operators.Dedup]]. Merge = union-distinct
  *    (idempotent ∧ commutative: redelivered docs contribute byte-equal
  *    rows that collapse).
  *  - `pairs`: (doc_a < doc_b, jaccard). A pair is a PURE function of the
  *    two documents' shingle sets, so any redelivery/split recomputes
  *    byte-identical rows and the keyed distinct-merge collapses them —
  *    the [[Decontam]] exactly-once-from-at-least-once argument.
  * Convergence to the batch answer: pair (a, b) is emitted by the batch
  * that completes the pair — when the LATER of a, b first enters the
  * index (the probe side carries the new doc's FULL shingle set, the
  * index side the older doc's full set, so the intersection count is
  * exact regardless of how arrivals were split across batches).
  *
  * Candidate generation is the plain inverted-index probe (share ≥ 1
  * shingle), NOT the batch path's PPJoin prefix filter: the prefix is
  * defined by corpus-wide rarity order, which shifts with every arrival —
  * a prefix chosen under today's df is not lossless under tomorrow's.
  * The probe stays lossless under ANY arrival order; its cost is
  * per-batch × index collision rate (never corpus²), and at 100 TB the
  * index is partitioned by shingle so the probe is a co-located
  * equi-join. Batch-replay form oracle-gated as `stream_neardup` against
  * the exact-Jaccard SQL; live restart/redelivery paths in StreamingSpec. */
object NeardupStream {

  val Threshold = 0.5

  /** Distinct (doc_id, sh) shingle rows of a document frame — the unit of
    * both the probe side and the index state. Deterministic per doc. */
  def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextFns.hashedShingles(col("text"), 3)).as("sh"))

  /** Pairs completed by this batch: the batch docs' shingles probe the
    * ALREADY-MERGED index (state ∪ batch), so new-old and new-new pairs
    * both carry exact intersection counts. A new-new pair is emitted in
    * BOTH join directions (each side is in the batch AND the index);
    * after (min, max) normalization every shared shingle therefore
    * appears once (new-old) or twice (new-new) — `countDistinct(sh)`
    * yields |A∩B| exactly in both cases. */
  def newPairs(batchSh: DataFrame, mergedIndex: DataFrame): DataFrame = {
    val sizes = mergedIndex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = batchSh.as("l")
      .join(mergedIndex.as("r"), col("l.sh") === col("r.sh") &&
        col("l.doc_id") =!= col("r.doc_id"))
      .groupBy(least(col("l.doc_id"), col("r.doc_id")).as("doc_a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("doc_b"))
      .agg(countDistinct(col("l.sh")).as("c"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= Threshold)
      .select(col("doc_a"), col("doc_b"),
        Tables.rnd4(col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
  }

  /** Keyed idempotent merges. Identical rows on every delivery ⇒ distinct
    * collapses them; a struct-min would do equally, the key is that the
    * merge is insensitive to multiplicity and order. */
  def mergeIndex(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch).distinct()

  def mergePairs(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("doc_a"), col("doc_b")).agg(min(col("jaccard")).as("jaccard"))

  /** One idempotent micro-batch apply ([[Decontam.applyBatch]] lifecycle):
    * merge the index, probe it, merge the pairs, lineage-truncate,
    * overwrite both state tables. */
  def applyBatch(spark: SparkSession, batchDocs: DataFrame, targetDir: String): Unit = {
    val idxDir = s"$targetDir/index"
    val pairDir = s"$targetDir/pairs"
    val batchSh = shingleRows(batchDocs).localCheckpoint(true)
    val mergedIndex =
      (if (new java.io.File(idxDir).exists())
        mergeIndex(spark.read.parquet(idxDir), batchSh)
      else mergeIndex(batchSh.limit(0), batchSh)).localCheckpoint(true)
    val fresh = newPairs(batchSh, mergedIndex)
    val mergedPairs =
      if (new java.io.File(pairDir).exists())
        mergePairs(spark.read.parquet(pairDir), fresh)
      else mergePairs(fresh.limit(0), fresh)
    mergedPairs.localCheckpoint(true).write.mode("overwrite").parquet(pairDir)
    mergedIndex.write.mode("overwrite").parquet(idxDir)
  }

  /** Start the ingest-dedup stream: document source dir → per-batch index
    * probe → (index, pairs) state under `targetDir`. */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream.schema(CorpusIngest.docsFileSchema).parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, targetDir)
      }
      .start()
  }
}
